package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout — multi-dimensional data clustering
  * for scan pruning: interleaving the bits of two sort dimensions puts
  * rows close in BOTH dimensions into the same files/row groups, so a
  * range filter on EITHER dimension (or a 2-D box) skips most of the
  * data. A single-column sort gives perfect pruning on that column and
  * none on the other; the Z-curve trades a little of the first for a
  * √-factor on both — the layout every lakehouse table keyed by
  * (tenant, time) or (user, date) wants.
  *
  * `zValue` is pure codegen bit arithmetic (the classic
  * spread-bits magic-mask chain — 5 shift/mask steps per dimension, no
  * UDF, no loop), so computing the key costs a projection. `layout`
  * range-partitions and sorts by it — the same one shuffle any layout
  * rewrite pays; the write itself is the caller's (format-specific).
  *
  * Inputs are treated as 31-bit ordinals in [0, 2³¹): callers map raw
  * values onto that range first (truncate a timestamp to minutes,
  * bucket an id — rank-preserving maps keep locality). 31 bits per
  * dimension keeps the 62-bit Morton code POSITIVE in a signed long —
  * with a 32nd bit the interleave reaches bit 63 and a signed sort
  * would order the curve's upper half before its lower half. Inputs
  * are masked to 31 bits (out-of-range ordinals wrap, loudly
  * documented rather than silently reordered).
  * Locality is property-tested in ZOrderSpec: a box probe touches
  * ~√P of P partitions instead of all of them.
  */
object ZOrder {

  /** Spread the low 31 bits of `x` into the even bit positions of a
    * 64-bit value (the standard Morton magic masks). */
  private def spread(x: Column): Column = {
    val m = Seq(
      (16, 0x0000FFFF0000FFFFL),
      (8, 0x00FF00FF00FF00FFL),
      (4, 0x0F0F0F0F0F0F0F0FL),
      (2, 0x3333333333333333L),
      (1, 0x5555555555555555L))
    m.foldLeft(x.bitwiseAND(lit(0x7FFFFFFFL))) { case (acc, (s, mask)) =>
      (acc.bitwiseOR(shiftleft(acc, s))).bitwiseAND(lit(mask))
    }
  }

  /** 62-bit Morton code of two 31-bit ordinals: bits of `a` on even
    * positions, bits of `b` on odd; always non-negative. */
  def zValue(a: Column, b: Column): Column =
    spread(a.cast("long")).bitwiseOR(shiftleft(spread(b.cast("long")), 1))

  /** Range-partition into `nPartitions` by the Morton code of
    * (`colA`, `colB`) and sort within partitions — the shuffle+sort a
    * layout rewrite pays once at write time. */
  def layout(df: DataFrame, colA: String, colB: String,
      nPartitions: Int): DataFrame = {
    require(nPartitions >= 1, "nPartitions must be >= 1")
    df.withColumn("__z", zValue(col(colA), col(colB)))
      .repartitionByRange(nPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
