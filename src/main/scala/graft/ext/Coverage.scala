package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Nucleus (top-p) coverage: per group, the smallest set of items whose
  * cumulative weight reaches fraction p of the group total — the
  * coverage report behind vocabulary truncation, domain-mix audits
  * ("which sources make up 90% of the corpus?") and long-tail pruning.
  *
  * Selection rule (standard nucleus): an item is kept iff the cumulative
  * weight BEFORE it is still below p·total, under the (weight desc,
  * item asc) total order — so exactly the crossing item is included and
  * ties are deterministic. The threshold comparison is EXACT integer
  * arithmetic: `pDen·(cum − w) < pNum·total` with BIGINT weights — no
  * float boundary can flip membership (the reason p arrives as a
  * rational, not a double).
  *
  * Shape for 100 TB: input is the already-aggregated (group, item,
  * weight) table — corpus-sized data never reaches this operator. ONE
  * ordered window per group computes total and running sum in a single
  * shuffle. Groups must fit a partition (true of any per-segment item
  * table; a global vocabulary nucleus should pre-bucket by weight range
  * instead).
  */
object Coverage {

  /** @param weighted one row per (keys, item) with a BIGINT-safe weight
    * @return the kept rows plus `total`, `cum` (inclusive running sum)
    *         and `share_4dp` (item's weight share, half-up 4 dp). */
  def nucleus(weighted: DataFrame, keys: Seq[String], itemCol: String,
      weightCol: String, pNum: Long, pDen: Long): DataFrame = {
    require(keys.nonEmpty, "nucleus coverage needs at least one group key")
    require(pDen > 0 && pNum >= 0 && pNum <= pDen,
      "need 0 <= pNum/pDen <= 1")
    val grp = Window.partitionBy(keys.map(col): _*)
    val ord = grp.orderBy(col(weightCol).desc, col(itemCol).asc)
    val w = col(weightCol).cast("long")
    weighted
      .withColumn("total", sum(w).over(grp))
      .withColumn("cum", sum(w).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(lit(pDen) * (col("cum") - w) < lit(pNum) * col("total"))
      .withColumn("share_4dp", TextAnalysis.halfUp4(w, col("total")))
  }
}
