package graft.ext

import org.apache.spark.sql.DataFrame
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
  * weight) table — corpus-sized data never reaches this operator. The
  * running sum is the [[RankSelect]] two-level range-sharded prefix sum
  * under the (−weight, item) order, so a group NEVER has to fit one
  * task: a global vocabulary nucleus (millions of items under a handful
  * of group keys — exactly the review-r15-#2 shape) runs at groups ×
  * shards parallelism, bit-identical to the single-window form (BIGINT
  * addition, shard ranges tile the total order).
  */
object Coverage {

  /** @param weighted one row per (keys, item) with a NON-NULL
    *        BIGINT-safe weight
    * @return the kept rows plus `total`, `cum` (inclusive running sum)
    *         and `share_4dp` (item's weight share, half-up 4 dp). */
  def nucleus(weighted: DataFrame, keys: Seq[String], itemCol: String,
      weightCol: String, pNum: Long, pDen: Long,
      shards: Int = 64): DataFrame = {
    require(keys.nonEmpty, "nucleus coverage needs at least one group key")
    require(pDen > 0 && pNum >= 0 && pNum <= pDen,
      "need 0 <= pNum/pDen <= 1")
    // ENFORCED BIGINT contract (advice r16, low): the nucleus order key
    // is the long-cast weight, so a fractional weight column would
    // silently truncate — ties where the raw values ordered exactly,
    // reordered by item — and drift the running sum. Refuse non-integral
    // weight types loudly instead of relying on the docstring.
    weighted.schema(weightCol).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => ()
      case other => throw new IllegalArgumentException(
        s"nucleus coverage needs an integral (BIGINT-safe) weight " +
          s"column; '$weightCol' is $other — pre-quantize fractional " +
          "weights explicitly (the cast here would truncate and " +
          "silently reorder exact ties)")
    }
    val w = col(weightCol).cast("long")
    // (−weight asc, item asc) ≡ (weight desc, item asc): the numeric
    // negation keeps the leading key ASC for the range sharding
    val base = weighted
      .withColumn("__w", w)
      .withColumn("__negw", -w)
    RankSelect.withPrefixSumAndTotal(base, keys,
      orderCols = Seq("__negw", itemCol), valueCol = "__w",
      sumCol = "cum", totalCol = "total", shards = shards)
      .filter(lit(pDen) * (col("cum") - col("__w")) <
        lit(pNum) * col("total"))
      .withColumn("share_4dp", TextAnalysis.halfUp4(w, col("total")))
      .select(weighted.columns.map(col) ++
        Seq(col("total"), col("cum"), col("share_4dp")): _*)
  }
}
