package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.MisraGriesAgg

/** Sketch-guided EXACT heavy hitters — frequent items over a column
  * whose full cardinality is too large to shuffle (the 100 TB vocabulary
  * problem: an exact `groupBy(token)` exchanges every distinct token;
  * a year-scale corpus has billions of them, almost all singletons).
  *
  * Two passes, neither of which shuffles the data:
  *   1. `mg_candidates` (functions.MisraGriesAgg) — one Misra–Gries
  *      summary per partition, merged by the normal partial/final
  *      aggregation path into a single ≤capacity-entry candidate set.
  *      Exchange volume: one small buffer per partition. Guarantee:
  *      every item with true count > n/(capacity+1) IS a candidate.
  *   2. exact re-count of the candidates only — a BROADCAST semi join
  *      keeps candidate rows, then a groupBy whose key domain is the
  *      candidate set (≤capacity values), so the reduce side is tiny and
  *      map-side combine absorbs the volume.
  *
  * Because the threshold is constrained to lie above the sketch's error
  * bound (shareDen < capacity+1 ⇒ n/shareDen > n/(capacity+1)), no true
  * heavy hitter can be missed, and the re-count makes the surviving
  * counts exact — the OUTPUT is deterministic and partition-independent
  * even though the intermediate sketch is not. No tolerance needed.
  *
  * Driver state: one collected summary row (≤capacity entries) — the
  * same bounded-collect class as IvfIndex centroids.
  */
object FrequentItems {

  /** The merged global summary: (total non-null items, candidates with
    * their lower-bound counts, sorted count-desc then item). */
  def summary(df: DataFrame, itemCol: String,
      capacity: Int): (Long, Seq[(String, Long)]) = {
    MisraGriesAgg.register(df.sparkSession)
    val row = df
      .select(expr(s"mg_candidates(`$itemCol`, $capacity)").as("sk"))
      .head()
    val sk = row.getStruct(0)
    val total = sk.getLong(0)
    val items = sk.getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getString(0), r.getLong(1)))
    (total, items)
  }

  /** Items occurring in at least a 1/shareDen share of all non-null
    * rows, with EXACT counts: (itemCol, n_occ) where
    * n_occ * shareDen >= n. Requires shareDen < capacity+1 so the
    * sketch's candidate guarantee covers the threshold. */
  def exactHeavyHitters(df: DataFrame, itemCol: String, shareDen: Long,
      capacity: Int = 4096): DataFrame = {
    require(shareDen >= 1, s"shareDen must be positive, got $shareDen")
    require(shareDen < capacity + 1L,
      s"shareDen=$shareDen must be < capacity+1=${capacity + 1} or the " +
        "sketch cannot guarantee candidate coverage at the threshold")
    val (total, cands) = summary(df, itemCol, capacity)
    // local prefilter: a candidate whose lower bound plus the global
    // undercount slack still misses the threshold cannot be heavy —
    // shrinks the broadcast without risking the guarantee
    val slack = total / (capacity + 1L)
    val kept = cands.collect {
      case (item, lb) if (lb + slack) * shareDen >= total => item
    }
    val spark = df.sparkSession
    import spark.implicits._
    val candDf = kept.toDF(itemCol)
    df.join(broadcast(candDf), Seq(itemCol), "left_semi")
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") * shareDen >= lit(total))
  }
}
