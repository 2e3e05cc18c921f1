package graft.ops

import org.apache.spark.sql.DataFrame

/** A14/K9/K10 — the reference's ghost-node GC: stale = stored keys minus
  * live keys, per label (`lambda/etl_aws/neptune_etl_aws.py:1932-2066`), and
  * the filtered alias-node purge (`etl_deepflow:776-789`).
  *
  * Spark-first: a `left_anti` join (stale set) / `left_semi` join (retained
  * set). Both plan as a single shuffle — or a broadcast when the live-key
  * side is small, which it is in the reference (≤ thousands of resources).
  * No driver-side set difference, no per-id deletes.
  */
object AntiJoinGC {
  /** Rows of `current` whose key has no match in `live` — the GC victims. */
  def stale(current: DataFrame, live: DataFrame, keys: Seq[String]): DataFrame =
    current.join(live.select(keys.head, keys.tail: _*).distinct(), keys, "left_anti")

  /** Rows of `current` that survive GC. */
  def retained(current: DataFrame, live: DataFrame, keys: Seq[String]): DataFrame =
    current.join(live.select(keys.head, keys.tail: _*).distinct(), keys, "left_semi")
}
