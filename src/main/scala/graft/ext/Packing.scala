package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: assign documents to
  * fixed-token-budget packs (the concat-and-chunk packing used to build
  * training sequences), as pure window arithmetic.
  *
  * Pack id = ⌊exclusive-running-token-sum / budget⌋ under a DETERMINISTIC
  * total order within each shard — the same assignment every run, on any
  * cluster, reproducible in plain SQL (the DuckDB oracle runs the
  * identical window). Docs that straddle a budget boundary belong to the
  * pack their first token falls in, exactly concat-then-chunk semantics.
  *
  * Scale shape: one window per shard partition (shuffle on the shard key,
  * sort by the doc order within it). Sharding is the parallelism: packing
  * a 100 TB corpus globally would serialize into one sort, so callers
  * shard by a locality column (language, source, date bucket) and pack
  * within shards — which is also what training data loaders want.
  */
object Packing {
  def packSequences(
      docs: DataFrame,
      idCol: String,
      tokenCol: String,
      shardCol: String,
      budget: Long
  ): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("start_tok",
        coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .select(col(shardCol), col(idCol), col(tokenCol).as("n_tokens"),
        floor(col("start_tok") / budget).as("pack_id"),
        (col("start_tok") % budget).as("pack_offset"))
  }

  /** Pack-level rollup: how full each pack is (packing-efficiency audit). */
  def packStats(packed: DataFrame, shardCol: String, budget: Long): DataFrame =
    packed.groupBy(col(shardCol), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tok_sum"))
      .withColumn("fill_ratio",
        round(least(col("tok_sum").cast("double") / budget, lit(1.0)), 4))
}
