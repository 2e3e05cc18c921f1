package graft.model

import org.apache.spark.sql.DataFrame

/** Driver-local materialization for BOUNDED model-sized frames
  * (centroid/codebook tables — k·dim rows by construction, the
  * [[graft.ext.Gram]].fitPca / IvfIndex k-bounded-collect precedent;
  * never data-sized frames).
  *
  * Why (optimization guide §1/§2, measured with tools/JobProbe): the
  * ANN training loops checkpoint a tiny centroid frame every round and
  * then broadcast it into the next round's join. Under AQE each
  * localCheckpoint is one job and EVERY broadcast exchange reading the
  * checkpointed RDD is another — the IVF-PQ family ran 50–100 jobs per
  * query with ≥ 55 ms fixed cost each, dwarfing its actual task time.
  * Collecting the same rows once and rebuilding them as a
  * LocalRelation is bit-identical (same rows, same schema — only the
  * physical source changes), and a BroadcastExchange over a
  * LocalTableScan builds driver-side with NO job at all, so each
  * training round costs exactly one job (the update aggregate's
  * collect) and every downstream serve join broadcasts for free.
  *
  * At 100 TB the collect payload is unchanged — model tables scale
  * with k·dim, not with data — and the rows were headed for a
  * broadcast (driver + every executor) anyway; this moves WHERE the
  * bounded materialization happens, not how much is materialized.
  */
object LocalModel {
  def localized(df: DataFrame): DataFrame = {
    val rows = java.util.Arrays.asList(df.collect(): _*)
    df.sparkSession.createDataFrame(rows, df.schema)
  }
}
