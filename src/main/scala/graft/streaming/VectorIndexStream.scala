package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming maintenance for the persisted IVF vector index — the DENSE
  * twin of [[IndexStream]], completing the wave unification review r11
  * asked for: each micro-batch of NEW vectors is assigned to the saved
  * quantizer's lists WITHOUT refitting ([[graft.ext.IvfIndex.assignTo]]
  * against the tiny persisted centroid table) and lands as its own
  * `batch=<wave>` partition via dynamic partition overwrite — so a
  * replayed micro-batch (foreachBatch is at-least-once) REPLACES its own
  * wave instead of double-writing neighbors into the lists, and a serve
  * through a [[graft.ext.IvfIndex.load]]-pinned snapshot never mixes an
  * in-flight wave in.
  *
  * Wave ids are `batchId + 1`: the quantizer must exist before the
  * stream starts (assignment needs centroids), so wave 0 is always the
  * [[graft.ext.IvfIndex.IvfModel.save]] build wave and streaming waves
  * slot after it without collision. The manifest commit lands AFTER the
  * wave's data (skipped on replay of an already-pinned wave) — the
  * [[IndexStream.appendBatch]] protocol exactly.
  *
  * Precondition (the append posture): vector ids must be new across
  * batches — re-ingesting an indexed vector duplicates it in its list.
  * Dedup upstream ([[StreamingDedup]]).
  */
object VectorIndexStream {

  /** Start the maintenance query. `vectors` is a STREAMING frame with
    * (idCol, vecCol); `path` must hold a saved index (the quantizer).
    * `compactEvery > 0` auto-compacts when the pinned wave count
    * reaches it (same foreachBatch thread — never races ingest). */
  def start(vectors: DataFrame, idCol: String, vecCol: String,
            path: String, checkpoint: String,
            compactEvery: Int = 0): StreamingQuery = {
    // run-scoped base (DedupState.indexRunBase): a fresh-checkpoint
    // second run must slot past the first run's pinned waves, not
    // clobber them — see IndexStream.start for the full contract
    val baseRef =
      new java.util.concurrent.atomic.AtomicLong(Long.MinValue)
    vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        if (baseRef.get == Long.MinValue)
          baseRef.set(DedupState.resolveBaseWith(spark, path,
            DedupState.queryId(spark),
            DedupState.indexRunBase(spark, path)))
        appendBatch(batch, idCol, vecCol, path, baseRef.get + id,
          compactEvery)
      }
      .start()
  }

  /** One wave under `batch=<batchId + 1>` — DELEGATES to the index's
    * single shared write path ([[graft.ext.IvfIndex.writeListsWave]])
    * and assignment rule ([[graft.ext.IvfIndex.assignTo]], the same
    * argmin/tie/NaN discipline as every probe face), so the layout and
    * list choice cannot diverge between batch, incremental, and
    * streaming writers. Public so specs can drive replays directly. */
  def appendBatch(batch: DataFrame, idCol: String, vecCol: String,
                  path: String, batchId: Long,
                  compactEvery: Int = 0): Unit = {
    val spark = batch.sparkSession
    val wave = batchId + 1
    // absorbed-replay no-op (see IndexStream.appendBatch): after an
    // auto-compaction, the replayed batch's rows already live in the
    // compacted wave
    if (wave <= graft.model.WaveManifest.compactedThrough(spark, path))
      return
    val model = graft.ext.IvfIndex.load(spark, path)
    graft.ext.IvfIndex.writeListsWave(
      graft.ext.IvfIndex.assignTo(model, batch, idCol, vecCol),
      path, wave, dynamic = true)
    graft.model.WaveManifest.commitWave(spark, path, wave)
    if (compactEvery > 0 &&
      graft.model.WaveManifest.pinned(spark, path)
        .exists(_.size >= compactEvery)) {
      graft.ext.IvfIndex.compact(spark, path)
      ()
    }
  }

  /** Serve the streamed index: a fresh pinned [[graft.ext.IvfIndex
    * .load]] snapshot + the standard pruned probe — no serving changes,
    * the wave layout's whole point. */
  def serve(spark: SparkSession, path: String, queries: DataFrame,
            idCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame =
    graft.ext.IvfIndex.search(
      graft.ext.IvfIndex.load(spark, path), queries, idCol, vecCol, k, nProbe)
}
