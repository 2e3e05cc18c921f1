package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.TextAnalysis

/** Streaming exact-dedup for document ingestion: the streaming face of
  * `ext.Dedup.exact`.
  *
  * Uses `dropDuplicatesWithinWatermark` on the normalized-text fingerprint
  * so state is BOUNDED by the watermark horizon — an unbounded
  * `dropDuplicates` would grow state forever on an infinite corpus stream.
  * Exactly the posture a 100 TB ingest needs: duplicates arriving within
  * the horizon are suppressed in-stream; cross-horizon duplicates are left
  * to the batch compaction pass (`Dedup.exact` over the store), mirroring
  * how the reference splits per-run upsert vs. periodic GC (§2.10).
  */
object StreamingDedup {
  def apply(
      docs: DataFrame,
      textCol: String,
      tsCol: String = "ts",
      watermark: String = "10 minutes"
  ): DataFrame =
    docs
      .withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")
}
