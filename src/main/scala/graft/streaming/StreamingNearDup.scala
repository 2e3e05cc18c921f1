package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.ext.Dedup

/** Streaming NEAR-dup filter for document ingestion — the streaming face
  * of [[graft.ext.Dedup.minhashLshPairsIncremental]]: each micro-batch
  * builds its own minhash index (one pass over the batch text), probes
  * the PERSISTED corpus index for near-dup pairs (corpus text is never
  * re-read — the index parquet is the only corpus state), drops batch
  * docs that match, and appends the survivors' index rows so later
  * batches dedup against them.
  *
  * State lives in the index parquet, NOT the Spark state store: the
  * stream is restartable from the files alone, survivors accumulate
  * across runs, and a batch compaction pass can rewrite the index
  * without touching the stream — the same per-run-upsert vs periodic-GC
  * split as the reference's ingestion (§2.10). Each batch's rows land in
  * their own `batch=<id>` partition dir written with OVERWRITE, so
  * foreachBatch's at-least-once replay is idempotent (a retried batch
  * rewrites its own dir, never double-appends).
  *
  * Drop policy (deterministic): a batch doc is dropped iff it near-dup
  * pairs with any INDEXED doc or with a SMALLER-id doc of its own batch.
  * This is the greedy keep-min rule applied per batch — conservative on
  * in-batch chains (B~C both drop when A~B~C and A is indexed), which is
  * the right bias for an ingest filter; exact cluster-level keep-one
  * remains the batch operator's job ([[graft.ext.Components]] + argmax).
  */
object StreamingNearDup {

  /** @param indexPath  corpus index location (parquet; created on first
    *                    batch if absent)
    * @param onSurvivors (survivingDocs, batchId) sink — receives the
    *                    batch rows that were NOT near-dups
    * @param onDuplicates (pairs, batchId) sink — the (doc_a, doc_b,
    *                    jaccard) evidence for every dropped doc
    */
  def filter(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      indexPath: String,
      shingleN: Int = 3,
      numHashes: Int = 12,
      bandSize: Int = 4,
      threshold: Double = 0.7,
      onSurvivors: (DataFrame, Long) => Unit,
      onDuplicates: (DataFrame, Long) => Unit = (_, _) => (),
      trigger: Trigger = Trigger.AvailableNow()
  ): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val batchIdx = Dedup.minhashIndex(batch, idCol, textCol,
            shingleN, numHashes).localCheckpoint()
          val indexDir = Paths.get(indexPath)
          val hasIndex = Files.exists(indexDir) && {
            val s = Files.list(indexDir)
            try s.anyMatch(p => p.getFileName.toString.startsWith("batch="))
            finally s.close()
          }
          val corpusIdx =
            if (hasIndex) {
              // on at-least-once replay a dir for this (or a later) batch
              // may already exist: ignore those so the retry computes
              // against the same corpus state as the first attempt
              spark.read.parquet(indexPath).filter(col("batch") < id)
            } else batchIdx.limit(0)
          val pairs = Dedup.minhashLshPairsIncremental(corpusIdx, batchIdx,
            idCol, bandSize, threshold).localCheckpoint()
          // apply the drop policy on the oriented (doc_a < doc_b) pairs:
          // doc_b drops whenever it is a batch doc (its partner has a
          // smaller id — indexed or in-batch); doc_a drops only when its
          // partner doc_b is an INDEXED doc (batch-vs-corpus pair where
          // the corpus doc happens to have the larger id)
          val batchIds = batchIdx.select(col(idCol))
          val dropA = pairs.join(batchIds.withColumnRenamed(idCol, "doc_b"),
            Seq("doc_b"), "left_anti")
            .select(col("doc_a").as(idCol))
          val dropB = pairs.select(col("doc_b").as(idCol))
            .join(batchIds, Seq(idCol), "left_semi")
          val dropped = dropA.unionByName(dropB).distinct()
          val survivors = batch.join(dropped, Seq(idCol), "left_anti")
          val survivorIdx = batchIdx.join(dropped, Seq(idCol), "left_anti")
          survivorIdx.write.mode("overwrite")
            .parquet(s"$indexPath/batch=$id")
          onDuplicates(pairs, id)
          onSurvivors(survivors, id)
        }
      }
}
