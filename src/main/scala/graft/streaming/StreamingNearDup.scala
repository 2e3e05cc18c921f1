package graft.streaming

import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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
  * their own `batch=<id>` partition via DYNAMIC partition overwrite, so
  * foreachBatch's at-least-once replay is idempotent (a retried batch
  * rewrites its own partitions, never double-appends).
  *
  * The survivor index is [[graft.model.WaveManifest]]-pinned, exactly
  * like the posting and IVF indexes (review r12 — this was the last
  * persisted index outside the snapshot discipline): every batch commits
  * a manifest version AFTER its data lands, [[index]] resolves the
  * pointer ONCE at plan time (an external reader scanning the survivor
  * set mid-commit answers the pre-batch snapshot, never a mix),
  * [[compact]] collapses the pinned waves into one compaction-space
  * wave with a `#through=` watermark so absorbed batch ids replay as
  * no-ops, and [[graft.model.WaveManifest.expire]] (via [[expire]])
  * reclaims unreferenced waves. Pre-manifest indexes (legacy dirs) keep
  * working: reads fall back to scanning every `batch=` dir.
  *
  * Batch-id collision across RUNS is handled by a run-scoped base
  * offset: Spark's epoch ids restart at 0 under a fresh checkpoint, so a
  * second query against the same index would otherwise reuse
  * `batch=0`, clobber the accumulated survivors, and (because the
  * corpus filter is `batch < id`) skip dedup against everything already
  * indexed. [[resolveBase]] maps each streaming QUERY (the stable
  * `queryId`, which survives checkpoint restarts) to a base recorded in
  * the `_run_base` marker file inside the index dir: a query seen before
  * keeps its base (so a checkpoint replay rewrites the same dir), a new
  * query gets `max(existing batch) + 1` (so its batches dedup against —
  * and never overwrite — every previously indexed batch). The marker is
  * underscore-prefixed, so parquet partition discovery ignores it. All
  * file probing goes through the Hadoop FileSystem API, so an HDFS/S3
  * index path behaves the same as a local one.
  *
  * Drop policy (deterministic): a batch doc is dropped iff it near-dup
  * pairs with any INDEXED doc or with a SMALLER-id doc of its own batch.
  * This is the greedy keep-min rule applied per batch — conservative on
  * in-batch chains (B~C both drop when A~B~C and A is indexed), which is
  * the right bias for an ingest filter; exact cluster-level keep-one
  * remains the batch operator's job ([[graft.ext.Components]] + argmax).
  */
object StreamingNearDup {

  private val MarkerName = "_run_base"
  private val BatchDir = "batch=(\\d+)".r

  private def fileSystem(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Batch ids already present in the index (Hadoop FS glob, so HDFS/S3
    * paths work — a java.nio probe would silently report "no index"
    * there and disable cross-batch dedup). Compaction-space waves
    * (>= [[graft.model.WaveManifest.CompactBase]]) are excluded: they
    * are rewrites of absorbed stream batches, not batch ids a new run
    * may base itself past. */
  private[streaming] def existingBatches(
      spark: SparkSession, indexPath: String): Seq[Long] = {
    val (fs, root) = fileSystem(spark, indexPath)
    if (!fs.exists(root)) Seq.empty
    else fs.globStatus(new Path(root, "batch=*")) match {
      case null => Seq.empty
      case st => st.toSeq.map(_.getPath.getName).collect {
        case BatchDir(n) => n.toLong
      }.filter(_ < graft.model.WaveManifest.CompactBase)
    }
  }

  private def readMarker(fs: FileSystem, marker: Path): Map[String, Long] =
    if (!fs.exists(marker)) Map.empty
    else {
      val buf = new Array[Byte](fs.getFileStatus(marker).getLen.toInt)
      val in = fs.open(marker)
      try in.readFully(0, buf)
      finally in.close()
      new String(buf, StandardCharsets.UTF_8)
        .linesIterator.filter(_.nonEmpty).map { line =>
          val Array(qid, base) = line.split("\t", 2)
          qid -> base.toLong
        }.toMap
    }

  private def writeMarker(fs: FileSystem, marker: Path,
      entries: Map[String, Long]): Unit = {
    val out = fs.create(marker, true)
    try out.write(entries.toSeq.sortBy(_._1)
      .map { case (q, b) => s"$q\t$b" }.mkString("\n")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Resolve the run-scoped base offset for a streaming query: a queryId
    * already in the marker keeps its recorded base (checkpoint restart —
    * epoch ids continue / replay correctly); an unseen queryId is
    * assigned `max(existing batch) + 1` and recorded, so its epoch-0
    * batch lands AFTER everything already indexed. Single-writer (one
    * ingest stream per index), like the index itself. */
  private[streaming] def resolveBase(spark: SparkSession, indexPath: String,
      queryId: String): Long = {
    val (fs, root) = fileSystem(spark, indexPath)
    val marker = new Path(root, MarkerName)
    val entries = readMarker(fs, marker)
    entries.getOrElse(queryId, {
      // past every existing stream-space dir AND past the compaction
      // watermark: after compact + expire the absorbed dirs are gone,
      // but their ids must stay burned or a new run's batches would be
      // skipped as absorbed replays
      val base = math.max(
        existingBatches(spark, indexPath).foldLeft(-1L)(math.max),
        graft.model.WaveManifest.compactedThrough(spark, indexPath)) + 1L
      writeMarker(fs, marker, entries + (queryId -> base))
      base
    })
  }

  /** The drop policy on oriented (doc_a < doc_b) near-dup pairs: a
    * batch doc drops when it is the LARGER side of any pair (its
    * partner — indexed or in-batch — has a smaller id), or when it is
    * the smaller side of a pair whose larger side is an INDEXED doc.
    * Pure frame logic shared by the stream and the batch face. */
  private def droppedIds(pairs: DataFrame, batchIds: DataFrame,
      idCol: String): DataFrame = {
    val dropA = pairs.join(batchIds.withColumnRenamed(idCol, "doc_b"),
      Seq("doc_b"), "left_anti")
      .select(col("doc_a").as(idCol))
    val dropB = pairs.select(col("doc_b").as(idCol))
      .join(batchIds, Seq(idCol), "left_semi")
    dropA.unionByName(dropB).distinct()
  }

  /** BATCH face of the filter: the rows of `batch` that survive the
    * SAME drop policy one micro-batch applies against a prebuilt corpus
    * [[Dedup.minhashIndex]] — near-dup evidence comes from
    * [[Dedup.minhashLshPairsIncremental]] (corpus text never re-read),
    * keep-min within the batch. Hash-gated by `q_neardup_filter`; the
    * streaming twin (micro-batches + persisted index accumulation) is
    * spec-gated with this as its per-batch semantics. */
  def filterBatch(
      corpusIdx: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 12,
      bandSize: Int = 4,
      threshold: Double = 0.7): DataFrame = {
    val batchIdx = Dedup.minhashIndex(batch, idCol, textCol,
      shingleN, numHashes).localCheckpoint()
    val pairs = Dedup.minhashLshPairsIncremental(corpusIdx, batchIdx,
      idCol, bandSize, threshold)
    batch.join(droppedIds(pairs, batchIdx.select(col(idCol)), idCol),
      Seq(idCol), "left_anti")
  }

  /** One micro-batch of the filter, at its run-scoped EFFECTIVE batch id:
    * probe the corpus index (batches strictly below `eff`), drop batch
    * docs per the keep-min policy, overwrite `batch=<eff>` with the
    * survivors' index rows. Calling this twice with the same `eff` is
    * idempotent — the at-least-once replay contract. */
  private[streaming] def processBatch(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      indexPath: String,
      shingleN: Int,
      numHashes: Int,
      bandSize: Int,
      threshold: Double,
      eff: Long,
      onSurvivors: (DataFrame, Long) => Unit,
      onDuplicates: (DataFrame, Long) => Unit,
      compactEvery: Int = 0): Unit = {
    val spark = batch.sparkSession
    // a replayed batch a compaction already ABSORBED is a complete
    // no-op: its survivors live in the compacted wave, and downstream
    // already received them when the batch first committed
    if (eff <= graft.model.WaveManifest.compactedThrough(spark, indexPath))
      return
    val batchIdx = Dedup.minhashIndex(batch, idCol, textCol,
      shingleN, numHashes).localCheckpoint()
    // corpus = the PINNED manifest snapshot, restricted to waves this
    // batch may see: stream waves strictly below eff (so a retry — for
    // which this or a LATER batch's dir may already exist — computes
    // against the same corpus state as the first attempt) plus every
    // compaction wave (a compacted wave only ever absorbs batches below
    // the watermark, which the guard above proved is below eff). A
    // manifest-less legacy index falls back to the dir listing.
    val corpusWaves = graft.model.WaveManifest.pinned(spark, indexPath)
      .map(_.filter(w =>
        w < eff || w >= graft.model.WaveManifest.CompactBase))
      .getOrElse(existingBatches(spark, indexPath).filter(_ < eff))
    val corpusIdx =
      if (corpusWaves.nonEmpty) spark.read.parquet(indexPath)
        .filter(col("batch").isin(corpusWaves.map(Long.box): _*))
      else batchIdx.limit(0)
    val pairs = Dedup.minhashLshPairsIncremental(corpusIdx, batchIdx,
      idCol, bandSize, threshold).localCheckpoint()
    val dropped = droppedIds(pairs, batchIdx.select(col(idCol)), idCol)
    val survivors = batch.join(dropped, Seq(idCol), "left_anti")
    val survivorIdx = batchIdx.join(dropped, Seq(idCol), "left_anti")
    writeWave(survivorIdx, indexPath, eff)
    // data first, manifest after (the wave becomes visible to pinned
    // readers only here; a crash in between leaves an invisible wave
    // the replay overwrites); replays of a pinned wave skip the commit
    graft.model.WaveManifest.commitWave(spark, indexPath, eff)
    onDuplicates(pairs, eff)
    onSurvivors(survivors, eff)
    if (compactEvery > 0 &&
      graft.model.WaveManifest.pinned(spark, indexPath)
        .exists(_.size >= compactEvery)) {
      compact(spark, indexPath)
      ()
    }
  }

  /** The single wave write path (stream batches and [[compact]]):
    * dynamic partition overwrite of `batch=<wave>` — a replay replaces
    * its own partitions, every other wave is untouched. */
  private def writeWave(rows: DataFrame, indexPath: String,
      wave: Long): Unit =
    rows.withColumn("batch", lit(wave))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch")
      .parquet(indexPath)

  /** The survivor index as a PINNED SNAPSHOT — the serve face for
    * external readers (downstream dedup jobs probing the accumulated
    * corpus): the manifest pointer is resolved ONCE here at plan time,
    * so a batch committing mid-read is invisible. `pin` overrides the
    * pointer for time travel (a wave set from [[graft.model
    * .WaveManifest.wavesAt]]); a manifest-less legacy index scans every
    * wave. */
  def index(spark: SparkSession, indexPath: String,
      pin: Option[Seq[Long]] = None): DataFrame = {
    val waves = pin.orElse(
      graft.model.WaveManifest.pinned(spark, indexPath))
    val all = spark.read.parquet(indexPath)
    waves match {
      case Some(ws) => all.filter(col("batch").isin(ws.map(Long.box): _*))
      case None => all
    }
  }

  /** Collapse the pinned wave set into ONE compaction-space wave and
    * re-pin — the [[graft.ext.PostingIndex.compact]] lifecycle for the
    * survivor index: survivor rows are disjoint across waves (each doc
    * survived exactly one batch), so the rewrite is a pure union and
    * every later probe sees the identical corpus. The `#through=`
    * watermark burns the absorbed batch ids (their replays become
    * no-ops). Data first, manifest after; old waves remain for pinned
    * readers until [[expire]]. Single-committer contract.
    * @return the new wave id */
  def compact(spark: SparkSession, indexPath: String): Long = {
    val waves = graft.model.WaveManifest.pinned(spark, indexPath)
      .getOrElse(throw new IllegalArgumentException(
        s"no manifest under $indexPath — compact needs a manifest-pinned " +
          "index (legacy survivor indexes predate the snapshot discipline)"))
    require(waves.nonEmpty, s"manifest under $indexPath pins no waves")
    val newWave = graft.model.WaveManifest.nextCompactionWave(waves)
    val rows = spark.read.parquet(indexPath)
      .filter(col("batch").isin(waves.map(Long.box): _*)).drop("batch")
      .localCheckpoint() // the rewrite scans the path it overwrites
    writeWave(rows, indexPath, newWave)
    graft.model.WaveManifest.commit(spark, indexPath, Seq(newWave),
      through = Some(graft.model.WaveManifest.throughAfterCompaction(
        waves, graft.model.WaveManifest.compactedThrough(spark, indexPath))))
    newWave
  }

  /** Retention for the survivor index: drop old manifest versions and
    * reclaim every `batch=` dir no surviving version references —
    * [[graft.model.WaveManifest.expire]] over this single-table layout
    * (batch dirs directly under the root). */
  def expire(spark: SparkSession, indexPath: String,
      keepVersions: Int): Seq[Long] =
    graft.model.WaveManifest.expire(spark, indexPath, Seq(""), keepVersions)

  /** @param indexPath  corpus index location (parquet; created on first
    *                    batch if absent)
    * @param onSurvivors (survivingDocs, effectiveBatchId) sink — receives
    *                    the batch rows that were NOT near-dups
    * @param onDuplicates (pairs, effectiveBatchId) sink — the (doc_a,
    *                    doc_b, jaccard) evidence for every dropped doc
    * @param compactEvery > 0 auto-compacts whenever the pinned wave
    *                    count reaches it (same foreachBatch thread — the
    *                    compactor never races ingest)
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
      trigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Int = 0
  ): DataStreamWriter[Row] = {
    // resolved on the run's first non-empty batch, then cached for the
    // run: foreachBatch executes serially on the stream's execution
    // thread, where Spark sets the sql.streaming.queryId local property
    val baseRef = new AtomicLong(Long.MinValue)
    docs.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          if (baseRef.get == Long.MinValue) {
            val qid = Option(spark.sparkContext
              .getLocalProperty("sql.streaming.queryId"))
              .getOrElse("unkeyed")
            baseRef.set(resolveBase(spark, indexPath, qid))
          }
          processBatch(batch, idCol, textCol, indexPath, shingleN,
            numHashes, bandSize, threshold, baseRef.get + id,
            onSurvivors, onDuplicates, compactEvery)
        }
      }
  }
}
