package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared persistence discipline for per-batch accumulated dedup state —
  * the single-table [[graft.model.WaveManifest]] wave layout that
  * [[StreamingNearDup]] (minhash survivor index) and
  * [[FingerprintDedupStream]] (63-bit fingerprint index) both ride, so
  * the snapshot/compaction/retention contract cannot diverge between
  * the text and media ingestion faces:
  *
  *   - each batch's rows land as their own `batch=<eff>` partition via
  *     dynamic partition overwrite (at-least-once replay rewrites its
  *     own partitions, never double-appends), manifest commit AFTER the
  *     data — a crash in between leaves an invisible wave the replay
  *     overwrites;
  *   - readers resolve the manifest pointer ONCE at plan time
  *     ([[pinnedIndex]]) — a batch committing mid-read is invisible;
  *   - [[compactTable]] collapses the pinned waves into one
  *     compaction-space wave with the `#through=` watermark burning the
  *     absorbed batch ids; [[graft.model.WaveManifest.expire]] (via the
  *     empty-table-name layout) reclaims unreferenced waves;
  *   - run-scoped base offsets ([[resolveBase]]) map each streaming
  *     query's restarting epoch ids past everything already indexed —
  *     and past the compaction watermark, so absorbed ids stay burned
  *     after their dirs are expired.
  *
  * Pre-manifest indexes (legacy dirs) keep working: reads fall back to
  * the `batch=` dir listing, and the FIRST manifest commit over such an
  * index seeds the pinned set with every legacy dir
  * ([[commitAndMaybeCompact]]) so upgrading never hides the
  * accumulated corpus.
  */
private[streaming] object DedupState {

  private val MarkerName = "_run_base"
  private val BatchDir = "batch=(\\d+)".r

  private def fileSystem(spark: SparkSession,
      path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Stream-space batch ids already present in the index (Hadoop FS
    * glob, so HDFS/S3 paths work — a java.nio probe would silently
    * report "no index" there and disable cross-batch dedup).
    * Compaction-space waves are excluded: they are rewrites of absorbed
    * batches, not ids a new run may base itself past. */
  def existingBatches(spark: SparkSession, indexPath: String): Seq[Long] = {
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

  /** Resolve the run-scoped base offset for a streaming query: a
    * queryId already in the `_run_base` marker keeps its recorded base
    * (checkpoint restart — epoch ids continue / replay correctly); an
    * unseen queryId is assigned one past every existing stream-space
    * dir AND past the compaction watermark (after compact + expire the
    * absorbed dirs are gone, but their ids must stay burned or a new
    * run's batches would be skipped as absorbed replays). The marker is
    * underscore-prefixed, so parquet partition discovery ignores it.
    * Single-writer (one ingest stream per index), like the index. */
  def resolveBase(spark: SparkSession, indexPath: String,
      queryId: String): Long =
    resolveBaseWith(spark, indexPath, queryId, math.max(
      existingBatches(spark, indexPath).foldLeft(-1L)(math.max),
      graft.model.WaveManifest.compactedThrough(spark, indexPath)) + 1L)

  /** [[resolveBase]]'s marker discipline with the fresh-base rule
    * injected — the single-table rule above globs root `batch=` dirs,
    * which multi-table wave indexes (postings under per-table subdirs)
    * and weight-chain stores (base = LATEST wave, not one past) cannot
    * use. `fresh` is evaluated at most once, only for an unseen
    * queryId. */
  def resolveBaseWith(spark: SparkSession, indexPath: String,
      queryId: String, fresh: => Long): Long = {
    val (fs, root) = fileSystem(spark, indexPath)
    val marker = new Path(root, MarkerName)
    val entries = readMarker(fs, marker)
    entries.getOrElse(queryId, {
      val base = fresh
      writeMarker(fs, marker, entries + (queryId -> base))
      base
    })
  }

  /** Highest pinned STREAM-space wave, −1 when none — the fresh-base
    * floor for manifest-backed indexes whose `batch=` dirs live under
    * per-table subdirs (nothing to glob at the root). */
  def maxPinnedStreamWave(spark: SparkSession, path: String): Long =
    graft.model.WaveManifest.pinned(spark, path)
      .map(_.filter(_ < graft.model.WaveManifest.CompactBase)
        .foldLeft(-1L)(math.max))
      .getOrElse(-1L)

  /** Fresh run base in EPOCH-ID space for the manifest-backed index
    * streams (their wave = base + epochId + 1): one slot past every
    * pinned stream-space wave and past the compaction watermark,
    * floored at 0 so a first run over a [[graft.ext.PostingIndex
    * .build]]-created index still starts at wave 1 (wave 0 is the
    * build's). Without this, a SECOND stream run with a fresh
    * checkpoint restarts epoch ids at 0 and its dynamic overwrite of
    * `batch=1..n` silently clobbers the first run's waves. */
  def indexRunBase(spark: SparkSession, path: String): Long =
    math.max(0L, math.max(maxPinnedStreamWave(spark, path),
      graft.model.WaveManifest.compactedThrough(spark, path)))

  /** The single wave write path (stream batches and [[compactTable]]):
    * dynamic partition overwrite of `batch=<wave>` — a replay replaces
    * its own partitions, every other wave is untouched. */
  def writeWave(rows: DataFrame, indexPath: String, wave: Long): Unit =
    rows.withColumn("batch", lit(wave))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch")
      .parquet(indexPath)

  /** True when a compaction already ABSORBED this batch id — the replay
    * must be a complete no-op (its rows live in the compacted wave, and
    * downstream already received its output when it first committed). */
  def absorbed(spark: SparkSession, indexPath: String, eff: Long): Boolean =
    eff <= graft.model.WaveManifest.compactedThrough(spark, indexPath)

  /** The wave set batch `eff` may probe as its corpus: the PINNED
    * manifest snapshot restricted to stream waves strictly below `eff`
    * (so a retry — for which this or a LATER batch's dir may already
    * exist — computes against the same corpus state as the first
    * attempt) plus every compaction wave (a compacted wave only ever
    * absorbs batches below the watermark, which the [[absorbed]] guard
    * proved is below `eff`). Manifest-less legacy index: dir listing. */
  def corpusWaves(spark: SparkSession, indexPath: String,
      eff: Long): Seq[Long] =
    graft.model.WaveManifest.pinned(spark, indexPath)
      .map(_.filter(w =>
        w < eff || w >= graft.model.WaveManifest.CompactBase))
      .getOrElse(existingBatches(spark, indexPath).filter(_ < eff))

  /** The corpus frame for batch `eff`, or None when no wave qualifies
    * (first batch of a fresh index). */
  def corpusFor(spark: SparkSession, indexPath: String,
      eff: Long): Option[DataFrame] = {
    val waves = corpusWaves(spark, indexPath, eff)
    if (waves.isEmpty) None
    // explicit pinned dirs, not a root scan: partition discovery on
    // the root races a compactor's orphan-dir delete (WaveManifest
    // .readWaves doc — the round-16 listing race)
    else Some(graft.model.WaveManifest.readWaves(
      spark, indexPath, "", waves))
  }

  /** Data landed for `eff` — make it visible (skipped on a replay of an
    * already-pinned wave), then auto-compact if the pinned wave count
    * reached `compactEvery` (> 0; same foreachBatch thread — the
    * compactor never races ingest).
    *
    * Legacy migration: when NO manifest exists yet, the first commit
    * seeds the pinned set with every pre-manifest `batch=` dir, not
    * just `eff` — a manifest pinning only the new wave would hide the
    * accumulated corpus from [[corpusWaves]]/[[pinnedIndex]] from the
    * next batch on, silently disabling cross-batch dedup against every
    * legacy survivor. */
  def commitAndMaybeCompact(spark: SparkSession, indexPath: String,
      eff: Long, compactEvery: Int,
      reduce: DataFrame => DataFrame = identity): Unit = {
    if (graft.model.WaveManifest.latestVersion(spark, indexPath).isEmpty) {
      val legacy = existingBatches(spark, indexPath).filterNot(_ == eff)
      if (legacy.nonEmpty) {
        graft.model.WaveManifest.commit(spark, indexPath, legacy :+ eff)
        ()
      } else graft.model.WaveManifest.commitWave(spark, indexPath, eff)
    } else graft.model.WaveManifest.commitWave(spark, indexPath, eff)
    if (compactEvery > 0 &&
      graft.model.WaveManifest.pinned(spark, indexPath)
        .exists(_.size >= compactEvery)) {
      compactTable(spark, indexPath, reduce)
      ()
    }
  }

  /** The index as a PINNED SNAPSHOT — the serve face for external
    * readers: manifest pointer resolved ONCE here at plan time, so a
    * batch committing mid-read is invisible. `pin` overrides the
    * pointer for time travel; a manifest-less legacy index scans every
    * wave. */
  def pinnedIndex(spark: SparkSession, indexPath: String,
      pin: Option[Seq[Long]]): DataFrame = {
    val waves = pin.orElse(
      graft.model.WaveManifest.pinned(spark, indexPath))
    waves match {
      // explicit pinned dirs, not a root scan (readWaves doc)
      case Some(ws) =>
        graft.model.WaveManifest.readWaves(spark, indexPath, "", ws)
      case None => spark.read.parquet(indexPath)
    }
  }

  /** Collapse the pinned wave set into ONE compaction-space wave and
    * re-pin — by default rows are carried as a pure union (dedup-index
    * rows are disjoint across waves: each doc entered exactly one
    * batch), so every later probe sees the identical corpus. Stores
    * whose read face AGGREGATES across waves (the Count-Min cell
    * tables, where (i, j) rows repeat per batch and serving sums them)
    * pass `reduce` to merge rows during the rewrite — the answer is
    * unchanged either way (the serve-side aggregate is associative);
    * reducing just makes the compacted wave minimal. Data first,
    * manifest after; old waves remain for pinned readers until expire.
    * Appends may race this compaction (the commit is CAS'd against
    * the pin-time version — racing waves survive); compactions must
    * not race each other.
    * @return the new wave id */
  def compactTable(spark: SparkSession, indexPath: String,
      reduce: DataFrame => DataFrame = identity): Long =
    // unique claimed rewrite id + CAS'd commit + superseded-loser retry
    // (WaveManifest.runCompaction): a wave another committer lands
    // mid-compaction survives; compactions racing each other stay
    // correct too ("" = waves directly under the root)
    graft.model.WaveManifest.runCompaction(spark, indexPath,
        Seq("")) { (waves, newWave) =>
      val rows = reduce(graft.model.WaveManifest
        .readWaves(spark, indexPath, "", waves).drop("batch"))
        .localCheckpoint() // the rewrite scans the path it overwrites
      writeWave(rows, indexPath, newWave)
    }

  /** Retention: drop old manifest versions and reclaim every `batch=`
    * dir no surviving version references — [[graft.model.WaveManifest
    * .expire]] over the single-table layout (batch dirs directly under
    * the root). */
  def expireTable(spark: SparkSession, indexPath: String,
      keepVersions: Int): Seq[Long] =
    graft.model.WaveManifest.expire(spark, indexPath, Seq(""), keepVersions)

  /** The shared drop policy on oriented (doc_a < doc_b) near-dup pairs:
    * a batch doc drops when it is the LARGER side of any pair (its
    * partner — indexed or in-batch — has a smaller id), or when it is
    * the smaller side of a pair whose larger side is an INDEXED doc.
    * The greedy keep-min rule applied per batch — conservative on
    * in-batch chains, the right bias for an ingest filter; exact
    * cluster-level keep-one remains the batch operators' job. */
  def droppedIds(pairs: DataFrame, batchIds: DataFrame,
      idCol: String): DataFrame = {
    val dropA = pairs.join(batchIds.withColumnRenamed(idCol, "doc_b"),
      Seq("doc_b"), "left_anti")
      .select(col("doc_a").as(idCol))
    val dropB = pairs.select(col("doc_b").as(idCol))
      .join(batchIds, Seq(idCol), "left_semi")
    dropA.unionByName(dropB).distinct()
  }

  /** The streaming query id Spark sets on the foreachBatch execution
    * thread — the stable key [[resolveBase]] maps to a base offset. */
  def queryId(spark: SparkSession): String =
    Option(spark.sparkContext.getLocalProperty("sql.streaming.queryId"))
      .getOrElse("unkeyed")
}
