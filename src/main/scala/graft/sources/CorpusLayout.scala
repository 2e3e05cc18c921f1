package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Curated-corpus OUTPUT layout — the sink half of the ingest faces.
  *
  * A 100 TB training corpus is consumed by readers that (a) select one
  * split/language slice at a time, (b) stream shards in a deterministic
  * order, and (c) want files big enough to amortize open() but small
  * enough to parallelize. Those three consumer needs map to exactly
  * three writer mechanics, all executed by Spark's own committer (no
  * custom file handling, so job/task retries stay exactly-once):
  *
  *   - `partitionBy(split, lang, …)`: hive-style directories make the
  *     consumer's slice a PARTITION FILTER — pruned at plan time, zero
  *     bytes of the other slices read.
  *   - `sortWithinPartitions(shard keys)`: rows land in files in a
  *     deterministic order (training-order contract, and run-length
  *     locality for columnar encodings — sorted columns compress better).
  *   - `maxRecordsPerFile`: bounds file size without an extra
  *     repartition job. Within a partition directory the writer emits
  *     however many files the record cap requires.
  *
  * The repartition on the partition columns before the write is the one
  * shuffle this pays: without it every upstream task writes a file into
  * every partition directory (tasks × partitions tiny files — the
  * classic small-file explosion); with it each partition's rows are
  * co-located and the file count is `ceil(rows / maxRecordsPerFile)`
  * per partition.
  */
object CorpusLayout {

  /** Write `df` as a partitioned, shard-ordered parquet corpus.
    *
    * @param partitionCols hive-partition columns, coarse first (e.g.
    *                      split, lang) — every distinct combination is a
    *                      directory; keep cardinality bounded
    * @param sortCols      in-partition order (e.g. shard key, doc id) —
    *                      the training-order contract
    * @param maxRecordsPerFile cap per emitted file */
  def write(df: DataFrame, path: String, partitionCols: Seq[String],
      sortCols: Seq[String], maxRecordsPerFile: Long = 1000000L): Unit =
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)

  /** Read a slice back. The predicate columns are partition directories,
    * so the scan plans with `PartitionFilters` and never touches other
    * slices' bytes — assert via `.explain` (layout spec does). */
  def readSlice(spark: SparkSession, path: String,
      partitionPredicates: (String, String)*): DataFrame =
    partitionPredicates.foldLeft(spark.read.parquet(path)) {
      case (d, (c, v)) => d.filter(col(c) === v)
    }

  /** Compact ONE partition directory in place — the maintenance op a
    * streaming landing zone needs: checkpoint-incremental ingest lands a
    * file per micro-batch, and a month of 1-minute batches is 40 k tiny
    * files whose open() overhead dominates every scan.
    *
    * Mechanics, chosen for the 100 TB failure modes:
    *   - the rewrite goes to a hidden temp dir, then swaps in by a
    *     RENAME-ASIDE protocol (live → .compact_old, tmp → live, drop
    *     .compact_old): every crash point leaves a COMPLETE copy of the
    *     slice on disk — untouched live before the first rename, the
    *     full copy at `.compact_old_*` between the renames (recover by
    *     renaming it back; a failed second rename rolls back
    *     automatically), the new layout after. The earlier delete-then-
    *     rename swap had a window where neither layout existed (ADVICE
    *     r9); renames of a directory are single metadata ops on
    *     HDFS-like stores, unlike the recursive delete;
    *   - the tmp dir is keyed by partition column NAMES and values plus
    *     pid+nanoTime — concurrent compacts of sibling slices (or
    *     (split=train) vs (lang=train)) can never share it — and is
    *     best-effort deleted on ANY failure, so an aborted rewrite
    *     (disk full, task failure) leaves no orphan;
    *   - `repartitionByRange(k, sortCols)` + in-partition sort keeps the
    *     GLOBAL shard order across the compacted files (file k holds the
    *     k-th key range, files sort lexicographically) while writing with
    *     k-way parallelism — strictly better than a single writer task;
    *   - only the named slice is touched; sibling partitions keep serving.
    *
    * Readers racing the swap itself can observe a missing directory for
    * the instant between the two renames — callers wanting zero-downtime
    * serve from a catalog pointer they flip after compacting.
    *
    * @return (files before, files after) */
  def compactSlice(spark: SparkSession, path: String,
      partition: Seq[(String, String)], sortCols: Seq[String],
      maxRecordsPerFile: Long = 1000000L): (Int, Int) = {
    val sliceDir = path + partition.map { case (c, v) => s"/$c=$v" }.mkString
    val hconf = spark.sparkContext.hadoopConfiguration
    val slicePath = new org.apache.hadoop.fs.Path(sliceDir)
    val fs = slicePath.getFileSystem(hconf)
    def parquetFiles(p: org.apache.hadoop.fs.Path): Int =
      fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
    val before = parquetFiles(slicePath)

    val slice = spark.read.parquet(sliceDir)
    val k = math.max(1L,
      (slice.count() + maxRecordsPerFile - 1) / maxRecordsPerFile).toInt
    val tag = (partition.map { case (c, v) => s"$c=$v" }.mkString("_") +
      s"_${ProcessHandle.current().pid()}_${System.nanoTime()}")
      .replaceAll("[^A-Za-z0-9_=.-]", "_")
    val tmp = new org.apache.hadoop.fs.Path(path, s".compact_tmp_$tag")
    val old = new org.apache.hadoop.fs.Path(path, s".compact_old_$tag")
    var swapped = false
    try {
      slice.repartitionByRange(k, sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)
        .write.option("maxRecordsPerFile", maxRecordsPerFile)
        .mode("overwrite").parquet(tmp.toString)

      require(fs.rename(slicePath, old),
        s"compact swap failed: $slicePath -> $old")
      if (!fs.rename(tmp, slicePath)) {
        fs.rename(old, slicePath) // roll the live slice back
        throw new IllegalStateException(
          s"compact swap failed: $tmp -> $slicePath (rolled back)")
      }
      swapped = true
      fs.delete(old, true) // post-swap garbage; dot-prefixed if it lingers
    } finally {
      // no-op after a successful swap (tmp was renamed away); on any
      // failure this reclaims the partial rewrite
      if (!swapped) fs.delete(tmp, true)
    }
    (before, parquetFiles(slicePath))
  }
}
