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
    *   - the rewrite goes to a hidden temp dir then ATOMICALLY swaps in
    *     (delete + rename) — Spark cannot overwrite a path it is lazily
    *     reading, and a crash mid-compact must leave either the old or
    *     the new layout, never a half-deleted mix;
    *   - `repartitionByRange(k, sortCols)` + in-partition sort keeps the
    *     GLOBAL shard order across the compacted files (file k holds the
    *     k-th key range, files sort lexicographically) while writing with
    *     k-way parallelism — strictly better than a single writer task;
    *   - only the named slice is touched; sibling partitions keep serving.
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
    val tmp = new org.apache.hadoop.fs.Path(
      path, s".compact_tmp_${partition.map(_._2).mkString("_")}")
    slice.repartitionByRange(k, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite").parquet(tmp.toString)

    fs.delete(slicePath, true)
    require(fs.rename(tmp, slicePath),
      s"compact swap failed: $tmp -> $slicePath")
    (before, parquetFiles(slicePath))
  }
}
