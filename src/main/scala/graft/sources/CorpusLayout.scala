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
}
