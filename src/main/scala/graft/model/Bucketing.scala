package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed fact-table layout — the shuffle-free fact⋈fact join at 100 TB.
  *
  * Broadcast handles dim joins; AQE handles skew; but two LARGE tables
  * co-joined on the same key every day (lineitem⋈orders, events⋈sessions)
  * pay a full shuffle of both sides per run unless the layout itself
  * carries the partitioning. Bucketing is Spark's mechanism for exactly
  * that: `bucketBy(n, key)` + `sortBy(key)` persists hash-partitioned,
  * pre-sorted files plus catalog metadata; a join of two tables bucketed
  * on the join key with the same bucket count plans as a SortMergeJoin
  * with ZERO exchanges under it (BucketingSpec pins this against the
  * actual plan). Write once, join shuffle-free forever after.
  *
  * Mechanics that matter at scale:
  *   - bucket count is a LAYOUT contract: both sides must match (or be
  *     integer multiples with `spark.sql.bucketing.coalesceBucketsInJoin`);
  *     pick it once per subject area, sized so one bucket of the biggest
  *     table fits an executor core (`rows/day × days ÷ n` ≈ 100–500 MB).
  *   - `sortBy` makes the merge side sort-free too — without it the join
  *     still skips the exchange but re-sorts every bucket per query.
  *   - bucketed tables must go through the catalog (`saveAsTable`); the
  *     `path` option keeps the files wherever the caller wants while the
  *     catalog carries the bucket spec.
  */
object Bucketing {

  /** Persist `df` as a bucketed, bucket-sorted catalog table at `path`.
    * Overwrites both the table entry and the files. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** The bucketed table, catalog-backed (bucket metadata attached — a
    * plain `spark.read.parquet(path)` would NOT know the layout and
    * would shuffle anyway; always read bucketed data through the
    * catalog). */
  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
