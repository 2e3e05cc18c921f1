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

  /** Persist `df` as a bucketed, bucket-sorted catalog table rooted at
    * `path`. Overwrites both the table entry and the files — by a
    * STAGE-AND-SWAP, not drop-then-write: the earlier form dropped the
    * live registration before attempting the write, so a failed rewrite
    * (bad input, disk full) left readers of [[table]] broken with no
    * rollback (ADVICE r9). Now the new layout lands in a versioned
    * subdir under a staging table name; only after the write succeeds is
    * the live name dropped and the staging entry renamed in — a failure
    * at any earlier point leaves the previous registration serving
    * untouched. Older version dirs are best-effort reclaimed after the
    * swap (queries STARTED against the old version mid-swap can lose
    * files under themselves — the usual overwrite caveat; bucketed
    * layouts are rebuilt offline, not under live queries).
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    val version = s"v_${ProcessHandle.current().pid()}_${System.nanoTime()}"
    val staging = s"${table}_staging_$version"
    try {
      df.write
        .bucketBy(buckets, key)
        .sortBy(key)
        .option("path", s"$path/$version")
        .mode("errorifexists")
        .saveAsTable(staging)
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"ALTER TABLE $staging RENAME TO $table")
    } catch {
      case e: Throwable =>
        try spark.sql(s"DROP TABLE IF EXISTS $staging")
        catch { case _: Exception => () }
        throw e
    }
    // reclaim superseded version dirs (the fresh one excepted)
    try {
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(root))
        fs.listStatus(root).foreach { st =>
          val n = st.getPath.getName
          if (st.isDirectory && n.startsWith("v_") && n != version)
            fs.delete(st.getPath, true)
        }
    } catch { case _: Exception => () } // stale versions are inert extras
  }

  /** The bucketed table, catalog-backed (bucket metadata attached — a
    * plain `spark.read.parquet(path)` would NOT know the layout and
    * would shuffle anyway; always read bucketed data through the
    * catalog). */
  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
