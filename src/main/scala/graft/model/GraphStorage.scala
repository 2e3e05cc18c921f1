package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical layout for the graph store (SURVEY.md §1 encoding decision).
  *
  * Vertices partition by `label`, edges by `edge_label`: every reference
  * read pattern (label scan G2, per-label GC A14, label-filtered degrees)
  * prunes to one partition directory, and per-label schema drift stays
  * contained. At 100 TB add a second-level bucketing by name-hash for
  * shuffle-free key joins; on a single node the directory partitioning is
  * the part that matters.
  */
object GraphStorage {
  def writeVertices(vertices: DataFrame, path: String): Unit =
    vertices.write.mode("overwrite").partitionBy("label").parquet(path)

  def writeEdges(edges: DataFrame, path: String): Unit =
    edges.write.mode("overwrite").partitionBy("edge_label").parquet(path)

  def readVertices(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readEdges(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Bucketed catalog tables: co-locate the vertex store and edge source
    * endpoints on the name hash so the merge/degree joins are
    * SHUFFLE-FREE — at 100 TB the merge-upsert's full-outer join is the
    * dominant shuffle, and bucketing both sides by the join key removes
    * it entirely (bucket metadata lives in the catalog; requires
    * saveAsTable, not path writes). See GraphStorageSpec for plan proof.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int = 32): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table)

  // ── Versioned snapshots (time travel) ──────────────────────────────
  // The Delta-style pattern without a table format dependency: each
  // commit writes an IMMUTABLE `v=<n>` directory whose parquet-job
  // `_SUCCESS` marker is the atomic visibility event — "latest" is the
  // highest COMPLETE version dir. Readers pinned to a version see a
  // complete snapshot forever (GC/merge mistakes are undoable), and
  // readers of "latest" never observe a half-written version because
  // `_SUCCESS` lands only after the data write completes. There is
  // deliberately NO `_latest` pointer file: its overwrite-rename flip
  // was delete-then-rename on the local FS, so a reader racing a
  // commit transiently saw NO pointer at all (the round-15 wave-race
  // root cause, fixed the same way in WaveManifest). At 100 TB each
  // version dir is itself label-partitioned; old versions retire by
  // deleting dirs older than the retention horizon.

  private def fs(spark: SparkSession, root: String) =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Every `v=<n>` directory, complete or not — the namespace a new
    * commit must not collide with. Only names matching `v=<digits>`
    * count: a stray `v=3.bak` backup or editor dropping under the root
    * must not brick the whole store with a NumberFormatException. */
  private val VersionDir = "^v=(\\d+)$".r
  private def allVersionDirs(spark: SparkSession, root: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val f = fs(spark, root)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.map(_.getPath.getName)
      .collect { case VersionDir(n) => n.toLong }.sorted
  }

  /** The latest COMPLETE version, if any commit ever finished: the
    * highest `v=<n>` dir carrying its `_SUCCESS` marker. `_SUCCESS`
    * files only ever appear (atomically, at job commit) — no pointer
    * file, no transient-absence window. */
  private def latestCommitted(spark: SparkSession,
      root: String): Option[Long] = versions(spark, root).lastOption

  /** COMPLETE version numbers, ascending: a `v=<n>` dir counts only with
    * its parquet job's `_SUCCESS` marker — a crashed commit's
    * half-written dir is invisible here (but still blocks its number,
    * see [[commitSnapshot]]). */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val f = fs(spark, root)
    allVersionDirs(spark, root).filter { v =>
      f.exists(new org.apache.hadoop.fs.Path(root, s"v=$v/_SUCCESS"))
    }
  }

  /** Write `df` as the next snapshot version; returns its number.
    * Single-committer contract (the reference's ETL runs are serialized
    * per store); READERS are fully concurrent-safe — the version
    * becomes visible exactly when the parquet job's `_SUCCESS` marker
    * appears, an atomic file creation, and until then [[versions]]
    * simply does not list it. Version numbering skips over ANY
    * existing dir (even a crashed commit's half-written one — never
    * clobber, never reuse a number). Object-store caveat: `_SUCCESS`
    * creation is atomic-as-existence everywhere, but the version dir's
    * task-file renames need a store with consistent listing (HDFS/
    * local; S3A with a committer). */
  def commitSnapshot(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    val next = allVersionDirs(spark, root).lastOption.getOrElse(-1L) + 1
    df.write.mode("errorifexists").parquet(s"$root/v=$next")
    next
  }

  /** Retention: delete complete versions older than the newest
    * `keepLast`. Half-written dirs (no `_SUCCESS`) are never counted —
    * they can neither consume a retention slot nor be mistaken for
    * history, and an in-flight commit's dir is never touched because
    * it is not yet a version. Readers pinned to an expired version fail on
    * their next read — the documented retention trade, same as any table
    * format's VACUUM. Returns the versions actually deleted (a failed
    * delete is dropped from the result, not misreported). */
  def expireSnapshots(spark: SparkSession, root: String,
      keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, "keepLast must be >= 1")
    latestCommitted(spark, root) match {
      case None => Seq.empty // nothing committed yet
      case Some(pointer) =>
        val f = fs(spark, root)
        versions(spark, root).filter(_ <= pointer)
          .dropRight(keepLast)
          .filter { v =>
            f.delete(new org.apache.hadoop.fs.Path(root, s"v=$v"), true)
          }
    }
  }

  /** The latest committed version, if any — the "does state exist
    * yet" probe stream maintainers need before their first batch. */
  def latestVersion(spark: SparkSession, root: String): Option[Long] =
    latestCommitted(spark, root)

  /** Read a pinned version (time travel) or the latest committed one. */
  def readSnapshot(spark: SparkSession, root: String,
      version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestCommitted(spark, root)).getOrElse(
      throw new IllegalArgumentException(
        s"no committed snapshot under $root"))
    spark.read.parquet(s"$root/v=$v")
  }
}
