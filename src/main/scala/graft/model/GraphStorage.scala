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
}
