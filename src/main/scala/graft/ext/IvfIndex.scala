package graft.ext

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the scale path when
  * sign-LSH buckets are too coarse: a coarse k-means quantizer assigns
  * every corpus vector to its nearest centroid list; a query probes only
  * the `nProbe` nearest lists.
  *
  * Spark-first shape: the quantizer is MLlib KMeans (fixed seed); corpus
  * assignment is one `model.transform`; the probe step broadcasts the
  * (tiny) exploded query→list pairs and joins on the list id — shuffle on
  * the list key, never a cross join. At 100 TB the corpus side is
  * write-once partitioned BY list id, making a probe a partition-pruned
  * scan, which is exactly the on-disk IVF layout of a vector DB.
  *
  * Results are rows-only-checkable (k-means has no SQL oracle);
  * correctness is gated by the recall-vs-brute-force spec.
  */
object IvfIndex {

  /** Assign each row its IVF list id. */
  def assign(corpus: DataFrame, idCol: String, vecCol: String,
      nLists: Int, seed: Long = 42L): DataFrame = {
    val vecs = corpus.withColumn("__features",
      array_to_vector(col(vecCol).cast("array<double>")))
    val model = new KMeans().setK(nLists).setSeed(seed)
      .setFeaturesCol("__features").setPredictionCol("__list")
      .fit(vecs)
    model.transform(vecs)
      .select(col(idCol), col(vecCol), col("__list").as("list_id"))
  }

  /** Top-k cosine neighbors probing the nProbe nearest lists per query.
    * `queries` must be small (a probe batch) — its list assignment is
    * computed driver-side against the centroid set. */
  def searchTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nLists: Int, nProbe: Int,
      seed: Long = 42L): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._

    val vecs = corpus.withColumn("__features",
      array_to_vector(col(vecCol).cast("array<double>")))
    val model = new KMeans().setK(nLists).setSeed(seed)
      .setFeaturesCol("__features").setPredictionCol("__list")
      .fit(vecs)
    val assigned = model.transform(vecs)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        col("__list").as("list_id"))
      .withColumn("cn", sqrt(Similarity.dot(col("cv"), col("cv"))))

    val centroids: Array[(Int, Array[Double])] =
      model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }

    // driver-side probe-list selection for the small query batch
    val probePairs = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .as[(Long, Array[Float])].collect()
      .flatMap { case (qid, qv) =>
        centroids.map { case (lid, c) =>
          val d = c.zip(qv).map { case (x, y) => (x - y) * (x - y) }.sum
          (qid, lid, d)
        }.sortBy(_._3).take(nProbe).map { case (qid2, lid, _) => (qid2, lid) }
      }.toSeq
    val queriesDf = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", sqrt(Similarity.dot(col("qv"), col("qv"))))
    val probes = probePairs.toDF("query_id", "list_id")
      .join(queriesDf, Seq("query_id"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    assigned.join(broadcast(probes), Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 4).as("cosine"), col("rk"))
  }
}
