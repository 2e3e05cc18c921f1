package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (radius) search over an embedding column: every (query,
  * neighbor) pair whose squared distance on the shared 10⁻⁶ grid is
  * ≤ `r2` — the FAISS `range_search` face of the ANN family, and the
  * primitive a dedup pipeline uses when the contract is "drop anything
  * within distance r of a probe", not "the k nearest" (top-k silently
  * truncates dense regions and pads sparse ones; a radius keeps the
  * guarantee symmetric).
  *
  * Integer-exact and engine-replayable: components quantize to the
  * engine-wide 10⁻⁶ grid (BIGINT, the [[PqIndex.comps]] convention) and
  * sqdist = Σ(q−q')² expands to qq − 2·qc + cc over three
  * [[Similarity.dot]] decimal folds. Every term is an integer: grid
  * values ≤ 10⁶ in magnitude, element products ≤ 10¹², and for
  * d ≤ 10³-dim vectors each fold ≤ 4·10¹⁵ < 2⁵³ — the doubles carrying
  * them are exact, so the BIGINT cast and the ≤ r2 cut replay
  * bit-for-bit in SQL (q_ann_radius).
  *
  * Scale shape ([[exact]]): the query batch is SMALL and broadcasts with
  * its grid vectors and pre-folded norms; the corpus is scanned ONCE
  * through a BroadcastNestedLoopJoin with all three dot products inside
  * whole-stage codegen, and no window, no shuffle, no per-component row
  * blowup (the [[Coreset.assign]] posexplode shape would multiply the
  * pair frame by the dimension). [[probed]] is the disk/100 TB path:
  * the same cut over only the `nProbe` IVF lists nearest each query —
  * probing rides [[IvfIndex]]'s static list pruning, so a persisted
  * index reads exactly the probed partitions.
  */
object RangeSearch {

  /** Quantize a float/double vector onto the 10⁻⁶ grid, kept as
    * array<double> (exact for |q| < 2⁵³) so [[Similarity.dot]] applies. */
  private def grid(v: Column): Column =
    transform(v, x =>
      round(x.cast("double") * lit(1000000.0)).cast("double"))

  /** Loud input validation (the [[PqIndex.comps]] posture): ragged or
    * null vectors would silently null out distances and drop pairs. */
  private def validate(df: DataFrame, vecCol: String, side: String): Unit = {
    // count(*) separately from the size stats: a min-null early return
    // would also pass a frame whose EVERY vector is NULL — exactly the
    // silent-drop this guard exists to catch (review r13, low)
    val stats = df
      .agg(count(lit(1)).as("n"), count(col(vecCol)).as("nVec"),
        min(size(col(vecCol))).as("mn"), max(size(col(vecCol))).as("mx"))
      .head()
    val n = stats.getLong(0)
    if (n == 0L) return // truly empty frame: result is just empty
    val nNull = n - stats.getLong(1)
    require(nNull == 0L,
      s"RangeSearch: $nNull $side row(s) carry a NULL $vecCol")
    require(stats.getInt(2) == stats.getInt(3),
      s"RangeSearch: ragged $side vectors " +
        s"(dims ${stats.getInt(2)}..${stats.getInt(3)})")
  }

  /** All (query_id, neighbor_id, sqdist) with sqdist ≤ r2 on the 10⁻⁶
    * grid, self-pairs excluded, sqdist exact BIGINT. One corpus pass;
    * `queries` must be a small probe batch (it broadcasts). */
  def exact(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, r2: Long): DataFrame = {
    require(r2 >= 0L, s"r2 must be >= 0: $r2")
    validate(corpus, vecCol, "corpus")
    validate(queries, vecCol, "query")
    val q = queries.select(col(idCol).cast("long").as("query_id"),
        grid(col(vecCol)).as("gq"))
      .withColumn("qq", Similarity.dot(col("gq"), col("gq")))
    val c = corpus.select(col(idCol).cast("long").as("neighbor_id"),
        grid(col(vecCol)).as("gc"))
      .withColumn("cc", Similarity.dot(col("gc"), col("gc")))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sqdist",
        (col("qq") - lit(2.0) * Similarity.dot(col("gq"), col("gc")) +
          col("cc")).cast("long"))
      .filter(col("sqdist") <= r2)
      .select(col("query_id"), col("neighbor_id"), col("sqdist"))
  }

  /** (query_id, list_id): each query's `nProbe` minimum-distance IVF
    * lists, selected DISTRIBUTED — every query row scores the (tiny,
    * broadcast) centroid table and a per-query window keeps the nProbe
    * nearest; the query batch never touches the driver. Arithmetic is
    * the SAME double fold as [[IvfIndex.search]]'s driver-side rule
    * (left-to-right Σ(c−q)², NaN components replaced by the 1e6
    * stand-in, zip-truncated dims), so the two faces probe identical
    * lists; ties break by (distance, list id). */
  private def probeSelect(model: IvfIndex.IvfModel, queries: DataFrame,
      idCol: String, vecCol: String, nProbe: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cents = model.centroids.toSeq.toDF("list_id", "centroid")
    val nc = least(size(col("centroid")), size(col("qv")))
    val qs = transform(slice(col("qv"), lit(1), nc),
      x => when(isnan(x), lit(1e6)).otherwise(x))
    val d = aggregate(
      zip_with(slice(col("centroid"), lit(1), nc), qs,
        (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)
    queries
      .select(col(idCol).cast("long").as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("d", d)
      .withColumn("prk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id")).orderBy(col("d"), col("list_id"))))
      .filter(col("prk") <= nProbe)
      .select(col("query_id"), col("list_id").cast("int").as("list_id"))
  }

  /** [[exact]] restricted to the `nProbe` IVF lists nearest each query —
    * the persisted/100 TB serve: an on-disk [[IvfIndex]] layout prunes to
    * exactly the probed `list_id=` partitions (static isin, the
    * [[IvfIndex.search]] contract). Approximate for nProbe < nLists
    * (recall = the probed lists' share of true neighbors, spec-bounded
    * as a subset of [[exact]]); nProbe ≥ nLists reproduces [[exact]]
    * row-for-row — the exhaustive-probe identity the driver row gates.
    *
    * Probe selection is DISTRIBUTED ([[probeSelect]] — the
    * [[IvfIndex.searchDistributed]] posture): an offline batch of any
    * size works, nothing query-sized ever reaches the driver. The only
    * collect is the DISTINCT probed-list set (≤ nLists ints — the
    * bounded payload static partition pruning needs). With
    * `broadcastProbes` (default) the (queries × nProbe)-row probe frame
    * broadcasts into the corpus join — pass false for huge offline
    * batches; both sides then shuffle on `list_id`. */
  def probed(model: IvfIndex.IvfModel, queries: DataFrame,
      idCol: String, vecCol: String, r2: Long, nProbe: Int,
      broadcastProbes: Boolean = true): DataFrame = {
    require(r2 >= 0L, s"r2 must be >= 0: $r2")
    require(nProbe >= 1, s"nProbe must be >= 1: $nProbe")
    validate(queries, vecCol, "query")
    val sel = probeSelect(model, queries, idCol, vecCol, nProbe)
      .localCheckpoint() // probe pairs reused: list-id prune + the join
    val q = queries.select(col(idCol).cast("long").as("query_id"),
        grid(col(vecCol)).as("gq"))
      .withColumn("qq", Similarity.dot(col("gq"), col("gq")))
    val probes0 = sel.join(q, Seq("query_id"))
    val probes = if (broadcastProbes) broadcast(probes0) else probes0
    val probedLists = sel.select(col("list_id")).distinct()
      .collect().map(_.getInt(0)).sorted
    model.assigned
      .filter(col("list_id").isin(probedLists.map(Int.box): _*))
      .select(col("neighbor_id"), grid(col("cv")).as("gc"), col("list_id"))
      .withColumn("cc", Similarity.dot(col("gc"), col("gc")))
      .join(probes, Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sqdist",
        (col("qq") - lit(2.0) * Similarity.dot(col("gq"), col("gc")) +
          col("cc")).cast("long"))
      .filter(col("sqdist") <= r2)
      .select(col("query_id"), col("neighbor_id"), col("sqdist"))
  }
}
