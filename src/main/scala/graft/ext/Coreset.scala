package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy k-center coreset selection — the diverse-subset primitive a
  * curation pipeline runs to pick REPRESENTATIVE exemplars (seed sets
  * for active learning, eval panels, dedup anchors): start from the
  * lowest id, repeatedly add the point FARTHEST from every chosen
  * center (the classic 2-approximation to the k-center objective,
  * Gonzalez 1985), emitting each pick's max-min radius — the coverage
  * guarantee drops monotonically and the final radius bounds every
  * remaining point's distance to its nearest exemplar.
  *
  * Deterministic and integer-exact on the shared 10⁻⁶ grid: distances
  * are exact BIGINT Σ(q−q')², the farthest-point argmax ties to the
  * LOWEST id, so selection order and radii replay in SQL
  * (q_coreset — unrolled rounds, the k-means oracle discipline). If k
  * exceeds the number of distinct points the tail picks are
  * zero-radius duplicates in id order — still deterministic.
  *
  * Scale shape: the component frame materializes once; per round ONE
  * broadcast join against the newly chosen center's D components +
  * one partial-aggregated distance sum folded into the running
  * min-distance frame (localCheckpoint — it feeds every later round),
  * and one TakeOrdered(1) argmax. Driver state is the k chosen ids —
  * the bounded-collect budget. Total work k corpus passes; k is the
  * coreset size, inherently small.
  */
object Coreset {

  /** (vec_id, rk, radius): the selection order and each pick's
    * max-min distance at the moment it was chosen (rk 0 = the seed,
    * radius 0 by convention). */
  def kCenter(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val spark = vecs.sparkSession
    import spark.implicits._
    // LAZY checkpoints throughout this loop (the starEdges discipline):
    // the action right after each one — the seed agg here, the argmax
    // TakeOrdered per round below — scans every partition, so it both
    // materializes the blocks (one job, not two) and reads them
    val comp = PqIndex.comps(vecs, idCol, vecCol, m = 1)
      .select(col("vid"), col("pos"), col("q")).localCheckpoint(false)
    val seedRow = comp.agg(min(col("vid"))).head()
    require(!seedRow.isNullAt(0), "Coreset needs a non-empty vector frame")
    val seed = seedRow.getLong(0)

    def distTo(center: Long): DataFrame = {
      val c = comp.filter(col("vid") === center)
        .select(col("pos"), col("q").as("cq"))
      val diff = col("q") - col("cq")
      comp.join(broadcast(c), "pos")
        .groupBy(col("vid"))
        .agg(sum(diff * diff).as("d"))
    }

    var dmin = distTo(seed).withColumnRenamed("d", "dmin")
      .localCheckpoint(false)
    val picks = scala.collection.mutable.ArrayBuffer((seed, 0, 0L))
    (1 until k).foreach { r =>
      val far = dmin.orderBy(col("dmin").desc, col("vid")).limit(1)
        .head()
      picks += ((far.getLong(0), r, far.getLong(1)))
      if (r < k - 1)
        dmin = dmin.join(distTo(far.getLong(0)), "vid")
          .select(col("vid"), least(col("dmin"), col("d")).as("dmin"))
          .localCheckpoint(false)
    }
    picks.toSeq.toDF(idCol, "rk", "radius")
  }

  /** Assign every point to its nearest chosen exemplar — the coverage
    * map that makes a coreset actionable (strata for sampling, routing
    * keys, per-exemplar quotas): (vec_id, exemplar_id, sqdist), ties
    * to the lowest exemplar id. One broadcast join against the
    * exemplars' k·D components + one partial-aggregated argmin — the
    * [[PqIndex.assign]] shape with exemplar ids as the codebook. */
  def assign(vecs: DataFrame, idCol: String, vecCol: String,
      exemplarIds: Seq[Long]): DataFrame = {
    require(exemplarIds.nonEmpty, "at least one exemplar id")
    val comp = PqIndex.comps(vecs, idCol, vecCol, m = 1)
      .select(col("vid"), col("pos"), col("q"))
    val cents = comp
      .filter(col("vid").isin(exemplarIds.map(Long.box): _*))
      .select(col("vid").as("cid"), col("pos"), col("q").as("cq"))
    // a silently empty coverage map (no exemplar id present in the
    // frame) would read as "nothing to assign" — raise instead
    require(!cents.isEmpty,
      "none of the exemplar ids exist in the vector frame")
    val diff = col("q") - col("cq")
    comp.join(broadcast(cents), "pos")
      .groupBy(col("vid"), col("cid"))
      .agg(sum(diff * diff).as("d"))
      .groupBy(col("vid"))
      .agg(min(struct(col("d"), col("cid"))).as("a"))
      .select(col("vid").as(idCol), col("a.cid").as("exemplar_id"),
        col("a.d").as("sqdist"))
  }
}
