package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic random-walk corpus over an undirected graph — the
  * DeepWalk/node2vec input stage (walk sequences feed skip-gram
  * embedding training exactly like text feeds word2vec), and the same
  * primitive drives graph-aware negative sampling and neighborhood
  * sketches.
  *
  * "Random" without a seed: at step t, walk w standing on node u moves
  * to the neighbor v minimizing md5("w:t:v") — a per-(walk, step)
  * hash coin, so the walk corpus is a pure function of the graph
  * (engine-reproducible, shuffle-order-independent, and
  * oracle-replayable in SQL, where a Mersenne-seeded RNG is none of
  * those). Distributionally this is a uniform pick per step: the
  * minimum of iid hashes is uniform over the candidates, and
  * conditioning on (w, t) makes successive steps independent. Ties
  * (impossible for md5 in practice, but the contract must not depend
  * on that) break to the smaller node id via min(struct(hash, v)).
  *
  * Shape for 100 TB: the symmetrized edge list is materialized once
  * and re-joined per step ([[Components]] contract). Each step is ONE
  * join (frontier⋈edges on the current node key) + ONE
  * partial-aggregatable min(struct) per walk — a hub with 10⁸
  * neighbors contributes map-side partial minima, never a single-task
  * neighbor list (the same hot-key posture as [[LabelProp]]'s argmax
  * aggregate). Walk state is one row per walk; steps chain through
  * localCheckpoint so step t+1 reads blocks, not a t-deep plan.
  *
  * Dead ends cannot occur (symmetrization gives every present node
  * degree ≥ 1), so every walk has exactly `walkLen`+1 rows. Emits
  * (walk_id BIGINT = start node, step INT, node BIGINT).
  */
object Walks {

  def deterministicWalks(edges: DataFrame, srcCol: String, dstCol: String,
      walkLen: Int): DataFrame = {
    require(walkLen >= 1, "walkLen must be >= 1")

    val sym = edges
      .select(explode(array(
        struct(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst")),
        struct(col(dstCol).cast("long").as("src"), col(srcCol).cast("long").as("dst"))))
        .as("e"))
      .select(col("e.src"), col("e.dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()

    var frontier = sym.select(col("src").as("walk_id")).distinct()
      .select(col("walk_id"), col("walk_id").as("node"))
      .localCheckpoint()
    var trail = List(frontier.withColumn("step", lit(0)))

    (1 to walkLen).foreach { t =>
      val coin = md5(concat_ws(":",
        col("walk_id").cast("string"), lit(t).cast("string"),
        col("dst").cast("string")))
      frontier = sym
        .join(frontier, col("src") === col("node"))
        .groupBy(col("walk_id"))
        .agg(min(struct(coin.as("h"), col("dst").as("v"))).as("m"))
        .select(col("walk_id"), col("m.v").as("node"))
        .localCheckpoint()
      trail ::= frontier.withColumn("step", lit(t))
    }
    trail.reduce(_ union _)
      .select(col("walk_id"), col("step"), col("node"))
  }

  /** Skip-gram training pairs from a walk corpus — the consumer side of
    * [[deterministicWalks]] (DeepWalk trains word2vec on these exactly
    * as text does on token windows): every ordered (center, context)
    * node pair within `window` steps of each other on the same walk.
    *
    * One shuffle on walk_id, then an in-row expansion: each walk's
    * (step, node) rows collect to a walk-length-bounded array and the
    * window pairs explode from it — pairs never go through a join, and
    * the per-walk array is bounded by walkLen+1, not by the corpus.
    * Emits (center BIGINT, context BIGINT, n_pairs BIGINT) aggregated —
    * the multiplicity-weighted co-occurrence table embedding trainers
    * consume (a flat pair list is the same frame before the final
    * aggregate). */
  def skipGramPairs(walks: DataFrame, window: Int): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val perWalk = walks
      .groupBy(col("walk_id"))
      .agg(sort_array(collect_list(struct(col("step"), col("node"))))
        .as("path"))
    val n = size(col("path"))
    val pairs = flatten(transform(sequence(lit(0), n - 1), i =>
      transform(sequence(lit(0), n - 1), j =>
        struct(col("path")(i).getField("node").as("center"),
          col("path")(j).getField("node").as("context"),
          (i =!= j && abs(i - j) <= window).as("keep")))))
    perWalk
      .select(explode(pairs).as("p"))
      .where(col("p.keep"))
      .groupBy(col("p.center").as("center"), col("p.context").as("context"))
      .agg(count(lit(1)).as("n_pairs"))
  }
}
