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
  * localCheckpoint so step t+1 reads blocks, not a t-deep plan —
  * LAZY (localCheckpoint(false)): the SQL plan is truncated at
  * checkpoint creation either way, and with no per-step action the
  * final union's ONE job materializes every step's blocks instead of
  * paying a blocking job per step (fixed-step loops only; loops with
  * per-round convergence actions pair the lazy checkpoint with that
  * action — the Components/Coreset discipline).
  *
  * Dead ends cannot occur (symmetrization gives every present node
  * degree ≥ 1), so every walk has exactly `walkLen`+1 rows. Emits
  * (walk_id BIGINT = start node, step INT, node BIGINT).
  */
object Walks {

  def deterministicWalks(edges: DataFrame, srcCol: String, dstCol: String,
      walkLen: Int): DataFrame = {
    require(walkLen >= 1, "walkLen must be >= 1")

    val sym = Graphs.symmetrized(edges, srcCol, dstCol)

    var frontier = sym.select(col("src").as("walk_id")).distinct()
      .select(col("walk_id"), col("walk_id").as("node"))
      .localCheckpoint(false)
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
        .localCheckpoint(false)
      trail ::= frontier.withColumn("step", lit(t))
    }
    trail.reduce(_ union _)
      .select(col("walk_id"), col("step"), col("node"))
  }

  /** node2vec-style second-order biased walks with INTEGER bias
    * weights — [[deterministicWalks]]' (p, q)-biased sibling: from node
    * u with previous node prev, a candidate neighbor v weighs
    * `wReturn` if v = prev (the 1/p "go back" knob), `wCommon` if v is
    * also adjacent to prev (BFS-ish triangle closure), else `wForward`
    * (the 1/q DFS knob). Rational node2vec (p, q) scale to integers —
    * (p=2, q=1/2) is (wReturn, wCommon, wForward) = (1, 2, 4).
    *
    * The weighted pick stays deterministic AND exactly weighted by
    * salt replication: candidate v enters the argmin once per weight
    * unit (md5("walk:t:v:r") for r < w), so P(v) = w_v / Σw under the
    * uniform-hash argument of [[deterministicWalks]] — no
    * transcendental key functions (an Efraimidis–Spirakis u^(1/w) key
    * would hang engine parity on libm ulps; integer replication keeps
    * the SQL oracle bit-exact).
    *
    * Per step: the frontier join as in [[deterministicWalks]], plus ONE
    * adjacency probe join on (v, prev) against the edge set — the
    * honest extra cost of second-order bias (node2vec pays it as a
    * per-edge alias table; here it is a co-partitioned join, no
    * precomputed per-node state). Replication multiplies candidate
    * ROWS by ≤ max(w), in-row via explode before the partial-agg
    * argmin — hub-safe as before. Step 1 has no prev and uses the
    * first-order coin.
    *
    * Emits (walk_id, step, node) — same shape as [[deterministicWalks]]
    * (and identical output when all three weights are equal, which the
    * spec pins).
    */
  def biasedWalks(edges: DataFrame, srcCol: String, dstCol: String,
      walkLen: Int, wReturn: Int, wCommon: Int, wForward: Int): DataFrame = {
    require(walkLen >= 1, "walkLen must be >= 1")
    require(wReturn >= 1 && wCommon >= 1 && wForward >= 1,
      "bias weights must be >= 1 (scale rational (p, q) to integers)")

    val sym = Graphs.symmetrized(edges, srcCol, dstCol)

    // step 1: first-order pick (no prev), same coin as the unbiased walk
    val start = sym.select(col("src").as("walk_id")).distinct()
      .select(col("walk_id"), col("walk_id").as("node"))
      .localCheckpoint(false)
    var frontier = sym
      .join(start, col("src") === col("node"))
      .groupBy(col("walk_id"))
      .agg(min(struct(md5(concat_ws(":",
          col("walk_id").cast("string"), lit("1"),
          col("dst").cast("string"))).as("h"),
        col("dst").as("v"))).as("m"))
      // prev for step 2 is the start node, which IS the walk id
      .select(col("walk_id"), col("m.v").as("node"),
        col("walk_id").as("prev"))
      .localCheckpoint(false)
    var trail = List(
      start.withColumn("step", lit(0)).select(col("walk_id"), col("step"), col("node")),
      frontier.withColumn("step", lit(1)).select(col("walk_id"), col("step"), col("node")))

    (2 to walkLen).foreach { t =>
      val cand = sym.join(frontier, col("src") === col("node"))
        .select(col("walk_id"), col("prev"), col("dst").as("v"))
      // adjacency probe: is the candidate also a neighbor of prev?
      val adjProbe = sym.select(col("src").as("v"), col("dst").as("prev"),
        lit(true).as("is_adj"))
      val weighted = cand.join(adjProbe, Seq("v", "prev"), "left_outer")
        .withColumn("w",
          when(col("v") === col("prev"), lit(wReturn))
            .when(col("is_adj"), lit(wCommon))
            .otherwise(lit(wForward)))
      // replica 0 keeps the UNSALTED first-order coin, so all-equal
      // weights reproduce deterministicWalks bit-for-bit (spec-pinned);
      // replicas r ≥ 1 salt with their index — all strings distinct,
      // the weighted-uniform argument unchanged
      val base = concat_ws(":",
        col("walk_id").cast("string"), lit(t).cast("string"),
        col("v").cast("string"))
      val coin = when(col("r") === 0, md5(base))
        .otherwise(md5(concat_ws(":", base, col("r").cast("string"))))
      frontier = weighted
        .select(col("walk_id"), col("v"),
          explode(sequence(lit(0), col("w") - 1)).as("r"))
        .groupBy(col("walk_id"))
        .agg(min(struct(coin.as("h"), col("v").as("vv"))).as("m"))
        .select(col("walk_id"), col("m.vv").as("node"))
        .join(frontier.select(col("walk_id"), col("node").as("prev")), "walk_id")
        .localCheckpoint(false)
      trail ::= frontier.withColumn("step", lit(t))
        .select(col("walk_id"), col("step"), col("node"))
    }
    trail.reduce(_ union _)
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
