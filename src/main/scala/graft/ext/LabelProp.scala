package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation over an undirected edge list — the
  * lightweight community-detection pass (near-linear per round) used to
  * group related documents/entities before per-community sampling or
  * spam triage. Complements [[Components]]: components find *reachable*
  * groups, label propagation finds *densely linked* ones.
  *
  * Round semantics (deterministic by construction): every node starts
  * labeled with its own id; each round, every node simultaneously adopts
  * the most frequent label among its NEIGHBORS, ties broken by the
  * smallest label. Fixed `rounds` keeps the operator oracle-expressible
  * (unrolled CTEs — the same pattern as the integer PageRank and KCore)
  * and the plan depth bounded; classic LPA oscillation on bipartite-ish
  * structures is a property of the synchronous update, not a bug, and
  * bounded rounds make it reproducible.
  *
  * Shape for 100 TB: per round ONE join of the (materialized) symmetric
  * edge list against the label frame, then TWO hash aggregates —
  * (node, label) counts, then per-node argmax folded into a single
  * `max(struct(cnt, −label))` (partial-aggregatable, no window, so a
  * celebrity node's label votes combine map-side instead of sorting one
  * giant partition). Only the EDGE list is localCheckpoint'd (it is
  * re-joined every round); each round's label frame is consumed exactly
  * once by the next round, so the rounds chain as plain lineage — one
  * job, no per-round blocking materialization (measured ~2× faster at
  * sf0.1 than checkpointing every round). A depth guard checkpoints
  * every 8th round so pathological round counts cannot grow an
  * unplannable lineage.
  *
  * Labels must be non-negative longs (< 2⁶³): the argmax negates the
  * label inside a BIGINT struct field.
  */
object LabelProp {

  /** @return (node, label) after `rounds` synchronous updates. */
  def propagate(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val u = col(srcCol)
    val v = col(dstCol)
    // one-pass symmetrize (explode, not union — a union would evaluate
    // an expensive upstream edge computation twice), then materialize:
    // the edge list is re-joined every round
    val sym = edges
      .where(u =!= v)
      .select(explode(array(
        struct(u.cast("long").as("a"), v.cast("long").as("b")),
        struct(v.cast("long").as("a"), u.cast("long").as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .distinct()
      .localCheckpoint()

    var labels = sym.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
    (1 to rounds).foreach { r =>
      labels = sym
        .join(labels.withColumnRenamed("node", "b"), Seq("b"))
        .groupBy(col("a").as("node"), col("label"))
        .agg(count(lit(1)).as("c"))
        // argmax (max count, tie → min label) as ONE aggregate:
        // struct comparison is lexicographic, so max(struct(c, −label))
        // picks the highest count and, within it, the smallest label
        .groupBy(col("node"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("label"))
      if (r % 8 == 0 && r < rounds) labels = labels.localCheckpoint()
    }
    labels
  }
}
