package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact pairwise set-overlap profile between GROUPS — "how much
  * vocabulary do these sources share", the corpus diagnostic that
  * prices cross-source duplication pressure before dedup and explains
  * drift after mixing. For each unordered group pair: |A|, |B|,
  * |A∩B|, and exact Jaccard µ-units from those integers (union by
  * inclusion–exclusion — never materialized).
  *
  * Shape for 100 TB, and the reason this is not a join: the profile
  * is computed ELEMENT-KEYED — distinct (group, element) → per-element
  * group set (bounded by the GROUP count, not the corpus) → in-row
  * pair explode → one count per pair. Group sizes ride the same
  * distinct frame. Cost is O(distinct elements × groups-per-element²)
  * with tiny group counts in practice; a groups×groups join over
  * element sets would shuffle the vocabulary per pair instead.
  *
  * Elements per group are SETS by construction (the distinct collapse)
  * — multiplicity belongs to [[LexCosine]]/[[Dsir]], membership here.
  */
object GroupOverlap {

  /** @return one row per unordered group pair with ≥ 1 shared element:
    *         (g_a, g_b, n_a, n_b, n_common, jaccard_micro) — plus
    *         (via the sizes frame) pairs are NAMED by group value
    *         under its natural ordering, g_a < g_b. */
  def pairwise(df: DataFrame, groupCol: String,
               elemCol: String): DataFrame = {
    val ge = df.select(col(groupCol).cast("string").as("g"),
        col(elemCol).as("e"))
      .where(col("g").isNotNull && col("e").isNotNull)
      .distinct()
      .localCheckpoint() // feeds sizes AND the per-element group sets

    val sizes = ge.groupBy(col("g")).agg(count(lit(1)).as("n"))

    val common = ge
      .groupBy(col("e"))
      .agg(sort_array(collect_set(col("g"))).as("gs"))
      .where(size(col("gs")) >= 2)
      // in-row unordered pairs of the element's group set — bounded by
      // C(groups, 2), not by the vocabulary
      .select(explode(expr(
        "flatten(transform(gs, (x, i) -> " +
          "transform(slice(gs, i + 2, size(gs)), y -> struct(x, y))))"))
        .as("p"))
      .select(col("p.x").as("g_a"), col("p.y").as("g_b"))
      .groupBy(col("g_a"), col("g_b"))
      .agg(count(lit(1)).as("n_common"))

    common
      .join(sizes.select(col("g").as("g_a"), col("n").as("n_a")), "g_a")
      .join(sizes.select(col("g").as("g_b"), col("n").as("n_b")), "g_b")
      .select(col("g_a"), col("g_b"), col("n_a"), col("n_b"),
        col("n_common"),
        // exact Jaccard in µ-units: half-up INTEGER division (div, not
        // `/` — Spark's `/` on longs is a double divide) of 10⁶·common
        // by the inclusion–exclusion union. The numerator runs in
        // DECIMAL(38,0): 2·10⁶·n_common wraps BIGINT past ~4.6e12
        // shared elements — plausible at 100 TB vocabulary scale —
        // where DuckDB's HUGEINT stays exact (silent divergence); the
        // quotient is ≤ 10⁶ so the BIGINT cast back never overflows
        expr("CAST((2 * 1000000 * CAST(n_common AS DECIMAL(38,0)) " +
          "+ (n_a + n_b - n_common)) " +
          "div (2 * (n_a + n_b - n_common)) AS BIGINT)")
          .as("jaccard_micro"))
  }
}
