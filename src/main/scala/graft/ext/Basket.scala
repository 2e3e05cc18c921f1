package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence with lift — the item↔item association
  * signal behind "bought together" recommenders and feature-pair
  * mining:
  *
  *   lift(a, b) = P(a,b) / (P(a)·P(b)) = n_ab·N / (n_a·n_b)
  *
  * over baskets (N = basket count, n_x = baskets containing x, n_ab =
  * baskets containing both). Lift > 1 ⇒ positive association.
  *
  * Determinism: all four counts are exact BIGINTs; the lift emits via
  * the exact half-up integer division ([[TextAnalysis.halfUp4]]), whose
  * own exactness bound governs: the double division needs
  * 2·n_ab·N·10⁴ < 2⁵³, i.e. n_ab·N ≲ 4.5·10¹¹ — e.g. 10⁶ baskets with
  * pair supports to 4·10⁵. Beyond that the floor can round across the
  * boundary (and differently per engine); shard or rescale first.
  *
  * Shape for 100 TB: the fact table is aggregated ONCE into per-basket
  * sorted item sets (one shuffle on the basket key, `collect_set`
  * dedups in the same pass) and that frame is materialized — pair
  * expansion, item supports, and the basket count N all derive from the
  * materialized blocks, so the corpus is scanned and shuffled exactly
  * once (an earlier three-branch formulation re-scanned it for each).
  * Pair expansion is in-row, bounded by each basket's own size — never
  * a self-join of the fact table; supports and N broadcast. Baskets
  * with pathological sizes should be capped upstream (a 10⁶-item
  * basket contributes ~10¹² pairs regardless of engine).
  */
object Basket {

  /** @return (item_a, item_b, n_ab, n_a, n_b, lift) for pairs with
    *         `n_ab ≥ minSupport`, item_a < item_b. */
  def pairLift(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 1L): DataFrame = {
    require(minSupport >= 1, "minSupport must be >= 1")
    val baskets = df.select(col(basketCol).as("b"), col(itemCol).as("i"))
    // ONE corpus shuffle: per-basket deduped sorted sets, materialized —
    // pairs, supports and N all read the checkpointed blocks
    val sets = baskets.groupBy(col("b"))
      .agg(sort_array(collect_set(col("i"))).as("is"))
      .localCheckpoint()
    val pairs = sets
      .select(explode(expr(
        """flatten(transform(is, (x, j) ->
          |  transform(slice(is, j + 2, size(is)), y -> struct(x, y))))"""
          .stripMargin)).as("p"))
      .groupBy(col("p.x").as("item_a"), col("p.y").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    val support = sets.select(explode(col("is")).as("i"))
      .groupBy(col("i")).agg(count(lit(1)).as("n"))
    val total = sets.agg(count(lit(1)).as("n_baskets"))
    pairs
      .join(broadcast(support.select(col("i").as("item_a"), col("n").as("n_a"))),
        Seq("item_a"))
      .join(broadcast(support.select(col("i").as("item_b"), col("n").as("n_b"))),
        Seq("item_b"))
      .crossJoin(broadcast(total))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        TextAnalysis.halfUp4(col("n_ab") * col("n_baskets"),
          col("n_a") * col("n_b")).as("lift"))
  }
}
