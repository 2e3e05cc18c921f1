package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exponential time-decay aggregation — the recency-weighted
  * engagement/affinity score every feature store ships (recent events
  * count more; a user's score halves every `halfLifeDays` of
  * inactivity): score(k) = Σ_events value · 2^(−age/halfLife).
  *
  * Exactness discipline: ages are quantized to WHOLE half-life
  * multiples DOWNWARD from the reference instant (integer day-bucket
  * ages ÷ half-life in integer arithmetic), so every weight is
  * 2^(−n) for integer n — an EXACT double power of two, and the
  * per-event weighted value quantizes to BIGINT µ-units before the
  * sum. No `pow(2, fractional)` libm call, no float accumulation
  * order, no engine disagreement: the score is a pure integer
  * function of (value, age bucket). The modeling cost — decay steps
  * down per whole half-life instead of continuously — is stated, not
  * hidden; halve `halfLifeDays`... for finer steps.
  *
  * Shape for 100 TB: weight and µ-quantization are per-row codegen;
  * ONE partial-aggregatable hash aggregate on the entity key. Events
  * AFTER the reference instant are excluded (a "future" event has no
  * business inflating a score computed as-of `asOfUs`); null values
  * drop with their row.
  */
object DecayAgg {

  /** @param asOfUs      reference instant (unix µs); ages measured back
    *                    from it, events at/after it excluded
    * @param halfLifeDays whole days per halving, ≥ 1
    * @return (keys..., n_events, score_micro) — score in µ-units,
    *         score_micro = Σ round(value·10⁶)·2^(−⌊age_days/halfLife⌋)
    *         summed in BIGINT. */
  def decayScore(df: DataFrame, keys: Seq[String], tsCol: String,
                 valCol: String, asOfUs: Long,
                 halfLifeDays: Int): DataFrame = {
    require(keys.nonEmpty, "need at least one key")
    require(halfLifeDays >= 1, s"halfLifeDays must be >= 1: $halfLifeDays")
    // INTEGER division end to end: a double divide + cast would
    // truncate in Spark but ROUND in DuckDB's CAST — `div`/`//` agree
    // exactly on these non-negative operands
    val ageExpr = s"(${asOfUs}L - unix_micros($tsCol)) div 86400000000L"
    // clamp BEFORE the INT cast: a corrupt far-past epoch could
    // overflow INT and flip the sign, turning 2^(−n) into a huge
    // weight instead of 0 — and every weight below 2^−1075 is exactly
    // 0.0 in IEEE anyway, so the clamp at 1100 never changes a score
    val halvings =
      expr(s"CAST(least(($ageExpr) div $halfLifeDays, 1100L) AS INT)")
    // 2^(−n) for integer n is exact in IEEE; the product with the
    // µ-quantized value is one rounding, identical in any engine
    val weight = pow(lit(2.0), -halvings.cast("double"))
    val contrib = floor(
      floor(col(valCol) * lit(1000000L) + lit(0.5)) * weight + lit(0.5))
      .cast("long")
    df.filter(col(valCol).isNotNull &&
        unix_micros(col(tsCol)) < lit(asOfUs))
      .select(keys.map(col) :+ contrib.as("c"): _*)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_events"), sum(col("c")).as("score_micro"))
  }
}
