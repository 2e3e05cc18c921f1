package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contiguous event-sequence detection (CEP-lite): every occurrence of
  * the exact step chain s₁ → s₂ → … → sₙ as CONSECUTIVE events of one
  * entity, with each inter-step gap within `maxGapMicros` — the
  * "pattern match over event streams" face that [[Funnel.steps]]'
  * subsequence-conversion counts deliberately are not: funnels answer
  * "did the user EVER convert, in order", this answers "where exactly
  * did the uninterrupted sequence happen", which is what alert
  * correlation (scan → probe → exfiltrate), UX flow mining, and
  * labeled-episode extraction for sequence models consume.
  *
  * ONE window pass: events sorted per entity under the (ts, tieCol)
  * TOTAL order (ties on raw timestamps are real in event data — an
  * untied sort would make the match set partitioning-dependent), then
  * the n−1 step conditions fold into a single conjunction over
  * lead() columns. No self-joins, no per-pattern state machine; the
  * work is the sort the entity timeline needs anyway. Gap arithmetic
  * is exact BIGINT micros (`unix_micros` ≡ DuckDB `epoch_us`).
  *
  * Emits (entity, start_ts, end_ts) per match instance; overlapping
  * matches all emit (a-b-a-b-a with pattern a→b yields two).
  */
object EventSeq {

  def matchContiguous(events: DataFrame, entityCol: String, tsCol: String,
      tieCol: String, typeCol: String, steps: Seq[String],
      maxGapMicros: Long): DataFrame = {
    require(steps.size >= 2, "a sequence needs at least two steps")
    require(maxGapMicros > 0, "maxGapMicros must be positive")
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(tieCol))
    val n = steps.size
    val typeConds = (1 until n).map(k => lead(col(typeCol), k).over(w) === steps(k))
    val gapConds = (1 until n).map { k =>
      val prevTs = if (k == 1) col(tsCol) else lead(col(tsCol), k - 1).over(w)
      unix_micros(lead(col(tsCol), k).over(w)) - unix_micros(prevTs) <=
        maxGapMicros
    }
    val cond = (Seq(col(typeCol) === steps.head) ++ typeConds ++ gapConds)
      .reduce(_ && _)
    events
      .withColumn("end_ts_x", lead(col(tsCol), n - 1).over(w))
      .withColumn("match_x", cond)
      .where(col("match_x"))
      .select(col(entityCol).as("entity"), col(tsCol).as("start_ts"),
        col("end_ts_x").as("end_ts"))
  }
}
