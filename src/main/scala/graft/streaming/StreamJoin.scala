package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time interval join — click→conversion attribution
  * as a continuous computation: every purchase joins the clicks of the
  * same user that happened within the attribution window before it.
  *
  * Semantics are the plain interval join (same shape as
  * [[graft.ops.RangeJoin]]'s bucketless special case), so the transform
  * runs identically over batch frames; on streaming frames Spark keeps
  * both sides' state and the time-range condition + watermarks bound it:
  * a click older than `watermark + within` can never match a future
  * purchase and its state is dropped. Without the range condition the
  * state would grow forever — the condition IS the 100 TB contract.
  *
  * State shape at scale: state is partitioned by the join key (user),
  * held per-key only for the attribution window — size is
  * O(event rate × window), independent of history length.
  */
object StreamJoin {

  /** Inner interval join: (click, purchase) pairs of the same `keyCol`
    * with `0 ≤ purchase.ts − click.ts ≤ within`. Both inputs need a
    * `ts` timestamp column; `within`/`watermark` are SQL interval
    * strings (e.g. "1 hour"). Works on batch AND streaming frames
    * (batch frames ignore watermarks by definition).
    */
  def attribution(clicks: DataFrame, purchases: DataFrame, keyCol: String,
      within: String = "1 hour", watermark: String = "10 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark).alias("c")
    val p = purchases.withWatermark("ts", watermark).alias("p")
    c.join(p,
      expr(s"c.$keyCol = p.$keyCol AND " +
        s"p.ts >= c.ts AND p.ts <= c.ts + INTERVAL $within"))
      .select(col(s"c.$keyCol").as(keyCol),
        col("c.ts").as("click_ts"),
        col("p.ts").as("purchase_ts"),
        col("p.value").as("purchase_value"))
  }
}
