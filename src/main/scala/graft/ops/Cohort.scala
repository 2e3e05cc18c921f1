package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention — the activation/stickiness report: group entities
  * by their first-activity date (the cohort), then count how many of
  * each cohort are active again N days later. The output is the classic
  * retention triangle (cohort_date × day_offset → n_users).
  *
  * Shape for 100 TB: one aggregate finds each entity's cohort (shuffle
  * on the entity key), the distinct activity grid shuffles on the same
  * key, and the join stays co-partitioned before the final small
  * aggregate on (cohort, offset) — nothing driver-side, no window. The
  * output is bounded by cohorts × horizon, independent of corpus size.
  * Day granularity is deliberate: calendar-date truncation (not
  * fixed-width buckets from an epoch) matches how retention is read,
  * and `to_date`/`datediff` are exact integer calendar arithmetic in
  * any engine.
  */
object Cohort {

  /** @return (cohort_date, day_offset, n_users) — distinct entities of
    *         the cohort active at that offset; offset 0 is the cohort
    *         size itself. */
  def retention(df: DataFrame, entityCol: String, tsCol: String): DataFrame = {
    val e = col(entityCol)
    val firstDay = df.groupBy(e)
      .agg(min(to_date(col(tsCol))).as("cohort_date"))
    val active = df.select(e, to_date(col(tsCol)).as("d")).distinct()
    active.join(firstDay, Seq(entityCol))
      .groupBy(col("cohort_date"),
        datediff(col("d"), col("cohort_date")).cast("long").as("day_offset"))
      // plain count, not countDistinct: `active` is already distinct on
      // (entity, day) and offset is a bijection of day per entity, so
      // each entity appears at most once per group — a distinct
      // aggregate here would pay the two-phase expansion for nothing
      .agg(count(lit(1)).as("n_users"))
  }
}
