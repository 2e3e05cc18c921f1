package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Offline mean-shift (changepoint) detection per series — the
  * CUSUM-style "where did this metric's level move" scan over a keyed
  * event stream: the monitoring/adjudication face that decides WHEN a
  * series changed, complementing [[graft.ext.Drift]] (which decides
  * whether two corpus snapshots differ) and `q_zscore` (which flags
  * single outlier points, not level shifts).
  *
  * Statistic, integer-exact: with per-series quantized values x_1..x_n
  * in the (ts, id) total order, prefix sums P_i and total T, the scaled
  * cumulative deviation is
  *
  *   S_i = n·P_i − i·T   ( = n² · CUSUM_i where CUSUM_i is the usual
  *                         Σ_{j≤i}(x_j − mean), kept in BIGINT by
  *                         multiplying the mean out — no division, no
  *                         IEEE accumulation order to disagree on )
  *
  * The estimated changepoint is argmax_i |S_i| (ties → earliest i),
  * the standard CUSUM location estimator for a single mean shift.
  * S is invariant under a constant level shift of the whole series
  * (adding c: n(P_i+ic) − i(T+nc) = S_i) and scales linearly with the
  * values — both pinned by ChangepointSpec as algebraic properties.
  *
  * Shape for 100 TB: ONE shuffle on the series key; the ordered prefix
  * sum, the unordered series totals, and the argmax row_number all ride
  * the same hash partitioning (Spark plans a single Exchange, then
  * window sorts within partitions). Series count is the parallelism
  * unit — many medium series (users, hosts, shards) is the sweet spot;
  * a single giant series would serialize in any engine's ordered scan.
  *
  * Overflow: |S_i| ≤ n · Σ|x| — at 1e6 rows/series and |x| ≤ 1e7 the
  * bound is 1e19·… callers with hotter series pass a smaller `scale`.
  * Reference shape being extended: the A3/A10 per-series metric
  * profiles (etl_deepflow:536-568) — same keyed-window discipline, new
  * statistic.
  */
object Changepoint {

  /** Per-series CUSUM changepoint estimate.
    *
    * @param keyCol series key (one result row per distinct key)
    * @param tsCol  event-time column (primary order within a series)
    * @param idCol  unique tie-breaker — without it the prefix order at
    *               equal timestamps would be run-dependent
    * @param valCol numeric column; quantized as floor(v·scale + 0.5)
    *               (half-up — IEEE-identical in any engine) into BIGINT
    * @return (key, n, cp_idx, cp_us, s_abs): series length, 1-based
    *         argmax position, its event-time in unix µs, and |S| there.
    *         Series of length 1 report cp_idx=1 with s_abs=0 (S_1 =
    *         1·P_1 − 1·T = 0): a single point carries no shift evidence.
    */
  def cusum(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
            valCol: String, scale: Long = 1000L): DataFrame = {
    val q = floor(col(valCol) * lit(scale) + lit(0.5)).cast("long")
    val series = Window.partitionBy(keyCol)
    val ordered = series.orderBy(col(tsCol), col(idCol))

    // One Exchange on keyCol: the ordered frame (prefix sum, row index)
    // and the unbounded frame (n, T) share the partitioning; Spark
    // stacks the two Window operators on the same sort.
    // Null observations are dropped UP FRONT: a null would count in i
    // and n but vanish from P and T, so S_i = n·P_i − i·T would report
    // phantom shift evidence on an otherwise flat series.
    val scored = df
      .filter(col(valCol).isNotNull)
      .select(col(keyCol), col(tsCol), col(idCol), q.as("q"))
      .withColumn("i", row_number().over(ordered))
      .withColumn("p", sum(col("q")).over(
        ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(series))
      .withColumn("t", sum(col("q")).over(series))
      .withColumn("s_abs",
        abs(col("n") * col("p") - col("i") * col("t")))

    // argmax |S_i|, earliest index on ties — a third window on the SAME
    // key partitioning (no new shuffle), then one filter.
    val pick = Window.partitionBy(keyCol)
      .orderBy(col("s_abs").desc, col("i").asc)
    scored
      .withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .select(col(keyCol), col("n"),
        col("i").as("cp_idx"),
        unix_micros(col(tsCol)).as("cp_us"),
        col("s_abs"))
  }
}
