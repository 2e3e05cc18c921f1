package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J11 — multi-dimension alarm dispatch (the reference walks each ALARM's
  * dimension list in order, takes the FIRST dimension present in its
  * `DIM_TO_LABEL` registry, resolves the matching vertex by that label's
  * key property, and marks it degraded:
  * lambda/etl_aws/neptune_etl_aws.py:2074-2105).
  *
  * Spark-first shape: one posexplode of the dimension array, a broadcast
  * join against the (tiny) dimension registry, a ranked window to keep each
  * alarm's first mappable dimension, then a UNION of per-label joins — each
  * planned as a broadcast hash join with the alarm side broadcast, because
  * at scale the resource tables are the 100 TB side and active alarms are
  * thousands at most.
  */
object AlarmDispatch {

  /** One registry row: dimension name → (vertex label, resource table,
    * resource key column). The key is compared as a STRING on both sides —
    * dimension values arrive as text and may be non-numeric garbage, which
    * must skip (never error) under ANSI casting.
    */
  final case class Dim(dimName: String, label: String,
      resources: DataFrame, keyCol: String)

  /** Dispatch `alarms` (alarm_id, alarm_name, dims: array<struct<d_name,
    * d_value>>) through the registry. Returns one row per (alarm, matched
    * resource): alarm_id, alarm_name, label, resource_key.
    *
    * ONE broadcast hash join: the per-label resource tables contribute a
    * unioned (label, key) frame — each table scanned exactly once, however
    * many dimensions the registry maps — and the alarm side (tiny) is
    * broadcast into it. A per-label join loop would re-derive the alarm
    * window once per label (Spark 4.1 AQE does not reuse sibling stages,
    * PERF.md) and scale linearly in registry size for no benefit.
    */
  def apply(alarms: DataFrame, registry: Seq[Dim]): DataFrame = {
    val spark = alarms.sparkSession
    import spark.implicits._
    val mapDf = broadcast(
      registry.map(d => (d.dimName, d.label)).toDF("d_name", "label"))
    // first valid dimension per alarm: valid = non-empty value AND mapped
    val firstDim = alarms
      .select(col("alarm_id"), col("alarm_name"),
        posexplode(col("dims")).as(Seq("pos", "d")))
      .select(col("alarm_id"), col("alarm_name"), col("pos"),
        col("d.d_name").as("d_name"), col("d.d_value").as("d_value"))
      .filter(col("d_value").isNotNull && col("d_value") =!= "")
      .join(mapDf, Seq("d_name"))
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("alarm_id")).orderBy(col("pos"))))
      .filter(col("rn") === 1)
      .select(col("alarm_id"), col("alarm_name"), col("label"),
        col("d_value").as("resource_key"))
    val keyedResources = registry.map { d =>
      d.resources.select(lit(d.label).as("label"),
        col(d.keyCol).cast("string").as("resource_key"))
    }.reduce(_ unionByName _)
    keyedResources
      .join(broadcast(firstDim), Seq("label", "resource_key"))
      .select(col("alarm_id"), col("alarm_name"), col("label"),
        col("resource_key"))
  }

  /** Collapse dispatch rows to one degraded mark per resource (the
    * reference's `health_status=degraded` write, made deterministic by
    * aggregating instead of last-writer-wins).
    */
  def degraded(dispatched: DataFrame): DataFrame =
    dispatched
      .groupBy(col("label"), col("resource_key"))
      .agg(count(lit(1)).as("n_alarms"), min(col("alarm_name")).as("alarm_name"))
      .withColumn("health_status", lit("degraded"))
}
