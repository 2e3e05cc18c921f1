package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ext.TextAnalysis
import graft.ops._

/** Thin compositions of library operators mirroring the reference's three
  * ETL entry points (SURVEY.md §3). Each stage is a pure
  * DataFrame→DataFrame function; no driver-side loops, no row-at-a-time
  * writes — the reference's ~180 serial HTTPS requests per run collapse
  * into one logical plan per pipeline.
  */
object Pipelines {

  /** §3.1 deepflow analog: flow facts → service-call edge batch.
    *
    * rollup (A1/A2/A15) → resolve src keys against the service dim with
    * INNER join semantics (unresolvable keys dropped, P5,
    * `etl_deepflow:675-680`) → metric-carrying edges.
    */
  def flowGraph(
      flows: DataFrame,
      serviceDim: DataFrame, // (service_key, service_name)
      srcCol: String,
      dstCol: String,
      valueCol: String,
      timePredicate: Column,
      errPredicate: Column
  ): DataFrame =
    FlowRollup(flows, srcCol, dstCol, valueCol, timePredicate, errPredicate)
      .join(broadcast(serviceDim), col(srcCol) === col("service_key"))
      .select(
        col("service_name").as("src_service"),
        col(dstCol).as("dst_service"),
        col("calls"), col("avg_value"), col("err_count"), col("p99_value"))

  /** §3.2 topology analog: a resource snapshot merged into the vertex
    * store, health degraded from the alarm join (two-phase write,
    * `etl_aws:1469,2074-2111`), then ghost-node GC (A14). Returns the new
    * vertex store state.
    *
    * If the store carries a `first_seen` column it gets the reference's
    * onCreate-vs-onMatch treatment (`etl_aws:209-253` mergeV onCreate
    * props): the batch never observes it (incoming NULL → absent-preserves
    * keeps the stored stamp) and a vertex created this run gets `runStamp`.
    */
  def topology(
      vertexStore: DataFrame, // (label, name, health_status, last_updated[, first_seen])
      snapshot: DataFrame,    // (label, name) live resources
      alarms: DataFrame,      // (label, name) currently alarming
      runStamp: Long
  ): DataFrame = {
    val hasFirstSeen = vertexStore.columns.contains("first_seen")
    val incoming0 = snapshot
      .withColumn("health_status", lit("healthy"))
      .withColumn("last_updated", lit(runStamp))
    val incoming =
      if (hasFirstSeen) incoming0.withColumn("first_seen",
        lit(null).cast(vertexStore.schema("first_seen").dataType))
      else incoming0
    val merged = MergeUpsert(
      vertexStore, incoming, keys = Seq("label", "name"),
      singleCols = Seq("health_status", "last_updated") ++
        (if (hasFirstSeen) Seq("first_seen") else Nil))
    val created =
      if (hasFirstSeen) merged.withColumn("first_seen",
        coalesce(col("first_seen"), lit(runStamp)))
      else merged
    val degraded = created.alias("m")
      .join(alarms.select(col("label"), col("name"), lit(true).as("alarming")),
        Seq("label", "name"), "left_outer")
      .select(col("label") +: col("name") +:
        when(col("alarming"), lit("degraded"))
          .otherwise(col("health_status")).as("health_status") +:
        col("last_updated") +:
        (if (hasFirstSeen) Seq(col("first_seen")) else Nil): _*)
    AntiJoinGC.retained(degraded, snapshot.select(col("label"), col("name")),
      Seq("label", "name"))
  }

  /** §3.2 run report: the reference accumulates per-step stats while it
    * writes (created/merged/degraded/GC'd counters, `etl_aws:1410,2113`)
    * and fences them into a post-run summary. Here the same report is ONE
    * audit row derived from the run's actual output — the final state is
    * full-outer key-joined against the prior store, so every counter is a
    * fact about THIS run (not a re-derivation that could drift from the
    * pipeline), nothing collects to the driver, and the report is itself
    * a DataFrame a monitoring sink can append.
    *
    * Columns: n_store_prior, n_created (in final, not in store),
    * n_matched (in both), n_gc (in store, dropped), n_degraded /
    * n_healthy (final health mix), n_final.
    */
  def topologyStats(
      vertexStore: DataFrame,
      snapshot: DataFrame,
      alarms: DataFrame,
      runStamp: Long
  ): DataFrame = {
    val finalState = topology(vertexStore, snapshot, alarms, runStamp)
    val st = vertexStore.select(col("label"), col("name"))
      .withColumn("in_store", lit(true))
    val fin = finalState
      .select(col("label"), col("name"), col("health_status"))
      .withColumn("in_final", lit(true))
    def countIf(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    st.join(fin, Seq("label", "name"), "full_outer")
      .agg(
        countIf(col("in_store")).as("n_store_prior"),
        countIf(col("in_final") && col("in_store").isNull).as("n_created"),
        countIf(col("in_final") && col("in_store")).as("n_matched"),
        countIf(col("in_store") && col("in_final").isNull).as("n_gc"),
        countIf(col("health_status") === "degraded").as("n_degraded"),
        countIf(col("health_status") === "healthy").as("n_healthy"),
        countIf(col("in_final")).as("n_final"))
  }

  /** §3.3 CFN analog: template documents → recursive ref extraction (F7) →
    * logical→physical resolution (J13) → provenance-stamped edges (K6). */
  def declaredDeps(
      templates: DataFrame,   // (stack_name, src_logical, template_json)
      physicalIds: DataFrame  // (logical_id, physical_id)
  ): DataFrame =
    templates
      .select(col("stack_name"), col("src_logical"),
        explode(RefExtract.refsUdf(col("template_json"))).as("dst_logical"))
      .join(broadcast(physicalIds.select(col("logical_id").as("src_logical"),
        col("physical_id").as("src_physical"))), Seq("src_logical"))
      .join(broadcast(physicalIds.select(col("logical_id").as("dst_logical"),
        col("physical_id").as("dst_physical"))), Seq("dst_logical"))
      .select(
        col("src_physical").as("src"),
        lit("DependsOn").as("edge_label"),
        col("dst_physical").as("dst"),
        lit("cfn").as("declared_in"),
        col("stack_name"))
      .distinct()
}
