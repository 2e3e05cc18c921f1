package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J12 — monitor→instance metric dispatch by VPC membership, with a cross
  * fallback for monitors that declare no VPC (the reference inherits a
  * monitor's metrics to every EC2 in its local-resource VPCs, or to ALL
  * instances when the monitor lists none:
  * lambda/etl_aws/neptune_etl_aws.py:1041-1070).
  *
  * Scale shape: the equi path is a broadcast hash join (monitor/VPC tables
  * are tiny against the instance corpus); the cross product exists ONLY for
  * the no-VPC monitor subset, which is broadcast — a
  * BroadcastNestedLoopJoin whose build side is at most "a handful of
  * monitors", never instances × monitors at large.
  */
object VpcDispatch {

  /** @param instances   big side; must carry `vpcCol`
    * @param monitors    (monitorKey, payload…) — small, broadcast
    * @param monitorVpcs exactly (monitorKey, vpcCol) membership rows —
    *                    monitors absent here are the cross-fallback set
    */
  def apply(instances: DataFrame, vpcCol: String,
      monitors: DataFrame, monitorKey: String,
      monitorVpcs: DataFrame): DataFrame = {
    // membership is SET semantics (the reference collects vpc ids into a
    // set) — dedupe defensively so a repeated (monitor, vpc) row can't
    // duplicate dispatch output
    val members = monitorVpcs.select(col(monitorKey), col(vpcCol)).distinct()
    val equi = instances
      .join(broadcast(members), Seq(vpcCol))
      .join(broadcast(monitors), Seq(monitorKey))
      .withColumn("via", lit("vpc"))
    val orphan = monitors.join(
      monitorVpcs.select(col(monitorKey)).distinct(), Seq(monitorKey), "left_anti")
    val fallback = instances
      .crossJoin(broadcast(orphan))
      .withColumn("via", lit("fallback"))
    equi.unionByName(fallback)
  }
}
