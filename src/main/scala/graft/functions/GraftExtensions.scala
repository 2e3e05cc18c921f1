package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** `SparkSessionExtensions` entry point — wire the engine's native
  * expressions into any session via
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), making them available to pure
  * SQL users as well as the DataFrame API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("ipv4_str"),
      IPv4String.info,
      (children: Seq[Expression]) => IPv4String.build(children)))
    ext.injectFunction((
      FunctionIdentifier("decimal_dot"),
      DecimalDot.info,
      (children: Seq[Expression]) => DecimalDot(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      NfcNormalize.info,
      (children: Seq[Expression]) => NfcNormalize.build(children)))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      BloomMightContain.info,
      (children: Seq[Expression]) => BloomMightContain.build(children)))
    ext.injectFunction((
      FunctionIdentifier("mg_candidates"),
      MisraGriesAgg.info,
      (children: Seq[Expression]) => MisraGriesAgg.build(children)))
    // DISTINCT-over-sharded-warehouse dedup rewrite: runs in the
    // fixed-point operator-optimization batch, which precedes the
    // early-pushdown batch where V2ScanRelationPushDown builds the
    // scan — so the inner grouping-only Aggregate it plants is what
    // the source sees and pushes per shard
    ext.injectOptimizerRule(_ => graft.plans.DistinctAggThroughShards)
  }
}
