package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RobustSpec extends SparkSpec {
  import spark.implicits._

  test("median/MAD on a hand-checked group") {
    // values 1..9 plus outlier 100: med = 5.5 over 10 values? use odd n
    // {1,2,3,4,5,6,7,8,100}: med=5, adev={4,3,2,1,0,1,2,3,95}, mad=2
    val df = Seq(1, 2, 3, 4, 5, 6, 7, 8, 100).map(v => ("g", v.toDouble))
      .toDF("grp", "v")
    val r = Robust.madProfile(df, Seq("grp"), "v", k = 3.0).head
    assert(r.getDouble(1) === 5.0 && r.getDouble(2) === 2.0)
    assert(r.getLong(3) === 1L && r.getLong(4) === 9L) // only 100 flags
  }

  test("the robust screen resists the contamination a z-score cannot") {
    // one huge outlier inflates σ enough that 3σ misses it less crisply
    // than 3·MAD; here we just pin that MAD stays at the clean spread
    val clean = (1 to 99).map(i => ("g", (i % 7).toDouble))
    val df = (clean :+ (("g", 1e9))).toDF("grp", "v")
    val r = Robust.madProfile(df, Seq("grp"), "v", k = 3.0).head
    assert(r.getDouble(2) <= 2.0) // MAD ignores the bomb
    assert(r.getLong(3) >= 1L)    // and still flags it
  }

  test("groups are independent and exact across partitionings") {
    val vals = (1 to 200).map(i => (s"g${i % 3}", math.sin(i.toDouble) * 10))
    val a = Robust.madProfile(vals.toDF("grp", "v"), Seq("grp"), "v", 2.5)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    val b = Robust.madProfile(
        vals.toDF("grp", "v").repartition(11, col("v")), Seq("grp"), "v", 2.5)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    assert(a === b && a.size === 3)
  }

  test("plan contract: medians come from sharded rank-select, never a " +
      "per-group window over the big input (review r15 #2)") {
    val df = (1 to 50).map(i => (s"g${i % 2}", i.toDouble)).toDF("grp", "v")
    val q = Robust.madProfile(df, Seq("grp"), "v", 3.0)
    val p = q.queryExecution.executedPlan.toString
    val windows = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.nonEmpty)
    assert(windows.forall(_.contains("__shard")),
      s"unsharded window in plan:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
  }
}
