package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq(
    (1L, 0.0),   // on an interval's lo → included
    (2L, 10.0),  // on i1's hi → excluded from i1, inside i2
    (3L, 25.0),  // inside the bucket-spanning interval only
    (4L, 99.0)   // inside nothing
  ).toDF("pid", "t")

  private def intervals = Seq(
    ("i1", 0.0, 10.0),
    ("i2", 5.0, 15.0),   // overlaps i1
    ("i3", 18.0, 42.0)   // spans several width-8 buckets
  ).toDF("iid", "lo", "hi")

  test("inclusive lo, exclusive hi, overlaps and bucket-spanning intervals") {
    val out = RangeJoin.pointInInterval(points, intervals, Nil,
        "t", "lo", "hi", bucketWidth = 8.0)
      .select("pid", "iid").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "i1"), (2L, "i2"), (3L, "i3")))
  }

  test("equi keys scope the intervals") {
    val p = Seq((1L, "a", 5.0), (2L, "b", 5.0)).toDF("pid", "k", "t")
    val iv = Seq(("a", 0.0, 10.0)).toDF("k", "lo", "hi")
    val out = RangeJoin.pointInInterval(p, iv, Seq("k"),
        "t", "lo", "hi", bucketWidth = 4.0)
      .select("pid").as[Long].collect().toSeq
    assert(out == Seq(1L)) // key b has no interval
  }

  test("no nested-loop join in the plan — candidates are equi-joined") {
    val q = RangeJoin.pointInInterval(points, intervals, Nil,
      "t", "lo", "hi", bucketWidth = 8.0)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(300))
  }
}
