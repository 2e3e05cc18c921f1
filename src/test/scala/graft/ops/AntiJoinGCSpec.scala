package graft.ops

import graft.SparkSpec

class AntiJoinGCSpec extends SparkSpec {
  import spark.implicits._

  private val stored = Seq(("A", 1), ("B", 2), ("C", 3)).toDF("key", "v")
  private val live   = Seq("A", "C", "D", "A").toDF("key") // dup + unknown

  test("stale = stored − live, exactly (etl_aws:1932-1961)") {
    assert(AntiJoinGC.stale(stored, live, Seq("key"))
      .select("key").as[String].collect().toSet == Set("B"))
  }

  test("retained = stored ∩ live, duplicates in live don't multiply rows") {
    val r = AntiJoinGC.retained(stored, live, Seq("key"))
    assert(r.count() == 2)
    assert(r.select("key").as[String].collect().toSet == Set("A", "C"))
  }

  test("stale ∪ retained partitions stored") {
    val s = AntiJoinGC.stale(stored, live, Seq("key")).count()
    val r = AntiJoinGC.retained(stored, live, Seq("key")).count()
    assert(s + r == stored.count())
  }
}
