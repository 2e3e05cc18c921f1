package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private val fact = Seq(
    (1L, "hot", 10.0), (2L, "hot", 20.0), (3L, "hot", 30.0),
    (4L, "cold", 40.0), (5L, "orphan", 50.0)
  ).toDF("id", "k", "v")
  private val build = Seq(("hot", 100L), ("cold", 200L), ("unused", 300L))
    .toDF("k", "attr")

  test("salted join equals the plain inner join for every bucket count") {
    val plain = fact.join(build, Seq("k"))
      .select("id", "k", "v", "attr")
      .as[(Long, String, Double, Long)].collect().sortBy(_._1).toSeq
    Seq(1, 3, 8).foreach { b =>
      val salted = SkewJoin.saltedJoin(fact, build, Seq("k"),
        distributor = col("id"), saltBuckets = b)
        .select("id", "k", "v", "attr")
        .as[(Long, String, Double, Long)].collect().sortBy(_._1).toSeq
      assert(salted == plain, s"saltBuckets=$b")
    }
  }

  test("null fact keys drop out exactly as in a plain inner join") {
    val withNull = fact.union(Seq((9L, null: String, 9.0)).toDF("id", "k", "v"))
    val salted = SkewJoin.saltedJoin(withNull, build, Seq("k"),
      distributor = col("id"), saltBuckets = 4)
    assert(salted.filter(col("id") === 9L).count() == 0)
  }
}
