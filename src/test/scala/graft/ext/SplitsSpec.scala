package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SplitsSpec extends SparkSpec {
  import spark.implicits._

  private def ids = (1L to 2000L).toDF("id")

  test("every row gets exactly one split; ratios approximate the weights") {
    val out = Splits.hashSplit(ids, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(out.count() == 2000L)
    val byS = out.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(byS.keySet == Set("train", "val", "test"))
    assert(byS("train") > 1500 && byS("train") < 1700) // ~1600 ± hash noise
    assert(byS("val") > 120 && byS("val") < 280)
  }

  test("assignment is deterministic and content-based, not order-based") {
    val w = Seq("a" -> 0.5, "b" -> 0.5)
    val once = Splits.hashSplit(ids, "id", w)
      .as[(Long, String)].collect().toMap
    val shuffled = Splits.hashSplit(
      ids.orderBy(rand(123)), "id", w)
      .as[(Long, String)].collect().toMap
    assert(once == shuffled)
  }

  test("weights normalize; unnormalized input gives the same carve") {
    val a = Splits.hashSplit(ids, "id", Seq("x" -> 0.8, "y" -> 0.2))
      .as[(Long, String)].collect().toMap
    val b = Splits.hashSplit(ids, "id", Seq("x" -> 4.0, "y" -> 1.0))
      .as[(Long, String)].collect().toMap
    assert(a == b)
  }
}
