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

  test("leakageAudit reports only fingerprints spanning multiple splits") {
    // ids 1 and 2 land in different halves of a 50/50 carve for this
    // hash (verified below); give them identical text → leaked group
    val w = Seq("a" -> 0.5, "b" -> 0.5)
    val probe = (1L to 10L).toSeq
    val splitOf = Splits.hashSplit(probe.toDF("id"), "id", w)
      .as[(Long, String)].collect().toMap
    val crossPair = probe.combinations(2)
      .find { case Seq(x, y) => splitOf(x) != splitOf(y) }.get
    val samePair = probe.combinations(2)
      .find { case Seq(x, y) => splitOf(x) == splitOf(y) }.get
    val docs = Seq(
      (crossPair(0), "dup text"), (crossPair(1), "dup  text"), // same fp
      (samePair(0), "same split dup"), (samePair(1), "same split dup"),
      (99L, "unique text")
    ).toDF("id", "text")
    val out = Splits.leakageAudit(docs, "id", "text", w)
      .as[(String, Long, Long, String, Long)].collect()
    assert(out.length == 1) // only the cross-split dup leaks
    val r = out.head
    assert(r._2 == 2L && r._3 == 2L && r._4 == "a,b"
      && r._5 == crossPair.min)
  }

  test("weights normalize; unnormalized input gives the same carve") {
    val a = Splits.hashSplit(ids, "id", Seq("x" -> 0.8, "y" -> 0.2))
      .as[(Long, String)].collect().toMap
    val b = Splits.hashSplit(ids, "id", Seq("x" -> 4.0, "y" -> 1.0))
      .as[(Long, String)].collect().toMap
    assert(a == b)
  }

  test("shardOrder: every shard's positions are 1..n, order decorrelates from id") {
    val out = Splits.shardOrder(ids, "id", shards = 4)
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(out.length == 2000)
    out.groupBy(_._2).foreach { case (s, rows) =>
      assert(0 <= s && s < 4)
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // the visit order must not be the id order: among the first 20 docs
    // of shard 0, consecutive ids should essentially never be adjacent
    val firstIds = out.filter(_._2 == 0).sortBy(_._3).take(20).map(_._1)
    val adjacent = firstIds.sliding(2).count(p => (p(1) - p(0)).abs == 1)
    assert(adjacent <= 2, firstIds.mkString(","))
    // determinism
    val again = Splits.shardOrder(ids, "id", shards = 4)
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(out.toSet == again.toSet)
  }
}
