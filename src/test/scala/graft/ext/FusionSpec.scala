package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class FusionSpec extends SparkSpec {
  import spark.implicits._

  private def ranked(rows: (Long, Int)*): DataFrame =
    rows.toSeq.toDF("id", "rank")

  private def fuse(lists: DataFrame*) =
    Fusion.rrfFused(lists.map(_ -> "rank"), "id", k = 60, topN = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getInt(3))).toSeq

  private def micro(rank: Int, k: Int = 60): Long =
    math.floor(1e12 / (k + rank) + 0.5).toLong

  test("contributions are the quantized 1/(k+rank) sums") {
    val out = fuse(ranked(1L -> 1, 2L -> 2), ranked(2L -> 1, 3L -> 2))
    val m = out.map(r => r._1 -> (r._2, r._3)).toMap
    assert(m(1L) === ((1, micro(1))))
    assert(m(2L) === ((2, micro(2) + micro(1))))
    assert(m(3L) === ((1, micro(2))))
  }

  test("a doc in both lists outranks single-list docs at similar ranks") {
    val out = fuse(ranked(1L -> 1, 9L -> 2), ranked(9L -> 3, 5L -> 1))
    // 9: 1/(60+2)+1/(60+3) > 1: 1/61 and 5: 1/61 — consensus wins
    assert(out.head._1 === 9L && out.head._4 === 1)
  }

  test("fused order ties break by id ascending") {
    val out = fuse(ranked(7L -> 1), ranked(3L -> 1))
    assert(out.map(_._1) === Seq(3L, 7L))
    assert(out.map(_._4) === Seq(1, 2))
  }

  test("topN cuts after fusion, not per list") {
    val out = Fusion.rrfFused(
      Seq(ranked((1L to 30L).map(i => i -> i.toInt): _*) -> "rank"),
      "id", k = 60, topN = 5)
      .collect()
    assert(out.length === 5)
    assert(out.map(_.getLong(0)).toSeq === (1L to 5L))
  }

  test("rankList: dense 1-based ranks ordered by (score desc, id)") {
    val scored = Seq((10L, 3.5), (11L, 9.9), (12L, 3.5), (13L, 0.1))
      .toDF("id", "s")
    val out = Fusion.rankList(scored, "id", "s", n = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._2)
    assert(out === Seq((11L, 1), (10L, 2), (12L, 3)))
  }
}
