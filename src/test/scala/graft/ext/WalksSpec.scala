package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WalksSpec extends SparkSpec {
  import spark.implicits._

  private def walks(e: Seq[(Long, Long)], len: Int) =
    Walks.deterministicWalks(e.toDF("u", "v"), "u", "v", len)

  test("every present node starts a walk of exactly walkLen+1 steps") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val out = walks(e, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.map(_._1).toSet === Set(1L, 2L, 3L, 4L))
    assert(out.groupBy(_._1).forall(_._2.length == 6))
    // step 0 is the start node itself
    assert(out.filter(_._2 == 0).forall(r => r._1 == r._3))
  }

  test("every consecutive pair in a walk is a graph edge") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
    val adj = e.flatMap { case (a, b) => Seq(a -> b, b -> a) }.toSet
    val byWalk = walks(e, 6).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).values
    byWalk.foreach { w =>
      val path = w.sortBy(_._2).map(_._3)
      path.sliding(2).foreach { case Array(a, b) =>
        assert(adj((a, b)), s"($a,$b) not an edge in walk ${w.head._1}")
      }
    }
  }

  test("a forced path is followed exactly (degree-1 chain interior)") {
    // 1-2-3: from 1 the only move is 2; from 2 step 2's coin decides
    val out = walks(Seq((1L, 2L)), 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    // two-node graph: walks must alternate 1-2-1-2 and 2-1-2-1
    assert(out.filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq ===
      Seq(1L, 2L, 1L, 2L))
    assert(out.filter(_._1 == 2L).sortBy(_._2).map(_._3).toSeq ===
      Seq(2L, 1L, 2L, 1L))
  }

  test("the corpus is invariant to input partitioning and repetition") {
    val e = (1L to 30L).map(i => i -> (i * 11 % 30 + 1)).filter(p => p._1 != p._2)
    val a = walks(e, 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = Walks.deterministicWalks(
        e.toDF("u", "v").repartition(7, col("u")), "u", "v", 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a === b)
  }

  test("steps are not all identical: the hash coin actually mixes") {
    // on a star graph 0-{1..20}, center walks must visit different
    // leaves at different steps (a constant pick would repeat one leaf)
    val e = (1L to 20L).map(i => 0L -> i)
    val center = walks(e, 8).collect()
      .filter(r => r.getLong(0) == 0L && r.getInt(1) % 2 == 1)
      .map(_.getLong(2)).toSet
    assert(center.size > 1, s"degenerate constant walk: $center")
  }
}
