package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BiasedWalksSpec extends SparkSpec {
  import spark.implicits._

  private def collectWalks(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("all-equal weights reproduce the first-order walk bit-for-bit") {
    val e = (1L to 25L).map(i => i -> (i * 9 % 25 + 1)).filter(p => p._1 != p._2)
    val a = collectWalks(
      Walks.deterministicWalks(e.toDF("u", "v"), "u", "v", 4))
    val b = collectWalks(
      Walks.biasedWalks(e.toDF("u", "v"), "u", "v", 4, 1, 1, 1))
    assert(a === b)
  }

  test("weighted pick matches a driver-side replay of the exact coin") {
    // triangle 1-2-3 plus pendant 3-4: from 2 (prev=1), candidates are
    // 1 (return), 3 (common: 3~1). Replay the operator's coin rule.
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
    val (wr, wc, wf) = (2, 3, 5)
    val out = Walks.biasedWalks(e.toDF("u", "v"), "u", "v", 3, wr, wc, wf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val adj = e.flatMap { case (a, b) => Seq(a -> Set(b), b -> Set(a)) }
      .groupBy(_._1).view.mapValues(_.flatMap(_._2).toSet).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def coin(w: Long, t: Int, v: Long, r: Int): String = {
      val base = s"$w:$t:$v"
      if (r == 0) md5hex(base) else md5hex(s"$base:$r")
    }
    out.groupBy(_._1).foreach { case (wid, rows) =>
      val path = rows.sortBy(_._2).map(_._3)
      assert(path.head === wid)
      // step 1: first-order coin over neighbors
      val s1 = adj(wid).map(v => (coin(wid, 1, v, 0), v)).min._2
      assert(path(1) === s1, s"walk $wid step 1")
      // steps 2..: weighted coin with (return, common, forward)
      var (prev, cur) = (wid, s1)
      (2 until path.length).foreach { t =>
        val cand = adj(cur).flatMap { v =>
          val w = if (v == prev) wr
            else if (adj(v).contains(prev)) wc else wf
          (0 until w).map(r => (coin(wid, t, v, r), v))
        }
        val pick = cand.min._2
        assert(path(t) === pick, s"walk $wid step $t")
        prev = cur; cur = pick
      }
    }
  }

  test("bias weights change behavior: heavy return differs from heavy forward") {
    val e = (1L to 30L).map(i => i -> (i * 7 % 30 + 1)).filter(p => p._1 != p._2)
    val ret = collectWalks(
      Walks.biasedWalks(e.toDF("u", "v"), "u", "v", 5, 50, 1, 1))
    val fwd = collectWalks(
      Walks.biasedWalks(e.toDF("u", "v"), "u", "v", 5, 1, 1, 50))
    assert(ret !== fwd)
  }

  test("structure: every consecutive pair is an edge; full length") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (2L, 4L))
    val adj = e.flatMap { case (a, b) => Seq(a -> b, b -> a) }.toSet
    val rows = Walks.biasedWalks(e.toDF("u", "v"), "u", "v", 6, 1, 2, 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.groupBy(_._1).forall(_._2.length == 7))
    rows.groupBy(_._1).values.foreach { w =>
      w.sortBy(_._2).map(_._3).sliding(2).foreach { case Array(a, b) =>
        assert(adj((a, b)))
      }
    }
  }

  test("partition invariance") {
    val e = (1L to 20L).map(i => i -> (i * 13 % 20 + 1)).filter(p => p._1 != p._2)
    val a = collectWalks(
      Walks.biasedWalks(e.toDF("u", "v"), "u", "v", 4, 1, 2, 4))
    val b = collectWalks(Walks.biasedWalks(
      e.toDF("u", "v").repartition(9, col("u")), "u", "v", 4, 1, 2, 4))
    assert(a === b)
  }
}
