package graft.ops

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class ChangepointSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(min * 60000L)

  private def series(key: String, vals: Seq[Double]): DataFrame =
    vals.zipWithIndex.map { case (v, i) =>
      (key, ts(i), i.toLong, v)
    }.toDF("k", "ts", "id", "v")

  private def run(df: DataFrame) =
    Changepoint.cusum(df, "k", "ts", "id", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getLong(4))).toSeq

  test("locates a clean mean shift at the last pre-shift index") {
    // 5 points at 10 then 5 points at 20: |S| peaks exactly at i=5.
    val out = run(series("a", Seq.fill(5)(10.0) ++ Seq.fill(5)(20.0)))
    assert(out === Seq(("a", 10L, 5, 250000L)))
    // s_abs = n*P_5 - 5*T = 10*50000 - 5*150000 -> |−250000| (q = v*1000)
  }

  test("flat series peaks nowhere meaningful with s_abs 0") {
    val out = run(series("flat", Seq.fill(6)(7.0)))
    assert(out.head._4 === 0L) // every S_i is 0; earliest-i tie wins
    assert(out.head._3 === 1)
  }

  test("level-shift invariance: adding a constant leaves S untouched") {
    val base = Seq(1.0, 5.0, 2.0, 8.0, 3.0, 9.0, 4.0)
    val a = run(series("k", base))
    val b = run(series("k", base.map(_ + 123.0)))
    assert(a.map(r => (r._3, r._4)) === b.map(r => (r._3, r._4)))
  }

  test("linear scaling: doubling values doubles s_abs, same argmax") {
    val base = Seq(4.0, 4.0, 4.0, 9.0, 9.0, 1.0)
    val a = run(series("k", base))
    val b = run(series("k", base.map(_ * 2)))
    assert(b.head._3 === a.head._3)
    assert(b.head._4 === 2 * a.head._4)
  }

  test("single-point series reports cp_idx 1 with zero evidence") {
    assert(run(series("one", Seq(42.0))) === Seq(("one", 1L, 1, 0L)))
  }

  test("series are independent: keys do not contaminate each other") {
    val df = series("a", Seq.fill(4)(1.0) ++ Seq.fill(4)(2.0))
      .union(series("b", Seq.fill(3)(50.0)))
    val out = run(df).sortBy(_._1)
    assert(out.map(_._1) === Seq("a", "b"))
    assert(out.head._3 === 4)     // a's shift boundary
    assert(out(1)._4 === 0L)      // b is flat
  }

  test("null observations are dropped, not folded as phantom evidence") {
    // review r11: a null counted in (i, n) but missing from (P, T)
    // would make a flat series report s_abs > 0
    val df = Seq(("k", ts(0), 1L, Some(10.0)), ("k", ts(1), 2L, None),
      ("k", ts(2), 3L, Some(10.0)))
      .toDF("k", "ts", "id", "v")
    val out = Changepoint.cusum(df, "k", "ts", "id", "v").collect()
    assert(out.head.getLong(1) === 2L) // n counts surviving rows only
    assert(out.head.getLong(4) === 0L) // flat series: zero evidence
  }

  test("partition invariance: the argmax ignores input layout") {
    val base = (1 to 60).map(i => ((i * 13 % 7).toString, ts(i), i.toLong,
      (i * 31 % 17).toDouble))
    def run(parts: Int) =
      Changepoint.cusum(base.toDF("k", "ts", "id", "v").repartition(parts),
        "k", "ts", "id", "v")
        .collect().map(r => (r.getString(0), r.getInt(2), r.getLong(4)))
        .sortBy(_._1).toSeq
    assert(run(1) === run(11))
  }

  test("tie-break order at equal timestamps is the id total order") {
    // both rows at t=0; order must be id asc regardless of input order
    val df = Seq(("k", ts(0), 2L, 9.0), ("k", ts(0), 1L, 1.0),
      ("k", ts(1), 3L, 1.0)).toDF("k", "ts", "id", "v")
    val out = Changepoint.cusum(df, "k", "ts", "id", "v").collect()
    // order 1,9,1: T=11000, S_1 = 3*1000-1*11000 = -8000 -> |8000|
    //              S_2 = 3*10000-2*11000 = 8000 -> tie, earliest i=1
    assert(out.head.getInt(2) === 1)
    assert(out.head.getLong(4) === 8000L)
  }
}
