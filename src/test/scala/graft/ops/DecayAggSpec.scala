package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

class DecayAggSpec extends SparkSpec {
  import spark.implicits._

  private val DayUs = 86400000000L
  private val asOf = 100L * DayUs // day 100

  private def ts(day: Double) = new Timestamp((day * 86400000L).toLong)

  private def run(rows: Seq[(String, Double, Double)], halfLife: Int) =
    DecayAgg.decayScore(
      rows.map { case (k, day, v) => (k, ts(day), v) }
        .toDF("k", "ts", "v"),
      Seq("k"), "ts", "v", asOf, halfLife)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("whole-half-life ages weight by exact powers of two") {
    // ages 0d, 7d, 14d at halfLife 7 -> weights 1, 1/2, 1/4
    val m = run(Seq(("u", 99.5, 8.0), ("u", 93.0, 8.0), ("u", 86.0, 8.0)),
      halfLife = 7)
    assert(m("u") === ((3L, 8000000L + 4000000L + 2000000L)))
  }

  test("decay steps down per whole half-life, not continuously") {
    // ages 1d and 6d both fall in halving bucket 0 -> full weight
    val m = run(Seq(("u", 99.0, 2.0), ("u", 94.0, 2.0)), halfLife = 7)
    assert(m("u") === ((2L, 4000000L)))
  }

  test("events at or after the reference instant are excluded") {
    val m = run(Seq(("u", 100.0, 5.0), ("u", 150.0, 5.0), ("u", 99.0, 1.0)),
      halfLife = 7)
    assert(m("u") === ((1L, 1000000L)))
  }

  test("null values drop with their rows") {
    val df = Seq(("u", ts(99.0), Some(3.0)), ("u", ts(98.0), None))
      .toDF("k", "ts", "v")
    val out = DecayAgg.decayScore(df, Seq("k"), "ts", "v", asOf, 7)
      .collect().head
    assert((out.getLong(1), out.getLong(2)) === ((1L, 3000000L)))
  }

  test("keys aggregate independently; µ-rounding is half-up") {
    // value 0.0000005 -> 0.5 µ -> rounds up to 1 µ at weight 1
    val m = run(Seq(("a", 99.0, 0.0000005), ("b", 99.0, 1.0)), halfLife = 7)
    assert(m("a") === ((1L, 1L)))
    assert(m("b") === ((1L, 1000000L)))
  }
}
