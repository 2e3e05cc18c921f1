package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (1 to 3000).map { i =>
    (s"day${i % 3}", (i % 1000).toLong) // 1000 distinct ids across 3 days
  }.toDF("day", "uid")

  test("union of per-slice sketches ≡ one sketch of the concatenated data") {
    val perDay = Sketches.distinctSketch(rows, Seq("day"), "uid")
      .withColumn("all", lit("all"))
    val merged = Sketches.rollupEstimate(perDay, Seq("all"))
      .select("approx_distinct").as[Long].collect().head
    val direct = rows.select(hll_sketch_estimate(hll_sketch_agg($"uid")))
      .as[Long].collect().head
    assert(merged == direct) // HLL union at equal lgK is lossless
  }

  test("estimates land within the documented ~2% of the exact count") {
    val perDay = Sketches.distinctSketch(rows, Seq("day"), "uid")
      .withColumn("all", lit("all"))
    val est = Sketches.rollupEstimate(perDay, Seq("all"))
      .select("approx_distinct").as[Long].collect().head
    assert(math.abs(est - 1000L) <= 20, s"estimate $est vs exact 1000")
    // determinism: the sketch of a set is a pure function of the set
    val again = Sketches.rollupEstimate(perDay, Seq("all"))
      .select("approx_distinct").as[Long].collect().head
    assert(again == est)
  }
}
