package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits: a on even positions, b on odd") {
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (0x7FFFFFFFL, 0L))
      .toDF("a", "b")
      .select(ZOrder.zValue($"a", $"b")).as[Long].collect().toSeq
    assert(out(0) == 0L)
    assert(out(1) == 1L)              // bit 0 of a → bit 0
    assert(out(2) == 2L)              // bit 0 of b → bit 1
    // a=3 (11₂) → bits 0,2; b=5 (101₂) → bits 1,5 → 100111₂ = 39
    assert(out(3) == 39L)
    assert(out(4) == 0x1555555555555555L) // all 31 a-bits on even slots
    // a 32nd bit would reach bit 63 and flip the sign — masked instead
    val masked = Seq((0xFFFFFFFFL, 0xFFFFFFFFL)).toDF("a", "b")
      .select(ZOrder.zValue($"a", $"b")).as[Long].collect().head
    assert(masked == 0x3FFFFFFFFFFFFFFFL && masked > 0)
  }

  test("z layout localizes BOTH dimensions: a box probe touches ~√P partitions") {
    val n = 1 << 14
    val side = 1 << 7 // 128×128 grid, one point per cell
    val pts = spark.range(n)
      .select((col("id") % side).as("x"), (col("id") / side).as("y"))
    val parts = 16

    def touched(laidOut: org.apache.spark.sql.DataFrame): Long = laidOut
      .withColumn("pid", spark_partition_id())
      .filter(col("y") >= 32 && col("y") < 48) // y-only range probe
      .select("pid").distinct().count()

    val zTouched = touched(ZOrder.layout(pts, "x", "y", parts))
    val xTouched = touched(pts.repartitionByRange(parts, col("x"), col("y"))
      .sortWithinPartitions(col("x"), col("y")))
    // lexicographic (x, y) layout spreads every y-range over ALL x
    // partitions; the Z-curve confines it to a band
    assert(xTouched == parts.toLong, s"x-sort touched $xTouched")
    assert(zTouched <= parts / 2, s"z-order touched $zTouched of $parts")
  }
}
