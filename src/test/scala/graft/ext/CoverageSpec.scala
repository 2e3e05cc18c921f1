package graft.ext

import graft.SparkSpec

class CoverageSpec extends SparkSpec {
  import spark.implicits._

  // group g: weights 50, 30, 15, 5 (total 100)
  private val wt = Seq(
    ("g", "a", 50L), ("g", "b", 30L), ("g", "c", 15L), ("g", "d", 5L),
    ("h", "x", 1L)
  ).toDF("grp", "item", "w")

  private def kept(pNum: Long, pDen: Long): Set[String] =
    Coverage.nucleus(wt, Seq("grp"), "item", "w", pNum, pDen)
      .filter($"grp" === "g").select("item").as[String].collect().toSet

  test("keeps the smallest prefix reaching p, including the crossing item") {
    assert(kept(1, 2) == Set("a"))           // 50 reaches 50%
    assert(kept(9, 10) == Set("a", "b", "c")) // 50+30+15 = 95 ≥ 90
    assert(kept(8, 10) == Set("a", "b"))      // 80 reaches 80% exactly
    assert(kept(1, 1) == Set("a", "b", "c", "d")) // p=1 keeps all
  }

  test("exact boundary: the crossing item is in, the next is out") {
    // p = 80/100: cum-before(b) = 50 < 80 → b in; cum-before(c) = 80,
    // NOT < 80 → c out. A float comparison at 0.8*100 could flip this.
    assert(kept(80, 100) == Set("a", "b"))
  }

  test("nucleus ≡ the single-window form, bit for bit, and its plan " +
      "has no Window partitioned by a bare group key (review r15 #2: " +
      "a vocabulary nucleus has millions of items under few groups)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(13)
    val big = (1 to 700).map { i =>
      (if (i % 3 == 0) "g" else "h", s"it$i", (rnd.nextInt(20) + 1).toLong)
    }.toDF("grp", "item", "w")
    val grp = Window.partitionBy(col("grp"))
    val ord = grp.orderBy(col("w").desc, col("item").asc)
    val wl = col("w").cast("long")
    val ref = big
      .withColumn("total", sum(wl).over(grp))
      .withColumn("cum", sum(wl).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(lit(10L) * (col("cum") - wl) < lit(9L) * col("total"))
      .withColumn("share_4dp", TextAnalysis.halfUp4(wl, col("total")))
      .collect().map(r => r.getString(1) -> r.toSeq).toMap
    val gotDf = Coverage.nucleus(big, Seq("grp"), "item", "w", 9, 10)
    val got = gotDf.collect().map(r => r.getString(1) -> r.toSeq).toMap
    assert(got === ref)
    val plan = gotDf.queryExecution.executedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.nonEmpty)
    assert(windows.forall(_.contains("__shard")),
      s"unsharded window in nucleus plan:\n$plan")
  }

  test("ties order by item name; singleton group keeps its only item") {
    val tied = Seq(("g", "b", 10L), ("g", "a", 10L)).toDF("grp", "item", "w")
    val out = Coverage.nucleus(tied, Seq("grp"), "item", "w", 1, 2)
      .select("item").as[String].collect().toSet
    assert(out == Set("a")) // a sorts first at equal weight
    val single = Coverage.nucleus(wt, Seq("grp"), "item", "w", 1, 10)
      .filter($"grp" === "h").select("item").as[String].collect().toSet
    assert(single == Set("x"))
  }
}
