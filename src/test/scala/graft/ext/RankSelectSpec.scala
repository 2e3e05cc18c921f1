package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The de-serialized window family (review r15 #2): every rewritten
  * operator must be BIT-IDENTICAL to the single-window form it
  * replaced (kept here as the reference implementation), on data with
  * ties, nulls, singleton and constant groups — and the executed plan
  * must contain no Window node that partitions a big input by a bare
  * group key (every Window line mentions the range shard; the only
  * keys-partitioned window runs over the tiny per-(group, shard)
  * subtotal table, which also carries __shard in its line). */
class RankSelectSpec extends SparkSpec {
  import spark.implicits._

  // ~900 rows, 3 skewed groups, heavy value ties, some nulls
  private def events: DataFrame = {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 900L).map { i =>
      val grp = if (i % 9 == 0) "c" else if (i % 3 == 0) "b" else "a"
      val v: Option[Double] =
        if (i % 41 == 0) None else Some((rnd.nextInt(40) * 5).toDouble)
      (i, grp, v)
    } ++ Seq((901L, "solo", Some(42.0)), (902L, "allnull", None))
    rows.toDF("id", "grp", "v")
  }

  private def collectMap(df: DataFrame): Map[Long, Seq[Any]] =
    df.collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap

  test("rankNormalize ≡ percent_rank window, bit for bit") {
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("v").asc_nulls_first, col("id").asc_nulls_first)
    val ref = events.withColumn("pr", percent_rank().over(w))
    val got = Normalize.rankNormalize(events, Seq("grp"), "v", "id")
    assert(collectMap(got) === collectMap(ref))
  }

  test("grouped z/mm ≡ unordered-window form, bit for bit") {
    val iv = events.withColumn("v", col("v").cast("int"))
    val w = Window.partitionBy(col("grp"))
    val x = col("v").cast("long")
    val sx = sum(x).over(w); val sxx = sum(x * x).over(w)
    val n = count(x).over(w); val mn = min(x).over(w); val mx = max(x).over(w)
    val xd = x.cast("double"); val nd = n.cast("double")
    val sxd = sx.cast("double")
    val varNum = sxx.cast("double") - sxd * sxd / nd
    val z = (xd - sxd / nd) / sqrt(varNum / (n - lit(1L)).cast("double"))
    val mm = TextAnalysis.halfUp4(x - mn, mx - mn)
    val ref = iv
      .withColumn("z", when(n >= 2 && varNum > 0, round(z, 4) + lit(0.0))
        .otherwise(lit(null)))
      .withColumn("mm", when(mx > mn, mm).otherwise(lit(null)))
    val got = Normalize.grouped(iv, Seq("grp"), "v")
    assert(collectMap(got) === collectMap(ref))
  }

  test("winsorize ≡ exact-percentile window form, bit for bit") {
    val w = Window.partitionBy(col("grp"))
    val ref = events
      .withColumn("p_lo", round(expr("percentile(v, 0.05)").over(w), 4))
      .withColumn("p_hi", round(expr("percentile(v, 0.95)").over(w), 4))
      .withColumn("v_clip",
        least(greatest(col("v"), col("p_lo")), col("p_hi")))
    val got = Binning.winsorize(events, Seq("grp"), "v", 0.05, 0.95)
    assert(collectMap(got) === collectMap(ref))
  }

  test("equiDepth ≡ ntile window, bit for bit (including n < bins)") {
    for (bins <- Seq(2, 8, 1000)) { // 1000 > every group size
      val w = Window.partitionBy(col("grp"))
        .orderBy(col("v"), col("id"))
      val ref = events.withColumn("bin", ntile(bins).over(w))
      val got = Binning.equiDepth(events, Seq("grp"), "v", "id", bins)
      assert(collectMap(got) === collectMap(ref), s"bins=$bins")
    }
  }

  test("madProfile ≡ double-percentile window form, bit for bit") {
    val w = Window.partitionBy(col("grp"))
    val withMed = events
      .withColumn("med_x", expr("percentile(v, 0.5)").over(w))
      .withColumn("adev", abs(col("v") - col("med_x")))
    val ref = withMed
      .withColumn("mad_x", expr("percentile(adev, 0.5)").over(w))
      .groupBy("grp").agg(
        round(max(col("med_x")), 4).as("med"),
        round(max(col("mad_x")), 4).as("mad"),
        sum(when(col("adev") > lit(3.0) * col("mad_x"), 1L).otherwise(0L))
          .as("n_outliers"),
        count(lit(1)).as("n"))
    val got = Robust.madProfile(events, Seq("grp"), "v", k = 3.0)
    val key = (df: DataFrame) =>
      df.collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(key(got) === key(ref))
  }

  test("NULL group keys survive the broadcast join-back (window " +
      "partitionBy treats NULL as its own group; the join is null-safe)") {
    val df = Seq((1L, Option.empty[String], 10), (2L, None, 20),
      (3L, Some("g"), 5)).toDF("id", "grp", "v")
    val out = Normalize.grouped(df, Seq("grp"), "v").collect()
    assert(out.length === 3)
    val nullGrp = Normalize.grouped(df, Seq("grp"), "v")
      .filter(col("grp").isNull).select("mm").as[Option[Double]]
      .collect().flatten.sorted
    assert(nullGrp === Seq(0.0, 1.0)) // stats computed over the NULL group
  }

  test("plan contract: no Window over a big input partitioned by a " +
      "bare group key — every Window line is sharded, stats come back " +
      "via broadcast joins") {
    val plans = Seq(
      Normalize.rankNormalize(events, Seq("grp"), "v", "id"),
      Binning.equiDepth(events, Seq("grp"), "v", "id", 8),
      Binning.winsorize(events, Seq("grp"), "v", 0.05, 0.95),
      Robust.madProfile(events, Seq("grp"), "v", 3.0)
    ).map(_.queryExecution.executedPlan.toString)
    plans.foreach { plan =>
      val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
      assert(windows.nonEmpty)
      assert(windows.forall(_.contains("__shard")),
        s"unsharded window in plan:\n$plan")
      assert(plan.contains("BroadcastHashJoin"), plan)
    }
    // the z-score/min-max rewrite needs no window at all
    val zPlan = Normalize.grouped(events.withColumn("v",
        col("v").cast("int")), Seq("grp"), "v")
      .queryExecution.executedPlan.toString
    assert(!zPlan.contains("Window"), zPlan)
    assert(zPlan.contains("BroadcastHashJoin"), zPlan)
  }

  test("withPrefixSumAndTotal: running sum ≡ window sum at several " +
      "shard counts (ties split across shards must not break the order)") {
    val iv = events.filter(col("v").isNotNull)
      .withColumn("w", col("v").cast("long") + 1L)
    for (s <- Seq(1, 4, 64)) {
      val ord = Window.partitionBy(col("grp"))
        .orderBy(col("v").asc_nulls_first, col("id").asc_nulls_first)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ref = iv
        .withColumn("cum", sum(col("w")).over(ord))
        .withColumn("tot", sum(col("w")).over(
          Window.partitionBy(col("grp"))))
      val got = RankSelect.withPrefixSumAndTotal(iv, Seq("grp"),
        Seq("v", "id"), "w", "cum", "tot", shards = s)
      assert(collectMap(got) === collectMap(ref), s"shards=$s")
    }
  }

  test("withRankAndCount: rank ≡ row_number at several shard counts") {
    for (s <- Seq(1, 4, 64)) {
      val w = Window.partitionBy(col("grp"))
        .orderBy(col("v").asc_nulls_first, col("id").asc_nulls_first)
      val ref = events.withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("grp"))))
      val got = RankSelect.withRankAndCount(events, Seq("grp"),
        Seq("v", "id"), "rk", "n", shards = s)
      assert(collectMap(got) === collectMap(ref), s"shards=$s")
    }
  }
}
