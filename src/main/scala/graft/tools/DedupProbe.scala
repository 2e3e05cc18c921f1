package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Scratch A/B probe for the dedup-family formulations — times variants
  * back-to-back in one JVM so host contention noise can't masquerade as
  * an algorithmic difference. Not part of the library surface; run:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.DedupProbe"
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs: DataFrame = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(name: String)(mk: => DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = mk.count()
        println(f"$name pass$i: ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
      }
    }

    // M1: CURRENT shipped minhashLshPairs. NOTE (post-switch): the
    // library now uses the one-agg-checkpoint shape, so M1 vs M2 is a
    // shipped-vs-inlined sanity check. Historical baseline (two-pass
    // shingle subtree, r5 pre-switch): 2.3-3.0 s warm at sf0.1 vs
    // M2's 2.1-2.3 s.
    time("M1 minhash shipped") {
      Dedup.minhashLshPairs(docs, "doc_id", "text",
        shingleN = 3, numHashes = 12, bandSize = 4, threshold = 0.5)
    }

    // M2: ONE combined per-doc aggregate (sigs + shset + n_sh),
    // checkpointed; bands and verify both read from it
    time("M2 minhash one-agg ckpt") {
      val sh = Dedup.shingles(docs, "doc_id", "text", 3)
      val sigAggs = (0 until 12).map { h =>
        min(md5(concat(lit(h), lit("|"), col("shingle")))).as(s"sig_$h")
      } ++ Seq(count(lit(1)).as("n_sh"),
        collect_list(col("shingle")).as("shset"))
      val per = sh.groupBy(col("doc_id")).agg(sigAggs.head, sigAggs.tail: _*)
        .localCheckpoint()
      val nBands = 3
      val bandCols = (0 until nBands).map { b =>
        val items = (b * 4 until (b + 1) * 4).map { h =>
          concat_ws(":", lit(h), col(s"sig_$h"))
        }
        md5(concat_ws("|", array_sort(array(items: _*)))).as(s"bsig_$b")
      }
      val stackArgs = (0 until nBands).map(b => s"$b, bsig_$b").mkString(", ")
      val bandsDet = per
        .select(col("doc_id") +: col("n_sh") +: bandCols: _*)
        .select(col("doc_id"), col("n_sh"),
          expr(s"stack($nBands, $stackArgs) AS (band, band_sig)"))
      val ca = bandsDet.select(col("doc_id").as("doc_a"), col("band"),
        col("band_sig"), col("n_sh").as("n_a"))
      val cb = bandsDet.select(col("doc_id").as("doc_b"), col("band"),
        col("band_sig"), col("n_sh").as("n_b"))
      val candidates = ca.join(cb, Seq("band", "band_sig"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b")).distinct()
      val jac = col("n_inter").cast("double") /
        (col("n_a") + col("n_b") - col("n_inter"))
      candidates
        .join(per.select(col("doc_id").as("doc_a"), col("shset").as("sa")), Seq("doc_a"))
        .join(per.select(col("doc_id").as("doc_b"), col("shset").as("sb")), Seq("doc_b"))
        .withColumn("n_inter", size(array_intersect(col("sa"), col("sb"))))
        .filter(jac >= 0.5)
        .select(col("doc_a"), col("doc_b"), round(jac, 4).as("jaccard"))
    }

    // N1: CURRENT shipped ngramJaccardPairs. NOTE (post-switch): now
    // the in-row-rank-sort shape, so N1 vs N3 is shipped-vs-inlined.
    // Historical baselines at sf0.1 warm: windowed two-parse shape
    // 2.2-2.4 s (N1 pre-switch); ranked-checkpoint variant 2.2-2.6 s
    // (N2, rejected as a wash); in-row sort 2.0-2.6 s (N3, shipped).
    time("N1 ngram shipped") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.8)
    }

    // N2: checkpoint the RANKED frame (post-window); prefix AND docsets
    // both derive from it — saves the second parse+distinct+groupBy pass
    time("N2 ngram ranked-ckpt") {
      val t = 0.8
      val sh = Dedup.shingles(docs, "doc_id", "text", 3)
      val withDf = sh.withColumn("df",
        count(lit(1)).over(Window.partitionBy(col("shingle"))))
      val perDoc = Window.partitionBy(col("doc_id"))
      val ranked = withDf
        .withColumn("rk", row_number().over(perDoc.orderBy(col("df"), col("shingle"))))
        .withColumn("n_doc", count(lit(1)).over(perDoc))
        .localCheckpoint()
      val prefix = ranked
        .filter(col("rk") <= floor(lit(1.0 - t) * col("n_doc") + lit(1e-9)) + 1)
        .select(col("doc_id"), col("shingle"), col("n_doc"), col("rk"))
      val postings = prefix
        .groupBy(col("shingle"))
        .agg(sort_array(collect_list(struct(col("doc_id").as("id"),
          col("n_doc").as("n"), col("rk").as("rk")))).as("docs"))
        .filter(size(col("docs")) >= 2)
      val candidates = postings
        .select(explode(expr(
          """flatten(transform(docs, (x, i) ->
            |  transform(slice(docs, i + 2, size(docs)), y -> struct(x, y))))"""
            .stripMargin)).as("p"))
        .select(col("p.x.id").as("doc_a"), col("p.y.id").as("doc_b"),
          col("p.x.n").as("n_a"), col("p.y.n").as("n_b"),
          col("p.x.rk").as("rk_a"), col("p.y.rk").as("rk_b"))
        .filter(col("n_b") >= col("n_a") * t - lit(1e-9) &&
          col("n_a") >= col("n_b") * t - lit(1e-9))
        .filter(lit(1) + least(col("n_a") - col("rk_a"), col("n_b") - col("rk_b"))
          >= lit(t / (1.0 + t)) * (col("n_a") + col("n_b")) - lit(1e-9))
        .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
        .distinct()
      val docsets = ranked.groupBy(col("doc_id"))
        .agg(collect_list(col("shingle")).as("shset"))
      val jac = col("n_inter").cast("double") /
        (col("n_a") + col("n_b") - col("n_inter"))
      candidates
        .join(docsets.select(col("doc_id").as("doc_a"), col("shset").as("sa")), Seq("doc_a"))
        .join(docsets.select(col("doc_id").as("doc_b"), col("shset").as("sb")), Seq("doc_b"))
        .withColumn("n_inter", size(array_intersect(col("sa"), col("sb"))))
        .filter(jac >= t)
        .select(col("doc_a"), col("doc_b"), round(jac, 4).as("jaccard"))
    }

    // N3: no windows at all — df rides a shingle-keyed aggregate, per-doc
    // rank comes from an in-row sort_array, and the SAME checkpointed
    // per-doc frame serves prefix extraction AND verification sets
    time("N3 ngram agg+in-row-sort") {
      val t = 0.8
      val sh = Dedup.shingles(docs, "doc_id", "text", 3)
      // df stays a WINDOW count (no per-shingle array — a stop-shingle
      // posting array in one row would OOM at scale)
      val dfed = sh.withColumn("df",
        count(lit(1)).over(Window.partitionBy(col("shingle"))))
      val perDoc = dfed.groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("df"), col("shingle"))))
          .as("shs"))
        .select(col("doc_id"), col("shs"),
          size(col("shs")).cast("long").as("n_doc"))
        .localCheckpoint()
      val prefix = perDoc
        .select(col("doc_id"), col("n_doc"),
          posexplode(expr(s"slice(shs, 1, " +
            s"CAST(floor((1.0 - $t) * n_doc + 1e-9) AS INT) + 1)")))
        .select(col("doc_id"), col("n_doc"),
          (col("pos") + 1).as("rk"), col("col.shingle").as("shingle"))
      val postings = prefix
        .groupBy(col("shingle"))
        .agg(sort_array(collect_list(struct(col("doc_id").as("id"),
          col("n_doc").as("n"), col("rk").as("rk")))).as("docs"))
        .filter(size(col("docs")) >= 2)
      val candidates = postings
        .select(explode(expr(
          """flatten(transform(docs, (x, i) ->
            |  transform(slice(docs, i + 2, size(docs)), y -> struct(x, y))))"""
            .stripMargin)).as("p"))
        .select(col("p.x.id").as("doc_a"), col("p.y.id").as("doc_b"),
          col("p.x.n").as("n_a"), col("p.y.n").as("n_b"),
          col("p.x.rk").as("rk_a"), col("p.y.rk").as("rk_b"))
        .filter(col("n_b") >= col("n_a") * t - lit(1e-9) &&
          col("n_a") >= col("n_b") * t - lit(1e-9))
        .filter(lit(1) + least(col("n_a") - col("rk_a"), col("n_b") - col("rk_b"))
          >= lit(t / (1.0 + t)) * (col("n_a") + col("n_b")) - lit(1e-9))
        .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
        .distinct()
      val docsets = perDoc.select(col("doc_id"),
        expr("transform(shs, x -> x.shingle)").as("shset"))
      val jac = col("n_inter").cast("double") /
        (col("n_a") + col("n_b") - col("n_inter"))
      candidates
        .join(docsets.select(col("doc_id").as("doc_a"), col("shset").as("sa")), Seq("doc_a"))
        .join(docsets.select(col("doc_id").as("doc_b"), col("shset").as("sb")), Seq("doc_b"))
        .withColumn("n_inter", size(array_intersect(col("sa"), col("sb"))))
        .filter(jac >= t)
        .select(col("doc_a"), col("doc_b"), round(jac, 4).as("jaccard"))
    }

    // N4: df via hash AGGREGATE + broadcast join-back instead of the
    // window count — kills the full sort of the exploded shingle frame.
    // Only valid when the distinct-shingle table fits an executor
    // (bounded vocab domains); the window stays the unbounded-scale path.
    time("N4 ngram agg-bcast-df") {
      val t = 0.8
      val sh = Dedup.shingles(docs, "doc_id", "text", 3)
      val dfTable = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      val dfed = sh.join(broadcast(dfTable), Seq("shingle"))
      val perDoc = dfed.groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("df"), col("shingle"))))
          .as("shs"))
        .select(col("doc_id"), col("shs"),
          size(col("shs")).cast("long").as("n_doc"))
        .localCheckpoint()
      val prefix = perDoc
        .select(col("doc_id"), col("n_doc"),
          posexplode(expr(s"slice(shs, 1, " +
            s"CAST(floor((1.0 - $t) * n_doc + 1e-9) AS INT) + 1)")))
        .select(col("doc_id"), col("n_doc"),
          (col("pos") + 1).as("rk"), col("col.shingle").as("shingle"))
      val postings = prefix
        .groupBy(col("shingle"))
        .agg(sort_array(collect_list(struct(col("doc_id").as("id"),
          col("n_doc").as("n"), col("rk").as("rk")))).as("docs"))
        .filter(size(col("docs")) >= 2)
      val candidates = postings
        .select(explode(expr(
          """flatten(transform(docs, (x, i) ->
            |  transform(slice(docs, i + 2, size(docs)), y -> struct(x, y))))"""
            .stripMargin)).as("p"))
        .select(col("p.x.id").as("doc_a"), col("p.y.id").as("doc_b"),
          col("p.x.n").as("n_a"), col("p.y.n").as("n_b"),
          col("p.x.rk").as("rk_a"), col("p.y.rk").as("rk_b"))
        .filter(col("n_b") >= col("n_a") * t - lit(1e-9) &&
          col("n_a") >= col("n_b") * t - lit(1e-9))
        .filter(lit(1) + least(col("n_a") - col("rk_a"), col("n_b") - col("rk_b"))
          >= lit(t / (1.0 + t)) * (col("n_a") + col("n_b")) - lit(1e-9))
        .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
        .distinct()
      val docsets = perDoc.select(col("doc_id"),
        expr("transform(shs, x -> x.shingle)").as("shset"))
      val jac = col("n_inter").cast("double") /
        (col("n_a") + col("n_b") - col("n_inter"))
      candidates
        .join(docsets.select(col("doc_id").as("doc_a"), col("shset").as("sa")), Seq("doc_a"))
        .join(docsets.select(col("doc_id").as("doc_b"), col("shset").as("sb")), Seq("doc_b"))
        .withColumn("n_inter", size(array_intersect(col("sa"), col("sb"))))
        .filter(jac >= t)
        .select(col("doc_a"), col("doc_b"), round(jac, 4).as("jaccard"))
    }

    // N5: N4 + the two verify joins broadcast the CANDIDATE side (tiny
    // post-filter pair list) so the docset table never shuffles
    time("N5 ngram bcast-candidates") {
      val t = 0.8
      val sh = Dedup.shingles(docs, "doc_id", "text", 3)
      val dfTable = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      val dfed = sh.join(broadcast(dfTable), Seq("shingle"))
      val perDoc = dfed.groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("df"), col("shingle"))))
          .as("shs"))
        .select(col("doc_id"), col("shs"),
          size(col("shs")).cast("long").as("n_doc"))
        .localCheckpoint()
      val prefix = perDoc
        .select(col("doc_id"), col("n_doc"),
          posexplode(expr(s"slice(shs, 1, " +
            s"CAST(floor((1.0 - $t) * n_doc + 1e-9) AS INT) + 1)")))
        .select(col("doc_id"), col("n_doc"),
          (col("pos") + 1).as("rk"), col("col.shingle").as("shingle"))
      val postings = prefix
        .groupBy(col("shingle"))
        .agg(sort_array(collect_list(struct(col("doc_id").as("id"),
          col("n_doc").as("n"), col("rk").as("rk")))).as("docs"))
        .filter(size(col("docs")) >= 2)
      val candidates = postings
        .select(explode(expr(
          """flatten(transform(docs, (x, i) ->
            |  transform(slice(docs, i + 2, size(docs)), y -> struct(x, y))))"""
            .stripMargin)).as("p"))
        .select(col("p.x.id").as("doc_a"), col("p.y.id").as("doc_b"),
          col("p.x.n").as("n_a"), col("p.y.n").as("n_b"),
          col("p.x.rk").as("rk_a"), col("p.y.rk").as("rk_b"))
        .filter(col("n_b") >= col("n_a") * t - lit(1e-9) &&
          col("n_a") >= col("n_b") * t - lit(1e-9))
        .filter(lit(1) + least(col("n_a") - col("rk_a"), col("n_b") - col("rk_b"))
          >= lit(t / (1.0 + t)) * (col("n_a") + col("n_b")) - lit(1e-9))
        .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
        .distinct()
      val docsets = perDoc.select(col("doc_id"),
        expr("transform(shs, x -> x.shingle)").as("shset"))
      val jac = col("n_inter").cast("double") /
        (col("n_a") + col("n_b") - col("n_inter"))
      broadcast(candidates)
        .join(docsets.select(col("doc_id").as("doc_a"), col("shset").as("sa")), Seq("doc_a"))
        .join(docsets.select(col("doc_id").as("doc_b"), col("shset").as("sb")), Seq("doc_b"))
        .withColumn("n_inter", size(array_intersect(col("sa"), col("sb"))))
        .filter(jac >= t)
        .select(col("doc_a"), col("doc_b"), round(jac, 4).as("jaccard"))
    }

    // N6/N7: the BENCH threshold (0.5 — weak prefix filtering by
    // design). N6 = shipped (window df + broadcast candidates); N7 =
    // df via agg + broadcast join-back on top of N6.
    time("N6 t0.5 shipped") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
        threshold = 0.5, broadcastCandidates = true)
    }
    time("N7 t0.5 agg-bcast-df") {
      val t = 0.5
      val sh = Dedup.shingles(docs, "doc_id", "text", 3)
      val dfTable = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      val dfed = sh.join(broadcast(dfTable), Seq("shingle"))
      val perDoc = dfed.groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("df"), col("shingle"))))
          .as("shs"))
        .select(col("doc_id"), col("shs"),
          size(col("shs")).cast("long").as("n_doc"))
        .localCheckpoint()
      val prefix = perDoc
        .select(col("doc_id"), col("n_doc"),
          posexplode(expr(s"slice(shs, 1, " +
            s"CAST(floor((1.0 - $t) * n_doc + 1e-9) AS INT) + 1)")))
        .select(col("doc_id"), col("n_doc"),
          (col("pos") + 1).as("rk"), col("col.shingle").as("shingle"))
      val postings = prefix
        .groupBy(col("shingle"))
        .agg(sort_array(collect_list(struct(col("doc_id").as("id"),
          col("n_doc").as("n"), col("rk").as("rk")))).as("docs"))
        .filter(size(col("docs")) >= 2)
      val candidates = postings
        .select(explode(expr(
          """flatten(transform(docs, (x, i) ->
            |  transform(slice(docs, i + 2, size(docs)), y -> struct(x, y))))"""
            .stripMargin)).as("p"))
        .select(col("p.x.id").as("doc_a"), col("p.y.id").as("doc_b"),
          col("p.x.n").as("n_a"), col("p.y.n").as("n_b"),
          col("p.x.rk").as("rk_a"), col("p.y.rk").as("rk_b"))
        .filter(col("n_b") >= col("n_a") * t - lit(1e-9) &&
          col("n_a") >= col("n_b") * t - lit(1e-9))
        .filter(lit(1) + least(col("n_a") - col("rk_a"), col("n_b") - col("rk_b"))
          >= lit(t / (1.0 + t)) * (col("n_a") + col("n_b")) - lit(1e-9))
        .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
        .distinct()
      val docsets = perDoc.select(col("doc_id"),
        expr("transform(shs, x -> x.shingle)").as("shset"))
      val jac = col("n_inter").cast("double") /
        (col("n_a") + col("n_b") - col("n_inter"))
      broadcast(candidates)
        .join(docsets.select(col("doc_id").as("doc_a"), col("shset").as("sa")), Seq("doc_a"))
        .join(docsets.select(col("doc_id").as("doc_b"), col("shset").as("sb")), Seq("doc_b"))
        .withColumn("n_inter", size(array_intersect(col("sa"), col("sb"))))
        .filter(jac >= t)
        .select(col("doc_a"), col("doc_b"), round(jac, 4).as("jaccard"))
    }

    // S1: CURRENT shipped simhash. NOTE (post-switch): now the wide
    // 63-column shape, so S1 vs S2 is shipped-vs-inlined. Historical
    // baseline (per-(word, bit) row explosion): 0.56 s warm at sf0.1 —
    // equal HERE because the fixture vocabulary is tiny; the wide shape
    // wins at web-scale vocabularies (no x63 row intermediate).
    time("S1 simhash shipped") {
      Dedup.simhash(docs, "doc_id", "text")
    }

    // S2: wide formulation — 63 sign columns per DISTINCT word, one
    // wide groupBy(doc) with 63 sums; no ×63 row explosion
    time("S2 simhash wide") {
      val wc = docs
        .select(col("doc_id"),
          explode(graft.ext.TextAnalysis.words(col("text"))).as("word"))
        .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("cnt"))
      val nibs = (0 until 16).map { p =>
        (expr(s"instr('0123456789abcdef', substring(hh, ${p + 1}, 1))") - 1)
          .as(s"nib_$p")
      }
      val vocab0 = wc.select(col("word")).distinct()
        .withColumn("hh", substring(md5(col("word")), 1, 16))
        .select(col("word") +: nibs: _*)
      val sgns = (0 until 63).map { j =>
        ((expr(s"shiftright(nib_${j / 4}, ${3 - j % 4})") % 2) * 2 - 1)
          .as(s"sgn_$j")
      }
      val vocab = vocab0.select(col("word") +: sgns: _*)
      val sums = (0 until 63).map(j =>
        sum(col("cnt") * col(s"sgn_$j")).as(s"v_$j"))
      val perDoc = wc.join(vocab, Seq("word"))
        .groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
      val fp = (0 until 63).map(j =>
        when(col(s"v_$j") > 0, lit(1L << j)).otherwise(lit(0L)))
        .reduce(_ + _)
      perDoc.select(col("doc_id"), fp.as("simhash"))
    }

    spark.stop()
  }
}
