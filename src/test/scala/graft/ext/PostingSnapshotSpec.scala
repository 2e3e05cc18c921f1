package graft.ext

import java.nio.file.Files

import graft.SparkSpec
import graft.model.WaveManifest

/** Manifest-pinned snapshot serving for the BM25 posting index (review
  * r11 item 2 — `PostingIndex.scala` used to NAME this hole): a serve
  * plan pins its wave set at plan time, so an append landing while the
  * serve is outstanding changes nothing; the serve answers either the
  * pre- or the post-append snapshot, never a mix of waves across the
  * four table scans.
  */
class PostingSnapshotSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark join table scan fast"),
    (2L, "slow table scan table scan"),
    (3L, "spark spark join"),
    (4L, "nothing relevant here at all"),
    (5L, "join")).toDF("doc_id", "text")

  private val terms = Seq("spark", "table", "join")

  private def freshPath() = Files.createTempDirectory("pidx_snap_").toString

  private def collectRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      (2 to 4).map(r.getLong), r.getDouble(5))).sortBy(_._1).toSeq

  test("a serve planned before an append answers the pre-append " +
      "snapshot even when executed after it; a fresh serve sees both") {
    val path = freshPath()
    PostingIndex.build(docs.filter($"doc_id" <= 3), "doc_id", "text",
      path, termBuckets = 8)
    // plan the serve FIRST — manifest pointer resolved here, pin {0} …
    val outstanding = PostingIndex.scoreQuery(spark, path, terms,
      termBuckets = 8)
    // … then a wave commits while that plan is outstanding
    PostingIndex.append(docs.filter($"doc_id" > 3), "doc_id", "text",
      path, wave = 1L, termBuckets = 8)
    // executed now, it still answers the 3-doc snapshot: identical to a
    // build over docs 1-3 alone (scores AND df/stats — nothing mixed in)
    val buildOnly = freshPath()
    PostingIndex.build(docs.filter($"doc_id" <= 3), "doc_id", "text",
      buildOnly, termBuckets = 8)
    assert(collectRows(outstanding) ===
      collectRows(PostingIndex.scoreQuery(spark, buildOnly, terms,
        termBuckets = 8)))
    // a fresh serve pins {0, 1} and equals build-on-everything
    val full = freshPath()
    PostingIndex.build(docs, "doc_id", "text", full, termBuckets = 8)
    val fresh = collectRows(PostingIndex.scoreQuery(spark, path, terms,
      termBuckets = 8))
    assert(fresh === collectRows(PostingIndex.scoreQuery(spark, full,
      terms, termBuckets = 8)))
    assert(fresh !== collectRows(outstanding)) // two distinct snapshots
  }

  test("an unpinned wave (data landed, manifest commit lost) is " +
      "invisible to serves until its replay commits") {
    val path = freshPath()
    PostingIndex.build(docs.filter($"doc_id" <= 3), "doc_id", "text",
      path, termBuckets = 8)
    // simulate the crash window: wave data written, manifest NOT moved
    PostingIndex.writeWave(docs.filter($"doc_id" > 3), "doc_id", "text",
      path, wave = 1L, termBuckets = 8, dynamic = true)
    val buildOnly = freshPath()
    PostingIndex.build(docs.filter($"doc_id" <= 3), "doc_id", "text",
      buildOnly, termBuckets = 8)
    assert(collectRows(PostingIndex.scoreQuery(spark, path, terms,
        termBuckets = 8)) ===
      collectRows(PostingIndex.scoreQuery(spark, buildOnly, terms,
        termBuckets = 8)))
    // the replay re-delivers the wave AND its manifest commit
    PostingIndex.append(docs.filter($"doc_id" > 3), "doc_id", "text",
      path, wave = 1L, termBuckets = 8)
    val full = freshPath()
    PostingIndex.build(docs, "doc_id", "text", full, termBuckets = 8)
    assert(collectRows(PostingIndex.scoreQuery(spark, path, terms,
        termBuckets = 8)) ===
      collectRows(PostingIndex.scoreQuery(spark, full, terms,
        termBuckets = 8)))
  }

  test("pinned serves list ONLY pinned batch dirs — an uncommitted " +
      "orphan (a superseded compactor's rewrite mid-delete) is never " +
      "touched by partition discovery (round-16 listing race)") {
    val path = freshPath()
    PostingIndex.build(docs.filter($"doc_id" <= 3), "doc_id", "text",
      path, termBuckets = 8)
    PostingIndex.append(docs.filter($"doc_id" > 3), "doc_id", "text",
      path, wave = 1L, termBuckets = 8)
    // plant an orphan compaction-space dir holding GARBAGE under every
    // table: a root-scan read would list it (and could sample its file
    // for schema inference, or crash when it vanishes mid-listing);
    // the explicit-dir read must never know it exists
    val orphan = graft.model.WaveManifest.CompactBase + 7L
    Seq("doclens", "postings", "terms", "stats").foreach { t =>
      val d = new java.io.File(s"$path/$t/batch=$orphan")
      assert(d.mkdirs())
      Files.write(java.nio.file.Paths.get(d.toString, "part-garbage"),
        "not parquet at all".getBytes("UTF-8"))
      ()
    }
    val serve = PostingIndex.scoreQuery(spark, path, terms,
      termBuckets = 8)
    val pinnedDirs = Set("batch=0", "batch=1")
    val listed = serve.inputFiles.toSeq
    assert(listed.nonEmpty)
    listed.foreach { f =>
      assert(pinnedDirs.exists(f.contains),
        s"serve listed a non-pinned path: $f")
      assert(!f.contains(s"batch=$orphan"), s"orphan dir listed: $f")
    }
    val full = freshPath()
    PostingIndex.build(docs, "doc_id", "text", full, termBuckets = 8)
    assert(collectRows(serve) ===
      collectRows(PostingIndex.scoreQuery(spark, full, terms,
        termBuckets = 8)))
  }

  test("explicit pin: time travel to an old manifest version") {
    val path = freshPath()
    PostingIndex.build(docs.filter($"doc_id" <= 3), "doc_id", "text",
      path, termBuckets = 8)
    PostingIndex.append(docs.filter($"doc_id" > 3), "doc_id", "text",
      path, wave = 1L, termBuckets = 8)
    val v0Waves = WaveManifest.wavesAt(spark, path, 0L)
    assert(v0Waves === Seq(0L))
    val buildOnly = freshPath()
    PostingIndex.build(docs.filter($"doc_id" <= 3), "doc_id", "text",
      buildOnly, termBuckets = 8)
    assert(collectRows(PostingIndex.scoreQuery(spark, path, terms,
        termBuckets = 8, pin = Some(v0Waves))) ===
      collectRows(PostingIndex.scoreQuery(spark, buildOnly, terms,
        termBuckets = 8)))
  }

  test("rebuild re-pins the manifest to wave {0} over appended history") {
    val path = freshPath()
    PostingIndex.build(docs, "doc_id", "text", path, termBuckets = 8)
    PostingIndex.append(docs.filter($"doc_id" > 3).select($"doc_id" + 100L
      as "doc_id", $"text"), "doc_id", "text", path, wave = 1L,
      termBuckets = 8)
    PostingIndex.build(docs.filter($"doc_id" <= 2), "doc_id", "text",
      path, termBuckets = 8)
    assert(WaveManifest.pinned(spark, path).contains(Seq(0L)))
    val n = spark.read.parquet(s"$path/stats")
      .agg(org.apache.spark.sql.functions.sum($"n_docs"))
      .collect().head.getDouble(0)
    assert(n === 2.0, "stale waves survived a rebuild")
  }
}
