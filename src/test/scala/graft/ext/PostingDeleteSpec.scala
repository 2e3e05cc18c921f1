package graft.ext

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Tombstone deletes on the posting index — LUCENE SEMANTICS pinned
  * from both sides: before compaction, masked docs vanish from results
  * while every surviving doc's score is BIT-IDENTICAL (stale df/N/
  * avgdl); after compaction, the index serves exactly like a fresh
  * build on the survivors (statistics refreshed at the merge). */
class PostingDeleteSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark join table scan fast"),
    (2L, "slow table scan table scan"),
    (3L, "spark spark join"),
    (4L, "nothing relevant here at all"),
    (5L, "join")).toDF("doc_id", "text")

  private val terms = Seq("spark", "table", "join")

  private def freshPath() =
    Files.createTempDirectory("graft_pdel_").toString

  private def serve(path: String,
      pin: Option[Seq[Long]] = None): Map[Long, (Long, Seq[Long], Double)] =
    PostingIndex.scoreQuery(spark, path, terms, termBuckets = 8, pin = pin)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), (2 to 4).map(r.getLong), r.getDouble(5)))).toMap

  test("pre-compaction: masked docs vanish, survivors score " +
      "BIT-IDENTICALLY (stale statistics — the Lucene contract)") {
    val path = freshPath()
    PostingIndex.build(docs, "doc_id", "text", path, termBuckets = 8)
    val before = serve(path)
    assert(before.keySet === Set(1L, 2L, 3L, 5L))
    val prePin = graft.model.WaveManifest.pinned(spark, path)
    PostingIndex.deleteSave(path, Seq(2L).toDF("doc_id"), "doc_id",
      wave = 1L)
    val after = serve(path)
    assert(after.keySet === Set(1L, 3L, 5L))
    after.foreach { case (id, row) => assert(row === before(id), s"doc $id") }
    // replayed delete changes nothing
    PostingIndex.deleteSave(path, Seq(2L).toDF("doc_id"), "doc_id",
      wave = 1L)
    assert(serve(path) === after)
    // the pre-delete pin still serves doc 2 (snapshot semantics) —
    // tombstone wave 1 is not in its pinned set
    assert(serve(path, pin = prePin).keySet === Set(1L, 2L, 3L, 5L))
  }

  test("compaction refreshes statistics: serve equals a fresh build " +
      "on the survivors, score-for-score") {
    val path = freshPath()
    PostingIndex.build(docs, "doc_id", "text", path, termBuckets = 8)
    PostingIndex.deleteSave(path, Seq(2L, 4L).toDF("doc_id"), "doc_id",
      wave = 1L)
    val stale = serve(path)
    PostingIndex.compact(spark, path)
    val compacted = serve(path)
    val fresh = freshPath()
    PostingIndex.build(docs.filter(!$"doc_id".isin(2L, 4L)),
      "doc_id", "text", fresh, termBuckets = 8)
    assert(compacted === serve(fresh))
    assert(compacted.keySet === stale.keySet)
    // the refresh MOVED scores (n_docs fell from 5 to 3) — if these
    // were equal the stale-stats half of the contract would be
    // vacuous on this fixture
    assert(compacted !== stale)
    // physical removal
    val pinnedWaves = graft.model.WaveManifest.pinned(spark, path).get
    val raw = spark.read.parquet(s"$path/postings")
      .filter(col("batch").isin(pinnedWaves.map(Long.box): _*))
    assert(raw.filter(col("doc_id").isin(2L, 4L)).count() === 0L)
  }
}
