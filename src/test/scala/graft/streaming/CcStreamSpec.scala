package graft.streaming

import graft.SparkSpec
import graft.ext.Components
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Streaming cluster-label contracts: stream-maintained labels must
  * equal a batch clustering over all edges seen, and a replayed batch
  * must not change them.
  */
class CcStreamSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("ccstream").toString + "/labels"

  private def labelMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("stream labels == batch clustering over all edges seen") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = freshRoot()
    val mem = MemoryStream[(Long, Long)]
    val q = CcStream.maintain(mem.toDF().toDF("a", "b"), "a", "b", root,
      trigger = Trigger.ProcessingTime("0 seconds")).start()
    // batch 1: two separate chains; batch 2 bridges them and adds a
    // smaller-id node, forcing a cross-batch relabel
    val b1 = Seq((10L, 11L), (20L, 21L), (30L, 31L))
    val b2 = Seq((11L, 21L), (5L, 30L))
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val streamed = labelMap(CcStream.labels(spark, root))
    val scratch = labelMap(
      Components.connectedAdaptive((b1 ++ b2).toDF("a", "b"), "a", "b"))
    assert(streamed === scratch)
    assert(streamed(5L) === 5L && streamed(30L) === 5L) // relabel happened
    assert(streamed(10L) === 10L && streamed(21L) === 10L)
  }

  test("replaying an absorbed batch leaves the labels unchanged") {
    val root = freshRoot()
    val b1 = Seq((1L, 2L), (8L, 9L)).toDF("a", "b")
    val b2 = Seq((2L, 8L)).toDF("a", "b")
    CcStream.applyBatch(b1, "a", "b", root)
    CcStream.applyBatch(b2, "a", "b", root)
    val before = labelMap(CcStream.labels(spark, root))
    CcStream.applyBatch(b2, "a", "b", root) // at-least-once replay
    val after = labelMap(CcStream.labels(spark, root))
    assert(after === before)
    assert(after === Map(1L -> 1L, 2L -> 1L, 8L -> 1L, 9L -> 1L))
  }

  test("state recovers from files alone and history is bounded") {
    val root = freshRoot()
    CcStream.applyBatch(Seq((3L, 4L)).toDF("a", "b"), "a", "b", root)
    CcStream.applyBatch(Seq((4L, 5L)).toDF("a", "b"), "a", "b", root)
    CcStream.applyBatch(Seq((6L, 7L)).toDF("a", "b"), "a", "b", root)
    // a "restarted" consumer sees the latest snapshot with no stream
    assert(labelMap(CcStream.labels(spark, root)) ===
      Map(3L -> 3L, 4L -> 3L, 5L -> 3L, 6L -> 6L, 7L -> 6L))
    // retention: expire to the last snapshot, labels still served
    graft.model.GraphStorage.expireSnapshots(spark, root, keepLast = 1)
    assert(labelMap(CcStream.labels(spark, root)).size === 5)
  }
}
