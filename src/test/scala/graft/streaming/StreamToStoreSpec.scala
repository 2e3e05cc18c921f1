package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.model.GraphStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** End-to-end §3.1 streaming posture: micro-batches of flow rollups merged
  * idempotently into the edge store via foreachBatch — the full
  * reference lifecycle (ClickHouse window agg → Neptune edge upsert) on
  * the Spark-native path. */
class StreamToStoreSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed rollup micro-batches merge into the edge store") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    var store = Seq.empty[(String, String, String, String, String, Long, Double)]
      .toDF("src_label", "src_name", "edge_label", "dst_label", "dst_name",
        "calls", "avg_value")

    val mem = MemoryStream[(String, String, Double, Timestamp)]
    mem.addData(
      ("payment", "db", 10.0, ts("2024-01-01 00:00:10")),
      ("payment", "db", 30.0, ts("2024-01-01 00:01:10")),
      ("search", "cache", 1.0, ts("2024-01-01 00:02:00")),
      ("late", "db", 5.0, ts("2024-01-01 00:30:00")) // advances watermark
    )
    val rolled = FlowStream.windowedRollup(
      mem.toDF().toDF("src", "dst", "value", "ts"),
      "src", "dst", "value", errPredicate = lit(false),
      windowLen = "5 minutes", slide = "5 minutes")

    def mergeBatch(batch: DataFrame, id: Long): Unit = {
      val edges = batch.select(
        lit("Microservice").as("src_label"), col("src").as("src_name"),
        lit("Calls").as("edge_label"),
        lit("Service").as("dst_label"), col("dst").as("dst_name"),
        col("calls"), col("avg_value"))
      store = GraphStore.mergeEdges(store, edges, Seq("calls", "avg_value"))
      store.cache().count() // materialize per micro-batch
      ()
    }
    val q = FlowStream.sink(rolled, mergeBatch).start()
    q.awaitTermination(60000)

    val m = store.collect()
      .map(r => r.getAs[String]("src_name") -> r).toMap
    assert(m.contains("payment") && m.contains("search"))
    assert(m("payment").getAs[Long]("calls") == 2)
    assert(m("payment").getAs[Double]("avg_value") == 20.0)
    assert(m("payment").getAs[String]("edge_label") == "Calls")
  }
}
