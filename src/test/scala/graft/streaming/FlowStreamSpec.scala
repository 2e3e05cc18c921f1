package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class FlowStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed rollup is trigger-agnostic: same result batch vs stream") {
    val rows = Seq(
      ("a", "x", 10.0, ts("2024-01-01 00:00:30")),
      ("a", "x", 50.0, ts("2024-01-01 00:01:30")),
      ("b", "y", 5.0,  ts("2024-01-01 00:02:00")),
      ("a", "x", 30.0, ts("2024-01-01 00:07:00")) // next slide
    )

    // batch path
    val batchDf = rows.toDF("src", "dst", "value", "ts")
    val batchAll = FlowStream.windowedRollup(batchDf, "src", "dst", "value",
        errPredicate = $"value" >= 40.0)
    val batchOut = batchAll
      .select("window_start", "src", "dst", "calls", "avg_value", "err_count")
      .collect().map(_.toString).sorted.toSeq
    // append-mode streaming only emits FINALIZED windows: those whose end is
    // ≤ watermark (max event time 00:07 − 1 min = 00:06). The 00:05–00:11
    // window stays open awaiting late data.
    val closedOut = batchAll
      .filter($"window_end" <= lit(ts("2024-01-01 00:06:00")))
      .select("window_start", "src", "dst", "calls", "avg_value", "err_count")
      .collect().map(_.toString).sorted.toSeq

    // streaming path (MemoryStream + AvailableNow over foreachBatch sink)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, String, Double, Timestamp)]
    mem.addData(rows: _*)
    val streamDf = mem.toDF().toDF("src", "dst", "value", "ts")
    val rolled = FlowStream.windowedRollup(streamDf, "src", "dst", "value",
      errPredicate = $"value" >= 40.0)
    var captured = Seq.empty[String]
    val q = FlowStream.sink(rolled, (batch, _) => {
      captured = captured ++ batch
        .select("window_start", "src", "dst", "calls", "avg_value", "err_count")
        .collect().map(_.toString)
    }).start()
    q.awaitTermination(60000)

    assert(captured.sorted == closedOut)
    assert(captured.nonEmpty)
    assert(captured.toSet.subsetOf(batchOut.toSet)) // stream ⊆ batch, never extra
    // sliding overlap: source rows land in two windows (6 m len, 5 m slide)
    assert(batchAll.filter($"src" === "a").count() >= 2)
  }
}
