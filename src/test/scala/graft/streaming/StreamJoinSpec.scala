package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val clicks = Seq(
    (1L, ts("2024-01-01 00:00:00")),
    (1L, ts("2024-01-01 00:30:00")),
    (2L, ts("2024-01-01 00:05:00")),
    (3L, ts("2024-01-01 02:00:00")) // no purchase follows
  )
  private val purchases = Seq(
    (1L, ts("2024-01-01 00:45:00"), 10.0), // within 1h of both user-1 clicks
    (2L, ts("2024-01-01 01:30:00"), 5.0),  // 85 min after click → outside
    (4L, ts("2024-01-01 00:10:00"), 7.0)   // user never clicked
  )

  test("interval join attributes purchases to in-window clicks, batch ≡ stream") {
    val batch = StreamJoin.attribution(
      clicks.toDF("user_id", "ts"),
      purchases.toDF("user_id", "ts", "value"), "user_id", within = "1 hour")
      .collect().map(_.toString).sorted.toSeq
    // user 1's purchase matches both clicks; user 2's is out of window
    assert(batch.size == 2)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cMem = MemoryStream[(Long, Timestamp)]
    val pMem = MemoryStream[(Long, Timestamp, Double)]
    cMem.addData(clicks: _*)
    pMem.addData(purchases: _*)
    val joined = StreamJoin.attribution(
      cMem.toDF().toDF("user_id", "ts"),
      pMem.toDF().toDF("user_id", "ts", "value"), "user_id", within = "1 hour")
    var captured = Seq.empty[String]
    val q = joined.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        captured = captured ++ b.collect().map(_.toString)
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sjoin").toString)
      .start()
    q.awaitTermination(120000)

    assert(captured.sorted.toSeq == batch)
  }

  test("purchases strictly before the click never match") {
    val out = StreamJoin.attribution(
      Seq((9L, ts("2024-01-01 01:00:00"))).toDF("user_id", "ts"),
      Seq((9L, ts("2024-01-01 00:59:00"), 1.0)).toDF("user_id", "ts", "value"),
      "user_id")
    assert(out.count() == 0)
  }
}
