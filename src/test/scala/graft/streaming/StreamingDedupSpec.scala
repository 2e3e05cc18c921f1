package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("in-horizon duplicates suppressed; normalization-equal texts dedup") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    mem.addData(
      (1L, "Hello  World", ts("2024-01-01 00:00:00")),
      (2L, "hello world",  ts("2024-01-01 00:01:00")), // dup by fingerprint
      (3L, "something else", ts("2024-01-01 00:02:00")),
      (4L, "Hello World",  ts("2024-01-01 00:03:00"))  // dup again
    )
    val out = StreamingDedup(
      mem.toDF().toDF("doc_id", "text", "ts"), "text", "ts", "10 minutes")

    var seen = Vector.empty[Long]
    val q = out.writeStream
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        seen = seen ++ b.select("doc_id").as[Long].collect()
      }.start()
    q.awaitTermination(60000)

    assert(seen.sorted == Vector(1L, 3L)) // first occurrence wins per fp
  }
}
