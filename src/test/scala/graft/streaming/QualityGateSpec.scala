package graft.streaming

import graft.SparkSpec
import graft.ops.Expectations
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class QualityGateSpec extends SparkSpec {
  import spark.implicits._

  test("clean batches publish; a batch with any violation quarantines whole") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    var published = Vector.empty[(Long, Double)]
    var quarantined = Vector.empty[(Long, Double)]
    var reports = Vector.empty[String]

    val writer = QualityGate.gate(
      mem.toDF().toDF("id", "v"),
      rowRules = Seq(Expectations.inRange("v", 0.0, 100.0)),
      publish = (b, _) => published ++= b.as[(Long, Double)].collect(),
      quarantine = (b, _, rep) => {
        quarantined ++= b.as[(Long, Double)].collect()
        reports ++= rep.map(_.toString)
      })

    // batch 1: clean
    mem.addData((1L, 10.0), (2L, 20.0))
    val q1 = writer.option("checkpointLocation",
      java.nio.file.Files.createTempDirectory("qgate").toString).start()
    q1.awaitTermination(60000)
    assert(published.toSet == Set((1L, 10.0), (2L, 20.0)))
    assert(quarantined.isEmpty)

    // batch 2: one out-of-range row poisons the whole batch
    mem.addData((3L, 30.0), (4L, 500.0))
    val q2 = writer.start() // AvailableNow resumes from the checkpoint
    q2.awaitTermination(60000)
    assert(published.toSet == Set((1L, 10.0), (2L, 20.0))) // unchanged
    assert(quarantined.toSet == Set((3L, 30.0), (4L, 500.0)))
    assert(reports.exists(_.contains("in_range(v,0.0,100.0)")))
  }
}
