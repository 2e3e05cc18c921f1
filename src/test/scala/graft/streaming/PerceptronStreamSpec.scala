package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.ext.Perceptron
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** The online-perceptron streaming face: the streamed fold equals
  * applying Perceptron.round sequentially over the same batches —
  * including through a crash between a weight wave landing and its
  * batch committing — and empty batches carry the chain forward. */
class PerceptronStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("y", LongType), StructField("x", LongType)))

  private val xCols = Seq("x")

  test("streamed fold ≡ sequential rounds, crash replay included") {
    // three batches of (y, x) rows, separable overall but not per batch
    val batches = Seq(
      Seq((1L, 5L), (-1L, -3L), (1L, 2L)),
      Seq((-1L, -1L), (-1L, -6L)),
      Seq((1L, 4L), (-1L, -2L), (1L, 7L), (-1L, -5L)))
    val inDir = Files.createTempDirectory("pstream-in").toString
    val ckpt = Files.createTempDirectory("pstream-ckpt").toString
    val path = Files.createTempDirectory("pstream-w").toString
    batches.zipWithIndex.foreach { case (rows, i) =>
      val p = Paths.get(inDir, s"b$i.json")
      Files.write(p,
        rows.map { case (y, x) => s"""{"y":$y,"x":$x}""" }
          .mkString("", "\n", "\n").getBytes)
      // the file source orders batches by modification time — pin
      // strictly increasing mtimes so the fold order is b0, b1, b2
      p.toFile.setLastModified(1000000000000L + i * 60000L)
      ()
    }

    @volatile var crashed = false
    def run(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(inDir)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          PerceptronStream.appendBatch(batch, "y", xCols, path, id)
          // crash AFTER the weight wave landed, BEFORE the batch
          // commits — the replay must re-read the same INPUT wave and
          // overwrite its own output identically, not fold twice
          if (id == 1 && !crashed) {
            crashed = true
            throw new RuntimeException("simulated crash before batch commit")
          }
          ()
        }
        .start()
      try q.awaitTermination(60000)
      catch {
        case e: org.apache.spark.sql.streaming.StreamingQueryException =>
          assert(e.getMessage.contains("simulated crash"), e.getMessage)
      }
    }
    run()
    assert(crashed)
    run()

    val streamed = PerceptronStream.model(spark, path, xCols).w.toSeq
    // mtimes pinned above force delivery order b0, b1, b2
    var w = Array.fill(2)(0L)
    batches.foreach { rows =>
      w = Perceptron.round(rows.toDF("y", "x"), "y", xCols, w)
    }
    assert(streamed === w.toSeq)
  }

  test("a fresh-checkpoint second stream continues the chain WARM — " +
      "never re-reads zeros or overwrites pinned waves") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val path = Files.createTempDirectory("pstream-w2").toString
    val b0 = Seq((1L, 5L), (-1L, -3L), (1L, 2L))
    val b1 = Seq((-1L, -1L), (1L, 4L))
    def runOnce(rows: Seq[(Long, Long)]): Unit = {
      val mem = MemoryStream[(Long, Long)]
      mem.addData(rows: _*)
      val q = PerceptronStream.start(mem.toDS().toDF("y", "x"),
        "y", xCols, path,
        Files.createTempDirectory("pstream-ck").toString)
      try q.processAllAvailable() finally q.stop()
    }
    runOnce(b0)
    val w1 = Perceptron.round(b0.toDF("y", "x"), "y", xCols,
      Array.fill(2)(0L))
    assert(PerceptronStream.model(spark, path, xCols).w.toSeq === w1.toSeq)
    // run 2 restarts epoch ids at 0 — its base must map batch 0 to
    // READ the pinned chain's latest wave (warm start), not wave 0's
    // zeros, and to WRITE above everything pinned
    runOnce(b1)
    val w2 = Perceptron.round(b1.toDF("y", "x"), "y", xCols, w1)
    assert(PerceptronStream.model(spark, path, xCols).w.toSeq === w2.toSeq)
  }

  test("appendBatch refuses a wave that would fork behind the pinned " +
      "chain; replay of the LAST wave stays legal") {
    val path = Files.createTempDirectory("pstream-f").toString
    val b0 = Seq((1L, 3L), (-1L, -2L)).toDF("y", "x")
    val b1 = Seq((1L, 6L)).toDF("y", "x")
    PerceptronStream.appendBatch(b0, "y", xCols, path, 0L)
    PerceptronStream.appendBatch(b1, "y", xCols, path, 1L) // pinned {1,2}
    val before = PerceptronStream.model(spark, path, xCols).w.toSeq
    // replaying the last position (target wave 2 == max pinned) is the
    // at-least-once contract — identical content, same model
    PerceptronStream.appendBatch(b1, "y", xCols, path, 1L)
    assert(PerceptronStream.model(spark, path, xCols).w.toSeq === before)
    // but a target wave BEHIND the pinned max is a chain fork — loud
    val e = intercept[IllegalArgumentException] {
      PerceptronStream.appendBatch(b1, "y", xCols, path, 0L)
    }
    assert(e.getMessage.contains("fork"))
  }

  test("an empty micro-batch carries the chain forward") {
    val path = Files.createTempDirectory("pstream-e").toString
    val b0 = Seq((1L, 3L), (-1L, -2L)).toDF("y", "x")
    PerceptronStream.appendBatch(b0, "y", xCols, path, 0L)
    val after0 = PerceptronStream.model(spark, path, xCols).w.toSeq
    PerceptronStream.appendBatch(
      Seq.empty[(Long, Long)].toDF("y", "x"), "y", xCols, path, 1L)
    assert(PerceptronStream.model(spark, path, xCols).w.toSeq === after0)
    // and the chain continues from the carried weights
    val b2 = Seq((1L, 9L)).toDF("y", "x")
    PerceptronStream.appendBatch(b2, "y", xCols, path, 2L)
    val expect = Perceptron.round(b2, "y", xCols, after0.toArray)
    assert(PerceptronStream.model(spark, path, xCols).w.toSeq ===
      expect.toSeq)
  }
}
