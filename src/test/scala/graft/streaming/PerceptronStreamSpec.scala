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
