package graft.model

import java.nio.file.Files
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, Executors, TimeUnit}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Canary for the wave layout's physical-write assumption (round 16
  * #1, suspect b): an appender and a compactor run CONCURRENT Spark
  * write jobs into the same table root, each dynamic-partition-
  * overwriting its own `batch=` partition. Dynamic overwrite stages
  * task files under a per-job `.spark-staging-<uuid>` dir (never the
  * shared FileOutputCommitter `_temporary`), so disjoint-partition
  * writers must not corrupt or lose each other's rows. This spec
  * hammers that contract directly — 12 rounds of paired simultaneous
  * jobs — so a Spark upgrade that changes the committer's staging
  * behavior fails HERE, with a readable diff, instead of as a flaky
  * mixed-serve in WaveRaceSpec.
  */
class ConcurrentWaveWriteSpec extends SparkSpec {
  import spark.implicits._

  test("concurrent dynamic-overwrite jobs on one table root, disjoint " +
      "batch partitions: no rows lost, none duplicated, no job fails") {
    val root = Files.createTempDirectory("conc-write").toString + "/t"
    val errs = new ConcurrentLinkedQueue[Throwable]()
    (1 to 12).foreach { iter =>
      val start = new CountDownLatch(1)
      val pool = Executors.newFixedThreadPool(2)
      val fut = (0 to 1).map { side =>
        pool.submit(new Runnable {
          def run(): Unit = {
            start.await()
            try {
              val w = iter.toLong * 2 + side
              Seq.tabulate(50)(i => (w, i.toLong)).toDF("batch", "v")
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch").parquet(root)
            } catch { case e: Throwable => errs.add(e) }
          }
        })
      }
      start.countDown()
      fut.foreach(_.get(120, TimeUnit.SECONDS))
      pool.shutdown()
    }
    if (!errs.isEmpty) throw errs.peek()
    val got = spark.read.parquet(root).groupBy("batch")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[Number](0).longValue -> r.getLong(1)).toMap
    val want = (1 to 12).flatMap(i => Seq(i.toLong * 2, i.toLong * 2 + 1))
      .map(_ -> 50L).toMap
    assert(got === want)
  }
}
