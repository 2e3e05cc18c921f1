package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Layout contract for the corpus writer: hive partitions exist and prune
  * at PLAN time, in-partition row order is the requested shard order,
  * and the record cap bounds every emitted file. These are the physical
  * properties a 100 TB consumer relies on — asserted on the actual files,
  * not on writer options.
  *
  * Fixture arithmetic (500 docs): split=heldout on i%10==0 (50 docs),
  * lang=en on i%3==0 (167 docs, 17 of them heldout) →
  * train/en 150, train/de 300, heldout/en 17, heldout/de 33.
  */
class CorpusLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def corpus() = (0 until 500).map { i =>
    (i.toLong, s"doc $i", if (i % 10 == 0) "heldout" else "train",
      if (i % 3 == 0) "en" else "de", i % 7)
  }.toDF("doc_id", "text", "split", "lang", "shard")

  test("partitioned write: directories, pruning, order, and file caps hold") {
    val path = Files.createTempDirectory("corpus-layout").toString
    CorpusLayout.write(corpus(), path,
      partitionCols = Seq("split", "lang"),
      sortCols = Seq("shard", "doc_id"),
      maxRecordsPerFile = 100L)

    // hive directory structure: every (split, lang) combination present
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory)
      .flatMap(d => d.listFiles().filter(_.isDirectory)
        .map(l => s"${d.getName}/${l.getName}")).toSet
    assert(dirs == Set("split=train/lang=en", "split=train/lang=de",
      "split=heldout/lang=en", "split=heldout/lang=de"))

    // plan-time pruning: the slice read carries PartitionFilters — the
    // other slices' bytes are never opened
    val slice = CorpusLayout.readSlice(spark, path,
      "split" -> "train", "lang" -> "en")
    slice.collect()
    val plan = slice.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("PartitionFilters:") &&
      plan.contains("split") && plan.contains("lang"), plan.take(500))
    assert(slice.count() == 150L)

    // per-file contracts on the ACTUAL parquet files: record cap holds,
    // and rows inside each file are in (shard, doc_id) order
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    Files.walk(java.nio.file.Paths.get(path)).iterator().forEachRemaining(p =>
      if (p.toString.endsWith(".parquet")) buf += p.toString)
    assert(buf.nonEmpty)
    // train/de holds 300 rows at cap 100 → at least 3 files there
    assert(buf.count(_.contains("split=train/lang=de")) >= 3)
    buf.foreach { f =>
      val rows = spark.read.parquet(f)
        .select(col("shard"), col("doc_id"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
      assert(rows.length <= 100, s"file over cap: $f (${rows.length})")
      assert(rows == rows.sorted, s"file out of shard order: $f")
    }

    // the full read-back is lossless
    val back = spark.read.parquet(path)
    assert(back.count() == 500L)
    assert(back.select(sum(col("doc_id"))).head().getLong(0) ==
      (0L until 500L).sum)
  }

  test("compaction: fewer files, same rows, global shard order, siblings untouched") {
    val path = Files.createTempDirectory("corpus-compact").toString
    // tiny cap → train/de's 300 rows land in many small files (the
    // streaming-landing-zone shape compaction exists for)
    CorpusLayout.write(corpus(), path,
      partitionCols = Seq("split", "lang"),
      sortCols = Seq("shard", "doc_id"),
      maxRecordsPerFile = 40L)

    def files(sub: String): Seq[String] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      Files.walk(java.nio.file.Paths.get(s"$path/$sub")).iterator()
        .forEachRemaining(p =>
          if (p.toString.endsWith(".parquet")) buf += p.toString)
      buf.toSeq.sorted
    }
    val sibling = files("split=train/lang=en")
    assert(files("split=train/lang=de").size >= 8) // 300 rows / cap 40

    val (before, after) = CorpusLayout.compactSlice(spark, path,
      partition = Seq("split" -> "train", "lang" -> "de"),
      sortCols = Seq("shard", "doc_id"),
      maxRecordsPerFile = 150L)
    assert(before >= 8 && after == 2, s"before=$before after=$after")

    // rows intact, and the GLOBAL (shard, doc_id) order holds across the
    // compacted files when read in filename order
    val ordered = files("split=train/lang=de").flatMap { f =>
      spark.read.parquet(f).select(col("shard"), col("doc_id"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    }
    assert(ordered.length == 300)
    assert(ordered == ordered.sorted, "global order lost across files")

    // sibling partition untouched, full corpus still lossless
    assert(files("split=train/lang=en") == sibling)
    assert(spark.read.parquet(path).count() == 500L)

    // no compaction debris: the tmp and rename-aside dirs are gone
    val debris = new java.io.File(path).listFiles()
      .filter(f => f.getName.startsWith(".compact_")).map(_.getName)
    assert(debris.isEmpty, debris.mkString(","))
  }

  test("aborted compaction leaves the slice intact and no tmp debris") {
    val path = Files.createTempDirectory("corpus-abort").toString
    CorpusLayout.write(corpus(), path,
      partitionCols = Seq("split", "lang"),
      sortCols = Seq("shard", "doc_id"),
      maxRecordsPerFile = 40L)
    def files(sub: String): Seq[String] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      Files.walk(java.nio.file.Paths.get(s"$path/$sub")).iterator()
        .forEachRemaining(p =>
          if (p.toString.endsWith(".parquet")) buf += p.toString)
      buf.toSeq.sorted
    }
    val beforeFiles = files("split=train/lang=de")

    // a sort column that doesn't exist makes the tmp rewrite throw
    // before any swap step — the failure mode ADVICE r9 flagged
    intercept[Exception] {
      CorpusLayout.compactSlice(spark, path,
        partition = Seq("split" -> "train", "lang" -> "de"),
        sortCols = Seq("no_such_column"),
        maxRecordsPerFile = 150L)
    }

    // live slice untouched, readable, and the failed rewrite reclaimed
    assert(files("split=train/lang=de") == beforeFiles)
    assert(CorpusLayout.readSlice(spark, path,
      "split" -> "train", "lang" -> "de").count() == 300L)
    val debris = new java.io.File(path).listFiles()
      .filter(f => f.getName.startsWith(".compact_")).map(_.getName)
    assert(debris.isEmpty, debris.mkString(","))
  }
}
