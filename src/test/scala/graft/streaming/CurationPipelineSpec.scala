package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.ext.{Dedup, PostingIndex}
import graft.ops.Expectations
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end STREAMING curation (review r15 #6): the composed
  * pipeline — quality gate → persisted near-dup filter → posting-index
  * append, one micro-batch body ([[CurationStream]]) — must produce a
  * corpus IDENTICAL to the documented batch faces run over the same
  * input split into micro-batches, through a mid-run crash with an
  * at-least-once replay:
  *   - a batch violating a rule quarantines WHOLE (QualityGate's
  *     routing rule) and never touches either index;
  *   - near-dups drop against the accumulated survivor index exactly
  *     as the per-batch batch face ([[StreamingNearDup.filterBatch]])
  *     does over the same split;
  *   - the final streamed index serves score-for-score what a
  *     one-shot [[PostingIndex.build]] over the batch-face survivor
  *     corpus serves.
  */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private val baseA =
    "alpha beta gamma delta epsilon zeta eta theta corpus"
  private val baseB =
    "fresh second batch content with many novel tokens corpus"
  private val b0 = Seq(
    (1L, baseA),
    (2L, baseA.toUpperCase), // in-batch near-dup of 1 (keep-min)
    (3L, "totally different words entirely here now today corpus yes"))
  private val b1 = Seq(
    (4L, baseA.replace(" ", "  ")), // cross-batch near-dup of indexed 1
    (5L, baseB))
  private val b2 = Seq( // DIRTY: null text → the whole batch quarantines
    (6L, null.asInstanceOf[String]),
    (7L, "a fine document that rides a dirty batch corpus"))
  private val b3 = Seq(
    (8L, baseB.toUpperCase), // cross-batch near-dup of indexed 5
    (9L, "another unique document with its own vocabulary corpus indeed"))

  private def writeBatchFile(dir: String, name: String,
      docs: Seq[(Long, String)]): Unit = {
    val body = docs.map { case (id, t) =>
      val tj = if (t == null) "null" else "\"" + t + "\""
      s"""{"doc_id":$id,"text":$tj}"""
    }.mkString("", "\n", "\n")
    Files.write(Paths.get(dir, name), body.getBytes("UTF-8"))
    ()
  }

  test("streamed corpus ≡ batch faces over the same micro-batch split, " +
      "through a crash + at-least-once replay and a quarantined batch") {
    val inDir = Files.createTempDirectory("curation-in").toString
    val ckpt = Files.createTempDirectory("curation-ckpt").toString
    val dedupPath = Files.createTempDirectory("curation-dd").toString + "/idx"
    val indexPath = Files.createTempDirectory("curation-pi").toString + "/pi"
    val rules = Seq(Expectations.notNull("text"))

    writeBatchFile(inDir, "f0.json", b0)
    writeBatchFile(inDir, "f1.json", b1)
    writeBatchFile(inDir, "f2.json", b2)

    var quarantined = Map.empty[Long, Set[Long]]
    var survived = Map.empty[Long, Set[Long]]
    @volatile var crashed = false
    @volatile var crashArmed = false
    def run(): Unit = {
      val q = CurationStream.start(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).json(inDir),
        "doc_id", "text", rules, dedupPath, indexPath, ckpt,
        quarantine = (batch: DataFrame, id: Long, _: Seq[Row]) =>
          quarantined += id -> batch.select("doc_id").as[Long]
            .collect().toSet,
        onSurvivors = (surv: DataFrame, id: Long) => {
          survived += id -> surv.select("doc_id").as[Long].collect().toSet
          // crash AFTER batch 1 fully landed in BOTH indexes but BEFORE
          // the stream commits it — the worst replay case: the redelivery
          // must rewrite both waves identically, never double them
          if (id == 1L && crashArmed && !crashed) {
            crashed = true
            throw new RuntimeException("simulated crash before batch commit")
          }
        },
        termBuckets = 8, threshold = 0.5)
      try q.awaitTermination(120000)
      catch {
        case e: org.apache.spark.sql.streaming.StreamingQueryException =>
          assert(e.getMessage.contains("simulated crash"), e.getMessage)
      }
    }

    crashArmed = true
    run() // dies after batch 1 landed, batch 1 uncommitted in the checkpoint
    assert(crashed)
    crashArmed = false
    run() // replays batch 1 at-least-once, then batch 2 (quarantined)

    // phase-1 survivors: keep-min within b0, cross-batch drop in b1
    assert(survived(0L) === Set(1L, 3L) && survived(1L) === Set(5L),
      survived.toString)
    assert(quarantined === Map(2L -> Set(6L, 7L)), quarantined.toString)

    writeBatchFile(inDir, "f3.json", b3)
    run() // resume for the late batch

    assert(survived(3L) === Set(9L), survived.toString)

    // ── batch twin over the same split: audit each batch whole, then
    //    the documented per-batch near-dup face with an accumulating
    //    corpus index, then one one-shot index build of the survivors
    val batches = Seq(b0, b1, b2, b3).map(_.toDF("doc_id", "text"))
    var corpusIdx: DataFrame = null
    val keptDocs = Seq.newBuilder[(Long, String)]
    batches.foreach { batch =>
      val pass = Expectations.audit(batch, rules).collect()
        .forall(_.getAs[Boolean]("pass"))
      if (pass) {
        val surv = (if (corpusIdx == null)
          StreamingNearDup.filterBatch(
            Dedup.minhashIndex(batch.limit(0), "doc_id", "text"),
            batch, "doc_id", "text", threshold = 0.5)
        else
          StreamingNearDup.filterBatch(corpusIdx, batch, "doc_id", "text",
            threshold = 0.5)).localCheckpoint()
        val survIdx = Dedup.minhashIndex(surv, "doc_id", "text")
          .localCheckpoint()
        corpusIdx =
          if (corpusIdx == null) survIdx else corpusIdx.union(survIdx)
        keptDocs ++= surv.as[(Long, String)].collect()
      }
    }
    assert(keptDocs.result().map(_._1).toSet === Set(1L, 3L, 5L, 9L))

    val oneShot = Files.createTempDirectory("curation-oneshot").toString
    PostingIndex.build(keptDocs.result().toDF("doc_id", "text"),
      "doc_id", "text", oneShot, termBuckets = 8)

    // the streamed index serves score-for-score like the one-shot build
    def rows(p: String): Seq[String] =
      PostingIndex.scoreQuery(spark, p, Seq("corpus"), termBuckets = 8)
        .collect().map(_.toString).sorted.toSeq
    assert(rows(indexPath) === rows(oneShot))

    // and the survivor index state matches the batch twin's corpus
    val idxDocs = StreamingNearDup.index(spark, dedupPath)
      .select("doc_id").as[Long].collect().toSet
    assert(idxDocs === Set(1L, 3L, 5L, 9L))
  }
}
