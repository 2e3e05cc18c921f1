package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "x" * 3000),
    (2L, "ab"),
    (3L, "")
  ).toDF("doc_id", "text")

  test("attach produces binary media with byte-length metadata") {
    val m = Multimodal.attach(docs, "doc_id", "text", "text/plain")
    assert(m.schema("media").dataType.typeName == "binary")
    val bytes = m.select("media_id", "n_bytes").as[(Long, Long)].collect().toMap
    assert(bytes(1L) == 3000L && bytes(2L) == 2L && bytes(3L) == 0L)
  }

  test("decodeFeatures: stable md5, frame count, stub features") {
    val media = Multimodal.attach(docs, "doc_id", "text", "text/plain")
      .as[Multimodal.MediaRow]
    val f = Multimodal.decodeFeatures(media).collect()
      .map(r => r.media_id -> r).toMap
    assert(f(1L).n_frames == 3)     // ceil(3000/1024)
    assert(f(2L).n_frames == 1)
    assert(f(3L).n_frames == 0)
    assert(f(2L).content_md5 == "187ef4436122d1cc2f40dc2b92f0eba0") // md5("ab")
    assert(f(2L).features sameElements Array(2.0, 'a'.toInt + 0.5, 'a'.toInt))
  }

  test("frameSample slices evenly sized byte frames") {
    val m = Multimodal.attach(docs, "doc_id", "text", "text/plain")
    val frames = Multimodal.frameSample(m, nFrames = 10)
      .filter($"media_id" === 1L)
      .select($"frame_idx", length($"frame").as("len"))
      .as[(Int, Int)].collect().sortBy(_._1)
    assert(frames.map(_._1).toSeq == Seq(0, 1, 2))
    assert(frames.map(_._2).toSeq == Seq(1024, 1024, 952))
  }
}
