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

  test("real PNG decode via javax.imageio: dimensions and luminance") {
    // 4x2 image: top row pure white, bottom row pure black → mean lum 127.5
    val img = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 4) {
      img.setRGB(x, 0, 0xffffff)
      img.setRGB(x, 1, 0x000000)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val pngBytes = bos.toByteArray

    val media = Seq((1L, pngBytes)).toDF("media_id", "bin")
    val rows = Multimodal.decodeFeatures(
      Multimodal.attach(media, "media_id", "bin", "png")
        .as[Multimodal.MediaRow]).collect()
    val f = rows.head
    assert(f.n_frames == 1)
    assert(f.features(0) == 4.0 && f.features(1) == 2.0) // width, height
    assert(math.abs(f.features(2) - 127.5) < 0.01)       // mean luminance
  }

  test("real WAV decode: RIFF header fields and RMS amplitude") {
    // mono 16-bit 8kHz, 4 samples of a full-scale square wave → RMS 1.0
    val sampleRate = 8000
    val samples = Array[Short](Short.MinValue, Short.MaxValue,
      Short.MinValue, Short.MaxValue)
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    val wavBytes = bb.array()

    val media = Seq((1L, wavBytes)).toDF("media_id", "bin")
    val f = Multimodal.decodeFeatures(
      Multimodal.attach(media, "media_id", "bin", "wav")
        .as[Multimodal.MediaRow]).collect().head
    assert(f.n_frames == 4) // per-channel sample count
    assert(f.features(0) == 8000.0 && f.features(1) == 1.0)
    assert(math.abs(f.features(2) - 1.0) < 1e-4) // full-scale square ≈ RMS 1
  }

  test("unknown formats fall back to the labeled stub codec") {
    val media = Seq((1L, Array[Byte](1, 2, 3))).toDF("media_id", "bin")
    val f = Multimodal.decodeFeatures(
      Multimodal.attach(media, "media_id", "bin", "video/mp4")
        .as[Multimodal.MediaRow]).collect().head
    assert(f.features sameElements Array(3.0, 2.0, 1.0))
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

  test("frameSample of empty media yields zero frames, not junk rows") {
    val empty = Seq((9L, "")).toDF("doc_id", "text")
    val m = Multimodal.attach(empty, "doc_id", "text", "text/plain")
    assert(Multimodal.frameSample(m, nFrames = 10).count() == 0)
  }

  test("resizeImages: nearest-neighbor downscale picks exact source pixels") {
    // 4×4 quadrant image: red | green / blue | white
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4)
      img.setRGB(x, y, (x / 2, y / 2) match {
        case (0, 0) => 0xff0000
        case (1, 0) => 0x00ff00
        case (0, 1) => 0x0000ff
        case _      => 0xffffff
      })
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val media = Seq((1L, buf.toByteArray)).toDF("media_id", "bin")
      .select($"media_id", $"bin".as("media"), lit("png").as("format"),
        length($"bin").cast("long").as("n_bytes"))
      .as[Multimodal.MediaRow]
    val out = Multimodal.resizeImages(media, 2, 2).collect().head
    assert(out.width == 2 && out.height == 2)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.media))
    // pixel centers of the 2×2 target map to (1,1),(3,1),(1,3),(3,3) —
    // one exact pixel from each quadrant, no blending
    assert((back.getRGB(0, 0) & 0xffffff) == 0xff0000)
    assert((back.getRGB(1, 0) & 0xffffff) == 0x00ff00)
    assert((back.getRGB(0, 1) & 0xffffff) == 0x0000ff)
    assert((back.getRGB(1, 1) & 0xffffff) == 0xffffff)
  }

  test("resizeImages: undecodable bytes yield the loud 0×0 marker") {
    val media = Seq((7L, Array[Byte](1, 2, 3))).toDF("media_id", "bin")
      .select($"media_id", $"bin".as("media"), lit("png").as("format"),
        lit(3L).as("n_bytes"))
      .as[Multimodal.MediaRow]
    val out = Multimodal.resizeImages(media, 8, 8).collect().head
    assert(out.width == 0 && out.height == 0 && out.media.isEmpty)
  }

  test("resizeImages: a recognized-but-truncated PNG markers instead of failing") {
    // valid PNG signature + header start, then cut off: ImageIO.read
    // THROWS here (not null) — the marker contract must still hold
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val truncated = buf.toByteArray.take(20)
    val media = Seq((8L, truncated)).toDF("media_id", "bin")
      .select($"media_id", $"bin".as("media"), lit("png").as("format"),
        length($"bin").cast("long").as("n_bytes"))
      .as[Multimodal.MediaRow]
    val out = Multimodal.resizeImages(media, 8, 8).collect().head
    assert(out.width == 0 && out.height == 0 && out.media.isEmpty)
  }
}
