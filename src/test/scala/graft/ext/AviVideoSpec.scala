package graft.ext

import java.nio.{ByteBuffer, ByteOrder}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Real-video contract for the MJPEG-in-AVI codec: the spec BUILDS an
  * AVI container byte-by-byte around imageio-encoded JPEG frames, then
  * pins exact frame bytes out of the RIFF walk (the same discipline as
  * the WAV/PNG fixtures — no golden files, every byte accounted for),
  * plus decoded features, hostile-bytes degradation, and the
  * deterministic frame-sampling mapping.
  */
class AviVideoSpec extends SparkSpec {
  import spark.implicits._

  private def jpegBytes(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", buf)
    buf.toByteArray
  }

  // RIFF chunk writer: id + LE32 length + body + word-alignment pad
  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + body.length + (body.length & 1))
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
    bb.array()
  }
  private def list(tpe: String, children: Array[Byte]*): Array[Byte] =
    chunk("LIST", tpe.getBytes("US-ASCII") ++ children.toArray.flatten)
  private def avi(moviChildren: Array[Byte]*): Array[Byte] =
    chunk("RIFF", "AVI ".getBytes("US-ASCII") ++
      list("hdrl", chunk("avih", new Array[Byte](56)),
        list("strl", chunk("strh", new Array[Byte](56)),
          chunk("strf", new Array[Byte](40)))) ++
      list("movi", moviChildren: _*))

  private val f0 = jpegBytes(6, 4, 40)
  private val f1 = jpegBytes(6, 4, 120)
  private val f2 = jpegBytes(6, 4, 200)

  test("frames(): exact JPEG bytes out, audio skipped, rec-list recursed") {
    // odd-length audio chunk between frames exercises word alignment;
    // the third frame hides inside an interleave 'rec ' list
    val bytes = avi(
      chunk("00dc", f0),
      chunk("01wb", Array[Byte](1, 2, 3, 4, 5)),
      chunk("00dc", f1),
      list("rec ", chunk("00dc", f2)),
      chunk("idx1", new Array[Byte](16)))
    val out = Multimodal.AviMjpegCodec.frames(bytes)
    assert(out.length == 3)
    assert(out(0).sameElements(f0) && out(1).sameElements(f1) &&
      out(2).sameElements(f2))
  }

  test("decode: container frame count, first-frame dims, mean luminance") {
    val bytes = avi(chunk("00dc", f0), chunk("00dc", f1), chunk("00dc", f2))
    val media = Seq((1L, bytes)).toDF("media_id", "bin")
    val f = Multimodal.decodeFeatures(
      Multimodal.attach(media, "media_id", "bin", "avi")
        .as[Multimodal.MediaRow]).collect().head
    assert(f.n_frames == 3)
    assert(f.features(0) == 6.0 && f.features(1) == 4.0)
    // solid-gray JPEGs decode within ±2 of the encoded level
    assert(math.abs(f.features(2) - 120.0) < 2.0, f.features(2))
  }

  test("hostile bytes degrade, never throw or loop") {
    // wrong signature
    val (n0, z) = Multimodal.AviMjpegCodec.decode("not an avi at all".getBytes)
    assert(n0 == 0 && z.sameElements(Array(0.0, 0.0, 0.0)))
    assert(Multimodal.AviMjpegCodec.frames(Array.emptyByteArray).isEmpty)
    // crafted negative chunk length inside movi: stop, keep prior frames
    val negLen = chunk("RIFF", "AVI ".getBytes("US-ASCII") ++
      list("movi", chunk("00dc", f0)) ++
      Array[Byte]('0', '0', 'd', 'c', -1, -1, -1, -1))
    assert(Multimodal.AviMjpegCodec.frames(negLen).length == 1)
    // truncated mid-frame: the partial payload surfaces (and imageio's
    // throw on it lands in the luminance denominator, not a task failure)
    val whole = avi(chunk("00dc", f0), chunk("00dc", f1))
    val truncated = whole.take(whole.length - f1.length / 2)
    val fs = Multimodal.AviMjpegCodec.frames(truncated)
    assert(fs.length == 2 && fs(0).sameElements(f0) &&
      fs(1).length < f1.length)
    val (n, feats) = Multimodal.AviMjpegCodec.decode(truncated)
    assert(n == 2 && feats(0) == 6.0)
  }

  test("muxMjpegAvi round-trips exact frame bytes; container decodes whole") {
    val fs = Seq(f0, f1, f2)
    val avi = Multimodal.muxMjpegAvi(fs, 6, 4, fps = 10)
    val back = Multimodal.AviMjpegCodec.frames(avi)
    assert(back.length == 3 &&
      back.zip(fs).forall { case (a, b) => a.sameElements(b) })
    val (n, feats) = Multimodal.AviMjpegCodec.decode(avi)
    assert(n == 3 && feats(0) == 6.0 && feats(1) == 4.0)
    // empty-frame-list container is still well-formed and yields zero
    val (n0, _) = Multimodal.AviMjpegCodec.decode(
      Multimodal.muxMjpegAvi(Nil, 6, 4))
    assert(n0 == 0)
  }

  test("solid-gray JPEG reproduces its level within q_video's ±3 bound") {
    // q_video generates 8×8 solid frames at every level in [20, 219] and
    // asserts |decoded mean luminance − level| <= 3; this sweep pins the
    // actual worst case so the query tolerance is measured, not hoped
    val maxErr = (20 to 219).map { g =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(jpegBytes(8, 8, g)))
      math.abs(Multimodal.ImageCodec.meanLuminance(img) - g)
    }.max
    assert(maxErr <= 3.0, s"maxErr=$maxErr exceeds the q_video tolerance")
  }

  test("frameIndex: seek path verified against bytes; both offset bases; lies refused") {
    val fs = Seq(f0, f1, f2)
    val muxed = Multimodal.muxMjpegAvi(fs, 6, 4)
    // muxer containers are indexed: entries resolve to the exact payloads
    val idx = Multimodal.AviMjpegCodec.frameIndex(muxed)
    assert(idx.isDefined && idx.get.length == 3)
    idx.get.zip(fs).foreach { case ((off, sz), f) =>
      assert(java.util.Arrays.copyOfRange(muxed, off, off + sz)
        .sameElements(f))
    }

    // absolute-offset writer quirk: shift every idx1 offset by moviPos —
    // the base probe must still resolve (find positions via the fourccs)
    def find(b: Array[Byte], s: String, from: Int = 0): Int = {
      val pat = s.getBytes("US-ASCII")
      (from to b.length - 4).find(i => pat.indices.forall(j => b(i + j) == pat(j))).get
    }
    val moviPos = find(muxed, "movi")
    val idx1Pos = find(muxed, "idx1")
    val abs = muxed.clone()
    val bb = java.nio.ByteBuffer.wrap(abs).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 3).foreach { e =>
      val entry = idx1Pos + 8 + e * 16
      bb.putInt(entry + 8, bb.getInt(entry + 8) + moviPos)
    }
    val absIdx = Multimodal.AviMjpegCodec.frameIndex(abs)
    assert(absIdx.isDefined && absIdx.get == idx.get)

    // a lying index (size mismatch) is refused, never trusted
    val lying = muxed.clone()
    java.nio.ByteBuffer.wrap(lying).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(idx1Pos + 8 + 12, f0.length - 1)
    assert(Multimodal.AviMjpegCodec.frameIndex(lying).isEmpty)
    // ... and the hand-built container (junk idx1, no video entries)
    // yields None -> callers take the movi walk
    assert(Multimodal.AviMjpegCodec.frameIndex(
      avi(chunk("00dc", f0), chunk("idx1", new Array[Byte](16)))).isEmpty)
  }

  test("aviFrameSample: seek path ≡ walk path, exact bytes") {
    val fs = (0 until 5).map(i => jpegBytes(6, 4, 30 + i * 40))
    val muxed = Multimodal.muxMjpegAvi(fs, 6, 4)   // indexed -> seek
    val walked = avi(fs.map(chunk("00dc", _)): _*) // no idx1 -> walk
    assert(Multimodal.AviMjpegCodec.frameIndex(walked).isEmpty)
    def sample(bytes: Array[Byte]) = {
      val m = Seq((1L, bytes)).toDF("media_id", "bin")
      Multimodal.aviFrameSample(
        Multimodal.attach(m, "media_id", "bin", "avi")
          .as[Multimodal.MediaRow], 2)
        .collect().sortBy(_.frame_idx)
        .map(v => (v.frame_idx, v.frame.toSeq)).toSeq
    }
    val (a, b) = (sample(muxed), sample(walked))
    assert(a == b && a.map(_._1) == Seq(1, 3))
    assert(a(0)._2 == fs(1).toSeq && a(1)._2 == fs(3).toSeq)
  }

  test("aviFrameSample: pixel-center mapping, frames decodable standalone") {
    val all = Vector(f0, f1, f2, jpegBytes(6, 4, 60), jpegBytes(6, 4, 90))
    val bytes = avi(all.map(chunk("00dc", _)): _*)
    val media = Seq((5L, bytes)).toDF("media_id", "bin")
    val ds = Multimodal.attach(media, "media_id", "bin", "avi")
      .as[Multimodal.MediaRow]
    // k=2 over 5 frames: idx = (2i+1)*5/4 -> {1, 3}
    val out = Multimodal.aviFrameSample(ds, 2).collect().sortBy(_.frame_idx)
    assert(out.map(_.frame_idx).toSeq == Seq(1, 3))
    assert(out(0).frame.sameElements(all(1)) &&
      out(1).frame.sameElements(all(3)))
    out.foreach { vf =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(vf.frame))
      assert(img != null && img.getWidth == 6 && img.getHeight == 4)
    }
    // k >= n returns every frame once, in order
    val allOut = Multimodal.aviFrameSample(ds, 99).collect().sortBy(_.frame_idx)
    assert(allOut.map(_.frame_idx).toSeq == (0 until 5))
    // unparseable container: no rows, loud by absence
    val junk = Seq((6L, Array[Byte](9, 9, 9))).toDF("media_id", "bin")
    assert(Multimodal.aviFrameSample(
      Multimodal.attach(junk, "media_id", "bin", "avi")
        .as[Multimodal.MediaRow], 2).count() == 0)
  }
}
