package graft.ext

import graft.SparkSpec
import graft.ext.Multimodal.MediaRow
import scala.util.Random

class VideoHashSpec extends SparkSpec {
  import spark.implicits._

  private def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  private val frameCache = scala.collection.mutable.Map.empty[Int, Array[Byte]]
  private def grayJpeg(level: Int): Array[Byte] =
    frameCache.getOrElseUpdate(level, {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (level << 16) | (level << 8) | level
      for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, rgb)
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", buf)
      buf.toByteArray
    })

  private def clip(levels: Seq[Int]): Array[Byte] =
    Multimodal.muxMjpegAvi(levels.map(grayJpeg), 8, 8)

  private def randLevels(rnd: Random) =
    Seq.fill(64)(rnd.nextInt(10) * 20 + 20) // the q_video_dedup grid

  test("solid-gray JPEG decode stays within ±3 on the FULL dedup grid " +
      "(0, 20..220, 240 — extends AviVideoSpec's sweep)") {
    (Seq(0, 240) ++ (20 to 220 by 20)).foreach { level =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(grayJpeg(level)))
      val lum = Multimodal.ImageCodec.meanLuminance(img)
      assert(math.abs(lum - level) <= 3.0, s"level $level decoded to $lum")
    }
  }

  test("brightness shift and k-times frame repetition are exact " +
      "contour invariances") {
    val rnd = new Random(61)
    val levels = randLevels(rnd)
    val base = VideoHash.contour63(clip(levels))
    assert(base >= 0L)
    assert(VideoHash.contour63(clip(levels.map(_ + 8))) == base)
    assert(VideoHash.contour63(clip(levels.flatMap(l => Seq(l, l)))) == base)
    assert(VideoHash.contour63(
      clip(levels.flatMap(l => Seq(l, l, l)))) == base)
  }

  test("one flipped window comparison moves exactly one bit") {
    val levels = (0 until 64).map(w => if (w % 3 == 0) 200 else 40)
    val flipped = levels.updated(0,
      if (levels(0) < levels(1)) 240 else 0)
    assert(hamming(VideoHash.contour63(clip(levels)),
      VideoHash.contour63(clip(flipped))) == 1)
  }

  test("distinct random clips sit far apart") {
    val rnd = new Random(67)
    val hs = (0 until 6).map(_ => VideoHash.contour63(clip(randLevels(rnd))))
    for (i <- hs.indices; j <- hs.indices if i < j)
      assert(hamming(hs(i), hs(j)) > 8, s"clips $i/$j too close")
  }

  test("short clips (<64 frames) and unparseable bytes are LOUD (-1) " +
      "and never pair") {
    val rnd = new Random(71)
    val a = randLevels(rnd)
    val rows = Seq(
      MediaRow(1L, clip(a), "avi", 0L),
      MediaRow(2L, clip(a.map(_ + 8)), "avi", 0L), // brightness twin
      MediaRow(3L, clip(randLevels(rnd)), "avi", 0L),
      MediaRow(4L, clip(a.take(10)), "avi", 0L), // 10 frames: no contour
      MediaRow(5L, Array[Byte](1, 2, 3), "avi", 3L)) // garbage
    val fps = VideoHash.fingerprints(rows.toDS())
    val byId = fps.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(4L) == -1L && byId(5L) == -1L)
    assert(byId(1L) == byId(2L) && byId(1L) >= 0L)
    val pairs = VideoHash.nearDupPairs(fps, maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => Set(4L, 5L)(p._1) || Set(4L, 5L)(p._2)))
  }
}
