package graft.ext

import java.awt.image.BufferedImage

import graft.SparkSpec
import graft.ext.Multimodal.MediaRow
import org.apache.spark.sql.functions._
import scala.util.Random

class ImageHashSpec extends SparkSpec {
  import spark.implicits._

  private def grayImage(w: Int, h: Int, v: (Int, Int) => Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = v(x, y) & 0xff
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    img
  }

  private def colorImage(w: Int, h: Int, rnd: Random): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, rnd.nextInt() & 0xffffff)
    img
  }

  private def png(img: BufferedImage): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  private def nnUpscale(img: BufferedImage, k: Int): BufferedImage = {
    // the exact pixel-center block upscale Multimodal.resizeImages
    // performs for an integer factor
    val out = new BufferedImage(img.getWidth * k, img.getHeight * k,
      BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until out.getHeight; x <- 0 until out.getWidth)
      out.setRGB(x, y, img.getRGB(x / k, y / k))
    out
  }

  private def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  test("dHash and pHash are EXACTLY invariant under NN block upscaling " +
      "(via Multimodal.resizeImages, the production resize path)") {
    val rnd = new Random(7)
    val imgs = Seq(
      grayImage(9, 8, (x, y) => 50 + 17 * ((x * 3 + y * 5) % 12)),
      colorImage(16, 16, rnd),
      colorImage(33, 21, rnd)) // dims not divisible by the grid sizes
    imgs.foreach { img =>
      for (k <- Seq(2, 3)) {
        // drive the upscale through the production resizeImages operator
        val resized = Multimodal.resizeImages(
          Seq(MediaRow(1L, png(img), "png", 0L)).toDS(),
          img.getWidth * k, img.getHeight * k).collect().head
        val up = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(resized.media))
        assert(ImageHash.dhash63(up) == ImageHash.dhash63(img),
          s"dhash changed under ${k}x NN upscale")
        assert(ImageHash.phash63(up) == ImageHash.phash63(img),
          s"phash changed under ${k}x NN upscale")
        // and the floor-composition argument holds for the direct form
        assert(ImageHash.dhash63(nnUpscale(img, k)) == ImageHash.dhash63(img))
      }
    }
  }

  test("dHash is invariant under a global brightness shift; one flipped " +
      "comparison moves exactly one bit") {
    def base(x: Int, y: Int) = if ((x * 7 + y * 13) % 3 == 0) 190 else 50
    val img = grayImage(9, 8, base)
    val brighter = grayImage(9, 8, (x, y) => base(x, y) + 40)
    assert(ImageHash.dhash63(brighter) == ImageHash.dhash63(img))
    // flip the (0,0) vs (1,0) comparison only
    val flipped = grayImage(9, 8, (x, y) =>
      if (x == 0 && y == 0) { if (base(0, 0) < base(1, 0)) 200 else 10 }
      else base(x, y))
    assert(hamming(ImageHash.dhash63(flipped), ImageHash.dhash63(img)) == 1)
  }

  test("distinct random images sit far apart on both hashes") {
    val rnd = new Random(13)
    val hs = (0 until 8).map { _ =>
      val img = colorImage(32, 32, rnd)
      (ImageHash.dhash63(img), ImageHash.phash63(img))
    }
    for (i <- hs.indices; j <- hs.indices if i < j) {
      assert(hamming(hs(i)._1, hs(j)._1) > 10)
      assert(hamming(hs(i)._2, hs(j)._2) > 10)
    }
  }

  test("pHash survives mild pixel noise on a full-spectrum image") {
    // median thresholding is stable when the coefficient bulk sits far
    // from the median — the natural/full-spectrum case pHash targets
    // (a sparse-spectrum image — flat blocks, most AC coefficients at
    // the near-zero median — is OUTSIDE its invariance class: tiny
    // noise flips near-median signs; that is inherent to pHash, not a
    // bug). ±2-level noise perturbs each coefficient by ~1.5% of the
    // coefficient spread here, so only bits already at the median can
    // move.
    val rnd = new Random(17)
    val img = colorImage(32, 32, rnd)
    val noisy = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) {
      val p = img.getRGB(x, y)
      def c(s: Int) = math.max(0, math.min(255,
        ((p >> s) & 0xff) + rnd.nextInt(5) - 2))
      noisy.setRGB(x, y, (c(16) << 16) | (c(8) << 8) | c(0))
    }
    assert(hamming(ImageHash.phash63(noisy), ImageHash.phash63(img)) <= 6)
  }

  test("fingerprints: real decode path; undecodable bytes are LOUD (-1) " +
      "and never pair") {
    val rnd = new Random(19)
    // channels capped below 255 so the +1 brightness shift never clamps
    // (clamping could break the adjacent-comparison invariance)
    val a = {
      val img = colorImage(20, 12, rnd)
      for (y <- 0 until 12; x <- 0 until 20)
        img.setRGB(x, y, img.getRGB(x, y) & 0x7f7f7f)
      img
    }
    val aShift = { // +1 brightness on every channel: same dhash
      val img = new BufferedImage(20, 12, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 12; x <- 0 until 20) {
        val p = a.getRGB(x, y)
        def c(s: Int) = math.min(((p >> s) & 0xff) + 1, 255)
        img.setRGB(x, y, (c(16) << 16) | (c(8) << 8) | c(0))
      }
      img
    }
    val b = colorImage(20, 12, rnd)
    val rows = Seq(
      MediaRow(1L, png(a), "png", 0L),
      MediaRow(2L, png(aShift), "png", 0L),
      MediaRow(3L, png(b), "png", 0L),
      MediaRow(4L, Array[Byte](1, 2, 3), "png", 3L), // garbage
      MediaRow(5L, Array[Byte](9, 9, 9), "png", 3L)) // more garbage
    val fps = ImageHash.fingerprints(rows.toDS())
    val byId = fps.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byId(4L) == (-1L, -1L) && byId(5L) == (-1L, -1L))
    assert(byId(1L)._1 == byId(2L)._1) // brightness shift: same dhash
    assert(byId(1L)._1 >= 0L && byId(3L)._1 >= 0L)
    val pairs = ImageHash.nearDupPairs(fps, "dhash", maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    // the two corrupt blobs share fingerprint -1 but must NOT pair
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L || p._1 == 5L ||
      p._2 == 5L))
  }

  test("banded pairing is recall-exact for hamming <= 3 (pigeonhole) " +
      "against brute force") {
    val rnd = new Random(23)
    val bases = Array.fill(40)(rnd.nextLong() & Long.MaxValue)
    // plant near-dups: every 4th id is a 3-bit twiddle of id-1's value
    val fps = (0L until 40L).map { i =>
      if (i % 4 == 3) (i, bases(i.toInt - 1) ^ 7L) else (i, bases(i.toInt))
    }
    val df = fps.toDF("media_id", "dhash")
    val banded = ImageHash.nearDupPairs(df, "dhash", maxHamming = 3)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)]
      .collect().toSet
    val brute = (for {
      (i, fi) <- fps; (j, fj) <- fps if i < j
      h = hamming(fi, fj) if h <= 3
    } yield (i, j, h)).toSet
    assert(banded == brute)
  }
}
