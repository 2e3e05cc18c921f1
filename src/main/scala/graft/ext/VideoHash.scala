package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.ext.Multimodal.MediaRow

/** Perceptual VIDEO fingerprints — the temporal member of the
  * modality-dedup family (text → [[Dedup.simhash]], image →
  * [[ImageHash]], audio → [[AudioHash]], video → here): re-encodes,
  * brightness shifts, and frame-repeat upsamples of one clip must
  * collide; distinct clips must not.
  *
  * The fingerprint is a 63-bit LUMINANCE CONTOUR over the real MJPEG
  * decode path ([[Multimodal.AviMjpegCodec.frames]] RIFF walk + per-
  * frame `javax.imageio` JPEG decode): each frame reduces to its
  * integer BT.601 luminance total (`Σ 299R+587G+114B` over pixels —
  * exact, no float mean), frames split into 64 equal windows
  * (`[⌊w·n/64⌋, ⌊(w+1)·n/64⌋)`, the [[AudioHash]] discipline on the
  * frame axis), window value = Σ frame totals (exact BIGINT), bit
  * `j = W_j < W_{j+1}`. Integer end to end, so:
  *
  *   - a '''global brightness shift''' (+c per pixel channel, no
  *     clipping) adds the same constant to every window of equal frame
  *     count — equal-width windows ⇒ no comparison flips;
  *   - '''k× frame repetition''' scales every window total by k
  *     exactly (window boundaries are multiples of the repeat — the
  *     floor-composition argument) — same contour;
  *   - generated clips give it a SQL-replayable oracle
  *     (`q_video_dedup`): solid-gray JPEG frames decode within ±3 of
  *     their level (the q_video pinned bound), so level gaps ≥ 20
  *     make every comparison noise-proof and the oracle can state the
  *     contour from the LEVELS alone.
  *
  * Clips with fewer than 64 decodable frames have no contour and
  * fingerprint −1 (loud, never paired — the family posture); a frame
  * whose JPEG payload is corrupt counts as luminance 0 (loud in its
  * window, the [[Multimodal.AviMjpegCodec]] denominator discipline).
  *
  * Pairing rides [[Dedup.hammingPairs63]]. Per-row cost is linear in
  * frames × pixels inside one mapPartitions task — the bounded batch
  * shape all media decode uses; only 8-byte fingerprints shuffle.
  */
object VideoHash {

  /** Integer BT.601 luminance total of one decoded frame. */
  private def lumTotal(img: java.awt.image.BufferedImage): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    var s = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        s += 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
          114L * (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    s
  }

  /** 63-bit luminance contour of an MJPEG-AVI clip; −1 when the
    * container yields fewer than 64 frames. */
  def contour63(media: Array[Byte]): Long = {
    val fs = Multimodal.AviMjpegCodec.frames(media)
    if (fs.length < 64) return -1L
    val totals = fs.map { f =>
      val img =
        try Multimodal.readImage(f)
        catch { case _: java.io.IOException | _: RuntimeException => null }
      if (img == null) 0L else lumTotal(img)
    }
    val n = totals.length
    val windows = Array.tabulate(64) { w =>
      val lo = (w.toLong * n / 64).toInt
      val hi = ((w + 1).toLong * n / 64).toInt
      var s = 0L
      var i = lo
      while (i < hi) { s += totals(i); i += 1 }
      s
    }
    var fp = 0L
    var j = 0
    while (j < 63) {
      if (windows(j) < windows(j + 1)) fp |= 1L << j
      j += 1
    }
    fp
  }

  /** Per-partition batch fingerprinting through the real container
    * walk + JPEG decode: (media_id, vhash) — unparseable or sub-64-
    * frame clips fingerprint as −1. */
  def fingerprints(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map(r => (r.media_id, contour63(r.media)))
    }.toDF("media_id", "vhash")
  }

  /** Near-dup clip pairs — banded Hamming join, −1 rows excluded. */
  def nearDupPairs(fps: DataFrame, maxHamming: Int = 3,
      maxChunkDF: Option[Long] = None): DataFrame =
    Dedup.hammingPairs63(
      fps.filter(col("vhash") >= 0L).localCheckpoint(),
      "media_id", "vhash", maxHamming, maxChunkDF)
}
