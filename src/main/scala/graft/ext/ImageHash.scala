package graft.ext

import java.awt.image.BufferedImage

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.ext.Multimodal.MediaRow

/** Perceptual image fingerprints — dedup for PIXELS, extending the text
  * near-dup family ([[Dedup.simhash]]) to the image modality a
  * multimodal training corpus carries: re-encodes, resizes, and small
  * edits of one image must collide, distinct images must not.
  *
  * Two standard fingerprints, both 63-bit (bit 63 skipped so the value
  * — a sum of distinct powers of two — always fits a non-negative
  * BIGINT in both Spark and DuckDB, the [[Dedup.simhash]] discipline):
  *
  *   - '''dHash''' ([[dhash63]]): 9×8 luminance grid via the exact
  *     pixel-center nearest-neighbor mapping [[Multimodal.resizeImages]]
  *     uses, bit j = `grid(x,y) < grid(x+1,y)` — PURE INTEGER arithmetic
  *     end to end (luminance is the BT.601 integer form
  *     `299·R + 587·G + 114·B`, a ×1000 scale with no float rounding),
  *     so the fingerprint is bit-deterministic on any JVM and REPLAYABLE
  *     IN SQL over stated pixel facts — which is what lets
  *     `q_image_dedup` hash-gate the whole decode→hash→pair pipeline
  *     against a DuckDB oracle (the q_video pattern for pairs).
  *   - '''pHash''' ([[phash63]]): 32×32 luminance grid → orthonormal
  *     2-D DCT-II → the top-left 8×8 coefficient block minus DC (63
  *     coefficients), bit = coefficient > median. Floats enter in the
  *     DCT, so pHash is spec-gated (resize invariance, edit
  *     sensitivity), not SQL-oracled — the robust-to-blur/levels
  *     fingerprint production dedup prefers.
  *
  * Both are EXACTLY invariant under nearest-neighbor block upscaling
  * (floor-division composition: `⌊⌊a/b⌋/c⌋ = ⌊a/(bc)⌋`, so sampling the
  * upscale at pixel centers re-reads the original pixels — spec-pinned
  * against [[Multimodal.resizeImages]]), and dHash is invariant under
  * global brightness shifts (adjacent-comparison fingerprint).
  *
  * Pairing rides [[Dedup.hammingPairs63]] — the same banded 4×16-bit
  * chunk join as SimHash text pairs: one shuffle on (band, chunk), no
  * cross join, Θ(n²/2¹⁶) candidates. At 100 TB the fingerprint step is
  * a narrow per-row map (decode cost dominates, bounded per task by the
  * mapPartitions batch shape); only 8-byte fingerprints shuffle.
  *
  * Undecodable bytes fingerprint as −1 — LOUD (never dropped, the 0×0
  * resize-marker posture), impossible for a real hash (non-negative),
  * and excluded from pairing by [[nearDupPairs]] so two corrupt blobs
  * can never pair as "identical".
  */
object ImageHash {

  /** Integer BT.601 luminance ×1000 of a packed RGB pixel — exact. */
  private def lum1000(rgb: Int): Long =
    299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
      114L * (rgb & 0xff)

  /** `gw`×`gh` luminance grid sampled at exact pixel centers —
    * `src = ⌊(2·dst+1)·srcDim / (2·dstDim)⌋`, the same integer mapping
    * as [[Multimodal.resizeImages]] (Long arithmetic: the product
    * overflows Int for very large dimensions). Row-major: g(y)(x). */
  private[ext] def lumGrid(img: BufferedImage, gw: Int,
      gh: Int): Array[Array[Long]] = {
    val (w, h) = (img.getWidth, img.getHeight)
    Array.tabulate(gh, gw) { (gy, gx) =>
      val sx = (((2L * gx + 1) * w) / (2L * gw)).toInt
      val sy = (((2L * gy + 1) * h) / (2L * gh)).toInt
      lum1000(img.getRGB(sx, sy))
    }
  }

  /** 63-bit difference hash: bit `j = y·8 + x` (x, y in 0..7, the last
    * comparison j = 63 skipped) set iff `grid(x,y) < grid(x+1,y)` on
    * the 9×8 grid. Strict `<` on the integer luminance: equal pixels
    * give bit 0 deterministically, and a global brightness shift
    * flips no comparison. */
  def dhash63(img: BufferedImage): Long = {
    val g = lumGrid(img, 9, 8)
    var fp = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8 && (y < 7 || x < 7)) {
        if (g(y)(x) < g(y)(x + 1)) fp |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    fp
  }

  /** 63-bit DCT hash: orthonormal 2-D DCT-II of the 32×32 luminance
    * grid; bits are the top-left 8×8 coefficient block minus DC
    * (j = v·8 + u − 1), set iff the coefficient exceeds the MEDIAN of
    * the 63 (index 31 of the sorted values — the true median). A flat
    * image has every AC coefficient 0 → hash 0. */
  def phash63(img: BufferedImage): Long = {
    val n = 32
    val g = lumGrid(img, n, n)
    // separable DCT-II with orthonormal scale: rows, then columns
    val c = Array.tabulate(n, n) { (k, x) =>
      math.cos(math.Pi * (2 * x + 1) * k / (2.0 * n)) *
        (if (k == 0) math.sqrt(1.0 / n) else math.sqrt(2.0 / n))
    }
    val rows = Array.tabulate(n, 8) { (y, u) =>
      var s = 0.0; var x = 0
      while (x < n) { s += g(y)(x) * c(u)(x); x += 1 }
      s
    }
    val block = Array.tabulate(8, 8) { (v, u) =>
      var s = 0.0; var y = 0
      while (y < n) { s += rows(y)(u) * c(v)(y); y += 1 }
      s
    }
    val coeffs = (0 until 64).tail.map(j => block(j / 8)(j % 8))
    val median = coeffs.sorted.apply(31)
    coeffs.zipWithIndex.foldLeft(0L) { case (fp, (v, i)) =>
      if (v > median) fp | (1L << i) else fp
    }
  }

  /** Per-partition batch fingerprinting through the REAL decode path
    * (`javax.imageio`, the [[Multimodal.ImageCodec]] formats):
    * (media_id, dhash, phash) — undecodable rows fingerprint as −1/−1
    * (loud, never dropped, never a task failure). */
  def fingerprints(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val img =
          try Multimodal.readImage(r.media)
          catch { case _: java.io.IOException | _: RuntimeException => null }
        if (img == null) (r.media_id, -1L, -1L)
        else (r.media_id, dhash63(img), phash63(img))
      }
    }.toDF("media_id", "dhash", "phash")
  }

  /** Near-dup image pairs: banded Hamming join over one fingerprint
    * column of [[fingerprints]]'s output ([[Dedup.hammingPairs63]] —
    * the SimHash pairing shape verbatim). Undecodable −1 fingerprints
    * are excluded FIRST: corrupt bytes must never pair. */
  def nearDupPairs(fps: DataFrame, fpCol: String, maxHamming: Int = 3,
      maxChunkDF: Option[Long] = None): DataFrame =
    Dedup.hammingPairs63(
      fps.filter(col(fpCol) >= 0L).localCheckpoint(),
      "media_id", fpCol, maxHamming, maxChunkDF)
}
