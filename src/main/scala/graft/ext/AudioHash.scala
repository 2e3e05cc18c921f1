package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.ext.Multimodal.MediaRow

/** Perceptual AUDIO fingerprints — the audio twin of [[ImageHash]],
  * completing near-dup detection across the three opaque-binary
  * modalities a multimodal corpus carries (text → [[Dedup.simhash]],
  * image → [[ImageHash]], audio → here): re-encodes, gain changes, and
  * sample-repeat upsamples of one clip must collide; distinct clips
  * must not.
  *
  * The fingerprint is a 63-bit ENERGY-CONTOUR hash over real 16-bit
  * PCM (decoded by [[Multimodal.WavCodec]]'s RIFF walk): mix channels
  * per frame by integer sum, split the frame sequence into 64 equal
  * windows `[⌊w·n/64⌋, ⌊(w+1)·n/64⌋)`, take each window's integer
  * energy `Σ mix²` (exact BIGINT — no float, no sqrt), and set bit
  * `j = E_j < E_{j+1}` for j = 0..62 — the [[ImageHash.dhash63]]
  * adjacent-comparison discipline on the time axis. Pure integer end
  * to end, so generated clips give it a SQL-replayable oracle
  * (`q_audio_dedup`, the q_video pattern), and two invariances are
  * EXACT, not approximate:
  *
  *   - '''gain''': scaling every sample by k scales every window
  *     energy by k² — no comparison flips (no clipping, no rounding:
  *     integer energies);
  *   - '''k× sample repetition''' (the NN upsample of audio): window
  *     boundaries scale exactly (`⌊w·kn/64⌋ = k·⌊w·n/64⌋` when k
  *     divides into the product — boundaries are multiples of the
  *     frame repeat), each window holds its original frames k times →
  *     E' = k·E, same contour.
  *
  * Clips with fewer than 64 frames have no 64-window contour and
  * fingerprint as −1 — LOUD (never dropped), impossible for a real
  * hash, and excluded from pairing, the [[ImageHash]] corrupt-bytes
  * posture; undecodable / non-PCM16 bytes likewise.
  *
  * Pairing rides [[Dedup.hammingPairs63]] — one banded shuffle shape
  * for every 63-bit fingerprint family. At 100 TB the decode+hash is a
  * narrow per-row map (per-task memory bounded by one clip at a time);
  * only 8-byte fingerprints shuffle. Energy Long bound: a window needs
  * ~2³² frames of full-scale stereo to overflow — beyond any clip a
  * single row should hold.
  */
object AudioHash {

  /** 63-bit energy contour of interleaved 16-bit PCM; −1 when the clip
    * has fewer than 64 frames (no contour exists). */
  def energyHash63(samples: Array[Short], channels: Int): Long = {
    require(channels >= 1, s"channels must be >= 1: $channels")
    val frames = samples.length / channels
    if (frames < 64) return -1L
    val energies = Array.tabulate(64) { w =>
      val lo = (w.toLong * frames / 64).toInt
      val hi = ((w + 1).toLong * frames / 64).toInt
      var e = 0L
      var f = lo
      while (f < hi) {
        var mix = 0
        var c = 0
        while (c < channels) { mix += samples(f * channels + c); c += 1 }
        e += mix.toLong * mix
        f += 1
      }
      e
    }
    var fp = 0L
    var j = 0
    while (j < 63) {
      if (energies(j) < energies(j + 1)) fp |= 1L << j
      j += 1
    }
    fp
  }

  /** Per-partition batch fingerprinting through the real WAV decode
    * path: (media_id, ahash) — undecodable, non-16-bit-PCM, or
    * sub-64-frame rows fingerprint as −1. */
  def fingerprints(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (_, channels, bits, dataOff, dataLen) =
          Multimodal.WavCodec.header(r.media)
        if (channels <= 0 || bits != 16 || dataOff < 0) (r.media_id, -1L)
        else {
          val n = dataLen / 2
          val s = new Array[Short](n)
          var i = 0
          while (i < n) {
            s(i) = (((r.media(dataOff + i * 2) & 0xff)) |
              (r.media(dataOff + i * 2 + 1) << 8)).toShort
            i += 1
          }
          (r.media_id, energyHash63(s, channels))
        }
      }
    }.toDF("media_id", "ahash")
  }

  /** Near-dup clip pairs: the banded Hamming join over [[fingerprints]]
    * — −1 rows excluded first (corrupt/short clips must never pair). */
  def nearDupPairs(fps: DataFrame, maxHamming: Int = 3,
      maxChunkDF: Option[Long] = None): DataFrame =
    Dedup.hammingPairs63(
      fps.filter(col("ahash") >= 0L).localCheckpoint(),
      "media_id", "ahash", maxHamming, maxChunkDF)
}
