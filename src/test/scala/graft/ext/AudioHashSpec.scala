package graft.ext

import graft.SparkSpec
import graft.ext.Multimodal.MediaRow
import scala.util.Random

class AudioHashSpec extends SparkSpec {
  import spark.implicits._

  private def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  private def clip(amps: Seq[Int], framesPerWindow: Int = 8): Array[Short] =
    amps.flatMap { a =>
      (0 until framesPerWindow).map(i => (if (i % 2 == 0) a else -a).toShort)
    }.toArray

  private def randAmps(rnd: Random) = Seq.fill(64)(rnd.nextInt(200) + 5)

  test("gain scaling and k-times sample repetition are EXACT invariances") {
    val rnd = new Random(31)
    val amps = randAmps(rnd)
    val base = clip(amps)
    val gained = base.map(s => (s * 3).toShort) // no clipping: |s| <= 612
    assert(AudioHash.energyHash63(gained, 1) ==
      AudioHash.energyHash63(base, 1))
    val repeated = base.flatMap(s => Seq(s, s)) // 2x sample repeat
    assert(AudioHash.energyHash63(repeated, 1) ==
      AudioHash.energyHash63(base, 1))
    val tripled = base.flatMap(s => Seq(s, s, s))
    assert(AudioHash.energyHash63(tripled, 1) ==
      AudioHash.energyHash63(base, 1))
  }

  test("stereo with identical channels equals mono; channel mix is a sum") {
    val rnd = new Random(37)
    val base = clip(randAmps(rnd))
    val stereo = base.flatMap(s => Seq(s, s))
    assert(AudioHash.energyHash63(stereo, 2) ==
      AudioHash.energyHash63(base, 1))
  }

  test("one flipped window-energy comparison moves exactly one bit") {
    val amps = (0 until 64).map(w => if (w % 3 == 0) 100 else 10)
    val flipped = amps.updated(0,
      if (amps(0) < amps(1)) 120 else 5)
    val h0 = AudioHash.energyHash63(clip(amps), 1)
    val h1 = AudioHash.energyHash63(clip(flipped), 1)
    assert(hamming(h0, h1) == 1)
  }

  test("distinct random clips sit far apart") {
    val rnd = new Random(41)
    val hs = (0 until 8).map(_ => AudioHash.energyHash63(clip(randAmps(rnd)), 1))
    for (i <- hs.indices; j <- hs.indices if i < j)
      assert(hamming(hs(i), hs(j)) > 8, s"clips $i/$j too close")
  }

  test("muxPcmWav round-trips through the production WavCodec parse, " +
      "and fingerprints ride the real decode path") {
    val rnd = new Random(43)
    val base = clip(randAmps(rnd))
    val wav = Multimodal.muxPcmWav(base, 8000, 1)
    // WavCodec features: rate, channels, rms > 0
    val (frames, feats) = Multimodal.WavCodec.decode(wav)
    assert(frames == base.length && feats(0) == 8000.0 && feats(1) == 1.0 &&
      feats(2) > 0.0)
    val viaBytes = AudioHash.fingerprints(
      Seq(MediaRow(1L, wav, "wav", wav.length.toLong)).toDS())
      .collect().head.getLong(1)
    assert(viaBytes == AudioHash.energyHash63(base, 1))
  }

  test("short clips (<64 frames) and undecodable bytes are LOUD (-1) " +
      "and never pair") {
    val rnd = new Random(47)
    val a = clip(randAmps(rnd))
    val aGain = a.map(s => (s * 2).toShort)
    val b = clip(randAmps(rnd))
    val rows = Seq(
      MediaRow(1L, Multimodal.muxPcmWav(a, 8000, 1), "wav", 0L),
      MediaRow(2L, Multimodal.muxPcmWav(aGain, 8000, 1), "wav", 0L),
      MediaRow(3L, Multimodal.muxPcmWav(b, 8000, 1), "wav", 0L),
      MediaRow(4L, Multimodal.muxPcmWav(Array[Short](1, 2, 3), 8000, 1),
        "wav", 0L), // 3 frames: no contour
      MediaRow(5L, Array[Byte](1, 2, 3), "wav", 3L)) // garbage
    val fps = AudioHash.fingerprints(rows.toDS())
    val byId = fps.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(4L) == -1L && byId(5L) == -1L)
    assert(byId(1L) == byId(2L) && byId(1L) >= 0L)
    val pairs = AudioHash.nearDupPairs(fps, maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => Set(4L, 5L)(p._1) || Set(4L, 5L)(p._2)))
  }
}
