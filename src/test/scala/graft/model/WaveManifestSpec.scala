package graft.model

import java.nio.file.Files

import graft.SparkSpec

/** Optimistic-concurrency contract for the wave manifest: the version
  * CAS makes a racing commit LOUD (exactly one writer wins each
  * version), the loser's retry lands cleanly on top of the winner, and
  * no reader ever observes a mixed wave set or a backwards pointer. */
class WaveManifestSpec extends SparkSpec {

  private def fresh() = Files.createTempDirectory("graft_wm_").toString

  test("two committers from the same base: exactly one wins, the loser " +
      "gets ConcurrentCommitException and its retry commits cleanly") {
    val root = fresh()
    WaveManifest.commit(spark, root, Seq(0L))
    val base = WaveManifest.latestVersion(spark, root)
    // A wins the CAS at base+1
    WaveManifest.commitBasedOn(spark, root, Seq(0L, 1L), None, base)
    // B derived its set from the SAME base — the old fresh-listing
    // numbering would land it as a new version that silently drops
    // wave 1; the CAS refuses instead
    val e = intercept[WaveManifest.ConcurrentCommitException] {
      WaveManifest.commitBasedOn(spark, root, Seq(0L, 2L), None, base)
    }
    assert(e.getMessage.contains("another committer won"))
    assert(WaveManifest.pinned(spark, root).get === Seq(0L, 1L))
    // B's retry re-reads and lands on top of A — nothing dropped
    WaveManifest.commitWave(spark, root, 2L)
    assert(WaveManifest.pinned(spark, root).get === Seq(0L, 1L, 2L))
  }

  test("an at-least-once REPLAY of a committed version (byte-identical " +
      "content) is a no-op success, not a conflict") {
    val root = fresh()
    WaveManifest.commit(spark, root, Seq(0L))
    val base = WaveManifest.latestVersion(spark, root)
    val v1 = WaveManifest.commitBasedOn(spark, root, Seq(0L, 1L), None, base)
    // renaming v=<v1> WAS the commit — a crashed writer that got that
    // far is already durable and visible; its replay reproduces the
    // same body and must resolve cleanly to the same version
    val again = WaveManifest.commitBasedOn(
      spark, root, Seq(0L, 1L), None, base)
    assert(again === v1)
    assert(WaveManifest.latestVersion(spark, root) === Some(v1))
    assert(WaveManifest.pinned(spark, root).get === Seq(0L, 1L))
  }

  test("latest never moves backwards: a straggler's replay after a " +
      "later commit changes nothing") {
    val root = fresh()
    WaveManifest.commit(spark, root, Seq(0L))
    val base = WaveManifest.latestVersion(spark, root)
    val v1 = WaveManifest.commitBasedOn(spark, root, Seq(0L, 1L), None, base)
    WaveManifest.commitWave(spark, root, 2L) // latest now past v1
    val after = WaveManifest.latestVersion(spark, root).get
    assert(after > v1)
    // a replay of the v1 commit (identical content) must NOT regress
    // latest and un-pin wave 2 for new readers — with latest derived
    // from the immutable version files, regression is structurally
    // impossible (nothing is written at all)
    WaveManifest.commitBasedOn(spark, root, Seq(0L, 1L), None, base)
    assert(WaveManifest.latestVersion(spark, root).get === after)
    assert(WaveManifest.pinned(spark, root).get === Seq(0L, 1L, 2L))
  }

  test("a commit that crashed right after its version rename is simply " +
      "COMMITTED: the next committer lands on top of it (no orphan, no " +
      "wedged root — the rename is the visibility event)") {
    val root = fresh()
    WaveManifest.commit(spark, root, Seq(0L))
    val base = WaveManifest.latestVersion(spark, root)
    // a writer that renamed v=base+1 and died on the spot: with the
    // retired pointer design this was an "orphan" needing adoption;
    // now it is just the latest version
    WaveManifest.commitBasedOn(spark, root, Seq(0L, 7L), None, base)
    WaveManifest.commitWave(spark, root, 2L)
    assert(WaveManifest.pinned(spark, root).get === Seq(0L, 2L, 7L))
  }

  test("latest never reads ABSENT once the first commit landed — the " +
      "pointer-vanish regression (round 16 #1): the retired _latest " +
      "flip was delete-then-rename on the local FS, so a serve racing " +
      "a commit storm resolved pinned=None and mixed waves") {
    val root = fresh()
    WaveManifest.commit(spark, root, Seq(0L))
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val vanished = new java.util.concurrent.atomic.AtomicInteger(0)
    val reads = new java.util.concurrent.atomic.AtomicInteger(0)
    val reader = new Thread(() => {
      while (!stop.get()) {
        try {
          if (WaveManifest.latestVersion(spark, root).isEmpty)
            vanished.incrementAndGet()
        } catch {
          case _: java.io.FileNotFoundException =>
            vanished.incrementAndGet()
        }
        reads.incrementAndGet()
      }
    })
    reader.start()
    try (1L to 200L).foreach { w =>
      WaveManifest.commit(spark, root, Seq(w))
    } finally {
      stop.set(true)
      reader.join()
    }
    // pre-fix this read absent in ~81% of reads (399232/493400)
    assert(vanished.get() === 0,
      s"latest vanished ${vanished.get()} times in ${reads.get()} reads")
  }

  test("compaction claims are O(1) past abandoned markers: the bid " +
      "starts one past the highest burned id, not a linear probe " +
      "(review r15 #5)") {
    val root = fresh()
    WaveManifest.commit(spark, root, Seq(0L))
    val pinned = Seq(0L)
    // 100 claims, all abandoned (claimed, never committed)
    val ids = (0 until 100).map(_ =>
      WaveManifest.claimCompactionWave(spark, root, pinned))
    assert(ids === (0 until 100).map(WaveManifest.CompactBase + _))
    // the next bid jumps straight past every burned id in one create
    assert(WaveManifest.claimCompactionWave(spark, root, pinned) ===
      WaveManifest.CompactBase + 100)
  }

  test("expire reclaims claim markers at or below the pinned compaction " +
      "watermark; markers above it (in-flight claims) survive") {
    val root = fresh()
    WaveManifest.commit(spark, root, Seq(0L, 1L))
    val baseV = WaveManifest.latestVersion(spark, root)
    val c0 = WaveManifest.claimCompactionWave(spark, root, Seq(0L, 1L))
    val c1 = WaveManifest.claimCompactionWave(spark, root, Seq(0L, 1L))
    val c2 = WaveManifest.claimCompactionWave(spark, root, Seq(0L, 1L))
    assert(Seq(c0, c1, c2) === Seq(WaveManifest.CompactBase,
      WaveManifest.CompactBase + 1, WaveManifest.CompactBase + 2))
    // c1 commits (c0 abandoned below it, c2 still "in flight" above it)
    WaveManifest.commitCompaction(spark, root, absorbed = Seq(0L, 1L),
      newWave = c1, through = 1L, basedOn = baseV)
    WaveManifest.expire(spark, root, Seq.empty, keepVersions = 1)
    val d = new org.apache.hadoop.fs.Path(s"$root/_manifest")
    val f = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val markers = f.listStatus(d).map(_.getPath.getName)
      .filter(_.startsWith(".claim_w=")).sorted.toSeq
    assert(markers === Seq(s".claim_w=$c2"),
      s"expected only the in-flight marker to survive, got $markers")
    // a reclaimed id can never be re-bid: the next claim starts past
    // the surviving marker, which is itself past the pinned max
    assert(WaveManifest.claimCompactionWave(spark, root, Seq(c1)) ===
      c2 + 1)
  }

  test("commitCompaction: a wave landed between the pin and the commit " +
      "SURVIVES — the compaction retries on top of the racer") {
    val root = fresh()
    WaveManifest.commit(spark, root, Seq(0L, 1L, 2L))
    val baseV = WaveManifest.latestVersion(spark, root)
    val absorbed = WaveManifest.wavesAt(spark, root, baseV.get)
    // racer: a streaming append commits wave 3 after the compaction
    // pinned its read set
    WaveManifest.commitWave(spark, root, 3L)
    val newWave = WaveManifest.nextCompactionWave(absorbed)
    val v = WaveManifest.commitCompaction(spark, root, absorbed, newWave,
      through = WaveManifest.throughAfterCompaction(absorbed, -1L),
      basedOn = baseV)
    // the racer's wave is still pinned; the absorbed ones are gone
    assert(WaveManifest.pinned(spark, root).get ===
      Seq(3L, newWave).sorted)
    assert(WaveManifest.compactedThrough(spark, root) === 2L)
    assert(v === WaveManifest.latestVersion(spark, root).get)
    // no race: the same call from a current base commits first try
    val baseV2 = WaveManifest.latestVersion(spark, root)
    val abs2 = WaveManifest.wavesAt(spark, root, baseV2.get)
    val w2 = WaveManifest.nextCompactionWave(abs2)
    WaveManifest.commitCompaction(spark, root, abs2, w2,
      through = WaveManifest.throughAfterCompaction(abs2, 2L),
      basedOn = baseV2)
    assert(WaveManifest.pinned(spark, root).get === Seq(w2))
    assert(WaveManifest.compactedThrough(spark, root) === 3L)
  }

  test("hammering commitWave from many threads loses no wave and every " +
      "version is a committed predecessor plus one wave") {
    val root = fresh()
    WaveManifest.commit(spark, root, Seq(0L))
    val waves = (1L to 12L).toSeq
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = waves.map { w =>
        pool.submit(new Runnable {
          def run(): Unit = WaveManifest.commitWave(spark, root, w)
        })
      }
      futures.foreach(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    assert(WaveManifest.pinned(spark, root).get === 0L +: waves)
    // every committed version is internally consistent: a strict
    // superset chain — no version ever dropped a predecessor's wave
    val vs = WaveManifest.versions(spark, root)
    val sets = vs.map(v => WaveManifest.wavesAt(spark, root, v).toSet)
    sets.sliding(2).foreach {
      case Seq(a, b) => assert(a.subsetOf(b), s"version dropped waves: $a vs $b")
      case _ => ()
    }
  }
}
