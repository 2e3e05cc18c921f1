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

  test("crash between version rename and pointer flip: the replay with " +
      "identical content resumes to the flip instead of conflicting") {
    val root = fresh()
    WaveManifest.commit(spark, root, Seq(0L))
    val base = WaveManifest.latestVersion(spark, root)
    val v1 = WaveManifest.commitBasedOn(spark, root, Seq(0L, 1L), None, base)
    // simulate the crash: wind the pointer back to the base version —
    // v=<v1> exists on disk but the flip "never happened" (write via
    // the Hadoop FS so the checksum sidecar stays consistent)
    val hp = new org.apache.hadoop.fs.Path(s"$root/_manifest/_latest")
    val hfs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = hfs.create(hp, true)
    out.write(base.get.toString.getBytes("UTF-8"))
    out.close()
    assert(WaveManifest.latestVersion(spark, root) === base)
    // the at-least-once replay of the SAME commit: byte-identical
    // content → no conflict, pointer flipped forward
    val again = WaveManifest.commitBasedOn(
      spark, root, Seq(0L, 1L), None, base)
    assert(again === v1)
    assert(WaveManifest.latestVersion(spark, root) === Some(v1))
    assert(WaveManifest.pinned(spark, root).get === Seq(0L, 1L))
  }

  test("the pointer never moves backwards: a straggler's flip after a " +
      "later commit is a no-op") {
    val root = fresh()
    WaveManifest.commit(spark, root, Seq(0L))
    val base = WaveManifest.latestVersion(spark, root)
    val v1 = WaveManifest.commitBasedOn(spark, root, Seq(0L, 1L), None, base)
    WaveManifest.commitWave(spark, root, 2L) // pointer now past v1
    val after = WaveManifest.latestVersion(spark, root).get
    assert(after > v1)
    // a replay of the v1 commit (identical content) must NOT wind the
    // pointer back and un-pin wave 2 for new readers
    WaveManifest.commitBasedOn(spark, root, Seq(0L, 1L), None, base)
    assert(WaveManifest.latestVersion(spark, root).get === after)
    assert(WaveManifest.pinned(spark, root).get === Seq(0L, 1L, 2L))
  }

  test("an ABANDONED orphan version above the pointer is adopted: the " +
      "next commit flips forward to it and the retry lands on top " +
      "(the wedged-root liveness fix, advice r14)") {
    val root = fresh()
    WaveManifest.commit(spark, root, Seq(0L))
    val base = WaveManifest.latestVersion(spark, root)
    // a commit that renamed its v-file but crashed before the pointer
    // flip AND is never replayed (run abandoned): orphan v=base+1 with
    // content a future retry will NOT reproduce
    WaveManifest.commitBasedOn(spark, root, Seq(0L, 7L), None, base)
    val hp = new org.apache.hadoop.fs.Path(s"$root/_manifest/_latest")
    val hfs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = hfs.create(hp, true)
    out.write(base.get.toString.getBytes("UTF-8"))
    out.close()
    assert(WaveManifest.latestVersion(spark, root) === base)
    // pre-fix: commitWave recomputed the same next, collided with the
    // orphan 32 times, and threw — the root was permanently wedged.
    // post-fix: the conflict adopts the orphan (flips the pointer to
    // it — its data waves landed before it, the data-first contract)
    // and the retry lands wave 2 on top of wave 7.
    WaveManifest.commitWave(spark, root, 2L)
    assert(WaveManifest.pinned(spark, root).get === Seq(0L, 2L, 7L))
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
