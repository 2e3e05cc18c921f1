package graft.model

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Retention vs outstanding pins (review r16 #6): a reader pinned to a
  * snapshot that [[WaveManifest.expire]] reclaims must fail LOUDLY AND
  * IMMEDIATELY on its next read — never return the silent partial row
  * set the surviving `batch=` dirs would produce. The twin hazard is
  * over-firing: a tombstone-only wave is legitimately absent from a
  * given table while still referenced by a live version, and that
  * absence must stay tolerated (the sideTableWaves semantics every
  * serve face depends on).
  */
class RetentionPinSpec extends SparkSpec {
  import spark.implicits._

  private def writeWave(root: String, wave: Long, ids: Seq[Long]): Unit =
    ids.toDF("id").withColumn("batch", lit(wave))
      .write.partitionBy("batch").mode("append").parquet(s"$root/tbl")

  /** waves 1..3 committed, then a compaction wave absorbing them. */
  private def compactedRoot(): (String, Seq[Long], Long) = {
    val root = Files.createTempDirectory("retpin").resolve("idx").toString
    (1L to 3L).foreach { w =>
      writeWave(root, w, Seq(w * 10, w * 10 + 1))
      WaveManifest.commitWave(spark, root, w)
    }
    val pinnedBefore = WaveManifest.pinned(spark, root).get
    assert(pinnedBefore === Seq(1L, 2L, 3L))
    val c = WaveManifest.CompactBase
    writeWave(root, c, Seq(10L, 11L, 20L, 21L, 30L, 31L))
    WaveManifest.commitCompaction(spark, root, absorbed = Seq(1L, 2L, 3L),
      newWave = c, through = 3L,
      basedOn = WaveManifest.latestVersion(spark, root))
    (root, pinnedBefore, c)
  }

  test("expire under an outstanding pin: the pinned read fails loudly " +
      "(ExpiredUnderPinException), not a silent empty read") {
    val (root, pinnedBefore, _) = compactedRoot()
    // retention reclaims versions v0..v2 and the now-unreferenced
    // waves 1..3 — while our reader still holds pinnedBefore
    val deleted = WaveManifest.expire(spark, root, Seq("tbl"),
      keepVersions = 1)
    assert(deleted === Seq(1L, 2L, 3L))

    val e = intercept[WaveManifest.ExpiredUnderPinException] {
      WaveManifest.readWaves(spark, root, "tbl", pinnedBefore)
    }
    assert(e.getMessage.contains("1,2,3"))
    assert(e.getMessage.contains("expire"))
  }

  test("the PARTIAL case is the loud one too: a pin mixing expired and " +
      "surviving waves throws instead of serving only the survivors") {
    val (root, _, c) = compactedRoot()
    WaveManifest.expire(spark, root, Seq("tbl"), keepVersions = 1)
    // wave 3 is gone, the compaction wave survives: pre-guard this
    // read returned ONLY wave c's rows — a silent partial result
    intercept[WaveManifest.ExpiredUnderPinException] {
      WaveManifest.readWaves(spark, root, "tbl", Seq(3L, c))
    }
  }

  test("tombstone-only absence stays tolerated: a live-referenced wave " +
      "with no dir in this table reads the other waves, no throw") {
    val (root, _, c) = compactedRoot()
    // wave 500 committed with NO dir under tbl (a tombstone-only wave)
    WaveManifest.commitWave(spark, root, 500L)
    val df = WaveManifest.readWaves(spark, root, "tbl", Seq(c, 500L))
    assert(df.count() === 6L)
    // and after retention the same read still works: 500 and c are
    // both referenced by the surviving version
    WaveManifest.expire(spark, root, Seq("tbl"), keepVersions = 1)
    assert(WaveManifest.readWaves(spark, root, "tbl", Seq(c, 500L))
      .count() === 6L)
  }

  test("the current snapshot always survives expire: re-resolving the " +
      "pin is the documented recovery") {
    val (root, _, c) = compactedRoot()
    WaveManifest.expire(spark, root, Seq("tbl"), keepVersions = 1)
    val fresh = WaveManifest.pinned(spark, root).get
    assert(fresh === Seq(c))
    assert(WaveManifest.readWaves(spark, root, "tbl", fresh).count() === 6L)
  }

  test("a transient version-file read error is never memoized: the " +
      "read after the fault self-heals instead of throwing forever") {
    val (root, _, c) = compactedRoot()
    // wave 500: tombstone-only (no dir under tbl), then absorbed by a
    // SECOND compaction — the newest version no longer references it,
    // so a pinned read of 500 must walk the full surviving history
    WaveManifest.commitWave(spark, root, 500L)
    val vWith500 = WaveManifest.latestVersion(spark, root).get
    writeWave(root, c + 1, Seq(10L, 11L, 20L, 21L, 30L, 31L))
    WaveManifest.commitCompaction(spark, root, absorbed = Seq(c, 500L),
      newWave = c + 1, through = 500L, basedOn = Some(vWith500))
    // corrupt the one version file that references 500 — simulating a
    // transient read fault on the history walk (version files are
    // immutable in the protocol; the bytes here stand in for an IO
    // error, not a modeled state)
    val vPath = java.nio.file.Paths.get(root, "_manifest", s"v=$vWith500")
    val original = Files.readAllBytes(vPath)
    Files.write(vPath, "not-a-wave-id".getBytes("UTF-8"))
    // the faulted walk answers loudly from what IS readable (the
    // pre-memo behavior)...
    intercept[WaveManifest.ExpiredUnderPinException] {
      WaveManifest.readWaves(spark, root, "tbl", Seq(c + 1, 500L))
    }
    // ...and must NOT have memoized that impoverished set: once the
    // fault clears, the SAME pin (same root, same version listing —
    // the memo key is unchanged) reads clean (review r18; the old
    // computeIfAbsent turned one IO hiccup into a permanent spurious
    // ExpiredUnderPinException)
    Files.write(vPath, original)
    assert(WaveManifest.readWaves(spark, root, "tbl", Seq(c + 1, 500L))
      .count() === 6L)
  }

  test("manifest-less legacy roots skip the guard: absence there is " +
      "the pre-manifest contract, not expiry") {
    val root = Files.createTempDirectory("retpin-legacy")
      .resolve("idx").toString
    writeWave(root, 1L, Seq(10L))
    // no manifest commit at all; wave 2 never landed
    val df = WaveManifest.readWaves(spark, root, "tbl", Seq(1L, 2L))
    assert(df.count() === 1L)
  }
}
