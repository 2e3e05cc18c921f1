package graft.model

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.SparkSpec

/** CROSS-PROCESS manifest-commit atomicity (review r16 #1): two forked
  * JVMs — separate processes, separate `casLocks`, nothing shared but
  * the index root on the local filesystem — hammer
  * [[WaveManifest.commitWave]] + [[WaveManifest.claimCompactionWave]]
  * while THIS JVM serves pinned snapshots, and every global invariant
  * of the manifest protocol must hold over the merged histories:
  *
  *  1. '''No lost update''': every wave either process committed is in
  *     the final snapshot (each hammer also self-checks after every
  *     commit, so a mid-storm loss fails the subprocess immediately).
  *  2. '''Contiguous versions''': exactly one committer wins each
  *     `v=<n>` — version files are 0..N with no gaps and no overwrites
  *     (an overwrite would show as a version whose content another
  *     process's history contradicts, surfaced by invariant 1).
  *  3. '''Globally unique claims''': no compaction wave id is claimed
  *     by both processes.
  *  4. '''Serve monotonicity''': snapshots observed here during the
  *     storm only ever GROW (commits are adds; a shrink = a reader
  *     caught a half-published manifest or a lost update).
  *
  * This is the leg the same-JVM WaveRaceSpec loops could not reach:
  * on the local FS, Hadoop's `rename` and `create(overwrite=false)`
  * are non-atomic check-then-act, and only the per-root JVM monitor
  * kept same-process racers safe. The version-file publish goes
  * through an atomic hard link ([[WaveManifest]] `publishExclusive`)
  * and claims through O_EXCL create — what this spec exercises for
  * real, across processes.
  */
class MultiProcessManifestSpec extends SparkSpec {

  /** The forked-JVM launch settings of build.sbt (Spark on JDK 17
    * needs the add-opens when SparkSession starts outside
    * spark-submit). */
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def launchHammer(mode: String, root: String, procId: Int,
      n: Int, outFile: String, log: String,
      publisher: String = "link"): Process = {
    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java")
      .toString
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-XX:+UseSerialGC",
      "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      "graft.tools.ManifestHammer",
      mode, root, procId.toString, n.toString, outFile,
      publisher)).asJava
    new ProcessBuilder(cmd)
      .redirectErrorStream(true)
      .redirectOutput(new java.io.File(log))
      .start()
  }

  private def parse(outFile: String): (Seq[Long], Seq[Long], Boolean) = {
    val lines = Files.readAllLines(Paths.get(outFile)).asScala.toSeq
    (lines.collect { case s if s.startsWith("wave ") =>
        s.stripPrefix("wave ").toLong },
      lines.collect { case s if s.startsWith("claim ") =>
        s.stripPrefix("claim ").toLong },
      lines.lastOption.contains("OK"))
  }

  test("two forked JVMs storming one manifest root: no lost update, " +
      "contiguous versions, globally unique claims, monotone serves") {
    stormInvariants("link")
  }

  /** The same storm, but every commit in the forked JVMs goes through
    * the OBJECT-STORE adapter ([[ConditionalPutPublish]] over the
    * contract fake [[EmulatedConditionalPut]]) — proving the manifest
    * protocol is correct when the ONLY exclusive primitive is a
    * conditional put: no rename, no dst-exists pre-check (review r17
    * #1, the executable leg of the class-doc conditional-put
    * requirement). The negative control lives in the hammer's
    * `blindput` mode: the identical storm over a last-writer-wins put
    * loses updates (run manually at close, recorded in PERF.md). */
  test("the same storm committed exclusively through the " +
      "conditional-put adapter holds every invariant") {
    stormInvariants("condput")
  }

  private def stormInvariants(publisher: String): Unit = {
    val dir = Files.createTempDirectory("mp-manifest")
    val root = dir.resolve("idx").toString
    val out1 = dir.resolve("p1.out").toString
    val out2 = dir.resolve("p2.out").toString
    val log1 = dir.resolve("p1.log").toString
    val log2 = dir.resolve("p2.log").toString
    val perProc = 40

    val p1 = launchHammer("storm", root, 1, perProc, out1, log1, publisher)
    val p2 = launchHammer("storm", root, 2, perProc, out2, log2, publisher)

    // serve DURING the storm from this (third) process: snapshots must
    // only grow; a transiently half-visible or overwritten version
    // file would show as a shrink or a read failure
    var prev = Set.empty[Long]
    var observations = 0
    while (p1.isAlive || p2.isAlive) {
      WaveManifest.pinned(spark, root).foreach { snap =>
        val cur = snap.toSet
        assert(prev.subsetOf(cur),
          s"snapshot SHRANK during storm: lost ${prev.diff(cur)}")
        prev = cur
        observations += 1
      }
      Thread.sleep(25)
    }
    assert(p1.waitFor() === 0,
      s"hammer 1 failed:\n${new String(Files.readAllBytes(Paths.get(log1)))}")
    assert(p2.waitFor() === 0,
      s"hammer 2 failed:\n${new String(Files.readAllBytes(Paths.get(log2)))}")
    assert(observations > 0, "serve loop never observed a snapshot")

    val (waves1, claims1, ok1) = parse(out1)
    val (waves2, claims2, ok2) = parse(out2)
    assert(ok1 && ok2, "a hammer exited before its OK line")
    assert(waves1.size === perProc && waves2.size === perProc)

    // 1. no lost update
    val finalWaves = WaveManifest.pinned(spark, root).get.toSet
    val committed = (waves1 ++ waves2).toSet
    assert(committed.subsetOf(finalWaves),
      s"lost waves: ${committed.diff(finalWaves).toSeq.sorted}")

    // 2. contiguous version history, one winner per version
    val vs = WaveManifest.versions(spark, root)
    assert(vs === (0L until vs.size.toLong),
      s"version history has gaps: $vs")
    // every version's wave set is a superset of its predecessor's ∩
    // stream-space (commitWave only adds)
    vs.sliding(2).foreach {
      case Seq(a, b) =>
        val wa = WaveManifest.wavesAt(spark, root, a).toSet
        val wb = WaveManifest.wavesAt(spark, root, b).toSet
        assert(wa.subsetOf(wb), s"v=$b dropped ${wa.diff(wb)} vs v=$a")
      case _ => ()
    }
    // and the total count matches: each commit produced exactly one
    // version (no overwritten/absorbed version files)
    assert(vs.size === committed.size,
      s"${committed.size} commits produced ${vs.size} versions")

    // 3. globally unique claim ids
    val dup = claims1.toSet.intersect(claims2.toSet)
    assert(dup.isEmpty, s"claim ids claimed by BOTH processes: $dup")
    assert(claims1.distinct.size === claims1.size)
    assert(claims2.distinct.size === claims2.size)
  }
}
