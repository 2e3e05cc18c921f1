package graft.tools

import org.apache.spark.sql.SparkSession

import graft.model.WaveManifest

/** Cross-PROCESS manifest-race hammer — the forked-JVM half of
  * `MultiProcessManifestSpec` (review r16 #1): every prior race loop
  * (WaveRaceSpec, the 50-green close gate) ran its racers as THREADS
  * of one JVM, where the per-root `casLocks` monitor already
  * serializes the CAS section — so the filesystem-level exclusivity
  * of the version-file publish had never been exercised across
  * process boundaries, on exactly the local-FS semantics (non-atomic
  * check-then-rename) that produced the r15/r16 races. This main runs
  * IN ITS OWN JVM, sharing nothing with its racers but the index
  * root's directory tree.
  *
  * Modes (args: mode root procId n outFile):
  *  - `commits`: n× [[WaveManifest.commitWave]] of process-disjoint
  *    wave ids — the lost-update probe (every committed wave must
  *    survive into the final snapshot).
  *  - `claims`: n× [[WaveManifest.claimCompactionWave]] — the
  *    duplicate-claim probe (ids must be globally unique).
  *  - `storm`: interleaved commits + claims + pinned-snapshot reads,
  *    the mixed workload. Each read asserts the snapshot is a
  *    SUPERSET of this process's own committed waves so far — a
  *    cross-JVM lost update fails here immediately, in-process.
  *
  * Protocol: one line per event (`wave <id>` / `claim <id>`) to
  * outFile, `OK` last; the spec asserts global invariants over the
  * merged logs and the final manifest. Any exception exits nonzero
  * with the stack on stderr — a loud spec failure.
  *
  * Optional 6th arg selects the [[graft.model.ManifestPublish]]
  * publisher this JVM commits through (review r17 #1 — prove the
  * protocol over each primitive, not just the local link):
  *  - `link` (default): the built-in local-FS [[graft.model.LinkPublish]]
  *  - `condput`: [[graft.model.ConditionalPutPublish]] over the
  *    object-store contract fake [[graft.model.EmulatedConditionalPut]]
  *    — the storm invariants must hold when the ONLY exclusive
  *    primitive is a conditional put
  *  - `blindput`: NEGATIVE CONTROL — a last-writer-wins put (what an
  *    object store does WITHOUT `If-None-Match`); the storm is
  *    expected to lose updates/claims, proving the spec exercises the
  *    conditional semantics rather than passing vacuously
  */
object ManifestHammer {

  /** The negative-control publisher: a blind overwriting PUT, i.e. an
    * object store WITHOUT its conditional header. Every racer "wins". */
  private object BlindPut extends graft.model.ManifestPublish {
    def writeExclusive(f: org.apache.hadoop.fs.FileSystem,
        dst: org.apache.hadoop.fs.Path, body: Array[Byte]): Boolean = {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dst.toUri.getPath), body)
      true
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(mode, root, procIdS, nS, outFile) = args.take(5)
    val procId = procIdS.toLong
    val n = nS.toInt
    args.drop(5).headOption.getOrElse("link") match {
      case "link" => () // built-in resolution
      case "condput" => graft.model.ManifestPublish.register("file",
        new graft.model.ConditionalPutPublish(
          graft.model.EmulatedConditionalPut))
      case "blindput" =>
        graft.model.ManifestPublish.register("file", BlindPut)
      case other => sys.error(s"unknown publisher '$other'")
    }
    val spark = SparkSession.builder()
      .master("local[1]")
      .appName(s"manifest-hammer-$procId")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = new java.io.PrintWriter(new java.io.File(outFile), "UTF-8")
    try {
      val mine = scala.collection.mutable.ArrayBuffer.empty[Long]
      def commitOne(i: Int): Unit = {
        val w = procId * 1000000L + i
        WaveManifest.commitWave(spark, root, w)
        mine += w
        out.println(s"wave $w")
      }
      def claimOne(): Unit = {
        val pinned = WaveManifest.pinned(spark, root).getOrElse(Seq.empty)
        val id = WaveManifest.claimCompactionWave(spark, root, pinned)
        out.println(s"claim $id")
      }
      def readCheck(): Unit = {
        val snap = WaveManifest.pinned(spark, root).getOrElse(Seq.empty).toSet
        val missing = mine.filterNot(snap.contains)
        if (missing.nonEmpty)
          sys.error(s"LOST UPDATE: waves ${missing.mkString(",")} " +
            s"committed by process $procId are absent from the current " +
            s"snapshot ${snap.toSeq.sorted.mkString(",")}")
      }
      mode match {
        case "commits" => (0 until n).foreach(commitOne)
        case "claims" => (0 until n).foreach(_ => claimOne())
        case "storm" =>
          (0 until n).foreach { i =>
            commitOne(i)
            if (i % 4 == 1) claimOne()
            readCheck()
          }
        case other => sys.error(s"unknown hammer mode '$other'")
      }
      out.println("OK")
    } finally {
      out.close()
      spark.stop()
    }
  }
}
