package graft.model

import org.apache.hadoop.fs.{FileSystem, Path}

/** The ONE storage primitive the whole [[WaveManifest]] commit protocol
  * rests on: write `body` under the final immutable name `dst`
  * '''atomically''' (no reader ever observes a partial object) and
  * '''exclusively''' (of N racing writers of the same name, exactly one
  * returns true; every loser returns false and must then read the
  * winner's bytes to decide no-op-replay vs lost-CAS). Both manifest
  * commit legs — the `v=<n>` compare-and-swap and the `.claim_w=<id>`
  * compaction-wave claim — reduce to this call.
  *
  * Implementations are resolved PER FILESYSTEM SCHEME
  * ([[ManifestPublish.forFs]]), because no single Hadoop FileSystem call
  * has these semantics everywhere (review r17 #1 — the old code silently
  * degraded unknown backends to a non-atomic check-then-rename, the
  * exact primitive the r17 negative control showed losing 2 commits in
  * 5):
  *
  *  - `file` → [[LinkPublish]]: staging write + hard link. link(2) is
  *    atomic and fails EEXIST; Hadoop's local rename is an OVERWRITING
  *    check-then-rename. Link-less local mounts (FAT/SMB/overlay throw
  *    `FileSystemException`, not just `UnsupportedOperationException` —
  *    advice r17) degrade to check-then-rename, the documented
  *    single-committer-per-host posture for such mounts.
  *  - `hdfs` family → [[RenamePublish]]: staging write + no-overwrite
  *    rename, atomic by the HDFS FileSystem contract.
  *  - object stores (`s3a`, `gs`, `abfs`, …) → a registered
  *    [[ConditionalPutPublish]] wrapping the store's conditional put
  *    (S3 `If-None-Match: *`, GCS `ifGenerationMatch=0`, Azure
  *    `If-None-Match: *`). There is deliberately NO default: a blind
  *    PUT is last-writer-wins and rename is copy+delete, so an
  *    unregistered object store must REFUSE to commit
  *    ([[ManifestPublish.UnsupportedCommitBackendException]]) rather
  *    than silently lose manifests. Deployments call
  *    [[ManifestPublish.register]] once at startup with an adapter
  *    over their store SDK ([[EmulatedConditionalPut]] is the
  *    contract-test reference: the forked two-JVM
  *    `MultiProcessManifestSpec` storm runs green against it).
  *  - anything else → fail fast, same exception. Commit safety is a
  *    per-backend property; "probably fine" is how lost updates ship.
  *
  * Only the tiny `_manifest` control files go through this seam. Data
  * waves are immutable `batch=` dirs written once and never renamed —
  * safe on every backend regardless.
  */
trait ManifestPublish {

  /** Publish `body` under `dst` atomically + exclusively: true iff THIS
    * caller won the name. On false, `dst` exists with some complete
    * winner's content (possibly an identical replay of this caller's —
    * the CAS layer decides). Must never leave a partial `dst` visible. */
  def writeExclusive(f: FileSystem, dst: Path, body: Array[Byte]): Boolean
}

object ManifestPublish {

  /** A manifest commit was attempted on a backend whose exclusive-write
    * posture is unverified: an object store with no registered
    * conditional-put adapter, or an unknown scheme. Loud by design —
    * the alternative (check-then-rename) loses racing commits. */
  final class UnsupportedCommitBackendException(msg: String)
    extends java.io.IOException(msg)

  // schemes whose rename(no-overwrite)/create(overwrite=false) are
  // atomic by the HDFS FileSystem contract
  private val RenameAtomic =
    Set("hdfs", "viewfs", "webhdfs", "swebhdfs", "ofs", "o3fs")
  // object stores: rename is copy+delete, blind PUT last-writer-wins
  private val ObjectStore = Set("s3", "s3a", "s3n", "gs", "abfs",
    "abfss", "wasb", "wasbs", "oss", "cosn", "obs")

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, ManifestPublish]()

  /** Deployment hook: bind `scheme` to a publisher — the conditional-put
    * adapter for an object store, or an override for an exotic mount.
    * Takes precedence over every built-in resolution. */
  def register(scheme: String, p: ManifestPublish): Unit =
    registry.put(scheme.toLowerCase(java.util.Locale.ROOT), p)

  /** Test/ops hook: drop a [[register]]ed binding. */
  def unregister(scheme: String): Unit =
    registry.remove(scheme.toLowerCase(java.util.Locale.ROOT))

  def forFs(f: FileSystem): ManifestPublish = forScheme(
    try f.getScheme
    catch { // base FileSystem.getScheme throws; fall back to the URI
      case _: UnsupportedOperationException => f.getUri.getScheme
    })

  def forScheme(scheme: String): ManifestPublish = {
    val s = Option(scheme).map(_.toLowerCase(java.util.Locale.ROOT))
      .getOrElse("")
    Option(registry.get(s)).getOrElse {
      if (s == "file") LinkPublish
      else if (RenameAtomic(s)) RenamePublish
      else if (ObjectStore(s)) throw new UnsupportedCommitBackendException(
        s"manifest commits on '$s' need the store's conditional put: " +
          "blind PUT is last-writer-wins and rename is copy+delete, so " +
          "two committers on different hosts could both believe they " +
          "won the same version (lost update). Call ManifestPublish" +
          s".register(\"$s\", new ConditionalPutPublish(<adapter over " +
          "S3 If-None-Match:* / GCS ifGenerationMatch=0 / Azure " +
          "If-None-Match:*>)) once at startup. Data waves are " +
          "unaffected — this gate is only for the tiny _manifest files")
      else throw new UnsupportedCommitBackendException(
        s"no verified exclusive-write primitive for filesystem scheme " +
          s"'$s' — refusing to commit manifests over a possibly " +
          "non-atomic rename. Register one: ManifestPublish.register(" +
          s"\"$s\", LinkPublish | RenamePublish | new " +
          "ConditionalPutPublish(...)) per the backend's actual " +
          "atomicity contract")
    }
  }

  // staging name: nonce'd so racing committers never overwrite each
  // other's staging file; dot-prefixed so manifest listings skip it
  private[model] def stage(f: FileSystem, dst: Path,
      body: Array[Byte]): Path = {
    val tmp = new Path(dst.getParent, s".tmp.${dst.getName}." +
      java.util.UUID.randomUUID().toString.take(8))
    val out = f.create(tmp, true)
    out.write(body)
    out.close()
    tmp
  }

  private[model] def renameExclusive(f: FileSystem, tmp: Path,
      dst: Path): Boolean =
    if (f.exists(dst)) { f.delete(tmp, false); false }
    else if (f.rename(tmp, dst)) true
    else {
      // rename's boolean false conflates "dst appeared — lost the
      // race" with genuine environmental failures (staging file swept
      // by an ops cleanup, dst-is-a-directory, degraded mount).
      // Re-check: only a visible winner at dst is a race; anything
      // else must surface as an error, or the CAS layer would report
      // a phantom ConcurrentCommitException and claimCompactionWave's
      // retry loop could spin unboundedly (review r18)
      val lost = f.exists(dst)
      f.delete(tmp, false)
      if (!lost) throw new java.io.IOException(
        s"rename $tmp -> $dst failed with no competing winner at the " +
          "destination — an environmental fault, not a lost commit race")
      false
    }
}

/** Local-FS publisher: fully write a nonce'd staging file, then hard
  * LINK it to the final name — link(2) is atomic and fails EEXIST, the
  * only local primitive that is both atomic and exclusive (Hadoop's
  * local rename is a non-atomic dst-exists check over an OVERWRITING
  * rename(2); two cross-JVM racers could both "win" and one manifest's
  * content silently vanished — the r16→r17 fix, proven by the forked
  * two-JVM storm + its negative control). Link-less local filesystems
  * (FAT/exFAT, some SMB/overlay mounts) throw `FileSystemException`
  * ("Operation not permitted"), not only `UnsupportedOperationException`
  * (advice r17): both degrade to check-then-rename — same-JVM racers
  * stay serialized by the caller's monitor; cross-JVM exclusivity on
  * such mounts is a documented single-committer-per-host posture. */
object LinkPublish extends ManifestPublish {
  def writeExclusive(f: FileSystem, dst: Path,
      body: Array[Byte]): Boolean = {
    val tmp = ManifestPublish.stage(f, dst, body)
    try {
      java.nio.file.Files.createLink(
        java.nio.file.Paths.get(dst.toUri.getPath),
        java.nio.file.Paths.get(tmp.toUri.getPath))
      f.delete(tmp, false)
      true
    } catch {
      // FileAlreadyExistsException extends FileSystemException — this
      // arm MUST come first: EEXIST is the lost-race signal, not a
      // link-capability failure
      case _: java.nio.file.FileAlreadyExistsException =>
        f.delete(tmp, false); false
      case _: UnsupportedOperationException |
          _: java.nio.file.FileSystemException =>
        ManifestPublish.renameExclusive(f, tmp, dst)
    }
  }
}

/** HDFS-family publisher: staging write + NO-OVERWRITE rename, both
  * atomic by the HDFS FileSystem contract (rename fails when dst
  * exists; it never overwrites). The staging write keeps partial
  * content invisible — HDFS `create(overwrite=false)` claims the name
  * atomically but streams content afterward, so creating dst directly
  * would expose half-written manifests to racing readers. */
object RenamePublish extends ManifestPublish {
  def writeExclusive(f: FileSystem, dst: Path,
      body: Array[Byte]): Boolean =
    ManifestPublish.renameExclusive(f, ManifestPublish.stage(f, dst, body),
      dst)
}

/** The object-store adapter point: one conditional-put call — create
  * the object at `dst` with exactly `body` iff absent, atomically
  * (server-side all-or-nothing; no reader may ever observe a partial
  * object), returning true iff created. Maps 1:1 onto S3
  * `PutObject + If-None-Match: *` (412 ⇒ false), GCS
  * `insert + ifGenerationMatch=0` (412 ⇒ false), Azure
  * `Put Blob + If-None-Match: *` (409 ⇒ false). */
trait ConditionalPut {
  def putIfAbsent(dst: Path, body: Array[Byte]): Boolean
}

/** [[ManifestPublish]] over a store's [[ConditionalPut]]: no staging
  * round-trip at all — on an object store the conditional put IS both
  * the atomic write and the exclusivity decision, so staging+copy
  * would only add a PUT+GET per commit. */
final class ConditionalPutPublish(cp: ConditionalPut)
  extends ManifestPublish {
  def writeExclusive(f: FileSystem, dst: Path,
      body: Array[Byte]): Boolean = cp.putIfAbsent(dst, body)
}

/** The contract-test FAKE of [[ConditionalPut]]: emulates an object
  * store whose conditional put is server-side atomic, backed by the
  * local filesystem so racers in DIFFERENT JVMs share it (the forked
  * two-JVM `MultiProcessManifestSpec` storm runs its full invariant
  * body against this via `ManifestHammer`'s `condput` publisher mode).
  * How the fake achieves the put's atomicity internally (staging +
  * link, like a store's server internals) is irrelevant to what the
  * test proves: that the commit protocol is correct when expressed
  * through ONLY `putIfAbsent` — no rename, no dst-exists pre-checks,
  * no staging visible to readers. The negative control (a blind
  * last-writer-wins put in `ManifestHammer`'s `blindput` mode) makes
  * the same storm lose updates — the spec exercises the conditional
  * semantics, not an accident of the backing. */
object EmulatedConditionalPut extends ConditionalPut {
  def putIfAbsent(dst: Path, body: Array[Byte]): Boolean = {
    val target = java.nio.file.Paths.get(dst.toUri.getPath)
    val tmp = target.resolveSibling(
      s".put.${java.util.UUID.randomUUID().toString.take(8)}")
    java.nio.file.Files.write(tmp, body)
    try { java.nio.file.Files.createLink(target, tmp); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }
    finally java.nio.file.Files.deleteIfExists(tmp)
  }
}

/** Pure in-memory [[ConditionalPut]] for same-JVM adapter-race specs:
  * the map's `putIfAbsent` is the store's atomic conditional put.
  * Objects live only in the map (readers going through a FileSystem
  * will not see them) — use [[EmulatedConditionalPut]] when the full
  * read-back protocol must work. */
final class InMemoryConditionalPut extends ConditionalPut {
  val objects =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
  def putIfAbsent(dst: Path, body: Array[Byte]): Boolean =
    objects.putIfAbsent(dst.toString, body) == null
}
