package graft.model

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.SparkSpec
import graft.model.ManifestPublish.UnsupportedCommitBackendException

/** The per-backend exclusive-publish seam (review r17 #1): scheme
  * resolution must map each backend to its VERIFIED primitive — and,
  * critically, must REFUSE object stores without a registered
  * conditional-put adapter and refuse unknown schemes outright,
  * instead of the old silent degrade to check-then-rename (the
  * primitive the r17 negative control showed losing 2 commits in 5).
  * The forked-JVM `MultiProcessManifestSpec` proves the protocol over
  * the real primitives; this spec pins the resolution table and the
  * adapter/fake semantics at the unit level. */
class ManifestPublishSpec extends SparkSpec {

  private def localFs = new Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("scheme resolution: file→link, hdfs family→rename") {
    assert(ManifestPublish.forScheme("file") === LinkPublish)
    assert(ManifestPublish.forScheme("FILE") === LinkPublish)
    assert(ManifestPublish.forScheme("hdfs") === RenamePublish)
    assert(ManifestPublish.forScheme("viewfs") === RenamePublish)
    // and the live local FileSystem resolves through the same table
    assert(ManifestPublish.forFs(localFs) === LinkPublish)
  }

  test("object-store schemes REFUSE without a registered " +
      "conditional-put adapter — loud, naming the fix") {
    Seq("s3a", "gs", "abfss", "wasb").foreach { s =>
      val e = intercept[UnsupportedCommitBackendException] {
        ManifestPublish.forScheme(s)
      }
      assert(e.getMessage.contains("conditional put"), s)
      assert(e.getMessage.contains("register"), s)
    }
  }

  test("unknown schemes fail fast — never a silent check-then-rename") {
    val e = intercept[UnsupportedCommitBackendException] {
      ManifestPublish.forScheme("someweirdfs")
    }
    assert(e.getMessage.contains("refusing"))
  }

  test("register binds a scheme to an adapter and wins over the " +
      "refusal; unregister restores it") {
    val cp = new InMemoryConditionalPut
    ManifestPublish.register("s3a", new ConditionalPutPublish(cp))
    try {
      val p = ManifestPublish.forScheme("s3a")
      assert(p.writeExclusive(localFs, new Path("s3a://b/_manifest/v=0"),
        "0".getBytes("UTF-8")))
      assert(cp.objects.containsKey("s3a://b/_manifest/v=0"))
    } finally ManifestPublish.unregister("s3a")
    intercept[UnsupportedCommitBackendException] {
      ManifestPublish.forScheme("s3a")
    }
  }

  test("conditional-put adapter: of N same-JVM racers on one name, " +
      "exactly one wins and the stored bytes are the winner's") {
    val cp = new InMemoryConditionalPut
    val pub = new ConditionalPutPublish(cp)
    val dst = new Path("s3a://bucket/_manifest/v=7")
    val bodies = (0 until 16).map(i => s"body-$i".getBytes("UTF-8"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
    try {
      val gate = new java.util.concurrent.CountDownLatch(1)
      val wins = bodies.map { b =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = { gate.await(); pub.writeExclusive(localFs, dst, b) }
        })
      }
      gate.countDown()
      val results = wins.map(_.get())
      assert(results.count(identity) === 1)
      val winner = bodies(results.indexWhere(identity))
      assert(cp.objects.get(dst.toString).sameElements(winner))
    } finally pool.shutdown()
  }

  test("the file-backed contract fake: losers observe the winner's " +
      "complete object, never a partial or overwritten one") {
    val dir = Files.createTempDirectory("condput")
    val dst = new Path(dir.resolve("v=0").toString)
    val a = "winner-waves 0,1,2".getBytes("UTF-8")
    val b = "loser-waves 0,9".getBytes("UTF-8")
    assert(EmulatedConditionalPut.putIfAbsent(dst, a))
    assert(!EmulatedConditionalPut.putIfAbsent(dst, b))
    assert(Files.readAllBytes(dir.resolve("v=0")).sameElements(a))
    // no staging residue in the listing an ops tool would see
    val names = Files.list(dir).toArray.map(_.toString)
    assert(names.forall(!_.contains(".put.")), names.mkString(","))
  }

  test("renameExclusive: a rename failure with NO winner at the " +
      "destination surfaces as an error — not a phantom lost race " +
      "that would spin the CAS/claim retry loops") {
    val dir = Files.createTempDirectory("renfail")
    // FileSystem.rename's boolean-false channel carries many
    // NON-race failures (source swept, dst-is-a-directory, degraded
    // mount — the local FS itself papers most of them over with a
    // copy fallback, so pin the contract with a stub): rename=false
    // with NO winner visible at dst must surface as an error, not a
    // phantom lost race (review r18)
    val refusing = new org.apache.hadoop.fs.RawLocalFileSystem {
      override def rename(src: Path, dst: Path): Boolean = false
    }
    refusing.initialize(new java.net.URI("file:///"),
      spark.sparkContext.hadoopConfiguration)
    val tmpFile = dir.resolve(".tmp.v=1.abc")
    Files.write(tmpFile, "waves".getBytes("UTF-8"))
    val e = intercept[java.io.IOException] {
      ManifestPublish.renameExclusive(refusing,
        new Path(tmpFile.toString), new Path(dir.resolve("v=1").toString))
    }
    assert(e.getMessage.contains("environmental fault"))
    // and dst-appeared-meanwhile stays a clean lost race: same failing
    // rename, but a winner IS visible at the destination
    val tmp2 = dir.resolve(".tmp.v=2.abc")
    Files.write(tmp2, "mine".getBytes("UTF-8"))
    Files.write(dir.resolve("v=2"), "winner".getBytes("UTF-8"))
    val won = new java.util.concurrent.atomic.AtomicBoolean(false)
    val racing = new org.apache.hadoop.fs.RawLocalFileSystem {
      override def exists(p: Path): Boolean =
        // dst "appears" only on the post-failure re-check
        if (p.getName == "v=2" && !won.getAndSet(true)) false
        else super.exists(p)
      override def rename(src: Path, dst: Path): Boolean = false
    }
    racing.initialize(new java.net.URI("file:///"),
      spark.sparkContext.hadoopConfiguration)
    assert(!ManifestPublish.renameExclusive(racing,
      new Path(tmp2.toString), new Path(dir.resolve("v=2").toString)))
    assert(new String(Files.readAllBytes(dir.resolve("v=2")),
      "UTF-8") === "winner")
  }

  test("LinkPublish and RenamePublish: sequential double-publish on " +
      "the local FS — first wins, second loses, content is the winner's") {
    Seq(LinkPublish: ManifestPublish, RenamePublish).foreach { pub =>
      val dir = Files.createTempDirectory("pub")
      val dst = new Path(dir.resolve("v=3").toString)
      assert(pub.writeExclusive(localFs, dst, "first".getBytes("UTF-8")))
      assert(!pub.writeExclusive(localFs, dst, "second".getBytes("UTF-8")))
      assert(new String(Files.readAllBytes(dir.resolve("v=3")),
        "UTF-8") === "first")
      // staging files consumed in every outcome
      val names = Files.list(dir).toArray.map(_.toString)
      assert(names.forall(!_.contains(".tmp.")), names.mkString(","))
    }
  }
}
