package graft

/** Contract for the per-run scratch roots of the staged-write queries
  * (q_jsonl_scan / q_tsv_scan / q_corpus_export — ADVICE r9 de-race):
  * unique per JVM, stable within one, distinct per query.
  */
class ScratchDirSpec extends SparkSpec {
  test("scratch path embeds appId+pid, is stable in-JVM, distinct per query") {
    val a = SparkEntry.scratchDir(spark, "q_jsonl_scan")
    // stable within the JVM: Bench's 3× reruns overwrite in place
    // instead of accumulating one staging dir per pass
    assert(a == SparkEntry.scratchDir(spark, "q_jsonl_scan"))
    assert(a != SparkEntry.scratchDir(spark, "q_tsv_scan"))
    // unique across JVMs: appId (timestamp-derived) + pid tie-break —
    // two concurrent Verify/Bench processes can never share a root
    assert(a.contains(spark.sparkContext.applicationId))
    assert(a.contains(ProcessHandle.current().pid().toString))
  }
}
