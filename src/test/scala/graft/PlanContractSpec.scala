package graft

import org.apache.spark.sql.functions._

/** Plan CONTRACTS: the scale-design claims in PERF.md, enforced.
  *
  * Each assertion pins a physical-plan property that the 100 TB posture
  * depends on — pushdown reaching the scan, dimension joins broadcasting,
  * top-k staying a TakeOrderedAndProject, grouping sets expanding once,
  * and no cartesian product anywhere. A refactor that silently regresses
  * one of these fails here, not in a cluster.
  */
class PlanContractSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def plan(name: String): String = {
    val q = SparkEntry.queries(name)(spark, sfDir)
    q.collect() // finalize AQE
    // AdaptiveSparkPlan.toString prints BOTH the final and the initial
    // plan; contract-check only what actually executed
    q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("events time-window predicate reaches the parquet scan") {
    // The contract is layout-agnostic: testdata has shipped ts as
    // nanos-as-long (pushed literal = 1704672000000000000) and as native
    // timestamp[us] (pushed literal = the 2024-01-08T00:00 instant). What
    // must NEVER happen is the range predicate failing to reach ANY scan —
    // that is a full fact-table read at 100 TB (P1, etl_deepflow:641).
    val p = plan("q_flow_rollup")
    val pushed =
      "GreaterThanOrEqual\\(ts,(1704672000000000000|2024-01-08T00:00[^)]*)\\)".r
    assert(p.contains("PushedFilters:") && pushed.findFirstIn(p).isDefined,
      s"time-window predicate not pushed to the events scan:\n${p.take(600)}")
  }

  test("dimension chains broadcast; fact side never shuffles for the join") {
    val p = plan("q_region_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3)
    assert(!p.contains("SortMergeJoin"))
  }

  test("lineitem scan reads only the revenue columns") {
    val p = plan("q_region_revenue")
    val read = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(p)
      .map(_.group(1)).find(_.contains("l_extendedprice"))
    assert(read.isDefined)
    val cols = read.get.split(",").length
    assert(cols == 3, s"lineitem reads $cols cols: ${read.get}")
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    assert(plan("q_flow_rollup").contains("TakeOrderedAndProject"))
  }

  test("grouping sets expand once: single Expand + aggregate pass") {
    val p = plan("q_cube")
    assert("Expand".r.findAllIn(p).length <= 2) // node + possible reference
    assert("Scan parquet".r.findAllIn(p).length == 1)
  }

  test("theta joins stay broadcast nested-loop, never cartesian") {
    val p = plan("q_substring_join")
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("no query in the corpus plans a cartesian product") {
    // cartesian = the only join shape with no scale story; check the
    // self-join-heavy dedup family plus the cross-fallback op explicitly
    Seq("q_ngram_jaccard", "q_minhash_lsh", "q_simhash_pairs",
      "q_embed_dedup", "q_vpc_fallback", "q_alarm_dispatch").foreach { n =>
      assert(!plan(n).contains("CartesianProduct"), n)
    }
  }

  test("attribution interval join is key-equi (shuffle/broadcast), never NLJ") {
    // the stream-stream interval join's batch face: must plan as an
    // equi-join on the user key with the time range as a join filter —
    // a nested-loop over events × events has no scale story
    val p = plan("q_attribution")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p.take(400))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      p.take(400))
  }

  test("incremental dedup broadcasts the batch probe; no cartesian") {
    // the corpus-index side must never shuffle for the band join — the
    // batch band list is the broadcast side (the 100 TB serving shape)
    val p = plan("q_dedup_incr")
    assert(p.contains("BroadcastHashJoin"), p.take(400))
    assert(!p.contains("CartesianProduct"), p.take(400))
  }

  test("anti-join GC is a broadcast or shuffled hash anti join") {
    val p = plan("q_anti_gc")
    assert(p.contains("LeftAnti"), p.take(300))
  }

  test("salted aggregation is two-phase: salt-keyed then key-only") {
    val p = plan("q_skew_agg")
    // phase 1 groups on (event_type, __salt), phase 2 on event_type alone:
    // the plan must carry a hash partitioning that includes the salt column
    // and a later one that does not
    assert(p.contains("__salt"), p.take(400))
    val exchanges = "hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(exchanges.exists(_.contains("__salt")), exchanges.mkString("; "))
    assert(exchanges.exists(e =>
      e.contains("event_type") && !e.contains("__salt")),
      exchanges.mkString("; "))
  }

  test("topology pipeline: one full-outer merge shuffle, GC stays semi join") {
    val p = plan("q_topology")
    assert(p.contains("FullOuter"), p.take(400))
    assert(p.contains("LeftSemi"), p.take(400))
    assert(!p.contains("CartesianProduct"))
  }

  test("declared-deps pipeline: both physical-id joins broadcast") {
    val p = plan("q_declared_deps")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p.take(400))
    assert(!p.contains("CartesianProduct"))
  }

  test("sampling and mixing are NARROW: zero exchanges over the scan") {
    Seq("q_stratified_sample", "q_mix_upsample").foreach { n =>
      val p = plan(n)
      assert(!p.contains("Exchange"),
        s"$n should be a pure map over the scan:\n${p.take(400)}")
    }
  }

  test("snapshot diff is one full-outer join, never cartesian") {
    val p = plan("q_snapshot_diff")
    assert(p.contains("FullOuter"), p.take(400))
    assert(!p.contains("CartesianProduct"))
  }

  test("persisted-index ANN equals the in-memory build") {
    // both now hash-check against the brute-force oracle too; this pins
    // the on-disk serving path DIRECTLY to the in-memory result
    def rows(n: String) = SparkEntry.queries(n)(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    assert(rows("q_ann_ivf") == rows("q_ann_ivf_disk"))
  }

  test("span dedup pairs come from aggregates alone: NO join in the plan") {
    // winnowing is one doc-keyed window; candidate pairs are posting-list
    // expansion of a fingerprint-keyed aggregate — a corpus self-join on
    // the fingerprint would be the shape that dies on hot boilerplate
    val p = plan("q_span_dedup")
    assert(!p.contains("Join"), p.take(600))
    assert("Window".r.findAllIn(p).nonEmpty, p.take(400))
  }

  test("token-budget mixing: SHARDED windows (no per-language single " +
      "task) with broadcast shard offsets — never a sort-merge join") {
    // the r15 two-level prefix-sum shape (VERDICT r14 #1): every window
    // partitions on (lang, __shard) or orders the subtotal table by
    // __shard — the dominant language can no longer serialize through
    // one task's sort chain; offsets come back via a broadcast join
    val p = plan("q_token_budget")
    val windows = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("__shard")),
      p.take(800))
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      p.take(400))
  }

  test("topology run report: one full-outer count join, never cartesian") {
    val p = plan("q_topology_stats")
    assert(p.contains("FullOuter"), p.take(400))
    assert(!p.contains("CartesianProduct"))
  }

  test("histogram is one aggregate pass: a single shuffle, no sort, no join") {
    val p = plan("q_histogram")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p.take(400))
    assert(!p.contains("Join") && !p.contains("Window"), p.take(400))
  }

  test("temporal features run in ONE ordered window: one shuffle, no join") {
    val p = plan("q_time_features")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p.take(400))
    assert("Window".r.findAllIn(p).nonEmpty && !p.contains("Join"), p.take(400))
  }

  test("boilerplate membership is a broadcast join; corpus not shuffled for it") {
    val p = plan("q_boilerplate")
    assert(p.contains("BroadcastHashJoin"), p.take(400))
    assert(!p.contains("SortMergeJoin"), p.take(400))
  }

  test("quantile sketch pushes value>0 to the scan; windows only post-agg") {
    val p = plan("q_quantile_sketch")
    assert(p.contains("GreaterThan(value,0.0)"), p.take(400))
    // the window must run over the rolled-up sketch, never the raw
    // events: an aggregate (the sketch build) appears below it
    val winAt = p.indexOf("Window")
    val aggBelow = p.indexOf("HashAggregate", winAt)
    assert(winAt >= 0 && aggBelow > winAt, p.take(600))
  }

  test("negative sampling never shuffles the positives (broadcast domain only)") {
    val p = plan("q_neg_sample")
    assert(!p.contains("hashpartitioning"), p.take(600))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(400))
  }

  test("salted join shuffles on (key, salt) when it cannot broadcast") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val p = plan("q_skew_join")
      val exchanges = "Exchange hashpartitioning\\([^)]*\\)".r.findAllIn(p).toSeq
      assert(exchanges.exists(_.contains("__salt")), exchanges.mkString("; "))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("distributed ANN probe join: corpus never shuffles when probes broadcast") {
    // searchDistributed(broadcastProbes=true) is the serving shape for a
    // large probe batch against a 100 TB corpus index: probe selection is
    // a broadcast-centroid argmin, then the probe frame broadcasts into
    // the corpus join — the ONLY hash exchanges in the plan are the two
    // query_id windows; the corpus side must never repartition on list_id.
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val model = graft.ext.IvfIndex.buildSign(emb, "vec_id", "embedding", bits = 4)
    val q = graft.ext.IvfIndex.searchDistributed(model,
      emb.filter(col("vec_id") < 5), "vec_id", "embedding",
      k = 3, nProbe = 1, broadcastProbes = true)
    q.collect()
    val p = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("BroadcastHashJoin"), p.take(600))
    val exchanges = "hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(!exchanges.exists(_.contains("list_id")),
      s"corpus shuffled on list_id: ${exchanges.mkString("; ")}")
  }

  test("distributed ANN probe join: non-broadcast mode shuffles on list_id only") {
    // broadcastProbes=false is the corpus×corpus bulk shape: both sides
    // hash-shuffle on list_id (the posting-list key) and nothing else —
    // a shuffle on any other key (or a broadcast that AQE sneaks in)
    // would break the co-location the persisted layout is built around.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val model = graft.ext.IvfIndex.buildSign(emb, "vec_id", "embedding", bits = 4)
      val q = graft.ext.IvfIndex.searchDistributed(model,
        emb.filter(col("vec_id") < 5), "vec_id", "embedding",
        k = 3, nProbe = 1, broadcastProbes = false)
      q.collect()
      val p = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        p.take(600))
      val joinExchanges = "Exchange hashpartitioning\\(([^)]*)\\)".r
        .findAllMatchIn(p).map(_.group(1)).filter(_.contains("list_id")).toSeq
      assert(joinExchanges.size >= 2,
        s"expected both join sides keyed on list_id: ${joinExchanges.mkString("; ")}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter prunes the fact scan of a selective shuffle join") {
    // At cluster scale a selective dim filter should reach the fact side
    // BEFORE the shuffle: Spark's runtime row-level filtering injects a
    // bloom might_contain built from the filtered dim into the fact scan.
    // The default thresholds (10 GB application side) are sized for real
    // clusters, so this contract pins the MECHANISM at test scale by
    // lowering them — the same plan shape a 100 TB join produces.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force the shuffle join
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val part = spark.read.parquet(s"$sfDir/part.parquet")
        .filter(col("p_size") === 1)
      val j = li.join(part, li("l_partkey") === part("p_partkey"))
        .groupBy(col("p_type")).agg(sum(col("l_quantity")).as("q"))
      j.collect()
      val p = j.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(p.contains("might_contain"),
        s"no bloom filter on the fact scan:\n${p.take(600)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("explicit bloom prefilter probes the fact BELOW the residual join") {
    // ops.BloomPrefilter is the same mechanism as the contract above but
    // caller-controlled (key sets too big to broadcast, sizes Spark's
    // planner thresholds would never fire for). The codegen probe must
    // sit on the fact side UNDER the residual semi join — plan text
    // prints parents first, so the probe's offset must be beyond the
    // join's.
    val p = plan("q_bloom_semi")
    val probe = p.indexOf("bloom_might_contain")
    val join = p.indexOf("LeftSemi")
    assert(probe >= 0, s"no bloom probe in plan:\n${p.take(600)}")
    assert(join >= 0 && probe > join,
      s"probe not below the residual join (probe@$probe, join@$join)")
  }

  test("heavy hitters: exact re-count joins broadcast, never sort-merge") {
    // FrequentItems' whole point is that the item domain is never
    // exchanged: pass 1 is a partial/final MG aggregate (buffer-sized
    // exchange), pass 2 keeps candidate rows via a BROADCAST semi join
    // before the tiny re-count aggregate. A SortMergeJoin here would
    // mean the corpus shuffled on the item key — the exact failure mode
    // the operator exists to avoid.
    val p = plan("q_heavy_hitters")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      p.take(600))
    // (the sketch pass itself is consumed eagerly inside the operator;
    // this plan is the exact re-count whose join must broadcast)
    assert(!p.contains("SortMergeJoin"),
      s"candidate membership fell back to a corpus shuffle:\n${p.take(600)}")
  }

  test("k-means: the centroid join broadcasts; the comp frame never " +
      "shuffles for it") {
    // KMeans' per-round distance pass joins the N·dim component frame
    // against k·dim centroids on pos — centroids must ALWAYS ride a
    // broadcast (they are bounded by k·dim rows); a SortMergeJoin here
    // would shuffle the full quantized corpus on a 64-value key, the
    // worst possible exchange. The final round is un-checkpointed, so
    // its join is visible in the query's executed plan.
    val p = plan("q_kmeans")
    assert(p.contains("BroadcastHashJoin"), p.take(600))
    assert(!p.contains("SortMergeJoin"),
      s"comp frame shuffled for the centroid join:\n${p.take(600)}")
  }

  test("edit-distance join: the quadratic shape is structurally absent") {
    // EditSim's whole point is replacing the O(n²) comparison with an
    // equi join on the deletion-variant key. Any nested-loop or
    // cartesian operator in the plan means the blocking collapsed into
    // the brute force the oracle runs on purpose.
    val p = plan("q_edit_pairs")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"quadratic join shape in the blocked plan:\n${p.take(600)}")
  }

  test("gram matrix: one pass, zero joins — the quadratic road is the " +
      "oracle's, not the operator's") {
    // secondMoment expands upper-triangle products IN-ROW; any Join
    // node would mean the N·dim self-join shape snuck back in. The
    // whole plan must be scan → generate → aggregate.
    val p = plan("q_gram")
    assert(!p.contains("Join"), s"join in the one-pass gram plan:\n${p.take(600)}")
    assert(p.contains("HashAggregate") && p.contains("Generate"), p.take(600))
  }

  test("incremental CC: the history-apply join broadcasts the merge map") {
    // incrementalUpdate's step 3 is the only join the standing labels
    // ever see — it must be a broadcast left-outer against the
    // batch-bounded mapping. A SortMergeJoin in the FINAL plan would
    // mean history shuffles per batch. (The endpoint-resolve join runs
    // inside a checkpoint materialization, not in this plan.)
    val p = plan("q_cc_incr")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftOuter"),
      p.take(600))
    assert(!p.contains("SortMergeJoin"),
      s"history shuffled for the label apply:\n${p.take(600)}")
  }

  test("walk corpora are pre-materialized: consuming them adds no exchange") {
    // Walks (and biasedWalks) chain steps through localCheckpoint; the
    // returned union must read those blocks as-is — the BFS contract.
    Seq("q_walks", "q_biased_walks").foreach { q =>
      val p = plan(q)
      assert(p.contains("Union"), s"$q:\n${p.take(400)}")
      assert(!p.contains("Exchange"),
        s"$q re-shuffled its materialized steps:\n${p.take(600)}")
    }
  }

  test("lexical cosine: inverted-index pairing, no quadratic operator") {
    // the posting self-join must stay an equi join on the term key; a
    // nested-loop or cartesian node means the all-pairs shape returned
    val p = plan("q_lex_cosine")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"quadratic join in the inverted-index plan:\n${p.take(600)}")
  }

  test("event sequences: one window pass, no joins") {
    // the lead() conjunction must fold into a single Window over the
    // entity sort — a Join node would mean a self-join crept in
    val p = plan("q_event_seq")
    assert(p.contains("Window"), p.take(400))
    assert(!p.contains("Join"), s"join in the CEP plan:\n${p.take(600)}")
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1,
      s"expected exactly the entity exchange:\n${p.take(800)}")
  }

  test("dict tagging: equi join on the gram key, no quadratic operator") {
    val p = plan("q_dict_tag")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"doc×phrase shape in the tagging plan:\n${p.take(600)}")
  }

  test("BFS output is pre-materialized: consuming it adds no exchange") {
    // Bfs.distances materializes each frontier round (localCheckpoint);
    // the returned frame is a union of those blocks. Downstream
    // consumers must read them as-is — an Exchange in THIS plan would
    // mean the operator leaks per-round work into every consumer.
    val p = plan("q_bfs")
    assert(p.contains("Union"), p.take(600))
    assert(!p.contains("Exchange"),
      s"BFS union re-shuffled its materialized rounds:\n${p.take(600)}")
  }

  test("changepoint: one exchange carries prefix, totals, and argmax") {
    // the three window passes (ordered prefix sum, unbounded series
    // totals, |S| argmax) must all ride the series-key partitioning —
    // a second hashpartitioning exchange would mean a window re-keyed
    val p = plan("q_changepoint")
    assert(p.contains("Window"), p.take(400))
    assert(!p.contains("Join"), s"join in the CUSUM plan:\n${p.take(600)}")
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1,
      s"expected exactly the series-key exchange:\n${p.take(800)}")
  }

  test("segment dedup: keep-first is an aggregate, never a window") {
    // the hot-block hazard: a row_number window would ship every copy
    // of a million-times-repeated block to one sorted task; the
    // min-struct hash aggregate combines map-side instead
    val p = plan("q_segment_dedup")
    assert(!p.contains("Window"),
      s"window crept into the keep-first path:\n${p.take(600)}")
    assert(!p.contains("SortAggregate"),
      s"sort-based aggregate on the block key:\n${p.take(600)}")
    assert(p.contains("HashAggregate"), p.take(400))
  }

  test("co-moments: one partial-aggregatable pass, no join, no window") {
    val p = plan("q_comoments")
    assert(!p.contains("Join") && !p.contains("Window"), p.take(600))
    // partial_count/partial_sum before the exchange = map-side combine
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"no partial aggregation in the co-moment plan:\n${p.take(800)}")
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1,
      s"expected exactly the group-key exchange:\n${p.take(800)}")
  }

  test("hybrid search: list cuts are TakeOrderedAndProject, no cartesian") {
    // the retriever cuts and the fused top-N must push their limits
    // into the sort (never a full global sort); the only non-equi join
    // allowed is the dense arm's broadcast query join
    val p = plan("q_hybrid_search")
    assert(p.contains("TakeOrderedAndProject"), p.take(600))
    assert(!p.contains("CartesianProduct"),
      s"cartesian in the fusion plan:\n${p.take(600)}")
  }

  test("decay score: one partial-aggregatable pass, no join, no window") {
    val p = plan("q_decay")
    assert(!p.contains("Join") && !p.contains("Window"), p.take(600))
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"no map-side combine in the decay plan:\n${p.take(800)}")
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1,
      s"expected exactly the entity-key exchange:\n${p.take(800)}")
  }

  test("group overlap: element-keyed, no quadratic operator") {
    // the pair expansion must stay the in-row explode of per-element
    // group sets — a groups×groups (or element×element) join shape
    // would shuffle the vocabulary per pair
    val p = plan("q_group_overlap")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"quadratic join in the overlap plan:\n${p.take(600)}")
  }

  test("bm25 index serving: the postings scan is partition-pruned") {
    // the whole point of the persisted index: a k-term query reads at
    // most k term buckets of the manifest-pinned waves, never the full
    // posting set. Since the round-16 readWaves fix, WAVE pruning is by
    // CONSTRUCTION — the reader lists only the pinned `batch=` dirs, so
    // no batch predicate appears in the plan; the bucket key must still
    // prune as a PartitionFilter.
    val p = plan("q_bm25_indexed")
    assert(
      "PartitionFilters: \\[[^\\]]*bucket#\\d+ IN".r
        .findFirstIn(p).isDefined,
      s"postings scan not pruned on bucket:\n${p.take(1200)}")
  }

  test("hyperball: register merge is a hash aggregate with map-side " +
      "partial max") {
    // the whole design premise: hub nodes' incoming register sets must
    // collapse BEFORE the shuffle — partial_max in the aggregate — and
    // the merge must never become a sort-based aggregate over m columns
    val e = (0L until 200L).map(i => (i, (i * 7 + 3) % 200))
    val df = {
      import spark.implicits._
      graft.ext.HyperBall.estimateBalls(e.toDF("u", "v"), "u", "v",
        radius = 1)
    }
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p.contains("partial_max") || p.contains("max#"),
      s"no partial max in the register merge:\n${p.take(800)}")
    assert(!p.contains("SortAggregate"),
      s"register merge fell back to sort aggregation:\n${p.take(600)}")
  }

  test("PQ ADC serve: distance table broadcasts, per-vector sum " +
      "partial-aggregates, top-k never full-sorts") {
    // the 100 TB premise of ADC: the corpus side is touched once as
    // CODES joined to an m·k·queries broadcast table (a shuffle join
    // here would move the whole code table per query batch), the
    // (query, vid) distance sum partial-aggregates map-side, and the
    // per-query cut stays a window-limited sort, never a global one
    val p = plan("q_ann_pq")
    assert(p.contains("BroadcastHashJoin"),
      s"ADC distance-table join did not broadcast:\n${p.take(800)}")
    assert(!p.contains("CartesianProduct"), p.take(600))
    assert(p.contains("partial_sum"),
      s"no map-side combine in the ADC sum:\n${p.take(800)}")
  }

  test("IVF-PQ serve: probe selection and ADC both ride broadcast " +
      "joins with map-side combine") {
    // the composition's 100 TB premise: probe selection is a broadcast
    // centroid join over the query batch (never a driver collect of
    // queries), the per-(query, list) ADC table broadcasts into the
    // codes join, and every distance sum partial-aggregates — a
    // cartesian anywhere means a quantizer got joined wrong
    val p = plan("q_ann_ivfpq")
    assert(p.contains("BroadcastHashJoin"),
      s"IVF-PQ serve lost its broadcast joins:\n${p.take(800)}")
    assert(!p.contains("CartesianProduct"), p.take(600))
    assert(p.contains("partial_sum"),
      s"no map-side combine in the IVF-PQ sums:\n${p.take(800)}")
  }

  test("SQ8 serve: ranges and query comps broadcast, the " +
      "reconstruction sum partial-aggregates") {
    val p = plan("q_ann_sq8")
    assert(p.contains("BroadcastHashJoin"),
      s"SQ8 serve lost its broadcast joins:\n${p.take(800)}")
    assert(!p.contains("CartesianProduct"), p.take(600))
    assert(p.contains("partial_sum"),
      s"no map-side combine in the SQ8 sum:\n${p.take(800)}")
  }

  test("perceptron predict is a pure projection: zero exchanges") {
    // the operator's 100 TB promise: weights fold in as literals, so
    // inference is one narrow scan — any Exchange here means a join
    // or aggregation crept into the serving path
    val p = plan("q_perceptron_score")
    assert(!p.contains("Exchange"),
      s"perceptron predict shuffles:\n${p.take(800)}")
  }
}
