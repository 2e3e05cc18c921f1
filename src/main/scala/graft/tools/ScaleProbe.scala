package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-decade scale extension of the heavy query family (VERDICT r7 #4):
  * synthesizes an sf1-equivalent dataset (10× sf0.1) as TEN DISJOINT
  * SHARDS and times the five most expensive corpus queries at sf0.1 vs
  * sf1 in one JVM — the cheapest empirical check that their plans scale
  * linearly (no superlinear candidate blowup, no spill cliff) before
  * claiming they would at 100 TB.
  *
  * Shard construction keeps the WORK profile linear by design:
  *   - documents: replica k prefixes every word with `r<k>q` (k=0 kept
  *     verbatim), so shingle/ngram/minhash universes are disjoint across
  *     replicas — pair candidates, clusters, and DSIR vocabularies scale
  *     ×10, never ×100 (naively copying text would make every doc a
  *     10-way near-dup and measure a skew bomb, not scale). doc_id
  *     offsets are multiples of 10⁶ so `% 10` splits are preserved.
  *   - lineitem: order/part keys shift per replica — 10 disjoint
  *     co-purchase graphs, triangle count ×10.
  *
  * This measures the ENGINE's scaling on shard-decomposable work; skew
  * ROBUSTNESS (hot keys, dense bands) is the SkewGuard/cap tests' job,
  * not this probe's. Not part of the library surface; run manually:
  *   sbt "runMain graft.tools.ScaleProbe"           # gen (if absent) + time
  *   sbt "runMain graft.tools.ScaleProbe regen"     # force regeneration
  */
object ScaleProbe {
  private val Queries =
    Seq("q_minhash_lsh", "q_ngram_jaccard", "q_dedup_clusters_star",
      "q_dsir", "q_triangles", "q_triangles_approx",
      "q_components_adaptive", "q_dedup_incr", "q_neardup_filter",
      // r10: the sources faces — staged text round-trips and the
      // compaction swap are I/O-shaped, so their decade ratio is the
      // direct check that the landing-zone path has no file-count or
      // single-writer cliff
      "q_jsonl_scan", "q_tsv_scan", "q_corpus_export", "q_compaction",
      // r10: bloom prefilter — the probe is map-side O(fact), the
      // residual join O(sliver); the decade ratio checks both stay flat
      "q_bloom_semi", "q_bloom_anti",
      // r10: MG heavy hitters (two corpus scans, buffer-sized exchange —
      // note output ROWS shrink at sf1: the share threshold is relative,
      // so ×10 data with disjoint replica vocabularies raises the bar
      // 10× per bigram; the time is the contract, not the row count),
      // BPE train (vocab ×10 via replica prefixes, 8 rounds over the
      // histogram), BPE encode (scan-shaped replace chain)
      "q_heavy_hitters", "q_bpe_train", "q_bpe_encode",
      // r10b: BFS (10 disjoint co-purchase graphs — frontier work ×10,
      // depth unchanged), k-means (assignment is N·k — linear in N),
      // edit-distance pairs (replica-prefixed names keep the variant
      // universes disjoint: pairs ×10, never the ×55 cross-replica
      // identical-name bomb verbatim copies would measure)
      "q_bfs", "q_kmeans", "q_edit_pairs",
      // r10b: SSSP (hub-connected ×10 graph — see the suppkey upgrade
      // note), incremental CC (disjoint doc-shard pair stream, batch
      // fold-in), gram (N·dim²/2 in-row products, dim fixed → pure N)
      "q_sssp", "q_cc_incr", "q_gram",
      // r10b: walks (10 disjoint graphs, ×10 walks at fixed length),
      // MAD (two window passes + agg on one exchange, pure scan
      // growth), entity groups (dictionary-shaped: records only feed
      // the dict aggregate; replica-prefixed doc text does NOT change
      // the alias column, so the dict stays 50 rows at sf1 — the
      // rollup, not the pair stage, carries the ×10)
      "q_walks", "q_mad", "q_entity_groups",
      // r10b: walk consumers + biased walks (same ×10-disjoint-graph
      // argument; biased adds the per-step adjacency probe), lexical
      // cosine (replica-prefixed words → 10 disjoint vocabularies, so
      // posting pairs stay within-replica: ×10, never ×100)
      "q_walk_pairs", "q_biased_walks", "q_lex_cosine",
      // r10b: dict tagging (scan+window-gram shaped; replica-prefixed
      // words mean hits stay ×1 while scan work goes ×10 — the ratio
      // reads the gram-generation cost), event sequences (one window
      // sort per entity partition, ×10 disjoint users)
      "q_dict_tag", "q_event_seq",
      // r11: changepoint (×10 disjoint user series, same lengths — one
      // exchange + three windows, pure partition growth), segment dedup
      // (replica-prefixed words → disjoint block universes: blocks ×10,
      // zero cross-replica dups — the keep-first aggregate and both
      // reassembly shuffles carry the ×10), co-moments (pure scan ×10
      // into a groups×pairs-row aggregate), hyperball (10 disjoint
      // co-purchase graphs: register rows ×10 at fixed m; the exact
      // d≤2 closure twin is the cost carrier and is itself ×10 on
      // disjoint shards)
      "q_changepoint", "q_segment_dedup", "q_comoments", "q_hyperball",
      // r11b: hybrid search (retriever scans ×10, fused lists fixed at
      // 50+50 — output invariant, the scan is the carrier), chunking
      // (pure narrow map, rows ×10), weighted sampling (window on the
      // lang key — 5 strata ×10 rows each; output fixed at 125)
      "q_hybrid_search", "q_chunks", "q_weighted_sample",
      // r11c: harmonic (the d≤2 closure twin dominates, ×10 on disjoint
      // shards like hyperball), posting index build+serve (build is one
      // corpus scan into bucket-partitioned postings; serving reads 3
      // term buckets regardless of corpus size — the ratio measures the
      // BUILD), incremental append (same, split 2:1)
      "q_harmonic", "q_bm25_indexed", "q_bm25_append",
      // r11d: k-truss (10 disjoint co-purchase shards — triangles ×10;
      // per round the degree-oriented intersection is the q_triangles
      // work shape, plus a semi join on survivors)
      "q_ktruss",
      // r11e: group overlap (element-keyed: replica-prefixed words keep
      // vocabularies disjoint ACROSS replicas but each replica carries
      // all 5 langs — per-element group sets stay ≤5, distinct frame
      // ×10), truncation recall (two brute rankings over ×10 corpus
      // rows at fixed query count)
      "q_group_overlap", "q_trunc_recall",
      // r11f: decay score (scan + one hash agg, pure ×10); weighted
      // PageRank (same hub-connected ×10 bipartite graph as q_sssp —
      // denser hubs, message volume ×10 through the shared 100 buckets)
      "q_decay", "q_pagerank_weighted",
      // r12: wave-layout IVF insert face (build half, wave-append half,
      // pinned pruned probe — the sign-bucket build scan carries the
      // ×10; the probe reads one bucket regardless), image dedup
      // (render+decode+dHash scan ×10; replica-offset doc_ids keep
      // groups disjoint so pairs ×10, never ×100), CC snapshot serving
      // (two batch folds + store round-trip over ×10 disjoint pairs)
      "q_ann_ivf_append", "q_image_dedup", "q_cc_serve",
      // r12b: audio dedup (synthesize+mux+parse+hash scan ×10, same
      // disjoint-group argument as image dedup), video dedup (64-frame
      // mux + RIFF walk + per-frame JPEG decode ×10)
      "q_audio_dedup", "q_video_dedup",
      // r13: unigram-LM training (replica-prefixed words → distinct
      // histogram and candidate universes ×10; EM rounds Viterbi the
      // histogram, never the corpus), exact repeated spans + cut list
      // (windows disjoint across replicas: spans ×10, never ×100 —
      // the verbatim-copy pair bomb is exactly what the prefixes
      // exist to avoid), streaming fingerprint filter batch face +
      // unified media keep + pHash twin (md5 groups keyed by
      // (doc_id/10)/3 — replica offsets are multiples of 10⁶, so
      // group universes stay disjoint and pairs go ×10, the
      // q_image_dedup argument verbatim)
      "q_unigram_train", "q_exact_spans", "q_span_cuts",
      "q_image_neardup_filter", "q_media_dedup_keep", "q_image_phash",
      // r13b: PQ train+encode (per-subspace Lloyd's — N·m·k assignment
      // work, linear in N at fixed m·k; vectors verbatim across
      // replicas is fine, PQ has no pair expansion) and ADC serving
      // (the corpus is touched once as codes against a broadcast
      // distance table; 3 fixed queries regardless of corpus size)
      "q_pq_codes", "q_ann_pq",
      // r13c: IVF-PQ — coarse routing adds one broadcast-argmin join
      // over the ×10 corpus (linear); the serve probes 2 of 4 lists
      // whatever the corpus size, with fixed query count
      "q_ivfpq_codes", "q_ann_ivfpq",
      // r13d: the audio/video batch filter faces (decode work ×10, the
      // modality-dedup argument verbatim) and unigram encode (Viterbi
      // over the ×10-vocabulary word histogram, then a per-doc join)
      "q_audio_neardup_filter", "q_video_neardup_filter",
      "q_unigram_encode",
      // r13e: batch perceptron (8 rounds x one scan + dim+1-column
      // partial agg — pure N; the ×10 corpus changes the labels'
      // mix, not the plan shape)
      "q_perceptron_score",
      // r13f: on-disk IVF-PQ append face (train 2/3 + encode-append
      // 1/3 + pruned serve), PQ recall audit (ADC + exact brute — the
      // brute side is one corpus pass per fixed 3-query batch), SQ8
      // ranges/codes (one partial-agg + one scan — pure N) and its
      // reconstructed serve
      "q_ann_ivfpq_append", "q_pq_recall", "q_sq8_codes", "q_ann_sq8",
      // r13g: k-center coreset (k fixed corpus passes — pure N each),
      // random projection (one pass, outDims map-side blowup)
      "q_coreset", "q_random_projection",
      // r13h: delete-masked BM25 serve (build scan carries the ×10;
      // the mask is an anti join against a ×10 tombstone set)
      "q_bm25_delete",
      // r13i: tombstone-masked coded serve, two-stage refine (exact
      // re-rank bounded at queries × 30), SQ8 recall audit (one brute
      // corpus pass at fixed query count)
      "q_ann_ivfpq_delete", "q_ann_ivfpq_refine", "q_sq8_recall",
      // r13j: coreset coverage (k+1 corpus passes), threshold sweep
      // (one banded pass, ×10 disjoint-group pairs)
      "q_coreset_assign", "q_dedup_sweep",
      // r15: the two-level prefix-sum rewrite (VERDICT r14 #1) — the
      // per-language running sum no longer serializes one task per
      // language, so the decade ratio must read the SHARDED profile:
      // per-(lang, shard) subtotals ×10 rows, broadcast offsets fixed
      // at langs×shards, in-shard windows ×10. The budgets are fixed
      // token counts, so the KEPT set stays ~constant — the time is
      // pure selection-machinery scaling. q_pack rides the same
      // helper on the packing order.
      "q_token_budget", "q_pack",
      // r16: the de-serialized window family (VERDICT r15 #2) — ranks
      // and exact percentiles now come from range-sharded rank-select
      // (RankSelect), so the decade ratio must read the sharded
      // profile: boundary sketch ×10 (map-side), per-(group, shard)
      // counts ×10 rows into a fixed groups×shards offset table,
      // in-shard windows ×10 with per-task sorts capped at ~1/64 of a
      // group. The old shape put each whole group in ONE task — the
      // event_type keys span the corpus, so its decade exponent was
      // structurally 1.0-with-a-straggler; q_mad (above) rides the
      // same helper twice. q_zscore is the no-window groupBy+broadcast
      // twin.
      "q_zscore", "q_rank_norm", "q_winsorize", "q_bin_depth",
      // r16 cont.: nucleus coverage (replica-prefixed words → per-source
      // vocab ×10 under FIXED source keys — the exact corpus-spanning-
      // group shape the two-level prefix-sum rewrite de-serializes) and
      // the dedup keep policy (clusters ×10 disjoint; keeper via min_by
      // aggregate, no per-cluster sort)
      "q_top_share", "q_dedup_keep",
      // r17: FULL-CORPUS decade coverage (review r16 #2) — every
      // remaining gate query ≥0.5 s at sf0.1 in the r16 close bench.
      // These read tables the probe's own shard set never carried
      // (customer/nation/part/region and full schemas), so the sweep
      // points SPARK_GRAFT_SF1_DIR at a GateData dir, which applies
      // the same disjointness discipline to all ten tables; the probe
      // detects such a dir (nation.parquet present) and skips its own
      // generation. Families: ANN serves (fixed query count — the
      // ratio reads the build/scan side), sketch/recall audits,
      // graph metrics over the ×10 co-purchase shards, perceptron
      // training, LM/collocation rollups, SimHash/minhash capped
      // sketch pairs, the e2e curation funnel, and the event/ops
      // rollup family
      "q_alarm_dispatch", "q_ann_brute", "q_ann_ivf", "q_ann_ivf_disk",
      "q_ann_ivf_pruned", "q_ann_opq_ivfpq", "q_ann_radius",
      "q_ann_radius_probed", "q_coreset_sample", "q_countmin",
      "q_countmin_serve", "q_declared_deps", "q_dedup_clusters",
      "q_e2e_curation", "q_embed_dedup", "q_embed_isotropy",
      "q_env_join", "q_expectations", "q_funnel", "q_heavy_rollup",
      "q_image_dedup_keep", "q_kcore", "q_keywords", "q_label_prop",
      "q_lift", "q_minhash_sketch_capped", "q_ngram_lm",
      "q_ngram_sketch_capped", "q_opq_recall", "q_pagerank",
      "q_perceptron", "q_perceptron_avg", "q_perceptron_avg_score",
      "q_pmi", "q_ppr", "q_pq_recall_capacity", "q_pq_recall_tuned",
      "q_repetition", "q_semdedup", "q_session_window", "q_simhash",
      "q_simhash_pairs", "q_simhash_sketch_capped", "q_sketch_serve",
      "q_snapshot_diff", "q_span_dedup", "q_topology",
      "q_topology_stats", "q_transitions", "q_two_hop")
  private val Replicas = 10

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sf1 = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // second-decade sizing: at sf10 the 32-partition default exceeds
    // per-partition memory on the widest shuffles (the knob a real
    // cluster scales with data); override to separate partition-sizing
    // overhead from genuine plan degeneration
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // A GateData dir (detected by the dims only it carries) is already
    // a COMPLETE sf1 set under the same disjointness discipline — use
    // it as-is; the probe's own generation would clobber it with the
    // probe-table subset.
    val isGateDir = (new java.io.File(s"$sf1/nation.parquet").exists() &&
      new java.io.File(s"$sf1/customer.parquet").exists()) ||
      // a GateData SUBSET (second-decade spot sets, e.g. ×100
      // documents+lineitem) — also use as-is
      new java.io.File(s"$sf1/_GATEDATA_SUBSET").exists()
    val marker = new java.io.File(s"$sf1/_GENERATED")
    if (!isGateDir && (args.contains("regen") || !marker.exists())) {
      val docs = spark.read.parquet(s"$base/documents.parquet")
      // graph queries read (l_orderkey, l_partkey); the bloom family
      // also reads l_returnflag/l_quantity — carried verbatim
      val li = spark.read.parquet(s"$base/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_linenumber"), col("l_returnflag"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"))
      val docShards = (0 until Replicas).map { k =>
        val text = if (k == 0) col("text")
        else regexp_replace(col("text"), "(\\S+)", s"r${k}q$$1")
        docs.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"),
          text.as("text"), col("lang"), col("source"), col("n_chars"))
      }
      docShards.reduce(_ unionByName _)
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$sf1/documents.parquet")
      (0 until Replicas).map { k =>
        li.select((col("l_orderkey") + lit(k * 10000000L)).as("l_orderkey"),
          (col("l_partkey") + lit(k * 1000000L)).as("l_partkey"),
          (col("l_suppkey") + lit(k * 1000000L)).as("l_suppkey"),
          col("l_linenumber"), col("l_returnflag"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"))
      }.reduce(_ unionByName _)
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$sf1/lineitem.parquet")
      marker.getParentFile.mkdirs()
      marker.createNewFile()
      println(s"[scaleprobe] generated $sf1 (${Replicas}x $base)")
    }
    // l_suppkey joined the shard schema with the SSSP family — upgrade a
    // pre-existing sf1 dir in place (same pattern as events/orders).
    // NOTE the part-bucket hubs (100000 + l_partkey % 100) are shared
    // across replicas by construction: replica-shifted partkeys keep
    // the SAME 100 hub ids, so the sf1 bipartite graph is one
    // hub-connected graph with 10× suppliers and 10× edges — work ×10
    // through denser hubs, the realistic many-to-few join shape, not a
    // disjoint-shard idealization.
    if (!isGateDir && !args.contains("regen") &&
        new java.io.File(s"$sf1/lineitem.parquet").exists() &&
        { val cs = spark.read.parquet(s"$sf1/lineitem.parquet").columns
          // r11 added the money columns (co-moments) to the shard schema;
          // r16 added l_linenumber (q_zscore's emission slice key)
          !cs.contains("l_suppkey") || !cs.contains("l_extendedprice") ||
            !cs.contains("l_linenumber") }) {
      val li = spark.read.parquet(s"$base/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_linenumber"), col("l_returnflag"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"))
      (0 until Replicas).map { k =>
        li.select((col("l_orderkey") + lit(k * 10000000L)).as("l_orderkey"),
          (col("l_partkey") + lit(k * 1000000L)).as("l_partkey"),
          (col("l_suppkey") + lit(k * 1000000L)).as("l_suppkey"),
          col("l_linenumber"), col("l_returnflag"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"))
      }.reduce(_ unionByName _)
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$sf1/lineitem.parquet.tmp_upgrade")
      // rename-aside swap (the CorpusLayout.compactSlice discipline): a
      // crash at any point leaves a complete copy on disk — delete-then-
      // rename would leave a missing table behind a _GENERATED marker
      // that blocks self-repair
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      val live = new org.apache.hadoop.fs.Path(s"$sf1/lineitem.parquet")
      val old = new org.apache.hadoop.fs.Path(s"$sf1/lineitem.parquet.old")
      fs.delete(old, true)
      fs.rename(live, old)
      fs.rename(new org.apache.hadoop.fs.Path(s"$sf1/lineitem.parquet.tmp_upgrade"), live)
      fs.delete(old, true)
      println(s"[scaleprobe] upgraded $sf1/lineitem.parquet (+l_suppkey)")
    }
    // events added to the probe after the marker scheme shipped — generate
    // it independently so a pre-existing sf1 dir upgrades in place.
    //   - user_id/event_id shift per replica: 10 disjoint per-user chain
    //     families, identical diameters (49–86) — the adaptive-CC work
    //     profile scales ×10 in chains, not in depth, matching how a
    //     bigger real corpus adds users rather than longer sessions;
    //   - ts is kept verbatim (the per-user ORDER, not the global range,
    //     drives the succession edges).
    if (!isGateDir && (args.contains("regen") ||
        !new java.io.File(s"$sf1/events.parquet").exists())) {
      val ev = graft.model.Tables.events(spark, base)
      (0 until Replicas).map { k =>
        ev.select((col("event_id") + lit(k * 10000000L)).as("event_id"),
          col("ts"), (col("user_id") + lit(k * 1000000L)).as("user_id"),
          col("event_type"), col("value"), col("props"))
      }.reduce(_ unionByName _)
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$sf1/events.parquet")
      println(s"[scaleprobe] generated $sf1/events.parquet")
    }

    // orders joined the probe with the bloom family — shifted per
    // replica by the SAME offset as lineitem's l_orderkey, so the
    // order⋈lineitem key relationships hold shard-locally; priorities
    // kept verbatim (the urgent key-set grows ×10 like everything else)
    if (!isGateDir && (args.contains("regen") ||
        !new java.io.File(s"$sf1/orders.parquet").exists())) {
      val od = spark.read.parquet(s"$base/orders.parquet")
      (0 until Replicas).map { k =>
        od.select((col("o_orderkey") + lit(k * 10000000L)).as("o_orderkey"),
          (col("o_custkey") + lit(k * 1000000L)).as("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
          col("o_orderpriority"))
      }.reduce(_ unionByName _)
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$sf1/orders.parquet")
      println(s"[scaleprobe] generated $sf1/orders.parquet")
    }

    // embeddings joined the probe with k-means — vec_id shifts per
    // replica, vectors kept verbatim (k-means has no pair expansion, so
    // identical vectors can't skew-bomb it; assignment work is N·k).
    if (!isGateDir && (args.contains("regen") ||
        !new java.io.File(s"$sf1/embeddings.parquet").exists())) {
      val emb = spark.read.parquet(s"$base/embeddings.parquet")
      (0 until Replicas).map { k =>
        emb.select((col("vec_id") + lit(k * 1000000L)).as("vec_id"),
          col("embedding"), col("label"))
      }.reduce(_ unionByName _)
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$sf1/embeddings.parquet")
      println(s"[scaleprobe] generated $sf1/embeddings.parquet")
    }

    // supplier joined the probe with the edit-distance family — names
    // are replica-prefixed (k=0 verbatim) so the deletion-variant
    // universes stay disjoint: verbatim copies would make every name a
    // 10-way dist-0 clique (+45 pairs each) and measure a pair bomb,
    // not engine scaling. Same discipline as the document shards.
    if (!isGateDir && (args.contains("regen") ||
        !new java.io.File(s"$sf1/supplier.parquet").exists())) {
      val sup = spark.read.parquet(s"$base/supplier.parquet")
      (0 until Replicas).map { k =>
        // DOUBLED digit: single-digit prefixes (r1q/r2q) differ by one
        // char — a real dist-1 substitution pair per cross-replica name
        // twin (measured: rows ×12.7 instead of ×10). r11q vs r22q
        // differ in two chars, so replicas stay pair-disjoint.
        val nm = if (k == 0) col("s_name")
        else concat(lit(s"r$k${k}q"), col("s_name"))
        sup.select((col("s_suppkey") + lit(k * 1000000L)).as("s_suppkey"),
          nm.as("s_name"))
      }.reduce(_ unionByName _)
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$sf1/supplier.parquet")
      println(s"[scaleprobe] generated $sf1/supplier.parquet")
    }

    def run(name: String, dir: String): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      (n, (System.nanoTime() - t0) / 1e9)
    }

    // per query: warm-up at sf0.1, then min-of-3 at each SF (the PERF.md
    // adjudication standard) — rows printed so the ×10 structural
    // expectation is itself checked. SPARK_GRAFT_SCALE_QUERIES narrows
    // the list for a single-family session; SPARK_GRAFT_SF_SMALL_DIR
    // (e.g. /root/testdata/sf0.01) adds a third, smaller point so the
    // output is a two-decade CURVE with per-decade exponents
    // (alpha = log10(t_next/t_prev): 1.0 = linear, 1.5 = m^1.5, ...).
    // Small-point times are floor-dominated (session fixed costs), so
    // the 0.1→1 exponent is the load-bearing one.
    val queries = sys.env.get("SPARK_GRAFT_SCALE_QUERIES")
      .map(_.split(",").map(_.trim).toSeq).getOrElse(Queries)
    val tinyDir = sys.env.get("SPARK_GRAFT_SF_SMALL_DIR")
    queries.foreach { q =>
      run(q, base)
      val tiny = tinyDir.map(d => (1 to 3).map(_ => run(q, d)))
      val small = (1 to 3).map(_ => run(q, base))
      val large = (1 to 3).map(_ => run(q, sf1))
      val (sMin, lMin) = (small.map(_._2).min, large.map(_._2).min)
      val tinyPart = tiny.map { t =>
        val tMin = t.map(_._2).min
        f"sf0.01 $tMin%6.2f s (rows=${t.head._1})  " +
          f"a01=${math.log10(sMin / tMin)}%4.2f  "
      }.getOrElse("")
      println(f"[scaleprobe] $q%-22s $tinyPart" +
        f"sf0.1 $sMin%6.2f s (rows=${small.head._1})" +
        f"  sf1 $lMin%7.2f s (rows=${large.head._1})" +
        f"  ratio ${lMin / sMin}%5.2f x  a1=${math.log10(lMin / sMin)}%4.2f")
    }
    spark.stop()
  }
}
