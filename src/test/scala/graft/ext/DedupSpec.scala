package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
  private val docs = Seq(
    (1L, base),
    (2L, base),                                   // exact dup of 1
    (3L, base.replace("gamma", "GAMMA  ")),       // normalized dup of 1
    (4L, base.replace("kappa", "changed")),       // near dup
    (5L, "totally different words entirely here now today yes ok fine")
  ).toDF("doc_id", "text")

  test("exact dedup groups normalized duplicates, keeps min id") {
    val out = Dedup.exact(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_copies"))
      .toMap
    assert(out(1L) == 3L) // 1, 2, 3 share a fingerprint
    assert(out(4L) == 1L)
    assert(out(5L) == 1L)
  }

  test("ngram jaccard finds the near-dup pair and not the unrelated doc") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 4L)) || pairs.contains((2L, 4L)))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("maxShingleDF cap drops ubiquitous shingles") {
    // a shingle present in all docs is dropped at cap=2 → fewer candidates
    val all = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.01).count()
    val capped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.01,
      maxShingleDF = Some(1)).count()
    assert(capped < all)
  }

  test("hot-key caps drop identical-doc floods from all three LSH families") {
    // 6 byte-identical docs (the flood) + one legit near-dup pair: the
    // caps remove the flood's quadratic candidates, keep the distinct pair
    val flood = (10L to 15L).map(i => (i, base))
    val withFlood = (flood :+ (16L, base.replace("kappa", "changed") + " x"))
      .toDF("doc_id", "text")

    val mhAll = Dedup.minhashLshPairs(withFlood, "doc_id", "text",
      threshold = 0.5).count()
    val mhCap = Dedup.minhashLshPairs(withFlood, "doc_id", "text",
      threshold = 0.5, maxBandDF = Some(3))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(mhAll >= 15) // at least the C(6,2) flood pairs
    assert(mhCap.forall { case (a, b) => a == 16L || b == 16L },
      s"flood pairs survived the cap: $mhCap")

    val shCap = Dedup.simhashPairs(withFlood, "doc_id", "text",
      maxHamming = 10, maxChunkDF = Some(3))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(shCap.forall { case (a, b) => a == 16L || b == 16L }, shCap.toString)

    val vecs = ((10L to 15L).map(i => (i, Array(1.0f, 1.0f, 1.0f))) :+
      (16L, Array(1.0f, 0.9f, 1.0f)) :+ (17L, Array(0.9f, 1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val ecCap = Dedup.embeddingCosinePairs(vecs, "vec_id", "embedding",
      threshold = 0.5, bucketBits = 2, maxBucketDF = Some(3)).count()
    assert(ecCap == 0) // all 8 vectors share the all-positive sign bucket
    val ecAll = Dedup.embeddingCosinePairs(vecs, "vec_id", "embedding",
      threshold = 0.5, bucketBits = 2).count()
    assert(ecAll == 28) // C(8,2) — everything pairs without the cap
  }

  test("prefix/size/positional filters are lossless vs brute-force jaccard") {
    // adversarial corpus: small vocabulary forces heavy shingle sharing,
    // so the filters do real pruning work; brute force is ground truth
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val corpus = (1L to 40L).map { i =>
      val n = 5 + rnd.nextInt(15)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    def shingleSet(t: String): Set[String] =
      t.split("\\s+").sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    for (threshold <- Seq(0.3, 0.5, 0.8)) {
      val expected = (for {
        (i, ti) <- corpus; (j, tj) <- corpus if i < j
        si = shingleSet(ti); sj = shingleSet(tj)
        inter = (si & sj).size
        jac = inter.toDouble / (si.size + sj.size - inter)
        if jac >= threshold
      } yield (i, j)).toSet
      val got = Dedup.ngramJaccardPairs(corpus.toDF("doc_id", "text"),
          "doc_id", "text", 3, threshold)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(got == expected, s"threshold $threshold")
    }
  }

  test("broadcast-candidates variants match the default shuffle joins") {
    // the flag only changes join strategy on the verification joins —
    // both pair generators must produce identical rows either way
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val jacShuffle = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
    val jacBcast = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5,
      broadcastCandidates = true)
    assert(rows(jacBcast) == rows(jacShuffle) && rows(jacShuffle).nonEmpty)
    val mhShuffle = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleN = 3, numHashes = 12, bandSize = 4, threshold = 0.5)
    val mhBcast = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleN = 3, numHashes = 12, bandSize = 4, threshold = 0.5,
      broadcastCandidates = true)
    assert(rows(mhBcast) == rows(mhShuffle) && rows(mhShuffle).nonEmpty)
  }

  test("incremental LSH ≡ full recompute restricted to batch-touching pairs") {
    // corpus = docs 1,2,5; batch = docs 3,4 — the incremental path must
    // find exactly the full-recompute pairs with at least one batch doc,
    // from the INDEX frames alone (no text column in scope)
    val corpusIdx = Dedup.minhashIndex(
      docs.filter($"doc_id".isin(1L, 2L, 5L)), "doc_id", "text", 3, 12)
    val batchIdx = Dedup.minhashIndex(
      docs.filter($"doc_id".isin(3L, 4L)), "doc_id", "text", 3, 12)
    val incr = Dedup.minhashLshPairsIncremental(corpusIdx, batchIdx,
      "doc_id", bandSize = 4, threshold = 0.5)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val fullAll = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleN = 3, numHashes = 12, bandSize = 4, threshold = 0.5)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val full = fullAll.filter { case (a, b, _) =>
      Set(3L, 4L)(a) || Set(3L, 4L)(b) }
    assert(incr == full && incr.nonEmpty, s"incr=$incr full=$full")
    // and no corpus-corpus pair leaks through
    assert(incr.forall { case (a, b, _) => Set(3L, 4L)(a) || Set(3L, 4L)(b) })
  }

  test("incremental LSH rejects mismatched signature families loudly") {
    // a 12-hash corpus banded against a 16-hash batch would produce
    // disjoint band signatures and a silently near-empty pair set
    val corpusIdx = Dedup.minhashIndex(
      docs.filter($"doc_id".isin(1L, 2L, 5L)), "doc_id", "text", 3, 12)
    val batchIdx = Dedup.minhashIndex(
      docs.filter($"doc_id".isin(3L, 4L)), "doc_id", "text", 3, 16)
    val e = intercept[IllegalArgumentException] {
      Dedup.minhashLshPairsIncremental(corpusIdx, batchIdx,
        "doc_id", bandSize = 4, threshold = 0.5)
    }
    assert(e.getMessage.contains("signature family"))
  }

  test("minhash LSH recovers high-jaccard pairs with exact verification") {
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleN = 3, numHashes = 12, bandSize = 4, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(lsh.contains((1L, 2L))) // identical shingle sets always collide
    val brute = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(brute)) // LSH+verify never yields false positives
  }

  test("simhash: identical docs share fingerprints, near-dups are close") {
    val fp = Dedup.simhash(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(fp(1L), fp(4L)) < hamming(fp(1L), fp(5L)))
  }

  test("simhashPairs: identical docs pair at hamming 0; unrelated doc absent") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Int]("hamming")).toMap
    assert(pairs.get((1L, 2L)).contains(0))
    assert(pairs.get((1L, 3L)).contains(0)) // normalization-equal
    assert(!pairs.keySet.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("null / empty / whitespace-only text neither crashes nor pairs") {
    val degenerate = Seq(
      (1L, Option("alpha beta gamma delta epsilon")),
      (2L, Option("alpha beta gamma delta epsilon")),
      (3L, Option("")),
      (4L, Option("   \t  ")),
      (5L, None)
    ).toDF("doc_id", "text")
    val jac = Dedup.ngramJaccardPairs(degenerate, "doc_id", "text",
      n = 3, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(jac == Set((1L, 2L))) // degenerate docs produce no shingles
    val mh = Dedup.minhashLshPairs(degenerate, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(mh == Set((1L, 2L)))
  }

  test("embedding cosine pairs: identical vectors found in-bucket") {
    val vecs = Seq(
      (1L, Array(1f, 2f, 3f, 4f)),
      (2L, Array(1f, 2f, 3f, 4f)),
      (3L, Array(-1f, -2f, -3f, -4f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingCosinePairs(vecs, "vec_id", "embedding",
      threshold = 0.99, bucketBits = 4)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L))) // 3 is anti-parallel AND other bucket
  }
}
