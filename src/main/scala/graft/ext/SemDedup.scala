package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication (the SemDeDup recipe, Abbas et al. 2023):
  * cluster embeddings into candidate neighborhoods, connect members
  * whose EXACT cosine clears the threshold, and keep one representative
  * per connected duplicate group — the embedding-space analogue of the
  * MinHash keep-policy pipeline, for paraphrase-level duplicates that
  * share no surface n-grams.
  *
  * Composition of the engine's existing scale-safe parts — nothing new
  * has to pair up globally:
  *   - candidate pairs come from [[Dedup.embeddingCosinePairs]]
  *     (sign-LSH buckets + exact DecimalDot verify, opt-in hot-bucket
  *     cap) — never an all-pairs expansion;
  *   - duplicate groups are [[Components.connectedAdaptive]] over those
  *     pairs (distributed min-label / star contraction, O(log N)
  *     rounds, no driver graph state);
  *   - the keeper IS the component label (the group's minimum id), so
  *     the keep decision costs zero extra joins and is deterministic by
  *     construction.
  *
  * Returns the DROP LIST: one row per non-keeper, (idCol, kept_id) —
  * the subtraction shape a curation pipeline anti-joins against the
  * corpus. Singletons (nothing above threshold) never appear.
  */
object SemDedup {

  def dropList(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bucketBits: Int = 8,
      maxBucketDF: Option[Long] = None): DataFrame = {
    val pairs = Dedup.embeddingCosinePairs(emb, idCol, vecCol,
      threshold, bucketBits, maxBucketDF)
      .select(col("doc_a"), col("doc_b"))
    Components.connectedAdaptive(pairs, "doc_a", "doc_b")
      .filter(col("node") =!= col("component"))
      .select(col("node").as(idCol), col("component").as("kept_id"))
  }
}
