package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic uniform negative sampling — the contrastive-pair
  * generation pass for embedding/recommender training: each observed
  * (entity, item) positive gets `k` pseudo-random negative items drawn
  * uniformly from the item id domain, reproducibly (same negatives on
  * every run, any cluster, any engine — no `rand()`, no seed state; the
  * same contract as [[Splits]]).
  *
  * Mechanism: negative j of a positive is
  * `md5(entity ':' item ':' j)`'s first 8 hex chars as a uniform 32-bit
  * bucket, mapped into [1, maxItemId] by modulo. Items are assumed
  * DENSE ids 1..max (true of dimension surrogate keys; sparse domains
  * should map through a dense index first). Collisions with the row's
  * own positive are dropped rather than remapped — an expected
  * k/maxItemId fraction, uniform, and remapping would bias the
  * distribution toward successor ids.
  *
  * Shape for 100 TB: the item-domain max rides a broadcast of a
  * one-row aggregate; everything else is a per-row `explode(sequence)`
  * + codegen hash arithmetic — no shuffle of the positives, no join
  * against the item table, cost exactly k output rows per input row.
  * Modulo bias is ≤ maxItemId/2³² — negligible for any real catalog.
  */
object NegativeSampling {

  /** @param positives one row per observed (entity, item) pair
    * @param items     the item dimension; its `itemIdCol` defines the
    *                  dense 1..max sampling domain
    * @return positives exploded to k rows each: (entity, item, j, neg_item),
    *         minus self-collisions. */
  def uniformNegatives(positives: DataFrame, entityCol: String, itemCol: String,
      items: DataFrame, itemIdCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val maxId = items.agg(max(col(itemIdCol)).as("__max_item"))
    positives
      .crossJoin(broadcast(maxId))
      .select(col(entityCol), col(itemCol), col("__max_item"),
        explode(sequence(lit(0), lit(k - 1))).as("j"))
      // an empty/filtered-away item dimension yields a NULL max, which
      // would null every neg_item and SILENTLY drop all positives at the
      // collision filter — raise instead, fused INTO the value so no
      // filter reordering can bypass the check (a standalone assert row
      // filter measured exactly that: the collision filter ran first and
      // discarded the null rows before the assert ever evaluated)
      .withColumn("neg_item",
        when(col("__max_item").isNull || col("__max_item") < 1,
          raise_error(lit(
            "NegativeSampling: item dimension is empty or max id < 1"))
            .cast("long"))
          // 8-nibble (32-bit) variant of the Splits md5-bucket contract
          .otherwise(Splits.hashBucket(
            concat_ws(":", col(entityCol), col(itemCol), col("j")), nibbles = 8)
            % col("__max_item") + 1))
      .filter(col("neg_item") =!= col(itemCol))
      .drop("__max_item")
  }
}
