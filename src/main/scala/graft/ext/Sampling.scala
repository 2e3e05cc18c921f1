package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and corpus mixing for training pipelines — the
  * "data recipe" operators: per-stratum downsampling and fractional
  * up/down-sampling by repeat factor. Everything hashes the row id (same
  * md5-bucket scheme as [[Splits]]) instead of drawing `rand()`: the same
  * row is kept / repeated identically on every run, any cluster, any
  * engine — reproducible recipes are a hard requirement when a 100 TB mix
  * must be regenerable byte-for-byte.
  *
  * All pure codegen column arithmetic; `stratified` is a narrow filter
  * over the scan (predicate-pushdown friendly), `upsample` a narrow
  * explode — nothing shuffles.
  */
object Sampling {

  /** Keep each row with its stratum's probability, decided by the id's
    * uniform [0, 65536) md5 bucket: kept ⇔ bucket < floor(rate·65536).
    * Strata absent from `rates` keep `defaultRate`. */
  def stratified(df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    require((rates.values.toSeq :+ defaultRate).forall(r => r >= 0 && r <= 1),
      "rates must be in [0, 1]")
    val bucket = Splits.hashBucket(col(idCol))
    val bound = rates.toSeq.sortBy(_._1)
      .foldRight(lit(math.floor(defaultRate * 65536).toLong)) {
        case ((stratum, r), elseCol) =>
          when(col(stratumCol) === stratum,
            lit(math.floor(r * 65536).toLong)).otherwise(elseCol)
      }
    df.filter(bucket < bound)
  }

  /** Fractional repeat factors: a factor of 2.3 emits every row twice and
    * a deterministic 30% of rows (by id bucket) a third time; a factor of
    * 0.25 keeps a quarter of rows once — one operator covers both up- and
    * down-sampling of a mixture component. Output adds `copy_idx`
    * (0-based) so downstream shuffles can spread the copies. */
  def upsample(df: DataFrame, idCol: String, classCol: String,
      factors: Map[String, Double], defaultFactor: Double = 1.0): DataFrame = {
    require((factors.values.toSeq :+ defaultFactor).forall(_ >= 0),
      "factors must be non-negative")
    def copies(f: Double): (Long, Long) = // (whole copies, frac bound)
      (math.floor(f).toLong, math.floor((f - math.floor(f)) * 65536).toLong)
    val bucket = Splits.hashBucket(col(idCol))
    val (dWhole, dFrac) = copies(defaultFactor)
    val nCopies = factors.toSeq.sortBy(_._1)
      .foldRight(lit(dWhole) + when(bucket < dFrac, 1L).otherwise(0L)) {
        case ((cls, f), elseCol) =>
          val (wh, fr) = copies(f)
          when(col(classCol) === cls,
            lit(wh) + when(bucket < fr, 1L).otherwise(0L)).otherwise(elseCol)
      }
    df.withColumn("__n", nCopies)
      .filter(col("__n") >= 1)
      .withColumn("copy_idx", explode(expr("sequence(0, __n - 1)")))
      .drop("__n")
  }

  /** Token-BUDGET mixture selection — the pretraining "data recipe"
    * stated the way recipes are actually written: so many tokens of each
    * domain, not so many documents or such-and-such a rate. Each domain
    * keeps its documents in deterministic hash-rank order (32-bit id
    * md5, id tie-break — same total order as [[fixedSizePerGroup]])
    * until the domain's token budget is exhausted: a document is kept
    * iff the tokens consumed BEFORE it are still under budget, so the
    * selection may overshoot by part of the last document (the standard
    * greedy-prefix rule; trim in-document if exact budgets matter).
    * Domains absent from `budgets` get `defaultBudget` (0 = excluded).
    *
    * Shape: [[PrefixSums.hashOrderedExclusiveSum]] — two-level exact
    * prefix sums (per-shard subtotals → exclusive shard offsets over
    * the tiny subtotal table → within-(domain, shard) window), so the
    * dominant domain of a 100 TB corpus never serializes through one
    * task's sort; bit-identical to the single-window form. Adds
    * `tokens_before`. Budgets larger than a domain's total keep the
    * whole domain — under-supplied domains surface by comparing
    * `tokens_before + tokens` of their last kept row to the budget. */
  def tokenBudget(df: DataFrame, domainCol: String, idCol: String,
      tokenCol: String, budgets: Map[String, Long],
      defaultBudget: Long = 0L, shards: Int = 64): DataFrame = {
    require(budgets.values.forall(_ >= 0) && defaultBudget >= 0,
      "budgets must be non-negative")
    val budget = budgets.toSeq.sortBy(_._1)
      .foldRight(lit(defaultBudget): Column) { case ((d, b), elseCol) =>
        when(col(domainCol) === d, lit(b)).otherwise(elseCol)
      }
    PrefixSums.hashOrderedExclusiveSum(df, Seq(domainCol), idCol,
        tokenCol, tieCols = Nil, outCol = "tokens_before", shards = shards)
      .filter(col("tokens_before") < budget)
  }

  /** EXACTLY-n-per-group sampling (fixed-size eval sets, per-domain
    * probes): rank rows inside each group by their 32-bit id hash (id as
    * the tie-break — a total order, so the selection is deterministic)
    * and keep rank ≤ n. Unlike [[stratified]]'s per-row coin flip this
    * guarantees the exact count (or the whole group when smaller), at
    * the cost of one ordered window shuffle on the group key — the
    * rate-vs-exactness trade both shapes exist for. Adds `rk`. */
  def fixedSizePerGroup(df: DataFrame, keys: Seq[String], idCol: String,
      n: Int): DataFrame = {
    require(n >= 1, "n must be >= 1")
    require(keys.nonEmpty, "need at least one group key")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(Splits.hashBucket(col(idCol), nibbles = 8), col(idCol))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= n)
  }

  /** WEIGHTED exactly-n-per-group sampling without replacement —
    * Efraimidis–Spirakis A-ES with the repo's deterministic coin: each
    * row draws u = (hash32(id)+1)/2³² ∈ (0,1] and ranks by
    * ln(u)/weight descending (equivalent to the classical u^(1/w) key;
    * larger weights pull the key toward 0), so inclusion probability
    * is weight-proportional while the draw stays an exact pure
    * function of the ids — seedless, replayable, SQL-mirrorable.
    * The quality-weighted / length-weighted corpus draw where
    * [[fixedSizePerGroup]] is the uniform one.
    *
    * Rows with weight ≤ 0 are dropped (zero mass — never sampled;
    * negative is a caller bug surfaced as absence, documented here).
    * The rank key is rounded to 10 dp before ordering (id tiebreak) —
    * the q_keywords ulp-parity discipline for `ln`. That rounding is
    * ABSOLUTE, so weight MAGNITUDE is a precondition: |ln(u)/w| spans
    * (0, 22.2/w], and at w ≳ 10⁶ the 10⁻¹⁰ grid starts collapsing
    * distinct keys into ties decided by id order (at w ≳ 4·10¹¹ every
    * key rounds to 0 and the draw degenerates to lowest-id). Keep
    * weights ≲ 10⁶ — rescale upstream (weights are scale-free: only
    * ratios matter to A-ES, so dividing a group by its max preserves
    * the distribution exactly).
    *
    * Shape: one ordered window shuffle on the group key, same as the
    * uniform variant. Adds `rk`. */
  def weightedFixedSize(df: DataFrame, keys: Seq[String], idCol: String,
      weightCol: String, n: Int): DataFrame = {
    require(n >= 1, "n must be >= 1")
    require(keys.nonEmpty, "need at least one group key")
    val u = (Splits.hashBucket(col(idCol), nibbles = 8) + lit(1)) /
      lit(4294967296.0)
    val key = round(log(u) / col(weightCol).cast("double"), 10)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(key.desc, col(idCol).asc)
    df.filter(col(weightCol) > 0)
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= n)
  }
}
