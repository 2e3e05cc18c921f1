package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Range-sharded EXACT per-group ranks and order statistics — the
  * scale-out replacement for the second shape that does not survive a
  * 100× thought experiment (review r15 #2): `Window.partitionBy(group)`
  * with an ORDER or an exact `percentile` puts an ENTIRE group in one
  * task (WindowExec colocates partitions), so a corpus-spanning key —
  * `l_returnflag` has three values — serializes a third of the fact
  * table through one sort chain.
  *
  * The [[PrefixSums]] two-level discipline, generalized from the
  * hash-rank order to an ARBITRARY (numeric-leading) sort order:
  *
  *   1. per-group shard boundaries from `approx_percentile` of the
  *      LEADING order column (any monotone value-function of the
  *      leading key preserves the total order across shards; boundary
  *      quality affects only balance, never values — the output is
  *      exact regardless, so the sketch's approximation is free);
  *   2. shard = count of boundaries strictly below the value (equal
  *      values always share a shard; NULLs take shard −1, matching
  *      ASC NULLS FIRST);
  *   3. one hash-aggregate counts rows per (group, shard) — groups ×
  *      shards rows, partial-aggregated map-side;
  *   4. an ordered window over THAT TINY TABLE turns counts into
  *      exclusive rank offsets and group totals;
  *   5. a broadcast join puts offsets back and a window partitioned by
  *      (group, SHARD) adds the within-shard row_number — parallelism
  *      = groups × shards, no task ever sorts more than ~1/shards of
  *      a group (under skew, equal leading values collapse shards and
  *      degrade gracefully toward the old shape).
  *
  * Rank = shard offset + within-shard row_number is BIT-IDENTICAL to
  * the single-window row_number: the shard function is monotone in the
  * leading sort key, so shard ranges tile the total order, and BIGINT
  * addition is exact.
  *
  * [[percentiles]] builds exact INTERPOLATED percentiles (the
  * `percentile` ≡ DuckDB `quantile_cont` identity the oracle gates
  * rely on) from two selected order statistics per cut point —
  * distributed rank-select instead of a per-group in-memory sort.
  */
object RankSelect {

  /** Shared first level of the two-level discipline: appends `__shard`
    * to `df` — per-group `approx_percentile` boundaries of the LEADING
    * order column (map-side-partial agg, one small row per group),
    * broadcast back, shard = count of boundaries strictly below the
    * value. Monotone in the leading value, equal values never split,
    * NULLs take shard −1 (matching ASC NULLS FIRST); boundary quality
    * affects only balance, never values. */
  private def rangeSharded(df: DataFrame, keys: Seq[String],
      orderCols: Seq[String], shards: Int): DataFrame = {
    require(keys.nonEmpty, "need at least one group key")
    require(orderCols.nonEmpty, "need at least one order column")
    require(shards >= 1 && shards <= 4096,
      s"shards must be in [1, 4096]: $shards")
    val lead = col(orderCols.head)
    val keyCols = keys.map(col)
    val cuts = (1 until shards).map(_.toDouble / shards)
    val bounds =
      if (shards == 1)
        df.groupBy(keyCols: _*).agg(lit(null).cast("array<double>")
          .as("__bnd"))
      else {
        val cutsSql = cuts.mkString("array(", ",", ")")
        df.groupBy(keyCols: _*).agg(
          expr(s"approx_percentile(cast(`${orderCols.head}` as double), " +
            s"$cutsSql, 1000)").as("__bnd"))
      }
    val boundsR = bounds.select(
      keys.zipWithIndex.map { case (k, i) => col(k).as(s"__bk$i") } :+
        col("__bnd"): _*)
    val joinBnd = keys.indices.map(i => col(keys(i)) <=> col(s"__bk$i"))
      .reduce(_ && _)
    val leadD = lead.cast("double")
    val shard = when(lead.isNull, lit(-1L)).otherwise(
      size(filter(coalesce(col("__bnd"),
        lit(Array.empty[Double])), b => b < leadD)).cast("long"))
    df.join(broadcast(boundsR), joinBnd)
      .withColumn("__shard", shard)
      .drop((keys.indices.map(i => s"__bk$i") :+ "__bnd"): _*)
  }

  /** Appends `rankCol` (1-based BIGINT row_number under `orderCols`,
    * each ASC NULLS FIRST, within each `keys` group) and `nCol` (the
    * group's BIGINT row count) to `df`. The leading order column must
    * be numeric (it feeds the range sharding); callers needing a total
    * order must include a tie-breaking order column, exactly as with
    * a window row_number. */
  def withRankAndCount(df: DataFrame, keys: Seq[String],
      orderCols: Seq[String], rankCol: String, nCol: String,
      shards: Int = 64): DataFrame = {
    val keyCols = keys.map(col)
    val withShard = rangeSharded(df, keys, orderCols, shards)
    // 3.–4. per-(group, shard) counts → exclusive offsets + totals over
    //       the tiny subtotal table
    val counts = withShard.groupBy(keyCols :+ col("__shard"): _*)
      .agg(count(lit(1)).as("__cnt"))
    val wOff = Window.partitionBy(keyCols: _*).orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // same partition AND order as wOff so Catalyst collapses both
    // frames into one Window node over the tiny subtotal table
    val wTot = Window.partitionBy(keyCols: _*).orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__cnt")).over(wOff), lit(0L)))
      .withColumn(nCol, sum(col("__cnt")).over(wTot))
      .drop("__cnt")
    val offsetsR = offsets.select(
      keys.zipWithIndex.map { case (k, i) => col(k).as(s"__ok$i") } ++
        Seq(col("__shard").as("__oshard"), col("__off"), col(nCol)): _*)
    val joinOff = (keys.indices.map(i => col(keys(i)) <=> col(s"__ok$i")) :+
      (col("__shard") === col("__oshard"))).reduce(_ && _)
    // 5. within-shard row_number + offset = the global per-group rank
    val wIn = Window.partitionBy(keyCols :+ col("__shard"): _*)
      .orderBy(orderCols.map(c => col(c).asc_nulls_first): _*)
    withShard.join(broadcast(offsetsR), joinOff)
      .withColumn(rankCol,
        col("__off") + row_number().over(wIn).cast("long"))
      .select(df.columns.map(col) ++ Seq(col(rankCol), col(nCol)): _*)
  }

  /** Appends `sumCol` (INCLUSIVE BIGINT running sum of `valueCol`
    * under `orderCols`, each ASC NULLS FIRST, within each `keys`
    * group) and `totalCol` (the group's BIGINT `valueCol` total) to
    * `df` — the [[PrefixSums]] two-level discipline under an ARBITRARY
    * numeric-leading order instead of the hash-rank order. Same shard
    * machinery as [[withRankAndCount]]; BIT-IDENTICAL to the
    * single-window running sum (shard ranges tile the total order and
    * BIGINT addition is associative). `valueCol` must be non-null
    * BIGINT-safe; callers needing a total order must include a
    * tie-breaking order column. */
  def withPrefixSumAndTotal(df: DataFrame, keys: Seq[String],
      orderCols: Seq[String], valueCol: String, sumCol: String,
      totalCol: String, shards: Int = 64): DataFrame = {
    val keyCols = keys.map(col)
    val withShard = rangeSharded(df, keys, orderCols, shards)
    val subtotals = withShard.groupBy(keyCols :+ col("__shard"): _*)
      .agg(sum(col(valueCol).cast("long")).as("__sub"))
    val wOff = Window.partitionBy(keyCols: _*).orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(keyCols: _*).orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = subtotals
      .withColumn("__off", coalesce(sum(col("__sub")).over(wOff), lit(0L)))
      .withColumn(totalCol, sum(col("__sub")).over(wTot))
      .drop("__sub")
    val offsetsR = offsets.select(
      keys.zipWithIndex.map { case (k, i) => col(k).as(s"__ok$i") } ++
        Seq(col("__shard").as("__oshard"), col("__off"), col(totalCol)): _*)
    val joinOff = (keys.indices.map(i => col(keys(i)) <=> col(s"__ok$i")) :+
      (col("__shard") === col("__oshard"))).reduce(_ && _)
    val wIn = Window.partitionBy(keyCols :+ col("__shard"): _*)
      .orderBy(orderCols.map(c => col(c).asc_nulls_first): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withShard.join(broadcast(offsetsR), joinOff)
      .withColumn(sumCol,
        col("__off") + sum(col(valueCol).cast("long")).over(wIn))
      .select(df.columns.map(col) ++ Seq(col(sumCol), col(totalCol)): _*)
  }

  /** One row per `keys` group with the exact linear-interpolated
    * percentile of `valCol` at each cut in `ps` (UNROUNDED doubles,
    * column names `outCols`) — `percentile`'s formula replayed
    * literally over two rank-selected order statistics per cut:
    * pos = p·(n−1); floor(pos) = ceil(pos) → v[pos], else
    * (v[ceil] − v[floor])·(pos − floor) + v[floor], NULLs excluded,
    * values read as doubles. Groups with zero non-null values emit no
    * row (callers LEFT-join and inherit `percentile`'s NULL). */
  def percentiles(df: DataFrame, keys: Seq[String], valCol: String,
      ps: Seq[Double], outCols: Seq[String],
      shards: Int = 64): DataFrame = {
    require(ps.nonEmpty && ps.size == outCols.size,
      "need one output column per percentile cut")
    require(ps.forall(p => p >= 0.0 && p <= 1.0), s"cuts must be in [0,1]: $ps")
    val ranked = withRankAndCount(
      df.filter(col(valCol).isNotNull)
        .select(keys.map(col) :+ col(valCol).cast("double").as("__v"): _*),
      keys, Seq("__v"), "__rk", "__gn", shards)
    val r0 = (col("__rk") - lit(1L)).cast("double")
    val pos = ps.map(p => lit(p) * (col("__gn") - lit(1L)).cast("double"))
    val wanted = pos.flatMap(pe => Seq(r0 === floor(pe), r0 === ceil(pe)))
      .reduce(_ || _)
    val aggs = ps.indices.flatMap { i =>
      Seq(max(when(r0 === floor(pos(i)), col("__v"))).as(s"__lo$i"),
        max(when(r0 === ceil(pos(i)), col("__v"))).as(s"__hi$i"),
        max(pos(i)).as(s"__p$i"))
    }
    val cells = ranked.filter(wanted)
      .groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val outs = ps.indices.map { i =>
      val p = col(s"__p$i")
      when(p === floor(p), col(s"__lo$i"))
        .otherwise((col(s"__hi$i") - col(s"__lo$i")) * (p - floor(p)) +
          col(s"__lo$i"))
        .as(outCols(i))
    }
    cells.select(keys.map(col) ++ outs: _*)
  }

  /** LEFT broadcast join of a one-row-per-group stats table back onto
    * `df`, NULL-SAFE on the group keys (a window's partitionBy treats
    * NULL as its own group; a plain equi-join would drop those rows).
    * `stats` must be exactly (keys…, extras…); the extras land
    * appended to `df`'s columns. */
  private[ext] def joinBack(df: DataFrame, stats: DataFrame,
      keys: Seq[String]): DataFrame = {
    val extras = stats.columns.filterNot(keys.contains)
    val renamed = stats.select(
      keys.zipWithIndex.map { case (k, i) => col(k).as(s"__jk$i") } ++
        extras.map(col): _*)
    val cond = keys.indices.map(i => col(keys(i)) <=> col(s"__jk$i"))
      .reduce(_ && _)
    df.join(broadcast(renamed), cond, "left_outer")
      .select(df.columns.map(col) ++ extras.map(col): _*)
  }
}
