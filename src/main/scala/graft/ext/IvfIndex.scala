package graft.ext

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the scale path when
  * sign-LSH buckets are too coarse: a coarse k-means quantizer assigns
  * every corpus vector to its nearest centroid list; a query probes only
  * the `nProbe` nearest lists.
  *
  * Index build and search are SEPARATE phases — `build` fits the
  * quantizer and assigns the corpus exactly once; `search` reuses the
  * resulting [[IvfModel]] for any number of probe batches. At 100 TB the
  * built index is persisted in the `lists/batch=<wave>/list_id=<n>/`
  * WAVE layout ([[IvfModel.save]] = wave 0, [[appendSave]]/[[graft
  * .streaming.VectorIndexStream]] = later waves via dynamic partition
  * overwrite — crash/replay-idempotent, the [[PostingIndex]]
  * discipline), making a probe a partition-pruned scan — exactly the
  * on-disk IVF layout of a vector DB. [[load]] pins a [[graft.model
  * .WaveManifest]] snapshot, so serving during ingest never mixes
  * waves. Refitting the quantizer at query time would be a full ML job
  * per probe batch; the API makes that impossible.
  *
  * Results are rows-only-checkable (k-means has no SQL oracle);
  * correctness is gated by the recall-vs-brute-force spec.
  */
object IvfIndex {

  /** A built IVF index: per-row list assignment (with precomputed L2
    * norms, ready to join) plus the centroid table (tiny — lives on the
    * driver, used to pick probe lists without touching the corpus). */
  final case class IvfModel(
      assigned: DataFrame, // columns: neighbor_id, cv (vector), cn (norm), list_id
      centroids: Array[(Int, Array[Double])]) {

    /** Persist the index in the partition-pruned wave layout: corpus
      * rows under `lists/batch=0/list_id=<n>/` (a STATIC overwrite —
      * any previous index at `path`, all waves, is replaced) + a tiny
      * centroids table, then a [[graft.model.WaveManifest]] commit
      * re-pinning the manifest to exactly {0}. A later `search`
      * against the loaded index scans only the probed lists of the
      * pinned waves. */
    def save(path: String): Unit = {
      val spark = assigned.sparkSession
      import spark.implicits._
      // disjoint-path writes overlapped (ConcurrentJobs wave-fan);
      // the manifest commit still strictly FOLLOWS all data
      graft.model.ConcurrentJobs.awaitAll(
        () => writeListsWave(assigned, path, wave = 0L, dynamic = false),
        () => centroids.toSeq.map { case (i, c) => (i, c) }
          .toDF("list_id", "centroid")
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$path/centroids"))
      // Some(-1): a rebuild resets compaction coverage
      graft.model.WaveManifest.commit(spark, path, Seq(0L),
        through = Some(-1L))
      ()
    }
  }

  /** Load a previously-saved index as a PINNED SNAPSHOT: the manifest
    * pointer is resolved HERE (driver-side, once), and `assigned`
    * filters its partitioned scan to the pinned wave set — so waves
    * appended after the load are invisible to every search against
    * this model (never a mixed read), and probing n lists still reads
    * n list partitions, never the full corpus. `version` pins an
    * older manifest (time travel); an index with no manifest (legacy
    * layout) scans everything, the quiesced-index posture. */
  def load(spark: SparkSession, path: String,
           version: Option[Long] = None): IvfModel = {
    import spark.implicits._
    val cents = spark.read.parquet(s"$path/centroids")
      .select(col("list_id").cast("int"), col("centroid"))
      .as[(Int, Array[Double])].collect()
    val waves = version
      .map(v => graft.model.WaveManifest.wavesAt(spark, path, v))
      .orElse(graft.model.WaveManifest.pinned(spark, path))
    // explicit pinned dirs, never a table-root scan: partition
    // discovery on the root races a superseded compactor's orphan
    // delete (WaveManifest.readWaves doc — the round-16 fix)
    val lists = (waves match {
      case Some(ws) =>
        graft.model.WaveManifest.readWaves(spark, path, "lists", ws)
      case None => spark.read.parquet(s"$path/lists")
    }).drop("batch")
    // pinned tombstone waves (deleteSave) mask their ids — a handle
    // pinned BEFORE a delete keeps serving them (snapshot semantics,
    // both directions; the IvfPq contract). No forced broadcast: the
    // mask is unbounded over an index's lifetime, AQE broadcasts
    // while small and compact() clears it to zero.
    val masked = graft.model.WaveManifest
      .sideTableWaves(spark, path, "tombs", waves)
      .map(_.drop("batch")) match {
      case Some(t) => lists.join(t.select(col("vid").as("__tvid"))
          .distinct(), col("neighbor_id") === col("__tvid"), "left_anti")
      case None => lists
    }
    IvfModel(masked, cents)
  }

  /** Tombstone delete: the [[IvfPq.deleteSave]] contract on the dense
    * index — ids land as their own `tombs/batch=<wave>` wave (same
    * guards and replay idempotence as [[appendSave]]); pinned
    * tombstones mask every serve that pins them; [[compact]]
    * physically removes masked rows and clears the tombstones;
    * re-inserting a deleted id stays masked until that compaction. */
  def deleteSave(path: String, ids: DataFrame, idCol: String,
      wave: Long): Unit = {
    require(wave != 0L, "wave 0 is the build wave; delete with a new id")
    require(wave < graft.model.WaveManifest.CompactBase,
      s"wave $wave is in the compaction id space (>= 2^60)")
    val spark = ids.sparkSession
    val through = graft.model.WaveManifest.compactedThrough(spark, path)
    require(wave > through,
      s"wave $wave is at or below the compaction watermark $through — " +
        "a compaction absorbed that id; delete with a fresh id")
    ids.select(col(idCol).cast("long").as("vid"))
      .withColumn("batch", lit(wave))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch")
      .parquet(s"$path/tombs")
    graft.model.WaveManifest.commitWave(spark, path, wave)
  }

  /** Build the index: fit the coarse quantizer ONCE over the corpus and
    * assign every row its nearest list. One KMeans job + one transform.
    *
    * Quantizer defaults are tuned for a COARSE quantizer, where cluster
    * quality only shifts list boundaries (recall is recovered by nProbe):
    * random init + 10 iterations, the standard IVF practice — k-means||
    * init alone costs more driver-coordinated passes than the whole
    * random-init fit (measured ~2× build time at sf0.1), for boundary
    * quality ANN doesn't need. Callers clustering for ANALYSIS (not
    * indexing) can raise `maxIter` / set `initMode = "k-means||"`. */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      nLists: Int, seed: Long = 42L, maxIter: Int = 10,
      initMode: String = "random"): IvfModel = {
    val vecs = corpus.withColumn("__features",
      array_to_vector(col(vecCol).cast("array<double>")))
    val model = new KMeans().setK(nLists).setSeed(seed)
      .setMaxIter(maxIter).setInitMode(initMode)
      .setFeaturesCol("__features").setPredictionCol("__list")
      .fit(vecs)
    val assigned = model.transform(vecs)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        col("__list").as("list_id"))
      .withColumn("cn", sqrt(Similarity.dot(col("cv"), col("cv"))))
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }
    IvfModel(assigned, centroids)
  }

  /** Deterministic sign-pattern coarse quantizer: list = the `bits`-bit
    * sign bucket of the vector's leading dims ([[Similarity.signBucket]]),
    * centroids = the matching ±1 sign patterns over those dims. All
    * 2^bits centroids share one L2 norm, so the centroid nearest to any
    * query (max dot = agree with every sign) is the query's OWN bucket —
    * `search` with nProbe = 1 is then exactly same-bucket brute force,
    * which IS SQL-expressible. That gives the partition-pruned on-disk
    * serving path (save → load → probe a strict subset of list
    * partitions) a hash-exact DuckDB oracle (`q_ann_ivf_pruned`), where
    * the k-means quantizer's pruned probe has no deterministic floor.
    * A dim equal to exactly 0 ties the two centroids differing in that
    * bit; the stable sort keeps the lower list id, which is the bucket
    * the `> 0` sign test assigns — the tie resolves consistently. */
  def buildSign(corpus: DataFrame, idCol: String, vecCol: String,
      bits: Int): IvfModel = {
    val assigned = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        Similarity.signBucket(col(vecCol), bits).cast("int").as("list_id"))
      .withColumn("cn", sqrt(Similarity.dot(col("cv"), col("cv"))))
    val centroids = Array.tabulate(1 << bits) { b =>
      (b, Array.tabulate(bits)(j => if (((b >> j) & 1) == 1) 1.0 else -1.0))
    }
    IvfModel(assigned, centroids)
  }

  /** Assign NEW vectors to an EXISTING model's lists WITHOUT refitting
    * the quantizer — the index INSERT path. Each new row scores against
    * the (tiny, broadcast) centroid table and keeps its minimum-distance
    * list, ties broken by the lowest list id — the same rule as
    * `search`'s driver-side probe selection, so an appended row lands in
    * exactly the list a probe for it will scan. For a [[buildSign]]
    * model this reproduces the sign bucket bit-for-bit (equal-norm
    * centroids: argmin distance = matching sign pattern; an exact-zero
    * dim ties toward the lower id, which is what the `> 0` test assigns).
    * Row blowup is bounded by the centroid count — the same budget every
    * probe pays. Returns the newly assigned rows in the index layout
    * (`neighbor_id, cv, list_id, cn`); persist with [[appendSave]] or
    * union into the in-memory model with [[append]].
    */
  def assignTo(model: IvfModel, newRows: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val spark = newRows.sparkSession
    import spark.implicits._
    val cents = model.centroids.toSeq.toDF("list_id", "centroid")
    // NaN components get the same 1e6 stand-in `search`'s probe selection
    // applies: DecimalDot would return null for a NaN operand, making
    // every centroid distance null and the row_number tie-break assign
    // list 0 — while signBucket's `> 0` (Spark NaN-is-greatest) and the
    // search-side guard both pick the bit-SET bucket. Without this, a
    // NaN vector appended via assignTo would land in a list no probe for
    // it scans.
    val qsRaw =
      slice(col("cv").cast("array<double>"), lit(1), size(col("centroid")))
    val qs = transform(qsRaw,
      x => when(isnan(x), lit(1e6)).otherwise(x))
    // d = |q|² − 2q·c + |c|² over the centroid's dims (zip-truncated,
    // like the probe selection); each dot is the exact decimal fold, so
    // ties are exact, not float-accumulation artifacts
    val d = Similarity.dot(qs, qs) -
      lit(2.0) * Similarity.dot(qs, col("centroid")) +
      Similarity.dot(col("centroid"), col("centroid"))
    val w = Window.partitionBy(col("neighbor_id"))
      .orderBy(col("d"), col("list_id"))
    newRows
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .crossJoin(broadcast(cents))
      .withColumn("d", d)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("neighbor_id"), col("cv"),
        col("list_id").cast("int").as("list_id"))
      .withColumn("cn", sqrt(Similarity.dot(col("cv"), col("cv"))))
      .select(col("neighbor_id"), col("cv"), col("cn"), col("list_id"))
  }

  /** In-memory insert: the existing model plus newly assigned rows. */
  def append(model: IvfModel, newRows: DataFrame, idCol: String,
      vecCol: String): IvfModel =
    IvfModel(
      model.assigned.unionByName(
        assignTo(model, newRows, idCol, vecCol), allowMissingColumns = false),
      model.centroids)

  /** On-disk insert: land assigned rows (from [[assignTo]]) as their
    * own `batch=<wave>` partition wave in an existing saved layout —
    * the [[PostingIndex.append]] discipline, replacing the blind
    * mode-append this face shipped with (review r11: a crashed or
    * replayed append double-wrote rows, and duplicated neighbors
    * corrupt top-k). Re-running the SAME wave id dynamically
    * OVERWRITES that wave's partitions instead of doubling them —
    * crash/replay-idempotent; existing waves and the centroid table
    * are untouched. The manifest commit lands AFTER the data (and is
    * skipped when the wave is already pinned), so a model [[load]]ed
    * before the append keeps serving the pre-append snapshot. */
  def appendSave(path: String, assignedRows: DataFrame, wave: Long): Unit = {
    require(wave != 0L, "wave 0 is the build wave; append with a new id")
    require(wave < graft.model.WaveManifest.CompactBase,
      s"wave $wave is in the compaction id space (>= 2^60) — append " +
        "waves must stay below WaveManifest.CompactBase")
    // below the compaction watermark = absorbed id: commitWave would
    // skip it (replay protection) and the rows would silently vanish
    // from serving — refuse loudly on the batch face
    val through = graft.model.WaveManifest
      .compactedThrough(assignedRows.sparkSession, path)
    require(wave > through,
      s"wave $wave is at or below the compaction watermark $through — " +
        "a compaction absorbed that id; append with a fresh id")
    writeListsWave(assignedRows, path, wave, dynamic = true)
    graft.model.WaveManifest.commitWave(assignedRows.sparkSession, path, wave)
  }

  /** Compact the PINNED wave set into ONE new wave and re-pin the
    * manifest — the [[PostingIndex.compact]] lifecycle for
    * the dense index: N micro-batch waves × list dirs of small files
    * collapse to one wave. A pure row rewrite (vector rows are disjoint
    * across waves — the append precondition), so search over the
    * compacted index is bit-identical (spec-pinned). Data first,
    * manifest after; old waves remain for pinned readers until
    * [[graft.model.WaveManifest.expire]]. Appends may race this
    * compaction (CAS-retried commit keeps their waves —
    * WaveRaceSpec); compactions must not race each other (shared
    * rewrite target wave id).
    * @return the new wave id */
  def compact(spark: SparkSession, path: String): Long =
    // unique claimed rewrite id + CAS'd commit + superseded-loser retry
    // (WaveManifest.runCompaction): appends racing this compaction keep
    // their waves; compactions racing each other stay correct too
    graft.model.WaveManifest.runCompaction(spark, path,
        Seq("lists")) { (waves, newWave) =>
      // materialized BEFORE the write (the rewrite scans the path it
      // overwrites; Spark refuses the lazy form). Tombstoned rows are
      // PHYSICALLY removed here and the mask resets to empty.
      // Explicit pinned dirs (readWaves): a racing loser's orphan
      // delete must not crash this rewrite's partition discovery.
      val live = graft.model.WaveManifest
        .readWaves(spark, path, "lists", waves).drop("batch")
      val rows = (graft.model.WaveManifest
          .sideTableWaves(spark, path, "tombs", Some(waves)) match {
        case Some(t) =>
          val tv = t.select(col("vid").as("__tvid")).distinct()
          live.join(tv, col("neighbor_id") === col("__tvid"), "left_anti")
        case None => live
      }).localCheckpoint()
      writeListsWave(rows, path, newWave, dynamic = true)
    }

  /** The single lists write path every persisted face shares ([[
    * IvfModel.save]] wave 0 static, [[appendSave]] + [[graft.streaming
    * .VectorIndexStream]] waves dynamic) — one layout, so the partition
    * scheme cannot diverge between build, incremental, and streaming. */
  private[graft] def writeListsWave(assignedRows: DataFrame, path: String,
      wave: Long, dynamic: Boolean): Unit =
    assignedRows.withColumn("batch", lit(wave))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", if (dynamic) "dynamic" else "static")
      .partitionBy("batch", "list_id")
      .parquet(s"$path/lists")

  /** Assign each row its IVF list id (the build half, kept for callers
    * that only need the partitioning column). */
  def assign(corpus: DataFrame, idCol: String, vecCol: String,
      nLists: Int, seed: Long = 42L): DataFrame =
    build(corpus, idCol, vecCol, nLists, seed).assigned
      .select(col("neighbor_id").as(idCol), col("cv").as(vecCol),
        col("list_id"))

  /** Top-k cosine neighbors probing the `nProbe` nearest lists per query.
    * Reuses a prebuilt model — no quantizer fit here. `queries` must be
    * small (a probe batch): its list selection is computed driver-side
    * against the (tiny) centroid set; the bounded `.collect()` is the
    * probe batch, never the corpus. */
  def search(model: IvfModel, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nProbe: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._

    // driver-side probe-list selection for the small query batch; decode
    // with explicit casts so any numeric id / float-or-double vector
    // schema round-trips (not just bigint + array<float>)
    val probePairs = queries
      .select(col(idCol).cast("long").as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .as[(Long, Array[Double])].collect()
      .flatMap { case (qid, qv) =>
        // a NaN component would poison every centroid distance to NaN and
        // the stable sort would always pick list 0 — diverging from the
        // SQL engines' NaN-is-greatest comparison semantics that
        // signBucket's `> 0` test (and so the bucket the row was indexed
        // under) follows. A large-but-moderate positive stand-in keeps
        // the selection consistent: sign-pattern centroids with that bit
        // SET win, and k-means centroids order by their component size.
        // 1e6, not 1e30: the stand-in must dominate real coordinates yet
        // keep (c ± stand-in)² distinguishable in double (at 1e30 the
        // ±1 centroid difference falls below one ulp and ties).
        val q = qv.map(x => if (x.isNaN) 1e6 else x)
        model.centroids.map { case (lid, c) =>
          val d = c.zip(q).map { case (x, y) => (x - y) * (x - y) }.sum
          (qid, lid, d)
        }.sortBy(_._3).take(nProbe).map { case (qid2, lid, _) => (qid2, lid) }
      }.toSeq
    val queriesDf = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", sqrt(Similarity.dot(col("qv"), col("qv"))))
    val probes = probePairs.toDF("query_id", "list_id")
      .join(queriesDf, Seq("query_id"))

    // The probed list set is already driver-resident (it came out of the
    // centroid scan above) — filter it STATICALLY so a partitioned on-disk
    // index prunes to exactly the probed partitions at plan time, with no
    // reliance on dynamic partition pruning kicking in through the join.
    val probedLists = probePairs.map(_._2).distinct.sorted
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    model.assigned
      .filter(col("list_id").isin(probedLists.map(Int.box): _*))
      .join(broadcast(probes), Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 4).as("cosine"), col("rk"))
  }

  /** [[search]] with DISTRIBUTED probe-list selection: the query batch
    * never touches the driver. Each query row scores against the (tiny,
    * broadcast) centroid table and keeps its `nProbe` minimum-distance
    * lists — the same argmin/tie rule (distance, then list id) and the
    * same NaN stand-in as `search`'s driver-side selection and
    * [[assignTo]]'s insert path, so the two faces probe identical lists.
    *
    * Use this when the probe batch itself is large (bulk re-scoring, an
    * offline join of one corpus against another): `search`'s bounded
    * `.collect()` contract assumes a small serving batch, and this is
    * the only path that removes it. Partition pruning over a persisted
    * layout is DYNAMIC here (the probed list set is a runtime join
    * side, not a driver-resident literal) — for small interactive
    * batches `search`'s static `isin` pruning remains the tighter plan.
    *
    * With `broadcastProbes` (default) the probe frame (queries ×
    * nProbe rows) broadcasts into the corpus join — the corpus never
    * shuffles. Pass false when the query batch is too big to broadcast;
    * both sides then shuffle on `list_id`.
    */
  def searchDistributed(model: IvfModel, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nProbe: Int,
      broadcastProbes: Boolean = true): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cents = model.centroids.toSeq.toDF("list_id", "centroid")
    // same distance form as assignTo: d = |q|² − 2q·c + |c|² over the
    // centroid's dims (zip-truncated, like the driver-side selection),
    // exact decimal folds, NaN components replaced by search's 1e6
    // stand-in so selection matches the bucket the row was indexed under
    val qsRaw =
      slice(col("qv").cast("array<double>"), lit(1), size(col("centroid")))
    val qs = transform(qsRaw, x => when(isnan(x), lit(1e6)).otherwise(x))
    val d = Similarity.dot(qs, qs) -
      lit(2.0) * Similarity.dot(qs, col("centroid")) +
      Similarity.dot(col("centroid"), col("centroid"))
    val wSel = Window.partitionBy(col("query_id"))
      .orderBy(col("d"), col("list_id"))
    val probes0 = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", sqrt(Similarity.dot(col("qv"), col("qv"))))
      .crossJoin(broadcast(cents))
      .withColumn("d", d)
      .withColumn("rk", row_number().over(wSel))
      .filter(col("rk") <= nProbe)
      .select(col("list_id").cast("int").as("list_id"),
        col("query_id"), col("qv"), col("qn"))
    val probes = if (broadcastProbes) broadcast(probes0) else probes0
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    model.assigned
      .join(probes, Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 4).as("cosine"), col("rk"))
  }

  /** Convenience: build + search in one call (the quantizer still fits
    * exactly once). Prefer explicit `build`/`search` so one index serves
    * many probe batches. */
  def searchTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nLists: Int, nProbe: Int,
      seed: Long = 42L): DataFrame = {
    val model = build(corpus, idCol, vecCol, nLists, seed)
    search(model, queries, idCol, vecCol, k, nProbe)
  }
}
