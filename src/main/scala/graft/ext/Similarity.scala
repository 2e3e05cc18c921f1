package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Numeric determinism: dot products and norms fold element products into
  * a `decimal(38,15)` accumulator — exact and order-independent, so the
  * same cosine comes out of Spark and the DuckDB oracle bit-for-bit (the
  * final sqrt/divide happen once, in double).
  */
object Similarity {

  /** Exact, order-independent dot product of two numeric vectors, as the
    * native codegen [[graft.functions.DecimalDot]] expression. Replaces
    * the interpreted `aggregate(zip_with(...))` decimal fold bit-for-bit
    * (equivalence spec-asserted in SimilaritySpec) while staying inside
    * whole-stage codegen on every ANN / dedup scoring path. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.functions.DecimalDot(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(a),
        org.apache.spark.sql.graftshim.ColumnBridge.expression(b)))

  /** The pre-round-3 HOF formulation of [[dot]] — interpreted (HOFs never
    * codegen), kept as the executable spec that the native expression is
    * checked against. */
  private[graft] def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast("double") * y.cast("double")).cast("decimal(30,15)")),
      lit(0).cast("decimal(38,15)"),
      // re-cast each step: Spark's decimal-addition promotion would
      // otherwise drift the scale to (38,14) and fail to typecheck
      (acc, v) => (acc + v).cast("decimal(38,15)")
    ).cast("double")

  /** Cosine similarity via the exact dot/norm fold. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** L2 norm via the exact decimal dot — bit-identical across engines. */
  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Largest |component| as a double — the symmetric int8 scale base. */
  def absMax(v: Column): Column =
    array_max(transform(v, x => abs(x.cast("double"))))

  /** Symmetric absmax int8 quantization: q_i = ⌊x_i/absMax·127 + 0.5⌋ —
    * the serving-time compression pass for embedding tables (4× smaller,
    * dot products in integer SIMD). `floor(x + 0.5)` is written out
    * instead of `round` so the half-way rule (toward +∞) is EXPLICIT and
    * engine-exact — `round(double)` half-way behavior differs between
    * engines (the q_quality_score trap). Callers guard absMax > 0 (a
    * zero vector has no scale). Range is [−127, 127]: x = −absMax gives
    * ⌊−127 + 0.5⌋ = ⌊−126.5⌋ = −127, x = +absMax gives ⌊127.5⌋ = 127.
    */
  def int8Quantize(v: Column, absMaxCol: Column): Column =
    transform(v, x =>
      floor(x.cast("double") / absMaxCol * lit(127.0) + lit(0.5)).cast("int"))

  /** Random-hyperplane LSH bucket with axis-aligned planes: an integer in
    * [0, 2^bits) from the sign pattern of the first `bits` dimensions.
    * Sign tests on floats are exact, so bucketing is deterministic. */
  def signBucket(vec: Column, bits: Int): Column =
    (0 until bits).map { i =>
      when(get(vec, lit(i)) > 0f, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Brute-force cosine top-k: every query row against every corpus row.
    *
    * The query side is expected to be SMALL (a probe batch) — it is
    * broadcast, so the corpus scan stays shuffle-free and the plan is a
    * BroadcastNestedLoopJoin + per-query top-k heap. The scale path for
    * large query sets is [[lshTopK]].
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    // norms hoisted out of the pair join: O(n+q) folds instead of O(n·q)·2
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cn", sqrt(dot(col("cv"), col("cv"))))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 4).as("cosine"),
        col("rk"))
  }

  /** LSH-bucketed top-k: candidates limited to the query's sign bucket —
    * the 100 TB path (shuffle on the bucket key, no broadcast of the
    * corpus, no cross join). Approximate: recall depends on bucket bits. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, bucketBits: Int = 8): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("bucket", signBucket(col("qv"), bucketBits))
      .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("bucket", signBucket(col("cv"), bucketBits))
      .withColumn("cn", sqrt(dot(col("cv"), col("cv"))))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 4).as("cosine"),
        col("rk"))
  }
}
