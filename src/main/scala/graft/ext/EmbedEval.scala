package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-compression evaluation — recall@k of a DIMENSION-TRUNCATED
  * cosine ranking against the full-dimension ranking: the measurement
  * behind the "can we store 16 of 64 dims" (Matryoshka-style) storage
  * decision a 100 TB vector corpus forces. Cutting dims cuts index
  * bytes and probe FLOPs linearly; this operator prices what it costs
  * in neighbor fidelity, exactly, before anything is thrown away.
  *
  * Both rankings run the same exact [[Similarity.bruteForceTopK]]
  * machinery (decimal-exact dots, (cos desc, id) total order), so the
  * overlap count is a pure function of the data — no sketch noise in
  * the EVALUATION even when the thing being evaluated is lossy. The
  * truncated side simply slices the leading `dims` components in-row;
  * ranking ties and all.
  *
  * Shape: two broadcast-query scans of the corpus (the bruteForce
  * contract — queries are the small side), one (query, neighbor) semi
  * overlap, one count per query. Evaluation runs on a query SAMPLE by
  * construction; the corpus is never paired with itself.
  */
object EmbedEval {

  /** @return per query: (query_id, n_overlap, k) — n_overlap of the
    *         truncated top-k found in the full top-k. */
  def truncationRecall(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, dims: Int, k: Int): DataFrame = {
    require(dims >= 1, s"dims must be >= 1: $dims")
    require(k >= 1, s"k must be >= 1: $k")
    // dims beyond the stored dimension would make slice() a no-op and
    // report a PERFECT recall for a truncation that never happened —
    // the one wrong answer a storage decision must not see (review
    // r11). Validated with an AGGREGATE over BOTH frames, not a
    // head() peek: head() throws bare NoSuchElementException on an
    // empty query frame, and checking only the first row would let a
    // mixed-dimension corpus pass while slice() silently no-ops on
    // its shorter vectors (review r12).
    // size(NULL) is null (or -1 under the legacy sizeOfNull conf), so a
    // null vector would either vanish from min() — leaving an
    // all-null-frame min as null and getInt throwing an opaque NPE — or
    // poison it to -1; count the nulls explicitly and fail with words
    // (review r12)
    val stats = queries.select(size(col(vecCol)).as("d"))
      .unionByName(corpus.select(size(col(vecCol)).as("d")))
      .agg(min(col("d")).as("mn"), count(lit(1)).as("n"),
        count(when(col("d").isNull || col("d") < 0, 1)).as("n_null")).head()
    require(stats.getLong(1) > 0,
      "truncationRecall needs non-empty corpus and query frames")
    require(stats.getLong(2) == 0L,
      s"truncationRecall: ${stats.getLong(2)} row(s) carry a NULL " +
        s"$vecCol — a null vector has no dimension to truncate")
    val storedDims = stats.getInt(0)
    require(dims <= storedDims,
      s"dims=$dims exceeds the smallest stored dimension $storedDims — " +
        "the 'truncation' would be a no-op reporting perfect recall")
    val full = Similarity.bruteForceTopK(corpus, queries, idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id"))
    def cut(df: DataFrame) = df.select(col(idCol),
      slice(col(vecCol), 1, dims).as(vecCol))
    val trunc = Similarity.bruteForceTopK(cut(corpus), cut(queries),
        idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id"))
    trunc.join(full, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_overlap"))
      // a query whose truncated list shares NOTHING with the full list
      // would otherwise vanish — report the zero explicitly
      .join(queries.select(col(idCol).as("query_id")), Seq("query_id"),
        "right_outer")
      .select(col("query_id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        lit(k).as("k"))
  }
}
