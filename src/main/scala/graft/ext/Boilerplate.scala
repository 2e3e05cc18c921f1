package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document boilerplate removal — the C4/RefinedWeb line-dedup
  * filter: a text segment that recurs VERBATIM across many documents
  * (nav bars, cookie banners, license footers) is template, not prose,
  * and is stripped from every document that carries it while the
  * surrounding unique text is kept in order.
  *
  * Real corpora segment on newlines; the synthetic `documents` table is
  * single-line, so segmentation here is fixed-width word chunks (the
  * segmenter is the only corpus-specific knob — the df-count / filter /
  * reassemble pipeline is identical either way).
  *
  * Shape for 100 TB:
  *   - segment document-frequency is ONE hash aggregate keyed by segment
  *     content (map-side combinable, uniformly distributed — a segment
  *     hot enough to skew a partition is by definition boilerplate and
  *     still only contributes one reduce-side row);
  *   - the surviving boilerplate set is tiny relative to the corpus
  *     (only segments crossing the df threshold), so membership is a
  *     BROADCAST left join against the exploded segments — the corpus
  *     itself is never shuffled for the lookup;
  *   - reassembly is the one corpus-sized exchange (groupBy doc), same
  *     cost class as any per-document re-aggregation, and the collected
  *     struct list is bounded by the document's own length;
  *   - the corpus is deliberately SCANNED twice (df build + membership
  *     pass) rather than cached or shuffled whole: two cheap columnar
  *     scans beat materializing the exploded segments, and the
  *     alternative single-scan formulation (window df over segments)
  *     would exchange the entire corpus keyed by segment content.
  */
object Boilerplate {

  /** Fixed-width word segments of each document:
    * (idCol, seg_idx, seg). The final segment may be shorter. */
  def segments(docs: DataFrame, idCol: String, textCol: String,
      width: Int): DataFrame = {
    require(width >= 1, s"segment width must be positive, got $width")
    val ws = TextAnalysis.words(col(textCol))
    docs.select(col(idCol), ws.as("ws"))
      .select(col(idCol), posexplode(transform(
        sequence(lit(0L), expr(s"(size(ws) + ${width - 1}) div $width - 1")),
        i => array_join(
          slice(col("ws"), (i * width + 1).cast("int"), lit(width)), " "))))
      .withColumnRenamed("pos", "seg_idx")
      .withColumnRenamed("col", "seg")
  }

  /** Drop every segment appearing in >= `minDocs` DISTINCT documents and
    * reassemble the survivors in document order. Emits one row per input
    * document: (idCol, n_seg, n_kept, clean_text) — clean_text is ""
    * (not null) when everything was boilerplate, so downstream length
    * filters see the document rather than losing it. */
  def scrub(docs: DataFrame, idCol: String, textCol: String,
      width: Int, minDocs: Int): DataFrame = {
    val seg = segments(docs, idCol, textCol, width)
    val bl = seg.groupBy(col("seg"))
      .agg(countDistinct(col(idCol)).as("df"))
      .filter(col("df") >= minDocs)
      .select(col("seg"), lit(true).as("is_bl"))
    seg.join(broadcast(bl), Seq("seg"), "left")
      .withColumn("is_bl", coalesce(col("is_bl"), lit(false)))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_seg"),
        count(when(not(col("is_bl")), 1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(
              when(not(col("is_bl")), struct(col("seg_idx"), col("seg"))))),
            s => s.getField("seg")),
          " ").as("clean_text"))
  }
}
