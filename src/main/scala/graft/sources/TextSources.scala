package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-format ingest faces for the events fact stream — the reference's
  * flow logs arrive as TSV and JSON lines before they ever reach a
  * columnar store (SURVEY §1.2 S1–S2), so the engine exposes the same
  * two faces with parquet-identical downstream semantics.
  *
  * 100 TB ingest posture, non-negotiable at scale:
  *   - **Explicit schema, never inference.** Schema inference is a full
  *     extra pass over the data (and on JSON it widens types by what it
  *     happens to see) — at 100 TB that is a second 100 TB read that can
  *     still guess wrong. Both readers take the canonical events schema.
  *   - **Quarantine, don't die; don't silently drop either.** One mangled
  *     line in a trillion must not kill the job (FAILFAST) and must not
  *     vanish (DROPMALFORMED). PERMISSIVE mode keeps the raw text of any
  *     unparseable line in `_quarantine`; callers split on
  *     `isQuarantined` and route bad lines to a dead-letter sink. The
  *     split is a narrow filter over one scan — no extra pass.
  *   - **Same timestamp contract as the parquet face.** `ts` parses with
  *     an explicit µs format in the UTC session zone and lands as the
  *     same instant-preserving TIMESTAMP `model.Tables.events` yields, so
  *     every downstream operator is source-agnostic.
  */
object TextSources {

  /** Canonical events schema for text faces; `ts` arrives as text and is
    * parsed explicitly (`yyyy-MM-dd HH:mm:ss.SSSSSS`, UTC session zone). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val QuarantineCol = "_quarantine"
  private val TsFormat = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  private def withQuarantine(schema: StructType): StructType =
    schema.add(StructField(QuarantineCol, StringType))

  /** JSON-lines events: one JSON object per line, canonical field names.
    * Unparseable lines (bad JSON, wrong types) surface with their raw
    * text in `_quarantine` and NULL data columns. */
  def eventsJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(withQuarantine(eventsSchema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", QuarantineCol)
      .option("timestampFormat", TsFormat)
      .json(path)

  /** TSV (or any delimited) events: header optional, canonical column
    * order. Malformed rows (wrong arity, unparseable cells) surface with
    * their raw line in `_quarantine`.
    *
    * CSV quarantine is REQUIRED-COLUMN-RELATIVE (Spark's pruning-aware
    * contract): a row only counts as malformed if a column the query
    * actually reads fails to parse. A short row whose missing fields are
    * never referenced passes a narrow projection untouched — so audit
    * quarantine with the same column set the downstream job reads (the
    * full-schema [[clean]] is the strictest form). JSON lines do not have
    * this subtlety: a syntactically bad line quarantines regardless of
    * projection. */
  def eventsTsv(spark: SparkSession, path: String, sep: String = "\t",
      header: Boolean = false): DataFrame =
    spark.read
      .schema(withQuarantine(eventsSchema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", QuarantineCol)
      .option("timestampFormat", TsFormat)
      .option("sep", sep)
      .option("header", header.toString)
      .csv(path)

  /** Continuous ingest face: the same explicit-schema PERMISSIVE JSONL
    * read as [[eventsJsonl]], as a file-source STREAM — new files under
    * `path` become micro-batches, the checkpoint tracks which files are
    * consumed (restart-safe, no reprocessing), and every downstream
    * transform is the same trigger-agnostic DataFrame code as batch
    * (§2.10 discipline). `maxFilesPerTrigger` bounds a catch-up batch so
    * a backlog drains in controlled slices instead of one giant batch. */
  def eventsJsonlStream(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 1000): DataFrame =
    spark.readStream
      .schema(withQuarantine(eventsSchema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", QuarantineCol)
      .option("timestampFormat", TsFormat)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(path)

  /** Streaming TSV face — see [[eventsTsv]] for the delimited-text
    * semantics and [[eventsJsonlStream]] for the file-stream contract. */
  def eventsTsvStream(spark: SparkSession, path: String, sep: String = "\t",
      header: Boolean = false, maxFilesPerTrigger: Int = 1000): DataFrame =
    spark.readStream
      .schema(withQuarantine(eventsSchema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", QuarantineCol)
      .option("timestampFormat", TsFormat)
      .option("sep", sep)
      .option("header", header.toString)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .csv(path)

  /** Rows the reader could not parse — route these to a dead-letter sink.
    * NB: Spark disallows scans whose referenced columns are ONLY the
    * corrupt-record column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD
    * _COLUMN); any expression over a quarantine frame must also touch a
    * data column, which [[deadLetter]] guarantees structurally. */
  def isQuarantined(df: DataFrame) = col(QuarantineCol).isNotNull

  /** The dead-letter frame: raw text of every unparseable line plus the
    * (usually NULL, occasionally partially-parsed) record id for triage.
    * Carrying `event_id` is what keeps the single-scan plan legal — see
    * [[isQuarantined]]. */
  def deadLetter(df: DataFrame): DataFrame =
    df.filter(col(QuarantineCol).isNotNull)
      .select(col(QuarantineCol).as("raw_line"), col("event_id"))

  /** Clean rows with the text-face plumbing column dropped: the schema is
    * now EXACTLY the parquet face's, so downstream operators cannot tell
    * the sources apart. */
  def clean(df: DataFrame): DataFrame =
    df.filter(col(QuarantineCol).isNull).drop(QuarantineCol)

  /** Serialize an events frame to the text faces' line format — the
    * deterministic inverse of the readers for round-trip contracts (and
    * the export shape for systems that want the logs back as text).
    * `ts` is formatted at full µs precision in the UTC session zone. */
  def toJsonlColumns(df: DataFrame): DataFrame =
    df.select(to_json(struct(
      col("event_id"),
      date_format(col("ts"), TsFormat).as("ts"),
      col("user_id"), col("event_type"), col("value"), col("props")))
      .as("line"))

  /** PRECONDITION (inherent to unescaped delimited text, matching real
    * flow-log emitters): no field may contain the delimiter or a newline.
    * Fields that can — free text, raw payloads — belong on the JSONL
    * face, which escapes everything (TextSourcesPropertySpec proves the
    * hostile-content round trip there).
    *
    * NULL fields serialize as the EMPTY field (`coalesce(_, "")`), which
    * the CSV reader's default `nullValue=""` parses back to NULL — the
    * tab count stays fixed at arity−1 for every row. Without the
    * coalesce, `concat_ws` silently SKIPS null inputs (one fewer tab),
    * shifting later columns left into the wrong slots — silent
    * corruption, not quarantine (ADVICE r9). The one lossy corner is
    * delimited text's own: a genuinely empty STRING field (props = "")
    * also reads back as NULL; emitters that must distinguish them use
    * the JSONL face. */
  def toTsvColumns(df: DataFrame): DataFrame = {
    def f(c: Column): Column = coalesce(c, lit(""))
    df.select(concat_ws("\t",
      f(col("event_id").cast("string")),
      f(date_format(col("ts"), TsFormat)),
      f(col("user_id").cast("string")), f(col("event_type")),
      f(col("value").cast("string")), f(col("props"))).as("line"))
  }
}
