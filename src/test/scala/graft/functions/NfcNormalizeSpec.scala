package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("composes decomposed sequences; ASCII and composed text pass through") {
    NfcNormalize.register(spark)
    val decomposed = "café"       // e + COMBINING ACUTE
    val composed = "café"          // precomposed é
    val rows = Seq(decomposed, composed, "plain ascii", "")
      .toDF("s")
      .select(call_function("nfc_normalize", $"s").as("n"))
      .as[String].collect()
    assert(rows(0) == composed)          // recomposed
    assert(rows(1) == composed)          // untouched
    assert(rows(2) == "plain ascii")
    assert(rows(3) == "")
  }

  test("normalization collapses visually-identical dedup fingerprints") {
    NfcNormalize.register(spark)
    val df = Seq((1L, "résumé"), (2L, "résumé"))
      .toDF("doc_id", "text")
    val distinctRaw = df.select(md5($"text")).distinct().count()
    val distinctNorm = df
      .select(md5(call_function("nfc_normalize", $"text"))).distinct().count()
    assert(distinctRaw == 2 && distinctNorm == 1)
  }

  test("non-string input fails analysis with a named error, wrong arity throws") {
    NfcNormalize.register(spark)
    val err = intercept[Exception] {
      spark.sql("SELECT nfc_normalize(123)").collect()
    }
    assert(err.getMessage.contains("nfc_normalize"))
    val arity = intercept[Exception] {
      spark.sql("SELECT nfc_normalize('a', 'b')").collect()
    }
    assert(arity.getMessage.contains("1 argument"))
  }

  test("SQL-visible and null-safe") {
    NfcNormalize.register(spark)
    val out = spark.sql(
      "SELECT nfc_normalize(CAST(NULL AS STRING)) n, " +
        "nfc_normalize('Å') v") // A + COMBINING RING → Å
      .collect().head
    assert(out.isNullAt(0))
    assert(out.getString(1) == "Å")
  }
}
