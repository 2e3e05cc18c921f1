package graft.functions

import org.apache.spark.sql.SparkSession

import graft.SparkSpec

/** The SQL-visible face: every native expression the engine ships must
  * be callable from PURE SQL in a session built with
  * `.withExtensions(new GraftExtensions)` — the deployment mode where
  * users never touch the Scala API. Exercises each injected function
  * end-to-end (not just registration) in a sibling session that shares
  * the test SparkContext.
  */
class GraftExtensionsSpec extends SparkSpec {

  private def withExtendedSession[A](f: SparkSession => A): A = {
    spark // force the shared fixture (and its SparkContext) to exist
    val defaultS = SparkSession.getDefaultSession
    val activeS = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      f(s2)
    } finally {
      defaultS.foreach(SparkSession.setDefaultSession)
      activeS.foreach(SparkSession.setActiveSession)
    }
  }

  test("all injected functions are callable from pure SQL") {
    withExtendedSession { s =>
      // ipv4_str: uint32 -> dotted quad
      assert(s.sql("SELECT ipv4_str(3232235777)").head().getString(0)
        == "192.168.1.1")
      // nfc_normalize: decomposed e + combining acute -> precomposed
      assert(s.sql("SELECT nfc_normalize('é')").head().getString(0)
        == "é")
      // decimal_dot: exact dot product of float arrays
      assert(s.sql(
        """SELECT CAST(decimal_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
                                   array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))
                  AS DOUBLE)""").head().getDouble(0) == 11.0)
      // bloom_might_contain: the filter must be FOLDABLE (decoded once
      // at plan time), so SQL callers pass it as a binary literal.
      // fpp makes a miss only PROBABLY false — assert the guaranteed
      // direction (member always true) and that the probe runs in SQL
      val bf = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
      bf.putLong(42L)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      val hex = bos.toByteArray.map("%02X".format(_)).mkString
      assert(s.sql(s"SELECT bloom_might_contain(X'$hex', 42L)")
        .head().getBoolean(0))
      // mg_candidates: aggregate over a skewed column; the summary must
      // carry the exact total and surface the dominant item
      s.range(0, 100)
        .selectExpr("CASE WHEN id % 10 = 0 THEN 'hot' ELSE concat('c', id) END AS item")
        .createOrReplaceTempView("mg_t")
      val row = s.sql("SELECT mg_candidates(item, 64) FROM mg_t").head()
        .getStruct(0)
      assert(row.getLong(0) == 100L)
      val items = row.getSeq[org.apache.spark.sql.Row](1).map(_.getString(0))
      assert(items.contains("hot"))
    }
  }
}
