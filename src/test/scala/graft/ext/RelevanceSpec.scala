package graft.ext

import graft.SparkSpec

class RelevanceSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark spark spark table"),     // heavy on 'spark'
    (2L, "spark table join"),            // one of each
    (3L, "table table table table"),     // no 'spark'
    (4L, "row scan filter value")        // none of the query terms
  ).toDF("doc_id", "text")

  private def scores(terms: String*): Map[Long, Double] =
    Relevance.bm25(docs, "doc_id", "text", terms)
      .select("doc_id", "bm25").as[(Long, Double)].collect().toMap

  test("documents without any query term score exactly zero") {
    val s = scores("spark", "join")
    assert(s(3L) == 0.0 && s(4L) == 0.0)
  }

  test("higher tf scores higher at comparable length; rare terms outweigh common") {
    val s = scores("spark", "table")
    assert(s(1L) > s(2L)) // 3x spark beats 1x spark at similar dl
    val rare = scores("join") // df=1
    val common = scores("table") // df=3
    assert(rare(2L) > common(2L)) // same tf=1 for doc 2, rarer term wins
  }

  test("matches the hand-computed formula on a pinned example") {
    // doc 2, term 'join': tf=1, dl=3, N=4, sum_dl=15, df=1
    // idf = ln((4-1+0.5)/(1+0.5)+1) = ln(10/3)
    // denom = 1 + 1.2*(0.25 + 0.75*(3/(15/4.0)))
    val expected = BigDecimal(
      math.log(10.0 / 3.0) * (1.0 * 2.2) /
        (1.0 + 1.2 * (0.25 + 0.75 * (3.0 / (15.0 / 4.0))))
    ).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(scores("join")(2L) == expected)
  }

  test("tfidfKeywords ranks distinctive words first and caps at k") {
    val out = Relevance.tfidfKeywords(docs, "doc_id", "text", k = 2)
      .as[(Long, String, Long, Double, Int)].collect()
    assert(out.count(_._1 == 1L) == 2)
    // doc 1's top keyword is 'spark' (tf 3, df 2) over 'table' (tf 1, df 3)
    val d1 = out.filter(_._1 == 1L).sortBy(_._5)
    assert(d1.head._2 == "spark" && d1.head._3 == 3L)
    // doc 4's words are unique to it (df 1) → tfidf = ln(4) each, and the
    // word tie-break makes the selection deterministic
    val d4 = out.filter(_._1 == 4L).sortBy(_._5).map(_._2)
    assert(d4.toSeq == Seq("filter", "row"))
    val lnN = BigDecimal(math.log(4.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.filter(_._1 == 4L).forall(_._4 == lnN))
  }

  test("tf and dl columns ride along for downstream filtering") {
    val row = Relevance.bm25(docs, "doc_id", "text", Seq("spark"))
      .where($"doc_id" === 1L).select("dl", "tf_0").as[(Long, Long)].head()
    assert(row == ((4L, 3L)))
  }
}
