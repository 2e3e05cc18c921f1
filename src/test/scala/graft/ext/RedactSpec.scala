package graft.ext

import graft.SparkSpec

class RedactSpec extends SparkSpec {
  import spark.implicits._

  private def run(text: String) =
    Redact.scrub(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, String, Long, Long, Long)].head()

  test("each default rule redacts and counts its own hits") {
    val out = run("mail a.b@x.io and c@y.org, host 10.0.0.1, call 555-867-5309")
    assert(out._2 == "mail <EMAIL> and <EMAIL>, host <IP>, call <PHONE>")
    assert((out._3, out._4, out._5) == ((2L, 1L, 1L)))
  }

  test("email matching is case-insensitive") {
    val out = run("write User@Example.COM today")
    assert(out._2 == "write <EMAIL> today")
    assert(out._3 == 1L)
  }

  test("phone rule covers common NANP formats") {
    val out = run("call (555) 867-5309 or +1-555-867-5309 or 555.867.5309")
    assert(out._2 == "call <PHONE> or <PHONE> or <PHONE>")
    assert(out._5 == 3L)
  }

  test("phone rule does not partial-match longer digit runs") {
    val out = run("serial 1234-567-8901 stays")
    assert(out._2 == "serial 1234-567-8901 stays")
    assert(out._5 == 0L)
  }

  test("earlier rules consume text before later rules count") {
    // the digits in the email's host would otherwise partly look like an
    // IP; after email redaction the IP rule sees none of them
    val out = run("u@10.0.0.1.example.com")
    assert(out._2 == "<EMAIL>")
    assert((out._3, out._4) == ((1L, 0L)))
  }

  test("clean text passes through unchanged with zero counts") {
    val out = run("no personal data here")
    assert(out == ((1L, "no personal data here", 0L, 0L, 0L)))
  }

  test("custom rules apply in caller order") {
    val redacted = Redact.scrub(
      Seq((1L, "abc abc")).toDF("doc_id", "text"), "doc_id", "text",
      Seq(("a", "abc", "X"), ("x", "X X", "Y")))
      .as[(Long, String, Long, Long)].head()
    assert(redacted == ((1L, "Y", 2L, 1L)))
  }
}
