package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IPv4StringSpec extends SparkSpec {
  import spark.implicits._

  test("matches the composed-builtins formatting for edge + random values") {
    IPv4String.register(spark)
    val ips = Seq(0L, 1L, 255L, 256L, 3232235777L, 4294967295L,
      2654435761L, 16909060L)
    val df = ips.toDF("ip")
    val composed = concat_ws(".",
      shiftright($"ip", 24).bitwiseAND(255),
      shiftright($"ip", 16).bitwiseAND(255),
      shiftright($"ip", 8).bitwiseAND(255),
      $"ip".bitwiseAND(255))
    val rows = df.select(
      call_function("ipv4_str", $"ip").as("native"),
      composed.as("builtin")).collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
    // spot values
    val m = ips.zip(rows.map(_.getString(0))).toMap
    assert(m(3232235777L) == "192.168.1.1")
    assert(m(0L) == "0.0.0.0")
    assert(m(4294967295L) == "255.255.255.255")
    assert(m(16909060L) == "1.2.3.4")
  }

  test("SQL-visible through extensions registration and null-safe") {
    IPv4String.register(spark)
    val out = spark.sql(
      "SELECT ipv4_str(CAST(NULL AS BIGINT)) n, ipv4_str(167772161) v")
      .collect().head
    assert(out.isNullAt(0))
    assert(out.getString(1) == "10.0.0.1")
  }
}
