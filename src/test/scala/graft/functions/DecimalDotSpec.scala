package graft.functions

import graft.SparkSpec

class DecimalDotSpec extends SparkSpec {

  test("SQL-visible through registration; null-safe; exact decimal sum") {
    DecimalDot.register(spark)
    val out = spark.sql(
      """SELECT decimal_dot(array(1.5D, 2.0D), array(2.0D, 3.0D)) v,
        |       decimal_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) n,
        |       decimal_dot(array(1.0D, 2.0D), array(1.0D)) mismatch,
        |       decimal_dot(CAST(array() AS ARRAY<DOUBLE>),
        |                   CAST(array() AS ARRAY<DOUBLE>)) empty
        |""".stripMargin).collect().head
    assert(out.getDouble(0) == 9.0)
    assert(out.isNullAt(1))
    assert(out.isNullAt(2)) // zip_with null-padding semantics
    assert(out.getDouble(3) == 0.0)
  }

  test("decimal rounding matches the double->decimal(30,15) cast semantics") {
    DecimalDot.register(spark)
    // 0.1*0.1 = 0.010000000000000002 in double; decimal scale-15 rounding
    // keeps 0.010000000000000 exactly
    val v = spark.sql(
      "SELECT decimal_dot(array(0.1D), array(0.1D)) v").collect().head.getDouble(0)
    assert(v == 0.01)
  }
}
