package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def cells(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2)))
      .toMap

  test("hand-checked: cell counts are per-row md5 buckets of each key") {
    val keys = Seq("a", "a", "b").toDF("k")
    val sk = cells(CountMin.sketch(keys, "k", d = 2, w = 16, seed = 7L))
    // replay the bucket rule in plain Scala
    def bucket(i: Int, k: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"7|$i|$k".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.substring(0, 4)
      java.lang.Long.parseLong(hex, 16) % 16
    }
    val want = Seq("a", "a", "b").flatMap(k => Seq((0, bucket(0, k)),
      (1, bucket(1, k)))).groupBy(identity).map { case (c, xs) =>
      c -> xs.size.toLong }
    assert(sk === want)
    // total mass per hash row = n
    assert(sk.filter(_._1._1 == 0).values.sum === 3L)
    assert(sk.filter(_._1._1 == 1).values.sum === 3L)
  }

  test("one-sided error: every estimate >= the true count, and total " +
      "mass per row is exactly n") {
    val rnd = new scala.util.Random(3)
    val keys = Seq.fill(500)(s"k${rnd.nextInt(40)}").toDF("k")
    val sk = CountMin.sketch(keys, "k", d = 3, w = 8) // tiny w: collisions
    val est = CountMin.estimate(sk, keys, "k", d = 3, w = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = keys.groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, t) =>
      assert(est(k) >= t, s"est(${k}) = ${est(k)} < true $t")
    }
    // with w=8 and 40 keys, collisions are certain: the sketch must be
    // genuinely lossy here or the fixture proves nothing
    assert(truth.exists { case (k, t) => est(k) > t })
  }

  test("absent key estimates the bucket floor (0 when its cells are " +
      "untouched)") {
    val keys = Seq("x").toDF("k")
    val sk = CountMin.sketch(keys, "k", d = 4, w = 4096)
    val est = CountMin.estimate(sk, Seq("never-seen").toDF("k"), "k",
      d = 4, w = 4096).collect()
    assert(est.length === 1 && est(0).getLong(1) === 0L)
  }

  test("merge is cell-wise addition and equals the combined build") {
    val a = (1 to 60).map(i => s"k${i % 9}").toDF("k")
    val b = (1 to 40).map(i => s"k${i % 13}").toDF("k")
    val merged = cells(CountMin.merge(
      CountMin.sketch(a, "k", d = 3, w = 32),
      CountMin.sketch(b, "k", d = 3, w = 32)))
    val whole = cells(CountMin.sketch(a.union(b), "k", d = 3, w = 32))
    assert(merged === whole)
  }

  test("partition invariance") {
    val keys = (1 to 300).map(i => s"k${i % 17}").toDF("k")
    val one = cells(CountMin.sketch(keys, "k", d = 3, w = 64))
    val many = cells(CountMin.sketch(keys.repartition(11), "k", d = 3,
      w = 64))
    assert(one === many)
  }

  test("guards: null keys, bad shapes raise loudly") {
    val withNull = Seq(Some("a"), None).toDF("k")
    val e = intercept[IllegalArgumentException] {
      CountMin.sketch(withNull, "k", d = 2, w = 8)
    }
    assert(e.getMessage.contains("NULL"))
    intercept[IllegalArgumentException] {
      CountMin.sketch(Seq("a").toDF("k"), "k", d = 0, w = 8)
    }
    intercept[IllegalArgumentException] {
      CountMin.sketch(Seq("a").toDF("k"), "k", d = 2, w = 65537)
    }
  }
}
