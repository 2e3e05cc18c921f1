package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Accuracy and determinism contracts for the DOULION edge-sampled
  * approximate triangle counter. All inputs here are deterministic, so
  * every assertion is on an exact reproducible value — the relative
  * error bounds are measured-with-margin, not probabilistic hopes.
  */
class ApproxTrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def globalExact(edges: DataFrame): Double =
    Triangles.perNode(edges, "u", "v").agg(org.apache.spark.sql.functions
      .sum($"n_tri") / 3.0).collect()(0).getDouble(0)

  private def globalEst(edges: DataFrame, kb: Int, b: Int): Double =
    Triangles.approxPerNode(edges, "u", "v", kb, b)
      .agg(org.apache.spark.sql.functions.sum($"n_tri_est") / 3.0)
      .collect()(0).getDouble(0)

  test("keep-everything sampling (p=1) is exactly the exact counter") {
    val edges = (for (i <- 1L to 20L; j <- (i + 1) to 20L if (i + j) % 3 != 0)
      yield i -> j).toDF("u", "v")
    val exact = Triangles.perNode(edges, "u", "v")
      .as[(Long, Long)].collect().toMap
    val est = Triangles.approxPerNode(edges, "u", "v",
      keepBuckets = 16, buckets = 16)
      .as[(Long, Double)].collect().toMap
    assert(est.view.mapValues(_.toLong).toMap == exact)
  }

  test("dense graph (K40, 9880 triangles): p=1/2 global within 15%") {
    val k40 = (for (i <- 1L to 40L; j <- (i + 1) to 40L) yield i -> j)
      .toDF("u", "v")
    val exact = globalExact(k40)
    assert(exact == 9880.0)
    val est = globalEst(k40, 8, 16)
    assert(math.abs(est - exact) / exact <= 0.15,
      s"est=$est exact=$exact")
  }

  test("sparse seeded random graph: p=1/2 global within 35%") {
    // n=80, p_edge=0.15 — few hundred triangles, the high-variance end;
    // the bound is the measured deterministic error with ~3× margin
    val rnd = new scala.util.Random(11)
    val edges = (for (i <- 1L to 80L; j <- (i + 1) to 80L
      if rnd.nextDouble() < 0.15) yield i -> j).toDF("u", "v")
    val exact = globalExact(edges)
    val est = globalEst(edges, 8, 16)
    assert(exact > 50.0, s"graph too sparse for the test: $exact")
    assert(math.abs(est - exact) / exact <= 0.35,
      s"est=$est exact=$exact")
  }

  test("estimate is a pure function of the input (two runs identical)") {
    val edges = (for (i <- 1L to 30L; j <- (i + 1) to 30L if (i * 31 + j) % 4 != 1)
      yield i -> j).toDF("u", "v")
    val a = Triangles.approxPerNode(edges, "u", "v")
      .as[(Long, Double)].collect().toMap
    val b = Triangles.approxPerNode(edges, "u", "v")
      .as[(Long, Double)].collect().toMap
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("sampled-triangle nodes are a subset of true-triangle nodes") {
    val rnd = new scala.util.Random(5)
    val edges = (for (i <- 1L to 50L; j <- (i + 1) to 50L
      if rnd.nextDouble() < 0.2) yield i -> j).toDF("u", "v")
    val exactNodes = Triangles.perNode(edges, "u", "v")
      .as[(Long, Long)].collect().map(_._1).toSet
    val estNodes = Triangles.approxPerNode(edges, "u", "v")
      .as[(Long, Double)].collect().map(_._1).toSet
    assert(estNodes.subsetOf(exactNodes))
    assert(estNodes.nonEmpty)
  }

  test("coin is on the canonical edge: direction and duplicates don't matter") {
    val base = (for (i <- 1L to 25L; j <- (i + 1) to 25L if (i + j) % 5 != 0)
      yield i -> j).toSeq
    val messy = (base ++ base.map(_.swap) ++ base.take(40)).toDF("u", "v")
    val clean = base.toDF("u", "v")
    val a = Triangles.approxPerNode(clean, "u", "v")
      .as[(Long, Double)].collect().toMap
    val b = Triangles.approxPerNode(messy, "u", "v")
      .as[(Long, Double)].collect().toMap
    assert(a == b)
  }
}
