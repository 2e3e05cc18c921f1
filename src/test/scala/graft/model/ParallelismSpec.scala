package graft.model

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-18 parallelism-floor contract: fire ONLY when the
  * input under-splits relative to the cluster, honor the override,
  * and never change row multiset. */
class ParallelismSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("parallelism-spec").getOrCreate()

  test("under-split input is repartitioned to defaultParallelism; " +
      "row multiset unchanged") {
    import spark.implicits._
    val df = (1 to 100).toDF("x").coalesce(1)
    assert(df.queryExecution.toRdd.getNumPartitions == 1)
    val floored = Parallelism.floor(df)
    assert(floored.queryExecution.toRdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    assert(floored.collect().map(_.getInt(0)).sorted.toSeq ==
      (1 to 100))
  }

  test("already-parallel input passes through untouched (the 100 TB " +
      "no-op leg: production row groups >= cores)") {
    import spark.implicits._
    val df = (1 to 100).toDF("x")
      .repartition(spark.sparkContext.defaultParallelism + 2)
    val floored = Parallelism.floor(df)
    assert(floored eq df) // same instance — no plan change at all
  }

  test("exchange-bearing frame is a structural no-op (scan-only " +
      "contract, advice r18: probing it would execute upstream stages)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // under-split (1 partition) AND carries an exchange: the floor
    // must neither probe its partition count nor wrap it
    val df = (1 to 100).toDF("x")
      .repartition(col("x")).coalesce(1)
    assert(Parallelism.floor(df) eq df)
  }

  test("malformed spark.graft.scan.minParallelism fails loudly, not " +
      "with a bare NumberFormatException") {
    import spark.implicits._
    spark.conf.set("spark.graft.scan.minParallelism", "lots")
    try {
      val df = (1 to 10).toDF("x").coalesce(1)
      val e = intercept[IllegalArgumentException](Parallelism.floor(df))
      assert(e.getMessage.contains("minParallelism"))
    } finally spark.conf.unset("spark.graft.scan.minParallelism")
  }

  test("spark.graft.scan.minParallelism=0 disables the floor") {
    import spark.implicits._
    spark.conf.set("spark.graft.scan.minParallelism", "0")
    try {
      val df = (1 to 10).toDF("x").coalesce(1)
      assert(Parallelism.floor(df) eq df)
    } finally spark.conf.unset("spark.graft.scan.minParallelism")
  }

  test("pin plans an explicit-count keyed repartition (the shape AQE " +
      "coalescing leaves alone) and keeps the row multiset") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = (1 to 100).toDF("x")
    val pinned = Parallelism.pin(df, col("x"))
    // REPARTITION_BY_NUM: the plan carries a shuffle whose partition
    // count is the cluster's defaultParallelism, keyed on x
    val exchanges = pinned.queryExecution.sparkPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.nonEmpty)
    assert(exchanges.head.outputPartitioning.numPartitions ==
      spark.sparkContext.defaultParallelism)
    assert(pinned.collect().map(_.getInt(0)).sorted.toSeq == (1 to 100))
  }

  test("pin honors the minParallelism override and 0 disables it") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = (1 to 10).toDF("x")
    spark.conf.set("spark.graft.scan.minParallelism", "2")
    try {
      val pinned = Parallelism.pin(df, col("x"))
      val e = pinned.queryExecution.sparkPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(e.head.outputPartitioning.numPartitions == 2)
      spark.conf.set("spark.graft.scan.minParallelism", "0")
      assert(Parallelism.pin(df, col("x")) eq df)
    } finally spark.conf.unset("spark.graft.scan.minParallelism")
  }
}
