package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch A/B probe for triangle-counting formulations — times each
  * variant back-to-back in one JVM so host contention noise can't
  * masquerade as an algorithmic difference. Not part of the library
  * surface; run manually:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.TriProbe"
  */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def edges: DataFrame = {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey"))
      li.select(col("l_orderkey"), col("l_partkey").as("u"))
        .join(li.select(col("l_orderkey"), col("l_partkey").as("v")), Seq("l_orderkey"))
        .where(col("u") < col("v"))
    }

    def orientedOf(): DataFrame = {
      val canon = edges.where(col("u") =!= col("v"))
        .select(least(col("u"), col("v")).as("a"), greatest(col("u"), col("v")).as("b"))
        .distinct().localCheckpoint()
      val deg = canon.select(col("a").as("node"))
        .unionAll(canon.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val withDeg = canon
        .join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), "b")
      val aFirst = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
      withDeg.select(
        when(aFirst, col("a")).otherwise(col("b")).as("src"),
        when(aFirst, col("b")).otherwise(col("a")).as("dst"))
        .localCheckpoint()
    }

    def time(name: String)(mk: => DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = mk.count()
        println(f"$name pass$i: ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
      }
    }

    def orientedBcast(): DataFrame = {
      val canon = edges.where(col("u") =!= col("v"))
        .select(least(col("u"), col("v")).as("a"), greatest(col("u"), col("v")).as("b"))
        .distinct().localCheckpoint()
      val deg = canon.select(col("a").as("node"))
        .unionAll(canon.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val withDeg = canon
        .join(broadcast(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da")), "a")
        .join(broadcast(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db")), "b")
      val aFirst = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
      withDeg.select(
        when(aFirst, col("a")).otherwise(col("b")).as("src"),
        when(aFirst, col("b")).otherwise(col("a")).as("dst"))
        .localCheckpoint()
    }

    // edge generation A/B: self-join on orderkey vs posting-list
    // groupBy + in-row pair expansion (the repo's ngram pattern)
    def edgesPL: DataFrame = {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey"))
      li.groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .select(explode(flatten(transform(col("ps"), (x, i) =>
          transform(slice(col("ps"), i + 2, size(col("ps"))),
            y => struct(x.as("u"), y.as("v")))))).as("p"))
        .select(col("p.u"), col("p.v"))
    }
    time("E1 edges self-join") { edges.select(least(col("u"), col("v")).as("a"), greatest(col("u"), col("v")).as("b")).distinct() }
    time("E2 edges posting-list") { edgesPL.distinct() }

    // full pipeline with posting-list edges + fewer checkpoints:
    // only canon + oriented are materialized; deg/out recompute from them
    time("F2 full PL-edges lean-ckpt") {
      val canon2 = edgesPL.distinct().localCheckpoint()
        .withColumnRenamed("u", "a").withColumnRenamed("v", "b")
      val deg2 = canon2.select(col("a").as("node"))
        .unionAll(canon2.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val withDeg = canon2
        .join(broadcast(deg2.withColumnRenamed("node", "a").withColumnRenamed("deg", "da")), "a")
        .join(broadcast(deg2.withColumnRenamed("node", "b").withColumnRenamed("deg", "db")), "b")
      val aFirst = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
      val oriented = withDeg.select(
        when(aFirst, col("a")).otherwise(col("b")).as("src"),
        when(aFirst, col("b")).otherwise(col("a")).as("dst"))
        .localCheckpoint()
      val out = oriented.groupBy(col("src"))
        .agg(sort_array(collect_list(col("dst"))).as("outs"))
      val tris = oriented
        .join(broadcast(out.select(col("src"), col("outs").as("ou"))), Seq("src"))
        .join(broadcast(out.select(col("src").as("dst"), col("outs").as("ov"))), Seq("dst"))
        .select(col("src").as("u"), col("dst").as("v"),
          array_intersect(col("ou"), col("ov")).as("ws"))
        .where(size(col("ws")) > 0)
      tris.select(explode(concat(
          transform(col("ws"), w => struct(w.as("node"), lit(1L).as("c"))),
          array(struct(col("u").as("node"), size(col("ws")).cast("long").as("c")),
            struct(col("v").as("node"), size(col("ws")).cast("long").as("c")))))
          .as("t"))
        .groupBy(col("t.node").as("node")).agg(sum(col("t.c")).as("n_tri"))
    }

    // variant B5: posexplode of plain longs — c = 1 for apex positions,
    // size(ws) for the two trailing endpoint positions; zero HOFs
    time("B5 posexplode-plain") {
      val oriented = orientedBcast()
      val out = oriented.groupBy(col("src"))
        .agg(sort_array(collect_list(col("dst"))).as("outs"))
        .localCheckpoint()
      val tris = oriented
        .join(broadcast(out.select(col("src"), col("outs").as("ou"))), Seq("src"))
        .join(broadcast(out.select(col("src").as("dst"), col("outs").as("ov"))), Seq("dst"))
        .select(col("src").as("u"), col("dst").as("v"),
          array_intersect(col("ou"), col("ov")).as("ws"))
        .where(size(col("ws")) > 0)
      tris.select(size(col("ws")).cast("long").as("k"),
          posexplode(concat(col("ws"), array(col("u"), col("v")))))
        .select(col("col").as("node"),
          when(col("pos") < col("k"), lit(1L)).otherwise(col("k")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("n_tri"))
    }

    // F3: full pipeline — PL edges, lean checkpoints, posexplode final
    time("F3 full PL+lean+posexplode") {
      val canon2 = edgesPL.distinct().localCheckpoint()
        .withColumnRenamed("u", "a").withColumnRenamed("v", "b")
      val deg2 = canon2.select(col("a").as("node"))
        .unionAll(canon2.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val withDeg = canon2
        .join(broadcast(deg2.withColumnRenamed("node", "a").withColumnRenamed("deg", "da")), "a")
        .join(broadcast(deg2.withColumnRenamed("node", "b").withColumnRenamed("deg", "db")), "b")
      val aFirst = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
      val oriented = withDeg.select(
        when(aFirst, col("a")).otherwise(col("b")).as("src"),
        when(aFirst, col("b")).otherwise(col("a")).as("dst"))
        .localCheckpoint()
      val out = oriented.groupBy(col("src"))
        .agg(sort_array(collect_list(col("dst"))).as("outs"))
      val tris = oriented
        .join(broadcast(out.select(col("src"), col("outs").as("ou"))), Seq("src"))
        .join(broadcast(out.select(col("src").as("dst"), col("outs").as("ov"))), Seq("dst"))
        .select(col("src").as("u"), col("dst").as("v"),
          array_intersect(col("ou"), col("ov")).as("ws"))
        .where(size(col("ws")) > 0)
      tris.select(size(col("ws")).cast("long").as("k"),
          posexplode(concat(col("ws"), array(col("u"), col("v")))))
        .select(col("col").as("node"),
          when(col("pos") < col("k"), lit(1L)).otherwise(col("k")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("n_tri"))
    }

    // shipped SparkEntry q_triangles, same JVM as F3 for a fair A/B
    time("S shipped q_triangles") {
      graft.SparkEntry.queries("q_triangles")(spark, sfDir)
    }

    // variant 0: just the oriented-edge construction (shared prefix cost)
    time("prefix(oriented)") { orientedOf() }
    time("prefix(bcast-deg)") { orientedBcast() }

    // variant B2: intersect only (no per-node contribution explode) —
    // isolates array_intersect cost from the explode/transform cost
    time("B2 intersect-only") {
      val oriented = orientedBcast()
      val out = oriented.groupBy(col("src"))
        .agg(sort_array(collect_list(col("dst"))).as("outs"))
        .localCheckpoint()
      oriented
        .join(broadcast(out.select(col("src"), col("outs").as("ou"))), Seq("src"))
        .join(broadcast(out.select(col("src").as("dst"), col("outs").as("ov"))), Seq("dst"))
        .select(size(array_intersect(col("ou"), col("ov"))).as("k"))
        .agg(sum(col("k")).as("n_tri"))
    }

    // variant B3: full B on the broadcast-deg prefix
    time("B3 adj-bcast+bdeg") {
      val oriented = orientedBcast()
      val out = oriented.groupBy(col("src"))
        .agg(sort_array(collect_list(col("dst"))).as("outs"))
        .localCheckpoint()
      val tris = oriented
        .join(broadcast(out.select(col("src"), col("outs").as("ou"))), Seq("src"))
        .join(broadcast(out.select(col("src").as("dst"), col("outs").as("ov"))), Seq("dst"))
        .select(col("src").as("u"), col("dst").as("v"),
          array_intersect(col("ou"), col("ov")).as("ws"))
        .where(size(col("ws")) > 0)
      tris.select(explode(concat(
          transform(col("ws"), w => struct(w.as("node"), lit(1L).as("c"))),
          array(struct(col("u").as("node"), size(col("ws")).cast("long").as("c")),
            struct(col("v").as("node"), size(col("ws")).cast("long").as("c")))))
          .as("t"))
        .groupBy(col("t.node").as("node")).agg(sum(col("t.c")).as("n_tri"))
    }

    // variant B4: checkpoint tris, then plain-long explode for apexes +
    // two column scans for the endpoints — no struct transform (HOFs are
    // interpreted, explode of longs is codegen)
    time("B4 adj+plain-explode") {
      val oriented = orientedBcast()
      val out = oriented.groupBy(col("src"))
        .agg(sort_array(collect_list(col("dst"))).as("outs"))
        .localCheckpoint()
      val tris = oriented
        .join(broadcast(out.select(col("src"), col("outs").as("ou"))), Seq("src"))
        .join(broadcast(out.select(col("src").as("dst"), col("outs").as("ov"))), Seq("dst"))
        .select(col("src").as("u"), col("dst").as("v"),
          array_intersect(col("ou"), col("ov")).as("ws"))
        .where(size(col("ws")) > 0)
        .localCheckpoint()
      val apex = tris.select(explode(col("ws")).as("node"), lit(1L).as("c"))
      val ends = tris.select(col("u").as("node"), size(col("ws")).cast("long").as("c"))
        .unionAll(tris.select(col("v").as("node"), size(col("ws")).cast("long").as("c")))
      apex.unionAll(ends)
        .groupBy(col("node")).agg(sum(col("c")).as("n_tri"))
    }

    // variant A: wedge join, closing broadcast (legs ordered by the same
    // (deg, id) rank the orientation uses, carried as the dst's out-rank)
    time("A wedge+bcastClose") {
      val oriented = orientedOf()
      val deg2 = oriented.select(col("src").as("node"))
        .unionAll(oriented.select(col("dst").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("d")).localCheckpoint()
      val o = oriented.join(deg2.withColumnRenamed("node", "dst"), Seq("dst"))
      val o1 = o.select(col("src"), col("dst").as("v"), col("d").as("dv"))
      val o2 = o.select(col("src"), col("dst").as("w"), col("d").as("dw"))
      val wedges = o1.join(o2, Seq("src"))
        .where(col("dv") < col("dw") || (col("dv") === col("dw") && col("v") < col("w")))
        .select(col("src").as("x"), col("v"), col("w"))
      val closing = oriented.select(col("src").as("v"), col("dst").as("w"))
      wedges.join(broadcast(closing), Seq("v", "w"))
        .select(explode(array(col("x"), col("v"), col("w"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
    }

    // variant B: adjacency intersect, broadcast adj
    time("B adj-bcast") {
      val oriented = orientedOf()
      val out = oriented.groupBy(col("src"))
        .agg(sort_array(collect_list(col("dst"))).as("outs"))
        .localCheckpoint()
      val tris = oriented
        .join(broadcast(out.select(col("src"), col("outs").as("ou"))), Seq("src"))
        .join(broadcast(out.select(col("src").as("dst"), col("outs").as("ov"))), Seq("dst"))
        .select(col("src").as("u"), col("dst").as("v"),
          array_intersect(col("ou"), col("ov")).as("ws"))
        .where(size(col("ws")) > 0)
      tris.select(explode(concat(
          transform(col("ws"), w => struct(w.as("node"), lit(1L).as("c"))),
          array(struct(col("u").as("node"), size(col("ws")).cast("long").as("c")),
            struct(col("v").as("node"), size(col("ws")).cast("long").as("c")))))
          .as("t"))
        .groupBy(col("t.node").as("node")).agg(sum(col("t.c")).as("n_tri"))
    }

    // variant C: adjacency intersect, shuffle join
    time("C adj-shuffle") {
      val oriented = orientedOf()
      val out = oriented.groupBy(col("src"))
        .agg(sort_array(collect_list(col("dst"))).as("outs"))
        .localCheckpoint()
      val tris = oriented
        .join(out.select(col("src"), col("outs").as("ou")), Seq("src"))
        .join(out.select(col("src").as("dst"), col("outs").as("ov")), Seq("dst"))
        .select(col("src").as("u"), col("dst").as("v"),
          array_intersect(col("ou"), col("ov")).as("ws"))
        .where(size(col("ws")) > 0)
      tris.select(explode(concat(
          transform(col("ws"), w => struct(w.as("node"), lit(1L).as("c"))),
          array(struct(col("u").as("node"), size(col("ws")).cast("long").as("c")),
            struct(col("v").as("node"), size(col("ws")).cast("long").as("c")))))
          .as("t"))
        .groupBy(col("t.node").as("node")).agg(sum(col("t.c")).as("n_tri"))
    }

    // V-ID: id-orientation — canon (a < b) IS the orientation, so the
    // degree aggregate + two deg joins + second checkpoint all vanish.
    // Valid bound only for degree-uniform graphs (no celebrity hubs):
    // out-lists are bounded by max degree, not √2m.
    time("V-ID id-orient full") {
      val oriented = edgesPL.distinct().localCheckpoint()
        .withColumnRenamed("u", "src").withColumnRenamed("v", "dst")
      val out = oriented.groupBy(col("src"))
        .agg(sort_array(collect_list(col("dst"))).as("outs"))
      val tris = oriented
        .join(broadcast(out.select(col("src"), col("outs").as("ou"))), Seq("src"))
        .join(broadcast(out.select(col("src").as("dst"), col("outs").as("ov"))), Seq("dst"))
        .select(col("src").as("u"), col("dst").as("v"),
          array_intersect(col("ou"), col("ov")).as("ws"))
        .where(size(col("ws")) > 0)
      tris.select(size(col("ws")).cast("long").as("k"),
          posexplode(concat(col("ws"), array(col("u"), col("v")))))
        .select(col("col").as("node"),
          when(col("pos") < col("k"), lit(1L)).otherwise(col("k")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("n_tri"))
    }

    // V-DEG1: shipped shape but the degree table is checkpointed ONCE and
    // broadcast twice from materialized blocks (vs re-aggregating per
    // broadcast build)
    time("V-DEG1 deg-ckpt-once") {
      val canon2 = edgesPL.distinct().localCheckpoint()
        .withColumnRenamed("u", "a").withColumnRenamed("v", "b")
      val deg2 = canon2.select(col("a").as("node"))
        .unionAll(canon2.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
        .localCheckpoint()
      val withDeg = canon2
        .join(broadcast(deg2.withColumnRenamed("node", "a").withColumnRenamed("deg", "da")), "a")
        .join(broadcast(deg2.withColumnRenamed("node", "b").withColumnRenamed("deg", "db")), "b")
      val aFirst = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
      val oriented = withDeg.select(
        when(aFirst, col("a")).otherwise(col("b")).as("src"),
        when(aFirst, col("b")).otherwise(col("a")).as("dst"))
        .localCheckpoint()
      val out = oriented.groupBy(col("src"))
        .agg(sort_array(collect_list(col("dst"))).as("outs"))
      val tris = oriented
        .join(broadcast(out.select(col("src"), col("outs").as("ou"))), Seq("src"))
        .join(broadcast(out.select(col("src").as("dst"), col("outs").as("ov"))), Seq("dst"))
        .select(col("src").as("u"), col("dst").as("v"),
          array_intersect(col("ou"), col("ov")).as("ws"))
        .where(size(col("ws")) > 0)
      tris.select(size(col("ws")).cast("long").as("k"),
          posexplode(concat(col("ws"), array(col("u"), col("v")))))
        .select(col("col").as("node"),
          when(col("pos") < col("k"), lit(1L)).otherwise(col("k")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("n_tri"))
    }

    spark.stop()
  }
}
