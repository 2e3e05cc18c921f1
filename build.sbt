ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etlneptunespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// Second embedded SQL engine for the warehouse DIALECT seam's tests
// (sources/WarehouseDialect): the DuckDB JDBC jar already present in
// the pre-warmed local coursier cache, attached as an unmanaged
// TEST-ONLY jar — no new libraryDependencies, nothing to resolve,
// zero egress. If the jar is absent the DuckDB dialect specs cancel
// themselves (assume()) and everything else is unaffected; the
// shipped library itself never links against it (dialects register
// drivers reflectively by URL).
Test / unmanagedJars ++= {
  val cache = file(sys.props("user.home")) / ".cache" / "coursier"
  // newest version by NUMERIC sort, NOT headOption of an unsorted
  // traversal (advice r17) and not plain lexicographic either (which
  // would order 1.9.0 after 1.10.0): zero-pad every digit run so
  // string order equals version order
  def verKey(n: String): String =
    "\\d+".r.replaceAllIn(n, m => f"${m.matched.toLong}%010d")
  (cache ** "duckdb_jdbc-*.jar").get
    .sortBy(f => verKey(f.getName))(Ordering[String].reverse)
    .headOption.map(Attributed.blank).toSeq
}
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] runs the whole engine in one JVM: executor threads, shuffle
  // blocks and broadcast all share this heap, and 8g GC-thrashes under the
  // string-heavy dedup queries (3-7x run-to-run variance). The box has
  // 128 GiB; give the single-JVM "cluster" a realistic share.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
