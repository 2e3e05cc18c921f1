package graft.sources

import org.apache.spark.sql.types._

/** Engine-specific surface of the warehouse pushdown source (review
  * r16 #5). The compiled SQL the source ships is deliberately
  * ANSI-conservative — plain SELECT/WHERE/GROUP BY/ORDER BY with
  * `FETCH FIRST`, explicit `NULLS FIRST/LAST`, `LIKE … ESCAPE` — so
  * MOST of the surface is dialect-free; what remains engine-specific
  * is exactly what this seam captures:
  *
  *  - '''driver registration''' (Derby 10.15+ split its embedded
  *    driver into derbytools and can lose the service-loader race
  *    under layered classloaders; DuckDB registers plainly);
  *  - '''string comparison semantics''' — the round-15 padded-
  *    comparison finding: Derby compares VARCHAR with trailing blanks
  *    insignificant (`'click' = 'click '`), so every pushed predicate
  *    carrying a string literal keeps a residual Spark-side twin;
  *    DuckDB compares binary-exact and needs no twin. Getting this
  *    flag wrong in the safe direction costs a re-check; in the unsafe
  *    direction it changes answers — unknown engines default to
  *    padded=true (always sound: the push is a superset, Spark
  *    re-checks);
  *  - '''DDL niceties''' used only by the test/staging face
  *    (`DROP TABLE IF EXISTS` exists in DuckDB, not Derby).
  *
  * Dialect is resolved from the JDBC URL prefix once per
  * connect/compile site; adding an engine = one object here.
  */
sealed trait WarehouseDialect {
  def name: String

  /** Load/register the JDBC driver for this engine (idempotent). */
  def loadDriver(): Unit

  /** True when the engine compares strings with trailing blanks
    * insignificant (CHAR-padding semantics) — pushed predicates with
    * string literals then keep a residual Spark-side twin to restore
    * binary equality. */
  def paddedStringComparison: Boolean

  /** `DROP TABLE IF EXISTS` form, when the engine has one; None =
    * try/catch the plain DROP (Derby). Staging-face only. */
  def dropTableIfExistsSql(table: String): Option[String]

  /** Spark type → engine DDL type (staging face). The read-side
    * mapping (`WarehouseSource.tableSchema`) is shared: both engines
    * answer the probe query with standard JDBC type codes. */
  def ddlType(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case DoubleType => "DOUBLE"
    case BooleanType => "BOOLEAN"
    case StringType => "VARCHAR(4096)"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case other => throw new IllegalArgumentException(
      s"Warehouse staging does not map $other")
  }
}

object WarehouseDialect {

  /** Resolve the dialect from a JDBC URL. Unknown engines get the
    * conservative dialect: padded-string semantics assumed (residual
    * twins — sound either way), no DDL extensions, driver expected to
    * self-register via the service loader. */
  def of(url: String): WarehouseDialect =
    if (url == null) Conservative
    else if (url.startsWith("jdbc:derby:")) Derby
    else if (url.startsWith("jdbc:duckdb:")) DuckDb
    else Conservative

  case object Derby extends WarehouseDialect {
    val name = "derby"
    override def loadDriver(): Unit =
      // Derby 10.15+ splits the embedded driver into derbytools;
      // service auto-registration can lose the race with the first
      // getConnection under sbt's layered classloaders — load explicitly
      Class.forName("org.apache.derby.iapi.jdbc.AutoloadedDriver")
    // trailing blanks insignificant in VARCHAR comparison
    override def paddedStringComparison: Boolean = true
    override def dropTableIfExistsSql(table: String): Option[String] = None
  }

  case object DuckDb extends WarehouseDialect {
    val name = "duckdb"
    override def loadDriver(): Unit =
      Class.forName("org.duckdb.DuckDBDriver")
    // binary-exact comparison ('click' <> 'click ') — no residual twin
    override def paddedStringComparison: Boolean = false
    override def dropTableIfExistsSql(table: String): Option[String] =
      Some(s"DROP TABLE IF EXISTS $table")
  }

  case object Conservative extends WarehouseDialect {
    val name = "generic"
    override def loadDriver(): Unit = () // service-loader registration
    override def paddedStringComparison: Boolean = true
    override def dropTableIfExistsSql(table: String): Option[String] = None
  }
}
