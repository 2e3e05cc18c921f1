package graft.sources

import java.sql.{Connection, DriverManager, PreparedStatement}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Embedded-warehouse staging for the DSv2 pushdown source (SURVEY §2.1
  * S1 maps the reference's ClickHouse scan to "parquet; JDBC in prod",
  * and §4 notes the reference pushes the flow rollup INTO the source —
  * `etl_deepflow/neptune_etl_deepflow.py:633-646` sends a GROUP-BY SQL
  * string to ClickHouse and receives aggregated rows). Derby (on the
  * Spark classpath) stands in for that network warehouse: a real SQL
  * engine in-process, so the pushdown path — Spark plan → compiled
  * source SQL → aggregated rows back — is exercised end-to-end with
  * zero new dependencies. On a cluster the JDBC URL would name a
  * server reachable from every executor; embedded `memory:` URLs are
  * the local[n] test harness for the same plumbing. Engine-specific
  * behavior (driver registration, padded-string comparison, DDL
  * niceties) lives behind [[WarehouseDialect]], resolved from the URL
  * — the dialect suite runs the same pushdown contracts against a
  * second live engine (embedded DuckDB, test classpath only).
  *
  * Staging is DRIVER-SIDE by design and bounded by contract: a real
  * warehouse already holds its rows (loading is not the source's job),
  * so the demo stages only the deterministic `event_id % 10 = 0`
  * subset (≤100 k rows at the sf1 gate). Batched inserts, drop+create
  * idempotence (Verify/Bench rerun the same query in one JVM).
  */
object Warehouse {

  /** In-memory Derby URL (per-JVM; same name = same database). */
  def memoryUrl(db: String): String = s"jdbc:derby:memory:$db;create=true"

  /** Connect via the URL's [[WarehouseDialect]] (driver registration
    * is the one per-engine connect quirk). */
  def connect(url: String): Connection = {
    WarehouseDialect.of(url).loadDriver()
    DriverManager.getConnection(url)
  }

  /** Drop/create `table` and load `df` into it. Column names pass
    * through unquoted (Derby folds to uppercase; the source's SQL is
    * unquoted too, so lookups stay case-insensitive both ways). */
  def stage(df: DataFrame, url: String, table: String): Unit = {
    val schema = df.schema
    val dialect = WarehouseDialect.of(url)
    val conn = connect(url)
    try {
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      dialect.dropTableIfExistsSql(table) match {
        case Some(sql) => st.executeUpdate(sql)
        case None => // no DROP IF EXISTS (Derby): try-drop, ignore absent
          try st.executeUpdate(s"DROP TABLE $table")
          catch { case _: java.sql.SQLException => () }
      }
      val cols = schema.fields
        .map(f => s"${f.name} ${dialect.ddlType(f.dataType)}").mkString(", ")
      st.executeUpdate(s"CREATE TABLE $table ($cols)")
      st.close()
      val ps = conn.prepareStatement(
        s"INSERT INTO $table VALUES (${schema.fields.map(_ => "?").mkString(",")})")
      var n = 0
      // toLocalIterator: one partition in driver memory at a time —
      // the staging bound is the demo subset, not the corpus.
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val row = it.next()
        var i = 0
        while (i < schema.fields.length) {
          setParam(ps, i + 1, schema.fields(i).dataType, row, i)
          i += 1
        }
        ps.addBatch()
        n += 1
        if (n % 1000 == 0) ps.executeBatch()
      }
      ps.executeBatch()
      ps.close()
      conn.commit()
    } finally conn.close()
  }

  private def setParam(ps: PreparedStatement, idx: Int, dt: DataType,
      row: org.apache.spark.sql.Row, i: Int): Unit =
    if (row.isNullAt(i)) ps.setNull(idx, java.sql.Types.NULL)
    else dt match {
      case LongType => ps.setLong(idx, row.getLong(i))
      case IntegerType => ps.setInt(idx, row.getInt(i))
      case DoubleType => ps.setDouble(idx, row.getDouble(i))
      case BooleanType => ps.setBoolean(idx, row.getBoolean(i))
      case StringType => ps.setString(idx, row.getString(i))
      case _: DecimalType => ps.setBigDecimal(idx, row.getDecimal(i))
      case other => throw new IllegalArgumentException(
        s"Warehouse staging does not map $other")
    }
}
