package graft.sources

import java.util

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression, FieldReference, NamedReference, NullOrdering, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate._
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DSv2 warehouse source with FILTER, COLUMN-PRUNE and AGGREGATE
  * pushdown — the S1 capability the parquet encoding could not express
  * (SURVEY §2.1/§4): the reference sends its flow rollup TO ClickHouse
  * as SQL (`etl_deepflow/neptune_etl_deepflow.py:633-646`) and receives
  * aggregated rows; here Catalyst's pushed scan state is compiled into
  * warehouse SQL and executed INSIDE the source, so the Spark plan
  * carries no Aggregate node at all (complete pushdown — the
  * plan-contract `WarehouseSourceSpec` pins exactly that).
  *
  * Pushdown surface, each all-or-nothing per the DSv2 contract:
  *   - `SupportsPushDownRequiredColumns` → SELECT-list pruning;
  *   - `SupportsPushDownFilters` → WHERE compilation (comparison /
  *     null-test / IN / AND / OR / NOT / prefix-suffix-contains LIKE);
  *     non-compilable filters stay residual on the Spark side;
  *   - `SupportsPushDownAggregates` → MIN / MAX / SUM / COUNT /
  *     COUNT(*) over plain columns with GROUP BY plain columns. With a
  *     single table the push is COMPLETE (the one warehouse query
  *     computes the whole aggregate; no Aggregate node remains on the
  *     Spark side). With a SHARDED table (`dbtable` = comma-separated
  *     shard list) `supportCompletePushDown` returns false and Spark
  *     plans the final merge over per-shard partials — min of mins,
  *     sum of sums, sum of counts — exactly the 100×-scale posture
  *     (review r15 #4): each shard reduces its own rows, only
  *     group-cardinality partials cross the wire, and DISTINCT
  *     aggregates refuse to push (distinct cannot merge across
  *     shards). The compiled SQL is identical in both postures;
  *   - `SupportsPushDownLimit` / `SupportsPushDownTopN` → FETCH FIRST
  *     (+ compiled ORDER BY with explicit null ordering). Single
  *     table: fully pushed, Spark drops its Sort/Limit. Sharded:
  *     pushed per shard with `isPartiallyPushed = true`, so each shard
  *     ships at most N rows and Spark keeps the global re-sort/cut.
  *
  * String comparison caveat (advice r15, low): warehouse SQL engines
  * with padded CHAR-style comparison semantics (Derby: trailing blanks
  * insignificant, `'click' = 'click '`) diverge from Spark's binary
  * equality. Pushed predicates carrying a STRING literal therefore
  * stay residual too — the scan still ships fewer rows (the push is a
  * superset under padding), and Spark's re-check restores exact
  * semantics. LIKE is pattern-exact in SQL, so the prefix/suffix/
  * contains pushes need no residual twin.
  *
  * The executor-side reader opens its own JDBC connection, so on a
  * cluster the URL must be executor-reachable (a server, not
  * `memory:`); local[n] shares the JVM with the embedded Derby the
  * tests stage via [[Warehouse]]. Single-partition scans are the
  * correct shape for an aggregate the warehouse already reduced (the
  * result is group-cardinality-sized); un-aggregated reads of a LARGE
  * warehouse table should go through the parquet export path instead
  * (`model/Tables`) — this source is the pushdown face, not a bulk
  * transport.
  */
class WarehouseSource extends TableProvider {
  // `dbtable` is one table, or a comma-separated shard list (all shards
  // share one schema — inferred from the first)
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarehouseSource.tableSchema(options.get("url"),
      WarehouseSource.shardsOf(options.get("dbtable")).head)

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WarehouseTable(schema, properties.get("url"),
      WarehouseSource.shardsOf(properties.get("dbtable")))
}

object WarehouseSource {
  /** `dbtable` → shard tables (one entry = the unsharded posture). */
  private[sources] def shardsOf(dbtable: String): Seq[String] = {
    require(dbtable != null, "WarehouseSource needs option dbtable")
    val ts = dbtable.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(ts.nonEmpty, s"no tables in dbtable='$dbtable'")
    ts
  }

  /** Does the filter compare against a STRING literal anywhere? Those
    * pushes keep a residual Spark-side twin (padded-comparison caveat
    * in the class doc). */
  private[sources] def touchesString(f: Filter): Boolean = f match {
    case EqualTo(_, v) => v.isInstanceOf[String]
    case GreaterThan(_, v) => v.isInstanceOf[String]
    case GreaterThanOrEqual(_, v) => v.isInstanceOf[String]
    case LessThan(_, v) => v.isInstanceOf[String]
    case LessThanOrEqual(_, v) => v.isInstanceOf[String]
    case In(_, vs) => vs.exists(_.isInstanceOf[String])
    case And(l, r) => touchesString(l) || touchesString(r)
    case Or(l, r) => touchesString(l) || touchesString(r)
    case Not(c) => touchesString(c)
    case _ => false
  }

  /** Warehouse column types → Spark, via an empty probe query (the
    * inverse of [[Warehouse.ddlType]]; unknown JDBC types fail loud). */
  private[sources] def tableSchema(url: String, table: String): StructType = {
    require(url != null && table != null,
      "WarehouseSource needs options url and dbtable")
    val conn = Warehouse.connect(url)
    try {
      val rs = conn.createStatement()
        .executeQuery(s"SELECT * FROM $table WHERE 1=0")
      val md = rs.getMetaData
      StructType((1 to md.getColumnCount).map { i =>
        val dt = md.getColumnType(i) match {
          case java.sql.Types.BIGINT => LongType
          case java.sql.Types.INTEGER => IntegerType
          case java.sql.Types.DOUBLE | java.sql.Types.FLOAT => DoubleType
          case java.sql.Types.BOOLEAN => BooleanType
          case java.sql.Types.VARCHAR | java.sql.Types.CHAR |
               java.sql.Types.CLOB => StringType
          case java.sql.Types.DECIMAL | java.sql.Types.NUMERIC =>
            DecimalType(md.getPrecision(i), md.getScale(i))
          case other => throw new IllegalArgumentException(
            s"unmapped warehouse JDBC type $other for column ${md.getColumnName(i)}")
        }
        StructField(md.getColumnName(i).toLowerCase, dt,
          md.isNullable(i) != java.sql.ResultSetMetaData.columnNoNulls)
      })
    } finally conn.close()
  }

  /** V1 filter → warehouse WHERE fragment; None = not compilable (stays
    * residual in Spark — correctness never depends on the push). */
  private[sources] def compileFilter(f: Filter): Option[String] = {
    def col(name: String): Option[String] =
      if (name.matches("[A-Za-z][A-Za-z0-9_]*")) Some(name) else None
    def lit(v: Any): Option[String] = v match {
      case null => None
      case s: String => Some("'" + s.replace("'", "''") + "'")
      case _: java.lang.Long | _: java.lang.Integer | _: java.lang.Short |
           _: java.lang.Byte => Some(v.toString)
      case d: java.lang.Double =>
        // exact round-trip literal; Derby parses scientific notation
        if (d.isNaN || d.isInfinite) None else Some(d.toString)
      case f2: java.lang.Float =>
        if (f2.isNaN || f2.isInfinite) None else Some(f2.toString)
      case b: java.lang.Boolean => Some(b.toString.toUpperCase)
      case b: java.math.BigDecimal => Some(b.toPlainString)
      case b: scala.math.BigDecimal => Some(b.bigDecimal.toPlainString)
      case _ => None // timestamps/dates/binary: session-zone traps — keep residual
    }
    def like(attr: String, s: String, pre: String, post: String) =
      col(attr).map(c =>
        s"$c LIKE '$pre${s.replace("'", "''")
          .replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")}$post' ESCAPE '\\'")
    f match {
      case EqualTo(a, v) => for (c <- col(a); l <- lit(v)) yield s"$c = $l"
      case GreaterThan(a, v) => for (c <- col(a); l <- lit(v)) yield s"$c > $l"
      case GreaterThanOrEqual(a, v) =>
        for (c <- col(a); l <- lit(v)) yield s"$c >= $l"
      case LessThan(a, v) => for (c <- col(a); l <- lit(v)) yield s"$c < $l"
      case LessThanOrEqual(a, v) =>
        for (c <- col(a); l <- lit(v)) yield s"$c <= $l"
      case In(a, vs) if vs.nonEmpty =>
        val ls = vs.map(lit)
        if (ls.exists(_.isEmpty)) None
        else col(a).map(c => s"$c IN (${ls.map(_.get).mkString(", ")})")
      case IsNull(a) => col(a).map(c => s"$c IS NULL")
      case IsNotNull(a) => col(a).map(c => s"$c IS NOT NULL")
      case And(l, r) =>
        for (cl <- compileFilter(l); cr <- compileFilter(r))
          yield s"($cl AND $cr)"
      case Or(l, r) =>
        for (cl <- compileFilter(l); cr <- compileFilter(r))
          yield s"($cl OR $cr)"
      case Not(c0) => compileFilter(c0).map(c => s"(NOT $c)")
      case StringStartsWith(a, s) => like(a, s, "", "%")
      case StringEndsWith(a, s) => like(a, s, "%", "")
      case StringContains(a, s) => like(a, s, "%", "%")
      case _ => None
    }
  }

  /** Connector expression → plain column name (FieldReference of one
    * simple part only; anything computed stays on the Spark side). */
  private[sources] def refCol(e: Expression): Option[String] = e match {
    case r: NamedReference if r.fieldNames.length == 1 &&
        r.fieldNames.head.matches("[A-Za-z][A-Za-z0-9_]*") =>
      Some(r.fieldNames.head.toLowerCase)
    case _ => None
  }

  /** Aggregate call → (warehouse SQL fragment, Spark result type).
    * Result types mirror Spark's own for these functions so the scan
    * schema needs no cast shims: COUNT/COUNT(*) → long; SUM(long) →
    * long (the staged tables pre-quantize to integer units — the
    * float-parity discipline of the oracle gate); MIN/MAX → input type.
    * SUM over double/decimal is deliberately NOT pushed: warehouse
    * accumulation order differs from Spark's, so a pushed float sum
    * could silently change the answer — exactness first. */
  private[sources] def compileAgg(a: AggregateFunc,
      schema: StructType): Option[(String, DataType)] = a match {
    case _: CountStar => Some(("COUNT(*)", LongType))
    case c: Count =>
      refCol(c.column).map(col =>
        (s"COUNT(${if (c.isDistinct) "DISTINCT " else ""}$col)", LongType))
    case m: Min =>
      for (col <- refCol(m.column); f <- schema.fields.find(_.name == col))
        yield (s"MIN($col)", f.dataType)
    case m: Max =>
      for (col <- refCol(m.column); f <- schema.fields.find(_.name == col))
        yield (s"MAX($col)", f.dataType)
    case s: Sum =>
      for {
        col <- refCol(s.column)
        f <- schema.fields.find(_.name == col)
        if !s.isDistinct && (f.dataType == LongType || f.dataType == IntegerType)
      } yield (s"SUM($col)", LongType)
    case _ => None
  }
}

/** Marker for logical-plan rules that need to know a V2 relation is a
  * warehouse scan backed by N shard tables without depending on the
  * package-private table class
  * ([[graft.plans.DistinctAggThroughShards]] fires only on
  * shardCount > 1). */
trait ShardedWarehouseTable { def shardCount: Int }

private[sources] class WarehouseTable(schema: StructType, url: String,
    tables: Seq[String]) extends Table with SupportsRead
    with ShardedWarehouseTable {
  override def shardCount: Int = tables.size
  override def name(): String = s"warehouse(${tables.mkString(",")})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarehouseScanBuilder(schema, url, tables)
}

private[sources] class WarehouseScanBuilder(schema: StructType, url: String,
    tables: Seq[String]) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates with SupportsPushDownLimit
    with SupportsPushDownTopN {
  import WarehouseSource._

  private var required: StructType = schema
  private var pushed: Array[Filter] = Array.empty
  private var whereSql: Seq[String] = Nil
  // (SELECT list, output schema) once an aggregation is pushed
  private var agg: Option[(Seq[String], StructType)] = None
  private var orderSql: Seq[String] = Nil
  private var limit: Option[Int] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    // keep table order (the compiled SELECT and readSchema must agree)
    required = StructType(schema.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) = filters.partition(f => compileFilter(f).isDefined)
    pushed = ok
    whereSql = ok.map(f => compileFilter(f).get).toSeq
    // string-literal predicates push (the scan ships fewer rows) AND —
    // on PADDED-comparison dialects only (Derby: 'x' = 'x ') — stay
    // residual: the pushed form returns a SUPERSET there and Spark's
    // re-check restores binary equality (advice r15, low). Binary-
    // exact dialects (DuckDB) skip the twin: the push already IS exact
    // (WarehouseDialect, review r16 #5).
    if (WarehouseDialect.of(url).paddedStringComparison)
      residual ++ ok.filter(touchesString)
    else residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  private def compileAggregation(
      aggregation: Aggregation): Option[(Seq[String], StructType)] = {
    val groups = aggregation.groupByExpressions.map(refCol)
    val aggs = aggregation.aggregateExpressions.map(a => compileAgg(a, schema))
    // sharded: per-shard partials merge as min/max/sum/sum-of-counts —
    // DISTINCT cannot merge across shards, refuse the push entirely
    val distinctSharded = tables.size > 1 &&
      aggregation.aggregateExpressions.exists {
        case c: Count => c.isDistinct
        case s: Sum => s.isDistinct
        case _ => false
      }
    if (groups.exists(_.isEmpty) || aggs.exists(_.isEmpty) || distinctSharded)
      None
    else {
      val gcols = groups.map(_.get)
      val gfields = gcols.map(c => schema.fields.find(_.name == c).get)
      val afields = aggs.map(_.get).zipWithIndex.map { case ((_, dt), i) =>
        StructField(s"agg_$i", dt, nullable = true)
      }
      // aliased AS agg_i so the compiled SELECT list and readSchema
      // agree by NAME, not just position — a pushed TopN whose sort
      // key names an aggregate output then compiles to a column that
      // exists (advice r15, low)
      Some((gcols.toSeq ++ aggs.map(_.get._1).zipWithIndex
        .map { case (sql, i) => s"$sql AS agg_$i" }.toSeq,
        StructType(gfields ++ afields)))
    }
  }

  // complete pushdown is only legal when ONE warehouse query computes
  // the whole aggregate; a sharded table returns partials and Spark
  // plans the final merge (review r15 #4 — the 100×-scale posture)
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    tables.size == 1 && compileAggregation(aggregation).isDefined

  override def pushAggregation(aggregation: Aggregation): Boolean =
    compileAggregation(aggregation) match {
      case some @ Some(_) => agg = some; true
      case None => false
    }

  // LIMIT / ORDER-BY-LIMIT push whole on a single table (the reference
  // sends LIMIT to ClickHouse too): the scan is ONE source query, so
  // the source's cut IS the global cut — isPartiallyPushed=false lets
  // Spark drop its own Sort/Limit nodes. Sharded, the cut is per shard
  // (each ships ≤ N rows) and isPartiallyPushed=true keeps Spark's
  // global re-sort/re-limit.
  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }

  override def pushTopN(orders: Array[SortOrder], n: Int): Boolean = {
    val compiled = orders.map { o =>
      refCol(o.expression()).map { c =>
        val dir = o.direction() match {
          case SortDirection.ASCENDING => "ASC"
          case SortDirection.DESCENDING => "DESC"
        }
        val nulls = o.nullOrdering() match {
          case NullOrdering.NULLS_FIRST => "NULLS FIRST"
          case NullOrdering.NULLS_LAST => "NULLS LAST"
        }
        s"$c $dir $nulls"
      }
    }
    if (compiled.exists(_.isEmpty)) false
    else { orderSql = compiled.map(_.get).toSeq; limit = Some(n); true }
  }

  override def isPartiallyPushed(): Boolean = tables.size > 1

  override def build(): Scan = {
    val (selects, outSchema, groupCols) = agg match {
      case Some((sel, out)) =>
        (sel, out, sel.take(out.fields.count(!_.name.startsWith("agg_"))))
      case None =>
        (required.fields.map(_.name).toSeq, required, Nil)
    }
    val where =
      if (whereSql.isEmpty) "" else whereSql.mkString(" WHERE ", " AND ", "")
    val group =
      if (agg.isEmpty || groupCols.isEmpty) ""
      else groupCols.mkString(" GROUP BY ", ", ", "")
    val sel = if (selects.isEmpty) "1" else selects.mkString(", ") // COUNT-only pruning
    val order =
      if (orderSql.isEmpty) "" else orderSql.mkString(" ORDER BY ", ", ", "")
    val fetch =
      limit.map(n => s" FETCH FIRST $n ROWS ONLY").getOrElse("")
    // one compiled query per shard — same pushed state everywhere; a
    // sharded aggregate ships per-shard partials Spark merges above
    new WarehouseScan(url,
      tables.map(t => s"SELECT $sel FROM $t$where$group$order$fetch"),
      outSchema, pushed.map(_.toString), agg.isDefined)
  }
}

private[sources] class WarehouseScan(url: String, sqls: Seq[String],
    outSchema: StructType, pushedDesc: Array[String], aggPushed: Boolean)
    extends Scan with Batch {
  override def readSchema(): StructType = outSchema
  override def description(): String =
    s"WarehouseScan sql=[${sqls.mkString(" ∪ ")}], " +
      s"PushedFilters: [${pushedDesc.mkString(", ")}], " +
      s"PushedAggregation: $aggPushed"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    sqls.map(sql => WarehousePartition(url, sql): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new WarehouseReaderFactory(outSchema)
}

private[sources] case class WarehousePartition(url: String, sql: String)
    extends InputPartition

private[sources] class WarehouseReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val wp = p.asInstanceOf[WarehousePartition]
    new WarehouseReader(wp.url, wp.sql, schema)
  }
}

private[sources] class WarehouseReader(url: String, sql: String,
    schema: StructType) extends PartitionReader[InternalRow] {
  private val conn = Warehouse.connect(url)
  private val rs = conn.createStatement().executeQuery(sql)

  override def next(): Boolean = rs.next()

  override def get(): InternalRow = {
    val vals = new ArrayBuffer[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      val v: Any = schema.fields(i).dataType match {
        case LongType => rs.getLong(i + 1)
        case IntegerType => rs.getInt(i + 1)
        case DoubleType => rs.getDouble(i + 1)
        case BooleanType => rs.getBoolean(i + 1)
        case StringType => UTF8String.fromString(rs.getString(i + 1))
        case d: DecimalType =>
          val bd = rs.getBigDecimal(i + 1)
          if (bd == null) null
          else org.apache.spark.sql.types.Decimal(bd, d.precision, d.scale)
        case other => throw new IllegalArgumentException(
          s"unmapped read type $other")
      }
      vals += (if (rs.wasNull()) null else v)
      i += 1
    }
    InternalRow.fromSeq(vals.toSeq)
  }

  override def close(): Unit = { rs.close(); conn.close() }
}
