package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary state: bounded counter map plus
  * the total number of (non-null) items observed. The classic guarantee
  * (Misra & Gries 1982; mergeability per Agarwal et al. 2012, "Mergeable
  * Summaries"): every item with true frequency > n/(capacity+1) has a
  * positive counter, and every counter undercounts by at most
  * n/(capacity+1) — summed across arbitrary update/merge trees.
  */
final class MgBuffer(val capacity: Int) {
  var n: Long = 0L
  val counters: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def add(item: String): Unit = {
    n += 1
    counters.get(item) match {
      case Some(c) => counters.update(item, c + 1)
      case None if counters.size < capacity => counters.update(item, 1L)
      case None =>
        // decrement-all: amortized O(1)/item — each round retires
        // capacity+1 units of count (capacity counters + this item)
        counters.mapValuesInPlace((_, v) => v - 1)
        counters.filterInPlace((_, v) => v > 0)
    }
  }

  def mergeIn(other: MgBuffer): Unit = {
    n += other.n
    other.counters.foreach { case (k, v) =>
      counters.update(k, counters.getOrElse(k, 0L) + v)
    }
    if (counters.size > capacity) {
      // subtract the (capacity+1)-th largest counter from all — the
      // mergeable-summaries truncation that preserves the error bound
      val d = counters.values.toArray.sortInPlace()(Ordering[Long].reverse)
        .apply(capacity)
      counters.mapValuesInPlace((_, v) => v - d)
      counters.filterInPlace((_, v) => v > 0)
    }
  }
}

/** `mg_candidates(item, capacity)` — one-pass mergeable heavy-hitter
  * CANDIDATES over a string column, as a native
  * `TypedImperativeAggregate` so partial buffers flow through Spark's
  * normal partial/final aggregation (the exchange carries one
  * ≤capacity-entry summary per partition, never the data).
  *
  * Returns struct(total BIGINT, items ARRAY<STRUCT<item STRING,
  * lb BIGINT>>): `total` = non-null items seen, `lb` = the MG counter (a
  * lower bound on the item's true count, short by ≤ total/(capacity+1)).
  * The candidate SET is a guaranteed superset of every item with true
  * count > total/(capacity+1); the counters themselves may depend on
  * partition boundaries, which is why `ext.FrequentItems` re-counts the
  * candidates exactly before reporting anything.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] with UnaryLike[Expression] {

  override def prettyName: String = "mg_candidates"
  override def nullable: Boolean = false
  override def dataType: DataType = MisraGriesAgg.resultType

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(capacity)

  override def update(b: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String].toString)
    b
  }

  override def merge(b: MgBuffer, other: MgBuffer): MgBuffer = {
    b.mergeIn(other); b
  }

  override def eval(b: MgBuffer): Any = {
    val items = b.counters.toArray
      .sortBy { case (item, lb) => (-lb, item) }
      .map { case (item, lb) =>
        new GenericInternalRow(
          Array[Any](UTF8String.fromString(item), lb))
      }
    new GenericInternalRow(
      Array[Any](b.n, new GenericArrayData(items.asInstanceOf[Array[Any]])))
  }

  override def serialize(b: MgBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(b.n)
    out.writeInt(b.counters.size)
    b.counters.foreach { case (k, v) =>
      val bytes = k.getBytes(StandardCharsets.UTF_8)
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new MgBuffer(capacity)
    b.n = in.readLong()
    val size = in.readInt()
    var i = 0
    while (i < size) {
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      b.counters.update(new String(buf, StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(
      newChild: Expression): MisraGriesAgg = copy(child = newChild)
}

object MisraGriesAgg {
  val resultType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("items", ArrayType(StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("lb", LongType, nullable = false))),
      containsNull = false), nullable = false)))

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MisraGriesAgg].getName, "mg_candidates")

  def build(children: Seq[Expression]): MisraGriesAgg = {
    require(children.size == 2,
      s"mg_candidates expects (item, capacity), got ${children.size} args")
    val cap = children(1) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"mg_candidates capacity must be an integer literal, got $other")
    }
    require(cap >= 1, s"mg_candidates capacity must be positive, got $cap")
    MisraGriesAgg(children(0), cap)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("mg_candidates"), info, build _)
}
