package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(filter_bytes, key)` — membership probe against a
  * serialized `org.apache.spark.util.sketch.BloomFilter`, as a native
  * codegen expression. The engine-facing half of the runtime-filter
  * pattern ([[graft.ops.BloomPrefilter]]): Spark's own
  * `BloomFilterMightContain` is internal-only (not in the public
  * function registry — verified on this build), so the engine ships its
  * own, with the same two load-bearing properties:
  *
  *   - the filter bytes must be FOLDABLE (a literal): they are decoded
  *     to a [[BloomFilter]] ONCE per expression instance — a transient
  *     lazy val re-materialized per executor after serialization, never
  *     per row;
  *   - codegen pins the decoded filter as a referenced object in the
  *     generated class, so the probe inlines into whole-stage codegen as
  *     one virtual call on an unboxed long (string keys probe the same
  *     UTF-8 hash `putString` wrote).
  *
  * Key types: integral (probed as long, matching `stat.bloomFilter`'s
  * `putLong`) and string. NULL key → NULL (the same three-valued logic
  * as `IN`), so filters drop null keys exactly like a join would.
  */
case class BloomMightContain(filterBytes: Array[Byte], child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  // decoded once per instance (and once per executor after task
  // serialization); bytes.length is O(filter bits), never O(keys)
  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes))

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case LongType    => filter.mightContainLong(input.asInstanceOf[Long])
    case IntegerType => filter.mightContainLong(input.asInstanceOf[Int].toLong)
    case StringType  => filter.mightContainString(input.toString)
    case t => throw new UnsupportedOperationException(
      s"bloom_might_contain: unsupported key type $t")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("graftBloomFilter", filter,
      classOf[BloomFilter].getName)
    child.dataType match {
      case LongType =>
        defineCodeGen(ctx, ev, v => s"$bf.mightContainLong($v)")
      case IntegerType =>
        defineCodeGen(ctx, ev, v => s"$bf.mightContainLong((long) $v)")
      case StringType =>
        defineCodeGen(ctx, ev, v => s"$bf.mightContainString($v.toString())")
      case t => throw new UnsupportedOperationException(
        s"bloom_might_contain: unsupported key type $t")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[BloomMightContain].getName, "bloom_might_contain")

  /** Builder for registry/SQL use: the first argument must fold to the
    * serialized filter bytes at plan time. */
  def build(children: Seq[Expression]): BloomMightContain = {
    require(children.length == 2,
      "bloom_might_contain(filter_bytes, key) takes exactly 2 arguments")
    val head = children.head
    require(head.foldable,
      "bloom_might_contain: filter bytes must be a foldable binary " +
        "(the filter is decoded once at plan time, not per row)")
    BloomMightContain(head.eval().asInstanceOf[Array[Byte]], children(1))
  }

  /** Imperative registration (mirrors [[IPv4String.register]]). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("bloom_might_contain"), info, build _)
}
