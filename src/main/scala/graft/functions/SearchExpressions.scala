package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Binary search over a broadcast sorted boundary array — the bucket
  * assignment primitive for explicit range partitioning (Cluster) and
  * interval-index file pruning (Merge).
  *
  * `upperBound(bounds, k)` = #(bounds <= k), i.e. the bucket id of k
  * among the ranges the boundaries delimit. O(log B) per row vs the
  * O(B) linear `aggregate`-over-literal scan it replaces — at 10^3+
  * buckets/boundaries the linear form dominates the projection, and at
  * 10^6 manifest-derived boundaries (merge pruning) it is unusable.
  * Static methods so generated code can call them directly; the
  * boundary array rides along as a codegen reference object (never
  * serialized into the source text).
  */
object Search {

  /** #(bounds <= key), bounds sorted ascending. */
  def upperBoundLong(bounds: Array[Long], key: Long): Int = {
    var lo = 0; var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= key) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** #(bounds <= key) under UTF8String binary comparison — Spark's
    * string ordering (UTF-8 bytes), NOT Java's UTF-16 `String` order;
    * the two disagree on supplementary-plane characters.
    */
  def upperBoundUtf8(bounds: Array[UTF8String], key: UTF8String): Int = {
    var lo = 0; var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid).compareTo(key) <= 0) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Driver-side String ordering identical to Spark's (UTF-8 bytes) —
    * use this for any boundary/sample sorting that must agree with
    * executor-side comparisons.
    */
  val utf8Ordering: Ordering[String] =
    (a: String, b: String) => UTF8String.fromString(a).compareTo(UTF8String.fromString(b))
}

/** bucket id (int) of a LONG key among sorted boundaries. */
case class BucketOfLong(child: Expression, boundaries: Array[Long])
    extends UnaryExpression {
  override def prettyName: String = "bucket_of_long"
  override def dataType: DataType = IntegerType
  override lazy val deterministic: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects LONG, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    Search.upperBoundLong(boundaries, input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bounds", boundaries, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.Search.upperBoundLong($ref, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** bucket id (int) of a STRING key among sorted (UTF-8 order) boundaries. */
case class BucketOfString(child: Expression, boundaries: Array[UTF8String])
    extends UnaryExpression {
  override def prettyName: String = "bucket_of_string"
  override def dataType: DataType = IntegerType
  override lazy val deterministic: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    Search.upperBoundUtf8(boundaries, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bounds", boundaries,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.Search.upperBoundUtf8($ref, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level entry points. */
object SearchOps {
  /** #(boundaries <= key) for a LONG column; boundaries must be sorted. */
  def bucketOf(key: Column, boundaries: Array[Long]): Column =
    GraftSqlBridge.column(BucketOfLong(GraftSqlBridge.expression(key), boundaries))

  /** #(boundaries <= key) for a STRING column; boundaries must be
    * sorted in UTF-8 byte order ([[Search.utf8Ordering]]).
    */
  def bucketOfStr(key: Column, boundaries: Array[String]): Column =
    GraftSqlBridge.column(BucketOfString(GraftSqlBridge.expression(key),
      boundaries.map(UTF8String.fromString)))
}
