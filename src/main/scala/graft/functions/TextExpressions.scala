package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word-gram kernel shared by the interpreted and generated paths.
  * Operates on UTF8String directly (no java.lang.String round trips) —
  * one `concatWs` per gram is the whole per-element cost.
  */
object GramUtil {
  private val SP = UTF8String.fromString(" ")

  /** Sliding (stride == 1) or tumbling (stride == width) word grams of
    * `width` words joined by single spaces.
    *
    * Sliding semantics match the HOF formulation the dedup kernels were
    * specified with (`when(size(w) < width, array(array_join(w, " ")))
    * .otherwise(transform(sequence(0, size(w)-width), i -> concat_ws(...)))`):
    * fewer than `width` words collapse to ONE gram holding the whole
    * text (empty string for zero words). Tumbling matches the
    * `slice`-based chunker (`ceil(n/width)` chunks, last one short).
    * Null elements are skipped, exactly like concat_ws/array_join.
    */
  def grams(words: ArrayData, width: Int, stride: Int): ArrayData = {
    val n = words.numElements()
    val buf = new Array[UTF8String](width)
    def joined(start: Int, end: Int): UTF8String = {
      var j = start
      var k = 0
      while (j < end) {
        buf(k) = words.getUTF8String(j) // null elements skipped by concatWs
        j += 1; k += 1
      }
      var m = k
      while (m < width) { buf(m) = null; m += 1 }
      UTF8String.concatWs(SP, buf: _*)
    }
    if (stride == 1) {
      if (n < width) {
        // whole text as the single gram (needs a buffer of size n, not width)
        val all = new Array[UTF8String](n)
        var i = 0
        while (i < n) { all(i) = words.getUTF8String(i); i += 1 }
        new GenericArrayData(Array[Any](UTF8String.concatWs(SP, all: _*)))
      } else {
        val out = new Array[Any](n - width + 1)
        var p = 0
        while (p <= n - width) { out(p) = joined(p, p + width); p += 1 }
        new GenericArrayData(out)
      }
    } else {
      val count = if (n == 0) 0 else (n - 1) / stride + 1
      val out = new Array[Any](count)
      var c = 0
      while (c < count) {
        val start = c * stride
        out(c) = joined(start, math.min(start + width, n))
        c += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Max multiplicity of any element (null elements skipped; 0 when
    * the array is empty or all-null). See [[TopGramCount]].
    */
  def topCount(arr: ArrayData): Int = {
    val n = arr.numElements()
    if (n == 0) return 0
    val counts = new java.util.HashMap[UTF8String, Integer](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val k = arr.getUTF8String(i)
        val c = counts.merge(k, 1, (a, b) => a + b)
        if (c > best) best = c
      }
      i += 1
    }
    best
  }
}

/** Native (whole-stage-codegen) word-gram expression — the shingle /
  * line-chunk constructor on every near-dup and quality-filter hot
  * path. The HOF formulation (`transform(sequence(...), i ->
  * concat_ws(...))`) it replaces is interpreted per ELEMENT (lambda
  * variable rebinding + boxed arithmetic per shingle position) —
  * measured ~300x slower per row than this straight-line kernel, which
  * dominated the whole corpus pipeline. Semantics are bit-identical
  * (property-tested against the HOF form), so the DuckDB oracle SQL is
  * unchanged.
  */
case class WordGrams(child: Expression, width: Int, stride: Int)
    extends UnaryExpression {
  require(width > 0 && (stride == 1 || stride == width),
    s"word_grams: width must be positive and stride either 1 (sliding) or width (tumbling); got width=$width stride=$stride")

  override def prettyName: String = "word_grams"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override lazy val deterministic: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_grams expects ARRAY<STRING>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    GramUtil.grams(input.asInstanceOf[ArrayData], width, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GramUtil.grams($c, $width, $stride)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Max multiplicity of any element in a string array (0 for empty) —
  * the "top n-gram" half of Gopher's repetition signals: the fraction
  * covered by the single most frequent gram. One HashMap pass per row,
  * codegen'd as a static call (no interpreted lambda per element).
  */
case class TopGramCount(child: Expression) extends UnaryExpression {
  override def prettyName: String = "top_gram_count"
  override def dataType: DataType = IntegerType
  override lazy val deterministic: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"top_gram_count expects ARRAY<STRING>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    GramUtil.topCount(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GramUtil.topCount($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Within-document line dedup kernel: split on '\n' BYTES (every part
  * kept, including empties and trailing empties — the split semantics
  * of Spark's `split(str, re, -1)` and DuckDB's `split`), keep the
  * FIRST occurrence of each byte-identical line, rejoin with '\n'.
  * The within-doc counterpart of the corpus-global
  * [[graft.ops.Dedup.lineDedup]]: repeated boilerplate INSIDE one
  * document (nav bars, repeated paragraphs) collapses per-row at scan
  * stage — zero shuffles, embarrassingly parallel.
  */
object LineDedupUtil {
  private val NL = UTF8String.fromString("\n")

  def dedupLines(text: UTF8String): UTF8String = {
    val parts = text.split(NL, -1)
    if (parts.length <= 1) return text
    val seen = new java.util.HashSet[UTF8String](parts.length * 2)
    val kept = new Array[UTF8String](parts.length)
    var k = 0
    var i = 0
    while (i < parts.length) {
      if (seen.add(parts(i))) { kept(k) = parts(i); k += 1 }
      i += 1
    }
    if (k == parts.length) text
    else UTF8String.concatWs(NL, java.util.Arrays.copyOf(kept, k): _*)
  }
}

/** Native (whole-stage-codegen) within-doc line dedup — see
  * [[LineDedupUtil.dedupLines]] for semantics.
  */
case class LineDedupDoc(child: Expression) extends UnaryExpression {
  override def prettyName: String = "line_dedup_doc"
  override def dataType: DataType = StringType
  override lazy val deterministic: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"line_dedup_doc expects STRING, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    LineDedupUtil.dedupLines(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LineDedupUtil.dedupLines($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextGrams {
  /** Within-doc first-wins line dedup of a text column. */
  def lineDedupDoc(text: Column): Column =
    GraftSqlBridge.column(LineDedupDoc(GraftSqlBridge.expression(text)))

  /** Sliding word n-grams (shingles): one gram per window position;
    * fewer than `width` words collapse to one whole-text gram.
    */
  def sliding(words: Column, width: Int): Column =
    GraftSqlBridge.column(WordGrams(GraftSqlBridge.expression(words), width, 1))

  /** Tumbling word chunks: `ceil(n/width)` grams, last one short. */
  def tumbling(words: Column, width: Int): Column =
    GraftSqlBridge.column(WordGrams(GraftSqlBridge.expression(words), width, width))

  /** Max multiplicity of any gram (see [[TopGramCount]]). */
  def topCount(grams: Column): Column =
    GraftSqlBridge.column(TopGramCount(GraftSqlBridge.expression(grams)))

  /** Session-local SQL registration of all text/vector/generator
    * kernels (`word_grams`, `quantize_vec`, `qdot_vec`, `token_seq`) —
    * the temp-function analog of [[graft.GraftExtensions]], which
    * injects the same builders for `--conf spark.sql.extensions`
    * sessions. Constant parameters (width/stride/scale/vocab) must be
    * INT literals: the kernels specialize on them at plan time.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
    import org.apache.spark.sql.types.IntegerType
    def intLit(e: Expression, fn: String): Int = e match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$fn expects a literal INT parameter, got $other")
    }
    GraftSqlBridge.registerFunction(spark, "word_grams",
      (es: Seq[Expression]) =>
        WordGrams(es.head, intLit(es(1), "word_grams"), intLit(es(2), "word_grams")))
    GraftSqlBridge.registerFunction(spark, "quantize_vec",
      (es: Seq[Expression]) => QuantizeVec(es.head, intLit(es(1), "quantize_vec")))
    GraftSqlBridge.registerFunction(spark, "qdot_vec",
      (es: Seq[Expression]) => QDotVec(es.head, es(1)))
    GraftSqlBridge.registerFunction(spark, "token_seq",
      (es: Seq[Expression]) => TokenSeq(es.head, es(1), intLit(es(2), "token_seq")))
    GraftSqlBridge.registerFunction(spark, "line_dedup_doc",
      (es: Seq[Expression]) => LineDedupDoc(es.head))
  }
}
