package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused word-n-gram set overlap between two texts →
  * struct(inter:int, uni:int) in one pass (the composable
  * `split`/`transform`/`array_distinct`/`array_intersect` formulation in
  * [[graft.operators.Dedup.ngramOverlap]] is four interpreted
  * higher-order-function evaluations per row — measured as the slowest
  * query in the suite by 10×).
  *
  * Semantics replicated EXACTLY (same DuckDB oracle):
  *   - words = split on single space, empties kept;
  *   - a text with fewer than n words has an EMPTY gram set;
  *   - gram i = words[i..i+n-1] joined by "|"; sets are DISTINCT;
  *   - inter = |A ∩ B|, uni = |A| + |B| − inter.
  */
case class NgramOverlap(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {
  require(n >= 1)

  override def dataType: DataType = StructType(Seq(
    StructField("inter", IntegerType, nullable = false),
    StructField("uni", IntegerType, nullable = false)))

  /** distinct gram set of one text (insertion-ordered not needed — only
    * counts escape).
    */
  private def grams(text: String): java.util.HashSet[String] = {
    val out = new java.util.HashSet[String]()
    val words = text.split(" ", -1)
    if (words.length < n) return out
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + n <= words.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append('|')
        sb.append(words(i + j))
        j += 1
      }
      out.add(sb.toString)
      i += 1
    }
    out
  }

  def convert(a: UTF8String, b: UTF8String): GenericInternalRow = {
    val ga = grams(a.toString)
    val gb = grams(b.toString)
    var inter = 0
    val it = gb.iterator()
    while (it.hasNext) if (ga.contains(it.next())) inter += 1
    new GenericInternalRow(Array[Any](inter, ga.size + gb.size - inter))
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    convert(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ng", this, classOf[NgramOverlap].getName)
    defineCodeGen(ctx, ev, (a, b) =>
      s"(org.apache.spark.sql.catalyst.InternalRow) $ref.convert($a, $b)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object NgramOverlap {
  def apply(a: Column, b: Column, n: Int): Column =
    GraftShim.column(NgramOverlap(GraftShim.expression(a), GraftShim.expression(b), n))
}

/** All word `n`-grams of a text, positions implicit (gram i starts at
  * 1-based word offset i+1 after posexplode) — ONE fused pass building
  * every gram string directly from the input bytes (the
  * `transform(sequence…, slice+concat_ws)` formulation is
  * CodegenFallback-interpreted per element and was measured 5× slower on
  * the repeated-span queries). Rows with fewer than `n` words return an
  * empty array. Split is on single spaces, like `split(text, " ")`.
  */
case class WordGrams(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(n >= 1, s"n-gram width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  def grams(input: UTF8String): Any = {
    val text = input.toString
    // word start offsets (split on single space — empty words preserved,
    // matching split(text, " "))
    val starts = scala.collection.mutable.ArrayBuffer(0)
    var i = 0
    while (i < text.length) {
      if (text.charAt(i) == ' ') starts += i + 1
      i += 1
    }
    val words = starts.length
    if (words < n) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new Array[Any](words - n + 1)
    var g = 0
    while (g <= words - n) {
      val end = if (g + n == words) text.length else starts(g + n) - 1
      out(g) = UTF8String.fromString(text.substring(starts(g), end))
      g += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    grams(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wg", this, classOf[WordGrams].getName)
    defineCodeGen(ctx, ev, input =>
      s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.grams($input)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordGrams {
  def apply(c: Column, n: Int): Column =
    GraftShim.column(WordGrams(GraftShim.expression(c), n))
}
