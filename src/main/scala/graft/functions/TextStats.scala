package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass text statistics — the scale path for the text-
  * analysis operators (the composable `split`/`filter`/`aggregate`
  * formulations in [[graft.operators.TextAnalysis]] are higher-order
  * functions, i.e. CodegenFallback-interpreted per element; this computes
  * the identical values in one pass over the words).
  *
  * Semantics replicated EXACTLY (same DuckDB oracles):
  *   - words = split on single space, empties kept (Spark `split(s, " ")`)
  *   - n_uniq = distinct words; sum_wlen = Σ char lengths
  *   - n_punct = count of [.,!?;:] characters in the whole text
  *   - n_stop = case-SENSITIVE stopword membership
  *   - s_<lang> = case-insensitive marker membership per language
  *   - fp = left fold (h·31 + len(w)·96 + codepoint(w[0])) mod P
  */
case class TextStats(child: Expression) extends UnaryExpression {
  import graft.operators.TextAnalysis.{LangMarkers, P, Stopwords}

  private val fieldNames =
    Seq("n_words", "n_uniq", "sum_wlen", "n_punct", "n_stop") ++
      LangMarkers.map { case (l, _) => s"s_$l" } :+ "fp"

  override def dataType: DataType = StructType(
    fieldNames.map {
      case n @ ("sum_wlen" | "fp") => StructField(n, LongType, nullable = false)
      case n => StructField(n, IntegerType, nullable = false)
    })

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](); Stopwords.foreach(s.add); s
  }
  @transient private lazy val markerSets: Array[java.util.HashSet[String]] =
    LangMarkers.map { case (_, ws) =>
      val s = new java.util.HashSet[String](); ws.foreach(s.add); s
    }.toArray

  def convert(input: UTF8String): InternalRow = {
    val text = input.toString
    // punct over the whole text
    var punct = 0
    var i = 0
    while (i < text.length) {
      (text.charAt(i): @annotation.switch) match {
        case '.' | ',' | '!' | '?' | ';' | ':' => punct += 1
        case _ =>
      }
      i += 1
    }
    val words = text.split(" ", -1) // keep empties — Spark split semantics
    var nWords = 0
    var sumLen = 0L
    var nStop = 0
    val langs = new Array[Int](markerSets.length)
    var fp = 0L
    val uniq = new java.util.HashSet[String]()
    var w = 0
    while (w < words.length) {
      val word = words(w)
      // CODEPOINT length (Spark length()/DuckDB length() semantics) — Java
      // word.length counts UTF-16 units and would double supplementary chars
      val wlen = word.codePointCount(0, word.length).toLong
      nWords += 1
      sumLen += wlen
      uniq.add(word)
      if (stopSet.contains(word)) nStop += 1
      val lower = word.toLowerCase
      var m = 0
      while (m < markerSets.length) {
        if (markerSets(m).contains(lower)) langs(m) += 1
        m += 1
      }
      val first = if (word.isEmpty) 0L else word.codePointAt(0).toLong
      fp = (fp * 31L + (wlen * 96L + first)) % P
      w += 1
    }
    val vals = new Array[Any](5 + langs.length + 1)
    vals(0) = nWords
    vals(1) = uniq.size
    vals(2) = sumLen
    vals(3) = punct
    vals(4) = nStop
    var m = 0
    while (m < langs.length) { vals(5 + m) = langs(m); m += 1 }
    vals(5 + langs.length) = fp
    new GenericInternalRow(vals)
  }

  override def nullSafeEval(input: Any): Any = convert(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ts", this, classOf[TextStats].getName)
    defineCodeGen(ctx, ev, input =>
      s"(org.apache.spark.sql.catalyst.InternalRow) $ref.convert($input)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextStats {
  def apply(c: Column): Column =
    GraftShim.column(TextStats(GraftShim.expression(c)))
}
