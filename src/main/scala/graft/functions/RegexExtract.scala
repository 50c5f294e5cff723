package graft.functions

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass regex field extraction: match `pattern` once against the
  * input string and return a struct of all named capture groups (null
  * struct when the pattern does not match; null field when a group did
  * not participate).
  *
  * This is the Spark-native restatement of the reference's regex parser
  * (reference `src/flb_parser_regex.c:101-211`): there the Onigmo regex is
  * compiled ONCE at config time (`src/flb_parser.c:151-158`) and each
  * record is scanned once, every named group becoming a record key. The
  * built-in `regexp_extract` would re-run the match per projected group;
  * this expression matches once and emits the whole struct, and the
  * compiled `java.util.regex.Pattern` lives in the expression instance
  * (referenced from generated code via `addReferenceObj`) — no per-row
  * recompilation, whole-stage codegen friendly.
  */
case class RegexExtractStruct(child: Expression, pattern: String, groupNames: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType =
    StructType(groupNames.map(n => StructField(n, StringType, nullable = true)))

  override def nullable: Boolean = true

  @transient private lazy val compiled: Pattern = Pattern.compile(pattern)
  @transient private lazy val namesArr: Array[String] = groupNames.toArray

  override def nullSafeEval(input: Any): Any = {
    val m: Matcher = compiled.matcher(input.asInstanceOf[UTF8String].toString)
    if (!m.find()) null
    else {
      val vals = new Array[Any](namesArr.length)
      var i = 0
      while (i < namesArr.length) {
        val g = m.group(namesArr(i))
        vals(i) = if (g == null) null else UTF8String.fromString(g)
        i += 1
      }
      new GenericInternalRow(vals)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patRef = ctx.addReferenceObj("pattern", compiled, classOf[Pattern].getName)
    val namesRef = ctx.addReferenceObj("names", namesArr, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, input => {
      s"""
         |java.util.regex.Matcher m = $patRef.matcher($input.toString());
         |if (!m.find()) {
         |  ${ev.isNull} = true;
         |} else {
         |  Object[] vals = new Object[${namesArr.length}];
         |  for (int i = 0; i < ${namesArr.length}; i++) {
         |    String g = m.group($namesRef[i]);
         |    vals[i] = (g == null) ? null : org.apache.spark.unsafe.types.UTF8String.fromString(g);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RegexExtractStruct {
  private val NamedGroup = "\\(\\?<([a-zA-Z][a-zA-Z0-9]*)>".r

  /** Named capture groups in source order (what the reference turns into
    * record keys, `flb_parser_regex.c:44-99`).
    */
  def groupNamesOf(pattern: String): Seq[String] =
    NamedGroup.findAllMatchIn(pattern).map(_.group(1)).toSeq

  /** Column-level API: `regex_extract_struct($"line", apacheRegex)`. */
  def apply(c: Column, pattern: String): Column =
    GraftShim.column(
      RegexExtractStruct(GraftShim.expression(c), pattern, groupNamesOf(pattern)))
}

/** Count of non-overlapping matches of `pattern` in the input — value-
  * identical to `size(regexp_extract_all(text, pattern, 0))` (both walk
  * the same java.util.regex `find()` loop) but WITHOUT materializing an
  * array of match strings per row just to take its length: the built-in
  * form allocates every match as a UTF8String plus the array cell, which
  * is pure GC load on a count-only consumer (the BPE token counter scans
  * ~1 match per 4 input chars). Pattern compiled once per expression,
  * matcher reused per thread.
  */
case class RegexCount(child: Expression, pattern: String) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  @transient private lazy val compiled: Pattern = Pattern.compile(pattern)
  @transient private lazy val localMatcher: ThreadLocal[Matcher] =
    ThreadLocal.withInitial(() => compiled.matcher(""))

  def count(input: UTF8String): Int = {
    val m = localMatcher.get()
    m.reset(input.toString)
    var c = 0
    while (m.find()) c += 1
    c
  }

  override def nullSafeEval(input: Any): Any = count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rc", this, classOf[RegexCount].getName)
    defineCodeGen(ctx, ev, input => s"$ref.count($input)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RegexCount {
  def apply(c: Column, pattern: String): Column =
    GraftShim.column(RegexCount(GraftShim.expression(c), pattern))
}
