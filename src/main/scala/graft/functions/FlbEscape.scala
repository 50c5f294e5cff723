package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JSON string escaping exactly as the reference's serializer does it
  * (`src/flb_utils.c:491-620`, `flb_utils_write_str`), used by
  * `flb_msgpack_to_json_str` for the out_file json format and the ES
  * bulk serializer:
  *
  *   - backslash and `"`        → backslash-prefixed
  *   - 0x07–0x0D                → `\a \b \t \n \v \f \r`
  *   - other < 0x20, and 0x7F   → backslash-u + 4 lowercase hex digits
  *   - every codepoint ≥ 0x80   → backslash-u + lowercase hex of the FULL
  *                                codepoint, min-width 4 — NO surrogate
  *                                pairs (a supplementary codepoint prints
  *                                5–6 hex digits; that is the reference's
  *                                `%04x` behavior)
  *
  * One sequential pass; ASCII-clean strings return the input buffer
  * untouched (zero-copy fast path).
  */
case class FlbJsonEscape(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  def escape(input: UTF8String): UTF8String = {
    // zero-copy fast path on the raw UTF-8 bytes (no String decode): any
    // byte ≥ 0x80 starts a multi-byte codepoint that must escape anyway,
    // so a single signed-byte scan decides cleanliness
    val n = input.numBytes
    var clean = true
    var j = 0
    while (clean && j < n) {
      val b = input.getByte(j)
      if (b < 0x20 || b == '\\' || b == '"' || b == 0x7f) clean = false
      j += 1
    }
    if (clean) return input
    val s = input.toString
    val out = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp == '\\' || cp == '"') out.append('\\').append(cp.toChar)
      else if (cp >= 0x07 && cp <= 0x0d) {
        out.append('\\').append("abtnvfr".charAt(cp - 0x07))
      } else if (cp < 0x20 || cp == 0x7f) {
        out.append(f"\\u$cp%04x")
      } else if (cp >= 0x80) {
        out.append(f"\\u$cp%04x") // full codepoint, no surrogates
      } else out.append(cp.toChar)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(out.toString)
  }

  override def nullSafeEval(input: Any): Any = escape(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("esc", this, classOf[FlbJsonEscape].getName)
    defineCodeGen(ctx, ev, input => s"$ref.escape($input)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FlbJsonEscape {
  def apply(c: Column): Column = GraftShim.column(FlbJsonEscape(GraftShim.expression(c)))
}

/** Binary values as `msgpack_object_print` renders them
  * (`lib/msgpack-2.1.3/src/objectc.c:119-131`, msgpack_object_bin_print):
  * `"` escaped, printable ASCII (0x20–0x7E) raw, every other byte as
  * `\\x` + two lowercase hex digits. Byte-exact for the csv/ltsv sink
  * paths.
  */
case class FlbBinPrint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  def render(bytes: Array[Byte]): UTF8String = {
    val out = new java.lang.StringBuilder(bytes.length + 8)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (b == '"') out.append("\\\"")
      else if (b >= 0x20 && b <= 0x7e) out.append(b.toChar)
      else out.append(f"\\x$b%02x")
      i += 1
    }
    UTF8String.fromString(out.toString)
  }

  override def nullSafeEval(input: Any): Any =
    render(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bp", this, classOf[FlbBinPrint].getName)
    defineCodeGen(ctx, ev, input => s"$ref.render($input)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FlbBinPrint {
  def apply(c: Column): Column = GraftShim.column(FlbBinPrint(GraftShim.expression(c)))
}
