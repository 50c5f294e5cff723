package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** C-style string unescaping — the `escaped` / `escaped_utf8` decoder
  * backends (reference `src/flb_parser_decoder.c`: escape table
  * `:178-229`, `escaped` at `:269-282`, `escaped_utf8` `\uXXXX`→UTF-8 at
  * `:138-176, 284-296`). One sequential pass (a `regexp_replace` chain
  * cannot reproduce sequential escape consumption: `\\n` must become
  * literal `\n`-the-two-chars… i.e. backslash+n, not a newline).
  *
  * @param utf8 also decode `\uXXXX` sequences (the `escaped_utf8` backend)
  */
case class UnescapeCString(child: Expression, utf8: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  def decode(input: UTF8String): UTF8String = {
    val s = input.toString
    if (s.indexOf('\\') < 0) return input // fast path: nothing escaped
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n'  => out.append('\n'); i += 2
          case 'r'  => out.append('\r'); i += 2
          case 't'  => out.append('\t'); i += 2
          case 'a'  => out.append('\u0007'); i += 2
          case 'b'  => out.append('\b'); i += 2
          case 'f'  => out.append('\f'); i += 2
          case 'v'  => out.append('\u000B'); i += 2
          case '\\' => out.append('\\'); i += 2
          case '"'  => out.append('"'); i += 2
          case '\'' => out.append('\''); i += 2
          case '?'  => out.append('?'); i += 2
          case 'u' if utf8 && i + 6 <= s.length =>
            try {
              out.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
              i += 6
            } catch {
              case _: NumberFormatException => out.append(c); i += 1
            }
          case other =>
            // unknown escape: keep both chars (reference keeps unknown
            // sequences intact)
            out.append(c).append(other); i += 2
        }
      } else {
        out.append(c); i += 1
      }
    }
    UTF8String.fromString(out.toString)
  }

  override def nullSafeEval(input: Any): Any = decode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dec", this, classOf[UnescapeCString].getName)
    defineCodeGen(ctx, ev, input => s"$ref.decode($input)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Decoder rule surface (`Decode_Field_As <backend> <key>`): apply a
  * backend to a column in place; the `json` backend re-parses the decoded
  * text (callers chain `from_json`/`get_json_object` on the result).
  */
object Decoders {
  def escaped(c: Column): Column =
    GraftShim.column(UnescapeCString(GraftShim.expression(c), utf8 = false))

  def escapedUtf8(c: Column): Column =
    GraftShim.column(UnescapeCString(GraftShim.expression(c), utf8 = true))
}
