package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused token-hash expressions for the dedup hot path.
  *
  * The composable `transform`/`aggregate` higher-order functions are
  * CodegenFallback in Spark — every lambda application is interpreted, so
  * a MinHash-8 + SimHash-16 projection over 8M rows ran at ~180k rows/s.
  * These expressions compute the identical formulas in tight JVM loops
  * over the raw int array (one pass per row, no per-element closures).
  * Formulas match [[graft.operators.Dedup]] exactly (same DuckDB oracles):
  *
  *   - shingle s_i = ((t_i·31 + t_{i+1})·31 + t_{i+2}) mod P
  *   - minhash_j  = min_i (s_i·(2j+1) + 7919·j) mod P   (P when <3 tokens)
  *   - simhash bit b = [ Σ_t (bit_b((t·2654435761) mod 2³²)·2 − 1) > 0 ]
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  import MinHashSig.P

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  def convert(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](numHashes)
    if (n < 3) {
      java.util.Arrays.fill(out, P)
      return new GenericArrayData(out)
    }
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    var t0 = arr.getInt(0).toLong
    var t1 = arr.getInt(1).toLong
    while (i + 2 < n) {
      val t2 = arr.getInt(i + 2).toLong
      val s = ((t0 * 31L + t1) * 31L + t2) % P
      var j = 0
      while (j < numHashes) {
        val h = (s * (2L * j + 1) + 7919L * j) % P
        if (h < out(j)) out(j) = h
        j += 1
      }
      t0 = t1; t1 = t2
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = convert(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mh", this, classOf[MinHashSig].getName)
    defineCodeGen(ctx, ev, input =>
      s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.convert($input)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  val P: Long = 1000000007L
  def apply(c: Column, numHashes: Int): Column =
    GraftShim.column(MinHashSig(GraftShim.expression(c), numHashes))
}

case class SimHash64(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 63)

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  def convert(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val h = (arr.getInt(i).toLong * 2654435761L) % 4294967296L
      var b = 0
      while (b < bits) {
        if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any = convert(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sh", this, classOf[SimHash64].getName)
    defineCodeGen(ctx, ev, input => s"$ref.convert($input)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  def apply(c: Column, bits: Int): Column =
    GraftShim.column(SimHash64(GraftShim.expression(c), bits))
}

/** Per-row token digest: left fold h ← (h·31 + t) mod P over the int
  * token array — the portable per-row invariant the BASELINE token-
  * passthrough check compares across engines (DuckDB recomputes it with
  * `list_reduce`). Fused for the same CodegenFallback reason as above.
  */
case class TokenFold(child: Expression) extends UnaryExpression {
  import MinHashSig.P

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  def convert(arr: ArrayData): Long = {
    val n = arr.numElements()
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h * 31L + arr.getInt(i)) % P
      i += 1
    }
    h
  }

  override def nullSafeEval(input: Any): Any = convert(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tf", this, classOf[TokenFold].getName)
    defineCodeGen(ctx, ev, input => s"$ref.convert($input)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenFold {
  def apply(c: Column): Column =
    GraftShim.column(TokenFold(GraftShim.expression(c)))
}
