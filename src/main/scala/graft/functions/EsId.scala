package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.sinks.Msgpack

/** MurmurHash3 x64 128-bit (Austin Appleby's public-domain algorithm — the
  * variant the reference vendors in `plugins/out_es/murmur3.c:235-313`).
  * Little-endian block reads, 64-bit wrap-around arithmetic (Java `Long`
  * wraps exactly like `uint64_t`). Verified byte-for-byte against the
  * reference implementation's output in EsIdSpec.
  */
object Murmur3 {

  private final val C1 = 0x87c37b91114253d5L
  private final val C2 = 0x4cf5ad432745937fL

  private def getLE(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }

  private def fmix64(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }

  /** (h1, h2) — the two output words of MurmurHash3_x64_128(data, seed). */
  def x64_128(data: Array[Byte], seed: Int): (Long, Long) = {
    val len = data.length
    val nblocks = len / 16
    var h1 = seed.toLong & 0xffffffffL
    var h2 = seed.toLong & 0xffffffffL

    var i = 0
    while (i < nblocks) {
      var k1 = getLE(data, i * 16)
      var k2 = getLE(data, i * 16 + 8)
      k1 *= C1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= C2; h1 ^= k1
      h1 = java.lang.Long.rotateLeft(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= C2; k2 = java.lang.Long.rotateLeft(k2, 33); k2 *= C1; h2 ^= k2
      h2 = java.lang.Long.rotateLeft(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      i += 1
    }

    val t = nblocks * 16
    val rem = len & 15
    var k1 = 0L
    var k2 = 0L
    var j = rem
    while (j >= 9) { k2 ^= (data(t + j - 1) & 0xffL) << (8 * (j - 9)); j -= 1 }
    if (rem >= 9) { k2 *= C2; k2 = java.lang.Long.rotateLeft(k2, 33); k2 *= C1; h2 ^= k2 }
    j = math.min(rem, 8)
    while (j >= 1) { k1 ^= (data(t + j - 1) & 0xffL) << (8 * (j - 1)); j -= 1 }
    if (rem >= 1) { k1 *= C1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= C2; h1 ^= k1 }

    h1 ^= len.toLong; h2 ^= len.toLong
    h1 += h2
    h2 += h1
    h1 = fmix64(h1)
    h2 = fmix64(h2)
    h1 += h2
    h2 += h1
    (h1, h2)
  }

  /** The es_uuid formatting of `es.c:285-286`: the 16 output bytes viewed
    * as eight native-endian (LE on every platform the reference ships)
    * uint16 words, printed `%04x%04x-%04x-%04x-%04x-%04x%04x%04x`.
    */
  def esUuid(data: Array[Byte], seed: Int = 42): String = {
    val (h1, h2) = x64_128(data, seed)
    def w(h: Long, k: Int): String = f"${(h >>> (16 * k)) & 0xffff}%04x"
    s"${w(h1, 0)}${w(h1, 1)}-${w(h1, 2)}-${w(h1, 3)}-${w(h2, 0)}-${w(h2, 1)}${w(h2, 2)}${w(h2, 3)}"
  }
}

/** The ES `Generate_ID` document id (`plugins/out_es/es.c:283-287`): the
  * record is serialized to msgpack with dot-sanitized keys
  * (`es_pack_map_content`, `es.c:40-110`: `.` → `_`), hashed with
  * MurmurHash3_x64_128 seed 42, and formatted as a UUID-shaped hex string.
  * Deterministic per record content → idempotent ES bulk upserts, the one
  * es-output feature with analytics value (exactly-once writes on retry).
  *
  * Input: `map<string,string>` record; null values pack as msgpack nil.
  */
case class EsId(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  def compute(mo: Any): Any = {
    val m = mo.asInstanceOf[MapData]
    val out = new ByteArrayOutputStream(64)
    Msgpack.packRecord(out, m, keyXform = _.replace('.', '_'))
    UTF8String.fromString(Murmur3.esUuid(out.toByteArray))
  }

  override def nullSafeEval(m: Any): Any = compute(m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("esid", this, classOf[EsId].getName)
    nullSafeCodeGen(ctx, ev, m =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.compute($m);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object EsIdFunctions {
  /** Column face: deterministic ES `_id` of a map record. */
  def esId(record: Column): Column = GraftShim.column(EsId(GraftShim.expression(record)))
}
