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

/** CONTENT-ONLY ES-style document id: msgpack of the dot-sanitized record
  * (`es_pack_map_content`, `es.c:40-110`: `.` → `_`) hashed with
  * MurmurHash3_x64_128 seed 42, UUID-formatted like `es.c:285-286`.
  * Deterministic per record content → idempotent upserts keyed on content
  * alone. NOT wire-compatible with ids the reference engine emits: the
  * reference hashes a buffer that also carries the injected time key (and
  * tag key when enabled) — use [[EsIdWithTime]] for byte-exact parity.
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

/** The FULL-FIDELITY ES `Generate_ID` (`plugins/out_es/es.c:229-287`):
  * hashes exactly the buffer the reference builds per record —
  *
  *   map(map_size + 1 [+ 1 with tag]) {
  *     time_key: strftime(time_key_format, gmtime(sec)) + ".<msec>Z",
  *     [tag_key: tag,]
  *     ...dot-sanitized record content (es_pack_map_content)...
  *   }
  *
  * The msec fraction is printed UNPADDED (`".%" PRIu64 "Z"`, es.c:239-241
  * — `.7Z`, not `.007Z`), and defaults mirror `es.h:29-30`
  * (`@timestamp`, `%Y-%m-%dT%H:%M:%S`). MurmurHash3_x64_128 seed 42 over
  * those bytes, UUID-formatted as eight LE uint16 words. Ids equal what a
  * reference es output with Generate_ID On produces for the same record +
  * timestamp (fixtures generated from the compiled vendored murmur3.c over
  * this exact layout).
  *
  * strftime subset: `%Y %m %d %H %M %S %T %%` + literals — the specifiers
  * the default and logstash-style formats use.
  */
case class EsIdWithTime(record: Expression, sec: Expression, msec: Expression,
                        timeKey: String = "@timestamp",
                        timeKeyFormat: String = "%Y-%m-%dT%H:%M:%S",
                        tag: Option[(String, String)] = None)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def first: Expression = record
  override def second: Expression = sec
  override def third: Expression = msec

  private def strftime(format: String, epochSec: Long): String = {
    val t = java.time.LocalDateTime.ofEpochSecond(epochSec, 0, java.time.ZoneOffset.UTC)
    val sb = new java.lang.StringBuilder(format.length + 8)
    var i = 0
    while (i < format.length) {
      val c = format.charAt(i)
      if (c == '%' && i + 1 < format.length) {
        format.charAt(i + 1) match {
          case 'Y' => sb.append(t.getYear)
          case 'm' => sb.append(f"${t.getMonthValue}%02d")
          case 'd' => sb.append(f"${t.getDayOfMonth}%02d")
          case 'H' => sb.append(f"${t.getHour}%02d")
          case 'M' => sb.append(f"${t.getMinute}%02d")
          case 'S' => sb.append(f"${t.getSecond}%02d")
          case 'T' => sb.append(f"${t.getHour}%02d:${t.getMinute}%02d:${t.getSecond}%02d")
          case '%' => sb.append('%')
          case o   => sb.append('%').append(o)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  def compute(mo: Any, secV: Long, msecV: Long): Any = {
    val m = mo.asInstanceOf[MapData]
    val out = new ByteArrayOutputStream(96)
    val extra = 1 + (if (tag.isDefined) 1 else 0)
    Msgpack.packMapHeader(out, m.numElements() + extra)
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    Msgpack.packStr(out, timeKey.getBytes(utf8))
    Msgpack.packStr(out, (strftime(timeKeyFormat, secV) + s".${msecV}Z").getBytes(utf8))
    tag.foreach { case (k, v) =>
      Msgpack.packStr(out, k.getBytes(utf8))
      Msgpack.packStr(out, v.getBytes(utf8))
    }
    Msgpack.packRecordContent(out, m, keyXform = _.replace('.', '_'))
    UTF8String.fromString(Murmur3.esUuid(out.toByteArray))
  }

  override def nullSafeEval(m: Any, s: Any, ms: Any): Any =
    compute(m, s.asInstanceOf[Long], ms.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("esidt", this, classOf[EsIdWithTime].getName)
    nullSafeCodeGen(ctx, ev, (m, s, ms) =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.compute($m, $s, $ms);")
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
                                                 t: Expression): Expression =
    copy(record = f, sec = s, msec = t)
}

object EsIdFunctions {
  /** Column face: deterministic content-only `_id` of a map record. */
  def esId(record: Column): Column = GraftShim.column(EsId(GraftShim.expression(record)))

  /** Column face: reference-exact Generate_ID (record + epoch sec + msec). */
  def esIdWithTime(record: Column, sec: Column, msec: Column,
                   timeKey: String = "@timestamp",
                   timeKeyFormat: String = "%Y-%m-%dT%H:%M:%S",
                   tag: Option[(String, String)] = None): Column =
    GraftShim.column(EsIdWithTime(
      GraftShim.expression(record),
      GraftShim.expression(sec.cast("long")),
      GraftShim.expression(msec.cast("long")),
      timeKey, timeKeyFormat, tag))
}
