package graft

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sinks.{Forward, Msgpack}

/** Forward-protocol wire format vs the reference's packing
  * (`plugins/out_forward/forward.c:575-578` frame, `:491-493`
  * time-as-integer entries, `src/flb_time.c:102-146` EventTime fixext8)
  * — byte-exact vectors, no socket.
  */
class ForwardSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("frame bytes: [tag, [[EventTime, {k:v}]]] — exact layout") {
    val df = Seq(1).toDF("id").select(
      lit("app.x").as("tag"), lit(1500322623L).as("sec"), lit(0).as("nsec"),
      map(lit("k"), lit("v")).as("rec"), lit(1L).as("o"))
    val frame = Forward.frames(df, "tag", "sec", "nsec", "rec", "o")
      .select("frame").as[Array[Byte]].collect()(0)
    val want =
      "92" +                      // fixarray 2 (frame)
        "a5" + hex("app.x".getBytes) + // fixstr tag
        "91" +                    // fixarray 1 (entries)
        "92" +                    // fixarray 2 (entry)
        "d700596d1b3f00000000" +  // fixext8 EventTime sec=0x596d1b3f nsec=0
        "81" + "a16b" + "a176"    // fixmap1 {k: v}
    assert(hex(frame) == want)
  }

  test("Time_as_Integer entries pack the epoch as a minimal uint (forward.c:491-493)") {
    val df = Seq(1).toDF("id").select(
      lit("t").as("tag"), lit(1500322623L).as("sec"), lit(999).as("nsec"),
      map(lit("k"), lit("v")).as("rec"), lit(1L).as("o"))
    val frame = Forward.frames(df, "tag", "sec", "nsec", "rec", "o", timeAsInteger = true)
      .select("frame").as[Array[Byte]].collect()(0)
    // uint32 encoding 0xce + BE32; nsec dropped (integer time)
    assert(hex(frame) == "92" + "a174" + "91" + "92" + "ce596d1b3f" + "81a16ba176")
  }

  test("minimal-size encodings at the type boundaries (msgpack-c pack templates)") {
    def u(v: Long): String = { val o = new ByteArrayOutputStream(); Msgpack.packUint(o, v); hex(o.toByteArray) }
    assert(u(0) == "00" && u(127) == "7f")                      // positive fixint
    assert(u(128) == "cc80" && u(255) == "ccff")                // uint8
    assert(u(256) == "cd0100" && u(65535) == "cdffff")          // uint16
    assert(u(65536) == "ce00010000" && u(4294967295L) == "ceffffffff") // uint32
    assert(u(4294967296L) == "cf0000000100000000")              // uint64

    def s(n: Int): String = {
      val o = new ByteArrayOutputStream(); Msgpack.packStr(o, Array.fill(n)('a'.toByte))
      hex(o.toByteArray).take(10)
    }
    assert(s(31).startsWith("bf"))        // fixstr max
    assert(s(32).startsWith("d920"))      // str8
    assert(s(256).startsWith("da0100"))   // str16

    def m(n: Int): String = { val o = new ByteArrayOutputStream(); Msgpack.packMapHeader(o, n); hex(o.toByteArray) }
    def a(n: Int): String = { val o = new ByteArrayOutputStream(); Msgpack.packArrayHeader(o, n); hex(o.toByteArray) }
    assert(m(15) == "8f" && m(16) == "de0010")
    assert(a(15) == "9f" && a(16) == "dc0010" && a(65536) == "dd00010000")
  }

  test("round trip: frames() → parseFrames() recovers tag, time, and records exactly") {
    val df = spark.range(0, 500).select(
      concat(lit("app."), (col("id") % 3).cast("string")).as("tag"),
      (lit(1500322623L) + col("id") % 3600).as("sec"),
      ((col("id") * 7919) % 1000000000).cast("int").as("nsec"),
      map(lit("k"), col("id").cast("string"),
        lit("msg"), concat(lit("m "), col("id").cast("string"))).as("rec"),
      col("id").as("o"))
    val framed = Forward.frames(df, "tag", "sec", "nsec", "rec", "o")
    val back = Forward.parseFrames(framed.toDF(), "frame")
      .map(r => (r.tag, r.sec, r.nsec, r.record("k"), r.record("msg")))
      .collect().toSet
    val want = df.select(col("tag"), col("sec"), col("nsec").cast("long"),
        element_at(col("rec"), "k"), element_at(col("rec"), "msg"))
      .as[(String, Long, Long, String, String)].collect().toSet
    assert(back == want)
    // integer-time frames round trip too (nsec drops to 0 by design)
    val fi = Forward.frames(df, "tag", "sec", "nsec", "rec", "o", timeAsInteger = true)
    val backI = Forward.parseFrames(fi.toDF(), "frame").collect()
    assert(backI.length == 500 && backI.forall(_.nsec == 0L))
  }

  test("null record values pack as msgpack nil and round-trip; ext8 EventTime accepted") {
    val df = Seq(1).toDF("id").select(
      lit("t").as("tag"), lit(100L).as("sec"), lit(0).as("nsec"),
      map(lit("a"), lit("x"), lit("b"), lit(null).cast("string")).as("rec"),
      lit(1L).as("o"))
    val framed = Forward.frames(df, "tag", "sec", "nsec", "rec", "o")
    val frame = framed.select("frame").as[Array[Byte]].collect()(0)
    assert(hex(frame).contains("a162c0")) // key 'b' followed by nil (0xc0)
    val back = Forward.parseFrames(framed.toDF(), "frame").collect()(0)
    assert(back.record("a") == "x" && back.record("b") == null)
    // ext8 form of EventTime (0xc7 0x08 0x00 + payload) — the reference
    // accepts both encodings; rewrite the fixext8 and re-parse
    val fixIdx = hex(frame).indexOf("d700") / 2
    val ext8 = frame.take(fixIdx) ++ Array(0xc7.toByte, 0x08.toByte, 0x00.toByte) ++
      frame.slice(fixIdx + 2, frame.length)
    val (tag, entries) = graft.sinks.MsgpackDecode.unpackFrame(ext8)
    assert(tag == "t" && entries.head.sec == 100L)
  }

  test("frames(): one frame per tag, entries ordered by the sort key") {
    val df = Seq(
      ("app.a", 10L, 2L, "r2"), ("app.a", 10L, 1L, "r1"), ("db.x", 11L, 3L, "r3"))
      .toDF("tag", "sec", "seq", "v")
      .withColumn("nsec", lit(0))
      .withColumn("rec", map(lit("v"), col("v")))
    val out = Forward.frames(df, "tag", "sec", "nsec", "rec", "seq")
      .orderBy("tag").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_entries") == 2L)
    val fa = hex(out(0).getAs[Array[Byte]]("frame"))
    // two entries, r1 before r2 (ordered by seq), each a [EventTime, {v: rX}]
    assert(fa.contains(hex("r1".getBytes)) && fa.contains(hex("r2".getBytes)))
    assert(fa.indexOf(hex("r1".getBytes)) < fa.indexOf(hex("r2".getBytes)))
    assert(fa.startsWith("92" + "a5" + hex("app.a".getBytes) + "92")) // fixarray2, tag, 2 entries
  }
}
