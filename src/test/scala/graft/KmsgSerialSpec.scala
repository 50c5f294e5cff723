package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.{Kmsg, Serial}

/** in_kmsg parse semantics and in_serial record formation, plus their
  * conf faces.
  */
class KmsgSerialSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("kmsg parse: priority mask, monotonic split, boot offset, flags field ignored, fail paths drop") {
    val lines = Seq(
      "14,101,5500123,-;usb 1-1: new device",   // 14 & 7 = 6; flags '-'
      "6,102,999999;plain",                     // sec 0, usec 999999
      "3,103,2000001;semi;colons;in msg",       // msg keeps later ';'s
      "no-numeric-header;dropped",              // strtol fail
      "6,104,123456 no separator dropped",      // strchr(';') fail
      "6,x,1;dropped"                           // sequence not numeric
    ).toDF("line").withColumn("tag", lit("k.0"))
    val out = Kmsg.parse(lines, "line", bootSec = 1000000L)
      .orderBy("sequence").collect()
    assert(out.length == 3)
    val r0 = out(0)
    assert(r0.getAs[Long]("priority") == 6L)    // 14 & 7
    assert(r0.getAs[Long]("sequence") == 101L)
    assert(r0.getAs[Long]("sec") == 5L)
    assert(r0.getAs[Long]("usec") == 500123L)
    assert(r0.getAs[String]("msg") == "usb 1-1: new device")
    assert(r0.getAs[String]("tag") == "k.0")    // non-line columns pass through
    // event time = (boot + sec) * 1e6 + usec
    val us0 = Kmsg.parse(lines, "line", bootSec = 1000000L)
      .orderBy("sequence").select(unix_micros(col("ts"))).as[Long].collect()
    assert(us0(0) == (1000000L + 5L) * 1000000L + 500123L)
    assert(out(1).getAs[Long]("usec") == 999999L)
    assert(out(1).getAs[Long]("sec") == 0L)
    assert(out(2).getAs[String]("msg") == "semi;colons;in msg")
  }

  test("serial segmentsLocal == segments (Column): empties skipped, tail dropped, NUL/CR strip") {
    val cases = Seq(
      "a|b||c|tail",            // -> a, b, c
      0.toChar + "\r|x|",            // NUL then CR stripped; leading empty seg skipped -> x
      "no-separator-at-all",    // -> nothing (stays buffered)
      "||||",                   // -> nothing
      "\nCRLF-start|y|"         // LF stripped -> CRLF-start, y
    )
    val expected = Seq(
      Seq("a", "b", "c"),
      Seq("x"),
      Seq(),
      Seq(),
      Seq("CRLF-start", "y"))
    assert(cases.map(Serial.segmentsLocal(_, "|")) == expected)
    val viaCol = cases.toDF("s")
      .select(Serial.segments(col("s"), "|").as("segs"))
      .as[Seq[String]].collect().toSeq
    assert(viaCol == expected)
    // multi-char separator
    assert(Serial.segmentsLocal("aa<SEP>bb<SEP>cc", "<SEP>") == Seq("aa", "bb"))
  }

  test("serial jsonStream: PART keeps the complete prefix, INVAL fails the whole buffer (flb_pack.c:274-310)") {
    assert(Serial.jsonStream("""{"a":1}{"b":2}""") == Seq("""{"a":1}""", """{"b":2}"""))
    assert(Serial.jsonStream(""""s1" 42 [1,2]""") == Seq("s1", "42", "[1,2]"))
    // EOF mid-value = FLB_ERR_JSON_PART: the PART-salvage loop keeps the
    // complete top-level values before the cut
    assert(Serial.jsonStream("""{"a":1}{"b":""") == Seq("""{"a":1}"""))
    // an INVALID token = FLB_ERR_JSON_INVAL: strict jsmn tokenises the
    // full buffer first, so even the valid prefix emits NOTHING
    assert(Serial.jsonStream("""{"a":1}garbage""") == Seq())
    assert(Serial.jsonStream("""{"b": partial""") == Seq()) // 'p' is INVAL, not PART
    assert(Serial.jsonStream("garbage") == Seq())
    // the pre-dispatch NUL strip applies to json mode too (FTDI handshake)
    assert(Serial.jsonStream(0.toChar + """{"k":9}""") == Seq("""{"k":9}"""))
  }

  test("conf faces: [INPUT] kmsg Path capture and [INPUT] serial File with Separator / Format json") {
    val dir = java.nio.file.Files.createTempDirectory("graft-kmsg-serial")
    val kmsgFile = dir.resolve("kmsg.capture")
    java.nio.file.Files.writeString(kmsgFile,
      "14,7,1500000,-;first\n6,8,2750000;second\n")
    val kout = graft.run.ConfPipeline.load(spark,
      s"[INPUT]\n    Name kmsg\n    Path $kmsgFile\n    Boot_Sec 100\n    Tag kk\n", "")
      .filtered.orderBy("sequence").collect()
    assert(kout.length == 2)
    assert(kout(0).getAs[Long]("priority") == 6L && kout(0).getAs[String]("msg") == "first")
    assert(kout(1).getAs[Long]("sec") == 2L && kout(1).getAs[Long]("usec") == 750000L)
    assert(kout.forall(_.getAs[String]("tag") == "kk"))

    val serFile = dir.resolve("serial.bytes")
    java.nio.file.Files.writeString(serFile, "m1;;m2;unterminated")
    val sout = graft.run.ConfPipeline.load(spark,
      s"[INPUT]\n    Name serial\n    File $serFile\n    Separator ;\n", "")
      .filtered.orderBy("msg").collect()
    assert(sout.map(_.getAs[String]("msg")).toSeq == Seq("m1", "m2"))
    assert(sout.forall(_.getAs[String]("tag") == "serial.0"))

    val jsonFile = dir.resolve("serial.json")
    java.nio.file.Files.writeString(jsonFile, """{"k":1}{"k":2}""")
    val jout = graft.run.ConfPipeline.load(spark,
      s"[INPUT]\n    Name serial\n    File $jsonFile\n    Format json\n", "")
      .filtered.orderBy("msg").collect()
    assert(jout.map(_.getAs[String]("msg")).toSeq == Seq("""{"k":1}""", """{"k":2}"""))
  }
}
