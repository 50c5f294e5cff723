package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sinks.FileFormat

/** Golden-bytes fixtures for the out_file formats — each expected string
  * is hand-derived from the reference C, cited per test. The `fb_file_*`
  * oracle rows re-check the same rendering against DuckDB at scale; these
  * goldens additionally pin the escape table and the raw-quote (NO escape)
  * behavior of msgpack_object_print that the ASCII-clean oracle fixtures
  * cannot distinguish.
  */
class FileFormatSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val bs = "\\" // avoid literal backslash-u sequences in source

  private def rec = Seq(
    ("app.log", 1500000000L, 123456000L, "hello", 5L, 0.25, true)
  ).toDF("tag", "sec", "nsec", "k1", "k2", "pi", "b")
    .withColumn("n", lit(null).cast("string"))

  private val cols = Seq("k1", "k2", "pi", "b", "n")

  test("csv line bytes (file.c:117-138, objectc.c:162-222)") {
    val got = rec.select(FileFormat.csvLine(rec, "sec", "nsec", cols))
      .as[String].head()
    assert(got == "1500000000.123456,\"hello\",5,0.250000,true,nil")
  }

  test("ltsv line bytes (file.c:140-168): quoted keys, quoted raw values") {
    val got = rec.select(FileFormat.ltsvLine(rec, "sec", "nsec", cols))
      .as[String].head()
    assert(got == "\"time\":1500000000.123456\t\"k1\":\"hello\"\t\"k2\":5" +
      "\t\"pi\":0.250000\t\"b\":true\t\"n\":nil")
  }

  test("json line bytes (file.c:216-229 + flb_pack.c:462-481 separators)") {
    val got = rec.select(FileFormat.jsonLine(rec, "tag", "sec", "nsec", cols))
      .as[String].head()
    assert(got == "app.log: [1500000000.123456, {\"k1\":\"hello\", \"k2\":5, " +
      "\"pi\":0.250000, \"b\":true, \"n\":null}]")
  }

  test("msgpack_object_print does NOT escape (objectc.c:202-206 raw fwrite)") {
    val df = Seq(("sa\"id", 1L, 0L)).toDF("v", "sec", "nsec")
    val got = df.select(FileFormat.csvLine(df, "sec", "nsec", Seq("v")))
      .as[String].head()
    assert(got == "1.000000,\"sa\"id\"")
  }

  test("json escape table (flb_utils_write_str, flb_utils.c:491-620)") {
    // quote/backslash prefixed; 0x07-0x0D named; other controls u00xx
    // lowercase; every codepoint >= 0x80 to full-codepoint hex, min-width
    // 4, NO surrogate pairs (U+1F600 prints 5 hex digits)
    val raw = "he\"llo\nx" + bs + "y\tz" + (0x01).toChar + "é" +
      new String(Character.toChars(0x1f600))
    val df = Seq((raw, 9L, 0L)).toDF("v", "sec", "nsec")
      .withColumn("tag", lit("t"))
    val got = df.select(FileFormat.jsonLine(df, "tag", "sec", "nsec", Seq("v")))
      .as[String].head()
    val expectedVal = "he" + bs + "\"llo" + bs + "nx" + bs + bs + "y" +
      bs + "tz" + bs + "u0001" + bs + "u00e9" + bs + "u1f600"
    assert(got == "t: [9.000000, {\"v\":\"" + expectedVal + "\"}]")
  }

  test("del + low controls escape as u007f-style, abtnvfr named") {
    val raw = Seq(0x07, 0x08, 0x0b, 0x0c, 0x0d, 0x7f, 0x1f).map(_.toChar).mkString
    val df = Seq((raw, 1L, 0L)).toDF("v", "sec", "nsec")
      .withColumn("tag", lit("t"))
    val got = df.select(FileFormat.jsonLine(df, "tag", "sec", "nsec", Seq("v")))
      .as[String].head()
    val expectedVal = bs + "a" + bs + "b" + bs + "v" + bs + "f" + bs + "r" +
      bs + "u007f" + bs + "u001f"
    assert(got == "t: [1.000000, {\"v\":\"" + expectedVal + "\"}]")
  }

  test("writeExact lays out per-tag dirs with newline-terminated lines") {
    val dir = Files.createTempDirectory("fileformat").toString
    val df = Seq(
      ("a.log", 1L, 0L, "x"),
      ("b.log", 2L, 500000000L, "y")
    ).toDF("tag", "sec", "nsec", "msg")
    FileFormat.writeExact(df, dir, "csv", "tag", "sec", "nsec", Seq("msg"))
    def bytesUnder(tag: String): String = {
      val d = Paths.get(dir, s"tag=$tag")
      val part = Files.list(d).filter(_.getFileName.toString.startsWith("part-"))
        .findFirst().get()
      new String(Files.readAllBytes(part), "UTF-8")
    }
    assert(bytesUnder("a.log") == "1.000000,\"x\"\n")
    assert(bytesUnder("b.log") == "2.500000,\"y\"\n")
  }

  test("nested arrays/maps: object_print {k=>v} vs msgpack2json {\"k\":v}") {
    val df = Seq((Seq("a", "b"), Map("k" -> 1), 1L, 0L))
      .toDF("arr", "m", "sec", "nsec").withColumn("tag", lit("t"))
    val csv = df.select(FileFormat.csvLine(df, "sec", "nsec", Seq("arr", "m")))
      .as[String].head()
    assert(csv == "1.000000,[\"a\", \"b\"],{\"k\"=>1}")
    val json = df.select(FileFormat.jsonLine(df, "tag", "sec", "nsec", Seq("arr", "m")))
      .as[String].head()
    assert(json == "t: [1.000000, {\"arr\":[\"a\", \"b\"], \"m\":{\"k\":1}}]")
  }

  test("binary values: msgpack_object_bin_print bytes (objectc.c:119-131)") {
    val df = Seq((Array[Byte]('h', '"', 0x01, 0xff.toByte), 1L, 0L))
      .toDF("b", "sec", "nsec")
    val got = df.select(FileFormat.csvLine(df, "sec", "nsec", Seq("b")))
      .as[String].head()
    assert(got == "1.000000,\"h" + bs + "\"" + bs + "x01" + bs + "xff\"")
  }

  test("stdout line bytes (stdout.c:55-59): raw sec.9-digit-nsec, {k=>v} record") {
    val df = Seq((7L, "t.log", 1500000000L, 5000L, "x", 3L))
      .toDF("cnt", "tag", "sec", "nsec", "k", "n")
    val got = df.select(FileFormat.stdoutLine(df, "cnt", "tag", "sec", "nsec", Seq("k", "n")))
      .as[String].head()
    assert(got == "[7] t.log: [1500000000.000005000, {\"k\"=>\"x\", \"n\"=>3}]")
  }

  test("plot line bytes (plot.c:160-171): %f value; strings rejected") {
    val df = Seq((1L, 500000000L, 42L, "s")).toDF("sec", "nsec", "v", "bad")
    val got = df.select(FileFormat.plotLine(df, "sec", "nsec", "v")).as[String].head()
    assert(got == "1.500000 42")
    intercept[IllegalArgumentException](FileFormat.plotLine(df, "sec", "nsec", "bad"))
  }

  test("es bulk chunk bytes (es_bulk.h:27 + es.c:210-245): unpadded MSEC fraction") {
    import graft.sinks.Sinks
    // es.c:215 converts tv_nsec to ms (/=1000000) BEFORE printing unpadded:
    // 123456789ns -> ".123Z"; 7ns -> ".0Z" (not ".7Z")
    val df = Seq((1500000000L, 123456789L, "log.level", 5L),
                 (1500000000L, 7L, "x", 1L)).toDF("sec", "nsec", "msg", "code")
    val got = df.select(Sinks.esBulkChunk(df, "sec", "nsec", Seq("msg", "code"),
      index = lit("fluent-bit"))).as[String].collect()
    assert(got(0) == "{\"index\":{\"_index\":\"fluent-bit\",\"_type\":\"flb_type\"}}\n" +
      "{\"@timestamp\":\"2017-07-14T02:40:00.123Z\", \"msg\":\"log.level\", \"code\":5}\n")
    assert(got(1).contains("\"@timestamp\":\"2017-07-14T02:40:00.0Z\""))
    // with Generate_ID: the _id rides in the action line
    val withId = df.select(Sinks.esBulkChunk(df, "sec", "nsec", Seq("msg", "code"),
      index = lit("i"), id = Some(lit("u-1")))).as[String].head()
    assert(withId.startsWith("{\"index\":{\"_index\":\"i\",\"_type\":\"flb_type\",\"_id\":\"u-1\"}}\n"))
  }

  test("influx line bytes (influxdb.c:88-278): null-skip, TRUE/FALSE, tagged keys") {
    import graft.sinks.Sinks
    val df = Seq(
      ("t", 3L, 10L, 500L, Option("a\"b"), 7L, true),
      ("t", 4L, 11L, 0L, Option.empty[String], -2L, false)
    ).toDF("tag", "sq", "sec", "nsec", "m", "n", "b")
    val got = df.orderBy("sq").select(Sinks.influxLine(
      df, "tag", "sq", "sec", "nsec", Seq("m", "n", "b"))).as[String].collect()
    assert(got(0) == "t,_seq=3 m=\"a" + bs + "\"b\",n=7,b=TRUE 10000000500")
    assert(got(1) == "t,_seq=4 n=-2,b=FALSE 11000000000")
    // Tag_Keys: tagged pair rides in the head, not the field set
    val tg = df.orderBy("sq").select(Sinks.influxLine(
      df, "tag", "sq", "sec", "nsec", Seq("m", "n", "b"),
      taggedKeys = Set("n"))).as[String].collect()
    assert(tg(1) == "t,_seq=4,n=-2 b=FALSE 11000000000")
  }
}
