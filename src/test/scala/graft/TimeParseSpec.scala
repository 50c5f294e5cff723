package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.TimeParse

/** Time-lookup vectors ported verbatim from the reference internal suite
  * (`tests/internal/parser.c:55-99`; expected epochs included there). The
  * reference injects the WALL-CLOCK year for no-%Y formats
  * (`src/flb_parser.c:650-656`); these vectors were generated in 2017, which
  * is exactly [[TimeParse.RefYear]] — determinism preserved.
  */
class TimeParseSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** (format, raw string, expected epoch seconds, expected frac, fixed utc offset) */
  val vectors: Seq[(String, String, Long, Double, Int)] = Seq(
    // no-year (old syslog), fixed UTC offset -0600
    ("%b %d %H:%M:%S", "Feb 16 04:06:58", 1487239618L, 0.0, -21600),
    ("%b %d %H:%M:%S.%L", "Feb 16 04:06:58.1234", 1487239618L, 0.1234, -21600),
    // no-year with timezone in the string
    ("%b %d %H:%M:%S %z", "Feb 16 04:06:58 -0600", 1487239618L, 0.0, 0),
    ("%b %d %H:%M:%S.%L %z", "Feb 16 04:06:58.1234 -0600", 1487239618L, 0.1234, 0),
    // same instant across timezones
    ("%m/%d/%Y %H:%M:%S %z", "07/17/2017 20:17:03 +0000", 1500322623L, 0.0, 0),
    ("%m/%d/%Y %H:%M:%S %z", "07/18/2017 01:47:03 +0530", 1500322623L, 0.0, 0),
    ("%m/%d/%Y %H:%M:%S %z", "07/18/2017 01:47:03 +05:30", 1500322623L, 0.0, 0),
    ("%m/%d/%Y %H:%M:%S %z", "07/18/2017 05:17:03 +0900", 1500322623L, 0.0, 0),
    ("%m/%d/%Y %H:%M:%S %z", "07/17/2017 22:17:03 +0200", 1500322623L, 0.0, 0),
    ("%m/%d/%Y %H:%M:%S.%L %z", "07/17/2017 22:17:03.1 +0200", 1500322623L, 0.1, 0),
    ("%m/%d/%Y %H:%M:%S.%L %z", "07/17/2017 22:17:03.1 +02:00", 1500322623L, 0.1, 0),
    // fixed UTC offsets (Time_Offset config)
    ("%m/%d/%Y %H:%M:%S", "07/18/2017 01:47:03", 1500322623L, 0.0, 19800),
    ("%m/%d/%Y %H:%M:%S", "07/18/2017 05:17:03", 1500322623L, 0.0, 32400),
    ("%m/%d/%Y %H:%M:%S", "07/17/2017 22:17:03", 1500322623L, 0.0, 7200),
    ("%m/%d/%Y %H:%M:%S.%L", "07/17/2017 22:17:03.1", 1500322623L, 0.1, 7200),
    // default UTC, literal Z suffix
    ("%m/%d/%Y %H:%M:%S", "07/17/2017 20:17:03", 1500322623L, 0.0, 0),
    ("%m/%d/%Y %H:%M:%SZ", "07/17/2017 20:17:03Z", 1500322623L, 0.0, 0),
    ("%m/%d/%Y %H:%M:%S.%LZ", "07/17/2017 20:17:03.1234Z", 1500322623L, 0.1234, 0)
  )

  test("reference time vectors parse to exact epochs (+frac at µs)") {
    import spark.implicits._
    vectors.zipWithIndex.foreach { case ((fmt, raw, epoch, frac, off), i) =>
      val df = Seq(raw).toDF("t")
      val got = df.select(unix_micros(TimeParse.parse(col("t"), fmt, off)).as("us"))
        .collect()(0)
      assert(!got.isNullAt(0), s"vector $i ($fmt / $raw) parsed to null")
      val expectedUs = epoch * 1000000L + math.round(frac * 1000000L)
      assert(got.getLong(0) == expectedUs,
        s"vector $i ($fmt / $raw): got ${got.getLong(0)}, want $expectedUs")
    }
  }

  test("timezone offset forms: ±HHMM, ±HH:MM, Z (flb_parser_tzone_offset vectors)") {
    import spark.implicits._
    val cases = Seq( // tests/internal/parser.c:25-38
      ("+0000", 0), ("+00:00", 0), ("+00:59", 3540), ("-0600", -21600), ("-06:00", -21600))
    cases.foreach { case (tz, diff) =>
      val raw = s"07/17/2017 20:17:03 $tz"
      val got = Seq(raw).toDF("t")
        .select(unix_timestamp(TimeParse.parse(col("t"), "%m/%d/%Y %H:%M:%S %z")).as("s"))
        .collect()(0).getLong(0)
      // same wall-clock digits at offset `diff` → epoch shifts by -diff
      assert(got == 1500322623L - diff, s"tz $tz: got $got want ${1500322623L - diff}")
    }
  }

  test("syslog rfc3164 space-padded day parses") {
    import spark.implicits._
    val got = Seq("Feb  6 04:06:58").toDF("t")
      .select(unix_timestamp(TimeParse.parse(col("t"), "%b %d %H:%M:%S")).as("s"))
      .collect()(0)
    assert(!got.isNullAt(0))
    // 2017-02-06T04:06:58Z
    assert(got.getLong(0) == 1486354018L)
  }
}
