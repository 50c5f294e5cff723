package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{EsIdFunctions, Murmur3}

/** ES `Generate_ID` (`plugins/out_es/es.c:283-287`): MurmurHash3_x64_128
  * seed 42 over the msgpack-serialized, dot-sanitized record, formatted as
  * a UUID-shaped string. Expected values below were produced by COMPILING
  * the reference's vendored `murmur3.c` + the exact es.c snprintf and
  * feeding it these byte strings — a byte-exact fixture oracle (same
  * method as fb_forward_frame's hex fixtures).
  */
class EsIdSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // (input bytes as hex, expected es_uuid) from the compiled reference —
  // covers the empty input, sub-block tails in both k1 (<=8) and k2 (9..15)
  // ranges, one exact block, block+1, and a multi-block+tail input
  private val refVectors = Seq(
    "" -> "8523fa1b-a77d-f02a-cbb9-da116610d101",
    "61" -> "26b0fdf6-9ca4-2825-2b15-25f8ca9125eb",
    "6162" -> "8825e423-f219-d480-2354-97d25fdb251c",
    "68656c6c6f" -> "6f0860af-b3c9-c4b8-bc7a-b0efb8752334",
    "68656c6c6f20776f726c642c206d75726d757233" -> "bfe007fe-3785-7619-6230-295543aba50e",
    "30313233343536373839616263646566" -> "b2a4ed3c-a26b-818e-9fde-f926d245f604",
    "3031323334353637383961626364656667" -> "cb7cf707-4105-d714-a7db-2f17b28d4981",
    "000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f2021222324" ->
      "db57626b-66d8-7a44-6257-c6296bc3191e")

  private def unhex(h: String): Array[Byte] =
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("Murmur3.esUuid matches the compiled reference byte-for-byte") {
    refVectors.foreach { case (hex, expect) =>
      assert(Murmur3.esUuid(unhex(hex)) == expect, s"input 0x$hex")
    }
  }

  test("EsId column: sanitize + msgpack + murmur3 — reference-verified fixture") {
    // record {"log.level": "3", "msg": "m 3"} sanitizes to log_level and
    // packs to 82 a9 6c6f675f6c6576656c a1 33 a3 6d7367 a3 6d2033 — the
    // compiled reference hashes that buffer to the uuid below
    val df = Seq(1).toDF("id").select(
      map(lit("log.level"), lit("3"), lit("msg"), lit("m 3")).as("rec"))
    val got = df.select(EsIdFunctions.esId(col("rec"))).as[String].collect()(0)
    assert(got == "331e5784-bea2-3a7d-3cc0-0936157cbf3b")
  }

  test("EsIdWithTime: the full es.c Generate_ID buffer (time key first) — reference fixtures") {
    // the compiled reference over map(3){@timestamp: strftime+'.msZ', log_level, msg}
    // with sec = 1500322623 + seq, msec = seq: es.c:229-245 packs the time
    // entry BEFORE es_pack_map_content under a map_size+1 header
    val expect = Seq(
      0L -> "79ca080b-73f7-3c6d-48dc-7da1a7100700",
      1L -> "8770d44a-405c-68a5-bd41-07583bc4e561",
      5L -> "10726384-7415-dd3f-c705-cabd8f46c51d")
    val df = expect.map(_._1).toDF("seq").select(col("seq"),
      EsIdFunctions.esIdWithTime(
        map(lit("log.level"), (col("seq") % 6).cast("string"),
          lit("msg"), concat(lit("m "), col("seq").cast("string"))),
        lit(1500322623L) + col("seq") % 3600,
        col("seq") % 1000).as("id"))
    val got = df.as[(Long, String)].collect().toMap
    expect.foreach { case (s, u) => assert(got(s) == u, s"seq $s") }
  }

  test("EsIdWithTime msec is UNPADDED and timestamp-sensitive") {
    // es.c:239 prints '.%" PRIu64 "Z' — msec 7 → ".7Z" (NOT ".007Z");
    // same record at different times must hash differently
    val rec = map(lit("k"), lit("v"))
    val r = Seq(1).toDF("i").select(
      EsIdFunctions.esIdWithTime(rec, lit(100L), lit(7L)).as("a"),
      EsIdFunctions.esIdWithTime(rec, lit(100L), lit(70L)).as("b"),
      EsIdFunctions.esIdWithTime(rec, lit(101L), lit(7L)).as("c"))
      .as[(String, String, String)].collect()(0)
    assert(r._1 != r._2 && r._1 != r._3 && r._2 != r._3)
  }

  test("EsId is deterministic and content-sensitive (idempotent upsert key)") {
    val df = Seq(("a", "1"), ("a", "1"), ("a", "2")).toDF("k", "v")
      .select(EsIdFunctions.esId(map(col("k"), col("v"))).as("id"))
    val ids = df.as[String].collect()
    assert(ids(0) == ids(1) && ids(0) != ids(2))
    // null values pack as msgpack nil, distinct from the empty string
    val n = Seq(1).toDF("id").select(
      EsIdFunctions.esId(map(lit("k"), lit(null).cast("string"))).as("a"),
      EsIdFunctions.esId(map(lit("k"), lit(""))).as("b"))
      .as[(String, String)].collect()(0)
    assert(n._1 != n._2)
  }
}
