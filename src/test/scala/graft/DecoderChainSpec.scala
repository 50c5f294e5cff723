package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.DecoderChain
import graft.parsers.ParserConfLoader
import graft.parsers.ParserConfLoader.DecoderRule

/** Decoder rule-chain semantics vs `src/flb_parser_decoder.c:554-629`
  * (actions), `:320-358` (extra-keys append), `:471-479` (one success per
  * key), mirroring the docker `escaped → json` shape of
  * `tests/runtime/filter_parser` fixtures.
  */
class DecoderChainSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rec(pairs: (String, String)*) =
    Seq(1).toDF("id").withColumn("record",
      map(pairs.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*))

  private def run(df: org.apache.spark.sql.DataFrame, rules: Seq[DecoderRule]) =
    df.withColumn("record", DecoderChain(col("record"), rules))
      .select("record").collect()(0).getMap[String, String](0).toMap

  private def keysInOrder(df: org.apache.spark.sql.DataFrame, rules: Seq[DecoderRule]) =
    df.withColumn("record", DecoderChain(col("record"), rules))
      .select(map_keys(col("record"))).as[Seq[String]].collect()(0)

  val dockerChain = Seq(
    DecoderRule("escaped", "log", action = "do_next", inPlace = true),
    DecoderRule("json", "log", action = "", inPlace = false))

  test("docker chain: Decode_Field_As escaped do_next, then Decode_Field json appends extra keys") {
    val in = rec("log" -> """{\"k\": \"5\", \"msg\": \"hi there\"}""", "stream" -> "stdout")
    val out = run(in, dockerChain)
    assert(out("log") == """{"k": "5", "msg": "hi there"}""") // unescaped IN PLACE
    assert(out("stream") == "stdout")                          // untouched sibling
    assert(out("k") == "5")                                    // extra keys appended
    assert(out("msg") == "hi there")
    // extra keys land at the END, original order preserved
    assert(keysInOrder(in, dockerChain) == Seq("log", "stream", "k", "msg"))
  }

  test("non-JSON log: escaped applies, json Decode_Field fails, record keeps original keys") {
    val in = rec("log" -> """plain\ttext""", "stream" -> "stderr")
    val out = run(in, dockerChain)
    assert(out == Map("log" -> "plain\ttext", "stream" -> "stderr"))
  }

  test("try_next: failing json falls through to escaped; default action stops the chain") {
    val rules = Seq(
      DecoderRule("json", "log", action = "try_next", inPlace = true),
      DecoderRule("escaped", "log", action = "", inPlace = true),
      DecoderRule("json", "log", action = "", inPlace = false)) // never reached
    val out = run(rec("log" -> """{\"x\": \"1\"}"""), rules)
    assert(out("log") == """{"x": "1"}""") // rule 1 failed → rule 2 unescaped in place
    assert(!out.contains("x")) // rule 2's default action HALTED: rule 3 never ran
  }

  test("failure without try_next/do_next halts the chain (flb_parser_decoder.c:585-592)") {
    val rules = Seq(
      DecoderRule("json", "log", action = "", inPlace = true),
      DecoderRule("escaped", "log", action = "", inPlace = true))
    val out = run(rec("log" -> """not json\t"""), rules)
    assert(out("log") == """not json\t""") // json failed decisively → escaped never ran
  }

  test("one-success-per-key: a second Decode_Field do_next is skipped after a success") {
    val rules = Seq(
      DecoderRule("json", "data", action = "do_next", inPlace = false),
      DecoderRule("json", "data", action = "do_next", inPlace = false))
    val out = run(rec("data" -> """{"a": "1"}"""), rules)
    assert(out("a") == "1")
    assert(out("data") == """{"a": "1"}""") // original kept (Decode_Field, not _As)
  }

  test("extra-key conflict: decoded value wins (JSON-consumer view of duplicate msgpack keys)") {
    val rules = Seq(DecoderRule("json", "log", inPlace = false))
    val out = run(rec("log" -> """{"stream": "decoded"}""", "stream" -> "orig"), rules)
    assert(out("stream") == "decoded")
  }

  test("extra-key conflict with a JSON-NULL value still drops the original key (membership, not value-null)") {
    // {"stream": null}: the decoded extra map CONTAINS 'stream' with a null
    // VALUE — an element_at(..).isNull membership test would keep the
    // original key too and map_concat would throw on the duplicate
    val in = rec("log" -> """{\"k\": \"5\", \"stream\": null}""", "stream" -> "stdout")
    val out = run(in, dockerChain)
    assert(out("log") == """{"k": "5", "stream": null}""")
    assert(out("k") == "5")
    assert(out.contains("stream") && out("stream") == null) // decoded null wins
    assert(keysInOrder(in, dockerChain) == Seq("log", "k", "stream"))
  }

  test("missing key leaves the record untouched") {
    val out = run(rec("other" -> "v"), dockerChain)
    assert(out == Map("other" -> "v"))
  }

  test("loader rejects unknown decoder backends and actions at config time") {
    def conf(rule: String) =
      s"[PARSER]\n    Name d\n    Format json\n    $rule\n"
    intercept[IllegalArgumentException](
      ParserConfLoader.load(conf("Decode_Field_As mystery log")))
    intercept[IllegalArgumentException](
      ParserConfLoader.load(conf("Decode_Field json log do_other")))
  }

  test("loader parses Decode_Field(_As) with actions in encounter order") {
    val conf =
      """[PARSER]
        |    Name   d
        |    Format json
        |    Decode_Field_As   escaped    log    do_next
        |    Decode_Field      json       log
        |""".stripMargin
    val p = ParserConfLoader.load(conf)("d")
    assert(p.decoders == dockerChain)
  }
}
