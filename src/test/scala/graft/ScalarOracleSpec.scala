package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.Glob
import graft.operators.Grep
import graft.route.SinkSpec
import graft.run.{Pipeline, PipelineSpec}
import graft.sources.TokenTable

/** The BASELINE dual-implementation oracle: a SCALAR Scala
  * reimplementation of the whole pipeline (generator → apache parse →
  * grep → glob route), literal translations of the C semantics, executed
  * on the driver with no Spark — per-sink routed-row counts, `sum(n_tok)`
  * and per-row token-array equality must match the Spark engine exactly
  * (BASELINE.md rows 3–5).
  */
class ScalarOracleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val N = 20000L
  private val sinks = TokenTable.Sinks

  // ---- scalar reimplementation (NO Spark; plain Scala over row index) ----
  private val apacheRx = java.util.regex.Pattern.compile(
    graft.parsers.Parsers.apache.cleanRegex)

  case class ScalarRow(seq: Long, line: String, tokens: Vector[Int], nTok: Int, source: String)

  private def scalarRow(i: Long): ScalarRow = {
    val code = (i % 6) match { case 3 => 404; case 4 => 500; case 5 => 503; case _ => 200 }
    val size = (i * 131) % 9973
    val tsec = 1500322623L + i % 3600
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("dd/MMM/yyyy:HH:mm:ss", java.util.Locale.US)
      .withZone(java.time.ZoneOffset.UTC)
    val time = fmt.format(java.time.Instant.ofEpochSecond(tsec))
    val line = s"host-${i % 997} - user${i % 31} [$time +0000] " +
      "\"GET /p/" + i + " HTTP/1.1\" " + code + " " + size
    val hex64 = {
      val h = java.lang.Long.toHexString((i * 2654435761L) % 1152921504606846976L)
      ("0" * (64 - h.length)) + h
    }
    val source = (i % 100) match {
      case r if r < 55 => "app.frontend"
      case r if r < 80 => "app.backend"
      case r if r < 92 => "db.primary"
      case r if r < 97 => s"var.log.containers.web-${i % 10}_default_nginx-$hex64.log"
      case _           => "sys.kern"
    }
    val nTok = (1 + i % 64).toInt
    val tokens = (1 to nTok).map(j => ((i * 2654435761L + j * 40503L) % 50257L).toInt).toVector
    ScalarRow(i, line, tokens, nTok, source)
  }

  /** Scalar grep per the C decision chain on the parsed code field. */
  private def scalarKeep(r: ScalarRow): Boolean = {
    val m = apacheRx.matcher(r.line)
    if (!m.find()) return false // missing key → Regex rule drops
    val code = m.group("code")
    code != null && code.startsWith("5") // unanchored search of ^5
  }

  test("per-sink counts, sum(n_tok) and token arrays match the scalar C-semantics oracle") {
    // scalar side (driver, no Spark)
    val rows = (0L until N).map(scalarRow)
    val kept = rows.filter(scalarKeep)
    val scalarPerSink: Map[String, (Long, Long)] = sinks.map { case (name, glob) =>
      val routed = kept.filter(r => Glob.matches(r.source, glob))
      name -> (routed.size.toLong, routed.map(_.nTok.toLong).sum)
    }.toMap
    val scalarTokens: Map[Long, Vector[Int]] = kept.map(r => r.seq -> r.tokens).toMap

    // Spark side (the engine)
    val spec = PipelineSpec(
      grep = Seq(Grep.Regex("code", "^5")),
      sinks = sinks.map((SinkSpec.apply _).tupled))
    val routed = Pipeline.transform(TokenTable.synthetic(spark, N, 8), spec)
    val sparkPerSink = routed.groupBy(col("sink"))
      .agg(count(lit(1)), sum(col("n_tok")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(sparkPerSink == scalarPerSink)

    // per-row token-array equality through the full pipeline (sink_all view)
    val sparkTokens = routed.filter(col("sink") === "sink_all")
      .select(col("seq"), col("tokens"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toVector).toMap
    assert(sparkTokens.keySet == scalarTokens.keySet)
    val mismatched = sparkTokens.count { case (k, v) => scalarTokens(k) != v }
    assert(mismatched == 0, s"$mismatched rows with token-array mismatch")
  }

  test("generated CLF line and source match the scalar generator byte-for-byte") {
    val sample = TokenTable.synthetic(spark, 500, 4)
      .select("seq", "doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    sample.foreach { case (i, line, src) =>
      val s = scalarRow(i)
      assert(line == s.line, s"line mismatch at $i")
      assert(src == s.source, s"source mismatch at $i")
    }
  }
}
