package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic fixture lines for the parser corpus — one builder per
  * shipped parsers.conf definition (reference `conf/parsers.conf:1-93`).
  *
  * Each line is derived from the `documents` table's int64 `doc_id` with
  * engine-portable arithmetic only, so the DuckDB oracle reconstructs the
  * EXPECTED parse output independently (a stronger oracle than re-running
  * a second regex — see TokenTable.duckdbParsedCte for the pattern).
  */
object Fixtures {

  /** (seq) rows from the documents table. */
  def seqs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id").as("seq"))

  private val seq = col("seq")

  /** The apache status-code cycle shared with TokenTable. */
  private def codeStr: Column =
    when(seq % 6 === 3, "404").when(seq % 6 === 4, "500")
      .when(seq % 6 === 5, "503").otherwise("200")

  private def pad(c: Column, n: Int): Column = lpad(c.cast("string"), n, "0")

  /** nginx combined-log line (conf/parsers.conf:21-26 groups). */
  def nginxLine: Column = concat(
    lit("rem-"), (seq % 251).cast("string"),
    lit(" host-"), (seq % 97).cast("string"),
    lit(" user"), (seq % 31).cast("string"),
    lit(" [17/Jul/2017:20:17:"), pad(seq % 60, 2),
    lit(" +0000] \"GET /n/"), seq.cast("string"),
    lit(" HTTP/1.1\" "), codeStr,
    lit(" "), ((seq * 37) % 1009).cast("string"),
    lit(" \"http://r/"), (seq % 13).cast("string"),
    lit("\" \"ua-"), (seq % 7).cast("string"), lit("\""))

  /** apache2 line with referer + greedy agent (conf/parsers.conf:8-14). */
  def apache2Line: Column = concat(
    lit("host-a"), (seq % 89).cast("string"),
    lit(" - u"), (seq % 29).cast("string"),
    lit(" [17/Jul/2017:20:17:"), pad(seq % 60, 2),
    lit(" +0000] \"POST /a2/"), seq.cast("string"),
    lit(" HTTP/1.0\" "), codeStr,
    lit(" "), ((seq * 41) % 997).cast("string"),
    lit(" \"ref-"), (seq % 11).cast("string"),
    lit("\" \"agent "), (seq % 5).cast("string"), lit(" z\""))

  /** apache_error line; every 3rd row omits the optional pid/client
    * brackets (conf/parsers.conf:15-19).
    */
  def apacheErrorLine: Column = {
    val base = concat(
      lit("[Mon Jul 17 20:17:0"), (seq % 10).cast("string"),
      lit(" 2017] [lvl"), (seq % 4).cast("string"), lit("]"))
    val msg = concat(lit("core msg "), seq.cast("string"))
    when(seq % 3 === 0, concat(base, lit(" "), msg))
      .otherwise(concat(base,
        lit(" [pid "), (seq % 9999).cast("string"),
        lit("] [client 10.0.0."), (seq % 200).cast("string"),
        lit("] "), msg))
  }

  /** docker-daemon line with %L millis (conf/parsers.conf:43-50). */
  def dockerDaemonLine: Column = concat(
    lit("time=\"2017-07-17T20:17:03."), pad(seq % 1000, 3),
    lit("\" level=info msg=\"daemon event "), seq.cast("string"), lit("\""))

  /** syslog-rfc3164 (with host) line, no-year time (conf/parsers.conf:67-75). */
  def rfc3164Line: Column = concat(
    lit("<"), (seq % 192).cast("string"),
    lit(">Jul 17 20:17:"), pad(seq % 60, 2),
    lit(" host-"), (seq % 50).cast("string"),
    lit(" app"), (seq % 20).cast("string"),
    lit("["), (seq % 999).cast("string"),
    lit("]: message "), seq.cast("string"))

  /** mongodb line with %L millis + trailing `<ms>ms` (conf/parsers.conf:76-83). */
  def mongodbLine: Column = concat(
    lit("2017-07-17T20:17:03."), pad(seq % 1000, 3),
    lit(" I NETWORK [conn"), (seq % 100).cast("string"),
    lit("] query done "), (seq % 500).cast("string"), lit("ms"))

  /** generic-json record (conf/parsers.conf:27-32). */
  def jsonLine: Column = concat(
    lit("{\"k\": "), (seq % 100).cast("string"),
    lit(", \"name\": \"n-"), (seq % 10).cast("string"),
    lit("\", \"time\": \"17/Jul/2017:20:17:"), pad(seq % 60, 2),
    lit(" +0000\"}"))

  /** filter-kube-test tag (conf/parsers.conf:89-91); 64-hex digest shared
    * with TokenTable's kube tag formula.
    */
  def kubeTestTag: Column = concat(
    lit("abc.kubernetes.web-"), (seq % 10).cast("string"),
    lit("_ns"), (seq % 5).cast("string"),
    lit("_nginx-"),
    lpad(lower(hex((seq * 2654435761L) % 1152921504606846976L)), 64, "0"),
    lit(".log"))

  /** docker-style escaped JSON payload (what lands in the `log` field of
    * a docker json record): quotes escaped, decoded by the
    * `Decode_Field_As escaped log do_next` + `Decode_Field json log`
    * chain.
    */
  def dockerLogLine: Column = concat(
    lit("{\\\"k\\\": \\\""), (seq % 100).cast("string"),
    lit("\\\", \\\"msg\\\": \\\"m "), seq.cast("string"),
    lit("\\\"}"))

  /** syslog-rfc5424 line (conf/parsers.conf:52-58); %L millis, structured
    * data alternates `[id N]` / `-`.
    */
  def rfc5424Line: Column = concat(
    lit("<"), (seq % 192).cast("string"),
    lit(">1 2017-07-17T20:17:03."), pad(seq % 1000, 3),
    lit(" host-"), (seq % 50).cast("string"),
    lit(" app"), (seq % 20).cast("string"),
    lit(" "), (seq % 999).cast("string"),
    lit(" mid"), (seq % 7).cast("string"),
    when(seq % 2 === 0, concat(lit(" [id "), (seq % 10).cast("string"), lit("]")))
      .otherwise(lit(" -")),
    lit(" message "), seq.cast("string"))

  /** syslog-rfc3164-local line (conf/parsers.conf:59-66) — no host group,
    * no-year time (pinned ref-year injection).
    */
  def rfc3164LocalLine: Column = concat(
    lit("<"), (seq % 192).cast("string"),
    lit(">Jul 17 20:17:"), pad(seq % 60, 2),
    lit(" app"), (seq % 20).cast("string"),
    lit("["), (seq % 999).cast("string"),
    lit("]: message "), seq.cast("string"))

  /** docker json-file line (conf/parsers.conf:33-41): the `log` value
    * carries DOUBLE-escaped content (literal `\"` / `\n` sequences after
    * the outer JSON parse) which the declared `Decode_Field_As escaped
    * log` rule resolves to real quotes/newlines.
    */
  def dockerJsonLine: Column = concat(
    lit("{\"log\": \"m \\\\\\\"q\\\\\\\" "), seq.cast("string"),
    lit("\\\\nend\", \"stream\": \"stdout\", \"time\": \"2017-07-17T20:17:03."),
    pad(seq % 1000, 3), lit("\"}"))

  /** kube-custom tag (conf/parsers.conf:89-91): the in_tail path shape
    * `var.log.containers.<pod>_<ns>_<container>-<docker_id>.log`.
    */
  def kubeCustomTag: Column = concat(
    lit("var.log.containers.web-"), (seq % 10).cast("string"),
    lit("_ns"), (seq % 5).cast("string"),
    lit("_nginx-"),
    lpad(lower(hex((seq * 2654435761L) % 1152921504606846976L)), 64, "0"),
    lit(".log"))

  /** key=value line exercising the float/hex/bool `Types` casts
    * (flb_parser.c:301-353).
    */
  def typesLine: Column = concat(
    lit("val="), seq.cast("string"),
    lit(".25 flags="), lower(hex(seq % 4096)),
    lit(" on="), when(seq % 2 === 0, "true").otherwise("false"))

  /** Records for the out_file byte-format oracles (`fb_file_*`): tag +
    * sec/nsec (nsec µs-aligned — see FileFormat's `%f` tie note) + one
    * value per `msgpack_object_print` branch; `msg` is nil every 7th row
    * and ASCII-clean so the json-path escape is the identity (the full
    * escape table is pinned by FileFormatSpec goldens instead).
    */
  def fileSinkRecords(spark: SparkSession, sfDir: String): org.apache.spark.sql.DataFrame =
    seqs(spark, sfDir).select(
      seq,
      lit("app.log").as("tag"),
      (lit(TokenTable.BaseEpoch) + seq % 3600).as("sec"),
      (seq * 997 % 1000000 * 1000).as("nsec"),
      when(seq % 7 === 0, lit(null: String))
        .otherwise(concat(lit("msg "), (seq % 50).cast("string"))).as("msg"),
      (seq * 37 % 1009).as("code"),
      ((seq % 89).cast("double") / 8.0).as("ratio"),
      (seq % 2 === 0).as("ok"))

  // ---- DuckDB renderings of the shared sub-expressions (doc_id = seq)
  val duckdbCode: String =
    "CAST(CASE doc_id % 6 WHEN 3 THEN 404 WHEN 4 THEN 500 WHEN 5 THEN 503 ELSE 200 END AS VARCHAR)"
  val duckdbSs: String = "lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0')"
  val duckdbMs3: String = "lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')"
  val duckdbHex64: String =
    "lower(lpad(to_hex((doc_id * 2654435761) % 1152921504606846976), 64, '0'))"
}
