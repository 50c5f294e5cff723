package graft.parsers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.TimeParse
import graft.functions.{ParsedField, RegexExtractStruct, RegexParse}

/** Parser definitions — the Spark restatement of the reference's parser
  * subsystem (struct at `include/fluent-bit/flb_parser.h:39-61`, loader
  * `src/flb_parser.c:94-254`). A parser is (format, pattern, time handling,
  * type casts); applied to a string column it yields a typed struct plus an
  * event timestamp.
  *
  * The regex corpus mirrors the shipped `conf/parsers.conf` definitions
  * (semantics verified Onigmo→java.util.regex compatible per SURVEY §7.5.5;
  * `/pat/` slash-trimming of the loader, `src/flb_regex.c:72-76`, is
  * reproduced in [[ParserDef.cleanRegex]]).
  */
sealed trait ParserFormat
case object RegexFormat extends ParserFormat
case object JsonFormat extends ParserFormat

final case class ParserDef(
    name: String,
    format: ParserFormat,
    regex: String = "",
    timeKey: Option[String] = None,
    timeFormat: Option[String] = None,
    timeKeep: Boolean = false,
    timeOffsetSec: Int = 0,
    // key -> integer|float|bool|hex|string (reference `flb_parser.c:301-353`)
    types: Map[String, String] = Map.empty,
    // Decode_Field / Decode_Field_As rules in file order (applied to map
    // records by graft.operators.DecoderChain)
    decoders: Seq[ParserConfLoader.DecoderRule] = Nil,
    // flat JSON schema for Format json (schema-on-read projection)
    jsonSchema: Option[StructType] = None,
    // java-regex group name → ORIGINAL record key (Onigmo allows `_` in
    // group names, java.util.regex does not; conf-loaded parsers sanitize
    // the pattern and restore original key names through this map)
    fieldAliases: Map[String, String] = Map.empty
) {
  /** Output (record-key) name for a capture-group name. */
  def outName(group: String): String = fieldAliases.getOrElse(group, group)
  def cleanRegex: String = {
    // the reference loader strips surrounding slashes (`flb_regex.c:72-76`)
    val r = regex.trim
    if (r.length > 1 && r.startsWith("/") && r.endsWith("/")) r.substring(1, r.length - 1)
    else r
  }

  def groupNames: Seq[String] = RegexExtractStruct.groupNamesOf(cleanRegex)

  /** Cast a parsed (string) field per `Types`. Cast failure keeps the
    * string? — the reference falls back to the ORIGINAL string with a
    * warning (`flb_parser.c:827-831`); in a fixed-schema world the field
    * is typed, so failures become null (`try_cast` semantics), the
    * documented deviation.
    */
  def castField(c: Column, key: String): Column = types.get(key) match {
    case Some("integer") => c.cast("long")
    case Some("float")   => c.cast("double")
    case Some("bool")    => lower(c).startsWith("true")
    case Some("hex")     => conv(c, 16, 10).cast("long")
    case _               => c
  }

  def fieldType(key: String): DataType = types.get(key) match {
    case Some("integer") => LongType
    case Some("float")   => DoubleType
    case Some("bool")    => BooleanType
    case Some("hex")     => LongType
    case _               => StringType
  }

  /** Parse `raw` → struct column with `Types` casts applied and (unless
    * `timeKeep`) the time key dropped — mirroring `flb_parser_do`
    * (`src/flb_parser.c:545-559`) + in-place time-key removal
    * (`flb_parser_regex.c:166-183`).
    *
    * ONE expression, one regex match per row: [[RegexParse]] fuses the
    * extraction with the casts so the compiled pattern never evaluates
    * more than once per record.
    */
  def parsed(raw: Column): Column = format match {
    case RegexFormat =>
      val keep = groupNames.filter(g => timeKeep || !timeKey.contains(outName(g)))
      RegexParse(raw, cleanRegex,
        keep.map(g => ParsedField(g, types.getOrElse(outName(g), "string"), outName(g))))
    case JsonFormat =>
      val schema = jsonSchema.getOrElse(
        throw new IllegalArgumentException(s"parser $name: json format needs jsonSchema"))
      val st = from_json(raw, schema)
      timeKey match {
        case Some(tk) if !timeKeep && schema.fieldNames.contains(tk) => st.dropFields(tk)
        case _ => st
      }
  }

  /** Event time derived from an ALREADY-PARSED struct column (no second
    * regex match) — requires `timeKeep` so the time field is present.
    */
  def eventTimeFrom(parsedCol: Column): Column = (timeKey, timeFormat) match {
    case (Some(tk), Some(tf)) if timeKeep =>
      TimeParse.parse(parsedCol.getField(tk), tf, timeOffsetSec)
    case _ => lit(null).cast(TimestampType)
  }

  /** Full-precision `struct<sec,nsec>` envelope (SURVEY §1.3) from an
    * already-parsed struct — `%L` digits kept at ns resolution.
    */
  def eventTimeNsFrom(parsedCol: Column): Column = (timeKey, timeFormat) match {
    case (Some(tk), Some(tf)) if timeKeep =>
      TimeParse.parseNs(parsedCol.getField(tk), tf, timeOffsetSec)
    case _ => lit(null).cast("struct<sec:bigint,nsec:int>")
  }

  /** Event-time column extracted per Time_Key/Time_Format (null when the
    * parse missed or the parser has no time config).
    */
  def eventTime(raw: Column): Column = (timeKey, timeFormat) match {
    case (Some(tk), Some(tf)) =>
      val timeStr = format match {
        case RegexFormat =>
          val group = groupNames.find(g => outName(g) == tk).getOrElse(tk)
          RegexExtractStruct(raw, cleanRegex).getField(group)
        case JsonFormat => get_json_object(raw, s"$$.$tk")
      }
      TimeParse.parse(timeStr, tf, timeOffsetSec)
    case _ => lit(null).cast(TimestampType)
  }

  /** Output field names of [[parsed]] (record keys after alias restore). */
  def outputNames: Seq[String] = format match {
    case RegexFormat =>
      groupNames.filter(g => timeKeep || !timeKey.contains(outName(g))).map(outName)
    case JsonFormat =>
      jsonSchema.map(_.fieldNames.toSeq).getOrElse(Seq.empty)
        .filter(f => timeKeep || !timeKey.contains(f))
  }
}

object Parsers {
  // conf/parsers.conf:1-7
  val apache = ParserDef(
    name = "apache",
    format = RegexFormat,
    regex = "^(?<host>[^ ]*) [^ ]* (?<user>[^ ]*) \\[(?<time>[^\\]]*)\\] \"(?<method>\\S+)(?: +(?<path>[^\\\"]*?)(?: +\\S*)?)?\" (?<code>[^ ]*) (?<size>[^ ]*)(?: \"(?<referer>[^\\\"]*)\" \"(?<agent>[^\\\"]*)\")?$",
    timeKey = Some("time"),
    timeFormat = Some("%d/%b/%Y:%H:%M:%S %z"),
    types = Map("code" -> "integer", "size" -> "integer")
  )

  // conf/parsers.conf:51-58
  val syslogRfc5424 = ParserDef(
    name = "syslog-rfc5424",
    format = RegexFormat,
    regex = "^\\<(?<pri>[0-9]{1,5})\\>1 (?<time>[^ ]+) (?<host>[^ ]+) (?<ident>[^ ]+) (?<pid>[-0-9]+) (?<msgid>[^ ]+) (?<extradata>(\\[(.*)\\]|-)) (?<message>.+)$",
    timeKey = Some("time"),
    timeFormat = Some("%Y-%m-%dT%H:%M:%S.%L"),
    timeKeep = true
    // NO Types line in the shipped definition (conf/parsers.conf:52-58) —
    // pri stays a string, matching the reference's untyped regex output
  )

  // conf/parsers.conf:59-66 — NO-YEAR time format (pinned ref-year applies)
  val syslogRfc3164Local = ParserDef(
    name = "syslog-rfc3164-local",
    format = RegexFormat,
    regex = "^\\<(?<pri>[0-9]+)\\>(?<time>[^ ]* {1,2}[^ ]* [^ ]*) (?<ident>[a-zA-Z0-9_\\/\\.\\-]*)(?:\\[(?<pid>[0-9]+)\\])?(?:[^\\:]*\\:)? *(?<message>.*)$",
    timeKey = Some("time"),
    timeFormat = Some("%b %d %H:%M:%S"),
    timeKeep = true
  )

  // conf/parsers.conf:84-87, same regex as kube_regex.h:26 — tag metadata
  // extraction; shipped group names carry underscores → sanitize + alias
  // so the OUTPUT keys are the reference's (`pod_name`, …)
  val kubeTag: ParserDef = {
    val (rx, aliases) = ParserConfLoader.sanitizeGroupNames(
      "var\\.log\\.containers\\.(?<pod_name>[a-z0-9]([-a-z0-9]*[a-z0-9])?(\\.[a-z0-9]([-a-z0-9]*[a-z0-9])?)*)_(?<namespace_name>[^_]+)_(?<container_name>.+)-(?<docker_id>[a-z0-9]{64})\\.log$")
    ParserDef(
      name = "kube-custom",
      format = RegexFormat,
      regex = rx,
      fieldAliases = aliases.filter { case (k, v) => k != v })
  }

  // conf/parsers.conf:33-41 (docker): json + Time_Keep + escaped-decoder on `log`
  val docker = ParserDef(
    name = "docker",
    format = JsonFormat,
    timeKey = Some("time"),
    timeFormat = Some("%Y-%m-%dT%H:%M:%S.%L"),
    timeKeep = true,
    jsonSchema = Some(StructType(Seq(
      StructField("log", StringType), StructField("stream", StringType),
      StructField("time", StringType)))),
    decoders = Seq(ParserConfLoader.DecoderRule("escaped", "log"))
  )

  // conf/parsers.conf:8-14 — apache2: path is space-free `[^ ]*`, agent is
  // greedy `.*`; no Types → all fields stay strings
  val apache2 = ParserDef(
    name = "apache2",
    format = RegexFormat,
    regex = "^(?<host>[^ ]*) [^ ]* (?<user>[^ ]*) \\[(?<time>[^\\]]*)\\] \"(?<method>\\S+)(?: +(?<path>[^ ]*) +\\S*)?\" (?<code>[^ ]*) (?<size>[^ ]*)(?: \"(?<referer>[^\\\"]*)\" \"(?<agent>.*)\")?$",
    timeKey = Some("time"),
    timeFormat = Some("%d/%b/%Y:%H:%M:%S %z")
  )

  // conf/parsers.conf:15-19 — apache_error: NO time config (the `time`
  // group is an ordinary kept string field); pid/client optional
  val apacheError = ParserDef(
    name = "apache_error",
    format = RegexFormat,
    regex = "^\\[[^ ]* (?<time>[^\\]]*)\\] \\[(?<level>[^\\]]*)\\](?: \\[pid (?<pid>[^\\]]*)\\])?( \\[client (?<client>[^\\]]*)\\])? (?<message>.*)$"
  )

  // conf/parsers.conf:21-26
  val nginx = ParserDef(
    name = "nginx",
    format = RegexFormat,
    regex = "^(?<remote>[^ ]*) (?<host>[^ ]*) (?<user>[^ ]*) \\[(?<time>[^\\]]*)\\] \"(?<method>\\S+)(?: +(?<path>[^\\\"]*?)(?: +\\S*)?)?\" (?<code>[^ ]*) (?<size>[^ ]*)(?: \"(?<referer>[^\\\"]*)\" \"(?<agent>[^\\\"]*)\")?$",
    timeKey = Some("time"),
    timeFormat = Some("%d/%b/%Y:%H:%M:%S %z")
  )

  // conf/parsers.conf:27-32 — generic json: schema-on-read; callers supply
  // the projection via `.copy(jsonSchema = ...)` (the reference keeps the
  // map dynamic; a columnar engine projects)
  val jsonGeneric = ParserDef(
    name = "json",
    format = JsonFormat,
    timeKey = Some("time"),
    timeFormat = Some("%d/%b/%Y:%H:%M:%S %z"),
    jsonSchema = Some(StructType(Seq(
      StructField("log", StringType), StructField("stream", StringType),
      StructField("time", StringType))))
  )

  // conf/parsers.conf:43-50
  val dockerDaemon = ParserDef(
    name = "docker-daemon",
    format = RegexFormat,
    regex = "time=\"(?<time>[^ ]*)\" level=(?<level>[^ ]*) msg=\"(?<msg>[^ ].*)\"",
    timeKey = Some("time"),
    timeFormat = Some("%Y-%m-%dT%H:%M:%S.%L"),
    timeKeep = true
  )

  // conf/parsers.conf:67-75 — rfc3164 WITH host; regex is slash-wrapped in
  // the shipped file (stored that way here: cleanRegex strips, mirroring
  // flb_regex.c:72-76); of the two Time_Format lines the FIRST wins
  // (list order, flb_parser.c loader)
  val syslogRfc3164 = ParserDef(
    name = "syslog-rfc3164",
    format = RegexFormat,
    regex = "/^\\<(?<pri>[0-9]+)\\>(?<time>[^ ]* {1,2}[^ ]* [^ ]*) (?<host>[^ ]*) (?<ident>[a-zA-Z0-9_\\/\\.\\-]*)(?:\\[(?<pid>[0-9]+)\\])?(?:[^\\:]*\\:)? *(?<message>.*)$/",
    timeKey = Some("time"),
    timeFormat = Some("%b %d %H:%M:%S"),
    timeKeep = true
  )

  // conf/parsers.conf:76-83 — lazy message + optional trailing `<ms>ms`
  val mongodb = ParserDef(
    name = "mongodb",
    format = RegexFormat,
    regex = "^(?<time>[^ ]*)\\s+(?<severity>\\w)\\s+(?<component>[^ ]+)\\s+\\[(?<context>[^\\]]+)]\\s+(?<message>.*?) *(?<ms>(\\d+))?(:?ms)?$",
    timeKey = Some("time"),
    timeFormat = Some("%Y-%m-%dT%H:%M:%S.%L"),
    timeKeep = true
  )

  // conf/parsers.conf:89-91 — like kube-custom with a `.*kubernetes.`
  // prefix; shipped group names carry underscores (Onigmo-legal,
  // java.util.regex-illegal) → sanitize + alias, exactly like the loader
  val filterKubeTest: ParserDef = {
    val (rx, aliases) = ParserConfLoader.sanitizeGroupNames(
      ".*kubernetes.(?<pod_name>[a-z0-9]([-a-z0-9]*[a-z0-9])?(\\.[a-z0-9]([-a-z0-9]*[a-z0-9])?)*)_(?<namespace_name>[^_]+)_(?<container_name>.+)-(?<docker_id>[a-z0-9]{64})\\.log$")
    ParserDef(
      name = "filter-kube-test",
      format = RegexFormat,
      regex = rx,
      fieldAliases = aliases.filter { case (k, v) => k != v })
  }

  /** The full shipped corpus (`conf/parsers.conf:1-93`), 13 definitions. */
  val all: Map[String, ParserDef] =
    Seq(apache, apache2, apacheError, nginx, jsonGeneric, docker, dockerDaemon,
      syslogRfc5424, syslogRfc3164Local, syslogRfc3164, mongodb, kubeTag,
      filterKubeTest)
      .map(p => p.name -> p).toMap
}
