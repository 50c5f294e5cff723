package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sink-side operators. Network connectors are out of scope (SURVEY §2.5);
  * what remains is (a) per-sink file writes in the reference's three file
  * formats, (b) the two aggregate sinks (`counter`, `flowcounter`) that
  * form the per-sink correctness oracles, and (c) serializer transforms
  * demonstrated by the ES output.
  */
object Sinks {

  /** `out_counter` (`plugins/out_counter/counter.c:58-84`): running record
    * count per sink — as a batch aggregate, `count(*)` (+ `sum(n_tok)` for
    * the BASELINE per-sink aggregate oracle).
    */
  def counter(df: DataFrame, sinkCol: String = "sink"): DataFrame =
    df.groupBy(col(sinkCol))
      .agg(count(lit(1)).as("cnt"), sum(col("n_tok")).as("sum_n_tok"))

  /** `out_flowcounter` (`plugins/out_flowcounter/out_flowcounter.c:106-130`):
    * tumbling-window per-tick counts and byte/row sums. `unit` follows the
    * reference's second/minute/hour/day ticks.
    */
  def flowCounter(df: DataFrame, tsCol: String, unit: String,
                  sumCol: Option[String] = None): DataFrame = {
    val bucket = date_trunc(unit, col(tsCol)).as("wstart")
    val aggs = count(lit(1)).as("cnt") +: sumCol.map(c => sum(col(c)).as("sum_val")).toSeq
    df.groupBy(bucket).agg(aggs.head, aggs.tail: _*)
  }

  /** `out_file` (`plugins/out_file/file.c`): per-tag files; formats json
    * lines (`file.c:216-229`), csv (`:117-138`), ltsv (`:140-168`).
    * Writes `partitionBy(sink)` so one job lays out every sink's directory.
    */
  def writeFiles(df: DataFrame, outDir: String, format: String = "json",
                 sinkCol: String = "sink"): Unit = format match {
    case "json" => df.write.mode("overwrite").partitionBy(sinkCol).json(outDir)
    case "csv"  => df.write.mode("overwrite").partitionBy(sinkCol).csv(outDir)
    case "ltsv" =>
      // label-tab-separated: k1:v1 \t k2:v2 — text lines per record
      val cols = df.columns.filterNot(_ == sinkCol)
      val line = concat_ws("\t",
        cols.map(c => concat(lit(c + ":"), col(c).cast("string"))): _*)
      df.select(line.as("value"), col(sinkCol))
        .write.mode("overwrite").partitionBy(sinkCol).text(outDir)
  }

  /** `out_kafka` per-record topic selection (`kafka.c:104-133`): topic =
    * record[topicKey] if present else default.
    */
  def kafkaTopic(topicKeyCol: Column, defaultTopic: String): Column =
    coalesce(topicKeyCol, lit(defaultTopic))

  /** ES key sanitize: dots→underscores recursively over keys
    * (`plugins/out_es/es.c:40-110`) — here over a map column.
    */
  def esSanitizeKeys(m: Column): Column =
    transform_keys(m, (k, _) => regexp_replace(k, "\\.", "_"))

  /** ES logstash-style daily index name `prefix-YYYY.MM.DD`
    * (`es.c:245-266`).
    */
  def esLogstashIndex(ts: Column, prefix: String): Column =
    concat(lit(prefix + "-"), date_format(ts, "yyyy.MM.dd"))

  /** ES injected time field — ms precision ISO form (`es.c:208-241`). */
  def esTimeKey(ts: Column): Column =
    date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSS")

  /** One ES Bulk-API chunk per record (`plugins/out_es/es_bulk.h:27-28` +
    * `es.c:229-287`): the index action line
    * `{"index":{"_index":"…","_type":"…"[,"_id":"…"]}}`, a newline, then
    * the record JSON — a map packed as `@timestamp` FIRST (strftime
    * `%Y-%m-%dT%H:%M:%S` + `.<msec>Z`: es.c:215 first converts
    * `tv_nsec /= 1000000` to milliseconds — "Elasticsearch only support
    * fractional seconds in milliseconds unit" — then es.c:239-241 prints
    * that value UNPADDED, `.0Z` / `.123Z`; this is the same msec value
    * [[graft.functions.EsId.EsIdWithTime]] hashes), then the
    * dot→underscore-sanitized record keys, serialized by
    * `flb_msgpack_to_json` (`":"` key-value, `", "` pair separators,
    * [[graft.functions.FlbJsonEscape]] escaping) — then the trailing
    * newline. Concatenating chunks yields the exact bulk payload body.
    * Requires a UTC session timezone (the reference uses gmtime).
    */
  def esBulkChunk(df: DataFrame, secCol: String, nsecCol: String,
                  valueCols: Seq[String], index: Column,
                  esType: String = "flb_type",
                  id: Option[Column] = None): Column = {
    import org.apache.spark.sql.types._
    val ts = concat(
      date_format(timestamp_seconds(col(secCol)), "yyyy-MM-dd'T'HH:mm:ss"),
      lit("."),
      (col(nsecCol).cast("long") / 1000000L).cast("long").cast("string"),
      lit("Z"))
    val pairs = valueCols.map { c =>
      concat(lit("\"" + c.replace('.', '_') + "\":"),
        FileFormat.jsonVal(col(c), df.schema(c).dataType))
    }
    // empty record: map(0+1) holds only the timestamp entry
    val recordParts =
      if (pairs.isEmpty) Seq(lit("{\"@timestamp\":\""), ts, lit("\"}"))
      else Seq(lit("{\"@timestamp\":\""), ts, lit("\", ")) ++
        pairs.flatMap(p => Seq(p, lit(", "))).dropRight(1) ++ Seq(lit("}"))
    val record = concat(recordParts: _*)
    val action = id match {
      case Some(i) => concat(lit("{\"index\":{\"_index\":\""), index,
        lit("\",\"_type\":\"" + esType + "\",\"_id\":\""), i, lit("\"}}"))
      case None => concat(lit("{\"index\":{\"_index\":\""), index,
        lit("\",\"_type\":\"" + esType + "\"}}"))
    }
    concat(action, lit("\n"), record, lit("\n"))
  }

  /** One InfluxDB line-protocol record
    * (`plugins/out_influxdb/influxdb.c:88-278` + `influxdb_bulk.c:79-188`):
    * `tag,<seqName>=<seq>[,taggedKey=val…] k=v[,k2=v2…] <ns-timestamp>`.
    * Value forms follow the reference exactly: strings/binary quoted with
    * `flb_utils_write_str` escaping, booleans UPPERCASE TRUE/FALSE,
    * integers decimal, floats `%f` — and note the reference emits NO `i`
    * suffix on integers (it predates that convention). NULL values are
    * skipped per record (`influxdb.c:171-174` — "missing values are Null
    * by default in InfluxDB"); `taggedKeys` mirrors the Tag_Keys option
    * (those pairs ride in the measurement head). The reference joins
    * records with a bare newline; at least one non-tagged field must be
    * non-null or the reference drops the record with an error.
    */
  def influxLine(df: DataFrame, tagCol: String, seqCol: String,
                 secCol: String, nsecCol: String, valueCols: Seq[String],
                 seqName: String = "_seq",
                 taggedKeys: Set[String] = Set.empty): Column = {
    import org.apache.spark.sql.types._
    def v(c: String): Column = df.schema(c).dataType match {
      case StringType =>
        concat(lit("\""), graft.functions.FlbJsonEscape(col(c)), lit("\""))
      case BinaryType =>
        concat(lit("\""), graft.functions.FlbJsonEscape(col(c).cast("string")), lit("\""))
      case BooleanType => when(col(c), "TRUE").otherwise("FALSE")
      case ByteType | ShortType | IntegerType | LongType => col(c).cast("string")
      case FloatType | DoubleType => format_string("%f", col(c).cast("double"))
      case other => throw new IllegalArgumentException(s"influxdb value type $other")
    }
    def pairs(cols: Seq[String]): Column = array_join(
      array(cols.map(c =>
        when(col(c).isNull, lit(null)).otherwise(concat(lit(c + "="), v(c)))): _*),
      ",") // array_join skips nulls → reference's per-record null-skip
    val (tagged, fields) = valueCols.partition(taggedKeys.contains)
    // null tagged values are skipped like null fields (influxdb.c:171-174
    // drops NIL before the tagged/field split) — an empty fragment keeps
    // the head alive instead of null-propagating the whole line
    val headParts =
      Seq(col(tagCol), lit("," + seqName + "="), col(seqCol).cast("string")) ++
        tagged.map(c => when(col(c).isNull, lit(""))
          .otherwise(concat(lit("," + c + "="), v(c))))
    val head = concat(headParts: _*)
    val ns = (col(secCol).cast("long") * 1000000000L + col(nsecCol).cast("long"))
      .cast("string")
    concat(head, lit(" "), pairs(fields), lit(" "), ns)
  }

  // one `"k":value` pair per column through FileFormat's msgpack2json
  // renderer (single type-switch: nested arrays/maps/structs included)
  private def jsonFieldPairs(df: DataFrame, valueCols: Seq[String]): Seq[Column] =
    valueCols.map { c =>
      concat(lit("\"" + c + "\":"), FileFormat.jsonVal(col(c), df.schema(c).dataType))
    }

  /** One out_nats payload entry (`plugins/out_nats/nats.c:105-150`):
    * `[<%f time>, {"tag":"<tag>", …record}]` — the record map is packed
    * with the tag as its FIRST key, the whole thing serialized by
    * `flb_msgpack_to_json` (`", "` between entries/pairs, `":"` k-v).
    * The full request body is `[entry, entry, …]` — join chunks with
    * `", "` inside `[` `]`.
    */
  def natsEntry(df: DataFrame, tagCol: String, secCol: String,
                nsecCol: String, valueCols: Seq[String]): Column = {
    val pairs = jsonFieldPairs(df, valueCols)
    val tagPair = concat(lit("\"tag\":\""),
      graft.functions.FlbJsonEscape(col(tagCol)), lit("\""))
    val inner = (tagPair +: pairs).flatMap(p => Seq(p, lit(", "))).dropRight(1)
    concat(Seq(lit("["), FileFormat.timeDouble(col(secCol), col(nsecCol)),
      lit(", {")) ++ inner ++ Seq(lit("}]")): _*)
  }

  /** One out_http json-format record (`plugins/out_http/http.c:67-124`):
    * `{"<dateKey>":<date>, …record}` with the date FIRST — date either
    * the `%f` time double (default) or ISO8601
    * `%Y-%m-%dT%H:%M:%S.%06dZ` (µs precision, zero-padded, http.c:96-105).
    * Body = `[record, record, …]`. Requires a UTC session timezone for
    * the ISO form (gmtime).
    */
  def httpJsonRecord(df: DataFrame, secCol: String, nsecCol: String,
                     valueCols: Seq[String], dateKey: String = "date",
                     iso8601: Boolean = false): Column = {
    val dateVal =
      if (!iso8601) FileFormat.timeDouble(col(secCol), col(nsecCol))
      else concat(lit("\""),
        date_format(timestamp_seconds(col(secCol)), "yyyy-MM-dd'T'HH:mm:ss"),
        lit("."), lpad((col(nsecCol).cast("long") / 1000L).cast("long").cast("string"), 6, "0"),
        lit("Z\""))
    val pairs = jsonFieldPairs(df, valueCols)
    val head = concat(lit("{\"" + dateKey + "\":"), dateVal)
    val inner =
      if (pairs.isEmpty) Seq(head)
      else Seq(head, lit(", ")) ++ pairs.flatMap(p => Seq(p, lit(", "))).dropRight(1)
    concat(inner ++ Seq(lit("}")): _*)
  }

  /** One Splunk HEC event (`plugins/out_splunk/splunk.c:85-134`):
    * `{"time":<%f double>, "event":{…record}}` — events are concatenated
    * back-to-back with NO separator (splunk.c:130, flb_sds_cat).
    */
  def splunkEvent(df: DataFrame, secCol: String, nsecCol: String,
                  valueCols: Seq[String]): Column = {
    val pairs = jsonFieldPairs(df, valueCols)
    val inner =
      if (pairs.isEmpty) Seq.empty[Column]
      else pairs.flatMap(p => Seq(p, lit(", "))).dropRight(1)
    concat(Seq(lit("{\"time\":"), FileFormat.timeDouble(col(secCol), col(nsecCol)),
      lit(", \"event\":{")) ++ inner ++ Seq(lit("}}")): _*)
  }
}
