package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Glob
import graft.enrich.Enrich
import graft.operators._
import graft.parsers.Parsers
import graft.route.{Router, SinkSpec}
import graft.sinks.Sinks
import graft.sources.TokenTable

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry has a DuckDB-executable oracle in [[oracleSql]]
  * built over the SAME parquet tables; the token-sequence pipeline queries
  * derive the BASELINE-shape input deterministically from `documents`
  * ([[TokenTable]]) so both engines compute over identical rows.
  */
object SparkEntry {

  /** Flagship: the full Fluent-Bit-shaped pipeline — derive token table,
    * apache-parse the CLF payload, grep 5xx, kube-enrich, fan-out route,
    * per-sink count/sum aggregates — on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val toks = TokenTable.fromDocuments(spark, dir)
    val parsed = toks.withColumn("parsed", Parsers.apache.parsed(col("doc_id")))
    val routed = Router.fanOut(parsed, "source", TokenTable.Sinks.map((SinkSpec.apply _).tupled))
    routed.groupBy(col("sink"))
      .agg(count(lit(1)).as("cnt"), sum(col("n_tok")).as("sum_n_tok"),
        sum(col("parsed.code")).as("sum_code"))
  }

  private val sinkSpecs = TokenTable.Sinks.map((SinkSpec.apply _).tupled)

  /** WITH-clause prefix shared by token-pipeline oracles. */
  private def tokCtes: String =
    s"WITH tokseq AS (${TokenTable.duckdbCte}), parsed AS (${TokenTable.duckdbParsedCte})"

  /** Per-sink UNION oracle body over a source CTE named `rel` that carries
    * `source` — one SELECT per sink with the glob compiled to LIKE.
    */
  private def sinkUnion(rel: String, selectList: String): String =
    TokenTable.Sinks.map { case (name, glob) =>
      s"SELECT '$name' AS sink, $selectList FROM $rel WHERE ${Glob.toSqlPredicate("source", glob)}"
    }.mkString(" UNION ALL ")

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- parse stage: compiled-regex struct extraction (single match/row)
    "fb_parse_apache" -> ((s, dir) => {
      val t = TokenTable.fromDocuments(s, dir)
      t.withColumn("p", Parsers.apache.parsed(col("doc_id")))
        .select(col("seq"),
          col("p.host").as("host"), col("p.user").as("usr"),
          col("p.method").as("method"), col("p.path").as("path"),
          col("p.code").as("code"), col("p.size").as("size"))
    }),

    // -- time lookup: strptime %d/%b/%Y:%H:%M:%S %z → epoch seconds
    "fb_parse_time" -> ((s, dir) => {
      val t = TokenTable.fromDocuments(s, dir)
      t.select(col("seq"),
        unix_timestamp(Parsers.apache.eventTime(col("doc_id")))
          .as("tsec"))
    }),

    // -- grep filter: Regex rule on the parsed code field (5xx)
    "fb_grep_5xx" -> ((s, dir) => {
      val t = TokenTable.fromDocuments(s, dir)
      val parsed = t.withColumn("code_s", Parsers.apache.parsed(col("doc_id")).getField("code").cast("string"))
      parsed.filter(Grep.keepPredicate(Seq(Grep.Regex("code_s", "^5")), parsed.col))
        .groupBy(col("source")).agg(count(lit(1)).as("cnt"))
    }),

    // -- router fan-out (duplication semantics) + per-sink count/sum oracle
    "fb_route_fanout" -> ((s, dir) => {
      val t = TokenTable.fromDocuments(s, dir)
      Router.fanOut(t, "source", sinkSpecs)
        .groupBy(col("sink"))
        .agg(count(lit(1)).as("cnt"), sum(col("n_tok")).cast("long").as("sum_n_tok"))
    }),

    // -- end-to-end token passthrough: parse → grep 5xx → route; tokens must
    //    arrive byte-identical (BASELINE per-row invariant)
    "fb_tokens_passthrough" -> ((s, dir) => {
      val t = TokenTable.fromDocuments(s, dir)
      val kept = t.filter(Parsers.apache.parsed(col("doc_id")).getField("code") >= 500)
      Router.fanOut(kept, "source", sinkSpecs)
        .select(col("seq"), col("sink"), col("n_tok"), col("tokens"))
    }),

    // -- kube-style enrichment: tag-regex extract + broadcast dim join
    "fb_enrich_kube" -> ((s, dir) => {
      val t = TokenTable.fromDocuments(s, dir)
      val dim = s.read.parquet(s"$dir/nation.parquet")
        .filter(col("n_nationkey") < 10)
        .select(concat(lit("web-"), col("n_nationkey").cast("string"), lit("_default")).as("pod_key"),
          col("n_name").as("team"))
      val meta = Enrich.kubeMeta(col("source"))
      t.withColumn("m", meta)
        .filter(col("m").isNotNull)
        .withColumn("pod_key", concat(col("m.podName"), lit("_"), col("m.namespaceName")))
        .join(broadcast(dim), Seq("pod_key"), "left")
        .select(col("seq"), col("m.podName").as("pod_name"),
          col("m.namespaceName").as("namespace_name"),
          col("m.containerName").as("container_name"), col("team"))
    }),

    // -- record_modifier: whitelist with trailing-* prefix + case-insensitive
    "fb_record_modifier" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      RecordModifier.whitelistKeys(Seq("EVENT_*", "value"))(ev)
    }),

    // -- nest + lift with prefix
    "fb_nest_lift" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      val nested = Nest.nest(Seq("user_id", "value"), "meta")(ev)
      Nest.lift("meta", "meta_")(nested)
        .select(col("event_id"), col("meta_user_id"), col("meta_value"))
    }),

    // -- modify: conditions + sequential rules over a map record
    "fb_modify" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
        .withColumn("record", map(
          lit("event_type"), col("event_type"),
          lit("props"), col("props")))
      val out = Modify.apply("record",
        conditions = Seq(Modify.KeyExists("event_type")),
        rules = Seq(
          Modify.Rename("event_type", "etype"),
          Modify.Add("env", "prod"),
          Modify.RemoveWildcard("props")))(ev)
      out.select(col("event_id"),
        element_at(col("record"), "etype").as("etype"),
        element_at(col("record"), "env").as("env"),
        size(col("record")).as("nkeys"))
    }),

    // -- parser filter over a JSON field (docker-style)
    "fb_parser_json" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      ev.select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
    }),

    // -- throttle (deterministic event-time reformulation)
    "fb_throttle" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      Throttle.apply("ts", "event_id", 3600, 20.0 / 3600.0)(ev)
        .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
    }),

    // -- flowcounter: tumbling-window counts + sums
    "fb_flowcounter" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      ev.groupBy(date_trunc("hour", col("ts")).as("wstart"))
        .agg(count(lit(1)).as("cnt"),
          sum(round(col("value") * 100).cast("long")).as("sum_cents"))
    }),

    // -- classic aggregates / joins / windows (engine breadth)
    "q1_agg" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("cnt"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_price_cents"))
    }),
    "q_join_agg" -> ((s, dir) => {
      val o = s.read.parquet(s"$dir/orders.parquet")
      val c = s.read.parquet(s"$dir/customer.parquet")
      val n = s.read.parquet(s"$dir/nation.parquet")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("cnt"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("sum_cents"))
    }),
    "q_window_topk" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = s.read.parquet(s"$dir/orders.parquet")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rn"))
    }),

    // -- training-data ops: exact dedup
    "dedup_exact" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      d.groupBy(col("text"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
        .select(col("keeper"), col("n_copies"))
    })
  )

  // ------------------------------------------------------------- oracle SQL

  def oracleSql: Map[String, String] = Map(
    "fb_parse_apache" ->
      s"$tokCtes SELECT seq, host, usr, method, path, code, size FROM parsed",

    "fb_parse_time" ->
      s"$tokCtes SELECT seq, tsec FROM parsed",

    "fb_grep_5xx" ->
      s"$tokCtes SELECT source, count(*) AS cnt FROM parsed WHERE code >= 500 GROUP BY source",

    "fb_route_fanout" ->
      s"""$tokCtes, routed AS (${sinkUnion("tokseq", "n_tok")})
         SELECT sink, count(*) AS cnt, CAST(sum(n_tok) AS BIGINT) AS sum_n_tok
         FROM routed GROUP BY sink""",

    "fb_tokens_passthrough" ->
      s"""$tokCtes, kept AS (SELECT * FROM parsed WHERE code >= 500)
         SELECT sink, seq, n_tok, tokens FROM (${sinkUnion("kept", "seq, n_tok, tokens")})""",

    "fb_enrich_kube" ->
      s"""$tokCtes SELECT seq,
            concat('web-', CAST(seq % 10 AS VARCHAR)) AS pod_name,
            'default' AS namespace_name,
            'nginx' AS container_name,
            n.n_name AS team
          FROM tokseq LEFT JOIN nation n ON n.n_nationkey = seq % 10 AND n.n_nationkey < 10
          WHERE seq % 100 >= 92 AND seq % 100 < 97""",

    "fb_record_modifier" ->
      "SELECT event_id, event_type, value FROM events",

    "fb_nest_lift" ->
      "SELECT event_id, user_id AS meta_user_id, value AS meta_value FROM events",

    "fb_modify" ->
      """SELECT event_id, event_type AS etype, 'prod' AS env,
         CAST(2 AS INTEGER) AS nkeys FROM events""",

    "fb_parser_json" ->
      "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events",

    "fb_throttle" ->
      """SELECT event_type, count(*) AS cnt FROM (
           SELECT event_type,
                  row_number() OVER (PARTITION BY date_trunc('hour', ts)
                                     ORDER BY ts, event_id) AS rn
           FROM events) WHERE rn <= 20 GROUP BY event_type""",

    "fb_flowcounter" ->
      """SELECT date_trunc('hour', ts) AS wstart, count(*) AS cnt,
                CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_cents
         FROM events GROUP BY 1""",

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
                count(*) AS cnt,
                CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents
         FROM lineitem GROUP BY 1, 2""",

    "q_join_agg" ->
      """SELECT n_name, count(*) AS cnt,
                CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_cents
         FROM orders JOIN customer ON o_custkey = c_custkey
                     JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name""",

    "q_window_topk" ->
      """SELECT o_custkey, o_orderkey, CAST(rn AS INTEGER) AS rn FROM (
           SELECT o_custkey, o_orderkey,
                  row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn <= 3""",

    "dedup_exact" ->
      """SELECT min(doc_id) AS keeper, count(*) AS n_copies
         FROM documents GROUP BY text"""
  )
}
