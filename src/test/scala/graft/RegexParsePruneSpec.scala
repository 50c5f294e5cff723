package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{ParsedField, RegexParse}

/** [[graft.plans.PruneRegexParseFields]]: the single-consumed-field parse
  * narrows to RegexParseField with IDENTICAL values (incl. pattern miss,
  * absent group, cast failure, non-ASCII fallback), and multi-field
  * consumers keep the one shared full parse.
  */
class RegexParsePruneSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val pattern = "^(?<host>\\S+) (?<code>\\d+) (?<ratio>[0-9.]+|x)(?: (?<note>.*))?$"
  private val fields = Seq(
    ParsedField("host"), ParsedField("code", "integer"),
    ParsedField("ratio", "float"), ParsedField("note"))

  private def parsed = {
    // repartition keeps the projection out of ConvertToLocalRelation's
    // plan-time fold (a bare local Seq collapses to LocalTableScan and no
    // physical expression is left to assert on)
    val df = Seq(
      (0, "alpha 200 0.5 ok"),
      (1, "beta 404 x"),         // float cast failure → null ratio; note absent
      (2, "no-match-at-all"),    // pattern miss → all fields null
      (3, "hôst 500 1.25 café")  // non-ASCII: exact toString fallback path
    ).toDF("idx", "line").repartition(2)
    df.withColumn("parsed", RegexParse(col("line"), pattern, fields))
  }

  test("single-field consumer is pruned to regexparsefield, values identical") {
    val one = parsed.select(col("idx"), col("parsed").getField("code").as("code"))
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("regexparsefield"),
      s"prune rule did not fire:\n$plan")
    assert(!"""\bregexparse\(""".r.findFirstIn(plan.toLowerCase).isDefined,
      s"full struct parse survived a single-field consumer:\n$plan")
    assert(one.orderBy("idx").as[(Int, Option[Long])].collect().map(_._2).toSeq ==
      Seq(Some(200L), Some(404L), None, Some(500L)))
  }

  test("pruned values match the full parse for every cast + edge row") {
    // reference values via the UNPRUNED path: consuming several fields
    // keeps the shared full parse (asserted below), so this collect is
    // the rule-off behavior
    val multi = parsed.select(
      col("idx"),
      col("parsed").getField("host").as("host"),
      col("parsed").getField("code").as("code"),
      col("parsed").getField("ratio").as("ratio"),
      col("parsed").getField("note").as("note")).orderBy("idx")
    val mPlan = multi.queryExecution.executedPlan.toString.toLowerCase
    assert(!mPlan.contains("regexparsefield"),
      s"multi-field consumer must keep the shared full parse:\n$mPlan")
    val expect = multi.collect().map(r => (r.get(1), r.get(2), r.get(3), r.get(4)))

    val prunedCols = Seq("host", "code", "ratio", "note").map { f =>
      val one = parsed.select(col("idx"), col("parsed").getField(f).as(f))
      assert(one.queryExecution.executedPlan.toString.toLowerCase
        .contains("regexparsefield"), s"no prune for $f")
      one.orderBy("idx").collect().map(_.get(1))
    }
    val got = prunedCols(0).indices
      .map(i => (prunedCols(0)(i), prunedCols(1)(i), prunedCols(2)(i), prunedCols(3)(i)))
    assert(got.toSeq == expect.toSeq)
  }

  test("inline multi-ordinal consumers are NOT rewritten (CSE keeps one match)") {
    // hand-written double getField with NO alias barrier: two equal inline
    // parse copies at DIFFERENT ordinals. Codegen subexpression
    // elimination runs the shared parse once; rewriting to two distinct
    // RegexParseFields would run the regex once PER FIELD — the rule must
    // leave this shape alone (and values must be unchanged either way).
    val df = Seq((0, "alpha 200 0.5 ok"), (1, "beta 404 x"))
      .toDF("idx", "line").repartition(2)
    val two = df.select(col("idx"),
      RegexParse(col("line"), pattern, fields).getField("host").as("host"),
      RegexParse(col("line"), pattern, fields).getField("code").as("code"))
    val plan = two.queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("regexparsefield"),
      s"multi-ordinal inline consumer was rewritten:\n$plan")
    assert(two.orderBy("idx").as[(Int, String, Option[Long])].collect().toSeq ==
      Seq((0, "alpha", Some(200L)), (1, "beta", Some(404L))))
    // same-ordinal duplicates remain eligible: both copies read `code`
    val same = df.select(col("idx"),
      RegexParse(col("line"), pattern, fields).getField("code").as("c1"),
      RegexParse(col("line"), pattern, fields).getField("code").as("c2"))
    assert(same.queryExecution.executedPlan.toString.toLowerCase
      .contains("regexparsefield"))
    assert(same.orderBy("idx").as[(Int, Option[Long], Option[Long])].collect().toSeq ==
      Seq((0, Some(200L), Some(200L)), (1, Some(404L), Some(404L))))
  }

  test("grep-pushdown filter shape (the headline hot path) gets the pruned parse") {
    import graft.operators.Grep
    import graft.run.{Pipeline, PipelineSpec}
    import graft.route.SinkSpec
    import graft.sources.TokenTable
    val t = TokenTable.synthetic(spark, 200, 2)
    val spec = PipelineSpec(
      grep = Seq(Grep.Regex("code", "^5")),
      sinks = TokenTable.Sinks.map((SinkSpec.apply _).tupled))
    val out = Pipeline.transform(t, spec)
      .groupBy(col("sink")).agg(count(lit(1)).as("cnt"), sum(col("n_tok")).as("s"))
    val rows = out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plan = out.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("regexparsefield"),
      s"headline grep filter not pruned:\n$plan")
    // 200 rows, code cycle seq%6∈{4,5}→5xx: 66 matches, each fans out to
    // its source sink + sink_all
    assert(rows("sink_all") == 66L)
  }
}
