package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.route.{Router, SinkSpec}

/** Fan-out routing semantics (reference `src/flb_task.c:255-277`): a chunk
  * routes to EVERY matching output — duplication, not first-match.
  */
class RouterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sinks = Seq(
    SinkSpec("app", "app.*"),
    SinkSpec("all", "*"),
    SinkSpec("db", "db.*"))

  test("fanOut duplicates a record into every matching sink") {
    val df = Seq(("app.frontend", 1), ("db.primary", 2), ("sys.kern", 3)).toDF("tag", "v")
    val out = Router.fanOut(df, "tag", sinks)
      .select("v", "sink").as[(Int, String)].collect().toSet
    assert(out == Set((1, "app"), (1, "all"), (2, "all"), (2, "db"), (3, "all")))
  }

  test("record matching no sink is dropped (zero-route task destroyed)") {
    val df = Seq(("x", 1)).toDF("tag", "v")
    val out = Router.fanOut(df, "tag", Seq(SinkSpec("app", "app.*")))
    assert(out.count() == 0)
  }

  test("perSinkFrames filters match the fan-out per sink") {
    val df = Seq(("app.frontend", 1), ("db.primary", 2)).toDF("tag", "v")
    val frames = Router.perSinkFrames(df, "tag", sinks).toMap
    assert(frames("app").count() == 1)
    assert(frames("all").count() == 2)
    assert(frames("db").count() == 1)
  }

  test("disjoint detects overlap; exclusiveSink is first-match") {
    assert(!Router.disjoint(Seq("app.*", "*")))
    assert(Router.disjoint(Seq("app.*", "db.*")))
    assert(!Router.disjoint(Seq("app.*", "app.front*")))
    val df = Seq(("app.frontend", 1), ("db.primary", 2)).toDF("tag", "v")
    val out = df.select(col("v"),
      Router.exclusiveSink(col("tag"), Seq(SinkSpec("app", "app.*"), SinkSpec("db", "db.*"))).as("sink"))
      .as[(Int, String)].collect().toSet
    assert(out == Set((1, "app"), (2, "db")))
  }
}
