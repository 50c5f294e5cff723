package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** SQL surface via SparkSessionExtensions. Needs its own session (the
  * shared test session has no extensions installed).
  */
class ExtensionsSpec extends AnyFunSuite {
  // the shared test session already exists → use the register() face
  // (withExtensions only applies at session creation)
  lazy val spark: SparkSession = {
    val s = SparkTestSession.spark
    GraftExtensions.register(s)
    s
  }

  test("regex_parse / glob_match / unescape_c are SQL-callable") {
    val df = spark.sql(
      """SELECT
        |  regex_parse('host-1 500', '^(?<host>\\S+) (?<code>\\d+)$').code AS code,
        |  glob_match('app.frontend', 'app.*') AS m1,
        |  glob_match('db.primary', 'app.*') AS m2,
        |  unescape_c('a\\nb') AS u
        |""".stripMargin)
    val r = df.collect()(0)
    assert(r.getString(0) == "500")
    assert(r.getBoolean(1))
    assert(!r.getBoolean(2))
    assert(r.getString(3) == "a\nb")
  }

  test("glob_match compiles to LIKE in the plan (pushdown-eligible)") {
    import spark.implicits._
    val df = Seq("app.x", "db.y").toDF("tag")
    df.createOrReplaceTempView("tags")
    val qe = spark.sql("SELECT * FROM tags WHERE glob_match(tag, 'app.*')").queryExecution
    // analyzed plan shows the injected Like; the optimizer then folds the
    // whole local-relation query away (which is exactly the point)
    assert(qe.analyzed.toString.contains("LIKE"), qe.analyzed.toString)
  }
}
