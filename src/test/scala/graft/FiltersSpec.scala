package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.operators._

/** Operator semantics mirroring the reference runtime tests
  * (`tests/runtime/filter_grep.c`, `filter_modify.c` rule matrix,
  * `filter_record_modifier`, `filter_nest`).
  */
class FiltersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ------------------------------------------------------------------ grep
  test("grep Regex rule: keep match, drop non-match, drop missing key (grep.c:163-205)") {
    val df = Seq(
      (1, Some("100")), (2, Some("151")), (3, None), (4, Some("abc"))
    ).toDF("id", "v")
    val kept = Grep.apply(Seq(Grep.Regex("v", "1")))(df).select("id").as[Int].collect().toSet
    // "1" search: 100✓ 151✓ missing✗ abc✗
    assert(kept == Set(1, 2))
  }

  test("grep searchColumn ≡ rlike over folded and unfolded pattern shapes") {
    // values exercise null, empty, trailing newline (the `$` trap that
    // forbids an endsWith fold), mid-string and prefix positions
    val vals = Seq(Some("5"), Some("500"), Some("x500"), Some("500\n"),
      Some("5\n00"), Some(""), Some("\n5"), None)
    val df = vals.toDF("v")
    // folded: ^literal → startsWith, bare literal → contains;
    // unfolded: metacharacter patterns keep rlike
    val pats = Seq("^5", "5", "50", "^500", "", "^", "^5.0", "5$", "^5$", "[0-9]+", "5|x")
    for (p <- pats) {
      val got = df.select(Grep.searchColumn(col("v"), p)).collect().map(_.get(0))
      val want = df.select(col("v").rlike(p)).collect().map(_.get(0))
      assert(got.toSeq == want.toSeq, s"pattern '$p'")
    }
  }

  test("grep Exclude rule: drop match, keep non-match, keep missing key") {
    val df = Seq(
      (1, Some("100")), (2, Some("555")), (3, None)
    ).toDF("id", "v")
    val kept = Grep.apply(Seq(Grep.Exclude("v", "5")))(df).select("id").as[Int].collect().toSet
    assert(kept == Set(1, 3))
  }

  test("grep first decisive rule wins: Exclude then Regex chain") {
    val df = Seq(
      (1, "err", "x"), (2, "ok", "x"), (3, "ok", "y")
    ).toDF("id", "lvl", "v")
    // Exclude lvl=err; then Regex v=x (decisive for the rest)
    val kept = Grep.apply(Seq(Grep.Exclude("lvl", "^err$"), Grep.Regex("v", "^x$")))(df)
      .select("id").as[Int].collect().toSet
    assert(kept == Set(2))
  }

  // --------------------------------------------------------- record_modifier
  test("record_modifier whitelist: prefix wildcard + case-insensitive (filter_modifier.c:58-67,224-230)") {
    val df = Seq((1L, "a", 2.0, "x")).toDF("Event_Id", "event_type", "value", "other")
    val out = RecordModifier.whitelistKeys(Seq("EVENT_*"))(df)
    assert(out.columns.toSet == Set("Event_Id", "event_type"))
    val out2 = RecordModifier.removeKeys(Seq("event_*"))(df)
    assert(out2.columns.toSet == Set("value", "other"))
  }

  test("record_modifier Record appends static pairs") {
    val out = RecordModifier.addRecords(Seq("env" -> "prod"))(Seq((1, "a")).toDF("id", "v"))
    assert(out.select("env").as[String].collect().sameElements(Array("prod")))
  }

  // ---------------------------------------------------------------- modify
  private def rec(pairs: (String, String)*) = {
    val df = Seq(1).toDF("id")
    val entries = pairs.flatMap { case (k, v) => Seq(lit(k), lit(v)) }
    df.withColumn("record", map(entries: _*))
  }
  private def getMap(df: org.apache.spark.sql.DataFrame): Map[String, String] =
    df.select("record").collect()(0).getMap[String, String](0).toMap

  test("modify RENAME skips when dest exists; HARD_RENAME overwrites (modify.c:603-693)") {
    val in = rec("a" -> "1", "b" -> "2")
    val r1 = Modify.apply("record", Nil, Seq(Modify.Rename("a", "b")))(in)
    assert(getMap(r1) == Map("a" -> "1", "b" -> "2")) // dest exists → skip
    val r2 = Modify.apply("record", Nil, Seq(Modify.HardRename("a", "b")))(in)
    assert(getMap(r2) == Map("b" -> "1"))
  }

  test("modify COPY/HARD_COPY/ADD/SET/REMOVE/REMOVE_WILDCARD matrix") {
    val in = rec("a" -> "1", "b" -> "2", "px" -> "3", "py" -> "4")
    assert(getMap(Modify.apply("record", Nil, Seq(Modify.Copy("a", "b")))(in))("b") == "2")
    assert(getMap(Modify.apply("record", Nil, Seq(Modify.HardCopy("a", "b")))(in))("b") == "1")
    assert(getMap(Modify.apply("record", Nil, Seq(Modify.Add("a", "9")))(in))("a") == "1")
    assert(getMap(Modify.apply("record", Nil, Seq(Modify.Add("z", "9")))(in))("z") == "9")
    assert(getMap(Modify.apply("record", Nil, Seq(Modify.Set("a", "9")))(in))("a") == "9")
    assert(!getMap(Modify.apply("record", Nil, Seq(Modify.Remove("a")))(in)).contains("a"))
    val wc = getMap(Modify.apply("record", Nil, Seq(Modify.RemoveWildcard("p")))(in))
    assert(wc.keySet == Set("a", "b"))
  }

  test("modify rules are sequential, each sees previous output (modify.c:915-1040)") {
    val in = rec("a" -> "1")
    // rename a→b, then set a=new: both effective only if sequential
    val out = getMap(Modify.apply("record", Nil,
      Seq(Modify.Rename("a", "b"), Modify.Set("a", "new")))(in))
    assert(out == Map("b" -> "1", "a" -> "new"))
  }

  test("fused ModifyChain ≡ the column fold, row-for-row incl. key ORDER and null values") {
    // varied corpus: per-row key sets, null values, rule-relevant keys
    val corpus = spark.range(0, 200).select(col("id"),
      map_filter(
        map(lit("a"), when(col("id") % 3 === 0, col("id").cast("string")),
          lit("b"), when(col("id") % 2 === 0, lit("x")),
          lit("px"), lit("1"), lit("py"), lit("2"),
          lit("lvl"), when(col("id") % 5 === 0, lit("error")).otherwise(lit("info"))),
        (k, v) => v.isNotNull || k === "a").as("record")) // keep a null-VALUED key
    val conditions = Seq(Modify.KeyValueDoesNotEqual("lvl", "info"))
    val rules = Seq(
      Modify.Rename("a", "b"), Modify.HardRename("b", "c"), Modify.Copy("c", "d"),
      Modify.HardCopy("d", "px"), Modify.Add("env", "prod"), Modify.Set("lvl", "seen"),
      Modify.Remove("py"), Modify.RemoveWildcard("p"))
    def dump(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"), map_keys(col("record")).as("ks"),
        transform(map_values(col("record")), v => coalesce(v, lit("«null»"))).as("vs"))
      .as[(Long, Seq[String], Seq[String])].collect().toSeq.sortBy(_._1)
    val fused = dump(Modify.apply("record", conditions, rules)(corpus))
    val cols = dump(Modify.applyColumns("record", conditions, rules)(corpus))
    assert(fused == cols)
    // and exactly ONE modifychain node, no map_concat layers, in the plan
    val plan = Modify.apply("record", conditions, rules)(corpus)
      .queryExecution.optimizedPlan.toString.toLowerCase
    assert(plan.contains("modifychain") && !plan.contains("map_concat"), plan)
  }

  test("modify conditions: ALL must hold; failing rows NOTOUCH (modify.c:582-601)") {
    val df = Seq(("e1", "error"), ("e2", "info")).toDF("id", "lvl")
      .withColumn("record", map(lit("lvl"), col("lvl")))
    val out = Modify.apply("record",
      Seq(Modify.KeyValueEquals("lvl", "error")),
      Seq(Modify.Set("flag", "1")))(df)
    val got = out.select("id", "record").collect()
      .map(r => r.getString(0) -> r.getMap[String, String](1).toMap).toMap
    assert(got("e1") == Map("lvl" -> "error", "flag" -> "1"))
    assert(got("e2") == Map("lvl" -> "info"))
  }

  test("modify KEY_VALUE_DOES_NOT_EQUAL is NOT(EQUALS): TRUE on missing key (modify.c:553-559)") {
    val df = Seq(("e1", Some("error")), ("e2", Some("info")), ("e3", None))
      .toDF("id", "lvl")
      .withColumn("record",
        when(col("lvl").isNotNull, map(lit("lvl"), col("lvl"))).otherwise(map()))
    val out = Modify.apply("record",
      Seq(Modify.KeyValueDoesNotEqual("lvl", "error")),
      Seq(Modify.Set("flag", "1")))(df)
    val got = out.select("id", "record").collect()
      .map(r => r.getString(0) -> r.getMap[String, String](1).toMap).toMap
    assert(got("e1") == Map("lvl" -> "error"))              // equals → NOTOUCH
    assert(got("e2") == Map("lvl" -> "info", "flag" -> "1")) // differs → apply
    assert(got("e3") == Map("flag" -> "1"))                  // MISSING key → apply
  }

  // ------------------------------------------------------------------ nest
  test("nest moves wildcard keys under sub-struct; lift splices back with prefix (nest.c:277-402)") {
    val df = Seq((1, "x", 2.5)).toDF("id", "kube_pod", "value")
    val nested = Nest.nest(Seq("kube_*"), "kubernetes")(df)
    assert(nested.columns.toSet == Set("id", "value", "kubernetes"))
    assert(nested.select("kubernetes.kube_pod").as[String].collect()(0) == "x")
    val lifted = Nest.lift("kubernetes", "k8s_")(nested)
    assert(lifted.columns.toSet == Set("id", "value", "k8s_kube_pod"))
  }

  test("lift on non-struct key: warn-and-skip semantics (nest.c:244-249)") {
    val df = Seq((1, "notastruct")).toDF("id", "kubernetes")
    val out = Nest.lift("kubernetes")(df)
    assert(out.columns.toSet == Set("id", "kubernetes"))
  }

  // -------------------------------------------------------------- throttle
  test("throttle keeps first rate×interval per pane, event-time deterministic") {
    val rows = (0 until 100).map(i => (java.sql.Timestamp.valueOf(
      f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"), i.toLong))
    val df = rows.toDF("ts", "id")
    // interval 60s, rate 0.1/s → cap 6 per minute pane
    val out = Throttle.apply("ts", "id", 60, 0.1)(df)
    assert(out.count() == 12) // two panes × 6
    val kept = out.select("id").as[Long].collect().sorted.toSeq
    assert(kept.take(6) == Seq(0L, 1L, 2L, 3L, 4L, 5L))
  }

  test("property: scalable throttle ≡ exact over random timestamps, rates, salts") {
    import org.scalacheck.{Gen, Prop}
    import org.scalatest.prop.Configuration
    val gen = for {
      n <- Gen.choose(1, 300)
      offs <- Gen.listOfN(n, Gen.choose(0, 7200)) // seconds within 2 panes+
      rate <- Gen.oneOf(0.001, 0.005, 0.02, 0.2)
      salts <- Gen.oneOf(1, 3, 8)
    } yield (offs, rate, salts)
    val prop = Prop.forAllNoShrink(gen) { case (offs, rate, salts) =>
      val rows = offs.zipWithIndex.map { case (o, i) =>
        (new java.sql.Timestamp((1700000000L + o) * 1000L), i.toLong)
      }
      val df = rows.toDF("ts", "id").repartition(5)
      val exact = Throttle.apply("ts", "id", 3600, rate)(df)
        .select("id").as[Long].collect().sorted.toSeq
      val two = Throttle.scalable("ts", "id", 3600, rate, salts)(df)
        .select("id").as[Long].collect().sorted.toSeq
      exact == two
    }
    org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(20), prop)
      .passed || (throw new AssertionError("scalable != exact"))
  }

  test("two-phase scalable throttle is row-identical to the exact formulation") {
    // skewed panes: pane 0 holds 500 rows, pane 1 holds 7 — both above and
    // below the cap, plus intra-second ties broken by id
    val rows = (0 until 500).map(i => (java.sql.Timestamp.valueOf(
      f"2024-01-01 00:00:${i % 60}%02d"), i.toLong)) ++
      (0 until 7).map(i => (java.sql.Timestamp.valueOf(
        f"2024-01-01 00:01:${i}%02d"), (1000 + i).toLong))
    val df = rows.toDF("ts", "id").repartition(8)
    val exact = Throttle.apply("ts", "id", 60, 0.2)(df)
      .select("id").as[Long].collect().sorted.toSeq
    val twoPhase = Throttle.scalable("ts", "id", 60, 0.2, salts = 4)(df)
      .select("id").as[Long].collect().sorted.toSeq
    assert(twoPhase == exact)
    assert(exact.size == 12 + 7) // pane 0 capped at 12, pane 1 under cap
  }
}
