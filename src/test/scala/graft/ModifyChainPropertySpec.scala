package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Modify

/** Randomized equivalence: the fused [[graft.functions.ModifyChain]]
  * interpreter must match the column-fold formulation row-for-row —
  * including key ORDER and null values — for arbitrary rule chains and
  * condition sets, not just the hand-picked matrix in FiltersSpec.
  * Seeded generator → reproducible failures.
  */
class ModifyChainPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val keys = Vector("a", "b", "c", "px", "py", "lvl", "zz")
  private val vals = Vector("1", "2", "error", "info", "x")

  private def randomRules(rnd: scala.util.Random, n: Int): Seq[Modify.Rule] =
    Seq.fill(n) {
      val k = keys(rnd.nextInt(keys.size))
      val k2 = keys(rnd.nextInt(keys.size))
      val v = vals(rnd.nextInt(vals.size))
      rnd.nextInt(8) match {
        case 0 => Modify.Rename(k, k2)
        case 1 => Modify.HardRename(k, k2)
        case 2 => Modify.Copy(k, k2)
        case 3 => Modify.HardCopy(k, k2)
        case 4 => Modify.Add(k, v)
        case 5 => Modify.Set(k, v)
        case 6 => Modify.Remove(k)
        case 7 => Modify.RemoveWildcard(Seq("p", "a", "z")(rnd.nextInt(3)))
      }
    }

  private def randomConds(rnd: scala.util.Random, n: Int): Seq[Modify.Condition] =
    Seq.fill(n) {
      val k = keys(rnd.nextInt(keys.size))
      val v = vals(rnd.nextInt(vals.size))
      rnd.nextInt(4) match {
        case 0 => Modify.KeyExists(k)
        case 1 => Modify.KeyDoesNotExist(k)
        case 2 => Modify.KeyValueEquals(k, v)
        case 3 => Modify.KeyValueDoesNotEqual(k, v)
      }
    }

  test("property: fused chain ≡ column fold for 30 random rule chains (seeded)") {
    // per-row random key subsets with one null-valued key candidate
    val corpus = spark.range(0, 60).select(col("id"),
      map_filter(
        map(lit("a"), when(col("id") % 3 === 0, col("id").cast("string")),
          lit("b"), when(col("id") % 2 === 0, lit("x")),
          lit("px"), lit("1"), lit("py"), lit("2"),
          lit("lvl"), when(col("id") % 5 === 0, lit("error")).otherwise(lit("info"))),
        (k, v) => v.isNotNull || k === "a").as("record")).cache()
    def dump(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"), map_keys(col("record")).as("ks"),
        transform(map_values(col("record")), v => coalesce(v, lit("«null»"))).as("vs"))
      .as[(Long, Seq[String], Seq[String])].collect().toSeq.sortBy(_._1)
    val rnd = new scala.util.Random(20260816L)
    (1 to 30).foreach { i =>
      val rules = randomRules(rnd, rnd.nextInt(8) + 1)
      val conds = randomConds(rnd, rnd.nextInt(3))
      val fused = dump(Modify.apply("record", conds, rules)(corpus))
      val cols = dump(Modify.applyColumns("record", conds, rules)(corpus))
      assert(fused == cols, s"config #$i: conds=$conds rules=$rules")
    }
    corpus.unpersist()
    ()
  }
}
