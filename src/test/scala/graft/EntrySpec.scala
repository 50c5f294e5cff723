package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver smoke contract: `SparkEntry.entry` returns >0 rows on sf0.001. */
class EntrySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("entry: full pipeline flagship returns one row per sink") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == 4)
    val bySink = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySink.keySet == Set("sink_app", "sink_db", "sink_kube", "sink_all"))
    assert(bySink.values.forall(_ > 0))
    // sink_all sees every row (match '*'): documents sf0.001 has 500 rows
    assert(bySink("sink_all") == 500L)
  }

  test("bench growth arbitration: warm min on agreement, median-of-3 on threshold straddle") {
    // no re-measure → first attempt stands
    assert(Bench.finalGrowth(23.3, Seq.empty) == 23.3)
    // one agreeing attempt (protocol only records one roll when it stayed
    // over threshold) → warm min
    assert(Bench.finalGrowth(23.3, Seq((1.0, 15.0))) == 15.0)
    assert(Bench.finalGrowth(13.0, Seq((1.0, 14.5))) == 13.0)
    // straddle → tie-break ran → median of three:
    // noise confirmed twice: 23.3 / 6.0 / 7.0 → 7.0 (not the lucky 6.0)
    assert(Bench.finalGrowth(23.3, Seq((1.0, 6.0), (1.0, 7.0))) == 7.0)
    // super-linearity reproduced by the tie-break: 23.3 / 6.0 / 20.0 → 20.0
    // (the single lucky roll no longer masks it — the round-5 ADVICE case)
    assert(Bench.finalGrowth(23.3, Seq((1.0, 6.0), (1.0, 20.0))) == 20.0)
    // a failed attempt (negative time) is ignored
    assert(Bench.finalGrowth(23.3, Seq((-1.0, 6.0))) == 23.3)
  }
}
