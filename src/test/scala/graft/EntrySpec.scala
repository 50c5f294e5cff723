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
}
