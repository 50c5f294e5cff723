package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every event, attach the LATEST dimension row with
  * `dim.ts <= event.ts` for the same key — "what config/price/metadata
  * was in force when this event happened". Spark has no native ASOF;
  * composing existing operators (preference (a) of the build rules):
  *
  * UNION the tagged dim rows into the event stream, ONE shuffle+sort per
  * key by (ts, dim-first), then a running `last(value, ignoreNulls)`
  * window carries each dim value forward onto the events that follow it.
  * Cost class = one sort-merge join (single exchange of both inputs,
  * no per-event probe); a dim row at exactly event.ts wins (>= bound,
  * DuckDB/QuestDB ASOF semantics). Events before any dim get nulls
  * (ASOF LEFT JOIN semantics).
  *
  * Skew: a hot key serializes onto one sort partition like any
  * key-windowed operator — pre-split hot keys by time range if a single
  * key's history exceeds a task (same dial as Throttle.scalable).
  */
object AsOfJoin {

  def lastBefore(events: DataFrame, eKey: String, eTs: String,
                 dims: DataFrame, dKey: String, dTs: String,
                 valCols: Seq[String]): DataFrame = {
    require(!valCols.exists(events.columns.contains),
      s"events already carry ${valCols.filter(events.columns.contains).mkString(",")} — " +
        "a same-named event column would poison the carry-forward; alias the dim values")
    val d = dims.select(
      col(dKey).as(eKey) +: col(dTs).as(eTs) +:
        // the carried payload is a per-dim-row STRUCT: a dim whose VALUE
        // is null still counts as the latest dim (the struct is non-null),
        // exactly like ASOF JOIN returning that row's null value — a bare
        // last(value, ignoreNulls) would skip back to an older dim
        Seq(struct(valCols.map(col): _*).as("_dimval")): _*)
      .withColumn("_is_dim", lit(1))
    val e = events.withColumn("_is_dim", lit(0))
    val all = e.unionByName(d, allowMissingColumns = true)
    // at equal ts the dim sorts FIRST so the event sees it (>= bound)
    val w = Window.partitionBy(col(eKey))
      .orderBy(col(eTs), col("_is_dim").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = all.withColumn("_dv", last(col("_dimval"), ignoreNulls = true).over(w))
    valCols.foldLeft(filled)((df, v) => df.withColumn(v, col(s"_dv.$v")))
      .filter(col("_is_dim") === 0)
      .drop("_is_dim", "_dimval", "_dv")
  }

  /** Convenience: single value column. */
  def lastBefore(events: DataFrame, eKey: String, eTs: String,
                 dims: DataFrame, dKey: String, dTs: String,
                 valCol: String): DataFrame =
    lastBefore(events, eKey, eTs, dims, dKey, dTs, Seq(valCol))
}
