package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

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
  * Skew: in [[lastBefore]] a hot key serializes onto one sort partition
  * like any key-windowed operator — [[lastBeforeScalable]] is the
  * time-range pre-split variant for keys whose history exceeds a task.
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

  /** Per-row as-of lookup against a DRIVER-COLLECTED dim timeline:
    * for (key, ts) return the LARGEST dim timestamp ≤ ts for that key
    * (binary search over the key's sorted history), null when none.
    * The timeline rides into tasks as a plan literal — same pattern as
    * [[graft.functions.NearestCells]].
    */
  private[graft] case class AsOfLookup(left: Expression, right: Expression,
                                       timeline: Map[Long, Array[Long]])
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true

    def compute(k: Long, ts: Long): Any = {
      val arr = timeline.getOrElse(k, null)
      if (arr == null || arr.length == 0 || arr(0) > ts) return null
      // largest index with arr(i) <= ts
      var lo = 0
      var hi = arr.length - 1
      while (lo < hi) {
        val mid = (lo + hi + 1) >>> 1
        if (arr(mid) <= ts) lo = mid else hi = mid - 1
      }
      java.lang.Long.valueOf(arr(lo))
    }

    override def nullSafeEval(k: Any, ts: Any): Any =
      compute(k.asInstanceOf[Long], ts.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("aol", this, classOf[AsOfLookup].getName)
      nullSafeCodeGen(ctx, ev, (k, t) => {
        val r = ctx.freshName("r")
        s"""
           |Object $r = $ref.compute($k, $t);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Long) $r).longValue(); }
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Broadcast-dim as-of join — the ZERO-SHUFFLE plan shape for the common
    * case where the dim table (config/price/metadata history) fits on the
    * driver: the (key → sorted dim-ts) timeline is collected once and the
    * match becomes a NARROW per-event binary search; dim payloads attach
    * afterwards with a broadcast join on (key, matched ts) — no exchange
    * of the event stream at all ([[lastBefore]] sorts both sides once;
    * this never touches event partitioning, the 100 TB default whenever
    * dims are broadcast-small).
    *
    * Contract: integral keys, timestamp/integral-µs `ts` columns, ≥-bound
    * and pre-dim-null semantics identical to [[lastBefore]] (shared DuckDB
    * ASOF oracle + equivalence spec). Several dims on one (key, ts) keep
    * ONE arbitrary row (`dropDuplicates`) — the same indeterminism class
    * as the window formulation's tie order.
    */
  /** Comparable long ordinal of a ts column: integral columns are used AS
    * IS (matching [[lastBefore]]'s raw comparisons — a µs-count long cast
    * to timestamp would be read as SECONDS and overflow); everything else
    * goes through unix_micros.
    */
  private def tsOrdinal(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType => col(c).cast("long")
      case _ => unix_micros(col(c).cast("timestamp"))
    }

  def lastBeforeBroadcast(events: DataFrame, eKey: String, eTs: String,
                          dims: DataFrame, dKey: String, dTs: String,
                          valCols: Seq[String]): DataFrame = {
    require(!valCols.exists(events.columns.contains),
      s"events already carry ${valCols.filter(events.columns.contains).mkString(",")} — " +
        "alias the dim values")
    // the whole dim timeline becomes a plan literal — guard the driver and
    // the serialized-plan size like a broadcast threshold would, and drop
    // null keys/timestamps up front (they can never as-of-match an event;
    // unfiltered they would NPE getLong below). The dim frame is read
    // twice (timeline collect + payload broadcast) — a derived dim (e.g. a
    // distinct+explode over the events) would otherwise be computed twice,
    // so cache it for the query's lifetime via a lazy local checkpoint
    // (materialized by the collect below, reused by the broadcast build).
    val dimsC = dims.localCheckpoint(eager = false)
    val maxTimelineRows = 1 << 20
    val dimRows = dimsC
      .select(col(dKey).cast("long"), tsOrdinal(dimsC, dTs))
      .filter(col(dKey).isNotNull && tsOrdinal(dimsC, dTs).isNotNull)
      .limit(maxTimelineRows + 1)
      .collect()
    require(dimRows.length <= maxTimelineRows,
      s"lastBeforeBroadcast: dim side exceeds $maxTimelineRows rows — too " +
        "large to embed in the plan; use lastBefore/lastBeforeScalable")
    val timeline: Map[Long, Array[Long]] = dimRows
      .groupBy(_.getLong(0))
      .map { case (k, rows) => k -> rows.map(_.getLong(1)).distinct.sorted }
    val matched = events.withColumn("_dim_ts_us",
      GraftShim.column(AsOfLookup(
        GraftShim.expression(col(eKey).cast("long")),
        GraftShim.expression(tsOrdinal(events, eTs)),
        timeline)))
    val d = dimsC.select(
      col(dKey).cast("long").as("_dk") +:
        tsOrdinal(dimsC, dTs).as("_dts") +:
        valCols.map(col): _*)
      .dropDuplicates("_dk", "_dts")
    matched.join(broadcast(d),
        matched(eKey).cast("long") === d("_dk") && matched("_dim_ts_us") === d("_dts"),
        "left")
      .drop("_dim_ts_us", "_dk", "_dts")
  }

  /** Hot-key-safe two-phase variant of [[lastBefore]] (the same dial
    * `Throttle.scalable` applies to panes): a single key's entire history
    * no longer serializes onto one sort partition.
    *
    * Phase 1 buckets both sides by (key, `bucket(ts)`) — any MONOTONE
    * non-decreasing function of the timestamp (e.g. `date_trunc("hour", _)`
    * or an integer div) — and runs the running-last window INSIDE each
    * bucket, so a hot key splits across its time range. Phase 2 computes
    * each bucket's closing dim value (one aggregated row per non-empty
    * (key, bucket)) and carries it forward with a window over that TINY
    * per-bucket table; events whose bucket holds no earlier dim coalesce
    * to the carried-in value. Monotonicity makes the split exact: a dim in
    * an earlier bucket is always ≤ any event ts in a later bucket.
    *
    * Semantics match [[lastBefore]] row-for-row (equivalence-specced and
    * sharing q_asof_join's DuckDB ASOF oracle) except when several dims
    * share one (key, ts): the carry picks the largest payload
    * deterministically where the window form is sort-order-dependent.
    */
  def lastBeforeScalable(events: DataFrame, eKey: String, eTs: String,
                         dims: DataFrame, dKey: String, dTs: String,
                         valCols: Seq[String], bucket: Column => Column): DataFrame = {
    require(!valCols.exists(events.columns.contains),
      s"events already carry ${valCols.filter(events.columns.contains).mkString(",")} — " +
        "a same-named event column would poison the carry-forward; alias the dim values")
    val d = dims.select(
      col(dKey).as(eKey) +: col(dTs).as(eTs) +:
        Seq(struct(valCols.map(col): _*).as("_dimval")): _*)
      .withColumn("_is_dim", lit(1))
    val e = events.withColumn("_is_dim", lit(0))
    val all = e.unionByName(d, allowMissingColumns = true)
      .withColumn("_b", bucket(col(eTs)))
    // in-bucket running last — partitions by (key, bucket), not key alone
    val wIn = Window.partitionBy(col(eKey), col("_b"))
      .orderBy(col(eTs), col("_is_dim").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    // closing dim per (key, bucket), carried into every LATER bucket; the
    // carry window sees one row per non-empty bucket — no hot partition
    val wCarry = Window.partitionBy(col(eKey)).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = all.groupBy(col(eKey), col("_b"))
      .agg(max(when(col("_is_dim") === 1,
        struct(col(eTs).as("_t"), col("_dimval").as("_v")))).as("_last"))
      .withColumn("_cin", last(col("_last"), ignoreNulls = true).over(wCarry).getField("_v"))
      .select(col(eKey), col("_b"), col("_cin"))
    val filled = all.join(carry, Seq(eKey, "_b"), "left")
      .withColumn("_dv",
        coalesce(last(col("_dimval"), ignoreNulls = true).over(wIn), col("_cin")))
    valCols.foldLeft(filled)((df, v) => df.withColumn(v, col(s"_dv.$v")))
      .filter(col("_is_dim") === 0)
      .drop("_is_dim", "_dimval", "_dv", "_b", "_cin")
  }
}
