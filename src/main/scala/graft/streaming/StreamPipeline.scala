package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

import graft.run.PipelineSpec
import graft.run.Pipeline

/** Structured Streaming wrapper (SURVEY §1.3: the reference is an
  * incremental streamer; every operator here is a pure function of
  * (tag, ts, record), so the SAME column-level transform chain runs under
  * `readStream` unchanged — batch-first, streaming as a wrapper).
  *
  * `Trigger.AvailableNow` + the file source's own checkpoint reproduces
  * the reference's chunk-flush cadence (`flb_engine.c:434-442`); the
  * ledger covers batch resume, the streaming checkpointLocation covers
  * stream resume.
  */
object StreamPipeline {

  /** BASELINE input shape for schema-required streaming reads. */
  val tokenSchema: StructType = StructType(Seq(
    StructField("seq", LongType),
    StructField("doc_id", StringType),
    StructField("tokens", ArrayType(IntegerType)),
    StructField("n_tok", IntegerType),
    StructField("source", StringType)))

  def tokenStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(tokenSchema).parquet(dir)

  /** The batch pipeline transform applied to a stream — identical code
    * path ([[Pipeline.transform]] is pure column expressions).
    */
  def routed(stream: DataFrame, spec: PipelineSpec): DataFrame =
    Pipeline.transform(stream, spec)

  /** `out_flowcounter` as a streaming windowed aggregate: tumbling window
    * counts + sums with a watermark (event_based mode,
    * `out_flowcounter.c:150-231`).
    */
  def flowCounter(stream: DataFrame, tsCol: String, window: String,
                  watermark: String, sumCol: String): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window), col("sink"))
      .agg(count(lit(1)).as("cnt"), sum(col(sumCol)).as("sum_val"))

  /** Streaming exact dedup: drop duplicate keys ACROSS micro-batches with
    * bounded state (`dropDuplicatesWithinWatermark` — late duplicates
    * beyond the watermark age out; the streaming face of
    * [[graft.operators.Dedup.exactRows]]).
    */
  def streamingDedup(stream: DataFrame, keyCols: Seq[String],
                     tsCol: String, watermark: String): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  // ------------------------------------------------------------- throttle
  final case class ThrottleIn(pane: Long, ts: java.sql.Timestamp, key: Long)
  final case class PaneState(emitted: Long)

  /** `filter_throttle` as stateful streaming: per event-time pane, pass
    * records until the pane's budget (`rate × interval`) is spent — the
    * streaming face of the deterministic batch reformulation
    * (`throttle.c:89-99`; state = the reference's ring pane counter).
    */
  def throttle(ds: Dataset[ThrottleIn], cap: Long): Dataset[ThrottleIn] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.pane)
      .flatMapGroupsWithState[PaneState, ThrottleIn](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[ThrottleIn], state: GroupState[PaneState]) =>
          val already = state.getOption.map(_.emitted).getOrElse(0L)
          val budget = math.max(0L, cap - already)
          val taken = rows.take(budget.toInt).toSeq
          state.update(PaneState(already + taken.size))
          taken.iterator
      }
  }

  // ------------------------------------------------------------ multiline
  final case class MlLine(file: String, lineNo: Long, line: String)
  final case class MlPending(startLine: Long, buf: String)
  final case class MlRecord(file: String, firstLine: Long, record: String)

  /** Streaming `tail` multiline: firstline-anchored record assembly with
    * state that carries a PARTIAL record across micro-batches — the
    * reference buffers exactly this in `struct flb_tail_file`
    * (`tail_multiline.c:250-313`); a record whose continuation lines
    * arrive in a later chunk must still assemble.
    *
    * A pending record closes when the next head arrives. The LAST record
    * of a stream stays pending until its key times out
    * (`timeoutMs` ≈ the reference's `Flush_MS` wall-clock flush;
    * `timeoutMs <= 0` disables the flush — pending records then only close
    * on the next head, which keeps bounded drains deterministic) — an
    * inherent property of head-anchored assembly, not an implementation
    * gap.
    *
    * Contract: lines of one file arrive in order ACROSS micro-batches
    * (within a batch they are sorted by lineNo) — the tail source reads
    * files sequentially, so this matches the reference's input model;
    * an out-of-order source would need a watermark-buffered sort first.
    */
  def multiline(ds: Dataset[MlLine], firstlineRegex: String,
                timeoutMs: Long = 4000): Dataset[MlRecord] = {
    import ds.sparkSession.implicits._
    val re = firstlineRegex.r
    val timeoutConf =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    ds.groupByKey(_.file)
      .flatMapGroupsWithState[MlPending, MlRecord](
        OutputMode.Append, timeoutConf) {
        (file: String, rows: Iterator[MlLine], state: GroupState[MlPending]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // Flush_MS fired: emit whatever is buffered
            val out = state.getOption.map(p => MlRecord(file, p.startLine, p.buf)).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(_.lineNo)
            var pending = state.getOption
            val out = Seq.newBuilder[MlRecord]
            sorted.foreach { l =>
              if (re.findFirstIn(l.line).isDefined) {
                pending.foreach(p => out += MlRecord(file, p.startLine, p.buf))
                pending = Some(MlPending(l.lineNo, l.line))
              } else pending = pending.map(p => p.copy(buf = p.buf + "\n" + l.line))
              // leading continuations before any head are dropped (batch ≡)
            }
            pending match {
              case Some(p) =>
                state.update(p)
                if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
              case None => if (state.exists) state.remove()
            }
            out.result().iterator
          }
      }
  }

  /** Run a stream to completion over existing files (test/batch-drain
    * mode): memory sink, AvailableNow, blocking.
    */
  def drainToMemory(df: DataFrame, name: String, outputMode: String = "append"): Unit = {
    val q = df.writeStream
      .format("memory").queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
