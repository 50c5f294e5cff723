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
