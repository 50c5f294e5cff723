package graft.run

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Engine metrics via SparkListener — the Spark-native restatement of the
  * reference's per-instance counters (`include/fluent-bit/flb_metrics.h:28-35`):
  *
  * | reference                  | here                                  |
  * |----------------------------|---------------------------------------|
  * | FLB_METRIC_N_RECORDS/BYTES | records_in / bytes_in (scan metrics)  |
  * | FLB_METRIC_OUT_OK_RECORDS  | out_ok_records (write metrics)        |
  * | FLB_METRIC_OUT_OK_BYTES    | out_ok_bytes                          |
  * | FLB_METRIC_OUT_ERROR       | out_errors (failed tasks)             |
  * | FLB_METRIC_OUT_RETRY       | retries (task retries handled by      |
  * |                            | spark.task.maxFailures — counted here)|
  *
  * Task-level input/output metrics are summed across the lifetime of the
  * listener; per-sink OK record counts live in the commit markers (they
  * are data-dependent aggregates, not task metrics).
  */
class GraftMetricsListener extends SparkListener {
  val recordsIn = new AtomicLong
  val bytesIn = new AtomicLong
  val outOkRecords = new AtomicLong
  val outOkBytes = new AtomicLong
  val outErrors = new AtomicLong
  val retries = new AtomicLong

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m != null && e.taskInfo != null && e.taskInfo.successful) {
      recordsIn.addAndGet(m.inputMetrics.recordsRead)
      bytesIn.addAndGet(m.inputMetrics.bytesRead)
      outOkRecords.addAndGet(m.outputMetrics.recordsWritten)
      outOkBytes.addAndGet(m.outputMetrics.bytesWritten)
    } else if (e.taskInfo != null && !e.taskInfo.successful) {
      outErrors.incrementAndGet()
      if (e.taskInfo.attemptNumber > 0) retries.incrementAndGet()
    }
  }

  def snapshot: Map[String, Long] = Map(
    "records_in" -> recordsIn.get,
    "bytes_in" -> bytesIn.get,
    "out_ok_records" -> outOkRecords.get,
    "out_ok_bytes" -> outOkBytes.get,
    "out_errors" -> outErrors.get,
    "retries" -> retries.get)
}

object GraftMetricsListener {
  /** Install a fresh listener on the session. */
  def install(spark: SparkSession): GraftMetricsListener = {
    val l = new GraftMetricsListener
    spark.sparkContext.addSparkListener(l)
    l
  }
}
