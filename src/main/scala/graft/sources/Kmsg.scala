package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `in_kmsg` record semantics (`plugins/in_kmsg/in_kmsg.c:108-210`): a
  * kernel-log line
  *
  *   `<prio+facility>,<sequence>,<usec-since-boot>[,flags];<message>`
  *
  * becomes `{priority, sequence, sec, usec, msg}` where
  *   - `priority` = first number & 7 (`FLB_KLOG_PRI`, the facility bits
  *     masked off),
  *   - `sec`/`usec` are the MONOTONIC microsecond timestamp split —
  *     not wall-clock (in_kmsg.c:157-158),
  *   - the event time is `boot_sec + sec` (the reference adds only
  *     `boot_time.tv_sec`, ignoring its usec part — mirrored,
  *     in_kmsg.c:160),
  *   - a line missing a numeric header field or the `;` separator is
  *     dropped. DOCUMENTED DEVIATION (stricter): raw strtol reads a
  *     non-numeric field as 0 with errno untouched and the reference
  *     would continue with garbage offsets; try_cast drops the line
  *     instead.
  *
  * The DEVICE read (/dev/kmsg) stays an offline non-goal; this parse
  * face consumes any lines DataFrame (tail/tcp source, or the conf face
  * reading a Path capture). DOCUMENTED DEVIATION: the reference strips
  * the line's final byte (the newline still in its raw device buffer,
  * `line_len - 1`); lines here arrive already newline-stripped, so the
  * message is taken whole.
  */
object Kmsg {

  /** Boot time seconds the reference derives from /proc/uptime
    * (in_kmsg.c:50-103: gettimeofday − uptime, truncated to seconds).
    */
  def bootTimeSec(): Long = {
    val up = Files.readString(Paths.get("/proc/uptime")).split("\\s+")(0).toDouble
    (System.currentTimeMillis() / 1000.0 - up).toLong
  }

  /** Parse kmsg-format lines; non-line columns (tag, file) pass through. */
  def parse(lines: DataFrame, lineCol: String = "line",
            bootSec: Long = 0L): DataFrame = {
    val l = col(lineCol)
    // try_cast + get(): the fail path DROPS the line — ANSI cast would
    // throw on a non-numeric field and ANSI [i] throws on a short array
    val praw = expr(s"try_cast(get(split(substring_index($lineCol, ';', 1), ','), 0) AS BIGINT)")
    val seqN = expr(s"try_cast(get(split(substring_index($lineCol, ';', 1), ','), 1) AS BIGINT)")
    val usTot = expr(s"try_cast(get(split(substring_index($lineCol, ';', 1), ','), 2) AS BIGINT)")
    val others = lines.columns.filterNot(_ == lineCol).map(col).toSeq
    lines
      .withColumn("_praw", praw)
      .withColumn("_seq", seqN)
      .withColumn("_us", usTot)
      .filter(col("_praw").isNotNull && col("_seq").isNotNull &&
        col("_us").isNotNull && locate(";", l) > 0)
      .select(others ++ Seq(
        timestamp_micros((lit(bootSec) + expr("_us div 1000000")) * 1000000L
          + pmod(col("_us"), lit(1000000L))).as("ts"),
        col("_praw").bitwiseAND(lit(7L)).as("priority"),
        col("_seq").as("sequence"),
        expr("_us div 1000000").as("sec"),
        pmod(col("_us"), lit(1000000L)).as("usec"),
        expr(s"substring($lineCol, locate(';', $lineCol) + 1)").as("msg")): _*)
  }
}
