package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `in_tail` (reference `plugins/in_tail/`): follow files by glob, split on
  * newlines, compose a per-file dynamic tag from the path.
  *
  * Tag composition (`tail_file.c:306-336`): the configured tag pattern's
  * `*` is replaced by the file path with `/` → `.` and leading dots
  * trimmed — `tail.0` style static tags work too. The SQLite offset
  * checkpoint (`tail_db.c:91-145`) maps to the snapshot ledger
  * ([[graft.run.SnapshotLedger]]): a committed file group is never re-read.
  *
  * Two read modes:
  *   - [[lines]] — `spark.read.text` + `input_file_name()`: fully
  *     distributed, large files split across tasks; NO stable line
  *     numbers (fine for stateless parse/filter pipelines).
  *   - [[linesNumbered]] — `wholetext` + `posexplode`: exact per-file line
  *     numbers for multiline assembly; one task per file, so only for
  *     inputs where a file fits an executor (the reference's multiline is
  *     likewise per-file sequential).
  */
object TailSource {

  /** Dotted-path tag: `/var/log/app.log` → `var.log.app.log`, spliced into
    * the tag pattern at `*`.
    */
  def composeTag(tagPattern: String, file: Column): Column = {
    val dotted = regexp_replace(regexp_replace(file, "^file:/*", ""), "/", ".")
    val idx = tagPattern.indexOf('*')
    if (idx < 0) lit(tagPattern)
    else concat(
      lit(tagPattern.substring(0, idx)),
      dotted,
      lit(tagPattern.substring(idx + 1)))
  }

  def lines(spark: SparkSession, pathGlob: String, tagPattern: String = "*"): DataFrame = {
    val df = spark.read.text(pathGlob)
    df.select(
      col("value").as("line"),
      input_file_name().as("file"),
      composeTag(tagPattern, input_file_name()).as("tag"))
  }

  def linesNumbered(spark: SparkSession, pathGlob: String, tagPattern: String = "*"): DataFrame = {
    val df = spark.read.option("wholetext", "true").text(pathGlob)
    df.select(input_file_name().as("file"), col("value"))
      .select(col("file"),
        posexplode(split(col("value"), "\n")).as(Seq("line_no", "line")))
      .filter(col("line") =!= "") // trailing newline artifact
      .withColumn("tag", composeTag(tagPattern, col("file")))
  }
}

/** Deterministic synthetic inputs mirroring the reference's test/dev
  * sources: `in_dummy` repeats a fixed record (`plugins/in_dummy/
  * in_dummy.c:36-61`), `in_random` emits `{"rand_value": N}` samples
  * (`plugins/in_random/random.c`). Both seeded/derived — never wall clock.
  */
object Generators {
  /** n copies of a fixed JSON-ish record with sequenced timestamps. */
  def dummy(spark: SparkSession, n: Long, record: Map[String, String],
            baseEpoch: Long = TokenTable.BaseEpoch, ratePerSec: Long = 1): DataFrame = {
    val df = spark.range(n)
    val cols = record.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }
    df.select(
      to_timestamp(lit(baseEpoch) + col("id") / ratePerSec).as("ts"),
      map(cols: _*).as("record"))
  }

  /** Seeded uniform samples as `rand_value`. */
  def random(spark: SparkSession, n: Long, seed: Long = 42): DataFrame =
    spark.range(n).select(col("id"),
      (rand(seed) * Long.MaxValue).cast("long").as("rand_value"))
}
