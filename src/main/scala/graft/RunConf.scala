package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.run.ConfPipeline

/** Run a classic fluent-bit-style config on Spark:
  *
  * {{{
  *   runMain graft.RunConf <pipeline.conf> <parsers.conf> [outDir]
  * }}}
  *
  * The switch path for a reference user: same `[INPUT]/[FILTER]/[OUTPUT]`
  * sections, same `[PARSER]` definitions, executed as one Catalyst plan
  * per output over a shared cached core (SURVEY §3.3).
  */
object RunConf {
  def main(args: Array[String]): Unit = {
    val confPath = args(0)
    val parsersPath = args(1)
    val outDir = if (args.length > 2) args(2) else "target/conf_out"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-conf")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val loaded = ConfPipeline.load(spark,
      Files.readString(Paths.get(confPath)),
      Files.readString(Paths.get(parsersPath)))
    val results = ConfPipeline.run(loaded, outDir)
    results.foreach { case (sink, n) => println(s"[conf] output $sink: $n records") }
    spark.stop()
  }
}
