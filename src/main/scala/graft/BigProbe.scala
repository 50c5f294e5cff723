package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off deep-scale probe: the headline pipeline at GRAFT_PROBE_ROWS
  * (default 300M — ~10× the 32M steady input) on local[32]. Prints one
  * JSON line; input parquet cached under target/ like Bench's phases.
  * Not part of the driver protocol — evidence for BASELINE.md's
  * beyond-comfort-zone table.
  */
object BigProbe {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("GRAFT_PROBE_ROWS", "300000000").toLong
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-bigprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (64L << 20).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = s"target/bench_input_$rows"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_SUCCESS"))) {
      System.err.println(s"[probe] building $rows-row input …")
      graft.sources.TokenTable.synthetic(spark, rows, 256)
        .write.mode("overwrite").parquet(path)
    }
    val dim = spark.range(0, 10)
      .select(concat(lit("web-"), col("id").cast("string"), lit("_default")).as("pod_key"),
        concat(lit("team-"), col("id").cast("string")).as("team"))
    val spec = graft.run.PipelineSpec(
      grep = Seq(graft.operators.Grep.Regex("code", "^5")),
      sinks = graft.sources.TokenTable.Sinks.map((graft.route.SinkSpec.apply _).tupled),
      enrichDim = Some(dim))
    def once(): Double = {
      val t0 = System.nanoTime()
      graft.run.Pipeline.transform(spark.read.parquet(path), spec)
        .groupBy(col("sink")).agg(count(lit(1)), sum(col("n_tok"))).collect()
      rows / ((System.nanoTime() - t0) / 1e9)
    }
    val warm = once()
    val r = once()
    println(s"""{"metric":"bigprobe_rows_per_sec","rows":$rows,"warm":$warm,"value":$r}""")
    spark.stop()
  }
}
