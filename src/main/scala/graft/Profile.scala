package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Grep
import graft.route.{Router, SinkSpec}
import graft.run.{Pipeline, PipelineSpec}
import graft.sources.TokenTable

/** Stage-by-stage cost breakdown of the headline pipeline — where do the
  * microseconds per row go? `runMain graft.Profile [rows]`.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 8000000L
    val inputPath = s"target/bench_input_$rows"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (16L << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.ensureInput(spark, rows) // shared canonical input layout

    val sinks = TokenTable.Sinks.map((SinkSpec.apply _).tupled)
    val dim = spark.range(0, 10)
      .select(concat(lit("web-"), col("id").cast("string"), lit("_default")).as("pod_key"),
        concat(lit("team-"), col("id").cast("string")).as("team"))

    def in = spark.read.parquet(inputPath)
    def time(label: String)(df: => DataFrame): Unit = {
      df.foreach(_ => ()) // warm
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.foreach(_ => ())
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[profile] $label%-28s ${best}%7.2f s  ${rows / best / 1e6}%6.2f M rows/s")
    }

    time("scan only")(in.select(col("n_tok")))
    time("scan full row")(in)
    time("+ apache parse")(in.withColumn("p", graft.parsers.Parsers.apache.parsed(col("doc_id"))))
    time("+ grep on parsed")(Pipeline.transform(in,
      PipelineSpec(grep = Seq(Grep.Regex("code", "^5")), sinks = Seq(SinkSpec("all", "*")))).drop("sink"))
    time("+ enrich (broadcast)")(Pipeline.transform(in,
      PipelineSpec(grep = Seq(Grep.Regex("code", "^5")), sinks = Seq(SinkSpec("all", "*")),
        enrichDim = Some(dim))).drop("sink"))
    time("full fan-out (4 sinks)")(Pipeline.transform(in,
      PipelineSpec(grep = Seq(Grep.Regex("code", "^5")), sinks = sinks, enrichDim = Some(dim))))
    time("kube regex alone")(in.select(graft.enrich.Enrich.kubeMeta(col("source")).as("m")))
    time("scan 3 cols (no tokens)")(in.select(col("doc_id"), col("source"), col("n_tok")))

    // the bench agg: does pruning reach the scan (tokens must NOT be read)?
    val agg = Pipeline.transform(in,
      PipelineSpec(grep = Seq(Grep.Regex("code", "^5")), sinks = sinks, enrichDim = Some(dim)))
      .groupBy(col("sink")).agg(count(lit(1)), sum(col("n_tok")))
    val scan = agg.queryExecution.executedPlan.toString
    val schemaLine = scan.linesIterator.find(_.contains("ReadSchema")).getOrElse("?")
    println(s"[profile] bench agg $schemaLine")
    val t0 = System.nanoTime(); agg.collect()
    val t1 = System.nanoTime(); agg.collect()
    println(f"[profile] bench agg end-to-end: cold ${(t1 - t0) / 1e9}%.2f s, warm ${(System.nanoTime() - t1) / 1e9}%.2f s")
    spark.stop()
  }
}
