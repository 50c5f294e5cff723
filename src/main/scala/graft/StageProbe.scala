package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.run.Pipeline

/** Stage-decomposition scaling probe (round-6 DRAM investigation): times
  * cumulative prefixes of the headline pipeline at local[4] and local[16]
  * on the shared bench input, so the 4→16 efficiency loss can be located
  * in a STAGE instead of attributed to the job as a whole.
  *
  * Stages (each cumulative, same input):
  *   - scan_ntok:  parquet scan + decode of the int column only
  *   - scan_doc:   parquet scan + decode of the doc_id string column
  *   - parse_grep: + regex parse and grep filter (count)
  *   - enrich:     + broadcast kubernetes enrich (count)
  *   - full:       + fan-out route + per-sink aggregate (the headline job)
  *
  * Usage: GRAFT_BENCH_ROWS=32000000 sbt "runMain graft.StageProbe"
  * Emits one JSON line: per-stage seconds at both levels + efficiency.
  */
object StageProbe {

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("GRAFT_BENCH_ROWS", "32000000").toLong
    val inputPath = {
      val s = Bench.session(8)
      try Bench.ensureInput(s, rows) finally s.stop()
    }

    def stages(s: SparkSession): Seq[(String, () => Unit)] = {
      val dim = s.range(0, 10)
        .select(concat(lit("web-"), col("id").cast("string"), lit("_default")).as("pod_key"),
          concat(lit("team-"), col("id").cast("string")).as("team"))
      def in = s.read.parquet(inputPath)
      val parseOnly = Bench.benchSpec.copy(sinks = Nil, enrichDim = None)
      val enrichSpec = parseOnly.copy(enrichDim = Some(dim))
      Seq(
        "scan_ntok" -> (() => { in.agg(sum(col("n_tok"))).collect(); () }),
        "scan_doc" -> (() => { in.agg(sum(length(col("doc_id")))).collect(); () }),
        "parse_grep" -> (() => {
          val t = Pipeline.transform(in, parseOnly)
          t.agg(count(lit(1)), sum(col("n_tok"))).collect(); ()
        }),
        "enrich" -> (() => {
          val t = Pipeline.transform(in, enrichSpec)
          t.agg(count(lit(1)), sum(col("n_tok"))).collect(); ()
        }),
        "full" -> (() => { Bench.pipelineThroughput(s, inputPath, rows); () })
      )
    }

    def measure(cores: Int): Map[String, Double] = {
      val s = Bench.session(cores)
      try stages(s).map { case (name, f) =>
        f() // warm (codegen + file index)
        val sec = math.min(time(f()), time(f()))
        System.err.println(f"[stageprobe] local[$cores] $name%-10s $sec%.2f s")
        name -> sec
      }.toMap
      finally s.stop()
    }

    // interleave levels inside one weather window per stage set
    val a4 = measure(4)
    val a16 = measure(16)
    val b4 = measure(4)
    val b16 = measure(16)
    val names = Seq("scan_ntok", "scan_doc", "parse_grep", "enrich", "full")
    // raw Double toString via rounding — locale-proof (f"%.3f" would emit
    // ',' decimals on comma-decimal locales and break the JSON line)
    def r3(x: Double): Double = math.rint(x * 1000) / 1000
    val out = names.map { n =>
      val t4 = math.min(a4(n), b4(n))
      val t16 = math.min(a16(n), b16(n))
      val eff = t4 / (4.0 * t16) // time ratio: perfect scaling → t16 = t4/4
      s""""$n":{"t4":${r3(t4)},"t16":${r3(t16)},"eff":${r3(eff)}}"""
    }.mkString(",")
    println(s"""{"rows":$rows,$out}""")
  }
}
