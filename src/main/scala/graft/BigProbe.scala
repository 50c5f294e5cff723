package graft

/** One-off deep-scale probe: the headline pipeline at GRAFT_PROBE_ROWS
  * (default 300M — ~10× the 32M steady input) on local[32]. Reuses
  * Bench's session, spec, input cache (canonical 128-file layout) and
  * timing helper so the numbers are comparable by construction. Prints
  * one JSON line; not part of the driver protocol — evidence for
  * BASELINE.md's beyond-comfort-zone table.
  */
object BigProbe {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("GRAFT_PROBE_ROWS", "300000000").toLong
    val spark = Bench.session(32)
    try {
      // if ensureInput is about to BUILD the parquet in-process, the first
      // pass reads files the writer just left resident in page cache — only
      // a pre-existing input gives an honestly cold first pass
      val preexisting = java.nio.file.Files
        .exists(java.nio.file.Paths.get(s"target/bench_input_$rows", "_SUCCESS"))
      val path = Bench.ensureInput(spark, rows)
      val first = Bench.pipelineThroughput(spark, path, rows)
      val warm = Bench.pipelineThroughput(spark, path, rows)
      // fixed keys: first_pass_cold says whether the first pass was an
      // honest cold read (input pre-existed) or cache-warm (just built)
      println(s"""{"metric":"bigprobe_rows_per_sec","rows":$rows,"first_pass":$first,"first_pass_cold":$preexisting,"value":$warm}""")
    } finally spark.stop()
  }
}
