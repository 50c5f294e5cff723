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
      // pre-existence is all we can assert: a pre-existing input may still
      // be page-cache resident from a PRIOR run, so no "cold" claim is made
      println(s"""{"metric":"bigprobe_rows_per_sec","rows":$rows,"first_pass":$first,"input_preexisted":$preexisting,"value":$warm}""")
    } finally spark.stop()
  }
}
