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
      val path = Bench.ensureInput(spark, rows)
      val cold = Bench.pipelineThroughput(spark, path, rows) // page-cache cold
      val warm = Bench.pipelineThroughput(spark, path, rows)
      println(s"""{"metric":"bigprobe_rows_per_sec","rows":$rows,"cold_first_pass":$cold,"value":$warm}""")
    } finally spark.stop()
  }
}
