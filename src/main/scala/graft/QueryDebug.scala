package graft

/** Dev tool: time and explain one `SparkEntry.queries` entry.
  *
  *   sbt "runMain graft.QueryDebug fb_parse_json /root/testdata/sf0.1 [explain]"
  *
  * Runs the query 3× against the given table dir (noop sink, same
  * full-materialization shape as [[Bench]]) and prints per-run seconds;
  * with `explain` also prints the formatted physical plan. Not part of the
  * driver contract — a profiling loop for growth-map outliers.
  */
object QueryDebug {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    // `explain` is a flag, not a dir — dir is the first non-flag arg
    val dir = args.drop(1).find(_ != "explain").getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Bench.session(cpus)
    val fn = SparkEntry.queries(name)
    if (args.contains("explain")) fn(spark, dir).explain("formatted")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      System.err.println(f"[qdebug] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
