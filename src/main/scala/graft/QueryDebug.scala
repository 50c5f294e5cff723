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
    // per-run job census: count + total task time — iterative operators'
    // wall time is usually job-count-bound, so this is the first dial
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (sys.env.contains("QDEBUG_JOBS"))
          System.err.println(s"[qdebug-job] ${j.jobId}: " +
            j.stageInfos.map(s => s"${s.name.takeWhile(_ != '\n').take(60)}(${s.numTasks}t)").mkString(" | "))
      }
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        if (sys.env.contains("QDEBUG_JOBS")) {
          val i = s.stageInfo
          val ms = for {a <- i.completionTime; b <- i.submissionTime} yield a - b
          System.err.println(f"[qdebug-stage] ${i.stageId}%3d ${ms.getOrElse(-1L)}%6d ms " +
            s"${i.numTasks}t ${i.name.takeWhile(_ != '\n').take(70)}")
        }
      }
    })
    val fn = SparkEntry.queries(name)
    if (args.contains("explain")) fn(spark, dir).explain("formatted")
    (1 to 3).foreach { i =>
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(100) // let listener events drain
      System.err.println(f"[qdebug] $name run $i: $sec%.3f s " +
        s"(jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get})")
    }
    spark.stop()
  }
}
