package graft

import org.apache.spark.sql.DataFrame

/** Dev probe for CROSS-QUERY interference inside one bench-shaped session:
  * replays `SparkEntry.queries` alphabetically (warmup + timed, noop sink —
  * the exact Bench phase-1 shape) for the first `n` queries, then re-times
  * the first `k` queries again at the END of the sequence. A re-run slower
  * than its own first timing means earlier queries' JVM/session residue
  * (persisted blocks, JIT queue, GC pressure) taxes later queries — the
  * thing to fix engine-side. Not part of the driver contract.
  *
  *   sbt "runMain graft.SeqProbe 30 8"
  */
object SeqProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 30
    val k = if (args.length > 1) args(1).toInt else 8
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Bench.session(cpus)
    graft.sources.TailFixture.ensure(spark, dir, useAlt = false)
    def timed(fn: (org.apache.spark.sql.SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val qs = SparkEntry.queries.toSeq.sortBy(_._1).take(n)
    val first = qs.map { case (name, fn) =>
      timed(fn) // warmup
      val t = timed(fn)
      System.err.println(f"[seqprobe] $name%-28s $t%8.3f s")
      name -> t
    }
    System.err.println("[seqprobe] ---- re-run of the first queries at sequence end ----")
    qs.take(k).foreach { case (name, fn) =>
      val t = timed(fn)
      val t0 = first.find(_._1 == name).get._2
      System.err.println(f"[seqprobe] $name%-28s $t%8.3f s (was $t0%.3f, x${t / t0}%.2f)")
    }
    spark.stop()
  }
}
