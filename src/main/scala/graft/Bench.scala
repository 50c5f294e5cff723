package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Grep
import graft.route.SinkSpec
import graft.run.{Pipeline, PipelineSpec}
import graft.sources.TokenTable

/** Benchmark main — emits ONE JSON line for the driver:
  *
  *   - `queries`: per-operator seconds over the sf tables (steady-state:
  *     each query runs twice, second run reported), PAIRED with the same
  *     query at `GRAFT_BENCH_SCALED_FACTOR`× data so each growth ratio is
  *     measured inside one host-weather window; growth outliers get one
  *     warm re-measure (both attempts published);
  *   - headline `metric`/`value`: parsed+routed sequences/sec of the full
  *     pipeline (parse → grep → enrich → fan-out route → per-sink
  *     count/sum) over a GRAFT_BENCH_ROWS-row synthetic token table read
  *     from parquet;
  *   - `scaling`: the BASELINE two-cluster-size protocol proxied as
  *     local[4] vs local[16] on identical input — per-block efficiency
  *     thr(16) / (4 × thr(4)), median over throttle-clean blocks
  *     (BASELINE.md row 2); a result > 1.0 is reported INVALID, never as
  *     a clean number.
  *
  * Also rewrites BENCH.md with the same numbers for human readers.
  */
object Bench {

  /** Headline growth for one query from its first-attempt growth `g` and
    * the re-measure attempts (1×, scaled) — see the re-measure loop for
    * the protocol: no attempts → `g`; one agreeing attempt (both over
    * threshold) → warm min; two attempts (the re-roll straddled the
    * threshold, so a tie-break pair ran) → median of the three, so one
    * lucky sub-threshold roll cannot mask a reproducing super-linear
    * plan, and a cold first attempt cannot survive two warm refutations.
    */
  private[graft] def finalGrowth(g: Double, attempts: Seq[(Double, Double)]): Double = {
    val rolls = attempts.collect { case (a, b) if a > 0 && b > 0 => b / a }
    rolls.size match {
      case 0 => g
      case 1 => math.min(g, rolls.head)
      case _ =>
        val all = (g +: rolls).sorted
        all(all.size / 2)
    }
  }

  private[graft] def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // local-scale split sizing: the bench input is ~6 MB/file; the
      // default 128 MB maxPartitionBytes bin-packs dozens of files into a
      // handful of splits and starves the 32-thread run (observed: 5
      // splits → 0.57 scaling efficiency). 16 MB keeps ≈1 task/file here;
      // at cluster scale the default is correct and this override is a
      // bench-harness knob, not an engine requirement.
      .config("spark.sql.files.maxPartitionBytes", (16L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (1L << 20).toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftExtensions.installRules(s)
    s
  }

  /** Write a `factor`× blow-up of the sf tables: per-table id columns are
    * shifted by copy × 10⁷ so dedup/join keys stay distinct across copies
    * (tables without a listed id are copied through once — small dims).
    * Used by the scaled per-query phase; the output is cached in target/.
    */
  private val scaledIdShift = Map(
    "documents.parquet" -> "doc_id",
    "embeddings.parquet" -> "vec_id",
    "events.parquet" -> "event_id",
    "orders.parquet" -> "o_orderkey")

  /** Marker content = source-table fingerprint (name:size:mtime per table):
    * regenerated sf tables invalidate the cache instead of silently timing
    * against stale data.
    */
  private def scaledFingerprint(sfDir: String): String =
    new java.io.File(sfDir).list().filter(_.endsWith(".parquet")).sorted.map { t =>
      val f = Paths.get(sfDir, t)
      val (sz, mt) =
        if (Files.isDirectory(f)) {
          val st = Files.list(f)
          val parts =
            try st.toArray.map(_.asInstanceOf[java.nio.file.Path])
            finally st.close()
          (parts.map(Files.size).sum, parts.map(p => Files.getLastModifiedTime(p).toMillis).foldLeft(0L)(math.max))
        } else (Files.size(f), Files.getLastModifiedTime(f).toMillis)
      s"$t:$sz:$mt"
    }.mkString("\n")

  private def buildScaled(spark: SparkSession, sfDir: String, outDir: String,
                          factor: Int): Unit = {
    val tables = new java.io.File(sfDir).list().filter(_.endsWith(".parquet"))
    tables.foreach { t =>
      val df = spark.read.parquet(s"$sfDir/$t")
      val out = scaledIdShift.get(t) match {
        case Some(id) =>
          (0 until factor).map(k =>
            df.withColumn(id, col(id) + lit(k * 10000000L))).reduce(_ unionByName _)
        case None => df
      }
      // ≥32 part files per scaled table: the scaled phase measures COST
      // CLASS vs the 1× run, so its input must not collapse into one
      // split and serialize the run onto a single core (round-3 finding:
      // 10 files × ~1.6 MB effective < 16 MB maxPartitionBytes = 1 task)
      out.repartition(32).write.mode("overwrite").parquet(s"$outDir/$t")
    }
    // completion marker: an interrupted build leaves the dir without it,
    // so the next run rebuilds instead of timing against partial tables
    Files.writeString(Paths.get(outDir, "_GRAFT_SCALED_OK"), scaledFingerprint(sfDir))
    System.err.println(s"[bench] built ${factor}x scaled tables at $outDir")
  }

  private[graft] val benchSpec = PipelineSpec(
    grep = Seq(Grep.Regex("code", "^5")),
    sinks = TokenTable.Sinks.map((SinkSpec.apply _).tupled))

  /** The headline job: full pipeline over the synthetic token table,
    * per-sink aggregates collected. Returns rows/sec.
    */
  /** Build-or-reuse the shared synthetic input parquet at the canonical
    * layout (128 part files) — EVERY tool that touches
    * `target/bench_input_<rows>` must go through here: split count moves
    * measured scaling (documented on [[session]]), so a cache populated
    * with a different layout silently skews whichever tool runs second.
    * `_SUCCESS` is checked so an interrupted build is rebuilt, not timed.
    */
  private[graft] def ensureInput(spark: SparkSession, rows: Long): String = {
    val path = s"target/bench_input_$rows"
    if (!Files.exists(Paths.get(path, "_SUCCESS"))) {
      System.err.println(s"[bench] building $rows-row input at $path …")
      TokenTable.synthetic(spark, rows, 128)
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  private[graft] def pipelineThroughput(spark: SparkSession, inputPath: String, rows: Long): Double = {
    val dim = spark.range(0, 10)
      .select(concat(lit("web-"), col("id").cast("string"), lit("_default")).as("pod_key"),
        concat(lit("team-"), col("id").cast("string")).as("team"))
    val spec = benchSpec.copy(enrichDim = Some(dim))
    val t0 = System.nanoTime()
    Pipeline.transform(spark.read.parquet(inputPath), spec)
      .groupBy(col("sink"))
      .agg(count(lit(1)), sum(col("n_tok")))
      .collect()
    val sec = (System.nanoTime() - t0) / 1e9
    System.err.println(f"[bench] pipeline ${spark.sparkContext.master}: $sec%.2f s (${rows / sec}%.0f rows/s)")
    rows / sec
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchRows = sys.env.getOrElse("GRAFT_BENCH_ROWS", "32000000").toLong
    val inputPath = s"target/bench_input_$benchRows"

    // raw-CPU probe (also used per scaling block below): detects host
    // throttle windows so each phase's numbers carry their own weather tag
    def rawCpu(nThreads: Int, millis: Long = 3000): Double = {
      val done = new java.util.concurrent.atomic.AtomicLong
      val stop = System.nanoTime() + millis * 1000000L
      val ts = (1 to nThreads).map { _ =>
        new Thread(() => {
          var c = 0L
          var x = 1L
          while (System.nanoTime() < stop) {
            var i = 0
            while (i < 100000) { x = x * 6364136223846793005L + 1442695040888963407L; i += 1 }
            c += 100000
          }
          if (x != 0) done.addAndGet(c)
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      done.get.toDouble / (millis / 1000.0)
    }

    // memory-BANDWIDTH probe: per-thread stream-sum over a 16 MB long
    // array (far past L2), one read per 64-byte line. The ALU busy-loop
    // misses host windows that throttle DRAM but not compute — run 14 had
    // a block with CLEAN busy-loop probes and 0.44 job efficiency; the
    // job is memory-bound, the probe was not. Returns bytes/sec.
    lazy val memArrays = Array.fill(16)(new Array[Long](2 << 20))
    def rawMem(nThreads: Int = 16, millis: Long = 1200): Double = {
      require(nThreads <= memArrays.length,
        s"rawMem supports at most ${memArrays.length} threads (got $nThreads)")
      val done = new java.util.concurrent.atomic.AtomicLong
      val stop = System.nanoTime() + millis * 1000000L
      val ts = (0 until nThreads).map { t =>
        new Thread(() => {
          val a = memArrays(t)
          var s = 0L
          var bytes = 0L
          while (System.nanoTime() < stop) {
            var i = 0
            while (i < a.length) { s += a(i); i += 8 }
            bytes += a.length.toLong * 8
          }
          if (s != Long.MinValue) done.addAndGet(bytes)
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      done.get.toDouble / (millis / 1000.0)
    }

    // ---- phase 1: per-query timings, 1× and FACTOR× PAIRED per query.
    // Round-4 finding: running ALL 1× queries (warm) and then ALL scaled
    // queries (cold, ~15 min later) made the growth map hostage to host
    // weather — a throttle window inside the scaled phase is invisible to
    // phase-level bracket probes and inflated "growth" to 69× for queries
    // a quiet run measures at ≤6×. Pairing runs each query's 1× and
    // FACTOR× back-to-back (seconds apart, same weather window), so the
    // RATIO is throttle-immune even when the absolute times are not.
    // Same total work as the two-phase form, just reordered.
    val scaledFactor = sys.env.getOrElse("GRAFT_BENCH_SCALED_FACTOR", "10").toInt
    val queriesOnly = sys.env.get("GRAFT_BENCH_QUERIES_ONLY").contains("1")
    val pairScaled = scaledFactor > 1 && !queriesOnly
    val scaledDir = s"target/bench_scaled_${new java.io.File(sfDir).getName}_x$scaledFactor"
    val spark = session(cpus)
    rawCpu(16, 300) // JIT warm the probe loop (a cold first probe reads low)
    ensureInput(spark, benchRows)
    if (pairScaled) {
      val markerOk = Files.exists(Paths.get(scaledDir, "_GRAFT_SCALED_OK")) &&
        Files.readString(Paths.get(scaledDir, "_GRAFT_SCALED_OK")) == scaledFingerprint(sfDir)
      if (!markerOk) buildScaled(spark, sfDir, scaledDir, scaledFactor)
    }
    // pre-warm both inputs into the page cache (sf0.1 ≈ 17 MB, 10× ≈ 67 MB)
    // so no query pays first-touch file I/O inside its timed run
    def warmDir(dir: String): Unit = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else { Files.readAllBytes(f.toPath).length.toLong }
      val n = walk(new java.io.File(dir))
      System.err.println(s"[bench] page-cache warmed $dir (${n >> 20} MB)")
    }
    warmDir(sfDir)
    if (pairScaled) warmDir(scaledDir)
    // tail/head fixture generation runs HERE, outside the timed loop —
    // the fb_tail/fb_head query bodies are pure read-side (TailFixture
    // memoizes per dir; the scaled dir gets the alternate root so both
    // fixtures coexist across the paired per-query runs)
    graft.sources.TailFixture.ensure(spark, sfDir, useAlt = false)
    if (pairScaled) graft.sources.TailFixture.ensure(spark, scaledDir, useAlt = true)
    // split sizing differs per side (documented on [[session]] / the scaled
    // build): 1× reads ~6 MB files → 16 MB splits; scaled reads 32 × ~2 MB
    // files → 2 MB splits so both sides run at full parallelism
    def confs(scaled: Boolean): Unit =
      if (scaled) {
        spark.conf.set("spark.sql.files.maxPartitionBytes", (2L << 20).toString)
        spark.conf.set("spark.sql.files.openCostInBytes", (256L << 10).toString)
      } else {
        spark.conf.set("spark.sql.files.maxPartitionBytes", (16L << 20).toString)
        spark.conf.set("spark.sql.files.openCostInBytes", (1L << 20).toString)
      }
    // full-materialization timing: the noop sink consumes EVERY column of
    // every row (count() lets Catalyst prune projection-only queries down
    // to a parquet row-count scan — that timed the scan, not the operator).
    // Failures are NOT swallowed: a broken query reports -1 + the error and
    // fails the bench exit code.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val pairPhaseProbe0 = rawCpu(16, 1500)
    def timed(fn: (SparkSession, String) => DataFrame, dir: String,
              scaled: Boolean): Double = {
      confs(scaled)
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val sortedQueries = SparkEntry.queries.toSeq.sortBy(_._1)
    val pairs = sortedQueries.map { case (name, fn) =>
      val t1 = try {
        timed(fn, sfDir, scaled = false) // warmup (codegen + file index)
        timed(fn, sfDir, scaled = false)
      } catch {
        case e: Throwable =>
          errors(name) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).linesIterator.take(1).mkString.take(200)}"
          System.err.println(s"[bench] QUERY FAILED $name: ${errors(name)}")
          -1.0
      }
      val tS = if (!pairScaled || t1 < 0) -1.0 else try {
        val s = timed(fn, scaledDir, scaled = true)
        if (sys.env.contains("GRAFT_BENCH_SCALED_VERBOSE"))
          System.err.println(f"[bench] $name: 1x=$t1%.2f s ${scaledFactor}x=$s%.2f s (${s / t1}%.1fx)")
        s
      } catch {
        case e: Throwable =>
          errors(s"${name}@x$scaledFactor") =
            s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).linesIterator.take(1).mkString.take(200)}"
          System.err.println(s"[bench] SCALED QUERY FAILED $name: ${errors(s"${name}@x$scaledFactor")}")
          -1.0
      }
      (name, fn, t1, tS)
    }
    // outlier re-measure: a pair whose growth exceeds 1.2×factor gets ONE
    // more back-to-back warm pair (now BOTH sides are steady-state). If
    // the re-roll lands on the OTHER side of the threshold — the first
    // attempt said super-linear, the warm pair said noise — one single
    // lucky re-roll must not settle it (round-5 ADVICE): a TIE-BREAK pair
    // runs and the headline takes the MEDIAN of the three growths, so
    // noise has to confirm twice and a genuinely super-linear plan that
    // reproduces in either warm pair keeps an over-threshold headline.
    // When first attempt and re-roll agree (both over), the per-attempt
    // min stands (both are warm-credible). All attempts are published
    // (`growth_first_attempt`).
    val rerunThreshold = scaledFactor * 1.2
    val remeasured = scala.collection.mutable.LinkedHashMap.empty[String, Seq[(Double, Double)]]
    if (pairScaled) pairs.foreach { case (name, fn, t1, tS) =>
      if (t1 > 0 && tS > 0 && tS / t1 > rerunThreshold) {
        try {
          val r1 = timed(fn, sfDir, scaled = false)
          val rS = timed(fn, scaledDir, scaled = true)
          System.err.println(f"[bench] re-measured outlier $name: first ${tS / t1}%.1fx, rerun ${rS / r1}%.1fx")
          if (rS / r1 < rerunThreshold) {
            // disagreement across the threshold — arbitrate with a third pair
            val u1 = timed(fn, sfDir, scaled = false)
            val uS = timed(fn, scaledDir, scaled = true)
            System.err.println(f"[bench] tie-break pair $name: ${uS / u1}%.1fx")
            remeasured(name) = Seq((r1, rS), (u1, uS))
          } else remeasured(name) = Seq((r1, rS))
        } catch {
          // a failed re-roll is an ERROR, not a silent fall-back to the
          // first attempt — it would make the ".md says outliers were
          // re-measured" claim false for this query; fatal errors propagate
          case scala.util.control.NonFatal(e) =>
            errors(s"${name}@rerun") =
              s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).linesIterator.take(1).mkString.take(200)}"
            System.err.println(s"[bench] RERUN FAILED $name: ${errors(s"${name}@rerun")}")
        }
      }
    }
    val pairPhaseProbe1 = rawCpu(16, 1500)
    // weather tag: with paired runs the growth RATIOS are self-normalizing,
    // so this ratio (worse/better bracket probe of the single paired phase,
    // ≤ 1.0) only reports how stable the host was; ~1.0 = clean window
    val scaledWeather =
      math.min(pairPhaseProbe0, pairPhaseProbe1) /
        math.max(pairPhaseProbe0, pairPhaseProbe1)
    val results = pairs.map { case (name, _, t1, _) => name -> t1 }
    val scaledResults =
      if (!pairScaled) Seq.empty
      else pairs.map { case (name, _, _, tS) => name -> tS }
    if (queriesOnly) {
      spark.stop()
      val qs0 = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
      println(s"""{"metric":"queries_only","total_query_sec":${results.map(_._2).filter(_ > 0).sum},"queries":$qs0}""")
      if (errors.nonEmpty) sys.exit(1) else return
    }
    spark.stop()
    // dev knob: stop after the paired query phase (outlier diagnosis loop)
    if (sys.env.get("GRAFT_BENCH_SCALED_ONLY").contains("1")) {
      val growth = scaledResults.flatMap { case (k, sv) =>
        results.find(_._1 == k).collect { case (_, bv) if bv > 0 && sv > 0 =>
          val g = finalGrowth(sv / bv, remeasured.getOrElse(k, Seq.empty))
          "\"" + k + "\":" + (math.round(g * 10) / 10.0) }
      }.mkString("{", ",", "}")
      val qsS = scaledResults.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
      println(s"""{"metric":"scaled_only","scaled_total_sec":${scaledResults.map(_._2).filter(_ > 0).sum},"scaled_phase_weather_ratio":${math.round(scaledWeather * 1000) / 1000.0},"remeasured_outliers":${remeasured.size},"queries_scaled":$qsS,"growth":$growth}""")
      if (errors.nonEmpty) sys.exit(1) else return
    }

    // ---- phase 2: throughput + scaling, N vs 4N cores, identical input,
    //      fresh session per parallelism level (no cross-talk from phase 1)
    // Scaling pair is 4 → 16 cores: a measured PURE-CPU busy-loop on this
    // Firecracker guest scales only 3.1× from 8→32 vCPUs (SMT /host
    // throttling; hardware ceiling 0.77), but 3.5× from 4→16 (ceiling
    // 0.87) — so 4→16 is the pair where the RULE's ≥0.8 is physically
    // reachable and job-level inefficiency is actually visible. The raw
    // ceiling is measured in-process each run and reported alongside.
    // best-of-N after one warmup: host-side throttling causes 2-20× swings
    // between identical runs; per-level best approximates true capability.
    val raw4 = math.max(rawCpu(4), rawCpu(4))
    val raw16 = math.max(rawCpu(16), rawCpu(16))
    val rawCeiling = raw16 / (4.0 * raw4)
    // DRAM-bandwidth scaling ceiling, the memory-side analogue of the
    // ALU ceiling above: the pipeline is partly memory-bound, so if 4
    // streaming threads already draw a large fraction of the socket's
    // bandwidth, the JOB cannot scale 4→16 past bandwidth/(4·bw4) no
    // matter how clean the plan is — measure it instead of guessing.
    // Best-of-2 per level (a single noisy-LOW 4-thread sample would
    // deflate the denominator of the normalized metric; max per level
    // matches the de-noising used everywhere else in the protocol).
    // Working-set sensitivity (measured on this host, 260 MiB L3): the
    // 16 MiB/thread set used here gives a ceiling of 0.835–0.855 across
    // repeated runs; a fully DRAM-resident 256 MiB/thread set gives
    // 0.843–0.879 — statistically the same — while 64 MiB/thread (4-
    // thread set ≈ L3, 16-thread set ≫ L3, the asymmetric-cache artifact
    // case) reads 0.720–0.751. The small set is kept deliberately: at 4
    // threads it enjoys the same larger per-thread L3 share the JOB's 4-
    // thread run enjoys, so it measures the memory system as the job
    // sees it, and it does not understate the ceiling vs pure DRAM.
    val rawMem4 = math.max(rawMem(4, 1500), rawMem(4, 1500))
    val rawMem16 = math.max(rawMem(16, 1500), rawMem(16, 1500))
    val memCeiling = rawMem16 / (4.0 * rawMem4)
    System.err.println(
      f"[bench] scaling ceilings 4→16: alu=$rawCeiling%.3f mem=$memCeiling%.3f (mem4=${rawMem4 / 1e9}%.1f GB/s mem16=${rawMem16 / 1e9}%.1f GB/s)")
    // a measured ceiling > 1 is probe noise by definition (scaling cannot
    // exceed perfect) — clamp for the normalized metric so a lucky probe
    // doesn't deflate the reported job-vs-hardware ratio
    // the binding hardware ceiling is whichever resource scales worse —
    // for a partly memory-bound job the DRAM ceiling (measured below)
    // can sit well under the ALU one
    val ceilingForNorm = math.min(math.min(rawCeiling, memCeiling), 1.0)
    // fully interleaved blocks (4,16,32)×3: host throttling windows
    // outlast a single block, so visiting every level each round exposes
    // all levels to the same weather; best-per-level across rounds (one
    // observed round had local[32] "slower" than local[16] — pure noise)
    def measureBlock(n: Int): Double = {
      val s = session(n)
      try {
        pipelineThroughput(s, inputPath, benchRows) // warmup (fresh session)
        // FIXED best-of-2 after warmup (pre-registered, not adaptive — the
        // count never depends on the values): round-6 logs show two
        // consecutive identical-config measures differing 5–12%, and at
        // eff≈0.8 single-measure noise flips whole runs across the gate
        // line; per-level best within the block approximates capability
        // the same way the cross-block best already does for the
        // throughput headline
        math.max(pipelineThroughput(s, inputPath, benchRows),
                 pipelineThroughput(s, inputPath, benchRows))
      } finally s.stop()
    }
    // FIXED block count — no adaptive stopping (an extension loop keyed on
    // the measured efficiency is an optional-stopping rule that biases the
    // max-estimator upward; round-2 advice). Every block takes a raw-CPU
    // probe at its START and END — a throttle window can arrive MID-block
    // (observed: probes 1.25e10 → 4.2e9 inside one run, leaking a
    // throttled job into a start-probe-clean block). A block is EXCLUDED
    // from the trimmed estimates (all blocks stay in the JSON) when ANY of
    //  (a) its worse ALU probe sits >20% below the run's best, OR
    //  (b) its own start/end probes (ALU or mem) disagree by >20% — the
    //      weather MOVED inside the block, so its t4/t16 saw different
    //      CPU (round-4: a run where every probe was uniformly low
    //      published a physically impossible 1.098 efficiency with 0
    //      flags; (b) catches the within-block drift that produced it), OR
    //  (c) its worse MEMORY-BANDWIDTH probe sits >20% below the run's
    //      best — DRAM throttle windows are invisible to the ALU loop
    //      (run 14: clean ALU probes, 0.44 job efficiency).
    val nBlocks = sys.env.getOrElse("GRAFT_BENCH_BLOCKS", "6").toInt
    final case class Block(p0: Double, p1: Double, m0: Double, m1: Double,
                           t4: Double, t16: Double, t32: Double) {
      def probe: Double = math.min(p0, p1)
      def memProbe: Double = math.min(m0, m1)
      def bracketStable: Boolean =
        probe / math.max(p0, p1) >= 0.8 && memProbe / math.max(m0, m1) >= 0.8
      // per-block efficiency: t4 and t16 are measured seconds apart inside
      // the SAME weather window, so their ratio is robust to the run-scale
      // drift that mixing medians across blocks is not
      def eff: Double = t16 / (4.0 * t4)
    }
    rawMem(16, 200) // JIT warm
    val blocks = (1 to nBlocks).map { i =>
      val p0 = rawCpu(16, 1500)
      val m0 = rawMem()
      val (t4, t16, t32) = (measureBlock(4), measureBlock(16), measureBlock(32))
      val p1 = rawCpu(16, 1500)
      val m1 = rawMem()
      val b = Block(p0, p1, m0, m1, t4, t16, t32)
      System.err.println(f"[bench] block $i/$nBlocks probe=${b.probe}%.3g (start=$p0%.3g end=$p1%.3g) mem=${b.memProbe / 1e9}%.1f GB/s (start=${m0 / 1e9}%.1f end=${m1 / 1e9}%.1f) stable=${b.bracketStable} thr4=${b.t4}%.0f thr16=${b.t16}%.0f thr32=${b.t32}%.0f eff=${b.eff}%.3f")
      b
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val maxProbe = blocks.map(_.probe).max
    val maxMemProbe = blocks.map(_.memProbe).max
    val good = blocks.filter(b => b.probe >= 0.8 * maxProbe &&
      b.memProbe >= 0.8 * maxMemProbe && b.bracketStable)
    val flagged = blocks.size - good.size
    val thr4 = blocks.map(_.t4).max
    val thr16 = blocks.map(_.t16).max
    val thr32 = blocks.map(_.t32).max
    val med4 = median(blocks.map(_.t4))
    val med16 = median(blocks.map(_.t16))
    val med32 = median(blocks.map(_.t32))
    val efficiency = thr16 / (4.0 * thr4)
    val efficiencyMed = med16 / (4.0 * med4)
    // the HEADLINE estimator: median of per-block efficiencies over
    // throttle-clean blocks (falls back to all blocks, marked invalid,
    // when every block is flagged)
    val effBasis = if (good.nonEmpty) good else blocks
    val efficiencyTrimmed = median(effBasis.map(_.eff))
    // efficiency > 1.0 is physically impossible (4× the cores cannot do
    // better than 4× the work) — such a run is probe-undetected throttling
    // by definition and must never be reported as a clean number
    val scalingValid = good.nonEmpty && efficiencyTrimmed <= 1.0
    // block tuple: [aluProbe, t4, t16, t32, memProbeBytesPerSec] — the mem
    // probe rides 5th to keep the historical 4-element prefix readable
    val blocksJson = blocks.map(b => s"[${b.probe},${b.t4},${b.t16},${b.t32},${b.memProbe}]")
      .mkString("[", ",", "]")
    // best-vs-median spread: how much host throttling moved the numbers
    val spread = Seq(thr4 -> med4, thr16 -> med16, thr32 -> med32)
      .map { case (b, m) => (b - m) / b }.max

    // ---- phase 2b: ONE big block beyond the 32M comfort zone (default
    //      100M rows ≈ 3× the steady input) — probes shuffle/spill once
    //      per run at local[32]; rows/s should stay within ~20% of the
    //      32M-row rate if nothing falls off a memory cliff. The input
    //      parquet is built once and reused (path is keyed by row count).
    val bigRows = sys.env.getOrElse("GRAFT_BENCH_BIG_ROWS", "100000000").toLong
    val thrBig = if (bigRows <= 0) 0.0 else {
      val bigPath = s"target/bench_input_$bigRows"
      val s = session(32)
      try {
        ensureInput(s, bigRows)
        pipelineThroughput(s, bigPath, bigRows) // warm (codegen + file index)
        pipelineThroughput(s, bigPath, bigRows)
      } finally s.stop()
    }

    // secondary headline: dedup signature throughput (MinHash 8-fn over
    // token 3-shingles + 16-bit SimHash, both per row) at local[32]
    val thrDedup = {
      val s = session(32)
      try {
        import graft.operators.Dedup
        def once(): Double = {
          val in = s.read.parquet(inputPath)
          val t0 = System.nanoTime()
          in.select(Dedup.minhashSigArray(col("tokens"), 8).as("sig"),
              Dedup.simhash(col("tokens"), 16).as("sh"))
            .select(element_at(col("sig"), 1).as("mh0"), col("sh"))
            .agg(sum(col("sh")), sum(col("mh0"))).collect()
          benchRows / ((System.nanoTime() - t0) / 1e9)
        }
        once() // warm
        (1 to 2).map(_ => once()).max
      } finally s.stop()
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val totalSec = results.map(_._2).filter(_ > 0).sum
    val qsScaled = scaledResults.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val totalScaledSec = scaledResults.map(_._2).filter(_ > 0).sum
    // (1×, factor×, growth) triples — growth ≤ factor means the query's
    // cost class held (sub-linear in data); the max is the headline.
    // Re-measured outliers arbitrate via [[finalGrowth]] (warm min when
    // the attempts agree, median-of-three when they straddle the
    // threshold); every attempt is published.
    val growthFirst = scaledResults.flatMap { case (k, sv) =>
      results.find(_._1 == k).collect { case (_, bv) if bv > 0 && sv > 0 =>
        k -> sv / bv }
    }
    val growthPairs = growthFirst.map { case (k, g) =>
      k -> finalGrowth(g, remeasured.getOrElse(k, Seq.empty))
    }
    // raw Double toString — locale-proof (f"%.2f" would emit ',' decimals
    // on comma-decimal locales and break the JSON)
    val growthJson = growthPairs
      .map { case (k, g) => "\"" + k + "\":" + (math.round(g * 100) / 100.0) }
      .mkString("{", ",", "}")
    val maxGrowth = if (growthPairs.isEmpty) 0.0 else growthPairs.map(_._2).max
    val errJson = errors.map { case (k, v) =>
      "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"parsed_routed_sequences_per_sec","value":$thr32,"unit":"rows/sec",""" +
        s""""bench_rows":$benchRows,""" +
        s""""scaling_efficiency_trimmed_median":$efficiencyTrimmed,""" +
        s""""scaling_efficiency_median":$efficiencyMed,"scaling_efficiency_best":$efficiency,""" +
        s""""scaling_efficiency":$efficiencyTrimmed,""" +
        s""""scaling_efficiency_valid":$scalingValid,""" +
        s""""throttle_flagged_blocks":$flagged,"n_blocks":${blocks.size},""" +
        s""""throughput_local4":$thr4,"throughput_local16":$thr16,""" +
        s""""throughput_local32":$thr32,""" +
        s""""throughput_local4_median":$med4,"throughput_local16_median":$med16,""" +
        s""""throughput_local32_median":$med32,""" +
        s""""best_vs_median_spread":$spread,"blocks":$blocksJson,""" +
        s""""raw_cpu_scaling_ceiling_4_to_16":$rawCeiling,""" +
        s""""raw_mem_scaling_ceiling_4_to_16":$memCeiling,""" +
        s""""raw_mem_bandwidth_best_gbs":${math.round(maxMemProbe / 1e8) / 10.0},""" +
        s""""scaling_efficiency_vs_hw_ceiling":${efficiencyTrimmed / ceilingForNorm},""" +
        s""""dedup_signature_rows_per_sec":$thrDedup,"total_query_sec":$totalSec,""" +
        s""""queries":$qs,""" +
        s""""scaled_factor":$scaledFactor,"scaled_total_sec":$totalScaledSec,""" +
        (if (scaledFactor > 1)
          s""""scaled_phase_weather_ratio":${math.round(scaledWeather * 1000) / 1000.0},"""
         else "") +
        s""""queries_scaled":$qsScaled,"growth":$growthJson,""" +
        s""""max_scaled_growth":${math.round(maxGrowth * 100) / 100.0},""" +
        s""""remeasured_outliers":${remeasured.size},""" +
        // per outlier: EVERY attempt's growth, first → re-roll → tie-break
        s""""growth_first_attempt":${
          remeasured.map { case (k, rolls) =>
            val first = growthFirst.find(_._1 == k).map(_._2).toSeq
            val all = first ++ rolls.collect { case (a, b) if a > 0 && b > 0 => b / a }
            "\"" + k + "\":" + all.map(g => math.round(g * 100) / 100.0)
              .mkString("[", ",", "]")
          }.mkString("{", ",", "}")},""" +
        s""""big_rows":$bigRows,"throughput_big_local32":$thrBig,""" +
        s""""query_errors":$errJson,"sf":"$sfDir"}"""
    println(json)

    val md =
      s"""# BENCH — measured (local sandbox)
         |
         |Protocol per BASELINE.md: full pipeline (regex parse → grep →
         |broadcast enrich → glob fan-out route → per-sink count+sum(n_tok))
         |over a $benchRows-row synthetic token table (BASELINE input shape,
         |parquet). Two-cluster-size rule proxied as N=4 vs 4N=16 cores on
         |identical input (the BASELINE protocol allows any N vs 4N pair);
         |this Firecracker guest's 32 vCPUs are SMT/host-throttled — a pure
         |busy-loop scales only 0.77 from 8→32 but 0.87 from 4→16, so 4→16
         |is the pair where the ≥0.8 target is physically reachable. The
         |measured raw-CPU ceiling is reported next to the job efficiency.
         |
         || metric | value |
         ||---|---|
         || **scaling efficiency, median of per-block t16/(4·t4)** (headline: each block's ratio is measured inside one weather window; median over the ${good.size}/$nBlocks throttle-clean blocks) | **${"%.3f".format(efficiencyTrimmed)}**${if (!scalingValid) " ⚠ INVALID — >1.0 is physically impossible / all blocks flagged: probe-undetected host throttling, run not usable as evidence" else ""} (target ≥ 0.8) |
         || scaling efficiency, median of ALL blocks | ${"%.3f".format(efficiencyMed)} |
         || scaling efficiency, best-of-blocks (secondary — max-estimator) | ${"%.3f".format(efficiency)} |
         || blocks flagged as host-throttled (worse ALU or MEM-BANDWIDTH probe >20% below run best, or a block's own bracket probes disagreeing >20%) | $flagged of $nBlocks (best mem probe ${"%.1f".format(maxMemProbe / 1e9)} GB/s) |
         || parsed+routed sequences/sec (local[32], warm, best) | ${"%,.0f".format(thr32)} |
         || throughput local[4] (best / median of $nBlocks blocks) | ${"%,.0f".format(thr4)} / ${"%,.0f".format(med4)} rows/s |
         || throughput local[16] (best / median) | ${"%,.0f".format(thr16)} / ${"%,.0f".format(med16)} rows/s |
         || best−median spread (host-throttle noise) | ${"%.1f".format(spread * 100)}% |
         || raw-CPU busy-loop ceiling 4→16 (same run) | ${"%.3f".format(rawCeiling)} |
         || DRAM-bandwidth ceiling 4→16 (same run; streaming-sum probe — the binding limit for the memory-bound fraction of the job) | ${"%.3f".format(memCeiling)} (${"%.1f".format(rawMem4 / 1e9)} → ${"%.1f".format(rawMem16 / 1e9)} GB/s) |
         || trimmed-median efficiency normalized to hw ceiling (min of ALU/DRAM ceilings, clamped ≤1) | ${"%.3f".format(efficiencyTrimmed / ceilingForNorm)} |
         || dedup signatures/sec (MinHash-8 + SimHash-16, local[32]) | ${"%,.0f".format(thrDedup)} |
         || per-query total (sf tables, steady-state) | ${"%.2f".format(totalSec)} s over ${results.size} queries |
         || per-query total at ${scaledFactor}× scaled tables (PAIRED: each query's 1× and ${scaledFactor}× run back-to-back in one weather window; inputs page-cache-prewarmed) | ${"%.2f".format(totalScaledSec)} s over ${scaledResults.size} queries |
         || max per-query growth at ${scaledFactor}× (sub-linear ⇔ ≤ $scaledFactor; outliers >${"%.0f".format(rerunThreshold)} re-measured warm-paired — agreeing attempts report the warm min, threshold-straddling ones arbitrate by a tie-break pair and median-of-3; all attempts published in JSON) | ${"%.1f".format(maxGrowth)}× (${remeasured.size} re-measured) |
         || paired-phase weather stability (worse ÷ better bracket probe, ≤1; growth RATIOS are self-normalizing under pairing — this only reports host stability) | ${if (scaledFactor > 1) "%.2f".format(scaledWeather) else "n/a (scaled phase disabled)"} |
         || big block: parsed+routed rows/s at $bigRows rows (local[32]) | ${"%,.0f".format(thrBig)} (${"%.0f".format(100 * thrBig / thr32)}% of the ${benchRows}-row rate) |
         |
         |Audited super-linear outlier in the scaled phase:
         |`dedup_embed_pairs` — the ${scaledFactor}× blow-up duplicates every
         |embedding ${scaledFactor}×, so every SRP bucket is ${scaledFactor}×
         |denser and the CANDIDATE-PAIR OUTPUT grows quadratically (measured:
         |103× more pairs at 10× input). Its runtime growth is therefore
         |sub-linear in its OUTPUT size; on real near-dup-sparse data the
         |pair count grows ~linearly and so does the runtime. The maxBucket
         |skew cap bounds the worst case either way.
         |
         |## Where the 4→16 loss lives: stage decomposition (graft.StageProbe)
         |
         |Cumulative pipeline prefixes timed at local[4] and local[16] on the
         |same input, interleaved in one window (2026-08-17, this host):
         |a bare parquet scan of the doc_id string column — no engine code
         |at all — scaled at **0.84**, regex parse+grep at 0.81, +enrich at
         |0.82, and the full pipeline at **0.85**: the engine's operators
         |add NO scaling loss over raw Spark parquet decode; the ~0.8 band
         |is the host memory system (see the DRAM ceiling row above).
         |Reproduce with `sbt "runMain graft.StageProbe"`.
         |
         |Same probe, before/after the round-6 `PruneRegexParseFields`
         |optimizer rule (single-consumed-field parses narrow to a
         |one-group extraction): full-pipeline local[16] 5.77 s → 4.30 s
         |(−25%) with the scan-only control stage unchanged (1.35 s →
         |1.31 s), and 4→16 efficiency 0.823 → 0.846 — less per-row
         |allocation is also less DRAM traffic.
         |""".stripMargin
    // run history survives rewrites: carry prior rows forward, append this
    // run — host throttling makes single runs noisy, the distribution is
    // the honest report
    val oldRows =
      try Files.readString(Paths.get("BENCH.md")).linesIterator
        .filter(l => l.startsWith("| 20") && l.count(_ == '|') == 6)
        .map(_.replace(" (latest)", "")).toSeq
      catch { case _: Throwable => Seq.empty[String] }
    val now = java.time.LocalDateTime.now()
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm"))
    val newRow = s"| $now (latest) | ${"%,.0f".format(thr32)} rows/s | " +
      s"${"%.3f".format(efficiency)} | ${"%.3f".format(efficiencyTrimmed)}" +
      (if (!scalingValid) " ⚠ INVALID" else "") +
      s" | ${"%.1f".format(spread * 100)}% |"
    val history =
      "\n## Run history (same protocol; host-throttle weather varies)\n\n" +
        "| run | local[32] best | scaling best | scaling median (trimmed from r3 on) | spread |\n" +
        "|---|---|---|---|---|\n" +
        (oldRows :+ newRow).mkString("\n") + "\n"
    // only protocol-sized runs may rewrite the ledger — a dev smoke run
    // (small GRAFT_BENCH_ROWS / single block) would overwrite the real
    // numbers and append an incomparable history row
    val protocolSized = benchRows >= 32000000L && nBlocks >= 3
    if (protocolSized)
      try Files.writeString(Paths.get("BENCH.md"), md + history) catch { case _: Throwable => () }
    else System.err.println("[bench] dev-sized run — BENCH.md left untouched")
    if (errors.nonEmpty) {
      System.err.println(s"[bench] ${errors.size} queries failed — failing the bench")
      sys.exit(1)
    }
  }
}
