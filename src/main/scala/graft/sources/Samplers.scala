package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Driver-side system-metric sampler faces — the reference's /proc and
  * TCP-probe collectors (`in_mem`, `in_cpu`, `in_disk`, `in_netif`,
  * `in_proc`, `in_health`), previously declared non-goals, re-expressed
  * batch-style: the reference's collector callback runs on its single
  * event loop every `interval_sec`; here one collect (or one snapshot
  * PAIR for the delta-based plugins) runs on the driver and lands in a
  * one-record DataFrame with the reference's EXACT record keys, entering
  * the same distributed pipeline as any other input. Metric keys contain
  * dots (`Mem.total`, `eth0.rx.bytes`, `cpu0.p_cpu`) exactly as the
  * reference packs them — select with backticks.
  *
  * Each parser is a pure function over the /proc text so specs pin the
  * arithmetic on verbatim fixtures; the thin readers do the I/O.
  */
object Samplers {

  private def oneRow(spark: SparkSession, tag: String,
                     fields: Seq[(String, Any, DataType)]): DataFrame = {
    val schema = StructType(
      fields.map { case (k, _, t) => StructField(k, t, nullable = true) } :+
        StructField("tag", StringType, nullable = false))
    spark.createDataFrame(
      java.util.List.of(Row.fromSeq(fields.map(_._2) :+ tag)), schema)
  }

  private def emptyFrame(spark: SparkSession,
                         fields: Seq[(String, Any, DataType)]): DataFrame = {
    val schema = StructType(
      fields.map { case (k, _, t) => StructField(k, t, nullable = true) } :+
        StructField("tag", StringType, nullable = false))
    spark.createDataFrame(java.util.List.of[Row](), schema)
  }

  // ---------------------------------------------------------------- mem

  /** `in_mem/mem.c:89-113` (sysinfo): totals/free in KB; used = total −
    * free. sysinfo's `freeram` is /proc/meminfo `MemFree`.
    */
  private[graft] def memInfo(meminfo: String): Map[String, Long] = {
    val kv = meminfo.linesIterator.flatMap { l =>
      l.split(":", 2) match {
        case Array(k, v) =>
          v.trim.split("\\s+").headOption.flatMap(_.toLongOption).map(k.trim -> _)
        case _ => None
      }
    }.toMap
    val memTotal = kv.getOrElse("MemTotal", 0L)
    val memFree = kv.getOrElse("MemFree", 0L)
    val swapTotal = kv.getOrElse("SwapTotal", 0L)
    val swapFree = kv.getOrElse("SwapFree", 0L)
    Map(
      "Mem.total" -> memTotal, "Mem.used" -> (memTotal - memFree),
      "Mem.free" -> memFree,
      "Swap.total" -> swapTotal, "Swap.used" -> (swapTotal - swapFree),
      "Swap.free" -> swapFree)
  }

  /** `in_mem/proc.c:28-51` — the reference's human-readable RSS: `%ld b`
    * under 1 KiB, else `%.2f` of a FLOAT division with the 1024-power
    * unit letter appended (no space).
    */
  private[graft] def humanReadableSize(size: Long): String = {
    val units = Array("b", "K", "M", "G", "T", "P", "E", "Z", "Y")
    var u = 1024L
    var i = 0
    while (i < units.length - 1 && size / u != 0) { u *= 1024; i += 1 }
    if (i == 0) s"$size ${units(0)}"
    else {
      val f = (size.toDouble / (u / 1024)).toFloat
      String.format(java.util.Locale.ROOT, "%.2f%s",
        java.lang.Float.valueOf(f), units(i))
    }
  }

  /** RSS bytes of a pid: /proc/pid/stat field 24 (rss pages) × page size
    * (`in_mem/proc.c:90-155`). None when the pid is gone.
    */
  private[graft] def rssBytes(pid: Long, pageSize: Long = 4096L): Option[Long] =
    try {
      val stat = Files.readString(Paths.get(s"/proc/$pid/stat"))
      // comm may contain spaces/parens — fields resume after the LAST ')'
      val rest = stat.substring(stat.lastIndexOf(')') + 2).split(" ")
      Some(rest(21).toLong * pageSize) // state is rest(0); rss is field 24
    } catch { case _: Exception => None }

  /** One `in_mem` record: the Mem and Swap totals in KB (+ `proc_bytes`/
    * `proc_hr` when a pid is traced — `in_mem/mem.c:170-247`).
    */
  def mem(spark: SparkSession, tag: String = "mem.0",
          pid: Option[Long] = None): DataFrame = {
    val info = memInfo(Files.readString(Paths.get("/proc/meminfo")))
    val base = Seq("Mem.total", "Mem.used", "Mem.free",
      "Swap.total", "Swap.used", "Swap.free")
      .map(k => (k, info(k): Any, LongType: DataType))
    val proc = pid.flatMap(p => rssBytes(p)).toSeq.flatMap { rss =>
      Seq(("proc_bytes", rss: Any, LongType: DataType),
        ("proc_hr", humanReadableSize(rss): Any, StringType: DataType))
    }
    oneRow(spark, tag, base ++ proc)
  }

  // ---------------------------------------------------------------- cpu

  /** One /proc/stat snapshot: `(cpuid, user, nice, system, idle, iowait)`
    * for the aggregate line (cpuid "cpu") and each core
    * (`in_cpu/in_cpu.c:97-155`).
    */
  private[graft] def cpuSnapshot(statText: String): Seq[(String, Long, Long, Long, Long, Long)] =
    statText.linesIterator.takeWhile(_.startsWith("cpu")).map { l =>
      val p = l.trim.split("\\s+")
      (p(0), p(1).toLong, p(2).toLong, p(3).toLong, p(4).toLong, p(5).toLong)
    }.toSeq

  /** The reference's two percent formulas (`in_cpu/in_cpu.h:93-129`):
    * aggregate line divides by core count, per-core does not; both divide
    * by ticks (USER_HZ=100) and the interval.
    */
  private[graft] def cpuPercents(
      pre: Seq[(String, Long, Long, Long, Long, Long)],
      now: Seq[(String, Long, Long, Long, Long, Long)],
      intervalSec: Double, ticks: Long = 100L): Seq[(String, Double)] = {
    val nCpu = now.size - 1
    def pct(a: Long, b: Long, sysAvg: Boolean): Double = {
      if (a == b) return 0.0
      val diff = math.abs(b - a).toDouble
      if (sysAvg) ((diff / ticks) * 100 / nCpu) / intervalSec
      else ((diff * 100) / ticks) / intervalSec
    }
    now.indices.flatMap { i =>
      val (_, u0, n0, s0, _, _) = pre(i)
      val (_, u1, n1, s1, _, _) = now(i)
      val avg = i == 0
      val all = pct(u0 + n0 + s0, u1 + n1 + s1, avg)
      val usr = pct(u0 + n0, u1 + n1, avg)
      val sys = pct(s0, s1, avg)
      if (avg) Seq("cpu_p" -> all, "user_p" -> usr, "system_p" -> sys)
      else Seq(s"cpu${i - 1}.p_cpu" -> all, s"cpu${i - 1}.p_user" -> usr,
        s"cpu${i - 1}.p_system" -> sys)
    }
  }

  /** One `in_cpu` record: two /proc/stat snapshots `intervalSec` apart →
    * `cpu_p`/`user_p`/`system_p` + per-core `cpuN.p_*`.
    */
  def cpu(spark: SparkSession, tag: String = "cpu.0",
          intervalSec: Double = 1.0): DataFrame = {
    val pre = cpuSnapshot(Files.readString(Paths.get("/proc/stat")))
    Thread.sleep(math.max(1L, (intervalSec * 1000).toLong))
    val now = cpuSnapshot(Files.readString(Paths.get("/proc/stat")))
    oneRow(spark, tag, cpuPercents(pre, now, intervalSec)
      .map { case (k, v) => (k, v: Any, DoubleType: DataType) })
  }

  // --------------------------------------------------------------- disk

  /** Sum of (sectors read, sectors written) over /proc/diskstats rows
    * whose device name contains `devName` (`strstr` semantics,
    * `in_disk/in_disk.c:78-127`: fields 6 and 10).
    */
  private[graft] def diskSectors(text: String, devName: Option[String]): (Long, Long) =
    text.linesIterator.foldLeft((0L, 0L)) { case ((r, w), l) =>
      val p = l.trim.split("\\s+")
      if (p.length < 10) (r, w)
      else if (devName.exists(d => !p(2).contains(d))) (r, w)
      else (r + p(5).toLong, w + p(9).toLong)
    }

  /** One `in_disk` record: `read_size`/`write_size` = sector deltas ×512
    * bytes over the interval (`in_disk/in_disk.c:129-183`).
    */
  def disk(spark: SparkSession, tag: String = "disk.0",
           devName: Option[String] = None, intervalSec: Double = 1.0): DataFrame = {
    val (r0, w0) = diskSectors(Files.readString(Paths.get("/proc/diskstats")), devName)
    Thread.sleep(math.max(1L, (intervalSec * 1000).toLong))
    val (r1, w1) = diskSectors(Files.readString(Paths.get("/proc/diskstats")), devName)
    oneRow(spark, tag, Seq(
      ("read_size", (r1 - r0) * 512L: Any, LongType: DataType),
      ("write_size", (w1 - w0) * 512L: Any, LongType: DataType)))
  }

  // -------------------------------------------------------------- netif

  /** The reference's 16 /proc/net/dev counters in file order with the
    * default-reported flag (`in_netif/in_netif.c:31-48`).
    */
  private[graft] val NetifEntries: Seq[(String, Boolean)] = Seq(
    "rx.bytes" -> true, "rx.packets" -> true, "rx.errors" -> true,
    "rx.drop" -> false, "rx.fifo" -> false, "rx.frame" -> false,
    "rx.compressed" -> false, "rx.multicast" -> false,
    "tx.bytes" -> true, "tx.packets" -> true, "tx.errors" -> true,
    "tx.drop" -> false, "tx.fifo" -> false, "tx.collisions" -> false,
    "tx.carrier" -> false, "tx.compressepd" -> false) // sic — reference typo

  /** Counter snapshot for `iface` from /proc/net/dev text (prefix match,
    * `in_netif/in_netif.c:146-193`). None when the interface is absent.
    */
  private[graft] def netifCounters(text: String, iface: String): Option[Seq[Long]] =
    text.linesIterator.map(_.trim).collectFirst {
      case l if l.takeWhile(_ != ':').startsWith(iface) =>
        l.dropWhile(_ != ':').drop(1).trim.split("\\s+").map(_.toLong).toSeq
    }.filter(_.size == NetifEntries.size)

  /** One `in_netif` record: per-counter DELTAS over the interval, keys
    * `<iface>.<counter>`; default only the 6 checked counters, `verbose`
    * all 16 (`in_netif/in_netif.c:205-258`).
    */
  def netif(spark: SparkSession, iface: String, tag: String = "netif.0",
            intervalSec: Double = 1.0, verbose: Boolean = false): DataFrame = {
    def snap() = netifCounters(Files.readString(Paths.get("/proc/net/dev")), iface)
      .getOrElse(throw new IllegalArgumentException(s"netif: no interface '$iface'"))
    val pre = snap()
    Thread.sleep(math.max(1L, (intervalSec * 1000).toLong))
    val now = snap()
    val fields = NetifEntries.zipWithIndex.collect {
      case ((name, checked), i) if checked || verbose =>
        (s"$iface.$name", now(i) - pre(i): Any, LongType: DataType)
    }
    oneRow(spark, tag, fields)
  }

  // --------------------------------------------------------------- proc

  /** First pid whose /proc/N/cmdline basename equals `procName`
    * (`in_proc/in_proc.c:101-155`).
    */
  private[graft] def pidOf(procName: String): Option[Long] = {
    val procDir = new java.io.File("/proc")
    procDir.listFiles((_, n) => n.forall(_.isDigit)).sortBy(_.getName.toLong)
      .iterator.flatMap { d =>
        try {
          val cmd = Files.readAllBytes(Paths.get(d.getPath, "cmdline"))
          val first = new String(cmd.takeWhile(_ != 0), "UTF-8")
          val base = first.substring(first.lastIndexOf('/') + 1)
          if (base == procName) Some(d.getName.toLong) else None
        } catch { case _: Exception => None }
      }.nextOption()
  }

  /** `mem.Vm*` values from /proc/pid/status. The reference multiplies the
    * kB figure by 1000, not 1024 (`in_proc/in_proc.c:389` `* 1000`) —
    * mirrored verbatim.
    */
  private[graft] def vmStats(statusText: String): Map[String, Long] = {
    val keys = Set("VmPeak", "VmSize", "VmLck", "VmHWM", "VmRSS",
      "VmData", "VmStk", "VmExe", "VmLib", "VmPTE", "VmSwap")
    statusText.linesIterator.flatMap { l =>
      val k = l.takeWhile(_ != ':')
      if (!keys(k)) None
      else Some(s"mem.$k" -> l.filter(_.isDigit).toLongOption.getOrElse(0L) * 1000L)
    }.toMap
  }

  private[graft] val VmKeys: Seq[String] = Seq(
    "mem.VmPeak", "mem.VmSize", "mem.VmLck", "mem.VmHWM", "mem.VmRSS",
    "mem.VmData", "mem.VmStk", "mem.VmExe", "mem.VmLib", "mem.VmPTE",
    "mem.VmSwap")

  /** One `in_proc` record `{alive, proc_name, pid, mem.Vm*, fd}` for the
    * named process; with `alert` only a DEAD process produces a record
    * (`in_proc/in_proc.c:232-311`). A dead process reports pid −1 and
    * zeroed optionals (the reference packs whatever was last measured;
    * zero is the honest batch equivalent).
    */
  def proc(spark: SparkSession, procName: String, tag: String = "proc.0",
           mem: Boolean = true, fds: Boolean = true,
           alert: Boolean = false): DataFrame = {
    val pid = pidOf(procName)
    val alive = pid.isDefined
    val fields =
      Seq(("alive", alive: Any, BooleanType: DataType),
        ("proc_name", procName: Any, StringType: DataType),
        ("pid", pid.getOrElse(-1L): Any, LongType: DataType)) ++
        (if (mem) {
          val vm = pid.map(p =>
            try vmStats(Files.readString(Paths.get(s"/proc/$p/status")))
            catch { case _: Exception => Map.empty[String, Long] })
            .getOrElse(Map.empty)
          VmKeys.map(k => (k, vm.getOrElse(k, 0L): Any, LongType: DataType))
        } else Nil) ++
        (if (fds) {
          val n = pid.map { p =>
            val d = new java.io.File(s"/proc/$p/fd").listFiles()
            if (d == null) 0L else d.length.toLong
          }.getOrElse(0L)
          Seq(("fd", n: Any, LongType: DataType))
        } else Nil)
    if (alive && alert) emptyFrame(spark, fields)
    else oneRow(spark, tag, fields)
  }

  // ------------------------------------------------------------- health

  /** One `in_health` record `{alive[, hostname][, port]}`: a TCP connect
    * probe; with `alert` only a DOWN target produces a record
    * (`in_health/health.c:57-126`).
    */
  def health(spark: SparkSession, host: String, port: Int,
             tag: String = "health.0", addHost: Boolean = false,
             addPort: Boolean = false, alert: Boolean = false,
             timeoutMs: Int = 1000): DataFrame = {
    val alive =
      try {
        val s = new java.net.Socket()
        try { s.connect(new java.net.InetSocketAddress(host, port), timeoutMs); true }
        finally s.close()
      } catch { case _: java.io.IOException => false }
    val fields = Seq(("alive", alive: Any, BooleanType: DataType)) ++
      (if (addHost) Seq(("hostname", host: Any, StringType: DataType)) else Nil) ++
      (if (addPort) Seq(("port", port: Any, IntegerType: DataType)) else Nil)
    if (alive && alert) emptyFrame(spark, fields)
    else oneRow(spark, tag, fields)
  }
}
