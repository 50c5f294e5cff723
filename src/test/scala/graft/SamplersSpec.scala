package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Samplers

/** Metric sampler faces (in_mem/in_cpu/in_disk/in_netif/in_proc/
  * in_health): parsers pinned on verbatim /proc fixtures, live smoke on
  * this host's real /proc, alert gating, conf surface.
  */
class SamplersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("meminfo parse: totals/used/free in KB (mem.c:89-113 via /proc/meminfo)") {
    val fixture =
      """MemTotal:       16290816 kB
        |MemFree:         8190808 kB
        |MemAvailable:   12002816 kB
        |Buffers:          517292 kB
        |SwapTotal:       2097148 kB
        |SwapFree:        2096884 kB
        |""".stripMargin
    val m = Samplers.memInfo(fixture)
    assert(m("Mem.total") == 16290816L)
    assert(m("Mem.free") == 8190808L)
    assert(m("Mem.used") == 16290816L - 8190808L)
    assert(m("Swap.total") == 2097148L)
    assert(m("Swap.used") == 264L)
  }

  test("human-readable RSS format matches proc.c:28-51 exactly") {
    assert(Samplers.humanReadableSize(512) == "512 b")
    assert(Samplers.humanReadableSize(0) == "0 b")
    assert(Samplers.humanReadableSize(2048) == "2.00K")
    assert(Samplers.humanReadableSize(1536) == "1.50K")
    assert(Samplers.humanReadableSize(5L * 1024 * 1024) == "5.00M")
    assert(Samplers.humanReadableSize(3L * 1024 * 1024 * 1024) == "3.00G")
  }

  test("cpu percent formulas (in_cpu.h:93-129): sys-average divides by cores, per-core does not") {
    val pre = Seq(("cpu", 1000L, 0L, 500L, 8000L, 0L),
      ("cpu0", 600L, 0L, 300L, 4000L, 0L), ("cpu1", 400L, 0L, 200L, 4000L, 0L))
    // +100 user ticks aggregate, +60/+40 split; +20 system on cpu0 only
    val now = Seq(("cpu", 1100L, 0L, 520L, 8900L, 0L),
      ("cpu0", 660L, 0L, 320L, 4400L, 0L), ("cpu1", 440L, 0L, 200L, 4500L, 0L))
    val p = Samplers.cpuPercents(pre, now, intervalSec = 1.0).toMap
    // aggregate: diff=120 ticks → (120/100)*100/2cores = 60%
    assert(math.abs(p("cpu_p") - 60.0) < 1e-9)
    assert(math.abs(p("user_p") - 50.0) < 1e-9)
    assert(math.abs(p("system_p") - 10.0) < 1e-9)
    // per-core: no core division — cpu0 diff 80 ticks → 80%
    assert(math.abs(p("cpu0.p_cpu") - 80.0) < 1e-9)
    assert(math.abs(p("cpu0.p_system") - 20.0) < 1e-9)
    assert(math.abs(p("cpu1.p_cpu") - 40.0) < 1e-9)
    assert(p("cpu1.p_system") == 0.0) // pre == now → 0.0 exactly
  }

  test("diskstats sectors: fields 6/10 summed, dev_name strstr filter (in_disk.c:78-127)") {
    val fixture =
      """   8       0 sda 5523 1  512222 2888 9288 2310 333328 6369 0 5924 9302
        |   8       1 sda1 4700 0 506416 2469 9044 2310 333328 6118 0 5424 8591
        | 253       0 dm-0 100 0 2000 10 50 0 4000 20 0 30 30
        |""".stripMargin
    assert(Samplers.diskSectors(fixture, None) == (512222L + 506416L + 2000L, 333328L + 333328L + 4000L))
    assert(Samplers.diskSectors(fixture, Some("dm-")) == (2000L, 4000L))
    assert(Samplers.diskSectors(fixture, Some("sda")) == (512222L + 506416L, 333328L + 333328L))
  }

  test("netif counters: 16-field snapshot for one interface (in_netif.c:146-193)") {
    val fixture =
      """Inter-|   Receive                                                |  Transmit
        | face |bytes    packets errs drop fifo frame compressed multicast|bytes    packets errs drop fifo colls carrier compressed
        |    lo: 1839050    4411    1    0    0     0          0         0  1839050    4411    2    0    0     0       0          0
        |  eth0: 9954504   13935    0    0    0     0          0         0   750269    7200    0    0    0     0       0          0
        |""".stripMargin
    val lo = Samplers.netifCounters(fixture, "lo").get
    assert(lo(0) == 1839050L && lo(1) == 4411L && lo(2) == 1L)
    assert(lo(8) == 1839050L && lo(10) == 2L)
    val eth = Samplers.netifCounters(fixture, "eth0").get
    assert(eth(0) == 9954504L && eth(8) == 750269L)
    assert(Samplers.netifCounters(fixture, "wlan0").isEmpty)
  }

  test("vm stats: kB × 1000 — the reference's unit choice, mirrored (in_proc.c:389)") {
    val fixture =
      """Name:	java
        |VmPeak:	   14860 kB
        |VmSize:	   14800 kB
        |VmRSS:	    1300 kB
        |VmSwap:	       0 kB
        |""".stripMargin
    val vm = Samplers.vmStats(fixture)
    assert(vm("mem.VmPeak") == 14860000L)
    assert(vm("mem.VmRSS") == 1300000L)
    assert(vm("mem.VmSwap") == 0L)
    assert(!vm.contains("mem.VmLib"))
  }

  test("live /proc smoke: mem/cpu/disk/netif/proc records have sane values") {
    val m = Samplers.mem(spark).collect()(0)
    assert(m.getAs[Long]("Mem.total") > 0L)
    assert(m.getAs[Long]("Mem.used") + m.getAs[Long]("Mem.free") ==
      m.getAs[Long]("Mem.total"))
    assert(m.getAs[String]("tag") == "mem.0")

    val c = Samplers.cpu(spark, intervalSec = 0.2).collect()(0)
    assert(c.getAs[Double]("cpu_p") >= 0.0)
    assert(c.schema.fieldNames.contains("cpu0.p_cpu"))

    val d = Samplers.disk(spark, intervalSec = 0.1).collect()(0)
    assert(d.getAs[Long]("read_size") >= 0L)
    assert(d.getAs[Long]("write_size") >= 0L)

    val n = Samplers.netif(spark, "lo", intervalSec = 0.1).collect()(0)
    assert(n.schema.fieldNames.count(_.startsWith("lo.")) == 6)
    val nv = Samplers.netif(spark, "lo", intervalSec = 0.1, verbose = true)
    assert(nv.schema.fieldNames.count(_.startsWith("lo.")) == 16)

    // this JVM is findable by its own command basename
    val self = java.nio.file.Paths.get("/proc/self/cmdline")
    val base = new String(java.nio.file.Files.readAllBytes(self), "UTF-8")
      .takeWhile(_ != 0).split("/").last
    val p = Samplers.proc(spark, base).collect()(0)
    assert(p.getAs[Boolean]("alive"))
    assert(p.getAs[Long]("pid") > 0L)
    assert(p.getAs[Long]("mem.VmRSS") > 0L)
    assert(p.getAs[Long]("fd") > 0L)

    // in_mem Pid trace face
    val mp = Samplers.mem(spark, pid = Some(p.getAs[Long]("pid"))).collect()(0)
    assert(mp.getAs[Long]("proc_bytes") > 0L)
    assert(mp.getAs[String]("proc_hr").nonEmpty)
  }

  test("alert gating: alive + alert = no record; dead proc always records (health.c:75, in_proc.c:241)") {
    // a bound local port → alive
    val srv = new java.net.ServerSocket(0)
    try {
      val up = Samplers.health(spark, "127.0.0.1", srv.getLocalPort,
        addHost = true, addPort = true)
      val r = up.collect()(0)
      assert(r.getAs[Boolean]("alive"))
      assert(r.getAs[String]("hostname") == "127.0.0.1")
      assert(r.getAs[Int]("port") == srv.getLocalPort)
      assert(Samplers.health(spark, "127.0.0.1", srv.getLocalPort,
        alert = true).isEmpty)
    } finally srv.close()
    // an unbound port → down; alert still records the DOWN event
    val freed = { val s = new java.net.ServerSocket(0); val p = s.getLocalPort; s.close(); p }
    val down = Samplers.health(spark, "127.0.0.1", freed, alert = true, timeoutMs = 500)
    assert(!down.collect()(0).getAs[Boolean]("alive"))

    assert(Samplers.proc(spark, "no-such-process-name").collect()(0)
      .getAs[Boolean]("alive") == false)
    assert(Samplers.pidOf("no-such-process-name").isEmpty)
  }

  test("conf proc input: Mem off / Fd off disable like the reference (false OR off, in_proc.c:192-210)") {
    val self = java.nio.file.Paths.get("/proc/self/cmdline")
    val base = new String(java.nio.file.Files.readAllBytes(self), "UTF-8")
      .takeWhile(_ != 0).split("/").last
    val conf =
      s"""[INPUT]
         |    Name      proc
         |    Proc_Name $base
         |    Mem       off
         |    Fd        off
         |""".stripMargin
    val out = graft.run.ConfPipeline.load(spark, conf, "").filtered
    assert(!out.columns.exists(_.startsWith("mem.Vm")))
    assert(!out.columns.contains("fd"))
    assert(out.collect()(0).getAs[Boolean]("alive"))
  }

  test("conf surface: [INPUT] mem/health wire through ConfPipeline with routing tags") {
    val srv = new java.net.ServerSocket(0)
    try {
      val conf =
        s"""[INPUT]
           |    Name     mem
           |    Tag      metrics.mem
           |[INPUT]
           |    Name     health
           |    Host     127.0.0.1
           |    Port     ${srv.getLocalPort}
           |    Add_Port true
           |    Tag      metrics.health
           |""".stripMargin
      val out = graft.run.ConfPipeline.load(spark, conf, "").filtered
      val rows = out.collect()
      assert(rows.length == 2)
      val tags = rows.map(_.getAs[String]("tag")).toSet
      assert(tags == Set("metrics.mem", "metrics.health"))
    } finally srv.close()
  }
}
