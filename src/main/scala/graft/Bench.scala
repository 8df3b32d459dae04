package graft
import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: runs every SparkEntry query at SPARK_GRAFT_SF_DIR and
 * prints one JSON line {"metric","value","unit","queries","sf"}.
 *
 * Queries run CONCURRENTLY (admission-limited, FAIR scheduler; 3/4 of
 * the cores by default — see the poolSize note) — the engine is a
 * query gateway, and a gateway's throughput metric is wall-clock for
 * a query workload, not the sum of isolated latencies. `value` is
 * the wall-clock of the whole workload; `queries` carries each query's
 * individual latency as measured inside the concurrent run.
 *
 * Because 8-way scheduler contention confounds PER-QUERY numbers, a
 * second, SEQUENTIAL pass (each query alone on the full machine) is
 * recorded as `queries_seq` — that's the column to read when judging a
 * single query's plan. SPARK_GRAFT_BENCH_MODE=conc|seq skips the other
 * pass; default is both.
 *
 * The record SELF-HEALS (round-10 verdict): a query's seq and conc
 * readings measure the same plan on the same data in the same JVM, so
 * a >4× disagreement between them is a measurement artifact by
 * construction. The conc pass retries — up to twice, since a sick
 * pass can follow a sick pass — while every sample so far trips a
 * trigger (internal incoherence worth >10% of the wall, or
 * hypervisor steal >2%), published by CAUSE (minimum sickness
 * score), never by min-wall; surviving outliers are
 * re-measured one-by-one post-settle and the replayed value replaces
 * a seq-side outlier's entry ONLY when the replay is itself coherent
 * with the conc twin — a replay that reproduces the slow reading
 * confirms it and the original stays published (round-11 advice: the
 * old unconditional replace healed real regressions out of the
 * headline). Replaced names are flagged in `seq_replaced` next to
 * `queries_seq`; originals stay under "replay". Each census also
 * counts ZGC allocation/relocation stalls from the default-on per-JVM
 * GC log, so a stall storm is attributable from the record alone
 * (`gc_stalls_observable` says whether the active collector's stalls
 * match the parser at all — G1's pauses don't).
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val mode = sys.env.getOrElse("SPARK_GRAFT_BENCH_MODE", "both")
    // shuffle/spill to tmpfs when available: the bench writes the
    // shuffle working set of ~146 queries × 3 passes, and on a
    // burst-throttled block device the CONCURRENT pass degrades over
    // the run (observed: load ~2 on 32 cores — tasks blocked on I/O,
    // not CPU — and 4–8× wall variance between identical runs)
    val localDir = sys.env.get("SPARK_LOCAL_DIRS").orElse {
      val shm = java.nio.file.Paths.get("/dev/shm")
      if (java.nio.file.Files.isWritable(shm))
        Some(java.nio.file.Files.createDirectories(
          shm.resolve("graft-bench-tmp")).toString)
      else None
    }
    def newSession(): SparkSession = {
      val builder = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.scheduler.mode", "FAIR")
        // static conf, default 100: ~146 queries × several codegen units
        // cycle a 100-entry LRU to a ~0% hit rate, so the concurrent
        // pass recompiles Janino sources constantly — compilation
        // serializes and a 0.4 s query reads 80 s (observed; cores idle)
        .config("spark.sql.codegen.cache.maxEntries", "4096")
        .config("spark.ui.enabled", "false")
      localDir.foreach(builder.config("spark.local.dir", _))
      val s = builder.getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      LogNoise.silenceFairPoolWarnings()
      s
    }
    val spark = newSession()
    // Consume the FULL result — a bare .count() lets Catalyst prune every
    // unreferenced column, under-measuring projection-heavy queries. The
    // built-in `noop` sink evaluates all output columns and discards rows.
    def consume(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // SPARK_GRAFT_BENCH_ONLY=q91,q89 restricts to a comma-separated
    // subset (prefix match) — for iterating on one query's plan
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }

    // A query that throws must never masquerade as a fast success in the
    // committed record (round 7: 16 analysis-broken queries printed as
    // 0.002 s "passes") — every throw lands in `errors` and the query is
    // EXCLUDED from queries/queries_seq/value. Warmup failures are kept
    // SEPARATE: a later timed success clears only the warmup entry, never
    // a failure from another timed pass (a seq-pass throw stays visible
    // even if the conc pass then succeeds — that's a flake worth seeing).
    val warmupErrors = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val timedErrors = new java.util.concurrent.ConcurrentHashMap[String, String]()
    def errMsg(t: Throwable): String =
      (t.getClass.getSimpleName + ": " +
        String.valueOf(t.getMessage)).replaceAll("[\"\\\\\\s]+", " ").take(200)
    // untimed warmup ITERATION over the whole workload: JIT + codegen
    // caches + parquet footers, and the memoized OFFLINE artifacts —
    // IVF centroids (q72/qA4), BPE merge lists + the encoded corpus
    // (qAH/qAK/qAZ), media embeddings/fingerprints (qA3/qA4/qAG via
    // FrameCache). A deployment builds those once at ingest and stores
    // them in the lake; timed runs measure index/search/aggregate, not
    // re-extraction. Without a full pass, whichever timed pass runs
    // first absorbs per-query codegen compilation and reads
    // artificially slow.
    names.foreach { case (name, fn) =>
      try consume(fn(spark, sfDir)) catch {
        case t: Throwable => warmupErrors.put(name, errMsg(t))
      }
    }
    // settle the JVM between passes: the warmup leaves ~150 queries of
    // soft debris (unreachable localCheckpoint blocks pending the
    // ContextCleaner, promotion-heavy young gen), and whichever queries
    // run FIRST in the next pass otherwise absorb the collection pauses
    // (observed: q37–q45 at 5–10× their isolated times right after
    // warmup, normal when re-run alone). An explicit full GC drains the
    // reference queue so the cleaner can drop the blocks, then a short
    // pause lets it run — measurement hygiene, not a speedup.
    def settle(): Unit = { System.gc(); Thread.sleep(1000); System.gc() }
    settle()
    /** Elapsed seconds, or None (+ errors entry) when the query threw. */
    def timed(name: String,
              fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val q0 = System.nanoTime()
      try {
        consume(fn(spark, sfDir))
        warmupErrors.remove(name) // warmup-only transient: unflag
        Some((System.nanoTime() - q0) / 1e9)
      } catch { case t: Throwable => timedErrors.put(name, errMsg(t)); None }
    }
    // 3-decimal (ms) resolution keeps the one-line record compact: the
    // driver stores only the LAST 2000 chars of output, so every byte
    // of per-query noise crowds the headline numbers out of the record
    // Locale.ROOT: the f"" interpolator honors the JVM default locale,
    // and a decimal-comma locale (de_DE) would emit invalid JSON
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def json(rows: Seq[(String, Double)]): String =
      rows.map { case (k, v) => "\"" + k + "\":" + num(v) }.mkString("{", ",", "}")

    // Host-contention census: bench numbers are only meaningful from an
    // otherwise-idle host (SCALE.md records 4-8x wall variance when the
    // box is shared), and this VM ALSO runs under a hypervisor that
    // steals CPU when neighbors are busy (observed: 20% of non-idle
    // time stolen in the first minutes after boot, with per-query seq
    // times up to 14x their settled values). Rather than let a
    // contaminated run masquerade as a regression, each timed pass
    // samples /proc/stat around itself and the record carries: %CPU
    // stolen by the hypervisor, %CPU burned by OTHER processes (the
    // driver's verify jobs, a concurrent build), and this JVM's own
    // share — so a slow wall is attributable from the record alone.
    def procStat(): Array[Long] = try {
      val l = scala.io.Source.fromFile("/proc/stat").getLines().next()
      l.split("\\s+").drop(1).map(_.toLong)
    } catch { case _: Exception => Array.empty[Long] }
    def selfJiffies(): Long = try {
      val f = scala.io.Source.fromFile("/proc/self/stat").mkString.split(" ")
      f(13).toLong + f(14).toLong // utime + stime
    } catch { case _: Exception => 0L }
    def uptimeS: Long = try {
      scala.io.Source.fromFile("/proc/uptime").mkString
        .split("\\s+")(0).toDouble.toLong
    } catch { case _: Exception => -1L }
    // Fixed single-thread reference workload (xorshift64* over 3e7
    // steps, ~50 ms on this box when healthy): guest-visible steal
    // accounting MISSES two real slowdown modes on a shared host —
    // frequency capping and LLC/memory-bandwidth contention from
    // neighboring VMs (observed: walls of 42.8 s and 17.3 s from the
    // SAME jar an hour apart, both with steal < 0.3% and iowait 0).
    // A calibration probe converts "the wall is slow" into "the wall
    // is slow AND the fixed 50 ms probe took 130 ms" — attributable
    // to the host from the record alone, no guest counters needed.
    def probeMs(): Double = {
      var x = 0x9E3779B97F4A7C15L
      var i = 0
      val t0 = System.nanoTime()
      while (i < 30000000) {
        x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
        i += 1
      }
      val dt = (System.nanoTime() - t0) / 1e6
      if (x == 42L) println("") // defeat dead-code elimination
      dt
    }
    probeMs() // JIT-warm the probe loop itself before anyone times it

    // GC evidence (round-10 verdict ask #2): build.sbt logs gc* to this
    // file unconditionally; each census window counts the ZGC
    // allocation/relocation stalls that fell inside it, so a stalled
    // pass carries its own diagnosis in the record. JDK 17's ZGC is
    // non-generational — under explode-heavy allocation rates mutator
    // threads block in "Allocation Stall (thread) 12.345ms" events,
    // the prime suspect for the r10 seq storm (q9T 19.6 s seq vs
    // 0.77 s conc, same jar reading 0.44 s half an hour earlier).
    // default matches build.sbt's per-JVM pattern: the JDK expands
    // %p to the bare pid in -Xlog file names (verified on 17.0.20),
    // so concurrent forked JVMs (tests beside a bench) each get their
    // own file instead of truncating/interleaving one shared log —
    // the round-11 advice fix for corrupted byte-offset census windows
    val gcLogPath = sys.env.getOrElse("SPARK_GRAFT_GCLOG", "target/gc-%p.log")
      .replace("%p", ProcessHandle.current().pid().toString)
    // per-JVM logs accumulate one file per fork (tests included) with
    // nothing bounding the set — reclaim siblings older than a day so
    // a long-lived workspace doesn't grow target/ without limit.
    // ONLY under the default target/ location and only files matching
    // the exact per-pid shape gc-<digits>.log: with SPARK_GRAFT_GCLOG
    // pointing into a shared directory (e.g. /var/log) a broad
    // `gc-*.log` sweep would delete logs the bench does not own
    // …and never a file whose pid is STILL ALIVE: a concurrent JVM
    // older than a day is legitimately writing gc-<its-pid>.log, and
    // unlinking it would make that process's stall census silently
    // read zero from a missing path (round-12 advice)
    if (!sys.env.contains("SPARK_GRAFT_GCLOG")) try {
      val dir = new java.io.File(gcLogPath).getAbsoluteFile.getParentFile
      val cutoff = System.currentTimeMillis() - 24L * 3600 * 1000
      val own = "gc-([0-9]+)\\.log".r
      Option(dir.listFiles()).getOrElse(Array.empty).foreach { f =>
        f.getName match {
          case own(pid) if f.lastModified() < cutoff &&
              !(try ProcessHandle.of(pid.toLong).isPresent
                catch { case _: NumberFormatException => true }) =>
            f.delete()
          case _ => ()
        }
      }
    } catch { case _: Exception => () }
    def gcLogLen(): Long = {
      val f = new java.io.File(gcLogPath)
      if (f.isFile) f.length() else 0L
    }
    val StallRe = "(Allocation|Relocation) Stall \\([^)]*\\)\\s+([0-9.]+)ms".r
    // whether the ACTIVE collector's stall/pause events can match
    // StallRe at all: ZGC logs per-thread "Allocation Stall" lines;
    // G1's pauses don't, so under SPARK_GRAFT_GC=g1 alloc_stalls=0
    // means "not observable", not "no pauses" — say so in the record
    val gcCollector: String = {
      import scala.jdk.CollectionConverters._
      val ns = java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans.asScala.map(_.getName)
      if (ns.exists(_.startsWith("ZGC"))) "zgc"
      else if (ns.exists(_.startsWith("G1"))) "g1"
      else ns.mkString("+")
    }
    val gcMetaJson =
      s""""gc_collector":"$gcCollector","gc_stalls_observable":${gcCollector == "zgc"}"""
    /** (allocStalls, relocStalls, totalStallMs) in [from, to) of the log. */
    def gcStalls(from: Long, to: Long): (Long, Long, Double) = try {
      if (to <= from) (0L, 0L, 0.0)
      else {
        val raf = new java.io.RandomAccessFile(gcLogPath, "r")
        try {
          raf.seek(from)
          val buf = new Array[Byte](math.min(to - from, 64L << 20).toInt)
          raf.readFully(buf)
          val text = new String(buf, "UTF-8")
          var (a, r, ms) = (0L, 0L, 0.0)
          StallRe.findAllMatchIn(text).foreach { m =>
            if (m.group(1) == "Allocation") a += 1 else r += 1
            ms += m.group(2).toDouble
          }
          (a, r, ms)
        } finally raf.close()
      }
    } catch { case _: Exception => (0L, 0L, 0.0) }

    // JIT evidence for sick-pass attribution (SCALE.md "conc-dispatch
    // pathology"): per-window compilation-time delta separates a
    // JIT-storm pass (re-compilation churn) from an allocation-stall
    // pass; code-heap occupancy at window end makes code-cache
    // exhaustion (compilation silently stops, hot paths stay in the
    // interpreter) directly readable from the record instead of
    // requiring a -XX:+PrintCodeCache exit dump on a one-shot JVM.
    val compBean = java.lang.management.ManagementFactory.getCompilationMXBean
    def jitMs(): Long =
      if (compBean != null && compBean.isCompilationTimeMonitoringSupported)
        compBean.getTotalCompilationTime
      else -1L
    /** (used, max) bytes summed over the CodeHeap/CodeCache pools.
      * Any pool reporting an UNDEFINED max (-1) makes the whole max
      * -1/unknown — clamping it to 0 would publish used > max, which
      * reads as total exhaustion, the one misdiagnosis these fields
      * exist to prevent. */
    def codeCacheUsage(): (Long, Long) = try {
      import scala.jdk.CollectionConverters._
      val pools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans
        .asScala.filter(p => p.getName.contains("CodeHeap") ||
          p.getName.contains("Code Cache"))
      val maxes = pools.map(_.getUsage.getMax)
      (pools.map(_.getUsage.getUsed).sum,
        if (maxes.exists(_ < 0) || maxes.isEmpty) -1L else maxes.sum)
    } catch { case _: Exception => (-1L, -1L) }

    final class HostCensus {
      private var h0 = procStat(); private var s0 = selfJiffies()
      private var g0 = gcLogLen()
      private var j0 = jitMs()
      private val acc = new java.util.concurrent.atomic.AtomicReference(
        (0L, 0L, 0L, 0L, 0L)) // (steal, busy, self, iowait, total)
      private val gcAcc = new java.util.concurrent.atomic.AtomicReference(
        (0L, 0L, 0.0)) // (allocStalls, relocStalls, stallMs)
      private val jitAcc = new java.util.concurrent.atomic.AtomicLong(0L)
      @volatile private var ccEnd = (-1L, -1L)
      private var probe = -1.0
      /** Reset the window WITHOUT accumulating — excludes warmup/settle
        * gaps so the census covers exactly the timed passes. Times the
        * calibration probe at the pass boundary. */
      def mark(): Unit = {
        probe = probeMs(); h0 = procStat(); s0 = selfJiffies(); g0 = gcLogLen()
        j0 = jitMs()
      }
      def lap(): Unit = {
        val h1 = procStat(); val s1 = selfJiffies(); val g1 = gcLogLen()
        val j1 = jitMs()
        if (j0 >= 0 && j1 >= j0) jitAcc.addAndGet(j1 - j0)
        j0 = j1
        ccEnd = codeCacheUsage()
        if (h0.length >= 8 && h1.length >= 8) {
          val d = h1.zip(h0).map { case (a, b) => a - b }
          def at(i: Int) = if (d.length > i) d(i) else 0L
          val tot = d.sum
          val (st, bz, sf, io, to) = acc.get()
          // busy = in-guest CPU only: excludes idle and iowait (each
          // reported on its own), AND steal/guest jiffies — otherwise
          // other_pct (= busy − self) would conflate hypervisor steal
          // with other-process CPU and contradict the record's own
          // steal_pct column
          acc.set((st + at(7),
            bz + (tot - at(3) - at(4) - at(7) - at(8) - at(9)),
            sf + (s1 - s0), io + at(4), to + tot))
        }
        val (ga, gr, gms) = gcStalls(g0, g1)
        val (pa, pr, pms) = gcAcc.get()
        gcAcc.set((pa + ga, pr + gr, pms + gms))
        h0 = h1; s0 = s1; g0 = g1
      }
      /** Accumulated JIT compilation ms across this census's laps —
        * the [[BenchHeuristics.jitSickSeq]] trigger input. */
      def jitMsTotal: Long = jitAcc.get()
      /** Hypervisor-steal share of total CPU time in this census's
        * window — the retry trigger (0 when nothing measured). */
      def stealPct: Double = {
        val (st, _, _, _, to) = acc.get()
        if (to == 0) 0.0 else 100.0 * st / to
      }
      def json: String = {
        val (st, bz, sf, io, to) = acc.get()
        if (to == 0) "{}"
        else {
          def pct(x: Long) = num(100.0 * x / to)
          val (ga, gr, gms) = gcAcc.get()
          val (ccu, ccm) = ccEnd
          def mb(b: Long) = if (b < 0) -1 else b >> 20
          // other = busy minus this JVM (self is per-process jiffies on
          // the same clock; clamp at 0 against rounding)
          s"""{"steal_pct":${pct(st)},"busy_pct":${pct(bz)},"self_pct":${pct(sf)},"other_pct":${pct(math.max(0L, bz - sf))},"iowait_pct":${pct(io)},"probe_ms":${num(probe)},"uptime_s":$uptimeS,"alloc_stalls":$ga,"reloc_stalls":$gr,"gc_stall_ms":${num(gms)},"jit_ms":${jitAcc.get()},"codecache_used_mb":${mb(ccu)},"codecache_max_mb":${mb(ccm)}}"""
        }
      }
    }
    // one census per timed pass: the seq pass runs minutes and would
    // dilute a conc-pass-only collapse below visibility in a combined
    // number (observed: combined busy 16% when the conc pass itself
    // was the anomaly)
    val censusSeq = new HostCensus
    val censusConc = new HostCensus
    val censusConcRetry = new HostCensus
    val censusConcRetry2 = new HostCensus
    val censusReplay = new HostCensus
    var concWalls: Seq[Double] = Nil // populated only when a retry fires
    var valuePass = "conc" // which pass produced the headline wall
    var retryReason = "" // why the conc retry fired ("" = it didn't)

    // sequential pass runs FIRST: it's the clean per-query plan signal,
    // and running it after the concurrent pass let same-JVM ordering/GC
    // make a query read slower alone than under 8-way contention
    censusSeq.mark()
    val seqResults: Seq[(String, Double)] =
      if (mode != "conc") names.flatMap { case (name, fn) =>
        timed(name, fn).map(name -> _)
      }
      else Nil
    censusSeq.lap()
    var wall = seqResults.map(_._2).sum // overwritten by the conc wall below
    var concJson = "{}"
    var concResults: Seq[(String, Double)] = Nil
    if (mode == "both") settle() // seq debris must not bill the conc wall
    if (mode != "seq") {
      // NOTE on pass ordering: whichever pass runs LAST in this JVM
      // pays an aging tax (measured: conc-only in a fresh JVM walls
      // 36 s; the same conc workload as the third pass walls ~100 s —
      // and rebuilding the SparkSession between passes does not
      // recover it, so the accumulation is JVM-level, not session
      // state). seq runs first because per-query plan numbers are the
      // signal that must stay clean; the conc wall carries the tax.
      // admission width: how many queries run at once. Re-measured in
      // round 11 after the artifact/kernel optimization waves made the
      // suite dispatch-bound rather than CPU-bound: on 32 cores the
      // conc wall vs pool reads 8→13-15 s (28% busy), 16→7.9/9.7 s
      // (77%), 24→6.4/8.6 s (80%), 32→14 s (collapse) — the old
      // pool-8 default left the machine 72% idle waiting on the
      // single driver's job dispatch. 3/4 of the cores is the
      // measured sweet spot (floor 8 for small hosts);
      // SPARK_GRAFT_BENCH_POOL overrides for makespan experiments
      // (the gateway analog is the admission limit a real deployment
      // tunes per workload mix)
      // keyed off the session's executor-thread count (local[N]), not
      // host processors — a local[4] smoke run must not admit 24
      val poolSize = sys.env.get("SPARK_GRAFT_BENCH_POOL").map(_.toInt)
        .getOrElse(math.max(8, cpus.toInt * 3 / 4))
      // LPT (longest-first) submission when the sequential pass already
      // measured costs: heavy queries start first and light ones fill
      // the tail — classic makespan packing. Name order otherwise.
      val seqCost = seqResults.toMap
      val ordered =
        if (seqCost.nonEmpty) names.sortBy { case (n, _) => -seqCost.getOrElse(n, 0.0) }
        else names
      def concPass(): (Double, Seq[(String, Double)]) = {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(poolSize)
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutor(pool)
        val t0 = System.nanoTime()
        val futures = ordered.map { case (name, fn) =>
          scala.concurrent.Future {
            // FAIR mode only arbitrates BETWEEN pools — jobs in one pool
            // run FIFO, so without per-query pools a 2-task query queues
            // behind a 256-task dedup shuffle (measured: 80× latency
            // amplification). One pool per in-flight query restores the
            // fair share the gateway metric is meant to measure.
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", name)
            timed(name, fn).map(name -> _)
          }
        }
        val results = scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(futures),
          scala.concurrent.duration.Duration.Inf).flatten
        val w = (System.nanoTime() - t0) / 1e9
        pool.shutdown()
        (w, results)
      }
      // Internal-incoherence score of a conc pass: Σ excess seconds
      // over queries whose conc reading is >4× their own seq twin.
      // Same plan, same data, same JVM — a disagreement that large is
      // a measurement artifact BY CONSTRUCTION (the r10 gate record:
      // q93 16.3 s conc vs 0.89 s seq while steal/iowait/other ≈ 0).
      // ÷pool ≈ the wall-seconds the artifact added (the conc pass is
      // admission-bound: wall ≈ Σconc/pool).
      val seqCost0 = seqResults.toMap
      def concIncoherence(rs: Seq[(String, Double)]): Double =
        BenchHeuristics.concIncoherence(seqCost0, rs)
      // Retry the whole pass — up to TWICE — while every pass so far
      // is untrustworthy, for either measurable cause:
      // - steal > 2%: round boundaries are exactly when VM fleets boot
      //   in waves and hypervisor steal spikes (SCALE.md: 30-60% of
      //   busy time stolen in bursts) — the wall read the NEIGHBORS.
      // - incoherence worth >10% of the wall (and >2 s): the record
      //   refutes itself, so it must not be published unchallenged.
      // Both causes fold into one sickness score (1.0 = at threshold,
      // BenchHeuristics.sickScore); the published pass is the one
      // with MIN sickness, never min wall — picking the better wall
      // would bias the headline one-sidedly downward, since retries
      // only fire when the prior passes were sick, never when they
      // were lucky. The second retry exists because a sick pass can
      // follow a sick pass (the r11 gate: 18.7 s incoherent, then
      // 39.7 s worse — one retry could only choose between two sick
      // samples). All walls, all censuses, the pass-1 reason, and
      // which pass was published stay in the record.
      def passSick(c: HostCensus, w: Double,
                   rs: Seq[(String, Double)]): Double =
        BenchHeuristics.sickScore(c.stealPct, concIncoherence(rs),
          poolSize, w)
      censusConc.mark()
      val (w1, r1) = concPass()
      censusConc.lap()
      if (censusConc.stealPct > 2.0) retryReason = "steal"
      else if (BenchHeuristics.incoherenceRetries(
          concIncoherence(r1), poolSize, w1))
        retryReason = "incoherence"
      var passes = List(("conc", w1, r1, censusConc))
      var spare = List(("conc_retry", censusConcRetry),
        ("conc_retry2", censusConcRetry2))
      while (spare.nonEmpty &&
             passes.map(p => passSick(p._4, p._2, p._3)).min > 1.0) {
        val (nm, cen) = spare.head; spare = spare.tail
        settle()
        cen.mark()
        val (w, r) = concPass()
        cen.lap()
        passes = passes :+ ((nm, w, r, cen))
      }
      val best = passes.minBy(p => passSick(p._4, p._2, p._3))
      wall = best._2; concResults = best._3; valuePass = best._1
      if (passes.size > 1) concWalls = passes.map(_._2)
      concJson = json(concResults)
    }
    // Per-query outlier replay (round-10 verdict ask #1): after both
    // passes (and any retry), every query whose seq and conc readings
    // STILL disagree >4× is re-measured once, alone, post-settle. The
    // SEQ column is the per-query plan signal — when the seq side was
    // the outlier (the r10 storm: q9T 19.57 s seq vs 0.77 s conc in
    // one record), the replayed value replaces it; both original
    // readings stay in the record under "replay" so nothing is
    // hidden. Conc-side outliers are replayed for evidence only (the
    // conc column is a dispatch artifact by design; the full-pass
    // retry above owns the wall).
    val MaxReplay = 20
    var seqFinal = seqResults
    var seqReplaced: Seq[String] = Nil
    var replayJson = ""
    if (mode == "both") {
      val concMap = concResults.toMap
      import BenchHeuristics.isOutlier
      val perQuery = seqResults.flatMap { case (n, s) =>
        concMap.get(n).collect { case c if isOutlier(s, c) => (n, s, c) }
      }
      // window-level trigger (round-13 verdict ask #6): a contiguous
      // run of ≥4 seq readings each >2× its conc twin is a host
      // contention window even though no single member trips the 4×
      // bar — replay the WHOLE window post-settle
      val windowNames = BenchHeuristics.contentionWindow(seqResults, concMap)
      val perQueryNames = perQuery.map(_._1).toSet
      val windowMembers = seqResults.flatMap { case (n, s) =>
        if (windowNames(n) && !perQueryNames(n))
          concMap.get(n).map(c => (n, s, c))
        else None
      }
      // window membership = the FULL detected window (r14 advice): a
      // per-query outlier sitting inside a contention window is part
      // of the window's extent — it takes the window's stricter 2×
      // acceptance bar (its inflation has the window's cause, and a
      // post-settle replay still 2–4× conc confirms rather than
      // heals) and its JSON row carries the window:true marker, so
      // the published record reflects how wide the window really was
      val isWindow = windowNames
      // JIT-sick seq pass (round-14 verdict ask #7): when the seq
      // census's compilation time reads >2× the committed clean norm,
      // the inflation is suite-WIDE (the r14 record: jit_ms 62 s,
      // trivial plans 3–7× their twins) and never forms the
      // ≥4-consecutive run the window trigger needs — replay the
      // top-N 2×-inflated readings post-settle under the window
      // members' own one-sided 2× acceptance
      val seqJitMs = censusSeq.jitMsTotal
      val jitNames: Set[String] =
        if (BenchHeuristics.jitSickSeq(seqJitMs))
          BenchHeuristics.jitReplayMembers(seqResults, concMap).toSet --
            perQueryNames -- windowNames
        else Set.empty
      val jitMembers = seqResults.flatMap { case (n, s) =>
        if (jitNames(n)) concMap.get(n).map(c => (n, s, c)) else None
      }
      val outliers = perQuery ++ windowMembers ++ jitMembers
      if (outliers.nonEmpty) {
        settle()
        censusReplay.mark()
        val fnByName = SparkEntry.queries
        // replay-local timing (round-11 advice): a replay throw must
        // not mark a query that succeeded in BOTH real passes as
        // failed in the record's errors map, and a replay success
        // must not clear a genuine warmup flag — replay outcomes
        // live only in the replay sidecar below
        def timedReplay(
            fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
            : Either[String, Double] = {
          val q0 = System.nanoTime()
          try { consume(fn(spark, sfDir)); Right((System.nanoTime() - q0) / 1e9) }
          catch { case t: Throwable => Left(errMsg(t)) }
        }
        val re = outliers.sortBy { case (_, s, c) => -math.abs(s - c) }
          .take(MaxReplay).flatMap { case (n, s, c) =>
            fnByName.get(n).map(fn => (n, s, c, timedReplay(fn)))
          }
        censusReplay.lap()
        // Accept a replayed value into queries_seq only per
        // BenchHeuristics.acceptReplay: seq side was the outlier AND
        // the replay is coherent with the conc twin (round-11 advice:
        // the old unconditional replace was one-sided — it healed
        // upward noise while a reproducible regression that also
        // reads high alone CONFIRMS the seq reading).
        // window members accept at their own 2× bar; per-query
        // outliers keep the 4× rule — both one-sided (seq > conc)
        val accepted: Map[String, Double] = re.collect {
          case (n, s, c, Right(v))
            if (if (isWindow(n) || jitNames(n))
                  BenchHeuristics.acceptWindowReplay(s, c, v)
                else BenchHeuristics.acceptReplay(s, c, v)) => n -> v
        }.toMap
        seqFinal = seqResults.map { case (n, s) =>
          (n, accepted.getOrElse(n, s)) }
        seqReplaced = accepted.keys.toSeq.sorted
        def marks(n: String): String =
          (if (isWindow(n)) ""","window":true""" else "") +
            (if (jitNames(n)) ""","jit":true""" else "")
        val rows = re.map {
          case (n, s, c, Right(v)) =>
            s""""$n":{"seq":${num(s)},"conc":${num(c)},"re":${num(v)},"accepted":${accepted.contains(n)}${marks(n)}}"""
          case (n, s, c, Left(e)) =>
            s""""$n":{"seq":${num(s)},"conc":${num(c)},"re_err":"$e"${marks(n)}}"""
        }.mkString("{", ",", "}")
        val capped = if (outliers.size > MaxReplay)
          s""","replay_dropped":${outliers.size - MaxReplay}""" else ""
        val jitFlag = if (jitNames.nonEmpty)
          s""","jit_sick_seq":{"jit_ms":$seqJitMs,"norm_ms":${BenchHeuristics.SeqJitCleanNormMs}}"""
        else ""
        replayJson =
          s""","replay":$rows,"replay_census":${censusReplay.json}$capped$jitFlag"""
      }
    }
    val seqJson = if (mode != "conc") json(seqFinal) else "{}"
    // flag replaced entries NEXT TO the seq map itself (round-11
    // advice), not only in the replay sidecar buried under "host"
    val seqReplacedJson = if (seqReplaced.isEmpty) "" else
      seqReplaced.map("\"" + _ + "\"")
        .mkString(""","seq_replaced":[""", ",", "]")
    val slowestRows = (if (seqFinal.nonEmpty) seqFinal else concResults)
      .sortBy(-_._2).take(12)
    val slowest = json(slowestRows)
    // errMsg sanitized values (no quotes/backslashes/newlines), so
    // direct embedding is JSON-safe; timed failures win over warmup ones
    import scala.jdk.CollectionConverters._
    val errors = warmupErrors.asScala.toMap ++ timedErrors.asScala.toMap
    val errJson = errors.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }.mkString("{", ",", "}")
    // the compact stdout line must stay under the driver's 2000-char
    // tail even in the worst case (two retries + replays): it carries
    // the retry walls/reason but NOT the second retry census or the
    // seq_replaced list — those live in the full record only
    val retryJsonCompact =
      if (concWalls.isEmpty) ""
      else s""","conc_walls":${concWalls.map(num).mkString("[", ",", "]")},"value_pass":"$valuePass","retry_reason":"$retryReason","conc_retry":${censusConcRetry.json}"""
    val retryJson = retryJsonCompact +
      (if (concWalls.size > 2) s""","conc_retry2":${censusConcRetry2.json}"""
       else "")
    val fullRecord =
      s"""{"metric":"total","unit":"sec","queries":$concJson,"queries_seq":$seqJson$seqReplacedJson,"slowest":$slowest,"errors":$errJson,"host":{"seq":${censusSeq.json},"conc":${censusConc.json},$gcMetaJson$retryJson$replayJson},"value":${num(wall)},"sf":"$sfDir"}"""
    // The FULL record (146 queries × two per-query maps ≈ 6 KB) exceeds
    // the driver's 2000-char stdout tail, so it goes to a COMMITTED file
    // (repo root — target/ is gitignored) where per-query numbers stay
    // diffable round-over-round; stdout gets the full record first (for
    // humans running bench by hand) and then a compact, parse-safe
    // record (< 2000 chars: headline wall, slowest-12 both passes, sf)
    // as the genuinely LAST line — small enough that the stored tail
    // starts at or before the '{' and json.loads succeeds.
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL",
      "/root/repo/bench_full.json")
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(fullPath),
        (fullRecord + "\n").getBytes("UTF-8"))
    } catch { case _: Exception => () } // bench result > bookkeeping
    println(fullRecord)
    val slowSeq = json(seqFinal.sortBy(-_._2).take(12))
    val slowConc = json(concResults.sortBy(-_._2).take(12))
    // compact line carries only the error NAMES (messages live in the
    // full record) so a failure is visible even in the 2000-char tail
    val errNames = errors.keys.toSeq.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","unit":"sec","queries":$slowConc,"queries_seq":$slowSeq,"slowest":$slowest,"errors":$errNames,"host":{"seq":${censusSeq.json},"conc":${censusConc.json},$gcMetaJson$retryJsonCompact},"value":${num(wall)},"sf":"$sfDir","full":"$fullPath"}""")
    spark.stop()
  }
}
