package graft
import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: runs every SparkEntry query at SPARK_GRAFT_SF_DIR and
 * prints one JSON line {"metric","value","unit","queries","sf"}.
 *
 * Queries run CONCURRENTLY (8 at a time, FAIR scheduler) — the engine
 * is a query gateway, and a gateway's throughput metric is wall-clock
 * for a query workload, not the sum of isolated latencies. `value` is
 * the wall-clock of the whole workload; `queries` carries each query's
 * individual latency as measured inside the concurrent run.
 *
 * Because 8-way scheduler contention confounds PER-QUERY numbers, a
 * second, SEQUENTIAL pass (each query alone on the full machine) is
 * recorded as `queries_seq` — that's the column to read when judging a
 * single query's plan. SPARK_GRAFT_BENCH_MODE=conc|seq skips the other
 * pass; default is both.
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

    final class HostCensus {
      private var h0 = procStat(); private var s0 = selfJiffies()
      private val acc = new java.util.concurrent.atomic.AtomicReference(
        (0L, 0L, 0L, 0L, 0L)) // (steal, busy, self, iowait, total)
      private var probe = -1.0
      /** Reset the window WITHOUT accumulating — excludes warmup/settle
        * gaps so the census covers exactly the timed passes. Times the
        * calibration probe at the pass boundary. */
      def mark(): Unit = { probe = probeMs(); h0 = procStat(); s0 = selfJiffies() }
      def lap(): Unit = {
        val h1 = procStat(); val s1 = selfJiffies()
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
        h0 = h1; s0 = s1
      }
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
          // other = busy minus this JVM (self is per-process jiffies on
          // the same clock; clamp at 0 against rounding)
          s"""{"steal_pct":${pct(st)},"busy_pct":${pct(bz)},"self_pct":${pct(sf)},"other_pct":${pct(math.max(0L, bz - sf))},"iowait_pct":${pct(io)},"probe_ms":${num(probe)},"uptime_s":$uptimeS}"""
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
    var concWalls: Seq[Double] = Nil // populated only when a retry fires
    var valuePass = "conc" // which pass produced the headline wall

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
      // admission width: how many queries run at once. 8 on 32 cores
      // leaves each query ~4 cores; SPARK_GRAFT_BENCH_POOL overrides
      // for makespan experiments (the gateway analog is the admission
      // limit a real deployment tunes per workload mix)
      val poolSize = sys.env.get("SPARK_GRAFT_BENCH_POOL").map(_.toInt)
        .getOrElse(math.min(8, Runtime.getRuntime.availableProcessors()))
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
      censusConc.mark()
      val (w1, r1) = concPass()
      censusConc.lap()
      wall = w1; concResults = r1
      // Round boundaries are exactly when VM fleets boot in waves and
      // hypervisor steal spikes (SCALE.md: 30-60% of busy time stolen
      // in bursts after boot). A conc wall measured under that much
      // steal is a reading of the NEIGHBORS, not the engine — retry
      // the pass ONCE. The published pass is chosen by the CAUSE
      // variable (lower measured steal), never by the outcome
      // (min wall) — picking the better wall would bias the headline
      // one-sidedly downward, since the retry only ever fires when
      // pass 1 was contended, never when it was lucky. Both walls,
      // both censuses, and which pass was published stay in the
      // record, so nothing is hidden.
      if (censusConc.stealPct > 2.0) {
        settle()
        censusConcRetry.mark()
        val (w2, r2) = concPass()
        censusConcRetry.lap()
        concWalls = Seq(w1, w2)
        if (censusConcRetry.stealPct <= censusConc.stealPct) {
          wall = w2; concResults = r2; valuePass = "conc_retry"
        }
      }
      concJson = json(concResults)
    }
    val seqJson = if (mode != "conc") json(seqResults) else "{}"
    val slowestRows = (if (seqResults.nonEmpty) seqResults else concResults)
      .sortBy(-_._2).take(12)
    val slowest = json(slowestRows)
    // errMsg sanitized values (no quotes/backslashes/newlines), so
    // direct embedding is JSON-safe; timed failures win over warmup ones
    import scala.jdk.CollectionConverters._
    val errors = warmupErrors.asScala.toMap ++ timedErrors.asScala.toMap
    val errJson = errors.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }.mkString("{", ",", "}")
    val retryJson =
      if (concWalls.isEmpty) ""
      else s""","conc_walls":${concWalls.map(num).mkString("[", ",", "]")},"value_pass":"$valuePass","conc_retry":${censusConcRetry.json}"""
    val fullRecord =
      s"""{"metric":"total","unit":"sec","queries":$concJson,"queries_seq":$seqJson,"slowest":$slowest,"errors":$errJson,"host":{"seq":${censusSeq.json},"conc":${censusConc.json}$retryJson},"value":${num(wall)},"sf":"$sfDir"}"""
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
    val slowSeq = json(seqResults.sortBy(-_._2).take(12))
    val slowConc = json(concResults.sortBy(-_._2).take(12))
    // compact line carries only the error NAMES (messages live in the
    // full record) so a failure is visible even in the 2000-char tail
    val errNames = errors.keys.toSeq.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","unit":"sec","queries":$slowConc,"queries_seq":$slowSeq,"slowest":$slowest,"errors":$errNames,"host":{"seq":${censusSeq.json},"conc":${censusConc.json}$retryJson},"value":${num(wall)},"sf":"$sfDir","full":"$fullPath"}""")
    spark.stop()
  }
}
