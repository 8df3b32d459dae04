package graft

/**
 * The pure math behind [[Bench]]'s self-healing record (round 11):
 * extracted so the exact predicates the gate depends on are unit-
 * testable against real recorded pathologies, not only exercised
 * end-to-end inside a minutes-long bench run.
 *
 * Premise: a query's seq and conc readings measure the SAME plan on
 * the SAME data in the SAME JVM. They legitimately differ by
 * contention (conc runs under admission-width-way sharing), but a
 * >4× disagreement with the larger side above 3 s is a measurement
 * artifact by construction — the round-10 gate record held both
 * directions (q9T 19.57 s seq vs 0.77 s conc; q93 16.34 s conc vs
 * 0.89 s seq) on a host whose steal/iowait/other were all ≈ 0.
 */
object BenchHeuristics {

  /** True when the two readings of one query refute each other:
    * larger side > 3 s AND > 4× the smaller (floored at 1 ms so a
    * 0-second reading cannot divide away the check). */
  def isOutlier(a: Double, b: Double): Boolean = {
    val hi = math.max(a, b)
    val lo = math.max(math.min(a, b), 1e-3)
    hi > 3.0 && hi > 4.0 * lo
  }

  /** Σ excess conc-seconds over queries whose CONC reading is the
    * outlier side — the portion of the admission-bound wall
    * (≈ Σconc/pool) attributable to measurement artifacts. */
  def concIncoherence(seqCost: Map[String, Double],
                      conc: Seq[(String, Double)]): Double =
    conc.iterator.flatMap { case (n, c) =>
      seqCost.get(n).collect {
        case s if c > 3.0 && c > 4.0 * math.max(s, 1e-3) => c - s
      }
    }.sum

  /** Fire the full conc-pass retry when the incoherence is worth more
    * wall time than max(2 s, 10% of the measured wall). */
  def incoherenceRetries(incoherence: Double, pool: Int,
                         wall: Double): Boolean =
    incoherence / pool > math.max(2.0, 0.10 * wall)

  /** Unified sickness of one conc pass, for ranking passes by CAUSE
    * (never by wall): both trigger conditions normalized so 1.0 = at
    * its threshold — steal_pct against the 2% bar, incoherence wall-
    * share against max(2 s, 10% wall). A pass trips the retry when
    * sick > 1; among completed passes the one with MIN sickness is
    * published (outcome-blind: a lucky-fast but steal-soaked pass
    * ranks worse than a slower clean one). */
  def sickScore(stealPct: Double, incoherence: Double, pool: Int,
                wall: Double): Double =
    math.max(stealPct / 2.0,
      (incoherence / pool) / math.max(2.0, 0.10 * wall))

  /** Whether a post-settle replay value `re` may REPLACE the seq
    * reading `seq` in the published queries_seq (round-11 advice: the
    * old rule replaced unconditionally and only ever downward).
    * Two conditions:
    *  - the SEQ side was the outlier (seq > conc): the seq column is
    *    the plan signal, so only its artifacts are healed; conc-side
    *    outliers are replayed for evidence only.
    *  - the replay itself is COHERENT with the conc twin: a replay
    *    that reproduces the slow reading (still >4×/3 s apart from
    *    conc) CONFIRMS the seq reading — a reproducible regression
    *    must stay published, not be healed out of the headline. */
  def acceptReplay(seq: Double, conc: Double, re: Double): Boolean =
    seq > conc && !isOutlier(re, conc)

  /** A seq reading is WINDOW-INFLATED when it tops 1 s AND 2× its
    * conc twin — individually UNDER the [[isOutlier]] 4×/3 s bar, so
    * the per-query replay never sees it. */
  def inflated2x(seq: Double, conc: Double): Boolean =
    seq > 1.0 && seq > 2.0 * math.max(conc, 1e-3)

  /** Names inside a CONTENTION WINDOW: ≥ `minRun` CONSECUTIVE (in
    * execution order) window-inflated seq readings. The round-13 gate
    * showed the shape this catches: a contiguous run (qAS→qB5)
    * inflated 2–7× versus both the conc twins and the prior round,
    * with only 3 members over the 4× per-query bar — the other 8
    * published inflated and pushed Σseq from the 66–77 s band to
    * 89.7 s. Independent plan regressions do not land adjacent in
    * execution order; a host contention window is exactly this
    * shape, so the whole run is replayed post-settle (each member
    * still subject to the one-sided acceptance rule). */
  def contentionWindow(seq: Seq[(String, Double)],
                       conc: Map[String, Double],
                       minRun: Int = 4): Set[String] = {
    val out = Set.newBuilder[String]
    var run = List.empty[String]
    def flush(): Unit = { if (run.size >= minRun) out ++= run; run = Nil }
    seq.foreach { case (n, s) =>
      if (conc.get(n).exists(c => inflated2x(s, c))) run ::= n else flush()
    }
    flush()
    out.result()
  }

  /** Replay acceptance for window members — [[acceptReplay]]'s
    * one-sided rule at the window's own 2× bar: a replay that still
    * reads inflated alone post-settle CONFIRMS the seq reading and
    * must stay published. */
  def acceptWindowReplay(seq: Double, conc: Double, re: Double): Boolean =
    seq > conc && !inflated2x(re, conc)

  /** The committed clean norm for a full seq pass's JIT compilation
    * time on this suite (the census's jit_ms field). Re-recorded
    * round 18 from three census-clean seq passes at the 278-query
    * suite — jit_ms 62.2/61.2/65.5 s (steal ≤ 0.13%, other ≤ 0.02%,
    * probe 57–58 ms), median ≈ 62 s. History: 25 s (r12–r14 suite)
    * → 51 s (r15, 202–210 queries) → 71 s (r17, 263) → 62 s (r18,
    * 278 — DOWN despite suite growth: the r17 readings came from a
    * hotter host window, which is why the norm is a median of clean
    * censuses, not a single sample) — left stale the constant either
    * arms [[jitSickSeq]] on every clean pass (too low) or lets a
    * genuinely sick census publish (too high, the drift the r16
    * VERDICT flagged). Re-record when the suite grows enough to
    * move the clean census. */
  val SeqJitCleanNormMs = 62000L

  /** A seq pass is JIT-SICK when its compilation-time census reads
    * over 2× the committed clean norm — the r14 gate pathology:
    * seq jit_ms 62.0 s vs the ~25 s norm inflated Σseq 104.3 s vs
    * the 70.7 s committed record UNIFORMLY (trivial collation plans
    * 3–7× their committed twins), with no ≥4-consecutive window, so
    * [[contentionWindow]] correctly stayed quiet and the inflation
    * published. A census this sick is a host/code-cache story, not
    * 16 simultaneous plan regressions. Negative jit_ms (compilation
    * timing unsupported) never trips. */
  def jitSickSeq(seqJitMs: Long,
                 cleanNormMs: Long = SeqJitCleanNormMs): Boolean =
    seqJitMs > 2L * cleanNormMs

  /** Who to replay when the seq pass is JIT-sick: every seq reading
    * inflated 2× past its conc twin (the [[inflated2x]] bar — the
    * suite-wide analogue of a window, membership by inflation alone
    * since adjacency carries no signal when the whole pass is sick),
    * ranked by absolute seq−conc excess, capped so the post-settle
    * replay tail stays bounded. Acceptance is the window members'
    * one-sided 2× rule — a replay that reproduces the inflation
    * alone confirms the reading and stays published. */
  def jitReplayMembers(seq: Seq[(String, Double)],
                       conc: Map[String, Double],
                       cap: Int = 12): Seq[String] =
    seq.flatMap { case (n, s) =>
      conc.get(n).collect { case c if inflated2x(s, c) => (n, s - c) }
    }.sortBy(-_._2).take(cap).map(_._1)
}
