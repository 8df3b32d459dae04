package graft

import org.scalatest.funsuite.AnyFunSuite

/** The self-healing bench predicates, pinned against the REAL
  * round-10 gate pathology (BENCH_r10: wall 41.7 s on a quiet host,
  * refuted by its own seq/conc disagreement) and against healthy
  * readings that must never trigger false healing. */
class BenchHeuristicsSpec extends AnyFunSuite {
  import BenchHeuristics._

  test("the r10 storm readings are outliers, in both directions") {
    assert(isOutlier(19.57, 0.77)) // q9T: seq storm
    assert(isOutlier(0.89, 16.34)) // q93: conc code-cache signature
    assert(isOutlier(15.355, 1.0)) // q9P seq vs its committed reading
  }

  test("legitimate contention and small noise are NOT outliers") {
    // conc legitimately reads ~2-3x seq under admission sharing
    assert(!isOutlier(1.0, 2.9))
    assert(!isOutlier(2.0, 6.0)) // 3x, under the 4x bar
    // sub-3s pairs never flag, whatever the ratio — replaying
    // millisecond noise would churn the record for nothing
    assert(!isOutlier(0.05, 0.9))
    assert(!isOutlier(0.2, 2.9))
    // identical readings
    assert(!isOutlier(5.0, 5.0))
  }

  test("a zero reading cannot divide away the check") {
    assert(isOutlier(0.0, 3.5))
    assert(isOutlier(4.0, 0.0))
  }

  test("concIncoherence counts only conc-side outliers, by excess") {
    val seq = Map("a" -> 1.0, "b" -> 0.89, "c" -> 19.57, "d" -> 2.0)
    val conc = Seq(
      "a" -> 2.5,   // healthy contention: not counted
      "b" -> 16.34, // conc outlier: counts 15.45
      "c" -> 0.77,  // SEQ-side outlier: not a conc artifact
      "d" -> 9.0,   // conc outlier: counts 7.0
      "e" -> 50.0)  // no seq twin: cannot be judged, not counted
    assert(math.abs(concIncoherence(seq, conc) - (15.45 + 7.0)) < 1e-9)
  }

  test("replay acceptance: heals transient seq artifacts, never " +
       "reproducible regressions or conc-side outliers") {
    // the r10 storm shape: seq 19.57 vs conc 0.77, replay reads 0.8
    // alone → transient measurement artifact, replace
    assert(acceptReplay(19.57, 0.77, 0.8))
    // replay REPRODUCES the slow reading → the regression is real;
    // the original stays published (round-11 advice: the old
    // unconditional replace healed this out of the headline)
    assert(!acceptReplay(19.57, 0.77, 18.9))
    // replay still incoherent with conc even if faster than seq
    assert(!acceptReplay(19.57, 0.77, 6.0))
    // conc-side outlier (q93 shape): evidence only, never replaces
    assert(!acceptReplay(0.89, 16.34, 0.9))
    // replay coherent-but-slower is still accepted (two-sided: the
    // replayed value may correct the seq reading UPWARD too)
    assert(acceptReplay(13.0, 3.1, 9.0))
  }

  test("retry threshold: the r10 record fires, a healthy record does not") {
    // r10: 13 storm queries summed ~127s excess against a 41.7s wall
    assert(incoherenceRetries(127.0, 8, 41.7))
    // this round's first live firing: qA4-class excess at pool 8
    assert(incoherenceRetries(30.0, 8, 17.9))
    // healthy: zero incoherence, any wall
    assert(!incoherenceRetries(0.0, 24, 6.0))
    // small absolute excess on a wide pool stays below the floor
    assert(!incoherenceRetries(20.0, 24, 6.0))
  }

  test("contentionWindow: the r13 gate shape fires, scattered noise does not") {
    import BenchHeuristics.{contentionWindow, acceptWindowReplay, inflated2x}
    val conc = Map("a" -> 0.5, "b" -> 1.2, "c" -> 0.6, "d" -> 1.0,
      "e" -> 0.4, "f" -> 0.3, "g" -> 2.0)
    // the r13 shape: a contiguous run of 2-4x inflations (each under
    // the 4x/3s per-query bar given its conc twin) — all five flagged
    val storm = Seq("a" -> 1.4, "b" -> 3.9, "c" -> 1.8, "d" -> 2.9,
      "e" -> 1.1, "f" -> 0.3, "g" -> 2.1)
    assert(contentionWindow(storm, conc) == Set("a", "b", "c", "d", "e"))
    // a run of 3 stays under the default minRun of 4
    val short = Seq("a" -> 1.4, "b" -> 3.9, "c" -> 1.8, "d" -> 0.9,
      "e" -> 1.1, "f" -> 0.3, "g" -> 2.1)
    assert(contentionWindow(short, conc).isEmpty)
    // scattered single inflations never form a window
    val scattered = Seq("a" -> 1.4, "b" -> 1.0, "c" -> 1.8, "d" -> 0.9,
      "e" -> 1.1, "f" -> 0.2, "g" -> 2.1)
    assert(contentionWindow(scattered, conc).isEmpty)
    // sub-second readings are not "inflated" no matter the ratio
    assert(!inflated2x(0.9, 0.1))
    // window acceptance mirrors the 2x trigger: a replay still
    // inflated alone CONFIRMS the reading; a settled one replaces it
    assert(acceptWindowReplay(3.9, 1.2, 1.3))
    assert(!acceptWindowReplay(3.9, 1.2, 3.8))
    // one-sided: a conc-side anomaly never rewrites the seq column
    assert(!acceptWindowReplay(1.0, 2.0, 1.0))
  }

  test("jitSickSeq: the r14 recorded pathology fires, clean censuses do not") {
    import BenchHeuristics.{jitSickSeq, jitReplayMembers}
    // the r14 gate record read jit_ms 62032 against ITS era's ~25 s
    // norm — the analogous suite-wide sickness at the r18-re-recorded
    // 62 s norm (clean records 61.2-65.5 s at 278 queries) is
    // anything past 124 s
    assert(jitSickSeq(62032L, cleanNormMs = 25000L))
    assert(jitSickSeq(150000L))
    assert(jitSickSeq(125000L))
    // clean r18 censuses read at the norm and MUST NOT arm (the r15
    // ADVICE item: a stale-low constant fires on every clean pass)
    assert(!jitSickSeq(61241L))
    assert(!jitSickSeq(65535L))
    // r17's hotter-window clean readings stay unarmed too
    assert(!jitSickSeq(73003L))
    assert(!jitSickSeq(124000L)) // at the 2x bar: not sick
    // unsupported compilation timing (jit_ms = -1) never trips
    assert(!jitSickSeq(-1L))
    // member selection: the r14 signature — trivial plans 3-7x their
    // conc twins scattered across the suite (no adjacency); ranked by
    // absolute excess, sub-second and sub-2x readings excluded
    val conc = Map("qBM" -> 0.34, "qBI" -> 0.26, "qBG" -> 0.23,
      "q01" -> 0.05, "q13" -> 1.10)
    val seq = Seq("qBM" -> 2.39, "q01" -> 0.09, "qBI" -> 1.58,
      "q13" -> 1.60, "qBG" -> 1.15)
    assert(jitReplayMembers(seq, conc) == Seq("qBM", "qBI", "qBG"))
    // the cap bounds the replay tail by largest excess first
    assert(jitReplayMembers(seq, conc, cap = 2) == Seq("qBM", "qBI"))
    // a clean suite selects nobody even if the trigger were consulted
    val clean = Seq("qBM" -> 0.35, "qBI" -> 0.27, "qBG" -> 0.25)
    assert(jitReplayMembers(clean, conc).isEmpty)
  }

  test("sickScore ranks passes by cause, consistent with the triggers") {
    // sick > 1 exactly when one of the two triggers fires
    assert(sickScore(4.7, 0.0, 24, 6.9) > 1.0)   // the live steal firing
    assert(sickScore(0.1, 127.0 * 24 / 8, 24, 41.7) > 1.0) // r10 storm shape
    assert(sickScore(0.06, 0.0, 24, 5.7) < 1.0)  // clean record
    assert(sickScore(1.9, 40.0, 24, 40.0) < 1.0) // both just under
    // a steal-soaked lucky-fast pass ranks WORSE than a clean slower
    // one — publication is outcome-blind
    assert(sickScore(6.0, 0.0, 24, 4.0) > sickScore(0.1, 0.0, 24, 9.0))
    // monotone in each cause
    assert(sickScore(3.0, 0.0, 24, 10.0) < sickScore(5.0, 0.0, 24, 10.0))
    assert(sickScore(0.0, 50.0, 24, 10.0) < sickScore(0.0, 100.0, 24, 10.0))
  }
}
