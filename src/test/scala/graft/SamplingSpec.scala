package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark

  private lazy val docs =
    Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("lang"))

  test("exact per-stratum quota, deterministic across runs and partitionings") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.stratifiedSample(df, Seq("lang"), "doc_id", 10)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val a = run(docs)
    val b = run(docs.repartition(13)) // partitioning must not matter
    assert(a == b)
    val perLang = a.groupBy(_._2).view.mapValues(_.size).toMap
    val strataSizes = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    strataSizes.foreach { case (lang, sz) =>
      assert(perLang.getOrElse(lang, 0) == math.min(10L, sz).toInt, lang)
    }
  }

  test("null keys rank deterministically (marker, not concat_ws skip)") {
    import spark.implicits._
    val df = Seq((Some(1L), "a"), (None: Option[Long], "a"), (Some(2L), "a"),
      (Some(3L), "a")).toDF("k", "g")
    val out = Sampling.stratifiedSample(df, Seq("g"), "k", 2)
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSet
    val again = Sampling.stratifiedSample(df.repartition(7), Seq("g"), "k", 2)
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSet
    assert(out == again && out.size == 2)
  }

  test("different salts draw different (but individually stable) samples") {
    def run(salt: String) =
      Sampling.stratifiedSample(docs, Seq("lang"), "doc_id", 10, salt)
        .collect().map(_.getLong(0)).toSet
    val s0 = run("s0"); val s1 = run("s1")
    assert(s0 != s1)        // independent resample
    assert(run("s1") == s1) // stable per salt
  }

  private lazy val weighted =
    Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("n_chars"))

  test("weighted priority sample: deterministic, k rows, weight-biased") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.weightedPrioritySample(df, "doc_id", "n_chars", 100)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = run(weighted)
    assert(a == run(weighted.repartition(11)))
    assert(a.size == 100)
    // heavier docs must be overrepresented: sampled mean weight above
    // the corpus mean (priority sampling inclusion ∝ weight)
    val corpusMean = weighted.agg(avg("n_chars")).head.getDouble(0)
    val sampleMean = a.toSeq.map(_._2).sum.toDouble / a.size
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean vs corpus mean $corpusMean")
  }

  test("token budget mix: two-phase prefix sum ≡ window cumsum, caps hold") {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("source"),
        graft.operators.TextAnalysis.tokenCount(col("text")).cast("long")
          .as("n_tokens"))
    val got = Sampling.tokenBudgetMix(d, "doc_id", "source", "n_tokens", 500L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    // reference: the straightforward (single-task-per-source) window
    val w = Window.partitionBy("source")
      .orderBy(Sampling.rankKey(Seq(col("doc_id")), "s0"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = d.withColumn("cum_n_tokens", sum("n_tokens").over(w))
      .filter(col("cum_n_tokens") <= 500L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == want)
    assert(got.groupBy(_._2).values.forall(_.map(_._3).sum <= 500L))
    // partition-count independence of the distributed prefix sum
    val again = Sampling.tokenBudgetMix(d.repartition(7), "doc_id", "source",
      "n_tokens", 500L, partitions = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(again == got)
  }

  test("mix to target: kept token mass tracks the requested mixture") {
    val d = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("source"),
        graft.operators.TextAnalysis.tokenCount(col("text")).cast("long")
          .as("n_tokens"))
    val targets = d.select(col("source")).distinct()
      .withColumn("target", expr("cast(substring(source, 4) as double) + 1.0"))
    val kept = Sampling.mixToTarget(d, "doc_id", "source", "n_tokens", targets)
    val keptBySrc = kept.groupBy("source").agg(sum("n_tokens").as("kept"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // expected mass per source: f_s · T*, T* = min_s tokens_s / f_s
    val totals = d.groupBy("source").agg(sum("n_tokens"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def f(s: String) = s.drop(3).toDouble + 1.0
    val tstar = totals.map { case (s, t) => t / f(s) }.min
    // per-source binomial noise is huge at 25 docs/stratum (the EXACT
    // draw is pinned by the q9U oracle), so assert distributional
    // properties: total kept mass on target…
    val wantTotal = totals.keys.map(f(_) * tstar).sum
    val gotTotal = keptBySrc.values.sum.toDouble
    assert(math.abs(gotTotal - wantTotal) / wantTotal < 0.1,
      s"total kept $gotTotal want $wantTotal")
    // …the rate-1 (argmin) source kept in full…
    val argmin = totals.minBy { case (s, t) => t / f(s) }._1
    assert(keptBySrc(argmin) == totals(argmin))
    // …and kept mass tracks the target ordering: the top-target half
    // must keep strictly more than the bottom half
    val ranked = totals.keys.toSeq.sortBy(f)
    val (lo, hi) = ranked.splitAt(ranked.size / 2)
    assert(hi.map(keptBySrc.getOrElse(_, 0L)).sum >
      lo.map(keptBySrc.getOrElse(_, 0L)).sum)
    // determinism across partitionings
    val a = kept.collect().map(_.getAs[Long]("doc_id")).toSet
    val b = Sampling.mixToTarget(d.repartition(9), "doc_id", "source",
      "n_tokens", targets).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(a == b)
  }

  test("mix to target: degenerate sources/targets cannot corrupt T*") {
    import spark.implicits._
    val d = Seq(
      (1L, "web", 100L), (2L, "web", 100L), (3L, "web", 100L),
      (4L, "books", 100L), (5L, "books", 100L),
      (6L, "empty", 0L),          // zero-weight source: tokens_s = 0
      (7L, "neg", -50L)           // negative-weight source
    ).toDF("doc_id", "source", "n_tokens")
    val targets = Seq(
      ("web", 1.0), ("books", 1.0),
      ("empty", 1.0), ("neg", 1.0),
      ("zeroed", 0.0),            // explicit 0% target
      ("negT", -2.0)              // nonsense negative target
    ).toDF("source", "target")
    val kept = Sampling.mixToTarget(d, "doc_id", "source", "n_tokens", targets)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source"))
    // without the guards tstar = min(..., 0/1, -50/1) ≤ 0 and EVERY
    // row would be dropped; with them web+books mix 1:1 ⇒ T* = 200·2,
    // books (the argmin) kept in full
    assert(kept.nonEmpty)
    assert(kept.count(_._2 == "books") === 2)
    assert(kept.forall { case (_, s) => s == "web" || s == "books" })
    // a target table that is ALL non-positive keeps nothing (no crash)
    val none = Sampling.mixToTarget(d, "doc_id", "source", "n_tokens",
      Seq(("web", 0.0)).toDF("source", "target"))
    assert(none.count() === 0L)
  }

  test("temperatureMix: tau flattens the mixture, budget>=total keeps all") {
    import spark.implicits._
    // a skewed corpus: "web" has 50x the token mass of "books"
    val d = ((0 until 500).map(i => (i.toLong, "web", 100L)) ++
      (500 until 510).map(i => (i.toLong, "books", 100L)))
      .toDF("doc_id", "source", "n_tokens")
    val total = 510 * 100.0
    // tau = 1, budget = total mass: every threshold is exactly rate 1
    // (p_s = n_s/total, t_s = n_s) and the <= draw keeps EVERYTHING
    val all = Sampling.temperatureMix(d, "doc_id", "source", "n_tokens",
      tau = 1.0, budget = total)
    assert(all.count() === 510L)
    def keptMass(tau: Double): Map[String, Long] =
      Sampling.temperatureMix(d, "doc_id", "source", "n_tokens",
          tau, budget = 10000.0)
        .groupBy("source").agg(sum("n_tokens").as("m"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // tau = 0 equalizes target mass (5000 each): books (1000 total)
    // caps at its full mass, web keeps ~5000 of 50000
    val flat = keptMass(0.0)
    assert(flat("books") === 1000L, "capped source must keep everything")
    assert(flat("web") >= 3500L && flat("web") <= 6500L,
      s"tau=0 web mass ${flat("web")} far from the 5000 target")
    // tau = 1 keeps the natural 50:1 ratio of the budget
    val nat = keptMass(1.0)
    val rNat = nat("web").toDouble / math.max(1L, nat.getOrElse("books", 0L))
    val rFlat = flat("web").toDouble / flat("books")
    assert(rNat > 3 * rFlat,
      s"tau=1 ratio $rNat should be far above tau=0 ratio $rFlat")
    // deterministic; salt redraws
    val a = Sampling.temperatureMix(d, "doc_id", "source", "n_tokens",
      0.5, 10000.0).collect().map(_.getLong(1)).toSet
    val b = Sampling.temperatureMix(d.repartition(7), "doc_id", "source",
      "n_tokens", 0.5, 10000.0).collect().map(_.getLong(1)).toSet
    assert(a == b, "partitioning must not change the draw")
    val c = Sampling.temperatureMix(d, "doc_id", "source", "n_tokens",
      0.5, 10000.0, salt = "s1").collect().map(_.getLong(1)).toSet
    assert(c != a, "salt must redraw")
  }

  test("temperatureMix waterFill: capped surplus is redistributed exactly") {
    import spark.implicits._
    val d = ((0 until 500).map(i => (i.toLong, "web", 100L)) ++
      (500 until 510).map(i => (i.toLong, "books", 100L)))
      .toDF("doc_id", "source", "n_tokens")
    def mass(waterFill: Boolean): Map[String, Long] =
      Sampling.temperatureMix(d, "doc_id", "source", "n_tokens",
          tau = 0.0, budget = 10000.0, waterFill = waterFill)
        .groupBy("source").agg(sum("n_tokens").as("m"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // tau = 0, budget 10000 over (web 50000, books 1000): the single
    // pass strands books' 4000 surplus (targets 5000 each, books caps
    // at 1000); water-filling hands it to web — expected web mass 9000
    // vs 5000, a gap far beyond the binomial draw noise (sd ~ 900)
    val single = mass(waterFill = false)
    val filled = mass(waterFill = true)
    assert(single("books") === 1000L && filled("books") === 1000L)
    assert(filled("web") - single("web") >= 2000L,
      s"surplus not redistributed: single ${single("web")} filled ${filled("web")}")
    assert(math.abs(filled("web") - 9000L) <= 2500L,
      s"water-filled web mass ${filled("web")} far from the 9000 target")
    // nothing caps at a small budget: both variants compute the same
    // rates and the same deterministic draw
    val a = Sampling.temperatureMix(d, "doc_id", "source", "n_tokens",
      0.0, 1000.0).collect().map(_.getLong(1)).toSet
    val b = Sampling.temperatureMix(d, "doc_id", "source", "n_tokens",
      0.0, 1000.0, waterFill = true).collect().map(_.getLong(1)).toSet
    assert(a == b, "uncapped water-fill must equal the single pass")
    // budget >= total keeps everything in both variants
    assert(Sampling.temperatureMix(d, "doc_id", "source", "n_tokens",
      1.0, 51000.0, waterFill = true).count() === 510L)
    // a NON-STRING source column takes the water-fill branch too —
    // the rates join back by string form while the threshold table
    // keeps the source's original type (round-13 advice: getString
    // threw only in this branch)
    val ints = d.withColumn("source",
      when(col("source") === "web", 1).otherwise(2))
    val intFilled = Sampling.temperatureMix(ints, "doc_id", "source",
        "n_tokens", tau = 0.0, budget = 10000.0, waterFill = true)
      .groupBy("source").agg(sum("n_tokens").as("m"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(intFilled(2) === 1000L &&
      intFilled(1) === filled("web"),
      s"int-typed source diverged from the string run: $intFilled")
    // a TIMESTAMP source column is where the two string renderings
    // genuinely diverge (r14 advice): driver-side Timestamp.toString
    // gives '… 00:00:00.0' while Spark's cast('string') gives
    // '… 00:00:00' — the pre-fix driver-rendered keys matched NO
    // Spark-cast key, the threshold table silently emptied, and every
    // document of the source vanished without an error. Both sides
    // now use Spark's rendering: budget >= total must keep all rows.
    val ts = d.withColumn("source",
      when(col("source") === "web",
        to_timestamp(lit("2024-01-01 00:00:00")))
        .otherwise(to_timestamp(lit("2024-02-01 00:00:00"))))
    assert(Sampling.temperatureMix(ts, "doc_id", "source", "n_tokens",
      1.0, 51000.0, waterFill = true).count() === 510L,
      "timestamp-typed source dropped rows: the rates join key " +
        "renderings disagree")
  }
}
