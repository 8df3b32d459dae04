package graft

import graft.operators.Quantiles
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Distributed-selection exact quantiles vs Spark's exact `percentile`. */
class QuantilesSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark

  private def check(data: Seq[(String, java.lang.Double)], qs: Seq[Double],
                    nBuckets: Int = 64): Unit = {
    import spark.implicits._
    val df = data.toDF("g", "v")
    val ours = Quantiles.exactQuantiles(df, "g", "v",
        qs.zipWithIndex.map { case (q, i) => q -> s"q$i" }, nBuckets)
      .orderBy("g").collect()
    val ref = df.groupBy("g")
      .agg(qs.zipWithIndex.map { case (q, i) =>
          expr(s"percentile(v, $q)").as(s"q$i") }.head,
        qs.zipWithIndex.drop(1).map { case (q, i) =>
          expr(s"percentile(v, $q)").as(s"q$i") }: _*)
      .filter(col("q0").isNotNull) // all-null groups are omitted by ours
      .orderBy("g").collect()
    assert(ours.length == ref.length)
    ours.zip(ref).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      qs.indices.foreach { i =>
        val (x, y) = (a.getDouble(i + 1), b.getDouble(i + 1))
        assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(y)),
          s"group ${a.getString(0)} q=${qs(i)}: $x vs $y")
      }
    }
  }

  test("random data, several groups, interpolated ranks") {
    val rnd = new scala.util.Random(7)
    val data = for (_ <- 1 to 5000) yield
      (s"g${rnd.nextInt(4)}", java.lang.Double.valueOf(rnd.nextGaussian() * 100))
    check(data.toSeq, Seq(0.0, 0.1, 0.5, 0.9, 0.99, 1.0))
  }

  test("heavy ties across bucket boundaries") {
    val rnd = new scala.util.Random(11)
    val data = for (_ <- 1 to 3000) yield
      (s"g${rnd.nextInt(2)}", java.lang.Double.valueOf(rnd.nextInt(7).toDouble))
    check(data.toSeq, Seq(0.25, 0.5, 0.75), nBuckets = 4)
  }

  test("edge cases: single row, two rows, all-equal, nulls ignored") {
    check(Seq(("a", java.lang.Double.valueOf(3.5))), Seq(0.5, 0.9))
    check(Seq(("a", java.lang.Double.valueOf(1.0)),
              ("a", java.lang.Double.valueOf(2.0))), Seq(0.5, 0.9))
    check(Seq.fill(100)(("a", java.lang.Double.valueOf(42.0))), Seq(0.1, 0.5))
    check(Seq(("a", java.lang.Double.valueOf(1.0)), ("a", null),
              ("a", java.lang.Double.valueOf(5.0)), ("b", null)), Seq(0.5))
  }

  test("null group key is a group; empty input keeps the declared schema") {
    import spark.implicits._
    val df = Seq((null.asInstanceOf[String], java.lang.Double.valueOf(1.0)),
      (null.asInstanceOf[String], java.lang.Double.valueOf(3.0)),
      ("a", java.lang.Double.valueOf(5.0))).toDF("g", "v")
    val out = Quantiles.exactQuantiles(df, "g", "v", Seq(0.5 -> "med"))
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    assert(out == Map(None -> 2.0, Some("a") -> 5.0))
    val empty = Quantiles.exactQuantiles(
      Seq.empty[(String, java.lang.Double)].toDF("g", "v"), "g", "v",
      Seq(0.5 -> "med", 0.9 -> "p90"))
    assert(empty.columns.toSeq == Seq("g", "med", "p90") && empty.isEmpty)
  }

  test("q38-shaped: matches the ObjectHashAggregate formulation on lineitem") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val ours = Quantiles.exactQuantiles(li, "l_returnflag", "l_extendedprice",
        Seq(0.5 -> "med", 0.9 -> "p90"))
      .select(col("l_returnflag"), round(col("med"), 4).as("med"),
              round(col("p90"), 4).as("p90"))
      .orderBy("l_returnflag").collect()
    val ref = li.groupBy("l_returnflag")
      .agg(round(median(col("l_extendedprice")), 4).as("med"),
           round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90"))
      .orderBy("l_returnflag").collect()
    assert(ours.toSeq.map(_.toSeq) == ref.toSeq.map(_.toSeq))
  }

  test("selection plan: no ObjectHashAggregate, only hash aggregates") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val df = Quantiles.exactQuantiles(li, "l_returnflag", "l_extendedprice",
      Seq(0.5 -> "med"))
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("ObjectHashAggregate"), physical)
  }

  private def conf(df: org.apache.spark.sql.DataFrame, alpha: Int) =
    Quantiles.conformalQuantile(df, "g", "s", "i", alpha)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4))))
      .toMap

  test("conformalQuantile: exact order-statistic rank by hand") {
    import spark.implicits._
    val nine = (1L to 9L).map(i => ("a", i, i)) ++
      (1L to 4L).map(i => ("b", i, i))
    val df = nine.toDF("g", "s", "i")
    val m = conf(df, 10)
    // n=9, alpha=10%: k = ceil(10*0.9) = 9 -> the 9th smallest (max)
    assert(m("a") == ((9L, 9L, Some(9L), true)), m("a").toString)
    // n=4 cannot support 90% coverage: k=5 > n -> undefined, visible
    assert(m("b") == ((4L, 5L, None, false)), m("b").toString)
    // alpha=50 on n=3: k = ceil(4*0.5) = 2 -> 2nd smallest
    val three = Seq(("c", 30L, 1L), ("c", 10L, 2L), ("c", 20L, 3L))
      .toDF("g", "s", "i")
    assert(conf(three, 50)("c") == ((3L, 2L, Some(20L), true)))
    // tied scores: the picked VALUE is tie-invariant
    val tied = Seq(("d", 5L, 1L), ("d", 5L, 2L), ("d", 1L, 3L))
      .toDF("g", "s", "i")
    assert(conf(tied, 50)("d") == ((3L, 2L, Some(5L), true)))
  }

  test("conformalQuantile: domain refusals") {
    import spark.implicits._
    val df = Seq(("a", 1L, 1L)).toDF("g", "s", "i")
    intercept[IllegalArgumentException] {
      Quantiles.conformalQuantile(df, "g", "s", "i", 0)
    }
    intercept[IllegalArgumentException] {
      Quantiles.conformalQuantile(df, "g", "s", "i", 100)
    }
    val flt = Seq(("a", 1.5, 1L)).toDF("g", "s", "i")
    intercept[IllegalArgumentException] {
      Quantiles.conformalQuantile(flt, "g", "s", "i", 10)
    }
  }

  test("trimmedMean: trim, winsorize, and the tail's leverage by hand") {
    import spark.implicits._
    // [1,2,3,4,100] at 20%: k=1, kept [2,3,4] -> trimmed 3.0; the
    // winsorized mean clamps the tails to [2,4]: (9+2+4)/5 = 3.0;
    // the plain mean 22.0 shows the outlier's leverage
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), ("a", 100L))
      .toDF("g", "s")
    val r = Quantiles.trimmedMean(df, "g", "s", trimPct = 20).head()
    assert((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
      r.getDouble(5), r.getBoolean(6)) == ((5L, 1L, 22.0, 3.0, 3.0, true)),
      r.toString)
    // trimPct 0 degenerates to the plain mean on all three outputs
    val r0 = Quantiles.trimmedMean(df, "g", "s", trimPct = 0).head()
    assert(r0.getDouble(3) == 22.0 && r0.getDouble(4) == 22.0 &&
      r0.getDouble(5) == 22.0)
    intercept[IllegalArgumentException] {
      Quantiles.trimmedMean(df, "g", "s", trimPct = 50)
    }
    intercept[IllegalArgumentException] {
      Quantiles.trimmedMean(Seq(("a", 1.5)).toDF("g", "s"), "g", "s", 10)
    }
  }

  test("medianMad: exact doubled order statistics by hand") {
    import spark.implicits._
    val df = Seq(
      // odd: median 3, deviations [2,1,0,1,7] -> MAD 1
      ("o", 1L), ("o", 2L), ("o", 3L), ("o", 4L), ("o", 10L),
      // even: median 2.5, deviations [1.5,.5,.5,7.5] -> MAD 1.0
      ("e", 1L), ("e", 2L), ("e", 3L), ("e", 10L),
      // singleton: median = the value, MAD 0
      ("s", 7L)
    ).toDF("g", "s")
    val m = Quantiles.medianMad(df, "g", "s")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    assert(m("o") == ((5L, 3.0, 1.0)), m("o").toString)
    assert(m("e") == ((4L, 2.5, 1.0)), m("e").toString)
    assert(m("s") == ((1L, 7.0, 0.0)), m("s").toString)
    intercept[IllegalArgumentException] {
      Quantiles.medianMad(Seq(("a", 1.5)).toDF("g", "s"), "g", "s")
    }
  }

  test("gini: equality, max concentration, and refusals by hand") {
    import spark.implicits._
    val df = Seq(
      // uniform mass -> G = 0 exactly
      ("u", 1L), ("u", 1L), ("u", 1L), ("u", 1L),
      // all mass on one row of four -> G = (n-1)/n = 0.75
      ("c", 0L), ("c", 0L), ("c", 0L), ("c", 4L),
      // zero total mass: undefined, visible
      ("z", 0L), ("z", 0L)
    ).toDF("g", "w")
    val out = Quantiles.gini(df, "g", "w")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out("u") == ((4L, 4L, 0.0, true)), out("u").toString)
    assert(out("c") == ((4L, 4L, 0.75, true)), out("c").toString)
    assert(out("z") == ((2L, 0L, 0.0, false)), out("z").toString)
    intercept[Exception] {
      Quantiles.gini(Seq(("a", -1L)).toDF("g", "w"), "g", "w").collect()
    }
    intercept[IllegalArgumentException] {
      Quantiles.gini(Seq(("a", 1.5)).toDF("g", "w"), "g", "w")
    }
  }

  test("massCoverage: head sizes at integer thresholds by hand") {
    import spark.implicits._
    // weights desc [50, 30, 10, 10]: cum [50, 80, 90, 100] of 100 —
    // k50 = 1 (50 >= 50 exactly, the integer-compare edge),
    // k90 = 3, k99 = 4
    val df = Seq(("a", 10L), ("a", 50L), ("a", 30L), ("a", 10L),
      ("z", 0L), ("z", 0L)).toDF("g", "w")
    val out = Quantiles.massCoverage(df, "g", "w")
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1).toVector)
      .toMap
    assert(out("a") == Vector(4L, 100L, 1L, 0.5, 3L, 0.9, 4L, 1.0, true),
      out("a").toString)
    // zero mass: ks null, shares 0, undefined — never a phantom head
    assert(out("z") == Vector(2L, 0L, null, 0.0, null, 0.0, null, 0.0,
      false), out("z").toString)
    intercept[Exception] {
      Quantiles.massCoverage(Seq(("a", -1L)).toDF("g", "w"), "g", "w")
        .collect()
    }
    intercept[IllegalArgumentException] {
      Quantiles.massCoverage(df, "g", "w", pcts = Seq(0))
    }
  }
}
