package graft

import graft.functions.HashExprs
import graft.operators.{Preference, Sampling}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins each fused md5-draw kernel bit-identical to the composable
  * hex-string chain it replaced — the r19 optimization contract: the
  * kernels may only ever be a faster spelling of the SAME draw. */
class HashExprsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  // ids exercising digit widths, negatives, and non-numeric strings;
  // enough rows that every czeros branch (first nonzero nibble in
  // each of the four ranges) and several leading-zero runs occur
  private def keys = ((0L to 400L) ++ Seq(-7L, 999999999999L))
    .map(_.toString) ++ Seq("a b", "", "null", "éclair")

  test("md5Prefix40 == conv(substring(md5, 1, 10), 16, 10)") {
    val df = keys.toDF("k")
    val composable = conv(substring(md5(col("k")), 1, 10), 16, 10)
      .cast("long")
    val rows = df.select(col("k"),
        composable.as("old"),
        HashExprs.md5_prefix40(col("k")).as("fused"))
      .collect()
    assert(rows.length == keys.length)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"mismatch for key ${r.getString(0)}")
    }
  }

  test("hllJRhoPacked == the drawFrame hex chain, every p") {
    for (p <- Seq(4, 8, 12, 16)) {
      val df = keys.toDF("k")
      val hx = md5(concat_ws(" ", col("k"), lit("s0")))
      val st = ltrim(substring(hx, p / 4 + 1, 10), "0")
      val v1 = conv(substring(st, 1, 1), 16, 10).cast("int")
      val czeros = when(v1 >= 8, lit(0)).when(v1 >= 4, lit(1))
        .when(v1 >= 2, lit(2)).otherwise(lit(3))
      val oldJ = conv(substring(hx, 1, p / 4), 16, 10).cast("long")
      val oldRho = when(length(st) === 0, lit(41))
        .otherwise(lit(4) * (lit(10) - length(st)) + czeros + lit(1))
        .cast("int")
      val packed = HashExprs.hll_jrho_packed(
        concat_ws(" ", col("k"), lit("s0")), p)
      val rows = df.select(col("k"), oldJ.as("oj"), oldRho.as("or"),
          shiftright(packed, 6).as("nj"),
          packed.bitwiseAND(lit(63L)).cast("int").as("nr"))
        .collect()
      rows.foreach { r =>
        assert(r.getLong(1) == r.getLong(3),
          s"j mismatch p=$p key=${r.getString(0)}")
        assert(r.getInt(2) == r.getInt(4),
          s"rho mismatch p=$p key=${r.getString(0)}")
      }
      // the fixture must actually exercise leading-zero nibbles
      // (z >= 1), or the rho loop's zero-run branch went untested
      assert(rows.exists(_.getInt(2) > 5), s"no z>=1 case at p=$p")
    }
  }

  test("poissonResamples == explode + hash40 threshold chain") {
    val b = 23
    val ids = Seq(0L, 1L, 17L, 123L, 4567L, -3L)
    val base = ids.toDF("id")
    val oldU = Sampling.hash40(Seq(col("id"), col("__r")), "s0")
    val oldW = Preference.PoissonThresholds40.zipWithIndex
      .foldLeft(when(lit(false), lit(0L))) { case (acc, (t, k)) =>
        acc.when(oldU < t, k.toLong)
      }.otherwise(8L)
    val old = base
      .select(col("id"), explode(sequence(lit(-1), lit(b - 1))).as("__r"))
      .select(col("id"), col("__r"),
        when(col("__r") === -1, lit(1L)).otherwise(oldW).as("w"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val fused = base
      .select(col("id"), explode(HashExprs.poisson_resamples(
        col("id").cast("string"), "s0", b,
        Preference.PoissonThresholds40)).as("__rw"))
      .select(col("id"), (shiftright(col("__rw"), 4) - 2).cast("int").as("__r"),
        col("__rw").bitwiseAND(lit(15L)).as("w"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(fused == old)
    // weights must not be degenerate (all drawn the same)
    assert(fused.map(_._3).size >= 3, s"degenerate weights: $fused")
  }

  test("signResamples == explode + hash40 parity chain") {
    val p = 31
    val ids = Seq(0L, 1L, 17L, 123L, 4567L, -3L)
    val base = ids.toDF("id")
    val oldU = Sampling.hash40(Seq(col("id"), col("__r")), "s0")
    val old = base
      .select(col("id"), explode(sequence(lit(-1), lit(p - 1))).as("__r"))
      .select(col("id"), col("__r"),
        when(col("__r") === -1, lit(1L))
          .otherwise(lit(1L) - lit(2L) * (oldU % 2)).as("sign"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val fused = base
      .select(col("id"), explode(HashExprs.sign_resamples(
        col("id").cast("string"), "s0", p)).as("__rs"))
      .select(col("id"), (shiftright(col("__rs"), 1) - 2).cast("int").as("__r"),
        (lit(1L) - lit(2L) * col("__rs").bitwiseAND(lit(1L))).as("sign"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(fused == old)
    assert(fused.map(_._3) == Set(1L, -1L), "both signs must occur")
  }
}
