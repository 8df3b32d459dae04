package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the SIGN axis of the float contract (SCALE.md): no gate-facing
  * float column may carry a negative zero, at either oracle scale
  * factor. The r14 forensic: DuckDB's `round` preserves the IEEE sign
  * bit of a tiny negative that rounds to zero (`-0.0`), Spark's
  * BigDecimal round cannot (`+0.0`); the two compare EQUAL under every
  * numeric check but hash as different bytes, so one such row (qBQ
  * label=8/dim=47 at sf0.01) held the gate red for two rounds. The
  * convention — [[graft.functions.GateRound]] Spark-side, `round(…)+0`
  * oracle-side — is enforced here on the Spark half (full-registry
  * sweep at both SFs) and by `tools/signzero.py` on the DuckDB half.
  */
class GateRoundSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark

  private def rawBits(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)

  test("GateRound normalizes -0.0 and is not optimized away on a real column") {
    import spark.implicits._
    val df = Seq(-1e-9, -0.0, 0.0, 1.5, -2.25, Double.NaN)
      .toDF("x")
      .select(graft.functions.GateRound(col("x"), 4).as("r"),
        graft.functions.GateRound.normZero(col("x")).as("n"))
    val rows = df.collect()
    // round(-1e-9, 4), round(-0.0, 4), round(0.0, 4) must all be +0.0 BITS
    rows.take(3).foreach { r =>
      assert(rawBits(r.getDouble(0)) == rawBits(0.0),
        s"GateRound left a sign bit: ${r.getDouble(0)}")
    }
    // normZero: -0.0 + 0.0 = +0.0 bitwise; non-zero values untouched
    assert(rawBits(rows(1).getDouble(1)) == rawBits(0.0))
    assert(rows(3).getDouble(0) == 1.5 && rows(3).getDouble(1) == 1.5)
    assert(rows(4).getDouble(0) == -2.25 && rows(4).getDouble(1) == -2.25)
    assert(rows(5).getDouble(1).isNaN) // NaN propagates, no exception
    // null propagates (a +0.0 here would invent data)
    val nr = Seq[Option[Double]](None).toDF("x")
      .select(graft.functions.GateRound(col("x"), 4)).head()
    assert(nr.isNullAt(0))
  }

  test("SignZero detects -0.0 and nothing else") {
    import spark.implicits._
    val df = Seq((-0.0, 1.0), (0.0, -0.0), (Double.NaN, 2.0))
      .toDF("a", "b")
    assert(SignZero.negZeroCounts(df) == Map("a" -> 1L, "b" -> 1L))
    val clean = Seq((0.0, 1.0), (Double.NaN, -3.5)).toDF("a", "b")
    assert(SignZero.negZeroCounts(clean).isEmpty)
  }

  private def sweep(sfDir: String): Unit = {
    val dirty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val nz = SignZero.negZeroCounts(fn(spark, sfDir))
        if (nz.nonEmpty) Some(s"$name -> $nz") else None
    }
    assert(dirty.isEmpty,
      s"negative zero in gate output at $sfDir (gateRound the " +
        s"projection, SCALE.md sign axis): ${dirty.mkString("; ")}")
  }

  // Both oracle scale factors: the latent class only manifests when the
  // data lands a tiny negative on a rounding boundary, and which query
  // gets hit is a function of SF (qBQ at sf0.01; qB8 only at sf0.1).
  test("no gate query emits a negative zero at sf0.01") {
    sweep("/root/testdata/sf0.01")
  }

  test("no gate query emits a negative zero at sf0.1") {
    sweep("/root/testdata/sf0.1")
  }
}
