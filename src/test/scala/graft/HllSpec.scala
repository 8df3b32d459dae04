package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketches.hllExact — the engine-replayable HyperLogLog: sequential
  * md5 replica equality, accuracy on known cardinalities, duplicate /
  * partition invariance, branch coverage, refusals. */
class HllSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  /** Pure-Scala replica of the draw + estimate contract (the same
    * math the DuckDB oracle replays). */
  private def replica(values: Seq[String], p: Int, salt: String)
      : (Long, Long, Long, Double, Double, Boolean) = {
    val m = 1 << p
    val md = java.security.MessageDigest.getInstance("MD5")
    val reg = new Array[Int](m)
    values.foreach { v =>
      val hex = md.digest(s"$v $salt".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val j = Integer.parseInt(hex.substring(0, p / 4), 16)
      val st = hex.substring(p / 4, p / 4 + 10).dropWhile(_ == '0')
      val rho =
        if (st.isEmpty) 41
        else {
          val v1 = Integer.parseInt(st.substring(0, 1), 16)
          val cz = if (v1 >= 8) 0 else if (v1 >= 4) 1 else if (v1 >= 2) 2 else 3
          4 * (10 - st.length) + cz + 1
        }
      if (rho > reg(j)) reg(j) = rho
    }
    val nHit = reg.count(_ > 0).toLong
    val vEmpty = m - nHit
    val s41 = reg.filter(_ > 0).map(r => 1L << (41 - r)).sum +
      vEmpty * 2199023255552L
    val estRaw = Sketches.alphaM2(m) / s41.toDouble
    val small = estRaw <= 2.5 * m && vEmpty > 0
    val est =
      if (small) {
        val qln = math.floor(
          math.log(m.toDouble / vEmpty.toDouble) * 1e9 + 0.5).toLong
        (m * qln).toDouble / 1e9
      } else estRaw
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (nHit, vEmpty, s41, r6(estRaw), r6(est), small)
  }

  test("hllExact equals the sequential md5 replica at every column") {
    // non-ASCII values pin the UTF-8 digest contract (Spark md5 and
    // DuckDB md5 both hash the UTF-8 bytes; so does the replica)
    val vals = (0 until 3000).map(i => s"tok$i") ++
      (0 until 500).map(i => s"tok$i") ++ // duplicates
      Seq("héllo wörld", "世界 你好", "données 🚀", "ёжик")
    val df = vals.map(("g1", _)).toDF("g", "v")
    Seq(8, 12).foreach { p =>
      val r = Sketches.hllExact(df, "g", "v", p = p).collect()
      assert(r.length == 1)
      val row = r.head
      val (nHit, vEmpty, s41, estRaw, est, small) =
        replica(vals.map(identity), p, "s0")
      assert(row.getLong(1) == (1L << p).toLong, "m_registers")
      assert(row.getLong(2) == nHit, s"p=$p n_hit")
      assert(row.getLong(3) == vEmpty, s"p=$p v_empty")
      assert(row.getLong(4) == s41, s"p=$p s41")
      assert(row.getDouble(5) == estRaw, s"p=$p est_raw")
      assert(row.getDouble(6) == est, s"p=$p estimate")
      assert(row.getBoolean(7) == small, s"p=$p small_range")
    }
  }

  test("accuracy: 20k distinct within 5%; duplicates and partitioning " +
      "cannot move the sketch") {
    val df = (0 until 20000).map(i => ("g", s"v$i")).toDF("g", "v")
    val r = Sketches.hllExact(df, "g", "v", p = 12).collect().head
    val est = r.getDouble(6)
    assert(math.abs(est - 20000.0) / 20000.0 < 0.05, s"estimate $est")
    // duplicate-blind: the corpus unioned with itself is the same sketch
    val dup = Sketches.hllExact(df.union(df), "g", "v", p = 12)
      .collect().head
    assert(dup.toSeq == r.toSeq, "duplicates moved the sketch")
    // partition-order invariant (register maxima are order-free)
    val rep = Sketches.hllExact(df.repartition(17), "g", "v", p = 12)
      .collect().head
    assert(rep.toSeq == r.toSeq, "partitioning moved the sketch")
  }

  test("small-range branch: 100 distinct uses linear counting") {
    val df = (0 until 100).map(i => ("g", s"v$i")).toDF("g", "v")
    val r = Sketches.hllExact(df, "g", "v", p = 12).collect().head
    assert(r.getBoolean(7), "expected the small-range regime")
    assert(math.abs(r.getDouble(6) - 100.0) / 100.0 < 0.05,
      s"linear-counting estimate ${r.getDouble(6)}")
  }

  test("null groups and values are dropped; p is validated") {
    val df = Seq(("g", "a"), ("g", null), (null, "b"))
      .toDF("g", "v")
    val r = Sketches.hllExact(df, "g", "v", p = 4).collect()
    assert(r.length == 1 && r.head.getLong(2) == 1L,
      "exactly one register hit from the one usable row")
    val e = intercept[IllegalArgumentException] {
      Sketches.hllExact(df, "g", "v", p = 10)
    }
    assert(e.getMessage.contains("hex-char-aligned"), e.getMessage)
  }

  // ---- hdrQuantiles ----

  /** Pure-Scala replica of the bucket + rank walk. */
  private def hdrReplica(vals: Seq[Long], permilles: Seq[Int], k: Int)
      : Map[Int, (Long, Long)] = {
    val m = 1L << k
    def id(v: Long): Long =
      if (v < m) v
      else {
        val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
        (e - k + 1).toLong * m + (v >> (e - k)) - m
      }
    def rep(i: Long): Long =
      if (i < m) i else (m + (i % m)) << ((i / m).toInt - 1)
    val counts = vals.groupBy(id).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    val n = vals.size.toLong
    val cum = counts.scanLeft(0L)(_ + _._2).drop(1)
    permilles.map { p =>
      val rank = (n * p + 999) / 1000
      val idx = cum.indexWhere(_ >= rank)
      p -> ((n, rep(counts(idx)._1)))
    }.toMap
  }

  test("hdrQuantiles equals the sequential replica; one-sided bucket " +
      "bound holds against the true order statistic") {
    val rnd = new scala.util.Random(7)
    // mixed regimes: identity region, mid-range, heavy tail
    val vals = Seq.fill(3000)(rnd.nextInt(20).toLong) ++
      Seq.fill(3000)((100 + rnd.nextInt(100000)).toLong) ++
      Seq.fill(100)((1000000L + rnd.nextInt(1000000)).toLong)
    val ps = Seq(500, 900, 990, 999)
    val df = vals.map(("g", _)).toDF("g", "v")
    val got = Sketches.hdrQuantiles(df, "g", "v", ps, subBits = 5)
      .collect().map(r => r.getInt(1) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val exp = hdrReplica(vals, ps, 5)
    assert(got == exp, s"replica mismatch: $got vs $exp")
    val sorted = vals.sorted
    ps.foreach { p =>
      val rank = (vals.size.toLong * p + 999) / 1000
      val truth = sorted((rank - 1).toInt)
      val est = got(p)._2
      assert(est <= truth, s"p=$p est $est above truth $truth")
      assert(truth < math.max(est + 1, est + (est >> 5) + 1),
        s"p=$p truth $truth escapes est $est bucket")
    }
    // partition invariance (counts are order-free)
    val rep17 = Sketches.hdrQuantiles(df.repartition(17), "g", "v", ps)
      .collect().map(r => r.getInt(1) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(rep17 == got, "partitioning moved the sketch")
  }

  test("hllOverlap: merged registers ARE the union sketch; planted " +
      "overlap recovered; identical groups at jaccard 1.0") {
    val a = (0 until 1000).map(i => ("A", s"v$i"))
    val b = (500 until 1500).map(i => ("B", s"v$i"))
    val df = (a ++ b).toDF("g", "v")
    val r = Sketches.hllOverlap(df, "g", "v", p = 16).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getString(0) == "A" && row.getString(1) == "B")
    // ALGEBRAIC pin: the pair's union estimate equals hllExact over
    // the values relabeled into one group — merge-of-sketches is
    // sketch-of-the-union, exactly
    val unionEst = Sketches.hllExact(
        (a ++ b).map { case (_, v) => ("U", v) }.toDF("g", "v"),
        "g", "v", p = 16).collect().head.getDouble(6)
    assert(row.getDouble(4) == unionEst,
      s"union sketch ${row.getDouble(4)} != relabeled corpus $unionEst")
    // planted truth: |A|=1000, |B|=1000, inter=500, union=1500 — the
    // p=16 linear-counting regime is near-exact (sd ~ a few)
    assert(math.abs(row.getDouble(2) - 1000.0) < 25, s"est_a $row")
    assert(math.abs(row.getDouble(5) - 500.0) < 40, s"est_intersect $row")
    assert(math.abs(row.getDouble(6) - 0.3333) < 0.03, s"jaccard $row")
    // identical groups: registers equal, so union == each side and
    // jaccard is EXACTLY 1.0 (no tolerance needed)
    val same = ((0 until 200).map(i => ("X", s"w$i")) ++
      (0 until 200).map(i => ("Y", s"w$i"))).toDF("g", "v")
    val s1 = Sketches.hllOverlap(same, "g", "v", p = 16).collect().head
    assert(s1.getDouble(2) == s1.getDouble(4) &&
      s1.getDouble(5) == s1.getDouble(2) && s1.getDouble(6) == 1.0,
      s"identical groups: $s1")
    // near-disjoint groups: jaccard pinned at >= 0 by the clamp
    val disj = ((0 until 300).map(i => ("P", s"p$i")) ++
      (0 until 300).map(i => ("Q", s"q$i"))).toDF("g", "v")
    val d1 = Sketches.hllOverlap(disj, "g", "v", p = 16).collect().head
    assert(d1.getDouble(6) >= 0.0 && d1.getDouble(6) < 0.02,
      s"disjoint jaccard: $d1")
    // quadratic-guard refusal
    val many = (0 until 5).flatMap(g => Seq((s"g$g", "x")))
      .toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      Sketches.hllOverlap(many, "g", "v", p = 4, maxGroups = 4)
    }
    assert(e.getMessage.contains("quadratic"), e.getMessage)
  }

  test("hllOverlap inclusion-exclusion == the expanded per-pair union " +
      "spelling, bit-for-bit, disjoint pairs included") {
    import org.apache.spark.sql.functions._
    // 4 groups: heavy overlap (A,B), identical (A,C on a subset),
    // fully disjoint (D vs everyone) — the left-join coalesce-0 arm
    val df = ((0 until 400).map(i => ("A", s"v$i")) ++
      (200 until 600).map(i => ("B", s"v$i")) ++
      (0 until 150).map(i => ("C", s"v$i")) ++
      (10000 until 10300).map(i => ("D", s"v$i"))).toDF("g", "v")
    val got = Sketches.hllOverlap(df, "g", "v", p = 16).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6))).toMap
    // the pre-round-20 spelling: expand each pair's registers, take
    // register-wise max, aggregate the union sketch per pair
    val reg = Sketches.registers(df, "g", "v", 16, "s0")
    val m = 1 << 16
    val gs = reg.select(col("__g")).distinct()
    val perSrc = reg.groupBy(col("__g"))
      .agg(count(lit(1)).as("n_hit"),
        sum(expr("shiftleft(1L, 41 - __mj)")).as("__sp"))
      .select(col("__g"), Sketches.estimateCol(m).as("__est"))
    val pairs = gs.select(col("__g").as("__ga"))
      .crossJoin(gs.select(col("__g").as("__gb")))
      .filter(col("__ga") < col("__gb"))
    val expanded = pairs.join(reg, col("__ga") === col("__g"))
      .select(col("__ga"), col("__gb"), col("__j"), col("__mj"))
      .unionByName(pairs.join(reg, col("__gb") === col("__g"))
        .select(col("__ga"), col("__gb"), col("__j"), col("__mj")))
    val uni = expanded.groupBy(col("__ga"), col("__gb"), col("__j"))
      .agg(max(col("__mj")).as("__mj"))
      .groupBy(col("__ga"), col("__gb"))
      .agg(count(lit(1)).as("n_hit"),
        sum(expr("shiftleft(1L, 41 - __mj)")).as("__sp"))
      .select(col("__ga"), col("__gb"), Sketches.estimateCol(m).as("__estu"))
    val interC = col("__esta") + col("__estb") - col("__estu")
    val exp = uni
      .join(perSrc.toDF("__g1", "__esta"), col("__ga") === col("__g1"))
      .join(perSrc.toDF("__g2", "__estb"), col("__gb") === col("__g2"))
      .select(col("__ga"), col("__gb"), col("__esta"), col("__estb"),
        col("__estu"),
        graft.functions.GateRound(interC, 6).as("i"),
        graft.functions.GateRound(
          greatest(interC, lit(0.0)) / col("__estu"), 6).as("j"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6))).toMap
    assert(got.keySet == exp.keySet,
      s"pair sets differ: ${got.keySet} vs ${exp.keySet}")
    assert(got.size == 6) // all 4-choose-2 pairs, disjoint ones included
    got.foreach { case (k, g) =>
      val e = exp(k)
      def bits(d: Double) = java.lang.Double.doubleToRawLongBits(d)
      assert(bits(g._1) == bits(e._1) && bits(g._2) == bits(e._2) &&
        bits(g._3) == bits(e._3) && bits(g._4) == bits(e._4) &&
        bits(g._5) == bits(e._5), s"pair $k: $g vs $e")
    }
  }

  test("hdrQuantiles: identity region is exact; p=1000 is the max " +
      "bucket; refusals") {
    val df = (1L to 31L).map(("g", _)).toDF("g", "v")
    val r = Sketches.hdrQuantiles(df, "g", "v", Seq(500, 1000))
      .collect().map(x => x.getInt(1) -> x.getLong(3)).toMap
    assert(r(500) == 16L, s"exact median of 1..31 in identity region: $r")
    assert(r(1000) == 31L, s"max: $r")
    val neg = Seq(("g", -1L)).toDF("g", "v")
    val e = intercept[Exception] {
      Sketches.hdrQuantiles(neg, "g", "v", Seq(500)).collect()
    }
    assert(e.getMessage.contains("log-bucket domain"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Sketches.hdrQuantiles(df, "g", "v", Seq(0))
    }
    assert(e2.getMessage.contains("permilles"), e2.getMessage)
  }
}
