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
}
