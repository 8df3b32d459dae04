package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew mitigation for hot join keys: salting.
 *
 * A join whose key distribution is heavy-tailed (one user, one
 * session, one null-ish default key holding 10% of 100 TB) puts a
 * whole shuffle partition on one task. AQE's skew-join split handles
 * many cases at runtime; salting is the explicit, planner-independent
 * fix: the large side's key gains a deterministic salt in [0, n), the
 * small side is replicated n ways, and the shuffle fans the hot key
 * across n tasks.
 *
 * The salt is derived by hashing stable row columns — deterministic
 * (re-runs produce identical plans/results), unlike rand()-based
 * salting which breaks retried-task idempotence.
 */
object Skew {

  /** Deterministic salt in [0, n) from stable discriminator columns. */
  def salt(n: Int, discriminators: Column*): Column =
    pmod(hash(discriminators: _*), lit(n))

  /**
   * Equi-join `large ⋈ small` on `key`, fanning each large-side key
   * across `n` salted sub-keys. Produces the same rows as
   * `large.join(small, keys, "inner"|"left")`.
   */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 n: Int, joinType: String = "inner",
                 discriminators: Seq[String] = Nil): DataFrame = {
    val disc = if (discriminators.nonEmpty) discriminators.map(large(_))
      else large.columns.map(large(_)).toSeq
    val l = large.withColumn("__salt", salt(n, disc: _*))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    l.join(s, keys :+ "__salt", joinType).drop("__salt")
  }
}
