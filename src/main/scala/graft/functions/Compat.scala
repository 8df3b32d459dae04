package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal, Multiply, UnixMicros}
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StringType, TimestampType}

/**
 * Reference-dialect compat functions.
 *
 * `epoch_ns(ts)` — int64 epoch-ns of a timestamp — is the function the
 * reference rewrites all time literals through so they compare against
 * its int64-ns `time` column (/root/reference/querier/queryClient.go:314,
 * :849-850). Registered as a pure Catalyst expression tree
 * (unix_micros(cast(x as timestamp)) * 1000) — constant-folded by the
 * optimizer when the argument is a literal, so `time >= epoch_ns('…')`
 * becomes a plain long comparison with full predicate pushdown.
 *
 * `version()` is Spark's builtin — nothing to add.
 *
 * The graft text/dedup kernels are registered as SQL functions too, so
 * the HTTP `/query` surface (and any plain `spark.sql`) can run the
 * pipeline primitives without the Scala API:
 * `token_grams(text, w, overlapping)`, `shingle_hashes(text, w[, mask])`,
 * `simhash64(tokens_array)`, `nfc_normalize(text)`,
 * `repetition_stats(text)`, `deflate_stats(text)`,
 * `multi_phrase_hits(text, phrase, ...)`.
 */
object Compat {
  private def epochNs(args: Seq[Expression]): Expression = {
    val ts = args.head match {
      case e if e.dataType == TimestampType => e
      case e => Cast(e, TimestampType)
    }
    Multiply(Cast(UnixMicros(ts), LongType), Literal(1000L))
  }

  private def litInt(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: expected an integer literal, got $other")
  }

  private def litBool(e: Expression, fn: String): Boolean = e match {
    case Literal(v: Boolean, BooleanType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: expected a boolean literal, got $other")
  }

  /** Register dialect functions on a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("epoch_ns", epochNs, "built-in")
    reg.createOrReplaceTempFunction("token_grams", args => {
      require(args.length == 3, "token_grams(text, w, overlapping)")
      TokenGrams(args.head, litInt(args(1), "token_grams"),
        litBool(args(2), "token_grams"))
    }, "built-in")
    reg.createOrReplaceTempFunction("shingle_hashes", args => {
      require(args.length == 2 || args.length == 3,
        "shingle_hashes(text, w[, mask])")
      ShingleHashSet(args.head, litInt(args(1), "shingle_hashes"),
        if (args.length == 3) litBool(args(2), "shingle_hashes") else false)
    }, "built-in")
    def unary(fn: String, build: Expression => Expression)
             (args: Seq[Expression]): Expression = {
      require(args.length == 1, s"$fn expects exactly one argument")
      build(args.head)
    }
    reg.createOrReplaceTempFunction("simhash64",
      unary("simhash64", SimHash64), "built-in")
    reg.createOrReplaceTempFunction("nfc_normalize",
      unary("nfc_normalize", NfcNormalize), "built-in")
    reg.createOrReplaceTempFunction("repetition_stats",
      unary("repetition_stats", RepetitionStats), "built-in")
    reg.createOrReplaceTempFunction("deflate_stats",
      unary("deflate_stats", DeflateStats), "built-in")
    reg.createOrReplaceTempFunction("repetition_ngrams",
      unary("repetition_ngrams", RepetitionNgrams), "built-in")
    reg.createOrReplaceTempFunction("winnow_select", args => {
      require(args.length == 2, "winnow_select(packed_keys, window)")
      WinnowSelect(args.head, litInt(args(1), "winnow_select"))
    }, "built-in")
    reg.createOrReplaceTempFunction("multi_phrase_hits", args => {
      require(args.length >= 2,
        "multi_phrase_hits(text, phrase, ...) needs at least one phrase")
      val phrases = args.tail.map {
        // a typed pattern never matches null, so Literal(null, string)
        // falls through to the rejection below
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) =>
          s.toString
        case other => throw new IllegalArgumentException(
          "multi_phrase_hits: phrases must be non-null string literals " +
            s"(the automaton is built once at plan time), got $other")
      }
      MultiPhraseHits(args.head, phrases)
    }, "built-in")
  }
}
