package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Aho–Corasick multi-pattern text scan (Aho & Corasick 1975) — the
 * phrase-blocklist primitive (policy/NSFW phrase filtering, template
 * sentinel detection): ONE pass over each document reports every
 * blocklist phrase that occurs as a substring, at O(|text| +
 * matches) per row regardless of how many phrases the list holds.
 *
 * The relational alternatives both lose at scale: k separate
 * `contains` predicates re-scan the text k times (the blocklists
 * that matter hold thousands of phrases), and a regex alternation
 * `(p1|p2|…)` backtracks and recompiles per task. Here the automaton
 * is built ONCE on the driver, shipped as one reference object, and
 * the scan is a codegen'd per-row kernel — embarrassingly parallel,
 * zero shuffle.
 *
 * Matching is case-sensitive raw-substring (compose with `lower()` /
 * [[TextExprs.nfc]] upstream for normalized matching — the same
 * composition contract as the other kernels).
 */
object AhoCorasick {

  /** Matched phrases of `text`, DISTINCT, in phrase-LIST order (the
    * order-stable contract a `list_filter(phrases, contains)` oracle
    * replays verbatim). */
  def multi_phrase_hits(text: Column, phrases: Seq[String]): Column =
    ColumnBridge.column(
      MultiPhraseHits(ColumnBridge.expression(text), phrases))

  /** Array-based automaton: goto maps per node, BFS fail links,
    * per-node matched-phrase index lists (suffix outputs merged at
    * build). Serializable — it rides to executors as a codegen
    * reference object. */
  final class Automaton(phrases: Array[String]) extends Serializable {
    private val gotoMaps =
      scala.collection.mutable.ArrayBuffer(
        new java.util.HashMap[Char, Int]())
    private val outLists =
      scala.collection.mutable.ArrayBuffer[Array[Int]](Array.empty)

    phrases.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { ch =>
        val m = gotoMaps(s)
        s = if (m.containsKey(ch)) m.get(ch)
        else {
          gotoMaps += new java.util.HashMap[Char, Int]()
          outLists += Array.empty
          m.put(ch, gotoMaps.size - 1)
          gotoMaps.size - 1
        }
      }
      outLists(s) = outLists(s) :+ pi
    }

    private val fail = new Array[Int](gotoMaps.size)
    locally { // BFS fail links; merge suffix outputs into each node
      val q = new java.util.ArrayDeque[Int]()
      gotoMaps(0).values().forEach(v => q.add(v))
      while (!q.isEmpty) {
        val u = q.poll()
        gotoMaps(u).forEach { (ch, v) =>
          q.add(v)
          var f = fail(u)
          while (f != 0 && !gotoMaps(f).containsKey(ch)) f = fail(f)
          fail(v) =
            if (gotoMaps(f).containsKey(ch) && gotoMaps(f).get(ch) != v)
              gotoMaps(f).get(ch)
            else 0
          if (outLists(fail(v)).nonEmpty)
            outLists(v) = outLists(v) ++ outLists(fail(v))
        }
      }
    }

    private val phraseUtf8: Array[UTF8String] =
      phrases.map(UTF8String.fromString)

    /** One left-to-right pass; distinct matches in phrase-list order. */
    def scan(text: UTF8String): GenericArrayData = {
      val s = text.toString
      val seen = new java.util.BitSet(phraseUtf8.length)
      var state = 0
      var i = 0
      while (i < s.length) {
        val ch = s.charAt(i)
        while (state != 0 && !gotoMaps(state).containsKey(ch))
          state = fail(state)
        if (gotoMaps(state).containsKey(ch)) state = gotoMaps(state).get(ch)
        val out = outLists(state)
        var j = 0
        while (j < out.length) { seen.set(out(j)); j += 1 }
        i += 1
      }
      val hits = new scala.collection.mutable.ArrayBuffer[Any](seen.cardinality())
      var pi = seen.nextSetBit(0)
      while (pi >= 0) {
        hits += phraseUtf8(pi)
        pi = seen.nextSetBit(pi + 1)
      }
      new GenericArrayData(hits.toArray)
    }
  }
}

/** array<string> of the DISTINCT blocklist phrases occurring in the
  * text, in phrase-list order; one automaton pass per row. */
case class MultiPhraseHits(child: Expression, phrases: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  require(phrases.nonEmpty, "phrase list must be non-empty")
  require(phrases.forall(_.nonEmpty), "phrases must be non-empty strings")
  require(phrases.distinct.size == phrases.size,
    "phrase list holds duplicates — hits are reported per distinct phrase")

  override def inputTypes: Seq[ColumnBridge.SqlAbstractDataType] =
    Seq(StringType)
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  @transient private lazy val automaton =
    new AhoCorasick.Automaton(phrases.toArray)

  override def nullSafeEval(v: Any): Any =
    automaton.scan(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ac", automaton,
      classOf[AhoCorasick.Automaton].getName)
    defineCodeGen(ctx, ev, c => s"$ref.scan($c)")
  }

  override protected def withNewChildInternal(c: Expression): MultiPhraseHits =
    copy(child = c)
  override def prettyName: String = "multi_phrase_hits"
}
