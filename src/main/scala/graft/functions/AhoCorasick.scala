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

  /** Byte-trie automaton over the phrases' UTF-8 encodings: the scan
    * walks `UTF8String.getByte` directly (raw-substring matching is
    * byte-for-byte equivalent on valid UTF-8, and skipping the
    * UTF-16 transcode + String allocation matters on a per-row hot
    * path). Goto tables are flattened after build into sorted
    * parallel primitive arrays (CSR layout: `nodeStart`/`keys`/
    * `nexts`) probed by binary search — no boxed maps survive to
    * scan time. BFS fail links; per-node matched-phrase index lists
    * with suffix outputs merged at build, flattened the same way.
    * Serializable — it rides to executors as a codegen reference
    * object. */
  final class Automaton(phrases: Array[String]) extends Serializable {
    // Build with mutable boxed maps (TreeMap so keys flatten sorted),
    // then flatten into CSR primitive arrays — ONLY the arrays become
    // fields, so the scan never touches a boxed map and serialization
    // ships nothing but primitives.
    private val (nodeStart, keys, nexts, fail, outStart, outs) = {
      val gotoMaps = scala.collection.mutable.ArrayBuffer(
        new java.util.TreeMap[Integer, Integer]())
      val outLists =
        scala.collection.mutable.ArrayBuffer[Array[Int]](Array.empty)
      phrases.zipWithIndex.foreach { case (p, pi) =>
        var s = 0
        p.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { bt =>
          val m = gotoMaps(s)
          val key = Integer.valueOf(bt.toInt)
          s = if (m.containsKey(key)) m.get(key)
          else {
            gotoMaps += new java.util.TreeMap[Integer, Integer]()
            outLists += Array.empty
            m.put(key, gotoMaps.size - 1)
            gotoMaps.size - 1
          }
        }
        outLists(s) = outLists(s) :+ pi
      }
      val fl = new Array[Int](gotoMaps.size)
      locally { // BFS fail links; merge suffix outputs into each node
        val q = new java.util.ArrayDeque[Int]()
        gotoMaps(0).values().forEach(v => q.add(v))
        while (!q.isEmpty) {
          val u = q.poll()
          gotoMaps(u).forEach { (bt, v) =>
            q.add(v)
            var f = fl(u)
            while (f != 0 && !gotoMaps(f).containsKey(bt)) f = fl(f)
            fl(v) =
              if (gotoMaps(f).containsKey(bt) && gotoMaps(f).get(bt) != v)
                gotoMaps(f).get(bt)
              else 0
            if (outLists(fl(v)).nonEmpty)
              outLists(v) = outLists(v) ++ outLists(fl(v))
          }
        }
      }
      // flatten: CSR goto (sorted signed-byte keys per node) + CSR outputs
      val ns = new Array[Int](gotoMaps.size + 1)
      gotoMaps.indices.foreach(i => ns(i + 1) = ns(i) + gotoMaps(i).size())
      val ks = new Array[Byte](ns.last)
      val nx = new Array[Int](ns.last)
      var w = 0
      gotoMaps.foreach { m =>
        m.forEach { (bt, v) => ks(w) = bt.byteValue(); nx(w) = v.intValue(); w += 1 }
      }
      val os = new Array[Int](outLists.size + 1)
      outLists.indices.foreach(i => os(i + 1) = os(i) + outLists(i).length)
      (ns, ks, nx, fl, os, outLists.toArray.flatten)
    }

    private val phraseUtf8: Array[UTF8String] =
      phrases.map(UTF8String.fromString)

    /** goto(state, b), or -1 when no edge: binary search over the
      * node's sorted signed-byte key slice (typically ≤ a few keys). */
    private def step(state: Int, b: Byte): Int = {
      var lo = nodeStart(state)
      var hi = nodeStart(state + 1) - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val kb = keys(mid)
        if (kb == b) return nexts(mid)
        else if (kb < b) lo = mid + 1
        else hi = mid - 1
      }
      -1
    }

    /** One left-to-right pass; distinct matches in phrase-list order. */
    def scan(text: UTF8String): GenericArrayData = {
      val n = text.numBytes()
      val seen = new java.util.BitSet(phraseUtf8.length)
      var state = 0
      var i = 0
      while (i < n) {
        val b = text.getByte(i)
        var nxt = step(state, b)
        while (nxt < 0 && state != 0) { state = fail(state); nxt = step(state, b) }
        if (nxt >= 0) state = nxt else state = 0
        var j = outStart(state)
        val jEnd = outStart(state + 1)
        while (j < jEnd) { seen.set(outs(j)); j += 1 }
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
