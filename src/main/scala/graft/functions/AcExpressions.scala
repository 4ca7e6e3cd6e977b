package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick multi-phrase scanning (`graft_multi_count`) — the
  * one-pass kernel behind the blocklist gate (q_blocklist).
  *
  * The portable spelling counts each phrase with the replace-length
  * identity, which scans the text once PER PHRASE: fine for a 10-entry
  * demo dictionary, linear-in-|dict| wasted work for the
  * thousands-of-phrases blocklists production filters actually run
  * (C4's badwords list alone is ~400 entries per language). This
  * expression compiles the dictionary into a dense byte-level DFA once
  * per plan (a broadcast-sized reference object, built lazily on the
  * executor) and counts ALL phrases in ONE pass over the UTF-8 bytes —
  * per-row cost is O(|text|) regardless of dictionary size, inside
  * WholeStageCodegen.
  *
  * Matching semantics: counts every position where a phrase ENDS
  * (overlapping occurrences included). For phrases with no proper
  * border (no self-overlap) this equals the non-overlapping
  * replace-length count — the equivalence q_blocklist's borderless
  * dictionary relies on and AcExpressionsSpec pins from both sides
  * (equality on borderless phrases, documented divergence on "aa").
  *
  * Byte-level matching is exact for UTF-8: continuation bytes have the
  * high bit set, so an ASCII phrase can never false-positive inside a
  * multi-byte character, and any exact byte match of a valid UTF-8
  * phrase is an exact character match (UTF-8 is self-synchronizing).
  *
  * Scale note: the DFA is dense (256 ints per node, nodes = total
  * dictionary bytes + 1) — ~1 KB per dictionary byte. A 10k-phrase
  * blocklist compiles to ~100 MB of transitions; beyond that, switch
  * the goto rows to banded/hashed transitions behind the same eval.
  */
object AcKernels {

  final class Automaton(phrases: Array[Array[Byte]]) extends Serializable {
    private val nPhrases = phrases.length
    // trie build: dense transitions, -1 = missing until the BFS closure
    private var goto_ : Array[Array[Int]] = _
    private var outs: Array[Array[Int]] = _
    locally {
      val cap = phrases.map(_.length).sum + 1
      val g = Array.fill(cap)(null: Array[Int])
      val out = Array.fill(cap)(Nil: List[Int])
      def row(s: Int): Array[Int] = {
        if (g(s) == null) g(s) = Array.fill(256)(-1)
        g(s)
      }
      var nNodes = 1
      row(0)
      var p = 0
      while (p < nPhrases) {
        var s = 0
        val bs = phrases(p)
        var i = 0
        while (i < bs.length) {
          val b = bs(i) & 0xff
          if (row(s)(b) == -1) { row(s)(b) = nNodes; row(nNodes); nNodes += 1 }
          s = row(s)(b)
          i += 1
        }
        out(s) = p :: out(s)
        p += 1
      }
      // BFS: fail links + closure to a complete DFA (no fail-chasing in
      // the hot loop) + output inheritance along fail links
      val fail = new Array[Int](nNodes)
      val queue = scala.collection.mutable.Queue.empty[Int]
      var b = 0
      while (b < 256) {
        val t = g(0)(b)
        if (t == -1) g(0)(b) = 0
        else { fail(t) = 0; queue.enqueue(t) }
        b += 1
      }
      while (queue.nonEmpty) {
        val s = queue.dequeue()
        out(s) = out(s) ::: out(fail(s))
        var b2 = 0
        while (b2 < 256) {
          val t = g(s)(b2)
          if (t == -1) g(s)(b2) = g(fail(s))(b2)
          else { fail(t) = g(fail(s))(b2); queue.enqueue(t) }
          b2 += 1
        }
      }
      goto_ = g.take(nNodes)
      outs = out.take(nNodes).map(l => if (l.isEmpty) null else l.toArray)
    }

    /** Per-phrase occurrence counts (every end position) in one pass. */
    def countAll(text: UTF8String): Array[Long] = {
      val counts = new Array[Long](nPhrases)
      val bytes = text.getBytes
      var s = 0
      var i = 0
      while (i < bytes.length) {
        s = goto_(s)(bytes(i) & 0xff)
        val o = outs(s)
        if (o != null) {
          var j = 0
          while (j < o.length) { counts(o(j)) += 1L; j += 1 }
        }
        i += 1
      }
      counts
    }

    /** Eval-shaped wrapper: Catalyst array result. */
    def countAllData(text: UTF8String): GenericArrayData =
      new GenericArrayData(countAll(text))
  }
}

/** `graft_multi_count(text, 'p1,p2,...')` → array<long>: per-phrase
  * occurrence counts in dictionary order, one Aho-Corasick pass.
  */
case class MultiPhraseCount(child: Expression, phrases: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  require(phrases.nonEmpty && phrases.forall(_.nonEmpty),
    "graft_multi_count: phrases must be non-empty")

  @transient private lazy val auto = new AcKernels.Automaton(
    phrases.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray)

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_multi_count"

  override def nullSafeEval(s: Any): Any =
    auto.countAllData(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val autoRef = ctx.addReferenceObj("acAutomaton", auto,
      classOf[AcKernels.Automaton].getName)
    defineCodeGen(ctx, ev, s => s"$autoRef.countAllData($s)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
