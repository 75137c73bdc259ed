package graft.functions

import org.apache.spark.sql.{graftbridge, Column}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level Aho–Corasick automaton with a fully-resolved dense
  * transition table: `step` folds the classic goto/fail walk into one
  * array lookup per input byte, and `outCount(state)` pre-accumulates
  * pattern hits through the suffix (fail) chain, so scanning is a
  * branch-free `state = next(state*256+b); count += outCount(state)`
  * per byte — O(bytes) regardless of pattern count, no backtracking,
  * no per-row allocation (`UTF8String.getByte` reads in place).
  *
  * Semantics: counts EVERY (pattern, end-position) occurrence —
  * overlapping matches and patterns contained in other patterns all
  * count, case-sensitive, raw UTF-8 bytes (exact for any input; the
  * committed blocklists are ASCII). Memory is states×256 ints (states
  * ≤ total pattern bytes + 1): ~67 KB for the committed list, ~15 MB
  * for a realistic few-thousand-phrase wordlist — built once on the
  * driver and shipped as a codegen reference object, NOT rebuilt per
  * task. The dense table deliberately trades memory for a branch-free
  * inner loop; a 10⁵⁺-phrase lexicon would switch to sparse
  * goto + fail-walk transitions (same automaton, ~states×avg-degree
  * memory) — a constructor-level swap, not a plan change.
  */
final class AcAutomaton(val patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "AcAutomaton needs at least one non-empty pattern")

  // Trie construction over pattern bytes.
  private val patBytes = patterns.map(_.getBytes("UTF-8"))
  private val maxStates = patBytes.map(_.length).sum + 1
  private val trie = Array.fill(maxStates * 256)(-1)
  private val ends = new Array[Int](maxStates) // #patterns ending exactly here
  private var nStates = 1
  patBytes.foreach { p =>
    var s = 0
    p.foreach { b =>
      val idx = s * 256 + (b & 0xFF)
      if (trie(idx) < 0) { trie(idx) = nStates; nStates += 1 }
      s = trie(idx)
    }
    ends(s) += 1
  }

  /** Dense resolved transition table + accumulated output counts. */
  private val next = new Array[Int](nStates * 256)
  private val outCount = new Array[Long](nStates)
  locally {
    val fail = new Array[Int](nStates)
    val queue = new java.util.ArrayDeque[Int]()
    var c = 0
    while (c < 256) {
      val t = trie(c)
      if (t >= 0) { next(c) = t; queue.add(t) } else next(c) = 0
      c += 1
    }
    var k = 0
    while (k < nStates) { outCount(k) = ends(k).toLong; k += 1 }
    while (!queue.isEmpty) {
      val s = queue.poll()
      outCount(s) += outCount(fail(s))
      var b = 0
      while (b < 256) {
        val t = trie(s * 256 + b)
        if (t >= 0) {
          fail(t) = next(fail(s) * 256 + b)
          next(s * 256 + b) = t
          queue.add(t)
        } else {
          next(s * 256 + b) = next(fail(s) * 256 + b)
        }
        b += 1
      }
    }
  }

  /** Total occurrence count of all patterns in `u` (overlapping incl.). */
  def countMatches(u: UTF8String): Long = {
    val n = u.numBytes()
    var s = 0; var count = 0L; var i = 0
    while (i < n) {
      s = next(s * 256 + (u.getByte(i) & 0xFF))
      count += outCount(s)
      i += 1
    }
    count
  }
}

/** Native Catalyst expression: multi-phrase blocklist hit count in one
  * single pass per document. The 100 TB shape for phrase filtering: the
  * alternative formulations either explode |tokens| rows per document
  * into an n-gram join (shuffles the corpus token count) or run one
  * `regexp_count` per phrase (P scans per row, with regex-engine
  * overhead); this is one fused scan per row for ANY number of
  * phrases, stays inside whole-stage codegen, and broadcasts only the
  * compiled automaton. Extension path (c) of SURVEY §4.2, text twin of
  * [[CosineSim]].
  */
case class PhraseMatchCount(child: Expression, phrases: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_phrase_hits"

  @transient private lazy val ac = new AcAutomaton(phrases.toArray)

  override def nullSafeEval(input: Any): Any =
    ac.countMatches(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("graftAc", ac, classOf[AcAutomaton].getName)
    defineCodeGen(ctx, ev, c => s"$acRef.countMatches($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PhraseMatchCount {
  /** Column API: `phraseHits($"text", blocklist)`. */
  def phraseHits(c: Column, phrases: Seq[String]): Column =
    graftbridge.column(PhraseMatchCount(graftbridge.expression(c), phrases))

  /** A phrase is ORACLE-SAFE when it has no border (no proper prefix
    * that is also a suffix): then its occurrences cannot overlap each
    * other, a single left-to-right `replace(text, p, '')` removes all
    * of them, and the DuckDB twin's `(len(text)-len(replace(...)))/len(p)`
    * equals this expression's all-occurrence count for that phrase.
    * The blocklist spec asserts this for every committed phrase. */
  def isBorderless(p: String): Boolean =
    (1 until p.length).forall(l => p.substring(0, l) != p.substring(p.length - l))
}
