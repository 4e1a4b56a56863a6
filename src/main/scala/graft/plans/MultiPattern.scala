package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern automaton over UTF-8 bytes.
  *
  * One pass over the text counts ALL occurrences of EVERY pattern —
  * including overlapping matches and patterns nested inside other
  * patterns' matches ("scan" inside "table scan" counts for both).
  * That single-pass O(n + matches) cost profile is why blocklist /
  * policy-term scanning over a 100 TB corpus is an automaton, not a
  * per-pattern `replace` loop (O(|patterns|·n) rescans of every
  * document).
  *
  * Built once on the driver from the literal pattern list and shipped
  * inside the expression (goto table is dense byte-indexed arrays —
  * |total pattern bytes|·256 ints, fine for blocklists, which are
  * KB–MB); matching allocates nothing per row beyond the counts
  * array.
  */
final class AhoCorasick(val patterns: Seq[String]) extends Serializable {
  require(patterns.nonEmpty, "need at least one pattern")
  require(patterns.forall(_.nonEmpty), "patterns must be non-empty")

  // trie over pattern bytes; state 0 = root
  private val patBytes = patterns.map(_.getBytes("UTF-8")).toArray
  private val maxStates = patBytes.map(_.length).sum + 1
  private val goto_ = Array.fill(maxStates)(null: Array[Int])
  private val ends = Array.fill(maxStates)(List.empty[Int]) // pattern idx ending here
  private var nStates = 1
  goto_(0) = Array.fill(256)(-1)

  patBytes.zipWithIndex.foreach { case (bs, pi) =>
    var s = 0
    bs.foreach { b =>
      val c = b & 0xff
      if (goto_(s)(c) == -1) {
        goto_(nStates) = Array.fill(256)(-1)
        goto_(s)(c) = nStates
        nStates += 1
      }
      s = goto_(s)(c)
    }
    ends(s) ::= pi
  }

  // BFS fail links; root's missing transitions loop to root. After this
  // pass goto_ is a complete DFA (every state × byte resolved), and
  // `outCounts(s)` aggregates every pattern ending at s THROUGH fail
  // links — so one array lookup per char adds all nested matches.
  private val fail = new Array[Int](nStates)
  private val outPatterns: Array[Array[Int]] = {
    val out = Array.tabulate(nStates)(s => ends(s).toArray)
    val queue = scala.collection.mutable.Queue[Int]()
    (0 until 256).foreach { c =>
      val nxt = goto_(0)(c)
      if (nxt == -1) goto_(0)(c) = 0
      else { fail(nxt) = 0; queue += nxt }
    }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      out(s) = out(s) ++ out(fail(s))
      (0 until 256).foreach { c =>
        val nxt = goto_(s)(c)
        if (nxt == -1) goto_(s)(c) = goto_(fail(s))(c)
        else { fail(nxt) = goto_(fail(s))(c); queue += nxt }
      }
    }
    out
  }

  /** Per-pattern occurrence counts (all match positions). */
  def counts(text: Array[Byte]): Array[Long] = {
    val acc = new Array[Long](patBytes.length)
    var s = 0
    var i = 0
    while (i < text.length) {
      s = goto_(s)(text(i) & 0xff)
      val out = outPatterns(s)
      var j = 0
      while (j < out.length) { acc(out(j)) += 1L; j += 1 }
      i += 1
    }
    acc
  }

  /** Codegen entry point: counts wrapped as Catalyst array data. */
  def countsArrayData(text: UTF8String): GenericArrayData =
    new GenericArrayData(counts(text.getBytes))
}

/** `multi_count(text)` for a fixed literal pattern list: array<long> of
  * all-occurrence counts, index-aligned with the pattern list. The
  * automaton rides into codegen as a referenced object (one virtual
  * call per row — the scan loop itself is compiled JVM bytecode), so
  * the surrounding projection stays inside WholeStageCodegen.
  */
case class MultiPatternCount(child: org.apache.spark.sql.catalyst.expressions.Expression,
    patterns: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"multi_count requires a string argument, got ${other.catalogString}")
    }

  @transient private lazy val automaton = new AhoCorasick(patterns)

  override def nullSafeEval(v: Any): Any =
    automaton.countsArrayData(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ac = ctx.addReferenceObj("ahoCorasick", automaton, classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ac.countsArrayData($t);")
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = copy(child = newChild)
}
