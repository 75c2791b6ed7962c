package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring matching — the blocklist gate every web
  * pipeline runs (C4's "bad words" list, UT1 categories): thousands of
  * phrases tested against every document. The naive shape is one
  * `contains`/`regexp` pass PER PATTERN — N full scans of 100 TB; this
  * is ONE pass regardless of list size via Aho–Corasick (Aho &
  * Corasick, "Efficient String Matching: An Aid to Bibliographic
  * Search", CACM 1975): a trie over the patterns with BFS failure
  * links, so the scan advances one character at a time and every
  * (position, pattern) match — overlapping included — reports in
  * O(text + matches).
  *
  * The pattern list is a bounded literal riding the expression tree
  * (the NgramLm/QualityClassifier model discipline): the automaton
  * compiles lazily ONCE per executor after deserialization, never
  * shuffles, and the kernel is scan-side per-row work — zero shuffle,
  * zero joins. `count` reports every match; `any` is the gate face and
  * EXITS AT THE FIRST HIT (a blocklisted doc drops without scanning
  * its tail).
  *
  * Case-insensitive mode lowers ASCII 'A'–'Z' ONLY, on both patterns
  * and text: locale-free, allocation-free, and — unlike full Unicode
  * lowering — incapable of creating a match that the raw bytes don't
  * contain (Unicode lower('İ') is "i"+combining-dot, which would
  * phantom-match an ASCII "i" pattern). Patterns are expected ASCII;
  * non-ASCII text passes through untouched and simply never matches an
  * ASCII pattern. Null text → 0 / false; empty patterns are refused.
  */
object MultiMatch {

  /** Compiled Aho–Corasick automaton: dense per-node child maps, BFS
    * failure links, and per-node emit counts PRE-FOLDED through the
    * dictionary-suffix chain (emit(n) = patterns ending at n +
    * emit(fail(n))), so the scan adds one integer per character. */
  private[operators] final class Automaton(
      patterns: Seq[String], ci: Boolean) {
    require(patterns.nonEmpty, "MultiMatch needs at least one pattern")
    require(patterns.forall(p => p != null && p.nonEmpty),
      "MultiMatch patterns must be non-null and non-empty")

    @inline private def norm(c: Char): Char =
      if (ci && c >= 'A' && c <= 'Z') (c + 32).toChar else c

    private val children =
      scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.Map.empty[Char, Int])
    private val ends = scala.collection.mutable.ArrayBuffer(0)

    patterns.foreach { p =>
      var s = 0
      var i = 0
      while (i < p.length) {
        val c = norm(p.charAt(i))
        s = children(s).getOrElseUpdate(c, {
          children += scala.collection.mutable.Map.empty[Char, Int]
          ends += 0
          children.length - 1
        })
        i += 1
      }
      ends(s) += 1
    }

    private val fail = new Array[Int](children.length)
    private val emit = new Array[Int](children.length)
    locally { // BFS: fail links + emit folding
      val queue = scala.collection.mutable.Queue.empty[Int]
      children(0).valuesIterator.foreach { s =>
        fail(s) = 0; emit(s) = ends(s); queue.enqueue(s)
      }
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        children(u).foreach { case (c, v) =>
          var f = fail(u)
          while (f != 0 && !children(f).contains(c)) f = fail(f)
          fail(v) = children(f).get(c).filter(_ != v).getOrElse(0)
          emit(v) = ends(v) + emit(fail(v))
          queue.enqueue(v)
        }
      }
    }

    /** All (position, pattern) matches in `s`; overlaps count. */
    def count(s: UTF8String): Long = run(s, earlyExit = false)

    /** First hit wins — the gate face. */
    def any(s: UTF8String): Boolean = run(s, earlyExit = true) > 0L

    private def run(s: UTF8String, earlyExit: Boolean): Long = {
      val t = s.toString
      var state = 0
      var total = 0L
      var i = 0
      val n = t.length
      while (i < n) {
        val c = norm(t.charAt(i))
        var st = state
        while (st != 0 && !children(st).contains(c)) st = fail(st)
        state = children(st).getOrElse(c, 0)
        total += emit(state)
        if (earlyExit && total > 0) return total
        i += 1
      }
      total
    }
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Seq[String], Boolean),
      Automaton]()

  /** One compile per (patterns, ci) per JVM — expressions are copied
    * freely by the optimizer; the automaton must not recompile per
    * copy or per partition. */
  private[operators] def automaton(
      patterns: Seq[String], ci: Boolean): Automaton =
    cache.computeIfAbsent((patterns, ci),
      _ => new Automaton(patterns, ci))

  private val B = org.apache.spark.sql.graft.Bridge

  /** Total match count (every position × pattern, overlapping). */
  def count(text: Column, patterns: Seq[String],
      caseInsensitive: Boolean = false): Column =
    B.column(MultiMatchCount(B.expression(text), patterns, caseInsensitive))

  /** TRUE iff any pattern occurs — early-exit blocklist gate. */
  def any(text: Column, patterns: Seq[String],
      caseInsensitive: Boolean = false): Column =
    B.column(MultiMatchAny(B.expression(text), patterns, caseInsensitive))
}

case class MultiMatchCount(
    child: Expression, patterns: Seq[String], caseInsensitive: Boolean)
    extends UnaryExpression
    with ImplicitCastInputTypes
    with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  @transient private lazy val ac =
    MultiMatch.automaton(patterns, caseInsensitive)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else ac.count(v.asInstanceOf[UTF8String])
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MultiMatchCount = copy(child = newChild)
}

case class MultiMatchAny(
    child: Expression, patterns: Seq[String], caseInsensitive: Boolean)
    extends UnaryExpression
    with ImplicitCastInputTypes
    with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  @transient private lazy val ac =
    MultiMatch.automaton(patterns, caseInsensitive)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) java.lang.Boolean.FALSE
    else java.lang.Boolean.valueOf(ac.any(v.asInstanceOf[UTF8String]))
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MultiMatchAny = copy(child = newChild)
}
