package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** [NS] Token-level Aho–Corasick automaton (Aho & Corasick 1975) over a
  * CONFIG-SIZED phrase set — the multi-phrase completion of the q323
  * single-token blocklist: real content-policy blocklists are phrases
  * ("free v-bucks generator"), and matching P phrases with per-phrase
  * scans or regex alternations prices a document at O(P·len); the
  * automaton prices it at O(len + matches) regardless of how many
  * phrases the policy ships.
  *
  * Token-level (the alphabet is whole space-separated tokens, not
  * characters) so matches carry PHRASE-BOUNDARY semantics by
  * construction — "low key" never matches inside "slow key" — and the
  * DuckDB oracle can replay matches exactly as token-subsequence
  * positions. Case folding happens once per row (and once per phrase at
  * build). Built once per plan and shipped to executors as a reference
  * object; the generated code calls one static kernel per row, so the
  * whole-stage codegen span stays intact ([[TextKernels]]' pattern).
  */
final class AcAutomaton(phraseTokens: Array[Array[String]])
    extends Serializable {
  val nPhrases: Int = phraseTokens.length

  // trie over tokens: per-node transition map, fail link, and the
  // fail-closed output list (phrase ids ending at or suffix-reachable
  // from the node)
  private val gotos =
    scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[String, Integer]())
  private val fails = scala.collection.mutable.ArrayBuffer(0)
  private val outs = scala.collection.mutable.ArrayBuffer[List[Int]](Nil)

  locally {
    phraseTokens.zipWithIndex.foreach { case (toks, pid) =>
      require(toks.nonEmpty, "empty phrase in blocklist")
      var cur = 0
      toks.foreach { t =>
        val m = gotos(cur)
        val nxt = m.get(t)
        cur = if (nxt != null) nxt.intValue()
        else {
          gotos += new java.util.HashMap[String, Integer]()
          fails += 0
          outs += Nil
          m.put(t, Integer.valueOf(gotos.size - 1))
          gotos.size - 1
        }
      }
      outs(cur) = pid :: outs(cur)
    }
    // BFS fail links + output closure (out(v) ++= out(fail(v)))
    val queue = new java.util.ArrayDeque[Integer]()
    gotos(0).forEach { (_, v) => fails(v) = 0; queue.add(v) }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      gotos(u).forEach { (tok, v) =>
        var f = fails(u)
        while (f != 0 && gotos(f).get(tok) == null) f = fails(f)
        val ft = gotos(f).get(tok)
        fails(v) = if (ft != null && ft.intValue() != v.intValue())
          ft.intValue()
        else 0
        outs(v) = outs(v) ++ outs(fails(v))
        queue.add(v)
      }
    }
  }

  /** Walk `tokens` once, incrementing per-phrase match counts (ALL
    * occurrences, overlapping included — the oracle's semantics). */
  def countInto(tokens: Array[String], counts: Array[Long]): Unit = {
    var state = 0
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      var s = state
      while (s != 0 && gotos(s).get(t) == null) s = fails(s)
      val nxt = gotos(s).get(t)
      state = if (nxt != null) nxt.intValue() else 0
      var o = outs(state)
      while (o.nonEmpty) { counts(o.head) += 1L; o = o.tail }
      i += 1
    }
  }
}

object AcAutomaton {
  /** Build from raw phrases: case-fold, split on single spaces. An
    * empty token (leading/trailing/consecutive spaces in a phrase) is
    * rejected loudly — it would match the empty tokens that consecutive
    * spaces in documents produce, turning a config typo into phantom
    * blocklist hits. */
  def build(phrases: Seq[String]): AcAutomaton =
    new AcAutomaton(phrases.map { p =>
      val toks = p.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
      require(toks.forall(_.nonEmpty),
        s"blocklist phrase '$p' contains an empty token " +
          "(leading/trailing/consecutive spaces)")
      toks
    }.toArray)
}

/** Per-row AC scan: ARRAY<BIGINT> of per-phrase match counts in the
  * phrase-list order — downstream gates fold it with codegen'd HOFs
  * (total hits, distinct phrases hit) without a second text pass. */
case class AcPhraseCounts(child: Expression, phrases: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_ac_counts"

  @transient private lazy val auto = AcAutomaton.build(phrases)

  override def nullSafeEval(input: Any): Any =
    TextKernels.acPhraseCounts(input.asInstanceOf[UTF8String], auto)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAuto", auto,
      classOf[AcAutomaton].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.acPhraseCounts($c, $ref);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object AcExpression {
  def acPhraseCounts(text: Column, phrases: Seq[String]): Column =
    Bridge.column(AcPhraseCounts(Bridge.expression(text), phrases))
}
