package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a space-separated text, as one native
  * expression.
  *
  * The composable form — transform(sequence(...), i -> concat_ws(slice))
  * + array_distinct — evaluates three interpreted lambdas per gram and
  * dominated the near-dup pipelines (7.8 s just to materialize shingles
  * at sf0.1). One per-row eval with a LinkedHashSet is ~20× cheaper and
  * keeps identical output semantics (distinct grams; output order is
  * irrelevant — consumers explode or aggregate).
  *
  * `doGenCode` emits a static call into [[TextKernels]]: the work is
  * per-row, but staying OUT of CodegenFallback keeps the surrounding
  * stage (filters, hashes, partial aggs) in one codegen span.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any =
    TextKernels.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.shingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Map-side hashed shingle set: xxhash64 (seed 42) of each distinct word
  * n-gram as ARRAY<LONG> — same values as xxhash64 over the exploded
  * grams, with no explode. The form every pair-join consumer wants: the
  * per-doc gram set is carried as one narrow array column. */
case class WordShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    TextKernels.shingleHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.shingleHashes($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleExpression {
  /** Distinct word n-grams of `text` as ARRAY<STRING>. */
  def wordShingles(text: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(text), n))

  /** xxhash64 of the distinct word n-grams as ARRAY<LONG>. */
  def wordShingleHashes(text: Column, n: Int): Column =
    Bridge.column(WordShingleHashes(Bridge.expression(text), n))
}
