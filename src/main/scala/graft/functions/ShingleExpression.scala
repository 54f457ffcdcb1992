package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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
  * CodegenFallback is fine here: the cost is per-row, not per-element,
  * and the row count is the document count.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(' ')
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words(i + k))
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleExpression {
  /** Distinct word n-grams of `text` as ARRAY<STRING>. */
  def wordShingles(text: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(text), n))
}
