package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint in one pass: md5 of every `w`-char sliding
  * window, keep the `k` smallest DISTINCT hex digests, joined with '|'.
  *
  * Semantics exactly match the composable form
  * array_join(slice(array_sort(array_distinct(transform(..., md5))), 1, k), "|")
  * and its DuckDB oracle — but one per-row eval with a reused
  * MessageDigest replaces ~len(text) interpreted lambda evaluations.
  * `doGenCode` emits a static call into [[TextKernels]] so the
  * surrounding whole-stage codegen span stays intact.
  */
case class WinnowFingerprint(child: Expression, w: Int, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(input: Any): Any =
    TextKernels.winnow(input.asInstanceOf[UTF8String], w, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.winnow($c, $w, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowExpression {
  def winnowFingerprint(text: Column, w: Int, k: Int): Column =
    Bridge.column(WinnowFingerprint(Bridge.expression(text), w, k))
}
