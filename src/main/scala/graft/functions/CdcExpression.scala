package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined-chunking cut positions as ONE codegen'd per-row
  * expression (kernel: [[TextKernels.cdcCuts]]). Replaces the
  * interpreted higher-order `filter(sequence(...), ...)` composition —
  * same cut set bit-for-bit (KernelEquivalenceSpec pins it), ~10× the
  * throughput, and the enclosing projection stays inside whole-stage
  * codegen. */
case class CdcCutPositions(child: Expression, w: Int, maskBits: Int)
    extends UnaryExpression {
  require(w >= 1 && maskBits >= 1 && maskBits <= 30,
    s"bad CDC geometry: w=$w maskBits=$maskBits")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_cdc_cuts"

  override def nullSafeEval(input: Any): Any =
    TextKernels.cdcCuts(input.asInstanceOf[UTF8String], w, maskBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TextKernels.cdcCuts($c, $w, $maskBits);
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcExpression {
  def cdcCuts(text: Column, w: Int, maskBits: Int): Column =
    Bridge.column(CdcCutPositions(Bridge.expression(text), w, maskBits))
}
