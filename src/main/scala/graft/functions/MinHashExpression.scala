package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** k-component MinHash signature of a document's word n-gram shingles as
  * ONE codegen'd per-row expression (kernel: TextKernels.minhash).
  *
  * This collapses the former signature build — explode shingles, md5 per
  * (gram × k/2), shuffle every gram row, k min-aggregates — into a
  * map-side pass with zero shuffles; values are bit-identical to the agg
  * form, so the q24 oracle is unchanged. NULL for docs with fewer than
  * `n` words (they have no grams and can never be near-dup candidates).
  */
case class MinHashSignature(child: Expression, n: Int, k: Int)
    extends UnaryExpression {
  require(k % 2 == 0, s"k must be even (two components per digest): $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any =
    TextKernels.minhash(input.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TextKernels.minhash($c, $n, $k);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashExpression {
  def minhashSignature(text: Column, n: Int, k: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(text), n, k))
}
