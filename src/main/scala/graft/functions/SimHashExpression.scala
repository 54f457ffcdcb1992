package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 32-bit SimHash signature ("0/1" chars, MSB first) of a document's
  * distinct words, as one native codegen'd expression.
  *
  * Replaces the pure-SQL pipeline (explode words × explode 32 bit
  * positions × two groupBys — three shuffles and 32 rows per word) with
  * a single per-row eval; output is bit-identical, so the DuckDB oracle
  * keeps the SQL nibble-math form (DocQueries q25).
  */
case class SimHash32(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any =
    TextKernels.simhash32(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.simhash32($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash signature as a signed long (TextKernels.simhash64):
  * the scale form — integer band keys (`(sig >>> s) & 0xffff`) and
  * `bit_count(a ^ b)` Hamming verification, 8-byte rows. Upper 32 bits
  * equal [[SimHash32]]'s signature (same digest prefix, same vote rule).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any =
    TextKernels.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.simhash64($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashExpression {
  def simhash32(text: Column): Column =
    Bridge.column(SimHash32(Bridge.expression(text)))

  def simhash64(text: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(text)))
}
