package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.Bridge

/** Registration of graft's native Catalyst expressions on the SQL surface
  * (SURVEY §2.10 extensibility): `graft_dot(a, b)` and
  * `graft_shingles(text, n)` become callable from spark.sql.
  *
  * Two hookups:
  *  - [[GraftExtensions]] for session construction
  *    (`SparkSession.builder().withExtensions(new GraftExtensions)` or
  *    `--conf spark.sql.extensions=graft.functions.GraftExtensions`);
  *  - [[GraftFunctions.register]] for an already-built session.
  */
object GraftFunctions {

  private def shingleBuilder(args: Seq[Expression]): Expression = {
    val n = args(1) match {
      case Literal(v: Int, _) => v
      case other => other.eval().asInstanceOf[Number].intValue()
    }
    WordShingles(args(0), n)
  }

  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    (FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      shingleBuilder _),
    (FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash32].getName, "graft_simhash"),
      (args: Seq[Expression]) => SimHash32(args(0))),
    (FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (args: Seq[Expression]) => MinHashSignature(args(0),
        args(1).eval().asInstanceOf[Number].intValue(),
        args(2).eval().asInstanceOf[Number].intValue())),
    (FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowFingerprint].getName, "graft_winnow"),
      (args: Seq[Expression]) => WinnowFingerprint(args(0),
        args(1).eval().asInstanceOf[Number].intValue(),
        args(2).eval().asInstanceOf[Number].intValue())))

  /** Register on an existing session (idempotent). Includes the §2.10
    * custom Aggregator (`graft_minhash_union`) via udaf() — a UDAF goes
    * through spark.udf, not the expression registry. */
  def register(spark: SparkSession): Unit = {
    val reg = Bridge.functionRegistry(spark)
    descriptions.foreach { case (ident, info, builder) =>
      reg.registerFunction(ident, info, builder)
    }
    spark.udf.register("graft_minhash_union",
      org.apache.spark.sql.functions.udaf(MinHashUnionAggregator()))
  }
}

/** spark.sql.extensions entry point: functions + the dot-fusion
  * optimizer rule. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptions.foreach(e.injectFunction)
    e.injectOptimizerRule(_ => DotFusionRule)
  }
}
