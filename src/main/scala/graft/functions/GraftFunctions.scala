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

  /** First argument with an arity check naming the function — `args(0)`
    * on an empty list would otherwise throw a bare IndexOutOfBounds. */
  private def arg0(fn: String, args: Seq[Expression]): Expression = {
    require(args.nonEmpty, s"$fn expects at least 1 argument, got 0")
    args.head
  }

  /** Extract a constant Int argument or fail with a message naming the
    * function — non-foldable args (columns) and wrong arity must raise a
    * clear analysis error, not an NPE at eval time. */
  private def constInt(fn: String, args: Seq[Expression], i: Int): Int = {
    require(args.length > i,
      s"$fn expects at least ${i + 1} arguments, got ${args.length}")
    args(i) match {
      case Literal(v: Int, _) => v
      case e if e.foldable =>
        e.eval() match {
          case n: Number => n.intValue()
          case other => throw new IllegalArgumentException(
            s"$fn argument ${i + 1} must be a constant integer, got $other")
        }
      case other => throw new IllegalArgumentException(
        s"$fn argument ${i + 1} must be a constant integer literal, " +
          s"got non-foldable expression $other")
    }
  }

  private def shingleBuilder(args: Seq[Expression]): Expression =
    WordShingles(arg0("graft_shingles", args), constInt("graft_shingles", args, 1))

  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"graft_dot expects 2 arguments, got ${args.length}")
        DotProduct(args(0), args(1))
      }),
    (FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      shingleBuilder _),
    (FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[WordShingleHashes].getName,
        "graft_shingle_hashes"),
      (args: Seq[Expression]) => WordShingleHashes(arg0("graft_shingle_hashes", args),
        constInt("graft_shingle_hashes", args, 1))),
    (FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash32].getName, "graft_simhash"),
      (args: Seq[Expression]) => SimHash32(arg0("graft_simhash", args))),
    (FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (args: Seq[Expression]) => MinHashSignature(arg0("graft_minhash", args),
        constInt("graft_minhash", args, 1),
        constInt("graft_minhash", args, 2))),
    (FunctionIdentifier("graft_sorted_isect"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName,
        "graft_sorted_isect"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"graft_sorted_isect expects 2 arguments, got ${args.length}")
        SortedIntersectSize(args(0), args(1))
      }),
    (FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowFingerprint].getName, "graft_winnow"),
      (args: Seq[Expression]) => WinnowFingerprint(arg0("graft_winnow", args),
        constInt("graft_winnow", args, 1),
        constInt("graft_winnow", args, 2))),
    (FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (args: Seq[Expression]) => NfcNormalize(arg0("graft_nfc", args))),
    (FunctionIdentifier("graft_ac_counts"),
      new ExpressionInfo(classOf[AcPhraseCounts].getName,
        "graft_ac_counts"),
      // graft_ac_counts(text, 'phrase one|phrase two|...') — the phrase
      // set is config, so it arrives as one constant '|'-joined literal
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"graft_ac_counts expects 2 arguments, got ${args.length}")
        val phrases = args(1) match {
          case e if e.foldable && e.eval() != null =>
            // -1 limit keeps trailing empty segments visible so the
            // blank-phrase check below rejects them instead of silently
            // dropping them ('a|b|' would otherwise pass as 2 phrases)
            e.eval().toString.split("\\|", -1).toSeq
          case other => throw new IllegalArgumentException(
            "graft_ac_counts argument 2 must be a constant " +
              s"'|'-joined phrase list, got $other")
        }
        require(phrases.nonEmpty && phrases.forall(_.trim.nonEmpty),
          "graft_ac_counts: blank phrase segment in '|'-joined list " +
            s"'${args(1).eval()}'")
        AcPhraseCounts(args(0), phrases)
      }))

  /** Register on an existing session (idempotent). Includes the §2.10
    * custom Aggregators (`graft_minhash_union`, `graft_top3`,
    * `graft_bloom8k`, `graft_heavy64`) via
    * udaf() — a UDAF goes through spark.udf, not the expression
    * registry. `graft_top3(score, id)` is the fixed-arity SQL surface of
    * [[TopKAggregator]]; other k values go through
    * `functions.udaf(TopKAggregator(k))` on the Scala side. */
  def register(spark: SparkSession): Unit = {
    val reg = Bridge.functionRegistry(spark)
    descriptions.foreach { case (ident, info, builder) =>
      reg.registerFunction(ident, info, builder)
    }
    spark.udf.register("graft_minhash_union",
      org.apache.spark.sql.functions.udaf(MinHashUnionAggregator()))
    spark.udf.register("graft_top3",
      org.apache.spark.sql.functions.udaf(TopKAggregator(3)))
    // fixed-geometry SQL surfaces of the sketch Aggregators; other
    // sizes go through functions.udaf(...) on the Scala side
    spark.udf.register("graft_bloom8k",
      org.apache.spark.sql.functions.udaf(BloomFilterAggregator(8192)))
    spark.udf.register("graft_heavy64",
      org.apache.spark.sql.functions.udaf(MisraGriesAggregator(64)))
    spark.udf.register("graft_kmv256",
      org.apache.spark.sql.functions.udaf(KmvSketchAggregator(256)))
    spark.udf.register("graft_kmvsample64",
      org.apache.spark.sql.functions.udaf(KmvSampleAggregator(64)))
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
