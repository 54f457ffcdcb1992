package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One verifiable query: a Spark DataFrame program plus (when SQL-expressible)
  * the equivalent ANSI SQL the driver runs in DuckDB over the same parquet.
  *
  * Contract (see builder prompt): output column names must match the oracle's
  * exactly; results must be deterministic (every query ends in a total
  * ORDER BY mirrored in the SQL, and float aggregates use the exact-sum
  * helpers below so both engines produce bit-identical doubles).
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object QueryDsl {
  /** Sum a 2-decimal money double exactly: `round(x*100)` is an integer-valued
    * double (exact in IEEE754 up to 2^53), so the sum is associative and
    * bit-identical across Spark and DuckDB regardless of partitioning /
    * aggregation order. Dividing once at the end returns to the money scale.
    * At 100 TB this matters: partial aggregation order is nondeterministic,
    * so naive double sums can't hash-match an oracle.
    */
  def exactSum(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    sum(round(c * lit(p), 0)) / lit(p)
  }
  /** SQL twin of [[exactSum]] for the DuckDB oracle. */
  def exactSumSql(expr: String, scale: Int): String = {
    val p = math.pow(10, scale).toLong
    s"sum(round(($expr) * $p.0)) / $p.0"
  }
  /** Exact average built on the exact sum (same double in both engines). */
  def exactAvg(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    sum(round(c * lit(p), 0)) / lit(p) / count(c)
  }
  def exactAvgSql(expr: String, scale: Int): String = {
    val p = math.pow(10, scale).toLong
    s"sum(round(($expr) * $p.0)) / $p.0 / count($expr)"
  }
}

/** Full registry; SparkEntry exposes these as `queries` + `oracleSql`. */
object Registry {
  lazy val all: Seq[Q] =
    StarQueries.all ++ EventQueries.all ++ DocQueries.all ++
      EmbeddingQueries.all ++ YarkQueries.all ++ ExtraQueries.all ++
      CurationQueries.all ++ GraphQueries.all ++ OpsQueries.all

  lazy val byName: Map[String, Q] = {
    val m = all.map(q => q.name -> q).toMap
    require(m.size == all.size, "duplicate query names in registry")
    m
  }
}
