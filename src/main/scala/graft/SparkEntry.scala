package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator declared in SURVEY.md §2 is exposed as a named query in
  * [[queries]] with (when SQL-expressible) a DuckDB oracle in [[oracleSql]].
  * The query definitions live in graft.queries.* grouped by fixture table.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Fact-fact join + hash aggregate (SURVEY §2.3 J6 / §2.5 A5). */
  def entry(spark: SparkSession): DataFrame =
    queries("q06_revenue_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.byName.map { case (n, q) => n -> q.build }

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
