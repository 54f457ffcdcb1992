package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection tool: dump the optimized/physical plan of any
  * registered query (pushdown, broadcast direction, exchange count —
  * the things PlanQualitySpec asserts, readable by a human).
  *
  * Usage: runMain graft.Explain [queryName ...] [sfDir]
  * With no args, dumps a representative trio.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (names, sf) = {
      val (qs, dirs) = args.partition(a => !a.startsWith("/"))
      (if (qs.nonEmpty) qs.toSeq
       else Seq("q02_filtered_scan", "q05_join_dims", "q31_similarity_join"),
        dirs.headOption.getOrElse("/root/testdata/sf0.01"))
    }
    for (n <- names) {
      println(s"==== $n")
      SparkEntry.queries.get(n) match {
        case Some(q) => println(q(spark, sf).queryExecution.explainString(
          org.apache.spark.sql.execution.SimpleMode))
        case None => println(s"unknown query: $n (see SparkEntry.queries)")
      }
    }
    spark.stop()
  }
}
