package graft

import org.apache.spark.sql.execution.FormattedMode

/** Dev-only: dump a query's formatted plan (sbt "Test/runMain graft.PlanProbe qNN"). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    args.foreach { q =>
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}
