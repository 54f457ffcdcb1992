package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §4 / 100 TB stance — co-located joins via bucketing: writing
  * both fact tables bucketed on the join key lets the join run with NO
  * shuffle exchange (each bucket pair joins locally). This is the
  * pre-partitioning strategy for repeated fact-fact joins at scale. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val sf = "/root/testdata/sf0.001" // warehouse dir is temp (TestSpark)
    Tables.lineitem(spark, sf).write.mode("overwrite")
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    Tables.orders(spark, sf).write.mode("overwrite")
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not introduce Exchange on either side
      val joinSection = plan.split("HashAggregate").last
      assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey") &&
        !joinSection.contains("Exchange hashpartitioning(o_orderkey"),
        s"unexpected shuffle in bucketed join plan:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
