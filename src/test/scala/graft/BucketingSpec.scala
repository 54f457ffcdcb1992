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

  /** The 100 TB ANN storage layout (pairs with Similarity.ivfPqSearch):
    * the embedding corpus written PARTITIONED BY its IVF list id, so a
    * probed-list read prunes whole directories at the FileScan — the
    * probe set must cut the SCAN, not arrive as a post-scan filter. The
    * gate is behavioral, not just plan-string: an unprobed partition
    * directory is poisoned with a non-parquet file, so if the scan ever
    * opened anything outside the probed lists the count would throw. */
  test("IVF-partitioned embedding layout: probed-list read prunes " +
      "directories at the scan (PartitionFilters + poison-file proof)") {
    import spark.implicits._
    import graft.operators.Similarity
    val sf = "/root/testdata/sf0.001"
    val e = Tables.embeddings(spark, sf)
    val cents = e.orderBy($"vec_id").limit(8)
      .select($"vec_id".as("c_id"), Similarity.vecD($"embedding").as("cv"))
      .localCheckpoint(true)
    val assigned = Similarity.ivfAssign(e, "vec_id", "embedding", cents)
      .select($"vec_id", $"centroid".as("list"))
      .localCheckpoint(true)
    val dir = Files.createTempDirectory("graft_ivf_layout").toString
    e.join(assigned, Seq("vec_id"))
      .write.mode("overwrite").partitionBy("list").parquet(dir)
    // probe step (ivfPqSearch's): the 2 lists nearest the query — at
    // serving time the probe set is driver-known and parameterizes the
    // scan, so collecting the 2 ids here is the real access pattern
    val qv = e.orderBy($"vec_id".desc).limit(1)
      .select($"vec_id".as("q_id"), Similarity.vecD($"embedding").as("qv"))
    val probed = cents.crossJoin(broadcast(qv))
      .withColumn("qc", round(Similarity.cosine($"cv", $"qv"), 6))
      .orderBy($"qc".desc, $"c_id".asc).limit(2)
      .select($"c_id").collect().map(_.getLong(0)).toSeq
    val expected = assigned.filter($"list".isin(probed: _*)).count()
    val schema = spark.read.parquet(dir).schema // captured pre-poison
    val unprobed = assigned.select($"list").distinct()
      .collect().map(_.getLong(0)).filterNot(probed.contains)
    assert(unprobed.nonEmpty, "fixture degenerate: every list probed")
    Files.write(
      java.nio.file.Paths.get(dir, s"list=${unprobed.head}",
        "part-99999-poison.snappy.parquet"),
      "not a parquet file".getBytes)
    val probedRead = spark.read.schema(schema).parquet(dir)
      .filter($"list".isin(probed: _*))
    val p = probedRead.queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.matches("(?s).*PartitionFilters: \\[[^\\]]*list[^\\]]*\\].*"),
      s"probe filter did not reach PartitionFilters:\n$p")
    assert(probedRead.count() === expected) // poison never opened
  }
}
