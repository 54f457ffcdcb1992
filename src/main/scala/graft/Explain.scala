package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    for (n <- Seq("q02_filtered_scan","q05_join_dims","q31_similarity_join")) {
      println(s"==== $n")
      println(SparkEntry.queries(n)(spark, sf).queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
