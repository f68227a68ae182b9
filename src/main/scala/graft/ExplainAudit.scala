package graft
import org.apache.spark.sql.SparkSession
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.configure(SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    for (name <- Seq("s3_pruned_scan", "q5_revenue_by_nation", "q1_pricing_summary", "w1_sliding_windows", "a1_downsample")) {
      println(s"========== $name ==========")
      println(SparkEntry.queries(name)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
