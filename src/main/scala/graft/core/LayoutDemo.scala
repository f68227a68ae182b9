package graft.core
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable demo of the layout helpers: prints the bucketed-join physical
  * plan (expected: SortMergeJoin, zero Exchange) and the salted-join
  * equivalence counts on skewed data.
  */
object LayoutDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.configure(SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", "/tmp/graft_io/demo_warehouse"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
    val o = Tables.orders(spark, "/root/testdata/sf0.01")
    Layout.writeBucketed(li.select("l_orderkey", "l_quantity"), "demo_li", 8, "l_orderkey")
    Layout.writeBucketed(o.select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey"), "demo_o", 8, "l_orderkey")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = spark.table("demo_li").join(spark.table("demo_o"), "l_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    println("=== bucketed join plan (first 40 lines) ===")
    println(plan.linesIterator.take(40).mkString("\n"))
    println(s"exchange_free=${!plan.contains("Exchange")} rows=${joined.count()}")

    val skewed = (0 until 50000).map(i => (if (i % 10 == 0) i.toLong % 7 else 1L, i.toLong)).toDF("k", "p")
    val dim = (0L to 6L).map(k => (k, s"d$k")).toDF("k", "n")
    val plainCount = skewed.join(dim, "k").count()
    val saltedCount = Layout.saltedJoin(skewed, dim, "k", 8, col("p")).count()
    println(s"plain=$plainCount salted=$saltedCount equal=${plainCount == saltedCount}")
    spark.stop()
  }
}
