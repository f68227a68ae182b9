package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.configure(SparkSession.builder()
      .master("local[16]").config("spark.sql.shuffle.partitions", "16")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val timeKnn = args.contains("-knn")
    args.filterNot(_ == "-knn").foreach { d =>
      val emb = graft.core.Tables.embeddings(spark, d)
      val n = emb.count()
      val planes = graft.ext.Similarity.autoPlanes(n, 64L, 6)
      val hist = graft.ext.Similarity.signBuckets(emb, "vec_id", "embedding", 64, planes)
        .groupBy("bucket").count()
      val stats = hist.agg(count(lit(1)).as("n_buckets"), max("count").as("max_occ"),
        avg("count").as("avg_occ"),
        sum(col("count") * (col("count") - 1) / 2).as("pair_work")).head()
      val top = hist.orderBy(desc("count")).limit(10).collect().map(_.getLong(1)).mkString(",")
      println(s"[probe] $d n=$n planes=$planes buckets=${stats.getLong(0)} " +
        s"maxOcc=${stats.getLong(1)} avgOcc=${f"${stats.getDouble(2)}%.1f"} " +
        s"pairWork=${stats.getDouble(3).toLong} top10=$top")
      if (timeKnn) {
        val t0 = System.nanoTime()
        val rows = graft.ext.Similarity.knnJoinAdaptive(emb, "vec_id", "embedding", 64, k = 3)
          .count()
        println(f"[probe] $d knnJoinAdaptive rows=$rows ${(System.nanoTime() - t0) / 1e9}%.1fs")
      }
    }
    spark.stop()
  }
}
