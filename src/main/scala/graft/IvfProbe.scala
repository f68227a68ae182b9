package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Standalone IVF-lane timing probe (diagnostic main, not a registry
  * row): runs the deterministic pinned-auto IVF kNN self-join — the
  * `x_ivf_knn_join_auto_pinned` path, no KMeans fit — end-to-end on a
  * testdata dir and prints stage timings. Used to isolate the r14
  * finding that the composed probe-selection expression melted under
  * CollapseProject + join-filter duplication (117 s of a 143 s sf1 row
  * in the candidate join alone); kept so the next plan regression in
  * this lane can be bisected without driving the whole bench.
  */
object IvfProbe {
  def t[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      // a probe run should SCREAM on a codegen failure, not silently
      // price the interpreted fallback as a lane regression
      .config("spark.sql.codegen.fallback", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args(0)
    val emb = graft.core.Tables.embeddings(spark, d).cache()
    println(s"[probe] n=${emb.count()}")
    val out = graft.ext.Similarity.ivfKnnJoinPinnedAuto(
      emb, "vec_id", "embedding", nprobe = 2, k = 3)
    if (args.length > 1 && args(1) == "explain") out.explain("formatted")
    t("pinned-auto warm") { println("[probe] rows=" + out.count()) }
    t("pinned-auto rep2") { out.count() }
    t("pinned-auto rep3") { out.count() }
    spark.stop()
  }
}
