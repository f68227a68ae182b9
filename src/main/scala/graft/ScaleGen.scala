package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: build an N× scale-up of a testdata directory so the scale
  * posture the plans *claim* can be *measured* (the round-8 verdict's
  * "prove the lane at 10× scale" lead). `runMain graft.ScaleGen [srcDir]
  * [dstDir] [factor]` — defaults: /root/testdata/sf0.1 →
  * target/testdata/sf1 ×10 (repo-local, gitignored; /root/testdata is
  * read-only).
  *
  * What scales and how (the corpus tables the dedup/winnow/text/window
  * lanes read):
  *
  *  - `documents` ×N: replica r remaps `doc_id += r·1e6` and applies a
  *    per-replica alphabet rotation (`translate` by r positions, case
  *    preserved). Rotation is length-preserving, so token counts, text
  *    statistics, and the WITHIN-replica duplicate/near-duplicate
  *    structure are replicated exactly — while cross-replica k-gram
  *    equality is destroyed (every letter differs), so candidate pairs
  *    grow ×N, not ×N² as naive copies would (10 verbatim copies give
  *    each doc 9 cross-replica twins → 45 extra pairs per original
  *    pair-group, a workload the real corpus doesn't have).
  *  - `events` ×N: `event_id`/`user_id` += r·1e6, ts/value/props kept —
  *    per-user session and funnel shapes replicate, user cardinality ×N.
  *  - `embeddings` ×N: `vec_id` += r·1e6 and replica r left-rotates the
  *    vector by r coordinates. Rotation is norm-preserving and
  *    within-replica cosine-invariant (same permutation both sides), so
  *    each replica keeps the original cluster geometry; cross-replica
  *    similarity collapses to noise instead of N exact twins per vector.
  *  - TPC-H tables pass through unchanged: the corpus lanes are what the
  *    10× proof targets; FK-consistent TPC-H scaling is the driver's job
  *    (real sf1 generation), not worth re-deriving here.
  */
object ScaleGen {

  private val Lower = "abcdefghijklmnopqrstuvwxyz"
  private val Upper = Lower.toUpperCase

  /** Alphabet rotated r positions, lower+upper halves rotated together. */
  private def rotatedAlphabet(r: Int): String = {
    val k = ((r % 26) + 26) % 26
    (Lower.drop(k) + Lower.take(k)) + (Upper.drop(k) + Upper.take(k))
  }

  private val IdStride = 1000000L

  /** documents ×factor with per-replica letter rotation (see object doc). */
  def scaleDocuments(docs: DataFrame, factor: Int): DataFrame = {
    val rots = array((0 until factor).map(r => lit(rotatedAlphabet(r))): _*)
    replicate(docs, factor)
      .withColumn("doc_id", col("doc_id") + col("_rep") * IdStride)
      // translate's matching/replace args need not be foldable: the
      // per-replica alphabet is picked per row from a 10-element literal
      // array (StringTranslate rebuilds its dict only when the value
      // changes, and rows arrive replica-clustered from the replicate
      // crossJoin, so the rebuild is per-partition-rare, not per-row)
      // functions.translate only takes literal match/replace strings; the
      // SQL builtin accepts per-row columns — call it directly
      .withColumn("text",
        call_function("translate", col("text"), lit(Lower + Upper),
          element_at(rots, col("_rep").cast("int") + 1)))
      .drop("_rep")
  }

  /** events ×factor: id remap only — time structure is the workload. */
  def scaleEvents(events: DataFrame, factor: Int): DataFrame =
    replicate(events, factor)
      .withColumn("event_id", col("event_id") + col("_rep") * IdStride)
      .withColumn("user_id", col("user_id") + col("_rep") * IdStride)
      .drop("_rep")

  /** embeddings ×factor with per-replica coordinate rotation. */
  def scaleEmbeddings(emb: DataFrame, factor: Int): DataFrame =
    replicate(emb, factor)
      .withColumn("vec_id", col("vec_id") + col("_rep") * IdStride)
      .withColumn("embedding",
        when(col("_rep") === 0, col("embedding")).otherwise(
          concat(
            slice(col("embedding"), col("_rep").cast("int") + 1,
              size(col("embedding")) - col("_rep").cast("int")),
            slice(col("embedding"), lit(1), col("_rep").cast("int")))))
      .drop("_rep")

  /** Cross join with a broadcast replica spine — N× rows, one narrow
    * stage, no shuffle; replica id in `_rep` for the per-table remaps.
    */
  private def replicate(df: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spine = df.sparkSession.range(factor).select(col("id").as("_rep"))
    df.crossJoin(broadcast(spine))
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = if (args.length > 1) args(1) else "target/testdata/sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = graft.core.GraftSession.local()
    val t0 = System.nanoTime()

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      val n = spark.read.parquet(s"$dst/$name.parquet").count()
      println(f"[scalegen] $name%-12s rows=$n%-9d -> $dst/$name.parquet")
    }

    write("documents", scaleDocuments(core.Tables.documents(spark, src), factor))
    write("events", scaleEvents(core.Tables.load(spark, src, "events"), factor))
    write("embeddings", scaleEmbeddings(core.Tables.embeddings(spark, src), factor))
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach(t => write(t, core.Tables.load(spark, src, t)))

    println(f"[scalegen] done ×$factor from $src in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    spark.stop()
  }
}
