package graft.core

import org.apache.spark.sql.{Column, DataFrame}

/** Parallelism pinning for EXPLODING equi-joins (candidate-enumeration
  * shapes: LSH band self-joins, IVF cell joins, sign-bucket pair joins,
  * fingerprint/gram self-joins).
  *
  * Why this exists (r16, guide §2.5/§8): these joins' OUTPUT — the
  * candidate stream, Σ_keys occ(a)·occ(b) — is orders of magnitude
  * larger than their INPUT (narrow key rows). AQE sizes post-shuffle
  * partitions by INPUT bytes, so at bench scale it coalesces the join
  * exchange down to 1–2 partitions and the whole quadratic enumeration
  * runs on 1–2 cores (measured: the ×100 IVF join at 36 tasks/1 busy
  * core for a 1000 s exec; the LSH band join as 8 single-task jobs).
  * The optimizer cannot know output cardinality before running the
  * join; we do.
  *
  * `REPARTITION_BY_NUM` (an explicit numPartitions) is exempt from AQE
  * coalescing, and the count follows the EXECUTING cluster
  * (`defaultParallelism` — local[k] → k, a real cluster → total cores),
  * not a constant tuned to either. The ×4 multiplier smooths per-key
  * skew: candidate work is spread over many join-key values with mild
  * imbalance (measured max bucket 2582 of 1.5e9 LSH slots, hottest IVF
  * cell 263k of 127M), so hashing keys into a few hundred partitions
  * balances without salting. Inputs are linear in the corpus, so the
  * pinned shuffle itself stays one narrow linear pass at any scale.
  */
object Fanout {
  /** Multiplier over `defaultParallelism` for pinned exchanges. Default 4
    * (the r16 measured choice); `0` (or negative) disables pinning
    * entirely — deployments where the input partitioning is load-bearing
    * (the x_minhash_recall case) can turn it off without code changes.
    */
  val MultiplierConf = "spark.graft.fanout.multiplier"

  /** Hard cap on pinned partition count. On a very large cluster with a
    * small input, 4 × total-cores exchanges create thousands of
    * near-empty tasks per pinned join; the cap bounds that without
    * retuning every call site. Default unbounded (bench-comparable).
    */
  val MaxPartitionsConf = "spark.graft.fanout.maxPartitions"

  def pin(df: DataFrame, keys: Column*): DataFrame = {
    val sess = df.sparkSession
    val mult = sess.conf.get(MultiplierConf, "4").toInt
    if (mult <= 0) df
    else {
      val cap = sess.conf.get(MaxPartitionsConf, Int.MaxValue.toString).toInt
      val n = math.min(mult.toLong * sess.sparkContext.defaultParallelism,
        cap.toLong).toInt
      df.repartition(math.max(n, 1), keys: _*)
    }
  }
}
