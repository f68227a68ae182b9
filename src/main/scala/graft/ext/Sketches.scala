package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Probabilistic-sketch operators — the sublinear-memory summaries a
  * 100 TB corpus pass uses where exact counting would shuffle the whole
  * vocabulary: count–min heavy hitters and HyperLogLog distinct
  * profiles. Both sketches are MERGEABLE (commutative-monoid merges),
  * which is the whole scale story: every partition builds a fixed-size
  * summary, merges are tree-reduced, and nothing data-sized ever
  * converges on one node.
  */
object Sketches {

  /** Count–min-sketch heavy hitters over whitespace tokens: one narrow
    * pass builds the fixed-width sketch (`eps` relative error,
    * `confidence` probability — Spark's CountMinSketch sizes it
    * width ⌈2/eps⌉ × depth ⌈log₂(1/(1−conf))⌉ counters, merged
    * per-partition), then the DISTINCT-token frame is
    * probed against the broadcast sketch and the top `k` estimates are
    * taken with a distributed TakeOrdered.
    *
    * The candidate set is the distinct-token table — sublinear in the
    * corpus by Heaps' law, and never collected to the driver: the probe
    * is a per-row map over the broadcast sketch (a deserialization
    * barrier, justified like the multimodal codec stage — the sketch is
    * a JVM object, not a Catalyst expression). The count–min guarantee
    * survives composition: estimate ≥ true count always, and
    * estimate ≤ true + eps·N w.p. ≥ confidence (N = total token
    * occurrences), so the returned top-k can only ADMIT a near-heavy
    * token, never drop a true heavy hitter below rank-k − eps·N.
    *
    * Output: (token, est_freq: long), est_freq desc, token asc tie-break.
    */
  def cmsTopTerms(df: DataFrame, textCol: String, k: Int,
                  eps: Double = 1e-4, confidence: Double = 0.99,
                  seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
    // treeAggregate, not DataFrameStatFunctions.countMinSketch: the stat
    // helper folds every partition's sketch on the driver one by one —
    // at 10k+ partitions that's 10k sequential MB-sized merges through
    // one node. The tree shape merges on executors first, so the driver
    // receives O(sqrt(partitions)) sketches; same bitwise result
    // (counter addition is commutative + associative).
    val sketch = toks.as[String].rdd.treeAggregate(
        org.apache.spark.util.sketch.CountMinSketch.create(eps, confidence, seed))(
      (s, t) => { s.add(t); s },
      (a, b) => { a.mergeInPlace(b); a })
    val bc = spark.sparkContext.broadcast(sketch)
    toks.distinct().as[String]
      .map(t => (t, bc.value.estimateCount(t)))
      .toDF("token", "est_freq")
      .orderBy(desc("est_freq"), asc("token"))
      .limit(k)
  }

  /** HyperLogLog corpus profile per group: total token occurrences plus
    * APPROXIMATE distinct-token and distinct-document counts
    * (`approx_count_distinct`, HLL++ at `rsd` relative standard
    * deviation — the fixed-memory path where [[graft.prep.Prep.profile]]'s
    * exact `count(DISTINCT)` would shuffle every distinct value). One
    * aggregate over the exploded token frame; every aggregate state is a
    * constant-size register bank, map-side combined.
    *
    * Output: (groupCol, n_tokens, approx_distinct_tokens, approx_docs).
    */
  def approxProfile(df: DataFrame, groupCol: String, idCol: String,
                    textCol: String, rsd: Double = 0.02): DataFrame =
    df.select(col(groupCol), col(idCol).as("_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("_t"))
      .filter(length(col("_t")) > 0)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_tokens"),
        approx_count_distinct(col("_t"), rsd).as("approx_distinct_tokens"),
        approx_count_distinct(col("_id"), rsd).as("approx_docs"))
}
