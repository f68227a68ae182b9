package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  *  - Brute-force cosine top-k: the exact baseline — one scan, a dot
  *    product per row via codegen'd higher-order functions, then a top-k.
  *  - LSH-bucketed (random hyperplane signs): the scale path — candidates
  *    share a signature bucket; exact re-scoring only inside buckets.
  *
  * 100 TB shape: brute force is scan-bound (good when the query set is
  * tiny and one pass is acceptable); LSH turns the all-pairs O(n²) into
  * per-bucket work with one shuffle on the signature.
  */
object Similarity {

  /** Dot product of two double arrays — zip_with + aggregate, codegen'd. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by cosine against one query vector (literal array,
    * shipped in the plan — no join). `orderBy(desc).limit(k)` is a
    * distributed TakeOrdered: per-partition top-k then a k-row merge on
    * the driver — no full sort.
    */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     query: Array[Double], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    val vecD = col(vecCol).cast("array<double>")
    df.select(col(idCol), cosine(vecD, q).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  /** Random-hyperplane signature: `bits` sign bits of projections onto
    * deterministic pseudo-random hyperplanes (seeded hash of position —
    * reproducible across runs without shipping a matrix).
    */
  def hyperplaneSignature(vec: Column, dim: Int, bits: Int): Column = {
    val vecD = vec.cast("array<double>")
    val proj = (0 until bits).map { b =>
      // hyperplane component h(b, i) in [-1, 1): derived from xxhash64(b, i)
      val terms = aggregate(
        zip_with(vecD, sequence(lit(0), lit(dim - 1)),
          (v, i) => v * (pmod(xxhash64(lit(b), i), lit(2000)).cast("double") / 1000.0 - 1.0)),
        lit(0.0), (acc, v) => acc + v)
      when(terms >= 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    proj.reduce((a, c) => a.bitwiseOR(c))
  }

  /** ANN via LSH buckets: same-signature rows are candidates; exact cosine
    * re-ranking inside buckets against the query's signature bucket union
    * of Hamming-1 neighbors would raise recall — here the baseline variant
    * joins on exact signature equality.
    */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
              query: Array[Double], dim: Int, bits: Int, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val qDf = Seq(1).toDF("_one").select(
      hyperplaneSignature(array(query.map(lit): _*), dim, bits).as("_qsig"))
    val sigs = df.withColumn("_sig", hyperplaneSignature(col(vecCol), dim, bits))
    sigs.join(broadcast(qDf), col("_sig") === col("_qsig"))
      .select(col(idCol),
        cosine(col(vecCol).cast("array<double>"), array(query.map(lit): _*)).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  /** IVF (inverted-file) ANN: a KMeans coarse quantizer assigns every
    * vector to one of `nlist` cells; a query probes only its `nprobe`
    * nearest cells and re-ranks exactly inside them. The standard
    * FAISS-style scale path: at 100 TB the assignment is one narrow pass
    * (broadcast centroids), the index is a bucket-partitioned table, and
    * a query touches ~nprobe/nlist of the data.
    *
    * Returns (assigned table with `ivf_cell`, trained model) — build once,
    * query many times via [[ivfTopK]].
    */
  def ivfIndex(df: DataFrame, vecCol: String, nlist: Int, seed: Long = 42L):
      (DataFrame, org.apache.spark.ml.clustering.KMeansModel) = {
    import org.apache.spark.ml.functions.array_to_vector
    // Spherical quantization: cluster L2-NORMALIZED vectors, because the
    // search metric is cosine — L2 cells over raw magnitudes would send a
    // high-cosine, different-magnitude vector to a far cell the query
    // never probes. Ranking still uses the original vectors (cosine is
    // magnitude-invariant). Nulls are excluded up front (KMeans.fit
    // throws on a null feature; the brute-force path just sorts them last).
    val vecD = col(vecCol).cast("array<double>")
    val unit = transform(vecD, v => v / sqrt(aggregate(
      zip_with(vecD, vecD, (a, b) => a * b), lit(0.0), (acc, x) => acc + x)))
    val withVec = df.filter(col(vecCol).isNotNull)
      .withColumn("_ivf_v", array_to_vector(unit))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val km = new org.apache.spark.ml.clustering.KMeans()
      .setK(nlist).setSeed(seed).setFeaturesCol("_ivf_v").setPredictionCol("ivf_cell")
      .fit(withVec)
    val assigned = km.transform(withVec).drop("_ivf_v")
    (assigned, km)
  }

  def ivfTopK(assigned: DataFrame, km: org.apache.spark.ml.clustering.KMeansModel,
              idCol: String, vecCol: String, query: Array[Double],
              nprobe: Int, k: Int): DataFrame = {
    val qn = math.sqrt(query.map(x => x * x).sum)
    val qUnit = org.apache.spark.ml.linalg.Vectors.dense(query.map(_ / qn))
    val probes = km.clusterCenters.zipWithIndex
      .sortBy { case (c, _) => org.apache.spark.ml.linalg.Vectors.sqdist(c, qUnit) }
      .take(nprobe).map(_._2)
    bruteForceTopK(
      assigned.filter(col("ivf_cell").isin(probes.map(Integer.valueOf): _*)),
      idCol, vecCol, query, k)
  }

  /** Embedding-cosine near-duplicate pairs above `minCos`, restricted to a
    * candidate id range (all-pairs within the range — the exact
    * verification shape; candidate generation at scale comes from
    * [[hyperplaneSignature]] bucketing).
    */
  def cosineNearDuplicates(df: DataFrame, idCol: String, vecCol: String,
                           minCos: Double): DataFrame = {
    val a = df.select(col(idCol).as("id1"), col(vecCol).cast("array<double>").as("_v1"))
    val b = df.select(col(idCol).as("id2"), col(vecCol).cast("array<double>").as("_v2"))
    a.join(b, col("id1") < col("id2"))
      .withColumn("cos", cosine(col("_v1"), col("_v2")))
      .filter(col("cos") > minCos)
      .select("id1", "id2", "cos")
  }
}
