package graft

import org.apache.spark.sql.functions._

/** Pins the ScaleGen invariants the scale studies lean on: every replica
  * gets a DISTINCT length-preserving transform (no manufactured
  * cross-replica exact duplicates), ids stay unique even when output is
  * scaled again, and the embedding transform preserves within-replica
  * geometry.
  */
class ScaleGenSpec extends SparkSpec {
  import spark.implicits._

  test("affineAlphabet: 312 distinct maps, pairwise agreement <= 2 letters, r=0 identity") {
    val maps = (0 until ScaleGen.MaxDocFactor).map(ScaleGen.affineAlphabet)
    assert(maps.head == "abcdefghijklmnopqrstuvwxyz" + "ABCDEFGHIJKLMNOPQRSTUVWXYZ")
    assert(maps.distinct.size == ScaleGen.MaxDocFactor)
    maps.foreach(m => assert(m.toLowerCase.toSet.size == 26, s"not a permutation: $m"))
    for (i <- maps.indices; j <- (i + 1) until maps.size) {
      val agree = maps(i).zip(maps(j)).count { case (a, b) => a == b }
      assert(agree <= 4, s"maps $i,$j agree on $agree chars") // ≤2 lower + ≤2 upper
    }
  }

  test("scaleDocuments factor>26: ids unique, no cross-replica text twins, lengths kept") {
    val docs = Seq(
      (0L, "The quick brown Fox jumps over the lazy dog 42 times."),
      (1L, "pack my box with five dozen liquor jugs"),
      (2L, "pack my box with five dozen liquor jugs") // intra-replica dup, must replicate
    ).toDF("doc_id", "text")
    val out = ScaleGen.scaleDocuments(docs, 30).cache()
    assert(out.count() == 90)
    assert(out.select("doc_id").distinct().count() == 90)
    // each replica keeps exactly one dup pair; no extra cross-replica equality
    assert(out.select("text").distinct().count() == 60)
    assert(out.select(length($"text")).distinct().count() ===
      docs.select(length($"text")).distinct().count())
    out.unpersist()
  }

  test("scaleEvents chains: stride derives from max id, 3x then 3x stays unique") {
    val ev = Seq((0L, 5L), (999999L, 7L)).toDF("event_id", "user_id")
    val once = ScaleGen.scaleEvents(ev, 3)
    val twice = ScaleGen.scaleEvents(once, 3).cache()
    assert(twice.count() == 18)
    assert(twice.select("event_id").distinct().count() == 18)
    assert(twice.select("user_id").distinct().count() == 18)
    twice.unpersist()
  }

  test("scaleEmbeddings factor>dim: distinct vectors, norm and within-replica cosine kept") {
    val emb = Seq(
      (0L, Array(1f, 2f, 3f, 4f)),
      (1L, Array(4f, -3f, 2f, -1f))
    ).toDF("vec_id", "embedding")
    val out = ScaleGen.scaleEmbeddings(emb, 8).cache() // dim=4 → 8 transforms, all used
    assert(out.count() == 16)
    assert(out.select("vec_id").distinct().count() == 16)
    assert(out.select("embedding").distinct().count() == 16)
    val rows = out.orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def norm(v: Array[Float]) = math.sqrt(v.map(x => x.toDouble * x).sum)
    def cos(u: Array[Float], v: Array[Float]) =
      u.zip(v).map { case (a, b) => a.toDouble * b }.sum / (norm(u) * norm(v))
    val base = rows.filter(_._1 < 2).map(_._2)
    val baseCos = cos(base(0), base(1))
    // base ids are 0/1, so strideFor resolves to the 1e6 floor: replica = id/1e6
    rows.groupBy(_._1 / 1000000L).values.foreach { rep =>
      val Array(u, v) = rep.sortBy(_._1).map(_._2)
      assert(math.abs(norm(u) - norm(base(0))) < 1e-5)
      assert(math.abs(cos(u, v) - baseCos) < 1e-6, "within-replica cosine changed")
    }
    out.unpersist()
  }
}
