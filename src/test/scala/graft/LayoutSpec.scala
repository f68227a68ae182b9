package graft

import org.apache.spark.sql.functions._

import graft.core.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val left = (0 until 2000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (0 until 2000).map(i => (i.toLong, i * 2.0)).toDF("k", "rv")
    Layout.writeBucketed(left, "graft_bucket_left", 4, "k")
    Layout.writeBucketed(right, "graft_bucket_right", 4, "k")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("graft_bucket_left")
        .join(spark.table("graft_bucket_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n${plan.take(800)}")
      assert(joined.count() == 2000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("salted join equals the plain join on skewed data") {
    // pathological skew: 90% of the big side shares one key
    val big = (0 until 5000).map(i => (if (i % 10 == 0) i.toLong % 7 else 1L, i.toLong))
      .toDF("k", "payload")
    val small = (0L to 6L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = big.join(small, "k")
    val salted = Layout.saltedJoin(big, small, "k", saltFactor = 8, col("payload"))
    assert(salted.count() == plain.count())
    val a = plain.groupBy("k").count().orderBy("k").as[(Long, Long)].collect().toSeq
    val b = salted.groupBy("k").count().orderBy("k").as[(Long, Long)].collect().toSeq
    assert(a == b)
    // and the salt spreads the hot key across partitions pre-join
    val saltSpread = big.filter(col("k") === 1L)
      .withColumn("_salt", pmod(hash(col("payload")), lit(8)))
      .select(countDistinct("_salt")).as[Long].head()
    assert(saltSpread == 8)
  }
}
