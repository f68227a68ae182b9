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

  test("writeBucketed never deletes an external table's data at the warehouse path") {
    val name = "graft_external_guard"
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val extDir = java.nio.file.Paths.get(warehouse, name)
    // user-owned external parquet data sitting AT the warehouse path
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    Seq((1L, "keep-me")).toDF("k", "v").write.mode("overwrite")
      .parquet(extDir.toString)
    spark.sql(s"CREATE TABLE `$name` (k BIGINT, v STRING) USING parquet " +
      s"LOCATION '${extDir.toString}'")
    assert(spark.catalog.getTable(name).tableType == "EXTERNAL")
    // overwrite must refuse (location occupied by data we don't own) …
    intercept[Exception] {
      Layout.writeBucketed(Seq((2L, "clobber")).toDF("k", "v"), name, 2, "k")
    }
    // … and the external data must survive
    val survived = spark.read.parquet(extDir.toString)
      .as[(Long, String)].collect().toSeq
    assert(survived == Seq((1L, "keep-me")))
    // cleanup: drop metadata (external → data untouched), then the files
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    org.apache.commons.io.FileUtils.deleteDirectory(extDir.toFile)
  }

  test("withInFilePosition tags the partition id it documents") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pos").toString
    (0 until 4).foreach { f =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, s"part-$f.csv"),
        (0 until 10).map(i => s"${f * 10 + i}\t$i").mkString("\n"))
    }
    val df = graft.io.Sources.directoryCsv(spark, s"$dir/*.csv",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.LongType))))
    val out = graft.io.Sources.withInFilePosition(df)
    assert(out.columns.contains("pos") && out.columns.contains("pos_part"))
    // per (file, partition) the positions are a dense 0..n-1 counter
    val rows = out.select("_file", "pos", "pos_part").collect()
    rows.groupBy(r => (r.getString(0), r.getInt(2))).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (0L until rs.length).toSeq)
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
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

  test("writeShards: one re-derivable parquet directory per shard, one file each") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val df = (0L until 500L).map(i => (i, s"payload-$i")).toDF("id", "text")
    Layout.writeShards(df, dir, "id", numShards = 8)
    val back = spark.read.parquet(dir)
    assert(back.count() == 500)
    // the assignment is re-derivable from the id alone (the portable-hash
    // contract) — stored shard must equal the recomputed one
    val mismatches = back.filter(
      col("shard") =!= pmod(graft.prep.Prep.portableHash(col("id")), lit(8L))).count()
    assert(mismatches == 0)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.length == 8 && dirs.forall(_.startsWith("shard=")))
    // repartition(shard) coalesced each shard into a single data file
    dirs.foreach { s =>
      val files = new java.io.File(s"$dir/$s").listFiles()
        .filter(f => f.getName.endsWith(".parquet"))
      assert(files.length == 1, s"$s has ${files.length} files")
    }
  }
}
