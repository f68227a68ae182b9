package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout helpers for the 100 TB posture (DESIGN.md):
  * bucketed co-located joins and salt-based skew mitigation.
  */
object Layout {

  /** Persist a table bucketed + sorted by its join key. Two tables
    * bucketed the same way join WITHOUT a shuffle (the scan itself
    * reports the hash partitioning) — the pre-shuffle trade: pay the
    * shuffle once at write time, amortize over every later join.
    * BucketingSpec asserts the exchange-free plan.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, key: String,
                    moreKeys: String*): Unit = {
    val spark = df.sparkSession
    // A managed-table location can survive a previous JVM whose in-memory
    // catalog is gone; saveAsTable then fails with LOCATION_ALREADY_EXISTS
    // even in overwrite mode. Drop the entry and clear the ORPHAN path —
    // but never the data of a live EXTERNAL table that happens to sit at
    // the warehouse path: dropping it removes only metadata, and the
    // subsequent saveAsTable fails loudly rather than clobbering data this
    // catalog does not own.
    val isExternal = spark.catalog.tableExists(table) &&
      spark.catalog.getTable(table).tableType == "EXTERNAL"
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    if (!isExternal) {
      val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      val loc = new org.apache.hadoop.fs.Path(s"$warehouse/$table")
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    df.write.mode("overwrite")
      .bucketBy(buckets, key, moreKeys: _*).sortBy(key, moreKeys: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Skew-safe equi-join: replicate the small side `saltFactor`× and
    * scatter the big side's hot keys across the replicas. AQE's skew-join
    * split handles moderate skew automatically; explicit salting is for
    * the pathological single-hot-key case (a null-ish sentinel key, one
    * giant customer) where one partition would otherwise hold a large
    * fraction of the data. Deterministic: the salt derives from hashed
    * row content, not rand().
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int, bigSaltSource: Column): DataFrame = {
    val salted = big.withColumn("_salt", pmod(hash(bigSaltSource), lit(saltFactor)))
    val replicated = small
      .withColumn("_salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Training-corpus shard writer: assign every row to one of `numShards`
    * shards by the SQL-portable [[graft.prep.Prep.portableHash]] of its
    * id and write one directory per shard
    * (`path/shard=N/part-*.parquet`) — the deterministic, re-derivable
    * layout a downstream training job reads shard-by-shard. The
    * repartition puts each shard's rows in one task, so a shard
    * directory gets ONE file instead of one per upstream task (a 100 TB
    * corpus written from 10k tasks into 1k shards would otherwise
    * produce 10M small files — the classic small-files failure).
    * Readers re-derive the assignment from the id alone, in Spark or any
    * ANSI SQL engine. Inherits [[graft.prep.Prep.portableHash]]'s
    * |id| < 2^31 precondition — an out-of-range id silently wraps under
    * non-ANSI arithmetic and the external re-derivation no longer
    * matches.
    */
  def writeShards(df: DataFrame, path: String, idCol: String,
                  numShards: Int): Unit =
    df.withColumn("shard", pmod(graft.prep.Prep.portableHash(col(idCol)), lit(numShards.toLong)))
      .repartition(numShards, col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
}
