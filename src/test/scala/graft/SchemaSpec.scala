package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins [[graft.core.Tables.events]] against BOTH physical `ts` encodings
  * the driver has shipped across rounds:
  *
  *  - rounds ≤8: `timestamp[ns]` parquet, which `nanosAsLong=true` loads as
  *    a `Long` of epoch-nanos (Spark cannot WRITE ns parquet, so the fixture
  *    writes the Long column directly — byte-for-byte what that read yields);
  *  - round 9+: `timestamp[us]` parquet, which loads as TIMESTAMP_NTZ (or
  *    TIMESTAMP when the writer marked it UTC-adjusted).
  *
  * A driver-side re-encoding must degrade to a red test here, not to 64
  * silently-broken registry queries (the round-9 incident).
  */
class SchemaSpec extends SparkSpec {
  import graft.core.Tables

  // epoch micros with sub-second parts so truncation bugs can't hide
  private val micros = Seq(
    1700000000123456L, // 2023-11-14 22:13:20.123456 UTC
    1700000001999999L,
    1577836800000001L, // 2020-01-01 00:00:00.000001 UTC
    1500000000500000L)

  private def writeFixture(ts: DataFrame => DataFrame): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-schema").toString
    val base = micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us, s"e$i", i.toDouble) }
      .toDF("event_id", "us", "event_type", "value")
    ts(base).drop("us").write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def derived(dir: String): Seq[(Long, Long, Long)] =
    Tables.events(spark, dir)
      .select("event_id", "ts_sec", "ts_micro")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq

  private val expected = micros.zipWithIndex.map { case (us, i) =>
    (i.toLong, us / 1000000L, us)
  }

  test("events loader: legacy ns-as-long encoding yields exact ts_sec/ts_micro") {
    val dir = writeFixture(_.withColumn("ts", col("us") * lit(1000L)))
    val got = derived(dir)
    assert(got === expected)
  }

  test("events loader: raw Long µs/ms/s encodings unit-infer by magnitude") {
    // µs longs pass through exactly
    assert(derived(writeFixture(_.withColumn("ts", col("us")))) === expected)
    // ms longs lose the sub-ms residue (floor), gain it back as *1000
    val msExpected = micros.zipWithIndex.map { case (us, i) =>
      (i.toLong, us / 1000000L, us / 1000L * 1000L)
    }
    assert(derived(writeFixture(
      _.withColumn("ts", expr("us DIV 1000")))) === msExpected)
    // s longs floor to the second
    val sExpected = micros.zipWithIndex.map { case (us, i) =>
      (i.toLong, us / 1000000L, us / 1000000L * 1000000L)
    }
    assert(derived(writeFixture(
      _.withColumn("ts", expr("us DIV 1000000")))) === sExpected)
  }

  test("events loader: Long below the epoch window fails loudly, not wrongly") {
    val dir = writeFixture(_.withColumn("ts", lit(12345L)))
    val e = intercept[Exception](derived(dir))
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("unit unknown")), s"got $e")
  }

  test("events loader: mixed-unit Long column fails loudly, not normalized row-by-row") {
    // one epoch-ns row + one epoch-s row: column min/max land in two
    // magnitude windows, which is either a mixed-unit column or ns data
    // with pre-1973 instants — both must refuse, not silently normalize
    val dir = writeFixture(_.withColumn("ts",
      when(col("event_id") === 0L, col("us") * lit(1000L))
        .otherwise(expr("us DIV 1000000"))))
    val e = intercept[IllegalArgumentException](Tables.events(spark, dir))
    assert(e.getMessage.contains("magnitude windows"), s"got $e")
  }

  test("events loader: timestamp[us] NTZ encoding yields exact ts_sec/ts_micro") {
    val dir = writeFixture(
      _.withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType)))
    // confirm the fixture really exercises the timestamp branch
    val loaded = spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    assert(loaded === TimestampNTZType || loaded === TimestampType, s"fixture dtype $loaded")
    assert(derived(dir) === expected)
  }

  test("events loader: UTC-adjusted TIMESTAMP encoding yields exact ts_sec/ts_micro") {
    val dir = writeFixture(_.withColumn("ts", timestamp_micros(col("us"))))
    assert(derived(dir) === expected)
  }

  test("events loader: both encodings agree on the driver's live testdata shape") {
    // the real table must load and expose the canonical columns
    assume(new java.io.File("/root/testdata/sf0.001/events.parquet").exists())
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val row = ev.agg(
      count(lit(1)), min(col("ts_micro") - col("ts_sec") * 1000000L),
      max(col("ts_micro") - col("ts_sec") * 1000000L)).head()
    assert(row.getLong(0) > 0)
    // sub-second residue stays within [0, 1e6): ts_sec is the floor of micros
    assert(row.getLong(1) >= 0L && row.getLong(2) < 1000000L)
  }

  test("events loader: NTZ under a non-UTC session fails loudly, not shifted") {
    val dir = writeFixture(
      _.withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType)))
    val saved = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val e = intercept[IllegalArgumentException](Tables.events(spark, dir))
      assert(e.getMessage.contains("timeZone"))
    } finally spark.conf.set("spark.sql.session.timeZone", saved)
  }

  test("events loader: unsupported ts dtype fails loudly") {
    val dir = writeFixture(_.withColumn("ts", col("us").cast(StringType)))
    val e = intercept[IllegalArgumentException](derived(dir))
    assert(e.getMessage.contains("unsupported type"))
  }
}
