package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Indexing
import graft.eval.Eval
import graft.io.Sources
import graft.prep.Prep
import graft.window.Windows

/** Golden end-to-end tests on reference-SHAPED fixtures (FIXTURES.md):
  * bearing-style headerless TSV files named by timestamp, and KBM-style
  * CSV with embedded tag values and sub-second timestamps. Data is
  * synthetic (seeded) — shapes and semantics mirror the reference.
  */
class ReferencePipelineSpec extends SparkSpec {
  import spark.implicits._

  private def writeBearingFixture(dir: String): Unit = {
    val base = Paths.get(dir)
    Files.createDirectories(base)
    val rnd = new scala.util.Random(42)
    // 3 files x 200 rows x 4 channels; file 3 carries an amplitude spike
    val names = Seq("2004.02.12.10.32.39", "2004.02.12.10.42.39", "2004.02.12.10.52.39")
    names.zipWithIndex.foreach { case (name, fi) =>
      val rows = (0 until 200).map { i =>
        (0 until 4).map { c =>
          val amp = if (fi == 2 && c == 1) 5.0 else 1.0
          val v = amp * math.sin(2 * math.Pi * i / 20.0) + rnd.nextGaussian() * 0.05
          f"$v%.6f"
        }.mkString("\t")
      }
      Files.write(base.resolve(name), rows.mkString("\n").getBytes)
    }
  }

  test("bearing pipeline: directory scan -> filename ts -> idx -> resample -> window -> threshold") {
    val dir = "/tmp/graft_io/test_bearing"
    writeBearingFixture(dir)
    val schema = StructType((0 until 4).map(i => StructField(s"c$i", DoubleType)))
    // S2+S4: headerless TSV directory scan with per-file identity
    val raw = Sources.directoryCsv(spark, s"$dir/*", schema, sep = "\t")
    // S5: filename IS the measurement timestamp
    val withTs = Sources.withFilenameTimestamp(Sources.withInFilePosition(raw))
    assert(withTs.select(countDistinct("file_ts")).as[Long].head() == 3)
    assert(withTs.filter(col("file_ts").isNull).count() == 0)
    // ordering contract: explicit contiguous idx by (file_ts, in-file pos)
    val indexed = Indexing.withOrderedIdx(withTs, "idx", col("file_ts"), col("pos"))
    assert(indexed.count() == 600)
    assert(indexed.agg(max("idx")).as[Long].head() == 599)
    // A1: mean-downsample by 10 -> 60 rows
    val down = Prep.downsample(indexed, "idx", 10, Seq("c0", "c1", "c2", "c3"))
    assert(down.count() == 60)
    // R1: stack channels; W1: window the stacked series
    val stacked = Prep.stackChannels(
      down.withColumnRenamed("grp", "idx"), "idx", Seq("c0", "c1", "c2", "c3"))
    val wins = Windows.slidingWindows(
      stacked.withColumnRenamed("global_idx", "gidx"), "gidx", "value", 20, 10)
    assert(wins.count() == 240 / 10 - 1)
    // per-channel energy: the spiked channel (1) must dominate
    val energy = stacked.groupBy("channel").agg(avg(col("value") * col("value")).as("e"))
      .orderBy("channel").select("e").as[Double].collect()
    assert(energy(1) > 5 * energy(0))
  }

  test("S7: append CSV sink accumulates across writes") {
    import graft.io.Sinks
    val path = "/tmp/graft_io/test_append"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    val df = Seq((1L, 2.0), (2L, 3.0)).toDF("id", "v")
    Sinks.csvAppend(df, path)
    Sinks.csvAppend(df, path)
    val back = spark.read.schema("id LONG, v DOUBLE").csv(path)
    assert(back.count() == 4)
    assert(back.agg(sum("v")).as[Double].head() == 10.0)
  }

  test("KBM pipeline: tag extraction, sub-second strip, time-gap check, anomaly query") {
    val dir = "/tmp/graft_io/test_kbm"
    Files.createDirectories(Paths.get(dir))
    val rows = (0 until 300).map { i =>
      val temp = 20.0 + (i % 7)
      val anomalous = i >= 260
      val v = (if (anomalous) 4.0 else 1.0) * math.sin(i / 3.0)
      // one deliberate 1-second stall at i=150 (duplicate second)
      val sec = if (i >= 150) i / 10 - 1 else i / 10
      f"2023-05-01 10:${sec / 60}%02d:${sec % 60}%02d.${i % 10}%03d,machine=pump-a temperature=$temp%.1f unit=c,$v%.5f,$v%.5f,$v%.5f"
    }
    Files.write(Paths.get(s"$dir/kbm.csv"),
      ("time,tags,vibration-x,vibration-y,vibration-z" + "\n" + rows.mkString("\n")).getBytes)

    val schema = StructType(Seq(
      StructField("time", StringType), StructField("tags", StringType),
      StructField("vibration-x", DoubleType), StructField("vibration-y", DoubleType),
      StructField("vibration-z", DoubleType)))
    val raw = Sources.csv(spark, s"$dir/kbm.csv", schema)
    // P2: temperature out of the tag string; P3: strip sub-seconds
    val cleaned = raw
      .withColumn("temperature", Prep.extractTagValue(col("tags"), "temperature").cast("double"))
      .withColumn("time_sec", unix_timestamp(Prep.dropSubseconds(col("time"))))
    assert(cleaned.filter(col("temperature").isNull).count() == 0)
    assert(cleaned.agg(min("temperature"), max("temperature"))
      .as[(Double, Double)].head() == ((20.0, 26.0)))
    val indexed = Indexing.withOrderedIdx(cleaned, "idx", col("time"))
    // P12: gaps <= 1s flagged (every consecutive pair here is 0s or 1s apart)
    val gaps = Prep.timeGaps(indexed, "time_sec", "idx", 1)
    assert(gaps.count() > 0)
    assert(gaps.filter(col("gap_sec") < 0).count() == 0)
    // §3.3 mini: per-period MSE proxy -> threshold -> anomaly start
    val periods = Prep.downsample(indexed.withColumn("sq", col("vibration-x") * col("vibration-x")),
      "idx", 10, Seq("sq")).select(col("grp").as("period"), col("sq").as("mse"))
    val res = Eval.anomalyStart(periods, "period", "mse", validationFrac = 0.5,
      k = 4.0, rollingWidth = 3)
      .as[(Double, Long)].head()
    assert(res._2 >= 26 && res._2 <= 28, s"anomaly start ${res._2} not at injected index 26")
  }
}
