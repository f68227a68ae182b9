package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.eval.Eval

/** Golden end-to-end test of the §3.3 evaluation query on the REFERENCE'S
  * OWN committed result logs (`/root/reference/logs/bearing_experiment-2/`,
  * read-only data): unstack the flat MSE series to per-bearing columns,
  * fit μ+4σ thresholds on the first 10% of periods, rolling-min(3)
  * smoothing, first-over-threshold anomaly start. Expected values are
  * computed independently in plain Scala from the same arrays — the Spark
  * pipeline must agree exactly (tolerance 1e-9; this slice of the
  * reference is fully deterministic, SURVEY.md §5).
  */
class GoldenLogsSpec extends SparkSpec {
  import spark.implicits._

  private val logDir = "/root/reference/logs/bearing_experiment-2"
  private val centralizedSchema = StructType(Seq(
    StructField("lstm", StructType(Seq(
      StructField("loss", ArrayType(DoubleType)),
      StructField("mse", ArrayType(DoubleType)))))))

  test("§3.3 golden: per-bearing thresholds + anomaly starts on centralized.json") {
    assume(new java.io.File(s"$logDir/centralized.json").exists())
    val raw = spark.read.schema(centralizedSchema).json(s"$logDir/centralized.json")
    // R2 column-major unstack: flat[j*984 + i] = (bearing j, period i)
    val long = raw.select(posexplode(col("lstm.mse")).as(Seq("gidx", "mse")))
      .select((col("gidx") % 984).as("period"),
        (col("gidx") / 984).cast("int").as("bearing"), col("mse"))
    assert(long.count() == 3936)
    val got = Eval.anomalyStart(long, "period", "mse", validationFrac = 0.1,
        k = 4.0, rollingWidth = 3, groupCols = Seq("bearing"))
      .orderBy("bearing")
      .as[(Int, Double, Long)].collect()

    // independent computation from the same arrays
    val flat = raw.select(col("lstm.mse")).as[Seq[Double]].head().toArray
    val expected = (0 until 4).map { b =>
      val series = flat.slice(b * 984, (b + 1) * 984)
      val valid = series.take((984 * 0.1).toInt)
      val mu = valid.sum / valid.length
      val sd = math.sqrt(valid.map(v => (v - mu) * (v - mu)).sum / (valid.length - 1))
      val thr = mu + 4 * sd
      val rollMin = series.indices.map { i =>
        if (i < 2) Double.NaN else series.slice(i - 2, i + 1).min
      }
      val start = rollMin.indexWhere(v => !v.isNaN && v > thr) match {
        case -1 => 0L
        case i  => i.toLong
      }
      (b, thr, start)
    }
    got.zip(expected).foreach { case ((gb, gt, gs), (eb, et, es)) =>
      assert(gb == eb)
      assert(math.abs(gt - et) < 1e-9, s"bearing $gb threshold $gt vs $et")
      assert(gs == es, s"bearing $gb start $gs vs $es")
    }
    // experiment-2's known-faulty bearing is 0 (SURVEY §5): it must alarm,
    // and strictly earlier than any other alarming bearing.
    val starts = got.map(g => g._1 -> g._3).toMap
    assert(starts(0) > 0)
    assert(starts.filter(_._2 > 0).minBy(_._2)._1 == 0)
  }

  test("J6: per-client federated logs merge by client key") {
    assume(new java.io.File(s"$logDir/federated.json").exists())
    val clientSchema = StructType(Seq(
      StructField("lstm", StructType(Seq(
        StructField("loss", ArrayType(DoubleType)),
        StructField("mse", ArrayType(DoubleType)))))))
    val fedSchema = StructType((0 until 4).map(i =>
      StructField(i.toString, clientSchema)))
    val raw = spark.read.schema(fedSchema).json(s"$logDir/federated.json")
    val merged = (0 until 4).map { c =>
      raw.select(posexplode(col(s"`$c`.lstm.mse")).as(Seq("period", "mse")))
        .withColumn("client", lit(c))
    }.reduce(_ unionByName _)
    val counts = merged.groupBy("client").agg(count(lit(1)).as("n"))
      .orderBy("client").as[(Int, Long)].collect()
    assert(counts.toSeq == (0 until 4).map(c => (c, 984L)))
  }

  test("SQL-registered custom expression: fft_magnitude callable from spark.sql") {
    graft.functions.GraftFunctions.registerAll(spark)
    Seq(Seq(1.0, 2.0, 3.0, 4.0)).toDF("w").createOrReplaceTempView("fft_in")
    val m = spark.sql("SELECT fft_magnitude(w) AS m FROM fft_in")
      .as[Seq[Double]].head()
    assert(math.abs(m.head - 10.0) < 1e-12) // DC bin = |sum|
    assert(m.length == 4)
  }
}
