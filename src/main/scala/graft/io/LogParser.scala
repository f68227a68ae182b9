package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training/resource log parsing (reference `src/util/logger.py`):
  * TF-style progress lines carry per-step timing
  * (`... - 123ms/step - loss: 0.1234 ...`), resource logs carry 1 Hz
  * cpu/mem samples. Both parse with codegen'd regexp extraction over a
  * distributed text scan — the reference's line-by-line Python loops
  * become one narrow pass.
  */
object LogParser {

  /** Parse TF-style training log lines → (epoch, ms_per_step, loss).
    * Lines that match no pattern are dropped (the reference skips them).
    */
  def trainingMetrics(lines: DataFrame, valueCol: String = "value"): DataFrame = {
    val v = col(valueCol)
    lines
      .withColumn("epoch", regexp_extract(v, "Epoch (\\d+)/", 1))
      .withColumn("ms_per_step", regexp_extract(v, "(\\d+)ms/step", 1))
      .withColumn("loss", regexp_extract(v, "loss: ([0-9.eE+-]+)", 1))
      .filter(col("ms_per_step") =!= "" || col("loss") =!= "" || col("epoch") =!= "")
      .select(
        when(col("epoch") =!= "", col("epoch").cast("int")).as("epoch"),
        when(col("ms_per_step") =!= "", col("ms_per_step").cast("long")).as("ms_per_step"),
        when(col("loss") =!= "", col("loss").cast("double")).as("loss"))
  }

  /** Parse `ts,cpu,mem` resource samples and aggregate the reference's
    * summary stats (mean/max cpu and mem, duration).
    */
  def resourceSummary(lines: DataFrame, valueCol: String = "value"): DataFrame = {
    val v = col(valueCol)
    // ANSI mode: cast('') throws — guard each extract (non-matching lines
    // yield the empty string, the reference's skip case).
    def num(pattern: String, t: String) = {
      val raw = regexp_extract(v, pattern, 1)
      when(raw =!= "", raw.cast(t))
    }
    lines
      .select(
        num("^([0-9]+),", "long").as("ts"),
        num("^[0-9]+,([0-9.]+),", "double").as("cpu"),
        num(",([0-9.]+)$", "double").as("mem"))
      .filter(col("ts").isNotNull)
      .agg(
        avg("cpu").as("mean_cpu"), max("cpu").as("max_cpu"),
        avg("mem").as("mean_mem"), max("mem").as("max_mem"),
        (max("ts") - min("ts")).as("duration_sec"))
  }
}
