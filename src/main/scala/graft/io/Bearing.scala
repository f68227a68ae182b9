package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Annotation support for run-until-failure bearing data (reference
  * `src/data/bearing.py:35-51`): the reference plots the raw series with a
  * vertical grid line every `n/100` rows (every 5th line emphasized red)
  * so a human can visually annotate failure onset. The engine-side analog
  * computes exactly what that plot encodes — the grid boundaries with
  * their emphasis flags plus per-segment summary statistics — as one
  * distributed aggregation (no driver-side loop over segments, no
  * collect of the raw series).
  */
object Bearing {

  /** Per-grid-segment stats: segment id (`idx div (n div segments)`,
    * clamped — the reference's integer-division boundary arithmetic),
    * its start boundary, the emphasis flag, row count, mean/max/min of
    * the signal. The total row count joins in as a broadcast 1-row
    * aggregate — no driver `.count()` action.
    */
  def annotationSegments(df: DataFrame, idxCol: String, valueCol: String,
                         segments: Int = 100, emphasisEvery: Int = 5): DataFrame = {
    val n = broadcast(df.agg(count(lit(1)).as("_n")))
    df.crossJoin(n)
      .withColumn("_seg",
        // greatest(..., 1) guards n < segments: `_n DIV segments` would be
        // 0, Spark DIV-by-zero yields null, and least() skips nulls — every
        // row would land in the last segment silently. With the guard the
        // degenerate grid is one row per segment (clamped), consistently on
        // both engine and oracle sides.
        least(expr(s"CAST(`$idxCol` AS BIGINT) DIV greatest(_n DIV $segments, 1)"),
          lit(segments - 1L)))
      .groupBy("_seg")
      .agg(
        min(col(idxCol)).as("start_idx"),
        count(lit(1)).as("n_rows"),
        avg(col(valueCol)).as("mean_v"),
        max(col(valueCol)).as("max_v"),
        min(col(valueCol)).as("min_v"))
      .withColumn("emphasized", col("_seg") % emphasisEvery === 0)
      .withColumnRenamed("_seg", "segment")
  }
}
