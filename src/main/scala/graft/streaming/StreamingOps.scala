package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** State for [[StreamingOps.countWindows]] — top-level so the state
  * encoder's generated code can reference it directly.
  */
final case class BufState(buf: Array[Double], seen: Long)

/** Streaming-inference surface (SURVEY.md §2.9 — the reference is
  * batch-only; this is the engine's Structured Streaming extension so the
  * same anomaly semantics run over a live sensor feed).
  *
  *  - [[periodMeans]]: event-time tumbling windows + watermark — the
  *    streaming analogue of A3's per-period mean.
  *  - [[thresholdFlags]]: per-period mean vs a (pre-fit) threshold — the
  *    streaming P9 flag.
  *  - [[countWindows]]: count-based sliding windows per key via
  *    flatMapGroupsWithState — the streaming W1 (Spark has no native
  *    count-based window; state holds at most `size` doubles per key).
  *
  * Scale: all three are keyed state — parallel across keys, watermark
  * bounds state size, no global ordering dependency.
  */
object StreamingOps {

  /** A3-streaming: tumbling event-time mean of `valueCol` per
    * (`keyCols`, window). Late data beyond `watermark` is dropped.
    */
  def periodMeans(stream: DataFrame, tsCol: String, valueCol: String,
                  windowDuration: String, watermark: String,
                  keyCols: Seq[String] = Nil): DataFrame = {
    val keys = window(col(tsCol), windowDuration) +: keyCols.map(col)
    stream.withWatermark(tsCol, watermark)
      .groupBy(keys: _*)
      .agg(avg(col(valueCol)).as("mse"), count(lit(1)).as("n"))
      .select(col("window.start").as("period_start") +:
        (keyCols.map(col) :+ col("mse") :+ col("n")): _*)
  }

  /** P9-streaming: flag periods whose mean exceeds `threshold`. */
  def thresholdFlags(stream: DataFrame, tsCol: String, valueCol: String,
                     windowDuration: String, watermark: String,
                     threshold: Double): DataFrame =
    periodMeans(stream, tsCol, valueCol, windowDuration, watermark)
      .withColumn("anomaly", col("mse") > threshold)

  /** Exact-dedup streaming (the training-data-pipeline dedup at ingest
    * time): drop any document whose content hash was already seen within
    * the watermark horizon. State holds ONE 8-byte hash per distinct
    * document — never the text — and the watermark bounds it, so a
    * forever-running ingest job's state can't grow without limit (the
    * batch form, `ext.Dedup.exact`, owns full-corpus dedup).
    */
  def dedupExact(stream: DataFrame, tsCol: String, textCol: String,
                 watermark: String): DataFrame =
    stream.withColumn("_h", xxhash64(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("_h")
      .drop("_h")

  final case class KeyedValue(key: String, seq: Long, value: Double)
  final case class WindowOut(key: String, windowId: Long, values: Seq[Double])

  /** W1-streaming: per-key count-based sliding windows (size, step) in
    * `seq` order within each micro-batch. A window is emitted whenever
    * the total consumed count reaches `size + k·step`; state per key is
    * the last `size` values + one counter — bounded regardless of stream
    * length.
    */
  def countWindows(ds: Dataset[KeyedValue], size: Int, step: Int): Dataset[WindowOut] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[BufState, WindowOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[BufState]) =>
          val prev = state.getOption.getOrElse(BufState(Array.empty, 0L))
          var buf = prev.buf.toVector
          var seen = prev.seen
          val res = Seq.newBuilder[WindowOut]
          rows.toSeq.sortBy(_.seq).foreach { r =>
            buf = (buf :+ r.value).takeRight(size)
            seen += 1
            if (seen >= size && (seen - size) % step == 0) {
              res += WindowOut(key, (seen - size) / step, buf)
            }
          }
          state.update(BufState(buf.toArray, seen))
          res.result().iterator
      }
  }
}
