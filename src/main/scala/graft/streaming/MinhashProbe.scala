package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.StreamingOps.{BandedDoc, CandidatePair}

/** Decomposition probe for the `stream_minhash_pairs` bench floor (the
  * slowest streaming row): times the lane's layers separately so the
  * state-store share is measured, not guessed.
  *
  * Variants (3 reps each, median):
  *  - `floor`      — the SAME doc stream drained through a stateless
  *                   narrow projection: micro-batch machinery alone.
  *  - `banded`     — signature + band explode, still stateless: adds the
  *                   minhash kernel + 8× explode + watermark.
  *  - `shuffled`   — banded + the groupByKey shuffle into a stateless
  *                   flatMapGroups-shaped sink via a no-state
  *                   flatMapGroupsWithState (state never updated): adds
  *                   the keyed-exchange + per-group iteration cost.
  *  - `baseline`   — the production [[StreamingOps.minhashCandidatePairs]].
  *  - `noarm`      — an EXPERIMENTAL variant that, when a touched
  *                   bucket's membership is unchanged, skips BOTH the
  *                   value update and the timeout re-arm. Only this
  *                   elides the state write: a conditional update alone
  *                   is a no-op because re-arming the timeout dirties
  *                   the state row anyway (the r12 review finding that
  *                   reverted it from production). The price is changed
  *                   semantics — expiry anchored at last MEMBERSHIP
  *                   change, not last touch — so this stays probe-only.
  *  - `rocksdb`    — baseline under the RocksDB provider.
  *
  * r12 warm medians (3 reps, local[8]): floor 1.0 s → banded 2.1 s →
  * shuffled 3.1 s → baseline 4.5 s; rocksdb +0.1 s — the floor analysis
  * recorded in DESIGN.md "Standing bench triage".
  *
  * `runMain graft.streaming.MinhashProbe [reps]`
  */
object MinhashProbe {

  private def minhashNoRearm(stream: DataFrame, tsCol: String, idCol: String,
                             textCol: String, watermark: String): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    import graft.ext.Dedup
    val sig = Dedup.minhashSignatureHashed(col(textCol), 3, 16)
    stream.withWatermark(tsCol, watermark)
      .filter(size(split(col(textCol), " +")) >= 3)
      .select(col(idCol).cast("long").as("id"), col(tsCol).as("eventTs"),
        posexplode(Dedup.bandHashes(sig, 8, 2)).as(Seq("band", "bucket")))
      .as[BandedDoc]
      .groupByKey(d => (d.band, d.bucket))
      .flatMapGroupsWithState[BucketState, CandidatePair](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, rows, state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var known = state.getOption.map(_.ids).getOrElse(Array.empty[Long])
            val n0 = known.length
            val out = Seq.newBuilder[CandidatePair]
            var maxTs = Long.MinValue
            rows.toSeq.sortBy(_.id).foreach { r =>
              maxTs = math.max(maxTs, r.eventTs.getTime)
              if (!known.contains(r.id)) {
                known.foreach(k =>
                  out += CandidatePair(math.min(k, r.id), math.max(k, r.id)))
                if (known.length < 128) known = known :+ r.id
              }
            }
            // the ONLY way to elide the write: leave both value AND
            // timeout untouched when membership is unchanged (expiry
            // then anchors at the last membership change)
            if (known.length != n0 || !state.exists) {
              state.update(BucketState(known))
              state.setTimeoutTimestamp(
                math.max(maxTs, state.getCurrentWatermarkMs() + 1), watermark)
            }
            out.result().iterator
          }
      }.toDF()
  }

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = graft.core.GraftSession.configure(SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    def run(build: DataFrame => DataFrame): Unit = {
      val input = MemoryStream[(Timestamp, Long, String, String)]
      val out = build(input.toDF().toDF("ts", "doc_id", "source", "text"))
      StreamBench.drain(spark, input, out,
        StreamBench.chunked(StreamBench.docs(800, 15)))
    }

    def banded(df: DataFrame): DataFrame = {
      import graft.ext.Dedup
      val sig = Dedup.minhashSignatureHashed(col("text"), 3, 16)
      df.withWatermark("ts", "2 minutes")
        .filter(size(split(col("text"), " +")) >= 3)
        .select(col("doc_id").cast("long").as("id"), col("ts").as("eventTs"),
          posexplode(Dedup.bandHashes(sig, 8, 2)).as(Seq("band", "bucket")))
    }

    val variants: Seq[(String, () => Unit)] = Seq(
      "floor" -> (() => run(df => df.select(col("doc_id"), length(col("text")).as("len")))),
      "banded" -> (() => run(banded)),
      "shuffled" -> (() => run(df => banded(df).as[BandedDoc]
        .groupByKey(d => (d.band, d.bucket))
        .flatMapGroupsWithState[BucketState, CandidatePair](
          OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
          case (_, rows, _) =>
            // no state read/write: pure keyed iteration
            var n = 0
            rows.foreach(_ => n += 1)
            if (n > 1) Iterator.single(CandidatePair(0L, n.toLong)) else Iterator.empty
        }.toDF())),
      "baseline" -> (() => run(df =>
        StreamingOps.minhashCandidatePairs(df, "ts", "doc_id", "text",
          watermark = "2 minutes").toDF())),
      "noarm" -> (() => run(df =>
        minhashNoRearm(df, "ts", "doc_id", "text", "2 minutes"))),
      "rocksdb" -> (() => StreamBench.rocksDb(spark) {
        run(df => StreamingOps.minhashCandidatePairs(df, "ts", "doc_id", "text",
          watermark = "2 minutes").toDF())
      }))

    variants.foreach { case (name, thunk) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        thunk()
        (System.nanoTime() - t0) / 1e9
      }
      val med = times.sorted.apply(times.length / 2)
      println(f"[minhash-probe] $name%-9s median=$med%6.2fs  reps=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
