package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

import graft.core.Indexing

/** Pins the cost model of the idx contract (core/Indexing.scala): one
  * range-shuffle map stage total across the two internal passes (counting
  * pass + sort/attach pass), i.e. the shuffle is written once and job 2
  * reuses the files via stage skipping instead of recomputing the sort.
  */
class IndexingSpec extends SparkSpec {

  test("Indexing: idx is contiguous and follows a multi-column total order") {
    import spark.implicits._
    val df = spark
      .range(0, 5000, 1, 8)
      .select(
        (col("id") * 2654435761L % 997).as("k"),
        col("id").as("tie"))
    val rows = Indexing
      .withOrderedIdx(df, "idx", col("k"), col("tie"))
      .select("k", "tie", "idx")
      .as[(Long, Long, Long)]
      .collect()
      .sortBy(_._3)
    assert(rows.map(_._3).toSeq == (0L until 5000L))
    val keys = rows.map(r => (r._1, r._2)).toSeq
    assert(keys == keys.sorted, "idx order must equal the (k, tie) sort order")
  }

  test("Indexing: the range shuffle's map stage runs exactly once across both passes") {
    val completed = new ConcurrentLinkedQueue[(Int, Boolean)]()
    val listener = new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val info = ev.stageInfo
        val wroteShuffle = info.taskMetrics.shuffleWriteMetrics.recordsWritten > 0
        completed.add((info.stageId, wroteShuffle))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val df = spark
        .range(0, 20000, 1, 8)
        .select((col("id") * 1103515245L % 4096).as("k"), col("id").as("tie"))
      val out = Indexing.withOrderedIdx(df, "idx", col("k"), col("tie"))
      // Materialize pass 2 with a shuffle-free action (collect on the
      // RDD-backed result adds no exchange of its own).
      val n = out.collect().length
      assert(n == 20000)
      // The listener bus is async; poll until the map-stage count stops
      // moving (bounded wait, no private Spark APIs).
      var mapStages = -1
      var stable = 0
      var waited = 0
      while (stable < 3 && waited < 100) {
        Thread.sleep(100)
        val now = completed.toArray(Array.empty[(Int, Boolean)]).count(_._2)
        if (now == mapStages) stable += 1 else { stable = 0; mapStages = now }
        waited += 1
      }
      assert(
        mapStages == 1,
        s"expected exactly 1 shuffle map stage (single range exchange, reused by pass 2); saw $mapStages")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
    }
  }
}
