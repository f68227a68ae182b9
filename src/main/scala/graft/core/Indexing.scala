package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField}

/** The ordering contract (SURVEY.md §4.1).
  *
  * The reference (pandas) gets a stable global row order for free from its
  * RangeIndex; windowing, stacking, train/test splits and anomaly indexes
  * all depend on it (reference: `src/training/trainer.py:75-82`,
  * `src/data/restructure.py:12-19`). Spark has no implicit order, so every
  * ingested table materializes an explicit contiguous `idx: Long` exactly
  * once; all downstream positional operators derive from it arithmetically.
  *
  * Scale: the naive `row_number() over (orderBy ...)` is a single-task
  * global window — a non-starter at 100 TB. This implementation is the
  * standard two-pass pattern: range-repartition + local sort (one shuffle),
  * then a tiny job to count rows per partition, then a zero-shuffle
  * mapPartitions that adds each partition's offset. Equivalent to
  * `RDD.zipWithIndex` but keeps the DataFrame lineage explicit.
  * `monotonically_increasing_id` is NOT acceptable: non-contiguous.
  */
object Indexing {

  /** Add contiguous 0-based `idxCol` ordered by `order` (must be a total
    * order for determinism — include a tie-breaker key).
    */
  def withOrderedIdx(df: DataFrame, idxCol: String, order: Column*): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val rdd = sorted.rdd
    // Pass 1: per-partition counts (small: one long per partition).
    val counts = rdd
      .mapPartitionsWithIndex { case (i, it) => Iterator((i, it.size.toLong)) }
      .collect()
      .sortBy(_._1)
      .map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    // Pass 2: attach offset + local position; no shuffle.
    val indexed = rdd.mapPartitionsWithIndex { case (i, it) =>
      var k = offsets(i)
      it.map { r => val out = Row.fromSeq(r.toSeq :+ k); k += 1; out }
    }
    val schema = sorted.schema.add(StructField(idxCol, LongType, nullable = false))
    spark.createDataFrame(indexed, schema)
  }
}
