package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Sources and sinks (SURVEY.md §2.1, S1–S10).
  *
  * All readers take an explicit schema — no inference in production paths
  * (inference is a full extra pass over the data; at 100 TB that is a
  * second scan of the entire input). Reference behaviors covered:
  * delimiter-configurable CSV (`src/data/pipeline.py:28`), headerless CSV
  * with synthesized names (`src/data/bearing.py:28-32`), directory scans
  * with per-file identity (`src/data/bearing.py:27`), filename→timestamp
  * (`src/data/bearing.py:29`), JSON results files
  * (`src/evaluation/visualization.py:41-43`).
  */
object Sources {

  /** S1 — CSV scan with configurable delimiter + header. */
  def csv(spark: SparkSession, path: String, schema: StructType,
          sep: String = ",", header: Boolean = true): DataFrame =
    spark.read
      .option("sep", sep)
      .option("header", header.toString)
      .schema(schema)
      .csv(path)

  /** S2 — headerless CSV with synthesized column names
    * (reference names bearing channels `Vibration-0..N-1` after load).
    */
  def headerlessCsv(spark: SparkSession, path: String, schema: StructType,
                    names: Seq[String], sep: String = "\t"): DataFrame = {
    require(names.length == schema.length, "one name per schema field")
    csv(spark, path, schema, sep, header = false).toDF(names: _*)
  }

  /** S4 — directory scan: one logical table from a glob of per-period
    * files, with per-file identity. Executors stream file-by-file; no
    * driver-side loop (the reference iterates `os.listdir` and appends —
    * that pattern is replaced by a single multi-file scan).
    */
  def directoryCsv(spark: SparkSession, glob: String, schema: StructType,
                   sep: String = "\t", header: Boolean = false): DataFrame =
    csv(spark, glob, schema, sep, header).withColumn("_file", input_file_name())

  /** S5 — filename → timestamp column. The reference's bearing files are
    * named `%Y.%m.%d.%H.%M.%S` and the name IS the measurement timestamp.
    */
  def withFilenameTimestamp(df: DataFrame, pattern: String = "(\\d{4}\\.\\d{2}\\.\\d{2}\\.\\d{2}\\.\\d{2}\\.\\d{2})",
                            fmt: String = "yyyy.MM.dd.HH.mm.ss",
                            out: String = "file_ts"): DataFrame = {
    val f = if (df.columns.contains("_file")) col("_file") else input_file_name()
    df.withColumn(out, to_timestamp(regexp_extract(f, pattern, 1), fmt))
  }

  /** In-file row position for a directory scan. Spark doesn't expose a
    * row's offset in its source file; for file-per-period sensor data the
    * (file_ts, in-file position) pair IS the total order, so we recover
    * the position with a per-partition counter. Requires file-per-
    * partition reads (true when files are smaller than
    * `spark.sql.files.maxPartitionBytes`, the sensor-file case — a split
    * file would restart the counter mid-file, so the partition id is
    * tagged alongside (`<out>_part`) for verification: a file spanning
    * two partitions shows two distinct partition ids for one `_file`).
    */
  def withInFilePosition(df: DataFrame, out: String = "pos"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField}
    val spark = df.sparkSession
    val schema = df.schema
      .add(StructField(out, LongType, nullable = false))
      .add(StructField(s"${out}_part", IntegerType, nullable = false))
    val rdd = df.rdd.mapPartitionsWithIndex { (part, it) =>
      var i = 0L
      it.map { r => val o = Row.fromSeq(r.toSeq :+ i :+ part); i += 1; o }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** S10 — JSON source with explicit schema (results documents). */
  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}

/** Sinks (S6–S9). */
object Sinks {

  /** S6 — CSV sink, overwrite, with header. */
  def csvOverwrite(df: DataFrame, path: String, sep: String = ","): Unit =
    df.write.mode("overwrite").option("header", "true").option("sep", sep).csv(path)

  /** S7 — append accumulation. The reference appends each period's file
    * into one growing CSV; in Spark the idiomatic replacement is a single
    * union/multi-file scan, but the append sink exists for incremental
    * ingestion jobs.
    */
  def csvAppend(df: DataFrame, path: String): Unit =
    df.write.mode("append").option("header", "false").csv(path)

  /** S8 — stacked single-column text export, one value per line with a
    * trailing comma (reference: `src/data/restructure.py:16-19`).
    */
  def stackedText(df: DataFrame, valueCol: String, path: String): Unit =
    df.select(concat(col(valueCol).cast("string"), lit(",")).as("value"))
      .write.mode("overwrite").text(path)

  /** S9 — JSON results sink. */
  def json(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
