package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns plus typed metadata, with decode / feature-extract / resize /
  * frame-sample stages as partition-local batch transforms.
  *
  * The actual codec calls are STUBBED (no image/audio libraries in this
  * environment) with a deterministic fake decoder — the Spark-side
  * contract (schema, batching, partition parallelism, spill behavior) is
  * real and tested. Swap [[StubCodec]] for a JNI/library codec in
  * production; the operator shapes do not change.
  *
  * Scale notes: media blobs ride in the row (parquet binary) — decode is a
  * narrow mapPartitions (no shuffle); per-partition batch size is bounded
  * by `spark.sql.files.maxPartitionBytes`, so executor memory is sized by
  * partition bytes, not file count.
  */
object Multimodal {

  /** Canonical media schema: blob + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),   // image|audio|video
    StructField("blob", BinaryType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true)))

  /** Deterministic stand-in for a real codec: "decodes" a blob to a fixed-
    * size float feature vector derived from its bytes. Pure function of
    * the input — tests pin its output.
    */
  object StubCodec {
    def decodeFeatures(blob: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < blob.length) { out(i % dim) += (blob(i) & 0xFF) / 255.0f; i += 1 }
      out
    }

    /** Frame sampling stub: byte offsets of every `stride`-th frame. */
    def sampleFrames(nFrames: Int, stride: Int): Array[Int] =
      (0 until nFrames by stride).toArray

    /** Resize stub: nearest-neighbor re-sampling of the byte stream to the
      * target pixel count — deterministic pure function standing in for a
      * real image resampler (same contract: output length = w·h bytes).
      */
    def resize(blob: Array[Byte], w: Int, h: Int): Array[Byte] = {
      require(w > 0 && h > 0 && w.toLong * h <= Int.MaxValue,
        s"target size ${w}x$h out of range") // Int w*h would overflow silently
      val out = new Array[Byte](w * h)
      if (blob.nonEmpty) {
        var i = 0
        while (i < out.length) {
          out(i) = blob((i.toLong * blob.length / out.length).toInt)
          i += 1
        }
      }
      out
    }
  }

  /** Decode + feature-extract: binary blob → `array<float>` features.
    * Partition-local, batched; zero shuffle.
    */
  def extractFeatures(df: DataFrame, dim: Int): DataFrame = {
    val spark = df.sparkSession
    val outSchema = df.schema.add(StructField("features", ArrayType(FloatType), nullable = false))
    val rdd = df.rdd.mapPartitions { it =>
      it.map { r =>
        val blob = r.getAs[Array[Byte]]("blob")
        Row.fromSeq(r.toSeq :+ StubCodec.decodeFeatures(blob, dim).toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Resize image rows to `w`×`h`: blob re-sampled by the (stub) codec,
    * width/height metadata updated in the same pass. Partition-local,
    * zero shuffle — the resize stage of an image-preprocessing pipeline.
    * Non-image rows pass through untouched.
    */
  def resizeImages(df: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema
    val blobIdx = schema.fieldIndex("blob")
    val wIdx = schema.fieldIndex("width")
    val hIdx = schema.fieldIndex("height")
    val kindIdx = schema.fieldIndex("kind")
    val rdd = df.rdd.mapPartitions { it =>
      it.map { r =>
        if (r.getString(kindIdx) != "image") r
        else {
          val vals = r.toSeq.toArray
          vals(blobIdx) = StubCodec.resize(r.getAs[Array[Byte]](blobIdx), w, h)
          vals(wIdx) = w
          vals(hIdx) = h
          Row.fromSeq(vals.toSeq)
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Frame sampling for video rows: explode sampled frame indexes. */
  def sampleFrames(df: DataFrame, stride: Int): DataFrame =
    df.filter(col("kind") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(stride))))

  /** Build a small synthetic media table (deterministic) for tests/demos. */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).select(
      col("id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")), (col("id") % 3 + 1).cast("int")).as("kind"),
      // deterministic pseudo-blob: sha2 of the id, as bytes
      unbase64(substring(base64(sha2(col("id").cast("string"), 256).cast("binary")), 1, 44)).as("blob"),
      lit(64).as("width"), lit(64).as("height"),
      lit(16000).as("sample_rate"), (col("id") % 100 + 1).cast("int").as("n_frames"))
  }
}
