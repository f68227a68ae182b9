package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.io.LogParser

class LogParserStreamSpec extends SparkSpec {
  import spark.implicits._

  test("A9/logger: TF-style training log lines parse to step timing + loss") {
    val lines = Seq(
      "Epoch 3/150",
      "788/788 [====] - 151s 191ms/step - loss: 0.0123",
      "some unrelated line",
      "788/788 [====] - 150s 189ms/step - loss: 0.0119"
    ).toDF("value")
    val parsed = LogParser.trainingMetrics(lines).collect()
    assert(parsed.length == 3)
    val steps = parsed.flatMap(r => Option(r.get(r.fieldIndex("ms_per_step"))))
    assert(steps.toSeq == Seq(191L, 189L))
    val losses = parsed.flatMap(r => Option(r.get(r.fieldIndex("loss"))))
    assert(losses.toSeq == Seq(0.0123, 0.0119))
  }

  test("A9/logger: resource samples aggregate to the reference's summary stats") {
    val lines = Seq("100,0.25,1.5", "101,0.75,2.5", "garbage", "102,0.50,2.0").toDF("value")
    val out = LogParser.resourceSummary(lines)
      .as[(Double, Double, Double, Double, Long)].head()
    assert(out == ((0.5, 0.75, 2.0, 2.5, 2L)))
  }

  test("streaming file source: JSON files appearing in a directory stream through") {
    val dir = "/tmp/graft_io/test_stream_src"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    Files.createDirectories(Paths.get(dir))
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("value", DoubleType)))
    val stream = spark.readStream.schema(schema).json(dir)
    val agg = stream.agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
    val query = agg.writeStream.format("memory").queryName("file_stream_out")
      .outputMode("complete").start()
    try {
      Files.write(Paths.get(s"$dir/batch1.json"),
        "{\"event_id\":1,\"value\":2.0}\n{\"event_id\":2,\"value\":3.0}".getBytes)
      query.processAllAvailable()
      Files.write(Paths.get(s"$dir/batch2.json"),
        "{\"event_id\":3,\"value\":5.0}".getBytes)
      query.processAllAvailable()
      val r = spark.table("file_stream_out").as[(Long, Double)].head()
      assert(r == ((3L, 10.0)))
    } finally query.stop()
  }
}
