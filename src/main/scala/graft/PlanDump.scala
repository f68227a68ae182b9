package graft
import org.apache.spark.sql.SparkSession

/** Dev tool (r17): execute named registry rows and write each one's
  * `.explain("formatted")` FINAL (post-AQE) plan to
  * `<outDir>/<name>_<tag>.txt` — the committed evidence format of
  * `plans/r*`. `runMain graft.PlanDump <sfDir> <outDir> <tag> q1 q2 …`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, tag, names @ _*) = args.toSeq.toArray: @unchecked
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      SparkEntry.registry.find(_.name == n) match {
        case Some(q) =>
          val df = q.fn(spark, sfDir)
          df.queryExecution.toRdd.count() // run, so AQE's final plan exists
          val s = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$outDir/${n}_$tag.txt"),
            s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          println(s"[plandump] $outDir/${n}_$tag.txt")
        case None => System.err.println(s"[plandump] no such query: $n")
      }
    }
    spark.stop()
  }
}
