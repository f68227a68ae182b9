package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: run named registry queries against an sf dir, print row count
  * + wall time (+ plan with -explain). `runMain graft.QueryRun <sfDir>
  * [-explain] [-show] [-reps N] [-nogc] q1 q2 ...`; with no names, runs the
  * whole registry. `-reps N` runs each query N times (per-rep lines),
  * separating cold JVM/codegen cost from warm query cost; a driver GC runs
  * between reps so dead localCheckpoint blocks don't contaminate later
  * reps (`-nogc` disables it to observe the accumulation; `rdds=` prints
  * the live persistent-RDD count either way).
  */
object QueryRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.filterNot(_.startsWith("-"))
      .getOrElse("/root/testdata/sf0.01")
    // flags may appear anywhere, including first (sfDir then defaults)
    val flags = args.filter(_.startsWith("-")).toSet
    // -reps must be followed by a bare Int-ranged number; anything else
    // (flag, query name, overflow, end of args) is a usage error, not a
    // NumberFormatException
    def parseReps(n: String): Option[Int] =
      if (n.nonEmpty && n.forall(_.isDigit)) scala.util.Try(n.toInt).toOption
      else None
    if (args.lastOption.contains("-reps") ||
        args.sliding(2).exists { case Array("-reps", n) => parseReps(n).isEmpty
                                 case _ => false }) {
      System.err.println("usage: QueryRun [sfDir] [-explain] [-show] [-reps N] [query ...]")
      sys.exit(2)
    }
    val reps = args.sliding(2).collectFirst {
      case Array("-reps", n) if parseReps(n).isDefined => parseReps(n).get
    }.getOrElse(1)
    // skip the sfDir (when present) and the value after EVERY -reps
    val repsValueIdx = args.zipWithIndex.collect { case ("-reps", i) => i + 1 }.toSet
    val firstIsDir = args.headOption.exists(!_.startsWith("-"))
    val names = args.zipWithIndex
      .filterNot { case (a, i) =>
        a.startsWith("-") || repsValueIdx(i) || (firstIsDir && i == 0)
      }
      .map(_._1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = if (names.isEmpty) SparkEntry.registry
             else SparkEntry.registry.filter(q => names.contains(q.name))
    qs.foreach { q =>
      (1 to reps).foreach { rep =>
        val t0 = System.nanoTime()
        val df = q.fn(spark, sfDir)
        // drain the query's OWN physical plan (see Bench: Dataset.count()
        // re-optimizes and can delete count-invariant subtrees wholesale)
        val n = df.queryExecution.toRdd.count()
        val sec = (System.nanoTime() - t0) / 1e9
        val nrdd = spark.sparkContext.getPersistentRDDs.size
        println(f"[queryrun] ${q.name}%-28s rep=$rep rows=$n%-8d ${sec}%.2fs rdds=$nrdd")
        // drop dead localCheckpoint blocks between reps (ContextCleaner
        // frees them only after a driver GC — default periodicGC is
        // 30 min); -nogc keeps them to OBSERVE the accumulation
        if (!flags("-nogc")) { System.gc(); Thread.sleep(200) }
        if (rep == reps && flags("-show")) df.show(20, truncate = false)
        if (rep == reps && flags("-explain")) df.explain("formatted")
      }
    }
    spark.stop()
  }
}
