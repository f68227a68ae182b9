package graft
import org.apache.spark.sql.SparkSession

/** Dev tool (r16 optimization round): split a registry row's wall time
  * into build (DataFrame construction + analysis), plan (optimization +
  * physical planning + codegen lookup, forced via `executedPlan`), and
  * exec (toRdd.count — the Bench-timed action minus the planning that
  * toRdd would otherwise fold in). At sf0.1 the corpus is 17 MB, so the
  * driver bench prices fixed per-query costs as much as operator work —
  * this probe says which fixed cost a slow row is paying.
  *
  * `runMain graft.PhaseProbe <sfDir> [-reps N] q1 q2 ...`
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.filterNot(_.startsWith("-"))
      .getOrElse("/root/testdata/sf0.1")
    val reps = args.sliding(2).collectFirst {
      case Array("-reps", n) if n.forall(_.isDigit) => n.toInt
    }.getOrElse(3)
    val repsValueIdx = args.zipWithIndex.collect { case ("-reps", i) => i + 1 }.toSet
    val names = args.zipWithIndex.drop(1)
      .filterNot { case (a, i) => a.startsWith("-") || repsValueIdx(i) }
      .map(_._1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
        val t1 = System.nanoTime()
        val qe = df.queryExecution
        qe.executedPlan // force optimization + physical planning
        val t2 = System.nanoTime()
        val n = qe.toRdd.count()
        val t3 = System.nanoTime()
        def s(a: Long, b: Long) = f"${(b - a) / 1e9}%.3f"
        println(f"[phase] ${q.name}%-30s rep=$rep rows=$n%-8d " +
          s"build=${s(t0, t1)} plan=${s(t1, t2)} exec=${s(t2, t3)} total=${s(t0, t3)}")
        System.gc(); Thread.sleep(100)
      }
    }
    spark.stop()
  }
}
