package graft

/** Dev tool: print every registry row name, one per line — the sweep
  * manifest. `tools/sweep_check.py` diffs this against the
  * `BENCH_SCALE_*` artifacts so a lane landed after a sweep snapshot
  * fails the sweep loudly instead of silently shipping without a ×10
  * measurement (the r13 `x_ivf_knn_join` gap, verdict item 2).
  *
  * Building the registry needs no SparkSession (rows are name →
  * thunk), so this runs in milliseconds:
  *
  *   java -cp "target/scala-2.13/classes:<spark jars>" \
  *     graft.RegistryDump > /tmp/registry.txt
  */
object RegistryDump {
  def main(args: Array[String]): Unit =
    SparkEntry.registry.foreach(q => println(q.name))
}
