package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Window => LWindow}

/** Dev tool: sweep every registry query for scale anti-patterns in its
  * OPTIMIZED LOGICAL plan — unpartitioned Window nodes over data-sized
  * frames (the bucket-ledger windows over `_b` aggregates are exempt:
  * numBuckets rows by construction), and non-equi/cross joins where
  * NEITHER side is provably ≤ 1 row (a broadcast scalar-aggregate cross
  * join is the intended lazy-count pattern, not an all-pairs product).
  * `runMain graft.ExplainAudit [sfDir] [-full]`.
  */
object ExplainAudit {

  private def maxRowsOne(p: LogicalPlan): Boolean = p.maxRows.exists(_ <= 1L)

  private def ledgerWindow(w: LWindow): Boolean =
    // the offsets ledger: a cumsum ordered by the bucket id over an
    // aggregate keyed by `_b` — numBuckets rows, not data-sized
    w.orderSpec.exists(_.child.references.exists(_.name == "_b")) ||
      w.child.collectFirst {
        case a: Aggregate if a.groupingExpressions.exists(_.references.exists(_.name == "_b")) => a
      }.isDefined

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.filterNot(_.startsWith("-"))
      .getOrElse("/root/testdata/sf0.001")
    val full = args.contains("-full")
    val spark = graft.core.GraftSession.configure(SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var flagged = 0
    SparkEntry.registry.foreach { q =>
      try {
        val lp = q.fn(spark, sfDir).queryExecution.optimizedPlan
        val globalWindows = lp.collect {
          case w: LWindow if w.partitionSpec.isEmpty && !ledgerWindow(w) => w
        }
        val badJoins = lp.collect {
          case j: Join if j.condition.forall(c =>
              !c.toString.contains(" = ") || j.joinType.sql == "CROSS") &&
            !maxRowsOne(j.left) && !maxRowsOne(j.right) => j
        }
        val notes =
          globalWindows.map(w => s"GLOBAL-WINDOW order=${w.orderSpec.mkString(",").take(80)}") ++
            badJoins.map(j => s"NON-EQUI-JOIN ${j.joinType} cond=${j.condition.map(_.toString.take(90))}")
        if (notes.nonEmpty) {
          flagged += 1
          println(s"[audit] ${q.name}:")
          notes.foreach(n => println(s"[audit]     $n"))
          if (full) println(lp.treeString.take(4000))
        }
      } catch { case e: Throwable =>
        println(s"[audit] ${q.name}: PLAN-ERROR ${e.getMessage.linesIterator.next()}")
      }
    }
    println(s"[audit] done: $flagged of ${SparkEntry.registry.size} queries flagged")
    spark.stop()
  }
}
