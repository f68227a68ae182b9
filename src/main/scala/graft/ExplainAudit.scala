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

  /** Queries whose flagged pattern is documented as intentional:
    * `x_cosine_near_dup` is the EXACT all-pairs verification anchor — its
    * non-equi self-join over a bounded id slice is the point of the query
    * (candidate generation at scale is `x_cosine_near_dup_lsh`).
    */
  val exempt: Set[String] = Set("x_cosine_near_dup")

  /** Sweep every registry query's optimized plan; returns
    * (queryName, notes) for each query with an unexempted global window,
    * non-equi/cross data-sized join, or plan-construction error.
    * Run by ExplainAuditSpec in CI so the scale posture can't silently
    * regress; `main` prints the same sweep for interactive use.
    */
  def audit(spark: SparkSession, sfDir: String,
            queries: Seq[graft.queries.Q] = SparkEntry.registry): Seq[(String, Seq[String])] =
    queries.flatMap { q =>
      val notes =
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
          globalWindows.map(w => s"GLOBAL-WINDOW order=${w.orderSpec.mkString(",").take(80)}") ++
            badJoins.map(j => s"NON-EQUI-JOIN ${j.joinType} cond=${j.condition.map(_.toString.take(90))}")
        } catch { case e: Throwable =>
          Seq(s"PLAN-ERROR ${Option(e.getMessage).getOrElse(e.toString).linesIterator.next()}")
        }
      if (notes.nonEmpty) Some(q.name -> notes) else None
    }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.filterNot(_.startsWith("-"))
      .getOrElse("/root/testdata/sf0.001")
    val spark = graft.core.GraftSession.configure(SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val flagged = audit(spark, sfDir)
    flagged.foreach { case (name, notes) =>
      println(s"[audit] $name:" + (if (exempt(name)) " (exempt)" else ""))
      notes.foreach(n => println(s"[audit]     $n"))
    }
    println(s"[audit] done: ${flagged.size} of ${SparkEntry.registry.size} queries flagged " +
      s"(${flagged.count(f => !exempt(f._1))} unexempted)")
    spark.stop()
  }
}
