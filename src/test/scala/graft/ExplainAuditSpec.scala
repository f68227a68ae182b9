package graft

/** CI gate for the scale posture (VERDICT r3 #5): every registry query's
  * OPTIMIZED plan must be free of unpartitioned data-sized windows and
  * non-equi/cross data-sized joins — the two patterns that silently turn
  * a 100 TB plan into a single-task or all-pairs job. The sweep itself
  * lives in [[ExplainAudit.audit]] (also runnable as a main); the only
  * allowed hits are the documented [[ExplainAudit.exempt]] set.
  */
class ExplainAuditSpec extends SparkSpec {

  test("no registry query plan has an unexempted global window or non-equi join") {
    val flagged = ExplainAudit.audit(spark, "/root/testdata/sf0.001")
    val bad = flagged.filterNot { case (name, _, _) => ExplainAudit.exempt(name) }
    assert(bad.isEmpty, bad.map { case (n, notes, _) =>
      s"$n:\n  ${notes.mkString("\n  ")}"
    }.mkString("scale anti-patterns found:\n", "\n", ""))
    // the exemption list must not rot: every exempted plan must STILL be
    // flagged — an exemption whose plan went clean is a silent hole a
    // future regression could hide behind
    val flaggedNames = flagged.map(_._1).toSet
    assert(ExplainAudit.exempt.subsetOf(flaggedNames),
      s"stale exemptions (no longer flagged): ${ExplainAudit.exempt -- flaggedNames}")
  }
}
