package graft

import org.apache.spark.sql.execution.window.WindowExec

/** Audit: no gated query may plan an unpartitioned window (a global
  * single-task sort).  lagplot keeps its deliberately (documented:
  * global lag over a sampled series); guessBins was rewritten to a
  * range-repartitioned fold — the gate is the driver queries. */
class WindowAuditSpec extends SparkSpec {

  test("no gated query plans an unpartitioned WindowExec") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      // AQE wraps the real plan in AdaptiveSparkPlanExec, whose collect
      // does NOT descend — audit the pre-adaptive sparkPlan instead,
      // and check the FOLDED partition spec: partitionBy(lit(1)) is
      // eliminated by the optimizer and still plans a global window
      val plan = q(spark, dir).queryExecution.sparkPlan
      val bad = plan.collect {
        case w: WindowExec if w.partitionSpec.forall(_.foldable) => w
      }
      if (bad.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty, s"unpartitioned windows in: $offenders")
  }
}
