package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Pre-flight plan linter: walk a query's physical plan and surface
  * the patterns that are harmless at test scale and fatal at 100 TB —
  * BEFORE the job runs. This is the codified form of the review this
  * engine's own operators go through (PlanSpec pins the same
  * properties per operator; the linter makes the check available to
  * USERS of the library against their own composed queries).
  *
  * Findings, not failures: the caller decides what is acceptable
  * (`requireClean` turns selected kinds into hard errors for CI).
  *
  *  - `cartesian_product`   — O(n·m) row blowup; at corpus scale this
  *    is the job that never finishes. (The deliberate brute-force
  *    baselines in [[graft.operators.Similarity]] are the documented
  *    exception that proves the rule.)
  *  - `nested_loop_join`    — broadcast nested loop: per-row scan of
  *    the broadcast side, usually a missing equi-join key.
  *  - `global_window`       — a Window with no PARTITION BY moves the
  *    entire dataset to ONE task (Spark itself warns at runtime; the
  *    linter says it before the shuffle happens).
  *  - `global_sort`         — a total ordering on the full output:
  *    legitimate for top-k heads (TakeOrdered shows up instead), a
  *    scale smell anywhere else.
  *  - `shuffle_count`       — informational: number of exchanges; the
  *    budget a pipeline author sizes against.
  *  - `broadcast_count`     — informational: broadcast builds; each
  *    one must be bounded by construction or it OOMs the driver.
  */
object PlanLint {

  final case class Finding(kind: String, detail: String)

  /** Lint the OPTIMIZED physical plan (pre-execution — AQE's initial
    * plan; runtime re-plans can only remove exchanges, not add). */
  def lint(df: DataFrame): Seq[Finding] = {
    val root = df.queryExecution.executedPlan
    val nodes = collectAll(root)
    val findings = Vector.newBuilder[Finding]
    nodes.foreach {
      case c: CartesianProductExec =>
        findings += Finding("cartesian_product",
          s"cartesian product over ${c.left.nodeName} x ${c.right.nodeName}")
      case j: BroadcastNestedLoopJoinExec =>
        findings += Finding("nested_loop_join",
          s"broadcast nested loop join (${j.joinType}) - missing equi key?")
      case w: WindowExec if w.partitionSpec.isEmpty =>
        findings += Finding("global_window",
          "window with no PARTITION BY moves ALL rows to one task")
      case s: org.apache.spark.sql.execution.SortExec
          if s.global && !underTakeOrdered(root, s) =>
        findings += Finding("global_sort",
          s"global sort on ${s.sortOrder.map(_.child.sql).mkString(", ")}")
      case _ => ()
    }
    val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
    val broadcasts = nodes.count(_.isInstanceOf[BroadcastExchangeExec])
    findings += Finding("shuffle_count", shuffles.toString)
    findings += Finding("broadcast_count", broadcasts.toString)
    findings.result()
  }

  /** Hard gate: throw if any finding of the given kinds is present
    * (default: the three patterns that are never right at scale). */
  def requireClean(df: DataFrame,
                   kinds: Set[String] = Set("cartesian_product",
                     "nested_loop_join", "global_window")): Unit = {
    val bad = lint(df).filter(f => kinds.contains(f.kind))
    if (bad.nonEmpty)
      throw new IllegalStateException(
        "plan lint failed:\n" +
          bad.map(f => s"  [${f.kind}] ${f.detail}").mkString("\n"))
  }

  /** All nodes including those under AQE wrappers and reused
    * subtrees (collectWithSubqueries misses the AQE initial plan). */
  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val here = p.collect { case n => n }
    val nested = here.flatMap {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)
      case _ => Nil
    }
    here ++ nested
  }

  /** A global SortExec directly feeding a limit is a top-k head, not
    * a full sort of the output — Spark usually plans TakeOrdered
    * instead, but AQE stages can leave the pair visible. */
  private def underTakeOrdered(root: SparkPlan, sort: SparkPlan): Boolean =
    root.collect {
      case l: org.apache.spark.sql.execution.GlobalLimitExec
        if l.collect { case s if s eq sort => s }.nonEmpty => l
      case l: org.apache.spark.sql.execution.LocalLimitExec
        if l.collect { case s if s eq sort => s }.nonEmpty => l
    }.nonEmpty
}
