package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
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
  *  - `skew_join_split`     — AQE split a skewed join at runtime
  *    (executed-plan walks only; the initial plan never carries it).
  *    Informational-positive: the split WORKED, but it names the join
  *    whose key needs a [[graft.operators.Skew]] look before 100 TB.
  *  - `shuffle_count`       — informational: number of exchanges; the
  *    budget a pipeline author sizes against.
  *  - `broadcast_count`     — informational: broadcast builds; each
  *    one must be bounded by construction or it OOMs the driver.
  */
object PlanLint {

  final case class Finding(kind: String, detail: String)

  /** Lint the OPTIMIZED physical plan (pre-execution — AQE's initial
    * plan). Cheap and side-effect-free; pair with [[lintExecuted]]
    * when the runtime re-plan matters. */
  def lint(df: DataFrame): Seq[Finding] =
    walk(df.queryExecution.executedPlan)

  /** Lint the EXECUTED plan — the FINAL adaptive plan after AQE's
    * runtime re-planning. [[lint]] sees only the initial plan; at
    * runtime AQE can still introduce a BroadcastExchange (SMJ→BHJ
    * when the built side's actual bytes undercut the adaptive
    * threshold), split a skewed join, or coalesce partitions — all
    * invisible pre-flight. If `df` has not executed yet, this RUNS it
    * (a no-op job over the plan's own row RDD — the SAME
    * QueryExecution instance, so the walked plan is exactly the one
    * that executed; cost = one full pass with nothing collected).
    * Call it after the real action to lint for free. */
  def lintExecuted(df: DataFrame): Seq[Finding] = {
    val qe = df.queryExecution
    qe.executedPlan match {
      case a: AdaptiveSparkPlanExec if !a.isFinalPlan =>
        df.sparkSession.sparkContext
          .runJob(qe.toRdd, (_: Iterator[_]) => ())
      case _ => ()
    }
    walk(qe.executedPlan)
  }

  /** Hard gate: throw if any finding of the given kinds is present
    * (default: the three patterns that are never right at scale).
    * `executed = true` gates the final adaptive plan instead
    * (executing the query if needed — see [[lintExecuted]]). */
  def requireClean(df: DataFrame,
                   kinds: Set[String] = Set("cartesian_product",
                     "nested_loop_join", "global_window"),
                   executed: Boolean = false): Unit = {
    val found = if (executed) lintExecuted(df) else lint(df)
    val bad = found.filter(f => kinds.contains(f.kind))
    if (bad.nonEmpty)
      throw new IllegalStateException(
        "plan lint failed:\n" +
          bad.map(f => s"  [${f.kind}] ${f.detail}").mkString("\n"))
  }

  /** Data-level companion to the plan walks: run
    * [[graft.operators.Skew.report]] on a join/group key and lift the
    * hot keys into findings (`skewed_key`, one per top-k key whose
    * count exceeds `xMean` × the mean). The plan lints say what the
    * engine DID about skew; this says whether the DATA is skewed
    * before any join is even written — the pre-flight measurement
    * that chooses between plain, AQE-split, and
    * [[graft.operators.Skew.saltedJoin]] plans. Cost: one partial-agg
    * shuffle + a top-k head (bounded rows to the driver). */
  def skewFindings(df: DataFrame, keyCol: String,
                   xMean: Double = 4.0, k: Int = 5): Seq[Finding] =
    graft.operators.Skew.report(df, keyCol, k).collect().toSeq
      .filter(r => r.getAs[Double]("x_mean") >= xMean)
      .map(r => Finding("skewed_key",
        s"$keyCol=${r.get(1)} n=${r.getAs[Long]("n")} " +
          f"(${r.getAs[Double]("x_mean")}%.1fx mean over " +
          s"${r.getAs[Long]("n_keys")} keys)"))

  private def walk(root: SparkPlan): Seq[Finding] = {
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
      case smj: SortMergeJoinExec if smj.isSkewJoin =>
        findings += Finding("skew_join_split",
          s"AQE split a skewed sort-merge join on " +
            s"${smj.leftKeys.map(_.sql).mkString(", ")}")
      case shj: ShuffledHashJoinExec if shj.isSkewJoin =>
        findings += Finding("skew_join_split",
          s"AQE split a skewed shuffled-hash join on " +
            s"${shj.leftKeys.map(_.sql).mkString(", ")}")
      case _ => ()
    }
    val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
    val broadcasts = nodes.count(_.isInstanceOf[BroadcastExchangeExec])
    findings += Finding("shuffle_count", shuffles.toString)
    findings += Finding("broadcast_count", broadcasts.toString)
    findings.result()
  }

  /** All nodes including those under AQE wrappers and reused
    * subtrees (collectWithSubqueries misses the AQE current plan).
    * QueryStageExec is a LEAF to TreeNode.collect — a finalized plan
    * hides every materialized exchange inside stages, so the walk
    * must descend into `stage.plan` explicitly or the executed-plan
    * lint would count zero shuffles/broadcasts on any adaptive run. */
  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val here = p.collect { case n => n }
    val nested = here.flatMap {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)
      case s: QueryStageExec => collectAll(s.plan)
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
