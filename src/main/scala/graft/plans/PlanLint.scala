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
  *    the broadcast side, usually a missing equi-join key. NOT flagged
  *    when the BUILD side is provably ≤ [[BoundedRows]] rows (see
  *    [[maxRowsOf]]) — a scalar/top-k broadcast cross-joined onto a
  *    big table costs O(build) per row and is THE idiomatic way to
  *    attach a global aggregate or a literal probe; those surface as
  *    informational `nested_loop_join_bounded` instead.
  *  - `global_window`       — a Window with no PARTITION BY moves the
  *    entire dataset to ONE task (Spark itself warns at runtime; the
  *    linter says it before the shuffle happens). A window whose INPUT
  *    is provably ≤ [[BoundedRows]] rows (post-top-k heads, bucket
  *    tables under an explicit limit) is `global_window_bounded`.
  *  - `global_sort`         — a total ordering: legitimate for top-k
  *    heads (TakeOrdered shows up instead) and as the LAST operation
  *    (a sorted-output contract — a range-partitioned distributed
  *    sort, surfaced as informational `global_sort_output`), a scale
  *    smell anywhere else (sorting to then re-shuffle is wasted work).
  *    Bounded-input sorts are suppressed like windows.
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

  /** Two-plan lint — the form the suite-wide sweep runs. The INITIAL
    * plan is authoritative for the structural (scale-invariant) story:
    * AQE's stats-based simplifications can ERASE the very structure
    * that proves boundedness (EliminateLimits drops a declared
    * GlobalLimit once the materialized stage shows fewer rows), so a
    * final-plan-only walk reports false positives on bounded patterns.
    * The EXECUTED plan contributes what runtime re-planning can
    * introduce: `skew_join_split` always, plus any finding of a KIND
    * the initial plan carries no node of (bounded or flagged) — e.g. a
    * cartesian AQE converted into a broadcast nested loop. An executed
    * finding whose kind the initial plan fully classified as bounded
    * is dropped as a stats-elision artifact. Call on a FRESH
    * DataFrame — an already-executed one has lost its initial plan. */
  def lintFull(df: DataFrame): Seq[Finding] =
    reconcile(lint(df), lintExecuted(df))

  /** The two-plan merge, exposed for direct spec coverage. An executed
    * finding is a stats-elision ARTIFACT (drop it) only when the
    * initial plan actually classified that kind harmless: the finding
    * is itself an informational variant, the exact flagged kind
    * already appears initially (no double-report), or the initial
    * plan proved the base kind BOUNDED and AQE's EliminateLimits
    * merely erased the proof. `global_sort_output` is NOT a
    * boundedness proof — it certifies the sort's POSITION (output
    * contract), which an AQE re-plan can change — so a flagged
    * executed global_sort is KEPT when the initial plan carried only
    * the output-contract variant (r15 ADVICE: the old base-kind fold
    * suppressed those as artifacts). */
  private[graft] def reconcile(initial: Seq[Finding],
                               executed: Seq[Finding]): Seq[Finding] = {
    def base(k: String): String = k match {
      case "nested_loop_join_bounded" => "nested_loop_join"
      case "global_window_bounded" => "global_window"
      case "global_sort_bounded" | "global_sort_topk" |
           "global_sort_output" => "global_sort"
      case other => other
    }
    val informational = Set("nested_loop_join_bounded",
      "global_window_bounded", "global_sort_bounded", "global_sort_topk",
      "global_sort_output", "shuffle_count", "broadcast_count")
    val initialKinds = initial.map(_.kind).toSet
    val initialBases = initial.map(f => base(f.kind)).toSet
    val provedBoundedBases = initial.collect {
      case f if informational.contains(f.kind) &&
                f.kind != "global_sort_output" => base(f.kind)
    }.toSet
    initial ++ executed.filter(f =>
      f.kind == "skew_join_split" ||
        // runtime-INTRODUCED structure stays observable: an executed
        // informational finding whose base kind never appeared in the
        // initial plan (e.g. an AQE-only global_sort_topk) is new
        // information, not a stats-elision artifact (r16 advice — the
        // old filter dropped every informational executed kind)
        (informational.contains(f.kind) &&
         !initialBases.contains(base(f.kind))) ||
        (!informational.contains(f.kind) &&
         !initialKinds.contains(f.kind) &&
         !provedBoundedBases.contains(base(f.kind))))
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

  /** A node is "bounded" when [[maxRowsOf]] can PROVE its output row
    * count ≤ this. Sized for the engine's legit patterns: scalar
    * broadcasts (1 row), top-k heads (≤ a few hundred), bucket/offset
    * tables (≤ shuffle-partition count). A real dimension table never
    * proves this small from plan structure alone. */
  val BoundedRows = 1024L

  /** Provable upper bound on a physical node's output rows, from plan
    * STRUCTURE only (no statistics, no execution): literal scans carry
    * their row count, a grouping-free aggregate emits exactly one row,
    * limits cap whatever is under them, row-preserving unaries pass
    * through, joins multiply. Conservative: anything that can expand
    * unpredictably (Generate, mapPartitions, leaf file scans) is
    * unbounded. This is the lint-side twin of Catalyst's
    * `LogicalPlan.maxRows`, computed on the EXECUTED plan where the
    * logical links may be gone. */
  def maxRowsOf(p: SparkPlan): Option[Long] = {
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.aggregate._
    import org.apache.spark.sql.execution.joins._
    def mul(a: Long, b: Long): Long =
      if (a == 0 || b == 0) 0
      else if (a > Long.MaxValue / b) Long.MaxValue else a * b
    def add(a: Long, b: Long): Long =
      if (a > Long.MaxValue - b) Long.MaxValue else a + b
    // Join bounds are joinType-shaped: l*r holds only for inner/cross.
    // An outer join emits its preserved side's rows even against a
    // 0-row other side (mul would misprove 0 and let a real
    // global_window/nested_loop finding downgrade past requireClean);
    // semi/anti/existence emit ≤ one row per STREAMED-side row, so the
    // left bound alone suffices — even when the right is unprovable.
    def joinBound(jt: org.apache.spark.sql.catalyst.plans.JoinType,
                  left: SparkPlan, right: SparkPlan): Option[Long] = {
      import org.apache.spark.sql.catalyst.plans._
      lazy val l = maxRowsOf(left)
      lazy val r = maxRowsOf(right)
      jt match {
        case LeftSemi | LeftAnti | _: ExistenceJoin => l
        case Inner | Cross => for (a <- l; b <- r) yield mul(a, b)
        case LeftOuter => for (a <- l; b <- r) yield add(mul(a, b), a)
        case RightOuter => for (a <- l; b <- r) yield add(mul(a, b), b)
        case FullOuter =>
          for (a <- l; b <- r) yield add(add(mul(a, b), a), b)
        case _ => None // Using/Natural joins never reach physical plans
      }
    }
    p match {
      case a: AdaptiveSparkPlanExec => maxRowsOf(a.executedPlan)
      case s: QueryStageExec =>
        // A MATERIALIZED stage knows its actual row count — and AQE's
        // stats-based EliminateLimits may have already consumed the
        // structural GlobalLimit that proved the bound pre-flight, so
        // the runtime count is often the only evidence left in the
        // final plan. This makes the executed-plan walk certify THE
        // RUN; the scale-invariant STRUCTURAL certificate comes from
        // linting the initial plan (LintSweep lints both and unions).
        val runtime = scala.util.Try(
          s.getRuntimeStatistics.rowCount.map(_.toLong)).toOption.flatten
        val structural = maxRowsOf(s.plan)
        (runtime, structural) match {
          case (Some(r), Some(t)) => Some(math.min(r, t))
          case (r, t) => r.orElse(t)
        }
      case r: exchange.ReusedExchangeExec => maxRowsOf(r.child)
      case l: LocalTableScanExec => Some(l.rows.length.toLong)
      case r: RangeExec =>
        Some(if (r.numElements.isValidLong) r.numElements.toLong
             else Long.MaxValue)
      case g: GlobalLimitExec => Some(g.limit.toLong)
      case l: LocalLimitExec => maxRowsOf(l.child) // per-partition: no global cap
      case t: TakeOrderedAndProjectExec => Some(t.limit.toLong)
      case t: CollectLimitExec => Some(t.limit.toLong)
      case a: HashAggregateExec if a.groupingExpressions.isEmpty => Some(1L)
      case a: SortAggregateExec if a.groupingExpressions.isEmpty => Some(1L)
      case a: ObjectHashAggregateExec if a.groupingExpressions.isEmpty => Some(1L)
      case j: BroadcastNestedLoopJoinExec => joinBound(j.joinType, j.left, j.right)
      case j: CartesianProductExec => // inner-only by construction
        for (l <- maxRowsOf(j.left); r <- maxRowsOf(j.right)) yield mul(l, r)
      case j: BroadcastHashJoinExec => joinBound(j.joinType, j.left, j.right)
      case j: SortMergeJoinExec => joinBound(j.joinType, j.left, j.right)
      case j: ShuffledHashJoinExec => joinBound(j.joinType, j.left, j.right)
      case u: UnionExec =>
        val bs = u.children.map(maxRowsOf)
        if (bs.forall(_.isDefined)) Some(bs.flatten.foldLeft(0L)((a, b) =>
          if (a > Long.MaxValue - b) Long.MaxValue else a + b))
        else None
      case e: ExpandExec =>
        maxRowsOf(e.child).map(mul(_, e.projections.size.toLong))
      // row-preserving (or row-reducing) single-child nodes
      case n @ (_: ProjectExec | _: FilterExec | _: SortExec |
                _: exchange.ShuffleExchangeExec |
                _: exchange.BroadcastExchangeExec |
                _: WholeStageCodegenExec | _: InputAdapter |
                _: ColumnarToRowExec | _: RowToColumnarExec |
                _: CoalesceExec | _: window.WindowExec) =>
        maxRowsOf(n.children.head)
      case _ => None
    }
  }

  // +1 admits Bounds.declare's witness row: declare(n) plants
  // limit(n+1) so the overflow guard can see row n+1, and a
  // full-threshold declaration (n = BoundedRows) must still classify
  private def bounded(p: SparkPlan): Boolean =
    maxRowsOf(p).exists(_ <= BoundedRows + 1)

  private def walk(root: SparkPlan): Seq[Finding] = {
    val findings = Vector.newBuilder[Finding]
    var shuffles = 0
    var broadcasts = 0
    // `ancestors` is innermost-first and crosses AQE/stage boundaries,
    // so "nothing above this sort but output plumbing" is answerable.
    def visit(p: SparkPlan, ancestors: List[SparkPlan]): Unit = {
      p match {
        case c: CartesianProductExec =>
          findings += Finding("cartesian_product",
            s"cartesian product over ${c.left.nodeName} x ${c.right.nodeName}")
        case j: BroadcastNestedLoopJoinExec =>
          val build = j.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
            case _ => j.right
          }
          maxRowsOf(build) match {
            // +1: Bounds.declare's witness row, as in bounded()
            case Some(n) if n <= BoundedRows + 1 =>
              findings += Finding("nested_loop_join_bounded",
                s"broadcast nested loop join (${j.joinType}), build side " +
                  s"provably <= $n rows - O($n) per stream row by construction")
            case _ =>
              findings += Finding("nested_loop_join",
                s"broadcast nested loop join (${j.joinType}) - missing equi key?")
          }
        case w: WindowExec if w.partitionSpec.isEmpty =>
          if (bounded(w.child))
            findings += Finding("global_window_bounded",
              s"global window over a provably <= ${maxRowsOf(w.child).get}-row input")
          else
            findings += Finding("global_window",
              "window with no PARTITION BY moves ALL rows to one task")
        case s: org.apache.spark.sql.execution.SortExec if s.global =>
          if (underLimit(ancestors)) // top-k head: TakeOrdered semantics
            findings += Finding("global_sort_topk",
              "global sort directly under a limit - top-k head")
          else if (bounded(s.child)) // tiny input: single-task sort is free
            findings += Finding("global_sort_bounded",
              s"global sort over a provably <= ${maxRowsOf(s.child).get}-row input")
          else if (outputOnly(ancestors))
            findings += Finding("global_sort_output",
              s"sorted-output contract (range-partitioned) on " +
                s"${s.sortOrder.map(_.child.sql).mkString(", ")}")
          else
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
        case _: ShuffleExchangeExec => shuffles += 1
        case _: BroadcastExchangeExec => broadcasts += 1
        case _ => ()
      }
      // descend — INCLUDING through AQE wrappers and materialized
      // stages (QueryStageExec is a LEAF to TreeNode.collect; a
      // finalized plan hides every exchange inside stages, so the walk
      // must enter `stage.plan` or the executed-plan lint would count
      // zero shuffles/broadcasts on any adaptive run)
      val next = p :: ancestors
      p match {
        case a: AdaptiveSparkPlanExec => visit(a.executedPlan, next)
        case s: QueryStageExec => visit(s.plan, next)
        case _ => p.children.foreach(visit(_, next))
      }
    }
    visit(root, Nil)
    findings += Finding("shuffle_count", shuffles.toString)
    findings += Finding("broadcast_count", broadcasts.toString)
    findings.result()
  }

  /** A global SortExec under a limit is a top-k head, not a full sort
    * of the output — Spark usually plans TakeOrdered instead, but AQE
    * stages can leave the pair visible. */
  private def underLimit(ancestors: List[SparkPlan]): Boolean =
    ancestors.exists {
      case _: org.apache.spark.sql.execution.GlobalLimitExec => true
      case _: org.apache.spark.sql.execution.LocalLimitExec => true
      case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
      case _: org.apache.spark.sql.execution.CollectLimitExec => true
      case _ => false
    }

  /** True when everything above the node is output plumbing — the
    * node's effect reaches the USER, not further computation. A global
    * sort here is a presentation contract (ORDER BY on the final
    * result), executed as a range-partitioned distributed sort. */
  private def outputOnly(ancestors: List[SparkPlan]): Boolean =
    ancestors.forall {
      case _: org.apache.spark.sql.execution.ProjectExec => true
      case _: org.apache.spark.sql.execution.WholeStageCodegenExec => true
      case _: org.apache.spark.sql.execution.InputAdapter => true
      case _: org.apache.spark.sql.execution.ColumnarToRowExec => true
      case _: AdaptiveSparkPlanExec => true
      case _: QueryStageExec => true
      case _ => false
    }
}
