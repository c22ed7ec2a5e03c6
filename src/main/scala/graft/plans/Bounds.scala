package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declared row bounds — the in-plan contract [[PlanLint]]'s
  * boundedness classifier reads.
  *
  * Many legitimate plans broadcast a side the AUTHOR knows is tiny (a
  * probe set, a bucket-offset table, a source grid) through operators
  * that are only sane when that side IS tiny (a theta/cross nested
  * loop, a single-task window). The plan itself usually cannot prove
  * it: a filter on a unique key, a groupBy over a low-NDV column, or a
  * checkpointed intermediate all have unbounded structural maxRows.
  * [[declare]] turns the author's knowledge into plan structure — a
  * `GlobalLimit(n+1)` the classifier can read — and makes a WRONG
  * declaration fail LOUD instead of silently truncating (the
  * packed-CDC range-guard discipline applied to cardinality): any row
  * past position n raises before a result can be consumed, naming the
  * declaration that lied.
  *
  * Cost: one single-partition exchange of ≤ n+1 rows — free at the
  * sizes the primitive is for (declarations above
  * [[PlanLint.BoundedRows]] defeat the purpose and are rejected).
  */
object Bounds {

  /** `df`, declared to hold at most `n` rows. The declaration is
    * enforced: row n+1 (if any) raises with `what` in the message.
    * Row VALUES and order semantics are untouched when the
    * declaration holds — the limit is a no-op above a ≤ n-row input. */
  def declare(df: DataFrame, n: Int, what: String): DataFrame = {
    require(n >= 1 && n <= PlanLint.BoundedRows,
      s"declared bound $n outside [1, ${PlanLint.BoundedRows}] - " +
        "bounds above PlanLint.BoundedRows cannot classify as bounded")
    // limit(n+1) keeps one witness row past the bound alive so the
    // guard can see it; the guard needs monotonically_increasing_id
    // to be 0..k-1, i.e. a SINGLE-partition input. GlobalLimit's
    // output is single-partition — but the optimizer's
    // EliminateLimits DELETES limit(n+1) whenever the input's maxRows
    // is statically provable ≤ n+1 (Range, literal relations), and
    // then the id is evaluated over the input's natural layout where
    // every row in partition ≥ 1 carries id ≥ 2^33 > n and the guard
    // would fire on a HELD declaration. coalesce(1) makes the guard
    // independent of the limit surviving: a no-op above a surviving
    // GlobalLimit (already one partition), and it restores contiguous
    // ids when the limit was elided. The nondeterministic id also
    // pins the filter AT this position (Catalyst will not push or
    // fold it past the coalesce).
    df.limit(n + 1).coalesce(1).where(
      when(monotonically_increasing_id() < n, lit(true))
        .otherwise(raise_error(lit(
          s"declared bound violated: '$what' exceeds $n rows"))))
  }
}
