package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Streaming contamination gate: the continuous twin of
  * `Dedup.containmentPairsAcross` for the shape production actually
  * has — the NEEDLES (a benchmark suite) are small and static, the
  * corpus is the incoming crawl. Every arriving document is checked
  * for fractional containment of any needle, so contaminated docs can
  * be quarantined at ingest instead of in a nightly batch.
  *
  * Because the needle side is static, the operator is STATELESS: no
  * keyed state, no watermark, no timeout bookkeeping. The stream-
  * static join broadcasts the prepared needle table and every check
  * is a per-row array intersection — a crashed query resumes with no
  * state to recover, and the result for a document is a pure function
  * of that document plus the (versioned, e.g. Manifest-published)
  * needle table.
  *
  * Vocabulary semantics match the batch operator exactly, with the
  * reference-corpus df snapshot passed EXPLICITLY: a stream has no
  * global df to cap by, so the caller provides the corpus the
  * discriminativeness statistics come from (yesterday's crawl, the
  * previous manifest version). Needle tokens absent from the
  * reference count at df 0 — maximally discriminative, in the
  * denominator, matchable only if the document actually contains
  * them. Candidates require an overlap with the needle's
  * `maxJoinTokens` rarest in-vocab tokens (the batch probe rule);
  * verification intersects the FULL in-vocab needle token set with
  * the document's tokens, so the emitted containment equals the
  * batch operator's bit-for-bit (one division of two exact ints).
  *
  * Scale: the needle table must be broadcastable — true by
  * construction for benchmark suites (10³–10⁵ short docs). For
  * corpus-scale needle sets use the batch operator, which shuffles
  * both sides. */
object ContainStream {

  /** One-time batch prep of the needle side: per needle, its sorted
    * in-vocab token set, the denominator `n_a`, and its
    * `maxJoinTokens` rarest probe tokens (global-df rank, token text
    * tie-break — the batch operator's ranking). Needles whose tokens
    * are ALL reference-frequent produce no row, matching the batch
    * semantics (no denominator, no pairs). */
  def needleTable(needles: DataFrame, refCorpus: DataFrame,
                  idCol: String, textCol: String,
                  dfNum: Int = 1, dfDen: Int = 5,
                  maxJoinTokens: Int = 16): DataFrame = {
    def tokify(c: org.apache.spark.sql.Column) =
      array_distinct(split(TextFunctions.normalize(c), " "))
    val refToks = refCorpus
      .select(col(idCol).as("id"), explode(tokify(col(textCol))).as("tok"))
      .where(length(col("tok")) > 0)
    val nRef = refCorpus.agg(countDistinct(col(idCol)).as("n_docs"))
    val dfRef = refToks.groupBy("tok").agg(count(lit(1)).as("df"))
    val ntoks = needles
      .select(col(idCol).as("needle_id"),
              explode(tokify(col(textCol))).as("tok"))
      .where(length(col("tok")) > 0)
      .join(dfRef.hint("merge"), Seq("tok"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .crossJoin(broadcast(nRef))
      .where(col("df") * dfDen <= col("n_docs") * dfNum)
    val kw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("needle_id")).orderBy(col("df"), col("tok"))
    ntoks.withColumn("rn", row_number().over(kw))
      .groupBy("needle_id")
      .agg(sort_array(collect_list(col("tok"))).as("toks"),
           count(lit(1)).as("n_a"),
           sort_array(collect_list(
             when(col("rn") <= maxJoinTokens, col("tok")))).as("probes"))
  }

  /** Contaminated (doc, needle) pairs over a stream of
    * (doc_id, ts, text). `needleTbl` comes from [[needleTable]] —
    * materialize it (e.g. write + re-read, or cache) so the prep
    * doesn't replan per micro-batch. Emits each contaminated pair
    * exactly once per arriving document row. */
  def contaminated(docs: DataFrame, needleTbl: DataFrame,
                   minNum: Int = 1, minDen: Int = 2): DataFrame = {
    val tk = array_distinct(split(TextFunctions.normalize(col("text")), " "))
    docs.select(col("doc_id"), col("ts"), tk.as("tk"))
      .join(broadcast(needleTbl),
            arrays_overlap(col("tk"), col("probes")))
      .select(col("doc_id"), col("needle_id"), col("ts"),
        size(array_intersect(col("toks"), col("tk"))).as("shared"),
        col("n_a"))
      .where(col("shared") * minDen >= col("n_a") * minNum)
      .select(col("doc_id"), col("needle_id"),
        (col("shared").cast("double") / col("n_a").cast("double"))
          .as("containment"),
        col("ts"))
  }
}
