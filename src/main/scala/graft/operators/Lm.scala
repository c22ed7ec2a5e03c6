package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus bigram language-model scoring — the CCNet-style quality
  * gate (Wenzek et al. 2020): train a cheap n-gram LM on a REFERENCE
  * slice (the clean domain), score every document by how well the LM
  * predicts it, and filter the tail. Complements `rare_token_stats`
  * (unigram bag): a document of common words in impossible ORDER
  * looks fine to a bag model and lights up here.
  *
  * Decomposed for exactness (the Dsir pattern): [[novelty]] emits
  * exact integer evidence — bigram count, unseen-bigram count
  * (soft-OOV rate), reference hit mass — and is driver-oracle
  * hash-exact; [[meanNll]] is the real add-one-smoothed mean negative
  * log-likelihood (ln is engine-local in the last bit → rows-only,
  * semantics spec-gated: reference-slice docs score better).
  *
  * Scale shape: the reference count tables are (w1,w2)- and w1-keyed
  * aggregates of the reference slice (one partial-agg shuffle each);
  * scoring is ONE equi-join of the doc-bigram stream against the
  * bigram table (shuffle or broadcast — AQE decides by actual size)
  * plus a per-doc partial agg. Nothing driver-side, nothing
  * quadratic; the gram stream is corpus-linear.
  */
object Lm {

  /** Reference-side join strategy. The ref count tables are
    * AGGREGATES, so the static planner has no size estimate and
    * plans the stream⋈ref join as sort-merge; AQE converts it to
    * broadcast-hash once the ref materializes small — but by then
    * the doc-gram stream's shuffle WRITE on (w1,w2) has already been
    * paid (measured at 100×: 500 MB write, 5× the CPU of the hinted
    * plan, for a 931-row ref). `"broadcast"` skips that exchange up
    * front when the caller knows the ref vocabulary is bounded;
    * `"auto"` (default) leaves the decision to AQE, which is the
    * right call for open-vocabulary 100 TB refs where the bigram
    * table is itself corpus-sized and MUST sort-merge. */
  private def hinted(ref: DataFrame, hint: String): DataFrame = hint match {
    case "auto"      => ref
    case "broadcast" => broadcast(ref)
    case other => throw new IllegalArgumentException(
      s"refJoinHint must be auto|broadcast, got $other")
  }

  /** Adjacent-bigram stream (normalized): one row per position. */
  private[graft] def bigrams(docs: DataFrame, idCol: String,
                             textCol: String): DataFrame = {
    val toks = split(TextFunctions.normalize(col(textCol)), " ")
    docs.select(col(idCol),
        explode(zip_with(
          slice(toks, lit(1), size(toks) - 1),
          slice(toks, lit(2), size(toks) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
  }

  /** Exact bigram counts of the reference slice. */
  def fitBigrams(ref: DataFrame, idCol: String, textCol: String): DataFrame =
    bigrams(ref, idCol, textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))

  /** Context (first-token) counts DERIVED from the bigram counts —
    * c1 = Σ_w2 c12 by definition, so this is a vocabulary-sized agg
    * over the already-fitted table, not a second corpus explode
    * (measured at 100×: each extra reference explode re-pays the
    * normalize+split of the whole slice). */
  def contextsOf(refBigrams: DataFrame): DataFrame =
    refBigrams.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))

  /** Per-document integer LM evidence vs the reference counts:
    * total bigrams, bigrams UNSEEN in the reference (sequence-level
    * OOV — the add-one-smoothed terms the LM must guess), and the
    * total reference mass the document's bigrams hit. Every doc
    * keeps a row (id-spine left join — a <2-token doc reports 0s). */
  def novelty(docs: DataFrame, idCol: String, textCol: String,
              refBigrams: DataFrame,
              refJoinHint: String = "auto"): DataFrame = {
    val scored = bigrams(docs, idCol, textCol)
      .join(hinted(refBigrams, refJoinHint), Seq("w1", "w2"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
           sum(when(col("c12").isNull, 1L).otherwise(0L)).as("n_unseen"),
           sum(coalesce(col("c12"), lit(0L))).as("hit_mass"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_unseen"), lit(0L)).as("n_unseen"),
        coalesce(col("hit_mass"), lit(0L)).as("hit_mass"))
  }

  /** Add-one-smoothed mean negative log-likelihood per document:
    * mean over positions of −ln((c12+1)/(c1+V)), V = reference
    * context vocabulary size. Engine-deterministic doubles (ln is
    * libm-local in the last bit → not an oracle surface); docs with
    * no bigrams report NULL. */
  def meanNll(docs: DataFrame, idCol: String, textCol: String,
              refBigrams: DataFrame,
              refJoinHint: String = "auto"): DataFrame = {
    // the fit table feeds THREE consumers (bigram join, context join,
    // V) and Spark does not dedupe shared subtrees — uncheckpointed,
    // the reference slice's normalize+explode would run three times
    // (measured at 100×). It is vocabulary-bounded, so materialize
    // once; Blocks.freeAll (or the caller) reclaims it.
    val ref = refBigrams.localCheckpoint()
    val refContexts = contextsOf(ref)
    val v = refContexts.agg(count(lit(1)).as("v"))
    val nll = -log(
      (coalesce(col("c12"), lit(0L)) + lit(1)).cast("double") /
      (coalesce(col("c1"), lit(0L)) + col("v")).cast("double"))
    val scored = bigrams(docs, idCol, textCol)
      .join(hinted(ref, refJoinHint), Seq("w1", "w2"), "left")
      .join(hinted(refContexts, refJoinHint), Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .groupBy(col(idCol))
      .agg(avg(nll).as("mean_nll"), count(lit(1)).as("n_bigrams"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol), col("mean_nll"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"))
  }
}
