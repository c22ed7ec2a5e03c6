package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Wordpiece

/** Ingest-time document preparation: the stateless streaming twin of
  * the batch tokenize/quality pipeline — every arriving document is
  * normalized, quality-scored, WordPiece-tokenized (the native
  * expression), and gated, so the crawl lands in the lake already
  * training-shaped instead of waiting for a nightly batch pass.
  *
  * STATELESS by design (the ContainStream discipline): no keyed
  * state, no watermark — the output row is a pure function of the
  * input row plus the (versioned) vocabulary, so a crashed query
  * resumes with nothing to recover and the stream result is
  * BIT-equal to running the batch expressions over the same rows
  * (IngestStreamSpec asserts exactly that, token-for-token).
  *
  * Scale: per-row expression work only — the stream sustains
  * whatever the scan sustains; the vocabulary rides the plan as the
  * native expression's reference object, republished by restarting
  * the query against a new Manifest version. */
object IngestStream {

  /** Prepared schema: id, source, quality, tokens, n_tokens, n_unk.
    * Documents below `minQuality` or with an [UNK] fraction above
    * `maxUnkFrac` are dropped — the ingest gate.
    *
    * Evaluation shape (r14 STREAMBENCH finding 2): the r14 form let
    * predicate pushdown inline the MaxMatch tokenizer into the gate's
    * n_tokens and n_unk predicates — the most expensive expression in
    * the stream evaluated ~3× per row. The fused form computes ONE
    * (quality, tokens, n_tokens, n_unk) struct per row behind a
    * Generate barrier — `explode(array(struct))` materializes the
    * struct before the gate, and neither CollapseProject nor predicate
    * pushdown rewrites across a generator — with the tokenizer
    * let-bound inside ([[graft.functions.GraftFunctions.once]], the
    * DocsStream precedent) so size/unk-count reuse the bound value.
    * The gate and the output projection then read struct FIELDS of the
    * materialized row: the tokenizer runs exactly once per document. */
  def prepare(docs: DataFrame, idCol: String, textCol: String,
              sourceCol: String, vocab: Seq[String],
              minQuality: Double = 0.3,
              maxUnkFrac: Double = 0.5): DataFrame = {
    val prep = graft.functions.GraftFunctions.once(
      Wordpiece.tokenizeNative(col(textCol), vocab)) { t =>
      struct(
        TextFunctions.qualityScore(col(textCol)).as("quality"),
        t.as("tokens"),
        size(t).cast("long").as("n_tokens"),
        size(filter(t, x => x === "[UNK]")).cast("long").as("n_unk"))
    }
    docs.select(col(idCol), col(sourceCol), explode(array(prep)).as("p"))
      .where(col("p.quality") >= minQuality &&
             col("p.n_tokens") > 0 &&
             col("p.n_unk").cast("double") <=
               col("p.n_tokens").cast("double") * maxUnkFrac)
      .select(col(idCol), col(sourceCol), col("p.quality").as("quality"),
              col("p.tokens").as("tokens"),
              col("p.n_tokens").as("n_tokens"),
              col("p.n_unk").as("n_unk"))
  }
}
