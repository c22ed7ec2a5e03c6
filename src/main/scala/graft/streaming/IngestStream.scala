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
    * `maxUnkFrac` are dropped — the ingest gate. */
  def prepare(docs: DataFrame, idCol: String, textCol: String,
              sourceCol: String, vocab: Seq[String],
              minQuality: Double = 0.3,
              maxUnkFrac: Double = 0.5): DataFrame = {
    val toks = Wordpiece.tokenizeNative(col(textCol), vocab)
    val q = TextFunctions.qualityScore(col(textCol))
    docs.select(col(idCol), col(sourceCol), q.as("quality"),
                toks.as("tokens"))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
      .withColumn("n_unk",
        size(filter(col("tokens"), t => t === "[UNK]")).cast("long"))
      .where(col("quality") >= minQuality &&
             col("n_tokens") > 0 &&
             col("n_unk").cast("double") <=
               col("n_tokens").cast("double") * maxUnkFrac)
  }
}
