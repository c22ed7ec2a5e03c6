package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Persisted character-trigram index for corpus-scale LITERAL search —
  * "grep the corpus without scanning it". The production need behind
  * it: targeted sweeps over a 100 TB corpus for exact strings —
  * benchmark needles quoted verbatim, leaked keys/PII literals,
  * license boilerplate, tracking snippets — where a full-scan
  * `contains()` pass per sweep re-reads everything and the BM25 index
  * (token-grain, [[InvertedIndex]]) cannot answer substring questions
  * (patterns cross token boundaries, punctuation, casing).
  *
  * Reference evidence: the warehouse's LIKE-filtered dim join
  * (`/root/reference/mnt/dags/unused_pipeline.py` promo `LIKE '%...%'`
  * shape) — the same predicate a lake-scale engine must answer
  * without a scan.
  *
  * Index = two clustered parquet tables + their [[StatsIndex]] file
  * stats:
  *  - `postings`: (h, doc_id) — one row per DISTINCT trigram per doc,
  *    h = xxhash64 of the 3-code-point gram's UTF-8 bytes (the
  *    zero-copy [[graft.functions.expressions.CharGramHashes]], seed
  *    42), range-clustered by h so a probe's trigram set touches a few
  *    files out of the fleet;
  *  - `docs`: (doc_id, text) range-clustered by doc_id so candidate
  *    verification fetches clustered ranges, not the corpus.
  *
  * Probe (build-once / probe-many, the AnnIndex discipline):
  *  1. the patterns' distinct trigram hashes evaluate IN-ENGINE over a
  *     local relation (hash identity with the build side by
  *     construction — no driver re-implementation to drift);
  *  2. postings files prune twice — [[StatsIndex.prunedFilesIn]] drops
  *     files whose [min, max] can hold none of the probe hashes
  *     (file-level, one small index read), and the pushed `h IN (...)`
  *     predicate skips row groups inside survivors;
  *  3. a doc is a CANDIDATE for a pattern when it holds ALL of the
  *     pattern's distinct trigrams (count match after the equi-join
  *     with the broadcast probe grams) — a superset of true matches by
  *     construction: containment implies every trigram present, and a
  *     hash collision only ADDS candidates;
  *  4. exact verify: candidates join the doc-clustered table and
  *     `contains(text, pattern)` decides — the trigram layer is purely
  *     an access path, so the result is LOSSLESS regardless of
  *     collisions (the minhash→jaccard verify split, applied to grep).
  *
  * Scale: probe cost ∝ the probe trigrams' posting lists + candidate
  * fetch, independent of corpus size once clustered. Patterns are a
  * bounded probe set by contract (a sweep carries tens to thousands of
  * literals, not a corpus) — they ride the plan as literals/broadcast.
  * Patterns shorter than 3 code points carry no trigram and are
  * rejected loudly: route those through a plain filtered scan, where
  * no index can help. */
object GrepIndex {

  /** Build the index at `root` from (idCol, textCol) documents. */
  def build(spark: SparkSession, docs: DataFrame, idCol: String,
            textCol: String, root: String, nFiles: Int = 16): Unit = {
    val postings = docs.select(
        col(idCol).cast("long").as("doc_id"),
        explode(array_distinct(
          GraftFunctions.charGramHashes(col(textCol), 3))).as("h"))
      .select(col("h"), col("doc_id"))
    Lake.writeSorted(postings, s"$root/postings", "h", nFiles)
    StatsIndex.write(spark, s"$root/postings", Seq("h"))
    Lake.writeSorted(
      docs.select(col(idCol).cast("long").as("doc_id"),
                  col(textCol).as("text")),
      s"$root/docs", "doc_id", nFiles)
    StatsIndex.write(spark, s"$root/docs", Seq("doc_id"))
  }

  /** Verified matches (pattern_id, doc_id) for a bounded literal
    * pattern set. Records the postings file-prune ratio in session
    * conf `spark.graft.grep.lastPruned` ("kept/total"). */
  def probe(spark: SparkSession, root: String,
            patterns: Seq[(Long, String)]): DataFrame = {
    require(patterns.nonEmpty, "no patterns to probe")
    require(patterns.forall(_._2.length >= 3),
      "patterns shorter than 3 code points carry no trigram - " +
        "run those through a plain filtered scan")
    import spark.implicits._
    val pat = patterns.toDF("pattern_id", "pattern")
    // probe-gram table, evaluated by the SAME expression the build
    // used — tiny (bounded probe set), collected once for the scan
    // pushdown and broadcast for the count match
    val pg = pat.select(col("pattern_id"),
        explode(array_distinct(
          GraftFunctions.charGramHashes(col("pattern"), 3))).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val hs = pg.map(_._2).distinct.toSeq
    val need = pg.groupBy(_._1).map { case (pid, rs) =>
      (pid, rs.length.toLong) }.toSeq.toDF("pattern_id", "need")
    val pgDf = pg.toSeq.toDF("pattern_id", "h")
    val (kept, all) = StatsIndex.prunedFilesIn(
      spark, s"$root/postings", "h", hs)
    spark.conf.set("spark.graft.grep.lastPruned", s"${kept.size}/${all.size}")
    if (kept.isEmpty)
      return pat.select(col("pattern_id"), lit(0L).as("doc_id")).limit(0)
    val candidates = spark.read.parquet(kept: _*)
      .where(col("h").isin(hs: _*)) // row-group skipping inside survivors
      .join(broadcast(pgDf), "h")
      .groupBy(col("doc_id"), col("pattern_id"))
      .agg(count(lit(1)).as("got")) // postings are distinct per doc
      .join(broadcast(need), "pattern_id")
      .where(col("got") === col("need"))
      .select(col("doc_id"), col("pattern_id"))
    // exact verify against the doc-clustered table: AQE broadcasts the
    // candidate side when the sweep is selective; collisions and
    // trigram-subset coincidences die here, so the output is exact
    spark.read.parquet(s"$root/docs")
      .join(candidates, "doc_id")
      .join(broadcast(pat), "pattern_id")
      .where(col("text").contains(col("pattern")))
      .select(col("pattern_id"), col("doc_id"))
  }
}
