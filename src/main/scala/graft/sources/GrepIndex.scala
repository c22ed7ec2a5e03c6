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

  /** Build the index at `root` from (idCol, textCol) documents. The
    * per-trigram document frequencies (`stats`) are part of the index:
    * probes use them to pick each pattern's RAREST trigrams and to
    * decide index-vs-scan (see [[probe]]). */
  def build(spark: SparkSession, docs: DataFrame, idCol: String,
            textCol: String, root: String, nFiles: Int = 16): Unit = {
    val postings = docs.select(
        col(idCol).cast("long").as("doc_id"),
        explode(array_distinct(
          GraftFunctions.charGramHashes(col(textCol), 3))).as("h"))
      .select(col("h"), col("doc_id"))
    Lake.writeSorted(postings, s"$root/postings", "h", nFiles)
    StatsIndex.write(spark, s"$root/postings", Seq("h"))
    spark.read.parquet(s"$root/postings")
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$root/stats")
    docs.select(count(lit(1)).cast("long").as("n_docs"))
      .write.mode("overwrite").parquet(s"$root/meta")
    Lake.writeSorted(
      docs.select(col(idCol).cast("long").as("doc_id"),
                  col(textCol).as("text")),
      s"$root/docs", "doc_id", nFiles)
    StatsIndex.write(spark, s"$root/docs", Seq("doc_id"))
  }

  /** Append a document batch to an existing index — the lifecycle leg
    * every persisted index here carries (the AnnIndex/InvertedIndex
    * discipline): only the BATCH is trigram'd; nothing re-reads prior
    * postings or documents. Postings and docs land as additional
    * range-clustered files (per-file clustering holds, fleet-level
    * ranges now overlap — StatsIndex pruning degrades gracefully, it
    * never breaks); the df stats fold EXACTLY (integer sums over a
    * full-outer merge, materialized before the overwrite so the read
    * never races its own rewrite), so append == rebuild for every
    * probe by construction — including the route decision, which
    * reads only (df, n_docs). Single-writer maintenance op (the
    * StatsIndex convention); publish through Manifest versions for
    * atomic cutover. */
  def append(spark: SparkSession, root: String, docs: DataFrame,
             idCol: String, textCol: String, nFiles: Int = 4): Unit = {
    val postings = docs.select(
        col(idCol).cast("long").as("doc_id"),
        explode(array_distinct(
          GraftFunctions.charGramHashes(col(textCol), 3))).as("h"))
      .select(col("h"), col("doc_id"))
      .repartitionByRange(math.max(nFiles, 1), col("h"))
      .sortWithinPartitions("h")
      .localCheckpoint() // two consumers: the write and the stats fold
    postings.write.mode("append").parquet(s"$root/postings")
    StatsIndex.update(spark, s"$root/postings")
    val merged = spark.read.parquet(s"$root/stats")
      .join(postings.groupBy(col("h")).agg(count(lit(1)).as("bdf")),
            Seq("h"), "full_outer")
      .select(col("h"),
        (coalesce(col("df"), lit(0L)) + coalesce(col("bdf"), lit(0L)))
          .as("df"))
      .localCheckpoint() // materialize BEFORE overwriting the input dir
    merged.write.mode("overwrite").parquet(s"$root/stats")
    val n0 = spark.read.parquet(s"$root/meta").head().getLong(0)
    val nb = docs.count()
    import spark.implicits._
    Seq(n0 + nb).toDF("n_docs")
      .write.mode("overwrite").parquet(s"$root/meta")
    docs.select(col(idCol).cast("long").as("doc_id"),
                col(textCol).as("text"))
      .repartitionByRange(math.max(nFiles, 1), col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.mode("append").parquet(s"$root/docs")
    StatsIndex.update(spark, s"$root/docs")
    graft.Blocks.freeCheckpoint(postings)
    graft.Blocks.freeCheckpoint(merged)
  }

  /** Verified matches (pattern_id, doc_id) for a bounded literal
    * pattern set.
    *
    * Selectivity discipline (the ContainStream rarest-token rule):
    * only each pattern's `maxProbeGrams` RAREST trigrams (by indexed
    * df) probe the posting lists — requiring a SUBSET of trigrams
    * keeps the candidate set a superset of true matches, and the
    * rarest subset carries all the selectivity a pattern has. A
    * pattern with a trigram absent from the index matches nothing and
    * is settled without touching a posting.
    *
    * Auto-route (the GraphRoute lesson applied to probes): when the
    * selected posting mass still rivals the corpus — the degenerate
    * regime of a tiny-vocabulary corpus where every trigram is
    * near-universal, measured at 1000×: index probe 70 s vs 20 s for
    * the plain scan — the probe routes to the exact `contains()` scan
    * over the doc-clustered table instead (estimated rows >
    * `scanFraction` × corpus docs). Both routes return the same exact
    * result; the choice lands in `spark.graft.grep.lastRoute`
    * ("index" | "scan") and the postings file-prune ratio (index
    * route) in `spark.graft.grep.lastPruned`. */
  def probe(spark: SparkSession, root: String,
            patterns: Seq[(Long, String)],
            maxProbeGrams: Int = 8,
            scanFraction: Double = 0.25): DataFrame = {
    require(patterns.nonEmpty, "no patterns to probe")
    require(patterns.forall(_._2.length >= 3),
      "patterns shorter than 3 code points carry no trigram - " +
        "run those through a plain filtered scan")
    require(maxProbeGrams >= 1, s"bad maxProbeGrams $maxProbeGrams")
    import spark.implicits._
    val pat = patterns.toDF("pattern_id", "pattern")
    // probe-gram table, evaluated by the SAME expression the build
    // used — tiny (bounded probe set), collected once
    val pg = pat.select(col("pattern_id"),
        explode(array_distinct(
          GraftFunctions.charGramHashes(col("pattern"), 3))).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val allHs = pg.map(_._2).distinct.toSeq
    // df of each probe trigram (missing ⇒ 0: no doc holds it)
    val dfOf = spark.read.parquet(s"$root/stats")
      .where(col("h").isin(allHs: _*))
      .as[(Long, Long)].collect().toMap
    // per pattern: rarest ≤ maxProbeGrams trigrams (df asc, h
    // tie-break — deterministic); any df-0 trigram settles the
    // pattern as matchless
    val selected = pg.groupBy(_._1).toSeq.flatMap { case (pid, rs) =>
      val ranked = rs.map(_._2).distinct.toSeq
        .map(h => (h, dfOf.getOrElse(h, 0L))).sortBy(t => (t._2, t._1))
      if (ranked.headOption.exists(_._2 == 0L)) Seq.empty[(Long, Long)]
      else ranked.take(maxProbeGrams).map { case (h, _) => (pid, h) }
    }
    if (selected.isEmpty) {
      spark.conf.set("spark.graft.grep.lastRoute", "index")
      spark.conf.set("spark.graft.grep.lastPruned", "0/0")
      return pat.select(col("pattern_id"), lit(0L).as("doc_id")).limit(0)
    }
    val nDocs = spark.read.parquet(s"$root/meta")
      .head().getLong(0)
    val postingMass = selected.map(_._2).distinct.map(dfOf(_)).sum
    if (postingMass > scanFraction * nDocs) {
      // degenerate selectivity: the exact scan IS the cheaper plan
      spark.conf.set("spark.graft.grep.lastRoute", "scan")
      return spark.read.parquet(s"$root/docs")
        .crossJoin(broadcast(pat))
        .where(col("text").contains(col("pattern")))
        .select(col("pattern_id"), col("doc_id"))
    }
    spark.conf.set("spark.graft.grep.lastRoute", "index")
    val hs = selected.map(_._2).distinct
    val need = selected.groupBy(_._1).map { case (pid, rs) =>
      (pid, rs.length.toLong) }.toSeq.toDF("pattern_id", "need")
    val pgDf = selected.toDF("pattern_id", "h")
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
