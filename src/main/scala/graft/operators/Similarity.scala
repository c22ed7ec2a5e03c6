package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Brute force is the correctness baseline: broadcast the (small) query
  * set against the corpus — the corpus never shuffles, cosine runs
  * scan-side, and only the per-query top-k heads move. The scale path
  * buckets the corpus with sign-LSH (Dedup.withBucket) so each query
  * probes one bucket (~corpus/2^m vectors) instead of everything;
  * recall is tunable via m and multi-probe.
  */
object Similarity {

  /** Exact top-k neighbors per query by cosine (ties broken by
    * neighbor id — value-total, deterministic). Queries are broadcast;
    * expect |queries| << |corpus|. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
                                     col("embedding").as("qvec")))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
                          col("embedding").as("cvec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    q.crossJoin(c)
      .withColumn("cos", Dedup.cosine(col("qvec"), col("cvec")))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rk"), col("cos"))
  }

  /** Bucketed ANN: banded sign-LSH (OR over bands) — each query scores
    * only candidates sharing at least one band value, ~|corpus| /
    * 2^rows per band instead of everything. Same output shape as
    * bruteForceTopK; recall < 1 by design, tunable via bands/rows. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              bands: Int = 4, rows: Int = 5, dim: Int = 64): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val qb = Dedup.bandedBuckets(queries, "vec_id", "embedding", bands, rows, dim)
      .select(col("id").as("query_id"), col("band_idx"), col("band_val"))
    val cb = Dedup.bandedBuckets(corpus, "vec_id", "embedding", bands, rows, dim)
      .select(col("id").as("neighbor_id"), col("band_idx"), col("band_val"))
    val cands = broadcast(qb)
      .join(cb, Seq("band_idx", "band_val"))
      .select(col("query_id"), col("neighbor_id")).distinct()
    val qv = queries.select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val cv = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cvec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cands
      .join(broadcast(qv), "query_id")
      .join(cv, "neighbor_id")
      .withColumn("cos", Dedup.cosine(col("qvec"), col("cvec")))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rk"), col("cos"))
  }

  /** Hard-negative mining for contrastive / metric training: for each
    * anchor, the k most-similar corpus items with a DIFFERENT label —
    * the "looks like a positive, isn't one" pairs a retrieval or
    * embedding model trains against (e.g. DPR in-batch negatives
    * replaced by mined ones). Same plan shape as [[bruteForceTopK]]
    * (anchors broadcast, corpus never shuffles, the label filter runs
    * scan-side BEFORE the window so excluded same-label rows never
    * rank); at corpus scale swap the candidate generator for the
    * banded sign-LSH of [[lshTopK]] — the filter composes unchanged.
    * Ties break on neighbor id (value-total, engine-portable). */
  def hardNegatives(anchors: DataFrame, corpus: DataFrame,
                    labelCol: String, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(anchors.sparkSession)
    val a = broadcast(anchors.select(
      col("vec_id").as("query_id"), col("embedding").as("qvec"),
      col(labelCol).as("qlabel")))
    val c = corpus.select(
      col("vec_id").as("neighbor_id"), col("embedding").as("cvec"),
      col(labelCol).as("nlabel"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    a.crossJoin(c)
      .where(col("qlabel") =!= col("nlabel"))
      .withColumn("cos", Dedup.cosine(col("qvec"), col("cvec")))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("qlabel"), col("neighbor_id"),
              col("nlabel"), col("rk"))
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Büttcher 2009): fuse N
    * ranked lists into one by score(d) = Σ_lists 1/(kRrf + rank_l(d)),
    * a doc absent from a list contributing 0. THE standard hybrid-
    * retrieval combiner (lexical BM25 ⊕ dense ANN) because it needs no
    * score calibration across lists — ranks only — and kRrf ≈ 60
    * damps the head so one list can't dominate. Implementation: a
    * left-to-right fold of full-outer joins on the id with the
    * per-list contributions added in FIXED list order — the float
    * sum's association is pinned by construction, so the fused score
    * is bit-deterministic on any engine or partitioning (the bm25
    * fixed-term-order discipline applied to fusion). Every input is a
    * top-k head, so all join sides are bounded (broadcast-sized) —
    * the heavy lifting happened in the retrievers. Ties break on id. */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
              kRrf: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.size >= 2, "rrfFuse needs at least two ranked lists")
    val contribs = rankings.zipWithIndex.map { case (df, i) =>
      df.select(col(idCol),
        (lit(1.0) / (lit(kRrf) + col(rankCol))).as(s"__c$i"))
    }
    val joined = contribs.reduceLeft((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val score = rankings.indices
      .map(i => coalesce(col(s"__c$i"), lit(0.0)))
      .reduceLeft(_ + _)
    val w = Window.orderBy(col("rrf_score").desc, col(idCol))
    joined.withColumn("rrf_score", score)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= topK)
      .select(col(idCol), col("rrf_score"), col("rk"))
  }

  /** Nearest-cell assignment as a per-row argmax over literal
    * centroids: zero Exchange, zero row explosion. (The former
    * `crossJoin(centroids)` + `row_number` form exploded the corpus
    * ×cells and shuffled the explosion — a 1000× blowup at realistic
    * cell counts, just to take an argmax.) Ranking is by cosine; the
    * corpus-vector norm is a common positive factor across cells, so
    * the argmax of dot/‖centroid‖ (centroid norms folded driver-side)
    * is identical — one codegen'd dot per cell per row. Ties break to
    * the smallest cell id, like the former (cos DESC, cell) ordering. */
  private[graft] def assignCells(df: DataFrame, vecCol: String,
                                 centroids: Seq[(Int, Array[Float])]): DataFrame =
    df.withColumn("cell", graft.functions.GraftFunctions
      .nearestCentroid(col(vecCol), centroids, "dot_norm")
      .getField("cell"))

  /** Run `body(lo, hi)` over fixed contiguous slices of [0, n) on up
    * to `availableProcessors` plain threads. Slice boundaries depend
    * only on (n, thread count is capped so small n stays sequential),
    * and every parallel use below writes DISJOINT indices — results
    * are bit-identical to the sequential loop. */
  private def parSlices(n: Int)(body: (Int, Int) => Unit): Unit = {
    val t = math.min(Runtime.getRuntime.availableProcessors,
                     math.max(1, n / 4096))
    if (t <= 1) { body(0, n); return }
    // A worker failure (OOM, bad sample row) must FAIL the train, not
    // leave its slice's outputs stale while join() returns normally:
    // capture the first Throwable and rethrow after all joins.
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val threads = (0 until t).map { ti =>
      val lo = (n.toLong * ti / t).toInt
      val hi = (n.toLong * (ti + 1) / t).toInt
      new Thread(() =>
        try body(lo, hi)
        catch { case e: Throwable => failure.compareAndSet(null, e) })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    if (failure.get != null) throw failure.get
  }

  /** Seeded k-means++ init + Lloyd's iterations over an in-memory
    * sample. Training runs on the DRIVER by design: centroid quality
    * needs thousands of points, not the corpus, and once the sample is
    * bounded (`ivfTopK` collects ≤ ~1.25·max(cells·256, 2048) rows —
    * ~1 MB at 64 dims) Lloyd's is O(|sample|·cells·dim·iters) flops —
    * while a distributed trainer pays a full Spark job of scheduling
    * overhead PER ITERATION to do the same arithmetic. The two
    * O(n·k·dim) inner loops (seeding distance updates, Lloyd
    * assignment) run on driver threads over fixed slices; the
    * float-sensitive accumulations (near-sum, per-cell sums) stay in
    * strict index order, so the result is BIT-IDENTICAL to the
    * sequential form at any thread count (r13: production cell counts
    * — cells ≈ √n = 1448 at 2M vectors — made the single-threaded
    * form the build's bottleneck). Right up to cells ≈ 4096 (sample ≈
    * 1M rows); past that swap in a distributed trainer — nothing
    * downstream changes. Distances are Euclidean (standard k-means);
    * `ivfTopK` documents why probing is cosine. */
  private[graft] def trainCentroids(sample: Array[Array[Float]], cells: Int,
                                    iters: Int = 8,
                                    seed: Long = 42L): Seq[(Int, Array[Float])] = {
    require(sample.nonEmpty, "empty training sample")
    val k = math.min(cells, sample.length)
    val dim = sample(0).length
    val rnd = new scala.util.Random(seed)
    def d2(a: Array[Float], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // k-means++: each next center drawn ∝ squared distance to nearest.
    // near(i) updates write disjoint slots — parallel-safe, bit-equal.
    val centers = Array.ofDim[Array[Double]](k)
    centers(0) = sample(rnd.nextInt(sample.length)).map(_.toDouble)
    val near = Array.fill(sample.length)(Double.MaxValue)
    for (c <- 1 until k) {
      parSlices(sample.length) { (lo, hi) =>
        var i = lo
        while (i < hi) {
          val d = d2(sample(i), centers(c - 1))
          if (d < near(i)) near(i) = d
          i += 1
        }
      }
      var r = rnd.nextDouble() * near.sum
      var pick = 0
      while (pick < sample.length - 1 && r > near(pick)) { r -= near(pick); pick += 1 }
      centers(c) = sample(pick).map(_.toDouble)
    }
    val assign = new Array[Int](sample.length)
    for (_ <- 0 until iters) {
      // assignment (the O(n·k·dim) term) in parallel over disjoint
      // slots; per-cell double sums in strict index order below so
      // accumulation bits match the sequential loop exactly
      parSlices(sample.length) { (lo, hi) =>
        var i = lo
        while (i < hi) {
          var best = 0; var bestD = Double.MaxValue; var c = 0
          while (c < k) {
            val d = d2(sample(i), centers(c))
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          assign(i) = best
          i += 1
        }
      }
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      var i = 0
      while (i < sample.length) {
        val best = assign(i)
        counts(best) += 1
        val s = sums(best); val v = sample(i)
        var j = 0
        while (j < dim) { s(j) += v(j); j += 1 }
        i += 1
      }
      for (c <- 0 until k if counts(c) > 0; j <- 0 until dim)
        centers(c)(j) = sums(c)(j) / counts(c) // empty cell keeps its center
    }
    centers.zipWithIndex.map { case (c, i) => (i, c.map(_.toFloat)) }.toSeq
  }

  /** Deterministic UNIFORM hash-bucket training sample, collected to
    * the driver (BOUNDED: ~1.25 × target rows — ~1 MB at 64 dims for
    * the defaults). Centroid/codebook quality needs thousands of
    * points, not the corpus — and an id-ordered head would bias
    * training toward early ids whenever ingestion order correlates
    * with content (the common case). The count() is
    * parquet-metadata-only, no data scan. */
  private[graft] def sampleVectors(corpus: DataFrame,
                                   target: Int): Array[Array[Float]] = {
    val n = math.max(corpus.count(), 1L)
    val buckets = 1L << 20
    val t = math.min(buckets,
      math.ceil(target.toDouble * 1.25 / n * buckets).toLong)
    corpus
      .where(pmod(xxhash64(col("vec_id")), lit(buckets)) < lit(t))
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
  }

  /** IVF-style ANN: k-means learns `cells` centroids (on a sample —
    * centroid quality doesn't need the full corpus), every corpus
    * vector is assigned to its nearest cell once, and each query
    * scores only the vectors in its own `nprobe` nearest cells.
    * Search cost ≈ |corpus| * nprobe / cells per query. With
    * nprobe = cells the probe covers every cell, so the result is
    * exactly brute force — the lossless-plumbing gate the driver
    * oracle checks. */
  def ivfTopK(spark: org.apache.spark.sql.SparkSession,
              queries: DataFrame, corpus: DataFrame, k: Int,
              cells: Int = 16, nprobe: Int = 2): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // k-means only LEARNS the centroids; both corpus assignment and
    // query probing rank by COSINE against them — mixing Euclidean
    // assignment with cosine probing opens a systematic recall hole
    // for unnormalized vectors.
    val sample = sampleVectors(corpus, math.max(cells * 256, 2048))
    val centroids = trainCentroids(sample, cells)
    val centroidDf = broadcast(
      spark.createDataFrame(centroids).toDF("cell", "centroid"))
    val assigned = assignCells(
      corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cvec")),
      "cvec", centroids)
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("centroid_cos").desc, col("cell"))
    val probes = broadcast(
      queries.select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
        .crossJoin(centroidDf)
        .withColumn("centroid_cos", Dedup.cosine(col("qvec"), col("centroid")))
        .withColumn("prk", row_number().over(probeW))
        .where(col("prk") <= nprobe)
        .select(col("query_id"), col("qvec"), col("cell")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    probes.join(assigned, "cell")
      .withColumn("cos", Dedup.cosine(col("qvec"), col("cvec")))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rk"), col("cos"))
  }

  // ------------------------------------------------ product quantization

  /** Per-subspace PQ codebooks: the vector space splits into `m`
    * contiguous subspaces of dim/m floats and each learns its own
    * `ksub`-codeword k-means codebook (reusing [[trainCentroids]],
    * seeded per subspace so codebooks are deterministic and
    * independent). Codebook size is m × ksub × dim/m floats total —
    * always driver-trivial. */
  private[graft] def trainPqCodebooks(sample: Array[Array[Float]],
                                      m: Int, ksub: Int): Seq[Seq[(Int, Array[Float])]] = {
    require(sample.nonEmpty, "empty training sample")
    require(ksub >= 2, s"ksub=$ksub: need at least 2 codewords")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible into m=$m subspaces")
    val d = dim / m
    (0 until m).map { s =>
      trainCentroids(
        sample.map(v => java.util.Arrays.copyOfRange(v, s * d, (s + 1) * d)),
        ksub, seed = 42L + s)
    }
  }

  /** PQ-encode: per subspace, the nearest codeword by L2 — written as
    * a per-row argmax of (x_s · c − ‖c‖²/2) over literal codewords
    * (the L2 argmin with the row-constant ‖x_s‖² term dropped), the
    * same zero-exchange shape as [[assignCells]]: one codegen'd dot
    * per codeword per subspace, no join, no explosion. Adds
    * `codes array<int>` — m small ints per vector. At 100 TB THIS is
    * the searched artifact: written to the lake it holds
    * dim·4 / (m·log₂ksub/8) ≈ 32× less data than the raw vectors at
    * the defaults (64 dims → 8 nibble codes), so the ANN scan reads
    * 32× fewer bytes. */
  private[graft] def pqEncode(df: DataFrame, vecCol: String,
                              codebooks: Seq[Seq[(Int, Array[Float])]]): DataFrame = {
    val d = codebooks.head.head._2.length
    val codeCols = codebooks.zipWithIndex.map { case (cb, s) =>
      // offset reads the subspace in place — no per-row slice() copy
      graft.functions.GraftFunctions
        .nearestCentroid(col(vecCol), cb, "dot_bias", offset = s * d)
        .getField("cell")
    }
    df.withColumn("codes", array(codeCols: _*))
  }

  /** Decode codes to the codeword concatenation x̂ (`array<float>`).
    * The codebook rides as a nested literal; per row this is m
    * element_at lookups and a flatten. Asymmetric-distance scoring
    * (query against x̂, never against the raw vector) runs on top of
    * this with the same native cosine as every other operator. */
  private[graft] def pqDecode(codes: Column,
                              codebooks: Seq[Seq[(Int, Array[Float])]]): Column = {
    val cb = typedLit(codebooks.map(_.map(_._2.toSeq)))
    flatten(transform(codes,
      (code, s) => element_at(element_at(cb, s + lit(1)), code + lit(1))))
  }

  /** IVF-PQ ANN with exact re-ranking — the memory/IO-bounded scale
    * path. Three stages, each with its own knob:
    *  1. IVF cells prune the corpus to the query's `nprobe` nearest
    *     cells (same centroids machinery as [[ivfTopK]]);
    *  2. PQ codes rank the surviving vectors by ASYMMETRIC distance —
    *     cosine of the query against the decoded codeword
    *     concatenation — so this stage never touches the raw vectors:
    *     its input is the (cell, codes) table, ~32× smaller than the
    *     corpus at the defaults;
    *  3. the top `rerank` approximate hits per query are re-scored
    *     EXACTLY by fetching the raw vectors back by id — an id join
    *     moving only |queries| × rerank rows — which repairs most of
    *     the quantization error in the final top-k.
    * With nprobe = cells and rerank ≥ |corpus| stages 1-2 become
    * lossless plumbing and the result is exactly brute force (the
    * ann_pq_full driver gate).
    *
    * A note on ADC in Spark: the classical per-query lookup-table
    * trick saves the multiplies by precomputing q_s · c for every
    * codeword once per query; that needs per-query state below the
    * row-expression abstraction. Here the decode+dot costs the same
    * flops as a full dot — the win this operator banks is the 32×
    * smaller scan in stage 2, which is what dominates at 100 TB
    * (scoring is codegen'd and compute-cheap; the corpus bytes are
    * the bottleneck). A custom stateful Expression could add the LUT
    * later; nothing downstream would change. */
  def pqTopK(spark: org.apache.spark.sql.SparkSession,
             queries: DataFrame, corpus: DataFrame, k: Int,
             m: Int = 8, ksub: Int = 16,
             cells: Int = 16, nprobe: Int = 4,
             rerank: Int = 50): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val sample = sampleVectors(corpus,
      math.max(math.max(cells, ksub) * 256, 2048))
    val centroids = trainCentroids(sample, cells)
    val codebooks = trainPqCodebooks(sample, m, ksub)
    // the searched artifact: id, cell, codes — no raw vectors. The
    // codeword concatenation x̂ is decoded HERE, corpus-side of the
    // probe join, so the (interpreted-HOF) decode runs once per
    // corpus row — inside the join it would run once per
    // (query, corpus) pair, nprobe-fold more
    val encoded = pqEncode(
      assignCells(corpus.select(col("vec_id").as("neighbor_id"),
                                col("embedding").as("cvec")),
                  "cvec", centroids),
      "cvec", codebooks)
      .select(col("neighbor_id"), col("cell"),
              pqDecode(col("codes"), codebooks).as("xhat"))
    val centroidDf = broadcast(
      spark.createDataFrame(centroids).toDF("cell", "centroid"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("centroid_cos").desc, col("cell"))
    val probes = broadcast(
      queries.select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
        .crossJoin(centroidDf)
        .withColumn("centroid_cos", Dedup.cosine(col("qvec"), col("centroid")))
        .withColumn("prk", row_number().over(probeW))
        .where(col("prk") <= nprobe)
        .select(col("query_id"), col("qvec"), col("cell")))
    val approxW = Window.partitionBy(col("query_id"))
      .orderBy(col("acos").desc, col("neighbor_id"))
    val cands = probes.join(encoded, "cell")
      .withColumn("acos", Dedup.cosine(col("qvec"), col("xhat")))
      .withColumn("ark", row_number().over(approxW))
      .where(col("ark") <= rerank)
      .select(col("query_id"), col("neighbor_id"))
    // exact re-rank on the bounded candidate set: raw vectors come
    // back via an id join (corpus side streams; the candidate set is
    // |queries| × rerank rows)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cands
      .join(corpus.select(col("vec_id").as("neighbor_id"),
                          col("embedding").as("cvec")), "neighbor_id")
      .join(broadcast(queries.select(col("vec_id").as("query_id"),
                                     col("embedding").as("qvec"))), "query_id")
      .withColumn("cos", Dedup.cosine(col("qvec"), col("cvec")))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rk"), col("cos"))
  }
}
