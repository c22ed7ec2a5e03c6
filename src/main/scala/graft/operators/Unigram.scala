package graft.operators

import org.apache.spark.sql.DataFrame

/** SentencePiece-style unigram-LM tokenizer training (Kudo 2018, "Subword
  * Regularization"), completing the tokenizer family next to BPE merge
  * training ([[Bpe]]) and WordPiece application (graft_wordpiece).
  *
  * The Spark-first decomposition is the same as [[Bpe]] — it is how the
  * production trainers themselves run: the CORPUS-scale work is one
  * explode → partial-agg shuffle producing the distinct-word count
  * dictionary (vocabulary-bounded: millions of rows for a 100 TB corpus,
  * not billions), and the EM loop runs on the driver over that weighted
  * dictionary, corpus-size-independent.
  *
  * The EM variant here is VITERBI (hard) EM with EXACT integer
  * arithmetic — deliberately, for the same reason the engine's other
  * iterative trainers (perceptron, k-means on planted integers, BPE) are
  * exact: it makes the whole training loop bit-reproducible across JVMs
  * and recomputable by an independent reference, so the driver gate can
  * demand equality, not tolerance. Soft-EM's forward-backward expected
  * counts need log-space floats whose summation order is
  * platform-visible; Viterbi-EM replaces them with an argmax that we
  * evaluate in exact rational arithmetic:
  *
  *   - A segmentation of a word into pieces p_1..p_k under piece counts
  *     c(.) with total T has likelihood Π c(p_i)/T. Comparing candidates
  *     (P_a = Π c, k_a) vs (P_b, k_b) multiplies out the denominators:
  *     P_a·T^k_b vs P_b·T^k_a — BigInt, no floats anywhere.
  *   - Ties break deterministically: fewer pieces first, then the
  *     lexicographically smallest piece sequence.
  *
  * Each round: E-step Viterbi-segments every dictionary word under the
  * current counts; M-step sets each piece's count to the word-count-
  * weighted usage total. Single-character pieces are ALWAYS retained
  * (the character-coverage rule SentencePiece enforces); multi-char
  * pieces that go unused are pruned. Every word stays segmentable round
  * to round: its previous best segmentation's pieces all received
  * positive counts, so the argmax is never over an empty set.
  *
  * `unigram_train_sound` gates the full loop on a planted corpus whose
  * seed + 2 EM rounds are recomputed by an independent reference
  * implementation (VALUES-literal oracle, the `bpe_train_sound`
  * pattern); UnigramSpec proves the invariants and the composition into
  * graft_wordpiece (learned pieces → ## vocab → tokenize).
  */
object Unigram {

  /** A vocabulary piece with its current (integer) usage count. */
  final case class Piece(piece: String, count: Long)

  /** Candidate seeding: every substring of every dictionary word up to
    * `maxPieceLen` chars, weighted by word count × occurrence
    * positions. All single characters are kept unconditionally
    * (coverage); multi-char candidates are truncated to the
    * `maxSeed` highest-frequency (ties: lexicographically smallest
    * piece — deterministic across runs). */
  def seed(dict: Seq[(String, Long)], maxPieceLen: Int,
           maxSeed: Int): Seq[Piece] = {
    require(maxPieceLen >= 2, s"maxPieceLen must be >= 2: $maxPieceLen")
    val freq = new java.util.HashMap[String, Long]
    for ((w, n) <- dict; i <- 0 until w.length;
         j <- (i + 1) to math.min(i + maxPieceLen, w.length))
      freq.merge(w.substring(i, j), n, _ + _)
    val all = {
      val b = Vector.newBuilder[(String, Long)]
      freq.forEach((p, n) => b += ((p, n)))
      b.result()
    }
    val (chars, multi) = all.partition(_._1.length == 1)
    val kept = multi.sortBy { case (p, n) => (-n, p) }.take(maxSeed)
    (chars ++ kept).map { case (p, n) => Piece(p, n) }.sortBy(_.piece)
  }

  /** Viterbi segmentation of `word` maximizing Π c(p)/T over pieces
    * with positive count, compared in exact integer arithmetic (see
    * object doc). Returns None when no full segmentation from
    * positive-count pieces exists. */
  def segment(word: String, counts: collection.Map[String, Long],
              total: Long): Option[Vector[String]] = {
    if (word.isEmpty) return Some(Vector.empty)
    val T = BigInt(total)
    // best(i): best candidate covering word[0, i)
    final case class Cand(prod: BigInt, k: Int, seq: Vector[String])
    def better(a: Cand, b: Cand): Boolean = {
      val cmp = (a.prod * T.pow(b.k)).compare(b.prod * T.pow(a.k))
      if (cmp != 0) cmp > 0
      else if (a.k != b.k) a.k < b.k
      else {
        // same score, same length: lexicographically smallest sequence
        val it = a.seq.iterator.zip(b.seq.iterator)
        val firstDiff = it.find { case (x, y) => x != y }
        firstDiff.exists { case (x, y) => x < y }
      }
    }
    val maxLen = if (counts.isEmpty) 0 else counts.keysIterator.map(_.length).max
    val best = new Array[Cand](word.length + 1)
    best(0) = Cand(BigInt(1), 0, Vector.empty)
    var i = 1
    while (i <= word.length) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        if (best(j) != null) {
          val piece = word.substring(j, i)
          val c = counts.getOrElse(piece, 0L)
          if (c > 0L) {
            val cand = Cand(best(j).prod * c, best(j).k + 1, best(j).seq :+ piece)
            if (best(i) == null || better(cand, best(i))) best(i) = cand
          }
        }
        j += 1
      }
      i += 1
    }
    Option(best(word.length)).map(_.seq)
  }

  /** One hard-EM round: Viterbi-segment every dictionary word under the
    * current counts, recount piece usage weighted by word counts.
    * Single-char pieces survive at count 0 (coverage); unused
    * multi-char pieces are pruned. */
  def emRound(dict: Seq[(String, Long)], pieces: Seq[Piece]): Seq[Piece] = {
    val counts = pieces.iterator.map(p => p.piece -> p.count).toMap
    val total = pieces.iterator.map(_.count).sum
    val next = new java.util.HashMap[String, Long]
    for ((w, n) <- dict if w.nonEmpty) {
      val seg = segment(w, counts, total).getOrElse(
        throw new IllegalStateException(
          s"unigram EM: word '$w' lost segmentability — invariant broken"))
      for (p <- seg) next.merge(p, n, _ + _)
    }
    pieces.flatMap { p =>
      val c = next.getOrDefault(p.piece, 0L)
      if (p.piece.length == 1 || c > 0L) Some(Piece(p.piece, c)) else None
    }
  }

  /** Full training: seed, `rounds` hard-EM rounds, then (optionally)
    * truncate to `vocabSize` pieces — all single chars plus the
    * highest-count multi-char pieces (ties lexicographic), the final
    * pruning step of the SentencePiece loop in its deterministic
    * one-shot form. Output sorted by piece for stable downstream use. */
  def train(dict: Seq[(String, Long)], maxPieceLen: Int = 6,
            maxSeed: Int = 1000, rounds: Int = 2,
            vocabSize: Int = 0): Seq[Piece] = {
    require(rounds >= 1 && rounds <= 64, s"rounds out of [1, 64]: $rounds")
    var pieces = seed(dict, maxPieceLen, maxSeed)
    var r = 0
    while (r < rounds) { pieces = emRound(dict, pieces); r += 1 }
    val out =
      if (vocabSize > 0) {
        val (chars, multi) = pieces.partition(_.piece.length == 1)
        chars ++ multi.sortBy(p => (-p.count, p.piece))
          .take(math.max(vocabSize - chars.size, 0))
      } else pieces
    out.sortBy(_.piece)
  }

  /** End to end: the one corpus-scale shuffle builds the word-count
    * dictionary (reusing [[Bpe.wordCounts]] — explode → partial-agg →
    * bounded TakeOrdered), the EM loop runs on the driver over the
    * vocabulary-bounded result. The collect is bounded by `maxWords`,
    * the standard trainer shape. */
  def trainFrom(docs: DataFrame, textCol: String, maxPieceLen: Int = 6,
                maxSeed: Int = 1000, rounds: Int = 2, vocabSize: Int = 0,
                maxWords: Int = 1000000): Seq[Piece] =
    train(Bpe.wordCounts(docs, textCol, maxWords).collect()
            .map(r => (r.getString(0), r.getLong(1))).toSeq,
          maxPieceLen, maxSeed, rounds, vocabSize)

  /** The learned pieces as a WordPiece ##-vocabulary: each piece both
    * word-initially and as a continuation — the bridge that lets a
    * unigram-trained vocabulary drive the native `graft_wordpiece`
    * longest-match tokenizer (composition gated by UnigramSpec). */
  def asWordpieceVocab(pieces: Seq[Piece]): Seq[String] =
    pieces.map(_.piece) ++ pieces.map("##" + _.piece)
}
