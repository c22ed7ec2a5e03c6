package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable fuzzy (edit-distance) matching — the blocked form the
  * all-pairs gate `fuzzy_name_match` points at ("at corpus scale,
  * block first"). Blocking is the FastSS deletion-neighborhood scheme
  * (Bocek et al. 2007, public): every string emits itself plus every
  * variant with ≤ `maxDist` characters deleted; if ed(a,b) ≤ k then
  * some depth-≤k deletion variant of a equals one of b (delete, from
  * each side, the positions an optimal edit script touches), so a
  * candidate join on variant keys is LOSSLESS — exact levenshtein then
  * verifies each candidate once. No all-pairs product ever forms.
  *
  * Scale shape: one explode to (len+1 choose ≤k)·rows keys (k=1:
  * len+1 keys/string — ~19 for supplier-style names), one equi-join
  * shuffle keyed by variant string, distinct on the (a,b) pair, one
  * levenshtein per surviving candidate. The verify step keeps the
  * filter exact; the block step bounds candidates by key collisions,
  * not corpus size. Callers should collapse exact-duplicate strings
  * to representatives FIRST (the LSH discipline — identical strings
  * collide on every key and re-inflate quadratically).
  */
object Fuzzy {

  /** All depth-≤k deletion variants of `s` (including `s` itself) as
    * an array column, distinct. Built by k applications of the
    * single-deletion transform — each level deletes one character at
    * every position of every level-(i−1) variant. Pure HOF arithmetic
    * (no UDF): codegen-friendly and identical across engines. */
  def deletionVariants(s: Column, k: Int): Column = {
    require(k >= 1 && k <= 2, s"deletion depth 1..2 supported, got $k")
    def oneLevel(arr: Column): Column =
      flatten(transform(arr, v =>
        transform(sequence(lit(1), length(v)), i =>
          concat(v.substr(lit(1), i - 1),
                 v.substr(i + 1, length(v))))))
    val lvl1 = oneLevel(array(s))
    val all = if (k == 1) concat(array(s), lvl1)
              else concat(array(s), lvl1, oneLevel(lvl1))
    array_distinct(all)
  }

  /** Self-join `df` on near-identical strings: pairs (key_a, key_b,
    * dist) with levenshtein(str_a, str_b) ≤ maxDist and key_a < key_b.
    * Bit-identical to the all-pairs form by FastSS losslessness — the
    * oracle gate proves it. */
  def selfJoin(df: DataFrame, keyCol: String, strCol: String,
               maxDist: Int): DataFrame = {
    val keyed = df.select(col(keyCol).as("k"), col(strCol).as("s"))
      .select(col("k"), col("s"),
              explode(deletionVariants(col("s"), maxDist)).as("blk"))
    val cand = keyed.as("a").join(keyed.as("b"),
        col("a.blk") === col("b.blk") && col("a.k") < col("b.k"))
      .select(col("a.k").as("key_a"), col("b.k").as("key_b"),
              col("a.s").as("s_a"), col("b.s").as("s_b"))
      .distinct() // a close pair shares MANY variant keys; verify once
    cand.select(col("key_a"), col("key_b"),
                levenshtein(col("s_a"), col("s_b")).as("dist"))
      .where(col("dist") <= maxDist)
  }
}
