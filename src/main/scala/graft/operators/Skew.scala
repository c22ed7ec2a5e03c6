package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed
  * (the CDC merge and fact-fact joins at 100 TB: a handful of hot keys
  * can pin a whole executor).
  *
  * AQE's skew-join split handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin`); salting is the static fallback when
  * the skew is known and extreme: the big side gets a random salt in
  * [0, salts), the small side is replicated once per salt, and the join
  * key becomes (key, salt) — hot keys spread over `salts` tasks.
  */
object Skew {

  /** Salted equi-join: `big ⋈ small on key`, hot keys spread over
    * `salts` partitions. Exact same rows as the plain join. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      (rand(seed = 42) * salts).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
