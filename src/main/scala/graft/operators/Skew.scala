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

  /** Skew diagnosis for a join/group key — the measurement that
    * decides between plain, AQE-split, and salted plans BEFORE the
    * job runs at 100 TB: the k heaviest keys with their exact counts
    * and the key's max-over-mean ratio (1.0 = perfectly uniform; the
    * value to size `salts` from). One partial-agg shuffle on the key
    * plus a TakeOrdered head; the mean rides a tiny second agg. The
    * ratio is a single division of exactly-summed longs — engine-
    * portable (dsum precedent). */
  def report(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val stats = counts.agg(count(lit(1)).as("n_keys"),
                           sum(col("n")).as("n_rows"))
    counts.orderBy(col("n").desc, col(keyCol)).limit(k)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col(keyCol))))
      .crossJoin(broadcast(stats))
      .select(col("rk"), col(keyCol), col("n"), col("n_keys"),
        (col("n").cast("double") *
          col("n_keys").cast("double") / col("n_rows").cast("double"))
          .as("x_mean"))
  }
}
