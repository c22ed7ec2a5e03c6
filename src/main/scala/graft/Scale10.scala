package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derive a 10× dataset from an SF dir for scale validation:
  * `runMain graft.Scale10 /root/testdata/sf0.1 /tmp/sf1x10`.
  *
  * Keys are shifted per copy so join/group cardinalities genuinely
  * scale (not just row counts): orderkeys 10× across orders+lineitem
  * (consistent, so joins still land), users 10× in events, documents
  * copied VERBATIM per shift (10-deep exact/near-dup clusters — the
  * adversarial shape for LSH dedup), embeddings likewise. Dims
  * (region…part) stay as-is, like real warehouses where facts grow and
  * dims don't. */
object Scale10 {
  private val Copies = 10

  private def times(df: DataFrame, f: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until Copies).map(i => f(df, i)).reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val Array(in, out) = args
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
              sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val keyShift = 1000000000L
    times(Tables.orders(spark, in), (df, i) => df
        .withColumn("o_orderkey", col("o_orderkey") + i * keyShift)
        .withColumn("o_custkey", col("o_custkey") + i * keyShift))
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    times(Tables.lineitem(spark, in), (df, i) => df
        .withColumn("l_orderkey", col("l_orderkey") + i * keyShift))
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    times(Tables.customer(spark, in), (df, i) => df
        .withColumn("c_custkey", col("c_custkey") + i * keyShift))
      .write.mode("overwrite").parquet(s"$out/customer.parquet")
    // events: scale users AND ids so sessionize/asof state shards grow.
    // Tables.events already converts the source's nanos-long ts to a
    // real µs timestamp — write that, so the derived file carries
    // TIMESTAMP(MICROS) and the DuckDB oracles (CAST(ts AS TIMESTAMP))
    // keep working on it.
    times(Tables.events(spark, in), (df, i) => df
        .withColumn("event_id", col("event_id") + i * keyShift)
        .withColumn("user_id", col("user_id") + i * 100000L))
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    times(Tables.documents(spark, in), (df, i) => df
        .withColumn("doc_id", col("doc_id") + i * keyShift))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    times(Tables.embeddings(spark, in), (df, i) => df
        .withColumn("vec_id", col("vec_id") + i * keyShift))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    for (t <- Seq("region", "nation", "supplier", "part"))
      spark.read.parquet(s"$in/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    spark.stop()
  }
}
