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

  /** One scan, not ten: explode a copy index and shift the listed key
    * columns by `index * step` — a 10-way union of reads would scan
    * the source ten times. */
  private def times(df: DataFrame, shifts: Map[String, Long]): DataFrame = {
    val copied = df.withColumn("__i",
      explode(sequence(lit(0L), lit(Copies - 1L))))
    copied.select(df.columns.map(c => shifts.get(c)
      .map(step => (col(c) + col("__i") * step).as(c))
      .getOrElse(col(c))).toSeq: _*)
  }

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
    times(Tables.orders(spark, in),
          Map("o_orderkey" -> keyShift, "o_custkey" -> keyShift))
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    times(Tables.lineitem(spark, in), Map("l_orderkey" -> keyShift))
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    times(Tables.customer(spark, in), Map("c_custkey" -> keyShift))
      .write.mode("overwrite").parquet(s"$out/customer.parquet")
    // events: scale users AND ids so sessionize/asof state shards grow.
    // Tables.events already converts the source's nanos-long ts to a
    // real µs timestamp — write that, so the derived file carries
    // TIMESTAMP(MICROS) and the DuckDB oracles (CAST(ts AS TIMESTAMP))
    // keep working on it.
    times(Tables.events(spark, in),
          Map("event_id" -> keyShift, "user_id" -> 100000L))
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    times(Tables.documents(spark, in), Map("doc_id" -> keyShift))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    times(Tables.embeddings(spark, in), Map("vec_id" -> keyShift))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    for (t <- Seq("region", "nation", "supplier", "part"))
      spark.read.parquet(s"$in/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    spark.stop()
  }
}
