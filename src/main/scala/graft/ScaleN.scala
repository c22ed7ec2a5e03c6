package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derive an N× dataset from an SF dir for scale validation:
  * `runMain graft.ScaleN /root/testdata/sf0.1 /tmp/sf1x10 [copies]`
  * (copies defaults to 10).
  *
  * Keys are shifted per copy so join/group cardinalities genuinely
  * scale (not just row counts): orderkeys N× across orders+lineitem
  * (consistent, so joins still land), users N× in events, documents
  * copied VERBATIM per shift (N-deep exact/near-dup clusters — the
  * adversarial shape for LSH dedup), embeddings likewise. Dims
  * (region…part) stay as-is, like real warehouses where facts grow and
  * dims don't. */
object ScaleN {

  /** One scan, not N: explode a copy index and shift the listed key
    * columns by `index * step` — an N-way union of reads would scan
    * the source N times.
    *
    * The SOURCE is repartitioned BEFORE the explode — order matters
    * twice over. The source SF tables are single small files, so an
    * unpartitioned explode runs in the source's one or two scan tasks
    * (found at 100×: the 500k-doc documents table landed in one
    * parquet row group and per-doc HOF queries ran single-core; found
    * harder at 1000×: ONE task generating 600M lineitem rows at 135%
    * CPU on 32 cores). And repartitioning AFTER the explode — the
    * original fix — shuffles the N× output (~20 GB of shuffle blocks
    * for 1000× lineitem) where pre-partitioning shuffles only the 1×
    * source rows: an N-fold shuffle-volume reduction that turns the
    * generator from shuffle-bound to CPU-parallel. The exploded
    * output inherits the source tasks' parallelism, so the derived
    * set's FILE LAYOUT scales with its data with no second exchange. */
  private def times(df: DataFrame, copies: Int,
                    shifts: Map[String, Long]): DataFrame = {
    val copied = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .withColumn("__i", explode(sequence(lit(0L), lit(copies - 1L))))
    copied.select(df.columns.map(c => shifts.get(c)
      .map(step => (col(c) + col("__i") * step).as(c))
      .getOrElse(col(c))).toSeq: _*)
  }

  /** Smallest power of 10 strictly above the column's max — a shift
    * derived from the data, so copies can never collide and silently
    * merge keys across replicas (a hard-coded shift under-scales
    * key cardinality the moment a source outgrows it). */
  private def shiftFor(df: DataFrame, column: String): Long = {
    val mx = df.agg(max(col(column))).first().getLong(0)
    var s = 10L
    while (s <= mx) s *= 10
    s
  }

  def main(args: Array[String]): Unit = {
    val (in, out, copies) = args match {
      case Array(i, o)    => (i, o, 10)
      case Array(i, o, c) => (i, o, c.toInt)
    }
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
              sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val keyShift = shiftFor(Tables.lineitem(spark, in), "l_orderkey")
      .max(shiftFor(Tables.customer(spark, in), "c_custkey"))
      .max(shiftFor(Tables.events(spark, in), "event_id"))
      .max(shiftFor(Tables.documents(spark, in), "doc_id"))
      .max(shiftFor(Tables.embeddings(spark, in), "vec_id"))
    val userShift = shiftFor(Tables.events(spark, in), "user_id")
    times(Tables.orders(spark, in), copies,
          Map("o_orderkey" -> keyShift, "o_custkey" -> keyShift))
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    times(Tables.lineitem(spark, in), copies, Map("l_orderkey" -> keyShift))
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    times(Tables.customer(spark, in), copies, Map("c_custkey" -> keyShift))
      .write.mode("overwrite").parquet(s"$out/customer.parquet")
    // events: scale users AND ids so sessionize/asof state shards grow.
    // Tables.events already converts the source's nanos-long ts to a
    // real µs timestamp — write that, so the derived file carries
    // TIMESTAMP(MICROS) and the DuckDB oracles (CAST(ts AS TIMESTAMP))
    // keep working on it.
    times(Tables.events(spark, in), copies,
          Map("event_id" -> keyShift, "user_id" -> userShift))
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    times(Tables.documents(spark, in), copies, Map("doc_id" -> keyShift))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    times(Tables.embeddings(spark, in), copies, Map("vec_id" -> keyShift))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    for (t <- Seq("region", "nation", "supplier", "part"))
      spark.read.parquet(s"$in/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    spark.stop()
  }
}
