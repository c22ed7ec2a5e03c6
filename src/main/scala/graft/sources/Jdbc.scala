package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC (Postgres) source/sink.
  *
  * Reference behavior: `SqlToS3Operator`/`PostgresHook` extracts
  * (`/root/reference/mnt/dags/01fetch_from_database.py:278-288`,
  * `unused_postgres_hooks_V02.py:17-47`) and `copy_expert` loads
  * (`02datalake_to_datawarehouse.py:557-578`).
  *
  * Spark-first: reads are range-partitioned on a numeric/date column so
  * N executors each pull a slice (the reference single-streams the whole
  * table through one cursor); pushed predicates become WHERE clauses on
  * the remote side. Writes batch inserts per partition.
  *
  * No database ships in this container, so these wrappers are
  * compile-checked and option-plumbing is unit-tested; the I/O path is
  * exercised only against a live URL.
  */
object Jdbc {

  /** Parallel range-partitioned read: numPartitions slices of
    * [lower, upper) on partitionCol, each its own remote cursor. */
  def read(spark: SparkSession, url: String, table: String,
           partitionCol: String, lower: Long, upper: Long,
           numPartitions: Int,
           props: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionCol)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .option("fetchsize", 10000)
    props.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load()
  }

  /** Incremental extract: remote-side WHERE (the reference's
    * `date >= ds AND date < next_ds` runs in Postgres, not in Spark). */
  private val Identifier = "^[A-Za-z][A-Za-z0-9_.]*$".r

  def readIncremental(spark: SparkSession, url: String, table: String,
                      dateCol: String, fromDate: String, toDate: String,
                      props: Map[String, String] = Map.empty): DataFrame = {
    // the pieces are interpolated into remote SQL — validate
    // identifiers and escape quotes so caller-forwarded values can't
    // rewrite the pushed-down WHERE clause (SQL injection) or break it
    require(Identifier.matches(table), s"invalid table identifier: $table")
    require(Identifier.matches(dateCol), s"invalid column identifier: $dateCol")
    def esc(s: String) = s.replace("'", "''")
    // ANSI-quoted column (Spark's JDBC writer creates case-sensitive
    // quoted identifiers); plain alias — engines like Derby reject
    // leading '_'
    val q = s"""(SELECT * FROM $table WHERE "$dateCol" >= '${esc(fromDate)}' """ +
      s"""AND "$dateCol" < '${esc(toDate)}') AS graft_incr"""
    val r = spark.read.format("jdbc")
      .option("url", url).option("dbtable", q).option("fetchsize", 10000)
    props.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load()
  }

  /** Batched append (the COPY-equivalent path). */
  def write(df: DataFrame, url: String, table: String,
            props: Map[String, String] = Map.empty): Unit = {
    val w = df.write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("batchsize", 10000)
    props.foldLeft(w) { case (b, (k, v)) => b.option(k, v) }
      .mode(SaveMode.Append).save()
  }
}
