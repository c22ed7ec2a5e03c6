package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV ingest/egress with explicit schema.
  *
  * Reference behavior: `/root/reference/postgresql/db-setup/setup.sql`
  * (`COPY … FROM … DELIMITER ',' CSV HEADER`) and the pandas
  * `read_csv`/`to_csv` hops in both DAGs.
  *
  * Spark-first: schema is declared (never inferred — inference scans
  * the data twice and guesses types per-file, which diverges at 100 TB),
  * reads are splittable per-file, and malformed rows are quarantined
  * via PERMISSIVE + corrupt-record column rather than failing the job.
  */
object Csv {
  val CorruptCol = "_corrupt_record"

  /** NOTE: a query referencing only [[CorruptCol]] on this raw scan
    * throws AnalysisException unless the DataFrame is cached first —
    * use [[Quarantine.split]] for the good/corrupt split, which
    * handles the caching. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)
}
