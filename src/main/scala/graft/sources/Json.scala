package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines ingest/egress — the event-feed interchange format (the
  * `events.props` payloads are the row-level version of the same).
  *
  * Same rules as Csv: schema declared, never inferred (inference is a
  * second full scan and guesses per-file), PERMISSIVE quarantine for
  * malformed lines instead of job failure. JSON-lines is splittable
  * (one object per line), so reads parallelize like CSV/parquet. */
object Json {
  val CorruptCol = "_corrupt_record"

  /** NOTE: a query referencing only [[CorruptCol]] on this raw scan
    * throws AnalysisException unless the DataFrame is cached first —
    * use [[Quarantine.split]] for the good/corrupt split, which
    * handles the caching. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
