package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Good/corrupt split for PERMISSIVE Csv/Json reads.
  *
  * Spark raises AnalysisException for a query that references ONLY the
  * corrupt-record column of a raw CSV/JSON scan; the source must be
  * cached first. This helper owns that requirement so callers don't
  * trip it — and the cache means the files are parsed once for both
  * halves. Call `unpersist()` on the returned frames' source when the
  * split has been consumed (or let it age out; the cache is the scan,
  * sized by the input). */
object Quarantine {

  val CorruptCol = "_corrupt_record"

  /** (good rows without the corrupt column, corrupt raw lines). */
  def split(raw: DataFrame): (DataFrame, DataFrame) = {
    val cached = raw.cache()
    (cached.where(col(CorruptCol).isNull).drop(CorruptCol),
     cached.where(col(CorruptCol).isNotNull).select(col(CorruptCol)))
  }
}
