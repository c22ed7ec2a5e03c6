package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Datalake layout: year/month-partitioned parquet.
  *
  * Reference behavior: `/root/reference/mnt/dags/
  * 02datalake_to_datawarehouse.py:525-543` writes one CSV per day under
  * `src/session/%Y/%m/…_{ds}.csv`, and the warehouse gets one table per
  * month (`table_material_demand_{Y_m}`, README.md:766-786).
  *
  * Spark-first: `partitionBy(year, month)` parquet is the same layout
  * with partition-pruned reads for free — an incremental consumer reads
  * exactly one directory, and "one table per month" is just one
  * partition directory. At 100 TB, day-grain files from upstream
  * compact into month partitions sized by `maxRecordsPerFile` instead
  * of one file per day.
  */
object Lake {

  /** Write `df` partitioned by year/month derived from `dateCol`. */
  def writePartitioned(df: DataFrame, path: String, dateCol: String): Unit =
    df.withColumn("year", year(col(dateCol)))
      .withColumn("month", month(col(dateCol)))
      .write.mode("overwrite")
      .partitionBy("year", "month")
      .parquet(path)

  /** Partition-pruned read of one month — touches one directory only. */
  def readMonth(spark: SparkSession, path: String, y: Int, m: Int): DataFrame =
    spark.read.parquet(path).where(col("year") === y && col("month") === m)

  /** Compact a small-file directory (the reference's one-CSV-per-day
    * lake shape) into ~`targetFileBytes` parquet files. Uses the actual
    * on-disk size, not a file count guess; repartition(n) is a round-
    * robin shuffle, so output files are evenly sized regardless of how
    * skewed the inputs were. Writes to `outPath` (swap-in rename is the
    * caller's transaction boundary, like the reference's staging swap). */
  /** `sortCol`: compaction is the natural moment to (re)establish the
    * sort-clustered layout [[writeSorted]] produces — a round-robin
    * rewrite of a clustered table would destroy its data-skipping
    * stats, so pass the filter column to range-cluster the output
    * instead. None keeps the even-sized round-robin behavior. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetFileBytes: Long = 128L << 20,
              sortCol: Option[String] = None): Unit = {
    // the filesystem that OWNS inPath, not fs.defaultFS — compacting an
    // s3a:// lake from a file:// default would throw Wrong FS otherwise
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(inPath)
    sortCol match {
      case Some(c) => writeSorted(df, outPath, c, nFiles)
      case None => df.repartition(nFiles)
        .write.mode("overwrite").parquet(outPath)
    }
  }

  /** Write a table bucketed on a join key. Two tables bucketed the same
    * way join WITHOUT any exchange — at 100 TB that removes the
    * dominant shuffle of fact-fact joins (orders ⋈ lineitem). Requires
    * saveAsTable (bucketing metadata lives in the catalog). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Sort-clustered write for data skipping: range-repartition on
    * `sortCol` (files cover DISJOINT value ranges) and sort within
    * each file (row groups inside a file cover disjoint sub-ranges).
    * Parquet stores per-row-group min/max; a pushed-down range filter
    * then skips whole files and row groups instead of scanning them —
    * on a 100 TB fact table filtered to a day, the scan touches only
    * the files whose range overlaps the day. This is the single-column
    * special case of Z-ordering, and the right one when one column
    * dominates the filter workload (ship-date style). `nFiles` sizes
    * the output (range repartition needs an explicit count; size it
    * as totalBytes/targetFileBytes like [[compact]]). */
  def writeSorted(df: DataFrame, path: String, sortCol: String,
                  nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(path)

  /** Bloom-indexed write: parquet row-group bloom filters on the given
    * key columns, for POINT-lookup skipping on columns the layout is
    * NOT clustered by. Range clustering ([[writeSorted]] /
    * [[writeZOrdered]]) gives min/max skipping on the cluster columns
    * only; a secondary key (user id in an event table clustered by
    * time — the GDPR-lookup shape) spans every file's full range and
    * min/max stats prune nothing. A bloom filter answers "does this
    * row group contain key K" probabilistically-no-false-negatives,
    * so Spark's parquet reader skips row groups on pushed-down
    * equality predicates — no index table, no extra read path, the
    * skipping happens inside the scan.
    *
    * `ndvPerGroup` sizes each filter (parquet sizes bits from the
    * expected distinct count); oversizing wastes footer bytes,
    * undersizing inflates the false-positive rate toward scan-all. */
  def writeBloomIndexed(df: DataFrame, path: String, bloomCols: Seq[String],
                        nFiles: Int, ndvPerGroup: Long = 100000L): Unit = {
    require(bloomCols.nonEmpty, "no bloom columns")
    val w = df.repartition(nFiles).write.mode("overwrite")
    val withOpts = bloomCols.foldLeft(w) { (acc, c) =>
      acc.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", ndvPerGroup.toString)
        // parquet-mr silently OMITS the bloom filter when a chunk ends
        // up fully dictionary-encoded (the dictionary already answers
        // membership exactly) — which at test scale is every chunk, so
        // the layout would never exercise the bloom path it promises.
        // A real secondary key at 100 TB has too many distinct values
        // to dict-encode anyway; disabling the dictionary on JUST the
        // bloom columns makes small and large writes take the same
        // path.
        .option(s"parquet.enable.dictionary#$c", "false")
    }
    withOpts.parquet(path)
  }

  /** Z-order clustered write: multi-column data skipping. [[writeSorted]]
    * makes files tight on ONE column and leaves every other filter
    * column spanning its full range per file; interleaving the bits of
    * the filter columns' quantized values into one Morton key and
    * range-clustering on THAT makes each file a small hyper-rectangle
    * in filter space, so pushed-down predicates on ANY of the z
    * columns skip most files (~n^(1-1/d) of an n-file table survives a
    * point filter on one of d columns, vs all n for a non-sorted
    * column). This is the layout Delta/Iceberg OPTIMIZE ZORDER
    * produces, built from public first principles.
    *
    * Quantization is linear over each column's [min, max] by default
    * (one tiny agg job; timestamps cast to epoch-second doubles,
    * dates go through `unix_date` because Spark disallows cast(DATE
    * AS DOUBLE)) — codegen arithmetic per row, no per-row search —
    * matching the uniform-ish key distributions of the star schema.
    * `quantile = true` switches to approx-percentile cell boundaries:
    * on a heavily skewed column, linear cells leave most rows in a
    * handful of cells (the z-key degenerates toward a single-column
    * sort and file ranges widen); equi-DEPTH cells keep every cell
    * equally populated whatever the distribution. The per-row cost is
    * an O(2^bits) HOF count against the literal boundary array —
    * still pure codegen, no join, no per-row search job; the prep
    * pays one approx_percentile pass (t-digest partial agg) instead
    * of min/max. `bits` per column (default 8) bounds the key to
    * `cols.size * bits` bits — must fit a long. */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
                    nFiles: Int, bits: Int = 8,
                    quantile: Boolean = false): Unit = {
    require(cols.nonEmpty && cols.size * bits <= 63,
            s"z-key would overflow a long: ${cols.size} cols x $bits bits")
    require(!quantile || bits <= 12,
            s"quantile cells embed 2^bits-1 literal boundaries per column " +
              s"in the plan; $bits bits is past the sensible codegen size " +
              "(use linear cells or fewer bits)")
    def numeric(c: String) = df.schema(c).dataType match {
      case org.apache.spark.sql.types.DateType => unix_date(col(c)).cast("double")
      case _ => col(c).cast("double")
    }
    val lim = (1L << bits) - 1
    val cells: Seq[Column] =
      if (quantile) {
        // equi-depth boundaries at percentiles 1/2^bits … (2^bits-1)/2^bits
        val ps = (1 until (1 << bits)).map(_.toDouble / (1 << bits))
        val row = df.agg(
          percentile_approx(numeric(cols.head), typedLit(ps), lit(10000))
            .as("q0"),
          cols.tail.zipWithIndex.map { case (c, i) =>
            percentile_approx(numeric(c), typedLit(ps), lit(10000))
              .as(s"q${i + 1}") }: _*).head()
        cols.indices.map { i =>
          require(!row.isNullAt(i),
            s"z-order column '${cols(i)}' has no percentiles " +
              "(empty input or all-null column)")
          val bounds = row.getSeq[Double](i)
          // cell = number of boundaries <= value, an O(2^bits) codegen
          // HOF count over a literal array (no search job, no join)
          size(filter(typedLit(bounds), b => b <= numeric(cols(i))))
            .cast("long")
        }
      } else {
        val asD = cols.map(numeric)
        val row = df.agg(
          asD.flatMap(c => Seq(min(c), max(c))).head,
          asD.flatMap(c => Seq(min(c), max(c))).tail: _*).head()
        cols.indices.map { i =>
          require(!row.isNullAt(2 * i) && !row.isNullAt(2 * i + 1),
            s"z-order column '${cols(i)}' has no min/max " +
              "(empty input or all-null column)")
          val (lo, hi) = (row.getDouble(2 * i), row.getDouble(2 * i + 1))
          val span = if (hi > lo) hi - lo else 1.0
          least(floor((numeric(cols(i)) - lit(lo)) /
                      lit(span) * lit(lim + 1)), lit(lim)).cast("long")
        }
      }
    val z = cells.zipWithIndex.map { case (q, i) =>
      // spread q's bits to positions b*ncols + i of the Morton key
      (0 until bits).map { b =>
        shiftleft(shiftright(q, b).bitwiseAND(lit(1L)),
                  b * cols.size + i)
      }.reduce(_.bitwiseOR(_))
    }.reduce(_.bitwiseOR(_))
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Deterministic epoch shuffle: write the corpus in a reproducible
    * pseudo-random global order keyed by md5(seed ":" id) — what a
    * training job needs to reshuffle its data per epoch WITHOUT a
    * stateful RNG. Same seed ⇒ the same global row sequence on any
    * cluster size (the permutation is a pure function of the data,
    * not of partitioning or task scheduling; file BOUNDARIES can
    * shift with input layout because range boundaries are sampled,
    * but the part-order concatenation cannot); different seeds ⇒
    * decorrelated orders. md5 rather than xxhash64 keeps the
    * permutation engine-portable (any system can recompute and verify
    * the order). Scale: one range-partitioned sort on a 128-bit hex
    * key — the cost of any clustered write ([[writeSorted]]); no
    * global row numbering, no driver state. Readers stream files in
    * lexicographic part order and get the epoch's permutation. */
  def writeShuffled(df: DataFrame, path: String, idCol: String,
                    seed: Long, nFiles: Int): Unit = {
    val k = md5(concat_ws(":", lit(seed), col(idCol).cast("string")))
    df.withColumn("__shuffle_k", k)
      .repartitionByRange(nFiles, col("__shuffle_k"))
      .sortWithinPartitions("__shuffle_k")
      .drop("__shuffle_k")
      .write.mode("overwrite").parquet(path)
  }

  /** Training-shard export: one directory per `shardCol` value (a
    * loader can mount each source/split independently), each file
    * capped at `maxRowsPerFile` rows so shards stream with bounded
    * memory and parallelize at file granularity — the layout training
    * jobs actually consume. `maxRecordsPerFile` does the capping
    * inside the writer (a task emits multiple files when its partition
    * exceeds the cap), so no pre-shuffle row counting is needed. The
    * repartition key is (shard, row-hash salt): shard alone would
    * funnel each shard's entire row mass through ONE task — write
    * throughput capped at one core per source no matter the cluster —
    * while the salt spreads every shard over `tasksPerShard` tasks and
    * the writer still routes rows to their shard directory. */
  def writeSharded(df: DataFrame, path: String, shardCol: String,
                   maxRowsPerFile: Long, tasksPerShard: Int = 8): Unit = {
    val salt = pmod(hash(df.columns.map(col): _*), lit(tasksPerShard))
    df.repartition(col(shardCol), salt)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRowsPerFile)
      .partitionBy(shardCol)
      .parquet(path)
  }
}
