package graft

import org.apache.spark.sql.functions._
import graft.sources.Layout

/** Pins the sampling-free clustered layout (r19): partition p must
  * hold exactly its key range — the property StatsIndex file pruning
  * rests on. If a Spark release ever changed the hash partitioning
  * these break loudly (results would still be correct; only layout
  * quality is at stake). */
class LayoutSpec extends SparkSpec {

  import spark.implicits._

  test("repartitionByKeyRange puts each key range in exactly its partition") {
    val nKeys = 16
    val nFiles = 4
    val df = spark.range(0, 1000)
      .select((col("id") % nKeys).cast("int").as("bucket"), col("id"))
    val placed = Layout.repartitionByKeyRange(df, col("bucket"), nKeys, nFiles)
      .select(spark_partition_id().as("pid"), col("bucket"))
      .distinct().as[(Int, Int)].collect()
    // fid = bucket * nFiles / nKeys must equal the actual partition id
    assert(placed.nonEmpty)
    placed.foreach { case (pid, bucket) =>
      assert(pid == bucket * nFiles / nKeys,
        s"bucket $bucket landed in partition $pid, expected ${bucket * nFiles / nKeys}")
    }
    // every file holds a CONTIGUOUS whole-bucket range (the pruning
    // property): ranges of distinct partitions must not interleave
    val ranges = placed.groupBy(_._1).view.mapValues(v =>
      (v.map(_._2).min, v.map(_._2).max)).toSeq.sortBy(_._2._1)
    ranges.sliding(2).foreach {
      case Seq((_, (_, hi)), (_, (lo, _))) => assert(hi < lo)
      case _ => ()
    }
  }

  test("repartitionByKeyRange with nFiles == nKeys isolates one key per file") {
    val nKeys = 8
    val df = spark.range(0, 400)
      .select((col("id") % nKeys).cast("int").as("bucket"))
    val perPart = Layout.repartitionByKeyRange(df, col("bucket"), nKeys, nKeys)
      .select(spark_partition_id().as("pid"), col("bucket"))
      .distinct().as[(Int, Int)].collect()
    assert(perPart.length == nKeys) // one distinct bucket per partition
    perPart.foreach { case (pid, bucket) => assert(pid == bucket) }
  }

  test("repartitionByHashRange keeps signed key ranges contiguous per partition") {
    val nFiles = 8
    val df = spark.range(0, 5000)
      .select(xxhash64(col("id")).as("h"))
    val ranges = Layout.repartitionByHashRange(df, col("h"), nFiles)
      .groupBy(spark_partition_id().as("pid"))
      .agg(min(col("h")).as("lo"), max(col("h")).as("hi"),
           count(lit(1)).as("n"))
      .orderBy(col("lo"))
      .as[(Int, Long, Long, Long)].collect()
    assert(ranges.map(_._4).sum == 5000)
    // non-overlapping signed ranges across partitions
    ranges.toSeq.sliding(2).foreach {
      case Seq((_, _, hi, _), (_, lo, _, _)) => assert(hi < lo)
      case _ => ()
    }
    // uniform hashes spread: no partition owns more than half the rows
    assert(ranges.map(_._4).max <= 2500)
  }
}
