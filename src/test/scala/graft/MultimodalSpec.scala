package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  private def blobs() = Multimodal.attachBlob(Tables.documents(spark, sfDir))

  test("attachBlob derives a deterministic binary column with typed metadata") {
    val b = blobs()
    assert(b.schema("bytes").dataType.typeName === "binary")
    val types = b.select("media_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types.subsetOf(Set("image", "audio", "video")))
    // md5 → 16 bytes, always
    assert(b.where(length(col("bytes")) =!= 16).count() === 0)
  }

  test("decodeMeta is deterministic and typed; audio is mono") {
    val m1 = Multimodal.decodeMeta(spark, blobs()).collect().sortBy(_.doc_id)
    val m2 = Multimodal.decodeMeta(spark, blobs()).collect().sortBy(_.doc_id)
    assert(m1.toSeq === m2.toSeq)
    assert(m1.forall(m => m.width >= 16 && m.height >= 16 && m.n_bytes === 16))
    assert(m1.filter(_.media_type == "audio").forall(_.channels == 1))
    assert(m1.filter(_.media_type != "audio").forall(_.channels == 3))
  }

  test("extractFeatures emits fixed-width vectors") {
    val f = Multimodal.extractFeatures(spark, blobs(), dim = 16).collect()
    assert(f.nonEmpty && f.forall(_.features.length == 16))
    assert(f.forall(_.features.sum > 0)) // bytes are never all-zero
  }

  test("frameSample keeps every stride-th fixed-size frame of video blobs") {
    val frames = Multimodal.frameSample(blobs(), frameBytes = 4, stride = 2)
    val nVideos = blobs().where(col("media_type") === "video").count()
    // 16 bytes / 4 = 4 frames, stride 2 → idx 0 and 2
    assert(frames.count() === nVideos * 2)
    assert(frames.select("frame_idx").distinct().collect()
      .map(_.getInt(0)).toSet === Set(0, 2))
    assert(frames.where(length(col("frame")) =!= 4).count() === 0)
  }
}
