package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` + typed
  * metadata, processed per-partition with typed Datasets.
  *
  * The container has no codec libraries, so the DECODE step is a
  * clearly-marked deterministic FAKE (`FakeCodec`) — byte-derived
  * metadata instead of a real libjpeg/ffmpeg call. Everything around
  * it is the real Spark plumbing this pipeline needs at 100 TB:
  * binary columns travel columnar (parquet BYTE_ARRAY), decode runs
  * `mapPartitions` (one codec init per partition, not per row — the
  * same batching shape a JNI/FFI codec needs), features are fixed-width
  * float arrays, and frame sampling explodes to one row per kept frame.
  */
object Multimodal {

  case class Blob(doc_id: Long, media_type: String, bytes: Array[Byte])
  case class Meta(doc_id: Long, media_type: String, width: Int, height: Int,
                  channels: Int, n_bytes: Int)
  case class Features(doc_id: Long, features: Array[Float])

  /** STUB decoder — deterministic fake in place of a real image/audio
    * codec. Swap `decode` for the real FFI call; the Spark plumbing
    * (partition-level init, typed output) stays unchanged. */
  object FakeCodec {
    def decode(mediaType: String, bytes: Array[Byte]): (Int, Int, Int) = {
      val w = (bytes.headOption.getOrElse(0: Byte) & 0x7f) + 16
      val h = (bytes.lift(1).getOrElse(0: Byte) & 0x7f) + 16
      val c = if (mediaType == "audio") 1 else 3
      (w, h, c)
    }
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) { out(i % dim) += (bytes(i) & 0xff) / 255.0f; i += 1 }
      out
    }
  }

  /** Derive a deterministic blob per document (stand-in for a real
    * media column): bytes = unhex(md5(text)), media type hashed from
    * the source. */
  def attachBlob(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(xxhash64(col("source")), lit(3)) + 1).cast("int")).as("media_type"),
      unhex(md5(col("text"))).as("bytes"))

  /** Decode metadata per partition — codec initialized once per
    * partition (the expensive part with a real codec), then streamed. */
  def decodeMeta(spark: SparkSession, blobs: DataFrame): Dataset[Meta] = {
    import spark.implicits._
    blobs.as[Blob].mapPartitions { it =>
      // real pipeline: init codec/FFI context here, once per partition
      it.map { b =>
        val (w, h, c) = FakeCodec.decode(b.media_type, b.bytes)
        Meta(b.doc_id, b.media_type, w, h, c, b.bytes.length)
      }
    }
  }

  /** Fixed-width feature extraction (batch shape of an embedding UDF). */
  def extractFeatures(spark: SparkSession, blobs: DataFrame,
                      dim: Int = 16): Dataset[Features] = {
    import spark.implicits._
    blobs.as[Blob].mapPartitions { it =>
      it.map(b => Features(b.doc_id, FakeCodec.features(b.bytes, dim)))
    }
  }

  /** Frame sampling for "video" blobs: fixed-size frames, keep every
    * `stride`-th — one output row per kept frame, done with explode so
    * the fan-out stays distributed. */
  def frameSample(blobs: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    blobs.where(col("media_type") === "video")
      .select(col("doc_id"),
        // guard short blobs: sequence(0, -1) is Spark's DESCENDING
        // [0, -1], which would emit a partial frame 0 plus a wrapped
        // frame -1 — blobs under one frame must yield zero rows
        posexplode(expr(
          s"""filter(transform(
             |  if(length(bytes) >= $frameBytes,
             |     sequence(0, int(length(bytes) / $frameBytes) - 1),
             |     array()),
             |  i -> named_struct('idx', i,
             |                    'frame', substring(bytes, i * $frameBytes + 1, $frameBytes))),
             |  f -> f.idx % $stride = 0)""".stripMargin)).as(Seq("pos", "f")))
      .select(col("doc_id"), col("f.idx").as("frame_idx"), col("f.frame").as("frame"))
}
