package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.Codec

class MultimodalSpec extends SparkSpec {

  private def blobs() = Multimodal.attachBlob(Tables.documents(spark, sfDir))

  test("a planted image round-trips: encode -> decode recovers dims and pixels") {
    // 5x3 BMP: stride padding in play (3*5=15 -> padded 16), bottom-up
    // row storage must come back top-down
    val payload = Array.tabulate(16)(i => (i * 17 + 3).toByte)
    val bmp = Codec.decode(Codec.encodeBmp(5, 3, payload))
    assert((bmp.width, bmp.height, bmp.channels) === (5, 3, 3))
    assert(bmp.payload.toSeq === Array.tabulate(45)(k => payload(k % 16)).toSeq)
    val ppm = Codec.decode(Codec.encodePpm(7, 4, payload))
    assert((ppm.width, ppm.height, ppm.channels) === (7, 4, 3))
    assert(ppm.payload.toSeq === Array.tabulate(84)(k => payload(k % 16)).toSeq)
    val wav = Codec.decode(Codec.encodeWav(33, payload))
    assert((wav.width, wav.height, wav.channels) === (33, 1, 1))
    assert(wav.payload.toSeq === Array.tabulate(33)(k => payload(k % 16)).toSeq)
    // mean is the floor-mean of the decoded payload, padding excluded
    val mean = Array.tabulate(45)(k => payload(k % 16) & 0xff).sum / 45
    assert(bmp.meanPixel === mean)
  }

  test("decode rejects unknown magic and corrupt headers loudly") {
    intercept[IllegalArgumentException](Codec.decode(Array[Byte](1, 2, 3, 4)))
    // truncated BMP: header claims more pixels than the blob holds
    val good = Codec.encodeBmp(8, 8, Array.tabulate(16)(_.toByte))
    intercept[IllegalArgumentException](Codec.decode(good.take(100)))
    // PPM with a maxval the 8-bit decoder does not support
    val deep = "P6\n2 2\n65535\n".getBytes("US-ASCII") ++ Array.fill(12)(1.toByte)
    intercept[IllegalArgumentException](Codec.decode(deep))
  }

  test("attachBlob plants genuine containers with typed metadata") {
    val b = blobs()
    assert(b.schema("bytes").dataType.typeName === "binary")
    val types = b.select("media_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types.subsetOf(Set("image", "audio", "video")))
    // every blob opens under the magic dispatch of the real codec
    val magics = b.collect().map { r =>
      val bytes = r.getAs[Array[Byte]]("bytes")
      (r.getString(1), Codec.decode(bytes).channels)
    }
    assert(magics.forall { case (mt, c) => if (mt == "audio") c == 1 else c == 3 })
  }

  test("decodeMeta is deterministic, real header arithmetic; audio is mono") {
    val m1 = Multimodal.decodeMeta(spark, blobs()).collect().sortBy(_.doc_id)
    val m2 = Multimodal.decodeMeta(spark, blobs()).collect().sortBy(_.doc_id)
    assert(m1.toSeq === m2.toSeq)
    assert(m1.nonEmpty)
    m1.foreach { m =>
      m.media_type match {
        case "image" => // BMP: 54-byte header + stride-padded rows
          val stride = (3 * m.width + 3) / 4 * 4
          assert(m.n_bytes === 54 + stride * m.height)
          assert(m.width >= 16 && m.height >= 16 && m.channels === 3)
        case "video" => // PPM: ASCII header + tight raster
          val header = s"P6\n${m.width} ${m.height}\n255\n".length
          assert(m.n_bytes === header + 3 * m.width * m.height)
          assert(m.channels === 3)
        case "audio" => // WAV: canonical 44-byte header + samples
          assert(m.n_bytes === 44 + m.width)
          assert(m.height === 1 && m.channels === 1)
      }
      assert(m.mean_pixel >= 0 && m.mean_pixel <= 255)
    }
  }

  test("extractFeatures emits fixed-width vectors over decoded samples") {
    val f = Multimodal.extractFeatures(spark, blobs(), dim = 16).collect()
    assert(f.nonEmpty && f.forall(_.features.length == 16))
    assert(f.forall(_.features.sum > 0)) // md5 payloads are never all-zero
  }

  test("frameSample keeps every stride-th fixed-size frame of video blobs") {
    val frames = Multimodal.frameSample(blobs(), frameBytes = 64, stride = 2)
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = blobs().where(col("media_type") === "video")
      .select(col("doc_id"), length(col("bytes")).as("len"))
      .collect().map { r =>
        val nFrames = r.getInt(1) / 64
        r.getLong(0) -> (nFrames / 2 + nFrames % 2).toLong // idx 0,2,4,..
      }.filter(_._2 > 0).toMap
    assert(frames === expected)
    val f2 = Multimodal.frameSample(blobs(), frameBytes = 64, stride = 2)
    assert(f2.where(length(col("frame")) =!= 64).count() === 0)
  }

  test("PNG round-trips through deflate: encode -> decode recovers pixels") {
    val payload = Array.tabulate(16)(i => (i * 31 + 7).toByte)
    val png = Codec.decode(Codec.encodePng(5, 3, payload))
    assert((png.width, png.height, png.channels) === (5, 3, 3))
    assert(png.payload.toSeq === Array.tabulate(45)(k => payload(k % 16)).toSeq)
    // identical dims+payload as the uncompressed BMP plant -> identical
    // mean (compression must be lossless end to end)
    assert(png.meanPixel === Codec.decode(Codec.encodeBmp(5, 3, payload)).meanPixel)
    // corrupt IDAT dies loudly, not with garbage pixels
    val blob = Codec.encodePng(5, 3, payload)
    blob(blob.length - 20) = (blob(blob.length - 20) ^ 0x55).toByte
    intercept[Exception](Codec.decode(blob))
  }

  test("PNG decoder reconstructs all five scanline filters") {
    // hand-build a PNG whose rows use Sub/Up/Average/Paeth (our encoder
    // only emits None) and check the decoder inverts each transform
    val w = 4; val h = 5; val stride = 3 * w
    val px = Array.tabulate(h * stride)(i => ((i * 37 + 11) % 256).toByte)
    val raw = new Array[Byte](h * (1 + stride))
    for (y <- 0 until h) {
      val f = y % 5 // row y uses filter y: None, Sub, Up, Average, Paeth
      raw(y * (1 + stride)) = f.toByte
      for (i <- 0 until stride) {
        val x = px(y * stride + i) & 0xff
        val a = if (i >= 3) px(y * stride + i - 3) & 0xff else 0
        val b = if (y > 0) px((y - 1) * stride + i) & 0xff else 0
        val c = if (y > 0 && i >= 3) px((y - 1) * stride + i - 3) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        raw(y * (1 + stride) + 1 + i) = ((x - pred) & 0xff).toByte
      }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) zout.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    // reuse the real encoder for framing, then swap in our IDAT: build
    // via the same chunk layout (sig + IHDR + IDAT + IEND)
    val out = new java.io.ByteArrayOutputStream()
    val sig = Codec.encodePng(w, h, Array[Byte](1)).take(8 + 25) // sig+IHDR
    out.write(sig)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(java.nio.ByteBuffer.allocate(4).putInt(data.length).array())
      val t = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32(); crc.update(t); crc.update(data)
      out.write(t); out.write(data)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    }
    chunk("IDAT", zout.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    val dec = Codec.decode(out.toByteArray)
    assert((dec.width, dec.height) === (w, h))
    assert(dec.payload.toSeq === px.toSeq,
      "filtered scanlines did not reconstruct")
  }

  test("attachPngBlob plants genuine PNGs whose decode matches the BMP plant") {
    val docs = Tables.documents(spark, sfDir).limit(20)
    val png = Multimodal.decodeMeta(spark, Multimodal.attachPngBlob(docs))
      .collect().map(m => (m.doc_id, m.width, m.height, m.mean_pixel)).sorted
    // same md5-derived dims/payload as the BMP image branch
    val bmpBlobs = Multimodal.attachBlob(docs)
    val bmp = Multimodal.decodeMeta(spark, bmpBlobs)
      .collect().filter(_.media_type == "image")
      .map(m => (m.doc_id, m.width, m.height, m.mean_pixel)).sorted
    val pngByDoc = png.toSeq.map(t => t._1 -> t).toMap
    bmp.foreach { case t @ (id, _, _, _) => assert(pngByDoc(id) === t) }
  }

  // ------------------------------------------ perceptual hashes (#34b)

  private def decoded(w: Int, h: Int, payload: Array[Byte]) =
    Codec.decode(Codec.encodeBmp(w, h, payload))

  test("aHash/dHash are container-invariant: same raster through BMP/PPM/PNG") {
    val p = Array.tabulate[Byte](16)(i => ((i * 37 + 5) % 256).toByte)
    val (w, h) = (33, 21)
    val ds = Seq(Codec.encodeBmp(w, h, p), Codec.encodePpm(w, h, p),
                 Codec.encodePng(w, h, p)).map(Codec.decode)
    assert(ds.map(Multimodal.PHash.aHash64).distinct.size === 1)
    assert(ds.map(Multimodal.PHash.dHash64).distinct.size === 1)
  }

  test("uniform brightness shift leaves both hashes EXACTLY unchanged (no wrap)") {
    // gray shifts by exactly s (sum of 3 bytes each +s is divisible by
    // 3 after the +3s), cells and the global mean shift together — the
    // invariance that makes perceptual hashing robust to re-exposure
    val p = Array.tabulate[Byte](16)(i => ((i * 13 + 20) % 180).toByte)
    val d0 = decoded(47, 29, p)
    val d1 = decoded(47, 29, p.map(b => ((b & 0xff) + 40).toByte)) // no wrap: max 219
    assert(Multimodal.PHash.aHash64(d0) === Multimodal.PHash.aHash64(d1))
    assert(Multimodal.PHash.dHash64(d0) === Multimodal.PHash.dHash64(d1))
  }

  test("single-byte perturbation moves the hash a small hamming distance") {
    val p = Array.tabulate[Byte](16)(i => ((i * 97 + 3) % 256).toByte)
    val q = p.clone(); q(5) = (((q(5) & 0xff) + 16) & 0xff).toByte
    val (a0, a1) = (Multimodal.PHash.aHash64(decoded(80, 64, p)),
                    Multimodal.PHash.aHash64(decoded(80, 64, q)))
    val ham = java.lang.Long.bitCount(a0 ^ a1)
    assert(ham < 32, s"1/16 of pixels changed should not flip half the bits (got $ham)")
  }

  test("attachBlobDup: copies 0-2 of a group decode to the identical raster") {
    val docs = Tables.documents(spark, sfDir).where(col("doc_id") < 36)
    val sigs = Multimodal.withPerceptualHash(spark, Multimodal.attachBlobDup(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byGroup = sigs.groupBy(_._1 / 6)
    byGroup.foreach { case (g, members) =>
      val base = members.filter(_._1 % 6 < 3)
      assert(base.map(_._2).distinct.size === 1, s"group $g aHash differs across containers")
      assert(base.map(_._3).distinct.size === 1, s"group $g dHash differs across containers")
    }
  }
}
