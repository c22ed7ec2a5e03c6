package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` + typed
  * metadata, processed per-partition with typed Datasets.
  *
  * The decode step is REAL: hand-parsed pure-JVM codecs for three
  * uncompressed container formats — BMP (24-bit BI_RGB, the Windows
  * DIB layout), PPM (binary P6, the netpbm layout), and WAV (8-bit
  * PCM, canonical 44-byte RIFF header). No image library needed: these
  * formats are headers + raw samples, which is exactly why lakes use
  * them as interchange for decode-side pipelines. The Spark plumbing
  * is the 100 TB shape: binary columns travel columnar (parquet
  * BYTE_ARRAY), decode runs `mapPartitions` (one codec/FFI init per
  * partition, not per row), features are fixed-width float arrays, and
  * frame sampling explodes to one row per kept frame.
  *
  * Reference evidence for the surface: the pipeline's documents table
  * is the host for every per-document signal
  * (`/root/reference/mnt/dags/02datalake_to_datawarehouse.py:59-92` treats columns
  * as opaque payloads + typed metadata); image/audio payloads are the
  * same pattern at binary type.
  */
object Multimodal {

  case class Blob(doc_id: Long, media_type: String, bytes: Array[Byte])
  case class Meta(doc_id: Long, media_type: String, width: Int, height: Int,
                  channels: Int, n_bytes: Int, mean_pixel: Int)
  case class Features(doc_id: Long, features: Array[Float])

  /** Hand-parsed pure-JVM codecs. Each decode validates the header and
    * returns dimensions, channel count, the floor-mean of the sample
    * payload (padding excluded — an exact integer, which is what makes
    * the decode arithmetic oracle-checkable), and the payload itself
    * (for feature extraction). */
  object Codec {
    case class Decoded(width: Int, height: Int, channels: Int,
                       meanPixel: Int, payload: Array[Byte])

    private def cycle(payload: Array[Byte], n: Int): Array[Byte] = {
      require(payload.nonEmpty, "empty payload")
      val out = new Array[Byte](n)
      var i = 0
      while (i < n) { out(i) = payload(i % payload.length); i += 1 }
      out
    }

    private def finish(w: Int, h: Int, c: Int, payload: Array[Byte]): Decoded = {
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum += (payload(i) & 0xff); i += 1 }
      Decoded(w, h, c, (sum / math.max(payload.length, 1)).toInt, payload)
    }

    // ---- BMP: BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40), 24-bit
    // BI_RGB, rows stored bottom-up and padded to 4-byte boundaries.
    def encodeBmp(w: Int, h: Int, payload: Array[Byte]): Array[Byte] = {
      val stride = ((3 * w + 3) / 4) * 4
      val dataSize = stride * h
      val b = java.nio.ByteBuffer.allocate(54 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
        .putShort(0: Short).putShort(0: Short).putInt(54)
      b.putInt(40).putInt(w).putInt(h).putShort(1: Short).putShort(24: Short)
        .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
      val px = cycle(payload, 3 * w * h) // logical top-down row-major
      var y = h - 1
      while (y >= 0) { // bottom-up storage
        b.put(px, y * 3 * w, 3 * w)
        var p = 3 * w
        while (p < stride) { b.put(0: Byte); p += 1 }
        y -= 1
      }
      b.array()
    }

    private def decodeBmp(bytes: Array[Byte]): Decoded = {
      require(bytes.length >= 54, "BMP: truncated header")
      val b = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val off = b.getInt(10)
      val w = b.getInt(18)
      val h = b.getInt(22)
      val bpp = b.getShort(28)
      val comp = b.getInt(30)
      require(bpp == 24 && comp == 0,
        s"BMP: unsupported bpp=$bpp compression=$comp (24-bit BI_RGB only)")
      val stride = ((3 * w + 3) / 4) * 4
      require(w > 0 && h > 0 && off >= 54 &&
        off.toLong + stride.toLong * h <= bytes.length,
        s"BMP: pixel data out of bounds (w=$w h=$h off=$off len=${bytes.length})")
      val px = new Array[Byte](3 * w * h)
      var y = 0
      while (y < h) { // storage row y is logical row h-1-y
        System.arraycopy(bytes, off + y * stride, px, (h - 1 - y) * 3 * w, 3 * w)
        y += 1
      }
      finish(w, h, 3, px)
    }

    // ---- PPM: binary P6, "P6\n<w> <h>\n<maxval>\n" + RGB triplets.
    def encodePpm(w: Int, h: Int, payload: Array[Byte]): Array[Byte] =
      s"P6\n$w $h\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
        cycle(payload, 3 * w * h)

    private def decodePpm(bytes: Array[Byte]): Decoded = {
      var pos = 2 // past "P6"
      def token(): Int = { // skip whitespace + '#' comments, read an int
        var inComment = false
        while (pos < bytes.length &&
               (inComment || bytes(pos).toChar.isWhitespace || bytes(pos) == '#')) {
          if (bytes(pos) == '#') inComment = true
          else if (bytes(pos) == '\n') inComment = false
          pos += 1
        }
        var v = 0
        val start = pos
        while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
          v = v * 10 + (bytes(pos) - '0'); pos += 1
        }
        require(pos > start, s"PPM: expected integer at byte $start")
        v
      }
      val w = token(); val h = token(); val maxval = token()
      require(maxval == 255, s"PPM: unsupported maxval $maxval (8-bit only)")
      pos += 1 // exactly one whitespace byte before the raster
      require(w > 0 && h > 0 && pos + 3L * w * h <= bytes.length,
        s"PPM: raster out of bounds (w=$w h=$h pos=$pos len=${bytes.length})")
      finish(w, h, 3, java.util.Arrays.copyOfRange(bytes, pos, pos + 3 * w * h))
    }

    // ---- WAV: canonical 44-byte RIFF/WAVE header, 8-bit PCM.
    def encodeWav(nBytes: Int, payload: Array[Byte]): Array[Byte] = {
      val ascii = java.nio.charset.StandardCharsets.US_ASCII
      val b = java.nio.ByteBuffer.allocate(44 + nBytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes(ascii)).putInt(36 + nBytes)
        .put("WAVE".getBytes(ascii))
      b.put("fmt ".getBytes(ascii)).putInt(16).putShort(1: Short) // PCM
        .putShort(1: Short).putInt(8000).putInt(8000)             // mono, 8 kHz
        .putShort(1: Short).putShort(8: Short)                    // align, 8-bit
      b.put("data".getBytes(ascii)).putInt(nBytes)
      b.put(cycle(payload, nBytes))
      b.array()
    }

    private def decodeWav(bytes: Array[Byte]): Decoded = {
      require(bytes.length >= 44, "WAV: truncated header")
      val ascii = java.nio.charset.StandardCharsets.US_ASCII
      def tag(off: Int, n: Int) = new String(bytes, off, n, ascii)
      require(tag(0, 4) == "RIFF" && tag(8, 4) == "WAVE" &&
        tag(12, 4) == "fmt " && tag(36, 4) == "data",
        "WAV: not a canonical 44-byte-header PCM file")
      val b = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val fmt = b.getShort(20)
      val channels = b.getShort(22)
      val bits = b.getShort(34)
      val dataSize = b.getInt(40)
      require(fmt == 1 && bits == 8, s"WAV: unsupported fmt=$fmt bits=$bits")
      require(channels > 0 && dataSize >= 0 && 44L + dataSize <= bytes.length,
        s"WAV: data chunk out of bounds (n=$dataSize len=${bytes.length})")
      val samples = java.util.Arrays.copyOfRange(bytes, 44, 44 + dataSize)
      finish(dataSize / channels, 1, channels, samples)
    }

    // ---- PNG: the COMPRESSED container (8-byte signature + chunked
    // IHDR/IDAT/IEND, IDAT = zlib deflate of filtered scanlines).
    // Pure-JVM via java.util.zip {Deflater, Inflater, CRC32} — public
    // knowledge end to end (RFC 2083 + RFC 1950/1951). 8-bit
    // truecolor (color type 2) only; the decoder de-filters ALL five
    // scanline filters (None/Sub/Up/Average/Paeth) even though the
    // encoder emits filter 0, so externally-produced PNGs decode too.

    private val PngSig: Array[Byte] =
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    private def pngChunk(out: java.io.ByteArrayOutputStream,
                         typ: String, data: Array[Byte]): Unit = {
      val len = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
      val t = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      out.write(len); out.write(t); out.write(data)
      out.write(java.nio.ByteBuffer.allocate(4)
        .putInt(crc.getValue.toInt).array())
    }

    def encodePng(w: Int, h: Int, payload: Array[Byte]): Array[Byte] = {
      val px = cycle(payload, 3 * w * h)
      // scanlines: filter byte 0 + raw RGB row (filter 0 keeps the
      // planted-payload arithmetic oracle-checkable; deflate is
      // lossless so the decoded mean is untouched by compression)
      val raw = new Array[Byte](h * (1 + 3 * w))
      var y = 0
      while (y < h) {
        System.arraycopy(px, y * 3 * w, raw, y * (1 + 3 * w) + 1, 3 * w)
        y += 1
      }
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(raw); deflater.finish()
      val zout = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!deflater.finished())
        zout.write(buf, 0, deflater.deflate(buf))
      deflater.end()
      val ihdr = java.nio.ByteBuffer.allocate(13)
        .putInt(w).putInt(h)
        .put(8: Byte)  // bit depth
        .put(2: Byte)  // color type: truecolor RGB
        .put(0: Byte).put(0: Byte).put(0: Byte) // deflate, adaptive, none
        .array()
      val out = new java.io.ByteArrayOutputStream()
      out.write(PngSig)
      pngChunk(out, "IHDR", ihdr)
      pngChunk(out, "IDAT", zout.toByteArray)
      pngChunk(out, "IEND", Array.emptyByteArray)
      out.toByteArray
    }

    private def decodePng(bytes: Array[Byte]): Decoded = {
      require(bytes.length >= 8 + 25 + 12 &&
        bytes.take(8).sameElements(PngSig), "PNG: bad signature")
      val b = java.nio.ByteBuffer.wrap(bytes) // big-endian by default
      var pos = 8
      var w = 0; var h = 0
      val idat = new java.io.ByteArrayOutputStream()
      var done = false
      while (!done) {
        require(pos + 8 <= bytes.length, "PNG: truncated chunk header")
        val len = b.getInt(pos)
        val typ = new String(bytes, pos + 4, 4,
          java.nio.charset.StandardCharsets.US_ASCII)
        require(len >= 0 && pos + 12L + len <= bytes.length,
          s"PNG: chunk $typ out of bounds (len=$len)")
        typ match {
          case "IHDR" =>
            w = b.getInt(pos + 8); h = b.getInt(pos + 12)
            val depth = bytes(pos + 16); val color = bytes(pos + 17)
            val interlace = bytes(pos + 20)
            require(depth == 8 && color == 2 && interlace == 0,
              s"PNG: unsupported depth=$depth color=$color " +
                s"interlace=$interlace (8-bit RGB, no interlace only)")
          case "IDAT" => idat.write(bytes, pos + 8, len)
          case "IEND" => done = true
          case _ => () // ancillary chunks skipped
        }
        pos += 12 + len
      }
      require(w > 0 && h > 0, "PNG: missing IHDR")
      val stride = 3 * w
      val raw = new Array[Byte](h * (1 + stride))
      val inflater = new java.util.zip.Inflater()
      inflater.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, off, raw.length - off)
        require(n > 0 || inflater.finished(),
          "PNG: truncated or corrupt IDAT stream")
        off += n
      }
      inflater.end()
      require(off == raw.length,
        s"PNG: inflated $off bytes, expected ${raw.length}")
      // de-filter (RFC 2083 §6): recon against left (a), above (b),
      // upper-left (c) neighbors at 3 bytes/pixel
      val px = new Array[Byte](h * stride)
      var y = 0
      while (y < h) {
        val f = raw(y * (1 + stride)) & 0xff
        var i = 0
        while (i < stride) {
          val x = raw(y * (1 + stride) + 1 + i) & 0xff
          val a = if (i >= 3) px(y * stride + i - 3) & 0xff else 0
          val bU = if (y > 0) px((y - 1) * stride + i) & 0xff else 0
          val c = if (y > 0 && i >= 3) px((y - 1) * stride + i - 3) & 0xff else 0
          val recon = f match {
            case 0 => x
            case 1 => x + a
            case 2 => x + bU
            case 3 => x + (a + bU) / 2
            case 4 =>
              val p = a + bU - c
              val pa = math.abs(p - a); val pb = math.abs(p - bU)
              val pc = math.abs(p - c)
              x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) bU else c)
            case other =>
              throw new IllegalArgumentException(s"PNG: bad filter $other")
          }
          px(y * stride + i) = (recon & 0xff).toByte
          i += 1
        }
        y += 1
      }
      finish(w, h, 3, px)
    }

    /** Dispatch on magic bytes. */
    def decode(bytes: Array[Byte]): Decoded = {
      require(bytes.length >= 4, "blob too short for any known magic")
      if (bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
      else if (bytes(0) == 'P' && bytes(1) == '6') decodePpm(bytes)
      else if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
               bytes(2) == 'N' && bytes(3) == 'G') decodePng(bytes)
      else if (bytes(0) == 'R' && bytes(1) == 'I' &&
               bytes(2) == 'F' && bytes(3) == 'F') decodeWav(bytes)
      else throw new IllegalArgumentException(
        s"unknown media magic: ${bytes.take(4).map(b => f"${b & 0xff}%02x").mkString}")
    }
  }

  /** Plant a deterministic REAL media blob per document (stand-in for
    * an ingested media column): dimensions and media type derive from
    * md5 hex digits (engine-portable — the DuckDB twin recomputes
    * them), the sample payload is unhex(md5(text)) cycled to fill, and
    * the container is a genuine BMP / PPM / WAV that any external tool
    * can open. image→BMP, video→PPM, audio→WAV (3·w·h samples, so all
    * three share the payload-mean arithmetic). */
  def attachBlob(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (conv(substring(md5(col("source")), 31, 2), 16, 10)
            .cast("int") % 3 + 1)).as("media_type"),
        (conv(substring(md5(col("text")), 1, 2), 16, 10)
          .cast("int") % 128 + 16).as("w"),
        (conv(substring(md5(col("text")), 3, 2), 16, 10)
          .cast("int") % 128 + 16).as("h"),
        unhex(md5(col("text"))).as("payload"))
      .as[(Long, String, Int, Int, Array[Byte])]
      .map { case (id, mt, w, h, p) =>
        val bytes = mt match {
          case "image" => Codec.encodeBmp(w, h, p)
          case "video" => Codec.encodePpm(w, h, p)
          case _       => Codec.encodeWav(3 * w * h, p)
        }
        Blob(id, mt, bytes)
      }
      .toDF()
  }

  /** Plant a deterministic PNG blob per document — the COMPRESSED
    * sibling of [[attachBlob]]'s containers: same md5-derived dims and
    * cycled payload, but the raster rides zlib-deflated inside IDAT,
    * so decode exercises inflate + de-filter, not just header walks.
    * Deflate OUTPUT bytes are zlib-implementation-specific (container
    * size is NOT oracle material); the decoded dims/channels/mean are
    * bit-determined by the spec and gate-checked. */
  def attachPngBlob(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id"),
        (conv(substring(md5(col("text")), 1, 2), 16, 10)
          .cast("int") % 128 + 16).as("w"),
        (conv(substring(md5(col("text")), 3, 2), 16, 10)
          .cast("int") % 128 + 16).as("h"),
        unhex(md5(col("text"))).as("payload"))
      .as[(Long, Int, Int, Array[Byte])]
      .map { case (id, w, h, p) =>
        Blob(id, "image", Codec.encodePng(w, h, p))
      }
      .toDF()
  }

  /** Perceptual hashes over the DECODED raster — the image sibling of
    * text MinHash/SimHash. Pure integer arithmetic end to end (floor
    * grayscale, floor cell boundaries, floor means), which is what
    * makes the hashes engine-exact: the same raster produces the same
    * 64 bits on any JVM, and a raster planted from md5-cycled bytes is
    * bit-recomputable by the DuckDB oracle without decoding a byte.
    *
    * - aHash: grayscale → 8×8 average-pool → bit k set iff cell k's
    *   floor-mean exceeds the floor-mean of all 64 cells. Invariant to
    *   container format (BMP/PPM/PNG of the same raster hash equal)
    *   and NEAR-invariant to uniform brightness shifts (cells and the
    *   global mean move together; only floor noise flips bits) — so
    *   re-encoded and brightness-tweaked copies land within a small
    *   hamming distance, the near-dup semantic perceptual hashing
    *   exists for.
    * - dHash: grayscale → 8-row × 9-column average-pool → bit r*8+c
    *   set iff cell (r,c+1) > cell (r,c) (horizontal gradient signs).
    *   Brightness shifts cancel in the difference, so dHash is the
    *   sharper invariant of the two.
    *
    * Candidate generation at scale reuses the SimHash pigeonhole
    * machinery ([[graft.operators.Dedup.simhashPairsFromSigs]]): 4
    * 16-bit chunks, chunk-equality join, exact `bit_count` verify —
    * banded, never all-pairs, COMPLETE at hamming <= 3. */
  object PHash {
    private def grayCells(d: Codec.Decoded, rows: Int, cols: Int): Array[Long] = {
      require(d.channels == 3, s"perceptual hash needs an RGB raster, got channels=${d.channels}")
      val w = d.width; val h = d.height; val px = d.payload
      val cells = new Array[Long](rows * cols)
      var cy = 0
      while (cy < rows) {
        val y0 = cy * h / rows; val y1 = (cy + 1) * h / rows
        var cx = 0
        while (cx < cols) {
          val x0 = cx * w / cols; val x1 = (cx + 1) * w / cols
          var sum = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val p = 3 * (y * w + x)
              sum += ((px(p) & 0xff) + (px(p + 1) & 0xff) + (px(p + 2) & 0xff)) / 3
              x += 1
            }
            y += 1
          }
          cells(cy * cols + cx) = sum / ((y1 - y0).toLong * (x1 - x0))
          cx += 1
        }
        cy += 1
      }
      cells
    }

    def aHash64(d: Codec.Decoded): Long = {
      val cells = grayCells(d, 8, 8)
      val mean = cells.sum / 64
      var bits = 0L
      var k = 0
      while (k < 64) { if (cells(k) > mean) bits |= (1L << k); k += 1 }
      bits
    }

    def dHash64(d: Codec.Decoded): Long = {
      val cells = grayCells(d, 8, 9)
      var bits = 0L
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          if (cells(r * 9 + c + 1) > cells(r * 9 + c)) bits |= (1L << (r * 8 + c))
          c += 1
        }
        r += 1
      }
      bits
    }
  }

  /** Plant a deterministic image corpus WITH KNOWN DUPLICATE GROUPS for
    * the perceptual-hash dedup gate: 6 docs per group share one
    * md5-seeded raster; copies 0-2 carry the identical raster through
    * three DIFFERENT containers (BMP / PPM / PNG — re-encoded
    * duplicates, the classic crawl case, hamming 0 by construction),
    * copies 3-5 bump ONE payload byte by +16 (mod 256) — a localized
    * edit touching 1/16 of pixels, measured to spread aHash hamming
    * right across the <=3 accept boundary (~77% accept, ~23% reject
    * over md5-random groups), so the gate exercises both paths. A
    * UNIFORM brightness shift would be useless here: gray shifts by
    * exactly s, so aHash is EXACTLY invariant until a byte wraps
    * (that invariance is itself spec-tested in MultimodalSpec). Dims
    * and payload derive from md5 hex digits of the group key, so the
    * DuckDB oracle recomputes every raster — and from it both hashes
    * — without parsing a container byte, while the engine runs the
    * REAL decode path. */
  def attachBlobDup(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.selectExpr("doc_id",
        "CAST(doc_id % 6 AS INT) AS j",
        "md5(CAST(doc_id DIV 6 AS STRING)) AS x")
      .selectExpr("doc_id", "j",
        "CAST(conv(substring(x, 1, 2), 16, 10) AS INT) % 128 + 16 AS w",
        "CAST(conv(substring(x, 3, 2), 16, 10) AS INT) % 128 + 16 AS h",
        "unhex(x) AS p")
      .as[(Long, Int, Int, Int, Array[Byte])]
      .map { case (id, j, w, h, p) =>
        val pp =
          if (j < 3) p
          else {
            val q = p.clone()
            q(j - 3) = (((q(j - 3) & 0xff) + 16) & 0xff).toByte
            q
          }
        val bytes = (j % 3) match {
          case 0 => Codec.encodeBmp(w, h, pp)
          case 1 => Codec.encodePpm(w, h, pp)
          case _ => Codec.encodePng(w, h, pp)
        }
        Blob(id, "image", bytes)
      }
      .toDF()
  }

  /** Decode → perceptual-hash per partition: one codec pass feeds both
    * hashes; output is the tiny (id, ahash, dhash) signature table the
    * banding join runs on — at 100 TB the rasters never shuffle, only
    * 24 bytes/doc of signatures do. */
  def withPerceptualHash(spark: SparkSession, blobs: DataFrame): DataFrame = {
    import spark.implicits._
    blobs.as[Blob].mapPartitions { it =>
      it.map { b =>
        val d = Codec.decode(b.bytes)
        (b.doc_id, PHash.aHash64(d), PHash.dHash64(d))
      }
    }.toDF("id", "ahash", "dhash")
  }

  /** Decode metadata per partition — codec state initialized once per
    * partition (the expensive part with an FFI codec), then streamed.
    * All fields are REAL header/sample arithmetic from [[Codec]]. */
  def decodeMeta(spark: SparkSession, blobs: DataFrame): Dataset[Meta] = {
    import spark.implicits._
    blobs.as[Blob].mapPartitions { it =>
      // real pipeline: init codec/FFI context here, once per partition
      it.map { b =>
        val d = Codec.decode(b.bytes)
        Meta(b.doc_id, b.media_type, d.width, d.height, d.channels,
             b.bytes.length, d.meanPixel)
      }
    }
  }

  /** Fixed-width feature extraction over the DECODED sample payload
    * (headers and row padding excluded — the batch shape of an
    * embedding UDF). */
  def extractFeatures(spark: SparkSession, blobs: DataFrame,
                      dim: Int = 16): Dataset[Features] = {
    import spark.implicits._
    blobs.as[Blob].mapPartitions { it =>
      it.map { b =>
        val px = Codec.decode(b.bytes).payload
        val out = new Array[Float](dim)
        var i = 0
        while (i < px.length) { out(i % dim) += (px(i) & 0xff) / 255.0f; i += 1 }
        Features(b.doc_id, out)
      }
    }
  }

  /** Frame sampling for "video" blobs: fixed-size frames, keep every
    * `stride`-th — one output row per kept frame, done with explode so
    * the fan-out stays distributed. Operates on the raw container
    * bytes (generic chunking plumbing; a real frame decoder would
    * substitute its own frame boundaries). */
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
