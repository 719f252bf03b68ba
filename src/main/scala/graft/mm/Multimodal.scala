package graft.mm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, processed in batched mapPartitions kernels.
  *
  * Two tiers:
  *  - REAL codecs where the JDK ships one: PNG decode via javax.imageio
  *    (`decodeImage` — headless BufferedImage, no external libs) and
  *    WAV/RIFF PCM parsing (`decodeWav` — RIFF is a public byte layout,
  *    parsed directly). Both are driven through the same batched
  *    mapPartitions kernels and gated with EXACT oracles over
  *    deterministically synthesized payloads (`synthPng`/`synthWav`).
  *  - STUBS for codecs the container lacks (video / JPEG-XL / model
  *    featurizers): `decodeStub`/`featurizeStub` parse a pseudo-header and
  *    byte histogram — loudly fake, but the batch shape is the real one.
  */
object Multimodal {

  final val BatchSize = 64

  final case class MediaMeta(kind: String, width: Int, height: Int, nBytes: Int)

  /** deterministic fake decode — STUB for the real codec */
  def decodeStub(bytes: Array[Byte]): MediaMeta = {
    if (bytes == null || bytes.length < 8) MediaMeta("unknown", 0, 0, if (bytes == null) 0 else bytes.length)
    else {
      val kind = (bytes(0) & 0x03) match {
        case 0 => "image"; case 1 => "audio"; case 2 => "video"; case _ => "text"
      }
      val w = ((bytes(1) & 0xff) << 4 | (bytes(2) & 0x0f)) + 1
      val h = ((bytes(3) & 0xff) << 4 | (bytes(4) & 0x0f)) + 1
      MediaMeta(kind, w, h, bytes.length)
    }
  }

  /** deterministic fake feature extraction — normalized byte histogram */
  def featurizeStub(bytes: Array[Byte], dims: Int = 32): Array[Float] = {
    val hist = new Array[Float](dims)
    if (bytes == null || bytes.isEmpty) return hist
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) % dims) += 1f; i += 1 }
    var j = 0
    while (j < dims) { hist(j) /= bytes.length; j += 1 }
    hist
  }

  /** deterministic fake frame sampling — n evenly spaced byte windows */
  def frameSampleStub(bytes: Array[Byte], n: Int, frameLen: Int = 16): Array[Array[Byte]] = {
    if (bytes == null || bytes.isEmpty || n <= 0) return Array.empty
    (0 until n).map { i =>
      val start = math.min((bytes.length.toLong * i / n).toInt, math.max(0, bytes.length - 1))
      java.util.Arrays.copyOfRange(bytes, start, math.min(bytes.length, start + frameLen))
    }.toArray
  }

  // ---- REAL codecs (JDK-only: ImageIO PNG, RIFF/PCM WAV) ----

  // ImageIO's default stream cache is DISK-backed: every read/write spills
  // through a temp FILE (FileCacheImageInput/OutputStream) — per-image
  // file creation that dominates small-image decode and couples throughput
  // to /tmp latency. Payloads here stream through memory instead. JVM-wide
  // flag, set once per classload (executors included: the first task that
  // touches this object sets it before any codec call).
  javax.imageio.ImageIO.setUseCache(false)

  /** deterministic w x h grayscale PNG: pixel(i) = (seed*31 + i) mod 256,
    * i row-major — the analytic formula the oracle replays. PNG is
    * lossless, so decode returns exactly these values. */
  def synthPng(seed: Long, w: Int = 8, h: Int = 8): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < w * h) {
      val g = (((seed * 31 + i) % 256 + 256) % 256).toInt
      img.setRGB(i % w, i / w, (g << 16) | (g << 8) | g)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image decode via the JDK's ImageIO (PNG/GIF/BMP — headless-safe).
    * Returns (width, height, mean gray of the blue channel); None when the
    * bytes aren't a decodable image. The /64-style division is exact for
    * power-of-two pixel counts, so oracles hash-match. */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Double)] = {
    if (bytes == null || bytes.isEmpty) return None
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null) None
    else {
      val w = img.getWidth; val h = img.getHeight
      var s = 0L; var i = 0
      while (i < w * h) { s += (img.getRGB(i % w, i / w) & 0xff); i += 1 }
      Some((w, h, s.toDouble / (w * h)))
    }
  }

  /** deterministic mono 16-bit PCM WAV: sample(i) = ((seed*7 + i*13) mod
    * 65536) - 32768, little-endian RIFF (the public WAVEFORMAT layout). */
  def synthWav(seed: Long, nSamples: Int = 256, sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2)            // block align
      .putShort(16)           // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      val v = (((seed * 7 + i.toLong * 13) % 65536 + 65536) % 65536 - 32768).toShort
      buf.putShort(v); i += 1
    }
    buf.array()
  }

  /** REAL WAV parse: walks the RIFF chunks, returns (sampleRate, channels,
    * nSamples, sum of |sample|) for 16-bit PCM; None for non-WAV bytes.
    * The abs-sum is an exact long — oracle-friendly. */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (bytes == null || bytes.length < 44) return None
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = { val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII") }
    if (tag() != "RIFF") return None
    buf.getInt()
    if (tag() != "WAVE") return None
    var rate = 0; var channels = 0; var bits = 0
    while (buf.remaining() >= 8) {
      val id = tag(); val len = buf.getInt()
      if (id == "fmt ") {
        val fmtEnd = buf.position() + len
        val codec = buf.getShort()
        channels = buf.getShort()
        rate = buf.getInt()
        buf.getInt(); buf.getShort()
        bits = buf.getShort()
        if (codec != 1 || bits != 16) return None
        buf.position(fmtEnd)
      } else if (id == "data") {
        val n = len / 2
        var s = 0L; var i = 0
        while (i < n) { s += math.abs(buf.getShort().toLong); i += 1 }
        return Some((rate, channels, n / math.max(1, channels), s))
      } else buf.position(buf.position() + len + (len & 1))
    }
    None
  }

  val metaSchema: StructType = StructType(Seq(
    StructField("kind", StringType), StructField("width", IntegerType),
    StructField("height", IntegerType), StructField("n_bytes", IntegerType)))

  val imageSchema: StructType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("avg_gray", DoubleType)))

  val wavSchema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType), StructField("channels", IntegerType),
    StructField("n_samples", IntegerType), StructField("abs_sum", LongType)))

  /** batched REAL image decode: appends a nullable `image` struct
    * (width, height, avg_gray) per row — null for undecodable bytes */
  def withImageDecode(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("image", imageSchema))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        val decoded = batch.map(r => decodeImage(r.getAs[Array[Byte]](binIdx)))
        batch.lazyZip(decoded).map { (r, d) =>
          Row.fromSeq(r.toSeq :+ d.map { case (w, h, g) => Row(w, h, g) }.orNull)
        }
      }
    }(enc)
  }

  /** batched REAL WAV parse: appends a nullable `audio` struct
    * (sample_rate, channels, n_samples, abs_sum) per row */
  def withWavDecode(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("audio", wavSchema))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        val decoded = batch.map(r => decodeWav(r.getAs[Array[Byte]](binIdx)))
        batch.lazyZip(decoded).map { (r, d) =>
          Row.fromSeq(r.toSeq :+ d.map { case (sr, ch, n, s) => Row(sr, ch, n, s) }.orNull)
        }
      }
    }(enc)
  }

  /** Attach decoded metadata + feature vectors to a binary column, driving
    * the decode in fixed-size batches per partition (the inference-batch
    * shape: grouped slices, one "model call" per group). */
  def withMediaFeatures(df: DataFrame, binCol: String, dims: Int = 32): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Array(
      StructField("media", metaSchema),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        // batched "decode" — a real pipeline would hand the whole batch to
        // the codec / model here
        val metas = batch.map(r => decodeStub(r.getAs[Array[Byte]](binIdx)))
        val feats = batch.map(r => featurizeStub(r.getAs[Array[Byte]](binIdx), dims))
        batch.lazyZip(metas).lazyZip(feats).map { (r, m, f) =>
          Row.fromSeq(r.toSeq ++ Seq(Row(m.kind, m.width, m.height, m.nBytes), f.toSeq))
        }
      }
    }(enc)
  }
}
