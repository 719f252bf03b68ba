package graft.mm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, processed in batched mapPartitions kernels.
  *
  * The DECODE STEP IS A DETERMINISTIC STUB — this container has no image /
  * audio codecs, so `decodeStub` parses a pseudo-header (first 8 bytes ->
  * kind/width/height) and `featurizeStub` computes a byte histogram. The
  * Spark-side plumbing is real and is what matters at 100 TB: binary-column
  * schema, per-partition batch loop (shaped like an inference batcher: fixed
  * `batchSize` slices, one model call per batch), partition sizing via
  * ordinary parquet splits.
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

  val metaSchema: StructType = StructType(Seq(
    StructField("kind", StringType), StructField("width", IntegerType),
    StructField("height", IntegerType), StructField("n_bytes", IntegerType)))

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
