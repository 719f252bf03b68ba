package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.mm.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("decode stub is deterministic and schema-stable") {
    val b = Array[Byte](2, 10, 3, 7, 1, 0, 0, 0, 42)
    assert(Multimodal.decodeStub(b) == Multimodal.decodeStub(b))
    assert(Multimodal.decodeStub(b).kind == "video")
    assert(Multimodal.decodeStub(Array[Byte](1, 2)).kind == "unknown")
  }

  test("featurize stub: normalized histogram sums to ~1") {
    val f = Multimodal.featurizeStub("hello world graft".getBytes("UTF-8"))
    assert(math.abs(f.sum - 1.0f) < 1e-5)
    assert(f.length == 32)
  }

  test("REAL png round-trip: ImageIO decode returns the synthesized pixels") {
    val seed = 57L
    val png = Multimodal.synthPng(seed)
    // PNG magic bytes prove a real encoder ran
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte)
    val Some((w, h, avg)) = Multimodal.decodeImage(png)
    val want = (0 until 64).map(i => (seed * 31 + i) % 256).sum.toDouble / 64
    assert(w == 8 && h == 8 && avg == want)
    assert(Multimodal.decodeImage("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("REAL wav round-trip: RIFF chunk walk recovers rate/samples/abs-sum") {
    val seed = 3L
    val wav = Multimodal.synthWav(seed, nSamples = 100, sampleRate = 16000)
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF")
    val Some((rate, ch, n, s)) = Multimodal.decodeWav(wav)
    val want = (0 until 100).map(i => math.abs((seed * 7 + i * 13) % 65536 - 32768)).sum
    assert(rate == 16000 && ch == 1 && n == 100 && s == want)
    assert(Multimodal.decodeWav(Array.fill[Byte](60)(1)).isEmpty)
  }

  test("frame sampling: n evenly spaced windows") {
    val frames = Multimodal.frameSampleStub((0 until 100).map(_.toByte).toArray, 4, 8)
    assert(frames.length == 4)
    assert(frames(0).head == 0.toByte && frames(2).head == 50.toByte)
  }

  test("withMediaFeatures: batched pipeline over a binary column") {
    val df = (0 until 200).map { i =>
      (i.toLong, s"payload-$i-${"x" * (i % 37)}".getBytes("UTF-8"))
    }.toDF("id", "payload")
    val out = Multimodal.withMediaFeatures(df, "payload")
    assert(out.count() == 200)
    val row = out.where(col("id") === 7L).head()
    val media = row.getStruct(row.fieldIndex("media"))
    assert(media.getAs[Int]("n_bytes") == "payload-7-xxxxxxx".length)
    val feats = row.getSeq[Float](row.fieldIndex("features"))
    assert(feats.length == 32 && math.abs(feats.sum - 1.0f) < 1e-5)
    // deterministic across runs
    val again = Multimodal.withMediaFeatures(df, "payload")
      .where(col("id") === 7L).head().getSeq[Float](row.fieldIndex("features"))
    assert(again == feats)
  }
}
