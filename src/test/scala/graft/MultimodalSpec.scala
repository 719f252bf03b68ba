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
