package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ml.Similarity

/** Embedding-cosine near-dup pairs: planted duplicates must be recovered
  * through the LSH blocking, and every reported pair must be a true
  * above-threshold pair (the verify step is exact). */
class NearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 16
  private val nBase = 200
  private def vec(id: Long): Array[Float] = {
    val a = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      val h = graft.corpus.WebCorpus.splitmix64(id * 131L + i)
      a(i) = ((h & 0xffff).toFloat / 65536f) - 0.5f
      i += 1
    }
    a
  }

  test("planted near-duplicates recovered; reported pairs are exact") {
    // base vectors + 20 planted near-copies (one component nudged)
    val planted = (0 until 20).map { i =>
      val v = vec(i.toLong).clone()
      v(i % dim) = v(i % dim) + 0.01f
      (1000L + i, v.toSeq)
    }
    val rows = (0L until nBase).map(id => (id, vec(id).toSeq)) ++ planted
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.nearDupPairs(df, "vec_id", "embedding", dim,
        minCos = 0.95, planes = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap

    // brute-force truth
    val all = rows.toArray
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < dim) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val truth = (for {
      i <- all.indices; j <- (i + 1) until all.length
      c = cos(all(i)._2, all(j)._2)
      if c >= 0.95
    } yield {
      val (x, y) = (all(i)._1, all(j)._1)
      (math.min(x, y), math.max(x, y))
    }).toSet
    assert(truth.size >= 20, "every planted copy must be a true near-dup")

    // exactness: every reported pair is true (LSH may only LOSE pairs)
    assert(got.keySet.subsetOf(truth), s"false positives: ${got.keySet -- truth}")
    // a nudged copy is nearly identical -> all 8 hyperplane signs agree
    // almost surely; require near-total recall on the planted pairs
    val recall = got.keySet.size.toDouble / truth.size
    assert(recall >= 0.9, s"recall $recall (${got.size}/${truth.size})")
    got.values.foreach(c => assert(c >= 0.95))
  }

  test("bucket df cap drops oversized buckets, not correctness") {
    val rows = (0L until 100L).map(id => (id, vec(id).toSeq))
    val df = rows.toDF("vec_id", "embedding")
    // cap 1 = every bucket with >1 member dropped -> no pairs at all
    val none = Similarity.nearDupPairs(df, "vec_id", "embedding", dim,
      minCos = 0.0, planes = 2, maxBucketDf = 1)
    assert(none.count() == 0)
  }
}
