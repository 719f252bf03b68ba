package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{GraftFunctions, PolyHashUtil}
import graft.ml.Similarity
import graft.textops.{Dedup, TextAnalysis}

class DataOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("PolyHash matches a reference fold and survives codegen") {
    def ref(s: String, mult: Long, mod: Long): Long =
      s.codePoints().toArray.foldLeft(0L)((h, c) => (h * mult + c) % mod)
    for (s <- Seq("", "a", "spark join", "日本語テキスト", "x" * 500)) {
      assert(PolyHashUtil.hash(UTF8String.fromString(s), 131L, 1000000007L) ==
        ref(s, 131L, 1000000007L), s)
    }
    // through the engine (whole-stage codegen path)
    val got = Seq("alpha", "beta").toDF("s")
      .select(GraftFunctions.poly_hash(col("s")).as("h")).as[Long].collect()
    assert(got.toSeq == Seq(ref("alpha", 131, 1000000007L), ref("beta", 131, 1000000007L)))
  }

  test("shingles: count and content") {
    val df = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val sh = Dedup.shingles(df, "doc_id", "text", 3).as[(Long, String)].collect().toSet
    assert(sh == Set((1L, "a b c"), (1L, "b c d")))
  }

  test("jaccard pairs find planted near-duplicates, symmetric in input order") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "completely different text about spark and inverted indexes here")
    ).toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("minhash LSH finds the same near-dup pairs as exact jaccard (high sim)") {
    val docs = (0L until 40L).map { i =>
      val base = s"w$i x$i y$i " + (0 until 20).map(j => s"t${(i * 7 + j) % 50}").mkString(" ")
      (i, base)
    } ++ Seq((100L, (0 until 20).map(j => s"t${j % 50}").mkString(" ") + " w0 x0 y0"))
    val df = docs.toDF("doc_id", "text")
    val exact = Dedup.jaccardPairs(df, "doc_id", "text", n = 3, threshold = 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(df, "doc_id", "text", threshold = 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(lsh == exact)
  }

  test("simhash: near-identical docs have close hashes, deterministic") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val sig = Dedup.simhash(df, "doc_id", "text", bits = 16)
      .as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sig(1L), sig(2L)) < hamming(sig(1L), sig(3L)))
    val sig2 = Dedup.simhash(df, "doc_id", "text", bits = 16)
      .as[(Long, Long)].collect().toMap
    assert(sig == sig2)
  }

  test("simhashPairs: band cap stops the quadratic blowup on boilerplate") {
    // 300 identical docs land in ONE band bucket per chunk; the default cap
    // drops those buckets, so candidate generation stays linear. Two small
    // genuinely-near clusters must still pair up.
    val boiler = (0L until 300L).map(i => (i, "the same boilerplate header text repeated everywhere"))
    val near = Seq(
      (1000L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1001L, "alpha beta gamma delta epsilon zeta eta theta"))
    val df = (boiler ++ near).toDF("doc_id", "text")
    val capped = Dedup.simhashPairs(df, "doc_id", "text", maxBandDf = 256)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(capped.contains((1000L, 1001L)), "near pair in a small bucket survives")
    assert(!capped.exists(p => p._1 < 300L && p._2 < 300L),
      "capped run must not emit the O(n^2) boilerplate pairs")
    // uncapped: the same corpus explodes into 300*299/2 identical-doc pairs
    val uncapped = Dedup.simhashPairs(df, "doc_id", "text", maxBandDf = Int.MaxValue)
      .where(col("doc_a") < 300L && col("doc_b") < 300L).count()
    assert(uncapped == 300L * 299 / 2)
  }

  test("cosine topK matches brute-force scala") {
    val vecs = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * 8 + j).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val q = vecs.head._2
    val got = Similarity.cosineTopK(df, "vec_id", "embedding", q, 5, Some(0L))
      .as[(Long, Double)].collect().toSeq
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val want = vecs.tail.map { case (id, v) => (id, cos(v, q)) }
      .sortBy { case (id, c) => (-c, id) }.take(5)
    assert(got.map(_._1) == want.map(_._1))
    got.zip(want).foreach { case ((_, a), (_, b)) => assert(math.abs(a - b) < 1e-4) }
  }

  test("lang id picks marker language, und when none") {
    val df = Seq(
      (1L, "the cat and the dog"),
      (2L, "der hund und die katze"),
      (3L, "xyz abc qqq")).toDF("doc_id", "text")
    val got = TextAnalysis.langId(df, "doc_id", "text")
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "und"))
  }

  test("token counts: subword estimate") {
    val df = Seq((1L, "abcd efghijkl xy")).toDF("doc_id", "text")
    val got = TextAnalysis.tokenCounts(df, "doc_id", "text")
      .as[(Long, Int, Long)].collect().head
    // ceil(4/4)=1, ceil(8/4)=2, ceil(2/4)=1
    assert(got == ((1L, 3, 1L + 2L + 1L)))
  }
}
