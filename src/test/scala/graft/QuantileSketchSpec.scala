package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ml.Sketches

/** The deterministic mergeable quantile sketch: rank-error bound vs exact,
  * semilattice mergeability (union → bottom-k), and the property that
  * justifies choosing it over KLL — the result is a pure function of the
  * row SET, independent of partitioning/arrival order (KLL's compactions
  * are stream-order-dependent, which Spark cannot replay). */
class QuantileSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 50k rows, 3 skewed groups: value distribution is a squared ramp (heavy
  // head) so uniform-sample rank error is actually exercised
  private val n = 50000
  private lazy val df = (0 until n).map { i =>
    val g = s"g${i % 3}"
    val v = ((i.toLong * i) % 9973) * (i % 3 + 1)
    (i.toLong, g, v)
  }.toDF("id", "grp", "v")

  private def exactRankOf(grp: String, est: Long): Double = {
    val vals = df.where($"grp" === grp).select($"v").as[Long].collect().sorted
    val below = vals.count(_ <= est).toDouble
    below / vals.length
  }

  test("rank error within the uniform-sample bound at k=1024") {
    val qs = Seq(103, 250, 500, 750, 907)
    val out = Sketches.quantileSketch(df, Seq("grp"), col("id"), col("v"),
        k = 1024, qPermille = qs)
      .select($"grp", $"q", $"est".cast("long")).as[(String, Double, Long)]
      .collect()
    assert(out.length == 3 * qs.size)
    // 4σ of a k=1024 uniform sample at q=0.5 is ~0.0625; be slightly loose
    out.foreach { case (g, q, est) =>
      val r = exactRankOf(g, est)
      assert(math.abs(r - q) <= 0.07,
        s"grp=$g q=$q est=$est true rank $r off by ${math.abs(r - q)}")
    }
  }

  test("mergeable: bottom-k(whole) == bottom-k(bottom-k(half1) ∪ bottom-k(half2))") {
    val whole = Sketches.bottomKSample(df, Seq("grp"), col("id"), col("v"), 256)
      .select($"grp", $"sid", $"v", $"u")
    val h1 = Sketches.bottomKSample(df.where($"id" % 2 === 0),
      Seq("grp"), col("id"), col("v"), 256)
    val h2 = Sketches.bottomKSample(df.where($"id" % 2 === 1),
      Seq("grp"), col("id"), col("v"), 256)
    // merge = union of partial sketches, re-sampled: sid doubles as the id
    val merged = Sketches.bottomKSample(h1.union(h2),
        Seq("grp"), col("sid"), col("v"), 256)
      .select($"grp", $"sid", $"v", $"u")
    val a = whole.orderBy("grp", "u", "sid").collect().toSeq
    val b = merged.orderBy("grp", "u", "sid").collect().toSeq
    assert(a == b, "bottom-k must be a semilattice merge")
  }

  test("result independent of partitioning (the anti-KLL property)") {
    val base = Sketches.quantileSketch(df, Seq("grp"), col("id"), col("v"),
      k = 512, qPermille = Seq(500, 907)).orderBy("grp", "q").collect().toSeq
    val repart = Sketches.quantileSketch(df.repartition(7, col("v")),
      Seq("grp"), col("id"), col("v"),
      k = 512, qPermille = Seq(500, 907)).orderBy("grp", "q").collect().toSeq
    val one = Sketches.quantileSketch(df.coalesce(1),
      Seq("grp"), col("id"), col("v"),
      k = 512, qPermille = Seq(500, 907)).orderBy("grp", "q").collect().toSeq
    assert(repart == base && one == base,
      "sketch must be a pure function of the row set")
  }

  test("k >= group size degrades to exact quantiles") {
    val small = (0 until 100).map(i => (i.toLong, "s", i.toLong * 10))
      .toDF("id", "grp", "v")
    val got = Sketches.quantileSketch(small, Seq("grp"), col("id"), col("v"),
        k = 1000, qPermille = Seq(10, 500, 1000))
      .select($"q", $"est".cast("long"), $"n_s").as[(Double, Long, Long)]
      .collect().sortBy(_._1).toSeq
    // rank = ceil(q*100): q=0.01→1st (v=0), q=0.5→50th (v=490), q=1→100th (v=990)
    assert(got == Seq((0.01, 0L, 100L), (0.5, 490L, 100L), (1.0, 990L, 100L)))
  }
}
