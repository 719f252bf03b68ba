package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join at scale (the builder brief's other
  * canonical custom-op example, with as-of join). A naive
  * `p >= lo AND p < hi` theta-join has no equi-key, so Catalyst can only
  * run it as a broadcast-nested-loop — quadratic work and a broadcast
  * that cannot exist at 100 TB. The scale shape: quantize the value
  * domain into fixed-width buckets, EXPLODE each interval into the
  * buckets it covers, hash-join points on their single bucket, then
  * apply the exact containment filter. Cost = one hash shuffle with
  * fanout ceil(intervalWidth / bucketWidth) per interval; choose
  * `bucketWidth` near the typical interval width so the fanout is a
  * small constant. A point lives in exactly one bucket, so no pair is
  * produced twice — no distinct needed.
  */
object RangeJoin {

  /** Inner-join `points` rows to every `intervals` row whose
    * [loCol, hiCol) contains pointCol. Columns of both inputs survive. */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pb = points.withColumn("rj_bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    val ib = intervals.withColumn("rj_bucket",
      explode(sequence(floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    pb.join(ib, Seq("rj_bucket"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("rj_bucket")
  }

  /** Interval-overlap join: every (a, b) pair whose half-open intervals
    * [aLo, aHi) and [bLo, bHi) intersect. Same bucket-quantized hash-join
    * shape; an overlapping pair shares ceil(overlapWidth/bucketWidth)
    * buckets, so to stay duplicate-free WITHOUT a distinct (a corpus-wide
    * exchange), a pair is emitted only from the one bucket containing the
    * overlap's START, max(aLo, bLo) — each overlapping pair has exactly
    * one such bucket. Column names must not collide across `a` and `b`
    * (rename before calling). */
  def intervalOverlap(
      a: DataFrame,
      aLo: String,
      aHi: String,
      b: DataFrame,
      bLo: String,
      bHi: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // empty intervals ([x, y) with y <= x) overlap nothing, but the
    // lo1<hi2 AND lo2<hi1 predicate and the bucket sequence both assume
    // non-empty inputs — drop them up front
    val ab = a.where(col(aLo) < col(aHi)).withColumn("rj_bucket",
      explode(sequence(floor(col(aLo) / bucketWidth).cast("long"),
        floor((col(aHi) - 1) / bucketWidth).cast("long"))))
    val bb = b.where(col(bLo) < col(bHi)).withColumn("rj_bucket",
      explode(sequence(floor(col(bLo) / bucketWidth).cast("long"),
        floor((col(bHi) - 1) / bucketWidth).cast("long"))))
    ab.join(bb, Seq("rj_bucket"))
      .where(col(aLo) < col(bHi) && col(bLo) < col(aHi) &&
        col("rj_bucket") ===
          floor(greatest(col(aLo), col(bLo)) / bucketWidth).cast("long"))
      .drop("rj_bucket")
  }
}
