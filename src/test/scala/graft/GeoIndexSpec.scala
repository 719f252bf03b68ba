package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{Geo, GeoIndex}

/** Geo cell index: scalar/Column zcell agreement, covering-range soundness
  * (indexed results == brute-force exact filter, including pole /
  * antimeridian shapes), and the plan-shape guarantee that the cell
  * prefilter reaches the parquet scan as pushed range predicates. */
class GeoIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic point cloud: dense mid-latitudes + polar + antimeridian edges
  private def points = {
    val rnd = new scala.util.Random(42)
    (0 until 4000).map { i =>
      val lat = if (i % 97 == 0) 89.0 + rnd.nextDouble() else rnd.nextDouble() * 180.0 - 90.0
      val lon = if (i % 53 == 0) 179.5 + rnd.nextDouble() else rnd.nextDouble() * 360.0 - 180.0
      (i.toLong, lat, math.min(180.0, lon))
    }
  }
  private lazy val df = points.toDF("id", "lat", "lon")
    .withColumn("zcell", GeoIndex.zcell(col("lat"), col("lon")))

  test("scalar zcellOf is bit-identical to the Column expression") {
    val rows = df.select($"lat", $"lon", $"zcell").collect()
    for (r <- rows)
      assert(GeoIndex.zcellOf(r.getDouble(0), r.getDouble(1)) == r.getLong(2))
  }

  test("cover ranges contain every point of the bbox they cover") {
    val cases = Seq((10.0, 20.0, 30.0, 40.0), (-90.0, -80.0, -180.0, 180.0),
      (59.9, 60.1, 179.0, 180.0), (-0.5, 0.5, -0.5, 0.5))
    for ((la, lb, lo, lhi) <- cases) {
      val ranges = GeoIndex.coverRanges(la, lb, lo, lhi)
      assert(ranges.nonEmpty && ranges.size <= 64)
      // every in-bbox point's cell falls inside some range
      for (p <- points if p._2 >= la && p._2 <= lb && p._3 >= lo && p._3 <= lhi) {
        val z = GeoIndex.zcellOf(p._2, p._3)
        assert(ranges.exists { case (a, b) => z >= a && z <= b },
          s"point $p cell $z escaped covering of ($la,$lb,$lo,$lhi)")
      }
    }
  }

  test("indexed in_circle == exact filter (incl. pole + antimeridian)") {
    val circles = Seq((35.0, 139.0, 500000.0), (89.5, 10.0, 300000.0),
      (0.0, 179.9, 800000.0), (-45.0, -170.0, 2000000.0))
    for ((clat, clon, r) <- circles) {
      val brute = df.where(Geo.inCircle($"lat", $"lon", lit(clat), lit(clon), lit(r)))
        .select($"id").as[Long].collect().sorted.toSeq
      val indexed = GeoIndex.inCircleIndexed(df, $"lat", $"lon", $"zcell", clat, clon, r)
        .select($"id").as[Long].collect().sorted.toSeq
      assert(indexed == brute, s"circle ($clat,$clon,$r)")
    }
  }

  test("indexed in_rectangle == exact filter") {
    val boxes = Seq((50.0, 100.0, 0.0, 160.0), (90.0, -180.0, 80.0, 180.0),
      (10.0, -10.0, -10.0, 10.0))
    for ((top, left, bottom, right) <- boxes) {
      val brute = df.where(Geo.inRectangle($"lat", $"lon",
          lit(top), lit(left), lit(bottom), lit(right)))
        .select($"id").as[Long].collect().sorted.toSeq
      val indexed = GeoIndex.inRectangleIndexed(df, $"lat", $"lon", $"zcell",
          top, left, bottom, right)
        .select($"id").as[Long].collect().sorted.toSeq
      assert(indexed == brute, s"box ($top,$left,$bottom,$right)")
    }
  }

  test("cell prefilter reaches the parquet scan (pushed, prunable ranges)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-geo").toString + "/pts"
    GeoIndex.writeGeoTable(points.toDF("id", "lat", "lon"), "lat", "lon", dir, numFiles = 8)
    val stored = spark.read.parquet(dir)
    val q = GeoIndex.inCircleIndexed(stored, col("lat"), col("lon"), col("zcell"),
      35.0, 139.0, 500000.0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("zcell"),
      s"zcell ranges must be pushed to the scan:\n$plan")
    // and the filter actually restricts: matches the brute-force result
    val brute = spark.read.parquet(dir)
      .where(Geo.inCircle(col("lat"), col("lon"), lit(35.0), lit(139.0), lit(500000.0)))
      .select(col("id")).as[Long].collect().sorted.toSeq
    assert(q.select(col("id")).as[Long].collect().sorted.toSeq == brute)
  }
}
