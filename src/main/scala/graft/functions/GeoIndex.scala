package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geo cell index — the Spark-native analogue of the reference's packed
  * pat-trie geohash scan (grn_geo_in_circle cursor over mesh keys,
  * /root/reference/lib/geo.c:999; grn_geo_in_rectangle :1223; mesh/key
  * packing in lib/geo.h). The reference walks a trie of bit-interleaved
  * (lat, lon) keys and only visits cells overlapping the query shape; the
  * Spark shape of the same idea is:
  *
  *   - a persisted `zcell` column (Z-order / Morton interleave of the
  *     quantized coordinates — a pure codegen'd Column expression),
  *   - the table written SORTED by zcell, so parquet row-group min/max
  *     stats act as the trie: a cell-range predicate prunes row groups
  *     (and, on a partitioned lake, whole partitions) before any I/O,
  *   - query shapes compiled on the driver to a handful of zcell RANGES
  *     (coarse covering cells → contiguous Z ranges, merged), each a
  *     BETWEEN the scan can push down, followed by the exact predicate.
  *
  * At 100 TB of points this turns in_circle/in_rectangle from a full scan
  * into touching only the row groups under the covering cells; the exact
  * verify (haversine / box) runs on that residue only.
  */
object GeoIndex {

  /** quantization bits per dimension: 16 → 32-bit cells, cell side ~600 m
    * in latitude (180° / 65536) — matches the reference's finest mesh
    * levels while keeping the covering arithmetic in cheap Longs */
  final val Bits: Int = 16
  private final val Q: Long = 1L << Bits // 65536

  // ---- column-side (codegen'd arithmetic, no UDFs) -------------------------

  private def clampQ(c: Column): Column =
    greatest(lit(0L), least(lit(Q - 1), c.cast("long")))

  private def latQ(lat: Column): Column = clampQ(floor((lat + 90.0) / 180.0 * Q))
  private def lonQ(lon: Column): Column = clampQ(floor((lon + 180.0) / 360.0 * Q))

  /** spread the low 16 bits of x to even bit positions (Morton helper) */
  private def spread(x: Column): Column = {
    val a = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    val b = (a.bitwiseOR(shiftleft(a, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val c = (b.bitwiseOR(shiftleft(b, 2))).bitwiseAND(lit(0x33333333L))
    (c.bitwiseOR(shiftleft(c, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Z-order cell id for a (lat, lon) degree pair: lat bits even, lon odd */
  def zcell(lat: Column, lon: Column): Column =
    spread(latQ(lat)).bitwiseOR(shiftleft(spread(lonQ(lon)), 1)).as("zcell")

  // ---- driver-side covering (same math, scalar) ----------------------------

  private def clampQ(v: Long): Long = math.max(0L, math.min(Q - 1, v))
  private def latQ(lat: Double): Long = clampQ(math.floor((lat + 90.0) / 180.0 * Q).toLong)
  private def lonQ(lon: Double): Long = clampQ(math.floor((lon + 180.0) / 360.0 * Q).toLong)

  private def spread(x0: Long): Long = {
    var x = x0
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** scalar zcell — must stay bit-identical to the Column variant */
  def zcellOf(lat: Double, lon: Double): Long =
    spread(latQ(lat)) | (spread(lonQ(lon)) << 1)

  /** Cover the quantized bbox with coarse cells at the deepest level whose
    * cell count stays ≤ maxCells, then emit each coarse cell as its
    * CONTIGUOUS full-precision Z range (a level-L cell's children share its
    * bit prefix — exactly the trie-descent property the reference's pat
    * cursor exploits), merging adjacent ranges. */
  def coverRanges(minLat: Double, maxLat: Double, minLon: Double, maxLon: Double,
      maxCells: Int = 64): Seq[(Long, Long)] = {
    val (lo0, hi0) = (latQ(math.min(minLat, maxLat)), latQ(math.max(minLat, maxLat)))
    val (lo1, hi1) = (lonQ(math.min(minLon, maxLon)), lonQ(math.max(minLon, maxLon)))
    // deepest level whose covering stays small: at level L (L bits/dim) a
    // cell spans 2^(Bits-L) quantized units
    var level = Bits
    def cellsAt(l: Int): Long = {
      val s = Bits - l
      ((hi0 >> s) - (lo0 >> s) + 1) * ((hi1 >> s) - (lo1 >> s) + 1)
    }
    while (level > 0 && cellsAt(level) > maxCells) level -= 1
    val s = Bits - level
    val ranges = for {
      i <- (lo0 >> s) to (hi0 >> s)
      j <- (lo1 >> s) to (hi1 >> s)
    } yield {
      // children of a level-L cell occupy one contiguous Z block: the cell's
      // interleaved (i, j) prefix followed by 2*s free bits
      val base = interleaveAt(i, j, level) << (2 * s)
      (base, base + (1L << (2 * s)) - 1)
    }
    val sorted = ranges.sortBy(_._1)
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    sorted.foreach { case (a, b) =>
      if (merged.nonEmpty && a <= merged.last._2 + 1)
        merged(merged.length - 1) = (merged.last._1, math.max(merged.last._2, b))
      else merged += ((a, b))
    }
    merged.toSeq
  }

  /** interleave the low `bits` bits of (a even, b odd) */
  private def interleaveAt(a: Long, b: Long, bits: Int): Long = {
    var out = 0L
    var k = 0
    while (k < bits) {
      out |= ((a >> k) & 1L) << (2 * k)
      out |= ((b >> k) & 1L) << (2 * k + 1)
      k += 1
    }
    out
  }

  /** OR of BETWEEN predicates over the cell column — every leg is a plain
    * range comparison the parquet scan pushes down (PushedFilters), so
    * sorted-by-zcell files prune row groups before decode */
  def cellPredicate(cellCol: Column, ranges: Seq[(Long, Long)]): Column =
    ranges.map { case (a, b) => cellCol.between(a, b) }.reduce(_ || _)

  /** meters → degrees latitude (exact on the sphere) */
  private def latDegrees(radiusM: Double): Double =
    radiusM * 180.0 / (math.Pi * Geo.EarthRadiusM)

  /** Indexed in_circle: zcell range prefilter (covering the circle's bbox)
    * + exact haversine verify. `cellCol` must hold zcell(latCol, lonCol).
    * Safe near poles / the antimeridian: the lon span degrades to the full
    * range (less pruning, never a lost match). */
  def inCircleIndexed(df: DataFrame, latCol: Column, lonCol: Column, cellCol: Column,
      centerLat: Double, centerLon: Double, radiusM: Double,
      maxCells: Int = 64): DataFrame = {
    val dLat = latDegrees(radiusM)
    val (minLat, maxLat) = (centerLat - dLat, centerLat + dLat)
    // widest |lat| in the band dictates the lon span; blow up → full span
    val maxAbsLat = math.min(89.9999, math.max(math.abs(minLat), math.abs(maxLat)))
    val cosLat = math.cos(math.toRadians(maxAbsLat))
    val dLon = if (cosLat < 1e-6) 360.0 else dLat / cosLat
    val (minLon, maxLon) =
      if (dLon >= 180.0 || centerLon - dLon < -180.0 || centerLon + dLon > 180.0)
        (-180.0, 180.0) // wraps: cover all longitudes (lat band still prunes)
      else (centerLon - dLon, centerLon + dLon)
    val ranges = coverRanges(math.max(-90.0, minLat), math.min(90.0, maxLat),
      minLon, maxLon, maxCells)
    df.where(cellPredicate(cellCol, ranges))
      .where(Geo.inCircle(latCol, lonCol, lit(centerLat), lit(centerLon), lit(radiusM)))
  }

  /** Indexed in_rectangle: zcell ranges covering the box + exact verify */
  def inRectangleIndexed(df: DataFrame, latCol: Column, lonCol: Column, cellCol: Column,
      topLat: Double, leftLon: Double, bottomLat: Double, rightLon: Double,
      maxCells: Int = 64): DataFrame = {
    val ranges = coverRanges(bottomLat, topLat, leftLon, rightLon, maxCells)
    df.where(cellPredicate(cellCol, ranges))
      .where(Geo.inRectangle(latCol, lonCol,
        lit(topLat), lit(leftLon), lit(bottomLat), lit(rightLon)))
  }

  /** Persist a point table as a geo-indexed parquet dir: zcell appended and
    * the data RANGE-partitioned + sorted by it, so each file covers a narrow
    * cell band and row-group min/max stats line up with cell ranges. On a
    * real lake, partitionBy on a zcell prefix would add directory-level
    * pruning; range partitioning keeps the small-scale layout identical. */
  def writeGeoTable(points: DataFrame, latCol: String, lonCol: String,
      path: String, numFiles: Int = 0): Unit = {
    val withCell = points.withColumn("zcell", zcell(col(latCol), col(lonCol)))
    val parted =
      if (numFiles > 0) withCell.repartitionByRange(numFiles, col("zcell"))
      else withCell.repartitionByRange(col("zcell"))
    parted.sortWithinPartitions("zcell").write.mode("overwrite").parquet(path)
  }
}
