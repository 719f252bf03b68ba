package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geo functions (degree coordinates) — semantic counterpart of groonga's
  * geo family (/root/reference/lib/geo.c: geo_distance :2313 rectangular +
  * spherical variants, grn_geo_in_circle :999, grn_geo_in_rectangle :1223).
  * groonga stores coordinates in milliseconds-of-arc; this API takes
  * degrees (the natural unit for a DataFrame column) — semantics, not
  * storage, is what is reproduced. All pure Column expressions: codegen'd,
  * no UDFs.
  */
object Geo {
  /** mean earth radius, meters (the sphere groonga's spherical variant uses) */
  final val EarthRadiusM: Double = 6371009.0

  private def rad(deg: Column): Column = deg * math.Pi / 180.0

  /** rectangular (flat) approximation: longitude scaled by cos(mean lat) —
    * geo_distance's default GRN_GEO_APPROXIMATE_RECTANGLE (lib/geo.c:2242) */
  def distanceRect(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dlat = rad(lat2 - lat1)
    val dlon = rad(lon2 - lon1) * cos(rad((lat1 + lat2) / 2.0))
    sqrt(dlat * dlat + dlon * dlon) * EarthRadiusM
  }

  /** great-circle (haversine) distance in meters —
    * GRN_GEO_APPROXIMATE_SPHERE (lib/geo.c:2268) */
  def distanceSphere(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val h = pow(sin(rad(lat2 - lat1) / 2.0), 2.0) +
      cos(rad(lat1)) * cos(rad(lat2)) * pow(sin(rad(lon2 - lon1) / 2.0), 2.0)
    lit(2.0 * EarthRadiusM) * asin(sqrt(h))
  }

  /** grn_geo_in_circle: point within `radiusM` meters of the center
    * (spherical distance) */
  def inCircle(lat: Column, lon: Column, centerLat: Column, centerLon: Column,
      radiusM: Column): Column =
    distanceSphere(lat, lon, centerLat, centerLon) <= radiusM

  /** grn_geo_in_rectangle: point inside the (top-left, bottom-right) box */
  def inRectangle(lat: Column, lon: Column,
      topLat: Column, leftLon: Column, bottomLat: Column, rightLon: Column): Column =
    lat <= topLat && lat >= bottomLat && lon >= leftLon && lon <= rightLon
}
