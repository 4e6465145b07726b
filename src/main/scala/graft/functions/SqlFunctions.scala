package graft.functions

import graft.core.{AreaDef, Ellipsoid}
import org.apache.spark.sql.SparkSession

/** SQL-surface registration: exposes the engine's scalar functions to
  * `spark.sql(...)` users (the reference's public function surface, §2.8,
  * reachable from SQL text). DataFrame-API callers should prefer the
  * codegen'd Column forms in [[GeoFunctions]]/[[ProjectExpr]]; these
  * registrations are the SQL-text convenience layer. Call once per session.
  */
object SqlFunctions {

  def register(spark: SparkSession, areas: Map[String, AreaDef] = Map.empty): Unit = {
    val R = Ellipsoid.R

    spark.udf.register("haversine_m",
      (lon1: Double, lat1: Double, lon2: Double, lat2: Double) => {
        val dLat = math.toRadians(lat2) - math.toRadians(lat1)
        val dLon = math.toRadians(lon2) - math.toRadians(lon1)
        val a = math.pow(math.sin(dLat / 2), 2) +
          math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
            math.pow(math.sin(dLon / 2), 2)
        2.0 * R * math.asin(math.min(1.0, math.sqrt(a)))
      })

    spark.udf.register("wrap_lon",
      (lon: Double) => lon - 360.0 * math.floor((lon + 180.0) / 360.0))

    spark.udf.register("lonlat2x", (lon: Double, lat: Double) =>
      math.cos(math.toRadians(lat)) * math.cos(math.toRadians(lon)) * R)
    spark.udf.register("lonlat2y", (lon: Double, lat: Double) =>
      math.cos(math.toRadians(lat)) * math.sin(math.toRadians(lon)) * R)
    spark.udf.register("lonlat2z", (lat: Double) => math.sin(math.toRadians(lat)) * R)

    spark.udf.register("cosine_sim", (a: Seq[Double], b: Seq[Double]) => {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    })

    // per-area: <name>_cell(lon, lat) -> flat cell id (-1 outside),
    // <name>_fwd_x/_fwd_y(lon, lat) -> projected coordinates
    areas.foreach { case (name, area) =>
      spark.udf.register(s"${name}_cell", (lon: Double, lat: Double) => {
        val (x, y) = area.crs.forward(lon, lat)
        if (x.isNaN || y.isNaN) -1L else area.cellOf(x, y)
      })
      spark.udf.register(s"${name}_fwd_x", (lon: Double, lat: Double) => area.crs.forward(lon, lat)._1)
      spark.udf.register(s"${name}_fwd_y", (lon: Double, lat: Double) => area.crs.forward(lon, lat)._2)
    }
  }
}
