package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geospatial basics (beyond-parity): great-circle distance and the
  * grid-bucketed "pairs within radius" self-join — the two primitives
  * store-locator, delivery-radius, and geo-dedup questions reduce to.
  *
  * Scale shape: the radius join NEVER cross-joins — each point lands
  * in its grid cell plus the 8 neighbors (a constant ×9 blowup), the
  * self-join shuffles on the cell key, and exact haversine filters
  * candidates. With `cellDeg` ≥ the radius in degrees (see the
  * latitude guard) the 3×3 neighborhood provably covers every
  * qualifying pair, so the output equals the all-pairs answer an
  * oracle computes the expensive way. Poles and the antimeridian are
  * out of contract (|lat| ≤ 60 enforced) — production geo engines
  * special-case both; the grid pattern itself is what scales.
  */
object Geo {

  private val earthRadiusKm = 6371.0088 // IUGG mean

  /** Great-circle distance in km (haversine form — numerically stable
    * at small angles where the spherical law of cosines loses every
    * digit). Squares via explicit multiply; only correctly-rounded /
    * cross-engine-stable libm calls (sin, cos, asin, sqrt). */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column,
      lon2: Column): Column = {
    val sLat = sin(radians(lat2 - lat1) / 2)
    val sLon = sin(radians(lon2 - lon1) / 2)
    val a = sLat * sLat +
      cos(radians(lat1)) * cos(radians(lat2)) * sLon * sLon
    lit(2 * earthRadiusKm) * asin(sqrt(a))
  }

  /** All point pairs within `radiusKm`, by grid bucketing: one row
    * per (id_a < id_b) pair with the rounded distance. `cellDeg` must
    * make one cell at least as wide as the WORST-CASE Δlon of a
    * radius-r pair at |lat| ≤ 60 — computed EXACTLY as
    * Δlon = degrees(2·asin(sin(r/2R)/cos 60°)) (both endpoints on the
    * 60° parallel maximize the longitude gap; a linear km-per-degree
    * constant understates this above ~800 km, which round-6 review
    * caught) — so a qualifying pair is never more than one cell apart
    * on either axis. Longitudes must also stay `cellDeg` away from
    * the antimeridian (cells don't wrap at ±180; enforced loudly like
    * the latitude contract). */
  def pairsWithinKm(df: DataFrame, idCol: String, latCol: String,
      lonCol: String, radiusKm: Double, cellDeg: Double): DataFrame = {
    require(radiusKm > 0 && cellDeg > 0, s"radius=$radiusKm cell=$cellDeg")
    require(radiusKm <= math.Pi * earthRadiusKm,
      s"radius $radiusKm exceeds half the great circle")
    // bound computed for radius + 1e-3 km (the round(dist,3) output
    // window can admit pairs a half-millimeter-km past radiusKm) and
    // required with 0.1% slack — equality with zero margin would let
    // a boundary-straddling pair land two columns apart
    val worstDlonDeg = math.toDegrees(
      2.0 * math.asin(math.min(1.0,
        math.sin((radiusKm + 1e-3) / (2.0 * earthRadiusKm)) /
          math.cos(math.toRadians(60.0))))) * 1.001
    require(cellDeg >= worstDlonDeg,
      s"cellDeg $cellDeg too fine for radius $radiusKm km at |lat| <= 60 " +
        s"(worst-case delta-lon with margin is $worstDlonDeg deg; needs >= that)")
    val guarded = df.select(col(idCol).as("id"),
      col(latCol).cast("double").as("lat"),
      col(lonCol).cast("double").as("lon"))
      // NULL coordinates pass through (they never join — null grid
      // keys match nothing — matching the operator's long-standing
      // sparse-data behavior); non-null violations fail loudly
      .withColumn("lat",
        when(col("lat").isNull || abs(col("lat")) <= 60.0, col("lat"))
          .otherwise(raise_error(concat(
            lit("pairsWithinKm: |lat| <= 60 contract violated: "),
            col("lat").cast("string")))))
      // cells don't wrap at the antimeridian: a pair straddling +/-180
      // would land in non-adjacent columns and be silently missed —
      // fail loudly instead (same contract style as the lat guard)
      .withColumn("lon",
        when(col("lon").isNull || abs(col("lon")) <= 180.0 - cellDeg,
          col("lon"))
          .otherwise(raise_error(concat(
            lit(s"pairsWithinKm: |lon| <= ${180.0 - cellDeg} contract " +
              "violated (antimeridian margin of one cell): "),
            col("lon").cast("string")))))
    val cellR = floor(col("lat") / cellDeg).cast("long")
    val cellC = floor(col("lon") / cellDeg).cast("long")
    // left side fans out to its 3x3 neighborhood; right side stays in
    // its own cell -> a pair meets exactly once per direction (in the
    // HOME cell of the right point), and the id_a < id_b cut keeps
    // one direction — output is duplicate-free with no distinct
    val fan = guarded.select(col("id"), col("lat"), col("lon"),
      explode(array((for (dr <- -1 to 1; dc <- -1 to 1)
        yield struct((cellR + dr).as("r"), (cellC + dc).as("c"))): _*))
        .as("cell"))
      .select(col("id"), col("lat"), col("lon"),
        col("cell.r").as("r"), col("cell.c").as("c"))
    val home = guarded.select(col("id").as("id_b"),
      col("lat").as("lat_b"), col("lon").as("lon_b"),
      cellR.as("r"), cellC.as("c"))
    fan.join(home, Seq("r", "c"))
      .filter(col("id") < col("id_b"))
      .select(col("id").as("id_a"), col("id_b"),
        round(haversineKm(col("lat"), col("lon"),
          col("lat_b"), col("lon_b")), 3).as("dist_km"))
      .filter(col("dist_km") <= radiusKm)
  }
}
