package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class GeoSpec extends SparkTestBase {
  import spark.implicits._

  test("haversine matches known city distances within rounding") {
    // Paris (48.8566, 2.3522) -> London (51.5074, -0.1278): ~343.5 km
    val d = Seq((48.8566, 2.3522, 51.5074, -0.1278))
      .toDF("a", "b", "c", "d")
      .select(Geo.haversineKm($"a", $"b", $"c", $"d"))
      .first().getDouble(0)
    assert(math.abs(d - 343.5) < 1.0)
    // zero distance and symmetry
    val z = Seq((10.0, 20.0)).toDF("la", "lo")
      .select(Geo.haversineKm($"la", $"lo", $"la", $"lo"),
        Geo.haversineKm($"la", $"lo", lit(11.0), lit(21.0)),
        Geo.haversineKm(lit(11.0), lit(21.0), $"la", $"lo"))
      .first()
    assert(z.getDouble(0) == 0.0)
    assert(math.abs(z.getDouble(1) - z.getDouble(2)) < 1e-9)
  }

  test("pairsWithinKm equals the brute-force answer on a planted cluster") {
    val pts = Seq(
      (1L, 10.0, 10.0), (2L, 10.05, 10.05), (3L, 10.1, 10.0), // ~7km triangle
      (4L, 12.0, 10.0),                                        // ~222km away
      (5L, 59.0, 100.0), (6L, 59.0, 100.1))                    // high-lat pair
      .toDF("id", "lat", "lon")
    val out = Geo.pairsWithinKm(pts, "id", "lat", "lon",
      radiusKm = 25.0, cellDeg = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L), (1L, 3L), (2L, 3L), (5L, 6L)))
    // contract guards: cell too fine for the radius; latitude bound
    intercept[IllegalArgumentException](
      Geo.pairsWithinKm(pts, "id", "lat", "lon", 100.0, 0.5))
    intercept[Exception] {
      Geo.pairsWithinKm(Seq((1L, 75.0, 0.0), (2L, 75.0, 0.1))
        .toDF("id", "lat", "lon"), "id", "lat", "lon", 25.0, 0.5).collect()
    }
  }
}
