package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TileFunctions
import graft.functions.TileFunctions.{Sql => T}
import graft.queries.HeatmapQueries.{latCol, lonCol, latSql, lonSql, sourceFilter, sourceFilterSql}
import graft.tiles.TileMath

/** Geospatial analysis over the event stream — the query family a heatmap
  * store grows into once "how many points per tile" is answered: distances
  * along a user's track, nearest-events lookup, and hotspot detection.
  *
  * Scale shapes:
  *   - haversine runs as ONE window pass per user partition (the shuffle key
  *     is user_id; no self-join);
  *   - knn prunes with the SAME grid the heatmap store is keyed by (a 3×3
  *     tile block around the query point) before any distance math, then
  *     top-k's via TakeOrderedAndProject — never a global sort, never a
  *     full-corpus distance evaluation;
  *   - hotspots is two integer hash aggregations and a self-join on tile
  *     keys — no float in any grouping key.
  *
  * Float determinism: distances floor to whole meters on both engines from
  * identical IEEE double inputs; the only cross-engine risk is a last-ulp
  * difference inside sin/cos/asin, which would need to land within ~1e-7 m
  * of a floor boundary to flip a value (same argument as the Gudermannian
  * in hm_tile_bounds, which holds at both gate SFs). All sub-expressions
  * are kept textually parallel between the Column and SQL forms — squares
  * as explicit products (x*x), never pow().
  */
object GeoQueries {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")

  /** floor-to-meters haversine between (lat1,lon1) and (lat2,lon2). */
  private def haversineM(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val sdp = sin(radians(lat2 - lat1) / lit(2.0))
    val sdl = sin(radians(lon2 - lon1) / lit(2.0))
    val a = sdp * sdp + cos(radians(lat1)) * cos(radians(lat2)) * sdl * sdl
    floor(lit(2.0) * lit(6371000.0) * asin(sqrt(least(lit(1.0), a)))).cast("long")
  }

  private def haversineSqlM(lat1: String, lon1: String, lat2: String, lon2: String): String =
    s"""CAST(FLOOR(2.0 * 6371000.0 * ASIN(SQRT(LEAST(1.0,
       |  SIN(RADIANS(($lat2) - ($lat1))/2.0) * SIN(RADIANS(($lat2) - ($lat1))/2.0)
       |  + COS(RADIANS($lat1)) * COS(RADIANS($lat2))
       |    * SIN(RADIANS(($lon2) - ($lon1))/2.0) * SIN(RADIANS(($lon2) - ($lon1))/2.0))))) AS BIGINT)""".stripMargin

  /** Distance travelled between a user's consecutive points: one window
    * pass keyed by user (lag of lat/lon over event time), haversine to
    * whole meters. The 100 TB shape: the shuffle is the window's
    * partitionBy(user_id) — no self-join, no global sort. */
  val geoHaversine = QuerySpec(
    "geo_haversine",
    "per-user consecutive-point haversine distance (floored meters)",
    Some(s"""WITH pts AS (
            |  SELECT user_id, event_id, ts, $latSql AS lat, $lonSql AS lon
            |  FROM events WHERE $sourceFilterSql),
            |lagged AS (
            |  SELECT user_id, event_id, lat, lon,
            |    LAG(lat) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS plat,
            |    LAG(lon) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS plon
            |  FROM pts)
            |SELECT user_id, event_id,
            |  ${haversineSqlM("plat", "plon", "lat", "lon")} AS dist_m
            |FROM lagged WHERE plat IS NOT NULL
            |ORDER BY user_id, event_id""".stripMargin),
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(s, dir)
        .filter(sourceFilter)
        .select(col("user_id"), col("event_id"), col("ts"),
          latCol.as("lat"), lonCol.as("lon"))
        .withColumn("plat", lag("lat", 1).over(w))
        .withColumn("plon", lag("lon", 1).over(w))
        .filter(col("plat").isNotNull)
        .select(col("user_id"), col("event_id"),
          haversineM(col("plat"), col("plon"), col("lat"), col("lon")).as("dist_m"))
        .orderBy("user_id", "event_id")
    })

  /** knn query point + grid: San Francisco-ish, zoom-6 cells. */
  private val QLat = 37.7
  private val QLon = -122.4
  private val KnnZoom = 6
  private val KnnK = 25
  private val qRow = TileMath.rowFromLatitude(QLat, KnnZoom)
  private val qCol = TileMath.columnFromLongitude(QLon, KnnZoom)

  /** k nearest events to a fixed point. The candidate set is BY CONTRACT the
    * 3×3 block of zoom-6 tiles around the query point's cell — the same
    * grid-prune a tile-keyed store serves from its index (the oracle states
    * the identical contract, so the gate proves prune + rank, not
    * approximate recall). Distance math runs only on the pruned candidates;
    * the k cut is TakeOrderedAndProject (PlanSpec-pinned pattern), never a
    * global sort. */
  val geoKnn = QuerySpec(
    "geo_knn",
    s"$KnnK nearest events to a fixed point within its 3x3 zoom-$KnnZoom tile block",
    Some(s"""WITH pts AS (
            |  SELECT user_id, event_id, $latSql AS lat, $lonSql AS lon
            |  FROM events WHERE $sourceFilterSql),
            |cand AS (
            |  SELECT * FROM pts
            |  WHERE ${T.tileRow("lat", KnnZoom)} BETWEEN ${qRow - 1} AND ${qRow + 1}
            |    AND ${T.tileCol("lon", KnnZoom)} BETWEEN ${qCol - 1} AND ${qCol + 1})
            |SELECT event_id, user_id,
            |  ${haversineSqlM(QLat.toString, QLon.toString, "lat", "lon")} AS dist_m
            |FROM cand ORDER BY dist_m, event_id LIMIT $KnnK""".stripMargin),
    (s, dir) =>
      events(s, dir)
        .filter(sourceFilter)
        .select(col("user_id"), col("event_id"), latCol.as("lat"), lonCol.as("lon"))
        .filter(TileFunctions.tileRow(col("lat"), KnnZoom).between(qRow - 1, qRow + 1) &&
          TileFunctions.tileCol(col("lon"), KnnZoom).between(qCol - 1, qCol + 1))
        .select(col("event_id"), col("user_id"),
          haversineM(lit(QLat), lit(QLon), col("lat"), col("lon")).as("dist_m"))
        .orderBy("dist_m", "event_id")
        .limit(KnnK))

  private val HotZoom = 6
  private val HotThreshold = 6L

  /** Hotspot detection: for every OCCUPIED zoom-6 cell, the 3×3
    * box-sum of event counts centered on it; cells at/above the threshold
    * are hotspots. Entirely integer after the one Mercator quantization —
    * two hash aggregations plus an equi-join on (r, c); the neighbor fan
    * is a 9× explode of the (small) aggregated cell table, never of raw
    * events. */
  val geoHotspots = QuerySpec(
    "geo_hotspots",
    s"zoom-$HotZoom cells whose 3x3 neighborhood density >= $HotThreshold",
    Some(s"""WITH base AS (
            |  SELECT $latSql AS lat, $lonSql AS lon
            |  FROM events WHERE $sourceFilterSql),
            |cells AS (
            |  SELECT ${T.tileRow("lat", HotZoom)} AS r, ${T.tileCol("lon", HotZoom)} AS c,
            |    CAST(COUNT(*) AS BIGINT) AS cnt
            |  FROM base GROUP BY 1, 2),
            |box AS (
            |  SELECT cl.r + dr.x AS r, cl.c + dc.x AS c,
            |    CAST(SUM(cnt) AS BIGINT) AS density
            |  FROM cells cl,
            |    (SELECT UNNEST(GENERATE_SERIES(-1, 1)) AS x) dr,
            |    (SELECT UNNEST(GENERATE_SERIES(-1, 1)) AS x) dc
            |  GROUP BY 1, 2)
            |SELECT CONCAT_WS('_', $HotZoom, cl.r, cl.c) AS tile_id, cl.cnt, b.density
            |FROM cells cl JOIN box b ON cl.r = b.r AND cl.c = b.c
            |WHERE b.density >= $HotThreshold
            |ORDER BY tile_id""".stripMargin),
    (s, dir, scope) => {
      // persisted (scope-owned): cells feeds BOTH the 9× box fan-out and
      // the final join — without the cache the events scan + aggregation
      // runs twice (same convention as TriangleCount's `oriented`)
      val cells = scope.track(events(s, dir)
        .filter(sourceFilter)
        .groupBy(TileFunctions.tileRow(latCol, HotZoom).as("r"),
          TileFunctions.tileCol(lonCol, HotZoom).as("c"))
        .agg(count(lit(1)).as("cnt")))
      val box = cells
        .withColumn("dr", explode(array(lit(-1L), lit(0L), lit(1L))))
        .withColumn("dc", explode(array(lit(-1L), lit(0L), lit(1L))))
        .groupBy((col("r") + col("dr")).as("r"), (col("c") + col("dc")).as("c"))
        .agg(sum(col("cnt")).as("density"))
      cells.join(box, Seq("r", "c"))
        .filter(col("density") >= HotThreshold)
        .select(concat_ws("_", lit(HotZoom), col("r"), col("c")).as("tile_id"),
          col("cnt"), col("density"))
        .orderBy("tile_id")
    })

  private val DbZoom = 6
  private val DbP = 1L << DbZoom // grid width; cell id = r * DbP + c
  private val DbMinPts = 6L

  /** Grid DBSCAN — density clustering at cell resolution (the GriDBSCAN /
    * grid-approximation family): CORE cells hold >= MinPts points, core
    * cells connected through 8-neighbor adjacency form one cluster
    * (labeled by the component's minimum cell id), and occupied non-core
    * cells adjacent to a core cell join as BORDER mass (ties to the
    * MINIMUM adjacent cluster — classic DBSCAN leaves border assignment
    * order-dependent; the grid form makes it deterministic, so it can sit
    * under a hash gate). Longitude does NOT wrap at the antimeridian —
    * straight grid adjacency, stated identically in the oracle.
    *
    * Scale shape: the ONLY corpus-sized work is the one cell aggregation
    * (map-side combined, integer keys — the heatmap shuffle). Everything
    * downstream — the 8-offset explode, the core-core equi-join, the
    * large-star/small-star components, border assignment — runs on the
    * OCCUPIED-CELL table, bounded by 4^zoom and in practice by data
    * density; adjacency is an equi-join on exploded (r+dr, c+dc) keys,
    * never a distance predicate. Same shape at zoom 16 over 100 TB: the
    * cell table is the working set, and it contracts before the
    * iteration does. */
  val geoDbscan = QuerySpec(
    "geo_dbscan",
    s"grid DBSCAN at zoom $DbZoom: core cells >= $DbMinPts pts, 8-neighbor components + border mass",
    Some(s"""WITH RECURSIVE base AS (
            |  SELECT ${T.tileRow(latSql, DbZoom)} AS r, ${T.tileCol(lonSql, DbZoom)} AS c,
            |    CAST(COUNT(*) AS BIGINT) AS n
            |  FROM events WHERE $sourceFilterSql GROUP BY 1, 2),
            |core AS (SELECT r * $DbP + c AS id, r, c, n FROM base WHERE n >= $DbMinPts),
            |e AS (SELECT a.id AS src, b.id AS dst FROM core a JOIN core b
            |  ON ABS(a.r - b.r) <= 1 AND ABS(a.c - b.c) <= 1),
            |reach(src, dst) AS (SELECT src, dst FROM e
            |  UNION SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src),
            |lab AS (SELECT src AS id, CAST(MIN(dst) AS BIGINT) AS cluster_id
            |  FROM reach GROUP BY 1),
            |ca AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_core_cells,
            |    CAST(SUM(n) AS BIGINT) AS core_points
            |  FROM lab JOIN core USING (id) GROUP BY 1),
            |bo AS (SELECT b.r, b.c, MIN(b.n) AS n, MIN(l.cluster_id) AS cluster_id
            |  FROM base b JOIN core k
            |    ON ABS(b.r - k.r) <= 1 AND ABS(b.c - k.c) <= 1
            |  JOIN lab l ON l.id = k.id
            |  WHERE b.n < $DbMinPts GROUP BY 1, 2),
            |ba AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_border_cells,
            |    CAST(SUM(n) AS BIGINT) AS border_points
            |  FROM bo GROUP BY 1)
            |SELECT ca.cluster_id,
            |  CONCAT_WS('_', $DbZoom, ca.cluster_id // $DbP, ca.cluster_id % $DbP) AS tile_id,
            |  ca.n_core_cells, ca.core_points,
            |  CAST(COALESCE(ba.n_border_cells, 0) AS BIGINT) AS n_border_cells,
            |  CAST(COALESCE(ba.border_points, 0) AS BIGINT) AS border_points
            |FROM ca LEFT JOIN ba USING (cluster_id)
            |ORDER BY cluster_id""".stripMargin),
    (s, dir, scope) => {
      // persisted (scope-owned): the cell table feeds core selection, the
      // adjacency fan-out, AND border assignment — one events scan total.
      // The clustering laws themselves live in operators.GridDbscan
      // (planted-grid tested); this entry contributes the Mercator cell
      // aggregation and the tile-id presentation.
      val cells = scope.track(events(s, dir)
        .filter(sourceFilter)
        .groupBy(TileFunctions.tileRow(latCol, DbZoom).cast("long").as("r"),
          TileFunctions.tileCol(lonCol, DbZoom).cast("long").as("c"))
        .agg(count(lit(1)).as("n")))
      graft.operators.GridDbscan.cluster(cells, DbP, DbMinPts, scope)
        .select(col("cluster_id"),
          concat_ws("_", lit(DbZoom), expr(s"cluster_id div $DbP"),
            col("cluster_id") % DbP).as("tile_id"),
          col("n_core_cells"), col("core_points"),
          col("n_border_cells"), col("border_points"))
        .orderBy("cluster_id")
    })

  val all: Seq[QuerySpec] = Seq(geoHaversine, geoKnn, geoHotspots, geoDbscan)
}
