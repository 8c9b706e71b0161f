package graft.tiles

/** Pure-Scala Web-Mercator ("slippy map") tile math.
  *
  * Re-expresses the semantics of the reference's `tile.py` (tile.py:8–98):
  * a tile is addressed `"{zoom}_{row}_{column}"` (tile.py:56–58); forward
  * quantization uses the OSM slippy-map formulas (tile.py:16–21), inverse uses
  * the Gudermannian (tile.py:24–30).
  *
  * Differences from the reference, by design:
  *   - `parent`/`ancestors` use exact integer arithmetic (`row >> 1`) rather
  *     than the reference's re-quantization of the tile center
  *     (tile.py:60–64); the two agree for every well-formed tile and the
  *     integer form is exact, branch-free, and SQL-expressible.
  *   - `floor` is floor-toward-negative-infinity (as in Python), NOT integer
  *     cast truncation — they differ for negative inputs (tile.py:17,21).
  *
  * Zero Spark dependencies: usable from typed Dataset code, UDFs, and tests.
  */
object TileMath {

  /** Reference constants (tile.py:5–6, heatmap.py:16–17). */
  val MaxZoom   = 16
  val MinZoom   = 0
  /** Fine-detail zoom delta: content tiles sit this many zooms below their
    * "result set" tile (heatmap.py:17, 89). */
  val DetailZoomDelta = 5
  /** The job's effective fine zoom: MaxZoom + DetailZoomDelta (heatmap.py:27). */
  val FineZoom = MaxZoom + DetailZoomDelta

  /** Web-Mercator is defined on |lat| <= ~85.0511 (atan(sinh(pi))). */
  val MaxLatitude: Double = math.toDegrees(math.atan(math.sinh(math.Pi)))

  /** Mercator Y → tile row (tile.py:16–17). */
  def rowFromLatitude(lat: Double, zoom: Int): Long = {
    val r = math.toRadians(lat)
    math.floor(
      (1.0 - math.log(math.tan(r) + 1.0 / math.cos(r)) / math.Pi) / 2.0 * (1L << zoom)
    ).toLong
  }

  /** Longitude → tile column (tile.py:20–21). */
  def columnFromLongitude(lon: Double, zoom: Int): Long =
    math.floor((lon + 180.0) / 360.0 * (1L << zoom)).toLong

  /** Inverse Mercator: row → its north-edge latitude (tile.py:24–26). */
  def latitudeFromRow(row: Long, zoom: Int): Double = {
    val n = math.Pi - 2.0 * math.Pi * row / (1L << zoom)
    math.toDegrees(math.atan(0.5 * (math.exp(n) - math.exp(-n))))
  }

  /** Column → its west-edge longitude (tile.py:29–30). */
  def longitudeFromColumn(column: Long, zoom: Int): Double =
    column.toDouble / (1L << zoom) * 360.0 - 180.0

  /** `"z_row_col"` id (tile.py:56–58). */
  def tileIdFromRowColumn(row: Long, column: Long, zoom: Int): String =
    s"${zoom}_${row}_${column}"

  /** lat/lon → tile id at `zoom` (tile.py:8–13). */
  def tileIdFromLatLon(lat: Double, lon: Double, zoom: Int): String =
    tileIdFromRowColumn(rowFromLatitude(lat, zoom), columnFromLongitude(lon, zoom), zoom)

  /** A materialized tile with bounds and center (tile.py:38–52). */
  final case class Tile(zoom: Int, row: Long, column: Long) {
    def id: String = tileIdFromRowColumn(row, column, zoom)
    /** North/south/west/east bounds = forward functions at row/row+1, col/col+1
      * (tile.py:45–49). */
    def northLatitude: Double = latitudeFromRow(row, zoom)
    def southLatitude: Double = latitudeFromRow(row + 1, zoom)
    def westLongitude: Double = longitudeFromColumn(column, zoom)
    def eastLongitude: Double = longitudeFromColumn(column + 1, zoom)
    /** Center = bound midpoints (tile.py:51–52). */
    def centerLatitude: Double  = (northLatitude + southLatitude) / 2.0
    def centerLongitude: Double = (westLongitude + eastLongitude) / 2.0

    /** Quadtree parent one zoom coarser; integer form of tile.py:60–64. */
    def parent: Option[Tile] =
      if (zoom <= MinZoom) None else Some(Tile(zoom - 1, row >> 1, column >> 1))

    /** Ancestor `levels` zooms coarser (the "result set" tile uses
      * levels = DetailZoomDelta, heatmap.py:89). */
    def ancestor(levels: Int): Option[Tile] =
      if (levels < 0 || zoom - levels < MinZoom) None
      else Some(Tile(zoom - levels, row >> levels, column >> levels))

    /** All strict ancestors down to (and excluding) zoom `minZoom`.
      * The reference enumerates zooms MaxZoom-1 … 1, excluding zoom 0
      * (tile.py:79–86, `range(MAX_ZOOM, MIN_ZOOM, -1)` on the parent chain). */
    def ancestors(minZoom: Int = MinZoom + 1): Seq[Tile] =
      (zoom - 1) to minZoom by -1 map (z => Tile(z, row >> (zoom - z), column >> (zoom - z)))

    /** The 4 children one zoom finer (tile.py:88–98). */
    def children: Seq[Tile] = for {
      dr <- 0 to 1; dc <- 0 to 1
    } yield Tile(zoom + 1, row * 2 + dr, column * 2 + dc)

    def contains(lat: Double, lon: Double): Boolean =
      rowFromLatitude(lat, zoom) == row && columnFromLongitude(lon, zoom) == column
  }

  object Tile {
    def fromLatLon(lat: Double, lon: Double, zoom: Int): Tile =
      Tile(zoom, rowFromLatitude(lat, zoom), columnFromLongitude(lon, zoom))
  }

  /** Parse `"z_r_c"`; `None` on malformed input (tile.py:32–36, 66–77 —
    * the reference silently returns None rather than raising). */
  def decode(id: String): Option[Tile] = {
    val parts = if (id == null) Array.empty[String] else id.split("_", -1)
    if (parts.length != 3) None
    else
      try {
        val z = parts(0).toInt
        val t = Tile(z, parts(1).toLong, parts(2).toLong)
        // z bound first: 1L << z wraps at z >= 64 (JVM shift count mod 64),
        // which would accept e.g. "64_0_0"; ids never exceed FineZoom=21 but
        // decode stays permissive up to the largest shift-safe zoom
        if (z < 0 || z > 62 || t.row < 0 || t.column < 0 || t.row >= (1L << z) || t.column >= (1L << z)) None
        else Some(t)
      } catch { case _: NumberFormatException => None }
  }

  def parentId(id: String): Option[String]      = decode(id).flatMap(_.parent).map(_.id)
  def childIds(id: String): Seq[String]         = decode(id).toSeq.flatMap(_.children).map(_.id)
  /** tile.py:79–86 equivalent: ids of all strict ancestors, zoom-1 … 1. */
  def ancestorIds(id: String): Seq[String]      = decode(id).toSeq.flatMap(_.ancestors()).map(_.id)

  /** Spreads the low 31 bits of `x` into the even bit positions of a Long
    * (standard Morton magic-number dilation). */
  def part1By1(x: Long): Long = {
    var v = x & 0x7fffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8))  & 0x00ff00ff00ff00ffL
    v = (v | (v << 4))  & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2))  & 0x3333333333333333L
    v = (v | (v << 1))  & 0x5555555555555555L
    v
  }

  /** Morton (Z-order) code of a tile: row bits interleave into odd
    * positions, column bits into even — so tiles close on the map are close
    * in key order (each 2×2 block of tiles is a contiguous key range, each
    * 4×4 contains it, recursively). Sorting a locations table by this key
    * before writing is the layout that lets a viewport (bbox) query prune
    * row groups by min/max statistics instead of scanning the world —
    * the tile-engine analog of Delta/Iceberg Z-ordering. Defined for
    * row, col in [0, 2^31); the full zoom-21 grid needs only 42 bits. */
  def morton(row: Long, col: Long): Long =
    (part1By1(row) << 1) | part1By1(col)
}
