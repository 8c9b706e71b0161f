package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tiles.TileMath
import graft.tiles.TileMath.Tile

/** Unit + property-style tests for the pure tile math (SURVEY.md §5).
  * Golden values verified against the OSM slippy-map formulas (the same
  * check the survey ran against the reference's tile.py). Properties run
  * over a seeded random sample so failures are reproducible. */
class TileMathSpec extends AnyFunSuite {

  test("golden: Seattle at z10 and its parent") {
    assert(TileMath.tileIdFromLatLon(47.6062, -122.3321, 10) == "10_357_164")
    // 357>>1 = 178, 164>>1 = 82 (SURVEY.md §1.3 misquotes the parent as
    // 9_178_81; the OSM formula and center re-quantization both give 82)
    assert(TileMath.parentId("10_357_164").contains("9_178_82"))
  }

  test("origin and bounds behave") {
    assert(TileMath.tileIdFromLatLon(0.0, 0.0, 1) == "1_1_1")
    assert(TileMath.rowFromLatitude(0.0, 4) == 8) // equator = exact midline
    assert(TileMath.columnFromLongitude(0.0, 4) == 8)
    assert(TileMath.columnFromLongitude(-180.0, 3) == 0)
  }

  test("decode: malformed inputs yield None (tile.py:35-36 semantics)") {
    assert(TileMath.decode("nonsense").isEmpty)
    assert(TileMath.decode("1_2").isEmpty)
    assert(TileMath.decode("a_b_c").isEmpty)
    assert(TileMath.decode("3_9_1").isEmpty) // row out of range for z=3
    assert(TileMath.decode(null).isEmpty)
    // z >= 64 wraps 1L << z (JVM shift mod 64) — must reject, not accept
    assert(TileMath.decode("64_0_0").isEmpty)
    assert(TileMath.decode("100_5_5").isEmpty)
    assert(TileMath.decode("10_357_164").contains(Tile(10, 357, 164)))
  }

  private val rnd = new scala.util.Random(42)
  private def samples: Seq[(Double, Double, Int)] =
    Seq.fill(500)((rnd.nextDouble() * 170 - 85, rnd.nextDouble() * 360 - 180,
      1 + rnd.nextInt(21)))

  test("property: a tile contains the point it was built from, in range") {
    samples.foreach { case (lat, lon, z) =>
      val t = Tile.fromLatLon(lat, lon, z)
      assert(t.contains(lat, lon), s"($lat,$lon,$z)")
      assert(t.row >= 0 && t.row < (1L << z) && t.column >= 0 && t.column < (1L << z))
    }
  }

  test("property: bounds bracket the point; center stays inside the tile") {
    samples.foreach { case (lat, lon, z) =>
      val t = Tile.fromLatLon(lat, lon, z)
      assert(t.southLatitude <= lat && lat <= t.northLatitude, s"lat $lat z$z")
      assert(t.westLongitude <= lon && lon < t.eastLongitude, s"lon $lon z$z")
      assert(t.contains(t.centerLatitude, t.centerLongitude), s"center of $t")
    }
  }

  test("property: parent contains all 4 distinct children") {
    samples.filter(_._3 <= 20).foreach { case (lat, lon, z) =>
      val t = Tile.fromLatLon(lat, lon, z)
      val kids = t.children
      assert(kids.size == 4 && kids.distinct.size == 4)
      kids.foreach(k => assert(k.parent.contains(t)))
    }
  }

  test("property: integer ancestors equal iterated center re-quantization (tile.py:60-64)") {
    samples.filter(_._3 >= 2).foreach { case (lat, lon, z) =>
      val t = Tile.fromLatLon(lat, lon, z)
      // the reference computes the parent by re-quantizing the tile center
      val viaCenter = Tile.fromLatLon(t.centerLatitude, t.centerLongitude, z - 1)
      assert(t.parent.contains(viaCenter), s"parent mismatch at ($lat,$lon,$z)")
      // ancestor chain is the iterated parent chain down to zoom 1
      val chain = Iterator.iterate(Option(t))(_.flatMap(_.parent))
        .drop(1).takeWhile(_.exists(_.zoom >= 1)).flatten.toSeq
      assert(t.ancestors() == chain)
    }
  }

  test("property: round-trip id -> decode -> id") {
    samples.foreach { case (lat, lon, z) =>
      val id = TileMath.tileIdFromLatLon(lat, lon, z)
      assert(TileMath.decode(id).map(_.id).contains(id))
    }
  }

  test("property: ZRange decomposition covers exactly the bbox's Morton keys") {
    import graft.tiles.ZRange
    val rnd = new scala.util.Random(23)
    val bits = 5 // 32x32 grid: exhaustive key-set comparison stays cheap
    val n = 1 << bits
    (1 to 200).foreach { _ =>
      val r1 = rnd.nextInt(n); val r2 = rnd.nextInt(n)
      val c1 = rnd.nextInt(n); val c2 = rnd.nextInt(n)
      val (rMin, rMax) = (math.min(r1, r2).toLong, math.max(r1, r2).toLong)
      val (cMin, cMax) = (math.min(c1, c2).toLong, math.max(c1, c2).toLong)
      val rs = ZRange.ranges(rMin, rMax, cMin, cMax, bits)
      // sorted and disjoint (post-coalescing, also non-adjacent)
      rs.sliding(2).foreach {
        case Seq((_, hi1), (lo2, _)) => assert(hi1 + 1 < lo2, s"$rs not coalesced-disjoint")
        case _ =>
      }
      val covered = rs.flatMap { case (lo, hi) => lo to hi }.toSet
      val expected = (for {
        r <- rMin to rMax; c <- cMin to cMax
      } yield TileMath.morton(r, c)).toSet
      assert(covered == expected,
        s"bbox [$rMin..$rMax]x[$cMin..$cMax]: ranges cover ${covered.size} keys, expected ${expected.size}")
    }
  }

  test("ZRange: an aligned quad is a single range; interior stays compact") {
    import graft.tiles.ZRange
    // a fully aligned 8x8 block at an aligned origin = exactly one range
    assert(ZRange.ranges(8, 15, 16, 23, 10) ==
      Seq((TileMath.morton(8, 16), TileMath.morton(8, 16) + 63)))
    // a 100x100 interior bbox at bits=10 decomposes into far fewer ranges
    // than tiles (perimeter-bound, not area-bound)
    val rs = ZRange.ranges(100, 199, 300, 399, 10)
    assert(rs.size < 200, s"expected O(perimeter) ranges, got ${rs.size}")
    // empty (clamped-away) bbox selects nothing, not an exception
    assert(ZRange.ranges(5, 4, 0, 10, 10).isEmpty)
  }

  test("ZRange.coveringRanges: bounded count, still a superset of the bbox") {
    import graft.tiles.ZRange
    val (rMin, rMax, cMin, cMax, bits) = (100L, 199L, 300L, 399L, 10)
    val exact = ZRange.ranges(rMin, rMax, cMin, cMax, bits)
    val coarse = ZRange.coveringRanges(rMin, rMax, cMin, cMax, bits, maxRanges = 8)
    assert(coarse.size <= 8 && coarse.size < exact.size)
    // every exact key interval is contained in some coarse interval
    exact.foreach { case (lo, hi) =>
      assert(coarse.exists { case (clo, chi) => clo <= lo && hi <= chi },
        s"exact range ($lo,$hi) not covered by $coarse")
    }
    // coarse ranges stay sorted and disjoint
    coarse.sliding(2).foreach {
      case Seq((_, h1), (l2, _)) => assert(h1 < l2)
      case _ =>
    }
    // already-small decompositions pass through unchanged
    assert(ZRange.coveringRanges(8, 15, 16, 23, 10, 8) ==
      ZRange.ranges(8, 15, 16, 23, 10))
  }
}
