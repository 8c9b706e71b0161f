package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.tiles.TileMath
import graft.tiles.TileMath.Tile

/** ScalaCheck property tests for the PURE laws the catalog's correctness
  * arguments lean on — the complements of the example-based specs: where
  * TileMathSpec pins golden values and OperatorSpec pins planted fixtures,
  * these quantify over the whole input domain (shrunk counterexamples on
  * failure, fixed seed so any failure is reproducible).
  *
  * Laws covered, each cited to the code that relies on it:
  *   - tile id/decode round-trip and quadtree parent/child/ancestor algebra
  *     (tiles/TileMath.scala — the hm_pyramid two-shuffle design assumes
  *     ancestor(k) == parent^k exactly);
  *   - cross-zoom quantization coherence: the zoom-z tile of a point IS the
  *     parent of its zoom-(z+1) tile — exact in floating point because both
  *     rows scale ONE computed mercator y by powers of two (exact ops), so
  *     the pyramid rollup equals per-point re-quantization at every level;
  *   - Morton 2×2 block contiguity (the viewport Z-order layout claim:
  *     each quad is one contiguous key range, recursively);
  *   - the floor-division fold law behind the k-anonymity generalization
  *     ladder (DataQualityQueries kAnonBalBucket: widening the bucket is a
  *     FOLD of the finest class table — lossless iff
  *     floorDiv(floorDiv(x,w),k) == floorDiv(x,w·k));
  *   - the 1-D integer EMD prefix-sum law (dq_tcloseness_emd: transport
  *     cost over an ordered domain with unit adjacent distance equals
  *     Σ|cumulative histogram difference|), verified against the
  *     INDEPENDENT optimal-transport formulation (sorted elementwise
  *     matching — optimal in 1-D by the rearrangement inequality).
  */
class PropertySpec extends AnyFunSuite {

  /** Fixed-seed runner: any failure replays identically. */
  private def check(name: String, prop: Prop): Unit = {
    val params = ScTest.Parameters.default
      .withMinSuccessfulTests(400)
      .withInitialSeed(Seed(0x9e3779b97f4a7c15L))
    val res = ScTest.check(params, prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val genTile: Gen[Tile] = for {
    z <- Gen.choose(0, 30)
    r <- Gen.choose(0L, (1L << z) - 1)
    c <- Gen.choose(0L, (1L << z) - 1)
  } yield Tile(z, r, c)

  test("property: decode(t.id) round-trips for every well-formed tile") {
    val gen = for {
      z <- Gen.choose(0, 62)
      r <- Gen.choose(0L, (1L << z) - 1)
      c <- Gen.choose(0L, (1L << z) - 1)
    } yield Tile(z, r, c)
    check("decode-id", Prop.forAll(gen) { t =>
      TileMath.decode(t.id).contains(t)
    })
  }

  test("property: quadtree algebra — children/parent inverse, ancestor = parent^k") {
    check("children-parent", Prop.forAll(genTile) { t =>
      val kids = t.children
      kids.size == 4 && kids.distinct.size == 4 &&
        kids.forall(_.parent.contains(t))
    })
    val genWithK = for {
      t <- genTile
      k <- Gen.choose(0, t.zoom)
    } yield (t, k)
    check("ancestor-iterate", Prop.forAll(genWithK) { case (t, k) =>
      val iterated = (1 to k).foldLeft(Option(t))((o, _) => o.flatMap(_.parent))
      t.ancestor(k) == iterated
    })
    check("ancestors-chain", Prop.forAll(genTile) { t =>
      t.ancestors() == (1 until t.zoom).reverse.map(z => t.ancestor(t.zoom - z).get)
    })
  }

  test("property: cross-zoom coherence — fromLatLon(z+1).parent == fromLatLon(z)") {
    val gen = for {
      lat <- Gen.choose(-TileMath.MaxLatitude, TileMath.MaxLatitude)
      lon <- Gen.choose(-180.0, 180.0)
      z <- Gen.choose(0, 20)
    } yield (lat, lon, z)
    check("pyramid-coherence", Prop.forAll(gen) { case (lat, lon, z) =>
      Tile.fromLatLon(lat, lon, z + 1).parent.contains(Tile.fromLatLon(lat, lon, z))
    })
  }

  test("property: Morton quad blocks are contiguous key ranges") {
    val gen = for {
      r <- Gen.choose(0L, (1L << 30) - 1)
      c <- Gen.choose(0L, (1L << 30) - 1)
    } yield (r, c)
    check("morton-quad", Prop.forAll(gen) { case (r, c) =>
      val m = TileMath.morton(r, c)
      TileMath.morton(2 * r, 2 * c) == 4 * m &&
        TileMath.morton(2 * r, 2 * c + 1) == 4 * m + 1 &&
        TileMath.morton(2 * r + 1, 2 * c) == 4 * m + 2 &&
        TileMath.morton(2 * r + 1, 2 * c + 1) == 4 * m + 3
    })
  }

  test("property: Morton interleave is injective (bit-exact round-trip)") {
    // local inverse: gather the even bit positions back into a compact value
    def compact1By1(x: Long): Long = {
      var v = x & 0x5555555555555555L
      v = (v | (v >> 1)) & 0x3333333333333333L
      v = (v | (v >> 2)) & 0x0f0f0f0f0f0f0f0fL
      v = (v | (v >> 4)) & 0x00ff00ff00ff00ffL
      v = (v | (v >> 8)) & 0x0000ffff0000ffffL
      (v | (v >> 16)) & 0x00000000ffffffffL
    }
    val gen = for {
      r <- Gen.choose(0L, (1L << 31) - 1)
      c <- Gen.choose(0L, (1L << 31) - 1)
    } yield (r, c)
    check("morton-roundtrip", Prop.forAll(gen) { case (r, c) =>
      val m = TileMath.morton(r, c)
      compact1By1(m >> 1) == r && compact1By1(m) == c
    })
  }

  test("property: the generalization-ladder fold law — floorDiv composes") {
    // kAnonBalBucket(w·k) over raw values == re-bucketing kAnonBalBucket(w)
    // by k: the claim that every ladder rung is a lossless FOLD of the
    // finest (class, sensitive) table rather than a corpus re-read.
    // Negative balances are the interesting half (floor ≠ truncate there).
    val gen = for {
      x <- Gen.choose(Long.MinValue / 4, Long.MaxValue / 4)
      w <- Gen.choose(1L, 1L << 20)
      k <- Gen.choose(1L, 1L << 20)
    } yield (x, w, k)
    check("floordiv-fold", Prop.forAll(gen) { case (x, w, k) =>
      Math.floorDiv(Math.floorDiv(x, w), k) == Math.floorDiv(x, w * k)
    })
  }

  test("property: 1-D integer EMD prefix law == optimal-transport sorted matching") {
    // dq_tcloseness_emd's law, against the independent formulation: for
    // equal-mass integer multisets over an ordered domain, minimal unit-
    // distance transport cost = Σ|a_sorted_i − b_sorted_i| (1-D OT), and
    // the entry computes it as Σ|cumulative histogram difference|.
    val gen = for {
      m <- Gen.choose(2, 12)
      n <- Gen.choose(1, 60)
      a <- Gen.listOfN(n, Gen.choose(0, m - 1))
      b <- Gen.listOfN(n, Gen.choose(0, m - 1))
    } yield (m, a, b)
    check("emd-prefix", Prop.forAll(gen) { case (m, a, b) =>
      val ha = Array.tabulate(m)(i => a.count(_ == i).toLong)
      val hb = Array.tabulate(m)(i => b.count(_ == i).toLong)
      val prefixCost = ha.zip(hb).map { case (x, y) => x - y }
        .scanLeft(0L)(_ + _).drop(1).map(math.abs).sum
      val matchCost = a.sorted.zip(b.sorted)
        .map { case (x, y) => math.abs(x - y).toLong }.sum
      prefixCost == matchCost
    })
  }
}
