package graft.tiles

import scala.collection.mutable.ArrayBuffer

/** Bbox → Morton-key-range planning: decomposes a tile-space rectangle into
  * the MAXIMAL quadtree-aligned blocks it contains, each of which is one
  * CONTIGUOUS Z-order key range (an aligned 2^k×2^k block at an aligned
  * origin owns exactly the 4^k keys [morton(r0,c0), morton(r0,c0)+4^k−1]).
  *
  * This is how a Z-ordered store ([[graft.sources.ParquetCompactor
  * .compactZOrdered]]) serves a viewport query: instead of scanning the
  * world and filtering on (row, col), the planner turns the bbox into a
  * handful of `zkey BETWEEN lo AND hi` predicates that parquet min/max
  * statistics prune against — the read-side half of the layout story. The
  * recursion visits children in Z order (00, 01, 10, 11), so emitted ranges
  * are sorted and adjacent ranges coalesce in one linear pass; range count
  * grows with the bbox PERIMETER (the interior is covered by large aligned
  * blocks), not its area.
  *
  * Exact by construction — the decomposed ranges cover precisely the bbox's
  * keys (hm_viewport_zorder proves the equivalence against the row/col
  * formulation in the DuckDB gate).
  */
object ZRange {

  /** Inclusive Morton key ranges covering exactly
    * [rMin..rMax] × [cMin..cMax] within the 2^bits × 2^bits grid.
    * An empty bbox (min > max — e.g. a viewport clamped away at a map
    * edge) selects nothing: Nil, not an exception. */
  def ranges(rMin: Long, rMax: Long, cMin: Long, cMax: Long,
      bits: Int): Seq[(Long, Long)] = {
    require(bits >= 0 && bits <= 31, s"bits out of range: $bits")
    if (rMin > rMax || cMin > cMax) return Nil
    val n = 1L << bits
    require(rMin >= 0 && rMax < n && cMin >= 0 && cMax < n,
      s"bbox exceeds the 2^$bits grid")
    val out = ArrayBuffer.empty[(Long, Long)]
    def go(r0: Long, c0: Long, size: Long): Unit = {
      if (r0 > rMax || c0 > cMax || r0 + size <= rMin || c0 + size <= cMin)
        () // disjoint
      else if (r0 >= rMin && r0 + size - 1 <= rMax &&
          c0 >= cMin && c0 + size - 1 <= cMax) {
        // fully inside: one contiguous key block
        val lo = TileMath.morton(r0, c0)
        out += ((lo, lo + size * size - 1))
      } else {
        val h = size / 2
        // Z order: (0,0) (0,1) (1,0) (1,1) → ascending morton
        go(r0, c0, h); go(r0, c0 + h, h); go(r0 + h, c0, h); go(r0 + h, c0 + h, h)
      }
    }
    go(0L, 0L, n)
    // coalesce key-adjacent blocks (common along the bbox interior)
    val merged = ArrayBuffer.empty[(Long, Long)]
    out.foreach { case (lo, hi) =>
      if (merged.nonEmpty && merged.last._2 + 1 == lo)
        merged(merged.size - 1) = (merged.last._1, hi)
      else merged += ((lo, hi))
    }
    merged.toSeq
  }

  /** At most `maxRanges` ranges COVERING the bbox (a superset of its keys):
    * the exact decomposition's smallest inter-range gaps are closed first,
    * so slop is minimized. This is the predicate a store query actually
    * ships — a handful of `zkey BETWEEN` terms for row-group pruning, with
    * the exact (row, col) bbox conjunct as the residual filter. A fine
    * exact decomposition can run to hundreds of ranges (O(perimeter)); a
    * 500-term OR chain defeats both codegen and stats pruning. */
  def coveringRanges(rMin: Long, rMax: Long, cMin: Long, cMax: Long,
      bits: Int, maxRanges: Int): Seq[(Long, Long)] = {
    require(maxRanges >= 1, s"maxRanges must be >= 1, got $maxRanges")
    val exact = ranges(rMin, rMax, cMin, cMax, bits)
    if (exact.size <= maxRanges) return exact
    // close the (size - maxRanges) smallest gaps between consecutive ranges
    val gaps = exact.sliding(2).collect {
      case Seq((_, hi1), (lo2, _)) => lo2 - hi1 - 1
    }.toIndexedSeq
    val keep = gaps.zipWithIndex.sortBy(_._1).drop(gaps.size - (maxRanges - 1))
      .map(_._2).toSet // indices of gaps that REMAIN range boundaries
    val outB = ArrayBuffer.empty[(Long, Long)]
    var cur = exact.head
    exact.zipWithIndex.drop(1).foreach { case (r, i) =>
      if (keep(i - 1)) { outB += cur; cur = r }
      else cur = (cur._1, r._2) // close the gap: absorb into current
    }
    outB += cur
    outB.toSeq
  }
}
