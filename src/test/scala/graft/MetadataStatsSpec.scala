package graft

import graft.CatalogBackend.{rangeCountOf, statsOf}
import org.scalatest.funsuite.AnyFunSuite

/** Boundary behavior of the shared metadata-aggregate derivations. */
class MetadataStatsSpec extends AnyFunSuite {
  private def e(rc: Long, mn: Long, mx: Long) = (Some(rc), Some((mn, mx)))

  test("statsOf: provability is per-side; empty gives count 0, no bounds") {
    assert(statsOf(Seq(e(5, 10, 20), e(3, 30, 40))) ==
      ((Some(8L), Some((10L, 40L)))))
    assert(statsOf(Seq(e(5, 10, 20), (None, Some((30L, 40L))))) ==
      ((None, Some((10L, 40L)))))
    assert(statsOf(Seq(e(5, 10, 20), (Some(3L), None))) ==
      ((Some(8L), None)))
    assert(statsOf(Nil) == ((Some(0L), None)))
  }

  test("rangeCountOf: fully inside counts, fully outside skips, partial kills") {
    val files = Seq(e(5, 10, 20), e(3, 30, 40), e(7, 50, 60))
    assert(rangeCountOf(files, (10, 40)) == Some(8L)) // exact boundaries
    assert(rangeCountOf(files, (0, 100)) == Some(15L))
    assert(rangeCountOf(files, (25, 45)) == Some(3L)) // middle file only
    assert(rangeCountOf(files, (15, 40)).isEmpty) // splits the first file
    assert(rangeCountOf(files, (41, 49)) == Some(0L)) // between files
    // stat-less entries are unclassifiable
    assert(rangeCountOf(files :+ ((Some(1L), None)), (0, 100)).isEmpty)
    // a fully-inside file without row_count kills; outside it doesn't
    assert(rangeCountOf(Seq((None, Some((10L, 20L)))), (0, 100)).isEmpty)
    assert(rangeCountOf(Seq((None, Some((10L, 20L))), e(3, 30, 40)), (25, 45))
      == Some(3L))
    // sentinel (half-open) ranges from extract's asTuple
    assert(rangeCountOf(files, (Long.MinValue, 25)) == Some(5L))
    assert(rangeCountOf(files, (30, Long.MaxValue)) == Some(10L))
  }
}
