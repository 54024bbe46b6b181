package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the smear-adjudication band to the query battery it governs.
  * The band is pure data (seconds), so the only ways it rots are (a)
  * going empty — the r10 state, where every query silently fell to the
  * 3 s absolute fallback and the 1–3 s band (where host steal actually
  * accumulates) was unadjudicatable — and (b) drifting out of sync
  * with `SparkEntry.queries`. Both are cheap to pin at test time.
  */
class BenchBandsSpec extends AnyFunSuite {

  test("band is populated and every entry names a live query") {
    assert(BenchBands.medianSec.nonEmpty,
      "BenchBands.medianSec is empty — the re-run band degenerates to " +
        "a flat 3 s (see BASELINE.md §f for how to record a trio)")
    val stale = BenchBands.medianSec.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"band entries for dropped queries: $stale")
  }

  test("every query has a recorded median") {
    // A missing name silently gets the 3 s fallback — legal for a
    // query added mid-round (the fallback exists for exactly that),
    // but it must not survive a round boundary: record the median
    // from the next trio and extend the map (BASELINE.md §f).
    val unbanded = SparkEntry.queries.keySet -- BenchBands.medianSec.keySet
    assert(unbanded.isEmpty,
      s"queries with no recorded median (3 s fallback in effect): $unbanded")
  }

  test("thresholds follow max(2x median, 1s) with 3s fallback") {
    assert(BenchBands.smearThresholdSec("__no_such_query__") === 3.0)
    BenchBands.medianSec.foreach { case (n, m) =>
      assert(BenchBands.smearThresholdSec(n) === math.max(2.0 * m, 1.0))
      assert(m > 0.0 && m < 60.0, s"implausible recorded median for $n: $m")
    }
  }

  test("over_band self-report follows best > max(1.5x median, 1s)") {
    // the r15 maint_zorder case: a 6x-its-band reading must be reported
    // with its ratio; a reading at exactly the threshold must not (the
    // rule is strict >, so band-edge noise doesn't alert); sub-1s bests
    // never alert regardless of ratio (the 1 s floor); unbanded names
    // are skipped (no band to breach — the smear fallback governs them).
    // Constructed band-value-relative throughout, with an FP tolerance
    // on the ratio — the bands are re-recorded every round and the spec
    // must survive that (e.g. (6.0*m)/m lands one ulp off 6.0 for many
    // 3-decimal medians; an absolute q_topk reading would drift across
    // the 1 s floor if its median quadrupled).
    val m = BenchBands.medianSec("maint_zorder")
    val report = Bench.overBandEntries(Seq(
      "maint_zorder" -> 6.0 * m,
      "q_topk" -> 0.999, // under the 1 s floor no matter the ratio
      "wordcount" -> math.max(1.5 * BenchBands.medianSec("wordcount"), 1.0),
      "__new_query__" -> 99.0))
    assert(report.map(_._1) === Seq("maint_zorder"), s"got $report")
    assert(math.abs(report.head._2 - 6.0) < 1e-9, s"ratio ${report.head._2}")
    assert(Bench.overBandEntries(Nil).isEmpty)
  }
}
