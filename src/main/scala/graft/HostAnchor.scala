package graft

/** Deterministic CPU-speed anchor for cross-run bench attribution.
  *
  * Why: three rounds in a row the driver's bench record moved 15-50% with no
  * code change on the affected queries (r7 spike, r8 STRESS A/B caveat, r9
  * 47.6s→61.3s regression), and every time the host-vs-code attribution had
  * to be ARGUED from indirect signals (flat heavy queries, sbt wall clock,
  * same-code builder re-runs). This anchor makes it a measurement: a fixed
  * xxhash64-style mix loop — pure ALU, no allocation, no I/O, identical
  * instruction stream every run — timed at every pass boundary. If the
  * anchor reads 1.3× nominal, the host is in a slow window and a 1.3×
  * query inflation is ambient; if the anchor reads nominal and a query
  * slowed, the code did it.
  *
  * Two variants per boundary:
  *  - single-thread (min-of-3): pure core speed; min absorbs JIT warmup of
  *    this loop and scheduler preemption blips.
  *  - parallel (one run, `threads` loops joined): multicore throughput under
  *    whatever contention the host is experiencing — the documented slow
  *    windows inflate 32-thread query wall times, so the parallel anchor is
  *    the one that tracks them; the single/parallel ratio separates
  *    "all cores slow" (frequency/steal) from "cores contended" (co-tenant).
  *
  * [[NominalSingleMs]] / [[NominalParallelMs]] are the best (minimum)
  * observations on the grading host in a known-good window — so the
  * normalization factor `anchor/nominal` reads ≥ ~1.0 and "how slow is the
  * host right now" is a direct ratio. Normalized query time =
  * `raw * nominal/anchor` (parallel variant, since queries are 32-way).
  */
object HostAnchor {
  /** Steps per measurement. 2^27 ≈ 1.3e8 five-op mix iterations ≈ 150-300 ms
    * on a modern core — long enough to average over scheduler quanta, short
    * enough that 4 boundaries × (3+threads·1/threads) runs cost ~2 s total. */
  val Steps: Long = 1L << 27

  /** Best observed single-thread ms for [[Steps]] on the grading host
    * (calibrated 2026-08-13, min over 20 runs in the round-10 build window;
    * the window read clean: par32 ≈ single, i.e. 32 uncontended hardware
    * threads). If the host fleet changes, re-calibrate via the main below. */
  val NominalSingleMs: Double = 507.7

  /** Best observed 32-thread ms (all threads running [[Steps]] each,
    * wall time to full join) on the grading host, same calibration. */
  val NominalParallelMs: Double = 533.5

  // JIT sink: the checksum must escape or C2 could elide the whole loop
  @volatile private var sink: Long = 0L

  /** One timed run of the mix loop; returns wall ms. The loop body is the
    * xxh64 avalanche (two multiplies, three xor-shifts) over a running
    * counter — sequential dependency chain, so no ILP variance across JITs. */
  def once(steps: Long = Steps): Double = {
    var h = 0x9E3779B185EBCA87L
    var i = 0L
    val t0 = System.nanoTime()
    while (i < steps) {
      h ^= i
      h *= 0xC2B2AE3D27D4EB4FL
      h ^= (h >>> 29)
      h *= 0x165667B19E3779F9L
      h ^= (h >>> 32)
      i += 1
    }
    val ms = (System.nanoTime() - t0) / 1e6
    sink = h
    ms
  }

  /** min-of-n single-thread anchor (n=3: run 1 absorbs any residual JIT). */
  def single(n: Int = 3): Double = (1 to n).map(_ => once()).min

  /** Parallel anchor: `threads` concurrent full loops, wall time to join.
    * One run only — under real contention there is no "clean" repeat to
    * min() toward, and the contention IS the signal. */
  def parallel(threads: Int): Double = {
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { _ =>
      // per-thread times are not collected — the wall-to-join IS the
      // measurement; once()'s @volatile sink already defeats JIT elision
      val t = new Thread(() => { once(); () })
      t.setDaemon(true); t.start(); t
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e6
  }

  /** Boundary measurement: (single_ms, parallel_ms). */
  def measure(threads: Int): (Double, Double) = (single(), parallel(threads))

  /** Calibration main: prints per-run times and the min, for re-deriving the
    * nominals when the grading host changes. Not part of any graded path. */
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20
    val threads = if (args.length > 1) args(1).toInt else
      Runtime.getRuntime.availableProcessors()
    val singles = (1 to n).map { i =>
      val ms = once(); println(f"single[$i%2d] $ms%8.1f ms"); ms
    }
    val pars = (1 to math.max(3, n / 4)).map { i =>
      val ms = parallel(threads); println(f"par$threads[$i%2d] $ms%8.1f ms"); ms
    }
    println(f"min single ${singles.min}%.1f ms   min par$threads ${pars.min}%.1f ms")
  }
}
