package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.GraftListenerBridge

/** Session-wide task-metric counters for bench attribution.
  *
  * Why: BENCH_DETAIL's stage/query wall times say WHAT got slow, never WHY —
  * when round 7's `jaccard_pairs_build` spiked 3.3s → 12s in one driver run,
  * nothing recorded could separate a GC pause from shuffle spill from a slow
  * host, so the spike was unattributable after the fact. This tap folds every
  * finished task's `jvmGCTime` / `memoryBytesSpilled` / `diskBytesSpilled`
  * into three process-wide counters; the bench snapshots deltas around each
  * timed region (off the clock) and writes them next to the wall times, so
  * the next spike carries its own diagnosis: GC-heavy → heap pressure,
  * spill > 0 → partitions outgrew execution memory (the 100 TB red flag
  * `spark.sql.shuffle.partitions` sizing exists to prevent), both flat →
  * look at the host, not the plan.
  *
  * Listener delivery is async, so [[snapshot]] flushes the bus first
  * (bounded wait, off the timed path). Counters are monotonic totals;
  * attribution is by before/after delta, which needs no per-query reset and
  * stays correct when stages nest (deltas of an enclosing region include its
  * children, same convention as wall time).
  */
object MetricsTap {
  final case class Snap(gcMs: Long, spillMemBytes: Long, spillDiskBytes: Long) {
    def -(o: Snap): Snap =
      Snap(gcMs - o.gcMs, spillMemBytes - o.spillMemBytes,
        spillDiskBytes - o.spillDiskBytes)
    // raw byte counts: integer MiB division truncated sub-MiB spill to 0 —
    // the exact "spill > 0" red flag this tap exists to surface, invisible
    // for small-fixture runs
    def json: String =
      s"""{"gc_ms":$gcMs,"spill_mem_bytes":$spillMemBytes,"spill_disk_bytes":$spillDiskBytes}"""
  }

  private val gcMs = new AtomicLong
  private val spillMem = new AtomicLong
  private val spillDisk = new AtomicLong
  @volatile private var installedOn: SparkContext = null

  private val listener = new SparkListener {
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        gcMs.addAndGet(m.jvmGCTime)
        spillMem.addAndGet(m.memoryBytesSpilled)
        spillDisk.addAndGet(m.diskBytesSpilled)
      }
    }
  }

  /** Idempotent per-context install. Only the bench installs — queries and
    * tests never pay the listener, and [[enabled]] gates the recording paths
    * so their stat maps don't grow zero-noise keys outside bench runs. */
  def install(sc: SparkContext): Unit = synchronized {
    if (installedOn ne sc) {
      sc.addSparkListener(listener)
      installedOn = sc
    }
  }

  def enabled: Boolean = installedOn != null

  /** Flush the listener bus, then read the counters. Call OUTSIDE the timed
    * region — the flush waits on every queued event, which is the point
    * (deltas must include the region's own task tail) and also why it must
    * never sit between `nanoTime` calls. */
  def snapshot(): Snap = {
    val sc = installedOn
    if (sc != null) GraftListenerBridge.flush(sc)
    Snap(gcMs.get, spillMem.get, spillDisk.get)
  }
}
