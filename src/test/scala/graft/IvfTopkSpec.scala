package graft

/** q111 (IVF-bucketed approximate top-k) against q39 (exact brute force):
  * the probe structure must actually approximate — high recall on the
  * fixture, but NOT forced equality (a neighbor in an unprobed cluster is
  * legitimately missed; at sf0.01 measured recall@5 was 0.92). A recall of
  * 1.0 with pruned candidates is possible on easy data, but a recall below
  * the floor means the probe law is broken, and identical-by-construction
  * results would mean the pruning never engaged. */
class IvfTopkSpec extends SparkSpec {

  test("IVF top-k approximates exact top-k with bounded recall loss") {
    val exact = SparkEntry.queries("q39_ann_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = SparkEntry.queries("q111_ivf_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(exact.nonEmpty && ivf.nonEmpty)
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.6, f"recall@5 collapsed to $recall%.2f — probe law broken")
    // per-query cap: never more than 5 neighbors
    val perQuery = SparkEntry.queries("q111_ivf_topk")(spark, sf).collect()
      .groupBy(_.getLong(0)).map(_._2.length)
    assert(perQuery.forall(_ <= 5))
  }

  test("probe join is broadcast and cluster-keyed, never a corpus shuffle") {
    val df = SparkEntry.queries("q111_ivf_topk")(spark, sf)
    df.collect() // AQE-final plan
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"degenerated:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"probe side should broadcast (query-batch-proportional):\n$p")
  }
}
