package graft

import org.apache.spark.sql.functions._

/** The SemDeDup law (q109) must be codebook-agnostic: the registry entry
  * pins the fixture's K=16 stand-in for oracle parity, and this spec runs
  * the SAME code under a different codebook (K=8) and checks it against a
  * brute-force driver replay of the retention law — proving the structure
  * (cluster assignment → within-cluster precedence pairs → keep/drop) is
  * invariant in K, not shaped around the fixture's constant. */
class SemDeDupSpec extends SparkSpec {

  private def cosFold(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var n2a = 0.0; var n2b = 0.0; var i = 0
    while (i < a.length) {
      acc += a(i).toDouble * b(i).toDouble
      n2a += a(i).toDouble * a(i).toDouble
      n2b += b(i).toDouble * b(i).toDouble
      i += 1
    }
    acc / (math.sqrt(n2a) * math.sqrt(n2b))
  }

  test("K=8 codebook: output matches a brute-force replay of the law") {
    import spark.implicits._
    val tau = 0.4
    val all = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
      .filter { case (_, v) => v.exists(_ != 0.0f) } // mirror vecs(): n2 > 0
      .sortBy(_._1)
    val cents = all.filter(_._1 < 8)
    assert(cents.length == 8 && all.length > 100)

    // brute-force replay, same IEEE fold order as the kernels
    val assigned = all.map { case (id, v) =>
      // first (ascending cent_id) wins ties, as in the kernel
      val (cl, cosC) = cents.map { case (cid, cv) => (cid, cosFold(v, cv)) }
        .maxBy { case (cid, c) => (c, -cid) }
      (id, cl, cosC, v)
    }
    val expected = assigned.map { case (id, cl, cosC, v) =>
      val droppedBy = assigned.exists { case (yId, yCl, yCos, yV) =>
        yCl == cl && (yCos < cosC || (yCos == cosC && yId < id)) &&
          cosFold(v, yV) >= tau
      }
      (cl, id, !droppedBy)
    }.sortBy(t => (t._1, t._2)).toSeq

    val vectors = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .filter(aggregate(transform(col("embedding"),
        x => x.cast("double") * x.cast("double")), lit(0.0), (a, x) => a + x) > 0.0)
    val codebook = vectors.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cent_id"), col("embedding"))
    val result = graft.queries.Vectors.semDeDup(spark, vectors, codebook, tau)
    // structure invariant in K: still a cluster-keyed join, never cartesian
    val plan = result.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "semDeDup with a non-fixture codebook planned a cartesian product")
    val got = result.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got == expected)
    // the retention rule keeps at least the first-in-order member per
    // cluster, so a cluster can never be dropped wholesale
    val keptPerCluster = got.groupBy(_._1).map { case (_, rs) => rs.count(_._3) }
    assert(keptPerCluster.forall(_ >= 1))
    // non-trivial: some drops must actually occur or tau never fired
    assert(got.exists(!_._3))
  }

  test("q120 prototype pruning: K=8 codebook matches a brute-force replay") {
    import spark.implicits._
    val all = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
      .filter { case (_, v) => v.exists(_ != 0.0f) }
      .sortBy(_._1)
    val cents = all.filter(_._1 < 8)
    assert(cents.length == 8 && all.length > 100)

    // brute-force replay of the law: assign, rank (cos DESC, id ASC)
    // within cluster, keep iff 4·rank > n
    val assigned = all.map { case (id, v) =>
      val (cl, cosC) = cents.map { case (cid, cv) => (cid, cosFold(v, cv)) }
        .maxBy { case (cid, c) => (c, -cid) }
      (id, cl, cosC)
    }
    val expected = assigned.groupBy(_._2).toSeq.flatMap { case (cl, members) =>
      val ranked = members.sortBy { case (id, _, cosC) => (-cosC, id) }
      val n = ranked.length
      ranked.zipWithIndex.map { case ((id, _, _), i) =>
        (cl, id, (i + 1).toLong, n.toLong, 4L * (i + 1) > n)
      }
    }.sortBy(t => (t._1, t._2))

    val vectors = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .filter(aggregate(transform(col("embedding"),
        x => x.cast("double") * x.cast("double")), lit(0.0), (a, x) => a + x) > 0.0)
    val codebook = vectors.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cent_id"), col("embedding"))
    val result = graft.queries.Vectors.prototypePrune(spark, vectors, codebook)
    val plan = result.queryExecution.executedPlan.toString
    // no pair join at all in this operator — rank only, never cartesian
    assert(!plan.contains("CartesianProduct") && !plan.contains("Join"),
      s"prototypePrune planned a join:\n$plan")
    val got = result.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toSeq
    assert(got == expected)
    // the law's shape: every cluster drops exactly floor(n/4) members —
    // never all of them — and drops are the TOP-prototypicality ranks
    got.groupBy(_._1).foreach { case (_, rs) =>
      val n = rs.head._4
      assert(rs.count(!_._5) == n / 4)
      assert(rs.filter(!_._5).forall(_._3 <= n / 4))
    }
  }
}
