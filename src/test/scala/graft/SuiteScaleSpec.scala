package graft

import org.scalatest.funsuite.AnyFunSuite

/** The isometric-clone staging law rests on [[graft.bench.SuiteScale
  * .permTables]]: each copy's text transform must be a WITHIN-CLASS
  * bijection (so every copy's internal token/shingle structure is exactly
  * the original's) and the per-copy transforms must be pairwise distinct
  * (so cross-copy vocabularies are disjoint — no phantom near-dup pairs).
  * The 30× pair-family probe exists BECAUSE the previous Caesar rotation
  * silently broke the second property at copies ≥ 26 (letters wrap to the
  * identity); this spec pins both properties at every replication factor
  * the harness runs, without a SparkSession. */
class SuiteScaleSpec extends AnyFunSuite {

  private val classes = Seq(('a' to 'z').mkString, ('A' to 'Z').mkString,
    ('0' to '9').mkString)

  private def check(copies: Int): Unit = {
    val tables = graft.bench.SuiteScale.permTables(copies)
    assert(tables.length == copies)
    // copy 0 is the identity: the original corpus IS clone 0
    assert(tables(0)._1 == tables(0)._2)
    tables.foreach { case (from, to) =>
      assert(from == classes.mkString) // stable source alphabet
      // within-class bijection: each class's slice of `to` is a
      // permutation of that class — charset unchanged, no cross-class
      // bleed (a digit never maps to a letter: |charset|²-bounded model
      // aggregations rely on this)
      var off = 0
      classes.foreach { cls =>
        val slice = to.substring(off, off + cls.length)
        assert(slice.sorted == cls.sorted,
          s"copy transform is not a within-class bijection: $slice")
        off += cls.length
      }
    }
    // pairwise distinct transforms — the property rotation lost at k>=26
    assert(tables.map(_._2).distinct.length == copies)
  }

  test("permTables: within-class bijection, identity at k=0, pairwise " +
    "distinct — at 10 (graded), 26/27 (the rotation wrap that motivated " +
    "seeding), and 30 (the pair probe)") {
    Seq(2, 10, 26, 27, 30).foreach(check)
  }

  test("permTables is deterministic across calls (staging re-runs must " +
    "produce byte-identical corpora for the marker fingerprint to mean " +
    "anything)") {
    assert(graft.bench.SuiteScale.permTables(30) ==
      graft.bench.SuiteScale.permTables(30))
  }
}
