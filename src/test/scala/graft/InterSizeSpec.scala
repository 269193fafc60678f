package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumnBridge

/** graft.plans.InterSize — the native |A∩B| verify kernel — must agree
  * exactly with `size(array_intersect)` on its precondition domain
  * (distinct arrays, no null elements) across both execution tiers. */
class InterSizeSpec extends SparkSpec {
  import spark.implicits._

  private def native = GraftColumnBridge.column(graft.plans.InterSize(
    GraftColumnBridge.expression(col("a")), GraftColumnBridge.expression(col("b"))))

  test("edge cases: empty / disjoint / identical / subset / null array") {
    val rows = Seq(
      (Array.empty[Long], Array.empty[Long]),
      (Array.empty[Long], Array(1L, 2L)),
      (Array(1L, 2L, 3L), Array(4L, 5L)),
      (Array(1L, 2L, 3L), Array(3L, 2L, 1L)),
      (Array(1L, 2L, 3L, 4L), Array(2L, 4L)),
      (Array(0L, Long.MinValue, Long.MaxValue), Array(0L, Long.MaxValue, 7L)))
    val df = rows.toDF("a", "b")
    assert(df.select(native).as[Long].collect().toSeq == Seq(0L, 0L, 0L, 3L, 2L, 2L))
    // null array -> null result (BinaryExpression null propagation)
    val withNull = df.select(when(lit(false), col("a")).as("a"), col("b"))
    assert(withNull.select(native).collect().forall(_.isNullAt(0)))
  }

  test("randomized agreement with size(array_intersect), both codegen tiers") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 5000).map { _ =>
      val a = Array.fill(rnd.nextInt(80))(rnd.nextInt(500).toLong).distinct
      val b = Array.fill(rnd.nextInt(80))(rnd.nextInt(500).toLong).distinct
      (a, b)
    }
    val df = rows.toDF("a", "b")
    val builtin = size(array_intersect(col("a"), col("b"))).cast("long")
    assert(df.filter(native =!= builtin).count() == 0)
    // interpreted tier (nullSafeEval): force codegen off for this plan
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(df.filter(native =!= builtin).count() == 0)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("misuse fails at analysis, not inside codegen") {
    // string arrays: no implicit cast to array<bigint> exists, so the
    // ExpectsInputTypes contract must reject the plan at analysis time
    val df = Seq((Array("x", "y"), Array("y"))).toDF("a", "b")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(native).collect()
    }
    assert(e.getMessage.toLowerCase.contains("inter_size") ||
      e.getMessage.contains("DATATYPE_MISMATCH"))
    // element-type coercion doesn't reach inside arrays (Spark's implicit
    // casts are scalar-level), so array<int> is rejected too — callers must
    // produce array<bigint>, which every hash-kernel call site does; an
    // explicit cast satisfies the contract
    val ints = Seq((Array(1, 2, 3), Array(3, 1))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      ints.select(native).collect()
    }
    val casted = ints.select(col("a").cast("array<bigint>").as("a"),
      col("b").cast("array<bigint>").as("b"))
    assert(casted.select(native).as[Long].head() == 2L)
  }
}
