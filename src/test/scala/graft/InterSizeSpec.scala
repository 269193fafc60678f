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
}
