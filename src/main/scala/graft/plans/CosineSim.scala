package graft.plans

import org.apache.spark.sql.GraftExpectsFloatArrayInputs
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native cosine similarity over two float-array columns — the q109 pair
  * kernel (and drop-in for any within-cluster verify filter).
  *
  * Why not a Scala UDF: a UDF over ArrayType(FloatType) receives
  * `Seq[Float]` — one boxed java.lang.Float per element per row, on the
  * hot side of a within-cluster pair join. This expression reads elements
  * straight off the unsafe array (`getFloat`), allocates nothing, and
  * participates in whole-stage codegen (static-kernel call, no
  * catalyst↔JVM row conversion) — same design as [[InterSize]].
  *
  * Bit-compatibility contract (the oracle gate): the fold is the exact
  * IEEE op sequence of the Vectors module's UDF form and the DuckDB oracle
  * fragments — ascending dimension index, `acc += a(i)*b(i)` / norms
  * accumulated in double in the same loop, one divide by the sqrt product
  * at the end. Same ops in the same order → bit-identical doubles →
  * identical threshold decisions.
  *
  * PRECONDITION (same as the call sites it replaces): both inputs non-null
  * arrays of equal length with no null elements, at least one nonzero
  * element each (zero vectors have no direction; their NaN cosine is
  * ordered differently by JVM/Catalyst/DuckDB, so callers filter n2 > 0
  * before comparing — see Vectors.vecs).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with GraftExpectsFloatArrayInputs {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.cos(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.CosineSim.cos($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {

  /** Static kernel referenced from generated Java code. One pass, three
    * double accumulators, no allocation. */
  def cos(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var n2a = 0.0
    var n2b = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      acc += x * y
      n2a += x * x
      n2b += y * y
      i += 1
    }
    acc / (math.sqrt(n2a) * math.sqrt(n2b))
  }
}
