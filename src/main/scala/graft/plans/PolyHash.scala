package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's polynomial string hash
  * (fold(acc*31 + codepoint) mod 1e9+7 — the deterministic cross-engine hash
  * under every dedup/fingerprint operator).
  *
  * This is the codegen tier of SURVEY §7.2: unlike the Scala-UDF form it
  * needs no catalyst↔JVM row conversion and participates in whole-stage
  * codegen — the emitted Java calls a static kernel on the UTF8String bytes
  * directly. ASCII fast path: one pass over the raw bytes; multi-byte input
  * falls back to codepoint iteration (same values as ANSI
  * string_split(s,'')+ascii()).
  */
case class PolyHash(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.GraftExpectsStringInput {
  // analysis-time input contract (same discipline as InterSize/CosineSim):
  // applied to a non-string the kernel's UTF8String cast would throw inside
  // generated code — the mixed-in inputTypes fails analysis instead

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.PolyHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  final val P = 1000000007L

  /** Static kernel referenced from generated Java code. */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var ascii = true
    var i = 0
    while (ascii && i < bytes.length) { if (bytes(i) < 0) ascii = false; i += 1 }
    if (ascii) {
      var acc = 0L
      i = 0
      while (i < bytes.length) { acc = (acc * 31L + bytes(i)) % P; i += 1 }
      acc
    } else {
      // multi-byte: iterate unicode codepoints (matches ascii() semantics)
      val str = s.toString
      var acc = 0L
      i = 0
      while (i < str.length) {
        val cp = str.codePointAt(i)
        acc = (acc * 31L + cp) % P
        i += Character.charCount(cp)
      }
      acc
    }
  }
}
