package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.plans.PolyHash

/** SQL-surface registration (SURVEY §7.1.2): the engine's functions usable
  * from `spark.sql(...)`, not just the Column API.
  *
  * Two hookup paths:
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build
  *    (the standard SparkSessionExtensions route), or
  *  - `GraftExtensions.register(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.polyHashDescriptor)
}

object GraftExtensions {

  private val polyHashBuilder: Seq[Expression] => Expression =
    children => PolyHash(children.head)

  private[graft] val polyHashDescriptor =
    (new FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      polyHashBuilder)

  /** Register on an already-built session (e.g. the driver's). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "poly_hash", polyHashBuilder, "built-in")
    // reference-exact scalar cleaners as SQL UDFs (JVM twins of the Column
    // forms in CleanFunctions; equivalence pinned in ExtensionsSpec)
    spark.udf.register("normalize_phone", (s: String) => {
      if (s == null) null
      else {
        val d = s.replaceAll("\\D", "")
        if (d.length < 10) null
        else if (d.length == 10) s"${d.substring(0, 3)}-${d.substring(3, 7)}-${d.substring(7)}"
        else if (d.length == 11) s"${d.substring(0, 2)}-${d.substring(2, 5)}-${d.substring(5, 8)}-${d.substring(8)}"
        else d
      }
    })
    spark.udf.register("clean_text", (s: String) =>
      // collapse BEFORE trim with the shared Unicode class (CF.Ws), then
      // strip SPACES only — the Column form's exact law. Java String.trim
      // is wrong on both ends here: it strips every char <= U+0020 (a
      // leading U+0001 control char would vanish where the Column trim()
      // and Python .strip() keep it), and it misses nothing after the
      // collapse anyway (each whitespace run is already one plain space).
      if (s == null) null
      else s.replaceAll(s"${graft.functions.CleanFunctions.Ws}+", " ")
        .stripPrefix(" ").stripSuffix(" "))
  }
}
