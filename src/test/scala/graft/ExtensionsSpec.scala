package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import graft.functions.{CleanFunctions, TextHash}

/** SQL-surface registration and the native PolyHash expression: the codegen
  * path must produce the same values as the JVM kernel and the SQL form. */
class ExtensionsSpec extends SparkSpec {

  import spark.implicits._

  GraftExtensions.register(spark)

  test("poly_hash is callable from SQL and matches the JVM kernel") {
    val got = spark.sql("SELECT poly_hash('hello world') AS h").as[Long].head()
    assert(got == TextHash.polyHash("hello world"))
  }

  test("native expression == kernel over fixture text (codegen path)") {
    val df = Tables.documents(spark, sf)
      .select(TextHash.charHash($"text").as("native"),
        udf(TextHash.polyHash _).apply($"text").as("kernel"))
    assert(df.filter($"native" =!= $"kernel").count() == 0)
  }

  test("poly_hash handles nulls, empties, and non-ASCII") {
    val df = Seq(Some("abc"), Some(""), None, Some("Ñandú 漢字")).toDF("s")
    val rows = df.selectExpr("poly_hash(s) AS h").collect()
    assert(rows(0).getLong(0) == TextHash.polyHash("abc"))
    assert(rows(1).getLong(0) == 0L)
    assert(rows(2).isNullAt(0))
    assert(rows(3).getLong(0) == TextHash.polyHash("Ñandú 漢字"))
  }

  test("normalize_phone SQL UDF matches the Column form") {
    val samples = Seq("(341) 555-0123", "5" * 11, "123", "+54 11 4555 0199x",
      "1234567890123").toDF("p")
    val df = samples.select(
      expr("normalize_phone(p)").as("sql_form"),
      CleanFunctions.normalizePhone($"p").as("col_form"))
    df.collect().foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getString(0) == r.getString(1))
    }
  }

  test("GraftExtensions injects poly_hash via the extensions hook") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext) // must register without throwing
  }
}
