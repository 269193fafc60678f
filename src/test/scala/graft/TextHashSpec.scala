package graft

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks
import graft.functions.TextHash

/** The JVM hash kernels must agree exactly with the Catalyst expression folds
  * (which in turn mirror the DuckDB oracle SQL) — any drift silently breaks
  * every dedup/fingerprint oracle. */
class TextHashSpec extends SparkSpec with TableDrivenPropertyChecks {

  import spark.implicits._

  private val samples = Seq(
    "", "a", "hello world", "the quick brown fox", "a  b   c",
    "Ñandú café", "tab\there", "123 456 789", "x" * 500,
    "spark group query row data slow small filter")

  test("polyHash kernel == charHash expression fold") {
    val df = samples.toDF("s")
    val got = df.select(
      TextHash.charHash($"s").as("kernel"),
      TextHash.charHashExpr($"s").as("expr")).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1), s"mismatch on ${r}"))
  }

  test("tokenSeqHash kernel == expression fold") {
    val df = samples.toDF("s").select(split($"s", " ", -1).as("toks"))
    val got = df.select(
      TextHash.tokenSeqHash($"toks").as("kernel"),
      TextHash.tokenSeqHashExpr($"toks").as("expr")).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("contentHash is token-order-insensitive") {
    val df = Seq(("b a c", "c b a"), ("x y", "y x")).toDF("s1", "s2")
    val got = df.select(
      TextHash.contentHash(split($"s1", " ", -1)),
      TextHash.contentHash(split($"s2", " ", -1))).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("shingles guard short documents") {
    val df = Seq("one", "one two", "one two three four").toDF("s")
      .select(TextHash.shingles(split($"s", " ", -1), 3).as("sh"))
    val sizes = df.select(size($"sh")).as[Int].collect()
    assert(sizes.sameElements(Array(0, 0, 2)))
  }
}
