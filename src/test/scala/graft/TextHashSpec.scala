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

  test("normalizeText: idempotent, collapse-before-trim, \\x0B in the " +
      "pinned class (review r14)") {
    import spark.implicits._
    val cases = Seq(
      "\tfoo  bar ",       // leading tab: trim-then-collapse left " foo bar"
      "a" + "\u000B" + "b", // \x0B: Java \s has it; oracle spells [\t-\r ]
      "  A\r\nB\u000B C ", // mixed runs + case
      "plain text", "", " \t ")
    val got = cases.toDF("t")
      .select(graft.functions.TextHash.normalizeText($"t").as("n"))
      .as[String].collect().toSeq
    assert(got == Seq("foo bar", "a b", "a b c", "plain text", "", ""))
    // idempotence: a second pass is the identity
    val again = got.toDF("t")
      .select(graft.functions.TextHash.normalizeText($"t").as("n"))
      .as[String].collect().toSeq
    assert(again == got)
    // the oracle twin spells Java's \s exactly — guard the rendered SQL
    // so a future edit can't silently reintroduce an engine shorthand
    assert(graft.functions.TextHash.duckNormalizeSql("text") ==
      "trim(regexp_replace(lower(text), '[\\t-\\r ]+', ' ', 'g'))")
  }

  test("composed shingle hashes == charHash of the materialized shingle strings") {
    // the O(1)-per-shingle composition must equal hashing the concatenated
    // string character by character, duplicates collapsed, for any tokens
    val docs = samples ++ Seq("a a a a a", "", "x", "uno dos tres cuatro cinco",
      "términos acentuados y más palabras aquí")
    docs.foreach { s =>
      val toks = s.split(" ", -1).toSeq
      val composed = TextHash.shingleHashKernel(toks).toSeq
      val expected = (0 until math.max(toks.length - 2, 0))
        .map(i => s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}")
        .map(TextHash.polyHash).distinct
      assert(composed == expected, s"mismatch for: '$s'")
    }
  }
}
