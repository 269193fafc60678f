package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.{CleanFunctions, TextHash}
import graft.operators.Operators

/** Property-style invariants (SURVEY §5.2) over generated inputs: sentinel
  * algebra totality, cleaner idempotence, normalizer output alphabet, hash
  * range, dedup idempotence. Samples are drawn from ScalaCheck generators
  * with a fixed seed so failures reproduce. */
class PropertySpec extends SparkSpec {

  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(42L)).getOrElse(Nil)

  private val messyString: Gen[String] =
    Gen.listOf(Gen.frequency(
      (5, Gen.alphaNumChar), (2, Gen.const(' ')), (1, Gen.const('\t')),
      (1, Gen.oneOf('-', '(', ')', '+', '.', '@')))).map(_.mkString)

  test("polyHash stays in [0, P) and is deterministic") {
    val ss = samples(messyString, 200)
    ss.foreach { s =>
      val h = TextHash.polyHash(s)
      assert(h >= 0 && h < TextHash.P)
      assert(h == TextHash.polyHash(s))
    }
  }

  test("cleanText is idempotent and never widens whitespace") {
    val df = samples(messyString, 150).toDF("s")
      .select(CleanFunctions.cleanText($"s").as("once"))
      .select($"once", CleanFunctions.cleanText($"once").as("twice"))
    df.collect().foreach { r =>
      assert(r.getString(0) == r.getString(1), s"not idempotent on ${r.getString(0)}")
      assert(!r.getString(0).contains("  "))
    }
  }

  test("N/A codec: naToNull ∘ nullToNa is identity on canonical values") {
    val canonical = samples(Gen.alphaNumStr.suchThat(s => s.nonEmpty && s != "N/A"), 100)
    val df = canonical.toDF("s")
      .select($"s", CleanFunctions.naToNull(CleanFunctions.nullToNa($"s")).as("rt"))
    df.collect().foreach(r => assert(r.getString(0) == r.getString(1)))
    // and the sentinel itself always maps to null
    val na = Seq("N/A", "", "   ", null.asInstanceOf[String]).toDF("s")
      .select(CleanFunctions.naToNull($"s"))
    assert(na.collect().forall(_.isNullAt(0)))
  }

  test("normalizePhone emits only digits and dashes, or null") {
    val df = samples(messyString, 200).toDF("s")
      .select(CleanFunctions.normalizePhone($"s").as("p"))
    df.collect().foreach { r =>
      if (!r.isNullAt(0)) {
        val p = r.getString(0)
        assert(p.matches("[0-9-]+"), s"bad alphabet: $p")
        assert(p.replaceAll("-", "").length >= 10)
      }
    }
  }

  test("dedupFirstWins is idempotent") {
    val rows = samples(Gen.zip(Gen.choose(1L, 20L), Gen.choose(0, 1000)), 300)
    val df = rows.toDF("id", "seq")
    val once = Operators.dedupFirstWins(df, Seq("id"), Seq($"seq", $"id"))
    val twice = Operators.dedupFirstWins(once, Seq("id"), Seq($"seq", $"id"))
    assert(once.orderBy("id").collect().sameElements(twice.orderBy("id").collect()))
    assert(once.select("id").distinct().count() == once.count())
  }
}
