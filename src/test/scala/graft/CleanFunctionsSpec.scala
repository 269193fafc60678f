package graft

import org.apache.spark.sql.functions._
import graft.functions.CleanFunctions._

/** Unit tests for the reference transformer surface (SURVEY §2.8 F1-F16),
  * including the phone-grouping edge cases of business_transformer.py:44-49.
  */
class CleanFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(col: org.apache.spark.sql.Column, input: String): Any = {
    val df = Seq(Option(input)).toDF("c")
    df.select(col.as("r")).collect()(0).get(0)
  }

  test("naToNull maps sentinel and blanks to null, passes values") {
    assert(one(naToNull($"c"), "N/A") == null)
    assert(one(naToNull($"c"), "") == null)
    assert(one(naToNull($"c"), "  ") == null)
    assert(one(naToNull($"c"), "hola") == "hola")
    assert(one(naToNull($"c"), null) == null)
    // whitespace-wide blank law (Python strip semantics): tab/newline-only
    // values are blanks too — Spark's space-only trim alone misses them
    assert(one(naToNull($"c"), "\t") == null)
    assert(one(naToNull($"c"), " \t\n ") == null)
    assert(one(naToNull($"c"), "\ta\t") == "\ta\t")
    // Unicode whitespace (Python's isspace set): NBSP / narrow-NBSP /
    // ideographic-space-only values are blanks too — Java's ASCII-only \s
    // missed these until the explicit Ws class (round 13)
    assert(one(naToNull($"c"), "\u00A0") == null)
    assert(one(naToNull($"c"), "\u00A0\u00A0\u202F\u3000") == null)
  }

  test("nullToNa restores sentinel") {
    assert(one(nullToNa($"c"), null) == "N/A")
    assert(one(nullToNa($"c"), "x") == "x")
  }

  test("cleanText collapses whitespace (F1)") {
    assert(one(cleanText($"c"), "  a   b \t c ") == "a b c")
    // idempotence
    assert(one(cleanText(cleanText($"c")), "  a   b ") == "a b")
    // NBSP and typographic spaces collapse and trim like the reference's
    // Python .strip()/split() — leading NBSP must not survive as a space
    assert(one(cleanText($"c"), "\u00A0a\u00A0\u00A0b\u00A0") == "a b")
    assert(one(cleanText($"c"), "a\u202F\u202Fb\u3000c") == "a b c")
  }

  test("normalizePhone groups 10 digits as 3-4-3 (F2)") {
    assert(one(normalizePhone($"c"), "2991234567") == "299-1234-567")
    assert(one(normalizePhone($"c"), "(299) 123-4567") == "299-1234-567")
  }

  test("normalizePhone groups 11 digits as 2-3-3-3 (F2)") {
    assert(one(normalizePhone($"c"), "02991234567") == "02-991-234-567")
  }

  test("normalizePhone: <10 digits invalid, >11 raw digits (F2)") {
    assert(one(normalizePhone($"c"), "12345") == null)
    assert(one(normalizePhone($"c"), "5492991234567") == "5492991234567")
    assert(one(normalizePhone($"c"), null) == null)
  }

  test("validEmail accepts RFC-ish, rejects junk (F3)") {
    assert(one(validEmail($"c"), "a.b+c@d-e.com") == "a.b+c@d-e.com")
    assert(one(validEmail($"c"), "not-an-email") == null)
    assert(one(validEmail($"c"), "x@y") == null)
  }

  test("validUrl requires scheme and host (F4)") {
    assert(one(validUrl($"c"), "https://x.com/p") == "https://x.com/p")
    assert(one(validUrl($"c"), "x.com") == null)
  }

  test("normalizeUrl prefixes https and truncates (F5)") {
    assert(one(normalizeUrl($"c"), "x.com") == "https://x.com")
    assert(one(normalizeUrl($"c"), "http://x.com") == "http://x.com")
    assert(one(normalizeUrl($"c", 12), "x.com/very/long/path") == "https://x.co")
  }

  test("cleanPhones splits, normalizes, drops invalid, dedups (F6/A5)") {
    val df = Seq("2991234567, 123, 299-123-4567 , 2991234567").toDF("c")
    val out = df.select(cleanPhones($"c").as("r")).collect()(0).getSeq[String](0)
    assert(out == Seq("299-1234-567"))
  }

  test("phonesToString joins or N/A (F6 egress)") {
    val df = Seq(Seq("a", "b"), Seq()).toDF("c")
    val out = df.select(phonesToString($"c").as("r")).collect().map(_.getString(0))
    assert(out.toSeq == Seq("a, b", "N/A"))
  }

  test("extractIdFromUrl (F7)") {
    assert(one(extractIdFromUrl($"c"), "http://g.co/d?r=x&id=123&o=1") == "123")
    assert(one(extractIdFromUrl($"c"), "http://g.co/d?id=9") == "9")
    assert(one(extractIdFromUrl($"c"), "http://g.co/d") == null)
  }

  test("whatsappNumber: phone param, text param digits, link text (F8)") {
    val df = Seq(
      ("https://api.whatsapp.com/send?phone=549299123", "chat"),
      ("https://api.whatsapp.com/send?text=hola%20299123456", "chat"),
      ("https://api.whatsapp.com/send?foo=1", "299 123456")
    ).toDF("href", "txt")
    val out = df.select(whatsappNumber($"href", $"txt").as("r")).collect().map(_.getString(0))
    assert(out.toSeq == Seq("549299123", "299123456", "299 123456"))
  }

  test("cleanSocial nulls self-referential links (F9)") {
    assert(one(cleanSocial($"c"), "https://www.GuiaCores.com.ar/x") == null)
    assert(one(cleanSocial($"c"), "https://facebook.com/biz") == "https://facebook.com/biz")
  }

  test("addressParts rsplits on ' - ' (F10)") {
    val df = Seq("Av. Roca 123 - (8300) Neuquén", "SinSeparador").toDF("c")
    val out = df.select(addressParts($"c").as("r")).select("r.direccion", "r.localidad")
      .collect()
    assert(out(0).getString(0) == "Av. Roca 123")
    assert(out(0).getString(1) == "(8300) Neuquén")
    assert(out(1).getString(0) == "SinSeparador")
    assert(out(1).get(1) == null)
  }

  test("addressParts keeps internal separators (F10 rsplit semantics)") {
    val df = Seq("A - B - C").toDF("c")
    val r = df.select(addressParts($"c").as("r")).select("r.direccion", "r.localidad").collect()(0)
    assert(r.getString(0) == "A - B")
    assert(r.getString(1) == "C")
  }

  test("coerceLong / coerceBool (F11)") {
    assert(one(coerceLong($"c"), "123") == 123L)
    assert(one(coerceLong($"c"), "12a") == null)
    assert(one(coerceBool($"c"), "TRUE") == true)
    assert(one(coerceBool($"c"), "false") == false)
    assert(one(coerceBool($"c"), "si") == null)
  }

  test("cleanHorarios drops status words (F13)") {
    assert(one(cleanHorarios($"c"), "Abierto  Lu-Vi 9-18  Cerrado") == "Lu-Vi 9-18")
  }

  test("totalMatches regex with fallback (F14)") {
    assert(one(totalMatches($"c"), "se ha generado 735 coincidencias") == 735L)
    assert(one(totalMatches($"c"), "735 coincidencias") == 735L)
    assert(one(totalMatches($"c"), "nada") == null)
  }

  test("hasDigit / stripDashSpace (F15/F16)") {
    assert(one(hasDigit($"c"), "abc1") == true)
    assert(one(hasDigit($"c"), "abc") == false)
    assert(one(stripDashSpace($"c"), "299-123 456") == "299123456")
  }
}
