package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar cleaning/validation functions — the reference's transformer surface
  * (SURVEY §2.8, F1–F16) re-expressed as pure Catalyst column expressions.
  *
  * All of these stay inside whole-stage codegen (no UDFs), so at 100 TB they
  * run fused into the scan/projection with zero serialization overhead.
  *
  * Sentinel algebra (SURVEY §7.4.1): the reference threads the literal string
  * "N/A" through every stage; here nulls are used internally and the sentinel
  * only exists at ingress ([[naToNull]]) / egress ([[nullToNa]]).
  */
object CleanFunctions {

  val NA = "N/A"

  /** The whitespace class of the reference's law — Python str.strip()/
    * str.isspace(), which is the full Unicode White_Space set (NBSP, the
    * typographic spaces U+2000–200A, ideographic space U+3000, …) plus the
    * \x1C–\x1F separators. Spelled out EXPLICITLY rather than via \s:
    * Java's \s is ASCII-only (a U+00A0-only value would bypass the
    * sentinel mapping — real Word-authored pages carry NBSP), and RE2's \s
    * lacks even \x0B, so an engine-native shorthand on either side would
    * silently diverge. \t-\r covers 09–0D (tab LF VT FF CR). */
  private[graft] val Ws = "[\\t-\\r \\u001C-\\u001F\\u0085\\u00A0\\u1680" +
    "\\u2000-\\u200A\\u2028\\u2029\\u202F\\u205F\\u3000]"
  /** [[Ws]]'s DuckDB/RE2 replica, character-for-character — splice into
    * oracle SQL wherever the cleanText/naToNull law is mirrored. */
  private[graft] val DuckWs = "[\\t-\\r \\x{001C}-\\x{001F}\\x{0085}" +
    "\\x{00A0}\\x{1680}\\x{2000}-\\x{200A}\\x{2028}\\x{2029}\\x{202F}" +
    "\\x{205F}\\x{3000}]"

  /** Ingress: map the reference's 'N/A'/empty sentinels to null. */
  def naToNull(c: Column): Column =
    // whitespace-wide blank check (Python's strip(), the reference's law):
    // a tab/NBSP-only value must not slip past the sentinel mapping — the
    // same trap F1's collapse-before-trim note documents
    when(c.isNull || trim(regexp_replace(c, s"$Ws+", " ")) === "" || c === NA,
      lit(null: String)).otherwise(c)

  /** Egress: restore the reference's 'N/A' sentinel (bulk_scraper.py:116). */
  def nullToNa(c: Column): Column = coalesce(c, lit(NA))

  /** F1 clean_text — collapse internal whitespace, trim
    * (reference src/transformers/business_transformer.py:25-29).
    * Collapse BEFORE trim: Spark's trim strips only spaces, so a leading
    * tab or NBSP would survive trim-then-collapse and break idempotence
    * (the reference's Python .strip() removes all whitespace classes —
    * the collapse maps every [[Ws]] run to ONE plain space, after which
    * the spaces-only trim is exact). */
  def cleanText(c: Column): Column =
    trim(regexp_replace(c, s"$Ws+", " "))

  /** F2 normalize_phone (business_transformer.py:31-49): strip non-digits;
    * <10 digits → null; 10 digits → XXX-XXXX-XXX ([0:3][3:7][7:]);
    * 11 digits → XX-XXX-XXX-XXX ([0:2][2:5][5:8][8:]); else raw digits. */
  def normalizePhone(c: Column): Column = {
    val d = regexp_replace(c, "\\D", "")
    when(c.isNull, lit(null: String))
      .when(length(d) < 10, lit(null: String))
      .when(length(d) === 10,
        concat_ws("-", substring(d, 1, 3), substring(d, 4, 4), substring(d, 8, 3)))
      .when(length(d) === 11,
        concat_ws("-", substring(d, 1, 2), substring(d, 3, 3),
          substring(d, 6, 3), substring(d, 9, 3)))
      .otherwise(d)
  }

  /** F3 validate_email (business_transformer.py:51-57): regex-or-null. */
  val emailPattern = "^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$"
  def validEmail(c: Column): Column =
    when(c.rlike(emailPattern), c).otherwise(lit(null: String))

  /** F4 validate_url (business_transformer.py:59-68): scheme+host required. */
  def validUrl(c: Column): Column =
    when(c.rlike("^[A-Za-z][A-Za-z0-9+.-]*://[^/\\s]+"), c)
      .otherwise(lit(null: String))

  /** F5 _normalize_url (url_transformer.py:28-53): prefix https:// when no
    * scheme, truncate to maxLength. */
  def normalizeUrl(c: Column, maxLength: Int = 255): Column =
    substring(
      when(c.isNull, lit(null: String))
        .when(c.rlike("^https?://"), c)
        .otherwise(concat(lit("https://"), c)),
      1, maxLength)

  /** F6 multi-phone pipeline (business_transformer.py:91-94): split on comma,
    * normalize each, drop invalid, keep first-occurrence order, dedup. */
  def cleanPhones(c: Column): Column =
    cleanPhoneArray(transform(split(c, ","), p => trim(p)))

  /** The array-level core of [[cleanPhones]], shared with callers whose
    * phones already arrive as an array (LeadPipeline.clean) — one place for
    * the normalize/filter/distinct law. */
  def cleanPhoneArray(arr: Column): Column =
    array_distinct(filter(transform(arr, p => normalizePhone(p)), _.isNotNull))

  /** F6 at CSV egress: comma-joined string, 'N/A' when empty. */
  def phonesToString(arr: Column): Column =
    when(arr.isNull || size(arr) === 0, lit(NA)).otherwise(array_join(arr, ", "))

  /** F7 extract_id_from_url (utils.py:115-134): substring between `id=` and
    * the next `&`. */
  def extractIdFromUrl(c: Column): Column = {
    val v = regexp_extract(c, "[?&]id=([^&]*)", 1)
    when(v === "", lit(null: String)).otherwise(v)
  }

  /** F8 WhatsApp number extraction (bulk_scraper.py:123-141): `phone` query
    * param, else first digit-run of the `text` param, else digit-bearing text. */
  def whatsappNumber(href: Column, linkText: Column): Column = {
    val phone = regexp_extract(href, "[?&]phone=([^&]*)", 1)
    // query params arrive percent-encoded; the reference's parse_qs decodes
    // them before the digit scan, so %20 must not contribute digits
    val textParam = try_url_decode(regexp_extract(href, "[?&]text=([^&]*)", 1))
    val textDigits = regexp_extract(textParam, "(\\d+)", 1)
    val fromText = when(linkText.rlike("\\d"), linkText)
    val first = when(phone =!= "", phone)
    val second = when(textDigits =!= "", textDigits)
    coalesce(first, second, fromText)
  }

  /** F9 clean_social_media (tools/clean_data.py:30-39): self-referential
    * guiacores links are noise → null. */
  def cleanSocial(c: Column, noiseDomain: String = "guiacores"): Column =
    when(c.isNull || lower(c).contains(noiseDomain), lit(null: String)).otherwise(c)

  /** F10 split_address (tools/clean_data.py:41-57): rsplit on " - " — last
    * segment is the localidad, the rest rejoined is the direccion. */
  def addressParts(c: Column): Column = {
    val parts = split(c, " - ")
    val n = size(parts)
    struct(
      when(n <= 1, c)
        .otherwise(array_join(slice(parts, lit(1), n - 1), " - ")).as("direccion"),
      when(n <= 1, lit(null: String))
        .otherwise(element_at(parts, -1)).as("localidad"))
  }

  /** F11 opportunistic coercion (data_cleaner.py:46-60). */
  def coerceLong(c: Column): Column =
    when(c.rlike("^\\d+$"), c.cast("long")).otherwise(lit(null).cast("long"))
  def coerceBool(c: Column): Column =
    when(lower(c) === "true", lit(true))
      .when(lower(c) === "false", lit(false))
      .otherwise(lit(null: java.lang.Boolean))

  /** F13 horarios cleanup (bulk_scraper.py:164-176): drop the literal
    * Abierto/Cerrado status words, re-trim. */
  def cleanHorarios(c: Column): Column =
    cleanText(regexp_replace(c, "\\b(Abierto|Cerrado)\\b", ""))

  /** F14 total-matches regex (sequential_collector.py:606-639). */
  def totalMatches(c: Column): Column =
    coalesce(
      nullif(regexp_extract(c, "generado\\s+(\\d+)\\s+coincidencias", 1), lit("")),
      nullif(regexp_extract(c, "(\\d+)\\s+coincidencias", 1), lit("")))
      .cast("long")

  /** F15 digit-presence gate (bulk_scraper.py:141). */
  def hasDigit(c: Column): Column = c.rlike("\\d")

  /** F16 strip dashes/spaces (tools/clean_data.py:19). */
  def stripDashSpace(c: Column): Column = translate(c, "- ", "")
}
