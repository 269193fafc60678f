package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic hashing primitives for the dedup / fingerprint
  * operator family (SURVEY §7.2 extended ops).
  *
  * Everything here is integer arithmetic mod a 31-bit prime, built from
  * sequential left-folds over characters/tokens — so Spark and any ANSI SQL
  * engine (the DuckDB oracle included) produce bit-identical values, and the
  * driver's hash-compare gate is stable. No engine-native hash (xxhash64,
  * murmur) is used precisely because those differ across engines.
  *
  * All expressions are Catalyst higher-order functions — codegen'd, no UDFs —
  * so at 100 TB they fuse into the scan projection.
  */
object TextHash {

  /** 31-bit prime modulus: intermediate products stay far below 2^63, so the
    * same expressions run on engines with checked 64-bit overflow (DuckDB). */
  val P = 1000000007L

  /** JVM kernel for the polynomial hash — Catalyst higher-order functions run
    * interpreted (per-element lambda boxing), which dominated the dedup
    * benchmarks; a primitive JVM loop is ~10x faster and computes the exact
    * same value. Iterates CODEPOINTS to match ANSI string_split(s,'')+ascii()
    * on non-BMP input. */
  private[graft] def polyHash(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  private def tokenFold(toks: Seq[String]): Long =
    toks.foldLeft(0L)((acc, t) => (acc * 131L + polyHash(t)) % P)

  /** Polynomial rolling hash over the characters of a string:
    * fold(acc = 0; acc*31 + codepoint) mod P.
    * Backed by the native codegen expression ([[graft.plans.PolyHash]]) —
    * no catalyst↔JVM conversion, stays inside whole-stage codegen. */
  def charHash(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.plans.PolyHash(org.apache.spark.sql.GraftColumnBridge.expression(c)))

  /** Order-sensitive hash of a token array: fold(acc*131 + charHash(tok)) mod P.
    * Null-in-null-out (split(NULL) is a null array — the guard every sibling
    * kernel carries). */
  // UDF objects cached in vals (the shingleHashesUdf convention, applied
  // uniformly — review r14): a fresh udf() per column-building call pays
  // closure + encoder setup at every plan build and defeats reference-
  // equality CSE for identical subtrees
  private val tokenSeqHashUdf = udf((toks: Seq[String]) =>
    if (toks == null) null.asInstanceOf[java.lang.Long]
    else java.lang.Long.valueOf(tokenFold(toks)))

  def tokenSeqHash(tokens: Column): Column = tokenSeqHashUdf(tokens)

  /** Order-insensitive content fingerprint: tokenSeqHash over the sorted
    * distinct token set — equal iff two documents have the same vocabulary.
    * (Scala sort = codepoint-lexicographic, matching ANSI list_sort binary
    * collation for ASCII/BMP input.) Null-in-null-out. */
  private val contentHashUdf = udf((toks: Seq[String]) =>
    if (toks == null) null.asInstanceOf[java.lang.Long]
    else java.lang.Long.valueOf(tokenFold(toks.distinct.sorted)))

  def contentHash(tokens: Column): Column = contentHashUdf(tokens)

  /** Reference expression forms (Catalyst HOF folds) — semantics oracle for
    * the JVM kernels above; see TextHashSpec's equivalence property. */
  private[graft] def charHashExpr(c: Column): Column =
    aggregate(split(c, "", 0), lit(0L),
      (acc, ch) => (acc * 31L + ascii(ch).cast("long")) % P)
  private[graft] def tokenSeqHashExpr(tokens: Column): Column =
    aggregate(tokens, lit(0L), (acc, t) => (acc * 131L + charHashExpr(t)) % P)

  /** Whitespace tokenization matching ANSI string_split(text, ' ') exactly
    * (single-space separator, empties preserved) so oracles tokenize alike. */
  def tokens(text: Column): Column = split(text, " ", -1)

  /** 3-gram shingle hashes per doc, composed from per-token hashes via the
    * polynomial identity h(A||B) = h(A)·31^len(B) + h(B) mod P — each shingle
    * is O(1) arithmetic instead of re-hashing its characters, no shingle
    * string is ever materialized, and the result is per-doc distinct (so the
    * consumer needs no distinct() shuffle). Values are EXACTLY
    * charHash(tok_i ++ " " ++ tok_{i+1} ++ " " ++ tok_{i+2}) — the equality
    * is property-tested in TextHashSpec and every oracle replays the
    * character-fold form. */
  def shingleHashes(toks: Column): Column = shingleHashesUdf(toks)

  private[graft] def shingleHashKernel(toks: Seq[String]): Array[Long] =
    shingleHashSeqKernel(toks).distinct

  /** POSITIONAL 3-gram shingle hashes (index i = the gram starting at
    * token i, 0-based) — the non-distinct core of [[shingleHashKernel]];
    * winnowing needs positions, the set consumers dedup on top. */
  private[graft] def shingleHashSeqKernel(toks: Seq[String]): Array[Long] =
    if (toks == null || toks.length < 3) Array.empty[Long]
    else {
      val n = toks.length
      val th = new Array[Long](n) // polyHash(tok)
      val pw = new Array[Long](n) // 31^codepointLen(tok) mod P
      var i = 0
      while (i < n) {
        val t = toks(i)
        var acc = 0L; var p = 1L; var j = 0
        while (j < t.length) {
          val cp = t.codePointAt(j)
          acc = (acc * 31L + cp) % P
          p = (p * 31L) % P
          j += Character.charCount(cp)
        }
        th(i) = acc; pw(i) = p
        i += 1
      }
      val out = new Array[Long](n - 2)
      i = 0
      while (i < n - 2) {
        var h = th(i)
        h = (h * 31L + 32L) % P                 // the joining space
        h = (h * pw(i + 1) + th(i + 1)) % P
        h = (h * 31L + 32L) % P
        h = (h * pw(i + 2) + th(i + 2)) % P
        out(i) = h
        i += 1
      }
      out
    }

  /** Winnowing fingerprint selection (Schleimer et al. SIGMOD 2003,
    * "robust winnowing"): slide a window of `w` consecutive 3-gram hashes;
    * in each window select the minimum, breaking ties RIGHTMOST (the `<=`
    * in the scan) — the robust variant that re-selects the same position
    * across overlapping windows, minimizing fingerprint density. Returns
    * the doc's DISTINCT selected hashes, ascending (deterministic egress).
    * Guarantee: two docs sharing a token run of length ≥ w + 2 (w grams)
    * share at least one fingerprint. Docs with fewer than w grams yield
    * none. Density ~ 2/(w+1) of grams in expectation. */
  private[graft] def winnowKernel(toks: Seq[String], w: Int): Array[Long] = {
    val hs = shingleHashSeqKernel(toks)
    if (hs.length < w) return Array.empty[Long]
    val sel = new java.util.TreeSet[java.lang.Long]()
    var s = 0
    while (s + w <= hs.length) {
      var best = s
      var i = s + 1
      while (i < s + w) { if (hs(i) <= hs(best)) best = i; i += 1 }
      sel.add(hs(best))
      s += 1
    }
    val out = new Array[Long](sel.size)
    val it = sel.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    out
  }

  // per-w memo: the UDF closes over w, so one cached instance per distinct
  // window width (a handful session-wide)
  private val winnowUdfs =
    new java.util.concurrent.ConcurrentHashMap[Int, org.apache.spark.sql.expressions.UserDefinedFunction]()

  /** [[winnowKernel]] as a column function. */
  def winnowFingerprints(toks: Column, w: Int): Column =
    winnowUdfs.computeIfAbsent(w,
      ww => udf((ts: Seq[String]) => winnowKernel(ts, ww))).apply(toks)

  private val shingleSeqHashesUdf =
    udf((ts: Seq[String]) => shingleHashSeqKernel(ts))

  /** [[shingleHashSeqKernel]] as a column function: POSITIONAL (non-
    * distinct) 3-gram hashes — for consumers that count occurrences
    * (q140 diversity) rather than set-intersect. */
  def shingleSeqHashes(toks: Column): Column = shingleSeqHashesUdf(toks)

  private val shingleHashesUdf =
    udf((toks: Seq[String]) => shingleHashKernel(toks))

  /** Canonical text normalization for exact dedup: lowercase, collapse
    * whitespace runs, trim. Two review-r14 rules:
    *   - collapse BEFORE trim: Spark's trim strips only spaces, so a
    *     leading tab would survive trim-then-collapse as a leading space
    *     and two otherwise-identical texts would fingerprint apart
    *     (idempotence: normalizeText(normalizeText(x)) == normalizeText(x));
    *   - the whitespace CLASS is pinned to Java's `\s` = `[\t-\r ]` and the
    *     oracle twin spells that class out explicitly for RE2
    *     ([[duckNormalizeSql]]): the engines' native `\s` shorthands
    *     DIFFER on \x0B (Java includes it, RE2 doesn't), so one side must
    *     not use a shorthand the other can't replicate. Java's built-in
    *     `\s` is kept on the Spark side because it is measurably ~30%
    *     faster than any explicit class in java.util.regex (probed r14:
    *     q34/q95/q150 0.52→0.94 s under the wide class) and `[\t-\r ]` is
    *     its exact RE2 spelling. The fingerprint law is therefore
    *     ASCII-whitespace scoped by design — unicode-wide cleaning (NBSP
    *     etc.) is the ETL surface's job ([[CleanFunctions.cleanText]],
    *     which pays the full [[CleanFunctions.Ws]] class where F1
    *     fidelity, not fingerprint speed, is the point. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** [[normalizeText]]'s DuckDB replica — splice into oracle SQL wherever
    * the exact-dedup fingerprint law is mirrored. `[\t-\r ]` IS Java `\s`,
    * spelled so RE2 implements the identical set (incl. \x0B). */
  def duckNormalizeSql(col: String): String =
    s"trim(regexp_replace(lower($col), '[\\t-\\r ]+', ' ', 'g'))"

  /** Word n-gram shingles (distinct), the MinHash/Jaccard unit.
    * Spark's sequence(1, k) descends when k < 1, so short docs need the
    * explicit empty-array guard (ANSI range(1, k+1) is just empty there). */
  def shingles(tokens: Column, n: Int): Column =
    when(size(tokens) >= n,
      array_distinct(
        transform(
          sequence(lit(1), size(tokens) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(k => element_at(tokens, i + k)): _*))))
      .otherwise(array().cast("array<string>"))
}
