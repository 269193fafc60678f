package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenizer — the REAL learned form of the
  * "BPE-ish" token counting in q31/q84 (reference has no tokenizer at all;
  * public algorithm: Sennrich et al. 2016, "Neural Machine Translation of
  * Rare Words with Subword Units").
  *
  * Spark shape, designed for the 100 TB corpus the engine targets:
  *
  *  - TRAIN runs on the WORD-TYPE table, not the corpus: one
  *    explode+groupBy shuffle reduces 100 TB of text to a vocab-sized
  *    (word, freq) table, and every merge iteration is (a) a map-side-
  *    combined pair-count aggregation over that small table plus (b) a
  *    1-row argmax collect — the q81-style driver-coordinated loop where
  *    per-round driver metadata is O(1). Lineage is truncated per round
  *    (localCheckpoint) exactly like the label-propagation loop, or the
  *    nested plan re-analysis cost explodes.
  *  - ENCODE is a narrow per-partition map with the learned merge ranks
  *    broadcast (a few KB) — the corpus never shuffles to be tokenized.
  *
  * Determinism: pair-count ties break lexicographically (count DESC, pair
  * ASC in CODEPOINT order — Spark compares strings as UTF-8 bytes, which
  * is codepoint order, NOT Java's UTF-16 code-unit order; they differ for
  * supplementary-plane symbols), so the learned merge list — and therefore
  * every token count — is a pure function of the corpus.
  */
object Bpe {

  /** End-of-word marker (classic BPE): distinguishes "low" in "lowest"
    * from word-final "low". A printable sentinel the fixture text never
    * contains. */
  val Eow = "·"

  private def wordSymbols(w: String): Array[String] = {
    val cps = w.codePoints().toArray
    val syms = new Array[String](cps.length + 1)
    var i = 0
    while (i < cps.length) { syms(i) = new String(Character.toChars(cps(i))); i += 1 }
    syms(cps.length) = Eow
    syms
  }

  /** Lowercased word stream of a text column (the q31 token law's word
    * split, kept identical so counts are comparable). */
  def words(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    split(lower(trim(text)), "\\s+")

  /** The PINNED tokenizer: the first 16 merges [[train]] learns from the
    * sf0.01 documents fixture (BpeSpec re-derives and asserts this).
    * Tokenizing with a FIXED public vocabulary is the production shape —
    * you train a tokenizer once and count tokens with it everywhere — and
    * a fixed list is what lets q104's DuckDB oracle replay the encoder
    * exactly (chained separator replaces, see the q104 oracle). */
  val pinnedMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("e", Eow), ("n", Eow), ("er", Eow), ("o", "w"),
    ("ow", Eow), ("o", "r"), ("s", "t"), ("h", Eow), ("a", "t"),
    ("l", "u"), ("i", "n"), ("a", Eow), ("g", Eow), ("y", Eow),
    ("a", "r"))

  /** Learn `nMerges` merges from the corpus. Returns the ordered merge
    * list (highest-priority first). `docs` needs a `text` column.
    *
    * `batchK` > 1 applies up to that many merges per distributed pass —
    * the scale knob for a production vocab (a 32k-merge vocab at batchK=1
    * is 32k driver round-trips). Two batch rules:
    *
    * `exact = true` (default): the batch is chosen so batched training is
    * EXACTLY sequential training, tie-breaks included (BpeSpec asserts
    * list equality on toy and fixture corpora):
    *
    *  - accept a PREFIX of the (count DESC, pair ASC) pair list whose
    *    members are pairwise disjoint — no shared symbol, and no member's
    *    concatenation string-equals another member's symbol or
    *    concatenation (a merge whose output collides with a batch symbol
    *    would interact) — stopping at the first entry that overlaps;
    *  - applying an accepted merge only changes/creates pairs that OVERLAP
    *    it, and a created pair (x, ab)'s count is bounded by the old count
    *    of (x, a) — an overlapping, therefore non-accepted, pair. So every
    *    count sequential training could newly prefer is ≤ nBound, the
    *    largest non-accepted count (the stopper's, or the collection
    *    boundary's). Keeping only members that rank strictly above nBound
    *    reproduces the sequential argmax at every step of the batch.
    *
    * On tie-heavy natural text the exact rule degenerates toward one
    * merge per pass (top pairs share 'e'/'t'-like symbols constantly) —
    * the price of bit-exactness, measured at ~9% pass savings on the
    * fixture corpus.
    *
    * `exact = false`: classic approximate batching (the standard
    * distributed-trainer trade): accept every pairwise-disjoint pair in
    * the head, capped at batchK, no rank-safety truncation. Each accepted
    * merge's count is still its TRUE count (disjoint members cannot
    * change each other's counts), so every merge is individually valid;
    * only the global ORDER may deviate from sequential where a
    * merge-created pair would have outranked a later batch member.
    * Deterministic for a fixed corpus. BpeSpec measures the pass
    * reduction and pins determinism; production vocab builds use this
    * mode, oracle-pinned artifacts use exact. */
  /** Distributed passes (pair-count jobs) the most recent [[train]] call
    * made — the quantity batching exists to cut. Test-instrumentation. */
  private[graft] var lastTrainPasses: Int = 0

  def train(docs: DataFrame, nMerges: Int,
      batchK: Int = 1, exact: Boolean = true): Seq[(String, String)] = {
    require(batchK >= 1, s"batchK must be >= 1, got $batchK")
    lastTrainPasses = 0
    val spark = docs.sparkSession
    import spark.implicits._
    // corpus → word-type table: the ONLY corpus-sized job in training
    val wordFreq = docs
      .select(explode(words(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
    var seg = wordFreq
      .map { case (w, f) => (wordSymbols(w), f) }
      .toDF("syms", "freq")
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    // outputs of every COMMITTED merge: a batch member whose concatenation
    // equals one of these re-creates an existing symbol, so applying it
    // GROWS the counts of that symbol's neighbor pairs — counts the
    // batch's snapshot cannot see. Within-batch interactions are covered
    // by the `used` sets; this covers the cross-round case (review r14).
    val committedOutputs = scala.collection.mutable.Set.empty[String]
    var continue = true
    while (continue && merges.length < nMerges) {
      // adjacent-pair counts weighted by word frequency; deterministic
      // order = (count DESC, a ASC, b ASC) — ONE tiny head collect (the
      // head is batch-selection metadata, vocab-bounded, never row-sized)
      val want = math.min(batchK, nMerges - merges.length)
      val topN = math.max(want * 8, 64)
      lastTrainPasses += 1
      val top = seg
        .select(col("freq"), explode(expr(
          "transform(slice(syms, 1, size(syms) - 1), (s, i) -> struct(s AS a, syms[i + 1] AS b))"))
          .as("p"))
        .groupBy(col("p.a"), col("p.b"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(topN)
        .collect()
      val entries = top.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      // disjoint walk (see scaladoc): exact mode stops at the first
      // overlap (prefix rule); approximate mode skips it and keeps
      // scanning — within-batch disjointness (incl. the concatenation
      // guard) is what application correctness needs in both modes
      val used = scala.collection.mutable.Set.empty[String]
      val accepted =
        scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      var idx = 0
      var overlapped = false
      var firstSkipN = -1L // count of the first overlap-skipped entry
      while (!overlapped && idx < entries.length && accepted.length < want) {
        val (a, b, n) = entries(idx)
        if (accepted.nonEmpty &&
            (used(a) || used(b) || used(a + b) ||
              (exact && committedOutputs(a + b)))) {
          if (exact) overlapped = true
          else { if (firstSkipN < 0) firstSkipN = n; idx += 1 }
        } else {
          accepted += ((a, b, n))
          used += a; used += b; used += (a + b)
          idx += 1
          // exact mode: a merge that re-creates an EXISTING symbol changes
          // neighbor-pair counts in ways sequential training would see at
          // its next recount — close the batch right after it (it may lead
          // the batch, since sequential would also merge it first)
          if (exact && committedOutputs(a + b)) overlapped = true
        }
      }
      // Largest count sequential training could see OUTSIDE the accepted
      // set: the first skipped/stopper entry (counts are DESC, so the first
      // is the max), else the first unvisited entry, else — when the head
      // was cut at topN — the collection boundary.
      val nBound =
        if (firstSkipN >= 0) firstSkipN
        else if (idx < entries.length) entries(idx)._3
        else if (entries.length == topN) entries.last._3
        else 1L
      // exact: keep only members ranking STRICTLY above nBound — batched ==
      // sequential, tie-breaks included (see scaladoc). approximate: keep
      // members down TO nBound (ties at the boundary allowed) — a merge-
      // created pair's count is bounded by an overlapping (hence skipped)
      // old count ≤ nBound, so sequential order can deviate only inside the
      // boundary tie plateau, never across a count level. Without this
      // truncation the batch committed tail merges whole count-levels below
      // anything skipped, and the learned vocab drifted to 0.61 set-overlap
      // vs exact on the fixture; with it, drift is plateau-reordering only
      // (0.85 overlap at the same pass cut — BpeSpec pins the bound).
      val keepInBatch: Long => Boolean =
        if (exact) _ > nBound else _ >= nBound
      val batch = (accepted.headOption.toSeq ++
        accepted.drop(1).takeWhile(t => keepInBatch(t._3)))
        .filter(_._3 >= 2).map(t => (t._1, t._2))
      if (batch.isEmpty) continue = false
      else {
        merges ++= batch
        committedOutputs ++= batch.map { case (a, b) => a + b }
        val bmap = batch.map { case (a, b) => (a, b) -> (a + b) }.toMap
        val applyMerge = udf { syms: Seq[String] =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            val m = if (i + 1 < syms.length) bmap.get((syms(i), syms(i + 1)))
              else None
            m match {
              case Some(s) => out += s; i += 2
              case None => out += syms(i); i += 1
            }
          }
          out.toSeq
        }
        val next = seg.withColumn("syms", applyMerge(col("syms")))
          .localCheckpoint() // truncate per-round lineage (q81's rule)
        // next is materialized (eager checkpoint): free the superseded
        // round's BLOCKS — Dataset.unpersist is a no-op on checkpoint
        // storage and a 32k-merge vocab would leak 32k word-type tables
        graft.Checkpoints.release(seg)
        seg = next
      }
    }
    graft.Checkpoints.release(seg)
    merges.toSeq
  }

  /** Tokenize one word under the learned merges: repeatedly apply the
    * highest-priority (lowest-rank) applicable merge — the exact encoder
    * dual of the trainer's greedy loop. */
  def encodeWord(w: String, rank: Map[(String, String), Int]): Seq[String] = {
    var syms = wordSymbols(w).toSeq
    var done = false
    while (!done && syms.length > 1) {
      var best = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = i }
        i += 1
      }
      if (best < 0) done = true
      else syms = (syms.take(best) :+ (syms(best) + syms(best + 1))) ++ syms.drop(best + 2)
    }
    syms
  }

  /** Per-doc subword token counts under a learned merge list: narrow
    * mapPartitions with the rank map broadcast; `docs` needs
    * (doc_id, text). */
  def tokenCounts(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rankB = spark.sparkContext.broadcast(
      merges.zipWithIndex.toMap)
    docs.select(col("doc_id"), words(col("text")).as("ws"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val rank = rankB.value
        it.map { case (id, ws) =>
          // split(NULL) decodes to a null Seq: degrade to 0 tokens, the
          // same answer the oracle's LEFT JOIN gives a null-text doc
          val n = Option(ws).getOrElse(Seq.empty).iterator
            .filter(_.nonEmpty)
            .map(w => encodeWord(w, rank).length).sum
          (id, n.toLong)
        }
      }
      .toDF("doc_id", "n_subword_tokens")
  }
}
