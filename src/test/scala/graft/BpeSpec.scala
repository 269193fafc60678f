package graft

import graft.functions.Bpe

/** Learned BPE subword tokenizer: the distributed trainer must equal a
  * naive single-threaded reference on the same corpus, the encoder must be
  * the trainer's exact dual, and everything must be deterministic. */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  /** Codepoint-order string compare — Spark's UTF-8 binary ordering, which
    * differs from Java String (UTF-16) order on supplementary-plane chars. */
  private def cpLess(x: String, y: String): Boolean = {
    val xi = x.codePoints().toArray
    val yi = y.codePoints().toArray
    val n = math.min(xi.length, yi.length)
    var i = 0
    while (i < n) { if (xi(i) != yi(i)) return xi(i) < yi(i); i += 1 }
    xi.length < yi.length
  }

  /** Naive in-memory BPE trainer (textbook form, same tie-break: count
    * DESC, then pair ASC in codepoint order to match the engine). */
  private def naiveTrain(texts: Seq[String], nMerges: Int): Seq[(String, String)] = {
    var vocab: Map[List[String], Long] = texts
      .flatMap(_.trim.toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        // segment by CODEPOINT (like the engine), not UTF-16 char — per-char
        // mapping would shear supplementary-plane symbols into surrogates
        (w.codePoints().toArray
          .map(cp => new String(Character.toChars(cp))).toList :+ Bpe.Eow) ->
          ws.size.toLong
      }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.length < nMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- vocab; p <- syms.zip(syms.tail))
        counts(p) = counts.getOrElse(p, 0L) + f
      if (counts.isEmpty) continue = false
      else {
        val (p, n) = counts.toSeq.sortWith {
          case (((a1, b1), c1), ((a2, b2), c2)) =>
            if (c1 != c2) c1 > c2
            else if (a1 != a2) cpLess(a1, a2)
            else cpLess(b1, b2)
        }.head
        if (n < 2) continue = false
        else {
          merges += p
          def apply(syms: List[String]): List[String] = syms match {
            case a :: b :: rest if (a, b) == p => (a + b) :: apply(rest)
            case s :: rest => s :: apply(rest)
            case Nil => Nil
          }
          vocab = vocab.map { case (syms, f) => apply(syms) -> f }
        }
      }
    }
    merges.toSeq
  }

  private val corpus = Seq(
    "low low low low low", "lower lower", "newest newest newest",
    "newest newest newest", "widest widest widest", "new new news")

  test("distributed trainer equals the naive reference merge-for-merge") {
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val dist = Bpe.train(docs, nMerges = 12)
    val naive = naiveTrain(corpus, nMerges = 12)
    assert(dist == naive, s"\ndistributed: $dist\nnaive:       $naive")
    assert(dist.nonEmpty && dist == Bpe.train(docs, 12)) // deterministic
  }

  test("encoder is the trainer's dual: training words re-encode to their final segmentation") {
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, nMerges = 20)
    val rank = merges.zipWithIndex.toMap
    // "low" was fully merged during training → 1 token; novel word falls
    // back to learned subwords, never fails
    assert(Bpe.encodeWord("low", rank) == Seq("low" + Bpe.Eow))
    val novel = Bpe.encodeWord("lowest", rank)
    assert(novel.mkString == "lowest" + Bpe.Eow) // lossless segmentation
    assert(novel.length > 1 && novel.head.startsWith("low"))
  }

  test("tokenCounts is a narrow broadcast stage over the corpus") {
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, nMerges = 12)
    val counts = Bpe.tokenCounts(docs, merges)
    // no shuffle anywhere: tokenization must not exchange the corpus
    assert(!counts.queryExecution.executedPlan.toString.contains("Exchange"),
      counts.queryExecution.executedPlan.toString)
    val m = counts.as[(Long, Long)].collect().toMap
    assert(m.size == corpus.size)
    // more merges => counts never increase (monotone compression)
    val fewer = Bpe.tokenCounts(docs, merges.take(3)).as[(Long, Long)]
      .collect().toMap
    assert(m.keys.forall(k => m(k) <= fewer(k)))
    // and with zero merges, count = total codepoints + one EOW per word
    val zero = Bpe.tokenCounts(docs, Nil).as[(Long, Long)].collect().toMap
    val expected = corpus.zipWithIndex.map { case (t, i) =>
      val ws = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      i.toLong -> ws.map(w => w.codePointCount(0, w.length) + 1).sum.toLong
    }.toMap
    assert(zero == expected)
  }

  test("trainer/reference agree on a non-BMP corpus (codepoint tie-break)") {
    // U+1F600 (emoji, UTF-16 lead 0xD83D) vs U+FFFD: codepoint order and
    // Java's UTF-16 order DISAGREE on this pair, and the counts are
    // engineered to tie — the reference must sort like the engine does
    val e = new String(Character.toChars(0x1F600))
    val r = "�"
    val texts = Seq(s"${e}a ${r}a ${e}a ${r}a", s"b$e b$r b$e b$r")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    assert(Bpe.train(docs, 6) == naiveTrain(texts, 6))
  }

  test("batched trainer equals sequential merge-for-merge (toy corpus)") {
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val sequential = Bpe.train(docs, nMerges = 30)
    for (k <- Seq(2, 4, 8)) {
      val batched = Bpe.train(docs, nMerges = 30, batchK = k)
      assert(batched == sequential,
        s"batchK=$k diverged\nbatched:    $batched\nsequential: $sequential")
    }
  }

  test("batched trainer scales to a 256-merge vocab and still equals the reference") {
    // real fixture text, production-sized vocab slice: the batch rule must
    // hold where top pair counts tie and share symbols constantly — and in
    // far fewer distributed passes than merges (the whole point of batching)
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val texts = docs.select("text").as[String].collect().toSeq
    val batched = Bpe.train(docs, nMerges = 256, batchK = 16)
    // the sf0.001 vocabulary exhausts (top pair count < 2) at ~105 merges:
    // the run proves the batch rule across the FULL learnable vocab, two
    // orders past the toy corpus, stop condition included
    assert(batched.length >= 100, s"vocab exhausted early: ${batched.length}")
    assert(batched.distinct.length == batched.length)
    // exact batching saves what tie-heavy text allows (~9% here) — the
    // assert is only that it never costs MORE passes than merges; the real
    // pass cut is the approximate mode's job (next test)
    assert(Bpe.lastTrainPasses <= batched.length)
    assert(batched == naiveTrain(texts, 256))
  }

  test("approximate batching cuts driver passes; merges stay valid and deterministic") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val approx = Bpe.train(docs, nMerges = 256, batchK = 16, exact = false)
    val passes = Bpe.lastTrainPasses
    assert(approx.length >= 100)
    assert(approx.distinct.length == approx.length)
    // the production claim: a 32k vocab is NOT 32k driver round-trips
    assert(passes * 2 <= approx.length,
      s"approximate batching saved too little: $passes passes for ${approx.length} merges")
    assert(approx == Bpe.train(docs, 256, 16, exact = false)) // deterministic
    // encoder duality holds under ANY rank list: lossless segmentation
    val rank = approx.zipWithIndex.toMap
    assert(Bpe.encodeWord("customer", rank).mkString == "customer" + Bpe.Eow)
  }

  test("approximate batching is CLOSE to exact: measured vocab + token bounds") {
    // "approximate" was a mode with no measured distance from the truth —
    // every property held (valid disjoint merges, deterministic, big pass
    // cut) but nothing bounded how far the learned vocab could drift from
    // the sequential trainer's. Two bounds, both on the full learnable
    // vocab of the fixture corpus:
    //  1. vocab membership: the approximate merge list may legally REORDER
    //     (a merge-created pair can outrank a later batch member), so
    //     closeness is set overlap of learned subwords, not list equality;
    //  2. downstream effect: corpus-total subword token counts under the
    //     two vocabs — what a token-budget user actually consumes.
    // Measured at 256 merges / batchK=16 on this fixture: 0.848 vocab
    // overlap (89/105; drift is tie-plateau reordering only — the batch
    // rule truncates at the first-skipped count level, so nothing below a
    // skipped count level is ever committed) and sub-1% token drift.
    // Bounds pinned under the measurement so real drift regressions fail
    // while fixture noise doesn't. The earlier unbounded batch rule
    // measured 0.61 here — this test is what exposed it.
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val exact = Bpe.train(docs, nMerges = 256, batchK = 16)
    val approx = Bpe.train(docs, nMerges = 256, batchK = 16, exact = false)
    val ev = exact.map { case (a, b) => a + b }.toSet
    val av = approx.map { case (a, b) => a + b }.toSet
    val overlap = (ev intersect av).size.toDouble / ev.size
    info(f"vocab overlap: $overlap%.3f (${(ev intersect av).size}/${ev.size}); " +
      s"exact=${exact.length} approx=${approx.length} merges")
    assert(overlap >= 0.80, f"approximate vocab drifted: overlap $overlap%.3f")
    val en = Bpe.tokenCounts(docs, exact)
      .agg(org.apache.spark.sql.functions.sum("n_subword_tokens")).as[Long].head()
    val an = Bpe.tokenCounts(docs, approx)
      .agg(org.apache.spark.sql.functions.sum("n_subword_tokens")).as[Long].head()
    val drift = math.abs(en - an).toDouble / en
    info(f"corpus tokens: exact=$en approx=$an drift=$drift%.4f")
    assert(drift <= 0.02, f"token-count drift $drift%.4f exceeds 2%%")
  }

  test("pinnedMerges is exactly what train() learns from the sf0.01 fixture") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
      .select("doc_id", "text")
    assert(Bpe.train(docs, Bpe.pinnedMerges.length) == Bpe.pinnedMerges,
      "pinned tokenizer out of sync with the trainer — re-derive pinnedMerges")
  }

  test("trainer runs on the real documents fixture at spec scale") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val merges = Bpe.train(docs, nMerges = 8)
    assert(merges.length == 8)
    assert(merges.distinct.length == 8) // no merge learned twice
    val counts = Bpe.tokenCounts(docs, merges)
    assert(counts.count() == docs.count())
  }
}
