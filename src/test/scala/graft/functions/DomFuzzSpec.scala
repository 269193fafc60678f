package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Generative laws for the tolerant DOM path (SURVEY §2.9 round-12 DOM
  * variant). The GoldenPipelineSpec malformed suite pins EXAMPLES of
  * BeautifulSoup-grade tolerance; this spec pins the LAWS behind them:
  *
  *  1. parse is total and linear-tempered on arbitrary tag soup — a fuzz
  *     surface a hand-written parser must hold where a library parser is
  *     presumed-hardened (reference relies on BeautifulSoup's,
  *     bulk_scraper.py:64-111);
  *  2. pathological shapes (unclosed comment/script/quote, 5k-deep nesting,
  *     attr floods, stray-close floods) terminate without error;
  *  3. render∘parse is identity on arbitrary well-formed trees under
  *     RANDOMIZED serialization style — quote style, tag-name case,
  *     comment injection — the tolerance dimensions themselves;
  *  4. the H1–H11 extraction record of the REAL fixture pages is invariant
  *     under tolerance-preserving mutations (attribute reorder,
  *     class-token reorder, requoting, case-mixing, comment injection) —
  *     the generalized form of the malformed-page examples.
  *
  * Fixed seeds keep failures reproducible (PropertySpec convention).
  */
class DomFuzzSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int, seed: Long = 42L): List[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)

  // ---- law 1: totality on tag soup ---------------------------------------

  private val soupChar: Gen[Char] = Gen.frequency(
    (6, Gen.oneOf('<', '>', '/', '=', '"', '\'', '!', '-', '&', ';', ' ')),
    (4, Gen.alphaNumChar))

  test("parse is total and deterministic on arbitrary tag soup") {
    samples(Gen.listOf(soupChar).map(_.mkString), 500).foreach { s =>
      val doc = TolerantDom.parse(s) // must not throw
      // entity decode and trim only ever shrink: extracted text is bounded
      // by the input
      assert(doc.root.text.length <= s.length, s"text grew for soup: $s")
      // structural determinism (case-class equality over the whole tree)
      assert(doc.root == TolerantDom.parse(s).root, s"nondeterministic: $s")
    }
  }

  // ---- law 2: pathological shapes terminate ------------------------------

  test("pathological inputs terminate without error") {
    val cases = Seq(
      "open-brackets" -> "<" * 20000,
      "attr-flood" -> ("<div " + "a=b " * 5000 + ">"),
      "unclosed-comment" -> ("<!--" + "x" * 100000),
      "unclosed-script" -> ("<script>" + "if (a<b) {}" * 5000),
      "deep-nesting" -> ("<div>" * 5000 + "text"),
      "stray-close-flood" -> ("</div>" * 5000),
      "entity-flood" -> ("&#x41;&amp;&bogus;&#999999999;" * 2000),
      "unclosed-quote" -> ("<a href='" + "x" * 50000))
    cases.foreach { case (name, s) =>
      val doc = TolerantDom.parse(s)
      assert(doc.root != null, name)
    }
    // EOF recovery on the deep case still yields the full chain
    val deep = TolerantDom.parse("<div>" * 5000 + "text")
    assert(deep.all.length == 5000)
    assert(deep.root.text == "text")
  }

  test("numeric character references decode per the HTML5 error rules") {
    // valid refs decode; null/surrogate/out-of-range decode to U+FFFD (what
    // a DOM parser emits — never a lone surrogate, which is ill-formed
    // UTF-16 that downstream CSV/JSON writers mangle codec-dependently);
    // malformed refs (`&#abc;`: hex digits, no x) stay literal like a
    // browser leaves them
    assert(TolerantDom.decodeEntities("&#x41;&#66;") == "AB")
    assert(TolerantDom.decodeEntities("&#x1F600;") ==
      new String(Character.toChars(0x1F600)))
    for (bad <- Seq("&#xD800;", "&#xDFFF;", "&#0;", "&#x110000;",
        "&#99999999999999999;"))
      assert(TolerantDom.decodeEntities(bad) == "�", bad)
    assert(TolerantDom.decodeEntities("&#abc;") == "&#abc;")
    // the decoded text never contains an unpaired surrogate
    val out = TolerantDom.parse("<p>a&#xD800;b</p>").root.text
    assert(out == "a�b")
    // C1-range refs remap per the HTML5 windows-1252 table: `&#146;` in a
    // Word-authored page is a right single quote, not an invisible control
    // char (the exact error class real scraped business pages carry)
    assert(TolerantDom.decodeEntities("Joe&#146;s Bar") == "Joe’s Bar")
    assert(TolerantDom.decodeEntities("&#x80;&#133;&#x99;") == "€…™")
    // the five table-absent code points pass through unchanged, as browsers do
    assert(TolerantDom.decodeEntities("&#x81;&#x90;") == "\u0081\u0090")
    // ONE decode pass, never a rescan of a replacement's output: `&#38;amp;`
    // is the literal text `&amp;` (a browser decodes each ref exactly once),
    // and `&amp;#146;` is the literal text `&#146;` \u2014 the two orderings that
    // break under any chained two-pass numeric-then-named implementation
    assert(TolerantDom.decodeEntities("&#38;amp;") == "&amp;")
    assert(TolerantDom.decodeEntities("&amp;#146;") == "&#146;")
    assert(TolerantDom.decodeEntities("&#38;lt;b&#38;gt;") == "&lt;b&gt;")
    // the HTML 4 named table a Spanish business directory actually uses:
    // accented Latin-1 names decode exactly as BeautifulSoup resolves them
    assert(TolerantDom.decodeEntities("Se&ntilde;or Caf&eacute; N&ordm; 3") ==
      "Señor Café Nº 3")
    assert(TolerantDom.decodeEntities("&Aacute;lvarez &amp; C&iacute;a &copy;") ==
      "Álvarez & Cía ©")
    assert(TolerantDom.decodeEntities("a &ndash; b &hellip; &euro;5 &trade;") ==
      "a – b … €5 ™")
    // unknown names are literal text, untouched — as a browser leaves them
    assert(TolerantDom.decodeEntities("&foo; &nosuchref;") == "&foo; &nosuchref;")
  }

  test("legacy refs decode without the semicolon (HTML5 legacy set)") {
    // Word-authored pages carry bare &ntilde / &nbsp — the HTML5 legacy
    // set (Latin-1 + quot/amp/lt/gt + the uppercase six) decodes with no
    // trailing semicolon, longest name first
    assert(TolerantDom.decodeEntities("Se&ntilde or") == "Señ or")
    assert(TolerantDom.decodeEntities("a&nbsp b") == "a\u00A0 b")
    assert(TolerantDom.decodeEntities("x &amp y &AMP z") == "x & y & z")
    // the spec's "&notit" example: the longest legacy PREFIX is consumed
    assert(TolerantDom.decodeEntities("I'm &notit") == "I'm ¬it")
    // an unknown name WITH a semicolon stays LITERAL — deliberate
    // deviation from a full-table browser (which renders "©right;"):
    // prefix-consuming with a PARTIAL table would corrupt genuine HTML5
    // entities it doesn't carry ("&notin;" → "¬in;" where a browser has ∉)
    assert(TolerantDom.decodeEntities("&copyright;") == "&copyright;")
    assert(TolerantDom.decodeEntities("&notin;") == "&notin;")
    // apos is NOT in the legacy set — bare &apos stays literal
    assert(TolerantDom.decodeEntities("&apos x") == "&apos x")
    // attribute rule: a bare legacy ref followed by ASCII alnum or '='
    // is not a reference — URLs keep their query strings intact
    assert(TolerantDom.decodeEntities("?a=1&copy=2", inAttr = true)
      == "?a=1&copy=2")
    assert(TolerantDom.decodeEntities("?a=1&copy", inAttr = true) == "?a=1©")
    assert(TolerantDom.decodeEntities("I'm &notit", inAttr = true)
      == "I'm &notit")
    // in TEXT the same string DOES decode — browser parity both ways
    assert(TolerantDom.decodeEntities("?a=1&copy=2") == "?a=1©=2")
    // end-to-end through parse: attribute vs text context
    val doc = TolerantDom.parse(
      """<a href="?id=1&copy=2">&ntilde and &copy</a>""")
    val a = doc.all.find(_.tag == "a")
      .getOrElse(fail("no <a> parsed"))
    assert(a.attr("href").contains("?id=1&copy=2"))
    assert(a.text == "ñ and ©")
  }

  test("raw-text close-tag scan requires a name boundary (HTML5 tokenizer)") {
    // `</scripty` inside a <script> body is script text, not the close of
    // <script>: the scan must keep looking for a close tag whose name is
    // followed by whitespace, '/', '>' or EOF
    val d = TolerantDom.parse("""<script>var re = "</scripty";</script><h1>T</h1>""")
    assert(d.root.text == "T")
    assert(d.all.map(_.tag) == Vector("script", "h1"))
    // whitespace and solidus after the name still close the element
    assert(TolerantDom.parse("<script>x</script ><p>ok</p>").root.text == "ok")
    assert(TolerantDom.parse("<style>.a{}</style/><p>ok</p>").root.text == "ok")
    // unterminated raw text (boundary never satisfied) runs to EOF, totality intact
    assert(TolerantDom.parse("<script>a</scripty>b").root.text == "")
  }

  // ---- law 3: render∘parse identity under randomized style ---------------

  private val tagGen = Gen.oneOf("div", "span", "a", "p", "i", "b", "h1")
  private val attrGen: Gen[(String, String)] = Gen.zip(
    Gen.oneOf("class", "href", "id", "data-lat", "onclick", "itemprop"),
    Gen.listOf(Gen.frequency((8, Gen.alphaNumChar), (1, Gen.const(' ')),
      (1, Gen.const('-')))).map(_.mkString))
  private val textGen: Gen[String] = Gen.listOf(Gen.frequency(
    (8, Gen.alphaNumChar), (2, Gen.const(' ')))).map(_.mkString)
    .suchThat(_.trim.nonEmpty)

  private def treeGen(depth: Int): Gen[DomElement] = for {
    tag <- tagGen
    // one value per attr name: duplicate names are a tolerance dimension
    // parsers disagree on (first-wins vs last-wins) — out of scope here
    attrs <- Gen.listOf(attrGen).map(_.distinctBy(_._1))
    width <- Gen.choose(0, if (depth == 0) 0 else 3)
    kids <- Gen.listOfN(width, Gen.zip(treeGen(depth - 1),
      Gen.option(textGen)))
  } yield DomElement(tag, attrs, kids.flatMap { case (e, t) =>
    e +: t.map(DomText(_)).toSeq
  }.toVector)

  /** Serialize with seeded style randomness across the tolerance axes:
    * double/single/bare quoting (where the value allows), tag-name
    * case-mixing, comment injection between nodes. */
  private def render(e: DomElement, rnd: scala.util.Random): String = {
    val sb = new StringBuilder
    def attr(a: (String, String)): String = {
      val (k, v) = a
      val style = rnd.nextInt(3)
      if (style == 2 && v.nonEmpty && !v.exists(c => c.isWhitespace ||
        c == '"' || c == '\'' || c == '>' || c == '=' || c == '/'))
        s"$k=$v" // bare
      else if (style == 1 && !v.contains('\'')) s"$k='$v'"
      else s"$k=\"$v\""
    }
    def tagCase(t: String): String =
      t.map(c => if (rnd.nextBoolean()) c.toUpper else c)
    def walk(n: DomNode): Unit = n match {
      case DomText(t) => sb.append(t)
      case el: DomElement =>
        if (rnd.nextInt(4) == 0) sb.append("<!-- noise -->")
        val open = tagCase(el.tag)
        sb.append('<').append(open)
        el.attrs.foreach(a => sb.append(' ').append(attr(a)))
        sb.append('>')
        el.children.foreach(walk)
        sb.append("</").append(tagCase(el.tag)).append('>')
    }
    e.children.foreach(walk)
    sb.toString
  }

  test("render-parse round-trip is identity under randomized quote/case/comment style") {
    val trees = samples(treeGen(3).map(t => DomElement("#root", Nil,
      t.children)), 120, seed = 7L)
    val rnd = new scala.util.Random(7L)
    trees.foreach { t =>
      val html = render(t, rnd)
      val parsed = TolerantDom.parse(html).root
      assert(parsed == t, s"round-trip drift on: $html")
    }
  }

  // ---- law 4: extraction invariance on the real fixture pages ------------

  private def fixture(name: String): String = {
    val src = scala.io.Source.fromURL(getClass.getResource(s"/html/$name"),
      "UTF-8")
    try src.mkString finally src.close()
  }

  /** Tolerance-preserving mutation of well-formed canonical markup: within
    * each open tag — attribute order shuffled, class token order shuffled,
    * values requoted (single/bare where legal), tag name case-mixed; between
    * tags — comments injected. None of these may change what a
    * BeautifulSoup-equivalent extractor reads (bulk_scraper.py:64-111). */
  private def mutate(html: String, seed: Long): String = {
    val rnd = new scala.util.Random(seed)
    val tagRe = "(?s)<([a-zA-Z][\\w:-]*)((?:\\s+[\\w:-]+(?:=\"[^\"]*\")?)*)\\s*>".r
    val attrRe = "\\s+([\\w:-]+)(?:=\"([^\"]*)\")?".r
    val mutated = tagRe.replaceAllIn(html, m => {
      val tag = m.group(1)
      val attrs = attrRe.findAllMatchIn(m.group(2)).map { a =>
        (a.group(1), Option(a.group(2)))
      }.toList
      val shuffled = rnd.shuffle(attrs).map {
        case (k, Some(v0)) =>
          // class is a token LIST: order must not matter
          val v = if (k.equalsIgnoreCase("class"))
            rnd.shuffle(v0.split("\\s+").toList).mkString(" ")
          else v0
          val style = rnd.nextInt(3)
          if (style == 2 && v.nonEmpty && !v.exists(c => c.isWhitespace ||
            c == '"' || c == '\'' || c == '>' || c == '=' || c == '/'))
            s"$k=$v"
          else if (style == 1 && !v.contains('\'')) s"$k='$v'"
          else s"""$k="$v""""
        case (k, None) => k
      }
      val cased = tag.map(c => if (rnd.nextBoolean()) c.toUpper else c)
      val comment = if (rnd.nextInt(3) == 0) "<!-- mutated -->" else ""
      java.util.regex.Matcher.quoteReplacement(
        s"$comment<$cased${shuffled.map(" " + _).mkString}>")
    })
    mutated
  }

  test("H1-H11 lead record is invariant under tolerance-preserving mutation") {
    for (page <- Seq("detail_page.html", "detail_page_fallbacks.html",
        "detail_page_sparse.html")) {
      val html = fixture(page)
      val expected = DomExtract.lead(html)
      for (seed <- 1L to 10L) {
        val got = DomExtract.lead(mutate(html, seed))
        assert(got == expected, s"$page seed=$seed")
      }
    }
  }

  test("H10 card list is invariant under tolerance-preserving mutation") {
    for (page <- Seq("search_results.html", "search_results_page2.html")) {
      val html = fixture(page)
      val expected = DomExtract.cards(html)
      assert(expected.nonEmpty, s"$page fixture has no cards")
      for (seed <- 1L to 10L) {
        assert(DomExtract.cards(mutate(html, seed)) == expected,
          s"$page seed=$seed")
      }
    }
  }
}
