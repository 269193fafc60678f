package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Raw per-page extraction over the tolerant DOM ([[TolerantDom]]) —
  * selector-for-selector the reference's BeautifulSoup calls
  * (reference src/extractors/bulk_scraper.py:86-192,
  * src/extractors/manual_scraper.py:46-78). One parse per page yields every
  * raw field; all post-cleanup (whatsapp number law, horario status words,
  * id-from-url) stays in the SAME Column functions the regex path uses, so
  * the two paths share one cleanup law and differ only in how fields leave
  * the markup. */
private[functions] object DomExtract {

  /** Raw fields as the DOM sees them (None = selector missed). */
  final case class RawLead(
      nombre: Option[String], direccion: Option[String],
      descripcion: Option[String], telefonos: Seq[String],
      wa_href: Option[String], wa_text: Option[String],
      sitio_web: Option[String], email: Option[String],
      hrefs: Seq[String], horarios: Option[String],
      rubros: Seq[String], rubro_fallback: Option[String],
      lat: Option[String], lng: Option[String])

  private def nonEmpty(s: String): Option[String] =
    Option(s).map(_.trim).filter(_.nonEmpty)

  /** Parse-invocation counter (local-mode observable): GoldenPipelineSpec
    * measures parses-per-row through the full field surface to pin the
    * one-parse-per-page claim — if the memo below ever stopped collapsing
    * repeat invocations, that spec fails rather than the DOM path silently
    * costing multiple parses per page. */
  private[functions] val parses = new java.util.concurrent.atomic.AtomicLong

  /** One-entry per-thread memo keyed on the page text. Catalyst's
    * subexpression elimination dedupes the shared `raw(html)` UDF across
    * the branch-free fields, but REFUSES subtrees under higher-order
    * functions and some conditional shapes (measured: `social`'s
    * array-filter lambda and `horarios` each re-evaluated the UDF —
    * 4 parses/row through the 15-field surface). A task thread evaluates
    * one row's projection at a time, so a single-entry memo collapses
    * those re-evaluations to exactly one parse per row, independent of
    * how Catalyst shapes the plan. String-equality probe on a ~KB page is
    * noise next to a parse; the entry is overwritten on the next row, so
    * per-thread residency is one page. */
  private val memo = new ThreadLocal[(String, RawLead)]

  def lead(html: String): RawLead = {
    val m = memo.get()
    if (m != null && m._1 == html) return m._2
    val r = leadUncached(html)
    memo.set((html, r))
    r
  }

  private def leadUncached(html: String): RawLead = {
    parses.incrementAndGet()
    if (html == null)
      return RawLead(None, None, None, Nil, None, None, None, None, Nil,
        None, Nil, None, None, None)
    val doc = TolerantDom.parse(html)
    val all = doc.all
    def firstWith(tag: String, cls: String): Option[DomElement] =
      all.find(e => e.tag == tag && e.hasClass(cls))

    // H1: a.search-result-name h1 (descendant), span/div text selectors
    val nombre = firstWith("a", "search-result-name")
      .flatMap(_.descendants.find(_.tag == "h1"))
      .flatMap(h => nonEmpty(h.text))
    val direccion = firstWith("span", "search-result-address")
      .flatMap(e => nonEmpty(e.text))
    val descripcion = firstWith("div", "search-result-description")
      .flatMap(e => nonEmpty(e.text))

    // H2: a[href^="tel:"] link TEXT (the reference reads text, not href)
    val telefonos = all.filter(e =>
      e.tag == "a" && e.attr("href").exists(_.startsWith("tel:")))
      .map(_.text)

    // H3: a[href^="https://api.whatsapp.com/send?"] — href + text raw;
    // the phone/text-param/digit law is CleanFunctions.whatsappNumber
    val wa = all.find(e => e.tag == "a" &&
      e.attr("href").exists(_.startsWith("https://api.whatsapp.com/send?")))
    val waHref = wa.flatMap(_.attr("href"))
    val waText = wa.flatMap(e => nonEmpty(e.text))

    // H4: a[itemprop="url"] href, else i.fa.fa-cloud + a.search-result-link
    def iconAdjacent(iconCls: String): Option[DomElement] =
      all.find(e => e.tag == "i" && e.hasClass("fa") && e.hasClass(iconCls))
        .flatMap(doc.nextElementSibling)
        .filter(a => a.tag == "a" && a.hasClass("search-result-link"))
    // empty itemprop href falls through to the icon fallback, same as the
    // regex path's extractOrNull→coalesce (empty → null → next candidate)
    val sitioWeb = all.find(e => e.tag == "a" &&
      e.attr("itemprop").contains("url")).flatMap(_.attr("href"))
      .flatMap(nonEmpty)
      .orElse(iconAdjacent("fa-cloud").flatMap(_.attr("href")).flatMap(nonEmpty))

    // H5: a[onclick="irContacto()"] text, else envelope-adjacent link text;
    // must contain '@'
    val email = all.find(e => e.tag == "a" &&
      e.attr("onclick").contains("irContacto()"))
      .map(_.text).filter(_.contains("@")).flatMap(nonEmpty)
      .orElse(iconAdjacent("fa-envelope").map(_.text)
        .filter(_.contains("@")).flatMap(nonEmpty))

    // H6 feed: every a href in document order (social = first containing
    // the domain, chosen at the Column layer where the domain arrives)
    val hrefs = all.filter(_.tag == "a").flatMap(_.attr("href"))
      .filter(_.nonEmpty)

    // H7: i.far.fa-clock, then find_next(['span','div'],
    // class_='search-result-address') — document order, the reference's
    // find_next, not just the adjacent sibling (bulk_scraper.py:169-173)
    val horarios = all.find(e => e.tag == "i" &&
      e.hasClass("far") && e.hasClass("fa-clock"))
      .flatMap(icon => doc.findNext(icon)(e =>
        (e.tag == "span" || e.tag == "div") &&
          e.hasClass("search-result-address")))
      .flatMap(e => nonEmpty(e.text))

    // H8: div#yw0.list-view div.items → a.search-result-link texts, else
    // the single span.search-result-category
    val rubros = all.find(e => e.tag == "div" &&
      e.attr("id").contains("yw0") && e.hasClass("list-view"))
      .flatMap(_.descendants.find(d => d.tag == "div" && d.hasClass("items")))
      .map(_.descendants.filter(a =>
        a.tag == "a" && a.hasClass("search-result-link")).map(_.text))
      .getOrElse(Vector.empty)
    val rubroFallback = firstWith("span", "search-result-category")
      .flatMap(e => nonEmpty(e.text))

    // H9: div.map data attributes
    val mapDiv = firstWith("div", "map")
    val lat = mapDiv.flatMap(_.attr("data-lat")).flatMap(nonEmpty)
    val lng = mapDiv.flatMap(_.attr("data-lng")).flatMap(nonEmpty)

    RawLead(nombre, direccion, descripcion, telefonos, waHref, waText,
      sitioWeb, email, hrefs, horarios, rubros, rubroFallback, lat, lng)
  }

  /** H10: div.card-mobile.gc-item → span.nombre-comercio → first a href
    * per card, document order (manual_scraper.py:46-78). */
  def cards(html: String): Seq[String] =
    if (html == null) Nil
    else TolerantDom.parse(html).all
      .filter(e => e.tag == "div" &&
        e.hasClass("card-mobile") && e.hasClass("gc-item"))
      .flatMap(_.descendants.find(s =>
        s.tag == "span" && s.hasClass("nombre-comercio")))
      .flatMap(_.descendants.find(_.tag == "a"))
      .flatMap(_.attr("href"))
}

/** The DOM-parser twin of [[ReferenceHtml]] — same signatures, same output
  * types, same Column-level cleanup laws, selected by
  * -Dgraft.htmlParser=dom (ReferenceHtml dispatches here). Survives the
  * malformed-markup variants the regex path silently misses:
  * GoldenPipelineSpec's malformed-page suite is the measured contract. */
object DomHtml {

  private val leadUdf = udf(DomExtract.lead _)
  private val cardsUdf = udf(DomExtract.cards _)

  /** Total tolerant lead-parses performed in this JVM (spec observability —
    * GoldenPipelineSpec pins one parse per page through the field surface). */
  def parseCount: Long = DomExtract.parses.get()

  /** One parse per page: the branch-free fields share one UDF evaluation
    * through codegen subexpression elimination, and the HOF/conditional
    * shapes CSE refuses (social, horarios — measured) collapse through
    * DomExtract's per-thread memo, so the parse count equals the row count
    * regardless of plan shape (GoldenPipelineSpec pins it). */
  private def raw(html: Column): Column = leadUdf(html)

  def nombre(html: Column): Column = raw(html).getField("nombre")
  def direccion(html: Column): Column = raw(html).getField("direccion")
  def descripcion(html: Column): Column = raw(html).getField("descripcion")

  def telefonos(html: Column): Column = raw(html).getField("telefonos")

  def whatsapp(html: Column): Column = {
    val r = raw(html)
    val href = r.getField("wa_href")
    when(href.isNotNull,
      CleanFunctions.whatsappNumber(href, r.getField("wa_text")))
  }

  def sitioWeb(html: Column): Column = raw(html).getField("sitio_web")
  def email(html: Column): Column = raw(html).getField("email")

  def social(html: Column, domain: String): Column =
    get(filter(raw(html).getField("hrefs"), h => h.contains(domain)), lit(0))

  def horarios(html: Column): Column =
    nullif(CleanFunctions.cleanHorarios(
      coalesce(raw(html).getField("horarios"), lit(""))), lit(""))

  def rubros(html: Column): Column = {
    val r = raw(html)
    val links = r.getField("rubros")
    val fallback = r.getField("rubro_fallback")
    when(size(links) > 0, links)
      .when(fallback.isNotNull, array(fallback))
      .otherwise(array().cast("array<string>"))
  }

  def latitud(html: Column): Column =
    raw(html).getField("lat").cast("double")
  def longitud(html: Column): Column =
    raw(html).getField("lng").cast("double")

  /** Same relativize + id law as the regex path (shared CleanFunctions). */
  def resultCards(html: Column, baseUrl: String): Column =
    transform(cardsUdf(html), href => {
      val abs = when(href.rlike("^https?://"), href)
        .otherwise(concat(lit(baseUrl), href))
      struct(
        CleanFunctions.extractIdFromUrl(abs).cast("long").as("id_negocio"),
        abs.as("url"))
    })
}
