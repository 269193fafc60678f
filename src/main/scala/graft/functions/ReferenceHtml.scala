package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** H1–H11 against the reference's REAL page structure (SURVEY §2.9), selector
  * for selector: `a.search-result-name h1`, `span.search-result-address`,
  * `tel:` link TEXT, the `api.whatsapp.com/send?phone=|text=` variants,
  * `a[itemprop=url]` with the `i.fa.fa-cloud + a` fallback,
  * `a[onclick=irContacto()]` with the `i.fa.fa-envelope + a` fallback,
  * `i.far.fa-clock` sibling span, the `div#yw0.list-view div.items` rubros
  * region with the `span.search-result-category` fallback, and the
  * `div.card-mobile.gc-item > span.nombre-comercio > a` result cards
  * (reference src/extractors/bulk_scraper.py:90-192,
  * src/extractors/manual_scraper.py:46-78).
  *
  * These drive the FIXTURES.md §B3 golden pages in GoldenPipelineSpec. The
  * sibling [[HtmlFunctions]] family stays the oracle-replayable form (its
  * regexes are re-run verbatim by DuckDB in q46/q47); this one follows the
  * reference markup exactly, fallbacks included.
  */
object ReferenceHtml {

  /** Parser-mode flag (the graft.windowHash pattern): "regex" (default —
    * exact on canonical markup, oracle-replayable, codegen'd) or "dom"
    * (tolerant of real-web malformed markup via [[TolerantDom]]/[[DomHtml]];
    * UDF-based, one parse per page). Read at plan-build time. */
  private def domMode: Boolean =
    sys.props.getOrElse("graft.htmlParser", "regex") match {
      case "dom" => true
      case "regex" => false
      case other => throw new IllegalArgumentException(
        s"graft.htmlParser must be regex or dom, got: $other")
    }

  private def extractOrNull(c: Column, pattern: String): Column =
    nullif(regexp_extract(c, pattern, 1), lit(""))

  /** H1 nombre: `a.search-result-name h1` text. */
  def nombre(html: Column): Column =
    if (domMode) DomHtml.nombre(html)
    else extractOrNull(html,
      """(?s)<a[^>]*class="search-result-name"[^>]*>\s*<h1[^>]*>\s*(.*?)\s*</h1>""")

  /** H1 direccion: `span.search-result-address` text (first match — the
    * clock-sibling span also carries the class, but appears later). */
  def direccion(html: Column): Column =
    if (domMode) DomHtml.direccion(html)
    else extractOrNull(html,
      """<span class="search-result-address"[^>]*>\s*([^<]*?)\s*</span>""")

  /** H1 descripcion: `div.search-result-description` text. */
  def descripcion(html: Column): Column =
    if (domMode) DomHtml.descripcion(html)
    else extractOrNull(html,
      """(?s)<div class="search-result-description"[^>]*>\s*(.*?)\s*</div>""")

  /** H2 phones: `a[href^="tel:"]` link TEXT (the reference reads the text,
    * not the href — they can differ). */
  def telefonos(html: Column): Column =
    if (domMode) DomHtml.telefonos(html)
    else transform(
      regexp_extract_all(html, lit("""<a href="tel:[^"]*"[^>]*>\s*([^<]*?)\s*</a>"""), lit(1)),
      t => trim(t))

  /** H3 whatsapp: `a[href^="https://api.whatsapp.com/send?"]` — phone param,
    * else first digit-run of the decoded text param, else digit-bearing link
    * text (F8). */
  def whatsapp(html: Column): Column = if (domMode) DomHtml.whatsapp(html) else {
    val href = regexp_extract(html,
      """<a href="(https://api\.whatsapp\.com/send\?[^"]*)"""", 1)
    val text = regexp_extract(html,
      """<a href="https://api\.whatsapp\.com/send\?[^"]*"[^>]*>\s*([^<]*?)\s*</a>""", 1)
    when(href =!= "", CleanFunctions.whatsappNumber(href, nullif(text, lit(""))))
  }

  /** H4 website: `a[itemprop="url"]` href, else `i.fa.fa-cloud` sibling
    * `a.search-result-link` href. */
  def sitioWeb(html: Column): Column =
    if (domMode) DomHtml.sitioWeb(html)
    else coalesce(
    extractOrNull(html, """<a[^>]*itemprop="url"[^>]*href="([^"]*)""""),
    extractOrNull(html,
      """(?s)<i class="fa fa-cloud"></i>\s*<a[^>]*class="search-result-link"[^>]*href="([^"]*)""""))

  /** H5 email: `a[onclick="irContacto()"]` text, else `i.fa.fa-envelope`
    * sibling `a.search-result-link` text; must contain '@'. */
  def email(html: Column): Column =
    if (domMode) DomHtml.email(html)
    else coalesce(
    extractOrNull(html,
      """(?s)<a[^>]*onclick="irContacto\(\)"[^>]*>\s*([^<]*@[^<]*?)\s*</a>"""),
    extractOrNull(html,
      """(?s)<i class="fa fa-envelope"></i>\s*<a[^>]*class="search-result-link"[^>]*>\s*([^<]*@[^<]*?)\s*</a>"""))

  /** H6 social: first `a[href*=domain]` href. */
  def social(html: Column, domain: String): Column =
    if (domMode) DomHtml.social(html, domain)
    else extractOrNull(html, s"""<a href="([^"]*${java.util.regex.Pattern.quote(domain)}[^"]*)"""")

  /** H7 horarios: `i.far.fa-clock` sibling `span.search-result-address` text
    * with the Abierto/Cerrado status words dropped (F13). */
  def horarios(html: Column): Column =
    if (domMode) DomHtml.horarios(html)
    else nullif(CleanFunctions.cleanHorarios(coalesce(extractOrNull(html,
      """(?s)<i class="far fa-clock"></i>\s*<span class="search-result-address"[^>]*>\s*([^<]*?)\s*</span>"""),
      lit(""))), lit(""))

  /** H8 rubros: links inside `div#yw0.list-view div.items`, else the single
    * `span.search-result-category` fallback. */
  def rubros(html: Column): Column = if (domMode) DomHtml.rubros(html) else {
    val region = regexp_extract(html,
      """(?s)<div id="yw0" class="list-view">.*?<div class="items">(.*?)</div>""", 1)
    val links = transform(
      regexp_extract_all(region,
        lit("""(?s)<a[^>]*class="search-result-link"[^>]*>\s*([^<]*?)\s*</a>"""), lit(1)),
      t => trim(t))
    val fallback = extractOrNull(html,
      """<span class="search-result-category"[^>]*>\s*([^<]*?)\s*</span>""")
    when(size(links) > 0, links)
      .when(fallback.isNotNull, array(fallback))
      .otherwise(array().cast("array<string>"))
  }

  /** H9 coordinates: `div.map` data attributes. */
  def latitud(html: Column): Column =
    if (domMode) DomHtml.latitud(html)
    else nullif(regexp_extract(html, """<div class="map"[^>]*data-lat="([^"]*)"""", 1), lit(""))
      .cast("double")
  def longitud(html: Column): Column =
    if (domMode) DomHtml.longitud(html)
    else nullif(regexp_extract(html, """<div class="map"[^>]*data-lng="([^"]*)"""", 1), lit(""))
      .cast("double")

  /** H10 result cards: each `div.card-mobile.gc-item` →
    * `span.nombre-comercio > a` href, relativized against the base URL, id
    * from the `id=` query param; cards without an id are dropped by the
    * caller (null id), mirroring parse_search_results_page. */
  def resultCards(html: Column, baseUrl: String): Column =
    if (domMode) DomHtml.resultCards(html, baseUrl) else {
    val hrefs = regexp_extract_all(html,
      lit("""(?s)<div class="card-mobile gc-item">.*?<span class="nombre-comercio">\s*<a href="([^"]*)""""),
      lit(1))
    transform(hrefs, href => {
      val abs = when(href.rlike("^https?://"), href)
        .otherwise(concat(lit(baseUrl), href))
      struct(
        CleanFunctions.extractIdFromUrl(abs).cast("long").as("id_negocio"),
        abs.as("url"))
    })
  }

  /** F14 total-matches banner: `… ha generado N coincidencias`. */
  def totalMatches(html: Column): Column = CleanFunctions.totalMatches(html)

  /** H11 parse_detail_page: the full 17-field record as one struct
    * (manual_scraper.py:80-180) — compose with `select($"rec.*")`. */
  def leadRecord(html: Column, id: Column, url: Column): Column = struct(
    id.as("id_negocio"), url.as("url"),
    nombre(html).as("nombre"), direccion(html).as("direccion"),
    telefonos(html).as("telefonos"), whatsapp(html).as("whatsapp"),
    sitioWeb(html).as("sitio_web"), email(html).as("email"),
    social(html, "facebook.com").as("facebook"),
    social(html, "instagram.com").as("instagram"),
    horarios(html).as("horarios"), rubros(html).as("rubros"),
    descripcion(html).as("descripcion"),
    latitud(html).as("latitud"), longitud(html).as("longitud"))
}
