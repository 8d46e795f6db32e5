package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML→text extraction — the step between a crawl ([[graft.sources.Warc]])
  * and every text operator: raw pages need tag stripping plus boilerplate
  * (nav/footer/chrome) removal before quality scoring or dedup mean
  * anything.
  *
  * Pipeline (all pure codegen'd Column work — regex passes + HOFs over
  * the line array; a narrow map, no shuffle, embarrassingly parallel):
  *   1. drop `<script>`/`<style>` blocks and comments wholesale (their
  *      content is code, not text — and may contain `<` freely);
  *   2. convert block-level tags to newlines, so DOM blocks become LINES
  *      — the unit the boilerplate rule judges;
  *   3. mark `<a>`…`</a>` spans with sentinel chars (so link density
  *      survives tag stripping), strip all remaining tags;
  *   4. decode the six ubiquitous entities (`&lt; &gt; &quot; &#39;
  *      &nbsp;` first, `&amp;` LAST — the reverse order would re-decode
  *      `&amp;lt;` into `<`);
  *   5. keep a line iff it reads like prose (jusText-lite, integer
  *      arithmetic only so the DuckDB oracle replays it exactly):
  *      `len(trim) ≥ minChars`, `words ≥ minWords`, alphanumeric density
  *      `alnum·10 ≥ len·4`, link density `linked·2 ≤ len`.
  *
  * The full jusText additionally uses stopword density and neighbor
  * context; this lite rule is the deterministic core. `HtmlSpec` pins
  * extraction on hand-built pages with known boilerplate; the
  * `q_html_extract` driver row checks the line rule cross-engine.
  */
object Html {

  private val LinkOpen = "\u0001"
  private val LinkClose = "\u0002"

  /** Decode the six ubiquitous entities (`&amp;` LAST — the reverse
    * order would re-decode `&amp;lt;` into `<`). Shared by the text
    * pipeline and [[extractLinks]]. */
  private def decodeEntities(c: Column): Column =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(c) { case (acc, (from, to)) =>
        call_function("replace", acc, lit(from), lit(to))
      }

  /** All `href` targets of `<a>` tags, in document order — the edge
    * source of every link-graph build (anchor extraction is how a crawl
    * discovers the web graph PageRank then ranks). Handles the three
    * attribute spellings HTML allows (double-quoted, single-quoted,
    * unquoted) and decodes the ubiquitous entities (`&amp;` — the
    * REQUIRED escape of `&` inside attribute values). Relative
    * references come out as written; callers filter or resolve. One
    * `regexp_extract_all` + a small HOF — pure map-side Column work.
    * The char before `href` must be whitespace or a quote — `\b` alone
    * also matches after `-`, which would read `data-href=` (a styling
    * convention, not a navigation target) as the link. */
  def extractLinks(html: Column): Column = {
    val raw = regexp_extract_all(html,
      lit("(?i)<a\\b[^>]*?[\\s\"']href\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\\s>]+)"),
      lit(1))
    transform(raw, v => decodeEntities(
      when(v.startsWith("\"") || v.startsWith("'"),
        substring(v, lit(2), length(v) - 2)).otherwise(v)))
  }

  /** `(href, anchor)` pairs of every `<a>` element, in document order —
    * anchor TEXT is the label the linking page gives the target, the
    * classic web-search relevance signal ([[extractLinks]] gives the
    * edges; this gives their labels). The href follows the same
    * three-quote-form rule; the anchor is the element's inner markup
    * with tags stripped, entities decoded, and whitespace trimmed.
    * Anchors without an href are skipped (they link nowhere). One
    * `regexp_extract_all` over full elements + per-element extracts —
    * pure map-side Column work. */
  def extractAnchors(html: Column): Column = {
    val elems = regexp_extract_all(html,
      lit("(?is)<a\\b[^>]*[\\s\"']href\\s*=[^>]*>.*?</a\\s*>"), lit(0))
    transform(elems, e => {
      val rawHref = regexp_extract(e,
        "(?is)[\\s\"']href\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\\s>]+)", 1)
      val href = decodeEntities(
        when(rawHref.startsWith("\"") || rawHref.startsWith("'"),
          substring(rawHref, lit(2), length(rawHref) - 2))
          .otherwise(rawHref))
      val inner = regexp_extract(e, "(?is)>(.*)</a\\s*>$", 1)
      val anchor = trim(decodeEntities(
        regexp_replace(regexp_replace(inner, "<[^>]*>", " "), "\\s+", " ")))
      struct(href.as("href"), anchor.as("anchor"))
    })
  }

  /** Steps 1–4: markup removal. Exposed for tests; [[htmlToText]] is the
    * full pipeline. Link spans come out wrapped in the `U+0001`/`U+0002`
    * sentinels for the density rule to measure. */
  def stripMarkup(html: Column): Column = {
    // one pass for all three block classes — each alternative is a
    // COMPLETE pattern (a shared `</(script|style)>` tail would let a
    // script block terminate at `</style>`; RE2-style alternation of
    // full alternatives cannot)
    val c3 = regexp_replace(html,
      "(?is)<script\\b[^>]*>.*?</script\\s*>|<style\\b[^>]*>.*?</style\\s*>|<!--.*?-->",
      " ")
    val c4 = regexp_replace(c3,
      "(?i)</?(p|div|br|h[1-6]|li|ul|ol|dl|dt|dd|tr|td|th|table|thead|" +
        "tbody|blockquote|pre|section|article|aside|header|footer|nav|" +
        "form|title|hr)\\b[^>]*>", "\n")
    val c5 = regexp_replace(c4, "(?i)<a\\b[^>]*>", LinkOpen)
    val c6 = regexp_replace(c5, "(?i)</a\\s*>", LinkClose)
    val c7 = regexp_replace(c6, "<[^>]*>", "")
    // entity decode: named/numeric forms first, the ampersand itself last
    decodeEntities(c7)
  }

  private val AlnumChars =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"

  /** Linked-character count of a raw line (sentinels in place): in each
    * post-U+0001 segment, the length of the part before U+0002. The
    * sentinel split is bound once — the raw spelling ran it twice (slice
    * arg + size arg). */
  private def linkedChars(line: Column): Column =
    graft.pipeline.TextOps.bindOnce(split(line, LinkOpen, -1)) { parts =>
      aggregate(
        transform(slice(parts, lit(2), size(parts) - 1),
          seg => length(substring_index(seg, LinkClose, 1))),
        lit(0), (acc, x) => acc + x)
    }

  /** Per-line class for the context-aware rule: 2 = GOOD (passes the
    * full jusText-lite rule), 1 = SHORT (non-empty, prose-like density
    * and link ratio, but under the size gates — jusText's "short"
    * class, eligible for neighbor rescue), 0 = BAD (empty, symbol-heavy,
    * or link-dense — never rescued). Integer arithmetic only. Emits
    * `struct(c, t)`; the cleaned text and the counts are bound once per
    * line (the tuple-returning spelling re-ran the trim/replace chain
    * per reference — ~6 evaluations per line). */
  private def lineClassStruct(line: Column, minChars: Int,
                              minWords: Int): Column =
    graft.pipeline.TextOps.bindOnce(cleanedLine(line)) { t =>
      graft.pipeline.TextOps.bindOnce(struct(
          length(t).as("total"),
          (length(t) - length(translate(t, AlnumChars, ""))).as("alnum"),
          linkedChars(line).as("linked"))) { m =>
        val total = m.getField("total")
        val alnum = m.getField("alnum")
        val linked = m.getField("linked")
        val words = when(total === 0, lit(0))
          .otherwise(size(split(t, "\\s+", -1)))
        val keep = total >= minChars && words >= minWords &&
          alnum * 10 >= total * 4 && linked * 2 <= total
        val proseLike = total > 0 && alnum * 10 >= total * 4 &&
          linked * 2 <= total
        struct(when(keep, lit(2)).when(proseLike, lit(1))
          .otherwise(lit(0)).as("c"), t.as("t"))
      }
    }

  /** Context-aware extraction — the full jusText neighbor pass on top of
    * the [[htmlToText]] line rule: a GOOD line is always kept, a BAD
    * line never, and a SHORT line (headings, captions, list lead-ins —
    * prose-like but under the size gates) is RESCUED iff its nearest
    * non-SHORT neighbor on either side is GOOD (jusText's
    * short-between-good rescue; document boundaries count as BAD, so an
    * isolated short line in a sea of chrome stays dropped).
    *
    * Shape: a CHAIN of two `aggregate` folds — a forward scan stamping
    * each line with its preceding-neighbor flag, then a scan over the
    * reversed result carrying the following-neighbor flag and keeping
    * survivors. Chaining matters: every Column reference duplicates its
    * subtree, and the earlier spelling (class array referenced by two
    * scans + the assessed array referenced again for the texts) copied
    * the whole stripMarkup pipeline four times — measured 5× the
    * htmlToText time on the driver row. Each stage here references its
    * predecessor exactly once. `array_append` copies make each fold
    * O(lines²) per doc — lines-per-page is tens after stripping, noise
    * against the regex passes. Zero shuffle, zero UDF. */
  def htmlToTextContext(html: Column, minChars: Int = 25,
                        minWords: Int = 4): Column = {
    require(minChars > 0 && minWords > 0,
      s"thresholds must be positive, got ($minChars, $minWords)")
    val lines = split(stripMarkup(html), "\n", -1)
    // whitespace-only lines are adjacent-block-tag artifacts, not
    // content blocks — jusText segments by block, so they must not
    // stand between a short line and its rescuing neighbor
    val assessed = filter(
      transform(lines, l => lineClassStruct(l, minChars, minWords)),
      s => length(s.getField("t")) > 0)
    val emptyStamped = array()
      .cast("array<struct<c:int,t:string,pg:boolean>>")
    // forward: stamp each line with "nearest preceding non-SHORT is GOOD"
    val stamped = aggregate(assessed,
      struct(emptyStamped.as("a"), lit(false).as("g")),
      (acc, s) => {
        val c = s.getField("c")
        struct(
          array_append(acc.getField("a"),
            struct(c.as("c"), s.getField("t").as("t"),
              acc.getField("g").as("pg"))).as("a"),
          when(c === 1, acc.getField("g")).otherwise(c === 2).as("g"))
      },
      acc => acc.getField("a"))
    // backward: carry "nearest following non-SHORT is GOOD", keep
    // survivors (collected in reverse, un-reversed at the finish)
    val emptyKept = array().cast("array<string>")
    aggregate(reverse(stamped),
      struct(emptyKept.as("k"), lit(false).as("g")),
      (acc, s) => {
        val c = s.getField("c")
        val keep = c === 2 || (c === 1 &&
          (s.getField("pg") || acc.getField("g")))
        struct(
          when(keep, array_append(acc.getField("k"), s.getField("t")))
            .otherwise(acc.getField("k")).as("k"),
          when(c === 1, acc.getField("g")).otherwise(c === 2).as("g"))
      },
      acc => array_join(reverse(acc.getField("k")), "\n"))
  }

  /** Sentinels stripped + trimmed — the cleaned text of one line. */
  private def cleanedLine(line: Column): Column =
    trim(call_function("replace",
      call_function("replace", line, lit(LinkOpen), lit("")),
      lit(LinkClose), lit("")))

  /** The jusText-lite keep rule on ONE already-stripped line (sentinels
    * still in place). Integer arithmetic only — both engines replay it
    * bit-for-bit. Emits `struct(k, t)`; text and counts bound once per
    * line (see [[lineClassStruct]]).
    * alnum counts as length minus translate-removal — a plain string
    * expression, much cheaper per line than a regex pass; value-equal
    * to the oracle's regexp_replace('[^A-Za-z0-9]') spelling. */
  private def lineKeepStruct(line: Column, minChars: Int,
                             minWords: Int): Column =
    graft.pipeline.TextOps.bindOnce(cleanedLine(line)) { t =>
      graft.pipeline.TextOps.bindOnce(struct(
          length(t).as("total"),
          (length(t) - length(translate(t, AlnumChars, ""))).as("alnum"),
          linkedChars(line).as("linked"))) { m =>
        val total = m.getField("total")
        val words = when(total === 0, lit(0))
          .otherwise(size(split(t, "\\s+", -1)))
        val keep = total >= minChars && words >= minWords &&
          m.getField("alnum") * 10 >= total * 4 &&
          m.getField("linked") * 2 <= total
        struct(keep.as("k"), t.as("t"))
      }
    }

  /** Full extraction: markup removal + per-line boilerplate filter,
    * kept lines re-joined with `\n`. Empty string when nothing reads
    * like prose. */
  def htmlToText(html: Column, minChars: Int = 25,
                 minWords: Int = 4): Column = {
    require(minChars > 0 && minWords > 0,
      s"thresholds must be positive, got ($minChars, $minWords)")
    val lines = split(stripMarkup(html), "\n", -1)
    val assessed = transform(lines,
      l => lineKeepStruct(l, minChars, minWords))
    array_join(
      transform(filter(assessed, s => s.getField("k")),
        s => s.getField("t")), "\n")
  }

  /** Unquote an attribute value captured in any of HTML's three forms
    * (double-quoted, single-quoted, unquoted) and decode entities. */
  private def attrValue(raw: Column): Column =
    decodeEntities(
      when(raw.startsWith("\"") || raw.startsWith("'"),
        substring(raw, lit(2), length(raw) - 2)).otherwise(raw))

  /** The `content` attribute of the first element matched by
    * `elemPattern` (which must locate the whole tag). Handles either
    * attribute order (name-then-content, content-then-name) because the
    * element is located first and `content` is pulled from the match.
    * Empty string when the element or the attribute is absent. */
  private def elemAttr(html: Column, elemPattern: String,
                       attr: String): Column = {
    val elem = regexp_extract(html, elemPattern, 0)
    attrValue(regexp_extract(elem,
      "(?is)[\\s\"']" + attr + "\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\\s>]+)", 1))
  }

  private def namedMetaContent(html: Column, name: String): Column =
    elemAttr(html,
      s"(?is)<meta\\b[^>]*[\\s\"']name\\s*=\\s*[\"']?$name\\b[^>]*>",
      "content")

  /** Page-level metadata every crawl indexer extracts before (or
    * instead of) full text: `<title>`, `<meta name=description>`, the
    * `<html lang>` attribute (lowercased — BCP 47 tags are
    * case-insensitive), `<link rel=canonical href>` (the page's OWN
    * dedup key claim — see the canonical-target dedup row), and
    * `<meta name=robots content>` (lowercased; the in-band opt-out
    * channel the robots.txt gate cannot see). All fields come back as
    * empty strings when absent. Pure regex Columns over the raw page —
    * zero shuffle, zero UDF, rides the extraction map. */
  def pageMeta(html: Column): Column = {
    val title = trim(decodeEntities(regexp_replace(
      regexp_extract(html, "(?is)<title[^>]*>(.*?)</title", 1),
      "\\s+", " ")))
    val desc = trim(regexp_replace(
      namedMetaContent(html, "description"), "\\s+", " "))
    val lang = lower(attrValue(regexp_extract(html,
      "(?is)<html\\b[^>]*?[\\s\"']lang\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\\s>]+)",
      1)))
    val canonical = elemAttr(html,
      "(?is)<link\\b[^>]*[\\s\"']rel\\s*=\\s*[\"']?canonical\\b[^>]*>",
      "href")
    val robots = lower(trim(namedMetaContent(html, "robots")))
    struct(title.as("title"), desc.as("description"), lang.as("lang"),
      canonical.as("canonical"), robots.as("robots"))
  }

  /** Split a robots directive value (`<meta name=robots>` content or an
    * `X-Robots-Tag` header) into its comma-separated directive tokens,
    * trimmed and lowercased. Parameterized directives
    * (`unavailable_after: <date>`) keep only the directive name —
    * matching how indexers test for a directive's presence. */
  def robotsDirectiveTokens(value: Column): Column =
    filter(
      transform(split(lower(coalesce(value, lit(""))), ",", -1),
        t => trim(substring_index(t, ":", 1))),
      t => length(t) > 0)

  /** Raw `<script type="application/ld+json">` block contents, in
    * document order — schema.org structured data (articles, products,
    * breadcrumbs) that news/commerce pipelines prefer over scraping the
    * visible DOM. Returns the raw JSON strings; callers hand them to
    * `from_json` with their expected schema (parsing stays in Spark's
    * real JSON machinery, not regex). Plain `<script>` blocks without
    * the type never match. One `regexp_extract_all` — zero shuffle. */
  def jsonLdBlocks(html: Column): Column =
    regexp_extract_all(html,
      lit("(?is)<script\\b[^>]*type\\s*=\\s*[\"']application/ld\\+json[\"']" +
        "[^>]*>(.*?)</script"),
      lit(1))

  /** The REP in-band opt-out decision (Google's robots-meta semantics,
    * the de-facto standard): combine the page's `<meta name=robots>`
    * content with the response's `X-Robots-Tag` header — a directive in
    * EITHER channel applies — and emit
    * `struct(indexable, followable)`: `noindex`/`none` forbid indexing
    * (for a corpus: the page's text must not be kept), `nofollow`/`none`
    * forbid following (its links must not feed the frontier). Absent
    * directives default to allowed. A narrow map — composes with
    * [[graft.pipeline.UrlOps.robotsGate]], which handles the OUT-of-band
    * (robots.txt) channel. */
  def noindexGate(metaRobots: Column, xRobotsTag: Column): Column = {
    val toks = concat(robotsDirectiveTokens(metaRobots),
      robotsDirectiveTokens(xRobotsTag))
    val has = (d: String) => exists(toks, t => t === d)
    struct(
      (!(has("noindex") || has("none"))).as("indexable"),
      (!(has("nofollow") || has("none"))).as("followable"))
  }

  /** Structured table extraction — the step that turns the web's
    * billions of `<table>`s into rows a pipeline can keep as aligned
    * data (the WikiTables/WDC-corpus ingest, and the reason a crawl
    * corpus yields more than prose). Every table's cells as a nested
    * `array<array<array<string>>>`: tables in document order → rows
    * (`<tr>`) → cells (`<td>`/`<th>`, in source order, so a header row
    * is row 0 when the page puts it first); each cell's text is
    * tag-stripped (inline markup like `<b>`/`<a>` contributes its
    * text), entity-decoded, whitespace-collapsed, and trimmed.
    *
    * Three nested `regexp_extract_all` scans over the declared element
    * boundaries — pure map-side Column work, zero shuffle, linear in
    * page size. NESTED tables are out of scope for the non-greedy
    * block regex (the inner table's cells surface as text of the outer
    * cell region up to the first `</table>`); real table-corpus
    * pipelines drop nested layout tables anyway. */
  /** OpenGraph / Twitter-card metadata as a map — the social-preview
    * channel (`<meta property="og:…">`, `<meta name="twitter:…">`)
    * that carries the cleanest per-page title/image/type signals a
    * multimodal corpus gets for free (og:image is how an image-text
    * pairing pipeline finds THE representative image). Tag scan +
    * per-tag key/content extraction, independent of attribute order;
    * later duplicates win (`map_from_entries` semantics — the
    * last-meta-wins rule browsers apply). */
  def openGraph(html: Column): Column = {
    val tags = regexp_extract_all(html,
      lit("(?is)<meta\\b[^>]*(?:property|name)\\s*=\\s*[\"'](?:og|twitter):[^>]*>"),
      lit(0))
    val entries = filter(transform(tags, t => struct(
      lower(regexp_extract(t,
        "(?i)(?:property|name)\\s*=\\s*[\"']((?:og|twitter):[A-Za-z0-9_:]+)[\"']",
        1)).as("key"),
      attrValue(regexp_extract(t,
        "(?is)[\\s\"']content\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\\s>]+)", 1))
        .as("value"))), e => length(e.getField("key")) > 0)
    // last-meta-wins by construction: drop any earlier binding of the
    // key before adding — map_from_entries THROWS on duplicates under
    // the default dedup policy, and a real page repeats og: tags
    aggregate(entries, map().cast("map<string,string>"),
      (m, e) => map_concat(
        map_filter(m, (k, _) => k =!= e.getField("key")),
        map(e.getField("key"), e.getField("value"))))
  }

  /** `<img>` source candidates: every `srcset` entry as
    * `struct(url, width)` (the `NNNw` descriptor; `0` when absent)
    * plus the plain `src` fallback (width 0), per image in document
    * order — the variant-selection input a multimodal ingest needs to
    * fetch the right resolution instead of the page default. Emits
    * `array<array<struct<url,width>>>` (outer = images). */
  def imgCandidates(html: Column): Column = {
    val tags = regexp_extract_all(html,
      lit("(?is)<img\\b[^>]*>"), lit(0))
    transform(tags, t => {
      val srcset = attrValue(regexp_extract(t,
        "(?is)[\\s\"']srcset\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\\s>]+)", 1))
      val src = attrValue(regexp_extract(t,
        "(?is)[\\s\"']src\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\\s>]+)", 1))
      val fromSet = transform(
        filter(split(srcset, ","), e => length(btrim(e)) > 0),
        e => {
          // ANSI cast of the no-match "" throws — guard on length
          val w = regexp_extract(btrim(e), "\\s([0-9]+)w\\s*$", 1)
          struct(
            regexp_extract(btrim(e), "^(\\S+)", 1).as("url"),
            when(length(w) > 0, w.cast("long")).otherwise(lit(0L))
              .as("width"))
        })
      when(length(src) > 0,
        concat(fromSet,
          array(struct(src.as("url"), lit(0L).as("width")))))
        .otherwise(fromSet)
    })
  }

  /** `<meta http-equiv=refresh>` redirect extraction — the IN-HTML
    * redirect channel (the 1990s pattern still everywhere on parked
    * and migrated pages) that complements the 3xx Location chain
    * ([[graft.sources.Warc]] `redirectHops`): a crawler that ignores
    * it indexes shell pages and misses the content. Returns
    * `struct(has_refresh, delay, url)` — delay in seconds, url as
    * written (absent url = a timed reload, url ""). Spec shape per
    * WHATWG: `content="N; url=TARGET"`, case-insensitive, the
    * separator/quoting sloppy in the wild (`;` or `,`, optional
    * quotes) — handled. */
  def metaRefresh(html: Column): Column = {
    val tag = regexp_extract(html,
      "(?is)<meta\\b[^>]*http-equiv\\s*=\\s*[\"']?refresh[\"']?[^>]*>", 0)
    val content = attrValue(regexp_extract(tag,
      "(?is)[\\s\"']content\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\\s>]+)", 1))
    val delay = regexp_extract(content, "^\\s*([0-9]+)", 1)
    val url = regexp_extract(content,
      "(?i)[;,]\\s*url\\s*=\\s*['\"]?([^'\"\\s]+)", 1)
    element_at(transform(array(struct(
      (length(tag) > 0 && length(delay) > 0).as("h"),
      delay.as("d"), url.as("u"))), p =>
      struct(
        p.getField("h").cast("long").as("has_refresh"),
        when(p.getField("h"), p.getField("d").cast("long"))
          .otherwise(lit(-1L)).as("delay"),
        p.getField("u").as("url"))), 1)
  }

  /** `<link rel=alternate hreflang=…>` extraction — the multilingual
    * site map (Google's hreflang cluster semantics): the set of
    * language editions of one page, the alignment signal a parallel-
    * corpus pipeline mines (`x-default` marks the language selector).
    * Returns `array<struct<lang, href>>` in document order. */
  def hreflangAlternates(html: Column): Column = {
    val tags = regexp_extract_all(html,
      lit("(?is)<link\\b[^>]*rel\\s*=\\s*[\"']alternate[\"'][^>]*>"),
      lit(0))
    filter(transform(tags, t => struct(
      lower(regexp_extract(t,
        "(?i)hreflang\\s*=\\s*[\"']([A-Za-z0-9-]+|x-default)[\"']", 1))
        .as("lang"),
      attrValue(regexp_extract(t,
        "(?is)[\\s\"']href\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\\s>]+)", 1))
        .as("href"))),
      e => length(e.getField("lang")) > 0)
  }

  /** HTML→Markdown-lite conversion — the markdownify/trafilatura
    * output format most LLM pretraining corpora standardize on, because
    * it KEEPS document structure (headings, lists, links, emphasis) as
    * plain text tokens instead of flattening it away. Sequential
    * group-capture `regexp_replace` passes:
    * head/script/style/comments dropped; `<a href>` → `[text](href)`;
    * `<b>/<strong>` → `**…**`; `<i>/<em>` → `*…*`; `<h1..h6>` →
    * `#…######`; `<li>` → `- ` lines; paragraph/list closers → blank
    * lines; remaining tags stripped; entities decoded; whitespace
    * normalized (intra-line runs → one space, ≥3 newlines → one blank
    * line). Pure map-side Column work, linear in page size. */
  def toMarkdown(html: Column): Column = {
    val noHead = regexp_replace(html,
      "(?is)<head\\b[^>]*>.*?</head\\s*>|<script\\b[^>]*>.*?</script\\s*>" +
        "|<style\\b[^>]*>.*?</style\\s*>|<!--.*?-->", " ")
    val links = regexp_replace(noHead,
      "(?is)<a\\b[^>]*href\\s*=\\s*(?:\"([^\"]*)\"|'([^']*)')[^>]*>(.*?)</a\\s*>",
      "[$3]($1$2)")
    val strong = regexp_replace(links,
      "(?is)<(?:b|strong)\\b[^>]*>(.*?)</(?:b|strong)\\s*>", "**$1**")
    val em = regexp_replace(strong,
      "(?is)<(?:i|em)\\b[^>]*>(.*?)</(?:i|em)\\s*>", "*$1*")
    val hs = (1 to 6).foldLeft(em) { (acc, n) =>
      regexp_replace(acc, s"(?is)<h$n\\b[^>]*>(.*?)</h$n\\s*>",
        "\n\n" + ("#" * n) + " $1\n\n")
    }
    val li = regexp_replace(hs, "(?is)<li\\b[^>]*>(.*?)</li\\s*>", "\n- $1")
    val blocks = regexp_replace(li,
      "(?i)</(?:ul|ol|p|div|blockquote|table|tr)\\s*>", "\n\n")
    val brs = regexp_replace(blocks, "(?i)<br\\b[^>]*/?>", "\n")
    val decoded = decodeEntities(regexp_replace(brs, "<[^>]*>", ""))
    val sp = regexp_replace(decoded, "[ \\t]+", " ")
    // btrim strips only spaces — leading/trailing NEWLINES need the regex
    regexp_replace(regexp_replace(
      regexp_replace(sp, " *\n *", "\n"), "\n{3,}", "\n\n"),
      "^\\s+|\\s+$", "")
  }

  def tableCells(html: Column): Column = {
    val tables = regexp_extract_all(html,
      lit("(?is)<table\\b[^>]*>(.*?)</table\\s*>"), lit(1))
    transform(tables, t =>
      transform(
        regexp_extract_all(t, lit("(?is)<tr\\b[^>]*>(.*?)</tr\\s*>"),
          lit(1)),
        tr => transform(
          regexp_extract_all(tr,
            lit("(?is)<t[dh]\\b[^>]*>(.*?)</t[dh]\\s*>"), lit(1)),
          cell => btrim(regexp_replace(
            decodeEntities(regexp_replace(cell, "<[^>]*>", " ")),
            "\\s+", " ")))))
  }
}
