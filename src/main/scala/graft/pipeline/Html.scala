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

  /** The jusText-lite keep rule on ONE already-stripped line (sentinels
    * still in place). Integer arithmetic only — both engines replay it
    * bit-for-bit. */
  private def lineKeepAndText(line: Column, minChars: Int,
                              minWords: Int): (Column, Column) = {
    val clean = call_function("replace",
      call_function("replace", line, lit(LinkOpen), lit("")),
      lit(LinkClose), lit(""))
    val t = trim(clean)
    val total = length(t)
    // alnum count as length minus translate-removal — a plain string
    // expression, much cheaper per line than a regex pass; value-equal
    // to the oracle's regexp_replace('[^A-Za-z0-9]') spelling
    val alnum = total - length(translate(t,
      "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789", ""))
    val words = when(total === 0, lit(0))
      .otherwise(size(split(t, "\\s+", -1)))
    // linked chars: in each post-U+0001 segment, the part before U+0002
    val linked = aggregate(
      transform(slice(split(line, LinkOpen, -1), lit(2),
        size(split(line, LinkOpen, -1)) - 1),
        seg => length(substring_index(seg, LinkClose, 1))),
      lit(0), (acc, x) => acc + x)
    val keep = total >= minChars && words >= minWords &&
      alnum * 10 >= total * 4 && linked * 2 <= total
    (keep, t)
  }

  /** Full extraction: markup removal + per-line boilerplate filter,
    * kept lines re-joined with `\n`. Empty string when nothing reads
    * like prose. */
  def htmlToText(html: Column, minChars: Int = 25,
                 minWords: Int = 4): Column = {
    require(minChars > 0 && minWords > 0,
      s"thresholds must be positive, got ($minChars, $minWords)")
    val lines = split(stripMarkup(html), "\n", -1)
    val assessed = transform(lines, l => {
      val (keep, t) = lineKeepAndText(l, minChars, minWords)
      struct(keep.as("k"), t.as("t"))
    })
    array_join(
      transform(filter(assessed, s => s.getField("k")),
        s => s.getField("t")), "\n")
  }
}
