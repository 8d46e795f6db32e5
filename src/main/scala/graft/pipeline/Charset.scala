package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Character-encoding sniffing for crawled payloads — the step between
  * the raw WARC bytes and any text operator: a corpus pipeline must
  * decide each page's encoding BEFORE it can extract, tokenize, or hash
  * text, and real servers routinely disagree with themselves about it.
  *
  * Precedence ladder (the HTML5 §13.2.3 order, which every browser and
  * Common-Crawl-style extractor follows):
  *   1. a byte-order mark wins unconditionally — UTF-8 (`EF BB BF`),
  *      UTF-16BE (`FE FF`), UTF-16LE (`FF FE`);
  *   2. else the transport `Content-Type` header's `charset` parameter;
  *   3. else the in-document meta prescan over the first `prescanBytes`
  *      bytes, decoded as ISO-8859-1 (every byte maps to a char, so the
  *      prescan can never throw): both declaration forms —
  *      `<meta charset=X>` and
  *      `<meta http-equiv=Content-Type content="text/html; charset=X">`
  *      — reduce to the first `charset=` attribute/parameter;
  *   4. else a default. HTML5 prescribes locale-dependent windows-1252;
  *      a crawl pipeline wants one deterministic answer, so the default
  *      here is `utf-8` (the modern-web majority encoding and what
  *      every downstream operator in this repo assumes).
  *
  * Names are normalized to lowercase with the ubiquitous aliases folded
  * (`utf8` → `utf-8`, `latin-1`/`latin1`/`iso_8859-1` → `iso-8859-1`,
  * `us-ascii`/`ascii` → `us-ascii`) — enough to make equal encodings
  * compare equal without dragging in the full WHATWG alias table.
  *
  * Everything is pure Column work over the binary payload (`hex` of a
  * 3-byte prefix for the BOM, one bounded `decode` + regex for the
  * prescan) — zero UDF, zero shuffle, rides the ingest scan.
  */
object Charset {

  /** Fold the common aliases and lowercase. */
  private def normalize(enc: Column): Column = {
    val e = lower(enc)
    when(e === "utf8", lit("utf-8"))
      .when(e.isin("latin-1", "latin1", "l1", "iso_8859-1", "iso8859-1"),
        lit("iso-8859-1"))
      .when(e === "ascii", lit("us-ascii"))
      .otherwise(e)
  }

  private val CharsetParam = "(?i)charset\\s*=\\s*[\"']?([A-Za-z0-9_.:-]+)"

  /** `struct(encoding, via)` for one payload: `via` says which rung of
    * the ladder decided (`bom`, `header`, `meta`, `default`) — the
    * diagnostic a quality dashboard groups by. `payload` is the raw
    * binary column; `contentType` the transport header value (empty or
    * NULL when absent). */
  def sniff(payload: Column, contentType: Column,
            prescanBytes: Int = 1024): Column = {
    require(prescanBytes > 0, s"prescan must be positive, got $prescanBytes")
    val h3 = hex(substring(payload, 1, 3))
    val h2 = hex(substring(payload, 1, 2))
    val bom = when(h3 === "EFBBBF", lit("utf-8"))
      .when(h2 === "FEFF", lit("utf-16be"))
      .when(h2 === "FFFE", lit("utf-16le"))
    val header = regexp_extract(coalesce(contentType, lit("")),
      CharsetParam, 1)
    // ISO-8859-1 decodes any byte sequence, so the prescan is total
    val prefix = decode(substring(payload, 1, prescanBytes), "ISO-8859-1")
    // ALL candidate meta elements, first one with an actual charset=
    // declaration wins — a preceding meta that merely MENTIONS the word
    // (<meta name=keywords content="charset tips">) must not shadow a
    // real <meta charset=...> later in the head
    val metaElems = regexp_extract_all(prefix,
      lit("(?is)<meta\\b[^>]*charset[^>]*>"), lit(0))
    val meta = coalesce(try_element_at(filter(
      transform(metaElems, e => regexp_extract(e, CharsetParam, 1)),
      c => length(c) > 0), lit(1)), lit(""))
    when(bom.isNotNull,
      struct(bom.as("encoding"), lit("bom").as("via")))
      .when(length(header) > 0,
        struct(normalize(header).as("encoding"), lit("header").as("via")))
      .when(length(meta) > 0,
        struct(normalize(meta).as("encoding"), lit("meta").as("via")))
      .otherwise(struct(lit("utf-8").as("encoding"), lit("default").as("via")))
  }
}
