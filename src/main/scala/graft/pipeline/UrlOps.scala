package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL canonicalization and domain-level curation — the front door of
  * every web-scale corpus pipeline (C4, RefinedWeb, Dolma all dedup on a
  * canonical URL and cap/filter per registered domain before any text
  * operator runs).
  *
  * Everything here is pure codegen'd Column work (string splits, HOFs,
  * regex — zero UDFs), so canonicalization is a narrow map with no
  * shuffle: embarrassingly parallel at 100 TB. The only shuffles in the
  * family are the one hash-aggregation of [[dedupByUrl]] and the
  * [[domainCap]] ranking, which executes through the GroupedTopKLimit
  * plan rewrite (bounded per-group heap — no full per-domain sort).
  *
  * Canonical form (RFC 3986 §6 normalization, the subset that is safe
  * without scheme-specific knowledge):
  *   - fragment stripped (never sent to the server);
  *   - scheme and host lowercased;
  *   - userinfo (`user:pw@`) stripped — a dedup key must not split on
  *     credentials;
  *   - default port stripped (`:80` for http, `:443` for https); other
  *     ports kept;
  *   - percent-escapes of UNRESERVED octets (ALPHA / DIGIT / `-._~`)
  *     decoded in path+query; reserved escapes (`%2F`, `%3F`, …) left
  *     intact — decoding those would change the URL's structure;
  *   - tracking parameters removed ([[TrackingParamPattern]]: `utm_*`,
  *     `gclid`, `fbclid`, `msclkid`, `mc_eid`, `igshid` — the
  *     cross-site-stable subset of the uBlock/Brave strip lists);
  *   - remaining query parameters sorted bytewise (param order is
  *     almost never semantic, and sorting collapses permuted duplicates);
  *   - empty path normalized to `/`.
  * URLs with no `://` are returned unchanged — a relative reference has
  * no authority to normalize.
  */
object UrlOps {

  /** Tracking parameters dropped by [[canonicalizeUrl]]: anchored regex
    * over one `name=value` pair (or a bare name). Spark (Java regex) and
    * DuckDB (RE2) agree on every construct used here. */
  val TrackingParamPattern: String =
    "^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|mc_eid|igshid)(=.*)?$"

  /** Multi-level public suffixes recognized by [[registeredDomain]] — a
    * deterministic PSL-lite. A production deployment swaps in the full
    * Mozilla Public Suffix List (broadcast, ~9k rows); the algorithm —
    * longest-suffix match, registered domain = one label more — is the
    * real deliverable and is list-size-independent. */
  val MultiLevelSuffixes: Seq[String] = Seq(
    "co.uk", "ac.uk", "gov.uk", "org.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "co.in", "co.kr", "com.br", "com.cn",
    "com.mx", "co.nz")

  private val Hex = "0123456789ABCDEF"

  /** 0–15 for a hex digit Column (either case), −1 for anything else. */
  private def hexVal(ch: Column): Column =
    call_function("instr", lit(Hex), upper(ch)) - 1

  /** Single-pass percent-decoding of UNRESERVED octets (RFC 3986 §2.3:
    * ALPHA / DIGIT / `-` `.` `_` `~`). Split on `%`: every segment after
    * the first starts at an escape; decode its two leading hex chars iff
    * they spell an unreserved octet, else re-attach the literal `%`.
    * One pass means a decoded character can never be re-read as the
    * start of a new escape, so `%2541` stays `%41` as RFC normalization
    * requires. Malformed escapes (bad hex, truncated) pass through.
    * Pure HOF Columns — codegen'd, no UDF. */
  def percentDecodeUnreserved(c: Column): Column = {
    val parts = split(c, "%", -1)
    val decoded = transform(slice(parts, lit(2), size(parts) - 1), seg => {
      val h1 = hexVal(substring(seg, 1, 1))
      val h2 = hexVal(substring(seg, 2, 1))
      val code = h1 * 16 + h2
      val unreserved = (code >= 48 && code <= 57) ||
        (code >= 65 && code <= 90) || (code >= 97 && code <= 122) ||
        code.isin(45, 46, 95, 126)
      when(length(seg) >= 2 && h1 >= 0 && h2 >= 0 && unreserved,
        concat(call_function("chr", code), call_function("substr", seg, lit(3))))
        .otherwise(concat(lit("%"), seg))
    })
    concat(element_at(parts, 1), array_join(decoded, ""))
  }

  /** The authority part of `url` (everything between `://` and the first
    * `/` or `?`), still raw: userinfo and port intact, case preserved. */
  private def rawAuthority(rest: Column): Column =
    regexp_extract(rest, "^[^/?]*", 0)

  /** Canonical host of a URL Column: lowercased, userinfo stripped,
    * default port stripped. Empty string when the URL has no `://`. */
  def canonicalHost(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    val rest = call_function("substr", noFrag,
      call_function("instr", noFrag, lit("://")) + 3)
    val scheme = lower(substring_index(noFrag, "://", 1))
    val hp = lower(regexp_extract(rawAuthority(rest), "[^@]*$", 0))
    val host =
      when(scheme === "http" && hp.endsWith(":80"),
        call_function("substr", hp, lit(1), length(hp) - 3))
        .when(scheme === "https" && hp.endsWith(":443"),
          call_function("substr", hp, lit(1), length(hp) - 4))
        .otherwise(hp)
    when(call_function("instr", noFrag, lit("://")) === 0, lit(""))
      .otherwise(host)
  }

  /** Full canonicalization — see the object doc for the exact rule set.
    * One narrow map over the URL column; no shuffle. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    val scheme = lower(substring_index(noFrag, "://", 1))
    val rest = call_function("substr", noFrag,
      call_function("instr", noFrag, lit("://")) + 3)
    val auth = rawAuthority(rest)
    val host = canonicalHost(url)
    val pq = percentDecodeUnreserved(
      call_function("substr", rest, length(auth) + 1))
    val path = substring_index(pq, "?", 1)
    val qmark = call_function("instr", pq, lit("?"))
    val query = when(qmark > 0, call_function("substr", pq, qmark + 1))
      .otherwise(lit(""))
    val params = array_sort(filter(split(query, "&", -1),
      p => length(p) > 0 && !p.rlike(TrackingParamPattern)))
    val canonQ = when(size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    val canonPath = when(path === "", lit("/")).otherwise(path)
    when(call_function("instr", noFrag, lit("://")) === 0, noFrag)
      .otherwise(concat(scheme, lit("://"), host, canonPath, canonQ))
  }

  /** Registered (pay-level) domain of a canonical host: the label
    * directly below the public suffix. PSL-lite — exact multi-level
    * suffixes from [[MultiLevelSuffixes]], else the last label is the
    * suffix. Hosts with a single label (or an IP — out of scope for the
    * lite list) return unchanged. */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.", -1)
    val n = size(labels)
    val last2 = concat(element_at(labels, -2), lit("."), element_at(labels, -1))
    when(n >= 3 && last2.isin(MultiLevelSuffixes: _*),
      concat(element_at(labels, -3), lit("."), last2))
      .when(n >= 2, last2)
      .otherwise(host)
  }

  /** URL-level exact dedup: group by canonical URL, keep the smallest id
    * (the standard first-crawled-wins rule), report group size. One hash
    * aggregation on the canonical key — map-side combinable, and the key
    * is high-cardinality so no skew salting is needed. Emits
    * `(url_canon, keeper, n_dups)`. */
  def dedupByUrl(docs: DataFrame, urlCol: String = "url",
                 idCol: String = "doc_id"): DataFrame =
    docs.select(canonicalizeUrl(col(urlCol)).as("url_canon"), col(idCol))
      .groupBy("url_canon")
      .agg(min(idCol).as("keeper"), count(lit(1)).as("n_dups"))

  /** Parse robots.txt (RFC 9309) into `(domain, rule_path, allow)` rows
    * — the `User-agent: *` group's Allow/Disallow rules only, which is
    * what a generic crawler obeys. A pure-Column line-fold state
    * machine (no UDF): consecutive `User-agent:` lines accumulate into
    * one group (a UA line after rules starts a fresh group, per the
    * RFC's grouping), rules outside a `*` group are skipped, empty rule
    * values (the RFC's "Disallow:" = nothing disallowed) are skipped,
    * and unknown fields (`Crawl-delay:`, comments, blanks) are ignored.
    * The robots table is per-domain — tiny next to the corpus — so the
    * fold runs once per domain and the result broadcasts. */
  def parseRobots(robots: DataFrame, domainCol: String = "domain",
                  txtCol: String = "robots_txt"): DataFrame = {
    val lines = split(col(txtCol), "\n", -1)
    val init = struct(lit(false).as("star"), lit(false).as("ua"),
      array().cast("array<struct<path:string,allow:boolean>>").as("rules"))
    val folded = aggregate(lines, init, (acc, raw) => {
      val l = trim(raw)
      val low = lower(l)
      val isUa = low.startsWith("user-agent:")
      val isDis = low.startsWith("disallow:")
      val isAl = low.startsWith("allow:")
      val value = trim(call_function("substr", l,
        call_function("instr", l, lit(":")) + 1))
      val star = when(isUa,
        when(acc.getField("ua"), acc.getField("star") || (value === "*"))
          .otherwise(value === "*"))
        .otherwise(acc.getField("star"))
      val rules = when((isDis || isAl) && acc.getField("star") &&
          length(value) > 0,
        array_append(acc.getField("rules"),
          struct(value.as("path"), isAl.as("allow"))))
        .otherwise(acc.getField("rules"))
      struct(star.as("star"), isUa.as("ua"), rules.as("rules"))
    }, acc => acc.getField("rules"))
    robots.select(col(domainCol).as("domain"), explode(folded).as("r"))
      .select(col("domain"), col("r.path").as("rule_path"),
        col("r.allow").as("allow"))
  }

  /** `Sitemap:` directives from robots.txt (RFC 9309 §2.3 / sitemaps.org
    * discovery): how a crawler FINDS a site's sitemap in the first place
    * — the missing hop between the robots gate and the sitemap probe.
    * Directives are global (not group-scoped) and may repeat, so this is
    * a plain line filter, not part of the group state machine: every
    * line whose field name is `sitemap` (case-insensitive) yields its
    * value verbatim (sitemap URLs contain `:`, so the split is on the
    * FIRST colon only). Emits `(domain, sitemap_url)`, one row per
    * directive, in file order. */
  def sitemapDirectives(robots: DataFrame, domainCol: String = "domain",
                        txtCol: String = "robots_txt"): DataFrame = {
    val urls = filter(
      transform(split(col(txtCol), "\n", -1), raw => {
        val l = trim(raw)
        when(lower(substring_index(l, ":", 1)) === "sitemap",
          trim(call_function("substr", l,
            call_function("instr", l, lit(":")) + 1)))
      }),
      v => v.isNotNull && length(v) > 0)
    robots.select(col(domainCol).as("domain"),
      explode(urls).as("sitemap_url"))
  }

  /** Gate URLs through parsed robots rules with RFC 9309 matching: the
    * LONGEST rule whose path is a prefix of the URL's canonical path
    * decides; on a length tie the least restrictive (Allow) wins; no
    * matching rule (or no rules for the domain) means allowed. The tie
    * rule rides one integer: `score = 2·len(rule) + allowBit`, so a
    * single map-side-combinable `max` per doc IS the RFC decision — no
    * window, no sort. Rules broadcast (per-domain table); the corpus
    * side is one narrow map + one grouped max. Emits
    * `(doc_id, domain, allowed)`. */
  def robotsGate(urls: DataFrame, rules: DataFrame, urlCol: String = "url",
                 idCol: String = "doc_id"): DataFrame = {
    val canon = canonicalizeUrl(col(urlCol))
    // localCheckpoint the slim (id, domain, path) projection before the
    // join+aggregate: the canonicalization tree (each Column reference
    // duplicates its subtree) otherwise fuses into the agg's codegen
    // stage and blows janino's method limit (interpreted fallback), and
    // would be re-analyzed per downstream action — the same internal
    // materialization pageRank does for its edge table
    val withPath = urls.select(col(idCol),
      registeredDomain(canonicalHost(col(urlCol))).as("domain"),
      regexp_extract(canon, "://[^/]*(/[^?]*)", 1).as("path"))
      .localCheckpoint()
    withPath.join(broadcast(rules), Seq("domain"), "left")
      .select(col(idCol), col("domain"),
        when(col("rule_path").isNotNull &&
            col("path").startsWith(col("rule_path")),
          length(col("rule_path")) * 2 + col("allow").cast("int"))
          .otherwise(lit(-1)).as("score"))
      .groupBy(idCol, "domain")
      .agg(max("score").as("s"))
      .select(col(idCol), col("domain"),
        when(col("s") < 0, lit(1L))
          .otherwise((col("s") % 2).cast("long")).as("allowed"))
  }

  /** Per-registered-domain quota: keep at most `k` docs per domain,
    * largest-first with a deterministic id tiebreak — the row_number +
    * filter shape that executes through the GroupedTopKLimit plan
    * rewrite (bounded per-group heap), so no domain is ever fully
    * sorted no matter how many pages it contributed. Emits the
    * surviving rows plus their in-domain rank. */
  def domainCap(docs: DataFrame, k: Int, urlCol: String = "url",
                idCol: String = "doc_id",
                sizeCol: String = "n_chars"): DataFrame = {
    require(k > 0, s"cap must be positive, got $k")
    val w = Window.partitionBy("domain")
      .orderBy(col(sizeCol).desc, col(idCol))
    docs.withColumn("domain",
        registeredDomain(canonicalHost(col(urlCol))))
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= k)
      .select(col("domain"), col(idCol), col(sizeCol), col("rn"))
  }
}
