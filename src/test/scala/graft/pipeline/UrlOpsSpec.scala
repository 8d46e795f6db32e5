package graft.pipeline

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.tsne.SparkTestBase

/** URL canonicalization: every rule pinned on hand-built URLs, the
  * percent-decoder's single-pass (no re-decode) contract, the PSL-lite
  * registered-domain cases, and the dedup/cap operators. */
class UrlOpsSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private def canon(urls: String*): Seq[String] = {
    val s = spark
    import s.implicits._
    urls.toDF("url").select(UrlOps.canonicalizeUrl(col("url"))).as[String]
      .collect().toSeq
  }

  "canonicalizeUrl" should "lowercase scheme and host, keep path case" in {
    canon("HTTP://WWW.Example.COM/Path/File.HTML") shouldBe
      Seq("http://www.example.com/Path/File.HTML")
  }

  it should "strip fragments, userinfo, and default ports" in {
    canon(
      "http://example.com:80/a#sec-2",
      "https://user:pw@example.com:443/a",
      "https://example.com:8443/a",
      "http://example.com:8080/a?x=1#frag") shouldBe Seq(
      "http://example.com/a",
      "https://example.com/a",
      "https://example.com:8443/a",
      "http://example.com:8080/a?x=1")
  }

  it should "keep http :443 and https :80 (non-default for the scheme)" in {
    canon("http://h.com:443/a", "https://h.com:80/a") shouldBe
      Seq("http://h.com:443/a", "https://h.com:80/a")
  }

  it should "normalize an empty path to / (query with or without path)" in {
    canon("http://h.com", "http://h.com?b=2&a=1", "http://h.com#f") shouldBe
      Seq("http://h.com/", "http://h.com/?a=1&b=2", "http://h.com/")
  }

  it should "drop tracking params, sort the rest, drop an emptied query" in {
    canon(
      "http://h.com/p?z=9&utm_source=feed&a=1&gclid=g&fbclid=f",
      "http://h.com/p?utm_campaign=x&utm_medium=y",
      "http://h.com/p?b=2&&a=1") shouldBe Seq(
      "http://h.com/p?a=1&z=9",
      "http://h.com/p",
      "http://h.com/p?a=1&b=2")
  }

  it should "decode unreserved escapes only, either hex case" in {
    canon(
      "http://h.com/p%41th/%7Euser?z=%42",
      "http://h.com/a%2Fb?q=%3Fx",   // %2F %3F reserved — kept
      "http://h.com/p%6ad",          // lowercase hex a-f
      "http://h.com/p%4G%9/x") shouldBe Seq( // malformed — pass through
      "http://h.com/pAth/~user?z=B",
      "http://h.com/a%2Fb?q=%3Fx",
      "http://h.com/pjd",
      "http://h.com/p%4G%9/x")
  }

  it should "not re-decode: %2541 stays %41" in {
    canon("http://h.com/a%2541b") shouldBe Seq("http://h.com/a%2541b")
  }

  it should "pass relative references through unchanged (minus fragment)" in {
    canon("/local/path?b=2#f", "not a url") shouldBe
      Seq("/local/path?b=2", "not a url")
  }

  "registeredDomain" should "handle PSL-lite multi-level suffixes" in {
    val s = spark
    import s.implicits._
    val got = Seq(
      "www.news.example.co.uk", "example.co.uk", "a.b.c.example.com",
      "example.com", "localhost", "api.test.com.au")
      .toDF("h").select(UrlOps.registeredDomain(col("h"))).as[String]
      .collect().toSeq
    got shouldBe Seq(
      "example.co.uk", "example.co.uk", "example.com",
      "example.com", "localhost", "test.com.au")
  }

  "dedupByUrl" should "collapse cosmetic variants to one keeper" in {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "http://Ex.COM:80/a?b=2&a=1#f"),
      (2L, "http://ex.com/a?a=1&b=2"),
      (3L, "http://u:p@ex.com/a?a=1&utm_source=s&b=2"),
      (4L, "http://ex.com/other")).toDF("doc_id", "url")
    val got = UrlOps.dedupByUrl(docs).orderBy("url_canon")
      .as[(String, Long, Long)].collect().toSeq
    got shouldBe Seq(
      ("http://ex.com/a?a=1&b=2", 1L, 3L),
      ("http://ex.com/other", 4L, 1L))
  }

  "parseRobots" should "honor RFC 9309 grouping: * group only, empty rules skipped, unknown fields ignored" in {
    val s = spark
    import s.implicits._
    val txt = "# c\nUser-agent: bad-bot\nDisallow: /\n\n" +
      "User-agent: googlebot\nUser-agent: *\nDisallow: /a\nAllow: /a/b\n" +
      "Disallow:\nCrawl-delay: 5\n\nUser-agent: other\nDisallow: /c"
    val got = UrlOps.parseRobots(Seq(("d.com", txt)).toDF("domain", "robots_txt"))
      .as[(String, String, Boolean)].collect().toSeq
    // bad-bot's and other's rules ignored; the googlebot+* group's two
    // non-empty rules kept in order
    got shouldBe Seq(("d.com", "/a", false), ("d.com", "/a/b", true))
  }

  it should "start a fresh group at a User-agent line after rules" in {
    val s = spark
    import s.implicits._
    // '*' group closes when 'other' opens — /c belongs to other only
    val txt = "User-agent: *\nDisallow: /a\nUser-agent: other\nDisallow: /c"
    val got = UrlOps.parseRobots(Seq(("d.com", txt)).toDF("domain", "robots_txt"))
      .as[(String, String, Boolean)].collect().toSeq
    got shouldBe Seq(("d.com", "/a", false))
  }

  "robotsGate" should "decide by longest match, allow on ties, allow when unmatched" in {
    val s = spark
    import s.implicits._
    val rules = Seq(
      ("ex.com", "/a", false), ("ex.com", "/a/b", true),
      ("ex.com", "/t", false), ("ex.com", "/t", true)) // exact tie
      .toDF("domain", "rule_path", "allow")
    val urls = Seq(
      (1L, "http://ex.com/a/x"),    // /a disallows
      (2L, "http://ex.com/a/b/x"),  // longer /a/b allows
      (3L, "http://ex.com/zzz"),    // unmatched
      (4L, "http://ex.com/t/q"),    // tie -> allow wins
      (5L, "http://other.net/a/x")) // no rules for domain
      .toDF("doc_id", "url")
    val got = UrlOps.robotsGate(urls, rules).orderBy("doc_id")
      .select("doc_id", "allowed").as[(Long, Long)].collect().toSeq
    got shouldBe Seq((1L, 0L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L))
  }

  "domainCap" should "keep at most k per registered domain, largest-first" in {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "http://a.ex.com/1", 100),
      (2L, "http://b.ex.com/2", 300),
      (3L, "http://ex.com/3", 200),
      (4L, "http://ex.com/4", 300), // ties with 2 → doc_id breaks
      (5L, "http://other.org/5", 50)).toDF("doc_id", "url", "n_chars")
    val got = UrlOps.domainCap(docs, k = 2).orderBy("domain", "rn")
      .as[(String, Long, Int, Long)].collect().toSeq
    got shouldBe Seq(
      ("ex.com", 2L, 300, 1L),
      ("ex.com", 4L, 300, 2L),
      ("other.org", 5L, 50, 1L))
  }

  "sitemapDirectives" should "extract global Sitemap: lines, case-insensitive, first-colon split" in {
    val s = spark
    import s.implicits._
    val txt = "User-agent: *\nDisallow: /a\n" +
      "Sitemap: https://d.com/sitemap.xml\n" +
      "sitemap:https://d.com/s2.xml\nSITEMAP:   https://d.com/s3.xml  \n" +
      "NotASitemap: https://x.com/no\nDisallow: /b"
    val got = UrlOps.sitemapDirectives(
      Seq(("d.com", txt)).toDF("domain", "robots_txt"))
      .as[(String, String)].collect().toSeq
    got shouldBe Seq(
      ("d.com", "https://d.com/sitemap.xml"),
      ("d.com", "https://d.com/s2.xml"),
      ("d.com", "https://d.com/s3.xml"))
  }

  it should "emit nothing when no directive exists and not disturb group parsing" in {
    val s = spark
    import s.implicits._
    val txt = "User-agent: *\nSitemap: https://d.com/s.xml\nDisallow: /a"
    UrlOps.sitemapDirectives(Seq(("d.com", "User-agent: *\nDisallow: /a"))
      .toDF("domain", "robots_txt")).count() shouldBe 0L
    // the directive inside a group is STILL global — and ignored by the
    // group parser (unknown field), so rules are unchanged
    UrlOps.parseRobots(Seq(("d.com", txt)).toDF("domain", "robots_txt"))
      .as[(String, String, Boolean)].collect().toSeq shouldBe
      Seq(("d.com", "/a", false))
  }

  it should "skip a bare colonless 'sitemap' line and strip trailing comments" in {
    val s = spark
    import s.implicits._
    val txt = "sitemap\n" + // no colon: no value, must NOT echo the line
      "Sitemap: https://d.com/s.xml # primary\n" +
      "# Sitemap: https://d.com/commented-out.xml\n" +
      "Sitemap: https://d.com/s2.xml"
    val got = UrlOps.sitemapDirectives(
      Seq(("d.com", txt)).toDF("domain", "robots_txt"))
      .as[(String, String)].collect().toSeq
    got shouldBe Seq(
      ("d.com", "https://d.com/s.xml"),
      ("d.com", "https://d.com/s2.xml"))
  }

  "parseRobots (UA selection)" should "prefer the matching token group over *, case-insensitive" in {
    val s = spark
    import s.implicits._
    val txt = "User-agent: GraftBot\nDisallow: /bot-only\n\n" +
      "User-agent: *\nDisallow: /generic"
    val mine = UrlOps.parseRobots(Seq(("d.com", txt))
        .toDF("domain", "robots_txt"), agent = "graftbot")
      .as[(String, String, Boolean)].collect().toSeq
    mine shouldBe Seq(("d.com", "/bot-only", false))
    // the generic crawler still gets the * group
    val star = UrlOps.parseRobots(Seq(("d.com", txt))
        .toDF("domain", "robots_txt"))
      .as[(String, String, Boolean)].collect().toSeq
    star shouldBe Seq(("d.com", "/generic", false))
  }

  it should "fall back to * when no group names the token" in {
    val s = spark
    import s.implicits._
    val txt = "User-agent: other-bot\nDisallow: /o\n\n" +
      "User-agent: *\nDisallow: /generic"
    UrlOps.parseRobots(Seq(("d.com", txt)).toDF("domain", "robots_txt"),
        agent = "graftbot")
      .as[(String, String, Boolean)].collect().toSeq shouldBe
      Seq(("d.com", "/generic", false))
  }

  it should "combine ALL groups naming the token (RFC 9309 §2.2.1) and multi-UA headers" in {
    val s = spark
    import s.implicits._
    val txt = "User-agent: graftbot\nUser-agent: other\nDisallow: /a\n\n" +
      "User-agent: *\nDisallow: /star\n\n" +
      "User-agent: GRAFTBOT\nAllow: /a/b"
    UrlOps.parseRobots(Seq(("d.com", txt)).toDF("domain", "robots_txt"),
        agent = "graftbot")
      .as[(String, String, Boolean)].collect().toSeq shouldBe
      Seq(("d.com", "/a", false), ("d.com", "/a/b", true))
  }

  it should "treat a zero-rule token group as everything-allowed (not fallback)" in {
    val s = spark
    import s.implicits._
    // a matching group EXISTS (with no rules) — per the RFC that means
    // nothing is disallowed for this crawler; * must not apply
    val txt = "User-agent: graftbot\nDisallow:\n\n" +
      "User-agent: *\nDisallow: /"
    UrlOps.parseRobots(Seq(("d.com", txt)).toDF("domain", "robots_txt"),
        agent = "graftbot").count() shouldBe 0L
  }

  it should "strip # comments from rule lines before reading the value" in {
    val s = spark
    import s.implicits._
    val txt = "User-agent: * # applies to everyone\n" +
      "Disallow: /a # legacy area\n" +
      "# Disallow: /commented-out"
    UrlOps.parseRobots(Seq(("d.com", txt)).toDF("domain", "robots_txt"))
      .as[(String, String, Boolean)].collect().toSeq shouldBe
      Seq(("d.com", "/a", false))
  }

  "surtKey" should "reverse host labels, keep the port, and append )path?query" in {
    val s = spark
    import s.implicits._
    val got = Seq(
      "http://news.example.co.uk/pAth/5?a=1",
      "https://example.com:8443/",
      "http://single/x",
      "not a url").toDF("u")
      .select(UrlOps.surtKey(col("u"))).as[String].collect().toSeq
    got shouldBe Seq(
      "uk,co,example,news)/pAth/5?a=1",
      "com,example:8443)/",
      "single)/x",
      "not a url")
  }

  it should "collapse cosmetic variants once composed with the canonicalizer" in {
    val s = spark
    import s.implicits._
    val got = Seq(
      "HTTP://User:pw@Example.COM:80/a?z=2&a=1#frag",
      "http://example.com/a?a=1&z=2").toDF("u")
      .select(UrlOps.surtKey(UrlOps.canonicalizeUrl(col("u"))))
      .as[String].collect().toSeq
    got.distinct shouldBe Seq("com,example)/a?a=1&z=2")
  }

  "crawlDelays" should "take the delay from the UA-selected group, max across groups" in {
    val s = spark
    import s.implicits._
    val txt = "User-agent: graftbot\nDisallow: /a\nCrawl-delay: 7\n\n" +
      "User-agent: *\nCrawl-delay: 3\n\n" +
      "User-agent: GraftBot\nCrawl-delay: 11 # seconds"
    val mine = UrlOps.crawlDelays(Seq(("d.com", txt))
        .toDF("domain", "robots_txt"), agent = "graftbot")
      .as[(String, Long)].collect().toSeq
    mine shouldBe Seq(("d.com", 11L))
    val star = UrlOps.crawlDelays(Seq(("d.com", txt))
      .toDF("domain", "robots_txt")).as[(String, Long)].collect().toSeq
    star shouldBe Seq(("d.com", 3L))
  }

  it should "emit nothing when the selected group declares no delay or the value is junk" in {
    val s = spark
    import s.implicits._
    // token group exists without a delay: * must NOT leak in
    val t1 = "User-agent: graftbot\nDisallow: /a\n\nUser-agent: *\nCrawl-delay: 3"
    UrlOps.crawlDelays(Seq(("d.com", t1)).toDF("domain", "robots_txt"),
      agent = "graftbot").count() shouldBe 0L
    val t2 = "User-agent: *\nCrawl-delay: fast\nCrawl-delay: -2"
    UrlOps.crawlDelays(Seq(("d.com", t2)).toDF("domain", "robots_txt"))
      .count() shouldBe 0L
  }

  private def pslOf(hosts: Seq[String], rules: Seq[String])
      : Map[String, String] = {
    val s = spark
    import s.implicits._
    UrlOps.registeredDomainPsl(hosts.toDF("host"), rules.toDF("rule"))
      .as[(String, String)].collect().toMap
  }

  private val TestPsl = Seq("// comment line", "com", "uk", "co.uk", "jp",
    "*.ck", "!www.ck", "*.kawasaki.jp", "!city.kawasaki.jp")

  "registeredDomainPsl" should "pick the most-labels rule (publicsuffix.org normal rules)" in {
    pslOf(Seq("news.example.co.uk", "a.b.example.com"), TestPsl) shouldBe
      Map("news.example.co.uk" -> "example.co.uk",
        "a.b.example.com" -> "example.com")
  }

  it should "match wildcard rules one label below and honor exceptions" in {
    pslOf(Seq(
      "shop.web.ck",          // *.ck → suffix web.ck → one more label
      "sub.www.ck",           // !www.ck beats *.ck → the exception itself
      "a.city.kawasaki.jp",   // !city.kawasaki.jp
      "x.mall.kawasaki.jp"),  // *.kawasaki.jp → suffix mall.kawasaki.jp
      TestPsl) shouldBe Map(
      "shop.web.ck" -> "shop.web.ck",
      "sub.www.ck" -> "www.ck",
      "a.city.kawasaki.jp" -> "city.kawasaki.jp",
      "x.mall.kawasaki.jp" -> "x.mall.kawasaki.jp")
  }

  it should "fall back to the implicit * rule and keep suffix-only hosts unchanged" in {
    pslOf(Seq(
      "deep.sub.example.zz",  // no rule → last two labels
      "single",               // one label → unchanged
      "co.uk",                // host IS its public suffix → unchanged
      "web.ck"),              // wildcard suffix with no label below → unchanged
      TestPsl) shouldBe Map(
      "deep.sub.example.zz" -> "example.zz",
      "single" -> "single",
      "co.uk" -> "co.uk",
      "web.ck" -> "web.ck")
  }

  it should "agree with the PSL-lite on its own suffix list" in {
    val s = spark
    import s.implicits._
    val hosts = Seq("news.example.co.uk", "api.test.com.au", "a.b.cdn.ex.com",
      "blog.sample.org", "data.net", "x.site3.net")
    val liteRules = Seq("com", "org", "net", "uk", "au") ++
      UrlOps.MultiLevelSuffixes
    val psl = pslOf(hosts, liteRules)
    val lite = hosts.toDF("host")
      .select(col("host"), UrlOps.registeredDomain(col("host")))
      .as[(String, String)].collect().toMap
    psl shouldBe lite
  }

  "idnFold/canonicalHost" should "make one ACE key of both IDN spellings" in {
    val s = spark
    import s.implicits._
    val got = Seq(
      "http://MÜNCHEN.de/x", "http://xn--mnchen-3ya.de/x",
      "http://münchen.de:80/x", "https://日本語.jp:8443/x",
      "http://Plain.Example.com/x").toDF("u")
      .select(UrlOps.canonicalHost(col("u"))).as[String].collect().toSeq
    got shouldBe Seq(
      "xn--mnchen-3ya.de", "xn--mnchen-3ya.de",
      "xn--mnchen-3ya.de", // default port stripped after the fold
      "xn--wgv71a119e.jp:8443", // non-default port survives the fold
      "plain.example.com") // ASCII fast path untouched
  }

  it should "probe Unicode PSL rules and hosts in one folded space" in {
    val s = spark
    import s.implicits._
    val psl = Seq("// comment", "рф", "co.uk").toDF("rule")
    val hosts = Seq("россия.рф", "xn--h1alffa9f.xn--p1ai",
      "shop.example.co.uk").toDF("host")
    val got = UrlOps.registeredDomainPsl(hosts, psl)
      .as[(String, String)].collect().toMap
    got("россия.рф") shouldBe "xn--h1alffa9f.xn--p1ai"
    got("xn--h1alffa9f.xn--p1ai") shouldBe "xn--h1alffa9f.xn--p1ai"
    got("shop.example.co.uk") shouldBe "example.co.uk"
  }

  private def resolve(base: String, refs: String*): Seq[String] = {
    val s = spark
    import s.implicits._
    refs.toDF("ref")
      .select(UrlOps.resolveReference(lit(base), col("ref"))).as[String]
      .collect().toSeq
  }

  // RFC 3986 §5.4 base; expected values are the RFC's own, modulo the
  // two documented conventions (fragments stripped, empty path → "/")
  private val Rfc54Base = "http://a/b/c/d;p?q"

  "resolveReference" should "replay the RFC 3986 §5.4.1 normal examples" in {
    resolve(Rfc54Base,
      "g", "./g", "g/", "/g", "//g", "?y", "g?y", "g#s", ";x", "g;x",
      "g;x?y#s", "", ".", "./", "..", "../", "../g", "../..", "../../",
      "../../g") shouldBe Seq(
      "http://a/b/c/g", "http://a/b/c/g", "http://a/b/c/g/", "http://a/g",
      "http://g/", "http://a/b/c/d;p?y", "http://a/b/c/g?y",
      "http://a/b/c/g", "http://a/b/c/;x", "http://a/b/c/g;x",
      "http://a/b/c/g;x?y", "http://a/b/c/d;p?q", "http://a/b/c/",
      "http://a/b/c/", "http://a/b/", "http://a/b/", "http://a/b/g",
      "http://a/", "http://a/", "http://a/g")
  }

  it should "replay the §5.4.2 abnormal examples (incl. strict http:g)" in {
    resolve(Rfc54Base,
      "../../../g", "../../../../g", "/./g", "/../g", "g.", ".g", "g..",
      "..g", "./../g", "./g/.", "g/./h", "g/../h", "g;x=1/./y",
      "g;x=1/../y", "g?y/./x", "g?y/../x", "http:g") shouldBe Seq(
      "http://a/g", "http://a/g", "http://a/g", "http://a/g",
      "http://a/b/c/g.", "http://a/b/c/.g", "http://a/b/c/g..",
      "http://a/b/c/..g", "http://a/b/g", "http://a/b/c/g/",
      "http://a/b/c/g/h", "http://a/b/c/h", "http://a/b/c/g;x=1/y",
      "http://a/b/c/y", "http://a/b/c/g?y/./x", "http://a/b/c/g?y/../x",
      "http:g")
  }

  it should "pass absolute refs through with only dot-segment removal" in {
    resolve(Rfc54Base,
      "https://other.net/x/../y?k=1#f", "mailto:user@example.com",
      "//cdn.example.org/lib/../lib.js") shouldBe Seq(
      "https://other.net/y?k=1", "mailto:user@example.com",
      "http://cdn.example.org/lib.js")
  }

  it should "not mistake an absolute URL inside the query for a scheme" in {
    // the ubiquitous outbound-redirect pattern: the "://" lives in the
    // QUERY of a rooted/relative ref — the ref is NOT absolute
    resolve(Rfc54Base,
      "/out?url=https://x.example.com/p", "a?u=http://x",
      "go/../out?next=ftp://h/f") shouldBe Seq(
      "http://a/out?url=https://x.example.com/p",
      "http://a/b/c/a?u=http://x",
      "http://a/b/c/out?next=ftp://h/f")
  }

  it should "merge onto an authority-only base and keep // runs" in {
    resolve("http://h.example.com", "img/p.png", "?v=2") shouldBe
      Seq("http://h.example.com/img/p.png", "http://h.example.com?v=2")
    resolve("http://a/b//c/d", "e") shouldBe Seq("http://a/b//c/e")
  }

  "removeDotSegments" should "keep the root against over-popping" in {
    val s = spark
    import s.implicits._
    Seq("/..", "/../..", "/a/b/../../../c").toDF("p")
      .select(UrlOps.removeDotSegments(col("p"))).as[String]
      .collect().toSeq shouldBe Seq("/", "/", "/c")
  }
}
