package graft.pipeline

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.tsne.SparkTestBase

/** HTML→text extraction pinned on hand-built pages with known
  * boilerplate: script/style/comment removal (including embedded `<`),
  * entity decoding order, and each arm of the jusText-lite line rule
  * (length, words, alnum density, link density). */
class HtmlSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private def extract(pages: String*): Seq[String] = {
    val s = spark
    import s.implicits._
    pages.toDF("html").select(Html.htmlToText(col("html"))).as[String]
      .collect().toSeq
  }

  private val prose =
    "The quick brown fox jumps over the lazy dog near the river bank."
  private val prose2 =
    "A second paragraph long enough to count as prose for the filter."

  "htmlToText" should "keep main prose and drop nav/footer/chrome" in {
    val page =
      s"""<!DOCTYPE html><html><head><title>Doc 1</title>
         |<style>body{color:#333} .nav{k:1}</style>
         |<script>if(1<2){var nav="<div>";}</script>
         |</head><body>
         |<nav><ul><li><a href="/">Home</a></li><li><a href="/about">About us</a></li></ul></nav>
         |<div class="content"><h1>Document 1</h1>
         |<p>$prose</p><p>$prose2</p></div>
         |<footer><a href="/tos">Terms of Service</a> <a href="/privacy">Privacy Policy</a> &copy; 2026</footer>
         |</body></html>""".stripMargin.replace("\n", "")
    extract(page) shouldBe Seq(s"$prose\n$prose2")
  }

  it should "remove script/style blocks wholesale even with embedded tags" in {
    extract(s"<script>var a = '<p>${prose}</p>';</script><p>$prose2</p>",
      s"<style>p:after{content:'<'}</style><p>$prose</p>") shouldBe
      Seq(prose2, prose)
  }

  it should "decode entities in the right order (no double decode)" in {
    val page = "<p>Use &amp;lt; to spell &lt;tag&gt; and &quot;x&#39;s&quot; " +
      "plus&nbsp;space in long enough prose here.</p>"
    extract(page) shouldBe Seq(
      "Use &lt; to spell <tag> and \"x's\" plus space in long enough prose here.")
  }

  it should "drop short, few-word, low-density, and link-dense lines" in {
    val linkDense = "<p><a href=\"/a\">Click here for much more info</a> now</p>"
    val lowDensity = "<p>== == == ?! ... %% $$ @@ ++ ~~ == == == ?! ...</p>"
    val fewWords = "<p>Supercalifragilisticexpialidocious antidisestablishmentarianism</p>"
    val short = "<p>Tiny line here</p>"
    extract(
      s"$linkDense<p>$prose</p>",
      s"$lowDensity<p>$prose</p>",
      s"$fewWords<p>$prose</p>",
      s"$short<p>$prose</p>") shouldBe Seq(prose, prose, prose, prose)
  }

  it should "drop comments and return empty for all-boilerplate pages" in {
    extract(
      s"<!-- $prose hidden in a comment --><p>$prose2</p>",
      "<nav><a href=\"/\">Home</a></nav><footer>c</footer>") shouldBe
      Seq(prose2, "")
  }

  private def links(pages: String*): Seq[Seq[String]] = {
    val s = spark
    import s.implicits._
    pages.toDF("html").select(Html.extractLinks(col("html")))
      .as[Seq[String]].collect().toSeq
  }

  "extractLinks" should "extract hrefs in document order across all three quote forms" in {
    links(
      """<a href="http://a.com/x">one</a> mid <a href='http://b.com/y?q=1'>two</a>
        |<a class="z" href=/rel>three</a>""".stripMargin) shouldBe
      Seq(Seq("http://a.com/x", "http://b.com/y?q=1", "/rel"))
  }

  it should "not read data-href (or any *-href attribute) as the link target" in {
    links(
      "<a data-href=\"http://decoy.invalid/x\" href=\"/real\">a</a>" +
        "<a data-href=\"http://decoy.invalid/y\">no real href</a>") shouldBe
      Seq(Seq("/real"))
  }

  it should "decode &amp; in attribute values and skip anchors without href" in {
    links(
      "<a href=\"http://a.com/?x=1&amp;y=2\">q</a><a name=\"no-target\">n</a>",
      "no anchors at all") shouldBe
      Seq(Seq("http://a.com/?x=1&y=2"), Seq())
  }

  it should "not read past a quoted value or swallow following markup" in {
    links("<a href=\"http://a.com\">t</a><p>x</p><a href=''>empty</a>") shouldBe
      Seq(Seq("http://a.com", ""))
  }

  it should "match href case-insensitively and tolerate spaces around =" in {
    links("<A HREF = \"http://up.example.com/p\">U</A>") shouldBe
      Seq(Seq("http://up.example.com/p"))
  }

  private def anchors(page: String): Seq[(String, String)] = {
    val s = spark
    import s.implicits._
    Seq(page).toDF("html")
      .select(explode(Html.extractAnchors(col("html"))).as("a"))
      .select("a.href", "a.anchor").as[(String, String)].collect().toSeq
  }

  "extractAnchors" should "pair each href with its tag-stripped, entity-decoded label" in {
    anchors("""<a href="http://a.com"><b>First</b> &amp; best</a>
              | mid <a href='http://b.com'>the
              |second</a>""".stripMargin) shouldBe
      Seq(("http://a.com", "First & best"), ("http://b.com", "the second"))
  }

  it should "skip an <a> whose only href-like attribute is data-href" in {
    anchors("<a name=\"x\" data-href=\"http://decoy.invalid/y\">not a link</a>" +
      "<a data-href=\"http://decoy.invalid/z\" href=\"http://real.com\">ok</a>") shouldBe
      Seq(("http://real.com", "ok"))
  }

  it should "skip anchors without an href" in {
    anchors("<a name=\"x\">label only</a><a href=/rel>rel</a>") shouldBe
      Seq(("/rel", "rel"))
  }

  it should "handle empty labels and nested markup" in {
    anchors("<a href=\"u://x\"></a><a href=\"u://y\"><i><u>deep</u></i>!</a>") shouldBe
      Seq(("u://x", ""), ("u://y", "deep !"))
  }

  private def extractCtx(pages: String*): Seq[String] = {
    val s = spark
    import s.implicits._
    pages.toDF("html").select(Html.htmlToTextContext(col("html")))
      .as[String].collect().toSeq
  }

  "htmlToTextContext" should "rescue a short heading next to good prose" in {
    val page = s"<nav><a href='/'>Home</a></nav><h1>Document 7</h1>" +
      s"<p>$prose</p>"
    extractCtx(page) shouldBe Seq(s"Document 7\n$prose")
    // the line rule alone drops the heading
    extract(page) shouldBe Seq(prose)
  }

  it should "rescue a short caption AFTER good prose via the next side" in {
    extractCtx(s"<p>$prose</p><p>Figure 1: setup</p>" +
      "<footer><a href=/t>ToS</a> <a href=/p>Privacy</a></footer>") shouldBe
      Seq(s"$prose\nFigure 1: setup")
  }

  it should "not rescue a short line surrounded by chrome" in {
    extractCtx("<nav><a href='/'>Home</a> <a href='/a'>About</a></nav>" +
      "<h1>Lonely heading</h1>" +
      "<footer><a href=/t>ToS</a> <a href=/p>Privacy</a></footer>") shouldBe
      Seq("")
  }

  it should "not let a short line rescue another short line" in {
    // nearest NON-short neighbor decides: heading + subheading between
    // bad chrome — neither has a GOOD non-short neighbor
    extractCtx("<nav><a href='/'>Home</a></nav><h1>Heading one</h1>" +
      "<h2>Subhead two</h2><footer><a href=/t>ToS</a> &copy;</footer>") shouldBe
      Seq("")
    // ...but both rescue when prose follows: nearest non-short of BOTH
    // shorts (scanning past the other short) is the good paragraph
    extractCtx(s"<h1>Heading one</h1><h2>Subhead two</h2><p>$prose</p>") shouldBe
      Seq(s"Heading one\nSubhead two\n$prose")
  }

  it should "never rescue link-dense or symbol-heavy short lines" in {
    extractCtx(s"<p>$prose</p><p><a href='/m'>more...</a></p>" +
      s"<p>*** ### ***</p><p>$prose2</p>") shouldBe Seq(s"$prose\n$prose2")
  }

  private def meta(page: String): (String, String, String, String, String) = {
    val s = spark
    import s.implicits._
    Seq(page).toDF("html").select(Html.pageMeta(col("html")).as("m"))
      .select("m.title", "m.description", "m.lang", "m.canonical",
        "m.robots")
      .as[(String, String, String, String, String)].collect().head
  }

  "pageMeta" should "extract title, description, lang, canonical, robots" in {
    meta("<html lang=\"en-GB\"><head><title> A &amp; B </title>" +
      "<meta name=\"description\" content=\"Fine &quot;page&quot;\">" +
      "<link rel=\"canonical\" href=\"https://ex.com/a?x=1\">" +
      "<meta name=\"robots\" content=\"NOINDEX, nofollow\">" +
      "</head><body></body></html>") shouldBe
      ("A & B", "Fine \"page\"", "en-gb", "https://ex.com/a?x=1",
        "noindex, nofollow")
  }

  it should "handle reversed attribute order, unquoted values, absence" in {
    meta("<html lang=en><head>" +
      "<meta content='rev order desc' name='description'>" +
      "<link href=/rel-canon rel=canonical></head>") shouldBe
      ("", "rev order desc", "en", "/rel-canon", "")
    meta("<p>no head at all</p>") shouldBe ("", "", "", "", "")
  }

  it should "not read keywords meta as description (name token boundary)" in {
    meta("<meta name=\"descriptions-custom\" content=\"wrong\">" +
      "<meta name=\"description\" content=\"right\">")._2 shouldBe "right"
  }

  private def gate(metaRobots: String, header: String): (Boolean, Boolean) = {
    val s = spark
    import s.implicits._
    Seq((metaRobots, header)).toDF("m", "h")
      .select(Html.noindexGate(col("m"), col("h")).as("g"))
      .select("g.indexable", "g.followable")
      .as[(Boolean, Boolean)].collect().head
  }

  "jsonLdBlocks" should "extract only typed ld+json blocks, in order" in {
    val s = spark
    import s.implicits._
    val page = "<script>var a=1;</script>" +
      "<script type=\"application/ld+json\">{\"a\":1}</script>" +
      "<script type='application/ld+json' async>{\"b\":2}</script>" +
      "<script type=\"text/javascript\">{\"c\":3}</script>"
    Seq(page).toDF("html")
      .select(Html.jsonLdBlocks(col("html"))).as[Seq[String]]
      .collect().head shouldBe Seq("{\"a\":1}", "{\"b\":2}")
  }

  "noindexGate" should "honor noindex/nofollow/none from either channel" in {
    gate("", "") shouldBe ((true, true))
    gate("noindex", "") shouldBe ((false, true))
    gate("", "NOFOLLOW") shouldBe ((true, false))
    gate("none", "") shouldBe ((false, false))
    gate("index, follow", "") shouldBe ((true, true))
    gate("noarchive, unavailable_after: 2026-01-01", "noindex") shouldBe
      ((false, true))
  }

  private def cells(page: String): Seq[Seq[Seq[String]]] = {
    val s = spark
    import s.implicits._
    Seq(page).toDF("html").select(Html.tableCells(col("html")))
      .as[Seq[Seq[Seq[String]]]].collect().head
  }

  "tableCells" should "extract tables, rows, and cells in source order" in {
    cells("<table><tr><th>A</th><th>B</th></tr>" +
      "<tr><td>1</td><td>2</td></tr></table>" +
      "<p>between</p><table class=x><tr><td>solo</td></tr></table>") shouldBe
      Seq(Seq(Seq("A", "B"), Seq("1", "2")), Seq(Seq("solo")))
  }

  it should "strip inline markup, decode entities, collapse whitespace" in {
    cells("<TABLE><TR><TD> <b>bold</b>\n &amp; <a href='/'>link</a>ed " +
      "</TD><td>x&lt;y</td></TR></TABLE>") shouldBe
      Seq(Seq(Seq("bold & link ed", "x<y")))
  }

  it should "handle ragged rows and attribute-laden tags" in {
    cells("<table border=1><tr align=center><td colspan=\"2\">wide</td>" +
      "</tr><tr><td>a</td><td>b</td></tr></table>") shouldBe
      Seq(Seq(Seq("wide"), Seq("a", "b")))
  }

  it should "return empty for pages without tables" in {
    cells("<html><body><p>no tables here</p></body></html>") shouldBe Seq()
  }

  private def md(page: String): String = {
    val s = spark
    import s.implicits._
    Seq(page).toDF("html").select(Html.toMarkdown(col("html")))
      .as[String].collect().head
  }

  "toMarkdown" should "convert headings, emphasis, links, and lists" in {
    md("<html><head><title>skip</title></head><body>" +
      "<h1>Title</h1><h3>Sub</h3>" +
      "<p>Some <b>bold</b> and <em>italic</em> text.</p>" +
      "<ul><li>one</li><li>two</li></ul>" +
      "<p>Visit <a href=\"/x\">this page</a> today.</p>" +
      "</body></html>") shouldBe
      "# Title\n\n### Sub\n\nSome **bold** and *italic* text.\n\n" +
        "- one\n- two\n\nVisit [this page](/x) today."
  }

  it should "decode entities and normalize whitespace" in {
    md("<p>a &amp; b   c</p>\n\n\n<p>d &lt;e&gt;</p>") shouldBe
      "a & b c\n\nd <e>"
  }

  it should "not treat body as bold and keeps bare text" in {
    md("<body>plain prose</body>") shouldBe "plain prose"
  }

  it should "turn br into line breaks within a paragraph" in {
    md("<p>line one<br>line two<br/>line three</p>") shouldBe
      "line one\nline two\nline three"
  }

  "openGraph" should "map og/twitter metas and skip other metas" in {
    val s = spark
    import s.implicits._
    val page = "<head><meta property=\"og:title\" content=\"T1\"/>" +
      "<meta content=\"article\" property=\"og:type\"/>" +
      "<meta name=\"twitter:card\" content=\"summary\"/>" +
      "<meta name=\"viewport\" content=\"width=device-width\"/></head>"
    Seq(page).toDF("html").select(Html.openGraph(col("html")))
      .as[Map[String, String]].collect().head shouldBe
      Map("og:title" -> "T1", "og:type" -> "article",
        "twitter:card" -> "summary")
  }

  it should "let a later duplicate win" in {
    val s = spark
    import s.implicits._
    val page = "<meta property=\"og:title\" content=\"first\"/>" +
      "<meta property=\"og:title\" content=\"second\"/>"
    Seq(page).toDF("html").select(Html.openGraph(col("html")))
      .as[Map[String, String]].collect()
      .head("og:title") shouldBe "second"
  }

  "imgCandidates" should "parse srcset widths plus the src fallback" in {
    val s = spark
    import s.implicits._
    val page = "<img srcset=\"/a-480.jpg 480w, /a-800.jpg 800w\" " +
      "src=\"/a.jpg\"><img src=\"/b.png\">"
    Seq(page).toDF("html").select(Html.imgCandidates(col("html")))
      .as[Seq[Seq[(String, Long)]]].collect().head shouldBe
      Seq(Seq(("/a-480.jpg", 480L), ("/a-800.jpg", 800L), ("/a.jpg", 0L)),
        Seq(("/b.png", 0L)))
  }

  it should "handle srcset-only images and density descriptors" in {
    val s = spark
    import s.implicits._
    // 2x density has no width descriptor -> width 0
    val page = "<img srcset=\"/c.jpg 2x, /c-big.jpg 1200w\">"
    Seq(page).toDF("html").select(Html.imgCandidates(col("html")))
      .as[Seq[Seq[(String, Long)]]].collect().head shouldBe
      Seq(Seq(("/c.jpg", 0L), ("/c-big.jpg", 1200L)))
  }

  private def refresh(page: String): (Long, Long, String) = {
    val s = spark
    import s.implicits._
    Seq(page).toDF("html").select(Html.metaRefresh(col("html")).as("r"))
      .select("r.has_refresh", "r.delay", "r.url")
      .as[(Long, Long, String)].collect().head
  }

  "metaRefresh" should "parse clean and sloppy refresh spellings" in {
    refresh("<meta http-equiv=\"refresh\" content=\"0; url=/x\">") shouldBe
      ((1L, 0L, "/x"))
    refresh("<meta HTTP-EQUIV='Refresh' content=\"5, URL='/y'\">") shouldBe
      ((1L, 5L, "/y"))
    refresh("<meta http-equiv=refresh content=\"30\">") shouldBe
      ((1L, 30L, ""))
    refresh("<meta charset=utf-8><p>no refresh</p>") shouldBe
      ((0L, -1L, ""))
  }

  it should "accept single-quoted and bare attribute spellings" in {
    refresh("<meta http-equiv=refresh content='3; url=/sq'>") shouldBe
      ((1L, 3L, "/sq"))
    refresh("<meta http-equiv=refresh content=7>") shouldBe
      ((1L, 7L, ""))
    val s = spark
    import s.implicits._
    Seq("<img src=/bare.png><img srcset='/sq.jpg 640w'>").toDF("html")
      .select(Html.imgCandidates(col("html")))
      .as[Seq[Seq[(String, Long)]]].collect().head shouldBe
      Seq(Seq(("/bare.png", 0L)), Seq(("/sq.jpg", 640L)))
    Seq("<meta property='og:title' content='Sq Title'/>").toDF("html")
      .select(Html.openGraph(col("html")))
      .as[Map[String, String]].collect().head shouldBe
      Map("og:title" -> "Sq Title")
  }

  "hreflangAlternates" should "collect hreflang links and skip decoys" in {
    val s = spark
    import s.implicits._
    val page = "<link rel=\"stylesheet\" href=\"/s.css\">" +
      "<link rel=\"alternate\" hreflang=\"en\" href=\"/en\">" +
      "<link hreflang=\"de-AT\" rel=\"alternate\" href=\"/de\">" +
      "<link rel=\"alternate\" type=\"application/rss+xml\" href=\"/f\">" +
      "<link rel=\"alternate\" hreflang=\"x-default\" href=\"/\">"
    Seq(page).toDF("html")
      .select(Html.hreflangAlternates(col("html")))
      .as[Seq[(String, String)]].collect().head shouldBe
      Seq(("en", "/en"), ("de-at", "/de"), ("x-default", "/"))
  }
}
