package graft.sources

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.tsne.SparkTestBase

/** WARC framing: build→parse roundtrip against builder ground truth,
  * Content-Length discipline (no resync on embedded markers), loud
  * failures on malformed input, and the gzip member walk that makes
  * `.warc.gz` splittable. */
class WarcSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private def recs = Seq(
    Warc.RecordSpec("warcinfo", None, "software: graft\r\n".getBytes(UTF_8)),
    Warc.RecordSpec("request", Some("http://example.com/a"),
      "GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n".getBytes(UTF_8)),
    Warc.RecordSpec("response", Some("http://example.com/a"),
      "hello warc payload".getBytes(UTF_8)))

  "warcRecords" should "roundtrip the builder's records and offsets" in {
    val (bytes, offsets) = Warc.buildWarc(recs)
    val got = Warc.warcRecords(bytes)
    got.map(_.offset) shouldBe offsets
    got.map(_.warcType) shouldBe Seq("warcinfo", "request", "response")
    got.map(_.targetUri) shouldBe
      Seq("", "http://example.com/a", "http://example.com/a")
    got.map(_.contentLength) shouldBe recs.map(_.payload.length.toLong)
    got.map(r => new String(r.payload, UTF_8)) shouldBe
      recs.map(r => new String(r.payload, UTF_8))
  }

  it should "not resync on a payload that EMBEDS a WARC version line" in {
    val evil = "prefix\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\nsuffix"
    val (bytes, _) = Warc.buildWarc(Seq(
      Warc.RecordSpec("response", None, evil.getBytes(UTF_8)),
      Warc.RecordSpec("metadata", None, "after".getBytes(UTF_8))))
    val got = Warc.warcRecords(bytes)
    got.map(_.warcType) shouldBe Seq("response", "metadata")
    new String(got.head.payload, UTF_8) shouldBe evil
  }

  it should "fail loudly on missing Content-Length, truncation, bad terminator" in {
    val (bytes, _) = Warc.buildWarc(recs)
    // strip the Content-Length line of the first record
    val text = new String(bytes, ISO_8859_1)
    val noLen = text.replaceFirst("Content-Length: \\d+\r\n", "")
    (the[IllegalArgumentException] thrownBy
      Warc.warcRecords(noLen.getBytes(ISO_8859_1)))
      .getMessage should include("Content-Length")
    (the[IllegalArgumentException] thrownBy
      Warc.warcRecords(java.util.Arrays.copyOf(bytes, bytes.length - 3)))
      .getMessage should include("malformed WARC")
    val badTerm = bytes.clone()
    badTerm(bytes.length - 1) = 'X' // corrupt the final CRLF CRLF
    (the[IllegalArgumentException] thrownBy Warc.warcRecords(badTerm))
      .getMessage should include("terminated")
  }

  "gzipMembers" should "split at member boundaries and verify CRC/ISIZE" in {
    val datas = Seq("alpha", "beta-longer", "").map(_.getBytes(UTF_8))
    val members = datas.map(Warc.gzipMember)
    val stream = members.flatten.toArray
    val got = Warc.gzipMembers(stream)
    got.map(_._1) shouldBe
      members.scanLeft(0L)((acc, m) => acc + m.length).init
    got.map(m => new String(m._2, UTF_8)) shouldBe
      datas.map(new String(_, UTF_8))
    val corrupt = stream.clone()
    corrupt(members.head.length - 5) = // inside member 0's CRC32 trailer
      (corrupt(members.head.length - 5) ^ 0x01).toByte
    (the[IllegalArgumentException] thrownBy Warc.gzipMembers(corrupt))
      .getMessage should include("CRC32")
  }

  "warcProbe" should "emit one row per record in both framings" in {
    val s = spark
    import s.implicits._
    val (plain, _) = Warc.buildWarc(recs)
    val gz = recs.map(r => Warc.gzipMember(Warc.buildWarc(Seq(r))._1))
      .flatten.toArray
    val plainGot = Warc.warcProbe(
        Seq((1L, plain)).toDF("id", "payload"), gzipped = false)
      .orderBy("rec")
      .select("rec_type", "content_length").as[(String, Long)].collect()
    plainGot shouldBe recs.map(r => (r.warcType, r.payload.length.toLong))
    val gzGot = Warc.warcProbe(
        Seq((1L, gz)).toDF("id", "payload"), gzipped = true)
      .orderBy("rec")
      .select("rec_type", "content_length").as[(String, Long)].collect()
    gzGot shouldBe plainGot
  }

  it should "reject a gzip member holding more than one record" in {
    val s = spark
    import s.implicits._
    val twoInOne = Warc.gzipMember(Warc.buildWarc(recs)._1)
    val ex = the[org.apache.spark.SparkException] thrownBy
      Warc.warcProbe(Seq((7L, twoInOne)).toDF("id", "payload"),
        gzipped = true).collect()
    ex.getMessage should include("expected exactly 1")
  }

  "httpResponseParts" should "split status, media type, and body" in {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val ok = "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n" +
      "Server: x\r\n\r\n<html>body</html>"
    val notFound = "HTTP/1.0 404 Not Found\r\ncontent-type: application/json\r\n\r\n{}"
    val raw = "just plain text, no protocol"
    val headerOnly = "HTTP/1.1 204 No Content\r\nServer: x\r\n\r\n"
    val got = Seq(ok, notFound, raw, headerOnly).toDF("p")
      .select(Warc.httpResponseParts(col("p")).as("h"))
      .select("h.status", "h.content_type", "h.body")
      .as[(Long, String, String)].collect().toSeq
    got shouldBe Seq(
      (200L, "text/html", "<html>body</html>"),
      (404L, "application/json", "{}"),
      (0L, "", raw),
      (204L, "", ""))
  }

  it should "honor bare-LF framing (lenient servers) without stealing CRLF bodies" in {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val lfOnly = "HTTP/1.1 200 OK\nContent-Type: text/plain\n\nlf body"
    // CRLF framing whose BODY contains \n\n — the earlier separator
    // (the real CRLF header end) must win
    val crlfWithLf =
      "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\npara1\n\npara2"
    val got = Seq(lfOnly, crlfWithLf).toDF("p")
      .select(Warc.httpResponseParts(col("p")).as("h"))
      .select("h.status", "h.content_type", "h.body")
      .as[(Long, String, String)].collect().toSeq
    got shouldBe Seq(
      (200L, "text/plain", "lf body"),
      (200L, "text/plain", "para1\n\npara2"))
  }

  it should "decode chunked transfer coding, with extensions and uneven sizes" in {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // hand-framed: sizes in hex (one with a ;ext the decoder must drop),
    // data containing \r\n, then the 0 last-chunk
    val msg = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n" +
      "Content-Type: text/plain\r\n\r\n" +
      "4\r\nWiki\r\n6;name=x\r\npedia \r\nb\r\nin\r\nchunks.\r\n0\r\n\r\n"
    val got = Seq(msg).toDF("p")
      .select(Warc.httpResponseParts(col("p")).as("h"))
      .select("h.status", "h.body").as[(Long, String)].collect().head
    got shouldBe ((200L, "Wikipedia in\r\nchunks."))
  }

  it should "roundtrip chunkEncode → dechunk, including the empty body" in {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val bodies = Seq("", "x", "hello chunked world " * 20)
    val got = bodies.toDF("b")
      .select(col("b"), Warc.dechunk(Warc.chunkEncode(col("b"))).as("d"))
      .as[(String, String)].collect().toSeq
    got.foreach { case (b, d) => d shouldBe b }
  }

  "revisitClassify" should "keep the first capture per payload digest, mark the rest revisits" in {
    val s = spark
    import s.implicits._
    val recs = Seq(
      (1L, "page A".getBytes("UTF-8")),
      (2L, "page B".getBytes("UTF-8")),
      (3L, "page A".getBytes("UTF-8")), // identical to 1 → revisit
      (4L, "page A".getBytes("UTF-8")), // identical to 1 → revisit
      (5L, "page C".getBytes("UTF-8"))).toDF("id", "payload")
    val got = Warc.revisitClassify(recs).orderBy("id")
      .as[(Long, String)].collect().toSeq
    got shouldBe Seq((1L, "response"), (2L, "response"),
      (3L, "revisit"), (4L, "revisit"), (5L, "response"))
  }

  it should "stop decoding at a malformed chunk-size line, keeping what accumulated" in {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val msg = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "3\r\nabc\r\nzz!\r\nrest"
    val got = Seq(msg).toDF("p")
      .select(Warc.httpResponseParts(col("p")).as("h"))
      .select("h.body").as[String].collect().head
    got shouldBe "abc"
  }

  private def header(payload: String, name: String): String = {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    Seq(payload).toDF("p")
      .select(Warc.httpHeader(col("p"), name)).as[String].collect().head
  }

  "httpHeader" should "read a header case-insensitively with OWS trimmed" in {
    val msg = "HTTP/1.1 301 Moved\r\nlocation:   /new/place  \r\n" +
      "Content-Type: text/html\r\n\r\nbody"
    header(msg, "Location") shouldBe "/new/place"
    header(msg, "content-type") shouldBe "text/html"
  }

  it should "never match a header-shaped line in the body" in {
    val msg = "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" +
      "Location: http://decoy.invalid/x\r\nmore body"
    header(msg, "Location") shouldBe ""
  }

  it should "handle LF-only framing and absent headers" in {
    header("HTTP/1.1 302 Found\nLocation: /lf\n\nbody", "Location") shouldBe
      "/lf"
    header("HTTP/1.1 200 OK\r\n\r\nbody", "Location") shouldBe ""
  }

  it should "reject a non-token field name" in {
    an[IllegalArgumentException] should be thrownBy header("x", "bad name")
  }

  private def chunk(body: String, n: Int): String = {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    Seq(body).toDF("b").select(Warc.chunkEncode(col("b"), n))
      .as[String].collect().head
  }

  "decode_complete" should "flag chunk chains past the Column bound, never truncate silently" in {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val body = "the quick brown fox jumps over the lazy dog " * 10
    def msg(framed: String) =
      "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n" +
        "Content-Type: text/plain\r\n\r\n" + framed
    val within = msg(chunk(body, Warc.MaxDecodedChunks))
    val past = msg(chunk(body, 40))
    val malformed = msg("3\r\nabc\r\nzz!\r\nrest")
    val plain = "HTTP/1.1 200 OK\r\n\r\n" + body
    val nonHttp = "no protocol here"
    val got = Seq(within, past, malformed, plain, nonHttp).toDF("p")
      .select(Warc.httpResponseParts(col("p")).as("h"))
      .select("h.body", "h.decode_complete")
      .as[(String, Boolean)].collect().toSeq
    got(0) shouldBe ((body, true))
    // past the bound: the decoded prefix is kept as evidence, but the
    // flag says INCOMPLETE — the caller must route, not trust
    got(1)._2 shouldBe false
    body.startsWith(got(1)._1) shouldBe true
    got(1)._1.length should be < body.length
    got(2) shouldBe (("abc", false))
    got(3) shouldBe ((body, true))
    got(4) shouldBe ((nonHttp, true))
  }

  it should "flag a Content-Encoding the Column path cannot inflate" in {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val gz = "HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n" +
      "Content-Type: text/html\r\n\r\n(compressed bytes)"
    val idn = "HTTP/1.1 200 OK\r\nContent-Encoding: identity\r\n\r\nplain"
    val got = Seq(gz, idn).toDF("p")
      .select(Warc.httpResponseParts(col("p")).as("h"))
      .select("h.decode_complete").as[Boolean].collect().toSeq
    got shouldBe Seq(false, true)
  }

  "dechunkJvm" should "decode unbounded chains byte-exactly and report completeness" in {
    val body = "0123456789" * 61 // 610 bytes → 40 chunks of ≤16
    val framed = chunk(body, 40).getBytes("ISO-8859-1")
    val (full, ok) = Warc.dechunkJvm(framed)
    new String(full, "ISO-8859-1") shouldBe body
    ok shouldBe true
    // truncated mid-chunk and malformed size line both keep the prefix
    val (pre, ok2) = Warc.dechunkJvm("5\r\nhello\r\nZZ!\r\n".getBytes)
    (new String(pre), ok2) shouldBe (("hello", false))
    val (pre3, ok3) = Warc.dechunkJvm("5\r\nhel".getBytes)
    (new String(pre3), ok3) shouldBe (("", false))
  }

  "parseHttpJvm/httpDecode" should "inflate gzip and deflate entities (RFC 9110 §8.4)" in {
    val text = "<html>real page body, long enough to compress well " * 5 +
      "</html>"
    val plain = text.getBytes("UTF-8")
    def msg(hdr: String, body: Array[Byte]): Array[Byte] = {
      val h = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" + hdr +
        "\r\n").getBytes("ISO-8859-1")
      h ++ body
    }
    val gzBody = Warc.gzipMember(plain)
    val defl = {
      val d = new java.util.zip.Deflater()
      d.setInput(plain); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    val (s1, ct1, b1, ok1) =
      Warc.parseHttpJvm(msg("Content-Encoding: gzip\r\n", gzBody))
    (s1, ct1, ok1) shouldBe ((200L, "text/html", true))
    b1 shouldBe plain
    val (_, _, b2, ok2) =
      Warc.parseHttpJvm(msg("Content-Encoding: deflate\r\n", defl))
    (new String(b2, "UTF-8"), ok2) shouldBe ((text, true))
    // unknown coding routes (keeps bytes, flags incomplete)
    val (_, _, b3, ok3) =
      Warc.parseHttpJvm(msg("Content-Encoding: br\r\n", gzBody))
    (b3.sameElements(gzBody), ok3) shouldBe ((true, false))
    // a corrupt gzip stream must not pass as complete
    val corrupt = gzBody.clone(); corrupt(corrupt.length / 2) =
      (corrupt(corrupt.length / 2) ^ 0x55).toByte
    val (_, _, _, ok4) =
      Warc.parseHttpJvm(msg("Content-Encoding: gzip\r\n", corrupt))
    ok4 shouldBe false
  }

  it should "stack chunked + gzip in RFC order (Transfer-Encoding undone first)" in {
    val s = spark
    import s.implicits._
    val text = "stacked codings page " * 30
    val gzBody = Warc.gzipMember(text.getBytes("UTF-8"))
    // chunk the BINARY gzip entity: frame bytes by hand (24 chunks)
    val out = new java.io.ByteArrayOutputStream()
    val csz = math.max(1, gzBody.length / 24 + 1)
    gzBody.grouped(csz).foreach { piece =>
      out.write(s"${piece.length.toHexString}\r\n".getBytes("ISO-8859-1"))
      out.write(piece)
      out.write("\r\n".getBytes("ISO-8859-1"))
    }
    out.write("0\r\n\r\n".getBytes("ISO-8859-1"))
    val payload = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n" +
      "Content-Encoding: gzip\r\nContent-Type: text/html\r\n\r\n")
      .getBytes("ISO-8859-1") ++ out.toByteArray
    val (st, ct, body, ok) = Warc.parseHttpJvm(payload)
    (st, ct, ok) shouldBe ((200L, "text/html", true))
    new String(body, "UTF-8") shouldBe text
    // and through the DataFrame seam, schema passing through
    val got = Warc.httpDecode(Seq((9L, payload)).toDF("id", "payload"))
      .select("id", "http_status", "http_content_type", "decode_complete")
      .as[(Long, Long, String, Boolean)].collect().head
    got shouldBe ((9L, 200L, "text/html", true))
  }

  private def policy(headers: String): (Long, Long, Long, String) = {
    val s = spark
    import s.implicits._
    Seq(headers).toDF("h")
      .select(Warc.cachePolicy(org.apache.spark.sql.functions.col("h"))
        .as("p"))
      .select("p.cacheable", "p.ttl", "p.revalidate", "p.validator")
      .as[(Long, Long, Long, String)].collect().head
  }

  "cachePolicy" should "honor no-store and private for a shared cache" in {
    policy("HTTP/1.1 200 OK\r\nCache-Control: no-store\r\n") shouldBe
      ((0L, -1L, 0L, "none"))
    policy("HTTP/1.1 200 OK\r\nCache-Control: private, max-age=60\r\n")
      ._1 shouldBe 0L
  }

  it should "prefer s-maxage over max-age and flag max-age=0" in {
    policy("X: y\r\nCache-Control: public, max-age=600, s-maxage=30\r\n")
      ._2 shouldBe 30L
    policy("X: y\r\nCache-Control: max-age=0\r\n")._3 shouldBe 1L
  }

  it should "revalidate on no-cache/must-revalidate and pick validators" in {
    policy("Cache-Control: no-cache\r\nETag: \"x\"\r\n") shouldBe
      ((1L, -1L, 1L, "etag"))
    policy("Cache-Control: max-age=5\r\n" +
      "Last-Modified: Tue, 01 Jul 2025 00:00:00 GMT\r\n") shouldBe
      ((1L, 5L, 0L, "last-modified"))
    // directive substring traps: "no-cachex" / "private-beta" must not fire
    policy("Cache-Control: no-cachex, max-age=9\r\n")._3 shouldBe 0L
    policy("Cache-Control: private-beta, max-age=9\r\n")._1 shouldBe 1L
  }
}
