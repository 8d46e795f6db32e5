package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MIME email parsing (RFC 5322 framing + RFC 2045/2046 multipart and
  * transfer encodings) — mail archives are a first-class corpus source
  * (mailing lists, newsgroups, enterprise dumps), and their text
  * arrives wrapped twice: a multipart container splits the message
  * into typed parts, and each part's bytes ride a 7-bit-safe transfer
  * coding (`quoted-printable` for mostly-ASCII text, `base64` for the
  * rest). Both decodes here are PURE COLUMN work:
  *
  *   - base64 via the engine's `unbase64` (whitespace-folded first —
  *     RFC 2045 §6.8 line-wraps the stream at 76 chars);
  *   - quoted-printable by BYTE-LEVEL reassembly: soft line breaks
  *     (`=\r\n`) removed, then the whole content is rebuilt as a hex
  *     string — each `=XX` escape contributes its raw byte, every
  *     literal run contributes its UTF-8 bytes — and ONE
  *     `unhex → decode` materializes the result. This is what makes
  *     multibyte sequences correct: `=E2=82=AC` must become the three
  *     BYTES of `€`, not three code points, so the decode has to pass
  *     through binary, and doing it via hex strings keeps it inside
  *     codegen'd Columns with no UDF and no JVM seam.
  *
  * Framing tolerances mirror [[Warc.httpResponseParts]]: the
  * header/body separator is the EARLIER of `\r\n\r\n` and `\n\n`, so
  * both CRLF-conforming and bare-LF mailbox dumps parse. Scope notes:
  * RFC 2047 encoded-word HEADERS and nested multiparts are not
  * decoded here (the fixture generation keeps headers ASCII; nesting
  * is a fold over the same split, left to the decode seam if a corpus
  * needs it).
  *
  * Scale shape: one narrow map per message → `posexplode` into one row
  * per part — zero shuffle, embarrassingly parallel, the WARC-record
  * discipline applied to mailboxes.
  */
object Mime {

  /** Quoted-printable ENCODE (write side, JVM — fixture builder):
    * bytes outside printable ASCII (and `=` itself) become `=XX`;
    * a soft line break is inserted every `softAt` output chars so the
    * decode's unfold path is always exercised. */
  def qpEncode(s: String, softAt: Int = 40): String = {
    val out = new StringBuilder
    var col = 0
    s.getBytes("UTF-8").foreach { b =>
      val u = b & 0xFF
      val tok =
        if (u == '='.toInt || u < 32 || u > 126) f"=$u%02X"
        else u.toChar.toString
      if (col + tok.length > softAt) { out.append("=\r\n"); col = 0 }
      out.append(tok); col += tok.length
    }
    out.toString
  }

  /** Build one RFC 5322 message with a `multipart/alternative` body:
    * a quoted-printable `text/plain` part and a base64 `text/html`
    * part under `boundary`. ASCII headers (encoded-word scope note in
    * the object doc). */
  def buildEml(from: String, subject: String, boundary: String,
               plain: String, html: String): String = {
    val b64 = java.util.Base64.getMimeEncoder(60,
      "\r\n".getBytes("US-ASCII"))
      .encodeToString(html.getBytes("UTF-8"))
    s"From: $from\r\n" +
      s"Subject: $subject\r\n" +
      "MIME-Version: 1.0\r\n" +
      s"""Content-Type: multipart/alternative; boundary="$boundary"\r\n""" +
      "\r\n" +
      "preamble to be ignored\r\n" +
      s"--$boundary\r\n" +
      "Content-Type: text/plain; charset=utf-8\r\n" +
      "Content-Transfer-Encoding: quoted-printable\r\n" +
      "\r\n" +
      qpEncode(plain) + "\r\n" +
      s"--$boundary\r\n" +
      "Content-Type: text/html; charset=utf-8\r\n" +
      "Content-Transfer-Encoding: base64\r\n" +
      "\r\n" +
      b64 + "\r\n" +
      s"--$boundary--\r\n"
  }

  /** Quoted-printable decode (RFC 2045 §6.7) as a pure Column — byte
    * level via hex reassembly (see object doc). Malformed escapes (bad
    * hex, truncated `=`) pass through literally, the tolerant behavior
    * every real mail reader implements. */
  def qpDecode(c: Column): Column = {
    val unfolded = regexp_replace(c, "=\\r?\\n", "") // soft line breaks
    val parts = split(unfolded, "=", -1)
    val restHex = transform(
      slice(parts, lit(2), greatest(size(parts) - 1, lit(0))), seg => {
        val h2 = upper(substring(seg, 1, 2))
        when(h2.rlike("^[0-9A-F]{2}$"),
          concat(h2, hex(encode(call_function("substr", seg, lit(3)), "UTF-8"))))
          .otherwise(hex(encode(concat(lit("="), seg), "UTF-8")))
      })
    decode(unhex(concat(hex(encode(element_at(parts, 1), "UTF-8")),
      array_join(restHex, ""))), "UTF-8")
  }

  private def headerOf(headers: Column, name: String): Column =
    trim(regexp_extract(headers, "(?im)^" + name + ":\\s*([^\\r\\n]*)", 1))

  /** Parse a column of MIME messages into one row per body part:
    * `(<carried cols>, part, part_type, cte, text, from_addr,
    * subject)` — `text` already transfer-DECODED (base64 /
    * quoted-printable / identity), `part_type` the part's media type
    * with parameters stripped. Non-multipart messages yield one part
    * (index 0) holding the whole body. */
  def mimeParts(df: DataFrame, payloadCol: String = "payload")
      : DataFrame = {
    val msg = col(payloadCol)
    val blankCrlf = call_function("instr", msg, lit("\r\n\r\n"))
    val blankLf = call_function("instr", msg, lit("\n\n"))
    val useCrlf = blankCrlf > 0 && (blankLf === 0 || blankCrlf <= blankLf)
    val blank = when(useCrlf, blankCrlf).otherwise(blankLf)
    val skip = when(useCrlf, lit(4)).otherwise(lit(2))
    val headers = when(blank > 0,
      call_function("substr", msg, lit(1), blank - 1)).otherwise(msg)
    val body = when(blank > 0, call_function("substr", msg, blank + skip))
      .otherwise(lit(""))
    val ctypeHdr = headerOf(headers, "content-type")
    val boundary = regexp_extract(ctypeHdr,
      "(?i)boundary=\"?([^\";\\r\\n]+)", 1)
    // \Q..\E-quote the per-message boundary so its literal spelling is
    // the delimiter (RFC 2046 boundaries may contain regex metachars)
    val rawParts = call_function("split", body,
      concat(lit("\\Q--"), boundary, lit("\\E")))
    // element 1 = preamble (ignored per RFC 2046 §5.1.1), last element
    // = the "--" of the closing delimiter; parts live between
    val partArr = when(length(boundary) > 0,
      slice(rawParts, lit(2), greatest(size(rawParts) - 2, lit(0))))
      .otherwise(array(body))
    val withPart = df.select(col("*"),
      posexplode(partArr).as(Seq("part", "p_raw")))
    val p = regexp_replace(col("p_raw"), "^\\r?\\n", "")
    val pBlankCrlf = call_function("instr", p, lit("\r\n\r\n"))
    val pBlankLf = call_function("instr", p, lit("\n\n"))
    val pUseCrlf = pBlankCrlf > 0 &&
      (pBlankLf === 0 || pBlankCrlf <= pBlankLf)
    val pBlank = when(pUseCrlf, pBlankCrlf).otherwise(pBlankLf)
    val pSkip = when(pUseCrlf, lit(4)).otherwise(lit(2))
    val pHeaders = when(pBlank > 0,
      call_function("substr", p, lit(1), pBlank - 1)).otherwise(lit(""))
    val pBody0 = when(pBlank > 0,
      call_function("substr", p, pBlank + pSkip)).otherwise(p)
    val pBody = regexp_replace(pBody0, "\\r?\\n$", "")
    val pType = lower(trim(regexp_extract(
      headerOf(pHeaders, "content-type"), "^([^;]*)", 1)))
    val cte = lower(headerOf(pHeaders, "content-transfer-encoding"))
    val text = when(cte === "base64",
      decode(unbase64(regexp_replace(pBody, "\\s", "")), "UTF-8"))
      .when(cte === "quoted-printable", qpDecode(pBody))
      .otherwise(pBody)
    withPart.select(
      withPart.columns.filter(c => c != "p_raw" && c != payloadCol)
        .map(col).toIndexedSeq :+
        pType.as("part_type") :+ cte.as("cte") :+ text.as("text") :+
        headerOf(headers, "from").as("from_addr") :+
        headerOf(headers, "subject").as("subject"): _*)
  }
}
