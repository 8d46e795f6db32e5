package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{CRC32, Deflater, Inflater}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) — the container format web crawls actually arrive in
  * (Common Crawl, Internet Archive). A WARC file is a concatenation of
  * records, each `WARC/1.0` + CRLF-terminated named headers + empty line
  * + exactly `Content-Length` payload octets + CRLF CRLF; the `.warc.gz`
  * form gzips EVERY RECORD AS ITS OWN MEMBER, so a 100 TB crawl splits at
  * member boundaries into independently-decompressible tasks — that
  * per-member framing, not the codec, is what makes the format
  * cluster-splittable, and both halves (member walk, record walk) are
  * implemented here for real.
  *
  * Parsing discipline: record boundaries come ONLY from Content-Length
  * arithmetic — the walk never scans payload bytes for a `WARC/` marker,
  * so a payload that embeds one (a crawled page QUOTING a WARC record)
  * cannot desynchronize it. Malformed input fails loudly, like the MP4
  * box walk ([[graft.pipeline.Multimodal.mp4SampleRanges]]): a silent
  * resync would attribute bytes to the wrong document.
  *
  * Scale shape: one WARC payload is parsed per row inside
  * `mapPartitions` — embarrassingly parallel, no shuffle; downstream
  * operators see one row per record.
  */
object Warc {

  private val Crlf = "\r\n"

  /** One record, write side: named headers in insertion order + payload.
    * `Content-Length` is computed, not caller-supplied. */
  final case class RecordSpec(warcType: String, targetUri: Option[String],
                              payload: Array[Byte])

  /** A parsed record: byte offset of its `WARC/` line within the
    * (decompressed) stream, declared type, optional target URI, declared
    * payload length, and the payload octets. */
  final case class WarcRecord(offset: Long, warcType: String,
                              targetUri: String, contentLength: Long,
                              payload: Array[Byte])

  /** Serialize records with exact ISO 28500 framing (version line, CRLF
    * header discipline, `Content-Length` octet count, CRLF CRLF record
    * terminator). Returns the bytes plus each record's start offset —
    * ground truth for `WarcSpec` to check the parser against. */
  def buildWarc(records: Seq[RecordSpec]): (Array[Byte], Seq[Long]) = {
    val out = new ByteArrayOutputStream()
    val offsets = records.map { r =>
      val off = out.size().toLong
      val hdr = new StringBuilder("WARC/1.0").append(Crlf)
      hdr.append("WARC-Type: ").append(r.warcType).append(Crlf)
      hdr.append("WARC-Record-ID: <urn:graft:").append(off).append(">")
        .append(Crlf)
      r.targetUri.foreach(u =>
        hdr.append("WARC-Target-URI: ").append(u).append(Crlf))
      hdr.append("Content-Length: ").append(r.payload.length).append(Crlf)
      hdr.append(Crlf)
      out.write(hdr.toString.getBytes(StandardCharsets.ISO_8859_1))
      out.write(r.payload)
      out.write((Crlf + Crlf).getBytes(StandardCharsets.ISO_8859_1))
      off
    }
    (out.toByteArray, offsets)
  }

  /** Walk a plain (uncompressed) WARC stream into its records. Strict:
    * version line must read `WARC/1.x`, every header line must be CRLF
    * terminated with a `name: value` colon, `Content-Length` must be
    * present and consistent with the record terminator. */
  def warcRecords(bytes: Array[Byte]): Seq[WarcRecord] = {
    val n = bytes.length
    def fail(pos: Long, msg: String): Nothing =
      throw new IllegalArgumentException(s"malformed WARC at $pos: $msg")
    // next CRLF-terminated line from `pos`: (text-without-CRLF, nextPos)
    def line(pos: Int): (String, Int) = {
      var i = pos
      while (i + 1 < n && !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 >= n) fail(pos, "header line missing CRLF")
      (new String(bytes, pos, i - pos, StandardCharsets.ISO_8859_1), i + 2)
    }
    val recs = Seq.newBuilder[WarcRecord]
    var pos = 0
    while (pos < n) {
      val off = pos.toLong
      val (version, p1) = line(pos)
      if (!version.startsWith("WARC/1."))
        fail(off, s"expected WARC/1.x version line, got '$version'")
      var p = p1
      var warcType = ""
      var uri = ""
      var clen = -1L
      var done = false
      while (!done) {
        val (l, pn) = line(p)
        p = pn
        if (l.isEmpty) done = true
        else {
          val colon = l.indexOf(':')
          if (colon < 0) fail(off, s"header line without colon: '$l'")
          val name = l.substring(0, colon).trim.toLowerCase
          val value = l.substring(colon + 1).trim
          name match {
            case "warc-type" => warcType = value
            case "content-length" => clen = value.toLong
            case "warc-target-uri" => uri = value
            case _ => () // other named headers carried but unused
          }
        }
      }
      if (clen < 0) fail(off, "record has no Content-Length header")
      if (p + clen + 4 > n) fail(off,
        s"payload of $clen octets + terminator overruns stream end $n")
      val payload = java.util.Arrays.copyOfRange(bytes, p, p + clen.toInt)
      p += clen.toInt
      if (!(bytes(p) == '\r' && bytes(p + 1) == '\n' &&
            bytes(p + 2) == '\r' && bytes(p + 3) == '\n'))
        fail(off, "record not terminated by CRLF CRLF after Content-Length " +
          "octets — declared length inconsistent with framing")
      recs += WarcRecord(off, warcType, uri, clen, payload)
      pos = p + 4
    }
    recs.result()
  }

  /** Gzip one buffer as a single member with a fixed, deterministic
    * header (no mtime, no extra fields) — the write side of the
    * `.warc.gz` member-per-record convention. */
  def gzipMember(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0))
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(data); d.finish()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val crc = new CRC32(); crc.update(data)
    def le32(v: Long): Array[Byte] = Array((v & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 24) & 0xFF).toByte)
    out.write(le32(crc.getValue))
    out.write(le32(data.length.toLong & 0xFFFFFFFFL))
    out.toByteArray
  }

  /** Split a concatenated-gzip stream at MEMBER boundaries and inflate
    * each member separately, verifying CRC32 and ISIZE — the read-side
    * primitive that makes `.warc.gz` splittable (each member is a
    * self-contained decompression task; at cluster scale these offsets
    * are the task split points). Returns `(memberOffset, inflatedBytes)`
    * per member. Uses a raw `Inflater` because the JDK's GZIPInputStream
    * transparently concatenates members, erasing exactly the boundaries
    * this walk exists to find. */
  def gzipMembers(bytes: Array[Byte]): Seq[(Long, Array[Byte])] = {
    val n = bytes.length
    def fail(pos: Int, msg: String): Nothing =
      throw new IllegalArgumentException(s"malformed gzip at $pos: $msg")
    val members = Seq.newBuilder[(Long, Array[Byte])]
    var pos = 0
    while (pos < n) {
      if (pos + 10 > n || bytes(pos) != 0x1f || bytes(pos + 1) != 0x8b.toByte)
        fail(pos, "missing gzip magic")
      if (bytes(pos + 2) != 8) fail(pos, s"method ${bytes(pos + 2)} != deflate")
      if (bytes(pos + 3) != 0) fail(pos,
        s"FLG ${bytes(pos + 3)} unsupported (builder writes none)")
      val inf = new Inflater(true)
      inf.setInput(bytes, pos + 10, n - pos - 10)
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val k = inf.inflate(buf)
        if (k == 0 && inf.needsInput()) fail(pos, "truncated deflate stream")
        out.write(buf, 0, k)
      }
      val consumed = inf.getBytesRead.toInt
      inf.end()
      val data = out.toByteArray
      val tp = pos + 10 + consumed
      if (tp + 8 > n) fail(pos, "truncated gzip trailer")
      def le32(at: Int): Long = (bytes(at) & 0xFFL) |
        ((bytes(at + 1) & 0xFFL) << 8) | ((bytes(at + 2) & 0xFFL) << 16) |
        ((bytes(at + 3) & 0xFFL) << 24)
      val crc = new CRC32(); crc.update(data)
      if (le32(tp) != crc.getValue) fail(pos, "CRC32 mismatch")
      if (le32(tp + 4) != (data.length.toLong & 0xFFFFFFFFL))
        fail(pos, "ISIZE mismatch")
      members += ((pos.toLong, data))
      pos = tp + 8
    }
    members.result()
  }

  /** Probe a column of WARC payloads into one row per record:
    * `(id, rec, offset, rec_type, target_uri, content_length, payload)`.
    * `gzipped = true` expects member-per-record `.warc.gz` framing and
    * requires each member to hold exactly one record (the convention
    * that makes the format splittable; a multi-record member would mean
    * a writer that broke it — fail loudly). Per-row parse inside
    * `mapPartitions`: no shuffle, embarrassingly parallel. */
  def warcProbe(warcs: DataFrame, gzipped: Boolean): DataFrame = {
    val spark = warcs.sparkSession
    import spark.implicits._
    warcs.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          val recs: Seq[WarcRecord] =
            if (gzipped) gzipMembers(payload).map { case (moff, data) =>
              val rs = warcRecords(data)
              require(rs.length == 1,
                s"$id: gzip member at $moff holds ${rs.length} records, " +
                  "expected exactly 1 (member-per-record convention)")
              rs.head.copy(offset = moff)
            }
            else warcRecords(payload)
          recs.iterator.zipWithIndex.map { case (r, i) =>
            (id, i.toLong, r.offset, r.warcType, r.targetUri,
              r.contentLength, r.payload)
          }
        }
      }
      .toDF("id", "rec", "offset", "rec_type", "target_uri",
        "content_length", "payload")
  }

  /** Split an HTTP/1.1 response message (what a WARC `response` record's
    * payload actually is — RFC 9110 framing) into the crawl-relevant
    * parts: status code from the status line, media type from the
    * `Content-Type` header (parameters like `; charset=` stripped,
    * lowercased), and the body after the first blank line. Pure Column
    * work over the payload-as-string — the downstream gate that routes
    * 200/text-html to extraction and everything else to quarantine.
    * Non-HTTP payloads yield status 0, empty type, whole-payload body. */
  def httpResponseParts(payload: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val statusStr = regexp_extract(payload, "^HTTP/[0-9.]+ ([0-9]{3})", 1)
    val status = when(length(statusStr) > 0, statusStr.cast("long"))
      .otherwise(lit(0L))
    val headers = substring_index(payload, "\r\n\r\n", 1)
    val ctype = lower(trim(regexp_extract(headers,
      "(?im)^content-type:\\s*([^;\\r\\n]*)", 1)))
    val blank = call_function("instr", payload, lit("\r\n\r\n"))
    val body = when(status === 0L, payload)
      .when(blank > 0, call_function("substr", payload, blank + 4))
      .otherwise(lit(""))
    struct(status.as("status"), ctype.as("content_type"), body.as("body"))
  }
}
