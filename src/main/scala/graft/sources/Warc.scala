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

  /** Classify captures into originals vs revisits by payload digest —
    * the WARC `revisit` mechanism (ISO 28500 §6.7.2; Common Crawl and
    * the Internet Archive write a slim revisit record instead of
    * re-storing an unchanged payload, routinely saving ~20% of a crawl):
    * the FIRST capture of each distinct payload (smallest id) is the
    * `response`, every later identical capture is a `revisit`. Digest =
    * `md5(payload)` (as the grouping key only — never emitted, so the
    * hash choice is free); winner = one map-side-combinable `min` per
    * digest, then one hash-co-partitioned join back — the
    * [[graft.pipeline.Dedup]] keeper discipline, no window, no sort.
    * Emits the input's id column + `kind` (`response`/`revisit`). */
  def revisitClassify(records: DataFrame, idCol: String = "id",
                      payloadCol: String = "payload"): DataFrame = {
    import org.apache.spark.sql.functions._
    val digested = records.select(col(idCol),
      md5(col(payloadCol).cast("binary")).as("digest"))
    val first = digested.groupBy("digest").agg(min(idCol).as("first_id"))
    digested.join(first, "digest")
      .select(col(idCol),
        when(col(idCol) === col("first_id"), lit("response"))
          .otherwise(lit("revisit")).as("kind"))
  }

  /** Serialize a body Column with `Transfer-Encoding: chunked` framing
    * (RFC 9112 §7.1): hex chunk-size line CRLF, data, CRLF, repeated,
    * then the `0` last-chunk + final CRLF. `nChunks` fixed-size slices
    * regardless of body length — the write-side fixture counterpart of
    * the de-chunking in [[httpResponseParts]], kept N-independent so the
    * decode fold's iteration bound holds at any document size. Pure
    * Column work (`sequence` + `transform`). */
  def chunkEncode(body: org.apache.spark.sql.Column,
                  nChunks: Int = 5): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(nChunks >= 1, s"need at least one chunk, got $nChunks")
    val n = length(body)
    // ceil division; empty body degenerates to just the last-chunk line
    val csz = greatest(ceil(n / lit(nChunks.toDouble)).cast("int"), lit(1))
    val chunks = when(n === 0, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), ceil(n / csz.cast("double")).cast("int") - 1),
        i => {
          val piece = call_function("substr", body, i * csz + 1, csz)
          concat(lower(conv(length(piece).cast("string"), 10, 16)),
            lit(Crlf), piece, lit(Crlf))
        }))
    concat(array_join(chunks, ""), lit("0"), lit(Crlf), lit(Crlf))
  }

  /** Maximum chunks the COLUMN-side [[dechunkParts]] will decode — a
    * per-row fold bound, not a data bound. Real servers chunk at
    * 4–16 KB, so an ordinary 200 KB page arrives as 30–60 chunks:
    * messages that exceed this bound are NOT silently truncated — the
    * fold reports `complete = false` and the caller routes the row
    * through the JVM decode ([[httpDecode]]/[[dechunkJvm]]), the same
    * detect-and-route discipline as the charset ladder's `via`. */
  val MaxDecodedChunks = 16

  /** Decode a chunked transfer coding (RFC 9112 §7.1): sequentially read
    * the hex size line (chunk extensions after `;` ignored, per spec),
    * take that many chars, expect CRLF, repeat until the `0` last-chunk.
    * Offset-chasing is inherently sequential, so it rides a bounded
    * `aggregate` fold over [[MaxDecodedChunks]] steps — still pure
    * codegen'd Column work, one loop per row, no UDF.
    *
    * Returns `struct(body, complete)`. `complete` is true ONLY when the
    * `0` last-chunk was reached with valid framing inside the bound;
    * a malformed size line or a chunk count past the bound keeps the
    * accumulated prefix as evidence and reports `complete = false` —
    * the quarantine/route signal, never a silent truncation. */
  def dechunkParts(body: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val init = struct(body.as("rem"), lit("").as("out"),
      lit(false).as("done"), lit(false).as("ok"))
    aggregate(
      sequence(lit(1), lit(MaxDecodedChunks)), init, (acc, _) => {
        val rem = acc.getField("rem")
        val out = acc.getField("out")
        // the size line is bound once per ACTIVE step (inside the
        // otherwise-branch, so finished rows still skip all work): the
        // raw spelling referenced it 3× per step — 3 remainder scans —
        // and lambda-bearing trees are exempt from subexpression
        // elimination
        when(acc.getField("done"), acc).otherwise(
          graft.pipeline.TextOps.bindOnce(
              substring_index(rem, Crlf, 1)) { sizeLine =>
            val szStr = trim(substring_index(sizeLine, ";", 1))
            // ≤7 hex digits keeps the size safely inside an int (a single
            // chunk >256 MB in one row is out of scope at any scale)
            val valid = szStr.rlike("^[0-9a-fA-F]{1,7}$") &&
              call_function("instr", rem, lit(Crlf)) > 0
            val sz = conv(szStr, 16, 10).cast("int")
            val data = call_function("substr", rem,
              length(sizeLine) + 3, sz)
            val nextRem = call_function("substr", rem,
              length(sizeLine) + 2 + sz + 2 + 1)
            when(!valid,
              struct(rem.as("rem"), out.as("out"), lit(true).as("done"),
                lit(false).as("ok")))
              .when(sz === 0,
                struct(rem.as("rem"), out.as("out"), lit(true).as("done"),
                  lit(true).as("ok")))
              .otherwise(struct(nextRem.as("rem"),
                concat(out, data).as("out"), lit(false).as("done"),
                lit(false).as("ok")))
          })
      }, acc => {
        // exactly MaxDecodedChunks data chunks leaves the terminator
        // unconsumed by the loop — a remainder that IS the last-chunk
        // line still means the whole entity was decoded
        val atTerminator =
          acc.getField("rem").rlike("^0+(?:;[^\\r\\n]*)?\\r\\n")
        struct(acc.getField("out").as("body"),
          (acc.getField("ok") ||
            (!acc.getField("done") && atTerminator)).as("complete"))
      })
  }

  /** [[dechunkParts]]'s body alone — for call sites that gate on the
    * `complete` flag elsewhere (or knowingly accept the bound). */
  def dechunk(body: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    dechunkParts(body).getField("body")

  /** Write-side fixture counterpart of [[dechunkJvm]]: frame `data` as
    * `nChunks` chunks of RFC 9112 §7.1 chunked coding, BYTE-level (chunk
    * data may be binary — a gzip entity under chunked coding).
    * `terminate = false` omits the `0` last-chunk — the fixture for a
    * connection that died mid-transfer. */
  def chunkEncodeJvm(data: Array[Byte], nChunks: Int,
                     terminate: Boolean = true): Array[Byte] = {
    require(nChunks >= 1, s"need at least one chunk, got $nChunks")
    val out = new ByteArrayOutputStream()
    val csz = math.max(1, (data.length + nChunks - 1) / nChunks)
    data.grouped(csz).foreach { piece =>
      out.write(s"${piece.length.toHexString}\r\n"
        .getBytes(StandardCharsets.ISO_8859_1))
      out.write(piece)
      out.write(Crlf.getBytes(StandardCharsets.ISO_8859_1))
    }
    if (terminate)
      out.write("0\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1))
    out.toByteArray
  }

  /** JVM reference decode of a chunked transfer coding — UNBOUNDED (the
    * route target for messages past [[MaxDecodedChunks]]): returns
    * `(decodedBody, complete)` with the same quarantine semantics as
    * [[dechunkParts]] (malformed framing keeps the accumulated prefix,
    * `complete = false`). Operates on bytes because chunk DATA is
    * arbitrary binary (a gzipped entity under chunked transfer coding
    * must survive un-re-encoded). */
  def dechunkJvm(body: Array[Byte]): (Array[Byte], Boolean) = {
    val out = new ByteArrayOutputStream()
    val n = body.length
    var pos = 0
    while (pos < n) {
      // hex size line up to CRLF, extensions after ';' ignored
      var eol = pos
      while (eol + 1 < n && !(body(eol) == '\r' && body(eol + 1) == '\n'))
        eol += 1
      if (eol + 1 >= n) return (out.toByteArray, false)
      val line = new String(body, pos, eol - pos, StandardCharsets.ISO_8859_1)
      val szStr = line.split(";", 2)(0).trim
      if (!szStr.matches("[0-9a-fA-F]{1,7}"))
        return (out.toByteArray, false)
      val sz = Integer.parseInt(szStr, 16)
      if (sz == 0) return (out.toByteArray, true) // last-chunk
      val dataAt = eol + 2
      if (dataAt + sz + 2 > n) return (out.toByteArray, false)
      out.write(body, dataAt, sz)
      if (!(body(dataAt + sz) == '\r' && body(dataAt + sz + 1) == '\n'))
        return (out.toByteArray, false)
      pos = dataAt + sz + 2
    }
    (out.toByteArray, false) // ran out of input before the last-chunk
  }

  /** Split an HTTP/1.1 response message (what a WARC `response` record's
    * payload actually is — RFC 9110 framing) into the crawl-relevant
    * parts: status code from the status line, media type from the
    * `Content-Type` header (parameters like `; charset=` stripped,
    * lowercased), and the body after the first blank line. Pure Column
    * work over the payload-as-string — the downstream gate that routes
    * 200/text-html to extraction and everything else to quarantine.
    * Non-HTTP payloads yield status 0, empty type, whole-payload body.
    *
    * Framing tolerances real WARC payloads need (Heritrix stores bytes
    * as received): a lenient server that framed the whole message with
    * bare LF is honored by taking the EARLIER of `\r\n\r\n` and `\n\n`
    * as the header/body separator (in a CRLF message the first `\n\n`
    * can only occur inside the body, so CRLF still wins there); and a
    * `Transfer-Encoding: chunked` response is de-chunked
    * ([[dechunkParts]]), since the stored payload keeps the chunk
    * framing as received.
    *
    * The struct's 4th field, `decode_complete`, is the routing flag: it
    * is false when `body` does NOT hold the full decoded entity — a
    * chunk chain past [[MaxDecodedChunks]], malformed chunk framing, or
    * a `Content-Encoding` the Column path cannot inflate (gzip/deflate
    * are binary codecs — RFC 9110 §8.4 — and belong to the JVM seam,
    * [[httpDecode]]). Callers MUST either gate on it or hand incomplete
    * rows to the seam; treating a false row's body as the document is
    * exactly the silent-truncation bug this flag exists to kill. */
  def httpResponseParts(payload0: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    import graft.pipeline.TextOps.bindOnce
    // Layered once-bindings (values identical to the raw spelling): the
    // payload (often a synthesized expression at call sites) is referenced
    // ~8× below, `blank` 3×, `headers` 3×, the raw body 2×, and the
    // dechunk fold's result struct 2× — as raw subtrees each reference
    // re-ran everything beneath it per row (lambda-bearing trees are
    // exempt from subexpression elimination), so the dechunk fold itself
    // executed twice per chunked row.
    bindOnce(payload0) { payload =>
      bindOnce(struct(
          regexp_extract(payload, "^HTTP/[0-9.]+ ([0-9]{3})", 1)
            .as("statusStr"),
          call_function("instr", payload, lit("\r\n\r\n")).as("blankCrlf"),
          call_function("instr", payload, lit("\n\n")).as("blankLf"))) { p =>
        val statusStr = p.getField("statusStr")
        val blankCrlf = p.getField("blankCrlf")
        val blankLf = p.getField("blankLf")
        val useCrlf = blankCrlf > 0 && (blankLf === 0 || blankCrlf <= blankLf)
        bindOnce(struct(
            when(length(statusStr) > 0, statusStr.cast("long"))
              .otherwise(lit(0L)).as("status"),
            when(useCrlf, blankCrlf).otherwise(blankLf).as("blank"),
            when(useCrlf, lit(4)).otherwise(lit(2)).as("skip"))) { q =>
          val status = q.getField("status")
          val blank = q.getField("blank")
          val skip = q.getField("skip")
          bindOnce(when(blank > 0,
              call_function("substr", payload, lit(1), blank - 1))
              .otherwise(payload)) { headers =>
            val ctype = lower(trim(regexp_extract(headers,
              "(?im)^content-type:\\s*([^;\\r\\n]*)", 1)))
            val chunked =
              headers.rlike("(?im)^transfer-encoding:\\s*chunked\\s*$")
            // identity/absent passes; gzip/deflate/br need the binary seam
            val cenc = lower(trim(regexp_extract(headers,
              "(?im)^content-encoding:\\s*([^\\r\\n]*)", 1)))
            val encOk = cenc.isin("", "identity")
            bindOnce(when(status === 0L, payload)
                .when(blank > 0,
                  call_function("substr", payload, blank + skip))
                .otherwise(lit(""))) { rawBody =>
              bindOnce(when(status > 0L && chunked, dechunkParts(rawBody))
                  .otherwise(struct(rawBody.as("body"),
                    lit(true).as("complete")))) { dp =>
                val complete = status === 0L ||
                  (dp.getField("complete") && encOk)
                struct(status.as("status"), ctype.as("content_type"),
                  dp.getField("body").as("body"),
                  complete.as("decode_complete"))
              }
            }
          }
        }
      }
    }
  }

  /** HTTP caching policy from a response header block (RFC 9111,
    * shared-cache semantics) — the recrawl scheduler's input: a
    * polite crawler re-fetches on the origin's declared freshness,
    * revalidates with the response's validator, and never stores what
    * the origin forbade. Header-confined regexes over the same raw
    * header block [[httpResponseParts]] carries:
    *   - `no-store` OR `private` → not cacheable by a shared cache;
    *   - freshness `ttl` = `s-maxage` if present (shared caches,
    *     §5.2.2.10, overrides) else `max-age`, else −1 (no declared
    *     freshness → heuristic recrawl);
    *   - `no-cache` / `must-revalidate` / `max-age=0` → revalidate
    *     before reuse;
    *   - validator = `etag` (strong, preferred) else `last-modified`
    *     else `none`.
    * Returns `struct(cacheable, ttl, revalidate, validator)` — pure
    * Column work, zero shuffle. */
  def cachePolicy(headers: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val cc = lower(regexp_extract(headers,
      "(?im)^cache-control:\\s*([^\\r\\n]*)", 1))
    def dir(d: String) = cc.rlike("(?:^|[,\\s])" + d + "(?:$|[,\\s])")
    val sMaxage = regexp_extract(cc,
      "(?:^|[,\\s])s-maxage=([0-9]+)", 1)
    val maxAge = regexp_extract(cc,
      "(?:^|[,\\s])max-age=([0-9]+)", 1)
    val hasEtag = headers.rlike("(?im)^etag:\\s*\\S")
    val hasLm = headers.rlike("(?im)^last-modified:\\s*\\S")
    val ttl = when(length(sMaxage) > 0, sMaxage.cast("long"))
      .when(length(maxAge) > 0, maxAge.cast("long")).otherwise(lit(-1L))
    element_at(transform(array(struct(ttl.as("t"),
      (!(dir("no-store") || dir("private"))).as("c"),
      (dir("no-cache") || dir("must-revalidate")).as("r"),
      hasEtag.as("e"), hasLm.as("l"))), p =>
      struct(
        p.getField("c").cast("long").as("cacheable"),
        p.getField("t").as("ttl"),
        (p.getField("r") || p.getField("t") === 0L)
          .cast("long").as("revalidate"),
        when(p.getField("e"), lit("etag"))
          .when(p.getField("l"), lit("last-modified"))
          .otherwise(lit("none")).as("validator"))), 1)
  }

  /** Full JVM decode of one HTTP/1.1 response payload — the route
    * target for rows [[httpResponseParts]] marks incomplete, and the
    * correct primary path when bodies are binary (a gzip entity decoded
    * through a string Column would be mojibake before the inflater ever
    * saw it). Applies the RFC-ordered stack: split headers, undo
    * `Transfer-Encoding: chunked` ([[dechunkJvm]] — Transfer-Encoding
    * is removed first, RFC 9112 §6.1), then `Content-Encoding`
    * gzip/deflate via the JDK inflater (RFC 9110 §8.4). Returns
    * `(status, contentType, bodyBytes, complete)`; an unknown coding or
    * a failed inflate keeps the best-effort bytes with
    * `complete = false`. */
  def parseHttpJvm(payload: Array[Byte])
      : (Long, String, Array[Byte], Boolean) = {
    val n = payload.length
    // header/body separator: earlier of CRLFCRLF and LFLF (same
    // tolerance as the Column path)
    var crlf = -1; var lf = -1
    var i = 0
    while (i < n && (crlf < 0 || lf < 0)) {
      if (crlf < 0 && i + 3 < n && payload(i) == '\r' &&
        payload(i + 1) == '\n' && payload(i + 2) == '\r' &&
        payload(i + 3) == '\n') crlf = i
      if (lf < 0 && i + 1 < n && payload(i) == '\n' &&
        payload(i + 1) == '\n') lf = i
      i += 1
    }
    val useCrlf = crlf >= 0 && (lf < 0 || crlf <= lf)
    val blank = if (useCrlf) crlf else lf
    val skip = if (useCrlf) 4 else 2
    val headerEnd = if (blank >= 0) blank else n
    val headers = new String(payload, 0, headerEnd,
      StandardCharsets.ISO_8859_1)
    val statusM = "^HTTP/[0-9.]+ ([0-9]{3})".r.findFirstMatchIn(headers)
    val status = statusM.map(_.group(1).toLong).getOrElse(0L)
    def header(name: String): String =
      ("(?im)^" + name + ":\\s*([^\\r\\n]*)").r.findFirstMatchIn(headers)
        .map(_.group(1).trim).getOrElse("")
    val ctype = header("content-type").split(";", 2)(0).trim.toLowerCase
    if (status == 0L) return (0L, ctype, payload, true)
    val rawBody =
      if (blank >= 0 && blank + skip <= n)
        java.util.Arrays.copyOfRange(payload, blank + skip, n)
      else Array.emptyByteArray
    val chunked = header("transfer-encoding").equalsIgnoreCase("chunked")
    val (transferred, tOk) =
      if (chunked) dechunkJvm(rawBody) else (rawBody, true)
    val cenc = header("content-encoding").toLowerCase
    val (entity, cOk) = cenc match {
      case "" | "identity" => (transferred, true)
      case "gzip" | "x-gzip" =>
        try {
          val in = new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(transferred))
          (in.readAllBytes(), true)
        } catch { case _: java.io.IOException => (transferred, false) }
      case "deflate" =>
        try {
          val inf = new Inflater()
          inf.setInput(transferred)
          val out = new ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          while (!inf.finished() && !inf.needsInput())
            out.write(buf, 0, inf.inflate(buf))
          val ok = inf.finished()
          inf.end()
          (if (ok) out.toByteArray else transferred, ok)
        } catch {
          case _: java.util.zip.DataFormatException => (transferred, false)
        }
      case _ => (transferred, false) // br/zstd etc.: route, don't guess
    }
    (status, ctype, entity, tOk && cOk)
  }

  /** DataFrame seam over [[parseHttpJvm]]: appends `http_status`,
    * `http_content_type`, `http_body` (BYTES — post-decode entity;
    * text decoding is the charset rung's job), and `decode_complete`
    * to every row of `df`, parsing `payloadCol` (binary) per row inside
    * `mapPartitions` — embarrassingly parallel, zero shuffle, and the
    * schema passes through so the seam composes mid-pipeline. */
  def httpDecode(df: DataFrame, payloadCol: String = "payload")
      : DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val idx = df.schema.fieldIndex(payloadCol)
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("http_status", LongType, nullable = false),
      StructField("http_content_type", StringType, nullable = false),
      StructField("http_body", BinaryType, nullable = true),
      StructField("decode_complete", BooleanType, nullable = false)))
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.get(idx) match {
          case b: Array[Byte] => b
          case s: String => s.getBytes(StandardCharsets.UTF_8)
          case null => Array.emptyByteArray
          case other => throw new IllegalArgumentException(
            s"$payloadCol must be binary or string, got ${other.getClass}")
        }
        val (status, ctype, body, ok) = parseHttpJvm(payload)
        Row.fromSeq(r.toSeq ++ Seq(status, ctype, body, ok))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** One named header's value from an HTTP/1.1 message (RFC 9110 §5:
    * field names are case-insensitive, the value runs to the line end,
    * OWS trimmed). The search is confined to the HEADER SECTION — the
    * same earlier-of-CRLF/LF blank-line split as [[httpResponseParts]] —
    * so a `name:`-shaped line inside the body can never match. Empty
    * string when absent. Pure Column work; the per-header regex rides
    * the same scan as the parts extraction. */
  def httpHeader(payload: org.apache.spark.sql.Column,
                 name: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '-'),
      s"not an HTTP field name: '$name'")
    val blankCrlf = call_function("instr", payload, lit("\r\n\r\n"))
    val blankLf = call_function("instr", payload, lit("\n\n"))
    val useCrlf = blankCrlf > 0 && (blankLf === 0 || blankCrlf <= blankLf)
    val blank = when(useCrlf, blankCrlf).otherwise(blankLf)
    val headers = when(blank > 0,
      call_function("substr", payload, lit(1), blank - 1)).otherwise(payload)
    trim(regexp_extract(headers, "(?im)^" + name + ":([^\\r\\n]*)", 1))
  }
}
