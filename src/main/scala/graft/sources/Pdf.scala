package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PDF structure probing (ISO 32000) — PDFs are a first-class corpus
  * source (papers, books, filings), and a distributed ingest
  * routes/filters them on STRUCTURE (version, page count, object
  * census) long before any text extraction runs. This is the container
  * half, the [[Archive]]/`mp4SampleRanges` discipline for documents:
  * real spec arithmetic over the payload —
  *
  *   - header version from the `%PDF-x.y` comment;
  *   - `startxref` located from the TAIL (the spec's own read order:
  *     a PDF is parsed back-to-front);
  *   - the classic `xref` table at that offset: subsection header gives
  *     the object census, 20-byte entries PARSED for their byte offsets
  *     (object bodies are then resolved by offset, never by substring
  *     search — `1 0 obj` occurring inside `11 0 obj` can't mislead an
  *     offset lookup);
  *   - the `trailer` dict's `/Root` reference followed to the catalog,
  *     its `/Pages` reference to the page-tree root, whose `/Count` is
  *     the page total (ISO 32000 §7.7.3.2 requires it there — no
  *     recursion needed for the census).
  *
  * PDF 1.5+ cross-reference STREAMS (ISO 32000 §7.5.8 — what most
  * modern writers emit) are DETECTED and routed: the object at the
  * `startxref` offset is an `/Type /XRef` stream whose dict doubles as
  * the trailer, so `/Size` (the census) is readable as plain text, but
  * the offset table itself is Flate-compressed — page-count resolution
  * for those belongs behind the decode seam with the other codecs, and
  * the probe emits `kind = "xref-stream"` with `page_count = -1`
  * instead of failing. Malformed structures still fail loudly.
  */
object Pdf {

  /** Build a minimal conforming PDF with `pages` pages: catalog, page
    * tree, one empty page object per page, a correct xref table with
    * byte-exact offsets, trailer, `startxref`. Text-only output —
    * deterministic for a given input. */
  def buildPdf(pages: Int, version: String = "1.7"): Array[Byte] = {
    require(pages > 0, s"pages must be positive, got $pages")
    require(version.matches("1\\.[0-7]"), s"bad PDF version '$version'")
    val sb = new StringBuilder
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    sb.append(s"%PDF-$version\n")
    def obj(body: String): Unit = {
      offsets += sb.length
      sb.append(body)
    }
    val kids = (0 until pages).map(i => s"${3 + i} 0 R").mkString(" ")
    obj(s"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    obj(s"2 0 obj << /Type /Pages /Kids [$kids] /Count $pages >> endobj\n")
    (0 until pages).foreach { i =>
      obj(s"${3 + i} 0 obj << /Type /Page /Parent 2 0 R >> endobj\n")
    }
    val xrefAt = sb.length
    val n = offsets.length + 1 // + the free object 0
    sb.append(s"xref\n0 $n\n")
    sb.append("0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer << /Size $n /Root 1 0 R >>\n")
    sb.append(s"startxref\n$xrefAt\n%%EOF\n")
    sb.toString.getBytes("ISO-8859-1")
  }

  /** Build a PDF 1.5-style file whose cross-reference data lives in an
    * `/Type /XRef` STREAM object (ISO 32000 §7.5.8): same catalog/page
    * objects as [[buildPdf]], but the tail is a stream object whose
    * dict carries `/Size`/`/Root` (it doubles as the trailer) and whose
    * body is the Flate-compressed offset table (`/W [1 4 2]` entries).
    * The fixture side of detect-and-route: [[pdfStructure]] must
    * classify it without inflating anything. */
  def buildXrefStreamPdf(pages: Int): Array[Byte] = {
    require(pages > 0, s"pages must be positive, got $pages")
    val sb = new StringBuilder
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    sb.append("%PDF-1.5\n")
    def obj(body: String): Unit = { offsets += sb.length; sb.append(body) }
    val kids = (0 until pages).map(i => s"${3 + i} 0 R").mkString(" ")
    obj(s"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    obj(s"2 0 obj << /Type /Pages /Kids [$kids] /Count $pages >> endobj\n")
    (0 until pages).foreach { i =>
      obj(s"${3 + i} 0 obj << /Type /Page /Parent 2 0 R >> endobj\n")
    }
    val xrefAt = sb.length
    val xrefNum = offsets.length + 1
    val size = xrefNum + 1 // objects 0..xrefNum inclusive
    // /W [1 4 2] rows: type byte, 4-byte offset, 2-byte generation
    val rows = new java.io.ByteArrayOutputStream()
    def row(t: Int, off: Long, gen: Int): Unit = {
      rows.write(t)
      rows.write(((off >> 24) & 0xFF).toInt); rows.write(((off >> 16) & 0xFF).toInt)
      rows.write(((off >> 8) & 0xFF).toInt); rows.write((off & 0xFF).toInt)
      rows.write((gen >> 8) & 0xFF); rows.write(gen & 0xFF)
    }
    row(0, 0L, 0xFFFF)                       // free object 0
    offsets.foreach(o => row(1, o.toLong, 0))
    row(1, xrefAt.toLong, 0)                 // the xref stream itself
    val d = new java.util.zip.Deflater()
    d.setInput(rows.toByteArray); d.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) comp.write(buf, 0, d.deflate(buf))
    d.end()
    val stream = comp.toByteArray
    sb.append(s"$xrefNum 0 obj << /Type /XRef /Size $size /Root 1 0 R " +
      s"/W [1 4 2] /Filter /FlateDecode /Length ${stream.length} " +
      ">> stream\n")
    val head = sb.toString.getBytes("ISO-8859-1")
    val tail = (s"\nendstream endobj\nstartxref\n$xrefAt\n%%EOF\n")
      .getBytes("ISO-8859-1")
    val out = new java.io.ByteArrayOutputStream()
    out.write(head); out.write(stream); out.write(tail)
    out.toByteArray
  }

  /** Parse one PDF's structure:
    * `(version, kind, n_objects, page_count)` where `kind` is
    * `xref-table` (classic — fully resolved) or `xref-stream`
    * (PDF 1.5+ — census from the stream dict's `/Size`, page count
    * `-1`: the offset table is compressed and belongs to the decode
    * seam). `n_objects` includes the free object 0. */
  def pdfStructure(payload: Array[Byte]): (String, String, Long, Long) = {
    val text = new String(payload, "ISO-8859-1")
    require(text.startsWith("%PDF-"), "not a PDF: missing %PDF header")
    val version = text.substring(5, text.indexOf('\n')).trim
    val sx = text.lastIndexOf("startxref")
    require(sx >= 0, "no startxref")
    val xrefAt = text.substring(sx + 9).trim.takeWhile(_.isDigit)
    require(xrefAt.nonEmpty, "startxref offset missing")
    val xref = xrefAt.toInt
    require(xref >= 0 && xref < text.length, s"startxref $xref out of range")
    if (!text.startsWith("xref", xref)) {
      // detect-and-route: a 1.5+ cross-reference stream object — dict
      // fields are plain text even though the table data is Flate'd
      val objHdr = """^(\d+)\s+0\s+obj""".r
      require(objHdr.findFirstIn(text.substring(xref,
        math.min(text.length, xref + 32))).isDefined,
        s"neither an xref table nor an object at startxref $xref")
      val dictEnd = text.indexOf("stream", xref)
      require(dictEnd > xref, "xref-stream object has no stream keyword")
      val dict = text.substring(xref, dictEnd)
      require("""/Type\s*/XRef""".r.findFirstIn(dict).isDefined,
        s"object at startxref $xref is not /Type /XRef")
      val size = """/Size\s+(\d+)""".r.findFirstMatchIn(dict)
        .getOrElse(throw new IllegalArgumentException(
          "no /Size in xref stream dict")).group(1).toLong
      return (version, "xref-stream", size, -1L)
    }
    // classic table: subsection header "<first> <count>", then 20-byte
    // entries parsed for their offsets (the object-resolution index)
    val hdrStart = text.indexOf('\n', xref) + 1
    val hdrEnd = text.indexOf('\n', hdrStart)
    val hdr = text.substring(hdrStart, hdrEnd).trim.split("\\s+")
    require(hdr.length == 2, s"bad xref subsection header '${hdr.mkString(" ")}'")
    val first = hdr(0).toInt
    val count = hdr(1).toInt
    val entryBase = hdrEnd + 1
    val objOffset = new scala.collection.mutable.HashMap[Int, Int]
    (0 until count).foreach { i =>
      val e = text.substring(entryBase + i * 20, entryBase + i * 20 + 20)
      if (e.charAt(17) == 'n') objOffset(first + i) = e.substring(0, 10).toInt
    }
    val trailerAt = entryBase + count * 20
    val trailer = text.substring(trailerAt)
    require(trailer.trim.startsWith("trailer"), "trailer not after xref")
    val root = """/Root\s+(\d+)\s+0\s+R""".r.findFirstMatchIn(trailer)
      .getOrElse(throw new IllegalArgumentException("no /Root in trailer"))
      .group(1).toInt
    // object bodies resolved by XREF OFFSET, not substring search — the
    // offset must land on the object's own header (catches stale xref)
    def objBody(num: Int): String = {
      val at = objOffset.getOrElse(num,
        throw new IllegalArgumentException(s"object $num not in xref"))
      require(("""^""" + num + """\s+\d+\s+obj""").r
        .findFirstIn(text.substring(at,
          math.min(text.length, at + 32))).isDefined,
        s"xref offset $at for object $num does not address an obj header")
      val end = text.indexOf("endobj", at)
      text.substring(at, if (end > at) end else at + 1)
    }
    val cat = objBody(root)
    val pagesRef = """/Pages\s+(\d+)\s+0\s+R""".r.findFirstMatchIn(cat)
      .getOrElse(throw new IllegalArgumentException("no /Pages in catalog"))
      .group(1).toInt
    val tree = objBody(pagesRef)
    val pageCount = """/Count\s+(\d+)""".r.findFirstMatchIn(tree)
      .getOrElse(throw new IllegalArgumentException("no /Count in page tree"))
      .group(1).toLong
    (version, "xref-table", count.toLong, pageCount)
  }

  /** Structure probe over an `(id, payload)` frame:
    * `(id, version, kind, n_objects, page_count)` — partition-batched,
    * zero shuffle, O(structure) per document; xref-stream PDFs carry
    * `page_count = -1` (decode-seam routing). */
  def pdfProbe(mm: DataFrame): DataFrame = {
    val spark = mm.sparkSession
    import spark.implicits._
    mm.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val (v, k, n, p) = pdfStructure(payload)
          (id, v, k, n, p)
        }
      }
      .toDF("id", "version", "kind", "n_objects", "page_count")
  }
}
