package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PDF structure probing (ISO 32000, classic cross-reference tables) —
  * PDFs are a first-class corpus source (papers, books, filings), and a
  * distributed ingest routes/filters them on STRUCTURE (version, page
  * count, object census) long before any text extraction runs. This is
  * the container half, the [[Archive]]/`mp4SampleRanges` discipline for
  * documents: real spec arithmetic over the payload —
  *
  *   - header version from the `%PDF-x.y` comment;
  *   - `startxref` located from the TAIL (the spec's own read order:
  *     a PDF is parsed back-to-front);
  *   - the classic `xref` table at that offset: subsection header gives
  *     the object census, 20-byte entries skipped by count — never
  *     scanned;
  *   - the `trailer` dict's `/Root` reference followed to the catalog,
  *     its `/Pages` reference to the page-tree root, whose `/Count` is
  *     the page total (ISO 32000 §7.7.3.2 requires it there — no
  *     recursion needed for the census).
  *
  * Scope: classic xref tables (the PDF ≤1.4 form that remains legal and
  * ubiquitous in generated PDFs); 1.5+ cross-reference STREAMS are
  * Flate-compressed binary and belong behind the decode seam with the
  * other codecs. Malformed structures fail loudly.
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

  /** Parse one PDF's structure: `(version, n_objects, page_count)`.
    * `n_objects` is the xref census including the free object 0. */
  def pdfStructure(payload: Array[Byte]): (String, Long, Long) = {
    val text = new String(payload, "ISO-8859-1")
    require(text.startsWith("%PDF-"), "not a PDF: missing %PDF header")
    val version = text.substring(5, text.indexOf('\n')).trim
    val sx = text.lastIndexOf("startxref")
    require(sx >= 0, "no startxref")
    val xrefAt = text.substring(sx + 9).trim.takeWhile(_.isDigit)
    require(xrefAt.nonEmpty, "startxref offset missing")
    val xref = xrefAt.toInt
    require(xref >= 0 && xref < text.length &&
      text.startsWith("xref", xref), s"xref table not at $xref")
    // subsection header: "<first> <count>"
    val hdrStart = text.indexOf('\n', xref) + 1
    val hdrEnd = text.indexOf('\n', hdrStart)
    val hdr = text.substring(hdrStart, hdrEnd).trim.split("\\s+")
    require(hdr.length == 2, s"bad xref subsection header '${hdr.mkString(" ")}'")
    val count = hdr(1).toInt
    // entries are exactly 20 bytes each — skip by arithmetic
    val trailerAt = hdrEnd + 1 + count * 20
    val trailer = text.substring(trailerAt)
    require(trailer.trim.startsWith("trailer"), "trailer not after xref")
    val root = """/Root\s+(\d+)\s+0\s+R""".r.findFirstMatchIn(trailer)
      .getOrElse(throw new IllegalArgumentException("no /Root in trailer"))
      .group(1).toInt
    def objBody(num: Int): String = {
      val at = text.indexOf(s"$num 0 obj")
      require(at >= 0, s"object $num not found")
      text.substring(at, text.indexOf("endobj", at) max (at + 1))
    }
    val cat = objBody(root)
    val pagesRef = """/Pages\s+(\d+)\s+0\s+R""".r.findFirstMatchIn(cat)
      .getOrElse(throw new IllegalArgumentException("no /Pages in catalog"))
      .group(1).toInt
    val tree = objBody(pagesRef)
    val pageCount = """/Count\s+(\d+)""".r.findFirstMatchIn(tree)
      .getOrElse(throw new IllegalArgumentException("no /Count in page tree"))
      .group(1).toLong
    (version, count.toLong, pageCount)
  }

  /** Structure probe over an `(id, payload)` frame:
    * `(id, version, n_objects, page_count)` — partition-batched,
    * zero shuffle, O(structure) per document. */
  def pdfProbe(mm: DataFrame): DataFrame = {
    val spark = mm.sparkSession
    import spark.implicits._
    mm.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val (v, n, p) = pdfStructure(payload)
          (id, v, n, p)
        }
      }
      .toDF("id", "version", "n_objects", "page_count")
  }
}
