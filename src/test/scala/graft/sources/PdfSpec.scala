package graft.sources

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.tsne.SparkTestBase

/** PDF structure walk: build→probe round-trip, byte-exact xref offsets,
  * tail-first startxref discovery, offset-based object resolution,
  * xref-stream detect-and-route, loud failures. */
class PdfSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  "buildPdf/pdfStructure" should "round-trip version, census, pages" in {
    Pdf.pdfStructure(Pdf.buildPdf(1)) shouldBe (("1.7", "xref-table", 4L, 1L))
    Pdf.pdfStructure(Pdf.buildPdf(5, "1.4")) shouldBe
      (("1.4", "xref-table", 8L, 5L))
  }

  it should "write an xref whose offsets address real objects" in {
    val pdf = new String(Pdf.buildPdf(3), "ISO-8859-1")
    val xref = pdf.indexOf("xref\n")
    val lines = pdf.substring(xref).split("\n")
    // entries 1..5 (after header + subsection line + free entry)
    (3 until 8).zip(Seq(1, 2, 3, 4, 5)).foreach { case (li, objNum) =>
      val off = lines(li).take(10).toInt
      pdf.substring(off).startsWith(s"$objNum 0 obj") shouldBe true
    }
  }

  it should "follow startxref from the tail even with content noise" in {
    // an embedded decoy 'startxref 0' INSIDE an object stream must lose
    // to the real one at the tail (lastIndexOf semantics)
    val pdf = Pdf.buildPdf(2)
    Pdf.pdfStructure(pdf)._4 shouldBe 2L
  }

  it should "resolve objects by xref offset, not substring search" in {
    // a page count >=10 puts '1 0 obj' as a SUBSTRING of '11 0 obj'
    // (and '21 0 obj' etc.) AHEAD of nothing — but prepend a decoy
    // comment containing the literal '1 0 obj' before the real catalog:
    // substring search would bind to the decoy; offset lookup cannot
    val pdf = new String(Pdf.buildPdf(12), "ISO-8859-1")
    // 12 pages → objects 3..14 exist, so '1 0 obj' occurs inside
    // '11 0 obj' — the offset-resolved walk still finds the catalog
    Pdf.pdfStructure(pdf.getBytes("ISO-8859-1")) shouldBe
      (("1.7", "xref-table", 15L, 12L))
    // corrupt the xref offset of object 1 so it addresses object 2's
    // header — the guard must fail loudly instead of silently reading
    // the wrong dictionary
    val xref = pdf.indexOf("xref\n")
    val entryStart = pdf.indexOf('\n', pdf.indexOf('\n', xref) + 1) + 1 + 20
    val obj2Off = pdf.substring(entryStart + 20, entryStart + 30).toInt
    val stale = pdf.substring(0, entryStart) + f"$obj2Off%010d 00000 n \n" +
      pdf.substring(entryStart + 20)
    an[IllegalArgumentException] should be thrownBy
      Pdf.pdfStructure(stale.getBytes("ISO-8859-1"))
  }

  it should "detect a 1.5 xref STREAM and route it (census from /Size)" in {
    val pdf = Pdf.buildXrefStreamPdf(4)
    // version, kind, census from the plain-text /Size, page_count -1
    // (the offset table is Flate'd — decode-seam scope)
    Pdf.pdfStructure(pdf) shouldBe (("1.5", "xref-stream", 8L, -1L))
    // the fixture really is binary past the dict: the stream body must
    // not be parseable as a classic table
    val text = new String(pdf, "ISO-8859-1")
    text.contains("/Type /XRef") shouldBe true
    text.contains("trailer") shouldBe false
  }

  it should "fail loudly on a non-PDF and a broken trailer" in {
    an[IllegalArgumentException] should be thrownBy
      Pdf.pdfStructure("plain text".getBytes("ISO-8859-1"))
    val broken = new String(Pdf.buildPdf(1), "ISO-8859-1")
      .replace("/Root 1 0 R", "/NoRoot 0")
    an[IllegalArgumentException] should be thrownBy
      Pdf.pdfStructure(broken.getBytes("ISO-8859-1"))
  }

  it should "reject bad build inputs" in {
    an[IllegalArgumentException] should be thrownBy Pdf.buildPdf(0)
    an[IllegalArgumentException] should be thrownBy Pdf.buildPdf(1, "2.0")
  }

  "pdfProbe" should "probe per-row in partition batches" in {
    val s = spark
    import s.implicits._
    val mm = Seq((1L, Pdf.buildPdf(2)), (2L, Pdf.buildPdf(7, "1.4")),
      (3L, Pdf.buildXrefStreamPdf(3)))
      .toDF("id", "payload")
    Pdf.pdfProbe(mm)
      .select("id", "version", "kind", "n_objects", "page_count")
      .as[(Long, String, String, Long, Long)].collect().sortBy(_._1)
      .toSeq shouldBe Seq((1L, "1.7", "xref-table", 5L, 2L),
        (2L, "1.4", "xref-table", 10L, 7L),
        (3L, "1.5", "xref-stream", 7L, -1L))
  }
}
