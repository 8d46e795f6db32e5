package graft.sources

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.tsne.SparkTestBase

/** PDF structure walk: build→probe round-trip, byte-exact xref offsets,
  * tail-first startxref discovery, loud failures. */
class PdfSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  "buildPdf/pdfStructure" should "round-trip version, census, pages" in {
    Pdf.pdfStructure(Pdf.buildPdf(1)) shouldBe (("1.7", 4L, 1L))
    Pdf.pdfStructure(Pdf.buildPdf(5, "1.4")) shouldBe (("1.4", 8L, 5L))
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
    Pdf.pdfStructure(pdf)._3 shouldBe 2L
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
    val mm = Seq((1L, Pdf.buildPdf(2)), (2L, Pdf.buildPdf(7, "1.5")))
      .toDF("id", "payload")
    Pdf.pdfProbe(mm).select("id", "version", "n_objects", "page_count")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
      .toSeq shouldBe Seq((1L, "1.7", 5L, 2L), (2L, "1.5", 10L, 7L))
  }
}
