package graft.pipeline

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.tsne.SparkTestBase

/** EXIF container math pinned on conforming and malformed byte streams:
  * both TIFF byte orders round-trip, out-of-line ASCII values, the
  * marker walk's skip path, absence vs error, and loud failures for
  * structurally broken input. */
class ExifSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  "buildExifJpeg/exifIfd0" should "round-trip both byte orders" in {
    for (big <- Seq(true, false)) {
      val jpeg = Multimodal.buildExifJpeg(640, 480, 6, "TestCam X", big)
      Multimodal.exifIfd0(jpeg) shouldBe
        ((true, big, 640L, 480L, 6L, "TestCam X"))
    }
  }

  it should "read an inline (<= 3 chars + NUL) Make value" in {
    val jpeg = Multimodal.buildExifJpeg(10, 20, 1, "abc", bigEndian = true)
    Multimodal.exifIfd0(jpeg)._6 shouldBe "abc"
  }

  it should "classify a JPEG without APP1 as absence, not error" in {
    val noExif = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte,
      0xFE.toByte, 0, 4, 'a'.toByte, 'b'.toByte, 0xFF.toByte, 0xD9.toByte)
    Multimodal.exifIfd0(noExif) shouldBe ((false, false, 0L, 0L, 0L, ""))
  }

  it should "skip a leading APP0 (JFIF) and still find APP1" in {
    val exif = Multimodal.buildExifJpeg(8, 8, 2, "M", bigEndian = false)
    val app0 = Array[Byte](0xFF.toByte, 0xE0.toByte, 0, 7,
      'J'.toByte, 'F'.toByte, 'I'.toByte, 'F'.toByte, 0)
    val jpeg = exif.take(2) ++ app0 ++ exif.drop(2)
    Multimodal.exifIfd0(jpeg) shouldBe ((true, false, 8L, 8L, 2L, "M"))
  }

  it should "fail loudly on a non-JPEG and on a corrupt TIFF header" in {
    an[IllegalArgumentException] should be thrownBy
      Multimodal.exifIfd0(Array[Byte](0, 1, 2, 3))
    val jpeg = Multimodal.buildExifJpeg(8, 8, 1, "M", bigEndian = true)
    // corrupt the TIFF byte-order mark inside APP1 ('MM' at offset 12)
    val bad = jpeg.clone()
    bad(12) = 'X'.toByte
    an[IllegalArgumentException] should be thrownBy Multimodal.exifIfd0(bad)
  }

  it should "reject out-of-range orientations at build time" in {
    an[IllegalArgumentException] should be thrownBy
      Multimodal.buildExifJpeg(8, 8, 0, "M", bigEndian = true)
    an[IllegalArgumentException] should be thrownBy
      Multimodal.buildExifJpeg(8, 8, 9, "M", bigEndian = true)
  }

  "exifProbe" should "extract per-row fields in partition batches" in {
    val s = spark
    import s.implicits._
    val mm = Seq(
      (1L, Multimodal.buildExifJpeg(100, 50, 3, "A", bigEndian = true)),
      (2L, Multimodal.buildExifJpeg(7, 9, 8, "B", bigEndian = false)))
      .toDF("id", "payload")
    Multimodal.exifProbe(mm)
      .select("id", "big_endian", "width", "height", "orientation", "make")
      .as[(Long, Boolean, Long, Long, Long, String)]
      .collect().sortBy(_._1).toSeq shouldBe Seq(
      (1L, true, 100L, 50L, 3L, "A"), (2L, false, 7L, 9L, 8L, "B"))
  }
}
