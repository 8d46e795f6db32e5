package graft.pipeline

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.tsne.SparkTestBase

/** EXIF container math pinned on conforming and malformed byte streams:
  * both TIFF byte orders round-trip (including the Exif and GPS
  * sub-IFDs one pointer deeper), out-of-line ASCII values, the marker
  * walk's skip path, absence vs error, and loud failures for
  * structurally broken input. */
class ExifSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  "buildExifJpeg/exifIfd0" should "round-trip both byte orders" in {
    for (big <- Seq(true, false)) {
      val jpeg = Multimodal.buildExifJpeg(640, 480, 6, "TestCam X", big)
      Multimodal.exifIfd0(jpeg) shouldBe
        ((true, big, 640L, 480L, 6L, "TestCam X", "", false, 0L, 0L))
    }
  }

  it should "walk the Exif and GPS sub-IFDs in both byte orders" in {
    for (big <- Seq(true, false)) {
      val jpeg = Multimodal.buildExifJpeg(640, 480, 1, "Cam", big,
        dateTimeOriginal = Some("2026:03:05 10:00:00"),
        gps = Some(("N", 48, 8, 2345, "W", 11, 34, 170)))
      val (_, _, _, _, _, _, date, hasGps, lat, lon) =
        Multimodal.exifIfd0(jpeg)
      date shouldBe "2026:03:05 10:00:00"
      hasGps shouldBe true
      // signed centiarcseconds: (deg·3600 + min·60)·100 + cs
      lat shouldBe (48L * 360000 + 8L * 6000 + 2345)
      lon shouldBe -(11L * 360000 + 34L * 6000 + 170)
    }
  }

  it should "carry each sub-IFD independently (date without GPS, GPS without date)" in {
    val dOnly = Multimodal.buildExifJpeg(8, 8, 1, "M", bigEndian = true,
      dateTimeOriginal = Some("2026:01:02 03:04:05"))
    val g = Multimodal.exifIfd0(dOnly)
    (g._7, g._8) shouldBe (("2026:01:02 03:04:05", false))
    val gOnly = Multimodal.buildExifJpeg(8, 8, 1, "M", bigEndian = false,
      gps = Some(("S", 1, 2, 3, "E", 4, 5, 6)))
    val h = Multimodal.exifIfd0(gOnly)
    (h._7, h._8) shouldBe (("", true))
    h._9 shouldBe -(1L * 360000 + 2L * 6000 + 3)
    h._10 shouldBe (4L * 360000 + 5L * 6000 + 6)
  }

  it should "read an inline (<= 3 chars + NUL) Make value" in {
    val jpeg = Multimodal.buildExifJpeg(10, 20, 1, "abc", bigEndian = true)
    Multimodal.exifIfd0(jpeg)._6 shouldBe "abc"
  }

  it should "classify a JPEG without APP1 as absence, not error" in {
    val noExif = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte,
      0xFE.toByte, 0, 4, 'a'.toByte, 'b'.toByte, 0xFF.toByte, 0xD9.toByte)
    Multimodal.exifIfd0(noExif) shouldBe
      ((false, false, 0L, 0L, 0L, "", "", false, 0L, 0L))
  }

  it should "skip a leading APP0 (JFIF) and still find APP1" in {
    val exif = Multimodal.buildExifJpeg(8, 8, 2, "M", bigEndian = false)
    val app0 = Array[Byte](0xFF.toByte, 0xE0.toByte, 0, 7,
      'J'.toByte, 'F'.toByte, 'I'.toByte, 'F'.toByte, 0)
    val jpeg = exif.take(2) ++ app0 ++ exif.drop(2)
    Multimodal.exifIfd0(jpeg) shouldBe
      ((true, false, 8L, 8L, 2L, "M", "", false, 0L, 0L))
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

  it should "fail loudly on a GPS rational that is not exact at 0.01''" in {
    val jpeg = Multimodal.buildExifJpeg(8, 8, 1, "M", bigEndian = true,
      gps = Some(("N", 1, 2, 3, "E", 4, 5, 6)))
    // find the GPS latitude rationals: last 48 bytes before EOI are the
    // two triples; corrupt the first denominator (1 → 7)
    val denAt = jpeg.length - 2 - 48 + 4
    val bad = jpeg.clone()
    bad(denAt + 3) = 7.toByte
    val ex = the[IllegalArgumentException] thrownBy Multimodal.exifIfd0(bad)
    ex.getMessage should include("not exact")
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
      (1L, Multimodal.buildExifJpeg(100, 50, 3, "A", bigEndian = true,
        dateTimeOriginal = Some("2026:06:07 08:09:10"),
        gps = Some(("S", 33, 52, 1000, "E", 151, 12, 500)))),
      (2L, Multimodal.buildExifJpeg(7, 9, 8, "B", bigEndian = false)))
      .toDF("id", "payload")
    Multimodal.exifProbe(mm)
      .select("id", "big_endian", "width", "height", "orientation", "make",
        "date_original", "has_gps", "gps_lat_cs", "gps_lon_cs")
      .as[(Long, Boolean, Long, Long, Long, String, String, Boolean,
        Long, Long)]
      .collect().sortBy(_._1).toSeq shouldBe Seq(
      (1L, true, 100L, 50L, 3L, "A", "2026:06:07 08:09:10", true,
        -(33L * 360000 + 52L * 6000 + 1000),
        151L * 360000 + 12L * 6000 + 500),
      (2L, false, 7L, 9L, 8L, "B", "", false, 0L, 0L))
  }
}
