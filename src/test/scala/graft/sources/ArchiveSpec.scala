package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, ZipEntry, ZipOutputStream}

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.tsne.SparkTestBase

/** ZIP central-directory walk pinned against archives produced by the
  * REAL JDK zip encoder: STORED and DEFLATED members, trailing-comment
  * EOCD location, and the loud-failure contract. */
class ArchiveSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private def zipOf(comment: String, entries: (String, String, Boolean)*)
      : Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    if (comment.nonEmpty) zos.setComment(comment)
    entries.foreach { case (name, content, stored) =>
      val bytes = content.getBytes("UTF-8")
      val e = new ZipEntry(name)
      if (stored) {
        e.setMethod(ZipEntry.STORED)
        e.setSize(bytes.length)
        val crc = new CRC32(); crc.update(bytes)
        e.setCrc(crc.getValue)
      }
      zos.putNextEntry(e)
      zos.write(bytes)
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  "zipCentralDirectory" should "list real JDK-written members in order" in {
    val zip = zipOf("",
      ("a.txt", "alpha content", true),
      ("dir/b.txt", "beta", false))
    val got = Archive.zipCentralDirectory(zip)
    got.map(_._1) shouldBe Seq("a.txt", "dir/b.txt")
    got.head._2 shouldBe 0 // STORED
    got.head._3 shouldBe 13L // compressed == uncompressed when stored
    got.head._4 shouldBe 13L
    got(1)._2 shouldBe 8 // DEFLATED
    got(1)._4 shouldBe 4L
  }

  it should "find the EOCD behind a trailing archive comment" in {
    val zip = zipOf("a trailing comment that pads the EOCD record",
      ("x.bin", "payload", true))
    Archive.zipCentralDirectory(zip).map(_._1) shouldBe Seq("x.bin")
  }

  it should "report local header offsets that actually address members" in {
    val zip = zipOf("", ("f1", "one", true), ("f2", "two", true))
    Archive.zipCentralDirectory(zip).foreach { case (_, _, _, _, off) =>
      // local file header signature PK\3\4 at the recorded offset
      zip(off.toInt) shouldBe 0x50.toByte
      zip(off.toInt + 1) shouldBe 0x4B.toByte
      zip(off.toInt + 2) shouldBe 0x03.toByte
      zip(off.toInt + 3) shouldBe 0x04.toByte
    }
  }

  it should "fail loudly on garbage and on a truncated directory" in {
    an[IllegalArgumentException] should be thrownBy
      Archive.zipCentralDirectory("not a zip at all, much too plain".getBytes)
    val zip = zipOf("", ("a", "x", true))
    an[IllegalArgumentException] should be thrownBy
      Archive.zipCentralDirectory(zip.take(zip.length - 30) ++
        zip.takeRight(22))
  }

  it should "resolve ZIP64 sentinels through the locator and 0x0001 extras" in {
    val members = Seq(
      ("big/first.txt", "alpha zip64 content".getBytes("UTF-8")),
      ("big/second.bin", Array.tabulate(300)(_.toByte)),
      ("third", "x".getBytes("UTF-8")))
    val zip = Archive.buildZip64(members)
    // the classic EOCD really does hold only sentinels
    val eocd = zip.length - 22
    (zip(eocd + 10) & 0xFF, zip(eocd + 11) & 0xFF) shouldBe ((0xFF, 0xFF))
    val got = Archive.zipCentralDirectory(zip)
    got.map(_._1) shouldBe members.map(_._1)
    got.map(_._4) shouldBe members.map(_._2.length.toLong)
    got.map(_._3) shouldBe members.map(_._2.length.toLong) // STORED
    // resolved local offsets address real PK\3\4 headers
    got.foreach { case (_, _, _, _, off) =>
      zip.slice(off.toInt, off.toInt + 4) shouldBe
        Array[Byte](0x50, 0x4B, 0x03, 0x04)
    }
  }

  it should "fail loudly on ZIP64 sentinels without a locator" in {
    // classic EOCD with sentinel count but nothing ZIP64 before it —
    // the pre-round-13 shape that was unreadable; now a clear error
    val zip = zipOf("", ("a", "x", true))
    val eocd = zip.length - 22
    val broken = zip.clone()
    broken(eocd + 10) = 0xFF.toByte; broken(eocd + 11) = 0xFF.toByte
    val ex = the[IllegalArgumentException] thrownBy
      Archive.zipCentralDirectory(broken)
    ex.getMessage should include("ZIP64")
  }

  "tarList" should "list ustar members with sizes and data offsets" in {
    val tar = Archive.buildTar(Seq(
      ("a.txt", "alpha".getBytes("UTF-8")),
      ("dir/b.bin", Array.tabulate(700)(_.toByte)),
      ("c", Array.emptyByteArray)))
    val got = Archive.tarList(tar)
    got.map(_._1) shouldBe Seq("a.txt", "dir/b.bin", "c")
    got.map(_._3) shouldBe Seq(5L, 700L, 0L)
    // data really sits at the reported offsets
    val (_, _, sz, off) = got.head
    new String(tar, off.toInt, sz.toInt, "UTF-8") shouldBe "alpha"
    // 700-byte member occupies two data blocks: next offset is +512+1024
    got(2)._4 shouldBe got(1)._4 + 1024 + 512
  }

  it should "honor pax path and size overrides for long names" in {
    val long = "deep" + "/sub" * 40 + "/leaf.txt"
    long.getBytes("UTF-8").length should be > 100
    val tar = Archive.buildTar(Seq(
      (long, "pax payload".getBytes("UTF-8")),
      ("short.txt", "s".getBytes("UTF-8"))))
    val got = Archive.tarList(tar)
    got.map(_._1) shouldBe Seq(long, "short.txt")
    got.head._3 shouldBe 11L
    new String(tar, got.head._4.toInt, 11, "UTF-8") shouldBe "pax payload"
  }

  it should "apply a pax header only to the entry that follows it" in {
    val tar = Archive.buildTar(
      Seq(("first", "1".getBytes), ("second", "22".getBytes)),
      forcePax = true)
    Archive.tarList(tar).map(t => (t._1, t._3)) shouldBe
      Seq(("first", 1L), ("second", 2L))
  }

  it should "fail loudly on corrupted checksums and truncation" in {
    val tar = Archive.buildTar(Seq(("a", "x".getBytes)))
    val bad = tar.clone(); bad(0) = 'z'.toByte // name change breaks checksum
    the[IllegalArgumentException] thrownBy
      Archive.tarList(bad) should have message
      "requirement failed: header checksum mismatch at 0"
    an[IllegalArgumentException] should be thrownBy
      Archive.tarList(tar.take(tar.length - 512)) // one zero block only
    an[IllegalArgumentException] should be thrownBy
      Archive.tarList(tar.take(100)) // not block-aligned
  }

  "zipProbe" should "emit one row per member across payloads" in {
    val s = spark
    import s.implicits._
    val mm = Seq(
      (1L, zipOf("", ("a", "aa", true))),
      (2L, zipOf("", ("b", "bb", true), ("c", "cc", false))))
      .toDF("id", "payload")
    Archive.zipProbe(mm).select("id", "member", "name")
      .as[(Long, Long, String)].collect().sortBy(r => (r._1, r._2))
      .toSeq shouldBe Seq((1L, 0L, "a"), (2L, 0L, "b"), (2L, 1L, "c"))
  }
}
