package graft.pipeline

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.tsne.SparkTestBase

/** The MP4 container probe against a hand-assembled ISO BMFF file: the
  * sample-table walk (stsc chunk runs × stco offsets × stsz sizes) must
  * return exactly the byte ranges the file was built with — container
  * parsing is offset arithmetic, so the test constructs the ground truth
  * rather than trusting the parser's own reading of it. */
class Mp4ProbeSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  import Multimodal.buildMp4

  behavior of "Multimodal.mp4SampleRanges"

  it should "recover the constructed sample layout across uneven chunks" in {
    val samples = Seq("abc", "defg", "hijkl", "mnopqr", "stuvwxy")
      .map(_.getBytes("ISO-8859-1"))
    val (bytes, expect) = buildMp4(samples, chunks = Seq(2, 3))
    val got = Multimodal.mp4SampleRanges(bytes)
    got.toSeq shouldBe expect
    // the builder's claimed ranges and the parser's agree — AND both
    // really point at the planted bytes (an independent third check, so
    // a shared builder/parser error cannot self-confirm)
    got.zip(samples).foreach { case ((off, len), planted) =>
      bytes.slice(off.toInt, off.toInt + len) shouldBe planted
    }
  }

  it should "honor stsc runs that repeat (one entry covering many chunks)" in {
    val samples = (0 until 6).map(i => Array.fill(i + 1)(i.toByte))
    val (bytes, expect) = buildMp4(samples, chunks = Seq(2, 2, 2))
    // 3 chunks × 2 samples collapse to ONE stsc run — the run-extension
    // rule (entry holds until the next first_chunk) is what's exercised
    Multimodal.mp4SampleRanges(bytes).toSeq shouldBe expect
  }

  it should "fail loudly on a payload without moov or with truncated boxes" in {
    an[IllegalArgumentException] should be thrownBy
      Multimodal.mp4SampleRanges("not an mp4 at all".getBytes)
    val (bytes, _) = buildMp4(Seq("abc".getBytes), Seq(1))
    an[IllegalArgumentException] should be thrownBy
      Multimodal.mp4SampleRanges(bytes.dropRight(6)) // moov truncated
  }

  behavior of "Multimodal.mp4FrameProbe"

  it should "stride sample indices and extract the access-unit bytes through Spark" in {
    val s = spark
    val samplesA = (0 until 8).map(i => s"frameA$i".getBytes("ISO-8859-1"))
    val samplesB = (0 until 3).map(i => s"fB$i".getBytes("ISO-8859-1"))
    val (a, _) = buildMp4(samplesA, Seq(4, 4))
    val (b, _) = buildMp4(samplesB, Seq(3))
    import s.implicits._
    val mm = Seq((1L, a), (2L, b)).toDF("id", "payload")
      .select(col("id"), lit("video").as("modality"), col("payload"),
        struct(org.apache.spark.sql.functions.length(col("payload"))
            .cast("long").as("byte_len"),
          lit(null).cast("string").as("source")).as("meta"))
    val got = Multimodal.mp4FrameProbe(mm, nFrames = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        new String(r.getAs[Array[Byte]](3), "ISO-8859-1")))
      .toSet
    // id 1: total 8 samples, stride floor(8i/4) = 0,2,4,6
    val expectA = Seq(0, 2, 4, 6).zipWithIndex
      .map { case (idx, f) => (1L, f.toLong, idx.toLong, s"frameA$idx") }
    // id 2: total 3 samples, stride floor(3i/4) = 0,0,1,2
    val expectB = Seq(0, 0, 1, 2).zipWithIndex
      .map { case (idx, f) => (2L, f.toLong, idx.toLong, s"fB$idx") }
    got shouldBe (expectA ++ expectB).toSet
  }
}
