package graft.pipeline

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.tsne.SparkTestBase

/** [[Dedup.contentDefinedChunks]] — the CDC claims that matter: chunks
  * tile the document exactly, boundaries re-align after an insertion
  * (the property fixed-size blocking lacks), shared passages produce
  * identical chunk hashes across documents, and the whole thing matches
  * a plain-Scala reference cut rule. */
class CdcChunkSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private val W = 16
  private val Bits = 5

  private def chunksOf(texts: (Long, String)*): Map[Long, Seq[(Long, Long, Long, Long)]] = {
    val s = spark
    import s.implicits._
    Dedup.contentDefinedChunks(texts.toDF("doc_id", "text"), W, Bits)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
  }

  /** Reference implementation of the same cut rule. */
  private def bruteChunks(text: String): Seq[String] = {
    val mask = (1L << Bits) - 1
    val cuts = (1 to text.length - W).filter { p0 =>
      (Hashing.hash60(text.substring(p0 - 1, p0 - 1 + W)) & mask) == 0L
    }.map(_ + W - 1).filter(_ < text.length)
    val bounds = 0 +: cuts :+ text.length
    bounds.sliding(2).collect {
      case Seq(a, b) if b > a => text.substring(a, b)
    }.toSeq
  }

  private def lorem(seed: Int, n: Int): String = {
    val rnd = new scala.util.Random(seed)
    val words = Seq("alpha", "bravo", "charlie", "delta", "echo", "fox",
      "golf", "hotel", "india", "julia", "kilo", "lima")
    Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" ")
  }

  it should "tile each document exactly and match the reference cut rule" in {
    val texts = Seq(1L -> lorem(1, 120), 2L -> lorem(2, 40), 3L -> "short",
      4L -> "")
    val got = chunksOf(texts: _*)
    texts.foreach { case (id, t) =>
      val expect = bruteChunks(t)
      val g = got.getOrElse(id, Seq.empty)
      g.map(_._3).sum shouldBe t.length.toLong // exact tiling
      g.map(c => (c._2, c._3)) shouldBe
        expect.scanLeft(1L)((acc, c) => acc + c.length).zip(expect.map(_.length.toLong))
      g.map(_._4) shouldBe expect.map(Hashing.hash60)
      g.map(_._1) shouldBe g.indices.map(_.toLong) // dense chunk idx
    }
    got.contains(4L) shouldBe false // empty doc emits nothing
  }

  it should "re-align boundaries after a prefix insertion (the anti-fixed-size property)" in {
    val base = lorem(7, 200)
    val shifted = "INSERTED PREAMBLE >> " + base
    val got = chunksOf(1L -> base, 2L -> shifted)
    val h1 = got(1L).map(_._4)
    val h2 = got(2L).map(_._4)
    // every chunk of the original except (at most) its first reappears
    // verbatim in the shifted document, at different offsets
    h1.drop(1).forall(h2.contains) shouldBe true
    // while a 21-char shift breaks EVERY fixed-size-64 block alignment:
    val fixed = (xs: String) => xs.grouped(64).map(Hashing.hash60).toSeq
    fixed(base).intersect(fixed(shifted)) shouldBe empty
  }

  it should "give shared passages identical chunk hashes across documents" in {
    val shared = lorem(11, 150)
    val a = lorem(12, 60) + " " + shared
    val b = shared + " " + lorem(13, 60)
    val got = chunksOf(1L -> a, 2L -> b)
    val common = got(1L).map(_._4).toSet intersect got(2L).map(_._4).toSet
    common.size should be >= 2 // interior chunks of the shared run align
  }

  it should "be invariant to partitioning and produce ~2^bits expected chunk length" in {
    val s = spark
    import s.implicits._
    val texts = (0 until 50).map(i => (i.toLong, lorem(100 + i, 150)))
    val one = Dedup.contentDefinedChunks(texts.toDF("doc_id", "text"), W, Bits)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    Dedup.contentDefinedChunks(texts.toDF("doc_id", "text").repartition(7), W, Bits)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet shouldBe one
    // mean chunk length within a loose factor of the 2^5 = 32 target
    val lens = Dedup.contentDefinedChunks(texts.toDF("doc_id", "text"), W, Bits)
      .collect().map(_.getLong(3))
    val mean = lens.sum.toDouble / lens.length
    mean should be > 16.0
    mean should be < 128.0
  }
}
