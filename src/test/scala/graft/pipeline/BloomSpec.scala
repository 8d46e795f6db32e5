package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.tsne.SparkTestBase

import scala.util.Random

/** The driver-built / Column-probed Bloom filter: the JVM insert path and
  * the codegen'd probe path must compute identical probe slots (any drift
  * is a false NEGATIVE — the one failure mode a Bloom prefilter must never
  * have), and the end-to-end decontamination prefilter must reproduce the
  * exact operator bit-for-bit. */
class BloomSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private lazy val s = spark

  behavior of "Bloom build/probe parity"

  it should "never false-negative on inserted 60-bit hashes" in {
    import s.implicits._
    val rnd = new Random(7L)
    val keys = Array.fill(5000)(rnd.nextLong() & ((1L << 60) - 1))
    val bits = Bloom.build(keys, bitsPerKey = 16, k = 4)
    val missed = keys.toSeq.toDF("h")
      .where(!Bloom.mightContain(bits, col("h")))
      .count()
    missed shouldBe 0L
  }

  it should "hold the designed false-positive ballpark on non-members" in {
    import s.implicits._
    val rnd = new Random(8L)
    val keys = Array.fill(5000)(rnd.nextLong() & ((1L << 60) - 1))
    val member = keys.toSet
    val bits = Bloom.build(keys, bitsPerKey = 16, k = 4)
    val probes = Iterator.continually(rnd.nextLong() & ((1L << 60) - 1))
      .filterNot(member).take(20000).toSeq
    val fp = probes.toDF("h")
      .where(Bloom.mightContain(bits, col("h")))
      .count()
    // design point ~0.24%; accept < 1% (power-of-two rounding only helps)
    fp.toDouble / probes.size should be < 0.01
  }

  it should "probe NULL hashes as NULL (filtered, not matched)" in {
    import s.implicits._
    val bits = Bloom.build(Array(1L, 2L, 3L))
    val df = Seq(Some(1L), None).toDF("h")
    df.where(Bloom.mightContain(bits, col("h"))).count() shouldBe 1L
  }

  behavior of "Bloom.mix64 JVM/Column parity"

  it should "compute identical mixed values in both forms" in {
    import s.implicits._
    val rnd = new Random(11L)
    // raw ids, NOT hashes: small sequential + random longs (incl. negatives)
    val ids = (0L until 500L) ++ Array.fill(500)(rnd.nextLong())
    val got = ids.toDF("d").select(Bloom.mix64(col("d"))).as[Long].collect()
    got.toSeq shouldBe ids.map(Bloom.mix64)
  }

  it should "never false-negative when keys are mixed raw ids" in {
    import s.implicits._
    val ids = (0L until 4000L).toArray // worst case: dense sequential ids
    val bits = Bloom.build(ids.map(Bloom.mix64))
    val missed = ids.toSeq.toDF("d")
      .where(!Bloom.mightContain(bits, Bloom.mix64(col("d"))))
      .count()
    missed shouldBe 0L
  }

  behavior of "Dedup.minHashNearDups with the candidate Bloom prefilter"

  it should "equal the unfiltered exact verify pair-for-pair" in {
    import s.implicits._
    val rnd = new Random(12L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    def text(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = (0L until 60L).map(i => (i, text(20)))
    // plant near-dups: copies with one token appended
    val dups = (0L until 12L).map(i => (100L + i, base(i.toInt)._2 + " eta"))
    val docs = (base ++ dups).toDF("doc_id", "text")
    val got = Dedup.minHashNearDups(docs, n = 3, theta = 0.5)
      .orderBy("i", "j").collect()
    // ground truth: the full (unbanded, unfiltered) exact jaccard join
    val want = Dedup.jaccardPairs(docs, n = 3, theta = 0.5)
      .orderBy("i", "j").collect()
    got shouldBe want
  }

  behavior of "TextOps.decontaminateBloom"

  it should "equal the exact decontaminate operator row-for-row" in {
    import s.implicits._
    val rnd = new Random(9L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val docs = (0L until 120L).map { i =>
      (i, Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val corpus = docs.where(col("doc_id") % 5 =!= 0)
    val bench = docs.where(col("doc_id") % 5 === 0)
    val exact = TextOps.decontaminate(corpus, bench).orderBy("doc_id").collect()
    val bloomed = TextOps.decontaminateBloom(corpus, bench)
      .orderBy("doc_id").collect()
    bloomed shouldBe exact
  }
}
