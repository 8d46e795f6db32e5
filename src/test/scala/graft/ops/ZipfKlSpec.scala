package graft.ops

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions.col

import graft.pipeline.{Hashing, TextOps}
import graft.tsne.SparkTestBase

/** [[Zipf.zipfFit]] and [[TextOps.sourceKl]] — corpus-distribution
  * diagnostics. The claims under test: bit-parity with plain-Scala
  * references of the same quantized math, partitioning invariance (all
  * cross-row sums are integer), and a sanity law (a perfect power-law
  * corpus recovers its exponent). */
class ZipfKlSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private def mkDocs(rows: Seq[(Long, String, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  private def toks(t: String): Seq[String] =
    t.split("\\s+").filter(_.nonEmpty).toSeq

  "Zipf.zipfFit" should "match a plain-Scala reference of the quantized OLS bit-for-bit" in {
    val rnd = new scala.util.Random(3)
    val vocab = ('a' to 'p').map(_.toString)
    val rows = (0L until 30L).map { i =>
      (i, Seq.fill(20)(vocab(rnd.nextInt(vocab.size))).mkString(" "), "s")
    }
    val df = mkDocs(rows)
    val got = Zipf.zipfFit(df).collect()(0)

    val counts = rows.flatMap(r => toks(r._2))
      .groupMapReduce(identity)(_ => 1L)(_ + _)
    val ranked = counts.toSeq
      .sortBy { case (w, c) => (-c, Hashing.hash60(w + "#zipf"), w) }
      .zipWithIndex.map { case ((w, c), i) => (i + 1L, c) }
    val pts = ranked.map { case (rk, c) =>
      (math.floor(math.log(rk.toDouble) * 1e6 + 0.5).toLong,
        math.floor(math.log(c.toDouble) * 1e6 + 0.5).toLong)
    }
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum.toDouble
    val sy = pts.map(_._2).sum.toDouble
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    got.getLong(0) shouldBe counts.size.toLong
    got.getLong(1) shouldBe counts.values.sum
    got.getDouble(2) shouldBe slope
    got.getDouble(3) shouldBe (sy - slope * sx) / n
  }

  it should "recover the exponent of a perfect power law and be partition-invariant" in {
    // freq(rank r) = round(1000 · r^-1): ties are absent, so rank order
    // is by count alone and the fitted slope must sit near −1
    val words = (1 to 40).flatMap { r =>
      val c = math.max(1, math.round(1000.0 / r).toInt)
      Seq.fill(c)(f"w$r%02d")
    }
    val df = mkDocs(Seq((0L, words.mkString(" "), "s")))
    val a = Zipf.zipfFit(df).collect()(0)
    (a.getDouble(2) / 1.0) shouldBe -1.0 +- 0.05
    val b = Zipf.zipfFit(df.repartition(11)).collect()(0)
    b shouldBe a
  }

  private def klOf(rows: Seq[(Long, String, String)]): Map[String, (Long, Long, Long)] =
    TextOps.sourceKl(mkDocs(rows)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

  private def refKl(rows: Seq[(Long, String, String)]): Map[String, (Long, Long, Long)] = {
    val st = rows.flatMap { case (_, t, s) => toks(t).map(s -> _) }
      .groupMapReduce(identity)(_ => 1L)(_ + _)
    val ts = st.groupMapReduce(_._1._1)(_._2)(_ + _)
    val ct = st.groupMapReduce(_._1._2)(_._2)(_ + _)
    val tot = ct.values.sum
    st.groupBy(_._1._1).map { case (s, m) =>
      val terms = m.map { case ((_, w), c) =>
        val term = (c.toDouble / ts(s).toDouble) *
          math.log((c.toDouble * tot.toDouble) /
            (ts(s).toDouble * ct(w).toDouble))
        math.floor(term * 1e9 + 0.5).toLong
      }
      s -> (m.size.toLong, ts(s), terms.sum)
    }
  }

  "TextOps.sourceKl" should "match a plain-Scala nano-quantized reference bit-for-bit" in {
    val rnd = new scala.util.Random(9)
    val vocab = Seq("x", "y", "z", "q", "r")
    val rows = (0L until 24L).map { i =>
      (i, Seq.fill(15)(vocab(rnd.nextInt(5))).mkString(" "), s"s${i % 3}")
    }
    klOf(rows) shouldBe refKl(rows)
  }

  it should "be exactly zero for strata matching the global mixture, positive otherwise" in {
    // both strata 5x 3y 2z → each equals the global mixture → every KL
    // term is ln(1) = 0, so the quantized sum is exactly 0
    val mix = Seq.fill(5)("x") ++ Seq.fill(3)("y") ++ Seq.fill(2)("z")
    val same = (0L until 8L).map(i => (i, mix.mkString(" "), s"s${i % 2}"))
    klOf(same).values.map(_._3).toSet shouldBe Set(0L)
    // opposite mixes: both strata must diverge from the blended global
    val flip = Seq.fill(2)("x") ++ Seq.fill(3)("y") ++ Seq.fill(5)("z")
    val diff = (0L until 8L).map { i =>
      val m = if (i % 2 == 0) mix else flip
      (i, m.mkString(" "), s"s${i % 2}")
    }
    klOf(diff).values.foreach(_._3 should be > 0L)
  }
}
