package graft.pipeline

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.tsne.{Point, SparkTestBase}

/** Random-projection ANN: deterministic matrix, exact rescoring, and the
  * clustered-corpus recall contract (fixed shortlist, recall holds as N
  * grows — the regime real embedding tables live in; the isotropic decay
  * mode is documented in the scaladoc and measured in SCALE.md). */
class AnnRpSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private val dim = 16

  private def clustered(n: Int, seed: Int): Seq[Point] = {
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(math.max(4, n / 50), dim)(rnd.nextGaussian())
    (0 until n).map { i =>
      val c = centers(i % centers.length)
      Point(i.toLong, Array.tabulate(dim)(d => c(d) + rnd.nextGaussian() * 0.05))
    }
  }

  private def recall(n: Int): Double = {
    val s = spark
    import s.implicits._
    val k = 5
    val corpus = s.createDataset(clustered(n, seed = 7))
    val queries = corpus.filter(col("id") < 30)
    val exact = Ann.bruteTopK(corpus, queries, k)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.rpTopK(corpus, queries, k,
      m = 8, shortlist = 40, dim = dim, seed = 11L)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (approx & exact).size.toDouble / exact.size
  }

  "rpSigns" should "be a deterministic ±1 matrix, roughly sign-balanced" in {
    val a = Ann.rpSigns(32, 16, seed = 3L)
    val b = Ann.rpSigns(32, 16, seed = 3L)
    a.flatten.toSeq shouldBe b.flatten.toSeq
    a.flatten.foreach(v => math.abs(v) shouldBe 1.0)
    val pos = a.flatten.count(_ > 0)
    pos.toDouble / (32 * 16) shouldBe 0.5 +- 0.1
    // a different seed is a different matrix
    Ann.rpSigns(32, 16, seed = 4L).flatten.toSeq should not be a.flatten.toSeq
  }

  "rpTopK" should "hold clustered-corpus recall with a FIXED shortlist as N doubles" in {
    recall(400) should be >= 0.9
    recall(800) should be >= 0.9 // same shortlist=40: cluster size, not N, bounds it
  }

  it should "rescore exactly: every returned sim is the true cosine" in {
    val s = spark
    import s.implicits._
    val pts = clustered(200, seed = 9)
    val corpus = s.createDataset(pts)
    val queries = corpus.filter(col("id") < 10)
    val byId = pts.map(p => p.id -> p.vec).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (k <- a.indices) { d += a(k) * b(k); na += a(k) * a(k); nb += b(k) * b(k) }
      d / math.sqrt(na * nb)
    }
    val rows = Ann.rpTopK(corpus, queries, k = 3,
      m = 8, shortlist = 20, dim = dim, seed = 11L).collect()
    rows should not be empty
    rows.foreach { r =>
      val (i, j, sim) = (r.getAs[Long]("i"), r.getAs[Long]("j"), r.getAs[Double]("sim"))
      sim shouldBe cos(byId(i), byId(j)) +- 1e-9
    }
    // ranks are dense 1..k per query, ordered by descending true sim
    rows.groupBy(_.getAs[Long]("i")).values.foreach { g =>
      g.map(_.getAs[Long]("rn")).sorted shouldBe (1L to g.length.toLong)
      val bySim = g.sortBy(r => (-r.getAs[Double]("sim"), r.getAs[Long]("j")))
      bySim.map(_.getAs[Long]("rn")).toSeq shouldBe (1L to g.length.toLong)
    }
  }
}
