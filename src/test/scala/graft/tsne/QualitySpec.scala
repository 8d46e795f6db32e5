package graft.tsne

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Pins the embedding-quality metric and the `q_tsne_quality` gate
  * (VERDICT r3 next-round #1): recall is 1 on a geometry-preserving
  * embedding, collapses to ~chance on a structure-destroying one, and the
  * shipped CORRECTNESS row holds its floor on the sf0.001 fixture. */
class QualitySpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private val k = 5

  private def cloud(seed: Int, n: Int, dim: Int): Seq[Point] = {
    val rng = new scala.util.Random(seed)
    (0 until n).map(i => Point(i.toLong, Array.fill(dim)(rng.nextGaussian())))
  }

  "neighborRecall" should "be 1.0 when the embedding preserves the geometry" in {
    val s = spark
    import s.implicits._
    val pts = s.createDataset(cloud(1, 120, 2))
    val truth = Knn.bruteForce(pts, k, "sqeuclidean").toDF()
    val row = Quality.neighborRecall(truth, pts, k).head()
    row.getLong(row.fieldIndex("n_points")) shouldBe 120L
    row.getLong(row.fieldIndex("hits")) shouldBe 120L * k
  }

  it should "collapse toward chance when the embedding shuffles the points" in {
    val s = spark
    import s.implicits._
    val pts = s.createDataset(cloud(2, 120, 8))
    val truth = Knn.bruteForce(pts, k, "sqeuclidean").toDF()
    // unrelated random 2-D positions: neighborhoods are destroyed
    val shuffled = s.createDataset(cloud(3, 120, 2))
    val row = Quality.neighborRecall(truth, shuffled, k).head()
    val recall = row.getLong(row.fieldIndex("hits")).toDouble / (120.0 * k)
    // chance level is k/(n-1) ≈ 0.042; allow generous slack
    recall should be < 0.15
  }

  "q_tsne_quality" should "hold its recall floor on the sf0.001 fixture" in {
    val row = graft.SparkEntry.queries("q_tsne_quality")(
      spark, "/root/testdata/sf0.001").head()
    row.getLong(row.fieldIndex("n_points")) shouldBe 500L
    row.getLong(row.fieldIndex("recall_ok")) shouldBe 1L
  }
}
