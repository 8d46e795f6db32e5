package graft.pipeline

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.tsne.SparkTestBase

import scala.util.Random

/** [[Clustering.kmeansExact]] — bit-parity against a plain-Scala
  * long-arithmetic Lloyd reference (same grid, same packed argmin, same
  * truncated-integer means, same empty-cluster carry), plus the
  * determinism properties the driver contract depends on. */
class ClusteringSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private def grid(v: Double): Long = math.floor(v * 1e6 + 0.5).toLong

  /** Reference Lloyd in the operator's exact integer spelling. */
  private def brute(rows: Seq[(Long, Array[Double])], k: Int,
                    iters: Int): Map[Long, Long] = {
    val pts = rows.map { case (id, v) => id -> v.map(grid) }.sortBy(_._1)
    var cents: Vector[(Long, Array[Long])] =
      pts.take(k).zipWithIndex.map { case ((_, qv), i) => i.toLong -> qv }.toVector
    def assign(): Map[Long, Long] = pts.map { case (id, qv) =>
      val code = cents.map { case (cl, cv) =>
        var d = 0L; var j = 0
        while (j < qv.length) { val x = qv(j) - cv(j); d += x * x; j += 1 }
        d * (1L << 10) + cl
      }.min
      id -> (code % (1L << 10))
    }.toMap
    var round = 1
    var asg = assign()
    while (round < iters) {
      val byCl = pts.groupBy { case (id, _) => asg(id) }
      cents = cents.map { case (cl, prev) =>
        byCl.get(cl) match {
          case Some(members) =>
            val dim = prev.length
            val means = Array.tabulate(dim) { d =>
              val s = members.map(_._2(d)).sum
              // truncated integer division, the Spark `div` semantics
              s / members.size
            }
            cl -> means
          case None => cl -> prev
        }
      }
      asg = assign()
      round += 1
    }
    asg
  }

  private def run(rows: Seq[(Long, Array[Double])], k: Int, iters: Int,
                  parts: Int = 4): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    val df = rows.toDF("vec_id", "embedding").repartition(parts)
    Clustering.kmeansExact(df, k, iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  "kmeansExact" should "match the integer Lloyd reference on separated gaussian blobs" in {
    val rnd = new Random(11)
    val centers = Seq(Array(1.0, 1.0, 0.0), Array(-1.0, 0.5, 2.0),
      Array(0.0, -2.0, -1.0))
    val rows = (0L until 90L).map { id =>
      val c = centers((id % 3).toInt)
      id -> c.map(_ + rnd.nextGaussian() * 0.05)
    }
    val got = run(rows, k = 3, iters = 3)
    got shouldBe brute(rows, 3, 3)
    // blobs this separated are recovered exactly: each true blob lands in
    // one cluster
    (0 until 3).foreach { b =>
      rows.filter(_._1 % 3 == b).map(r => got(r._1)).distinct.size shouldBe 1
    }
  }

  it should "be invariant to input partitioning" in {
    val rnd = new Random(5)
    val rows = (0L until 50L).map(id => id -> Array.fill(6)(rnd.nextGaussian()))
    run(rows, 4, 3, parts = 1) shouldBe run(rows, 4, 3, parts = 13)
  }

  it should "tie-break equal distances to the lowest cluster id and carry empty clusters" in {
    // two seed points coincide -> identical centroids, ties everywhere;
    // cluster 1 immediately empties and must keep its (carried) centroid
    val rows = Seq(
      0L -> Array(0.0, 0.0),
      1L -> Array(0.0, 0.0),
      2L -> Array(0.1, 0.0),
      3L -> Array(5.0, 5.0))
    val got = run(rows, k = 2, iters = 3)
    got shouldBe brute(rows, 2, 3)
    // round 1: identical centroids, every point tie-breaks to cluster 0;
    // the update pulls centroid 0 toward the far point while EMPTY
    // cluster 1 keeps the carried (0,0) — so the origin points flip to 1
    // and the far point stays 0, which is only reachable if both the
    // lowest-id tie-break and the empty-cluster carry are exact
    got(0L) shouldBe 1L
    got(1L) shouldBe 1L
    got(2L) shouldBe 1L
    got(3L) shouldBe 0L
  }

  it should "match brute force on random data across k and iteration counts" in {
    val rnd = new Random(23)
    val rows = (0L until 80L).map(id => id -> Array.fill(8)(rnd.nextGaussian() * 0.3))
    for ((k, it) <- Seq((2, 1), (5, 2), (8, 4)))
      run(rows, k, it) shouldBe brute(rows, k, it)
  }
}
