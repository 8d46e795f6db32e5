package graft.pipeline

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.tsne.SparkTestBase

/** DoReMi-lite multiplicative weights: bit-parity with a plain-Scala
  * BigInt replay of the exact integer recurrence, the fixed points
  * (uniform losses, single domain), loss-monotonicity, partitioning
  * invariance, and the input bounds. */
class MixtureSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private def solve(losses: Seq[(String, Long)], rounds: Int = 5)
      : Map[String, Long] = {
    val s = spark
    import s.implicits._
    Mixture.mixtureWeights(losses.toDF("domain", "loss_u"), rounds)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
  }

  /** The operator's exact recurrence in plain BigInt (truncating div,
    * like Spark's `div`). */
  private def ref(losses: Seq[(String, Long)], rounds: Int,
                  scale: Long = 1000000L): Map[String, Long] = {
    var w = losses.map { case (d, l) => (d, BigInt(l), BigInt(scale / losses.size)) }
    for (_ <- 1 to rounds) {
      val sw = w.map(_._3).sum
      val swl = w.map(x => x._2 * x._3).sum
      val mean = swl / sw
      val up = w.map { case (d, l, wi) =>
        val mult = (BigInt(scale) + (l - mean) / 4)
          .max(BigInt(1)).min(BigInt(2 * scale))
        (d, l, wi * mult / scale)
      }
      val tu = up.map(_._3).sum.max(BigInt(1))
      w = up.map { case (d, l, u) => (d, l, u * scale / tu) }
    }
    w.map { case (d, _, wi) => d -> wi.toLong }.toMap
  }

  "mixtureWeights" should "match the BigInt replay exactly" in {
    val losses = Seq(("a", 100L), ("b", 4000L), ("c", 2500L), ("d", 90L))
    solve(losses) shouldBe ref(losses, 5)
    solve(losses, rounds = 1) shouldBe ref(losses, 1)
  }

  it should "stay uniform on uniform losses and give one domain everything" in {
    solve(Seq(("a", 7L), ("b", 7L), ("c", 7L))).values.toSet shouldBe
      Set(1000000L / 3)
    solve(Seq(("only", 42L))) shouldBe Map("only" -> 1000000L)
  }

  it should "weight harder domains at least as much as easier ones" in {
    val losses = Seq(("lo", 10L), ("mid", 500L), ("hi", 9000L))
    val w = solve(losses)
    w("hi") should be >= w("mid")
    w("mid") should be >= w("lo")
    w("hi") should be > w("lo") // strict somewhere: the update moved mass
  }

  it should "be invariant to input partitioning" in {
    val s = spark
    import s.implicits._
    val losses = (0 until 16).map(i => (s"d$i", (i * i * 37 + 5).toLong))
    val a = Mixture.mixtureWeights(losses.toDF("domain", "loss_u")
      .repartition(7)).orderBy("domain").collect().toSeq
    val b = Mixture.mixtureWeights(losses.toDF("domain", "loss_u")
      .repartition(1)).orderBy("domain").collect().toSeq
    a shouldBe b
  }

  it should "reject negative and overflow-risk losses loudly" in {
    an[IllegalArgumentException] should be thrownBy
      solve(Seq(("a", -1L), ("b", 5L)))
    an[IllegalArgumentException] should be thrownBy
      solve(Seq(("a", Long.MaxValue / 1000L)))
  }

  it should "reject more domains than scale units (all-zero initial weights)" in {
    val s = spark
    import s.implicits._
    // scale/nD would truncate to 0 per domain → silent null weights;
    // the bounds check refuses instead
    an[IllegalArgumentException] should be thrownBy
      Mixture.mixtureWeights(
        (0 until 5).map(i => (s"d$i", 10L)).toDF("domain", "loss_u"),
        scale = 4L)
  }
}
