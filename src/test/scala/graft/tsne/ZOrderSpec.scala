package graft.tsne

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import scala.util.Random

/** Pins the z-order machinery (ref `ZOrder.scala:25-42`): the reference's
  * comparator semantics, and the rebuild's materialized sortable Morton key
  * agreeing with that comparator (the key is what makes the sort
  * distributable — SURVEY.md §2 O8/O9).
  */
class ZOrderSpec extends AnyFlatSpec with Matchers {

  private def keyCompare(a: Array[Byte], b: Array[Byte]): Int = {
    var k = 0
    while (k < a.length && k < b.length) {
      val c = java.lang.Integer.compare(a(k) & 0xff, b(k) & 0xff)
      if (c != 0) return c
      k += 1
    }
    java.lang.Integer.compare(a.length, b.length)
  }

  "compareByZorder" should "order the reference's own example points" in {
    // interleaved-bit order on non-negative integers: (1,1) < (1,2) < (2,1) is
    // decided by the most significant differing bit dimension
    ZOrderKey.compareByZorder(Array(2.0, 2.0), Array(1.0, 1.0)) shouldBe true
    ZOrderKey.compareByZorder(Array(1.0, 1.0), Array(2.0, 2.0)) shouldBe false
    ZOrderKey.compareByZorder(Array(1.0, 1.0), Array(1.0, 1.0)) shouldBe false
  }

  "the materialized Morton key" should "induce exactly the comparator's order" in {
    val rnd = new Random(7)
    // non-negative coordinates: the regime the reference's raw-bits
    // comparator is valid in (ZOrder.scala:31)
    val vecs = Array.fill(300)(Array(rnd.nextDouble() * 100, rnd.nextDouble() * 100))
    val keys = vecs.map(ZOrderKey.morton)
    for (_ <- 0 until 2000) {
      val a = rnd.nextInt(vecs.length); val b = rnd.nextInt(vecs.length)
      val byComparator = ZOrderKey.compareByZorder(vecs(a), vecs(b)) // a > b
      val byKey = keyCompare(keys(a), keys(b)) > 0
      withClue(s"vec $a vs $b: ") { byKey shouldBe byComparator }
    }
  }

  it should "order negative coordinates numerically (rebuild extension)" in {
    // the sortable-bits encoding handles negatives, where the reference's
    // raw-bit comparator would misorder them
    val vecs = Seq(Array(-5.0), Array(-1.0), Array(0.0), Array(1.0), Array(5.0))
    val sorted = vecs.sortWith((a, b) => keyCompare(ZOrderKey.morton(a), ZOrderKey.morton(b)) < 0)
    sorted.map(_(0)) shouldBe Seq(-5.0, -1.0, 0.0, 1.0, 5.0)
  }

  it should "agree with the comparator in higher dimensions" in {
    val rnd = new Random(11)
    val vecs = Array.fill(100)(Array.fill(4)(rnd.nextDouble() * 10))
    val keys = vecs.map(ZOrderKey.morton)
    for (_ <- 0 until 1000) {
      val a = rnd.nextInt(vecs.length); val b = rnd.nextInt(vecs.length)
      (keyCompare(keys(a), keys(b)) > 0) shouldBe ZOrderKey.compareByZorder(vecs(a), vecs(b))
    }
  }
}
