package graft.expressions

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.tsne.SparkTestBase

/** The native JL sketch must agree bit-for-bit with the by-hand matrix
  * product in BOTH eval modes, honor the NULL contract, and actually
  * compile under CODEGEN_ONLY (the unrolled formulation it replaces
  * compiled-failed past ~2k terms and fell back silently). */
class RandomProjectSketchSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private val dim = 64
  private val m = 32
  private val seed = 42L

  private def sketchCol(c: Column): Column = {
    import org.apache.spark.sql.{graftglue => glue}
    glue.column(RandomProjectSketch(glue.expression(c), dim, m, seed))
  }

  private def withFactoryMode[A](mode: String)(body: => A): A = {
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, mode)
    try body finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  private lazy val vecs = {
    val rnd = new scala.util.Random(17)
    (0 until 40).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian())))
  }

  private def byHand(v: Array[Double]): Array[Double] = {
    val out = new Array[Double](m)
    for (i <- 0 until dim; j <- 0 until m)
      out(j) += v(i) * RpSigns.sign(seed, i.toLong * m + j)
    out
  }

  "rp_sketch" should "match the by-hand matrix product in codegen AND interpreted mode" in {
    val s = spark
    import s.implicits._
    val df = vecs.toDF("id", "vec")
    for (mode <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) withFactoryMode(mode) {
      val got = df.select(col("id"), sketchCol(col("vec")).as("sk"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
        .toMap
      val expect = vecs.toMap
      got.keySet shouldBe expect.keySet
      got.foreach { case (id, sk) =>
        sk.toSeq shouldBe byHand(expect(id)).toSeq // bit-for-bit
      }
    }
  }

  it should "yield NULL on null input, wrong length, or a null element" in {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Some(Array.fill(dim)(1.0))),
      (2L, None),
      (3L, Some(Array(1.0, 2.0))) // wrong length
    ).toDF("id", "vec")
    for (mode <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) withFactoryMode(mode) {
      val rows = df.select(col("id"), sketchCol(col("vec")).as("sk"))
        .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
      rows shouldBe Map(1L -> false, 2L -> true, 3L -> true)
      // null ELEMENT (array type with containsNull=true)
      val dfe = Seq(Tuple1(Array[java.lang.Double](1.0, null) ++
        Array.fill[java.lang.Double](dim - 2)(0.0))).toDF("vec")
      dfe.select(sketchCol(col("vec")).as("sk"))
        .collect().head.isNullAt(0) shouldBe true
    }
  }
}
