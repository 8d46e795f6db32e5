package graft.pipeline

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.tsne.SparkTestBase

/** Unicode-script profile: per-block counts on hand strings, the
  * fixed-order dominant argmax, and the all-zero case. */
class ScriptProfileSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private def profile(texts: String*) = {
    val s = spark
    import s.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    TextOps.scriptProfile(df).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long, String)].collect().toSeq
  }

  "scriptProfile" should "count each script block and pick the dominant one" in {
    profile(
      "hello world",          // latin only
      "привет hi",            // cyrillic 6, latin 2
      "你好世界",              // cjk only
      "γειά σου",             // greek
      "مرحبا") shouldBe Seq(
      (0L, 10L, 0L, 0L, 0L, 0L, "latin"),
      (1L, 2L, 6L, 0L, 0L, 0L, "cyrillic"),
      (2L, 0L, 0L, 0L, 4L, 0L, "cjk"),
      (3L, 0L, 0L, 7L, 0L, 0L, "greek"),
      (4L, 0L, 0L, 0L, 0L, 5L, "arabic"))
  }

  it should "break count ties by the fixed script order and report none on all-zero" in {
    profile(
      "ab привет",   // latin 2, cyrillic 6 → cyrillic
      "ab пр",       // 2 vs 2 tie → latin (listed first)
      "123 !? .") shouldBe Seq(
      (0L, 2L, 6L, 0L, 0L, 0L, "cyrillic"),
      (1L, 2L, 2L, 0L, 0L, 0L, "latin"),
      (2L, 0L, 0L, 0L, 0L, 0L, "none"))
  }
}
