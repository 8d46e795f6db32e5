package graft.pipeline

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.tsne.SparkTestBase

/** YAML frontmatter split: fenced block parsing, body cleanliness,
  * absent-fence passthrough, and inline list values. */
class MarkdownSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private def fm(doc: String): (Map[String, String], String) = {
    val s = spark
    import s.implicits._
    Seq(doc).toDF("t").select(Markdown.frontmatter(col("t")).as("f"))
      .select("f.meta", "f.body").as[(Map[String, String], String)]
      .collect().head
  }

  "frontmatter" should "split the fenced block into a map and body" in {
    val (meta, body) =
      fm("---\ntitle: My Doc\nlang: en\ntags: [a, b]\n---\n# Head\nbody")
    meta shouldBe Map("title" -> "My Doc", "lang" -> "en",
      "tags" -> "[a, b]")
    body shouldBe "# Head\nbody"
  }

  it should "pass through documents without a fence" in {
    val (meta, body) = fm("# Just markdown\nno fence here")
    meta shouldBe Map()
    body shouldBe "# Just markdown\nno fence here"
  }

  it should "skip nested/malformed lines instead of misparsing them" in {
    val (meta, _) =
      fm("---\nok: yes\n  nested: skipped\n- listitem\nalso_ok: 1\n---\nb")
    meta shouldBe Map("ok" -> "yes", "also_ok" -> "1")
  }

  it should "not treat a mid-document fence as frontmatter" in {
    val (meta, body) = fm("intro text\n---\nk: v\n---\nrest")
    meta shouldBe Map()
    body should startWith("intro text")
  }

  "inlineList" should "split bracketed lists and wrap scalars" in {
    val s = spark
    import s.implicits._
    Seq("[a, b ,c]", "solo").toDF("v")
      .select(Markdown.inlineList(col("v"))).as[Seq[String]]
      .collect().toSeq shouldBe Seq(Seq("a", "b", "c"), Seq("solo"))
  }
}
