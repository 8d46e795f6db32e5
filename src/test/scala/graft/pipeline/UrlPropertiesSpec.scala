package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.tsne.SparkTestBase

import scala.util.Random

/** Property-style tests for the URL canonicalizer — invariants for ANY
  * input, complementing UrlOpsSpec's example-based rules. Seeded
  * explicit sampling like LayoutPropertiesSpec (no scalatest↔scalacheck
  * bridge in the offline cache).
  *
  * The two load-bearing properties:
  *   - percent-decoding matches a plain-Scala single-pass reference on
  *     adversarial escape soup (every hex case, truncated escapes,
  *     doubled percents, `%25`-encoded escapes);
  *   - canonicalization is IDEMPOTENT — canonical forms are fixed
  *     points, which is what lets a pipeline re-canonicalize freely
  *     (e.g. on re-crawl) without keys drifting.
  */
class UrlPropertiesSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private val rnd = new Random(20260815L)

  /** Plain-Scala reference of the single-pass unreserved decode rule. */
  private def refDecode(s: String): String = {
    val out = new StringBuilder
    var i = 0
    def hex(c: Char): Int = Character.digit(c, 16)
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          hex(s.charAt(i + 1)) >= 0 && hex(s.charAt(i + 2)) >= 0) {
        val code = hex(s.charAt(i + 1)) * 16 + hex(s.charAt(i + 2))
        val unreserved = (code >= 48 && code <= 57) ||
          (code >= 65 && code <= 90) || (code >= 97 && code <= 122) ||
          code == 45 || code == 46 || code == 95 || code == 126
        if (unreserved) { out.append(code.toChar); i += 3 }
        else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  private def escapeSoup(n: Int): String = {
    val pieces = Seq("%41", "%7e", "%2F", "%3f", "%25", "%2541", "%",
      "%4", "%G1", "%4G", "a", "Zz", "9", "-", ".", "_", "~", "%%41",
      "%61%62", "x%0Ay")
    (0 until n).map(_ => pieces(rnd.nextInt(pieces.length))).mkString
  }

  "percentDecodeUnreserved" should "match the plain-Scala reference on escape soup" in {
    val s = spark
    import s.implicits._
    val inputs = (0 until 60).map(i => escapeSoup(1 + rnd.nextInt(12))) ++
      Seq("", "%", "%%", "%41", "%2541", "plain")
    val got = inputs.toDF("x")
      .select(UrlOps.percentDecodeUnreserved(col("x"))).as[String]
      .collect().toSeq
    got should contain theSameElementsInOrderAs inputs.map(refDecode)
  }

  "canonicalizeUrl" should "be idempotent on randomized URLs (canonical forms are fixed points)" in {
    val s = spark
    import s.implicits._
    val schemes = Seq("http", "HTTP", "https", "HTTPS", "ftp")
    val hosts = Seq("Ex.COM", "a.b.example.co.uk", "X.Y", "localhost",
      "w3.site7.net")
    val ports = Seq("", ":80", ":443", ":8080")
    val paths = Seq("", "/", "/a", "/p%41th/7", "/a%2Fb", "/%7Euser/x")
    val queries = Seq("", "?b=2&a=1", "?utm_source=s&z=9",
      "?z=%42&gclid=g", "?a=1&&b=2")
    val frags = Seq("", "#f", "#sec-2")
    val urls = (0 until 80).map { _ =>
      schemes(rnd.nextInt(schemes.length)) + "://" +
        (if (rnd.nextBoolean()) "u:p@" else "") +
        hosts(rnd.nextInt(hosts.length)) + ports(rnd.nextInt(ports.length)) +
        paths(rnd.nextInt(paths.length)) + queries(rnd.nextInt(queries.length)) +
        frags(rnd.nextInt(frags.length))
    } ++ Seq("relative/path?b=1#f", "not a url", "")
    val once = urls.toDF("u")
      .select(UrlOps.canonicalizeUrl(col("u")).as("c")).as[String]
      .collect().toSeq
    val twice = once.toDF("u")
      .select(UrlOps.canonicalizeUrl(col("u")).as("c")).as[String]
      .collect().toSeq
    twice should contain theSameElementsInOrderAs once
  }

  it should "produce one key for every cosmetic-variant family" in {
    val s = spark
    import s.implicits._
    // each family: the same resource spelled 4 cosmetically-different
    // ways — canonicalization must collapse each family to ONE key and
    // keep different families apart
    val families = Seq(
      Seq("http://Ex.COM:80/a?b=2&a=1#f", "HTTP://ex.com/a?a=1&b=2",
        "http://u:p@ex.com/a?a=1&utm_source=x&b=2",
        "http://ex.com/a?b=2&a=1&gclid=g"),
      Seq("https://h.net:443/p%41th", "HTTPS://H.NET/pAth#x",
        "https://h.net/pAth?utm_medium=m", "https://u@h.net/p%61th" // %61='a'? no — 'a' lower
      ).map(_.replace("%61th", "%41th")),
      Seq("http://q.org", "http://q.org/#f", "http://Q.ORG:80",
        "http://q.org/?utm_source=s"))
    families.zipWithIndex.foreach { case (fam, i) =>
      val keys = fam.toDF("u")
        .select(UrlOps.canonicalizeUrl(col("u"))).as[String]
        .collect().toSet
      withClue(s"family $i: $keys") { keys.size shouldBe 1 }
    }
    val reps = families.map(f => f.head).toDF("u")
      .select(UrlOps.canonicalizeUrl(col("u"))).as[String].collect().toSet
    reps.size shouldBe families.size
  }
}
