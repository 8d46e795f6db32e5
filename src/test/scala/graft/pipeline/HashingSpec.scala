package graft.pipeline

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.tsne.SparkTestBase

/** The shared 60-bit md5 hash — three spellings, one value: the numeric
  * JVM fast path, the hex-string reference spelling (what DuckDB
  * computes), and the Catalyst Column form. Everything downstream
  * (MinHash, SimHash, fingerprints, the stub decoder, CDC cuts) rides on
  * this equality. */
class HashingSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private def hexReference(bytes: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val hex = d.take(8).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  it should "agree with the hex-string spelling on varied inputs" in {
    val rnd = new scala.util.Random(41)
    val cases = Seq("", "a", "hello world", "é世界") ++
      (0 until 200).map(_ => rnd.nextString(rnd.nextInt(50)))
    cases.foreach { s =>
      val b = s.getBytes("UTF-8")
      Hashing.hash60(b) shouldBe hexReference(b)
      Hashing.hash60(s) shouldBe hexReference(b)
      Hashing.hash60(s) should be >= 0L
    }
    // and raw non-UTF8 byte payloads
    (0 until 50).foreach { _ =>
      val b = Array.fill(rnd.nextInt(100))(rnd.nextInt(256).toByte)
      Hashing.hash60(b) shouldBe hexReference(b)
    }
  }

  it should "agree with the Catalyst Column form" in {
    val s = spark
    import s.implicits._
    val vals = Seq("", "x", "the quick brown fox", "123#yes")
    val got = vals.toDF("v")
      .select(col("v"), Hashing.hash60(col("v")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    vals.foreach(v => got(v) shouldBe Hashing.hash60(v))
  }

  it should "agree between md5Hex and the SQL md5 spelling" in {
    val s = spark
    import s.implicits._
    val vals = Seq("", "x", "hello world", "é世界", "payload#3")
    val got = vals.toDF("v")
      .select(col("v"), md5(encode(col("v"), "UTF-8")).as("h"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    vals.foreach(v => got(v) shouldBe Hashing.md5Hex(v.getBytes("UTF-8")))
    // the chained stub scheme: hash60(md5Hex(payload) ‖ '#' ‖ k) must
    // equal the SQL replay hash60(md5(payload) || '#' || k)
    val sqlStub = vals.toDF("v")
      .select(col("v"),
        Hashing.hash60(concat(md5(encode(col("v"), "UTF-8")), lit("#7")))
          .as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    vals.foreach { v =>
      sqlStub(v) shouldBe
        Hashing.hash60(Hashing.md5Hex(v.getBytes("UTF-8")) + "#7")
    }
  }

  it should "be thread-safe under parallel use (per-thread digest)" in {
    val inputs = (0 until 1000).map(i => s"input-$i")
    val expect = inputs.map(s => hexReference(s.getBytes("UTF-8")))
    val got = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val threads = (0 until 8).map { t =>
      new Thread(() =>
        (t until inputs.length by 8).foreach(i =>
          got.put(i, Hashing.hash60(inputs(i)))))
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    inputs.indices.foreach(i => got.get(i) shouldBe expect(i))
  }
}
