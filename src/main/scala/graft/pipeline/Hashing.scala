package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The pipeline's one shared hash: the first 60 bits of md5, as a
  * non-negative BIGINT. Chosen because every engine can compute it
  * identically — Spark `conv(substr(md5(x), 1, 15), 16, 10)`, DuckDB
  * `('0x' || substr(md5(x), 1, 15))::BIGINT`, plain JVM `MessageDigest` —
  * which is what makes MinHash/SimHash/fingerprint results hash-comparable
  * across the DuckDB oracle boundary. 15 hex chars = 60 bits, so the value
  * is always positive in a signed 64-bit integer. */
object Hashing {

  val Bits = 60

  /** Column form (pure Catalyst, codegen'd — no UDF). */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** JVM form, bit-identical to [[hash60]]. */
  def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.take(8).map(b => f"$b%02x").mkString // 16 hex chars
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** JVM form over raw bytes (for binary/multimodal payloads). */
  def hash60(bytes: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val hex = d.take(8).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }
}
