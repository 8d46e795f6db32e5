package graft.tsne

/** Z-order (Morton) machinery for the projection kNN (ref: `ZOrder.scala:25-42`).
  *
  * The reference implements z-order as a *comparator* (XOR of raw double bits
  * + most-significant-bit test) and uses it inside a parallelism-1 sort
  * (`TsneHelpers.scala:140-144`). Spark sorts by *keys*, not comparators, and
  * a materialized key lets the sort be a fully distributed range-partitioned
  * sort — so the rebuild materializes the Morton code as a sortable
  * `Array[Byte]` (`BinaryType` sorts lexicographically unsigned, exactly the
  * bit-interleaving order).
  */
object ZOrderKey {

  /** Order-preserving unsigned encoding of an IEEE-754 double: flips the
    * sign bit for non-negatives and all bits for negatives, so unsigned
    * byte-order == numeric order. (The reference's comparator uses raw bits,
    * which mis-orders negatives — `ZOrder.scala:31` is only valid for
    * non-negative input; this encoding is correct for all doubles and
    * coincides with the reference on non-negative data.) */
  def sortableBits(d: Double): Long = {
    val bits = java.lang.Double.doubleToRawLongBits(d)
    if (bits >= 0L) bits ^ Long.MinValue else ~bits
  }

  /** Interleave the 64 encoded bits of each dimension, MSB-first, into a
    * `dims * 8`-byte key. Lexicographic order of the result is Morton order. */
  def morton(vec: Array[Double]): Array[Byte] = {
    val dims = vec.length
    val longs = new Array[Long](dims)
    var d = 0
    while (d < dims) { longs(d) = sortableBits(vec(d)); d += 1 }
    val out = new Array[Byte](dims * 8)
    var outBit = 0
    var bit = 63
    while (bit >= 0) {
      d = 0
      while (d < dims) {
        if (((longs(d) >>> bit) & 1L) != 0L)
          out(outBit >> 3) = (out(outBit >> 3) | (0x80 >>> (outBit & 7))).toByte
        outBit += 1
        d += 1
      }
      bit -= 1
    }
    out
  }

  /** Reference-parity comparator (`ZOrder.scala:25-42`): true iff `a` is
    * greater than `b` in Morton order, by locating the dimension holding the
    * most significant differing bit. Kept for tests that cross-check the
    * materialized key against the comparator semantics. */
  def compareByZorder(a: Array[Double], b: Array[Double]): Boolean = {
    require(a.length == b.length, "Both vectors must be of same length")
    var j = 0
    var x = 0L
    var i = 0
    while (i < a.length) {
      val y = sortableBits(a(i)) ^ sortableBits(b(i))
      if (lessMsb(x, y)) { j = i; x = y }
      i += 1
    }
    a(j) > b(j)
  }

  private def lessMsb(x: Long, y: Long): Boolean =
    java.lang.Long.compareUnsigned(x, y) < 0 &&
      java.lang.Long.compareUnsigned(x, x ^ y) < 0
}
