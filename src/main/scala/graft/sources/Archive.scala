package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ZIP central-directory walking (APPNOTE.TXT, the PKWARE spec) — bulk
  * corpus sources arrive as archives (arXiv source dumps, GitHub
  * exports, Project Gutenberg mirrors), and a distributed ingest wants
  * the member LISTING without inflating anything: locate the
  * end-of-central-directory record from the tail, walk the central
  * directory entries, and emit (name, sizes, method, offset) per member
  * — the manifest that lets each member become its own task, the same
  * member-boundary argument as `.warc.gz`.
  *
  * The walk is real spec arithmetic, the [[graft.pipeline.Multimodal]]
  * container discipline applied to archives:
  *   - EOCD (`PK\0x05\0x06`) found by scanning BACKWARD from the end
  *     (the spec allows a trailing comment up to 64 KiB, so the fixed
  *     "22 bytes from the end" shortcut is wrong on real files);
  *   - central directory offset/count read from the EOCD;
  *   - ZIP64 (APPNOTE §4.3.14/.15, §4.5.3): when the classic fields
  *     hold their sentinels (0xFFFF members / 0xFFFFFFFF size-offset —
  *     archives >4 GiB or >65,535 members, which arXiv and GitHub bulk
  *     dumps exceed routinely), the ZIP64 EOCD locator `PK\0x06\0x07`
  *     is read for the 64-bit EOCD record `PK\0x06\0x06`, and per-entry
  *     sentinel sizes/offsets resolve through the 0x0001 extended-info
  *     extra field in its spec-fixed field order;
  *   - each entry's signature (`PK\0x01\0x02`) verified, name read at
  *     its declared length, variable extra/comment fields skipped by
  *     their declared lengths — never by scanning.
  *
  * Malformed structures fail loudly (the mp4SampleRanges rule): a wrong
  * offset fed downstream would inflate garbage.
  */
object Archive {

  /** Central-directory listing of one ZIP payload:
    * `(name, method, compressed_size, uncompressed_size, local_offset)`
    * per member, in directory order. Handles classic and ZIP64 forms. */
  def zipCentralDirectory(payload: Array[Byte])
      : Seq[(String, Int, Long, Long, Long)] = {
    def u16(at: Int): Int =
      (payload(at) & 0xFF) | ((payload(at + 1) & 0xFF) << 8)
    def u32(at: Int): Long =
      (u16(at).toLong | (u16(at + 2).toLong << 16)) & 0xFFFFFFFFL
    def u64(at: Int): Long = u32(at) | (u32(at + 4) << 32)
    require(payload.length >= 22, "too short for a ZIP EOCD")
    // backward scan for PK\5\6 — comment may pad up to 64 KiB
    var eocd = payload.length - 22
    val floor = math.max(0, payload.length - 22 - 0xFFFF)
    while (eocd >= floor && !(payload(eocd) == 0x50 && payload(eocd + 1) == 0x4B &&
      payload(eocd + 2) == 0x05 && payload(eocd + 3) == 0x06)) eocd -= 1
    require(eocd >= floor, "no end-of-central-directory record")
    var n = u16(eocd + 10).toLong
    var cdSize = u32(eocd + 12)
    var cdOff = u32(eocd + 16)
    // directory end: where the walk must land (EOCD, or in the ZIP64
    // form the ZIP64 EOCD record that sits between directory and EOCD)
    var cdEnd = eocd
    if (n == 0xFFFFL || cdSize == 0xFFFFFFFFL || cdOff == 0xFFFFFFFFL) {
      // ZIP64: the 20-byte EOCD LOCATOR immediately precedes the EOCD
      val loc = eocd - 20
      require(loc >= 0 && u32(loc) == 0x07064B50L,
        "classic EOCD holds ZIP64 sentinels but no ZIP64 EOCD locator " +
          s"precedes it at $loc")
      require(u32(loc + 4) == 0L && u32(loc + 16) == 1L,
        "multi-disk ZIP64 archives are not a thing a corpus dump should be")
      val z64 = u64(loc + 8)
      require(z64 >= 0 && z64 + 56 <= loc && u32(z64.toInt) == 0x06064B50L,
        s"ZIP64 EOCD record not at $z64")
      val z = z64.toInt
      n = u64(z + 32)
      cdSize = u64(z + 40)
      cdOff = u64(z + 48)
      cdEnd = z
    }
    require(cdOff + cdSize == cdEnd,
      s"central directory [$cdOff +$cdSize] does not abut its end record" +
        s" at $cdEnd — truncated or shifted archive")
    require(n <= Int.MaxValue, s"entry count $n exceeds a byte-array walk")
    var pos = cdOff.toInt
    val out = (0 until n.toInt).map { i =>
      require(pos + 46 <= cdEnd &&
        u32(pos) == 0x02014B50L, s"bad central directory entry $i at $pos")
      val method = u16(pos + 10)
      var csize = u32(pos + 20)
      var usize = u32(pos + 24)
      val nameLen = u16(pos + 28)
      val extraLen = u16(pos + 30)
      val commentLen = u16(pos + 32)
      var localOff = u32(pos + 42)
      require(pos + 46 + nameLen + extraLen <= cdEnd,
        s"entry $i name/extra out of bounds")
      val name = new String(payload, pos + 46, nameLen, "UTF-8")
      // ZIP64 extended info (0x0001): present iff some field maxed out;
      // carries ONLY the maxed fields, in spec order usize, csize,
      // localOff (disk number last, skipped — single-disk require above)
      if (csize == 0xFFFFFFFFL || usize == 0xFFFFFFFFL ||
          localOff == 0xFFFFFFFFL) {
        var ep = pos + 46 + nameLen
        val eEnd = ep + extraLen
        var found = false
        while (ep + 4 <= eEnd && !found) {
          val id = u16(ep); val sz = u16(ep + 2)
          if (id == 0x0001) {
            var fp = ep + 4
            if (usize == 0xFFFFFFFFL) { usize = u64(fp); fp += 8 }
            if (csize == 0xFFFFFFFFL) { csize = u64(fp); fp += 8 }
            if (localOff == 0xFFFFFFFFL) { localOff = u64(fp); fp += 8 }
            require(fp <= ep + 4 + sz,
              s"entry $i ZIP64 extra too short for its sentinel fields")
            found = true
          } else ep += 4 + sz
        }
        require(found,
          s"entry $i has ZIP64 sentinels but no 0x0001 extra field")
      }
      pos += 46 + nameLen + extraLen + commentLen
      (name, method, csize, usize, localOff)
    }
    require(pos == cdEnd,
      s"central directory walk ended at $pos, directory end at $cdEnd — " +
        "entry-count / size mismatch")
    out
  }

  /** Write-side ZIP64 fixture: STORED members with FORCED sentinel
    * fields — classic EOCD carries 0xFFFF/0xFFFFFFFF and the truth
    * lives in the ZIP64 EOCD record + per-entry 0x0001 extras, exactly
    * the shape a >4 GiB / >65k-member dump has (forced so the fixture
    * stays kilobytes while exercising every ZIP64 read path). */
  def buildZip64(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    require(members.nonEmpty, "need at least one member")
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Long): Unit = { w16((v & 0xFFFF).toInt); w16(((v >> 16) & 0xFFFF).toInt) }
    def w64(v: Long): Unit = { w32(v & 0xFFFFFFFFL); w32((v >>> 32) & 0xFFFFFFFFL) }
    val crcs = members.map { case (_, data) =>
      val c = new java.util.zip.CRC32(); c.update(data); c.getValue
    }
    val localOffs = members.zip(crcs).map { case ((name, data), crc) =>
      val off = out.size().toLong
      w32(0x04034B50L); w16(45); w16(0); w16(0); w16(0); w16(0) // PK\3\4
      w32(crc); w32(data.length.toLong); w32(data.length.toLong)
      val nb = name.getBytes("UTF-8")
      w16(nb.length); w16(0)
      out.write(nb); out.write(data)
      off
    }
    val cdOff = out.size().toLong
    members.zip(crcs).zip(localOffs).foreach {
      case (((name, data), crc), off) =>
        w32(0x02014B50L); w16(45); w16(45); w16(0); w16(0); w16(0); w16(0)
        w32(crc)
        w32(0xFFFFFFFFL); w32(0xFFFFFFFFL) // csize/usize → ZIP64 extra
        val nb = name.getBytes("UTF-8")
        w16(nb.length); w16(4 + 24); w16(0) // name, extra, comment lens
        w16(0); w16(0) // disk, internal attrs
        w32(0L) // external attrs
        w32(0xFFFFFFFFL) // local offset → ZIP64 extra
        out.write(nb)
        w16(0x0001); w16(24) // ZIP64 extended info: usize, csize, offset
        w64(data.length.toLong); w64(data.length.toLong); w64(off)
    }
    val cdSize = out.size().toLong - cdOff
    val z64 = out.size().toLong
    w32(0x06064B50L) // ZIP64 EOCD record
    w64(44L) // size of remainder
    w16(45); w16(45); w32(0L); w32(0L)
    w64(members.length.toLong); w64(members.length.toLong)
    w64(cdSize); w64(cdOff)
    w32(0x07064B50L) // ZIP64 EOCD locator
    w32(0L); w64(z64); w32(1L)
    w32(0x06054B50L) // classic EOCD, all sentinels
    w16(0); w16(0); w16(0xFFFF); w16(0xFFFF)
    w32(0xFFFFFFFFL); w32(0xFFFFFFFFL); w16(0)
    out.toByteArray
  }

  /** TAR member listing (POSIX.1-1988 ustar + POSIX.1-2001 pax) — the
    * OTHER bulk container: arXiv source bundles, Project Gutenberg
    * mirrors, and most dataset dumps ship as (gzipped) tar. The listing
    * walk is pure declared-structure arithmetic over 512-byte blocks:
    *   - each header block carries name (100 bytes), octal size field,
    *     typeflag, the `ustar` magic, and a checksum computed over the
    *     header with the checksum field blanked to spaces — VERIFIED
    *     here, because a desynced walk would hand garbage offsets to
    *     the member tasks;
    *   - member data occupies `ceil(size/512)` blocks after the header —
    *     skipped by arithmetic, never scanned;
    *   - a pax extended header (typeflag `x`) holds `len key=value\n`
    *     records that OVERRIDE the following entry's fields — `path`
    *     (names >100 bytes, which real nested corpus paths exceed
    *     routinely) and `size` (>8 GiB members beyond the octal field)
    *     are honored; unknown keys are skipped by their declared record
    *     length, per the spec;
    *   - the archive ends at two zero blocks (or clean EOF).
    * Malformed headers (bad magic, bad checksum, non-octal size,
    * truncated data) fail loudly — the Archive/Pdf/Mp4 discipline. */
  def tarList(payload: Array[Byte]): Seq[(String, String, Long, Long)] = {
    require(payload.length % 512 == 0,
      s"tar stream length ${payload.length} is not block-aligned")
    def isZeroBlock(at: Int): Boolean =
      (at until at + 512).forall(payload(_) == 0)
    // Octal numeric field: leading spaces, octal digits, NUL/space end.
    def octal(at: Int, len: Int): Long = {
      var i = at; val end = at + len
      while (i < end && payload(i) == ' ') i += 1
      var v = 0L; var any = false
      while (i < end && payload(i) >= '0' && payload(i) <= '7') {
        v = v * 8 + (payload(i) - '0'); i += 1; any = true
      }
      require(any && (i == end || payload(i) == 0 || payload(i) == ' '),
        s"non-octal numeric field at $at")
      v
    }
    def str(at: Int, len: Int): String = {
      var end = at
      while (end < at + len && payload(end) != 0) end += 1
      new String(payload, at, end - at, "UTF-8")
    }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Long, Long)]
    var pos = 0
    var paxPath: Option[String] = None
    var paxSize: Option[Long] = None
    var done = false
    while (!done && pos + 512 <= payload.length) {
      if (isZeroBlock(pos)) {
        require(pos + 1024 <= payload.length && isZeroBlock(pos + 512),
          s"single zero block at $pos — truncated end-of-archive marker")
        done = true
      } else {
        require(str(pos + 257, 6) == "ustar",
          s"header at $pos lacks the ustar magic")
        // checksum: header bytes with the checksum field as 8 spaces
        var sum = 0L
        var i = pos
        while (i < pos + 512) {
          sum += (if (i >= pos + 148 && i < pos + 156) ' '.toInt
                  else payload(i) & 0xFF)
          i += 1
        }
        require(sum == octal(pos + 148, 8),
          s"header checksum mismatch at $pos")
        val typeflag = (payload(pos + 156) & 0xFF).toChar match {
          case 0 => "0" // old-style regular-file marker
          case c => c.toString
        }
        val rawSize = octal(pos + 124, 12)
        val dataOff = pos + 512L
        val blocks = ((rawSize + 511) / 512).toInt
        require(dataOff + blocks * 512L <= payload.length,
          s"member data at $dataOff (+$rawSize) runs past the archive")
        if (typeflag == "x") {
          // pax records for the NEXT entry: "<len> <key>=<value>\n",
          // len = decimal byte length of the whole record incl. itself
          val body = new String(payload, dataOff.toInt, rawSize.toInt, "UTF-8")
          var p = 0
          while (p < body.length) {
            val sp = body.indexOf(' ', p)
            require(sp > p, s"pax record at $p lacks a length field")
            val recLen = body.substring(p, sp).toInt
            require(recLen > 0 && p + recLen <= body.length &&
              body(p + recLen - 1) == '\n',
              s"pax record at $p not newline-terminated at its length")
            val eq = body.indexOf('=', sp + 1)
            require(eq > sp && eq < p + recLen, s"pax record at $p lacks '='")
            val key = body.substring(sp + 1, eq)
            val value = body.substring(eq + 1, p + recLen - 1)
            key match {
              case "path" => paxPath = Some(value)
              case "size" => paxSize = Some(value.toLong)
              case _      => () // skipped by declared length, per spec
            }
            p += recLen
          }
        } else {
          val rawName = {
            val prefix = str(pos + 345, 155)
            val base = str(pos, 100)
            if (prefix.isEmpty) base else s"$prefix/$base"
          }
          val name = paxPath.getOrElse(rawName)
          val size = paxSize.getOrElse(rawSize)
          out += ((name, typeflag, size, dataOff))
          paxPath = None; paxSize = None
        }
        pos = dataOff.toInt + blocks * 512
      }
    }
    require(done, "archive ended without the two-zero-block marker")
    out.toSeq
  }

  /** Write-side ustar/pax fixture: regular members; a name longer than
    * the 100-byte header field (or `forcePax`) emits the pax `x` header
    * + override record pair in front of its entry, exactly the shape
    * GNU/bsdtar write for deep corpus paths. */
  def buildTar(members: Seq[(String, Array[Byte])],
      forcePax: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def writeHeader(name: String, size: Long, typeflag: Char): Unit = {
      val h = new Array[Byte](512)
      val nb = name.getBytes("UTF-8")
      require(nb.length <= 100, s"header name too long: $name")
      System.arraycopy(nb, 0, h, 0, nb.length)
      def oct(at: Int, len: Int, v: Long): Unit = {
        val s = java.lang.Long.toOctalString(v)
        val padded = ("0" * (len - 1 - s.length)) + s
        System.arraycopy(padded.getBytes("US-ASCII"), 0, h, at, len - 1)
        h(at + len - 1) = 0
      }
      oct(100, 8, 420 /* 0644 */); oct(108, 8, 0); oct(116, 8, 0)
      oct(124, 12, size); oct(136, 12, 0)
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      h(156) = typeflag.toByte
      System.arraycopy("ustar".getBytes("US-ASCII"), 0, h, 257, 5)
      h(263) = '0'; h(264) = '0'
      var sum = 0L; h.foreach(b => sum += (b & 0xFF))
      val cs = java.lang.Long.toOctalString(sum)
      val csPad = ("0" * (6 - cs.length)) + cs
      System.arraycopy(csPad.getBytes("US-ASCII"), 0, h, 148, 6)
      h(154) = 0; h(155) = ' '
      out.write(h)
    }
    def writeData(data: Array[Byte]): Unit = {
      out.write(data)
      val pad = (512 - data.length % 512) % 512
      out.write(new Array[Byte](pad))
    }
    members.foreach { case (name, data) =>
      if (forcePax || name.getBytes("UTF-8").length > 100) {
        // "<len> path=<name>\n" with len counting its own digits
        val base = s" path=$name\n".getBytes("UTF-8").length
        var len = base + 1
        while (s"$len".length + base != len) len = s"$len".length + base
        val rec = s"$len path=$name\n".getBytes("UTF-8")
        writeHeader("./PaxHeaders/" + name.take(80), rec.length.toLong, 'x')
        writeData(rec)
        writeHeader(name.take(100), data.length.toLong, '0')
      } else writeHeader(name, data.length.toLong, '0')
      writeData(data)
    }
    out.write(new Array[Byte](1024))
    out.toByteArray
  }

  /** Listing probe over an `(id, payload)` frame of tar streams: one
    * row per member, `(id, member, name, typeflag, size, data_offset)`.
    * Partition-batched byte math — zero shuffle, nothing inflated. */
  def tarProbe(mm: DataFrame): DataFrame = {
    val spark = mm.sparkSession
    import spark.implicits._
    mm.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          tarList(payload).zipWithIndex.map {
            case ((name, tf, size, off), i) =>
              (id, i.toLong, name, tf, size, off)
          }
        }
      }
      .toDF("id", "member", "name", "typeflag", "size", "data_offset")
  }

  /** Listing probe over an `(id, payload)` frame: one row per member,
    * `(id, member, name, method, compressed_size, uncompressed_size,
    * local_offset)`. Partition-batched byte math — zero shuffle, cost
    * O(entries), nothing inflated. */
  def zipProbe(mm: DataFrame): DataFrame = {
    val spark = mm.sparkSession
    import spark.implicits._
    mm.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          zipCentralDirectory(payload).zipWithIndex.map {
            case ((name, method, cs, us, off), i) =>
              (id, i.toLong, name, method.toLong, cs, us, off)
          }
        }
      }
      .toDF("id", "member", "name", "method", "compressed_size",
        "uncompressed_size", "local_offset")
  }
}
