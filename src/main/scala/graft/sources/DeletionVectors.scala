package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.CRC32

/** Delta Lake deletion-vector codec, from the PUBLIC protocol spec
  * (delta.io PROTOCOL.md "Deletion Vectors" + the RoaringBitmap
  * interchange format, github.com/RoaringBitmap/RoaringFormatSpec).
  * No Delta/roaring jar — the formats are small and fully specified:
  *
  *  - a DV descriptor on an `add`/`remove` action names where the
  *    bitmap lives (`u` = UUID-named file under the table root,
  *    `p` = absolute path, `i` = inline) with Z85-encoded payloads;
  *  - an on-disk DV file is `<version:1 byte>` then per vector
  *    `<dataSize:int32 BE> <data> <crc32(data):int32 BE>`;
  *  - `data` is a 64-bit "RoaringBitmapArray" in PORTABLE form:
  *    `<magic:int32 LE> <nBitmaps:int64 LE>` then per bitmap
  *    `<key:int32 LE>` (the high 32 bits) + a standard 32-bit
  *    roaring bitmap (array / bitset / run containers).
  *
  * Deleted ROW INDEXES (0-based physical row position in the data
  * file) come out as `Seq[Long]`; [[DeltaRead]] anti-joins them
  * against `_metadata.row_index`. [[decodeFileDv]] is pure
  * bytes-in/rows-out so the scan decodes sidecars in EXECUTORS (the
  * driver only resolves descriptors); inline (`i`) payloads are
  * already driver-resident log text and decode in place.
  *
  * The write half ([[serialize]]/[[writeDvFile]]/[[z85Encode]]) emits
  * array-container-only bitmaps — always spec-valid (any container
  * may be an array container) — for fixtures and export.
  */
object DeletionVectors {

  /** The `deletionVector` struct carried on add/remove actions. */
  final case class Descriptor(
      storageType: String,
      pathOrInlineDv: String,
      offset: Option[Int],
      sizeInBytes: Int,
      cardinality: Long)

  /** Protocol-defined unique id — add/remove file actions are keyed
    * by (path, dvUniqueId), so a file can be re-added with a new DV
    * while the same-path remove targets only the old pairing.
    */
  def uniqueId(d: Option[Descriptor]): String = d match {
    case None => ""
    case Some(dv) =>
      dv.storageType + dv.pathOrInlineDv +
        dv.offset.map(o => s"@$o").getOrElse("")
  }

  // ---- Z85 (ZeroMQ base-85, the protocol's encoding for UUIDs and
  // inline bitmaps; 5 chars <-> 4 bytes, big-endian groups) ----

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyz" +
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Rev: Array[Int] = {
    val a = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"Z85 length must be a multiple of 5: ${s.length}")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    var o = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85Rev(c.toInt) else -1
        require(d >= 0, s"invalid Z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      // a 5-char group encodes exactly 4 bytes — out-of-range groups
      // are corruption, not something to silently truncate
      require(v <= 0xFFFFFFFFL, s"Z85 group out of range at offset $i")
      out(o) = (v >>> 24).toByte
      out(o + 1) = (v >>> 16).toByte
      out(o + 2) = (v >>> 8).toByte
      out(o + 3) = v.toByte
      i += 5
      o += 4
    }
    out
  }

  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, s"Z85 input must be a multiple of 4 bytes")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = ((bytes(i) & 0xFFL) << 24) | ((bytes(i + 1) & 0xFFL) << 16) |
        ((bytes(i + 2) & 0xFFL) << 8) | (bytes(i + 3) & 0xFFL)
      val grp = new Array[Char](5)
      var j = 4
      while (j >= 0) {
        grp(j) = Z85Alphabet((v % 85).toInt)
        v /= 85
        j -= 1
      }
      sb.appendAll(grp)
      i += 4
    }
    sb.toString
  }

  def encodeUuid(uuid: java.util.UUID): String = {
    val bb = ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    z85Encode(bb.array())
  }

  // ---- descriptor resolution ----

  /** Resolved sidecar location for a `u`/`p` descriptor (`i` has no
    * file) as a plain string — no local-path parsing, so the same
    * resolution serves driver NIO reads and executor Hadoop-FS reads.
    */
  def dvFileLocation(tableRoot: String, d: Descriptor): String = d.storageType match {
    case "u" =>
      require(d.pathOrInlineDv.length >= 20,
        s"'u' DV id must end in a 20-char Z85 UUID: ${d.pathOrInlineDv}")
      // an optional random prefix (for key-spreading on object stores)
      // precedes the Z85 UUID, which is always the LAST 20 chars
      val prefix = d.pathOrInlineDv.dropRight(20)
      val bb = ByteBuffer.wrap(z85Decode(d.pathOrInlineDv.takeRight(20)))
      val uuid = new java.util.UUID(bb.getLong, bb.getLong)
      val name = s"deletion_vector_$uuid.bin"
      if (prefix.isEmpty) s"$tableRoot/$name" else s"$tableRoot/$prefix/$name"
    case "p" =>
      d.pathOrInlineDv
    case other =>
      sys.error(s"unsupported DV storageType '$other' (expect u/p/i)")
  }

  /** On-disk location for a `u`/`p` descriptor (`i` has no file). */
  def dvFilePath(tableRoot: String, d: Descriptor): Path =
    Paths.get(dvFileLocation(tableRoot, d).stripPrefix("file:"))

  /** Decode one descriptor's deleted row indexes out of its sidecar
    * file's FULL bytes, verifying size, CRC-32 and cardinality against
    * the descriptor's claims. Pure bytes-in/rows-out so executors can
    * run it on content fetched through any filesystem.
    */
  def decodeFileDv(all: Array[Byte], d: Descriptor): Seq[Long] = {
    val off = d.offset.getOrElse(1) // right after the version byte
    val bb = ByteBuffer.wrap(all) // big-endian (JVM default)
    val size = bb.getInt(off)
    require(size == d.sizeInBytes,
      s"DV size mismatch at offset $off: stored $size, descriptor ${d.sizeInBytes}")
    val data = java.util.Arrays.copyOfRange(all, off + 4, off + 4 + size)
    val crc = new CRC32(); crc.update(data)
    val stored = bb.getInt(off + 4 + size)
    require(stored == crc.getValue.toInt,
      s"DV checksum mismatch at offset $off")
    checkCardinality(deserialize(data), d)
  }

  /** Decode an inline (`i`) descriptor's deleted row indexes. */
  def decodeInlineDv(d: Descriptor): Seq[Long] =
    checkCardinality(deserialize(z85Decode(d.pathOrInlineDv)), d)

  /** Iceberg format-v3 Puffin `deletion-vector-v1` blob → deleted row
    * positions of the referenced data file. The framing is
    * DELIBERATELY harmonized with Delta's DV file layout (the specs
    * cross-reference each other): 4-byte big-endian length of
    * [magic + bitmap], the magic bytes, the portable
    * RoaringBitmapArray, then a 4-byte big-endian CRC-32 of
    * magic+bitmap — so the same [[deserialize]] decodes both.
    * `contentSize` is the manifest's `content_size_in_bytes` (the
    * whole blob, framing included); `cardinality` the manifest's
    * `record_count`.
    */
  def decodePuffinDv(all: Array[Byte], offset: Long, contentSize: Long,
      cardinality: Option[Long]): Seq[Long] = {
    val off = java.lang.Math.toIntExact(offset)
    val bb = ByteBuffer.wrap(all) // big-endian (JVM default)
    val size = bb.getInt(off)
    require(size.toLong == contentSize - 8,
      s"Puffin DV blob length mismatch at offset $off: framed $size, " +
        s"manifest content_size ${contentSize} (expects size+8)")
    val data = java.util.Arrays.copyOfRange(all, off + 4, off + 4 + size)
    val crc = new CRC32(); crc.update(data)
    val stored = bb.getInt(off + 4 + size)
    require(stored == crc.getValue.toInt,
      s"Puffin DV checksum mismatch at offset $off")
    val rows = deserialize(data)
    cardinality.foreach(c => require(rows.length.toLong == c,
      s"Puffin DV cardinality mismatch: decoded ${rows.length}, " +
        s"manifest $c"))
    rows
  }

  private def checkCardinality(rows: Seq[Long], d: Descriptor): Seq[Long] = {
    require(rows.length.toLong == d.cardinality,
      s"DV cardinality mismatch: decoded ${rows.length}, descriptor ${d.cardinality}")
    rows
  }

  /** Decode the deleted row indexes a descriptor points at (local
    * filesystem; [[DeltaRead]]'s scan decodes sidecars executor-side
    * via [[decodeFileDv]] instead).
    */
  def deletedRows(tableRoot: String, d: Descriptor): Seq[Long] =
    d.storageType match {
      case "i" => decodeInlineDv(d)
      case _ =>
        val file = dvFilePath(tableRoot, d)
        require(Files.isRegularFile(file), s"deletion vector file missing: $file")
        decodeFileDv(Files.readAllBytes(file), d)
    }

  // ---- RoaringBitmapArray portable (de)serialization ----

  private val Magic = 1681511377

  /** All set 64-bit values, ascending within each 32-bit key block. */
  def deserialize(data: Array[Byte]): Seq[Long] = {
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt
    require(magic == Magic, s"bad RoaringBitmapArray magic: $magic")
    val n = buf.getLong
    require(n >= 0 && n <= Int.MaxValue, s"bad bitmap count: $n")
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var b = 0L
    while (b < n) {
      val high = (buf.getInt.toLong & 0xFFFFFFFFL) << 32
      readRoaring32(buf).foreach(v => out += (high | (v.toLong & 0xFFFFFFFFL)))
      b += 1
    }
    out.toSeq
  }

  private val SerialCookie = 12347 // with run containers
  private val SerialCookieNoRun = 12346
  private val NoOffsetThreshold = 4

  /** One standard 32-bit roaring bitmap, consumed sequentially
    * (the offset header, when present, is skipped — containers are
    * laid out in key order immediately after it).
    */
  private def readRoaring32(buf: ByteBuffer): Seq[Int] = {
    val cookie = buf.getInt
    val hasRun = (cookie & 0xFFFF) == SerialCookie
    val size =
      if (hasRun) (cookie >>> 16) + 1
      else if (cookie == SerialCookieNoRun) buf.getInt
      else sys.error(s"unknown roaring cookie: $cookie")
    val runFlags = new Array[Boolean](size)
    if (hasRun) {
      val bits = new Array[Byte]((size + 7) / 8)
      buf.get(bits)
      var i = 0
      while (i < size) {
        runFlags(i) = (bits(i / 8) & (1 << (i % 8))) != 0
        i += 1
      }
    }
    val keys = new Array[Int](size)
    val cards = new Array[Int](size)
    var i = 0
    while (i < size) {
      keys(i) = buf.getShort & 0xFFFF
      cards(i) = (buf.getShort & 0xFFFF) + 1
      i += 1
    }
    if (!hasRun || size >= NoOffsetThreshold) {
      var k = 0
      while (k < size) { buf.getInt; k += 1 } // offset header — unused
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    i = 0
    while (i < size) {
      val base = keys(i) << 16
      if (runFlags(i)) {
        val nRuns = buf.getShort & 0xFFFF
        var r = 0
        while (r < nRuns) {
          val start = buf.getShort & 0xFFFF
          val len = buf.getShort & 0xFFFF // ADDITIONAL values after start
          var v = start
          while (v <= start + len) { out += (base | v); v += 1 }
          r += 1
        }
      } else if (cards(i) <= 4096) {
        var c = 0
        while (c < cards(i)) { out += (base | (buf.getShort & 0xFFFF)); c += 1 }
      } else {
        var w = 0
        while (w < 1024) {
          var word = buf.getLong
          while (word != 0) {
            out += (base | (w * 64 + java.lang.Long.numberOfTrailingZeros(word)))
            word &= word - 1
          }
          w += 1
        }
      }
      i += 1
    }
    out.toSeq
  }

  /** Portable RoaringBitmapArray bytes for a set of 64-bit row
    * indexes (array containers only — always spec-valid).
    */
  def serialize(rows: Seq[Long]): Array[Byte] = {
    val byHigh = rows.distinct.sorted
      .groupBy(v => (v >>> 32).toInt).toSeq.sortBy(_._1)
    val bitmaps = byHigh.map { case (high, vs) =>
      high -> serializeRoaring32(vs.map(v => (v & 0xFFFFFFFFL).toInt))
    }
    val total = 4 + 8 + bitmaps.map(4 + _._2.length).sum
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(Magic)
    buf.putLong(bitmaps.length.toLong)
    bitmaps.foreach { case (high, bytes) =>
      buf.putInt(high)
      buf.put(bytes)
    }
    buf.array()
  }

  private def serializeRoaring32(values: Seq[Int]): Array[Byte] = {
    val byKey = values.groupBy(v => (v >>> 16) & 0xFFFF).toSeq.sortBy(_._1)
    byKey.foreach { case (_, vs) =>
      require(vs.length <= 4096,
        "fixture serializer emits array containers only (<=4096 per 64k block)")
    }
    val n = byKey.length
    val headerLen = 4 + 4 + 4 * n + 4 * n // cookie, count, keys+cards, offsets
    val total = headerLen + byKey.map(_._2.length * 2).sum
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(SerialCookieNoRun)
    buf.putInt(n)
    byKey.foreach { case (key, vs) =>
      buf.putShort(key.toShort)
      buf.putShort((vs.length - 1).toShort)
    }
    var off = headerLen
    byKey.foreach { case (_, vs) =>
      buf.putInt(off)
      off += vs.length * 2
    }
    byKey.foreach { case (_, vs) =>
      vs.sorted.foreach(v => buf.putShort((v & 0xFFFF).toShort))
    }
    buf.array()
  }

  /** Write a single-vector DV file carrying `rows`, returning the
    * descriptor fields (`offset`, `sizeInBytes`) to put on the add.
    */
  def writeDvFile(target: Path, rows: Seq[Long]): (Int, Int) = {
    val data = serialize(rows)
    val crc = new CRC32(); crc.update(data)
    val buf = ByteBuffer.allocate(1 + 4 + data.length + 4) // big-endian
    buf.put(1.toByte) // DV file format version
    buf.putInt(data.length)
    buf.put(data)
    buf.putInt(crc.getValue.toInt)
    Files.write(target, buf.array())
    (1, data.length)
  }

  /** One DV FILE packing several bitmaps — how real Delta writers
    * store a commit's deletion vectors (one `deletion_vector_*.bin`
    * per commit, each touched data file's descriptor pointing at its
    * own `[size][data][crc]` entry by offset). Returns each bitmap's
    * (offset, dataSize) in input order.
    */
  def writeDvFileMulti(target: Path,
      perDv: Seq[Seq[Long]]): Seq[(Int, Int)] = {
    require(perDv.nonEmpty, "writeDvFileMulti needs at least one bitmap")
    val out = new java.io.ByteArrayOutputStream()
    out.write(1) // DV file format version, once
    val offsets = perDv.map { rows =>
      val data = serialize(rows)
      val crc = new CRC32(); crc.update(data)
      val off = out.size()
      val buf = ByteBuffer.allocate(4 + data.length + 4)
      buf.putInt(data.length)
      buf.put(data)
      buf.putInt(crc.getValue.toInt)
      out.write(buf.array())
      (off, data.length)
    }
    Files.write(target, out.toByteArray)
    offsets
  }
}
