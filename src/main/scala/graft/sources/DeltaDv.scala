package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32

import org.apache.hadoop.fs.{FileSystem, Path}

/** Delta Lake deletion-vector codec — the on-disk format from the public
  * Delta protocol (PROTOCOL.md "Deletion Vectors"; reference behavior:
  * `crates/adapters/src/integrated/delta_table/deletion_vector.rs`, which
  * delegates decode to delta-kernel):
  *
  *  - descriptor `{storageType: u|i|p, pathOrInlineDv, offset,
  *    sizeInBytes, cardinality}` on `add`/`remove` actions;
  *  - sidecar file: 1-byte format version, then per vector at `offset`:
  *    `<dataSize: i32 BE> <data: dataSize bytes> <crc32(data): u32 BE>`;
  *  - `data` = `<magic 1681511377: u32 LE> <RoaringBitmapArray portable>`;
  *  - portable RoaringBitmapArray: `<numBitmaps: u64 LE>` then per 32-bit
  *    bitmap `<key: u32 LE> <standard roaring serialization>`; a row index
  *    is `key << 32 | bitmapValue`;
  *  - `u` storage: pathOrInlineDv = `<random prefix?><20-char z85 uuid>`,
  *    file `<prefix>/deletion_vector_<uuid>.bin` under the table root;
  *  - `i` storage: pathOrInlineDv = z85 of `data` itself.
  *
  * Both directions are implemented: decode for the reader, encode so the
  * specs can hand-build DV tables byte-for-byte like a modern writer.
  */
object DeltaDv {

  final case class Descriptor(storageType: String, pathOrInlineDv: String,
      offset: Option[Long], sizeInBytes: Int, cardinality: Long)

  // ----------------------------------------------------------- z85

  private val Z85 =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Inv: Array[Int] = {
    val a = Array.fill(128)(-1)
    Z85.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, s"z85 needs 4-byte groups")
    val sb = new java.lang.StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xffL); j += 1 }
      var div = 85L * 85 * 85 * 85
      while (div > 0) {
        sb.append(Z85.charAt(((v / div) % 85).toInt)); div /= 85
      }
      i += 4
    }
    sb.toString
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, "z85 needs 5-char groups")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val d = Z85Inv(s.charAt(i + j).toInt)
        require(d >= 0, s"bad z85 char '${s.charAt(i + j)}'")
        v = v * 85 + d; j += 1
      }
      var k = 3
      while (k >= 0) {
        out(i / 5 * 4 + (3 - k)) = ((v >>> (8 * k)) & 0xff).toByte; k -= 1
      }
      i += 5
    }
    out
  }

  def uuidToZ85(u: java.util.UUID): String = {
    val b = ByteBuffer.allocate(16)
    b.putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits)
    z85Encode(b.array())
  }

  def z85ToUuid(s: String): java.util.UUID = {
    val b = ByteBuffer.wrap(z85Decode(s))
    new java.util.UUID(b.getLong, b.getLong)
  }

  // ------------------------------------- roaring bitmap array (64-bit)

  private val Magic = 1681511377
  private val CookieNoRun = 12346
  private val CookieRun = 12347

  /** Deserialize `<magic><portable RoaringBitmapArray>` into sorted row
    * indices. Handles array, bitmap, and run containers.
    */
  def deserialize(data: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.getInt == Magic, "deletion vector: bad magic number")
    val nBitmaps = buf.getLong
    val out = Array.newBuilder[Long]
    var bi = 0L
    while (bi < nBitmaps) {
      val key = buf.getInt & 0xffffffffL
      val high = key << 32
      // standard 32-bit roaring serialization
      val cookie = buf.getInt
      val (nContainers, runBits) =
        if ((cookie & 0xffff) == CookieRun) {
          val n = (cookie >>> 16) + 1
          val bits = new Array[Byte]((n + 7) / 8)
          buf.get(bits)
          (n, bits)
        } else {
          require(cookie == CookieNoRun,
            s"deletion vector: unknown roaring cookie $cookie")
          (buf.getInt, null)
        }
      val keys = new Array[Int](nContainers)
      val cards = new Array[Int](nContainers)
      var c = 0
      while (c < nContainers) {
        keys(c) = buf.getShort & 0xffff
        cards(c) = (buf.getShort & 0xffff) + 1
        c += 1
      }
      // offset header: always for no-run cookie; for run cookie only
      // when nContainers >= 4 (NO_OFFSET_THRESHOLD)
      if (runBits == null || nContainers >= 4)
        (0 until nContainers).foreach(_ => buf.getInt)
      c = 0
      while (c < nContainers) {
        val base = high | ((keys(c).toLong & 0xffff) << 16)
        val isRun = runBits != null &&
          (runBits(c / 8) & (1 << (c % 8))) != 0
        if (isRun) {
          val nRuns = buf.getShort & 0xffff
          var r = 0
          while (r < nRuns) {
            val start = buf.getShort & 0xffff
            val len = buf.getShort & 0xffff
            var v = start
            while (v <= start + len) { out += (base | v); v += 1 }
            r += 1
          }
        } else if (cards(c) > 4096) { // bitmap container: 1024 u64 words
          var w = 0
          while (w < 1024) {
            var word = buf.getLong
            val wb = base | (w.toLong << 6)
            while (word != 0) {
              out += (wb | java.lang.Long.numberOfTrailingZeros(word))
              word &= word - 1
            }
            w += 1
          }
        } else { // array container: sorted u16 values
          var v = 0
          while (v < cards(c)) { out += (base | (buf.getShort & 0xffff)); v += 1 }
        }
        c += 1
      }
      bi += 1
    }
    out.result()
  }

  /** Serialize sorted row indices as `<magic><portable array>` (array or
    * bitmap containers; the writer side of the same spec, for tests and
    * hand-built tables).
    */
  def serialize(indices: Array[Long]): Array[Byte] = {
    val sorted = indices.distinct.sorted
    val byBitmap = sorted.groupBy(_ >>> 32).toSeq.sortBy(_._1)
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
      bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
    }
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    le32(Magic)
    le32(byBitmap.size); le32(0) // u64 LE count
    byBitmap.foreach { case (key, vals32) =>
      le32(key.toInt)
      val containers = vals32.map(v => (v & 0xffffffffL).toInt)
        .groupBy(v => v >>> 16).toSeq.sortBy(_._1)
      le32(CookieNoRun)
      le32(containers.size)
      containers.foreach { case (k, vs) =>
        le16(k); le16(vs.length - 1)
      }
      // offset header (u32 per container): start of each container's
      // data relative to the bitmap's start (cookie position)
      var off = 4 + 4 + containers.size * 4 + containers.size * 4
      containers.foreach { case (_, vs) =>
        le32(off)
        off += (if (vs.length > 4096) 8192 else vs.length * 2)
      }
      containers.foreach { case (_, vs) =>
        if (vs.length > 4096) {
          val words = new Array[Long](1024)
          vs.foreach { v =>
            val low = v & 0xffff
            words(low >> 6) |= (1L << (low & 63))
          }
          words.foreach { w =>
            var i = 0
            while (i < 8) { bos.write(((w >>> (8 * i)) & 0xff).toInt); i += 1 }
          }
        } else vs.sorted.foreach(v => le16(v & 0xffff))
      }
    }
    bos.toByteArray
  }

  // ----------------------------------------------------- file access

  /** Resolve a descriptor's sidecar path under the table root (`u`
    * storage: optional random prefix + z85 uuid).
    */
  def sidecarPath(tableRoot: Path, d: Descriptor): Path = d.storageType match {
    case "u" =>
      val enc = d.pathOrInlineDv
      val prefix = enc.dropRight(20)
      val uuid = z85ToUuid(enc.takeRight(20))
      val name = s"deletion_vector_$uuid.bin"
      if (prefix.isEmpty) new Path(tableRoot, name)
      else new Path(new Path(tableRoot, prefix), name)
    case "p" => new Path(d.pathOrInlineDv)
    case other => sys.error(s"deletion vector: no sidecar for '$other'")
  }

  /** Read + verify a descriptor into sorted deleted-row indices. */
  /** Inline descriptor for `indices`: z85 of the data padded to a
    * 4-byte multiple (z85 works in 4-byte groups); `sizeInBytes` keeps
    * the unpadded length.
    */
  def inlineDescriptor(indices: Array[Long]): Descriptor = {
    val data = serialize(indices)
    val padded = data ++ new Array[Byte]((4 - data.length % 4) % 4)
    Descriptor("i", z85Encode(padded), None, data.length,
      indices.distinct.length.toLong)
  }

  def readIndices(f: FileSystem, tableRoot: Path,
      d: Descriptor): Array[Long] = d.storageType match {
    case "i" =>
      deserialize(z85Decode(d.pathOrInlineDv).take(d.sizeInBytes))
    case "u" | "p" =>
      val p = sidecarPath(tableRoot, d)
      val in = f.open(p)
      try {
        val off = d.offset.getOrElse(1L)
        in.seek(off)
        val size = in.readInt() // BE
        require(size == d.sizeInBytes,
          s"deletion vector: size $size != descriptor ${d.sizeInBytes}")
        val data = new Array[Byte](size)
        in.readFully(data)
        val crc = in.readInt()
        val c = new CRC32(); c.update(data)
        require((c.getValue & 0xffffffffL) == (crc & 0xffffffffL),
          s"deletion vector: checksum mismatch in $p")
        deserialize(data)
      } finally in.close()
    case other => sys.error(s"deletion vector: unknown storageType '$other'")
  }

  /** Write `indices` as a `u`-storage sidecar under `tableRoot`; returns
    * the descriptor to embed in an `add` action. The test-side twin of
    * [[readIndices]], matching the writer layout modern engines produce
    * (version byte, BE length + CRC framing).
    */
  def writeSidecar(f: FileSystem, tableRoot: Path,
      indices: Array[Long]): Descriptor = {
    val uuid = java.util.UUID.randomUUID()
    val data = serialize(indices)
    val p = new Path(tableRoot, s"deletion_vector_$uuid.bin")
    val out = f.create(p, false)
    try {
      out.writeByte(1) // format version
      out.writeInt(data.length) // BE
      out.write(data)
      val c = new CRC32(); c.update(data)
      out.writeInt(c.getValue.toInt) // BE
    } finally out.close()
    Descriptor("u", uuidToZ85(uuid), Some(1L), data.length,
      indices.distinct.length.toLong)
  }

  def descriptorJson(d: Descriptor): String = {
    val off = d.offset.map(o => s""","offset":$o""").getOrElse("")
    s"""{"storageType":"${d.storageType}",""" +
      s""""pathOrInlineDv":"${d.pathOrInlineDv}"$off,""" +
      s""""sizeInBytes":${d.sizeInBytes},"cardinality":${d.cardinality}}"""
  }
}
