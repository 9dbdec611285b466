package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

/** Hand-rolled protobuf wire codec (the varint/length-delimited binary
  * format) for the native gRPC transport — field numbers come from the
  * PUBLIC google.pubsub.v1 / google.protobuf protos; no generated code,
  * no protobuf jar. Wire types used: 0 = varint, 2 = length-delimited.
  */
object Protobuf {

  final class Writer {
    private val buf = new ByteArrayOutputStream()

    def varintRaw(v0: Long): this.type = {
      var v = v0
      while ((v & ~0x7fL) != 0) {
        buf.write(((v & 0x7f) | 0x80).toInt)
        v >>>= 7
      }
      buf.write((v & 0x7f).toInt)
      this
    }

    private def tag(field: Int, wire: Int): this.type =
      varintRaw((field.toLong << 3) | wire)

    def int64(field: Int, v: Long): this.type =
      if (v == 0) this else { tag(field, 0); varintRaw(v) }

    def int32(field: Int, v: Int): this.type = int64(field, v.toLong)

    def bool(field: Int, v: Boolean): this.type =
      if (!v) this else { tag(field, 0); varintRaw(1) }

    def bytes(field: Int, v: Array[Byte]): this.type =
      if (v.isEmpty) this
      else { tag(field, 2); varintRaw(v.length.toLong); buf.write(v); this }

    def str(field: Int, v: String): this.type =
      bytes(field, v.getBytes(UTF_8))

    /** Nested message (always emitted, even when empty — repeated and
      * explicitly-present fields need the tag).
      */
    def msg(field: Int, v: Writer): this.type = {
      val b = v.result()
      tag(field, 2)
      varintRaw(b.length.toLong)
      buf.write(b)
      this
    }

    def result(): Array[Byte] = buf.toByteArray
  }

  final class Reader(bytes: Array[Byte]) {
    private var pos = 0
    def hasMore: Boolean = pos < bytes.length

    def varint(): Long = {
      var v = 0L
      var shift = 0
      var b = 0
      do {
        b = bytes(pos) & 0xff
        pos += 1
        v |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      v
    }

    /** Returns (fieldNumber, wireType). */
    def readTag(): (Int, Int) = {
      val t = varint()
      ((t >>> 3).toInt, (t & 7).toInt)
    }

    def lenDelim(): Array[Byte] = {
      val n = varint().toInt
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n
      out
    }

    def strField(): String = new String(lenDelim(), UTF_8)

    def skip(wire: Int): Unit = wire match {
      case 0 => varint(); ()
      case 1 => pos += 8
      case 2 =>
        // two statements on purpose: `pos += varint()` reads the OLD
        // pos before varint() advances it
        val n = varint().toInt
        pos += n
      case 5 => pos += 4
      case w => sys.error(s"protobuf: unsupported wire type $w")
    }
  }
}
