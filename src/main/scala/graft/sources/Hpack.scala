package graft.sources

import java.nio.charset.StandardCharsets.US_ASCII

import scala.collection.mutable

/** HPACK (RFC 7541) header compression for the native HTTP/2 client —
  * zero jars, same house style as the Kafka/Postgres/NATS wire codecs.
  *
  * Encoder: literal-header-field-without-indexing with a static-table
  * name reference where one exists, plain (non-Huffman) strings — both
  * spellings every conformant decoder must accept, and they keep the
  * client stateless (no dynamic-table sync to get wrong).
  *
  * Decoder: the FULL surface a server may send — indexed fields over
  * the static AND dynamic tables, all three literal forms (incremental
  * indexing mutates the dynamic table), dynamic-table size updates,
  * and Huffman-coded strings. The Huffman table below transcribes RFC
  * 7541 Appendix B for the ASCII range (0x20–0x7E) plus EOS; gRPC
  * header values are ASCII by contract (binary metadata is base64 in
  * `-bin` keys), so a code outside that range fails loudly rather than
  * mis-decoding. HpackSpec replays every RFC 7541 Appendix C vector
  * (C.4 Huffman requests, C.6 Huffman responses incl. dynamic-table
  * eviction) against this decoder.
  */
object Hpack {

  /** Static table, RFC 7541 Appendix A (1-based). */
  val staticTable: Vector[(String, String)] = Vector(
    ":authority" -> "",
    ":method" -> "GET",
    ":method" -> "POST",
    ":path" -> "/",
    ":path" -> "/index.html",
    ":scheme" -> "http",
    ":scheme" -> "https",
    ":status" -> "200",
    ":status" -> "204",
    ":status" -> "206",
    ":status" -> "304",
    ":status" -> "400",
    ":status" -> "404",
    ":status" -> "500",
    "accept-charset" -> "",
    "accept-encoding" -> "gzip, deflate",
    "accept-language" -> "",
    "accept-ranges" -> "",
    "accept" -> "",
    "access-control-allow-origin" -> "",
    "age" -> "",
    "allow" -> "",
    "authorization" -> "",
    "cache-control" -> "",
    "content-disposition" -> "",
    "content-encoding" -> "",
    "content-language" -> "",
    "content-length" -> "",
    "content-location" -> "",
    "content-range" -> "",
    "content-type" -> "",
    "cookie" -> "",
    "date" -> "",
    "etag" -> "",
    "expect" -> "",
    "expires" -> "",
    "from" -> "",
    "host" -> "",
    "if-match" -> "",
    "if-modified-since" -> "",
    "if-none-match" -> "",
    "if-range" -> "",
    "if-unmodified-since" -> "",
    "last-modified" -> "",
    "link" -> "",
    "location" -> "",
    "max-forwards" -> "",
    "proxy-authenticate" -> "",
    "proxy-authorization" -> "",
    "range" -> "",
    "referer" -> "",
    "refresh" -> "",
    "retry-after" -> "",
    "server" -> "",
    "set-cookie" -> "",
    "strict-transport-security" -> "",
    "transfer-encoding" -> "",
    "user-agent" -> "",
    "vary" -> "",
    "via" -> "",
    "www-authenticate" -> "")

  private val staticNameIdx: Map[String, Int] =
    staticTable.zipWithIndex.reverseIterator
      .map { case ((n, _), i) => n -> (i + 1) }.toMap

  // ------------------------------------------------------------ huffman

  /** (code, bits) per symbol for 0x20..0x7E, RFC 7541 Appendix B. */
  private val huffAscii: Array[(Int, Int)] = Array(
    (0x14, 6), (0x3f8, 10), (0x3f9, 10), (0xffa, 12), (0x1ff9, 13), // ! " # $
    (0x15, 6), (0xf8, 8), (0x7fa, 11), (0x3fa, 10), (0x3fb, 10), // % & ' ( )
    (0xf9, 8), (0x7fb, 11), (0xfa, 8), (0x16, 6), (0x17, 6), // * + , - .
    (0x18, 6), (0x0, 5), (0x1, 5), (0x2, 5), (0x19, 6), // / 0 1 2 3
    (0x1a, 6), (0x1b, 6), (0x1c, 6), (0x1d, 6), (0x1e, 6), // 4 5 6 7 8
    (0x1f, 6), (0x5c, 7), (0xfb, 8), (0x7ffc, 15), (0x20, 6), // 9 : ; < =
    (0xffb, 12), (0x3fc, 10), (0x1ffa, 13), (0x21, 6), (0x5d, 7), // > ? @ A B
    (0x5e, 7), (0x5f, 7), (0x60, 7), (0x61, 7), (0x62, 7), // C D E F G
    (0x63, 7), (0x64, 7), (0x65, 7), (0x66, 7), (0x67, 7), // H I J K L
    (0x68, 7), (0x69, 7), (0x6a, 7), (0x6b, 7), (0x6c, 7), // M N O P Q
    (0x6d, 7), (0x6e, 7), (0x6f, 7), (0x70, 7), (0x71, 7), // R S T U V
    (0x72, 7), (0xfc, 8), (0x73, 7), (0xfd, 8), (0x1ffb, 13), // W X Y Z [
    (0x7fff0, 19), (0x1ffc, 13), (0x3ffc, 14), (0x22, 6), (0x7ffd, 15), // \ ] ^ _ `
    (0x3, 5), (0x23, 6), (0x4, 5), (0x24, 6), (0x5, 5), // a b c d e
    (0x25, 6), (0x26, 6), (0x27, 6), (0x6, 5), (0x74, 7), // f g h i j
    (0x75, 7), (0x28, 6), (0x29, 6), (0x2a, 6), (0x7, 5), // k l m n o
    (0x2b, 6), (0x76, 7), (0x2c, 6), (0x8, 5), (0x9, 5), // p q r s t
    (0x2d, 6), (0x77, 7), (0x78, 7), (0x79, 7), (0x7a, 7), // u v w x y
    (0x7b, 7), (0x7ffe, 15), (0x7fc, 11), (0x3ffd, 14), (0x1ffd, 13)) // z { | } ~

  /** (bits << 32 | code) → symbol, for the decoder walk. */
  private val huffDecode: Map[Long, Int] =
    huffAscii.zipWithIndex.map { case ((code, bits), i) =>
      ((bits.toLong << 32) | code.toLong) -> (i + 0x20)
    }.toMap

  def huffmanEncode(s: String): Array[Byte] = {
    var acc = 0L
    var nBits = 0
    val out = mutable.ArrayBuffer[Byte]()
    s.getBytes(US_ASCII).foreach { b =>
      val c = b & 0xff
      require(c >= 0x20 && c <= 0x7e,
        s"hpack: non-ASCII symbol $c not in the huffman subset")
      val (code, bits) = huffAscii(c - 0x20)
      acc = (acc << bits) | code.toLong
      nBits += bits
      while (nBits >= 8) {
        out += ((acc >> (nBits - 8)) & 0xff).toByte
        nBits -= 8
      }
    }
    if (nBits > 0) // pad with EOS-prefix ones
      out += (((acc << (8 - nBits)) | ((1 << (8 - nBits)) - 1)) & 0xff).toByte
    out.toArray
  }

  def huffmanDecode(bytes: Array[Byte]): String = {
    val sb = new StringBuilder
    var code = 0L
    var bits = 0
    bytes.foreach { b =>
      var i = 7
      while (i >= 0) {
        code = (code << 1) | ((b >> i) & 1)
        bits += 1
        val sym = huffDecode.get((bits.toLong << 32) | code)
        if (sym.isDefined) { sb.append(sym.get.toChar); code = 0; bits = 0 }
        else require(bits <= 30, "hpack: huffman code outside the ASCII " +
          "subset (gRPC headers are ASCII; binary metadata rides -bin " +
          "base64 keys)")
        i -= 1
      }
    }
    // trailing padding must be a prefix of EOS (all ones), < 8 bits
    require(bits < 8 && code == (1L << bits) - 1,
      s"hpack: bad huffman padding ($bits bits)")
    sb.toString
  }

  // ------------------------------------------------------------ integers

  def writeInt(out: mutable.ArrayBuffer[Byte], prefixBits: Int,
      firstByteHigh: Int, value: Int): Unit = {
    val max = (1 << prefixBits) - 1
    if (value < max) out += (firstByteHigh | value).toByte
    else {
      out += (firstByteHigh | max).toByte
      var v = value - max
      while (v >= 128) { out += ((v % 128) + 128).toByte; v /= 128 }
      out += v.toByte
    }
  }

  // ------------------------------------------------------------- encoder

  /** Literal-without-indexing encoding of a header list (stateless). */
  def encode(headers: Seq[(String, String)]): Array[Byte] = {
    val out = mutable.ArrayBuffer[Byte]()
    headers.foreach { case (name, value) =>
      staticNameIdx.get(name) match {
        case Some(i) => writeInt(out, 4, 0x00, i)
        case None =>
          out += 0x00.toByte
          writeStr(out, name)
      }
      writeStr(out, value)
    }
    out.toArray
  }

  private def writeStr(out: mutable.ArrayBuffer[Byte], s: String): Unit = {
    val b = s.getBytes(US_ASCII)
    writeInt(out, 7, 0x00, b.length) // H=0: plain
    out ++= b
  }

  // ------------------------------------------------------------- decoder

  /** Stateful per-connection decoder (dynamic table with eviction). */
  final class Decoder(var maxTableSize: Int = 4096) {
    private val dynamic = mutable.ArrayDeque[(String, String)]()
    private var tableSize = 0

    private def entrySize(e: (String, String)): Int =
      e._1.length + e._2.length + 32

    private def evict(): Unit =
      while (tableSize > maxTableSize && dynamic.nonEmpty) {
        tableSize -= entrySize(dynamic.removeLast())
      }

    private def add(e: (String, String)): Unit = {
      tableSize += entrySize(e)
      dynamic.prepend(e)
      evict()
    }

    private def lookup(i: Int): (String, String) = {
      require(i >= 1, s"hpack: index 0 is invalid")
      if (i <= staticTable.length) staticTable(i - 1)
      else {
        val d = i - staticTable.length - 1
        require(d < dynamic.length, s"hpack: index $i beyond tables")
        dynamic(d)
      }
    }

    def decode(block: Array[Byte]): Seq[(String, String)] = {
      val out = mutable.ArrayBuffer[(String, String)]()
      var pos = 0
      def readInt(prefixBits: Int): Int = {
        val max = (1 << prefixBits) - 1
        var v = block(pos) & max
        pos += 1
        if (v == max) {
          var shift = 0
          var more = true
          while (more) {
            val b = block(pos) & 0xff
            pos += 1
            v += (b & 0x7f) << shift
            shift += 7
            more = (b & 0x80) != 0
          }
        }
        v
      }
      def readStr(): String = {
        val huff = (block(pos) & 0x80) != 0
        val len = readInt(7)
        val raw = java.util.Arrays.copyOfRange(block, pos, pos + len)
        pos += len
        if (huff) huffmanDecode(raw) else new String(raw, US_ASCII)
      }
      while (pos < block.length) {
        val b = block(pos) & 0xff
        if ((b & 0x80) != 0) { // indexed
          out += lookup(readInt(7))
        } else if ((b & 0xc0) == 0x40) { // literal, incremental indexing
          val idx = readInt(6)
          val name = if (idx == 0) readStr() else lookup(idx)._1
          val value = readStr()
          add(name -> value)
          out += name -> value
        } else if ((b & 0xe0) == 0x20) { // dynamic table size update
          maxTableSize = readInt(5)
          evict()
        } else { // literal without indexing (0000) / never indexed (0001)
          val idx = readInt(4)
          val name = if (idx == 0) readStr() else lookup(idx)._1
          out += name -> readStr()
        }
      }
      out.toSeq
    }
  }

  /** Stateful encoder for the STUB SERVER side (tools/GrpcPubSubStub):
    * Huffman strings + incremental indexing, so the client's full
    * decoder surface — dynamic-table growth across calls included — is
    * exercised by every spec round trip.
    */
  final class IndexingEncoder(maxTableSize: Int = 4096) {
    private val dynamic = mutable.ArrayDeque[(String, String)]()
    private var tableSize = 0
    private def entrySize(e: (String, String)): Int =
      e._1.length + e._2.length + 32

    def encode(headers: Seq[(String, String)]): Array[Byte] = {
      val out = mutable.ArrayBuffer[Byte]()
      headers.foreach { case (name, value) =>
        val dynIdx = dynamic.indexOf(name -> value)
        val statIdx = staticTable.indexOf(name -> value)
        if (dynIdx >= 0) writeInt(out, 7, 0x80,
          staticTable.length + 1 + dynIdx)
        else if (statIdx >= 0) writeInt(out, 7, 0x80, statIdx + 1)
        else {
          staticNameIdx.get(name) match {
            case Some(i) => writeInt(out, 6, 0x40, i)
            case None =>
              out += 0x40.toByte
              writeHuff(out, name)
          }
          writeHuff(out, value)
          tableSize += entrySize(name -> value)
          dynamic.prepend(name -> value)
          while (tableSize > maxTableSize && dynamic.nonEmpty)
            tableSize -= entrySize(dynamic.removeLast())
        }
      }
      out.toArray
    }

    private def writeHuff(out: mutable.ArrayBuffer[Byte], s: String): Unit = {
      val h = huffmanEncode(s)
      writeInt(out, 7, 0x80, h.length)
      out ++= h
    }
  }
}
