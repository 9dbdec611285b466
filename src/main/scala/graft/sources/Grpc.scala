package graft.sources

import java.nio.charset.StandardCharsets.US_ASCII

/** Native gRPC unary client over [[Http2]] — the reference's Pub/Sub
  * connector speaks gRPC (`crates/adapters/src/transport/pubsub/
  * input.rs`, google_cloud_pubsub), so the graft transport does too,
  * in the repo's native-wire style: gRPC's length-prefixed message
  * framing (1-byte compressed flag + 4-byte big-endian length), the
  * `application/grpc` HTTP/2 request shape (`te: trailers`), and
  * status surfaced from the `grpc-status`/`grpc-message` trailers
  * (trailers-only error responses included).
  */
object Grpc {

  /** One open connection; unary calls multiplex as sequential streams
    * (the server's HPACK dynamic table persists across calls).
    */
  final class Channel(host: String, port: Int, tls: Boolean = false,
      authority: Option[String] = None) extends AutoCloseable {
    private val client = new Http2.Client(host, port, tls)
    private val auth = authority.getOrElse(
      if (port == (if (tls) 443 else 80)) host else s"$host:$port")

    def call(path: String, message: Array[Byte],
        bearer: Option[String] = None): Array[Byte] = {
      val headers = Seq(
        ":method" -> "POST",
        ":scheme" -> (if (tls) "https" else "http"),
        ":path" -> path,
        ":authority" -> auth,
        "content-type" -> "application/grpc",
        "te" -> "trailers",
        "grpc-accept-encoding" -> "identity") ++
        bearer.map(t => "authorization" -> s"Bearer $t")
      val resp = client.unary(headers, frame(message))
      val status = resp.trailers.getOrElse("grpc-status",
        resp.headers.getOrElse("grpc-status",
          sys.error(s"grpc: no grpc-status in response to $path " +
            s"(headers=${resp.headers.keys.mkString(",")})")))
      if (status != "0") {
        val msg = resp.trailers.getOrElse("grpc-message",
          resp.headers.getOrElse("grpc-message", ""))
        sys.error(s"grpc: $path failed status=$status $msg")
      }
      deframe(resp.body)
    }

    def close(): Unit = client.close()
  }

  /** gRPC message framing: flag byte (0 = uncompressed) + u32 length. */
  def frame(message: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](5 + message.length)
    out(1) = ((message.length >> 24) & 0xff).toByte
    out(2) = ((message.length >> 16) & 0xff).toByte
    out(3) = ((message.length >> 8) & 0xff).toByte
    out(4) = (message.length & 0xff).toByte
    System.arraycopy(message, 0, out, 5, message.length)
    out
  }

  /** Unary responses carry exactly one message (empty body = empty
    * message, e.g. google.protobuf.Empty).
    */
  def deframe(body: Array[Byte]): Array[Byte] = {
    if (body.isEmpty) return Array.emptyByteArray
    require(body.length >= 5, s"grpc: truncated frame (${body.length}B)")
    require(body(0) == 0, "grpc: compressed responses not negotiated " +
      "(grpc-accept-encoding: identity)")
    val len = ((body(1) & 0xff) << 24) | ((body(2) & 0xff) << 16) |
      ((body(3) & 0xff) << 8) | (body(4) & 0xff)
    require(body.length >= 5 + len, "grpc: frame shorter than its length")
    java.util.Arrays.copyOfRange(body, 5, 5 + len)
  }

  /** ASCII guard for header values we originate. (A byte-length
    * comparison would be a no-op: getBytes(US_ASCII) maps every
    * unmappable char to one '?' byte, preserving length.)
    */
  def ascii(s: String): String = {
    require(s.forall(_ < 0x80), s"non-ascii: $s")
    s
  }
}
