package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Hpack

/** HPACK conformance against RFC 7541 Appendix C — the published test
  * vectors, byte-exact: C.4 (Huffman-coded requests with incremental
  * indexing across one connection) and C.6 (Huffman-coded responses
  * with a 256-octet dynamic table, exercising eviction). These pin the
  * transcribed Appendix B Huffman table and the dynamic-table state
  * machine against the spec's own goldens, not just self round trips.
  */
class HpackSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  test("C.4: request vectors with Huffman coding") {
    val dec = new Hpack.Decoder()
    // C.4.1
    assert(dec.decode(hex("8286 8441 8cf1 e3c2 e5f2 3a6b a0ab 90f4 ff"))
      === Seq(":method" -> "GET", ":scheme" -> "http", ":path" -> "/",
        ":authority" -> "www.example.com"))
    // C.4.2 — :authority now rides the dynamic table
    assert(dec.decode(hex("8286 84be 5886 a8eb 1064 9cbf"))
      === Seq(":method" -> "GET", ":scheme" -> "http", ":path" -> "/",
        ":authority" -> "www.example.com",
        "cache-control" -> "no-cache"))
    // C.4.3 — custom-key/custom-value both Huffman, new-name literal
    assert(dec.decode(hex(
      "8287 85bf 4088 25a8 49e9 5ba9 7d7f 8925 a849 e95b b8e8 b4bf"))
      === Seq(":method" -> "GET", ":scheme" -> "https",
        ":path" -> "/index.html", ":authority" -> "www.example.com",
        "custom-key" -> "custom-value"))
  }

  test("C.6: response vectors, 256-octet table with eviction") {
    val dec = new Hpack.Decoder(maxTableSize = 256)
    // C.6.1
    assert(dec.decode(hex(
      "4882 6402 5885 aec3 771a 4b61 96d0 7abe 9410 54d4 44a8 2005 9504" +
        " 0b81 66e0 82a6 2d1b ff6e 919d 29ad 1718 63c7 8f0b 97c8 e9ae" +
        " 82ae 43d3"))
      === Seq(":status" -> "302", "cache-control" -> "private",
        "date" -> "Mon, 21 Oct 2013 20:13:21 GMT",
        "location" -> "https://www.example.com"))
    // C.6.2 — :status 307 evicts the oldest entry
    assert(dec.decode(hex("4883 640e ffc1 c0bf"))
      === Seq(":status" -> "307", "cache-control" -> "private",
        "date" -> "Mon, 21 Oct 2013 20:13:21 GMT",
        "location" -> "https://www.example.com"))
    // C.6.3 — new date + content-encoding + a 56-octet set-cookie
    assert(dec.decode(hex(
      "88c1 6196 d07a be94 1054 d444 a820 0595 040b 8166 e084 a62d 1bff" +
        " c05a 839b d9ab 77ad 94e7 821d d7f2 e6c7 b335 dfdf cd5b 3960" +
        " d5af 2708 7f36 72c1 ab27 0fb5 291f 9587 3160 65c0 03ed 4ee5" +
        " b106 3d50 07"))
      === Seq(":status" -> "200", "cache-control" -> "private",
        "date" -> "Mon, 21 Oct 2013 20:13:22 GMT",
        "location" -> "https://www.example.com",
        "content-encoding" -> "gzip",
        "set-cookie" ->
          "foo=ASDJKHQKBZXOQWEOPIUAXQWEOIU; max-age=3600; version=1"))
  }

  test("huffman encode matches the RFC's own encodings") {
    def enc(s: String): String =
      Hpack.huffmanEncode(s).map(b => f"${b & 0xff}%02x").mkString
    assert(enc("www.example.com") === "f1e3c2e5f23a6ba0ab90f4ff")
    assert(enc("no-cache") === "a8eb10649cbf")
    assert(enc("custom-key") === "25a849e95ba97d7f")
    assert(enc("custom-value") === "25a849e95bb8e8b4bf")
    assert(enc("302") === "6402")
    assert(enc("private") === "aec3771a4b")
    assert(enc("Mon, 21 Oct 2013 20:13:21 GMT") ===
      "d07abe941054d444a8200595040b8166e082a62d1bff")
    assert(enc("https://www.example.com") ===
      "9d29ad171863c78f0b97c8e9ae82ae43d3")
  }

  test("stateless client encoding decodes losslessly (plain literals)") {
    val headers = Seq(
      ":method" -> "POST", ":scheme" -> "http",
      ":path" -> "/google.pubsub.v1.Subscriber/Pull",
      ":authority" -> "localhost:1234",
      "content-type" -> "application/grpc",
      "te" -> "trailers",
      "grpc-custom" -> "x~y|z") // a name outside the static table
    val dec = new Hpack.Decoder()
    assert(dec.decode(Hpack.encode(headers)) === headers)
  }

  test("indexing encoder round-trips through the full decoder, " +
      "dynamic table reused across blocks") {
    val enc = new Hpack.IndexingEncoder()
    val dec = new Hpack.Decoder()
    val h1 = Seq(":status" -> "200",
      "content-type" -> "application/grpc", "grpc-status" -> "0")
    assert(dec.decode(enc.encode(h1)) === h1)
    // second block: all three should now be pure index references
    val block2 = enc.encode(h1)
    assert(block2.length <= 3, "expected indexed references only")
    assert(dec.decode(block2) === h1)
  }
}
