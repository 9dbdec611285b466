package graft

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream,
  DataOutputStream}
import java.net.{ServerSocket, Socket}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Hpack, Http2}

/** Flow-control edge cases of the HTTP/2 client (r10 ADVICE): a server
  * that closes the stream while the client is paused on an exhausted
  * send window must surface the response (not a 30s stall + writes on a
  * closed stream), and a late WINDOW_UPDATE for a CLOSED stream must not
  * inflate the current stream's window.
  */
class Http2Spec extends AnyFunSuite {

  private def settingsInitialWindow(w: Int): Array[Byte] =
    Array[Byte](0x00, 0x04,
      ((w >> 24) & 0xff).toByte, ((w >> 16) & 0xff).toByte,
      ((w >> 8) & 0xff).toByte, (w & 0xff).toByte)

  private def windowUpdate(streamId: Int, inc: Int): Http2.Frame =
    Http2.Frame(Http2.WINDOW_UPDATE, 0, streamId,
      Array(((inc >> 24) & 0x7f).toByte, ((inc >> 16) & 0xff).toByte,
        ((inc >> 8) & 0xff).toByte, (inc & 0xff).toByte))

  /** Accept one connection, run the server-side script, propagate its
    * failure into the test thread.
    */
  private def withServer(
      script: (Socket, DataInputStream, DataOutputStream) => Unit)
      (body: Int => Unit): Unit = {
    val ss = new ServerSocket(0)
    @volatile var serverErr: Option[Throwable] = None
    val t = new Thread(() => {
      var s: Socket = null
      try {
        s = ss.accept()
        val in = new DataInputStream(
          new BufferedInputStream(s.getInputStream))
        val out = new DataOutputStream(
          new BufferedOutputStream(s.getOutputStream))
        val preface = new Array[Byte](Http2.Preface.length)
        in.readFully(preface)
        script(s, in, out)
      } catch { case e: Throwable => serverErr = Some(e) }
      finally { if (s != null) s.close() }
    })
    t.setDaemon(true)
    t.start()
    try body(ss.getLocalPort)
    finally ss.close()
    t.join(10000)
    serverErr.foreach(e => fail(s"server-side: $e", e))
  }

  /** Read frames, ACKing SETTINGS and skipping WINDOW_UPDATE/PING, until
    * one of type `tpe` arrives.
    */
  private def readUntil(in: DataInputStream, out: DataOutputStream,
      tpe: Int): Http2.Frame = {
    var f = Http2.readFrame(in)
    while (f.tpe != tpe) {
      if (f.tpe == Http2.SETTINGS && (f.flags & Http2.ACK) == 0)
        Http2.writeFrame(out, Http2.Frame(Http2.SETTINGS, Http2.ACK, 0,
          Array.emptyByteArray))
      f = Http2.readFrame(in)
    }
    f
  }

  test("trailers-only response while flow-control-paused returns, not stalls") {
    withServer { (_, in, out) =>
      // window of 8 bytes — the 64-byte body cannot finish
      Http2.writeFrame(out, Http2.Frame(Http2.SETTINGS, 0, 0,
        settingsInitialWindow(8)))
      val h = readUntil(in, out, Http2.HEADERS)
      assert(h.streamId === 1)
      // reject without reading the body: trailers-only HEADERS, no credit
      Http2.writeFrame(out, Http2.Frame(Http2.HEADERS,
        Http2.END_HEADERS | Http2.END_STREAM, 1,
        Hpack.encode(Seq(":status" -> "200", "grpc-status" -> "8",
          "grpc-message" -> "RESOURCE_EXHAUSTED"))))
      // drain whatever the client already sent until it closes
      try while (true) { Http2.readFrame(in); () }
      catch { case _: java.io.IOException => () }
    } { port =>
      val c = new Http2.Client("127.0.0.1", port, tls = false,
        readTimeoutMs = 5000)
      try {
        val t0 = System.nanoTime()
        val resp = c.unary(Seq(":method" -> "POST", ":path" -> "/x"),
          new Array[Byte](64))
        val elapsedMs = (System.nanoTime() - t0) / 1000000
        assert(resp.headers("grpc-status") === "8")
        // must return via the early-close path, not the socket timeout
        assert(elapsedMs < 4000)
      } finally c.close()
    }
  }

  test("late WINDOW_UPDATE for a closed stream does not credit the next one") {
    withServer { (sock, in, out) =>
      Http2.writeFrame(out, Http2.Frame(Http2.SETTINGS, 0, 0,
        settingsInitialWindow(8)))
      // request 1 (stream 1): small body, normal trailers-only response
      readUntil(in, out, Http2.HEADERS)
      val d1 = readUntil(in, out, Http2.DATA)
      assert(d1.streamId === 1 && (d1.flags & Http2.END_STREAM) != 0)
      Http2.writeFrame(out, Http2.Frame(Http2.HEADERS,
        Http2.END_HEADERS | Http2.END_STREAM, 1,
        Hpack.encode(Seq(":status" -> "200"))))
      // LATE credit for the now-closed stream 1 — a buggy client applies
      // it to the in-flight stream and keeps writing past the real window
      Http2.writeFrame(out, windowUpdate(1, 1000))
      // request 2 (stream 3): 20-byte body against the 8-byte window
      readUntil(in, out, Http2.HEADERS)
      val d2 = readUntil(in, out, Http2.DATA)
      assert(d2.streamId === 3)
      assert(d2.payload.length === 8,
        "first DATA frame must be window-limited to 8 bytes")
      assert((d2.flags & Http2.END_STREAM) === 0)
      // the client reads the stale stream-1 credit while paused here; a
      // buggy client sends the remaining 12 bytes on it — assert SILENCE
      // until we grant real stream-3 credit
      sock.setSoTimeout(500)
      val early = try { Some(Http2.readFrame(in)) }
        catch { case _: java.net.SocketTimeoutException => None }
      assert(early.isEmpty,
        s"client wrote past the server's window on stale credit: $early")
      sock.setSoTimeout(0)
      Http2.writeFrame(out, windowUpdate(3, 100))
      val d3 = readUntil(in, out, Http2.DATA)
      assert(d3.streamId === 3 && d3.payload.length === 12)
      assert((d3.flags & Http2.END_STREAM) != 0)
      Http2.writeFrame(out, Http2.Frame(Http2.HEADERS,
        Http2.END_HEADERS | Http2.END_STREAM, 3,
        Hpack.encode(Seq(":status" -> "200"))))
      try while (true) { Http2.readFrame(in); () }
      catch { case _: java.io.IOException => () }
    } { port =>
      val c = new Http2.Client("127.0.0.1", port, tls = false,
        readTimeoutMs = 5000)
      try {
        val r1 = c.unary(Seq(":method" -> "POST", ":path" -> "/x"),
          Array[Byte](1, 2, 3, 4))
        assert(r1.headers(":status") === "200")
        val r2 = c.unary(Seq(":method" -> "POST", ":path" -> "/x"),
          new Array[Byte](20))
        assert(r2.headers(":status") === "200")
      } finally c.close()
    }
  }
}
