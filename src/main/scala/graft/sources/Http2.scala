package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream,
  DataOutputStream, EOFException, InputStream, OutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.US_ASCII

import scala.collection.mutable

/** Native HTTP/2 (RFC 7540) framing — the transport under the gRPC
  * client (`Grpc`), zero jars, blocking sockets like the repo's other
  * wire protocols (Kafka, Postgres, NATS, RESP). Client side implements
  * what a gRPC UNARY exchange needs: connection preface + SETTINGS
  * handshake, HEADERS (+CONTINUATION) with HPACK, DATA with connection/
  * stream flow-control accounting (WINDOW_UPDATE sent as data is
  * consumed), PING replies, GOAWAY/RST_STREAM surfaced as errors.
  * h2c (plaintext, the emulator contract) or TLS with ALPN "h2" (the
  * real service).
  */
object Http2 {

  val Preface: Array[Byte] =
    "PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n".getBytes(US_ASCII)

  // frame types
  val DATA = 0x0
  val HEADERS = 0x1
  val RST_STREAM = 0x3
  val SETTINGS = 0x4
  val PING = 0x6
  val GOAWAY = 0x7
  val WINDOW_UPDATE = 0x8
  val CONTINUATION = 0x9

  // flags
  val END_STREAM = 0x1
  val ACK = 0x1
  val END_HEADERS = 0x4
  val PADDED = 0x8
  val PRIORITY_FLAG = 0x20

  final case class Frame(tpe: Int, flags: Int, streamId: Int,
      payload: Array[Byte])

  def writeFrame(out: DataOutputStream, f: Frame): Unit = {
    out.writeByte((f.payload.length >> 16) & 0xff)
    out.writeByte((f.payload.length >> 8) & 0xff)
    out.writeByte(f.payload.length & 0xff)
    out.writeByte(f.tpe)
    out.writeByte(f.flags)
    out.writeInt(f.streamId & 0x7fffffff)
    out.write(f.payload)
    out.flush()
  }

  def readFrame(in: DataInputStream): Frame = {
    val len = (in.readUnsignedByte() << 16) | (in.readUnsignedByte() << 8) |
      in.readUnsignedByte()
    val tpe = in.readUnsignedByte()
    val flags = in.readUnsignedByte()
    val streamId = in.readInt() & 0x7fffffff
    val payload = new Array[Byte](len)
    in.readFully(payload)
    Frame(tpe, flags, streamId, payload)
  }

  /** One gRPC-shaped unary response: response headers, body bytes,
    * trailers (trailers-only responses surface everything in
    * `headers`).
    */
  final case class Response(headers: Map[String, String],
      body: Array[Byte], trailers: Map[String, String])

  final class Client(host: String, port: Int, tls: Boolean = false,
      connectTimeoutMs: Int = 10000, readTimeoutMs: Int = 30000)
      extends AutoCloseable {

    private val socket: Socket = {
      if (!tls) {
        val s = new Socket()
        s.connect(new java.net.InetSocketAddress(host, port),
          connectTimeoutMs)
        s
      } else {
        val ctx = javax.net.ssl.SSLContext.getDefault
        val s = ctx.getSocketFactory.createSocket(host, port)
          .asInstanceOf[javax.net.ssl.SSLSocket]
        val p = s.getSSLParameters
        p.setApplicationProtocols(Array("h2"))
        s.setSSLParameters(p)
        s.startHandshake()
        require(s.getApplicationProtocol == "h2",
          s"http2: server did not negotiate h2 (got " +
            s"'${s.getApplicationProtocol}')")
        s
      }
    }
    socket.setSoTimeout(readTimeoutMs)
    socket.setTcpNoDelay(true)
    private val out = new DataOutputStream(
      new BufferedOutputStream(socket.getOutputStream))
    private val in = new DataInputStream(
      new BufferedInputStream(socket.getInputStream))
    private val hpackIn = new Hpack.Decoder()
    private var nextStreamId = 1
    private var serverMaxFrame = 16384
    // Send-side flow control (RFC 7540 §6.9): the peer's connection
    // window starts at 65535 and grows only via WINDOW_UPDATE; each
    // stream starts at the peer's SETTINGS_INITIAL_WINDOW_SIZE. A
    // conformant server kills the connection with FLOW_CONTROL_ERROR
    // if we write DATA past either, so sends pause (draining control
    // frames) when a window is exhausted.
    private var connSendWindow = 65535L
    private var initialStreamWindow = 65535L
    private var curStreamWindow = 0L // the in-flight stream's window
    private var inFlightStream = 0 // id of the stream unary() is driving
    // frames for the in-flight stream that arrive while we are still
    // sending its request body (a server may respond early)
    private val pending = mutable.Queue[Frame]()

    // ---- handshake: preface + SETTINGS, wait for the server's SETTINGS
    out.write(Preface)
    // SETTINGS_ENABLE_PUSH(0x2)=0: we never handle PUSH_PROMISE, and a
    // pushed HEADERS block would desync the shared HPACK dynamic table
    writeFrame(out, Frame(SETTINGS, 0, 0,
      Array(0x00, 0x02, 0x00, 0x00, 0x00, 0x00).map(_.toByte)))
    private var settingsSeen = false
    while (!settingsSeen) {
      val f = readFrame(in)
      f.tpe match {
        case SETTINGS if (f.flags & ACK) == 0 =>
          applySettings(f.payload)
          writeFrame(out, Frame(SETTINGS, ACK, 0, Array.emptyByteArray))
          settingsSeen = true
        case SETTINGS => () // ack of ours
        case WINDOW_UPDATE | PING => handleControl(f)
        case GOAWAY => sys.error(goawayMsg(f))
        case _ => ()
      }
    }

    private def applySettings(p: Array[Byte]): Unit = {
      var i = 0
      while (i + 6 <= p.length) {
        val id = ((p(i) & 0xff) << 8) | (p(i + 1) & 0xff)
        val v = ((p(i + 2) & 0xff) << 24) | ((p(i + 3) & 0xff) << 16) |
          ((p(i + 4) & 0xff) << 8) | (p(i + 5) & 0xff)
        if (id == 0x5) serverMaxFrame = v // SETTINGS_MAX_FRAME_SIZE
        if (id == 0x4) { // SETTINGS_INITIAL_WINDOW_SIZE (§6.9.2: the
          // delta retroactively adjusts every open stream's window)
          val nv = v & 0xffffffffL
          curStreamWindow += nv - initialStreamWindow
          initialStreamWindow = nv
        }
        i += 6
      }
    }

    private def goawayMsg(f: Frame): String = {
      val err = if (f.payload.length >= 8)
        ((f.payload(4) & 0xff) << 24) | ((f.payload(5) & 0xff) << 16) |
          ((f.payload(6) & 0xff) << 8) | (f.payload(7) & 0xff)
      else -1
      s"http2: GOAWAY error=$err"
    }

    private def handleControl(f: Frame): Unit = f.tpe match {
      case PING if (f.flags & ACK) == 0 =>
        writeFrame(out, Frame(PING, ACK, 0, f.payload))
      case WINDOW_UPDATE if f.payload.length >= 4 =>
        val inc = (((f.payload(0) & 0x7f) << 24) |
          ((f.payload(1) & 0xff) << 16) | ((f.payload(2) & 0xff) << 8) |
          (f.payload(3) & 0xff)).toLong
        if (f.streamId == 0) connSendWindow += inc
        // a late WINDOW_UPDATE for a CLOSED stream (servers do emit
        // these) must not inflate the current stream's send window —
        // writing past the server's real window draws a connection-
        // killing FLOW_CONTROL_ERROR
        else if (f.streamId == inFlightStream) curStreamWindow += inc
      case _ => ()
    }

    /** One unary request: HEADERS + DATA(END_STREAM), then read this
      * stream to END_STREAM. Sequential streams (1, 3, 5, …) on one
      * connection — the dynamic HPACK table persists across calls.
      */
    def unary(headers: Seq[(String, String)], body: Array[Byte]): Response = {
      val streamId = nextStreamId
      nextStreamId += 2
      curStreamWindow = initialStreamWindow
      inFlightStream = streamId
      val block = Hpack.encode(headers)
      require(block.length <= serverMaxFrame, "http2: header block too big")
      writeFrame(out, Frame(HEADERS, END_HEADERS, streamId, block))
      var off = 0
      // set when the server closes the stream while we are still sending
      // its body (RST_STREAM, or a trailers-only/early response ending in
      // END_STREAM): no more credit will ever arrive and writing further
      // DATA on the closed stream is a protocol error — stop sending and
      // let the response loop below process the parked frames
      var closedEarly = false
      if (body.isEmpty)
        writeFrame(out, Frame(DATA, END_STREAM, streamId,
          Array.emptyByteArray))
      else while (off < body.length && !closedEarly) {
        // pause on an exhausted send window: drain frames until a
        // WINDOW_UPDATE/SETTINGS re-opens it, parking any early
        // response frames for this stream on the pending queue
        while (!closedEarly && math.min(connSendWindow, curStreamWindow) <= 0) {
          val f = readFrame(in)
          if (f.streamId == streamId && f.tpe != WINDOW_UPDATE) {
            pending.enqueue(f)
            if (f.tpe == RST_STREAM || (f.flags & END_STREAM) != 0)
              closedEarly = true
          }
          else if (f.streamId == 0) f.tpe match {
            case SETTINGS if (f.flags & ACK) == 0 =>
              applySettings(f.payload)
              writeFrame(out, Frame(SETTINGS, ACK, 0, Array.emptyByteArray))
            case GOAWAY => sys.error(goawayMsg(f))
            case _ => handleControl(f)
          } else handleControl(f)
        }
        if (!closedEarly) {
          val n = math.min(math.min(serverMaxFrame.toLong, body.length - off),
            math.min(connSendWindow, curStreamWindow)).toInt
          val last = off + n >= body.length
          writeFrame(out, Frame(DATA, if (last) END_STREAM else 0, streamId,
            java.util.Arrays.copyOfRange(body, off, off + n)))
          connSendWindow -= n
          curStreamWindow -= n
          off += n
        }
      }

      var respHeaders = Map.empty[String, String]
      var trailers = Map.empty[String, String]
      val data = mutable.ArrayBuffer[Byte]()
      var headerBlocks = 0
      var done = false
      var contBuf: Option[(mutable.ArrayBuffer[Byte], Boolean)] = None
      while (!done) {
        val f = if (pending.nonEmpty) pending.dequeue() else readFrame(in)
        f.streamId match {
          case 0 => f.tpe match {
            case SETTINGS if (f.flags & ACK) == 0 =>
              applySettings(f.payload)
              writeFrame(out, Frame(SETTINGS, ACK, 0, Array.emptyByteArray))
            case GOAWAY => sys.error(goawayMsg(f))
            case _ => handleControl(f)
          }
          case `streamId` => f.tpe match {
            case HEADERS =>
              var p = f.payload
              var pos = 0
              if ((f.flags & PADDED) != 0) pos += 1
              if ((f.flags & PRIORITY_FLAG) != 0) pos += 5
              val padLen = if ((f.flags & PADDED) != 0) p(0) & 0xff else 0
              p = java.util.Arrays.copyOfRange(p, pos, p.length - padLen)
              val endStream = (f.flags & END_STREAM) != 0
              if ((f.flags & END_HEADERS) != 0) {
                val hs = hpackIn.decode(p).toMap
                headerBlocks += 1
                if (headerBlocks == 1) respHeaders = hs else trailers = hs
                if (endStream) done = true
              } else contBuf = Some((mutable.ArrayBuffer(p: _*), endStream))
            case CONTINUATION =>
              val (buf, endStream) = contBuf.getOrElse(
                sys.error("http2: CONTINUATION without HEADERS"))
              buf ++= f.payload
              if ((f.flags & END_HEADERS) != 0) {
                val hs = hpackIn.decode(buf.toArray).toMap
                headerBlocks += 1
                if (headerBlocks == 1) respHeaders = hs else trailers = hs
                contBuf = None
                if (endStream) done = true
              }
            case DATA =>
              val padLen = if ((f.flags & PADDED) != 0) f.payload(0) & 0xff
                else 0
              val start = if ((f.flags & PADDED) != 0) 1 else 0
              data ++= java.util.Arrays.copyOfRange(f.payload, start,
                f.payload.length - padLen)
              // return the consumed window on connection AND stream
              if (f.payload.nonEmpty) {
                val inc = incrementBytes(f.payload.length)
                writeFrame(out, Frame(WINDOW_UPDATE, 0, 0, inc))
                writeFrame(out, Frame(WINDOW_UPDATE, 0, streamId, inc))
              }
              if ((f.flags & END_STREAM) != 0) done = true
            case RST_STREAM =>
              sys.error(s"http2: stream $streamId reset by server")
            case _ => ()
          }
          case other =>
            // We advertise ENABLE_PUSH=0 and open streams one at a
            // time, so a HEADERS block on a stream we did not open is a
            // protocol violation — and silently skipping it would
            // desync the shared HPACK dynamic table for every later
            // response. Fail loudly instead.
            if (f.tpe == HEADERS || f.tpe == CONTINUATION)
              sys.error(s"http2: HEADERS on unopened stream $other " +
                "(server push is disabled)")
        }
      }
      Response(respHeaders, data.toArray, trailers)
    }

    private def incrementBytes(n: Int): Array[Byte] =
      Array(((n >> 24) & 0x7f).toByte, ((n >> 16) & 0xff).toByte,
        ((n >> 8) & 0xff).toByte, (n & 0xff).toByte)

    def close(): Unit = {
      try writeFrame(out, Frame(GOAWAY, 0, 0, new Array[Byte](8)))
      catch { case _: Throwable => () }
      try socket.close() catch { case _: Throwable => () }
    }
  }

  // ------------------------------------------------------- server side
  // Minimal h2c server plumbing for tools/GrpcPubSubStub: enough of the
  // connection to serve unary gRPC methods to OUR client (and any
  // conformant one that sends plain unary exchanges).

  /** Reads the client preface; answers SETTINGS; then delivers complete
    * (headers, body) requests to `handle`, writing its (headers, body,
    * trailers) back. Single-threaded per connection.
    */
  def serveConnection(socket: Socket,
      handle: (Map[String, String], Array[Byte]) =>
        (Seq[(String, String)], Array[Byte], Seq[(String, String)])): Unit = {
    val in = new DataInputStream(
      new BufferedInputStream(socket.getInputStream))
    val out = new DataOutputStream(
      new BufferedOutputStream(socket.getOutputStream))
    val preface = new Array[Byte](Preface.length)
    in.readFully(preface)
    require(java.util.Arrays.equals(preface, Preface),
      "http2 stub: bad client preface")
    writeFrame(out, Frame(SETTINGS, 0, 0, Array.emptyByteArray))
    val hpackIn = new Hpack.Decoder()
    val hpackOut = new Hpack.IndexingEncoder()
    val bodies = mutable.Map[Int, mutable.ArrayBuffer[Byte]]()
    val heads = mutable.Map[Int, Map[String, String]]()
    try while (true) {
      val f = readFrame(in)
      f.tpe match {
        case SETTINGS if (f.flags & ACK) == 0 =>
          writeFrame(out, Frame(SETTINGS, ACK, 0, Array.emptyByteArray))
        case PING if (f.flags & ACK) == 0 =>
          writeFrame(out, Frame(PING, ACK, 0, f.payload))
        case HEADERS =>
          require((f.flags & END_HEADERS) != 0,
            "http2 stub: CONTINUATION not supported for requests")
          heads(f.streamId) = hpackIn.decode(f.payload).toMap
          bodies(f.streamId) = mutable.ArrayBuffer[Byte]()
          if ((f.flags & END_STREAM) != 0)
            respond(out, hpackOut, f.streamId, heads(f.streamId),
              Array.emptyByteArray, handle)
        case DATA =>
          bodies(f.streamId) ++= f.payload
          // return the consumed receive window (connection + stream) so
          // a flow-controlled client can keep sending bodies > 64 KiB
          if (f.payload.nonEmpty) {
            val n = f.payload.length
            val inc = Array(((n >> 24) & 0x7f).toByte,
              ((n >> 16) & 0xff).toByte, ((n >> 8) & 0xff).toByte,
              (n & 0xff).toByte)
            writeFrame(out, Frame(WINDOW_UPDATE, 0, 0, inc))
            if ((f.flags & END_STREAM) == 0)
              writeFrame(out, Frame(WINDOW_UPDATE, 0, f.streamId, inc))
          }
          if ((f.flags & END_STREAM) != 0)
            respond(out, hpackOut, f.streamId, heads(f.streamId),
              bodies(f.streamId).toArray, handle)
        case GOAWAY => return
        case _ => ()
      }
    } catch {
      case _: EOFException | _: java.net.SocketException => ()
    }
  }

  private def respond(out: DataOutputStream,
      enc: Hpack.IndexingEncoder, streamId: Int,
      reqHeaders: Map[String, String], body: Array[Byte],
      handle: (Map[String, String], Array[Byte]) =>
        (Seq[(String, String)], Array[Byte], Seq[(String, String)]))
      : Unit = {
    val (hs, respBody, trailers) = handle(reqHeaders, body)
    writeFrame(out, Frame(HEADERS, END_HEADERS, streamId, enc.encode(hs)))
    if (respBody.nonEmpty)
      writeFrame(out, Frame(DATA, 0, streamId, respBody))
    writeFrame(out, Frame(HEADERS, END_HEADERS | END_STREAM, streamId,
      enc.encode(trailers)))
  }
}
