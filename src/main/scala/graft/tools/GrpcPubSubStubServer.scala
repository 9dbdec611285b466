package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import scala.collection.mutable

/** A live-socket stub Pub/Sub service speaking the NATIVE gRPC surface
  * — hand-decoded protobuf over the repo's HTTP/2 server plumbing
  * ([[graft.sources.Http2.serveConnection]]), response headers encoded
  * with Huffman + incremental indexing so every round trip exercises
  * the client's full HPACK decoder (dynamic table growth across the
  * calls of one connection). Same at-least-once model as the REST
  * stub: un-acked messages redeliver; `:seek` resets acked flags.
  */
class GrpcPubSubStub(requireAuth: Boolean = false,
    dropAcks: Boolean = false) {
  import graft.sources.{Grpc, Http2, Protobuf}

  private val backlog = mutable.Buffer[(Array[Byte], Boolean)]()
  val pulls = new AtomicInteger(0)
  val seeks = new AtomicInteger(0)
  private val droppedOnce = new java.util.concurrent.atomic.AtomicBoolean(
    !dropAcks)
  val bearer = "tok-grpc-123"

  private val server = new java.net.ServerSocket(0, 16,
    java.net.InetAddress.getByName("127.0.0.1"))
  def port: Int = server.getLocalPort
  def hostPort: String = s"127.0.0.1:$port"

  private def handle(headers: Map[String, String], body: Array[Byte])
      : (Seq[(String, String)], Array[Byte], Seq[(String, String)]) = {
    val ok = Seq(":status" -> "200",
      "content-type" -> "application/grpc")
    def trailers(status: Int, msg: String = "") =
      Seq("grpc-status" -> status.toString) ++
        (if (msg.isEmpty) Nil else Seq("grpc-message" -> msg))
    if (requireAuth &&
        !headers.get("authorization").contains(s"Bearer $bearer"))
      return (ok, Array.emptyByteArray, trailers(16, "UNAUTHENTICATED"))
    val msg = Grpc.deframe(body)
    headers(":path") match {
      case "/google.pubsub.v1.Publisher/Publish" =>
        val r = new Protobuf.Reader(msg)
        backlog.synchronized {
          while (r.hasMore) r.readTag() match {
            case (2, 2) => // messages
              val pm = new Protobuf.Reader(r.lenDelim())
              while (pm.hasMore) pm.readTag() match {
                case (1, 2) => backlog += ((pm.lenDelim(), false))
                case (_, w) => pm.skip(w)
              }
            case (_, w) => r.skip(w)
          }
        }
        (ok, Grpc.frame(new Protobuf.Writer().str(1, "1").result()),
          trailers(0))
      case "/google.pubsub.v1.Subscriber/Pull" =>
        pulls.incrementAndGet()
        var max = 256
        val r = new Protobuf.Reader(msg)
        while (r.hasMore) r.readTag() match {
          case (3, 0) => max = r.varint().toInt
          case (_, w) => r.skip(w)
        }
        val resp = new Protobuf.Writer()
        backlog.synchronized {
          backlog.zipWithIndex.filter(!_._1._2).take(max)
            .foreach { case ((data, _), idx) =>
              resp.msg(1, new Protobuf.Writer()
                .str(1, s"a$idx")
                .msg(2, new Protobuf.Writer().bytes(1, data)
                  .str(3, s"m$idx")))
            }
        }
        (ok, Grpc.frame(resp.result()), trailers(0))
      case "/google.pubsub.v1.Subscriber/Acknowledge" =>
        if (droppedOnce.compareAndSet(false, true)) // simulated ack loss
          (ok, Array.emptyByteArray, trailers(0))
        else {
          val r = new Protobuf.Reader(msg)
          backlog.synchronized {
            while (r.hasMore) r.readTag() match {
              case (2, 2) =>
                val idx = r.strField().drop(1).toInt
                backlog(idx) = (backlog(idx)._1, true)
              case (_, w) => r.skip(w)
            }
          }
          (ok, Array.emptyByteArray, trailers(0))
        }
      case "/google.pubsub.v1.Subscriber/Seek" =>
        seeks.incrementAndGet()
        backlog.synchronized {
          backlog.indices.foreach(i => backlog(i) = (backlog(i)._1, false))
        }
        (ok, Grpc.frame(Array.emptyByteArray), trailers(0))
      case p =>
        (ok, Array.emptyByteArray, trailers(12, s"unknown method $p"))
    }
  }

  private val acceptor = new Thread(() => {
    try while (true) {
      val s = server.accept()
      new Thread(() => {
        try graft.sources.Http2.serveConnection(s, handle)
        catch { case e: Throwable =>
          System.err.println(s"[grpc-stub] connection died: $e")
          e.printStackTrace()
        }
        finally { try s.close() catch { case _: Throwable => () } }
      }).start()
    } catch { case _: Throwable => () }
  })
  acceptor.setDaemon(true)
  acceptor.start()

  def close(): Unit = { try server.close() catch { case _: Throwable => () } }
}
