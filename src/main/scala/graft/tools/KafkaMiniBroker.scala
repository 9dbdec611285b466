package graft.tools

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import graft.sources.Kafka

/** A live-socket stub Kafka broker implementing the protocol subset the
  * native client speaks — request framing plus Metadata v1, ListOffsets
  * v1, Fetch v4, and Produce v3 — over real RecordBatch v2 bytes (the
  * stub stores and serves the same wire batches a broker's log holds,
  * so CRC32C verification and codec decompression run against genuine
  * on-disk-format data).
  */
class KafkaMiniBroker(topic: String, nPartitions: Int = 1) {
  // per partition: (baseOffset, batchBytes); nextOffset advances by
  // record count
  private val logs = Array.fill(nPartitions)(
    mutable.Buffer[(Long, Array[Byte])]())
  private val nextOffsets = Array.fill(nPartitions)(0L)
  @volatile private var open = true
  private val server = new ServerSocket(0)
  def port: Int = server.getLocalPort
  /** Total client connections accepted — lets specs prove fetch
    * parallelism (each distributed fetch task opens its own socket).
    */
  val connectionsAccepted = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Seed records directly (test helper) — builds a real v2 batch. */
  def seed(partition: Int, values: Seq[String], codec: Int = 0): Unit =
    appendBatch(partition, Kafka.buildRecordBatch(0L, 1700000000000L,
      values.map(v => (None, Some(v.getBytes(UTF_8)))), codec))

  def appendBatch(partition: Int, batch: Array[Byte]): Long =
    logs.synchronized {
      val base = nextOffsets(partition)
      val withBase = batch.clone()
      ByteBuffer.wrap(withBase).putLong(0, base)
      // recount from the batch header (record count at offset 57)
      val n = ByteBuffer.wrap(withBase).getInt(57)
      logs(partition) += ((base, withBase))
      nextOffsets(partition) = base + n
      base
    }

  def highWatermark(partition: Int): Long =
    logs.synchronized(nextOffsets(partition))

  def batches(partition: Int): Seq[Array[Byte]] =
    logs.synchronized(logs(partition).map(_._2).toSeq)

  private val acceptor = new Thread(() => {
    try while (open) {
      val sock = server.accept()
      connectionsAccepted.incrementAndGet()
      val t = new Thread(() => handle(sock))
      t.setDaemon(true)
      t.start()
    } catch { case _: Throwable => () }
  })
  acceptor.setDaemon(true)
  acceptor.start()

  def close(): Unit = { open = false; server.close() }

  private def handle(sock: Socket): Unit = {
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(sock.getInputStream))
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(sock.getOutputStream))

    def str(b: ByteBuffer): String = {
      val n = b.getShort
      if (n < 0) null else {
        val a = new Array[Byte](n); b.get(a); new String(a, UTF_8)
      }
    }
    def respond(corr: Int)(body: DataOutputStream => Unit): Unit = {
      val bos = new ByteArrayOutputStream()
      val p = new DataOutputStream(bos)
      p.writeInt(corr)
      body(p)
      p.flush()
      out.writeInt(bos.size())
      bos.writeTo(out)
      out.flush()
    }
    def wstr(p: DataOutputStream, s: String): Unit = {
      val b = s.getBytes(UTF_8); p.writeShort(b.length); p.write(b)
    }

    try while (true) {
      val size = in.readInt()
      val req = new Array[Byte](size)
      in.readFully(req)
      val buf = ByteBuffer.wrap(req)
      val apiKey = buf.getShort
      val version = buf.getShort
      val corr = buf.getInt
      str(buf) // client id
      apiKey match {
        case 3 => // Metadata v1
          val n = buf.getInt
          require(n == 1 && version == 1, s"stub: metadata v$version n=$n")
          val t = str(buf)
          respond(corr) { p =>
            p.writeInt(1) // brokers
            p.writeInt(0); wstr(p, "127.0.0.1"); p.writeInt(port)
            p.writeShort(-1) // rack null
            p.writeInt(0)    // controller
            p.writeInt(1)    // topics
            p.writeShort(if (t == topic) 0 else 3)
            wstr(p, t); p.writeByte(0)
            p.writeInt(if (t == topic) nPartitions else 0)
            (0 until (if (t == topic) nPartitions else 0)).foreach { pid =>
              p.writeShort(0); p.writeInt(pid); p.writeInt(0)
              p.writeInt(0); p.writeInt(0) // replicas, isr
            }
          }
        case 2 => // ListOffsets v1
          buf.getInt // replica id
          buf.getInt // topic count
          str(buf)
          buf.getInt // partition count
          val pid = buf.getInt
          val ts = buf.getLong
          respond(corr) { p =>
            p.writeInt(1); wstr(p, topic)
            p.writeInt(1); p.writeInt(pid); p.writeShort(0)
            p.writeLong(-1L)
            p.writeLong(if (ts == -2L) 0L else highWatermark(pid))
          }
        case 1 => // Fetch v4
          buf.getInt // replica
          buf.getInt // max wait
          buf.getInt // min bytes
          buf.getInt // max bytes
          buf.get()  // isolation
          buf.getInt // topic count
          str(buf)
          buf.getInt // partition count
          val pid = buf.getInt
          val offset = buf.getLong
          buf.getInt // partition max bytes
          val (hw, setBytes) = logs.synchronized {
            val serve = logs(pid).filter { case (base, b) =>
              base + ByteBuffer.wrap(b).getInt(57) > offset }
            val bos = new ByteArrayOutputStream()
            serve.foreach { case (_, b) => bos.write(b) }
            (nextOffsets(pid), bos.toByteArray)
          }
          respond(corr) { p =>
            p.writeInt(0) // throttle
            p.writeInt(1); wstr(p, topic)
            p.writeInt(1); p.writeInt(pid); p.writeShort(0)
            p.writeLong(hw); p.writeLong(hw)
            p.writeInt(0) // aborted txns
            p.writeInt(setBytes.length); p.write(setBytes)
          }
        case 0 => // Produce v3
          buf.getShort // txn id (null)
          buf.getShort // acks
          buf.getInt   // timeout
          buf.getInt   // topic count
          str(buf)
          buf.getInt   // partition count
          val pid = buf.getInt
          val setLen = buf.getInt
          val set = new Array[Byte](setLen)
          buf.get(set)
          val base = appendBatch(pid, set)
          respond(corr) { p =>
            p.writeInt(1); wstr(p, topic)
            p.writeInt(1); p.writeInt(pid); p.writeShort(0)
            p.writeLong(base); p.writeLong(-1L)
            p.writeInt(0) // throttle
          }
        case other => sys.error(s"stub: unsupported api $other")
      }
    } catch { case _: Throwable => () } finally sock.close()
  }
}
