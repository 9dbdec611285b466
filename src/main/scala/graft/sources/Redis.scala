package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream,
  OutputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.zset.ZSets

/** Redis output transport (docs/connectors/sinks/redis.md; reference
  * `crates/adapters/src/transport/redis/output.rs`): each view row is
  * stored under a key formed from the connector's `key_fields` joined by
  * `key_separator`; a step's delta is delivered as ONE atomic Redis
  * transaction (MULTI .. EXEC) of SET (insert/update) and DEL (delete)
  * commands — the reference's atomic `redis::Pipeline` per batch.
  *
  * The wire protocol is RESP2 — arrays of bulk strings out, typed
  * replies back — small enough that the client below (~80 lines) speaks
  * it directly over a socket: no Redis jar exists on this classpath and
  * none is needed.
  *
  * Scale note: a Redis sink is inherently single-endpoint — the
  * reference also funnels every batch through one connection/one
  * transaction, so the delta (not the state) is the unit of I/O. Rows
  * stream off the cluster via `toLocalIterator` (one partition pinned at
  * a time, never a full collect), and the per-row bytes are rendered by
  * codegen'd expressions before leaving the executors; the driver only
  * forwards ready key/value byte pairs.
  */
object Redis {

  /** `redis://[<user>][:<pass>@]<host>[:port][/db]` — the reference's
    * accepted connection-string shape (redis crate connection params).
    */
  final case class Target(host: String, port: Int, db: Int,
      username: Option[String], password: Option[String])

  def parseConnectionString(s: String): Target = {
    val re = """redis://(?:([^:@/]*)(?::([^@/]*))?@)?([^:/@]+)(?::(\d+))?(?:/(\d+))?/?(?:\?.*)?""".r
    s match {
      case re(user, pass, host, port, db) => Target(host,
        Option(port).map(_.toInt).getOrElse(6379),
        Option(db).map(_.toInt).getOrElse(0),
        Option(user).filter(_.nonEmpty), Option(pass).filter(_.nonEmpty))
      case _ => sys.error(s"unparseable Redis connection string: $s " +
        "(expected redis://[user][:pass@]host[:port][/db])")
    }
  }

  sealed trait Reply
  final case class SimpleReply(s: String) extends Reply
  final case class ErrorReply(msg: String) extends Reply
  final case class IntReply(n: Long) extends Reply
  final case class BulkReply(bytes: Option[Array[Byte]]) extends Reply
  final case class ArrayReply(items: Seq[Reply]) extends Reply

  /** Minimal RESP2 client: encode commands as arrays of bulk strings,
    * decode the five reply kinds. Synchronous request/reply — exactly
    * the access pattern of an atomic sink transaction.
    */
  final class Client(target: Target, connectTimeoutMs: Int = 10000) {
    private val socket = new Socket()
    socket.connect(new InetSocketAddress(target.host, target.port),
      connectTimeoutMs)
    socket.setTcpNoDelay(true)
    private val in: InputStream =
      new BufferedInputStream(socket.getInputStream)
    private val out: OutputStream =
      new BufferedOutputStream(socket.getOutputStream)

    // handshake: AUTH (password-only or user+password), then SELECT db
    target.password.foreach { pass =>
      val args = target.username match {
        case Some(u) => Seq("AUTH", u, pass)
        case None => Seq("AUTH", pass)
      }
      expectOk(command(args.map(_.getBytes(UTF_8))), "AUTH")
    }
    if (target.db != 0)
      expectOk(command(Seq("SELECT".getBytes(UTF_8),
        target.db.toString.getBytes(UTF_8))), "SELECT")

    def command(args: Seq[Array[Byte]]): Reply = {
      send(args)
      out.flush()
      readReply()
    }

    /** Write a command without reading its reply (pipelining inside
      * MULTI..EXEC); replies are drained by the caller.
      */
    def send(args: Seq[Array[Byte]]): Unit = {
      out.write(s"*${args.length}\r\n".getBytes(UTF_8))
      args.foreach { a =>
        out.write(s"$$${a.length}\r\n".getBytes(UTF_8))
        out.write(a)
        out.write("\r\n".getBytes(UTF_8))
      }
    }

    def flush(): Unit = out.flush()

    /** Drain replies already buffered by the OS without blocking —
      * keeps a long MULTI pipeline from deadlocking on TCP backpressure
      * (the server's +QUEUED acks must be consumed while we stream
      * commands, or both sides' socket buffers fill).
      */
    def drainAvailable(onReply: Reply => Unit): Int = {
      var n = 0
      while (in.available() > 0) {
        onReply(readReply())
        n += 1
      }
      n
    }

    def readReply(): Reply = {
      val first = in.read()
      require(first >= 0, "redis: connection closed mid-reply")
      val line = readLine()
      first.toChar match {
        case '+' => SimpleReply(line)
        case '-' => ErrorReply(line)
        case ':' => IntReply(line.toLong)
        case '$' =>
          val n = line.toInt
          if (n < 0) BulkReply(None)
          else {
            val buf = new Array[Byte](n)
            var off = 0
            while (off < n) {
              val r = in.read(buf, off, n - off)
              require(r >= 0, "redis: connection closed mid-bulk")
              off += r
            }
            readLine()
            BulkReply(Some(buf))
          }
        case '*' =>
          val n = line.toInt
          if (n < 0) ArrayReply(Nil)
          else ArrayReply(Seq.fill(n)(readReply()))
        case c => sys.error(s"redis: unknown reply type '$c'")
      }
    }

    private def readLine(): String = {
      val sb = new java.lang.StringBuilder()
      var c = in.read()
      while (c != '\r') {
        require(c >= 0, "redis: connection closed mid-line")
        sb.append(c.toChar)
        c = in.read()
      }
      require(in.read() == '\n', "redis: malformed line terminator")
      sb.toString
    }

    def close(): Unit = socket.close()
  }

  private def expectOk(r: Reply, cmd: String): Unit = r match {
    case SimpleReply(_) => ()
    case ErrorReply(e) => sys.error(s"redis: $cmd failed: $e")
    case other => sys.error(s"redis: unexpected $cmd reply: $other")
  }

  /** Deliver a view's output delta to Redis as one atomic transaction.
    *
    * `keyFields` come from the format config (docs: json `key_fields`) —
    * the columns whose values, joined by `keySeparator`, form the Redis
    * key; the value is the full row as one JSON line (the doc's
    * `{"c0":1,...}\n` shape). The delta first folds to upsert form
    * (delete+insert pairs on one key become a single SET; pure deletes
    * become DEL), so delivery is idempotent per key within the batch and
    * the uniqueness contract is ENFORCED (duplicate keys in one delta
    * raise, instead of the silent data loss the reference docs warn
    * about).
    */
  def writeUpserts(delta: DataFrame, keyFields: Seq[String],
      keySeparator: String, connectionString: String): Long = {
    require(keyFields.nonEmpty, "redis_output: key_fields is required")
    val d = if (delta.columns.contains(ZSets.W)) delta else ZSets.lift(delta)
    val up = Envelopes.upsertForm(d, keyFields)
    // render the value in the view's declared column order (the doc's
    // example shape), not upsertForm's keys-first layout
    val dataCols = d.columns.filterNot(_ == ZSets.W).toSeq
    val wire = up.select(
      col("_op"),
      concat_ws(keySeparator,
        keyFields.map(k => col(k).cast("string")): _*).as("_key"),
      concat(to_json(struct(dataCols.map(col): _*)), lit("\n")).as("_value"))
    val target = parseConnectionString(connectionString)
    val client = new Client(target)
    try {
      expectOk(client.command(Seq("MULTI".getBytes(UTF_8))), "MULTI")
      val onAck: Reply => Unit = {
        case ErrorReply(e) => sys.error(s"redis: queue failed: $e")
        case _ => ()
      }
      var queued = 0L
      var acked = 0L
      wire.toLocalIterator().forEachRemaining { row =>
        val key = row.getString(1).getBytes(UTF_8)
        row.getString(0) match {
          case "delete" =>
            client.send(Seq("DEL".getBytes(UTF_8), key))
          case _ =>
            client.send(Seq("SET".getBytes(UTF_8), key,
              row.getString(2).getBytes(UTF_8)))
        }
        queued += 1
        // consume +QUEUED acks as they arrive so a long pipeline never
        // deadlocks on both sides' TCP buffers
        if ((queued & 0xff) == 0) {
          client.flush()
          acked += client.drainAvailable(onAck)
        }
      }
      client.send(Seq("EXEC".getBytes(UTF_8)))
      client.flush()
      // drain the remaining +QUEUED acks, then the EXEC reply
      while (acked < queued) {
        onAck(client.readReply())
        acked += 1
      }
      client.readReply() match {
        case ErrorReply(e) => sys.error(
          s"redis: EXEC failed; $queued uncommitted updates lost: $e")
        case ArrayReply(items) =>
          // per-command failures surface inside the EXEC reply array
          // (e.g. OOM at execution time) — a partially-failed
          // transaction must not report success
          items.collectFirst { case ErrorReply(e) =>
            sys.error(s"redis: command failed inside EXEC: $e")
          }
          queued
        case _ => queued
      }
    } finally client.close()
  }
}
