package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, IOException}
import java.net.{InetSocketAddress, StandardProtocolFamily, UnixDomainSocketAddress}
import java.nio.channels.{Channels, SocketChannel}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

/** Minimal pure-JVM PostgreSQL v3 wire-protocol client — the COPY
  * transport for the W1 fast path when no PG JDBC driver jar exists
  * on the classpath.
  *
  * The reference rides the driver's `CopyManager.copyIn`
  * (`PostgresqlManager.java:49-172`); the protocol underneath is
  * public and small (PostgreSQL docs, "Frontend/Backend Protocol"):
  * a StartupMessage, an authentication exchange, then simple-query
  * `Q` messages whose `COPY … FROM STDIN` form switches the stream
  * into CopyData/CopyDone framing. This client implements exactly
  * that surface — startup (trust / cleartext / MD5), simple query
  * with text-format DataRows, and copy-in — over either a unix
  * domain socket (JEP-380, how the sandbox's real PostgreSQL 15
  * listens) or TCP (how a production cluster would reach the sink;
  * same frames either way).
  *
  * Scope: a TRANSPORT, not a driver. No prepared statements, no
  * binary format, no TLS, no SCRAM (trust/password auth covers the
  * engine's `sink.connect.parameter.{user,password}` surface; a
  * SCRAM-only server fails loudly with the server's own message).
  * One short-lived connection per Spark partition, the same
  * connection-per-worker shape as the reference's ReplicaTasks.
  */
final class PgWireClient private (
    ch: SocketChannel, in: DataInputStream, out: DataOutputStream) {

  import PgWireClient._

  /** Run one simple-protocol statement batch; returns the text-format
    * result of the LAST result set plus all command tags. Throws
    * `java.sql.SQLException` (message + SQLSTATE) on ErrorResponse —
    * after draining to ReadyForQuery so the connection stays usable. */
  def exec(sql: String): PgResult = {
    sendQuery(sql)
    var cols: Seq[String] = Nil
    var oids: Seq[Int] = Nil
    val rows = Vector.newBuilder[Seq[String]]
    val tags = Vector.newBuilder[String]
    var err: Option[java.sql.SQLException] = None
    var done = false
    while (!done) {
      val (tpe, body) = readMessage()
      tpe match {
        case 'T' =>
          val parsed = parseRowDescriptionTyped(body)
          cols = parsed.map(_._1); oids = parsed.map(_._2)
        case 'D' => rows += parseDataRow(body)
        case 'C' => tags += cString(body, 0)._1
        case 'I' => () // EmptyQueryResponse
        case 'E' => err = err.orElse(Some(parseError(body)))
        case 'N' | 'S' | 'A' => () // Notice / ParameterStatus / Notification
        case 'Z' => done = true
        case 'G' | 'H' =>
          // a COPY statement routed through exec(): refuse the mode
          err = err.orElse(Some(new java.sql.SQLException(
            "COPY statements must go through copyIn()", "0A000")))
          if (tpe == 'G') { sendCopyFail("exec() cannot stream COPY data") }
        case other =>
          err = err.orElse(Some(new java.sql.SQLException(
            s"unexpected backend message '${other.toChar}'", "08P01")))
      }
    }
    err.foreach(throw _)
    PgResult(cols, rows.result(), tags.result(), oids)
  }

  /** `COPY … FROM STDIN` — stream pre-encoded wire-text rows (each
    * INCLUDING its trailing newline) as CopyData frames, batched to
    * ~64 KiB. Returns the row count from the `COPY n` tag. */
  def copyIn(copySql: String, rows: Iterator[Array[Byte]]): Long = {
    sendQuery(copySql)
    // expect CopyInResponse (or an immediate error, e.g. bad table)
    var entered = false
    var err: Option[java.sql.SQLException] = None
    while (!entered && err.isEmpty) {
      val (tpe, body) = readMessage()
      tpe match {
        case 'G' => entered = true
        case 'E' =>
          err = Some(parseError(body)); drainToReady()
        case 'N' | 'S' | 'A' => ()
        case 'Z' =>
          err = Some(new java.sql.SQLException(
            s"statement did not enter COPY-IN mode: $copySql", "08P01"))
        case other =>
          err = Some(new java.sql.SQLException(
            s"unexpected message '${other.toChar}' before COPY-IN", "08P01"))
          drainToReady()
      }
    }
    err.foreach(throw _)
    val buf = new java.io.ByteArrayOutputStream(CopyBatchBytes + 8192)
    def flushData(): Unit = if (buf.size() > 0) {
      out.writeByte('d')
      out.writeInt(4 + buf.size())
      buf.writeTo(out)
      buf.reset()
    }
    try {
      while (rows.hasNext) {
        buf.write(rows.next())
        if (buf.size() >= CopyBatchBytes) flushData()
      }
      flushData()
      out.writeByte('c'); out.writeInt(4) // CopyDone
      out.flush()
    } catch {
      case e: IOException =>
        // server may have aborted the COPY mid-stream (e.g. malformed
        // row): surface ITS error if one is readable, else the IO one
        throw readPendingErrorOr(e)
    }
    var tag: Option[String] = None
    var done = false
    while (!done) {
      val (tpe, body) = readMessage()
      tpe match {
        case 'C' => tag = Some(cString(body, 0)._1)
        case 'E' => err = err.orElse(Some(parseError(body)))
        case 'N' | 'S' | 'A' => ()
        case 'Z' => done = true
        case _ => ()
      }
    }
    err.foreach(throw _)
    tag match {
      case Some(t) if t.startsWith("COPY ") => t.stripPrefix("COPY ").trim.toLong
      case other => throw new java.sql.SQLException(
        s"COPY did not complete: ${other.getOrElse("<no tag>")}", "08P01")
    }
  }

  def close(): Unit = {
    try { out.writeByte('X'); out.writeInt(4); out.flush() } catch { case _: IOException => () }
    try ch.close() catch { case _: IOException => () }
  }

  // ---- framing ----

  private def sendQuery(sql: String): Unit = {
    val bytes = sql.getBytes(UTF_8)
    out.writeByte('Q')
    out.writeInt(4 + bytes.length + 1)
    out.write(bytes); out.writeByte(0)
    out.flush()
  }

  private def sendCopyFail(reason: String): Unit = {
    val bytes = reason.getBytes(UTF_8)
    out.writeByte('f')
    out.writeInt(4 + bytes.length + 1)
    out.write(bytes); out.writeByte(0)
    out.flush()
  }

  private def readMessage(): (Char, Array[Byte]) = {
    val tpe = in.readByte().toChar
    val len = in.readInt()
    require(len >= 4 && len < (1 << 30), s"bad frame length $len for '$tpe'")
    val body = new Array[Byte](len - 4)
    in.readFully(body)
    (tpe, body)
  }

  private def drainToReady(): Unit = {
    var done = false
    while (!done) {
      val (tpe, _) = readMessage()
      if (tpe == 'Z') done = true
    }
  }

  private def readPendingErrorOr(e: IOException): Exception =
    try {
      var found: Option[java.sql.SQLException] = None
      var done = false
      while (!done) {
        val (tpe, body) = readMessage()
        tpe match {
          case 'E' => found = found.orElse(Some(parseError(body)))
          case 'Z' => done = true
          case _ => ()
        }
      }
      found.getOrElse(e)
    } catch { case _: IOException => e }
}

object PgWireClient {

  /** Text-format result of a simple query. `typeOids` aligns with
    * `columns` (pg_type OIDs from RowDescription — what a source scan
    * maps to a Spark schema). */
  final case class PgResult(columns: Seq[String], rows: Seq[Seq[String]],
      tags: Seq[String], typeOids: Seq[Int] = Nil) {
    def single: String = rows.head.head
  }

  private val CopyBatchBytes = 64 * 1024

  /** Where to reach the server. `UnixSocket` takes the DIRECTORY psql
    * -h style; the actual file is `.s.PGSQL.<port>` inside it. */
  sealed trait Target
  final case class UnixSocket(dir: String, port: Int = 5432) extends Target
  final case class Tcp(host: String, port: Int) extends Target

  /** Parse `jdbc:postgresql://host[:port]/db` (+ `pgwire.socket`
    * option override for unix-socket servers). Returns target and
    * database name. */
  def targetFor(url: String, options: Map[String, String]): Option[(Target, String)] = {
    val re = "jdbc:postgresql://([^/:]+)(?::(\\d+))?/([^?]+).*".r
    url match {
      case re(host, port, db) =>
        val p = Option(port).map(_.toInt).getOrElse(5432)
        val t = options.get("pgwire.socket") match {
          case Some(dir) => UnixSocket(dir, p)
          case None => Tcp(host, p)
        }
        Some((t, db))
      case _ => options.get("pgwire.socket").map(dir =>
        (UnixSocket(dir), options.getOrElse("pgwire.database", "postgres")))
    }
  }

  def connect(target: Target, user: String, database: String,
      password: Option[String] = None): PgWireClient = {
    val ch = target match {
      case UnixSocket(dir, port) =>
        val c = SocketChannel.open(StandardProtocolFamily.UNIX)
        c.connect(UnixDomainSocketAddress.of(s"$dir/.s.PGSQL.$port"))
        c
      case Tcp(host, port) =>
        val c = SocketChannel.open()
        c.connect(new InetSocketAddress(host, port))
        c
    }
    val in = new DataInputStream(new BufferedInputStream(Channels.newInputStream(ch), 1 << 16))
    val out = new DataOutputStream(new BufferedOutputStream(Channels.newOutputStream(ch), 1 << 16))
    // StartupMessage: no type byte; Int32 len, Int32 196608 (v3.0),
    // "user"\0 u\0 "database"\0 d\0 \0
    val params = Seq("user" -> user, "database" -> database)
    val payload = new java.io.ByteArrayOutputStream()
    params.foreach { case (k, v) =>
      payload.write(k.getBytes(UTF_8)); payload.write(0)
      payload.write(v.getBytes(UTF_8)); payload.write(0)
    }
    payload.write(0)
    out.writeInt(4 + 4 + payload.size())
    out.writeInt(196608)
    payload.writeTo(out)
    out.flush()

    val client = new PgWireClient(ch, in, out)
    // authentication exchange, then drain to ReadyForQuery
    var ready = false
    while (!ready) {
      val tpe = in.readByte().toChar
      val len = in.readInt()
      val body = new Array[Byte](len - 4)
      in.readFully(body)
      tpe match {
        case 'R' =>
          val code = ((body(0) & 0xff) << 24) | ((body(1) & 0xff) << 16) |
            ((body(2) & 0xff) << 8) | (body(3) & 0xff)
          code match {
            case 0 => () // AuthenticationOk (trust)
            case 3 => // CleartextPassword
              sendPassword(out, password.getOrElse(throw new java.sql.SQLException(
                "server requires a password and none was provided", "28P01")))
            case 5 => // MD5Password: md5(md5(password + user) + 4-byte salt)
              val salt = body.slice(4, 8)
              val pw = password.getOrElse(throw new java.sql.SQLException(
                "server requires a password and none was provided", "28P01"))
              val inner = md5Hex((pw + user).getBytes(UTF_8))
              val outer = md5Hex(inner.getBytes(UTF_8) ++ salt)
              sendPassword(out, "md5" + outer)
            case other =>
              ch.close()
              throw new java.sql.SQLException(
                s"unsupported authentication method $other (trust/cleartext/md5 only)",
                "28000")
          }
        case 'E' =>
          val err = parseError(body); ch.close(); throw err
        case 'S' | 'K' | 'N' => () // ParameterStatus / BackendKeyData / Notice
        case 'Z' => ready = true
        case other =>
          ch.close()
          throw new java.sql.SQLException(
            s"unexpected startup message '${other.toChar}'", "08P01")
      }
    }
    client
  }

  private def sendPassword(out: DataOutputStream, pw: String): Unit = {
    val b = pw.getBytes(UTF_8)
    out.writeByte('p'); out.writeInt(4 + b.length + 1)
    out.write(b); out.writeByte(0); out.flush()
  }

  private def md5Hex(bytes: Array[Byte]): String =
    BulkLoad.bytesToHex(MessageDigest.getInstance("MD5").digest(bytes)).toLowerCase

  // ---- message parsing (shared with the instance) ----

  private[sources] def cString(body: Array[Byte], from: Int): (String, Int) = {
    var end = from
    while (end < body.length && body(end) != 0) end += 1
    (new String(body, from, end - from, UTF_8), end + 1)
  }

  private[sources] def parseRowDescriptionTyped(
      body: Array[Byte]): Seq[(String, Int)] = {
    val n = ((body(0) & 0xff) << 8) | (body(1) & 0xff)
    var pos = 2
    (0 until n).map { _ =>
      val (name, next) = cString(body, pos)
      // layout after the name: tableOid(4) colno(2) typeOid(4)
      // typelen(2) typmod(4) format(2)
      val o = next + 6
      val oid = ((body(o) & 0xff) << 24) | ((body(o + 1) & 0xff) << 16) |
        ((body(o + 2) & 0xff) << 8) | (body(o + 3) & 0xff)
      pos = next + 18
      (name, oid)
    }
  }

  private[sources] def parseDataRow(body: Array[Byte]): Seq[String] = {
    val n = ((body(0) & 0xff) << 8) | (body(1) & 0xff)
    var pos = 2
    (0 until n).map { _ =>
      val len = ((body(pos) & 0xff) << 24) | ((body(pos + 1) & 0xff) << 16) |
        ((body(pos + 2) & 0xff) << 8) | (body(pos + 3) & 0xff)
      pos += 4
      if (len == -1) null
      else { val s = new String(body, pos, len, UTF_8); pos += len; s }
    }
  }

  private[sources] def parseError(body: Array[Byte]): java.sql.SQLException = {
    var pos = 0
    var message = "unknown error"
    var state = "XX000"
    var severity = ""
    while (pos < body.length && body(pos) != 0) {
      val code = body(pos).toChar
      val (value, next) = cString(body, pos + 1)
      code match {
        case 'M' => message = value
        case 'C' => state = value
        case 'S' => severity = value
        case _ => ()
      }
      pos = next
    }
    new java.sql.SQLException(s"$severity: $message", state)
  }
}
