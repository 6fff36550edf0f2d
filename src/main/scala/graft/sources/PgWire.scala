package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream,
  DataOutputStream, IOException}
import java.net.{InetSocketAddress, StandardProtocolFamily, UnixDomainSocketAddress}
import java.nio.ByteBuffer
import java.nio.channels.{Channels, SocketChannel}
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal Postgres v3 frontend for exec + COPY FROM STDIN — the
  * pure-JVM twin of the psql-subprocess writer (round-14 verdict 7).
  *
  * PgCopySink's executor fan-out shells out to the `psql` binary per
  * (partition, shard) stream; on container clusters without postgres
  * client tools that binary is a real deployment constraint. This
  * client speaks the published v3 message protocol
  * (postgresql.org/docs/current/protocol-message-formats.html)
  * directly over the server's unix socket (host starting with "/") or
  * TCP, so the sink runs anywhere the socket reaches. Scope is exactly
  * what the COPY writer needs — startup + trust/cleartext/md5 auth,
  * simple query, CopyIn streaming — not a general driver (no extended
  * protocol, no result-row decoding, SCRAM intentionally unsupported:
  * the throwaway local server authenticates by OS peer).
  *
  * Error contract: a server ErrorResponse during exec/copy surfaces as
  * IOException after the protocol resynchronizes on ReadyForQuery, so
  * the connection stays usable for a ROLLBACK; `close()` mid-COPY
  * drops the socket, which aborts the server-side transaction — the
  * wire analogue of killing psql.
  */
private[sources] final class PgWire(host: String, port: Int, db: String,
    user: String = "", password: String = "") {
  private val chan: SocketChannel =
    if (host.startsWith("/")) {
      val c = SocketChannel.open(StandardProtocolFamily.UNIX)
      c.connect(UnixDomainSocketAddress.of(s"$host/.s.PGSQL.$port"))
      c
    } else SocketChannel.open(new InetSocketAddress(host, port))
  private val out = new DataOutputStream(
    new BufferedOutputStream(Channels.newOutputStream(chan), 1 << 16))
  private val in = new DataInputStream(
    new BufferedInputStream(Channels.newInputStream(chan), 1 << 16))
  private val usr = if (user.nonEmpty) user else System.getProperty("user.name")

  // ---- framing ----
  private def send(t: Char, payload: Array[Byte]): Unit = {
    out.writeByte(t)
    out.writeInt(payload.length + 4)
    out.write(payload)
  }
  private def cstr(s: String): Array[Byte] = {
    val b = s.getBytes(UTF_8)
    java.util.Arrays.copyOf(b, b.length + 1) // NUL-terminated
  }
  private def readMsg(): (Char, Array[Byte]) = {
    val t = in.readByte().toChar
    val len = in.readInt()
    require(len >= 4 && len < (1 << 26), s"implausible message length $len")
    val p = new Array[Byte](len - 4)
    in.readFully(p)
    (t, p)
  }
  private def errText(p: Array[Byte]): String = {
    // ErrorResponse fields: repeated (code byte, cstring); S/M are the
    // severity and human message
    var i = 0
    val fields = scala.collection.mutable.Map[Char, String]()
    while (i < p.length && p(i) != 0) {
      val code = p(i).toChar
      val end = p.indexOf(0.toByte, i + 1)
      fields(code) = new String(p, i + 1, end - i - 1, UTF_8)
      i = end + 1
    }
    s"${fields.getOrElse('S', "ERROR")}: ${fields.getOrElse('M', "unknown")}"
  }

  // ---- startup + auth ----
  locally {
    val params = cstr("user") ++ cstr(usr) ++ cstr("database") ++ cstr(db) ++
      Array(0.toByte)
    out.writeInt(params.length + 8)
    out.writeInt(0x00030000) // protocol 3.0
    out.write(params)
    out.flush()
    var authed = false
    while (!authed) {
      val (t, p) = readMsg()
      t match {
        case 'R' =>
          ByteBuffer.wrap(p).getInt match {
            case 0 => authed = true
            case 3 =>
              send('p', cstr(password)); out.flush()
            case 5 =>
              val md = java.security.MessageDigest.getInstance("MD5")
              def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
              val inner = hex(md.digest((password + usr).getBytes(UTF_8)))
              md.reset()
              md.update(inner.getBytes(UTF_8))
              md.update(p, 4, 4) // salt
              send('p', cstr("md5" + hex(md.digest()))); out.flush()
            case other => throw new IOException(
              s"unsupported auth method $other (trust/cleartext/md5 only)")
          }
        case 'E' => throw new IOException(s"pg startup failed: ${errText(p)}")
        case _ => () // ParameterStatus etc. before auth completes
      }
    }
    waitReady()
  }

  /** Consume messages until ReadyForQuery; throw the first
    * ErrorResponse AFTER resync (so the connection survives). */
  private def waitReady(): Unit = {
    var err: String = null
    var ready = false
    while (!ready) {
      val (t, p) = readMsg()
      t match {
        case 'Z' => ready = true
        case 'E' => if (err == null) err = errText(p)
        case _ => () // CommandComplete, RowDescription/DataRow (results
                     // are discarded — this client runs DDL/DML only),
                     // ParameterStatus, Notice, BackendKeyData
      }
    }
    if (err != null) throw new IOException(s"pg: $err")
  }

  /** Run SQL (possibly multi-statement) to completion; no result rows
    * are surfaced. */
  def exec(sql: String): Unit = {
    send('Q', cstr(sql))
    out.flush()
    waitReady()
  }

  /** Send a COPY ... FROM STDIN statement and wait for CopyInResponse;
    * the connection is then in copy-in mode. */
  def copyInBegin(sql: String): Unit = {
    send('Q', cstr(sql))
    out.flush()
    var inCopy = false
    var err: String = null
    while (!inCopy) {
      val (t, p) = readMsg()
      t match {
        case 'G' => inCopy = true
        case 'E' => err = errText(p)
        case 'Z' =>
          // statement failed before copy mode — already resynced
          throw new IOException(s"pg COPY rejected: ${String.valueOf(err)}")
        case _ => ()
      }
    }
  }

  /** Stream a chunk of COPY payload (CSV bytes, need not align to row
    * boundaries). */
  def copyData(bytes: Array[Byte], off: Int, len: Int): Unit = {
    out.writeByte('d')
    out.writeInt(len + 4)
    out.write(bytes, off, len)
  }

  /** End the COPY stream and wait for the command to complete. */
  def copyEnd(): Unit = {
    send('c', Array.emptyByteArray)
    out.flush()
    waitReady()
  }

  def close(): Unit = {
    try { send('X', Array.emptyByteArray); out.flush() }
    catch { case _: Throwable => () }
    try chan.close() catch { case _: Throwable => () }
  }

  /** Failure-path close: just drop the socket — the server aborts any
    * open transaction/copy, nothing commits. */
  def closeAbort(): Unit = { try chan.close() catch { case _: Throwable => () } }
}
