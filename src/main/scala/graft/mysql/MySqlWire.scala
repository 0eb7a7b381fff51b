package graft.mysql

import java.io.{DataInputStream, OutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal MySQL client/server wire protocol (text protocol v10) —
  * enough to run the [[graft.dialect.MySql]] catalog queries against a
  * real MySQL/MariaDB server WITHOUT a JDBC driver on the classpath.
  *
  * Why this exists: the reference's MySQL flagship path (reference
  * mysql.rs:37-124) talks to a live server; this container ships
  * neither mysqld nor a MySQL JDBC driver, so the dialect SQL could
  * otherwise never execute over a real connection in-sandbox. The
  * protocol itself is public and stable (3-byte little-endian length +
  * sequence id framing, handshake v10, COM_QUERY text result sets), so
  * the library carries its own minimal client: it is validated
  * end-to-end against the in-JVM protocol-accurate fake server in the
  * test tree, and the SAME bytes work against a real server wherever
  * one exists (the LiveMySqlSpec recipe).
  *
  * Scope: handshake with empty-password auth (mysql_native_password
  * scramble of "" is the empty byte string per the public algorithm),
  * COM_QUERY with text result sets (all values arrive as strings —
  * exactly what the catalog snapshot wants), COM_PING, COM_QUIT.
  * Deliberately NOT a general driver: no prepared statements, no
  * compression, no TLS.
  */
object MySqlWire {

  // capability flags (public protocol constants)
  val ClientLongPassword = 0x00000001
  val ClientConnectWithDb = 0x00000008
  val ClientProtocol41 = 0x00000200
  val ClientSecureConnection = 0x00008000
  val ClientPluginAuth = 0x00080000

  /** One packet stream: MySQL frames every message as
    * [len:3 LE][seq:1][payload:len]. The sequence id restarts at 0 for
    * each command and increments per packet within a command-response
    * exchange; reads track the peer's counter so writes continue it.
    */
  final class PacketIO(in: DataInputStream, out: OutputStream) {
    private var seq = 0

    def resetSeq(): Unit = seq = 0

    def readPacket(): Array[Byte] = {
      val h = new Array[Byte](4)
      in.readFully(h)
      val len = (h(0) & 0xff) | ((h(1) & 0xff) << 8) | ((h(2) & 0xff) << 16)
      seq = (h(3) & 0xff) + 1
      val p = new Array[Byte](len)
      in.readFully(p)
      p
    }

    def writePacket(payload: Array[Byte]): Unit = {
      out.write(Array[Byte](
        (payload.length & 0xff).toByte,
        ((payload.length >> 8) & 0xff).toByte,
        ((payload.length >> 16) & 0xff).toByte,
        (seq & 0xff).toByte))
      out.write(payload)
      out.flush()
      seq += 1
    }
  }

  /** Length-encoded integers/strings — the protocol's variable-size
    * scalars. In row data, the 0xFB prefix is SQL NULL.
    */
  final class Reader(val b: Array[Byte]) {
    var pos = 0
    def u1(): Int = { val v = b(pos) & 0xff; pos += 1; v }
    def u2(): Int = u1() | (u1() << 8)
    def u3(): Int = u2() | (u1() << 16)
    def u4(): Long = u3().toLong | (u1().toLong << 24)
    def skip(n: Int): Unit = pos += n
    def cString(): String = {
      val start = pos
      while (b(pos) != 0) pos += 1
      val s = new String(b, start, pos - start, UTF_8)
      pos += 1
      s
    }
    def lenencInt(): Long = u1() match {
      case 0xfc => u2().toLong
      case 0xfd => u3().toLong
      case 0xfe => u4() | (u4() << 32)
      case v => v.toLong
    }
    def lenencBytes(): Array[Byte] = {
      val n = lenencInt().toInt
      val r = java.util.Arrays.copyOfRange(b, pos, pos + n)
      pos += n
      r
    }
    def lenencString(): String = new String(lenencBytes(), UTF_8)
    def remaining: Int = b.length - pos
  }

  final class Writer {
    private val bos = new java.io.ByteArrayOutputStream()
    def u1(v: Int): Writer = { bos.write(v & 0xff); this }
    def u2(v: Int): Writer = { u1(v); u1(v >> 8) }
    def u3(v: Int): Writer = { u2(v); u1(v >> 16) }
    def u4(v: Long): Writer = { u3(v.toInt); u1((v >> 24).toInt) }
    def bytes(v: Array[Byte]): Writer = { bos.write(v); this }
    def zeros(n: Int): Writer = { bos.write(new Array[Byte](n)); this }
    def cString(s: String): Writer = { bytes(s.getBytes(UTF_8)); u1(0) }
    def lenencInt(v: Long): Writer =
      if (v < 0xfb) u1(v.toInt)
      else if (v < 0x10000) { u1(0xfc); u2(v.toInt) }
      else if (v < 0x1000000) { u1(0xfd); u3(v.toInt) }
      else { u1(0xfe); u4(v); u4(v >> 32) }
    def lenencString(s: String): Writer = {
      val b = s.getBytes(UTF_8); lenencInt(b.length.toLong); bytes(b)
    }
    def result(): Array[Byte] = bos.toByteArray
  }

  case class ResultSet(columns: Seq[String], rows: Seq[Seq[String]])

  case class MySqlWireException(code: Int, message: String)
    extends RuntimeException(s"MySQL error $code: $message")

  /** Blocking single-connection client. Empty-password accounts only
    * (the catalog introspection role the snapshot path uses).
    */
  final class Client(host: String, port: Int, user: String, database: String) {
    private val socket = new Socket(host, port)
    socket.setTcpNoDelay(true)
    private val io = new PacketIO(
      new DataInputStream(new java.io.BufferedInputStream(socket.getInputStream)),
      new java.io.BufferedOutputStream(socket.getOutputStream))

    // ---- handshake ----
    locally {
      val hs = new Reader(io.readPacket())
      require(hs.u1() == 10, "unsupported handshake protocol version")
      hs.cString() // server version
      hs.u4() // thread id
      hs.skip(8 + 1) // auth-plugin-data part 1 + filler
      // remaining capability/charset/status fields are irrelevant to an
      // empty-password login; don't parse further.
      val caps = ClientLongPassword | ClientConnectWithDb | ClientProtocol41 |
        ClientSecureConnection | ClientPluginAuth
      val resp = new Writer()
        .u4(caps.toLong)
        .u4(0x01000000L) // max packet size
        .u1(33) // utf8_general_ci
        .zeros(23)
        .cString(user)
        .lenencInt(0L) // empty auth response: scramble("") = ""
        .cString(database)
        .cString("mysql_native_password")
      io.writePacket(resp.result())
      expectOk(io.readPacket())
    }

    private def expectOk(p: Array[Byte]): Unit = (p(0) & 0xff) match {
      case 0x00 => ()
      case 0xff => throw parseErr(p)
      case other => throw new IllegalStateException(f"expected OK packet, got 0x$other%02x")
    }

    private def parseErr(p: Array[Byte]): MySqlWireException = {
      val r = new Reader(p)
      r.u1() // 0xff
      val code = r.u2()
      if (r.b(r.pos) == '#') r.skip(6) // sql-state marker + 5 chars
      MySqlWireException(code, new String(r.b, r.pos, r.remaining, UTF_8))
    }

    private def isEof(p: Array[Byte]): Boolean = (p(0) & 0xff) == 0xfe && p.length < 9

    /** Run a text-protocol query; every value comes back as the
      * server's string rendering (SQL NULL → null).
      */
    def query(sql: String): ResultSet = {
      io.resetSeq()
      io.writePacket(new Writer().u1(0x03).bytes(sql.getBytes(UTF_8)).result())
      val first = io.readPacket()
      (first(0) & 0xff) match {
        case 0x00 => ResultSet(Nil, Nil) // OK: no result set
        case 0xff => throw parseErr(first)
        case _ =>
          val colCount = new Reader(first).lenencInt().toInt
          val columns = (1 to colCount).map { _ =>
            val c = new Reader(io.readPacket())
            c.lenencString() // "def"
            c.lenencString(); c.lenencString(); c.lenencString() // schema, table, org_table
            val name = c.lenencString()
            name
          }
          expectEof()
          // an ERR packet mid-result-set (server timeout, killed query)
          // must THROW — swallowing it would return a truncated set
          // that looks like a successful smaller catalog
          val rows = Iterator.continually(io.readPacket())
            .map { p =>
              if ((p(0) & 0xff) == 0xff) throw parseErr(p); p
            }
            .takeWhile(p => !isEof(p))
            .map { p =>
              val r = new Reader(p)
              (1 to colCount).map { _ =>
                if ((r.b(r.pos) & 0xff) == 0xfb) { r.skip(1); null }
                else r.lenencString()
              }
            }.toVector
          ResultSet(columns, rows.map(_.toSeq))
      }
    }

    private def expectEof(): Unit = {
      val p = io.readPacket()
      if (!isEof(p)) throw new IllegalStateException("expected EOF packet")
    }

    def ping(): Unit = {
      io.resetSeq()
      io.writePacket(new Writer().u1(0x0e).result())
      expectOk(io.readPacket())
    }

    def close(): Unit = {
      try {
        io.resetSeq()
        io.writePacket(new Writer().u1(0x01).result()) // COM_QUIT
      } catch { case _: java.io.IOException => () }
      socket.close()
    }
  }
}
