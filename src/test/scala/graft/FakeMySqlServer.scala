package graft

import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.concurrent.TrieMap

import graft.mysql.MySqlWire.{PacketIO, Reader, Writer}

/** In-JVM, protocol-accurate fake MySQL server — the actionable form of
  * the environment-blocked live-MySQL e2e: it speaks the PUBLIC wire
  * protocol (handshake v10, COM_QUERY text result sets with column
  * definitions and EOF framing, COM_PING, COM_QUIT, ERR packets) over a
  * real TCP socket, and serves canned result sets keyed by the EXACT
  * SQL text of each query. Anything not in the canned map gets a real
  * ERR packet (ER_PARSE_ERROR-shaped), so a dialect-SQL typo fails the
  * e2e instead of silently matching.
  *
  * The server records every COM_QUERY payload verbatim
  * ([[receivedQueries]]), letting the spec assert byte-identical SQL
  * reached the server — the "did the right text go down the wire" check
  * a mocked-at-the-DataFrame-level test can never make.
  *
  * Databases: the handshake's schema selects which canned catalog the
  * connection sees (graft_base vs graft_target), mirroring how the real
  * snapshot pipeline opens one connection per side.
  */
final class FakeMySqlServer(
    resultSets: Map[String, Map[String, (Seq[String], Seq[Seq[String]])]]) {

  private val server = new ServerSocket(0)
  val port: Int = server.getLocalPort
  val receivedQueries = new TrieMap[String, Vector[String]]()
  @volatile private var running = true

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = server.accept()
        val t = new Thread(() => handle(s))
        t.setDaemon(true)
        t.start()
      } catch { case _: java.io.IOException => () }
    }
  })
  acceptor.setDaemon(true)
  acceptor.start()

  def close(): Unit = { running = false; server.close() }

  private def handle(socket: Socket): Unit = {
    socket.setTcpNoDelay(true)
    val io = new PacketIO(
      new java.io.DataInputStream(new java.io.BufferedInputStream(socket.getInputStream)),
      new java.io.BufferedOutputStream(socket.getOutputStream))
    try {
      // ---- Initial Handshake Packet (protocol version 10) ----
      val caps = graft.mysql.MySqlWire.ClientLongPassword |
        graft.mysql.MySqlWire.ClientConnectWithDb |
        graft.mysql.MySqlWire.ClientProtocol41 |
        graft.mysql.MySqlWire.ClientSecureConnection |
        graft.mysql.MySqlWire.ClientPluginAuth
      val authData = Array.tabulate[Byte](20)(i => (i + 1).toByte) // nonzero scramble
      io.writePacket(new Writer()
        .u1(10)
        .cString("8.0.0-graft-fake")
        .u4(42L) // connection id
        .bytes(authData.take(8)).u1(0) // auth-plugin-data part 1 + filler
        .u2(caps & 0xffff) // capability flags, lower
        .u1(33) // utf8_general_ci
        .u2(0x0002) // status: autocommit
        .u2((caps >> 16) & 0xffff) // capability flags, upper
        .u1(21) // auth plugin data len
        .zeros(10) // reserved
        .bytes(authData.drop(8)).u1(0) // part 2 (12 bytes) + NUL
        .cString("mysql_native_password")
        .result())
      // ---- Handshake Response 41 ----
      val resp = new Reader(io.readPacket())
      val clientCaps = resp.u4()
      require((clientCaps & graft.mysql.MySqlWire.ClientProtocol41) != 0,
        "client must speak protocol 41")
      resp.u4() // max packet size
      resp.u1() // charset
      resp.skip(23)
      val user = resp.cString()
      val authLen = resp.lenencInt().toInt
      resp.skip(authLen)
      val database =
        if ((clientCaps & graft.mysql.MySqlWire.ClientConnectWithDb) != 0) resp.cString()
        else ""
      require(user.nonEmpty, "empty username")
      val catalog = resultSets.getOrElse(database, Map.empty)
      writeOk(io)
      // ---- command loop ----
      // readPacket picks up each command's sequence id (always 0 for a
      // fresh command) and responses continue from it — no explicit
      // reset needed server-side
      var open = true
      while (open) {
        val cmd = io.readPacket()
        (cmd(0) & 0xff) match {
          case 0x01 => open = false // COM_QUIT
          case 0x0e => writeOk(io) // COM_PING
          case 0x03 =>
            val sql = new String(cmd, 1, cmd.length - 1, UTF_8)
            receivedQueries.updateWith(database) {
              case Some(v) => Some(v :+ sql)
              case None => Some(Vector(sql))
            }
            catalog.get(sql) match {
              case Some((cols, rows)) => writeResultSet(io, cols, rows)
              // fault injection: a query asking for it gets a valid
              // result-set header + one row, then an ERR packet where
              // the next row belongs — the "server killed the query
              // mid-stream" shape a client must surface, not swallow
              case None if sql == FakeMySqlServer.MidStreamErrSql =>
                io.writePacket(new Writer().lenencInt(1L).result())
                writeColumnDef(io, "c")
                writeEof(io)
                io.writePacket(new Writer().lenencString("row1").result())
                writeErr(io, 1317, "Query execution was interrupted")
              case None => writeErr(io, 1064,
                s"graft-fake: unexpected query (not in canned catalog): ${sql.take(120)}")
            }
          case other => writeErr(io, 1047, f"unsupported command 0x$other%02x")
        }
      }
    } catch {
      case _: java.io.IOException => ()
    } finally socket.close()
  }

  private def writeOk(io: PacketIO): Unit =
    io.writePacket(new Writer().u1(0x00).lenencInt(0).lenencInt(0)
      .u2(0x0002).u2(0).result())

  private def writeErr(io: PacketIO, code: Int, msg: String): Unit =
    io.writePacket(new Writer().u1(0xff).u2(code)
      .u1('#').bytes("42000".getBytes(UTF_8))
      .bytes(msg.getBytes(UTF_8)).result())

  private def writeColumnDef(io: PacketIO, name: String): Unit =
    io.writePacket(new Writer()
      .lenencString("def")
      .lenencString("") // schema
      .lenencString("graft_snap") // virtual table
      .lenencString("") // org table
      .lenencString(name)
      .lenencString(name) // org name
      .lenencInt(0x0c) // fixed-length fields length
      .u2(33) // charset utf8_general_ci
      .u4(1024L) // column length
      .u1(0xfd) // MYSQL_TYPE_VAR_STRING
      .u2(0) // flags
      .u1(0) // decimals
      .u2(0) // filler
      .result())

  private def writeResultSet(
      io: PacketIO, cols: Seq[String], rows: Seq[Seq[String]]): Unit = {
    io.writePacket(new Writer().lenencInt(cols.length.toLong).result())
    cols.foreach(writeColumnDef(io, _))
    writeEof(io)
    rows.foreach { row =>
      val w = new Writer()
      row.foreach {
        case null => w.u1(0xfb)
        case v => w.lenencString(v)
      }
      io.writePacket(w.result())
    }
    writeEof(io)
  }

  private def writeEof(io: PacketIO): Unit =
    io.writePacket(new Writer().u1(0xfe).u2(0).u2(0x0002).result())
}

object FakeMySqlServer {
  /** Any connection may send this to get a result set that dies
    * mid-stream with ERR 1317 after one row.
    */
  val MidStreamErrSql = "GRAFT_FAKE_MIDSTREAM_ERR"
}
