package graft

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.server.MysqlServer

/** A raw-socket MySQL CLIENT (handshake parse, HandshakeResponse41,
  * COM_QUERY, text-resultset decode — written against the public
  * protocol docs) driven end-to-end against [[MysqlServer]]: the
  * counterpart of the reference's connection-phase + COM_QUERY tests
  * (doradb-protocol/src/mysql/handshake.rs, cmd/mod.rs:89-92). */
class MysqlProtocolSpec extends AnyFunSuite {
  import MysqlServer.{readPacket, writePacket, leBytes, readLenencInt}

  private lazy val spark = TestSpark.spark

  /** Minimal client connection: performs the connection phase (computing
    * the real scramble for the offered auth plugin from the handshake
    * salt when a password is given, answering AuthSwitchRequest /
    * AuthMoreData like a stock client) and leaves the socket in the
    * command phase. `authError` carries the server's ERR message when
    * access was denied. `plugin` = the auth plugin this client OFFERS in
    * its HandshakeResponse41 (None = a pluginless pre-5.6-style client
    * that just sends a native scramble). */
  private final class Client(port: Int, user: String = "graft",
      password: Option[String] = None, plugin: Option[String] = None,
      tls: Boolean = false, forceFullAuth: Boolean = false,
      multi: Boolean = false) {
    private var sock: Socket = new Socket("127.0.0.1", port)
    private var in = new BufferedInputStream(sock.getInputStream)
    private var out = new BufferedOutputStream(sock.getOutputStream)

    /** Trust-all client TLS context (the spec talks to its own
      * self-signed test keystore). */
    private def trustAllContext: javax.net.ssl.SSLContext = {
      val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
      ctx.init(null, Array[javax.net.ssl.TrustManager](
        new javax.net.ssl.X509TrustManager {
          def getAcceptedIssuers: Array[java.security.cert.X509Certificate] =
            Array.empty
          def checkClientTrusted(
              c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
          def checkServerTrusted(
              c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
        }), null)
      ctx
    }

    private def scrambleFor(p: String, salt: Array[Byte]): Array[Byte] =
      password.map { pw =>
        if (p == MysqlServer.CachingSha2Plugin)
          MysqlServer.cachingSha2Scramble(salt, pw)
        else MysqlServer.nativeScramble(salt, pw)
      }.getOrElse(Array.emptyByteArray)

    val (serverVersion, connectionId, advertisedPlugin, serverCaps,
        authError) = {
      val (seq, hs) = readPacket(in)
      assert(seq == 0)
      assert(hs(0) == 10, s"protocol version ${hs(0)}")
      val verEnd = hs.indexOf(0, 1)
      val ver = new String(hs, 1, verEnd - 1, StandardCharsets.US_ASCII)
      val p = verEnd + 1
      val connId = MysqlServer.leU32(hs, p)
      // capability flags: lower 2 bytes after salt part 1 + filler,
      // upper 2 bytes after charset + status
      val capsLo = (hs(p + 13) & 0xFFL) | ((hs(p + 14) & 0xFFL) << 8)
      val capsHi = (hs(p + 18) & 0xFFL) | ((hs(p + 19) & 0xFFL) << 8)
      val svrCaps = capsLo | (capsHi << 16)
      // salt = auth-plugin-data part 1 (8 bytes at p+4) ‖ part 2
      // (12 bytes past the filler/caps/charset/status/reserved block)
      val salt = new Array[Byte](20)
      System.arraycopy(hs, p + 4, salt, 0, 8)
      System.arraycopy(hs, p + 31, salt, 8, 12)
      // trailing NUL-terminated auth plugin name after salt part 2's NUL
      val advertised = {
        val start = p + 31 + 12 + 1
        val end = { val e = hs.indexOf(0, start); if (e < 0) hs.length else e }
        new String(hs, start, end - start, StandardCharsets.US_ASCII)
      }
      var flags = 0x00000200 | 0x00008000 // PROTOCOL_41 | SECURE_CONN
      if (plugin.isDefined) flags |= 0x00080000 // PLUGIN_AUTH
      if (tls) flags |= 0x00000800 // CLIENT_SSL
      if (multi) flags |= 0x00010000 // CLIENT_MULTI_STATEMENTS
      var respSeq = 1
      if (tls) {
        // SSLRequest: the 32-byte head only, then upgrade the socket
        val sr = new java.io.ByteArrayOutputStream()
        sr.write(leBytes(flags, 4))
        sr.write(leBytes(1 << 24, 4))
        sr.write(255); sr.write(new Array[Byte](23))
        writePacket(out, 1, sr.toByteArray)
        out.flush()
        val ssl = trustAllContext.getSocketFactory
          .createSocket(sock, "127.0.0.1", port, false)
          .asInstanceOf[javax.net.ssl.SSLSocket]
        ssl.setUseClientMode(true)
        sock = ssl
        in = new BufferedInputStream(ssl.getInputStream)
        out = new BufferedOutputStream(ssl.getOutputStream)
        respSeq = 2
      }
      // HandshakeResponse41: flags, max packet, charset, 23 zeros,
      // NUL-terminated user, length-prefixed auth response (SECURE_CONN),
      // then the offered plugin name when PLUGIN_AUTH is set.
      val scramble =
        if (forceFullAuth) Array.emptyByteArray
        else scrambleFor(plugin.getOrElse(MysqlServer.NativePlugin), salt)
      val buf = new java.io.ByteArrayOutputStream()
      buf.write(leBytes(flags, 4))
      buf.write(leBytes(1 << 24, 4))
      buf.write(255); buf.write(new Array[Byte](23))
      buf.write(user.getBytes(StandardCharsets.UTF_8)); buf.write(0)
      buf.write(scramble.length); buf.write(scramble, 0, scramble.length)
      plugin.foreach { pl =>
        buf.write(pl.getBytes(StandardCharsets.US_ASCII)); buf.write(0)
      }
      writePacket(out, respSeq, buf.toByteArray)
      out.flush() // writePacket leaves flushing to response boundaries
      // negotiation loop: OK / ERR terminate; AuthSwitchRequest (0xFE)
      // re-scrambles with the named plugin; AuthMoreData (0x01) is
      // fast_auth_success (0x03, OK follows) or
      // perform_full_authentication (0x04 — answered with the RSA-key
      // request a stock non-TLS client would send).
      var err: Option[String] = None
      var done = false
      while (!done) {
        val (s, pkt) = readPacket(in)
        (pkt(0) & 0xFF) match {
          case 0x00 => done = true
          case 0xFF =>
            err = Some(new String(pkt, 9, pkt.length - 9,
              StandardCharsets.UTF_8))
            done = true
          case 0xFE =>
            val nameEnd = pkt.indexOf(0.toByte, 1)
            val swPlugin = new String(pkt, 1, nameEnd - 1,
              StandardCharsets.US_ASCII)
            val swSalt = java.util.Arrays.copyOfRange(pkt, nameEnd + 1,
              math.min(pkt.length, nameEnd + 21))
            writePacket(out, s + 1, scrambleFor(swPlugin, swSalt))
            out.flush()
          case 0x01 =>
            if (pkt.length >= 2 && pkt(1) == 4) {
              // perform_full_authentication: a TLS client sends its
              // plaintext password (NUL-terminated); a plaintext one
              // requests the RSA public key (which this server refuses)
              if (tls) {
                val pw = password.getOrElse("")
                  .getBytes(StandardCharsets.UTF_8)
                writePacket(out, s + 1, pw ++ Array[Byte](0))
              } else writePacket(out, s + 1, Array[Byte](0x02))
              out.flush()
            } // 0x03 = fast_auth_success: the OK arrives next
          case other => fail(s"unexpected auth packet first byte $other")
        }
      }
      (ver, connId, advertised, svrCaps, err)
    }

    /** Send one raw command payload (fuzzing / malformed-frame tests). */
    def sendRaw(payload: Array[Byte]): Unit = {
      writePacket(out, 0, payload)
      out.flush()
    }

    /** COM_CHANGE_USER with the given credentials: sends the command,
      * answers the server's AuthSwitchRequest with a scramble over the
      * FRESH salt it carries, and drains to the terminal packet. */
    def changeUser(nu: String, npw: Option[String]): Either[String, Unit] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(MysqlServer.ComChangeUser)
      b.write(nu.getBytes(StandardCharsets.UTF_8)); b.write(0)
      b.write(0) // empty auth response — the server re-asks via switch
      b.write(0) // database: none
      b.write(leBytes(255, 2)) // charset
      sendRaw(b.toByteArray)
      val (s1, p1) = readPacket(in)
      (p1(0) & 0xFF) match {
        case 0xFF =>
          return Left(new String(p1, 9, p1.length - 9, StandardCharsets.UTF_8))
        case 0xFE => // AuthSwitchRequest: plugin NUL, fresh salt NUL
          val pe = p1.indexOf(0, 1)
          val plug = new String(p1, 1, pe - 1, StandardCharsets.US_ASCII)
          val se = { val i = p1.indexOf(0, pe + 1); if (i < 0) p1.length else i }
          val salt2 = java.util.Arrays.copyOfRange(p1, pe + 1, se)
          val scr = npw.map { pw =>
            if (plug == MysqlServer.CachingSha2Plugin)
              MysqlServer.cachingSha2Scramble(salt2, pw)
            else MysqlServer.nativeScramble(salt2, pw)
          }.getOrElse(Array.emptyByteArray)
          writePacket(out, s1 + 1, scr); out.flush()
        case other => return Left(f"unexpected packet 0x$other%02x")
      }
      var i = 0
      while (i < 4) {
        val (s, p) = readPacket(in)
        (p(0) & 0xFF) match {
          case 0x00 => return Right(())
          case 0xFF =>
            return Left(new String(p, 9, p.length - 9, StandardCharsets.UTF_8))
          case 0x01 if p.length >= 2 && p(1) == 0x04 =>
            // perform_full_authentication expects a RESPONSE: ask for
            // the (unserved) RSA key — the plaintext server answers a
            // clean terminal ERR instead of waiting forever
            writePacket(out, s + 1, Array[Byte](0x02)); out.flush()
          case _ => // AuthMoreData fast_auth_success — keep draining
        }
        i += 1
      }
      Left("no terminal packet after auth switch")
    }

    /** Read one packet; Some(message) if it is an ERR packet. */
    def readErr(): Option[String] = {
      val (_, p) = readPacket(in)
      if ((p(0) & 0xFF) == 0xFF)
        Some(new String(p, 9, p.length - 9, StandardCharsets.UTF_8))
      else None
    }

    /** Parse one TEXT resultset whose first (column-count) packet has
      * already been read; returns columns, rows, and the TERMINAL
      * packet's status flags — the shared reader behind [[query]] and
      * [[queryAll]]. A mid-resultset ERR surfaces as Left. */
    /** Sequence-id of the last packet [[readTextResultset]] consumed —
      * lets [[queryAll]] assert CONTINUOUS numbering across chained
      * resultsets, the check libmysql clients enforce (pkt_nr). */
    private var lastSeqRead = 0

    private def readTextResultset(first: Array[Byte])
        : Either[String, (Seq[String], Seq[Seq[Option[String]]], Int)] = {
      val (nCols, _) = readLenencInt(first, 0)
      val cols = (0 until nCols.toInt).map { _ =>
        val (ds, defPkt) = readPacket(in)
        assert(ds == lastSeqRead + 1,
          s"packet seq jumped ${lastSeqRead} -> $ds")
        lastSeqRead = ds
        // ColumnDefinition41: skip def/schema/table/org_table, read name
        var off = 0
        var names = List.empty[String]
        (0 until 6).foreach { _ =>
          val (len, used) = readLenencInt(defPkt, off)
          names ::= new String(defPkt, off + used, len.toInt,
            StandardCharsets.UTF_8)
          off += used + len.toInt
        }
        names(1) // 5th lenenc string = column name
      }
      val (es, eof1) = readPacket(in)
      assert((eof1(0) & 0xFF) == 0xFE, "expected EOF after column defs")
      assert(es == lastSeqRead + 1, s"packet seq jumped ${lastSeqRead} -> $es")
      lastSeqRead = es
      val rows = scala.collection.mutable.ArrayBuffer.empty[Seq[Option[String]]]
      while (true) {
        val (ps, p) = readPacket(in)
        assert(ps == lastSeqRead + 1,
          s"packet seq jumped ${lastSeqRead} -> $ps")
        lastSeqRead = ps
        if ((p(0) & 0xFF) == 0xFE && p.length < 9)
          return Right((cols, rows.toSeq,
            (p(3) & 0xFF) | ((p(4) & 0xFF) << 8)))
        else if ((p(0) & 0xFF) == 0xFF)
          return Left(new String(p, 9, p.length - 9, StandardCharsets.UTF_8))
        else {
          var off = 0
          val vals = scala.collection.mutable.ArrayBuffer.empty[Option[String]]
          while (off < p.length) {
            if ((p(off) & 0xFF) == 0xFB) { vals += None; off += 1 }
            else {
              val (len, used) = readLenencInt(p, off)
              vals += Some(new String(p, off + used, len.toInt,
                StandardCharsets.UTF_8))
              off += used + len.toInt
            }
          }
          rows += vals.toSeq
        }
      }
      sys.error("unreachable")
    }

    /** COM_QUERY → Left(err message) or Right(columns, rows-as-strings). */
    def query(sql: String): Either[String, (Seq[String], Seq[Seq[Option[String]]])] = {
      val payload = Array[Byte](MysqlServer.ComQuery.toByte) ++
        sql.getBytes(StandardCharsets.UTF_8)
      writePacket(out, 0, payload)
      out.flush()
      val (s, first) = readPacket(in)
      lastSeqRead = s
      (first(0) & 0xFF) match {
        case 0xFF =>
          Left(new String(first, 9, first.length - 9, StandardCharsets.UTF_8))
        case 0x00 => Right((Nil, Nil))
        case _ => readTextResultset(first).map { case (c, r, _) => (c, r) }
      }
    }

    /** COM_QUERY under CLIENT_MULTI_STATEMENTS: reads resultsets until
      * the TERMINAL packet of one stops carrying
      * SERVER_MORE_RESULTS_EXISTS (0x0008) — the packet-level contract
      * a stock connector's allowMultiQueries path follows. An ERR ends
      * the sequence (the server aborted the rest). */
    def queryAll(sql: String)
        : Seq[Either[String, (Seq[String], Seq[Seq[Option[String]]])]] = {
      writePacket(out, 0, Array[Byte](MysqlServer.ComQuery.toByte) ++
        sql.getBytes(StandardCharsets.UTF_8))
      out.flush()
      val acc = scala.collection.mutable.ArrayBuffer
        .empty[Either[String, (Seq[String], Seq[Seq[Option[String]]])]]
      var more = true
      var chainStarted = false
      while (more) {
        val (fs, first) = readPacket(in)
        // continuity across the WHOLE response: the next resultset's
        // first packet continues the previous one's numbering
        if (chainStarted)
          assert(fs == lastSeqRead + 1,
            s"resultset chain seq jumped ${lastSeqRead} -> $fs")
        lastSeqRead = fs
        chainStarted = true
        (first(0) & 0xFF) match {
          case 0xFF =>
            acc += Left(new String(first, 9, first.length - 9,
              StandardCharsets.UTF_8))
            more = false
          case 0x00 => // OK: affected + insertId lenencs, then status u16
            val (_, u1) = readLenencInt(first, 1)
            val (_, u2) = readLenencInt(first, 1 + u1)
            val st = (first(1 + u1 + u2) & 0xFF) |
              ((first(2 + u1 + u2) & 0xFF) << 8)
            acc += Right((Nil, Nil))
            more = (st & 0x0008) != 0
          case _ =>
            readTextResultset(first) match {
              case Left(err) =>
                acc += Left(err)
                more = false
              case Right((cols, rows, status)) =>
                acc += Right((cols, rows))
                more = (status & 0x0008) != 0
            }
        }
      }
      acc.toSeq
    }

    /** COM_QUERY expecting an OK (no resultset) → Left(err) or
      * Right(affected_rows from the OK payload). */
    def exec(sql: String): Either[String, Long] = {
      val payload = Array[Byte](MysqlServer.ComQuery.toByte) ++
        sql.getBytes(StandardCharsets.UTF_8)
      writePacket(out, 0, payload)
      out.flush()
      val (_, first) = readPacket(in)
      (first(0) & 0xFF) match {
        case 0xFF =>
          Left(new String(first, 9, first.length - 9, StandardCharsets.UTF_8))
        case 0x00 => Right(readLenencInt(first, 1)._1)
        case other => Left(s"expected OK, got first byte $other")
      }
    }

    def ping(): Boolean = {
      writePacket(out, 0, Array[Byte](MysqlServer.ComPing.toByte))
      out.flush()
      (readPacket(in)._2(0) & 0xFF) == 0x00
    }

    /** COM_STATISTICS → the raw status line (no packet envelope). */
    def statistics(): String = {
      writePacket(out, 0, Array[Byte](MysqlServer.ComStatistics.toByte))
      out.flush()
      new String(readPacket(in)._2, StandardCharsets.US_ASCII)
    }

    /** COM_PROCESS_INFO → the processlist resultset. */
    def processInfo()
        : Either[String, (Seq[String], Seq[Seq[Option[String]]])] = {
      writePacket(out, 0, Array[Byte](MysqlServer.ComProcessInfo.toByte))
      out.flush()
      val (s, first) = readPacket(in)
      lastSeqRead = s
      (first(0) & 0xFF) match {
        case 0xFF =>
          Left(new String(first, 9, first.length - 9, StandardCharsets.UTF_8))
        case _ => readTextResultset(first).map { case (c, r, _) => (c, r) }
      }
    }

    /** COM_PROCESS_KILL → true on OK, false on ERR. */
    def processKill(id: Long): Boolean = {
      writePacket(out, 0,
        Array[Byte](MysqlServer.ComProcessKill.toByte) ++
          MysqlServer.leBytes(id.toInt, 4))
      out.flush()
      (readPacket(in)._2(0) & 0xFF) == 0x00
    }

    /** COM_DEBUG → true on the EOF ack. */
    def debug(): Boolean = {
      writePacket(out, 0, Array[Byte](MysqlServer.ComDebug.toByte))
      out.flush()
      val p = readPacket(in)._2
      (p(0) & 0xFF) == 0xFE && p.length < 9
    }

    /** COM_RESET_CONNECTION → true on OK. */
    def resetConnection(): Boolean = {
      writePacket(out, 0,
        Array[Byte](MysqlServer.ComResetConnection.toByte))
      out.flush()
      (readPacket(in)._2(0) & 0xFF) == 0x00
    }

    /** COM_SET_OPTION → Right(()) on the protocol's EOF answer,
      * Left(err) on ERR. `opt` travels as u16 LE per the spec. */
    def setOption(opt: Int): Either[String, Unit] = {
      writePacket(out, 0, Array[Byte](MysqlServer.ComSetOption.toByte,
        (opt & 0xFF).toByte, ((opt >> 8) & 0xFF).toByte))
      out.flush()
      val (_, p) = readPacket(in)
      (p(0) & 0xFF) match {
        case 0xFE if p.length < 9 => Right(())
        case 0xFF => Left(new String(p, 9, p.length - 9,
          StandardCharsets.UTF_8))
        case other => Left(s"unexpected head $other")
      }
    }

    /** COM_FIELD_LIST → column names (empty on ERR). */
    def fieldList(table: String): Seq[String] = {
      val payload = Array[Byte](MysqlServer.ComFieldList.toByte) ++
        table.getBytes(StandardCharsets.UTF_8) ++ Array[Byte](0)
      writePacket(out, 0, payload)
      out.flush()
      Iterator.continually(readPacket(in)._2)
        .takeWhile(p => (p(0) & 0xFF) != 0xFE && (p(0) & 0xFF) != 0xFF)
        .map { p =>
          var off = 0
          var name = ""
          (0 until 5).foreach { i =>
            val (len, used) = readLenencInt(p, off)
            if (i == 4) name = new String(p, off + used, len.toInt,
              StandardCharsets.UTF_8)
            off += used + len.toInt
          }
          name
        }.toList
    }

    def quit(): Unit = {
      writePacket(out, 0, Array[Byte](MysqlServer.ComQuit.toByte))
      out.flush()
      sock.close()
    }

    /** COM_STMT_PREPARE → (stmt_id, n_cols, n_params); drains the param
      * and column definition blocks. */
    def prepare(sql: String): Either[String, (Long, Int, Int)] = {
      writePacket(out, 0, Array[Byte](MysqlServer.ComStmtPrepare.toByte) ++
        sql.getBytes(StandardCharsets.UTF_8))
      out.flush()
      val (_, first) = readPacket(in)
      if ((first(0) & 0xFF) == 0xFF)
        return Left(new String(first, 9, first.length - 9,
          StandardCharsets.UTF_8))
      val stmtId = MysqlServer.leU32(first, 1)
      val nCols = (first(5) & 0xFF) | ((first(6) & 0xFF) << 8)
      val nParams = (first(7) & 0xFF) | ((first(8) & 0xFF) << 8)
      def drainDefs(n: Int): Unit = if (n > 0) {
        (0 until n).foreach(_ => readPacket(in))
        val (_, eof) = readPacket(in)
        assert((eof(0) & 0xFF) == 0xFE, "expected EOF after definitions")
      }
      drainDefs(nParams)
      drainDefs(nCols)
      Right((stmtId, nCols, nParams))
    }

    /** COM_STMT_EXECUTE with (type byte, value bytes | null) params →
      * binary resultset decoded by the COLUMN TYPE bytes the server
      * sent in its definitions. Returns (col names, rows of decoded
      * string renderings). */
    def execute(stmtId: Long, params: Seq[(Int, Option[Array[Byte]])],
        sendTypes: Boolean = true)
        : Either[String, (Seq[String], Seq[Seq[Option[String]]])] = {
      val buf = new java.io.ByteArrayOutputStream()
      buf.write(MysqlServer.ComStmtExecute)
      buf.write(leBytes(stmtId.toInt, 4))
      buf.write(0) // flags: CURSOR_TYPE_NO_CURSOR
      buf.write(leBytes(1, 4)) // iteration count
      if (params.nonEmpty) {
        val bitmap = new Array[Byte]((params.length + 7) / 8)
        params.zipWithIndex.foreach { case ((_, v), i) =>
          if (v.isEmpty) bitmap(i / 8) = (bitmap(i / 8) | (1 << (i % 8))).toByte
        }
        buf.write(bitmap)
        buf.write(if (sendTypes) 1 else 0)
        if (sendTypes) params.foreach { case (t, _) =>
          buf.write(t); buf.write(0)
        }
        params.foreach { case (_, v) => v.foreach(buf.write) }
      }
      writePacket(out, 0, buf.toByteArray)
      out.flush()
      val (_, first) = readPacket(in)
      (first(0) & 0xFF) match {
        case 0xFF =>
          Left(new String(first, 9, first.length - 9, StandardCharsets.UTF_8))
        case 0x00 => Right((Nil, Nil))
        case _ =>
          val (nCols, _) = readLenencInt(first, 0)
          val defs = (0 until nCols.toInt).map { _ =>
            val (_, defPkt) = readPacket(in)
            var off = 0
            var names = List.empty[String]
            (0 until 6).foreach { _ =>
              val (len, used) = readLenencInt(defPkt, off)
              names ::= new String(defPkt, off + used, len.toInt,
                StandardCharsets.UTF_8)
              off += used + len.toInt
            }
            // after the 6 lenenc strings: 0x0c, charset u16, display
            // length u32, then the TYPE byte
            val tpe = defPkt(off + 1 + 2 + 4) & 0xFF
            (names(1), tpe)
          }
          val (_, eof1) = readPacket(in)
          assert((eof1(0) & 0xFF) == 0xFE, "expected EOF after column defs")
          val rows = Iterator.continually(readPacket(in)._2)
            .takeWhile(p => (p(0) & 0xFF) != 0xFE || p.length >= 9)
            .map(p => decodeBinaryRow(p, defs.map(_._2)))
            .toList
          Right((defs.map(_._1), rows))
      }
    }

    /** EXECUTE with a cursor flag: expect ONLY column defs + an EOF
      * whose status is returned alongside the (name, type) defs. */
    def executeCursor(stmtId: Long, flags: Int)
        : Either[String, (Seq[(String, Int)], Int)] = {
      val buf = new java.io.ByteArrayOutputStream()
      buf.write(MysqlServer.ComStmtExecute)
      buf.write(leBytes(stmtId.toInt, 4))
      buf.write(flags)
      buf.write(leBytes(1, 4))
      writePacket(out, 0, buf.toByteArray)
      out.flush()
      val (_, first) = readPacket(in)
      (first(0) & 0xFF) match {
        case 0xFF =>
          Left(new String(first, 9, first.length - 9, StandardCharsets.UTF_8))
        case _ =>
          val (nCols, _) = readLenencInt(first, 0)
          val defs = (0 until nCols.toInt).map { _ =>
            val (_, defPkt) = readPacket(in)
            var off = 0
            var names = List.empty[String]
            (0 until 6).foreach { _ =>
              val (len, used) = readLenencInt(defPkt, off)
              names ::= new String(defPkt, off + used, len.toInt,
                StandardCharsets.UTF_8)
              off += used + len.toInt
            }
            val tpe = defPkt(off + 1 + 2 + 4) & 0xFF
            (names(1), tpe)
          }
          val (_, eof) = readPacket(in)
          assert((eof(0) & 0xFF) == 0xFE, "expected EOF after defs")
          val status = (eof(3) & 0xFF) | ((eof(4) & 0xFF) << 8)
          Right((defs, status))
      }
    }

    /** COM_STMT_FETCH: up to `n` binary rows + the EOF status. */
    def fetch(stmtId: Long, n: Int, types: Seq[Int])
        : Either[String, (Seq[Seq[Option[String]]], Int)] = {
      writePacket(out, 0, Array[Byte](MysqlServer.ComStmtFetch.toByte) ++
        leBytes(stmtId.toInt, 4) ++ leBytes(n, 4))
      out.flush()
      val first = readPacket(in)._2
      if ((first(0) & 0xFF) == 0xFF)
        return Left(new String(first, 9, first.length - 9,
          StandardCharsets.UTF_8))
      var rows = List.empty[Seq[Option[String]]]
      var p = first
      while ((p(0) & 0xFF) != 0xFE || p.length >= 9) {
        rows ::= decodeBinaryRow(p, types)
        p = readPacket(in)._2
      }
      val status = (p(3) & 0xFF) | ((p(4) & 0xFF) << 8)
      Right((rows.reverse, status))
    }

    /** COM_STMT_CLOSE (no server response by protocol). */
    def closeStmt(stmtId: Long): Unit = {
      writePacket(out, 0, Array[Byte](MysqlServer.ComStmtClose.toByte) ++
        leBytes(stmtId.toInt, 4))
      out.flush()
    }

    /** COM_STMT_SEND_LONG_DATA: stmt_id u32 + param_id u16 + chunk (no
      * server response by protocol). */
    def sendLongData(stmtId: Long, paramId: Int, chunk: Array[Byte]): Unit = {
      writePacket(out, 0,
        Array[Byte](MysqlServer.ComStmtSendLongData.toByte) ++
          leBytes(stmtId.toInt, 4) ++ leBytes(paramId, 2) ++ chunk)
      out.flush()
    }

    /** COM_STMT_RESET → true on OK. */
    def resetStmt(stmtId: Long): Boolean = {
      writePacket(out, 0, Array[Byte](MysqlServer.ComStmtReset.toByte) ++
        leBytes(stmtId.toInt, 4))
      out.flush()
      (readPacket(in)._2(0) & 0xFF) == 0x00
    }

    private def decodeBinaryRow(p: Array[Byte],
        types: Seq[Int]): Seq[Option[String]] = {
      assert((p(0) & 0xFF) == 0x00, "binary row header")
      val n = types.length
      val bitmapLen = (n + 2 + 7) / 8
      def isNull(i: Int): Boolean = {
        val bit = i + 2
        (p(1 + bit / 8) & (1 << (bit % 8))) != 0
      }
      var off = 1 + bitmapLen
      def leS(w: Int): Long = {
        var x = 0L
        var j = 0
        while (j < w) { x |= (p(off + j) & 0xFFL) << (8 * j); j += 1 }
        off += w
        val shift = 64 - 8 * w
        (x << shift) >> shift
      }
      types.zipWithIndex.map { case (t, i) =>
        if (isNull(i)) None
        else Some(t match {
          case 0x01 => leS(1).toString
          case 0x02 => leS(2).toString
          case 0x03 => leS(4).toString
          case 0x08 => leS(8).toString
          case 0x04 =>
            java.lang.Float.intBitsToFloat(leS(4).toInt).toString
          case 0x05 =>
            java.lang.Double.longBitsToDouble(leS(8)).toString
          case 0x0A =>
            val len = p(off) & 0xFF
            val y = (p(off + 1) & 0xFF) | ((p(off + 2) & 0xFF) << 8)
            val mo = p(off + 3) & 0xFF; val d = p(off + 4) & 0xFF
            off += 1 + len
            f"$y%04d-$mo%02d-$d%02d"
          case 0x0C =>
            val len = p(off) & 0xFF
            val y = (p(off + 1) & 0xFF) | ((p(off + 2) & 0xFF) << 8)
            val mo = p(off + 3) & 0xFF; val d = p(off + 4) & 0xFF
            val h = p(off + 5) & 0xFF; val mi = p(off + 6) & 0xFF
            val s = p(off + 7) & 0xFF
            off += 1 + len
            f"$y%04d-$mo%02d-$d%02d $h%02d:$mi%02d:$s%02d"
          case _ => // lenenc-encoded (strings, decimals, blobs)
            val (len, used) = readLenencInt(p, off)
            val s = new String(p, off + used, len.toInt,
              StandardCharsets.UTF_8)
            off += used + len.toInt
            s
        })
      }
    }
  }

  test("connection phase: HandshakeV10 + response + OK, then COM_PING") {
    val server = MysqlServer.start(spark)
    try {
      val c = new Client(server.boundPort)
      assert(c.serverVersion.contains("graft"))
      assert(c.connectionId > 0)
      assert(c.authError.isEmpty)
      assert(c.ping())
      c.quit()
    } finally server.stop()
  }

  test("mysql_native_password: right password in, wrong password out") {
    val users = Map("alice" -> MysqlServer.nativeCred("s3cret"))
    val server = MysqlServer.start(spark, users = users)
    try {
      // correct scramble → command phase works end-to-end
      val ok = new Client(server.boundPort, "alice", Some("s3cret"))
      assert(ok.authError.isEmpty, ok.authError)
      val Right((_, rows)) = ok.query("select 41 + 1 as a")
      assert(rows == Seq(Seq(Some("42"))))
      ok.quit()
      // wrong password → ERR 1045, no command phase
      val bad = new Client(server.boundPort, "alice", Some("wrong"))
      assert(bad.authError.exists(_.contains("Access denied")), bad.authError)
      // unknown user → denied even with some password
      val ghost = new Client(server.boundPort, "mallory", Some("s3cret"))
      assert(ghost.authError.exists(_.contains("Access denied")))
      // empty auth response against a passworded account → denied
      val empty = new Client(server.boundPort, "alice", None)
      assert(empty.authError.nonEmpty)
    } finally server.stop()
  }

  test("caching_sha2_password: fast auth, full-auth refusal, and the " +
      "handshake advertises it") {
    val users = Map("carol" -> MysqlServer.cachingSha2Cred("p4ss"))
    val server = MysqlServer.start(spark, users = users)
    try {
      // fast-auth path: XOR-SHA256 scramble → fast_auth_success + OK
      val ok = new Client(server.boundPort, "carol", Some("p4ss"),
        plugin = Some(MysqlServer.CachingSha2Plugin))
      assert(ok.advertisedPlugin == MysqlServer.CachingSha2Plugin)
      assert(ok.authError.isEmpty, ok.authError)
      val Right((_, rows)) = ok.query("select 6 * 7 as a")
      assert(rows == Seq(Seq(Some("42"))))
      ok.quit()
      // wrong password: the server asks for full authentication, the
      // client requests the RSA key, and the server refuses cleanly
      val bad = new Client(server.boundPort, "carol", Some("nope"),
        plugin = Some(MysqlServer.CachingSha2Plugin))
      assert(bad.authError.exists(_.contains("Access denied")), bad.authError)
      // empty auth response against a passworded account → denied
      val empty = new Client(server.boundPort, "carol", None,
        plugin = Some(MysqlServer.CachingSha2Plugin))
      assert(empty.authError.nonEmpty)
    } finally server.stop()
  }

  /** Self-signed test keystore (keytool ships with the JDK); the
    * server loads it like any deployment-provided PKCS#12. */
  private lazy val testKeystore: String = {
    val path = java.nio.file.Files.createTempDirectory("graft_tls_")
      .resolve("ks.p12").toString
    val pr = new ProcessBuilder("keytool", "-genkeypair", "-alias", "graft",
      "-keyalg", "RSA", "-keysize", "2048", "-storetype", "PKCS12",
      "-keystore", path, "-storepass", "changeit", "-dname", "CN=localhost",
      "-validity", "366").redirectErrorStream(true).start()
    assert(pr.waitFor() == 0, "keytool failed")
    path
  }

  test("TLS upgrade: encrypted fast auth, plaintext full auth over TLS") {
    val ssl = MysqlServer.sslContextFromPkcs12(testKeystore, "changeit")
    val users = Map("carol" -> MysqlServer.cachingSha2Cred("p4ss"))
    val server = MysqlServer.start(spark, users = users, ssl = Some(ssl))
    try {
      // SSLRequest upgrade, then fast auth + a query — all encrypted
      val c = new Client(server.boundPort, "carol", Some("p4ss"),
        plugin = Some(MysqlServer.CachingSha2Plugin), tls = true)
      assert((c.serverCaps & MysqlServer.ClientSsl) != 0,
        "server did not advertise CLIENT_SSL with a TLS context")
      assert(c.authError.isEmpty, c.authError)
      val Right((_, rows)) = c.query("select 20 + 22 as a")
      assert(rows == Seq(Seq(Some("42"))))
      c.quit()
      // FULL authentication: no fast-auth scramble → server asks
      // perform_full_authentication → plaintext password over TLS → OK
      val f = new Client(server.boundPort, "carol", Some("p4ss"),
        plugin = Some(MysqlServer.CachingSha2Plugin), tls = true,
        forceFullAuth = true)
      assert(f.authError.isEmpty, f.authError)
      assert(f.ping())
      f.quit()
      // wrong plaintext password through full auth → denied
      val w = new Client(server.boundPort, "carol", Some("nope"),
        plugin = Some(MysqlServer.CachingSha2Plugin), tls = true,
        forceFullAuth = true)
      assert(w.authError.exists(_.contains("Access denied")), w.authError)
    } finally server.stop()
  }

  test("no TLS context: CLIENT_SSL is not advertised, full auth refused") {
    val users = Map("carol" -> MysqlServer.cachingSha2Cred("p4ss"))
    val server = MysqlServer.start(spark, users = users)
    try {
      val c = new Client(server.boundPort, "carol", Some("p4ss"),
        plugin = Some(MysqlServer.CachingSha2Plugin))
      assert((c.serverCaps & MysqlServer.ClientSsl) == 0,
        "CLIENT_SSL advertised without a TLS context")
      assert(c.authError.isEmpty)
      c.quit()
      // plaintext full-auth attempt (no scramble): the server asks for
      // full auth, the client requests the RSA key, the server refuses
      val f = new Client(server.boundPort, "carol", Some("p4ss"),
        plugin = Some(MysqlServer.CachingSha2Plugin), forceFullAuth = true)
      assert(f.authError.exists(_.contains("Access denied")), f.authError)
    } finally server.stop()
  }

  test("CLIENT_SSL on a non-SSLRequest frame fails auth, not the TLS " +
      "handshake") {
    // An SSLRequest is EXACTLY 32 bytes. A malformed short
    // HandshakeResponse41 (36 bytes here) that happens to set CLIENT_SSL
    // must be parsed as a handshake response and denied cleanly over
    // plaintext — the old <=36 heuristic would have stalled the
    // connection inside a TLS handshake the client never started.
    val ssl = MysqlServer.sslContextFromPkcs12(testKeystore, "changeit")
    val users = Map("carol" -> MysqlServer.cachingSha2Cred("p4ss"))
    val server = MysqlServer.start(spark, users = users, ssl = Some(ssl))
    try {
      val sock = new Socket("127.0.0.1", server.boundPort)
      sock.setSoTimeout(5000)
      try {
        val in = new BufferedInputStream(sock.getInputStream)
        val out = new BufferedOutputStream(sock.getOutputStream)
        readPacket(in) // handshake
        val flags = 0x00000200 | 0x00008000 | 0x00000800 // P41|SECURE|SSL
        val b = new java.io.ByteArrayOutputStream()
        b.write(leBytes(flags, 4)); b.write(leBytes(1 << 24, 4))
        b.write(255); b.write(new Array[Byte](23))
        b.write("x".getBytes); b.write(0) // user "x"
        b.write(Array[Byte](0, 0)) // empty auth response + garbage pad
        assert(b.size() == 36)
        writePacket(out, 1, b.toByteArray)
        out.flush()
        // the server must answer IN PLAINTEXT (terminal ERR, possibly
        // after a negotiation round) — a read timeout here means it
        // went into a TLS accept on our plaintext bytes
        var denied = false
        var i = 0
        while (i < 4 && !denied) {
          val (s, p) = readPacket(in)
          (p(0) & 0xFF) match {
            case 0xFF => denied = true
            case 0x00 => fail("malformed CLIENT_SSL response authenticated")
            case _ =>
              writePacket(out, s + 1, Array[Byte](0x02)); out.flush()
          }
          i += 1
        }
        assert(denied, "no terminal ERR for the malformed frame")
      } finally sock.close()
      // a real 32-byte SSLRequest still upgrades fine afterwards
      val c = new Client(server.boundPort, "carol", Some("p4ss"),
        plugin = Some(MysqlServer.CachingSha2Plugin), tls = true)
      assert(c.authError.isEmpty, c.authError)
      assert(c.ping())
      c.quit()
    } finally server.stop()
  }

  test("auth-phase fuzz: malformed tails deny cleanly, never hang or kill") {
    val users = Map("carol" -> MysqlServer.cachingSha2Cred("p4ss"))
    val server = MysqlServer.start(spark, users = users)
    try {
      def rawConnect(payload: Array[Byte]): Option[String] = {
        val sock = new Socket("127.0.0.1", server.boundPort)
        try {
          val in = new BufferedInputStream(sock.getInputStream)
          val out = new BufferedOutputStream(sock.getOutputStream)
          readPacket(in) // handshake
          writePacket(out, 1, payload)
          out.flush()
          // follow the negotiation with garbage answers until a
          // terminal packet: the server must reach ERR/OK, not hang
          var i = 0
          while (i < 4) {
            val (s, p) = readPacket(in)
            (p(0) & 0xFF) match {
              case 0xFF =>
                return Some(new String(p, 9, p.length - 9,
                  StandardCharsets.UTF_8))
              case 0x00 => return None
              case _ =>
                writePacket(out, s + 1, Array[Byte](0x02))
                out.flush()
            }
            i += 1
          }
          fail("no terminal auth packet within 4 rounds")
        } finally sock.close()
      }
      def resp41(tail: Array[Byte], flags: Int): Array[Byte] = {
        val b = new java.io.ByteArrayOutputStream()
        b.write(leBytes(flags, 4)); b.write(leBytes(1 << 24, 4))
        b.write(255); b.write(new Array[Byte](23)); b.write(tail)
        b.toByteArray
      }
      val pluginAuth = 0x00000200 | 0x00008000 | 0x00080000
      // no NUL terminator on the username
      assert(rawConnect(resp41("carol".getBytes, pluginAuth)).isDefined)
      // auth-response length byte pointing past the packet end
      assert(rawConnect(resp41(
        "carol".getBytes ++ Array[Byte](0, 99.toByte, 1, 2), pluginAuth))
        .exists(_.contains("Access denied")))
      // unknown plugin name offered: the server answers (AuthSwitch to
      // the account's plugin) and the client hangs up mid-switch — the
      // EOF must not take the server down (proven by the clean
      // connection at the end of this test)
      rawConnect(resp41(
        "carol".getBytes ++ Array[Byte](0, 0) ++
          "totally_made_up_plugin".getBytes ++ Array[Byte](0),
        pluginAuth))
      // truncated response: just the username and nothing else
      assert(rawConnect(resp41("carol".getBytes ++ Array[Byte](0),
        pluginAuth)).isDefined)
      // and the server still serves a clean connection afterwards
      val ok = new Client(server.boundPort, "carol", Some("p4ss"),
        plugin = Some(MysqlServer.CachingSha2Plugin))
      assert(ok.authError.isEmpty, ok.authError)
      assert(ok.ping())
      ok.quit()
    } finally server.stop()
  }

  test("multi-statement COM_QUERY: per-statement resultsets chained by " +
      "SERVER_MORE_RESULTS_EXISTS; errors abort the remainder") {
    Tables.registerAll(spark, TestSpark.Sf)
    val server = MysqlServer.start(spark)
    try {
      val c = new Client(server.boundPort, multi = true)
      // three statements, three resultsets, in order; the ';' inside
      // the string literal and the comment must NOT split
      val rs = c.queryAll(
        "select 1 as a; select 'x;y' as b -- trailing; comment\n" +
          "; select 2 + 2 as c")
      assert(rs.length == 3, s"expected 3 resultsets, got ${rs.length}")
      assert(rs(0) == Right((Seq("a"), Seq(Seq(Some("1"))))))
      assert(rs(1) == Right((Seq("b"), Seq(Seq(Some("x;y"))))))
      assert(rs(2) == Right((Seq("c"), Seq(Seq(Some("4"))))))
      // an error aborts the rest: statement 2 fails, statement 3 is
      // never executed and never answered
      val er = c.queryAll("select 1 as a; select bogus_col; select 3 as z")
      assert(er.length == 2, s"expected 2 packets, got ${er.length}")
      assert(er(0).isRight && er(1).isLeft)
      assert(c.ping(), "aborted multi-statement killed the connection")
      // a trailing comment-only part is whitespace, not an (erroring)
      // empty statement — mysqld semantics
      val tc = c.queryAll("select 7 as a; -- cleanup done")
      assert(tc == Seq(Right((Seq("a"), Seq(Seq(Some("7")))))), s"$tc")
      // while an ALL-comment / all-';' query is ERR 1065 'Query was
      // empty', exactly mysqld's answer
      assert(c.queryAll(";").exists(_.left.exists(_.contains("empty"))))
      // a client WITHOUT the capability gets the old single-statement
      // behavior: the raw text (with its ';') goes to the parser whole
      val plain = new Client(server.boundPort)
      assert(plain.query("select 1 as a; select 2 as b").isLeft,
        "non-multi client's ';' text should fail as one statement")
      assert((plain.serverCaps & MysqlServer.ClientMultiStatements) != 0,
        "server must advertise CLIENT_MULTI_STATEMENTS")
      plain.quit()
      c.quit()
    } finally server.stop()
  }

  test("COM_SET_OPTION toggles multi-statement splitting mid-connection") {
    Tables.registerAll(spark, TestSpark.Sf)
    val server = MysqlServer.start(spark)
    try {
      // a handshake-negotiated multi client turns the option OFF: the
      // next ';' text must go to the parser whole (stacked-query
      // defense, the reason connectors issue this command)
      val c = new Client(server.boundPort, multi = true)
      assert(c.queryAll("select 1 as a; select 2 as b").length == 2)
      assert(c.setOption(MysqlServer.OptionMultiStatementsOff).isRight)
      assert(c.query("select 1 as a; select 2 as b").isLeft,
        "OFF client's ';' text must fail as one statement")
      // ... and back ON
      assert(c.setOption(MysqlServer.OptionMultiStatementsOn).isRight)
      assert(c.queryAll("select 3 as a; select 4 as b").map(_.isRight) ==
        Seq(true, true))
      // a client that never negotiated the capability can still enable
      // splitting via the command (mysqld allows this — the handshake
      // bit only seeds the session default)
      val plain = new Client(server.boundPort)
      assert(plain.query("select 1 as a; select 2 as b").isLeft)
      assert(plain.setOption(MysqlServer.OptionMultiStatementsOn).isRight)
      assert(plain.queryAll("select 5 as a; select 6 as b").length == 2)
      // an undefined operand is ERR 1047, connection stays usable
      assert(plain.setOption(7).isLeft)
      assert(plain.ping())
      plain.quit()
      c.quit()
    } finally server.stop()
  }

  test("server-side READ_ONLY cursor: EXECUTE defers rows, FETCH pages, " +
      "drained EOF flags LAST_ROW_SENT, RESET closes, others refused") {
    Tables.registerAll(spark, TestSpark.Sf)
    val server = MysqlServer.start(spark)
    try {
      val c = new Client(server.boundPort)
      val Right((sid, _, _)) = c.prepare(
        "select o_orderkey from orders order by o_orderkey limit 7")
        : @unchecked
      // SCROLLABLE stays refused
      assert(c.executeCursor(sid, 0x04).isLeft, "scrollable must refuse")
      // READ_ONLY: defs only, CURSOR_EXISTS set, no rows inline
      val Right((defs, st0)) = c.executeCursor(sid, 0x01): @unchecked
      assert(defs.map(_._1) == Seq("o_orderkey"))
      assert((st0 & MysqlServer.StatusCursorExists) != 0, st0.toString)
      val types = defs.map(_._2)
      // page 3 + 3 + 3: the last page carries the final row + the flag
      val Right((r1, s1)) = c.fetch(sid, 3, types): @unchecked
      val Right((r2, s2)) = c.fetch(sid, 3, types): @unchecked
      val Right((r3, s3)) = c.fetch(sid, 3, types): @unchecked
      assert(r1.length == 3 && r2.length == 3 && r3.length == 1,
        s"${r1.length}/${r2.length}/${r3.length}")
      assert((s1 & MysqlServer.StatusLastRowSent) == 0)
      assert((s2 & MysqlServer.StatusLastRowSent) == 0)
      assert((s3 & MysqlServer.StatusLastRowSent) != 0)
      val keys = (r1 ++ r2 ++ r3).map(_.head.get.toLong)
      assert(keys.length == 7 && keys == keys.sorted && keys.distinct == keys,
        s"paged keys wrong: $keys")
      // drained cursor keeps answering the drained EOF
      val Right((r4, s4)) = c.fetch(sid, 5, types): @unchecked
      assert(r4.isEmpty && (s4 & MysqlServer.StatusLastRowSent) != 0)
      // a plain EXECUTE on the same handle still streams inline — and
      // CLOSES the open cursor (mysqld semantics): a later FETCH must
      // not serve the superseded resultset
      val Right((_, inline)) = c.execute(sid, Seq.empty): @unchecked
      assert(inline.length == 7)
      assert(c.fetch(sid, 1, types).isLeft,
        "plain EXECUTE must close the open cursor")
      // RESET closes the (re-opened) cursor
      assert(c.executeCursor(sid, 0x01).isRight)
      assert(c.resetStmt(sid))
      assert(c.fetch(sid, 1, types).isLeft, "fetch after RESET must ERR")
      // unknown handle
      assert(c.fetch(9999L, 1, types).isLeft)
      c.quit()
    } finally server.stop()
  }

  test("admin commands: statistics line, processlist, kill by id, debug ack") {
    Tables.registerAll(spark, TestSpark.Sf)
    val server = MysqlServer.start(spark)
    try {
      val a = new Client(server.boundPort)
      val b = new Client(server.boundPort)
      assert(a.query("select 1 as x").isRight)
      assert(b.query("select 2 as y").isRight)
      // raw status line: mysqladmin-status framing, counters live
      val st = a.statistics()
      assert(st.startsWith("Uptime: ") && st.contains("Threads: 2"), st)
      val qs = st.split("Questions: ")(1).split(" ")(0).toLong
      assert(qs >= 2, s"questions counter stuck: $st")
      // processlist: both connections, the asker mid-Query
      val Right((cols, rows)) = a.processInfo(): @unchecked
      assert(cols == Seq("Id", "User", "Command", "Time"))
      assert(rows.length == 2, s"expected both connections: $rows")
      assert(rows.forall(_(1).contains("graft")), s"user column: $rows")
      assert(rows.count(_(2).contains("Query")) == 1, s"commands: $rows")
      // kill the idle one by its listed id; its socket dies cleanly
      val victimId = rows.find(_(2).contains("Sleep")).get.head.get.toLong
      assert(!a.processKill(99999L), "unknown thread id must ERR")
      assert(a.processKill(victimId), "kill refused")
      intercept[Exception] { (1 to 3).foreach(_ => b.query("select 3 as z")) }
      // the registry shrinks once the victim's loop exits
      assert(eventually(20) {
        a.processInfo().exists(_._2.length == 1)
      }, "killed connection still listed")
      assert(a.debug(), "COM_DEBUG must answer EOF")
      assert(a.query("select 4 as w").isRight)
      a.quit()
    } finally server.stop()
  }

  test("kill is same-user-only once users are configured") {
    Tables.registerAll(spark, TestSpark.Sf)
    val users = Map(
      "alice" -> MysqlServer.nativeCred("s3cret"),
      "dave" -> MysqlServer.nativeCred("hunter2"))
    val server = MysqlServer.start(spark, users = users)
    try {
      val alice = new Client(server.boundPort, "alice", Some("s3cret"))
      val dave = new Client(server.boundPort, "dave", Some("hunter2"))
      val dave2 = new Client(server.boundPort, "dave", Some("hunter2"))
      assert(alice.authError.isEmpty && dave.authError.isEmpty &&
        dave2.authError.isEmpty)
      assert(alice.query("select 1 as x").isRight)
      val Right((_, rows)) = alice.processInfo(): @unchecked
      val daveId = rows.find(r => r(1).contains("dave")).get.head.get.toLong
      // cross-user kill: ERR (mysqld's 1095), victim link unharmed
      assert(!alice.processKill(daveId), "cross-user kill must ERR 1095")
      assert(dave.ping() || dave2.ping(), "victim link was harmed")
      // same-user kill still works (dave kills dave's other connection)
      val Right((_, rows2)) = dave.processInfo(): @unchecked
      val otherDave = rows2.find(r => r(1).contains("dave") &&
        !r(2).contains("Query")).get.head.get.toLong
      assert(dave.processKill(otherDave), "same-user kill refused")
      alice.quit(); dave.quit()
    } finally server.stop()
  }

  /** Poll `cond` up to `tries` times, 100 ms apart. */
  private def eventually(tries: Int)(cond: => Boolean): Boolean =
    (1 to tries).exists { _ =>
      if (cond) true else { Thread.sleep(100); false }
    }

  test("concurrent connections: parallel clients query, prepare, and list " +
      "each other; the registry drains to empty on quit") {
    Tables.registerAll(spark, TestSpark.Sf)
    val server = MysqlServer.start(spark)
    try {
      val n = 6
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]
      val ready = new java.util.concurrent.CyclicBarrier(n)
      val threads = (1 to n).map { i =>
        new Thread(() => {
          try {
            val c = new Client(server.boundPort)
            ready.await() // all authenticated before anyone proceeds
            (1 to 5).foreach { j =>
              c.query(s"select ${i * 100 + j} as v") match {
                case Right((_, Seq(Seq(Some(v))))) =>
                  if (v != (i * 100 + j).toString)
                    errors.add(s"t$i q$j: wrong value $v")
                case other => errors.add(s"t$i q$j: $other")
              }
            }
            val Right((sid, _, _)) = c.prepare(
              "select o_orderkey from orders where o_orderkey = ?"): @unchecked
            c.execute(sid,
              Seq((0x08, Some(MysqlServer.leBytes(1, 8))))) match {
              case Left(e) => errors.add(s"t$i exec: $e")
              case Right(_) =>
            }
            ready.await() // nobody lists until everyone finished querying
            c.processInfo() match {
              case Right((_, rows)) =>
                if (rows.length < n) // everyone still connected here
                  errors.add(s"t$i processlist: only ${rows.length} rows")
              case Left(e) => errors.add(s"t$i processlist: $e")
            }
            ready.await() // nobody quits until everyone has listed
            c.quit()
          } catch {
            case e: Throwable => errors.add(s"t$i: $e")
          }
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join(60000))
      assert(errors.isEmpty, s"concurrent failures: $errors")
      // after every client quit, a fresh observer sees only itself
      val obs = new Client(server.boundPort)
      assert(eventually(20) { obs.processInfo().exists(_._2.length == 1) },
        "registry did not drain to the observer alone")
      obs.quit()
    } finally server.stop()
  }

  test("COM_RESET_CONNECTION: wipes session state without re-auth") {
    Tables.registerAll(spark, TestSpark.Sf)
    val server = MysqlServer.start(spark)
    try {
      val c = new Client(server.boundPort)
      // session state to wipe: a prepared statement, the ANSI_QUOTES
      // dialect flip, and a SET_OPTION-enabled multi-statement toggle
      val Right((sid, _, _)) = c.prepare("select o_orderkey from orders " +
        "where o_orderkey = ?"): @unchecked
      assert(c.query("SET sql_mode = 'ANSI_QUOTES'").isRight)
      assert(c.query("select o_orderkey as \"q\" from orders limit 1")
        .isRight, "ANSI_QUOTES not in effect before reset")
      assert(c.setOption(MysqlServer.OptionMultiStatementsOn).isRight)
      assert(c.queryAll("select 1 as a; select 2 as b").length == 2)
      assert(c.resetConnection(), "reset refused")
      // still authenticated — a plain query works immediately
      assert(c.query("select 3 as z").isRight)
      // statement registry wiped: the old id is gone
      assert(c.execute(sid,
        Seq((0x08, Some(MysqlServer.leBytes(1, 8))))).isLeft,
        "prepared statement survived the reset")
      // dialect reverted: double quotes are strings again, so the
      // aliased-identifier form no longer parses as an identifier
      assert(c.query("select \"lit\" as s from orders limit 1")
        .exists(_._2 == Seq(Seq(Some("lit")))),
        "double-quoted literal not restored after reset")
      // multi-statement toggle reverted to the handshake value (off)
      assert(c.query("select 1 as a; select 2 as b").isLeft,
        "multi-statement toggle survived the reset")
      c.quit()
    } finally server.stop()
  }

  test("COM_CHANGE_USER: pooled re-auth switches identity, wipes session " +
      "state, and a refused switch keeps the old session usable") {
    Tables.registerAll(spark, TestSpark.Sf)
    val users = Map(
      "carol" -> MysqlServer.cachingSha2Cred("p4ss"),
      "dave" -> MysqlServer.nativeCred("hunter2"))
    val server = MysqlServer.start(spark, users = users)
    try {
      val c = new Client(server.boundPort, "carol", Some("p4ss"),
        plugin = Some(MysqlServer.CachingSha2Plugin))
      assert(c.authError.isEmpty, c.authError)
      // session state to be wiped: a prepared statement + ANSI_QUOTES
      val Right((stmtId, _, _)) = c.prepare("select 1 as a")
      assert(c.query("set sql_mode = 'ANSI_QUOTES'").isRight)
      // wrong password: refused, and the OLD session fully survives —
      // including its prepared statement and its sql_mode
      assert(c.changeUser("dave", Some("wrong"))
        .left.exists(_.contains("Access denied")))
      assert(c.ping(), "refused switch killed the connection")
      assert(c.execute(stmtId, Nil).isRight,
        "refused switch dropped the old session's statement")
      // successful switch to the native-plugin account (cross-plugin:
      // the AuthSwitchRequest re-targets the scramble)
      assert(c.changeUser("dave", Some("hunter2")).isRight)
      val Right((_, rows)) = c.query("select 40 + 2 as a")
      assert(rows == Seq(Seq(Some("42"))))
      // session state was wiped by the switch: statement gone...
      assert(c.execute(stmtId, Nil).left.exists(
        _.contains("Unknown prepared statement")),
        "CHANGE_USER kept the old session's prepared statement")
      // ...and sql_mode reset (double-quoted strings are literals again)
      val Right((_, lit)) = c.query("select \"x\" as v")
      assert(lit == Seq(Seq(Some("x"))),
        "CHANGE_USER kept the old session's ANSI_QUOTES mode")
      // unknown user: refused, connection still answers
      assert(c.changeUser("mallory", Some("p4ss"))
        .left.exists(_.contains("Access denied")))
      assert(c.ping())
      c.quit()
    } finally server.stop()
  }

  test("auth plugin switch: each client lands on its account's plugin") {
    val users = Map(
      "carol" -> MysqlServer.cachingSha2Cred("p4ss"),
      "alice" -> MysqlServer.nativeCred("s3cret"))
    val server = MysqlServer.start(spark, users = users)
    try {
      // a native-offering client hitting a caching_sha2 account is
      // switched to caching_sha2 and re-scrambles
      val c1 = new Client(server.boundPort, "carol", Some("p4ss"),
        plugin = Some(MysqlServer.NativePlugin))
      assert(c1.authError.isEmpty, c1.authError)
      assert(c1.ping())
      c1.quit()
      // a stock MySQL-8 client (offers caching_sha2) hitting a native
      // account is switched to native — no --default-auth needed
      val c2 = new Client(server.boundPort, "alice", Some("s3cret"),
        plugin = Some(MysqlServer.CachingSha2Plugin))
      assert(c2.authError.isEmpty, c2.authError)
      assert(c2.ping())
      c2.quit()
      // a switched client with the wrong password is still denied
      val c3 = new Client(server.boundPort, "alice", Some("wrong"),
        plugin = Some(MysqlServer.CachingSha2Plugin))
      assert(c3.authError.exists(_.contains("Access denied")))
    } finally server.stop()
  }

  test("caching_sha2 scramble round-trip: verifier accepts exactly the " +
      "matching secret") {
    val salt = Array.tabulate[Byte](20)(i => (i * 11 + 5).toByte)
    val stored = MysqlServer.doubleSha256("hunter2")
    val good = MysqlServer.cachingSha2Scramble(salt, "hunter2")
    val bad = MysqlServer.cachingSha2Scramble(salt, "hunter3")
    assert(good.length == 32)
    assert(MysqlServer.cachingSha2Ok(salt, good, stored))
    assert(!MysqlServer.cachingSha2Ok(salt, bad, stored))
    assert(!MysqlServer.cachingSha2Ok(salt, Array.emptyByteArray, stored))
    // a native 20-byte scramble can never satisfy the sha2 verifier
    assert(!MysqlServer.cachingSha2Ok(salt,
      MysqlServer.nativeScramble(salt, "hunter2"), stored))
    // empty-password account: empty response or the lone 0x00 byte
    val none = MysqlServer.doubleSha256("")
    assert(MysqlServer.cachingSha2Ok(salt, Array.emptyByteArray, none))
    assert(MysqlServer.cachingSha2Ok(salt, Array[Byte](0), none))
    assert(!MysqlServer.cachingSha2Ok(salt, good, none))
  }

  test("scramble round-trip: verifier accepts exactly the matching secret") {
    val salt = Array.tabulate[Byte](20)(i => (i * 7 + 3).toByte)
    val stored = MysqlServer.doubleSha1("hunter2")
    val good = MysqlServer.nativeScramble(salt, "hunter2")
    val bad = MysqlServer.nativeScramble(salt, "hunter3")
    assert(MysqlServer.nativePasswordOk(salt, good, stored))
    assert(!MysqlServer.nativePasswordOk(salt, bad, stored))
    assert(!MysqlServer.nativePasswordOk(salt, Array.emptyByteArray, stored))
    // empty-password account accepts only the empty response
    assert(MysqlServer.nativePasswordOk(salt, Array.emptyByteArray,
      MysqlServer.doubleSha1("")))
    assert(!MysqlServer.nativePasswordOk(salt, good, MysqlServer.doubleSha1("")))
  }

  test("COM_QUERY returns a text resultset with correct values and names") {
    Tables.registerAll(spark, TestSpark.Sf)
    val server = MysqlServer.start(spark)
    try {
      val c = new Client(server.boundPort)
      val Right((cols, rows)) =
        c.query("select n_name, n_nationkey from nation order by n_nationkey limit 3")
      assert(cols == Seq("n_name", "n_nationkey"))
      assert(rows.map(_.map(_.get)) == Seq(
        Seq("NATION_0", "0"), Seq("NATION_1", "1"), Seq("NATION_2", "2")))
      c.quit()
    } finally server.stop()
  }

  test("COM_FIELD_LIST lists a registered table's columns") {
    Tables.registerAll(spark, TestSpark.Sf)
    val server = MysqlServer.start(spark)
    try {
      val c = new Client(server.boundPort)
      assert(c.fieldList("region") == Seq("r_regionkey", "r_name"))
      assert(c.fieldList("no_such_table_xyz").isEmpty)
      assert(c.ping()) // connection intact after the ERR
      c.quit()
    } finally server.stop()
  }

  test("NULLs travel as the 0xFB marker; errors as ERR packets in-band") {
    val server = MysqlServer.start(spark)
    try {
      val c = new Client(server.boundPort)
      val Right((_, rows)) = c.query("select cast(null as int) as a, 7 as b")
      assert(rows == Seq(Seq(None, Some("7"))))
      // binary columns travel as raw bytes, booleans as 1/0 (TINY text)
      val Right((_, bin)) = c.query(
        "select cast('ab' as binary) as bin, 1 = 1 as t, 1 = 2 as f")
      assert(bin == Seq(Seq(Some("ab"), Some("1"), Some("0"))))
      val Left(err) = c.query("select * from no_such_table_xyz")
      assert(err.nonEmpty)
      // connection survives the error
      val Right((_, again)) = c.query("select 1 as one")
      assert(again == Seq(Seq(Some("1"))))
      c.quit()
    } finally server.stop()
  }

  test("EXPLAIN over the wire returns plan rows as a text resultset") {
    Tables.registerAll(spark, TestSpark.Sf)
    val server = MysqlServer.start(spark)
    try {
      val c = new Client(server.boundPort)
      // bare EXPLAIN → formatted physical plan, one row per line
      val Right((cols, rows)) = c.query(
        "EXPLAIN select n_name from nation where n_nationkey = 3")
      assert(cols == Seq("EXPLAIN"))
      val text = rows.flatten.flatten.mkString("\n")
      assert(text.contains("== Physical Plan =="), text.take(200))
      assert(rows.length > 3, s"${rows.length} plan rows")
      // an explicit Spark mode keyword passes through
      val Right((_, ext)) = c.query("explain extended select 1 as one")
      assert(ext.flatten.flatten.mkString("\n")
        .contains("== Analyzed Logical Plan =="))
      // a broken statement: Spark's EXPLAIN doesn't throw — it reports
      // the planning error as the plan text; it travels as plan rows
      // and the connection stays intact
      val Right((_, bad)) = c.query(
        "EXPLAIN select * from no_such_table_xyz")
      assert(bad.flatten.flatten.mkString("\n")
        .contains("TABLE_OR_VIEW_NOT_FOUND"))
      val Right((_, again)) = c.query("select 1 as one")
      assert(again == Seq(Seq(Some("1"))))
      c.quit()
    } finally server.stop()
  }

  test("UPDATE and DELETE over the wire rewrite a managed table") {
    Tables.registerAll(spark, TestSpark.Sf)
    val server = MysqlServer.start(spark)
    val t = s"graft_wire_dml_${System.nanoTime()}"
    try {
      val c = new Client(server.boundPort)
      assert(c.exec(s"create table $t using parquet as " +
        "select n_nationkey as k, cast(n_regionkey as bigint) as r " +
        "from nation").isRight)
      // UPDATE: 5 rows match (k < 5); OK carries the affected count
      assert(c.exec(s"update $t set r = r + 100 where k < 5") == Right(5L))
      val Right((_, bumped)) = c.query(
        s"select r from $t where k = 2")
      assert(bumped == Seq(Seq(Some("102"))))
      // DELETE: k in 20..24 → 5 rows; count drops to 20
      assert(c.exec(s"delete from $t where k >= 20") == Right(5L))
      val Right((_, n)) = c.query(s"select count(*) as n from $t")
      assert(n == Seq(Seq(Some("20"))))
      // a no-match predicate affects 0 rows and rewrites nothing
      assert(c.exec(s"delete from $t where k > 999") == Right(0L))
      // errors surface as ERR in-band, connection intact
      assert(c.exec(s"update $t set no_such_col = 1").isLeft)
      assert(c.ping())
      c.quit()
    } finally {
      spark.sql(s"drop table if exists $t")
      server.stop()
    }
  }

  test("stock-client bootstrap: @@vars, SET NAMES, SHOW VARIABLES/WARNINGS") {
    val server = MysqlServer.start(spark)
    try {
      val c = new Client(server.boundPort)
      // the mysql CLI's opening statement
      val Right((_, vc)) = c.query("select @@version_comment limit 1")
      assert(vc == Seq(Seq(Some("graft Spark engine"))))
      // Connector/J-style multi-variable select with aliases
      val Right((cols, row)) = c.query(
        "SELECT @@session.auto_increment_increment AS auto_increment_increment," +
          " @@character_set_client AS character_set_client," +
          " @@max_allowed_packet AS max_allowed_packet," +
          " @@tx_isolation AS tx_isolation")
      assert(cols == Seq("auto_increment_increment", "character_set_client",
        "max_allowed_packet", "tx_isolation"))
      assert(row == Seq(Seq(Some("1"), Some("utf8mb4"), Some("67108864"),
        Some("REPEATABLE-READ"))))
      // unknown variables splice as NULL instead of erroring
      val Right((_, unk)) = c.query("select @@no_such_var_xyz as v")
      assert(unk == Seq(Seq(None)))
      // session plumbing SETs are acknowledged as no-ops
      assert(c.exec("SET NAMES utf8mb4").isRight)
      assert(c.exec("SET autocommit=1").isRight)
      assert(c.exec("SET character_set_results = NULL").isRight)
      // ... while Spark conf SET still passes through as a resultset
      val Right((_, conf)) = c.query("SET spark.sql.shuffle.partitions")
      assert(conf.head(1).isDefined)
      // SHOW VARIABLES with a LIKE pattern; SHOW WARNINGS is empty
      val Right((vcols, vrows)) = c.query(
        "show variables like 'max_allowed%'")
      assert(vcols == Seq("Variable_name", "Value"))
      assert(vrows == Seq(Seq(Some("max_allowed_packet"), Some("67108864"))))
      val Right((wcols, wrows)) = c.query("show warnings")
      assert(wcols == Seq("Level", "Code", "Message") && wrows.isEmpty)
      c.quit()
    } finally server.stop()
  }

  test("row cap bounds unbounded selects at the wire") {
    Tables.registerAll(spark, TestSpark.Sf)
    val server = MysqlServer.start(spark, maxRows = 5)
    try {
      val c = new Client(server.boundPort)
      val Right((_, rows)) = c.query("select l_orderkey from lineitem")
      assert(rows.length == 5, s"${rows.length} rows")
      c.quit()
    } finally server.stop()
  }

  test("prepared statements: typed binary params in, binary resultset out") {
    Tables.registerAll(spark, TestSpark.Sf)
    val server = MysqlServer.start(spark)
    try {
      val c = new Client(server.boundPort)
      val Right((id, nCols, nParams)) = c.prepare(
        "select n_nationkey, n_name from nation " +
          "where n_regionkey = ? and n_name like ? order by n_nationkey")
      assert(nParams == 2)
      assert(nCols == 2, "prepare-time schema derived with NULL binding")
      // LONG(0x03) + VAR_STRING(0xFD) params, binary-encoded; the
      // lenenc string "%" makes the LIKE match-all
      val Right((cols, rows)) = c.execute(id, Seq(
        0x03 -> Some(leBytes(1, 4)),
        0xFD -> Some(Array[Byte](1, '%'.toByte))))
      assert(cols == Seq("n_nationkey", "n_name"))
      val oracle = spark.sql(
        "select n_nationkey from nation where n_regionkey = 1 " +
          "order by n_nationkey").collect().map(_.getInt(0).toString).toSeq
      assert(rows.map(_.head.get) == oracle)
      c.quit()
    } finally server.stop()
  }

  test("prepared statements: NULL bitmap, type reuse, close semantics") {
    Tables.registerAll(spark, TestSpark.Sf)
    val server = MysqlServer.start(spark)
    try {
      val c = new Client(server.boundPort)
      val Right((id, _, nParams)) =
        c.prepare("select coalesce(?, 'fallback') as v, ? + 1 as w")
      assert(nParams == 2)
      def lenencStr(s: String): Array[Byte] =
        Array[Byte](s.length.toByte) ++ s.getBytes(StandardCharsets.UTF_8)
      // execute 1: param 1 NULL (bitmap), param 2 = LONGLONG 41
      val Right((_, rows1)) = c.execute(id, Seq(
        0xFD -> None,
        0x08 -> Some(leBytes(41, 4) ++ leBytes(0, 4))))
      assert(rows1.head == Seq(Some("fallback"), Some("42")))
      // execute 2 WITHOUT re-sending types: server must remember them
      val Right((_, rows2)) = c.execute(id, Seq(
        0xFD -> Some(lenencStr("it's a \\ test")),
        0x08 -> Some(leBytes(7, 4) ++ leBytes(0, 4))), sendTypes = false)
      assert(rows2.head == Seq(Some("it's a \\ test"), Some("8")),
        "quote/backslash escaping must round-trip")
      // close, then execute → ERR 1243
      c.closeStmt(id)
      val Left(err) = c.execute(id, Seq(
        0xFD -> None, 0x08 -> Some(leBytes(1, 4) ++ leBytes(0, 4))))
      assert(err.toLowerCase.contains("unknown prepared statement"))
      c.quit()
    } finally server.stop()
  }

  test("COM_STMT_SEND_LONG_DATA: chunked param binds; RESET discards it") {
    val server = MysqlServer.start(spark)
    try {
      val c = new Client(server.boundPort)
      val Right((id, _, nParams)) =
        c.prepare("select ? as v, length(?) as n")
      assert(nParams == 2)
      // param 0 arrives in TWO chunks ahead of EXECUTE (the command's
      // whole point: values larger than one packet); param 1 inline.
      c.sendLongData(id, 0, "hello ".getBytes(StandardCharsets.UTF_8))
      c.sendLongData(id, 0, "world".getBytes(StandardCharsets.UTF_8))
      def lenencStr(s: String): Array[Byte] =
        Array[Byte](s.length.toByte) ++ s.getBytes(StandardCharsets.UTF_8)
      // long-data params carry NO inline value: empty value bytes, null
      // bit clear — only param 1's lenenc string is in the packet
      val Right((_, rows)) = c.execute(id, Seq(
        0xFD -> Some(Array.emptyByteArray),
        0xFD -> Some(lenencStr("abc"))))
      assert(rows.head == Seq(Some("hello world"), Some("3")))
      // mysqld semantics: EXECUTE does not clear — re-execute reuses it
      val Right((_, again)) = c.execute(id, Seq(
        0xFD -> Some(Array.emptyByteArray),
        0xFD -> Some(lenencStr("wxyz"))), sendTypes = false)
      assert(again.head == Seq(Some("hello world"), Some("4")))
      // COM_STMT_RESET discards the accumulation: the param now reads
      // its inline value again
      assert(c.resetStmt(id))
      val Right((_, fresh)) = c.execute(id, Seq(
        0xFD -> Some(lenencStr("inline")),
        0xFD -> Some(lenencStr("ab"))))
      assert(fresh.head == Seq(Some("inline"), Some("2")))
      // long data for an unknown statement id is silently ignored
      // (no response by protocol); the connection stays healthy
      c.sendLongData(9999L, 0, Array[Byte](1, 2, 3))
      assert(c.ping())
      // a BLOB-bound long-data param splices as a binary literal, so
      // arbitrary (non-UTF-8) bytes round-trip exactly
      val Right((bid, _, _)) = c.prepare("select hex(?) as h")
      c.sendLongData(bid, 0, Array[Byte](0x00, 0x80.toByte, 0xFF.toByte))
      val Right((_, hexRows)) = c.execute(bid, Seq(
        0xFC -> Some(Array.emptyByteArray))) // MYSQL_TYPE_BLOB
      assert(hexRows.head == Seq(Some("0080FF")))
      c.quit()
    } finally server.stop()
  }

  test("SET sql_mode ANSI_QUOTES flips double-quoted identifier lexing") {
    Tables.registerAll(spark, TestSpark.Sf)
    val server = MysqlServer.start(spark)
    try {
      val c = new Client(server.boundPort)
      // default (MySQL) mode: double quotes are STRING literals
      val Right((_, lit)) = c.query("select \"n_name\" as v from nation limit 1")
      assert(lit == Seq(Seq(Some("n_name"))))
      // the @@session form many connectors emit must flip the mode too
      assert(c.exec("SET @@session.sql_mode = 'ANSI_QUOTES'").isRight)
      // ANSI mode: the same text now reads the COLUMN
      val Right((_, col)) = c.query(
        "select \"n_name\" as v from \"nation\" where \"n_nationkey\" = 3")
      assert(col == Seq(Seq(Some("NATION_3"))))
      // read-back reflects the LIVE per-connection state, not the
      // static default (connectors configure their quoting from this)
      val Right((_, mode)) = c.query("select @@sql_mode as m")
      assert(mode == Seq(Seq(Some("ANSI_QUOTES"))))
      val Right((_, showMode)) = c.query("show variables like 'sql_mode'")
      assert(showMode == Seq(Seq(Some("sql_mode"), Some("ANSI_QUOTES"))))
      // single-quoted strings are untouched by the rewrite
      val Right((_, s)) = c.query("select 'say \"hi\"' as s")
      assert(s == Seq(Seq(Some("say \"hi\""))))
      // the flag is per connection: a fresh connection is MySQL-mode
      val c2 = new Client(server.boundPort)
      val Right((_, lit2)) = c2.query("select \"n_name\" as v from nation limit 1")
      assert(lit2 == Seq(Seq(Some("n_name"))))
      c2.quit()
      // switching back restores string-literal lexing and the default
      // read-back value
      assert(c.exec("SET sql_mode = ''").isRight)
      val Right((_, lit3)) = c.query("select \"n_name\" as v from nation limit 1")
      assert(lit3 == Seq(Seq(Some("n_name"))))
      val Right((_, mode2)) = c.query("select @@sql_mode as m")
      assert(mode2 == Seq(Seq(Some("STRICT_TRANS_TABLES,NO_ENGINE_SUBSTITUTION"))))
      c.quit()
    } finally server.stop()
  }

  test("prepared statements: double and date params bind typed literals") {
    Tables.registerAll(spark, TestSpark.Sf)
    val server = MysqlServer.start(spark)
    try {
      val c = new Client(server.boundPort)
      val Right((id, _, _)) = c.prepare(
        "select o_orderkey from orders " +
          "where o_orderdate >= ? and o_totalprice > ? order by o_orderkey")
      val dateBytes = { // binary DATE 1996-01-01, length 4
        val b = new java.io.ByteArrayOutputStream()
        b.write(4); b.write(leBytes(1996, 2)); b.write(1); b.write(1)
        b.toByteArray
      }
      val priceBits =
        java.lang.Double.doubleToLongBits(150000.0)
      val priceBytes = Array.tabulate[Byte](8)(i =>
        ((priceBits >> (8 * i)) & 0xFF).toByte)
      val Right((_, rows)) = c.execute(id, Seq(
        0x0A -> Some(dateBytes), 0x05 -> Some(priceBytes)))
      val oracle = spark.sql(
        "select o_orderkey from orders where o_orderdate >= date '1996-01-01'" +
          " and o_totalprice > 150000.0 order by o_orderkey")
        .collect().map(_.getLong(0).toString).toSeq
      assert(rows.map(_.head.get) == oracle)
      assert(oracle.nonEmpty, "fixture must exercise the filter")
      c.quit()
    } finally server.stop()
  }

  test("@@ inside a string literal is user data, not a sysvar splice") {
    Tables.registerAll(spark, TestSpark.Sf)
    val server = MysqlServer.start(spark)
    try {
      val c = new Client(server.boundPort)
      // the @@example substring must survive verbatim; a naive splice
      // would turn it into NULL (unknown var) and corrupt the value
      val Right((_, rows)) =
        c.query("select 'user@@example.com' as s, @@autocommit as a")
      assert(rows.head.head.contains("user@@example.com"))
      assert(rows.head(1).contains("1"), "real sysvar still splices")
      c.quit()
    } finally server.stop()
  }

  test("placeholders inside comments are not parameters") {
    assert(MysqlServer.countPlaceholders(
      "select a from t /* pick ? later */ where b = ? -- or ?\n") == 1)
    assert(MysqlServer.countPlaceholders(
      "select '?' as q, ? as p # trailing ?\n") == 1)
  }

  test("PREPARE of a command statement does not execute it") {
    Tables.registerAll(spark, TestSpark.Sf)
    spark.sql("drop table if exists graft_prep_probe")
    spark.sql("create table graft_prep_probe (x bigint) using parquet")
    val server = MysqlServer.start(spark)
    try {
      val c = new Client(server.boundPort)
      val Right((id, _, nParams)) =
        c.prepare("insert into graft_prep_probe values (?)")
      assert(nParams == 1)
      // prepare alone must leave the table EMPTY — Spark executes
      // command nodes eagerly inside sql(), so a schema probe of the
      // NULL-spliced text would have inserted a spurious NULL row
      assert(spark.table("graft_prep_probe").count() == 0,
        "PREPARE executed the INSERT")
      // CTE-headed DML is still DML: a keyword whitelist keyed on
      // 'with' would schema-probe (and thereby run) this insert
      val Right(_) = c.prepare(
        "with q as (select ? as x) insert into graft_prep_probe " +
          "select x from q")
      assert(spark.table("graft_prep_probe").count() == 0,
        "PREPARE executed the CTE-headed INSERT")
      // while a CTE-headed QUERY still gets its schema derived
      val Right((_, nCols, _)) = c.prepare(
        "with q as (select 1 as x) select x from q")
      assert(nCols == 1)
      // read-only metadata commands are Command nodes too, but they are
      // allow-listed for the schema probe: drivers read PREPARE-time
      // column definitions, and SHOW/DESCRIBE/EXPLAIN mutate nothing
      val Right((_, showCols, _)) = c.prepare("show tables")
      assert(showCols > 0, "SHOW TABLES lost its prepare-time column defs")
      val Right((_, descCols, _)) = c.prepare("describe graft_prep_probe")
      assert(descCols > 0, "DESCRIBE lost its prepare-time column defs")
      // the allow-list covers the whole families, not a node list:
      // SHOW DATABASES parses to an execution-side RunnableCommand and
      // DESCRIBE FUNCTION to a different catalyst node than DESCRIBE
      val Right((_, dbCols, _)) = c.prepare("show databases")
      assert(dbCols > 0, "SHOW DATABASES lost its prepare-time column defs")
      val Right((_, fnCols, _)) = c.prepare("describe function abs")
      assert(fnCols > 0,
        "DESCRIBE FUNCTION lost its prepare-time column defs")
      val Right((_, explCols, _)) = c.prepare("explain select 1")
      assert(explCols > 0, "EXPLAIN lost its prepare-time column defs")
      // EXPLAIN only formats its inner plan — even EXPLAIN <dml> is
      // probe-safe and must not run the insert
      val Right((_, explDml, _)) = c.prepare(
        "explain insert into graft_prep_probe values (1)")
      assert(explDml > 0)
      assert(spark.table("graft_prep_probe").count() == 0,
        "EXPLAIN DML schema probe executed the INSERT")
      c.quit()
    } finally {
      server.stop()
      spark.sql("drop table if exists graft_prep_probe")
    }
  }

  test("unsupported cursor kinds answer a clean ERR, connection stays up") {
    val server = MysqlServer.start(spark)
    try {
      val c = new Client(server.boundPort)
      // COM_STMT_FETCH on a never-prepared handle: decoded and refused
      c.sendRaw(Array[Byte](MysqlServer.ComStmtFetch.toByte,
        1, 0, 0, 0, 10, 0, 0, 0))
      assert(c.readErr().exists(_.contains("FETCH")))
      // EXECUTE asking FOR_UPDATE / SCROLLABLE cursors: refused (the
      // READ_ONLY kind is served — its own spec covers the lifecycle)
      val Right((id, _, _)) = c.prepare("select 1 as a")
      Seq(0x02, 0x04).foreach { flag =>
        val buf = new java.io.ByteArrayOutputStream()
        buf.write(MysqlServer.ComStmtExecute)
        buf.write(leBytes(id.toInt, 4))
        buf.write(flag)
        buf.write(leBytes(1, 4))
        c.sendRaw(buf.toByteArray)
        assert(c.readErr().exists(_.contains("cursor protocol")))
      }
      assert(c.ping()) // every refusal left the connection usable
      c.quit()
    } finally server.stop()
  }

  test("'--' without trailing space is double negation, not a comment") {
    val server = MysqlServer.start(spark)
    try {
      val c = new Client(server.boundPort)
      // mysqld semantics: 1--2 = 1 - (-2) = 3 (Spark alone would lex
      // '--2' as a line comment and answer 1)
      val Right((_, rows)) = c.query("select 1--2 as a")
      assert(rows == Seq(Seq(Some("3"))))
      // '-- ' (with space) is still a comment
      val Right((_, rows2)) = c.query("select 7 as b -- +1\n")
      assert(rows2 == Seq(Seq(Some("7"))))
      // a '?' after a non-comment '--' counts as a parameter
      assert(MysqlServer.countPlaceholders("select 1--2, ? as p") == 1)
      c.quit()
    } finally server.stop()
  }

  test("runaway multi-frame reassembly is bounded at max_allowed_packet") {
    // an endless stream of full 16 MB continuation frames must fail the
    // read instead of growing the heap without limit
    val endless: java.io.InputStream = new java.io.InputStream {
      private var pos = 0
      private val frameLen = 4 + MysqlServer.MaxPacket
      override def read(): Int = {
        val inFrame = pos % frameLen
        pos += 1
        if (inFrame == 0 || inFrame == 1 || inFrame == 2) 0xFF
        else 0 // seq byte and payload
      }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        var i = 0
        while (i < len) { b(off + i) = read().toByte; i += 1 }
        len
      }
    }
    intercept[java.io.EOFException] { MysqlServer.readPacket(endless) }
  }

  test("multi-frame logical packets reassemble (16MB splitting rule)") {
    val payload = new Array[Byte](MysqlServer.MaxPacket + 5)
    payload(0) = 42
    payload(payload.length - 1) = 7
    val framed = new java.io.ByteArrayOutputStream()
    MysqlServer.writePacket(framed, 0,
      java.util.Arrays.copyOfRange(payload, 0, MysqlServer.MaxPacket))
    MysqlServer.writePacket(framed, 1,
      java.util.Arrays.copyOfRange(payload, MysqlServer.MaxPacket,
        payload.length))
    val (seq, got) = MysqlServer.readPacket(
      new java.io.ByteArrayInputStream(framed.toByteArray))
    assert(seq == 1 && got.length == payload.length)
    assert(got(0) == 42 && got(got.length - 1) == 7)
  }

  test("truncated statement commands answer or ignore, never kill the link") {
    Tables.registerAll(spark, TestSpark.Sf)
    val server = MysqlServer.start(spark)
    try {
      val c = new Client(server.boundPort)
      // 1-byte COM_STMT_EXECUTE → ERR, connection stays usable
      c.sendRaw(Array(MysqlServer.ComStmtExecute.toByte))
      assert(c.readErr().nonEmpty, "malformed EXECUTE should answer ERR")
      // 1-byte COM_STMT_CLOSE → silently ignored (no response command)
      c.sendRaw(Array(MysqlServer.ComStmtClose.toByte))
      val Right((_, rows)) = c.query("select 1 as x")
      assert(rows.head.head.contains("1"), "connection died after fuzz")
      c.quit()
    } finally server.stop()
  }
}
