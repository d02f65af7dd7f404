package graft.server

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException,
  InputStream, OutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicLong}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Minimal MySQL wire-protocol front door: HandshakeV10, a permissive
  * connection phase, and a COM_QUERY loop answering text-protocol
  * resultsets from `spark.sql`.
  *
  * This is the counterpart of the reference's protocol server
  * (doradb-protocol/src/mysql/{handshake.rs,auth.rs,cmd/mod.rs:89-92};
  * doradb-server/src/mysql/serve_tcp.rs:47-70): a stock MySQL client can
  * connect, authenticate, and run queries. The implementation follows
  * the PUBLIC protocol documentation
  * (dev.mysql.com/doc/dev/mysql-server → client/server protocol), not
  * the reference's codec — and covers the slice a query engine needs:
  *
  *  - HandshakeV10 + HandshakeResponse41 (CLIENT_PROTOCOL_41 required)
  *    with real credential verification for BOTH of the reference's
  *    auth plugins (doradb-protocol/src/mysql/auth.rs:52-57) when a
  *    user table is configured. `caching_sha2_password` (the MySQL-8
  *    client default, advertised in the handshake): the 32-byte
  *    XOR-SHA256 fast-auth scramble is checked against the stored
  *    `SHA2(SHA2(password))`; with a TLS context configured the server
  *    advertises CLIENT_SSL, upgrades in place on an SSLRequest
  *    packet, and serves the full-authentication stage (plaintext
  *    password over the encrypted channel, verified against the same
  *    stored double-SHA2) — over a plaintext socket full auth is
  *    refused with a clean ERR (the RSA-key option is not served).
  *    `mysql_native_password`: the 20-byte scramble against the stored
  *    double-SHA1, `scramble XOR SHA1(salt ‖ stored) = SHA1(password)`,
  *    then `SHA1(·) == stored` (constant-time compare). A client whose
  *    offered plugin differs from the account's gets an
  *    AuthSwitchRequest, so stock MySQL 8 CLIs connect with no
  *    `--default-auth` juggling. With no users configured the phase
  *    stays permissive — the bind is loopback-only by default, like
  *    [[SqlServer]], so the open mode is a deliberate dev-loop
  *    default, not a hole.
  *  - COM_QUERY → column-count, ColumnDefinition41 per column, EOF,
  *    lenenc-string text rows, EOF (classic, non-DEPRECATE_EOF framing;
  *    the server never advertises CLIENT_DEPRECATE_EOF so clients use
  *    the EOF form). EXPLAIN returns plan rows; UPDATE/DELETE route to
  *    [[graft.operators.Dml.executeStatement]]'s copy-on-write rewrite
  *    and answer OK with the affected-row count. Stock-client bootstrap
  *    works end-to-end: `@@var` references splice to literal session
  *    variables, `SET NAMES`/charset/user-variable SETs are acknowledged
  *    no-ops, and SHOW VARIABLES [LIKE] / SHOW WARNINGS answer from the
  *    emulated variable table. `SET sql_mode = 'ANSI_QUOTES'` (or ANSI)
  *    enables the reference's ANSI dialect per connection: double-quoted
  *    identifiers are rewritten to backtick form ([[Dialect]]) before
  *    parsing, exactly mysqld's switch for the same split.
  *  - COM_FIELD_LIST (the only other command the reference's server
  *    accepts) → ColumnDefinition41 per column + EOF.
  *  - Prepared statements (the BINARY protocol — what JDBC and most
  *    connector libraries actually run): COM_STMT_PREPARE registers the
  *    `?`-parameterized text (quote-aware placeholder scan) and answers
  *    the prepare-OK header + param/column definition blocks, with the
  *    result schema derived by ANALYZING the statement under NULL
  *    bindings (plans, never executes); COM_STMT_EXECUTE decodes the
  *    null bitmap + typed binary params (ints/floats little-endian,
  *    strings/decimals lenenc, DATE/DATETIME component structs),
  *    splices them as typed SQL literals, and answers a binary
  *    resultset; COM_STMT_SEND_LONG_DATA accumulates chunked string/
  *    blob param values ahead of EXECUTE (silent, cleared by RESET);
  *    CURSOR_TYPE_READ_ONLY EXECUTEs open a server-side cursor whose
  *    rows COM_STMT_FETCH pages out (EOF flagged CURSOR_EXISTS /
  *    LAST_ROW_SENT; FOR_UPDATE and SCROLLABLE cursors refused with a
  *    clean ERR 1235); COM_STMT_CLOSE (silent) and COM_STMT_RESET
  *    (which also closes the cursor) complete the lifecycle. Param
  *    types are remembered across executions of a handle, as the
  *    protocol requires when new_params_bound_flag = 0.
  *  - COM_PING / COM_INIT_DB / COM_QUIT, and the admin quartet the
  *    reference's command enum also decodes (doradb-protocol/src/mysql/
  *    cmd/mod.rs:21-25): COM_STATISTICS (raw-string status line — the
  *    `mysqladmin status` framing, no OK/resultset envelope),
  *    COM_PROCESS_INFO (SHOW PROCESSLIST resultset from the live
  *    registry), COM_PROCESS_KILL (close a connection by id; ERR 1094
  *    for unknown ids), COM_DEBUG (EOF ack). Everything else answers
  *    ERR 1047 (unknown command) without dropping the connection.
  *
  * Row values travel as text (the MySQL text protocol), so the Spark →
  * wire mapping is `Row.get(i).toString` plus a type byte per column for
  * clients that care ([[MysqlServer.typeByte]]). Results are capped at
  * `maxRows` like the JSON endpoint — a wire protocol does not change
  * the rule that unbounded `collect()` belongs to cursors, not sockets.
  */
final class MysqlServer(spark: SparkSession, port: Int, maxRows: Int,
    bindAddress: InetAddress,
    users: Map[String, MysqlServer.StoredCred],
    ssl: Option[javax.net.ssl.SSLContext] = None) {
  import MysqlServer._

  /** Capabilities actually advertised: CLIENT_SSL only when a TLS
    * context is configured — advertising it without one would make a
    * stock client send an SSLRequest this server cannot upgrade. */
  private val caps: Long = ServerCaps | (if (ssl.isDefined) ClientSsl else 0L)

  private val socket = new ServerSocket(port, 50, bindAddress)
  private val pool = Executors.newFixedThreadPool(8)
  private val running = new AtomicBoolean(true)
  private val connIds = new AtomicInteger(0)
  private val saltRng = new java.security.SecureRandom()

  /** Admin-command state: server start for COM_STATISTICS' uptime,
    * statements served (mysqld's Questions), and the live-connection
    * registry COM_PROCESS_INFO lists and COM_PROCESS_KILL targets. */
  private val startedAtMs = System.currentTimeMillis()
  private val questions = new AtomicLong(0)
  private final class LiveConn(val id: Int, val socket: Socket,
      val startedMs: Long) { @volatile var user: String = "" }
  private val live =
    new java.util.concurrent.ConcurrentHashMap[Integer, LiveConn]

  def boundPort: Int = socket.getLocalPort

  private val acceptor = new Thread(() => {
    while (running.get()) {
      try {
        val client = socket.accept()
        pool.execute(() => serve(client))
      } catch {
        case _: Throwable if !running.get() =>
        case e: Throwable =>
          System.err.println(s"[mysql] accept: $e")
          // a persistent accept failure (e.g. fd exhaustion) must not
          // busy-loop a core
          Thread.sleep(100)
      }
    }
  }, "graft-mysql-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  def stop(): Unit = {
    running.set(false)
    socket.close()
    pool.shutdownNow()
  }

  // ---- connection loop ---------------------------------------------------

  private def serve(client: Socket): Unit = {
    // UNBUFFERED input until the TLS-upgrade decision: a buffered read
    // of the SSLRequest could pre-fetch the client's TLS ClientHello
    // bytes into the buffer, and the SSLSocket layered over the raw
    // socket would never see them — the classic STARTTLS over-read
    // race. readPacket/readN consume exactly the packet's bytes, so an
    // unbuffered stream is safe (and costs a few extra reads for one
    // packet at most); buffering starts after the channel is settled.
    val rawIn = client.getInputStream
    val out = new BufferedOutputStream(client.getOutputStream)
    val connId = connIds.incrementAndGet()
    // registered before the handshake (mysqld lists connecting clients
    // too); removed on the way out, whatever the exit path
    val lc = new LiveConn(connId, client, System.currentTimeMillis())
    live.put(connId, lc)
    try {
      val salt = newSalt()
      writePacket(out, 0, handshakeV10(connId, salt))
      out.flush()
      // First client packet: either an SSLRequest (32-byte head only —
      // flags, max packet, charset, 23 reserved; NO username) asking to
      // upgrade the socket before credentials travel, or the full
      // HandshakeResponse41. PROTOCOL_41 is required; the credential
      // check runs only when a user table is configured.
      val (seq0, first) = readPacket(rawIn)
      var cin: InputStream = new BufferedInputStream(rawIn)
      var cout: OutputStream = out
      var resp = first
      var respSeq = seq0
      var secure = false
      // An SSLRequest is EXACTLY the 32-byte head (4 flags + 4 max
      // packet + 1 charset + 23 reserved) — match the frame precisely:
      // a malformed <=36-byte HandshakeResponse41 that happens to set
      // CLIENT_SSL must fail authentication cleanly, not stall the
      // connection inside a TLS handshake it never intended.
      if ((leU32(first, 0) & ClientSsl) != 0 && ssl.isDefined &&
          first.length == 32) {
        // TLS upgrade in place: wrap the accepted socket server-side;
        // the real HandshakeResponse41 (and everything after) arrives
        // encrypted. The salt stays valid — only the channel changed.
        val s = ssl.get.getSocketFactory.createSocket(client,
          client.getInetAddress.getHostAddress, client.getPort, false)
          .asInstanceOf[javax.net.ssl.SSLSocket]
        s.setUseClientMode(false)
        val sin = new BufferedInputStream(s.getInputStream)
        val sout = new BufferedOutputStream(s.getOutputStream)
        val (s2, resp2) = readPacket(sin)
        cin = sin; cout = sout; resp = resp2; respSeq = s2; secure = true
      }
      val clientFlags = leU32(resp, 0)
      if ((clientFlags & ClientProtocol41) == 0) {
        writePacket(cout, respSeq + 1,
          errPacket(1043, "08S01", "pre-4.1 clients are not supported"))
        cout.flush()
      } else if (authPhase(cin, cout, resp, respSeq, clientFlags, salt,
          secure, lc))
        commandLoop(cin, cout, secure,
          (clientFlags & ClientMultiStatements) != 0, lc)
    } catch {
      case _: EOFException => // client went away
      case _: java.net.SocketException =>
        // socket closed under this loop — a client reset, or a
        // COM_PROCESS_KILL (incl. self-kill after its OK): the legal
        // end of a connection, not an error to log
      case _: Throwable if !running.get() =>
      case e: Throwable => System.err.println(s"[mysql] conn: $e")
    } finally { live.remove(connId); client.close() }
  }

  /** Connection-phase credential check with plugin negotiation; true =
    * authenticated (final OK already written), false = denied (ERR
    * written). Parses the HandshakeResponse41 tail (username, auth
    * response in whichever of the three encodings the client's flags
    * selected, optional database, optional client auth-plugin name) and
    * verifies against the configured user table. Both of the
    * reference's plugins (doradb-protocol/src/mysql/auth.rs:52-57) are
    * served — `mysql_native_password` (scramble411) and
    * `caching_sha2_password` (XOR-SHA256 fast auth; the algorithms are
    * the PUBLIC protocol's). When the client's offered plugin differs
    * from the account's, an AuthSwitchRequest re-asks with the
    * account's plugin, so a stock MySQL 8 client (which defaults to
    * caching_sha2) and a legacy native client both land on the right
    * scramble. caching_sha2's full-authentication stage follows
    * mysqld: over a TLS-upgraded connection (`secure`) the client's
    * NUL-terminated plaintext password is accepted and verified
    * against the stored double-SHA2; over plaintext the stage is
    * REFUSED with a clean ERR (the RSA-encrypted-password option is
    * not served), since the password cannot travel safely. */
  /** Per-connection CSPRNG salt: a derivable salt (e.g. from connId,
    * which restarts at 1 every boot) would make a captured scramble
    * replayable as soon as the salt repeats. Bytes are masked into the
    * protocol's printable-nonzero range like the reference does. A
    * FRESH salt is also minted per COM_CHANGE_USER re-authentication —
    * reusing the connection's original salt would let a captured
    * change-user scramble replay within the same session. */
  private def newSalt(): Array[Byte] = {
    val salt = new Array[Byte](20)
    saltRng.nextBytes(salt)
    var si = 0
    while (si < salt.length) {
      salt(si) = (0x21 + ((salt(si) & 0xFF) % 0x5d)).toByte
      si += 1
    }
    salt
  }

  private def authPhase(in: InputStream, out: OutputStream,
      resp: Array[Byte], seq0: Int, flags: Long,
      salt: Array[Byte], secure: Boolean, lc: LiveConn): Boolean = {
    var seq = seq0
    def accept(): Boolean = {
      writePacket(out, seq + 1, okPacket()); out.flush(); true
    }
    def denied(user: String): Boolean = {
      writePacket(out, seq + 1, errPacket(1045, "28000",
        s"Access denied for user '$user'"))
      out.flush(); false
    }
    if (users.isEmpty) { // permissive dev mode (loopback bind)
      // no credential check, but record who the client CLAIMS to be so
      // the COM_PROCESS_INFO listing stays meaningful
      val off = 4 + 4 + 1 + 23
      val e = resp.indexOf(0.toByte, off)
      if (e > off)
        lc.user = new String(resp, off, e - off, StandardCharsets.UTF_8)
      return accept()
    }
    try {
      var off = 4 + 4 + 1 + 23 // flags, max-packet, charset, reserved
      val unameEnd = resp.indexOf(0.toByte, off)
      if (unameEnd < 0) return denied("")
      val user = new String(resp, off, unameEnd - off, StandardCharsets.UTF_8)
      off = unameEnd + 1
      val authResp: Array[Byte] =
        if ((flags & ClientPluginAuthLenencData) != 0) {
          val (len, used) = readLenencInt(resp, off)
          val a = java.util.Arrays.copyOfRange(resp, off + used,
            off + used + len.toInt)
          off += used + len.toInt
          a
        } else if ((flags & ClientSecureConnection) != 0) {
          val len = resp(off) & 0xFF
          val a = java.util.Arrays.copyOfRange(resp, off + 1, off + 1 + len)
          off += 1 + len
          a
        } else {
          val end = { val i = resp.indexOf(0.toByte, off); if (i < 0) resp.length else i }
          val a = java.util.Arrays.copyOfRange(resp, off, end)
          off = math.min(resp.length, end + 1)
          a
        }
      if ((flags & ClientConnectWithDb) != 0 && off < resp.length) {
        val end = { val i = resp.indexOf(0.toByte, off); if (i < 0) resp.length else i }
        off = end + 1 // database name: accepted and ignored (single catalog)
      }
      val clientPlugin: Option[String] =
        if ((flags & ClientPluginAuth) != 0 && off < resp.length) {
          val end = { val i = resp.indexOf(0.toByte, off); if (i < 0) resp.length else i }
          Some(new String(resp, off, end - off, StandardCharsets.US_ASCII))
        } else None // pluginless client: verify its bytes as-is
      // Unknown users verify against a constant dummy credential on the
      // DEFAULT plugin so the packet flow (AuthSwitch or not, hashing
      // cost) is uniform with a real caching_sha2 account — an early
      // return OR a missing switch round-trip would each be a side
      // channel that enumerates usernames.
      val known = users.contains(user)
      val cred = users.getOrElse(user, DummyCred)
      val response =
        if (clientPlugin.exists(_ != cred.plugin)) {
          // AuthSwitchRequest: 0xFE, account plugin name NUL, salt NUL
          val sw = new java.io.ByteArrayOutputStream()
          sw.write(0xFE)
          sw.write(cred.plugin.getBytes(StandardCharsets.US_ASCII))
          sw.write(0)
          sw.write(salt, 0, salt.length); sw.write(0)
          writePacket(out, seq + 1, sw.toByteArray)
          out.flush()
          val (s2, r2) = readPacket(in) // AuthSwitchResponse: raw data
          seq = s2
          r2
        } else authResp
      val ok = finishAuth(in, out, seq, user, known, cred, salt, response,
        secure)
      if (ok) lc.user = user
      ok
    } catch {
      // malformed handshake tail (truncated lenenc, NULL/negative lenenc
      // length making copyOfRange throw IllegalArgument, short
      // scramble): deny, never throw the connection handler
      case scala.util.control.NonFatal(_) => denied("?")
    }
  }

  /** The credential check SHARED by the connection phase and
    * COM_CHANGE_USER, from the moment a (cred, salt, response) triple
    * exists: fast-auth verification (which runs UNCONDITIONALLY, before
    * the `known` gate, so hashing cost is identical for unknown users —
    * the dummy value alone must never authenticate), caching_sha2's
    * fast_auth_success framing, and its full-authentication fallback —
    * over TLS the client's NUL-terminated plaintext password verifies
    * against the stored double-SHA2 (constant-time); over plaintext, or
    * when the client asks for the unserved RSA key (the LONE 0x02
    * byte — a longer payload starting 0x02 is a legal password byte),
    * the stage is refused with a clean ERR instead of stalling. true =
    * authenticated (OK written); false = denied (ERR written). */
  private def finishAuth(in: InputStream, out: OutputStream, seq0: Int,
      user: String, known: Boolean, cred: StoredCred, salt: Array[Byte],
      response: Array[Byte], secure: Boolean): Boolean = {
    var seq = seq0
    def accept(): Boolean = {
      writePacket(out, seq + 1, okPacket()); out.flush(); true
    }
    def denied(): Boolean = {
      writePacket(out, seq + 1, errPacket(1045, "28000",
        s"Access denied for user '$user'"))
      out.flush(); false
    }
    val fastOk = cred.plugin match {
      case CachingSha2Plugin => cachingSha2Ok(salt, response, cred.verifier)
      case _ => nativePasswordOk(salt, response, cred.verifier)
    }
    if (known && fastOk) {
      if (cred.plugin == CachingSha2Plugin && cred.verifier.nonEmpty) {
        // fast_auth_success AuthMoreData, then OK (mysqld framing)
        writePacket(out, seq + 1, Array[Byte](0x01, 0x03))
        seq += 1
      }
      accept()
    } else if (cred.plugin == CachingSha2Plugin && cred.verifier.nonEmpty) {
      // fast auth did not verify → perform_full_authentication
      writePacket(out, seq + 1, Array[Byte](0x01, 0x04))
      out.flush()
      val (s3, r3) = readPacket(in)
      seq = s3
      val rsaReq = r3.length == 1 && r3(0) == 0x02
      if (secure && r3.nonEmpty && !rsaReq) {
        val end = { val i = r3.indexOf(0.toByte); if (i < 0) r3.length else i }
        val pw = new String(r3, 0, end, StandardCharsets.UTF_8)
        val pwOk = java.security.MessageDigest.isEqual(
          doubleSha256(pw), cred.verifier)
        if (known && pwOk) accept() else denied()
      } else denied()
    } else denied()
  }

  /** COM_CHANGE_USER re-authentication: parse the new username, mint a
    * FRESH salt ([[newSalt]] — the scramble in the command payload was
    * computed against the connection's original salt, so it is ignored
    * and the check re-runs against the new one), and verify through an
    * AuthSwitchRequest to the ACCOUNT's plugin (the server may always
    * re-ask; mysqld itself answers COM_CHANGE_USER this way when the
    * offered plugin or salt does not suit it). true = switched (OK
    * written); false = refused (ERR written, old identity kept — the
    * session stays usable, exactly mysqld's behavior). The packet flow
    * for unknown users is uniform with [[authPhase]]'s dummy-credential
    * discipline, and caching_sha2 full authentication follows the same
    * TLS-only plaintext rule.
    *
    * Only the username is consumed from the payload: the trailing
    * database and charset fields are deliberately ignored, consistent
    * with COM_INIT_DB being an OK no-op — this server exposes a single
    * catalog, so "switch default database" has nothing to switch, and
    * the connection's charset stays the handshake-negotiated utf8mb4. */
  private def changeUser(in: InputStream, out: OutputStream,
      cmd: Array[Byte], secure: Boolean, lc: LiveConn): Boolean = {
    var seq = 0
    def denied(user: String): Boolean = {
      writePacket(out, seq + 1, errPacket(1045, "28000",
        s"Access denied for user '$user'"))
      out.flush(); false
    }
    def accept(): Boolean = {
      writePacket(out, seq + 1, okPacket()); out.flush(); true
    }
    try {
      val unameEnd = cmd.indexOf(0.toByte, 1)
      if (unameEnd < 0) return denied("")
      val user = new String(cmd, 1, unameEnd - 1, StandardCharsets.UTF_8)
      if (users.isEmpty) { lc.user = user; return accept() } // dev mode
      val known = users.contains(user)
      val cred = users.getOrElse(user, DummyCred)
      val salt2 = newSalt()
      val sw = new java.io.ByteArrayOutputStream()
      sw.write(0xFE)
      sw.write(cred.plugin.getBytes(StandardCharsets.US_ASCII)); sw.write(0)
      sw.write(salt2, 0, salt2.length); sw.write(0)
      writePacket(out, seq + 1, sw.toByteArray)
      out.flush()
      val (s2, r2) = readPacket(in)
      seq = s2
      val ok = finishAuth(in, out, seq, user, known, cred, salt2, r2, secure)
      if (ok) lc.user = user
      ok
    } catch {
      case scala.util.control.NonFatal(_) => denied("?")
    }
  }

  /** One prepared statement: the original text, its placeholder count,
    * the result schema derived at prepare time, and the param type
    * bytes from the last EXECUTE that carried them (the protocol sends
    * types only when `new_params_bound_flag` = 1 — a driver re-executing
    * the same handle omits them and the server must remember). */
  private final class Prepared(val sql: String, val nParams: Int,
      val schema: StructType) {
    var paramTypes: Array[Int] = Array.emptyIntArray
    /** Open READ-ONLY cursor: the EXECUTE's materialized (maxRows-
      * capped, like every resultset here) rows awaiting COM_STMT_FETCH.
      * Replaced by the next EXECUTE, discarded by RESET/CLOSE. */
    var cursor: Option[(StructType,
      Iterator[org.apache.spark.sql.Row])] = None
    /** COM_STMT_SEND_LONG_DATA accumulator, keyed by param index:
      * chunks append in arrival order; a param with accumulated data
      * takes its value from here and carries NO inline value in the
      * EXECUTE packet. Cleared by COM_STMT_RESET (mysqld semantics —
      * EXECUTE does not clear, so a handle can re-execute with the
      * same long-bound value). */
    val longData =
      scala.collection.mutable.Map.empty[Int, java.io.ByteArrayOutputStream]
    /** Set when accumulation blew past [[MaxLongData]]: the command has
      * no response channel, so the overflow is reported as an ERR at
      * EXECUTE time instead of growing the server heap without bound. */
    var longDataOverflow = false
    def longDataSize: Long = longData.valuesIterator.map(_.size.toLong).sum
  }

  /** Per-connection dialect state (protocol scope, like the statement
    * registry): `SET sql_mode = 'ANSI_QUOTES'` flips ANSI identifier
    * quoting for this connection only — the reference's dialect split
    * (doradb-sql/src/parser/dialect.rs:13-60) surfaced the way mysqld
    * surfaces it. */
  private final class ConnState { var ansiQuotes = false }

  private def commandLoop(in: InputStream, out: OutputStream,
      secure: Boolean, multi: Boolean, lc: LiveConn): Unit = {
    var open = true
    // Statement registry is per CONNECTION (protocol scope): ids restart
    // at 1 on each connection and die with it, like mysqld's.
    val stmts = scala.collection.mutable.Map.empty[Long, Prepared]
    var nextStmtId = 0L
    var conn = new ConnState
    // CLIENT_MULTI_STATEMENTS is the one capability a client may toggle
    // MID-CONNECTION (COM_SET_OPTION) — connectors flip it off around
    // untrusted text to close the stacked-query injection channel. The
    // handshake bit seeds the live state; the toggle mutates it.
    var multiOn = multi
    while (open) {
      val (_, cmd) = readPacket(in)
      if (cmd.isEmpty) open = false
      else cmd(0) match {
        case ComQuit => open = false
        case ComResetConnection =>
          // COM_RESET_CONNECTION: wipe session state WITHOUT
          // re-authentication — the cheap pooled-link recycle (the
          // expensive one, COM_CHANGE_USER, also switches identity).
          // mysqld's defined scope: prepared statements, session
          // variables, and session options revert to their
          // connection-start values; the user stays. Answer OK.
          stmts.clear()
          conn = new ConnState
          multiOn = multi
          writePacket(out, 1, okPacket()); out.flush()
        case ComPing => writePacket(out, 1, okPacket()); out.flush()
        case ComInitDb => writePacket(out, 1, okPacket()); out.flush()
        case ComStatistics =>
          // COM_STATISTICS answers ONE packet whose payload is a raw
          // human-readable ASCII string — no OK/ERR/resultset framing
          // (the `mysqladmin status` wire shape). Fields mirror
          // mysqld's line; table-cache counters are fixed (this server
          // has no table cache to report).
          val up = (System.currentTimeMillis() - startedAtMs) / 1000L
          val qs = questions.get()
          val qps =
            if (up > 0) f"${qs.toDouble / up}%.3f" else f"$qs%d.000"
          val stats = s"Uptime: $up  Threads: ${live.size}  " +
            s"Questions: $qs  Slow queries: 0  Opens: 0  " +
            s"Flush tables: 1  Open tables: 0  " +
            s"Queries per second avg: $qps"
          writePacket(out, 1, stats.getBytes(StandardCharsets.US_ASCII))
          out.flush()
        case ComProcessInfo =>
          // COM_PROCESS_INFO: the SHOW PROCESSLIST resultset, built
          // from the live-connection registry (no SQL round trip).
          // Commands render as mysqld does: the asking connection is
          // mid-command ("Query"), everyone else idles ("Sleep").
          var seq = 1
          def send(p: Array[Byte]): Unit = {
            writePacket(out, seq, p); seq += 1
          }
          val fields = Seq(
            StructField("Id", LongType), StructField("User", StringType),
            StructField("Command", StringType),
            StructField("Time", LongType))
          send(lenencInt(fields.length))
          fields.foreach(f => send(columnDefinition(f)))
          send(eofPacket())
          val now = System.currentTimeMillis()
          live.values.toArray(Array.empty[LiveConn]).sortBy(_.id)
            .foreach { c =>
              val buf = new java.io.ByteArrayOutputStream()
              def cell(s: String): Unit = {
                val b = s.getBytes(StandardCharsets.UTF_8)
                buf.write(lenencInt(b.length)); buf.write(b)
              }
              cell(c.id.toString)
              cell(c.user)
              cell(if (c.id == lc.id) "Query" else "Sleep")
              cell(((now - c.startedMs) / 1000L).toString)
              send(buf.toByteArray)
            }
          send(eofPacket(StatusAutocommit))
          out.flush()
        case ComProcessKill =>
          // COM_PROCESS_KILL: u32 LE connection id. Closing the
          // victim's socket ends its read loop cleanly (the same path
          // as a client hangup); an unknown id is mysqld's ERR 1094.
          // Self-kill is legal: OK is written first, then this loop
          // dies on its closed socket.
          // Authorization mirrors mysqld's same-user rule: with users
          // configured, a connection may kill only connections it owns
          // (ERR 1095 otherwise — there is no PROCESS/SUPER grant
          // surface here). The permissive kill-anyone behavior survives
          // only in dev mode (no users, loopback bind).
          if (cmd.length >= 5) {
            val id = leU32(cmd, 1).toInt
            val victim = live.get(id)
            if (victim != null && users.nonEmpty && victim.user != lc.user) {
              writePacket(out, 1, errPacket(1095, "HY000",
                s"You are not owner of thread $id"))
              out.flush()
            } else if (victim != null) {
              writePacket(out, 1, okPacket()); out.flush()
              try victim.socket.close() catch { case _: Throwable => () }
            } else {
              writePacket(out, 1,
                errPacket(1094, "HY000", s"Unknown thread id: $id"))
              out.flush()
            }
          } else {
            writePacket(out, 1, errPacket(1835, "HY000",
              "Malformed communication packet"))
            out.flush()
          }
        case ComDebug =>
          // COM_DEBUG: mysqld dumps internals to ITS OWN stderr and
          // answers EOF — the wire carries only the acknowledgement.
          writePacket(out, 1, eofPacket()); out.flush()
        case ComChangeUser =>
          // Re-authentication on an open connection — the command every
          // connection pool issues to hand a pooled link to a new
          // tenant. On SUCCESS the session state is wiped like mysqld
          // wipes it (prepared statements, session sql_mode); on
          // FAILURE the connection stays usable under the OLD identity
          // (mysqld keeps the session; only the switch is refused).
          if (changeUser(in, out, cmd, secure, lc)) {
            stmts.clear()
            conn = new ConnState
            // session reset restores the HANDSHAKE-negotiated
            // multi-statement setting (a COM_SET_OPTION toggle is
            // session state, wiped like sql_mode)
            multiOn = multi
          }
        case ComStmtPrepare =>
          val sql = new String(cmd, 1, cmd.length - 1, StandardCharsets.UTF_8)
          nextStmtId += 1
          runPrepare(out, stmts, nextStmtId, sql, conn)
        case ComStmtExecute =>
          // malformed frame (a fuzzer's 1-byte EXECUTE) answers ERR
          // 1835 instead of an out-of-bounds read killing the connection
          if (cmd.length < 10)
            { writePacket(out, 1, errPacket(1835, "HY000",
                "Malformed communication packet")); out.flush() }
          else { questions.incrementAndGet(); runExecute(out, stmts, cmd, conn) }
        case ComStmtSendLongData =>
          // COM_STMT_SEND_LONG_DATA: stmt_id u32 + param_id u16 + raw
          // chunk; chunks for one param concatenate in arrival order.
          // NO response by protocol definition — even for an unknown
          // statement id (errors surface at EXECUTE), matching the
          // reference's enumeration of the command
          // (doradb-protocol/src/mysql/cmd/mod.rs:36,74).
          if (cmd.length >= 7) {
            val id = leU32(cmd, 1)
            val param = (cmd(5) & 0xFF) | ((cmd(6) & 0xFF) << 8)
            stmts.get(id).foreach { st =>
              // bounded accumulation: past the cap, chunks are dropped
              // and the statement is poisoned — EXECUTE answers ERR
              // 1153 instead of the JVM dying of a client's firehose
              if (st.longDataOverflow ||
                  st.longDataSize + (cmd.length - 7) > MaxLongData) {
                st.longDataOverflow = true
                st.longData.clear()
              } else
                st.longData.getOrElseUpdate(param,
                  new java.io.ByteArrayOutputStream())
                  .write(cmd, 7, cmd.length - 7)
            }
          }
        case ComStmtClose =>
          // COM_STMT_CLOSE gets NO response by protocol definition
          // (short frames are ignored for the same reason: nothing to
          // answer, and an unguarded read would kill the connection)
          if (cmd.length >= 5) stmts.remove(leU32(cmd, 1))
        case ComStmtReset =>
          // discard accumulated long data (the command's defined job),
          // a poisoned overflow state, and any open cursor → OK
          if (cmd.length >= 5)
            stmts.get(leU32(cmd, 1)).foreach { st =>
              st.longData.clear()
              st.longDataOverflow = false
              st.cursor = None
            }
          writePacket(out, 1, okPacket()); out.flush()
        case ComSetOption =>
          // COM_SET_OPTION: u16 LE operand toggles the session's
          // multi-statement splitting (MYSQL_OPTION_MULTI_STATEMENTS_
          // ON/OFF — the completion of the CLIENT_MULTI_STATEMENTS
          // surface). Success answers EOF under classic framing (this
          // server does not advertise CLIENT_DEPRECATE_EOF); any other
          // operand is mysqld's ERR 1047.
          if (cmd.length >= 3) {
            val opt = (cmd(1) & 0xFF) | ((cmd(2) & 0xFF) << 8)
            opt match {
              case OptionMultiStatementsOn =>
                multiOn = true
                writePacket(out, 1, eofPacket())
              case OptionMultiStatementsOff =>
                multiOn = false
                writePacket(out, 1, eofPacket())
              case _ =>
                writePacket(out, 1, errPacket(1047, "08S01",
                  "Unknown command"))
            }
          } else
            writePacket(out, 1, errPacket(1835, "HY000",
              "Malformed communication packet"))
          out.flush()
        case ComStmtFetch =>
          // COM_STMT_FETCH pages an open READ-ONLY cursor: stmt_id u32
          // + num_rows u32 → up to num_rows binary rows, then EOF with
          // CURSOR_EXISTS (and LAST_ROW_SENT once drained — further
          // fetches keep answering the drained EOF, like mysqld).
          if (cmd.length >= 9) {
            val id = leU32(cmd, 1)
            // u32 num_rows clamped: 0xFFFFFFFF ("fetch everything")
            // must not wrap negative and starve the loop
            val want = math.min(leU32(cmd, 5), Int.MaxValue.toLong).toInt
            stmts.get(id) match {
              case None =>
                writePacket(out, 1, errPacket(1243, "HY000",
                  s"Unknown prepared statement handler ($id) given to " +
                    "FETCH"))
              case Some(st) if st.cursor.isEmpty =>
                writePacket(out, 1, errPacket(1421, "HY000",
                  s"The statement ($id) has no open cursor."))
              case Some(st) =>
                val (schema, it) = st.cursor.get
                var seq = 1
                def send(p: Array[Byte]): Unit = {
                  writePacket(out, seq, p); seq += 1
                }
                var n = 0
                try {
                  while (n < want && it.hasNext) {
                    val payload = binaryRow(schema, it.next())
                    if (payload.length >= MaxPacket)
                      throw new PacketTooLarge
                    send(payload); n += 1
                  }
                  send(eofPacket(StatusAutocommit | StatusCursorExists |
                    (if (it.hasNext) 0 else StatusLastRowSent)))
                } catch {
                  case _: PacketTooLarge =>
                    send(errPacket(1153, "08S01",
                      "row exceeds the 16 MB single-packet limit"))
                }
            }
          } else
            writePacket(out, 1, errPacket(1835, "HY000",
              "Malformed communication packet"))
          out.flush()
        case ComQuery =>
          questions.incrementAndGet()
          val sql = new String(cmd, 1, cmd.length - 1, StandardCharsets.UTF_8)
          // CLIENT_MULTI_STATEMENTS: split at top-level ';' and answer
          // one resultset per statement, every non-final terminal
          // packet flagged SERVER_MORE_RESULTS_EXISTS; an error aborts
          // the remainder (mysqld semantics). Without the capability
          // the text passes through whole — a stray ';' is then the
          // parser's problem, exactly as before.
          val parts =
            if (multiOn) MysqlServer.splitStatements(sql) else Seq(sql)
          if (parts.isEmpty) {
            // all-comment / all-';' text: mysqld's ERR 1065
            writePacket(out, 1, errPacket(1065, "42000", "Query was empty"))
            out.flush()
          } else {
            // packet sequence-ids number CONTINUOUSLY across the chained
            // resultsets of one COM_QUERY response (reset happens at the
            // next command, not per statement)
            var live = true
            var seq = 1
            parts.zipWithIndex.foreach { case (p, idx) =>
              if (live) {
                val moreAfter = idx < parts.length - 1
                val (ok, next) = p match {
                  case ExplainRe(mode, stmt) =>
                    runExplain(out, mode, stmt, conn, moreAfter, seq)
                  case _ => runQuery(out, p, conn, moreAfter, seq)
                }
                live = ok
                seq = next
              }
            }
          }
        case ComFieldList =>
          // COM_FIELD_LIST: NUL-terminated table name (+ field wildcard,
          // ignored) → one ColumnDefinition41 per column, then EOF. The
          // reference's command surface is exactly QUERY + FIELD_LIST
          // (doradb-protocol/src/mysql/cmd/mod.rs:89-92).
          val end = { val i = cmd.indexOf(0, 1); if (i < 0) cmd.length else i }
          val table = new String(cmd, 1, end - 1, StandardCharsets.UTF_8)
          try {
            val schema = spark.table(table).schema
            var seq = 1
            schema.fields.foreach { f =>
              writePacket(out, seq, columnDefinition(f)); seq += 1
            }
            writePacket(out, seq, eofPacket())
            out.flush()
          } catch {
            case e: Throwable =>
              writePacket(out, 1, errPacket(1146, "42S02",
                String.valueOf(e.getMessage).linesIterator.take(2)
                  .mkString(" ").take(200)))
              out.flush()
          }
        case other =>
          writePacket(out, 1,
            errPacket(1047, "08S01", f"unknown command 0x$other%02x"))
          out.flush()
      }
    }
  }

  /** `EXPLAIN [mode] <stmt>` over the wire — the reference parses
    * EXPLAIN as a statement (doradb-sql/src/ast.rs:1556-1562); here a
    * stock MySQL client typing it gets the plan back as a one-column
    * text resultset, one row per plan line (the shape mysql's own
    * `EXPLAIN FORMAT=TREE` uses). Mode keywords mirror Spark SQL's
    * EXPLAIN (extended | codegen | cost | formatted), defaulting to
    * formatted via [[graft.plans.Explain]]. */
  private def runExplain(out: OutputStream, mode: String,
      stmt0: String, conn: ConnState, more: Boolean = false,
      startSeq: Int = 1): (Boolean, Int) = {
    var seq = startSeq
    try {
      val stmt =
        if (conn.ansiQuotes) Dialect.ansiQuotes(stmt0)
        else Dialect.mysqlQuotes(stmt0)
      val text = graft.plans.Explain.explainSql(spark, stmt,
        Option(mode).map(_.toLowerCase).getOrElse("formatted"))
      def send(payload: Array[Byte]): Unit = {
        writePacket(out, seq, payload); seq += 1
      }
      send(lenencInt(1))
      send(columnDefinition(StructField("EXPLAIN", StringType,
        nullable = false)))
      send(eofPacket())
      text.linesIterator.foreach { line =>
        val b = line.getBytes(StandardCharsets.UTF_8)
        val buf = new java.io.ByteArrayOutputStream()
        buf.write(lenencInt(b.length)); buf.write(b)
        send(buf.toByteArray)
      }
      send(eofPacket(
        StatusAutocommit | (if (more) StatusMoreResults else 0)))
      out.flush()
      (true, seq)
    } catch {
      case e: Throwable =>
        writePacket(out, seq, errPacket(1064, "42000",
          String.valueOf(e.getMessage).linesIterator.take(4).mkString(" ")
            .take(400)))
        out.flush()
        (false, seq + 1)
    }
  }

  /** The session variables a stock client's bootstrap reads (the mysql
    * CLI sends `select @@version_comment limit 1`; Connector/J opens
    * with a 20-variable select). Numbers stay bare so `@@autocommit`
    * splices as an integer literal; unknown variables splice as NULL
    * (permissive — MySQL itself errors, but a NULL keeps evolving
    * clients connected). */
  private val SessionVars: Map[String, String] = Map(
    "version_comment" -> "'graft Spark engine'",
    "version" -> s"'$ServerVersion'",
    "autocommit" -> "1",
    "auto_increment_increment" -> "1",
    "character_set_client" -> "'utf8mb4'",
    "character_set_connection" -> "'utf8mb4'",
    "character_set_results" -> "'utf8mb4'",
    "character_set_server" -> "'utf8mb4'",
    "collation_server" -> "'utf8mb4_bin'",
    "collation_connection" -> "'utf8mb4_bin'",
    "init_connect" -> "''",
    "interactive_timeout" -> "28800",
    "wait_timeout" -> "28800",
    "net_write_timeout" -> "60",
    "net_buffer_length" -> "16384",
    "max_allowed_packet" -> "67108864",
    // default connection dialect is MySQL quoting (no ANSI_QUOTES);
    // SET sql_mode='ANSI_QUOTES' flips it per connection (ConnState)
    // and sessionVar() below overrides this entry with the LIVE value
    // so @@sql_mode / SHOW VARIABLES read back what the connection is
    // actually in (connectors configure their quoting from it).
    "sql_mode" -> "'STRICT_TRANS_TABLES,NO_ENGINE_SUBSTITUTION'",
    "lower_case_table_names" -> "0",
    "performance_schema" -> "0",
    "query_cache_size" -> "0",
    "query_cache_type" -> "'OFF'",
    "license" -> "'Apache-2.0'",
    "system_time_zone" -> "'UTC'",
    "time_zone" -> "'SYSTEM'",
    "transaction_isolation" -> "'REPEATABLE-READ'",
    "tx_isolation" -> "'REPEATABLE-READ'",
    "transaction_read_only" -> "0",
    "tx_read_only" -> "0")

  private val SysVarRe =
    "@@(?:(?:session|global)\\.)?([A-Za-z_][A-Za-z_0-9]*)".r

  /** One session variable's literal value for this connection —
    * SessionVars plus the live per-connection overrides (sql_mode
    * reflects the actual dialect state, not the static default). */
  private def sessionVar(name: String, conn: ConnState): Option[String] =
    name match {
      case "sql_mode" if conn.ansiQuotes => Some("'ANSI_QUOTES'")
      case _ => SessionVars.get(name)
    }

  /** Splice `@@var` / `@@session.var` / `@@global.var` references with
    * their literal values so the statement parses as plain Spark SQL —
    * client bootstraps alias them (`@@x AS x`), which keeps working.
    * QUOTE-AWARE: `@@` inside a string literal or quoted identifier is
    * user data (`'user@@example.com'`) and must pass through verbatim —
    * only code regions are spliced. */
  private def spliceSysVars(sql: String, conn: ConnState): String = {
    def spliceSeg(seg: String): String =
      SysVarRe.replaceAllIn(seg, m =>
        java.util.regex.Matcher.quoteReplacement(
          sessionVar(m.group(1).toLowerCase(java.util.Locale.ROOT), conn)
            .getOrElse("NULL")))
    val out = new StringBuilder
    val seg = new StringBuilder
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'' || c == '"' || c == '`') {
        out.append(spliceSeg(seg.toString)); seg.setLength(0)
        out.append(c); i += 1
        var open = true
        while (open && i < n) {
          val d = sql.charAt(i)
          out.append(d); i += 1
          if (d == '\\' && c != '`' && i < n) { // backslash escape
            out.append(sql.charAt(i)); i += 1
          } else if (d == c) {
            if (i < n && sql.charAt(i) == c) { // doubled-quote escape
              out.append(c); i += 1
            } else open = false
          }
        }
      } else { seg.append(c); i += 1 }
    }
    out.append(spliceSeg(seg.toString))
    out.toString
  }

  /** Client session statements accepted as no-ops: `SET NAMES …`,
    * charset/session-mode SETs, and user variables — MySQL connection
    * plumbing with no Spark analogue. Spark's own `SET key=val` conf
    * statements do NOT match and still pass through. */
  private val SessionSetRe =
    "(?is)^\\s*set\\s+(names|autocommit|character_set|charset|sql_mode|" +
      "net_write_timeout|wait_timeout|@|session\\s+transaction|" +
      "transaction\\s).*"

  /** Evaluate one statement to OK(affected) or a materialized resultset
    * — the dialect routing shared by the text (COM_QUERY) and binary
    * (COM_STMT_EXECUTE) protocols. Throws; framing is the caller's. */
  // Accepts every spelling connectors emit: SET sql_mode, SET SESSION
  // sql_mode, SET @@sql_mode, SET @@session.sql_mode, SET
  // @@global.sql_mode (global treated as session — there is no global
  // scope here).
  private val SqlModeRe =
    ("(?is)^\\s*set\\s+(?:(?:session|global)\\s+)?" +
      "(?:@@(?:(?:session|global)\\.)?)?sql_mode\\s*=\\s*(.+?)\\s*;?\\s*$").r

  private def evalStatement(rawSql: String, conn: ConnState)
      : Either[Long, (StructType, Array[org.apache.spark.sql.Row])] = {
        // SET sql_mode is the one session SET with observable dialect
        // effect: ANSI_QUOTES flips double-quoted-identifier lexing for
        // this connection (checked before the generic no-op SET sieve,
        // which would otherwise swallow it).
        rawSql match {
          case SqlModeRe(modes) =>
            conn.ansiQuotes = Dialect.modeEnablesAnsiQuotes(modes)
            return Left(0L)
          case _ =>
        }
        // BOTH modes normalize (ansi → backtick idents, default →
        // single-quoted strings): wire lexing of `"…"` must not depend
        // on the shared session's doubleQuotedIdentifiers conf, which
        // the ref-schema registrar flips on. Idempotent on already-
        // normalized text, so EXECUTE of a statement normalized at
        // PREPARE time is safe.
        val sql =
          if (conn.ansiQuotes) Dialect.ansiQuotes(rawSql)
          else Dialect.mysqlQuotes(rawSql)
        val kw = sql.trim.takeWhile(_.isLetter)
          .toLowerCase(java.util.Locale.ROOT)
        val lower = sql.trim.toLowerCase(java.util.Locale.ROOT)
        // UPDATE/DELETE (StatementKind ast.rs:10-19): stock Spark SQL
        // rejects them on parquet v1 tables, so route to the copy-on-
        // write rewrite and answer OK with the affected-row count.
        if (kw == "update" || kw == "delete")
          Left(graft.operators.Dml.executeStatement(spark, sql))
        else if (lower.matches(SessionSetRe))
          Left(0L) // connection-plumbing SET: acknowledge, change nothing
        else if (lower.startsWith("show warnings"))
          Right((StructType(Seq(StructField("Level", StringType),
            StructField("Code", LongType), StructField("Message", StringType))),
            Array.empty[org.apache.spark.sql.Row]))
        else if (lower.startsWith("show variables")) {
          val pat = "(?is).*like\\s+'([^']*)'.*".r
          val keep: String => Boolean = lower match {
            case pat(p) =>
              val re = p.replace("%", ".*").replace("_", ".")
              name => name.matches(s"(?i)$re")
            case _ => _ => true
          }
          val rows = SessionVars.keys.toSeq.sorted
            .filter(keep)
            .map { n =>
              val v = sessionVar(n, conn).getOrElse("NULL")
              org.apache.spark.sql.Row(n, v.stripPrefix("'").stripSuffix("'"))
            }
          Right((StructType(Seq(StructField("Variable_name", StringType),
            StructField("Value", StringType))), rows.toArray))
        } else {
          val df = spark.sql(
            if (sql.contains("@@")) spliceSysVars(sql, conn) else sql)
          val schema = df.schema
          if (schema.isEmpty) Left(0L) // e.g. SET / DDL — answer OK
          else Right((schema, df.limit(maxRows).collect()))
        }
  }

  /** Execute one statement and answer its resultset / OK / ERR.
    * `more` = further statements of the same multi-statement COM_QUERY
    * follow — the resultset's TERMINAL packet then carries
    * SERVER_MORE_RESULTS_EXISTS so the client keeps reading.
    * `startSeq` = this resultset's first packet sequence-id: within ONE
    * COM_QUERY response the ids number CONTINUOUSLY across chained
    * resultsets (sequence-checking stock clients abort with "Packets
    * out of order" on a restart); ids reset only at command
    * boundaries. Returns (completed, nextSeq) — completed=false when
    * the statement errored (a multi-statement sequence aborts there,
    * like mysqld). */
  private def runQuery(out: OutputStream, sql: String,
      conn: ConnState, more: Boolean = false,
      startSeq: Int = 1): (Boolean, Int) = {
    val endStatus =
      StatusAutocommit | (if (more) StatusMoreResults else 0)
    var seq = startSeq
    val result =
      try evalStatement(sql, conn)
      catch {
        case e: Throwable =>
          writePacket(out, seq, errPacket(1064, "42000",
            String.valueOf(e.getMessage).linesIterator.take(4).mkString(" ")
              .take(400)))
          out.flush()
          return (false, seq + 1)
      }
    var completed = true
    result match {
      case Left(affected) =>
        writePacket(out, seq, okPacket(affected, endStatus)); seq += 1
      case Right((schema, rows)) =>
        def send(payload: Array[Byte]): Unit = { writePacket(out, seq, payload); seq += 1 }
        send(lenencInt(schema.length))
        schema.fields.foreach(f => send(columnDefinition(f)))
        send(eofPacket())
        // Mid-resultset ERR is protocol-legal: a row whose packet would
        // exceed the 16 MB framing limit aborts the resultset with ERR
        // 1153 instead of silently corrupting the frame (maxRows caps
        // row COUNT, not row size).
        try {
          rows.foreach { r =>
            val buf = new java.io.ByteArrayOutputStream()
            var i = 0
            while (i < r.length) {
              if (r.isNullAt(i)) buf.write(0xFB)
              else {
                // binary travels as its raw bytes; booleans as 1/0 (the
                // TINY text convention); everything else as toString
                val bytes = r.get(i) match {
                  case b: Array[Byte] => b
                  case b: java.lang.Boolean =>
                    (if (b) "1" else "0").getBytes(StandardCharsets.UTF_8)
                  case v =>
                    String.valueOf(v).getBytes(StandardCharsets.UTF_8)
                }
                buf.write(lenencInt(bytes.length))
                buf.write(bytes)
              }
              i += 1
            }
            val payload = buf.toByteArray
            if (payload.length >= MaxPacket)
              throw new PacketTooLarge
            send(payload)
          }
          send(eofPacket(endStatus))
        } catch {
          case _: PacketTooLarge =>
            send(errPacket(1153, "08S01",
              "row exceeds the 16 MB single-packet limit"))
            completed = false
        }
    }
    out.flush()
    (completed, seq)
  }

  // ---- prepared statements (binary protocol) -----------------------------

  /** COM_STMT_PREPARE: register the statement, answer the prepare-OK
    * header + param definitions + column definitions. The result schema
    * comes from ANALYZING the text with each `?` bound to NULL — schema
    * derivation plans but never executes. A statement whose schema
    * cannot be analyzed with NULL params (e.g. `select ? + 1` under ANSI
    * rules) reports 0 columns, which is protocol-legal: the binary
    * resultset re-sends column definitions at EXECUTE time anyway. */
  private def runPrepare(out: OutputStream,
      stmts: scala.collection.mutable.Map[Long, Prepared],
      id: Long, sql0: String, conn: ConnState): Unit = {
    // Dialect binds at PREPARE (mysqld parses here): the stored text is
    // normalized, so later sql_mode changes don't re-lex the handle.
    val sql =
      if (conn.ansiQuotes) Dialect.ansiQuotes(sql0)
      else Dialect.mysqlQuotes(sql0)
    val nParams = countPlaceholders(sql)
    val schema =
      try {
        val probe0 = splicePlaceholders(sql, Seq.fill(nParams)("NULL"))
        val probe =
          if (probe0.contains("@@")) spliceSysVars(probe0, conn) else probe0
        // Schema-probe ONLY pure queries: Spark 4 executes command nodes
        // (INSERT/CREATE/DROP/…) eagerly inside spark.sql(), so probing
        // a command's schema would RUN it at prepare time. A keyword
        // whitelist is not safe either — 'WITH q AS (…) INSERT INTO …'
        // is CTE-headed DML that spark.sql would execute — so the probe
        // is PARSED (parse-only, never runs) and the schema is derived
        // only when no node anywhere in the tree is a command or DML
        // statement. Anything else reports 0 columns, which is
        // protocol-legal: the binary resultset re-sends column
        // definitions at EXECUTE time anyway.
        import org.apache.spark.sql.catalyst.plans.logical._
        val parsed = spark.sessionState.sqlParser.parsePlan(probe)
        // Read-only metadata commands (the SHOW/DESCRIBE statement
        // families + EXPLAIN) ARE Command nodes, but running them at
        // prepare time mutates nothing — allow-list them so their
        // prepared statements keep reporting real column definitions
        // (drivers read prepare-time metadata). Matched by node-name
        // prefix because the family spans two packages and both plan
        // styles (catalyst ShowTables/DescribeRelation/…, execution
        // ShowNamespacesCommand/…) and every Show*/Describe* node in
        // Spark is a metadata read; EXPLAIN only formats its inner
        // plan, never executes it, so even EXPLAIN <dml> is probe-safe.
        def readOnlyMeta(p: LogicalPlan): Boolean = {
          val n = p.getClass.getSimpleName
          n.startsWith("Show") || n.startsWith("Describe") ||
            p.isInstanceOf[org.apache.spark.sql.execution.command.ExplainCommand]
        }
        val impure = parsed.exists {
          case p if readOnlyMeta(p) => false
          case _: Command | _: InsertIntoStatement | _: InsertIntoDir |
              _: DeleteFromTable | _: UpdateTable | _: MergeIntoTable => true
          case _ => false
        }
        if (impure) StructType(Nil) else spark.sql(probe).schema
      } catch { case scala.util.control.NonFatal(_) => StructType(Nil) }
    stmts(id) = new Prepared(sql, nParams, schema)
    var seq = 1
    def send(p: Array[Byte]): Unit = { writePacket(out, seq, p); seq += 1 }
    val head = new java.io.ByteArrayOutputStream()
    head.write(0x00)
    head.write(leBytes(id.toInt, 4))
    head.write(leBytes(schema.length, 2))
    head.write(leBytes(nParams, 2))
    head.write(0x00) // filler
    head.write(leBytes(0, 2)) // warning count
    send(head.toByteArray)
    if (nParams > 0) {
      (1 to nParams).foreach { _ =>
        send(columnDefinition(StructField("?", StringType, nullable = true)))
      }
      send(eofPacket())
    }
    if (schema.nonEmpty) {
      schema.fields.foreach(f => send(columnDefinition(f)))
      send(eofPacket())
    }
    out.flush()
  }

  /** COM_STMT_EXECUTE: decode the null bitmap + typed binary params,
    * splice them into the statement as SQL literals, evaluate through
    * the same dialect routing as COM_QUERY, and answer a BINARY
    * resultset ([[binaryRow]]). Param types arrive only when the
    * client sets new_params_bound_flag; later executions of the same
    * handle reuse the remembered types (protocol contract). */
  private def runExecute(out: OutputStream,
      stmts: scala.collection.mutable.Map[Long, Prepared],
      cmd: Array[Byte], conn: ConnState): Unit = {
    val id = leU32(cmd, 1)
    val st = stmts.get(id).orNull
    if (st == null) {
      writePacket(out, 1, errPacket(1243, "HY000",
        s"Unknown prepared statement handler ($id) given to EXECUTE"))
      out.flush()
      return
    }
    if (st.longDataOverflow) {
      writePacket(out, 1, errPacket(1153, "08S01",
        s"parameter long data exceeds the $MaxLongData-byte limit " +
          "(reset the statement to recover)"))
      out.flush()
      return
    }
    // EXECUTE's flags byte: CURSOR_TYPE_READ_ONLY (0x01) is SERVED —
    // rows are materialized (maxRows-capped like every resultset here)
    // and paged out by COM_STMT_FETCH; FOR_UPDATE/SCROLLABLE (0x02/
    // 0x04) have no meaning without locks/backward seeks and stay
    // cleanly refused.
    if ((cmd(5) & 0x06) != 0) {
      writePacket(out, 1, errPacket(1235, "42000",
        "This version of MySQL doesn't yet support 'cursor protocol'"))
      out.flush()
      return
    }
    val wantCursor = (cmd(5) & 0x01) != 0
    // mysqld closes an open cursor on ANY re-execute of the handle —
    // including one that fails or runs inline — so a later FETCH can
    // never serve the superseded resultset
    st.cursor = None
    val result =
      try {
        // stmt_id u32 + flags u8 + iteration_count u32 → params at 10
        var pos = 10
        val lits = new Array[String](st.nParams)
        if (st.nParams > 0) {
          val nullBytes = (st.nParams + 7) / 8
          val bitmap = java.util.Arrays.copyOfRange(cmd, pos, pos + nullBytes)
          pos += nullBytes
          val newBound = cmd(pos) & 0xFF; pos += 1
          if (newBound == 1) {
            st.paramTypes = Array.tabulate(st.nParams) { i =>
              cmd(pos + 2 * i) & 0xFF // 2nd byte = unsigned flag, unused
            }
            pos += 2 * st.nParams
          } else require(st.paramTypes.length == st.nParams ||
              (0 until st.nParams).forall(st.longData.contains),
            "EXECUTE without types before any typed EXECUTE")
          var i = 0
          while (i < st.nParams) {
            // A long-data param carries NO inline value in this packet:
            // its value is the SEND_LONG_DATA accumulation. A param
            // BOUND as a blob type splices as a binary X'…' literal —
            // arbitrary bytes round-trip exactly; decoding them as
            // UTF-8 would replace invalid sequences with U+FFFD. Any
            // other (or unknown) binding is the string case.
            st.longData.get(i) match {
              case Some(acc) =>
                val blobTyped = st.paramTypes.length == st.nParams &&
                  Set(0xF9, 0xFA, 0xFB, 0xFC)(st.paramTypes(i)) // *_BLOB
                lits(i) =
                  if (blobTyped)
                    "X'" + acc.toByteArray.map("%02X".format(_)).mkString + "'"
                  else sqlStringLiteral(
                    new String(acc.toByteArray, StandardCharsets.UTF_8))
              case None =>
                if ((bitmap(i / 8) & (1 << (i % 8))) != 0) lits(i) = "NULL"
                else {
                  val (lit, used) = decodeParam(st.paramTypes(i), cmd, pos)
                  lits(i) = lit
                  pos += used
                }
            }
            i += 1
          }
        }
        evalStatement(splicePlaceholders(st.sql, lits.toSeq), conn)
      } catch {
        case e: Throwable =>
          writePacket(out, 1, errPacket(1064, "42000",
            String.valueOf(e.getMessage).linesIterator.take(4).mkString(" ")
              .take(400)))
          out.flush()
          return
      }
    // the column-definition block shared by the cursor-open and inline
    // answers; returns the continuation sequence id
    def sendDefs(schema: StructType, eofStatus: Int): Int = {
      var seq = 1
      def send(p: Array[Byte]): Unit = { writePacket(out, seq, p); seq += 1 }
      send(lenencInt(schema.length))
      schema.fields.foreach(f => send(columnDefinition(f)))
      send(eofPacket(eofStatus))
      seq
    }
    result match {
      case Left(affected) => writePacket(out, 1, okPacket(affected))
      case Right((schema, rows)) if wantCursor =>
        // cursor open: answer ONLY the column definition block, EOF
        // flagged CURSOR_EXISTS; the rows wait for COM_STMT_FETCH
        st.cursor = Some((schema, rows.iterator))
        sendDefs(schema, StatusAutocommit | StatusCursorExists)
      case Right((schema, rows)) =>
        var seq = sendDefs(schema, StatusAutocommit)
        def send(p: Array[Byte]): Unit = { writePacket(out, seq, p); seq += 1 }
        try {
          rows.foreach { r =>
            val payload = binaryRow(schema, r)
            if (payload.length >= MaxPacket) throw new PacketTooLarge
            send(payload)
          }
          send(eofPacket())
        } catch {
          case _: PacketTooLarge =>
            send(errPacket(1153, "08S01",
              "row exceeds the 16 MB single-packet limit"))
        }
    }
    out.flush()
  }

  /** One binary-protocol resultset row: 0x00 header, a null bitmap with
    * the protocol's 2-bit offset, then values wire-encoded by COLUMN
    * type — integers little-endian at their width, floats IEEE, decimals
    * as lenenc ASCII (the NEWDECIMAL binary form IS its text), date/
    * datetime as length-prefixed component structs, strings/binary/
    * rendered complex types as lenenc bytes. */
  private def binaryRow(schema: StructType,
      r: org.apache.spark.sql.Row): Array[Byte] = {
    val n = schema.length
    val buf = new java.io.ByteArrayOutputStream()
    buf.write(0x00)
    val bitmap = new Array[Byte]((n + 2 + 7) / 8)
    var i = 0
    while (i < n) {
      if (r.isNullAt(i)) {
        val bit = i + 2
        bitmap(bit / 8) = (bitmap(bit / 8) | (1 << (bit % 8))).toByte
      }
      i += 1
    }
    buf.write(bitmap)
    i = 0
    while (i < n) {
      if (!r.isNullAt(i)) writeBinaryValue(buf, schema(i).dataType, r.get(i))
      i += 1
    }
    buf.toByteArray
  }

  private def writeBinaryValue(buf: java.io.ByteArrayOutputStream,
      dt: DataType, v: Any): Unit = {
    def lenenc(b: Array[Byte]): Unit = {
      buf.write(lenencInt(b.length)); buf.write(b)
    }
    def leLong(x: Long, w: Int): Unit = {
      var j = 0
      while (j < w) { buf.write(((x >> (8 * j)) & 0xFF).toInt); j += 1 }
    }
    dt match {
      case BooleanType => buf.write(if (v.asInstanceOf[Boolean]) 1 else 0)
      case ByteType => buf.write(v.asInstanceOf[Byte].toInt)
      case ShortType => leLong(v.asInstanceOf[Short].toLong, 2)
      case IntegerType => leLong(v.asInstanceOf[Int].toLong, 4)
      case LongType => leLong(v.asInstanceOf[Long], 8)
      case FloatType =>
        leLong(java.lang.Float.floatToIntBits(v.asInstanceOf[Float]).toLong
          & 0xFFFFFFFFL, 4)
      case DoubleType =>
        leLong(java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]), 8)
      case _: DecimalType =>
        lenenc(v.toString.getBytes(StandardCharsets.US_ASCII))
      case DateType =>
        val d = v match {
          case ld: java.time.LocalDate => ld
          case sd: java.sql.Date => sd.toLocalDate
        }
        buf.write(4)
        leLong(d.getYear.toLong, 2); buf.write(d.getMonthValue)
        buf.write(d.getDayOfMonth)
      case TimestampType | TimestampNTZType =>
        // Spark hands TimestampNTZ values out as java.time.LocalDateTime
        // (never java.sql.Timestamp); TimestampType arrives as either
        // Timestamp or Instant depending on the JavaTimeAPI conf.
        val t = v match {
          case ldt: java.time.LocalDateTime => ldt
          case ts: java.sql.Timestamp => ts.toLocalDateTime
          case ins: java.time.Instant =>
            java.time.LocalDateTime.ofInstant(ins, java.time.ZoneOffset.UTC)
        }
        buf.write(11)
        leLong(t.getYear.toLong, 2); buf.write(t.getMonthValue)
        buf.write(t.getDayOfMonth); buf.write(t.getHour)
        buf.write(t.getMinute); buf.write(t.getSecond)
        leLong((t.getNano / 1000).toLong, 4)
      case BinaryType => lenenc(v.asInstanceOf[Array[Byte]])
      case _ => lenenc(String.valueOf(v).getBytes(StandardCharsets.UTF_8))
    }
  }

  /** Decode one binary-protocol parameter at `off` → (SQL literal,
    * bytes consumed). Strings/decimals quote-escape through
    * [[sqlStringLiteral]]; temporal structs render as typed literals so
    * Spark's parser re-types them losslessly. */
  private def decodeParam(tpe: Int, b: Array[Byte],
      off: Int): (String, Int) = {
    def leS(w: Int): Long = { // sign-extended little-endian read
      var x = 0L
      var j = 0
      while (j < w) { x |= (b(off + j) & 0xFFL) << (8 * j); j += 1 }
      val shift = 64 - 8 * w
      (x << shift) >> shift
    }
    tpe match {
      case 0x01 => (leS(1).toString, 1) // TINY
      case 0x02 => (leS(2).toString, 2) // SHORT
      case 0x03 => (leS(4).toString, 4) // LONG
      case 0x08 => (leS(8).toString, 8) // LONGLONG
      case 0x04 => // FLOAT
        val f = java.lang.Float.intBitsToFloat(leS(4).toInt)
        (s"CAST('$f' AS FLOAT)", 4)
      case 0x05 => // DOUBLE
        var bits = 0L
        var j = 0
        while (j < 8) { bits |= (b(off + j) & 0xFFL) << (8 * j); j += 1 }
        val d = java.lang.Double.longBitsToDouble(bits)
        (s"CAST('$d' AS DOUBLE)", 8)
      case 0x06 => ("NULL", 0)
      case 0x0A | 0x0C | 0x07 => // DATE / DATETIME / TIMESTAMP
        val len = b(off) & 0xFF
        def u2(o: Int): Int = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
        if (len == 0) (if (tpe == 0x0A) "DATE '1970-01-01'"
          else "TIMESTAMP '1970-01-01 00:00:00'", 1)
        else {
          val y = u2(off + 1); val mo = b(off + 3) & 0xFF
          val d = b(off + 4) & 0xFF
          if (tpe == 0x0A || len == 4) (f"DATE '$y%04d-$mo%02d-$d%02d'", 1 + len)
          else {
            val h = b(off + 5) & 0xFF; val mi = b(off + 6) & 0xFF
            val s = b(off + 7) & 0xFF
            val micro = if (len >= 11) leU32(b, off + 8) else 0L
            (f"TIMESTAMP '$y%04d-$mo%02d-$d%02d $h%02d:$mi%02d:$s%02d.$micro%06d'",
              1 + len)
          }
        }
      case 0x0B => // TIME: render as an interval-style string literal
        val len = b(off) & 0xFF
        if (len == 0) (sqlStringLiteral("00:00:00"), 1)
        else {
          val neg = (b(off + 1) & 0xFF) == 1
          val days = leU32(b, off + 2)
          val h = b(off + 6) & 0xFF; val mi = b(off + 7) & 0xFF
          val s = b(off + 8) & 0xFF
          val sign = if (neg) "-" else ""
          (sqlStringLiteral(f"$sign${days * 24 + h}%02d:$mi%02d:$s%02d"),
            1 + len)
        }
      case _ => // VARCHAR/VAR_STRING/STRING/BLOB/NEWDECIMAL/...: lenenc
        val (n, used) = readLenencInt(b, off)
        val s = new String(b, off + used, n.toInt, StandardCharsets.UTF_8)
        (sqlStringLiteral(s), used + n.toInt)
    }
  }

  // ---- packet builders ---------------------------------------------------

  private def handshakeV10(connId: Int, salt: Array[Byte]): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    buf.write(10) // protocol version
    buf.write(ServerVersion.getBytes(StandardCharsets.US_ASCII)); buf.write(0)
    buf.write(leBytes(connId, 4))
    buf.write(salt, 0, 8); buf.write(0) // auth-plugin-data part 1 + filler
    buf.write(leBytes((caps & 0xFFFF).toInt, 2)) // capability lower
    buf.write(Utf8mb4Charset)
    buf.write(leBytes(StatusAutocommit, 2))
    buf.write(leBytes(((caps >> 16) & 0xFFFF).toInt, 2)) // capability upper
    buf.write(21) // auth plugin data length (20 + trailing NUL)
    buf.write(new Array[Byte](10)) // reserved
    buf.write(salt, 8, 12); buf.write(0) // part 2, NUL-terminated
    // MySQL-8 default plugin: stock clients start with caching_sha2 and
    // plugin-switch to native only for accounts stored that way.
    buf.write(CachingSha2Plugin.getBytes(StandardCharsets.US_ASCII))
    buf.write(0)
    buf.toByteArray
  }

  private def columnDefinition(f: StructField): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    def lenencStr(s: String): Unit = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      buf.write(lenencInt(b.length)); buf.write(b)
    }
    lenencStr("def"); lenencStr(""); lenencStr(""); lenencStr("")
    lenencStr(f.name); lenencStr(f.name)
    buf.write(0x0c) // fixed-length fields length
    buf.write(leBytes(Utf8mb4Charset, 2))
    buf.write(leBytes(255, 4)) // column display length
    buf.write(typeByte(f.dataType))
    buf.write(leBytes(if (f.nullable) 0 else NotNullFlag, 2))
    buf.write(decimalsByte(f.dataType))
    buf.write(leBytes(0, 2)) // filler
    buf.toByteArray
  }

  private def okPacket(affected: Long = 0L,
      status: Int = StatusAutocommit): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    buf.write(0x00)
    buf.write(lenencInt(affected)); buf.write(lenencInt(0)) // last insert id
    buf.write(leBytes(status, 2)); buf.write(leBytes(0, 2)) // warnings
    buf.toByteArray
  }

  private def eofPacket(status: Int = StatusAutocommit): Array[Byte] =
    Array[Byte](0xFE.toByte, 0, 0) ++ leBytes(status, 2)

  private def errPacket(code: Int, sqlState: String, msg: String): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    buf.write(0xFF)
    buf.write(leBytes(code, 2))
    buf.write('#'); buf.write(sqlState.getBytes(StandardCharsets.US_ASCII))
    buf.write(msg.getBytes(StandardCharsets.UTF_8))
    buf.toByteArray
  }
}

object MysqlServer {
  val ServerVersion = "8.0.0-graft-spark"

  /** EXPLAIN statement with an optional Spark explain-mode keyword;
    * group 1 = mode (null when absent → formatted), group 2 = the
    * explained statement. */
  private val ExplainRe =
    "(?is)\\s*explain\\s+(?:(extended|codegen|cost|formatted)\\s+)?(.+)".r

  val NativePlugin = "mysql_native_password"
  val CachingSha2Plugin = "caching_sha2_password"

  /** A stored account credential: which auth plugin it uses and that
    * plugin's verifier — SHA1(SHA1(pw)) for native (the mysql.user
    * Password column), SHA2(SHA2(pw)) for caching_sha2 (the server's
    * fast-auth cache entry — holding it directly is why fast auth is
    * always decidable here and the full-auth stage can be refused).
    * Empty verifier = empty-password account. */
  final case class StoredCred(plugin: String, verifier: Array[Byte])

  /** Account credential helpers for the two served plugins. */
  def nativeCred(password: String): StoredCred =
    StoredCred(NativePlugin, doubleSha1(password))
  def cachingSha2Cred(password: String): StoredCred =
    StoredCred(CachingSha2Plugin, doubleSha256(password))

  /** Constant stand-in credential for unknown-user verification, on the
    * DEFAULT plugin so unknown users follow exactly the packet flow of
    * a stock caching_sha2 account (switch-or-not, fast-auth fail →
    * full-auth refusal). Its value never authenticates anyone: the
    * accept path additionally requires the username to be known. */
  private val DummyCred: StoredCred =
    StoredCred(CachingSha2Plugin, doubleSha256("graft-timing-dummy"))

  // command bytes (public protocol)
  val ComQuit = 0x01
  val ComResetConnection = 0x1f
  val ComInitDb = 0x02
  val ComChangeUser = 0x11
  val ComQuery = 0x03
  val ComFieldList = 0x04
  val ComPing = 0x0e
  val ComStmtPrepare = 0x16
  val ComStmtExecute = 0x17
  val ComStmtSendLongData = 0x18
  val ComStmtClose = 0x19
  val ComStmtReset = 0x1a
  val ComSetOption = 0x1b
  val ComStmtFetch = 0x1c
  val ComStatistics = 0x09
  val ComProcessInfo = 0x0a
  val ComProcessKill = 0x0c
  val ComDebug = 0x0d

  /** COM_SET_OPTION operands (the only two the protocol defines). */
  val OptionMultiStatementsOn = 0
  val OptionMultiStatementsOff = 1

  /** Positions are found by a quote- AND comment-aware scan: `?` inside
    * quoted literals (with doubled-quote and backslash escapes) or
    * inside line (`--`, `#`) and block comments is text, not a
    * placeholder — the same lexical rule mysqld applies. A comment `?`
    * miscounted as a parameter would misframe the whole
    * COM_STMT_EXECUTE decode (the client binds fewer values than the
    * server expects). */
  private def placeholderPositions(sql: String): Seq[Int] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    val n = sql.length
    var quote = 0.toChar
    while (i < n) {
      val c = sql.charAt(i)
      if (quote != 0) {
        if (c == '\\' && quote != '`') i += 1 // skip escaped char
        else if (c == quote) quote = 0.toChar
        i += 1
      } else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-' &&
          (i + 2 >= n || sql.charAt(i + 2) <= ' ')) {
        // mysqld's rule: '--' opens a line comment only when followed by
        // whitespace/control or end of input — 'SELECT 1--2' is double
        // negation, not a comment.
        while (i < n && sql.charAt(i) != '\n') i += 1
      } else if (c == '#') {
        while (i < n && sql.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < n &&
          !(sql.charAt(i) == '*' && sql.charAt(i + 1) == '/')) i += 1
        i = math.min(n, i + 2)
      } else {
        c match {
          case '\'' | '"' | '`' => quote = c
          case '?' => out += i
          case _ =>
        }
        i += 1
      }
    }
    out.toSeq
  }

  def countPlaceholders(sql: String): Int = placeholderPositions(sql).length

  /** Replace each `?` (in lexical order) with its literal. */
  def splicePlaceholders(sql: String, lits: Seq[String]): String = {
    val pos = placeholderPositions(sql)
    require(pos.length == lits.length,
      s"${pos.length} placeholders, ${lits.length} values")
    val sb = new StringBuilder
    var last = 0
    pos.zip(lits).foreach { case (p, lit) =>
      sb.append(sql.substring(last, p)).append(lit)
      last = p + 1
    }
    sb.append(sql.substring(last)).toString
  }

  /** A Spark-SQL string literal: quotes doubled, backslashes escaped
    * (Spark's lexer treats backslash as an escape inside '…'). */
  def sqlStringLiteral(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"

  // capability flags the server advertises: 4.1 protocol + plugin auth +
  // connect-with-db + secure connection. CLIENT_DEPRECATE_EOF is NOT
  // advertised, pinning the classic EOF resultset framing.
  val ClientProtocol41 = 0x00000200L
  val ClientConnectWithDb = 0x00000008L
  val ClientSsl = 0x00000800L
  val ClientSecureConnection = 0x00008000L
  val ClientPluginAuth = 0x00080000L
  val ClientPluginAuthLenencData = 0x00200000L
  val ClientMultiStatements = 0x00010000L
  val ClientMultiResults = 0x00020000L
  val ServerCaps: Long = ClientProtocol41 | ClientPluginAuth |
    ClientConnectWithDb | ClientSecureConnection |
    ClientMultiStatements | ClientMultiResults

  /** Split a COM_QUERY payload into its top-level statements at `;`,
    * honoring the lexical islands a splitter must not look inside:
    * single-/double-/backtick-quoted runs (with backslash escapes in
    * the string forms), `#` and `-- ` line comments (the mysqld rule —
    * two dashes followed by whitespace), and block comments. Used only
    * when the client negotiated CLIENT_MULTI_STATEMENTS; single
    * statements pass through untouched. */
  def splitStatements(sql: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    // a part with no code — only comments/whitespace — is dropped, not
    // executed: mysqld's parser treats a trailing '; -- done' as
    // whitespace, not as an (erroring) empty statement
    var hasCode = false
    var i = 0
    val n = sql.length
    def flush(): Unit = {
      if (hasCode) parts += cur.toString.trim
      cur.clear(); hasCode = false
    }
    while (i < n) {
      sql.charAt(i) match {
        case q @ ('\'' | '"' | '`') =>
          hasCode = true
          cur += q; i += 1
          var closed = false
          while (i < n && !closed) {
            val d = sql.charAt(i)
            cur += d
            if (d == '\\' && q != '`' && i + 1 < n) {
              cur += sql.charAt(i + 1); i += 2
            } else { if (d == q) closed = true; i += 1 }
          }
        case '#' =>
          while (i < n && sql.charAt(i) != '\n') { cur += sql.charAt(i); i += 1 }
        // mysqld's rule: '--' followed by whitespace (incl. '\r' for
        // CRLF clients) or end-of-input opens a line comment
        case '-' if i + 1 < n && sql.charAt(i + 1) == '-' &&
            (i + 2 >= n || " \t\r\n".indexOf(sql.charAt(i + 2)) >= 0) =>
          while (i < n && sql.charAt(i) != '\n') { cur += sql.charAt(i); i += 1 }
        case '/' if i + 1 < n && sql.charAt(i + 1) == '*' =>
          cur ++= "/*"; i += 2
          while (i + 1 < n &&
              !(sql.charAt(i) == '*' && sql.charAt(i + 1) == '/')) {
            cur += sql.charAt(i); i += 1
          }
          if (i + 1 < n) { cur ++= "*/"; i += 2 }
          else if (i < n) { cur += sql.charAt(i); i += 1 }
        case ';' =>
          flush(); i += 1
        case c =>
          if (!c.isWhitespace) hasCode = true
          cur += c; i += 1
      }
    }
    flush()
    parts.toSeq
  }

  /** Load a PKCS#12 keystore into a server SSLContext (the keystore is
    * deployment-provided, e.g. `keytool -genkeypair -storetype PKCS12`;
    * nothing here mints certificates). */
  def sslContextFromPkcs12(path: String, password: String)
      : javax.net.ssl.SSLContext = {
    val ks = java.security.KeyStore.getInstance("PKCS12")
    val fis = new java.io.FileInputStream(path)
    try ks.load(fis, password.toCharArray) finally fis.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, password.toCharArray)
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }

  // ---- mysql_native_password (public protocol) ----------------------------

  private def sha1(parts: Array[Byte]*): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    parts.foreach(md.update)
    md.digest()
  }

  /** What the server STORES per user: SHA1(SHA1(password)) — the
    * mysql.user `Password` column's value (sans the leading '*' hex
    * rendering). Empty password → empty array. */
  def doubleSha1(password: String): Array[Byte] =
    if (password.isEmpty) Array.emptyByteArray
    else sha1(sha1(password.getBytes(StandardCharsets.UTF_8)))

  /** What the CLIENT sends: SHA1(pw) XOR SHA1(salt ‖ SHA1(SHA1(pw))).
    * Exposed for the protocol spec's raw-socket client. */
  def nativeScramble(salt: Array[Byte], password: String): Array[Byte] = {
    if (password.isEmpty) return Array.emptyByteArray
    val sha1pw = sha1(password.getBytes(StandardCharsets.UTF_8))
    val mix = sha1(salt, sha1(sha1pw))
    Array.tabulate[Byte](20)(i => (sha1pw(i) ^ mix(i)).toByte)
  }

  /** Server-side check: recover SHA1(pw) from the scramble, re-hash,
    * constant-time compare against the stored double-SHA1. */
  def nativePasswordOk(salt: Array[Byte], response: Array[Byte],
      stored: Array[Byte]): Boolean = {
    if (stored.isEmpty) return response.isEmpty // empty-password account
    if (response.length != 20) return false
    val mix = sha1(salt, stored)
    val sha1pw = Array.tabulate[Byte](20)(i => (response(i) ^ mix(i)).toByte)
    java.security.MessageDigest.isEqual(sha1(sha1pw), stored)
  }

  // ---- caching_sha2_password fast auth (public protocol) -------------------

  private def sha256(parts: Array[Byte]*): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    parts.foreach(md.update)
    md.digest()
  }

  /** What the server CACHES per user: SHA2(SHA2(password)) — the
    * fast-auth verifier. Empty password → empty array. */
  def doubleSha256(password: String): Array[Byte] =
    if (password.isEmpty) Array.emptyByteArray
    else sha256(sha256(password.getBytes(StandardCharsets.UTF_8)))

  /** What the CLIENT sends in the fast-auth stage:
    * SHA2(pw) XOR SHA2(SHA2(SHA2(pw)) ‖ nonce) — 32 bytes (the
    * reference's client side is doradb-protocol/src/mysql/auth.rs:
    * 270-293). Exposed for the protocol spec's raw-socket client. */
  def cachingSha2Scramble(salt: Array[Byte], password: String): Array[Byte] = {
    if (password.isEmpty) return Array.emptyByteArray
    val dig1 = sha256(password.getBytes(StandardCharsets.UTF_8))
    val mix = sha256(sha256(dig1), salt)
    Array.tabulate[Byte](32)(i => (dig1(i) ^ mix(i)).toByte)
  }

  /** Server-side fast-auth check: recover SHA2(pw) from the scramble,
    * re-hash, constant-time compare against the cached double-SHA2. An
    * empty-password account accepts an empty response (and the lone
    * 0x00 byte some caching_sha2 clients send for it). */
  def cachingSha2Ok(salt: Array[Byte], response: Array[Byte],
      stored: Array[Byte]): Boolean = {
    if (stored.isEmpty)
      return response.isEmpty ||
        (response.length == 1 && response(0) == 0)
    if (response.length != 32) return false
    val mix = sha256(stored, salt)
    val sha2pw = Array.tabulate[Byte](32)(i => (response(i) ^ mix(i)).toByte)
    java.security.MessageDigest.isEqual(sha256(sha2pw), stored)
  }

  val Utf8mb4Charset = 255
  val StatusAutocommit = 0x0002
  val StatusMoreResults = 0x0008
  val StatusCursorExists = 0x0040
  val StatusLastRowSent = 0x0080
  val NotNullFlag = 0x0001

  /** Protocol type byte for a Spark SQL type (text protocol: values are
    * strings either way; the byte is advisory metadata for clients). */
  def typeByte(dt: DataType): Int = dt match {
    case ByteType => 0x01 // TINY
    case ShortType => 0x02 // SHORT
    case IntegerType => 0x03 // LONG
    case LongType => 0x08 // LONGLONG
    case FloatType => 0x04 // FLOAT
    case DoubleType => 0x05 // DOUBLE
    case _: DecimalType => 0xF6 // NEWDECIMAL
    case BooleanType => 0x01 // TINY (MySQL BOOL)
    case DateType => 0x0A // DATE
    case TimestampType | TimestampNTZType => 0x0C // DATETIME
    case BinaryType => 0xFC // BLOB
    case _ => 0xFD // VAR_STRING (strings, arrays/structs as rendered text)
  }

  private def decimalsByte(dt: DataType): Int = dt match {
    case d: DecimalType => d.scale
    case DoubleType | FloatType => 0x1F // "not specified"
    case _ => 0
  }

  // ---- wire primitives ---------------------------------------------------

  /** Single-packet framing limit (2^24 - 1). Oversize rows abort the
    * resultset with ERR 1153; multi-packet continuation is intentionally
    * unimplemented at this scope. */
  val MaxPacket: Int = (1 << 24) - 1

  /** Cap on a prepared statement's total COM_STMT_SEND_LONG_DATA
    * accumulation (all params): mysqld bounds the same path with
    * max_allowed_packet; 64 MiB matches the advertised variable and
    * keeps a runaway client from growing the server heap without
    * bound (the command has no response, so violations surface as ERR
    * 1153 at EXECUTE). */
  val MaxLongData: Long = 64L << 20

  private[server] final class PacketTooLarge extends RuntimeException

  /** 3-byte LE length + 1-byte sequence id + payload. Callers flush at
    * RESPONSE boundaries — flushing per packet would issue one syscall
    * per row through the BufferedOutputStream. */
  def writePacket(out: OutputStream, seq: Int, payload: Array[Byte]): Unit = {
    require(payload.length <= MaxPacket, s"packet ${payload.length} > 16MB")
    out.write(leBytes(payload.length, 3))
    out.write(seq & 0xFF)
    out.write(payload)
  }

  /** Read one LOGICAL packet → (last sequence id, payload). A frame
    * whose length is exactly 0xFFFFFF is continued in the next frame
    * (the MySQL splitting rule — a 16 MB-multiple payload ends with an
    * empty frame), so reassemble here: the server advertises
    * max_allowed_packet = 64 MB and clients will split large commands. */
  def readPacket(in: InputStream): (Int, Array[Byte]) = {
    val buf = new java.io.ByteArrayOutputStream()
    var seq = 0
    var continued = true
    while (continued) {
      val head = readN(in, 4)
      val len =
        (head(0) & 0xFF) | ((head(1) & 0xFF) << 8) | ((head(2) & 0xFF) << 16)
      seq = head(3) & 0xFF
      // Bound the reassembled payload at the advertised
      // max_allowed_packet: without this a client streaming 16 MB
      // continuation frames indefinitely grows the heap without limit.
      // EOF (not ERR) because the frame stream is mid-message — there
      // is no packet boundary to answer on; the connection handler
      // closes the socket, which is how mysqld treats an over-limit
      // client too (after its ERR 1153 the connection drops).
      if (buf.size().toLong + len > MaxLongData)
        throw new EOFException(s"packet exceeds max_allowed_packet")
      buf.write(readN(in, len))
      continued = len == MaxPacket
    }
    (seq, buf.toByteArray)
  }

  def readN(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new EOFException()
      off += r
    }
    buf
  }

  def leBytes(v: Int, n: Int): Array[Byte] =
    Array.tabulate[Byte](n)(i => ((v >> (8 * i)) & 0xFF).toByte)

  def leU32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL)) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  /** MySQL length-encoded integer. */
  def lenencInt(v: Long): Array[Byte] =
    if (v < 251) Array((v & 0xFF).toByte)
    else if (v < (1L << 16)) Array[Byte](0xFC.toByte) ++ leBytes(v.toInt, 2)
    else if (v < (1L << 24)) Array[Byte](0xFD.toByte) ++ leBytes(v.toInt, 3)
    else Array[Byte](0xFE.toByte) ++
      Array.tabulate[Byte](8)(i => ((v >> (8 * i)) & 0xFF).toByte)

  /** Parse a length-encoded integer at `off` → (value, bytes consumed). */
  def readLenencInt(b: Array[Byte], off: Int): (Long, Int) =
    (b(off) & 0xFF) match {
      case 0xFB => (-1L, 1) // NULL marker in row context
      case 0xFC => (((b(off + 1) & 0xFFL)) | ((b(off + 2) & 0xFFL) << 8), 3)
      case 0xFD => ((b(off + 1) & 0xFFL) | ((b(off + 2) & 0xFFL) << 8) |
        ((b(off + 3) & 0xFFL) << 16), 4)
      case 0xFE =>
        var v = 0L
        var i = 0
        while (i < 8) { v |= (b(off + 1 + i) & 0xFFL) << (8 * i); i += 1 }
        (v, 9)
      case x => (x.toLong, 1)
    }

  /** Bind on `port` (0 = ephemeral; loopback unless explicitly widened).
    * `users` maps username → [[StoredCred]] (build with [[nativeCred]] /
    * [[cachingSha2Cred]]); empty map = permissive connection phase (dev
    * loop). */
  def start(spark: SparkSession, port: Int = 0, maxRows: Int = 10000,
      bindAddress: InetAddress = InetAddress.getLoopbackAddress,
      users: Map[String, StoredCred] = Map.empty,
      ssl: Option[javax.net.ssl.SSLContext] = None): MysqlServer =
    new MysqlServer(spark, port, maxRows, bindAddress, users, ssl)
}
