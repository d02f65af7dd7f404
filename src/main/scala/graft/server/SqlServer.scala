package graft.server

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.SparkSession

/** Minimal SQL-over-TCP endpoint — the network front door re-expressed
  * Spark-first.
  *
  * The reference ships a complete MySQL wire protocol plus `serve_tcp`
  * (`doradb-protocol`, handshake/auth/COM_QUERY; ~6.7k LoC). Re-building
  * a MySQL codec would be a translation, not a Spark design: in a Spark
  * deployment the production network surface is the Thrift/JDBC server
  * (HiveServer2 protocol) or Spark Connect, both speaking to the same
  * `SparkSession`. This endpoint proves the capability in-repo with
  * zero dependencies: a line protocol (one SQL text in, one JSON result
  * line out) over the SAME SQL front door every other entry uses, with
  * per-connection threads and a row cap so a stray `select *` cannot
  * flood the socket.
  *
  * Protocol: client sends one SQL statement per line; server answers
  * one JSON line: `{"columns":[...],"rows":[[...]]}` (row-major values
  * as strings, nulls as null) or `{"error":"..."}`. Connection closes
  * when the client does.
  */
final class SqlServer(spark: SparkSession, val port: Int, maxRows: Int,
    bindAddress: java.net.InetAddress) {
  // Loopback by default: the endpoint executes arbitrary unauthenticated
  // SQL against the live session — an all-interfaces bind would expose
  // the machine's network. External binds are an explicit opt-in.
  private val socket = new ServerSocket(port, 50, bindAddress)
  private val pool = Executors.newFixedThreadPool(8)
  private val running = new AtomicBoolean(true)

  /** The ephemeral port actually bound (when constructed with port 0). */
  def boundPort: Int = socket.getLocalPort

  private val acceptor = new Thread(() => {
    while (running.get()) {
      try {
        val client = socket.accept()
        pool.execute(() => serve(client))
      } catch {
        case _: Throwable if !running.get() => // closed during shutdown
        case e: Throwable =>
          System.err.println(s"[sqlserver] accept: $e")
          // persistent accept failure (fd exhaustion) must not busy-spin
          Thread.sleep(100)
      }
    }
  }, "graft-sql-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  private def serve(client: Socket): Unit = {
    val in = new BufferedReader(
      new InputStreamReader(client.getInputStream, StandardCharsets.UTF_8))
    val out = new PrintWriter(client.getOutputStream, true, StandardCharsets.UTF_8)
    try {
      var line = in.readLine()
      while (line != null) {
        if (line.trim.nonEmpty) out.println(execute(line))
        line = in.readLine()
      }
    } catch {
      case _: Throwable => // client went away
    } finally client.close()
  }

  private def execute(sql: String): String =
    try {
      val df = spark.sql(sql)
      val rows = df.limit(maxRows).collect()
      val cols = df.columns.map(jstr).mkString("[", ",", "]")
      val body = rows.map { r =>
        (0 until r.length).map { i =>
          if (r.isNullAt(i)) "null" else jstr(String.valueOf(r.get(i)))
        }.mkString("[", ",", "]")
      }.mkString("[", ",", "]")
      s"""{"columns":$cols,"rows":$body}"""
    } catch {
      case e: Throwable =>
        s"""{"error":${jstr(String.valueOf(e.getMessage).linesIterator.mkString(" "))}}"""
    }

  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def stop(): Unit = {
    running.set(false)
    socket.close()
    pool.shutdownNow()
  }
}

object SqlServer {
  /** Bind on `port` (0 = ephemeral, loopback unless `bindAddress` is
    * explicitly widened) and serve `spark`'s SQL front door. */
  def start(spark: SparkSession, port: Int = 0, maxRows: Int = 10000,
      bindAddress: java.net.InetAddress =
        java.net.InetAddress.getLoopbackAddress): SqlServer =
    new SqlServer(spark, port, maxRows, bindAddress)
}
