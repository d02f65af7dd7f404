package graft

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.server.SqlServer

/** End-to-end over a real socket: the TCP endpoint serves the same SQL
  * front door (fixture views incl. the canonical ref schema) and reports
  * errors in-band, mirroring the reference's serve_tcp + COM_QUERY loop
  * (doradb-protocol) at minimal-protocol scale. */
class SqlServerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def roundTrip(server: SqlServer, sql: String): String = {
    val s = new Socket("127.0.0.1", server.boundPort)
    try {
      val out = new PrintWriter(s.getOutputStream, true, StandardCharsets.UTF_8)
      val in = new BufferedReader(
        new InputStreamReader(s.getInputStream, StandardCharsets.UTF_8))
      out.println(sql)
      in.readLine()
    } finally s.close()
  }

  test("serves queries over TCP against the registered catalog") {
    Tables.registerAll(spark, TestSpark.Sf)
    val server = SqlServer.start(spark)
    try {
      val r1 = roundTrip(server, "select 1 + 1 as two")
      assert(r1 == """{"columns":["two"],"rows":[["2"]]}""", r1)
      val r2 = roundTrip(server,
        "select count(*) as n from nation")
      assert(r2 == """{"columns":["n"],"rows":[["25"]]}""", r2)
    } finally server.stop()
  }

  test("reports SQL errors in-band instead of dropping the connection") {
    val server = SqlServer.start(spark)
    try {
      val r = roundTrip(server, "select * from no_such_table_xyz")
      assert(r.startsWith("""{"error":"""), r)
      // the connection keeps serving after an error
      val ok = roundTrip(server, "select 'still alive' as s")
      assert(ok.contains("still alive"), ok)
    } finally server.stop()
  }

  test("row cap bounds the response for unbounded selects") {
    Tables.registerAll(spark, TestSpark.Sf)
    val server = SqlServer.start(spark, maxRows = 5)
    try {
      val r = roundTrip(server, "select l_orderkey from lineitem")
      val n = "\\[\"".r.findAllIn(r).size // one per row + 1 for columns
      assert(n <= 6, s"row cap not applied: $r")
    } finally server.stop()
  }
}
