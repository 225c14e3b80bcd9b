package graft

import graft.gateway.SqlGateway
import org.scalatest.funsuite.AnyFunSuite

/** graft.gateway.SqlGateway — the SQL-text submission boundary
  * (reference: dbt drives Spark over PyHive/Thrift,
  * `dbtoperator.py:342-360`): a real TCP round-trip submitting
  * `q_shipping_priority` as SQL text must reproduce the registered
  * key's rows exactly.
  */
class GatewaySpec extends AnyFunSuite with SparkTestBase {

  private def request(port: Int, line: String): String = {
    val sock = new java.net.Socket("127.0.0.1", port)
    try {
      val out = new java.io.PrintWriter(
        new java.io.OutputStreamWriter(sock.getOutputStream, "UTF-8"), true)
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
      out.println(line)
      in.readLine()
    } finally sock.close()
  }

  test("q_shipping_priority submitted as SQL text over the socket " +
      "matches the registered key row-for-row") {
    Seq("customer", "orders", "lineitem").foreach(t =>
      spark.read.parquet(s"$sf/$t.parquet").createOrReplaceTempView(t))
    val gw = new SqlGateway(spark).start()
    try {
      // the key's own oracle SQL is ANSI enough to be Spark SQL too —
      // the exact text an external dbt-style client would submit
      val sql = SparkEntry.oracleSql("q_shipping_priority")
      val body = org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(
          org.json4s.JObject("sql" -> org.json4s.JString(sql))))
      val resp = request(gw.port, body)
      val parsed = org.json4s.jackson.JsonMethods.parse(resp)
      assert((parsed \ "error") == org.json4s.JNothing, resp.take(500))
      import org.json4s.DefaultFormats
      implicit val fmts: org.json4s.Formats = DefaultFormats
      val rows = (parsed \ "rows").children.map(r =>
        ((r \ "l_orderkey").extract[Long],
          (r \ "o_orderpriority").extract[String],
          math.round((r \ "revenue").extract[Double] * 100)))
      val want = SparkEntry.queries("q_shipping_priority")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getString(2),
          math.round(r.getDouble(3) * 100))).toSeq
      assert(rows == want,
        s"gateway rows != registered key: got=$rows want=$want")

      // errors come back as structured JSON, not dropped connections
      val bad = request(gw.port,
        """{"sql": "SELECT * FROM no_such_table"}""")
      assert(bad.contains("\"error\""), bad.take(300))

      // limit caps the result
      val lim = request(gw.port,
        """{"sql": "SELECT * FROM lineitem", "limit": 7}""")
      val nRows = (org.json4s.jackson.JsonMethods.parse(lim) \ "rows")
        .children.size
      assert(nRows == 7, s"limit not applied: $nRows")

      // limit hygiene: > Int.MaxValue clamps to maxRows (no Int
      // wrap to 0), whole JSON doubles are accepted, junk rejected
      def rowsOf(line: String): Int =
        (org.json4s.jackson.JsonMethods.parse(request(gw.port, line))
          \ "rows").children.size
      assert(rowsOf(
        """{"sql": "SELECT 1 AS one", "limit": 4294967296}""") == 1)
      assert(rowsOf(
        """{"sql": "SELECT * FROM lineitem", "limit": 5.0}""") == 5)
      val junk = request(gw.port,
        """{"sql": "SELECT 1", "limit": "ten"}""")
      assert(junk.contains("\"error\""), junk.take(200))
    } finally gw.stop()
  }
}
