package graft.gateway

import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Minimal SQL submission gateway — the engine's analogue of the
  * reference's ACTUAL execution boundary: SQL text submitted over a
  * network connection, rows back (the reference drives Spark through
  * a PyHive/Thrift pin, `dbtoperator.py:273-274,342-360`). One
  * newline-delimited JSON request per line on a local TCP socket:
  *
  * {{{
  *   → {"sql": "SELECT ...", "limit": 1000}
  *   ← {"schema": "col1 TYPE, ...", "rows": [{...}, ...]}
  *   ← {"error": "..."}                          // on failure
  * }}}
  *
  * Rows serialize through `Dataset.toJSON` (one JSON object per row,
  * Spark's own wire-stable encoding). `limit` caps the result
  * (default/ceiling `maxRows`) — a gateway must never buffer an
  * unbounded result into one response; paginate with SQL.
  *
  * Scale/posture notes: binds 127.0.0.1 by default (a cluster
  * deployment fronts it the way Spark's own Thrift server is
  * fronted); queries execute on the shared session so temp views
  * registered by the host are visible — the dbt-over-Thrift usage
  * shape. Each connection handles requests sequentially; concurrent
  * CLIENTS get concurrent Spark jobs (fair scheduling applies).
  */
final class SqlGateway(spark: SparkSession,
    host: String = "127.0.0.1", requestedPort: Int = 0,
    maxRows: Int = 10000) {

  private val server = new java.net.ServerSocket(
    requestedPort, 50, java.net.InetAddress.getByName(host))
  @volatile private var running = false
  private val pool = java.util.concurrent.Executors.newCachedThreadPool(
    (r: Runnable) => {
      val t = new Thread(r, "graft-sql-gateway")
      t.setDaemon(true)
      t
    })

  /** The bound port (useful with requestedPort=0). */
  def port: Int = server.getLocalPort

  def start(): this.type = {
    running = true
    pool.submit(new Runnable {
      override def run(): Unit =
        while (running && !server.isClosed) {
          try {
            val conn = server.accept()
            pool.submit(new Runnable {
              override def run(): Unit = handle(conn)
            }): Unit
          } catch {
            case _: Throwable if !running || server.isClosed => () // stop()
            case _: Throwable =>
              // transient accept failure (fd exhaustion, submit
              // rejection) must not kill the acceptor — the socket
              // stays bound and clients would hang in the backlog
              Thread.sleep(50)
          }
        }
    })
    this
  }

  def stop(): Unit = {
    running = false
    server.close()
    pool.shutdownNow(): Unit
  }

  private def handle(conn: java.net.Socket): Unit = {
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(conn.getInputStream, "UTF-8"))
    val out = new java.io.PrintWriter(
      new java.io.OutputStreamWriter(conn.getOutputStream, "UTF-8"), true)
    try {
      var line = in.readLine()
      while (line != null) {
        if (line.trim.nonEmpty) out.println(respond(line))
        line = in.readLine()
      }
    } catch {
      case _: java.io.IOException => () // client went away
    } finally conn.close()
  }

  private[gateway] def respond(requestLine: String): String = {
    implicit val fmts: Formats = DefaultFormats
    try {
      val req = JsonMethods.parse(requestLine)
      val sql = (req \ "sql") match {
        case JString(s) => s
        case _ => sys.error("request must carry a string 'sql' field")
      }
      val limit = (req \ "limit") match {
        // clamp in BigInt space (a > Int.MaxValue limit must cap at
        // maxRows, not wrap through toInt); whole JSON doubles are
        // accepted — many clients emit 7.0 for integers
        case JInt(n) if n >= 0 => n.min(BigInt(maxRows)).toInt
        case JDouble(d) if d >= 0 && d.isWhole =>
          math.min(d.toLong, maxRows.toLong).toInt
        case JNothing | JNull => maxRows
        case other => sys.error(
          s"'limit' must be a non-negative integer, got $other")
      }
      val df = spark.sql(sql).limit(limit)
      val rows = df.toJSON.collect()
      val schema = JsonMethods.compact(JsonMethods.render(
        JString(df.schema.toDDL)))
      s"""{"schema":$schema,"rows":[${rows.mkString(",")}]}"""
    } catch {
      case e: Throwable =>
        val msg = JsonMethods.compact(JsonMethods.render(JString(
          Option(e.getMessage).getOrElse(e.getClass.getName))))
        s"""{"error":$msg}"""
    }
  }
}
