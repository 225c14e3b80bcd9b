package graft.gateway

import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Minimal SQL submission gateway — the engine's analogue of the
  * reference's ACTUAL execution boundary: SQL text submitted over a
  * network connection, rows back (the reference drives Spark through
  * a PyHive/Thrift pin, `dbtoperator.py:273-274,342-360`; see
  * [[ThriftGateway]] for the wire-compatible HiveServer2 endpoint).
  * One newline-delimited JSON request per line on a TCP socket:
  *
  * {{{
  *   → {"token": "…", "sql": "SELECT ...", "limit": 1000}
  *   ← {"schema": "col1 TYPE, ...", "rows": [{...}, ...]}
  *   ← {"error": "..."}                          // on failure
  * }}}
  *
  * Rows serialize through `Dataset.toJSON` (one JSON object per row,
  * Spark's own wire-stable encoding). `limit` caps the result
  * (default/ceiling `maxRows`) — a gateway must never buffer an
  * unbounded result into one response; paginate with SQL.
  *
  * Security posture — anything that reaches this socket gets full
  * Spark SQL on the shared session (filesystem reads/writes via
  * `parquet.`-style table paths, session-state mutation), so:
  *
  *  - EVERY request must carry the shared-secret `token` (supplied
  *    by the host or generated at construction — read it back via
  *    [[authToken]]); mismatches get `{"error": …}` and no execution,
  *    compared constant-time;
  *  - the bind host must be loopback unless `allowNonLoopback = true`
  *    is passed explicitly (a cluster deployment fronts it the way
  *    Spark's own Thrift server is fronted);
  *  - concurrent connections are bounded by `maxConnections` — the
  *    acceptor runs on its own thread and over-cap clients get an
  *    immediate error line instead of an unbounded thread pile-up.
  *
  * Queries execute on the shared session so temp views registered by
  * the host — including `PipelineRunner`-published warehouse tables —
  * are visible, the dbt-over-Thrift usage shape. Each connection
  * handles requests sequentially; concurrent CLIENTS get concurrent
  * Spark jobs (fair scheduling applies).
  */
final class SqlGateway(spark: SparkSession,
    host: String = "127.0.0.1", requestedPort: Int = 0,
    maxRows: Int = 10000,
    token: Option[String] = None,
    allowNonLoopback: Boolean = false,
    maxConnections: Int = 64) {

  require(allowNonLoopback ||
    java.net.InetAddress.getByName(host).isLoopbackAddress,
    s"refusing to bind non-loopback host $host without " +
      "allowNonLoopback=true — this socket executes arbitrary SQL")

  /** The shared secret every request must present. */
  val authToken: String = token.getOrElse {
    val bytes = new Array[Byte](24)
    new java.security.SecureRandom().nextBytes(bytes)
    java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(bytes)
  }
  require(authToken.nonEmpty, "auth token must be non-empty")

  private val server = new java.net.ServerSocket(
    requestedPort, 50, java.net.InetAddress.getByName(host))
  @volatile private var running = false
  private def namedThread(r: Runnable): Thread = {
    val t = new Thread(r, "graft-sql-gateway")
    t.setDaemon(true)
    t
  }
  // handler pool is HARD-bounded: SynchronousQueue + AbortPolicy means
  // the (maxConnections+1)th concurrent client is rejected at submit,
  // answered with an error line, and closed — never an unbounded pile
  private val pool = new java.util.concurrent.ThreadPoolExecutor(
    maxConnections, maxConnections, 30L, java.util.concurrent.TimeUnit.SECONDS,
    new java.util.concurrent.SynchronousQueue[Runnable](),
    namedThread(_),
    new java.util.concurrent.ThreadPoolExecutor.AbortPolicy())
  pool.allowCoreThreadTimeOut(true)
  @volatile private var acceptor: Thread = _

  /** The bound port (useful with requestedPort=0). */
  def port: Int = server.getLocalPort

  def start(): this.type = {
    running = true
    acceptor = namedThread { () =>
      while (running && !server.isClosed) {
        try {
          val conn = server.accept()
          try pool.execute(() => handle(conn))
          catch {
            case _: java.util.concurrent.RejectedExecutionException =>
              refuse(conn, "too many concurrent connections")
          }
        } catch {
          case _: Throwable if !running || server.isClosed => () // stop()
          case _: Throwable =>
            // transient accept failure (fd exhaustion) must not kill
            // the acceptor — the socket stays bound and clients would
            // hang in the backlog
            Thread.sleep(50)
        }
      }
    }
    acceptor.start()
    this
  }

  def stop(): Unit = {
    running = false
    server.close()
    pool.shutdownNow(): Unit
  }

  private def refuse(conn: java.net.Socket, msg: String): Unit =
    try {
      val out = new java.io.PrintWriter(
        new java.io.OutputStreamWriter(conn.getOutputStream, "UTF-8"), true)
      out.println(s"""{"error":${JsonMethods.compact(JsonMethods.render(JString(msg)))}}""")
    } catch { case _: java.io.IOException => () }
    finally conn.close()

  /** Read one request line, bounded: an UNAUTHENTICATED client must
    * not be able to buffer an arbitrarily long line into heap before
    * the token check even runs. Over-limit → null (connection drops).
    */
  private def boundedLine(in: java.io.Reader, max: Int): String = {
    val sb = new StringBuilder
    var c = in.read()
    while (c != -1 && c != '\n') {
      if (c != '\r') sb.append(c.toChar)
      if (sb.length > max) return null
      c = in.read()
    }
    if (c == -1 && sb.isEmpty) null else sb.toString
  }

  private val MaxRequestBytes = 4 * 1024 * 1024 // fits any sane SQL text

  private def handle(conn: java.net.Socket): Unit = {
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(conn.getInputStream, "UTF-8"))
    val out = new java.io.PrintWriter(
      new java.io.OutputStreamWriter(conn.getOutputStream, "UTF-8"), true)
    try {
      var line = boundedLine(in, MaxRequestBytes)
      while (line != null) {
        if (line.trim.nonEmpty) out.println(respond(line))
        line = boundedLine(in, MaxRequestBytes)
      }
    } catch {
      case _: java.io.IOException => () // client went away
    } finally conn.close()
  }

  private def tokenOk(req: JValue): Boolean = (req \ "token") match {
    case JString(t) => java.security.MessageDigest.isEqual(
      t.getBytes("UTF-8"), authToken.getBytes("UTF-8"))
    case _ => false
  }

  private[gateway] def respond(requestLine: String): String = {
    implicit val fmts: Formats = DefaultFormats
    try {
      val req = JsonMethods.parse(requestLine)
      if (!tokenOk(req))
        sys.error("missing or invalid 'token' (shared-secret auth is required)")
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
