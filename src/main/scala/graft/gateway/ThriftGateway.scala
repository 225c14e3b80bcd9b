package graft.gateway

import org.apache.spark.sql.SparkSession

/** Wire-compatible HiveServer2 Thrift endpoint — the reference's
  * LITERAL client boundary: dbt drives Spark over PyHive/Thrift
  * (`dbtoperator.py:274` pins `dbt-spark[PyHive]`, submission at
  * `:342-360`). Rather than re-implement the HS2 protocol, this
  * starts Spark's own `HiveThriftServer2` against the engine's
  * session, so an UNMODIFIED dbt-spark / PyHive / beeline / hive-jdbc
  * client connects with `jdbc:hive2://host:port`.
  *
  * Session model — real HS2 semantics: each Thrift connection gets
  * its own `newSession()` (Spark's default), so temp views, `SET`
  * conf, and current database are PER-CONNECTION — two concurrent dbt
  * runs cannot see each other's scratch state, and HS2's own session
  * setup (java8 datetime API etc.) mutates only the connection's
  * session, never the host's. What IS shared is the catalog and the
  * host's GLOBAL temp views: `PipelineRunner` publishes every
  * warehouse table as a global temp view, and the
  * [[GraftSqlExtensions]] name-resolution rule (install it at
  * SparkSession BUILD time via
  * `spark.sql.extensions=graft.gateway.GraftSqlExtensions`) makes
  * those resolve by BARE name in every connection unless a
  * connection-local temp view or catalog table shadows them.
  *
  * Posture:
  *
  *  - `spark.sql.hive.thriftServer.singleSession` must NOT be set to
  *    true (checked loudly) — single-session mode shares one session
  *    state across all connections and reintroduces the cross-client
  *    temp-view/conf bleed this endpoint exists to prevent;
  *  - binds loopback by default; pass `allowNonLoopback=true` to
  *    expose it (front it like any Spark Thrift server — Kerberos/
  *    LDAP confs apply through the usual `hive.server2.*` knobs);
  *  - one server per JVM (a HiveServer2 limitation); `stop()` it
  *    before starting another.
  *
  * Scale notes: execution is the shared SparkContext's — a query
  * through this endpoint builds the same Catalyst plan as
  * `spark.sql`, and per-connection sessions cost only session state
  * (conf + temp-view registry), not executors. Result fetch is paged
  * by the client's FetchResults batch size, so big results stream
  * instead of buffering one response.
  */
object ThriftGateway {

  /** A free TCP port (best-effort: closed immediately, tiny race). */
  def freePort(): Int = {
    val s = new java.net.ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  /** Start the HS2 endpoint on `port`, returning a handle with
    * `stop()`. Blocks briefly until the socket accepts connections.
    */
  def start(spark: SparkSession, port: Int,
      bindHost: String = "127.0.0.1",
      allowNonLoopback: Boolean = false): AutoCloseable = {
    require(allowNonLoopback ||
      java.net.InetAddress.getByName(bindHost).isLoopbackAddress,
      s"refusing to bind non-loopback host $bindHost without " +
        "allowNonLoopback=true — this endpoint executes arbitrary SQL")
    require(
      !spark.conf.getOption("spark.sql.hive.thriftServer.singleSession")
        .contains("true"),
      "ThriftGateway runs with per-connection sessions (real HS2 " +
        "semantics); spark.sql.hive.thriftServer.singleSession=true " +
        "would share one session state across every client — publish " +
        "tables as global temp views (PipelineRunner does) and install " +
        "graft.gateway.GraftSqlExtensions for bare-name resolution " +
        "instead")
    // remembered for rollback in the stop closure: start() mutates
    // the HOST session conf (HiveThriftServer2 reads bind host/port
    // from it), and leaving the keys behind would leak this cycle's
    // address into any later unrelated Hive-conf construction
    val bindKeys = Seq("hive.server2.thrift.bind.host",
      "hive.server2.thrift.port")
    val priorBind = bindKeys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set("hive.server2.thrift.bind.host", bindHost)
    spark.conf.set("hive.server2.thrift.port", port.toString)
    // Spark's execution-Hive client REUSES any SessionState already
    // attached to the calling thread; after a previous start()/stop()
    // cycle that stale state still carries the OLD thrift port/host,
    // and the next server silently binds the previous address. Detach
    // so every start builds its HiveConf from the CURRENT session
    // conf. SessionState is THREAD-LOCAL, so stop() detaches too (its
    // own thread's state), and start/stop cycles should run on one
    // thread — a stale state on some third thread is out of reach.
    org.apache.hadoop.hive.ql.session.SessionState.detachSession()
    val server = org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
      .startWithContext(spark.sqlContext)
    // the service layer starts async; wait until the socket accepts
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var up = false
    while (!up && System.nanoTime() < deadline) {
      try {
        val probe = new java.net.Socket(bindHost, port)
        probe.close()
        up = true
      } catch {
        case _: java.io.IOException => Thread.sleep(100)
      }
    }
    require(up, s"Thrift endpoint did not come up on $bindHost:$port")
    () => {
      server.stop()
      // roll the host conf back and drop this thread's SessionState —
      // the next start() (any thread) rebuilds from a clean conf
      priorBind.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      org.apache.hadoop.hive.ql.session.SessionState.detachSession()
    }
  }
}
