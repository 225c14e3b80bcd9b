package graft.gateway

import org.apache.spark.sql.SparkSession

/** Wire-compatible HiveServer2 Thrift endpoint — the reference's
  * LITERAL client boundary: dbt drives Spark over PyHive/Thrift
  * (`dbtoperator.py:274` pins `dbt-spark[PyHive]`, submission at
  * `:342-360`). Rather than re-implement the HS2 protocol, this
  * starts Spark's own `HiveThriftServer2` against the engine's
  * session, so an UNMODIFIED dbt-spark / PyHive / beeline / hive-jdbc
  * client connects with `jdbc:hive2://host:port` and sees the
  * session's temp views — including every `PipelineRunner`-published
  * warehouse table (registered as session views on publish).
  *
  * Requirements/posture:
  *
  *  - the SparkSession must be built with the STATIC conf
  *    `spark.sql.hive.thriftServer.singleSession=true`, otherwise
  *    each Thrift connection gets a fresh session state that cannot
  *    see the host's temp views (checked loudly here — it cannot be
  *    set post-construction);
  *  - binds loopback by default; pass `allowNonLoopback=true` to
  *    expose it (front it like any Spark Thrift server — Kerberos/
  *    LDAP confs apply through the usual `hive.server2.*` knobs);
  *  - one server per JVM (a HiveServer2 limitation); `stop()` it
  *    before starting another.
  *
  * Scale notes: execution is the session's — a query through this
  * endpoint builds the same Catalyst plan as `spark.sql`. Result
  * fetch is paged by the client's FetchResults batch size, so big
  * results stream instead of buffering one response.
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
      spark.conf.getOption("spark.sql.hive.thriftServer.singleSession")
        .contains("true"),
      "ThriftGateway needs spark.sql.hive.thriftServer.singleSession=true " +
        "set at SparkSession BUILD time (static conf) — without it each " +
        "Thrift connection gets fresh session state and cannot see the " +
        "host's temp views / published warehouse tables")
    // With singleSession=true, HS2 session setup mutates the SHARED
    // session conf (it forces spark.sql.datetime.java8API.enabled=true
    // for Thrift result encoding, among others). Snapshot the runtime
    // conf now and roll back any drift on close, so stopping the
    // gateway returns the host session to exactly its prior state.
    val before = spark.conf.getAll
    spark.conf.set("hive.server2.thrift.bind.host", bindHost)
    spark.conf.set("hive.server2.thrift.port", port.toString)
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
      val after = spark.conf.getAll
      after.foreach { case (k, v) =>
        before.get(k) match {
          case Some(old) if old != v =>
            try spark.conf.set(k, old)
            catch { case _: Exception => () } // static conf — leave it
          case None =>
            try spark.conf.unset(k)
            catch { case _: Exception => () }
          case _ => ()
        }
      }
    }
  }
}
