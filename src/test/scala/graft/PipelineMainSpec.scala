package graft

import org.scalatest.funsuite.AnyFunSuite

/** graft.PipelineMain — the reference operator's process contract
  * (`dbtoperator.py:121-178,387-434,454-461`): packaged project in,
  * ordered fail-fast commands, cleanup always, exit code out.
  */
class PipelineMainSpec extends AnyFunSuite with SparkTestBase {

  private def scratch(prefix: String): java.nio.file.Path = {
    val base = java.nio.file.Paths.get("/root/repo/target/scratch-test")
    java.nio.file.Files.createDirectories(base)
    java.nio.file.Files.createTempDirectory(base, prefix)
  }

  private def writeProject(): String = {
    val proj = scratch("pm_proj")
    java.nio.file.Files.createDirectories(proj.resolve("models"))
    java.nio.file.Files.writeString(proj.resolve("sources.conf"),
      s"raw_nation=$sf/nation.parquet\n")
    java.nio.file.Files.writeString(proj.resolve("models/pm_top.sql"),
      """{{ config(materialized='table') }}
        |SELECT n_regionkey, count(*) AS n
        |FROM {{ source('raw_nation') }} GROUP BY n_regionkey""".stripMargin)
    proj.toString
  }

  test("runs a project dir end-to-end and exits 0; results land in " +
      "the warehouse") {
    val wh = scratch("pm_wh").toString
    val rc = PipelineMain.run(Seq(
      "--project", writeProject(), "--warehouse", wh,
      "--log-level", "ERROR", "run"), existing = Some(spark))
    assert(rc == 0)
    val r = new graft.pipeline.PipelineRunner(
      spark, graft.pipeline.PipelineSpec(Nil), wh)
    assert(r.readTable("pm_top").count() == 5)
  }

  test("a zip package loads like the reference's packaged project; " +
      "a failing command exits 1 and skips the rest") {
    val proj = writeProject()
    val zip = s"${scratch("pm_zip")}/p.zip"
    graft.pipeline.PipelineProject.pack(proj, zip)
    val wh = scratch("pm_wh2").toString
    // "test" fails (no tests defined is fine — use a bogus select to
    // force a failure) → the later run must be SKIPPED (fail-fast)
    val rc = PipelineMain.run(Seq(
      "--project", zip, "--warehouse", wh, "--log-level", "ERROR",
      "run --select no_such_model", "run"), existing = Some(spark))
    assert(rc == 1)
    // and a clean invocation over the same zip succeeds
    assert(PipelineMain.run(Seq(
      "--project", zip, "--warehouse", wh, "--log-level", "ERROR",
      "run"), existing = Some(spark)) == 0)
  }

  test("serve mode: after the build, the SQL gateway AND the Thrift " +
      "endpoint serve the published tables by bare name until the " +
      "serve window ends") {
    val wh = scratch("pm_wh_srv").toString
    val port = graft.gateway.ThriftGateway.freePort()
    val thriftPort = graft.gateway.ThriftGateway.freePort()
    val exit = new java.util.concurrent.CompletableFuture[Integer]()
    val t = new Thread(() => exit.complete(PipelineMain.run(Seq(
      "--project", writeProject(), "--warehouse", wh,
      "--log-level", "ERROR", "run",
      "--serve-sql-port", port.toString,
      "--serve-thrift-port", thriftPort.toString,
      "--serve-token", "s3cret", "--serve-ms", "12000"),
      existing = Some(spark))))
    t.start()
    // wait for the socket, then query the model table BY NAME
    val deadline = System.nanoTime() + 20L * 1000 * 1000 * 1000
    var resp: String = null
    while (resp == null && System.nanoTime() < deadline) {
      try {
        val sock = new java.net.Socket("127.0.0.1", port)
        try {
          val out = new java.io.PrintWriter(new java.io.OutputStreamWriter(
            sock.getOutputStream, "UTF-8"), true)
          val in = new java.io.BufferedReader(new java.io.InputStreamReader(
            sock.getInputStream, "UTF-8"))
          out.println("""{"token": "s3cret", "sql": "SELECT sum(n) AS s FROM pm_top"}""")
          resp = in.readLine()
        } finally sock.close()
      } catch { case _: java.io.IOException => Thread.sleep(100) }
    }
    assert(resp != null && resp.contains("\"s\":25"), String.valueOf(resp))
    // and the HS2 wire serves the same table by name
    Class.forName("org.apache.hive.jdbc.HiveDriver")
    val conn = java.sql.DriverManager.getConnection(
      s"jdbc:hive2://127.0.0.1:$thriftPort", "anon", "")
    try {
      val rs = conn.createStatement()
        .executeQuery("SELECT sum(n) AS s FROM pm_top")
      assert(rs.next() && rs.getLong(1) == 25L)
    } finally conn.close()
    assert(exit.get(30, java.util.concurrent.TimeUnit.SECONDS) == 0)
    t.join(1000)
  }

  test("argument hygiene: missing flags and unknown levels exit 2") {
    assert(PipelineMain.run(Seq("--warehouse", "/tmp/x", "run"),
      existing = Some(spark)) == 2)
    assert(PipelineMain.run(Seq(
      "--project", "/tmp/x", "--warehouse", "/tmp/y",
      "--log-level", "NOISY", "run"), existing = Some(spark)) == 2)
    assert(PipelineMain.run(Seq(
      "--project", "/tmp/x", "--warehouse", "/tmp/y", "--bogus", "z"),
      existing = Some(spark)) == 2)
  }
}
