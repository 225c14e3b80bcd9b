package graft

import graft.gateway.{SqlGateway, ThriftGateway}
import org.scalatest.funsuite.AnyFunSuite

/** graft.gateway.{SqlGateway, ThriftGateway} — the SQL-text
  * submission boundary (reference: dbt drives Spark over
  * PyHive/Thrift, `dbtoperator.py:342-360`): a real TCP round-trip
  * submitting `q_shipping_priority` as SQL text must reproduce the
  * registered key's rows exactly, shared-secret auth must gate every
  * request, and the wire-compatible HS2 endpoint must serve
  * unmodified hive-jdbc and beeline clients — including
  * `PipelineRunner`-published warehouse tables by bare name.
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

  private def withToken(gw: SqlGateway, body: String): String = {
    val tok = org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        org.json4s.JString(gw.authToken)))
    s"""{"token": $tok, ${body.trim.stripPrefix("{")}"""
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
          org.json4s.JObject(
            "token" -> org.json4s.JString(gw.authToken),
            "sql" -> org.json4s.JString(sql))))
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
        withToken(gw, """{"sql": "SELECT * FROM no_such_table"}"""))
      assert(bad.contains("\"error\""), bad.take(300))

      // limit caps the result
      val lim = request(gw.port,
        withToken(gw, """{"sql": "SELECT * FROM lineitem", "limit": 7}"""))
      val nRows = (org.json4s.jackson.JsonMethods.parse(lim) \ "rows")
        .children.size
      assert(nRows == 7, s"limit not applied: $nRows")

      // limit hygiene: > Int.MaxValue clamps to maxRows (no Int
      // wrap to 0), whole JSON doubles are accepted, junk rejected
      def rowsOf(line: String): Int =
        (org.json4s.jackson.JsonMethods.parse(
          request(gw.port, withToken(gw, line))) \ "rows").children.size
      assert(rowsOf(
        """{"sql": "SELECT 1 AS one", "limit": 4294967296}""") == 1)
      assert(rowsOf(
        """{"sql": "SELECT * FROM lineitem", "limit": 5.0}""") == 5)
      val junk = request(gw.port,
        withToken(gw, """{"sql": "SELECT 1", "limit": "ten"}"""))
      assert(junk.contains("\"error\""), junk.take(200))
    } finally gw.stop()
  }

  test("auth: requests without the shared-secret token are rejected " +
      "and never executed; non-loopback binds are refused") {
    val gw = new SqlGateway(spark).start()
    try {
      // no token
      val noTok = request(gw.port, """{"sql": "SELECT 1 AS one"}""")
      assert(noTok.contains("token"), noTok.take(300))
      assert(!noTok.contains("\"rows\""), noTok.take(300))
      // wrong token
      val wrong = request(gw.port,
        """{"token": "nope", "sql": "SELECT 1 AS one"}""")
      assert(wrong.contains("\"error\""), wrong.take(300))
      // right token works
      val ok = request(gw.port,
        withToken(gw, """{"sql": "SELECT 1 AS one"}"""))
      assert(ok.contains("\"rows\""), ok.take(300))
      // a host-supplied token is honored verbatim
      val gw2 = new SqlGateway(spark, token = Some("s3cret")).start()
      try {
        val r = request(gw2.port,
          """{"token": "s3cret", "sql": "SELECT 2 AS two"}""")
        assert(r.contains("\"rows\""), r.take(300))
      } finally gw2.stop()
    } finally gw.stop()
    // binding a non-loopback host requires the explicit insecure flag
    intercept[IllegalArgumentException](
      new SqlGateway(spark, host = "0.0.0.0"))
  }

  test("connection bound: the (max+1)th concurrent client gets an " +
      "immediate error line instead of an unbounded thread pile-up") {
    val gw = new SqlGateway(spark, maxConnections = 2).start()
    try {
      // hold two connections open (no request sent — handler blocks
      // on readLine, occupying both pool slots)
      val held = (1 to 2).map(_ => new java.net.Socket("127.0.0.1", gw.port))
      try {
        Thread.sleep(200) // let the acceptor hand both to the pool
        val over = request(gw.port,
          withToken(gw, """{"sql": "SELECT 1 AS one"}"""))
        assert(over != null && over.contains("too many"), String.valueOf(over))
      } finally held.foreach(_.close())
      // slots free up after the held connections close
      Thread.sleep(200)
      val ok = request(gw.port, withToken(gw, """{"sql": "SELECT 1 AS one"}"""))
      assert(ok.contains("\"rows\""), String.valueOf(ok))
    } finally gw.stop()
  }

  test("HS2 wire compatibility: unmodified hive-jdbc and an " +
      "external-process beeline run q_shipping_priority through the " +
      "Thrift endpoint; runner-published warehouse tables resolve " +
      "by bare name") {
    // host-exposed frames cross session boundaries as GLOBAL temp
    // views (each Thrift connection runs in its own newSession();
    // bare names resolve through the GlobalViewFallback rule)
    Seq("customer", "orders", "lineitem").foreach(t =>
      spark.read.parquet(s"$sf/$t.parquet")
        .createOrReplaceGlobalTempView(t))
    // a warehouse table published by the runner — no manual view step
    val wh = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target/scratch-test"),
      "thrift_wh").toString
    val runner = new graft.pipeline.PipelineRunner(
      spark, graft.pipeline.PipelineSpec(models = Nil), wh)
    import spark.implicits._
    runner.replaceTable("gateway_pub",
      Seq((1L, "alpha"), (2L, "beta")).toDF("id", "tag"))

    val port = ThriftGateway.freePort()
    // HS2 session setup (java8 datetime API etc.) must land on each
    // CONNECTION's session, never the host's — no rollback machinery
    val java8Conf = "spark.sql.datetime.java8API.enabled"
    val java8Before = spark.conf.get(java8Conf, "false")
    val srv = ThriftGateway.start(spark, port)
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      val conn = java.sql.DriverManager.getConnection(
        s"jdbc:hive2://127.0.0.1:$port", "anon", "")
      try {
        // the flagship analytic through the real wire == direct run
        val sql = SparkEntry.oracleSql("q_shipping_priority")
        val rs = conn.createStatement().executeQuery(sql)
        val got = Iterator.continually(rs)
          .takeWhile(_.next())
          .map(r => (r.getLong("l_orderkey"), r.getString("o_orderpriority"),
            math.round(r.getDouble("revenue") * 100)))
          .toSeq
        val want = SparkEntry.queries("q_shipping_priority")(spark, sf)
          .collect().map(r => (r.getLong(0), r.getString(2),
            math.round(r.getDouble(3) * 100))).toSeq
        assert(got == want, s"thrift rows != registered key: got=$got")

        // the runner-published table is visible by bare name
        val rs2 = conn.createStatement().executeQuery(
          "SELECT id, tag FROM gateway_pub ORDER BY id")
        val pub = Iterator.continually(rs2).takeWhile(_.next())
          .map(r => (r.getLong(1), r.getString(2))).toSeq
        assert(pub == Seq((1L, "alpha"), (2L, "beta")),
          s"published table not visible through thrift: $pub")
      } finally conn.close()

      // external-process client: beeline over the same socket (the
      // script feeds stdin and quits — `-e` with an open stdin pipe
      // leaves beeline parked at its prompt)
      val script = java.nio.file.Files.createTempFile(
        java.nio.file.Paths.get("/root/repo/target/scratch-test"),
        "beeline", ".sql")
      java.nio.file.Files.writeString(script,
        "SELECT tag FROM gateway_pub WHERE id = 2;\n!quit\n")
      val pb = new ProcessBuilder(
        "/opt/spark/bin/beeline",
        "-u", s"jdbc:hive2://127.0.0.1:$port", "-n", "anon",
        "--outputformat=csv2")
      pb.redirectInput(script.toFile)
      pb.redirectErrorStream(true)
      val proc = pb.start()
      val outBytes = new java.io.ByteArrayOutputStream()
      val pump = new Thread(() => proc.getInputStream.transferTo(outBytes))
      pump.start()
      val done = proc.waitFor(180, java.util.concurrent.TimeUnit.SECONDS)
      if (!done) proc.destroyForcibly()
      pump.join(5000)
      val outStr = outBytes.toString("UTF-8")
      assert(done, s"beeline timed out; output:\n${outStr.takeRight(2000)}")
      assert(proc.exitValue() == 0,
        s"beeline exit ${proc.exitValue()}; output:\n${outStr.takeRight(2000)}")
      assert(outStr.contains("beta"),
        s"beeline did not return the row; output:\n${outStr.takeRight(2000)}")
    } finally {
      srv.close()
      Seq("customer", "orders", "lineitem").foreach(t =>
        spark.catalog.dropGlobalTempView(t))
    }
    // per-connection sessions: the host session's conf was never
    // touched, so there is nothing to roll back
    assert(spark.conf.get(java8Conf, "false") == java8Before,
      "HS2 session setup leaked onto the host session")
  }

  test("per-connection Thrift sessions: two concurrent JDBC clients " +
      "get isolated temp views and conf, while a runner-published " +
      "table resolves in both — and a connection-local view shadows " +
      "it only in its own session") {
    val wh = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target/scratch-test"),
      "thrift_iso").toString
    val runner = new graft.pipeline.PipelineRunner(
      spark, graft.pipeline.PipelineSpec(models = Nil), wh)
    import spark.implicits._
    runner.replaceTable("iso_pub",
      Seq((1L, "alpha"), (2L, "beta")).toDF("id", "tag"))
    val port = ThriftGateway.freePort()
    val srv = ThriftGateway.start(spark, port)
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      val c1 = java.sql.DriverManager.getConnection(
        s"jdbc:hive2://127.0.0.1:$port", "alice", "")
      val c2 = java.sql.DriverManager.getConnection(
        s"jdbc:hive2://127.0.0.1:$port", "bob", "")
      try {
        def one(c: java.sql.Connection, sql: String): String = {
          val rs = c.createStatement().executeQuery(sql)
          assert(rs.next(), s"no row from: $sql")
          rs.getString(1)
        }
        // both sessions resolve the published table by bare name
        assert(one(c1, "SELECT tag FROM iso_pub WHERE id = 2") == "beta")
        assert(one(c2, "SELECT tag FROM iso_pub WHERE id = 2") == "beta")
        // temp views are CONNECTION-LOCAL: same name, different plans
        c1.createStatement().execute(
          "CREATE TEMPORARY VIEW scratch AS SELECT 'one' AS v")
        c2.createStatement().execute(
          "CREATE TEMPORARY VIEW scratch AS SELECT 'two' AS v")
        assert(one(c1, "SELECT v FROM scratch") == "one")
        assert(one(c2, "SELECT v FROM scratch") == "two")
        // SET is connection-local too — and never bleeds to the host
        val hostBefore = spark.conf.get("spark.sql.shuffle.partitions")
        c1.createStatement().execute("SET spark.sql.shuffle.partitions=7")
        def confOf(c: java.sql.Connection): String = {
          val rs = c.createStatement()
            .executeQuery("SET spark.sql.shuffle.partitions")
          assert(rs.next()); rs.getString(2)
        }
        assert(confOf(c1) == "7", "SET must apply to its own session")
        assert(confOf(c2) == hostBefore,
          "SET in one connection leaked into another")
        assert(spark.conf.get("spark.sql.shuffle.partitions") == hostBefore,
          "SET over Thrift leaked into the host session")
        // a connection-local temp view SHADOWS the published name in
        // its own session only (HS2 lookup order)
        c1.createStatement().execute(
          "CREATE TEMPORARY VIEW iso_pub AS SELECT 99 AS id, 'mine' AS tag")
        assert(one(c1, "SELECT tag FROM iso_pub") == "mine")
        assert(one(c2, "SELECT tag FROM iso_pub WHERE id = 2") == "beta",
          "shadowing bled across sessions")
        // the host session resolves its own (session temp) view
        assert(spark.sql("SELECT tag FROM iso_pub WHERE id = 2")
          .collect().head.getString(0) == "beta")
      } finally { c1.close(); c2.close() }
    } finally {
      srv.close()
      spark.catalog.dropTempView("iso_pub")
      spark.catalog.dropGlobalTempView("iso_pub")
    }
  }

  test("the dbt-spark DDL path: a JDBC client's CREATE TABLE lands " +
      "in the SHARED catalog — visible to other connections, their " +
      "SHOW TABLES, and the host — unlike its private temp views") {
    val port = ThriftGateway.freePort()
    val srv = ThriftGateway.start(spark, port)
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      val c1 = java.sql.DriverManager.getConnection(
        s"jdbc:hive2://127.0.0.1:$port", "alice", "")
      val c2 = java.sql.DriverManager.getConnection(
        s"jdbc:hive2://127.0.0.1:$port", "bob", "")
      try {
        // the statement shape dbt-spark's table materialization emits
        c1.createStatement().execute(
          "CREATE TABLE gw_ddl USING parquet AS SELECT 1 AS id, 'a' AS v")
        val rs = c2.createStatement()
          .executeQuery("SELECT v FROM gw_ddl WHERE id = 1")
        assert(rs.next() && rs.getString(1) == "a",
          "catalog table not visible to a sibling connection")
        // list_relations: SHOW TABLES from the OTHER connection
        val st = c2.createStatement().executeQuery("SHOW TABLES")
        val listed = Iterator.continually(st).takeWhile(_.next())
          .map(_.getString(2)).toSet
        assert(listed.contains("gw_ddl"),
          s"SHOW TABLES missed the catalog table: $listed")
        // and the host session reads it too (one shared catalog)
        assert(spark.sql("SELECT v FROM gw_ddl").head().getString(0) == "a")
      } finally {
        c1.close(); c2.close()
      }
    } finally {
      srv.close()
      spark.sql("DROP TABLE IF EXISTS gw_ddl")
    }
  }

  test("dbt-spark's merge strategy over Thrift: the exact " +
      "MERGE INTO ... UPDATE SET * / INSERT * text executes through " +
      "the engine's Delta merge; wrong ON keys and unrouted " +
      "relations fail loudly") {
    import graft.pipeline.{Materialization, Model, PipelineRunner, PipelineSpec}
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target/scratch-test"),
      "thrift_merge_wh").toString
    val spec = PipelineSpec(models = Seq(
      Model("gw_merge", Nil,
        Materialization.IncrementalMerge(Seq("id")),
        (sp, _) => { import sp.implicits._
          Seq((1L, 0.0), (2L, 0.0), (3L, 0.0)).toDF("id", "bal") },
        fileFormat = "delta"),
      Model("gw_plain", Nil, Materialization.Table,
        (sp, _) => { import sp.implicits._
          Seq((1L, "x")).toDF("id", "v") })))
    val runner = new PipelineRunner(spark, spec, wh)
    assert(runner.run(Seq("run")).success)
    val port = ThriftGateway.freePort()
    val srv = ThriftGateway.start(spark, port)
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      val conn = java.sql.DriverManager.getConnection(
        s"jdbc:hive2://127.0.0.1:$port", "dbt", "")
      try {
        val st = conn.createStatement()
        // dbt stages the batch as a view, then emits MERGE
        st.execute("""CREATE TEMPORARY VIEW gw_merge__dbt_tmp AS
          |SELECT * FROM VALUES (2L, 20.0), (4L, 40.0) AS t(id, bal)"""
          .stripMargin)
        st.execute("""MERGE INTO gw_merge AS DBT_INTERNAL_DEST
          |USING gw_merge__dbt_tmp AS DBT_INTERNAL_SOURCE
          |ON DBT_INTERNAL_DEST.id = DBT_INTERNAL_SOURCE.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        // the merged state reads back over the same wire...
        val rs = st.executeQuery(
          "SELECT id, bal FROM gw_merge ORDER BY id")
        val got = Iterator.continually(rs).takeWhile(_.next())
          .map(r => (r.getLong(1), r.getDouble(2))).toSeq
        assert(got == Seq((1L, 0.0), (2L, 20.0), (3L, 0.0), (4L, 40.0)),
          s"merged state wrong over thrift: $got")
        // ...and through the runner / any Delta reader
        val direct = runner.readTable("gw_merge").orderBy("id")
          .as[(Long, Double)].collect().toSeq
        assert(direct == Seq((1L, 0.0), (2L, 20.0), (3L, 0.0), (4L, 40.0)),
          s"merged state wrong via DeltaRead: $direct")
        // ON keys that are not the model's unique_key refuse loudly
        st.execute("""CREATE TEMPORARY VIEW gw_bad_src AS
          |SELECT * FROM VALUES (9L, 9.0) AS t(id, bal)""".stripMargin)
        val e = intercept[java.sql.SQLException](st.execute(
          """MERGE INTO gw_merge AS d USING gw_bad_src AS s
            |ON d.bal = s.bal
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin))
        assert(e.getMessage.contains("unique_key"), e.getMessage)
        // a non-merge relation is NOT routed: Spark's own loud error
        val e2 = intercept[java.sql.SQLException](st.execute(
          """MERGE INTO gw_plain AS d USING gw_bad_src AS s
            |ON d.id = s.id
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin))
        assert(!e2.getMessage.contains("unique_key"), e2.getMessage)
      } finally conn.close()
    } finally {
      srv.close()
      graft.gateway.MergeRoutes.unregister("gw_merge")
    }
  }

  test("dbt-spark 1.9 statement transcript over hive-jdbc, one " +
      "materialization at a time: view (CREATE OR REPLACE), table " +
      "(drop + CTAS rebuild), incremental append (tmp view + INSERT " +
      "INTO), insert_overwrite (DYNAMIC partition overwrite keeps " +
      "untouched partitions)") {
    import graft.gateway.{DbtTranscript => T}
    val db = "dbt_gwspec"
    spark.sql(s"drop database if exists $db cascade")
    val port = ThriftGateway.freePort()
    val srv = ThriftGateway.start(spark, port)
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      val conn = java.sql.DriverManager.getConnection(
        s"jdbc:hive2://127.0.0.1:$port", "dbt", "")
      try {
        val st = conn.createStatement()
        def run(stmts: Seq[String]): Unit = stmts.foreach(st.execute)
        def one(sql: String): Seq[Seq[String]] = {
          val rs = st.executeQuery(sql)
          val n = rs.getMetaData.getColumnCount
          Iterator.continually(rs).takeWhile(_.next())
            .map(r => (1 to n).map(i => String.valueOf(r.getObject(i))))
            .toSeq
        }
        run(T.runStart(db))
        st.execute(s"create table $db.src using parquet as " +
          "select * from values (1, 'a', 10), (2, 'a', 20), " +
          "(3, 'b', 30), (4, 'c', 40) as t(id, grp, v)")

        // view: rerun is the same CREATE OR REPLACE; stays a VIEW
        run(T.viewRun(db, "v_m", s"select id, v * 2 as v2 from $db.src"))
        run(T.viewRun(db, "v_m", s"select id, v * 3 as v3 from $db.src"))
        assert(one(s"select v3 from $db.v_m where id = 2") ==
          Seq(Seq("60")))
        assert(one(s"show views in $db").exists(_.contains("v_m")),
          "view materialization did not land as a VIEW")

        // table: rerun REBUILDS (drop + CTAS) — old rows gone
        run(T.tableRun(db, "t_m",
          s"select id, v from $db.src where id <= 2", rerun = false))
        run(T.tableRun(db, "t_m",
          s"select id, v from $db.src where id >= 3", rerun = true))
        assert(one(s"select id from $db.t_m order by id") ==
          Seq(Seq("3"), Seq("4")), "table rerun must fully rebuild")

        // incremental append: run 2 only ADDS the delta
        run(T.incrementalAppendRun(db, "i_m",
          s"select id, v from $db.src where id <= 2", firstRun = true))
        run(T.incrementalAppendRun(db, "i_m",
          s"select id, v from $db.src where id = 3", firstRun = false))
        assert(one(s"select id from $db.i_m order by id") ==
          Seq(Seq("1"), Seq("2"), Seq("3")))

        // insert_overwrite: run 2 recomputes ONLY grp 'a' — the other
        // groups' partitions survive the dynamic overwrite
        run(T.insertOverwriteRun(db, "p_m",
          s"select v, grp from $db.src where id <= 3",
          "grp", firstRun = true))
        run(T.insertOverwriteRun(db, "p_m",
          s"select v * 100 as v, grp from $db.src where grp = 'a'",
          "grp", firstRun = false))
        assert(one(s"select grp, v from $db.p_m order by grp, v") ==
          Seq(Seq("a", "1000"), Seq("a", "2000"), Seq("b", "30")),
          "dynamic insert_overwrite must replace only the batch's " +
            "partitions")

        // dbt's introspection legs
        assert(one(s"show tables in $db").nonEmpty)
        assert(one(s"describe extended $db.t_m").nonEmpty)
      } finally conn.close()
    } finally {
      srv.close()
      spark.sql(s"drop database if exists $db cascade")
    }
  }

  test("schema namespaces over Thrift: two models with the SAME name " +
      "in different schemas resolve by qualified name from a JDBC " +
      "client") {
    import graft.pipeline.{Materialization, Model, PipelineRunner, PipelineSpec}
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target/scratch-test"),
      "thrift_ns_wh").toString
    val spec = PipelineSpec(Seq(
      Model("accounts", Nil, Materialization.Table,
        (sp, _) => { import sp.implicits._
          Seq((1L, "s-a"), (2L, "s-b")).toDF("id", "v") },
        schema = Some("sales")),
      Model("accounts", Nil, Materialization.Table,
        (sp, _) => { import sp.implicits._
          Seq((1L, "f-a"), (3L, "f-c")).toDF("id", "v") },
        schema = Some("finance"))))
    val runner = new PipelineRunner(spark, spec, wh)
    val res = runner.run(Seq("run"))
    assert(res.success, res.results.flatMap(_.error).mkString("; "))
    // warehouse layout: one subdir per schema
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(wh, "sales", "accounts")), "layout wrong")
    val port = ThriftGateway.freePort()
    val srv = ThriftGateway.start(spark, port)
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      val conn = java.sql.DriverManager.getConnection(
        s"jdbc:hive2://127.0.0.1:$port", "anon", "")
      try {
        def q(sql: String): Seq[(Long, String)] = {
          val rs = conn.createStatement().executeQuery(sql)
          Iterator.continually(rs).takeWhile(_.next())
            .map(r => (r.getLong(1), r.getString(2))).toSeq
        }
        assert(q("SELECT id, v FROM sales.accounts ORDER BY id") ==
          Seq((1L, "s-a"), (2L, "s-b")))
        assert(q("SELECT id, v FROM finance.accounts ORDER BY id") ==
          Seq((1L, "f-a"), (3L, "f-c")))
        // the two same-named relations JOIN by qualified names
        assert(q("""SELECT s.id, f.v FROM sales.accounts s
                   |JOIN finance.accounts f ON s.id = f.id
                   |ORDER BY s.id""".stripMargin) == Seq((1L, "f-a")))
      } finally conn.close()
    } finally srv.close()
  }

  test("dbt snapshot's CONDITIONED merge over Thrift: the verbatim " +
      "spark__snapshot_merge_sql statement (matched+conditioned " +
      "UPDATE SET dbt_valid_to, not-matched+conditioned INSERT *) " +
      "executes through the engine's Delta merge via the conditional " +
      "compile; THEN DELETE stays unrouted and loud") {
    import graft.pipeline.{Materialization, Model, PipelineRunner, PipelineSpec}
    import org.apache.spark.sql.functions.{coalesce, col, concat, lit, md5}
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("/root/repo/target/scratch-test"))
    val wh = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target/scratch-test"),
      "thrift_snap_wh").toString
    // the snapshot table's v1 state: three current rows, dbt SCD
    // columns exactly as dbt's first snapshot run writes them
    val spec = PipelineSpec(models = Seq(
      Model("gw_snap", Nil,
        Materialization.IncrementalMerge(Seq("dbt_scd_id")),
        (sp, _) => { import sp.implicits._
          Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "val")
            .withColumn("updated_at",
              lit("2024-01-01 00:00:00").cast("timestamp"))
            .withColumn("dbt_updated_at", col("updated_at"))
            .withColumn("dbt_valid_from", col("updated_at"))
            .withColumn("dbt_valid_to", lit(null).cast("timestamp"))
            .withColumn("dbt_scd_id", md5(concat(
              coalesce(col("id").cast("string"), lit("")), lit("|"),
              coalesce(col("updated_at").cast("string"), lit(""))))) },
        fileFormat = "delta")))
    val runner = new PipelineRunner(spark, spec, wh)
    assert(runner.run(Seq("run")).success)
    val port = ThriftGateway.freePort()
    val srv = ThriftGateway.start(spark, port)
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      val conn = java.sql.DriverManager.getConnection(
        s"jdbc:hive2://127.0.0.1:$port", "dbt", "")
      try {
        val st = conn.createStatement()
        // the source's v2 state: id=2 changed (newer updated_at),
        // id=4 brand new, 1/3 untouched
        st.execute("""CREATE TEMPORARY VIEW gw_snap_src AS
          |SELECT * FROM VALUES
          |  (1L, 'a', timestamp'2024-01-01 00:00:00'),
          |  (2L, 'B', timestamp'2024-02-01 00:00:00'),
          |  (3L, 'c', timestamp'2024-01-01 00:00:00'),
          |  (4L, 'd', timestamp'2024-03-01 00:00:00')
          |AS t(id, val, updated_at)""".stripMargin)
        graft.gateway.DbtTranscript.snapshotRun("gw_snap", "gw_snap",
          graft.gateway.DbtTranscript.snapshotStagingSelect(
            "gw_snap", "select * from gw_snap_src", "id", "updated_at"))
          .foreach(st.execute)
        val rs = st.executeQuery(
          """SELECT id, val, CAST(dbt_valid_to AS STRING)
            |FROM gw_snap ORDER BY id, dbt_valid_from""".stripMargin)
        val got = Iterator.continually(rs).takeWhile(_.next())
          .map(r => (r.getLong(1), r.getString(2),
            Option(r.getString(3)).getOrElse("current"))).toSeq
        assert(got == Seq(
          (1L, "a", "current"),
          (2L, "b", "2024-02-01 00:00:00"), // closed by the update leg
          (2L, "B", "current"),             // opened by the insert leg
          (3L, "c", "current"),
          (4L, "d", "current")), s"snapshot state wrong over thrift: $got")
        // THEN DELETE has no routed execution — Spark's own loud
        // unsupported error, never a silent partial merge
        val e = intercept[java.sql.SQLException](st.execute(
          """MERGE INTO gw_snap AS d USING gw_snap_src AS s
            |ON d.dbt_scd_id = s.val
            |WHEN MATCHED THEN DELETE""".stripMargin))
        assert(e.getMessage.toLowerCase.contains("merge"), e.getMessage)
      } finally conn.close()
    } finally {
      srv.close()
      graft.gateway.MergeRoutes.unregister("gw_snap")
    }
  }

  test("conditional MERGE compile semantics: first matching action " +
      "wins, unassigned update columns keep target values, " +
      "unassigned insert columns are NULL, and a not-matched " +
      "condition may only see the source") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("/root/repo/target/scratch-test"))
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target/scratch-test"),
      "cond_merge").toString
    graft.sources.DeltaWrite.merge(spark,
      dir, Seq((1L, "x", 10.0), (2L, "y", 20.0)).toDF("id", "name", "bal"),
      Seq("id"))
    graft.sources.DeltaRead.readDeltaTable(spark, dir)
      .createOrReplaceTempView("gw_cond_tgt")
    graft.gateway.MergeRoutes.register("gw_cond_tgt",
      (sess, batch, keys) =>
        graft.sources.DeltaWrite.merge(sess, dir, batch, keys))
    try {
      Seq((1L, 100.0, "hot"), (2L, 5.0, "cold"), (7L, 7.0, "new"))
        .toDF("id", "v", "tag").createOrReplaceTempView("gw_cond_src")
      spark.sql(
        """MERGE INTO gw_cond_tgt t USING gw_cond_src s ON t.id = s.id
          |WHEN MATCHED AND s.v > 50 THEN UPDATE SET bal = s.v * 2
          |WHEN MATCHED THEN UPDATE SET name = s.tag
          |WHEN NOT MATCHED AND s.tag = 'new'
          |  THEN INSERT (id, bal) VALUES (s.id, s.v)""".stripMargin)
        .collect()
      val got = graft.sources.DeltaRead.readDeltaTable(spark, dir)
        .orderBy("id").select("id", "name", "bal")
        .as[(Long, Option[String], Double)].collect().toSeq
      assert(got == Seq(
        (1L, Some("x"), 200.0),   // first action: bal doubled, name kept
        (2L, Some("cold"), 20.0), // second action: name set, bal kept
        (7L, None, 7.0)),         // insert: unassigned name is NULL
        s"conditional merge state wrong: $got")
      // a NOT MATCHED condition referencing the target row is
      // rejected (there IS no target row) — loud, not misevaluated
      val e = intercept[Exception](spark.sql(
        """MERGE INTO gw_cond_tgt t USING gw_cond_src s ON t.id = s.id
          |WHEN NOT MATCHED AND t.bal > 0 THEN INSERT *""".stripMargin)
        .collect())
      assert(e.getMessage != null)
      // assigning the unique key a non-key expression refuses loudly
      // (the upsert could not relocate the row — a silent duplicate
      // otherwise)
      val eKey = intercept[Exception](spark.sql(
        """MERGE INTO gw_cond_tgt t USING gw_cond_src s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET id = s.id + 1000""".stripMargin)
        .collect())
      assert(eKey.getMessage.contains("unique-key"), eKey.getMessage)
      // SQL MERGE's multiple-match rule: two source rows hitting one
      // target key refuse loudly instead of committing duplicates
      Seq((1L, 5.0, "a"), (1L, 6.0, "b"))
        .toDF("id", "v", "tag").createOrReplaceTempView("gw_dup_src")
      val eDup = intercept[Exception](spark.sql(
        """MERGE INTO gw_cond_tgt t USING gw_dup_src s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET bal = s.v""".stripMargin)
        .collect())
      assert(eDup.getMessage.contains("multiple source rows"),
        eDup.getMessage)
      spark.catalog.dropTempView("gw_dup_src")
    } finally {
      graft.gateway.MergeRoutes.unregister("gw_cond_tgt")
      spark.catalog.dropTempView("gw_cond_src")
      spark.catalog.dropTempView("gw_cond_tgt")
    }
  }

  test("UPDATE and DELETE FROM over Thrift: post-image upsert / DV " +
      "delete through the engine; key assignment and unrouted " +
      "relations fail loudly") {
    import graft.pipeline.{Materialization, Model, PipelineRunner, PipelineSpec}
    import spark.implicits._
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("/root/repo/target/scratch-test"))
    val wh = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target/scratch-test"),
      "thrift_dml_wh").toString
    val spec = PipelineSpec(models = Seq(
      Model("gw_dml", Nil,
        Materialization.IncrementalMerge(Seq("id")),
        (sp, _) => { import sp.implicits._
          Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
            (4L, "d", 40.0)).toDF("id", "tag", "bal") },
        fileFormat = "delta"),
      // a MANIFEST-format merge model: UPDATE routes (upsert works on
      // any format), DELETE does not (no DV path) — loud
      Model("gw_dml_plain", Nil,
        Materialization.IncrementalMerge(Seq("id")),
        (sp, _) => { import sp.implicits._
          Seq((1L, 1.0)).toDF("id", "v") })))
    val runner = new PipelineRunner(spark, spec, wh)
    assert(runner.run(Seq("run")).success)
    val port = ThriftGateway.freePort()
    val srv = ThriftGateway.start(spark, port)
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      val conn = java.sql.DriverManager.getConnection(
        s"jdbc:hive2://127.0.0.1:$port", "dbt", "")
      try {
        val st = conn.createStatement()
        st.execute("UPDATE gw_dml SET bal = bal + 1, tag = upper(tag) " +
          "WHERE id >= 3")
        st.execute("DELETE FROM gw_dml WHERE id = 2")
        val rs = st.executeQuery(
          "SELECT id, tag, bal FROM gw_dml ORDER BY id")
        val got = Iterator.continually(rs).takeWhile(_.next())
          .map(r => (r.getLong(1), r.getString(2), r.getDouble(3))).toSeq
        assert(got == Seq((1L, "a", 10.0), (3L, "C", 31.0),
          (4L, "D", 41.0)), s"DML state wrong over thrift: $got")
        // ...and through any Delta reader
        val direct = runner.readTable("gw_dml").orderBy("id")
          .as[(Long, String, Double)].collect().toSeq
        assert(direct == got, s"DML state wrong via DeltaRead: $direct")
        // UPDATE on the manifest-format model routes too
        st.execute("UPDATE gw_dml_plain SET v = v * 10 WHERE id = 1")
        assert(runner.readTable("gw_dml_plain").head().getDouble(1)
          == 10.0, "manifest UPDATE missed")
        // assigning the unique key refuses loudly
        val e1 = intercept[java.sql.SQLException](st.execute(
          "UPDATE gw_dml SET id = id + 100"))
        assert(e1.getMessage.contains("unique-key"), e1.getMessage)
        // DELETE on a relation without a delete path: Spark's own
        // loud v2-only error, never a silent no-op
        val e2 = intercept[java.sql.SQLException](st.execute(
          "DELETE FROM gw_dml_plain WHERE id = 1"))
        assert(!e2.getMessage.contains("unique-key"), e2.getMessage)
      } finally conn.close()
    } finally {
      srv.close()
      graft.gateway.MergeRoutes.unregister("gw_dml")
      graft.gateway.MergeRoutes.unregister("gw_dml_plain")
      graft.gateway.DmlRoutes.unregister("gw_dml")
      graft.gateway.DmlRoutes.unregister("gw_dml_plain")
    }
  }

  test("VERSION AS OF over Thrift: published manifest generations " +
      "and Delta versions read back pinned; unrouted relations and " +
      "TIMESTAMP AS OF keep Spark's loud error") {
    import graft.pipeline.{Materialization, Model, PipelineRunner, PipelineSpec}
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("/root/repo/target/scratch-test"))
    val wh = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target/scratch-test"),
      "thrift_tt_wh").toString
    var round = 1
    val spec = PipelineSpec(models = Seq(
      Model("gw_tt", Nil, Materialization.Table,
        (sp, _) => { import sp.implicits._
          (1L to (round * 2L)).map(i => (i, s"r$round")).toDF("id", "v") }),
      Model("gw_tt_delta", Nil,
        Materialization.IncrementalMerge(Seq("id")),
        (sp, _) => { import sp.implicits._
          Seq((1L, 0.0), (2L, 0.0)).toDF("id", "bal") },
        fileFormat = "delta")))
    val runner = new PipelineRunner(spark, spec, wh)
    assert(runner.run(Seq("run")).success)
    round = 2
    assert(runner.run(Seq("run")).success) // gen_2 / merge version 1
    val port = ThriftGateway.freePort()
    val srv = ThriftGateway.start(spark, port)
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      val conn = java.sql.DriverManager.getConnection(
        s"jdbc:hive2://127.0.0.1:$port", "dbt", "")
      try {
        val st = conn.createStatement()
        def count(sql: String): Long = {
          val rs = st.executeQuery(sql); rs.next(); rs.getLong(1)
        }
        // manifest generations: gen_1 had 2 rows, gen_2 has 4
        assert(count(
          "SELECT count(*) FROM gw_tt VERSION AS OF 1") == 2L)
        assert(count(
          "SELECT count(*) FROM gw_tt VERSION AS OF 2") == 4L)
        assert(count("SELECT count(*) FROM gw_tt") == 4L)
        // Delta versions: 0 = creation, 1 = the second run's merge
        assert(count(
          "SELECT count(*) FROM gw_tt_delta VERSION AS OF 0") == 2L)
        // TIMESTAMP AS OF routes too: pin the manifest generations'
        // commit wall-times (mtime IS the commit timestamp) and the
        // resolver picks the generation at-or-before the literal
        Seq("gen_1" -> "2024-01-01T00:00:00Z",
            "gen_2" -> "2024-06-01T00:00:00Z").foreach { case (g, t) =>
          java.nio.file.Files.setLastModifiedTime(
            java.nio.file.Paths.get(wh, "gw_tt", g),
            java.nio.file.attribute.FileTime.from(
              java.time.Instant.parse(t))): Unit
        }
        assert(count(
          "SELECT count(*) FROM gw_tt TIMESTAMP AS OF '2024-03-01'") == 2L)
        assert(count(
          "SELECT count(*) FROM gw_tt TIMESTAMP AS OF '2024-07-01'") == 4L)
        // a timestamp BEFORE the table existed refuses loudly —
        // never a silently-current (or empty) read
        val e = intercept[java.sql.SQLException](st.executeQuery(
          "SELECT * FROM gw_tt TIMESTAMP AS OF '2023-01-01'"))
        assert(e.getMessage.contains("gw_tt"), e.getMessage)
        // unrouted relation: loud, never a silently-current read
        val e2 = intercept[java.sql.SQLException](st.executeQuery(
          "SELECT * FROM no_such_rel VERSION AS OF 1"))
        assert(e2.getMessage != null)
      } finally conn.close()
    } finally {
      srv.close()
      runner.cleanup()
    }
  }

  test("route lifecycle: cleanup retires a runner's JVM-global SQL " +
      "routes (no stale handler serves a defunct warehouse); a newer " +
      "same-name publish survives the old runner's cleanup") {
    import graft.pipeline.{Materialization, Model, PipelineRunner, PipelineSpec}
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("/root/repo/target/scratch-test"))
    def wh() = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target/scratch-test"),
      "route_lc_wh").toString
    def specFor(bal: Double) = PipelineSpec(models = Seq(
      Model("gw_lc", Nil, Materialization.IncrementalMerge(Seq("id")),
        (sp, _) => { import sp.implicits._
          Seq((1L, bal), (2L, bal)).toDF("id", "bal") },
        fileFormat = "delta")))

    val a = new PipelineRunner(spark, specFor(1.0), wh())
    assert(a.run(Seq("run")).success)
    assert(graft.gateway.MergeRoutes.lookup("gw_lc").nonEmpty)
    assert(graft.gateway.DmlRoutes.lookup("gw_lc").nonEmpty)
    assert(graft.gateway.TimeTravelRoutes.lookup("gw_lc").nonEmpty)

    // cleanup retires every route the runner registered: a
    // post-cleanup VERSION AS OF (or MERGE/UPDATE) finds no handler
    // and falls through to Spark's own loud unsupported error — never
    // the defunct warehouse's data
    a.cleanup()
    assert(graft.gateway.MergeRoutes.lookup("gw_lc").isEmpty)
    assert(graft.gateway.DmlRoutes.lookup("gw_lc").isEmpty)
    assert(graft.gateway.TimeTravelRoutes.lookup("gw_lc").isEmpty)

    // a NEWER runner re-publishes the same model name (different
    // warehouse); the OLD runner's (repeated) cleanup must not tear
    // down the new registration — last-write-wins, owner-scoped
    val b = new PipelineRunner(spark, specFor(42.0), wh())
    try {
      assert(b.run(Seq("run")).success)
      a.cleanup() // idempotent; must not touch b's routes
      val tt = graft.gateway.TimeTravelRoutes.lookup("gw_lc")
      assert(tt.nonEmpty, "old runner's cleanup removed the new route")
      val bals = tt.get.apply(spark, "0").select("bal")
        .collect().map(_.getDouble(0)).toSet
      assert(bals == Set(42.0), s"stale warehouse served: $bals")
    } finally b.cleanup()
    assert(graft.gateway.MergeRoutes.lookup("gw_lc").isEmpty)
  }

  test("dbt incremental_predicates over Thrift: residual ON conjuncts " +
      "route into the Delta merge, the touched-file probe is " +
      "stats-pruned (out-of-window files never opened), and " +
      "out-of-window rows are left untouched") {
    import graft.pipeline.{Materialization, Model, PipelineRunner, PipelineSpec}
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    import spark.implicits._
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("/root/repo/target/scratch-test"))
    val wh = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target/scratch-test"),
      "thrift_pred_wh").toString
    // ids split by the merge's own bucket hash so creation yields one
    // file of ONLY out-of-window rows (bucket 0, ts 2023-12-15) and
    // one of in-window rows (bucket 1, ts 2024-01-15)
    val bucketOf: Map[Long, Long] = spark.range(1, 201)
      .select($"id", pmod(xxhash64(col("id")), lit(2)).as("b"))
      .as[(Long, Long)].collect().toMap
    val oldIds = bucketOf.collect { case (i, 0L) => i }.toSeq.sorted
    val newIds = bucketOf.collect { case (i, 1L) => i }.toSeq.sorted
    assert(oldIds.nonEmpty && newIds.nonEmpty)
    val ts0 = java.sql.Timestamp.valueOf("2023-12-15 00:00:00")
    val ts1 = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    val spec = PipelineSpec(models = Seq(
      Model("gw_pred", Nil, Materialization.IncrementalMerge(Seq("id"), 2),
        (sp, _) => { import sp.implicits._
          (oldIds.map(i => (i, 0.0, ts0)) ++ newIds.map(i => (i, 0.0, ts1)))
            .toDF("id", "bal", "ts") },
        fileFormat = "delta")))
    val runner = new PipelineRunner(spark, spec, wh)
    assert(runner.run(Seq("run")).success)
    val tdir = java.nio.file.Paths.get(wh, "gw_pred")
    def dataFiles(): Map[String, Array[Byte]] = {
      import scala.jdk.CollectionConverters._
      val w = java.nio.file.Files.list(tdir)
      try w.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(f => f.getFileName.toString -> java.nio.file.Files.readAllBytes(f))
        .toMap
      finally w.close()
    }
    val before = dataFiles()
    assert(before.size == 2, before.keys.toSeq)
    // bucket 0 = the out-of-window file; hide it — a probe that
    // opened it would throw
    val outFile = before.keys.filter(_.startsWith("part-00000")).toSeq
    assert(outFile.size == 1, before.keys.toSeq)
    outFile.foreach(f => java.nio.file.Files.move(
      tdir.resolve(f), tdir.resolve(f + ".hide")))
    val port = ThriftGateway.freePort()
    val srv = ThriftGateway.start(spark, port)
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      val conn = java.sql.DriverManager.getConnection(
        s"jdbc:hive2://127.0.0.1:$port", "dbt", "")
      try {
        val st = conn.createStatement()
        val touch = newIds.take(3)
        st.execute(s"""CREATE TEMPORARY VIEW gw_pred__dbt_tmp AS
          |SELECT * FROM VALUES
          |${touch.map(i =>
              s"(${i}L, 42.0, timestamp'2024-02-01 00:00:00')")
            .mkString(", ")}
          |AS t(id, bal, ts)""".stripMargin)
        // WITHOUT the residual the probe must scan every live file —
        // with one hidden that fails loudly (proves the scan-set
        // difference the residual pruning then removes)
        val e = intercept[java.sql.SQLException](st.execute(
          """MERGE INTO gw_pred AS DBT_INTERNAL_DEST
            |USING gw_pred__dbt_tmp AS DBT_INTERNAL_SOURCE
            |ON DBT_INTERNAL_DEST.id = DBT_INTERNAL_SOURCE.id
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin))
        assert(e.getMessage != null)
        // WITH the residual (the dbt-emitted incremental_predicates
        // shape) the out-of-window file's stats prune it from the
        // probe — the merge succeeds with the file still hidden
        st.execute(
          """MERGE INTO gw_pred AS DBT_INTERNAL_DEST
            |USING gw_pred__dbt_tmp AS DBT_INTERNAL_SOURCE
            |ON (DBT_INTERNAL_DEST.id = DBT_INTERNAL_SOURCE.id)
            |  AND (DBT_INTERNAL_DEST.ts >= timestamp'2024-01-01 00:00:00')
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        outFile.foreach(f => java.nio.file.Files.move(
          tdir.resolve(f + ".hide"), tdir.resolve(f)))
        val after = dataFiles()
        // the out-of-window file was neither rewritten nor removed
        outFile.foreach(f => assert(
          after.get(f).exists(_.sameElements(before(f))),
          s"out-of-window file $f was rewritten"))
        val got = graft.sources.DeltaRead
          .readDeltaTable(spark, tdir.toString)
          .orderBy("id").as[(Long, Double, java.sql.Timestamp)]
          .collect().toSeq
        val want = (oldIds.map(i => (i, 0.0, ts0)) ++
          newIds.map(i => (i,
            if (touch.contains(i)) 42.0 else 0.0,
            if (touch.contains(i))
              java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
            else ts1))).sortBy(_._1)
        assert(got == want,
          s"merged state wrong: ${got.diff(want)} vs ${want.diff(got)}")
      } finally conn.close()
    } finally {
      srv.close()
      runner.cleanup()
    }
  }

  test("MERGE matched-DELETE leg, FALLBACK path (handler without " +
      "supportsMergeDelete): routes onto the registered DV delete as " +
      "its own commit before the upsert (data files byte-identical), " +
      "composes with update+insert in one statement, update+delete " +
      "on one key refuses (cardinality), and a relation without " +
      "delete capability stays loud") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("/root/repo/target/scratch-test"))
    val d = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target/scratch-test"),
      "merge_del").toString
    graft.sources.DeltaWrite.merge(spark, d,
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0))
        .toDF("id", "bal"),
      Seq("id"), buckets = 2)
    def dataFiles(): Map[String, Array[Byte]] = {
      import scala.jdk.CollectionConverters._
      val w = java.nio.file.Files.list(java.nio.file.Paths.get(d))
      try w.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(f => f.getFileName.toString ->
          java.nio.file.Files.readAllBytes(f)).toMap
      finally w.close()
    }
    val before = dataFiles()
    graft.sources.DeltaRead.readDeltaTable(spark, d)
      .createOrReplaceTempView("gw_mdel")
    graft.gateway.MergeRoutes.register("gw_mdel",
      (sess, batch, keys) =>
        graft.sources.DeltaWrite.merge(sess, d, batch, keys))
    graft.gateway.DmlRoutes.register("gw_mdel",
      graft.gateway.DmlRoutes.Ops(Seq("id"),
        deleteWhere = Some((sess, predicateSql) =>
          graft.sources.DeltaWrite.deleteWhere(sess, d, predicateSql))))
    try {
      spark.sql("""CREATE OR REPLACE TEMPORARY VIEW gw_mdel_src AS
        |SELECT * FROM VALUES
        |  (1L, 0.0, 'del'), (2L, 99.0, 'upd'), (9L, 9.0, 'ins')
        |AS t(id, bal, op)""".stripMargin)
      spark.sql(
        """MERGE INTO gw_mdel AS DBT_INTERNAL_DEST
          |USING gw_mdel_src AS DBT_INTERNAL_SOURCE
          |ON DBT_INTERNAL_DEST.id = DBT_INTERNAL_SOURCE.id
          |WHEN MATCHED AND DBT_INTERNAL_SOURCE.op = 'del' THEN DELETE
          |WHEN MATCHED THEN UPDATE SET bal = DBT_INTERNAL_SOURCE.bal
          |WHEN NOT MATCHED THEN INSERT (id, bal)
          |  VALUES (DBT_INTERNAL_SOURCE.id, DBT_INTERNAL_SOURCE.bal)
          |""".stripMargin).collect()
      val got = graft.sources.DeltaRead.readDeltaTable(spark, d)
        .orderBy("id").as[(Long, Double)].collect().toSeq
      assert(got == Seq((2L, 99.0), (3L, 30.0), (4L, 40.0), (9L, 9.0)),
        got.toString)
      // the delete leg was a DV commit: every pre-merge data file is
      // byte-identical (the update/insert legs add rewrite+upsert
      // files but never touch the deleted row's file in place)
      val after = dataFiles()
      // id 1's file was rewritten only if id 2 shared it; the DELETE
      // itself must not rewrite — assert the DV path ran by checking
      // a deletion-vector file exists
      assert(java.nio.file.Files.list(java.nio.file.Paths.get(d))
        .filter(f => f.getFileName.toString.startsWith("deletion_vector")
          || f.getFileName.toString.endsWith(".bin")).count() >= 1 ||
        after.keys.exists(_.contains("deletion")),
        s"no deletion-vector artifact written: ${after.keys.toSeq}")
      before.keys.foreach(f => assert(
        after.get(f).exists(_.sameElements(before(f))),
        s"pre-merge data file $f was rewritten or removed in place"))
      // update+delete hitting ONE key (two source rows) refuses as
      // SQL MERGE's cardinality violation
      spark.sql("""CREATE OR REPLACE TEMPORARY VIEW gw_mdel_src2 AS
        |SELECT * FROM VALUES (3L, 0.0, 'del'), (3L, 7.0, 'upd')
        |AS t(id, bal, op)""".stripMargin)
      val e = intercept[Exception](spark.sql(
        """MERGE INTO gw_mdel AS DBT_INTERNAL_DEST
          |USING gw_mdel_src2 AS DBT_INTERNAL_SOURCE
          |ON DBT_INTERNAL_DEST.id = DBT_INTERNAL_SOURCE.id
          |WHEN MATCHED AND DBT_INTERNAL_SOURCE.op = 'del' THEN DELETE
          |WHEN MATCHED THEN UPDATE SET bal = DBT_INTERNAL_SOURCE.bal
          |""".stripMargin).collect())
      assert(e.getMessage.contains("deleted and updated") ||
        e.getMessage.contains("cardinality"), e.getMessage)
      // without a delete capability the statement is NOT routed:
      // Spark's own loud unsupported error, never a partial merge
      graft.gateway.DmlRoutes.unregister("gw_mdel")
      val e2 = intercept[Exception](spark.sql(
        """MERGE INTO gw_mdel AS DBT_INTERNAL_DEST
          |USING gw_mdel_src AS DBT_INTERNAL_SOURCE
          |ON DBT_INTERNAL_DEST.id = DBT_INTERNAL_SOURCE.id
          |WHEN MATCHED AND DBT_INTERNAL_SOURCE.op = 'del' THEN DELETE
          |WHEN MATCHED THEN UPDATE SET bal = DBT_INTERNAL_SOURCE.bal
          |""".stripMargin).collect())
      assert(!e2.getMessage.contains("deleted and updated"), e2.getMessage)
    } finally {
      graft.gateway.MergeRoutes.unregister("gw_mdel")
      graft.gateway.DmlRoutes.unregister("gw_mdel")
      spark.catalog.dropTempView("gw_mdel")
      spark.catalog.dropTempView("gw_mdel_src")
      spark.catalog.dropTempView("gw_mdel_src2")
    }
  }

  test("dbt on_schema_change=append_new_columns over Thrift: the " +
      "ALTER TABLE ADD COLUMNS + merge transcript widens the Delta " +
      "schema (metaData-only commit) and old rows read NULL in the " +
      "new column") {
    import graft.pipeline.{Materialization, Model, PipelineRunner, PipelineSpec}
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("/root/repo/target/scratch-test"))
    val wh = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target/scratch-test"),
      "thrift_evo_wh").toString
    val spec = PipelineSpec(models = Seq(
      Model("gw_evo", Nil, Materialization.IncrementalMerge(Seq("id")),
        (sp, _) => { import sp.implicits._
          Seq((1L, 1.0), (2L, 2.0)).toDF("id", "bal") },
        fileFormat = "delta")))
    val runner = new PipelineRunner(spark, spec, wh)
    assert(runner.run(Seq("run")).success)
    val port = ThriftGateway.freePort()
    val srv = ThriftGateway.start(spark, port)
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      val conn = java.sql.DriverManager.getConnection(
        s"jdbc:hive2://127.0.0.1:$port", "dbt", "")
      try {
        val st = conn.createStatement()
        // the literal evolving-incremental statement sequence dbt
        // emits when the model's select grew a column
        graft.gateway.DbtTranscript.mergeEvolvingRun("gw_evo", "gw_evo",
          "select * from values (2L, 20.0, 'x'), (3L, 3.0, 'y') " +
            "as t(id, bal, note)",
          Seq("id"), Seq("note" -> "string"))
          .foreach(st.execute)
        // the widened state over the same wire: old row NULL in the
        // new column, merged rows carry it
        val rs = st.executeQuery(
          "SELECT id, bal, note FROM gw_evo ORDER BY id")
        val got = Iterator.continually(rs).takeWhile(_.next())
          .map(r => (r.getLong(1), r.getDouble(2),
            Option(r.getString(3)))).toSeq
        assert(got == Seq((1L, 1.0, None), (2L, 20.0, Some("x")),
          (3L, 3.0, Some("y"))), got.toString)
        // and through any Delta reader
        val schema = graft.sources.DeltaRead
          .readDeltaTable(spark, s"$wh/gw_evo").schema
        assert(schema.fieldNames.toSeq == Seq("id", "bal", "note"),
          schema.simpleString)
        // a second ALTER with an existing column refuses loudly
        val e = intercept[java.sql.SQLException](st.execute(
          "alter table gw_evo add columns (note string)"))
        assert(e.getMessage.contains("already exists"), e.getMessage)
      } finally conn.close()
    } finally {
      srv.close()
      runner.cleanup()
    }
  }

  test("dbt on_schema_change=sync_all_columns over Thrift: the ALTER " +
      "ADD + DROP COLUMNS + merge transcript lands on the engine's " +
      "schema evolution — stale column gone, new column carried") {
    import graft.pipeline.{Materialization, Model, PipelineRunner, PipelineSpec}
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("/root/repo/target/scratch-test"))
    val wh = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target/scratch-test"),
      "thrift_sync_wh").toString
    val spec = PipelineSpec(models = Seq(
      Model("gw_sync", Nil, Materialization.IncrementalMerge(Seq("id")),
        (sp, _) => { import sp.implicits._
          Seq((1L, 1.0, "old"), (2L, 2.0, "old")).toDF("id", "bal", "stale") },
        fileFormat = "delta")))
    val runner = new PipelineRunner(spark, spec, wh)
    assert(runner.run(Seq("run")).success)
    val port = ThriftGateway.freePort()
    val srv = ThriftGateway.start(spark, port)
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      val conn = java.sql.DriverManager.getConnection(
        s"jdbc:hive2://127.0.0.1:$port", "dbt", "")
      try {
        val st = conn.createStatement()
        // the model's select lost `stale` and grew `note`: dbt diffs
        // both ways and emits ADD + DROP before the merge
        graft.gateway.DbtTranscript.mergeSyncRun("gw_sync", "gw_sync",
          "select * from values (2L, 20.0, 'x'), (3L, 3.0, 'y') " +
            "as t(id, bal, note)",
          Seq("id"), newColumns = Seq("note" -> "string"),
          removedColumns = Seq("stale"))
          .foreach(st.execute)
        val rs = st.executeQuery(
          "SELECT id, bal, note FROM gw_sync ORDER BY id")
        val got = Iterator.continually(rs).takeWhile(_.next())
          .map(r => (r.getLong(1), r.getDouble(2),
            Option(r.getString(3)))).toSeq
        assert(got == Seq((1L, 1.0, None), (2L, 20.0, Some("x")),
          (3L, 3.0, Some("y"))), got.toString)
        val schema = graft.sources.DeltaRead
          .readDeltaTable(spark, s"$wh/gw_sync").schema
        assert(schema.fieldNames.toSeq == Seq("id", "bal", "note"),
          schema.simpleString)
        // dropping a partition/unknown column refuses loudly
        val e = intercept[java.sql.SQLException](st.execute(
          "alter table gw_sync drop columns (nope)"))
        assert(e.getMessage.contains("does not exist"), e.getMessage)
      } finally conn.close()
    } finally {
      srv.close()
      runner.cleanup()
    }
  }

  test("dbt snapshot FIRST RUN over Thrift: the verbatim `create " +
      "table ... using delta as` CTAS executes NATIVELY (the " +
      "writable delta source routes it into the engine's creation " +
      "commit — no writer replay), and the follow-up snapshot merge " +
      "lands SCD2 state any Delta reader sees") {
    import graft.gateway.{DbtTranscript => T}
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("/root/repo/target/scratch-test"))
    val wh = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target/scratch-test"),
      "thrift_ctas_wh").toString
    val port = ThriftGateway.freePort()
    val srv = ThriftGateway.start(spark, port)
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      val conn = java.sql.DriverManager.getConnection(
        s"jdbc:hive2://127.0.0.1:$port", "dbt", "")
      try {
        val st = conn.createStatement()
        st.execute(
          s"create database if not exists gwsnapdb location '$wh'")
        st.execute("""create or replace temporary view gw_snap_src as
          |select * from values
          |  (1, 'a', timestamp'2024-01-01 00:00:00'),
          |  (2, 'b', timestamp'2024-01-01 00:00:00')
          |as t(id, v, updated_at)""".stripMargin)
        // ---- first run: the ONE statement that used to need the
        // engine-side writer replay, now a native CTAS
        T.snapshotFirstRun("gwsnapdb.gw_snap",
          "select * from gw_snap_src", "id", "updated_at")
          .foreach(st.execute)
        assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(
          wh, "gw_snap", "_delta_log")),
          "native CTAS wrote no Delta log")
        val v0 = graft.sources.DeltaRead
          .readDeltaTable(spark, s"$wh/gw_snap")
        assert(v0.count() == 2, "first-run snapshot rows")
        assert(v0.columns.toSeq == Seq("id", "v", "updated_at",
          "dbt_scd_id", "dbt_updated_at", "dbt_valid_from",
          "dbt_valid_to"), v0.columns.toSeq.toString)
        // ---- update run: the verbatim conditioned merge, routed
        // onto the engine merge registered for the target
        graft.gateway.MergeRoutes.register("gw_snap",
          (sess, batch, keys) => graft.sources.DeltaWrite.merge(
            sess, s"$wh/gw_snap", batch, keys))
        try {
          st.execute("""create or replace temporary view gw_snap_src as
            |select * from values
            |  (1, 'a', timestamp'2024-01-01 00:00:00'),
            |  (2, 'B', timestamp'2024-06-01 00:00:00'),
            |  (3, 'c', timestamp'2024-06-01 00:00:00')
            |as t(id, v, updated_at)""".stripMargin)
          T.snapshotRun("gwsnapdb.gw_snap", "gw_snap",
            T.snapshotStagingSelect("gwsnapdb.gw_snap",
              "select * from gw_snap_src", "id", "updated_at"))
            .foreach(st.execute)
        } finally graft.gateway.MergeRoutes.unregister("gw_snap")
        // SCD2 state: id 1 untouched-current, id 2 closed + re-opened,
        // id 3 inserted-current
        val got = graft.sources.DeltaRead
          .readDeltaTable(spark, s"$wh/gw_snap")
          .selectExpr("id", "v", "cast(dbt_valid_from as string)",
            "cast(dbt_valid_to as string)")
          .orderBy("id", "dbt_valid_from")
          .collect().map(r => (r.getInt(0), r.getString(1),
            r.getString(2), Option(r.getString(3)))).toSeq
        assert(got == Seq(
          (1, "a", "2024-01-01 00:00:00", None),
          (2, "b", "2024-01-01 00:00:00", Some("2024-06-01 00:00:00")),
          (2, "B", "2024-06-01 00:00:00", None),
          (3, "c", "2024-06-01 00:00:00", None)), got.toString)
        // and the same state over the wire
        val rs = st.executeQuery(
          "select count(*) from gwsnapdb.gw_snap where dbt_valid_to is null")
        rs.next()
        assert(rs.getLong(1) == 3L, "current rows over jdbc")
      } finally conn.close()
    } finally srv.close()
  }

  test("CREATE OR REPLACE TABLE ... USING delta|iceberg AS over " +
      "Thrift: the dbt lakehouse table-rebuild statement executes " +
      "through the parser-routed atomic replace (ONE commit per " +
      "run, no DROP window), prior versions stay time-travelable, " +
      "and REPLACE TABLE on a missing table refuses") {
    import graft.gateway.{DbtTranscript => T}
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("/root/repo/target/scratch-test"))
    val wh = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target/scratch-test"),
      "thrift_cor_wh").toString
    val port = ThriftGateway.freePort()
    val srv = ThriftGateway.start(spark, port)
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      val conn = java.sql.DriverManager.getConnection(
        s"jdbc:hive2://127.0.0.1:$port", "dbt", "")
      try {
        val st = conn.createStatement()
        st.execute(s"create database if not exists gwcordb location '$wh'")
        // ---- run 1 creates (OR CREATE semantics), run 2 rebuilds
        T.tableRunLakehouse("gwcordb", "gw_cor",
          "select * from values (1L, 'a'), (2L, 'b') as t(id, v)",
          "delta").foreach(st.execute)
        T.tableRunLakehouse("gwcordb", "gw_cor",
          "select * from values (2L, 'B'), (3L, 'c'), (4L, 'd') " +
            "as t(id, v)", "delta").foreach(st.execute)
        val rs = st.executeQuery(
          "select id, v from gwcordb.gw_cor order by id")
        val got = Iterator.continually(rs).takeWhile(_.next())
          .map(r => (r.getLong(1), r.getString(2))).toSeq
        assert(got == Seq((2L, "B"), (3L, "c"), (4L, "d")), got.toString)
        // ONE commit per run: versions 0 and 1, both readable — the
        // replace protocol kept run 1's state time-travelable
        assert(graft.sources.DeltaRead.readDeltaTable(spark,
          s"$wh/gw_cor", versionAsOf = Some(0L)).orderBy("id")
          .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
          Seq((1L, "a"), (2L, "b")), "version 0 not time-travelable")
        // ... and through the SQL spelling OVER THE WIRE (the
        // parser's catalog time-travel route — Spark alone throws
        // UNSUPPORTED_FEATURE.TIME_TRAVEL on v1 catalog tables)
        val rsTt = st.executeQuery(
          "select id, v from gwcordb.gw_cor version as of 0 order by id")
        val gotTt = Iterator.continually(rsTt).takeWhile(_.next())
          .map(r => (r.getLong(1), r.getString(2))).toSeq
        assert(gotTt == Seq((1L, "a"), (2L, "b")), gotTt.toString)
        // an unknown version refuses loudly, never a current read
        val eTt = intercept[java.sql.SQLException](st.executeQuery(
          "select id from gwcordb.gw_cor version as of 9"))
        assert(eTt.getMessage != null)
        // ---- iceberg, partitioned: identity spec + per-partition
        // files through the same parser route
        T.tableRunLakehouse("gwcordb", "gw_cor_ice",
          "select * from values (1L, 'x', 1.0), (2L, 'y', 2.0) " +
            "as t(id, seg, bal)", "iceberg")
          .map(_.replace("using iceberg",
            "using iceberg partitioned by (seg)"))
          .foreach(st.execute)
        T.tableRunLakehouse("gwcordb", "gw_cor_ice",
          "select * from values (3L, 'x', 3.0) as t(id, seg, bal)",
          "iceberg")
          .map(_.replace("using iceberg",
            "using iceberg partitioned by (seg)"))
          .foreach(st.execute)
        val rs2 = st.executeQuery(
          "select id, seg, bal from gwcordb.gw_cor_ice order by id")
        val got2 = Iterator.continually(rs2).takeWhile(_.next())
          .map(r => (r.getLong(1), r.getString(2), r.getDouble(3))).toSeq
        assert(got2 == Seq((3L, "x", 3.0)), got2.toString)
        assert(graft.sources.IcebergRead.tablePartitionCols(
          s"$wh/gw_cor_ice") == Seq("seg"),
          "iceberg COR lost the partition spec")
        // prior snapshot stays readable
        assert(graft.sources.IcebergRead.readIcebergTable(spark,
          s"$wh/gw_cor_ice", snapshotId = Some(1L)).count() == 2L,
          "iceberg snapshot 1 not time-travelable")
        // ---- plain REPLACE TABLE on a missing table refuses (SQL's
        // contract), and nothing is created
        val e = intercept[java.sql.SQLException](st.execute(
          "replace table gwcordb.gw_missing using delta as select 1 as id"))
        assert(e.getMessage.contains("does not exist"), e.getMessage)
        assert(!java.nio.file.Files.exists(
          java.nio.file.Paths.get(wh, "gw_missing")),
          "refused REPLACE TABLE still wrote data")
      } finally conn.close()
    } finally srv.close()
  }

  test("MERGE matched-DELETE leg FUSED: delete + update + insert land " +
      "in ONE Delta commit (SQL MERGE atomicity), the delete-only " +
      "file is DV-masked byte-identical, and a delete-only merge " +
      "also commits once") {
    import org.apache.spark.sql.{DataFrame, SparkSession}
    import spark.implicits._
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("/root/repo/target/scratch-test"))
    val d = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target/scratch-test"),
      "merge_del_fused").toString
    graft.sources.DeltaWrite.merge(spark, d,
      (1L to 8L).map(i => (i, i * 10.0)).toDF("id", "bal"),
      Seq("id"), buckets = 2)
    // pick the delete key and the update key from DIFFERENT data
    // files, so the delete-only file must survive byte-identical
    val perFile: Map[String, Seq[Long]] = {
      val w = java.nio.file.Files.list(java.nio.file.Paths.get(d))
      try {
        import scala.jdk.CollectionConverters._
        w.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(p => p.getFileName.toString ->
            spark.read.parquet(p.toString).select("id")
              .as[Long].collect().toSeq)
          .toMap
      } finally w.close()
    }
    assert(perFile.size >= 2, s"want >=2 files, got ${perFile.keys}")
    val fileSeq = perFile.toSeq.sortBy(_._1)
    val delId = fileSeq.head._2.min
    val updId = fileSeq(1)._2.min
    val delFile = fileSeq.head._1
    def bytesOf(rel: String): Array[Byte] =
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(d, rel))
    val delFileBefore = bytesOf(delFile)
    def logVersion(): Long = {
      val w = java.nio.file.Files.list(
        java.nio.file.Paths.get(d, "_delta_log"))
      try {
        import scala.jdk.CollectionConverters._
        w.iterator().asScala.map(_.getFileName.toString)
          .filter(_.endsWith(".json"))
          .map(_.stripSuffix(".json").toLong).max
      } finally w.close()
    }
    graft.sources.DeltaRead.readDeltaTable(spark, d)
      .createOrReplaceTempView("gw_mdel_f")
    graft.gateway.MergeRoutes.register("gw_mdel_f",
      new graft.gateway.MergeRoutes.Handler {
        override def apply(sess: SparkSession, batch: DataFrame,
            keys: Seq[String]): Long =
          graft.sources.DeltaWrite.merge(sess, d, batch, keys)
        override def supportsMergeDelete: Boolean = true
        override def mergeWithDelete(sess: SparkSession,
            batch: DataFrame, keys: Seq[String],
            deletePredicateSql: String): Long =
          graft.sources.DeltaWrite.merge(sess, d, batch, keys,
            deletePredicate = Some(deletePredicateSql))
      })
    try {
      spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW gw_mdel_f_src AS
        |SELECT * FROM VALUES
        |  (${delId}L, 0.0, 'del'), (${updId}L, 99.0, 'upd'),
        |  (90L, 9.0, 'ins')
        |AS t(id, bal, op)""".stripMargin)
      assert(logVersion() == 0L)
      val affected = spark.sql(
        """MERGE INTO gw_mdel_f AS DBT_INTERNAL_DEST
          |USING gw_mdel_f_src AS DBT_INTERNAL_SOURCE
          |ON DBT_INTERNAL_DEST.id = DBT_INTERNAL_SOURCE.id
          |WHEN MATCHED AND DBT_INTERNAL_SOURCE.op = 'del' THEN DELETE
          |WHEN MATCHED THEN UPDATE SET bal = DBT_INTERNAL_SOURCE.bal
          |WHEN NOT MATCHED THEN INSERT (id, bal)
          |  VALUES (DBT_INTERNAL_SOURCE.id, DBT_INTERNAL_SOURCE.bal)
          |""".stripMargin).collect()
      // the WHOLE statement was ONE commit — no intermediate version
      assert(logVersion() == 1L,
        s"expected one commit, log at ${logVersion()}")
      assert(affected.head.getLong(0) == 3L, affected.toSeq.toString)
      val got = graft.sources.DeltaRead.readDeltaTable(spark, d)
        .orderBy("id").as[(Long, Double)].collect().toSeq
      val want = ((1L to 8L).filterNot(_ == delId).map(i =>
        (i, if (i == updId) 99.0 else i * 10.0)) :+ (90L, 9.0))
        .sortBy(_._1)
      assert(got == want, s"$got vs $want")
      // the deleted row's file was DV-masked, never rewritten
      assert(bytesOf(delFile).sameElements(delFileBefore),
        s"delete-only file $delFile was rewritten")
      assert({
        val w = java.nio.file.Files.list(java.nio.file.Paths.get(d))
        try {
          import scala.jdk.CollectionConverters._
          w.iterator().asScala.exists(
            _.getFileName.toString.startsWith("deletion_vector"))
        } finally w.close()
      }, "no deletion-vector file written by the fused commit")
      // a DELETE-ONLY merge (no update/insert leg) also fuses: one
      // commit, empty upsert batch
      spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW gw_mdel_f_src2 AS
        |SELECT * FROM VALUES (${updId}L, 0.0, 'del')
        |AS t(id, bal, op)""".stripMargin)
      val affected2 = spark.sql(
        """MERGE INTO gw_mdel_f AS DBT_INTERNAL_DEST
          |USING gw_mdel_f_src2 AS DBT_INTERNAL_SOURCE
          |ON DBT_INTERNAL_DEST.id = DBT_INTERNAL_SOURCE.id
          |WHEN MATCHED AND DBT_INTERNAL_SOURCE.op = 'del' THEN DELETE
          |""".stripMargin).collect()
      assert(logVersion() == 2L)
      assert(affected2.head.getLong(0) == 1L, affected2.toSeq.toString)
      val got2 = graft.sources.DeltaRead.readDeltaTable(spark, d)
        .orderBy("id").as[(Long, Double)].collect().toSeq
      assert(got2 == want.filterNot(_._1 == updId), got2.toString)
    } finally {
      graft.gateway.MergeRoutes.unregister("gw_mdel_f")
      spark.catalog.dropTempView("gw_mdel_f")
      spark.catalog.dropTempView("gw_mdel_f_src")
      spark.catalog.dropTempView("gw_mdel_f_src2")
    }
  }

  test("NOT MATCHED BY SOURCE guards: a source-referencing condition " +
      "or value stays unrouted (SQL's visibility rule), a key " +
      "assignment stays unrouted, and a by-source DELETE without " +
      "delete capability stays loud") {
    import spark.implicits._
    Seq((1L, 1.0), (2L, 2.0)).toDF("id", "bal")
      .createOrReplaceTempView("gw_nmbs")
    Seq((1L, 9.0)).toDF("id", "bal")
      .createOrReplaceTempView("gw_nmbs_src")
    graft.gateway.MergeRoutes.register("gw_nmbs",
      (_, _, _) => sys.error("must not route"))
    try {
      // by-source condition referencing the SOURCE side: unroutable
      val e1 = intercept[Exception](spark.sql(
        """MERGE INTO gw_nmbs AS T USING gw_nmbs_src AS S ON T.id = S.id
          |WHEN NOT MATCHED BY SOURCE AND S.bal > 0 THEN DELETE
          |""".stripMargin).collect())
      assert(!e1.getMessage.contains("must not route"), e1.getMessage)
      // by-source UPDATE assigning the key column: unroutable
      val e2 = intercept[Exception](spark.sql(
        """MERGE INTO gw_nmbs AS T USING gw_nmbs_src AS S ON T.id = S.id
          |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET id = id + 1
          |""".stripMargin).collect())
      assert(!e2.getMessage.contains("must not route"), e2.getMessage)
      // by-source DELETE against a handler with neither fused delete
      // nor a DmlRoutes deleteWhere: unroutable, Spark's loud error
      val e3 = intercept[Exception](spark.sql(
        """MERGE INTO gw_nmbs AS T USING gw_nmbs_src AS S ON T.id = S.id
          |WHEN NOT MATCHED BY SOURCE THEN DELETE
          |""".stripMargin).collect())
      assert(!e3.getMessage.contains("must not route"), e3.getMessage)
      // a by-source UPDATE with target-only expressions DOES route
      var routedBatch: Option[Seq[(Long, Double)]] = None
      graft.gateway.MergeRoutes.register("gw_nmbs",
        (_, batch, _) => {
          routedBatch = Some(batch.orderBy("id")
            .as[(Long, Double)].collect().toSeq)
          batch.count()
        })
      spark.sql(
        """MERGE INTO gw_nmbs AS T USING gw_nmbs_src AS S ON T.id = S.id
          |WHEN NOT MATCHED BY SOURCE AND T.bal < 10 THEN
          |  UPDATE SET bal = T.bal * 100
          |""".stripMargin).collect()
      assert(routedBatch.contains(Seq((2L, 200.0))), routedBatch.toString)
    } finally {
      graft.gateway.MergeRoutes.unregister("gw_nmbs")
      spark.catalog.dropTempView("gw_nmbs")
      spark.catalog.dropTempView("gw_nmbs_src")
    }
  }

  test("NOT MATCHED BY SOURCE refuses NULL-keyed target rows loudly: " +
      "a by-source DELETE's IN predicate and a by-source UPDATE's " +
      "anti-join both mishandle NULL keys — never a silent survive " +
      "or duplicate") {
    spark.sql("SELECT * FROM VALUES (CAST(1 AS BIGINT), 1.0), " +
      "(CAST(NULL AS BIGINT), 5.0) AS t(id, bal)")
      .createOrReplaceTempView("gw_nmbs_null")
    spark.sql("SELECT * FROM VALUES (CAST(1 AS BIGINT), 9.0) " +
      "AS t(id, bal)").createOrReplaceTempView("gw_nmbs_null_src")
    graft.gateway.MergeRoutes.register("gw_nmbs_null",
      new graft.gateway.MergeRoutes.Handler {
        override def apply(sess: org.apache.spark.sql.SparkSession,
            batch: org.apache.spark.sql.DataFrame,
            keys: Seq[String]): Long = sys.error("must not execute")
        override def supportsMergeDelete: Boolean = true
        override def mergeWithDelete(
            sess: org.apache.spark.sql.SparkSession,
            batch: org.apache.spark.sql.DataFrame, keys: Seq[String],
            deletePredicateSql: String): Long =
          sys.error("must not execute")
      })
    try {
      val e1 = intercept[Exception](spark.sql(
        """MERGE INTO gw_nmbs_null AS T USING gw_nmbs_null_src AS S
          |ON T.id = S.id
          |WHEN NOT MATCHED BY SOURCE THEN DELETE
          |""".stripMargin).collect())
      assert(e1.getMessage.contains("NULL unique-key"), e1.getMessage)
      val e2 = intercept[Exception](spark.sql(
        """MERGE INTO gw_nmbs_null AS T USING gw_nmbs_null_src AS S
          |ON T.id = S.id
          |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET bal = 0.0
          |""".stripMargin).collect())
      assert(e2.getMessage.contains("NULL unique-key"), e2.getMessage)
      // a CONDITION that excludes the NULL-keyed row lets the
      // statement route normally (the refusal is about CLASSIFIED
      // rows, not the target's contents)
      var routed = false
      graft.gateway.MergeRoutes.register("gw_nmbs_null",
        (_, batch, _) => { routed = true; batch.count() })
      spark.sql(
        """MERGE INTO gw_nmbs_null AS T USING gw_nmbs_null_src AS S
          |ON T.id = S.id
          |WHEN NOT MATCHED BY SOURCE AND T.id IS NOT NULL THEN
          |  UPDATE SET bal = 0.0
          |""".stripMargin).collect()
      assert(routed, "condition-guarded by-source update must route")
    } finally {
      graft.gateway.MergeRoutes.unregister("gw_nmbs_null")
      spark.catalog.dropTempView("gw_nmbs_null")
      spark.catalog.dropTempView("gw_nmbs_null_src")
    }
  }

  test("degenerate ON t.k = t.k (both sides the target) is NOT a key " +
      "equality: the statement stays unrouted with Spark's loud " +
      "error, on the star shape and the conditional shape") {
    import spark.implicits._
    Seq((1L, 1.0), (2L, 2.0)).toDF("id", "bal")
      .createOrReplaceTempView("gw_selfk")
    Seq((1L, 9.0), (3L, 3.0)).toDF("id", "bal")
      .createOrReplaceTempView("gw_selfk_src")
    graft.gateway.MergeRoutes.register("gw_selfk",
      (_, _, _) => sys.error("must not route"))
    try {
      // star shape: ON references the TARGET column on both sides —
      // match-everything SQL, not an upsert key
      val e = intercept[Exception](spark.sql(
        """MERGE INTO gw_selfk AS DBT_INTERNAL_DEST
          |USING gw_selfk_src AS DBT_INTERNAL_SOURCE
          |ON DBT_INTERNAL_DEST.id = DBT_INTERNAL_DEST.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect())
      assert(!e.getMessage.contains("must not route"), e.getMessage)
      // conditional shape: same degenerate ON, explicit assignments
      val e2 = intercept[Exception](spark.sql(
        """MERGE INTO gw_selfk AS DBT_INTERNAL_DEST
          |USING gw_selfk_src AS DBT_INTERNAL_SOURCE
          |ON DBT_INTERNAL_DEST.id = DBT_INTERNAL_DEST.id
          |WHEN MATCHED THEN UPDATE SET bal = DBT_INTERNAL_SOURCE.bal
          |""".stripMargin).collect())
      assert(!e2.getMessage.contains("must not route"), e2.getMessage)
      // and the real dbt shape STILL routes (the side check does not
      // over-reject): source-left order like dbt snapshots
      var routed = false
      graft.gateway.MergeRoutes.register("gw_selfk",
        (_, _, _) => { routed = true; 0L })
      spark.sql(
        """MERGE INTO gw_selfk AS DBT_INTERNAL_DEST
          |USING gw_selfk_src AS DBT_INTERNAL_SOURCE
          |ON DBT_INTERNAL_SOURCE.id = DBT_INTERNAL_DEST.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
      assert(routed, "source-left key equality must still route")
    } finally {
      graft.gateway.MergeRoutes.unregister("gw_selfk")
      spark.catalog.dropTempView("gw_selfk")
      spark.catalog.dropTempView("gw_selfk_src")
    }
  }
}
