package graft.queries

import graft.{QueryGroup, Tables}
import graft.Tables.{dec2, asDouble}
import graft.pipeline._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.10 — the dbt-semantics layer, which is the reference's
  * only declared surface (`dbtoperator.py:35,273-274,334,488-491`):
  * materializations, incremental strategies, SCD2 snapshots, generic
  * data tests, DAG selection, source freshness. Each key drives the
  * real `PipelineRunner` against a scratch warehouse and returns the
  * resulting table, with a batch-equivalent DuckDB oracle computing
  * the expected *final state* directly from the raw tables — so the
  * runner's multi-step behavior (high-water marks, partition
  * replacement, merge, interval maintenance) is hash-checked, not
  * just row-counted.
  */
object PipelineOps extends QueryGroup {

  /** Scratch warehouse under target/ (inside the repo, git-ignored),
    * deleted at JVM exit so repeated Verify/Bench runs don't
    * accumulate dead parquet.
    */
  private def freshWh(key: String): String = {
    val base = java.nio.file.Paths.get("/root/repo/target/scratch")
    java.nio.file.Files.createDirectories(base)
    val dir = java.nio.file.Files.createTempDirectory(base, key)
    sys.addShutdownHook {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(dir)
      val all = try s.iterator().asScala.toSeq finally s.close()
      all.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
    dir.toString
  }

  private def mustSucceed(r: RunResult): Unit =
    require(r.success, r.results.flatMap(_.error).mkString("; "))

  override def queries: Map[String, Q] = Map(
    // ---- materializations -------------------------------------------------
    "mat_table" -> ((s, d) => {
      val spec = PipelineSpec(Seq(Model("mt_cust_seg", Nil, Materialization.Table,
        (sp, _) => Tables.customer(sp, d).groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"),
            asDouble(sum(dec2(col("c_acctbal")))).as("sum_bal")))))
      val r = new PipelineRunner(s, spec, freshWh("mat_table"))
      mustSucceed(r.run(Seq("run")))
      r.readTable("mt_cust_seg").orderBy("c_mktsegment")
    }),

    "mat_view" -> ((s, d) => {
      val spec = PipelineSpec(Seq(Model("mv_recent", Nil, Materialization.View,
        (sp, _) => Tables.orders(sp, d)
          .filter(col("o_orderdate") >= lit("1997-01-01").cast(TimestampType))
          .select("o_orderkey", "o_custkey", "o_totalprice"))))
      val r = new PipelineRunner(s, spec, freshWh("mat_view"))
      mustSucceed(r.run(Seq("run")))
      s.table("mv_recent").orderBy("o_orderkey")
    }),

    "mat_ephemeral" -> ((s, d) => {
      val spec = PipelineSpec(Seq(
        Model("me_ord", Nil, Materialization.Ephemeral,
          (sp, _) => Tables.orders(sp, d).join(Tables.customer(sp, d),
            col("o_custkey") === col("c_custkey"))),
        Model("me_seg_sales", Seq("me_ord"), Materialization.Table,
          (_, in) => in("me_ord").groupBy("c_mktsegment")
            .agg(count(lit(1)).as("n"),
              asDouble(sum(dec2(col("o_totalprice")))).as("sum_sales")))))
      val r = new PipelineRunner(s, spec, freshWh("mat_ephemeral"))
      mustSucceed(r.run(Seq("run")))
      r.readTable("me_seg_sales").orderBy("c_mktsegment")
    }),

    // Two runs against the same warehouse: the second batch widens the
    // date cut, and only rows past the first batch's high-water mark
    // are appended — final state must equal one clean load.
    "mat_incremental_append" -> ((s, d) => {
      val wh = freshWh("mat_incremental_append")
      def spec(cut: String) = PipelineSpec(Seq(Model("mia_orders", Nil,
        Materialization.IncrementalAppend("o_orderdate"),
        (sp, _) => Tables.orders(sp, d)
          .filter(col("o_orderdate") < lit(cut).cast(TimestampType))
          .select("o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice", "o_orderdate"))))
      mustSucceed(new PipelineRunner(s, spec("1997-01-01"), wh).run(Seq("run")))
      val r2 = new PipelineRunner(s, spec("1998-01-01"), wh)
      mustSucceed(r2.run(Seq("run")))
      r2.readTable("mia_orders").orderBy("o_orderkey")
    }),

    // Batch 1 loads every status at ver=1; batch 2 recomputes only the
    // 'O' partition at ver=2 — insert_overwrite must replace exactly
    // that partition and keep the others.
    "mat_incremental_insert_overwrite" -> ((s, d) => {
      val wh = freshWh("mat_incremental_insert_overwrite")
      def spec(ver: Int, only: Option[String]) = PipelineSpec(Seq(Model(
        "mio_orders", Nil,
        Materialization.IncrementalInsertOverwrite(Seq("o_orderstatus")),
        (sp, _) => {
          val base = Tables.orders(sp, d)
            .select(col("o_orderkey"), col("o_orderstatus"))
            .withColumn("ver", lit(ver))
          only.map(st => base.filter(col("o_orderstatus") === st)).getOrElse(base)
        })))
      mustSucceed(new PipelineRunner(s, spec(1, None), wh).run(Seq("run")))
      val r2 = new PipelineRunner(s, spec(2, Some("O")), wh)
      mustSucceed(r2.run(Seq("run")))
      r2.readTable("mio_orders")
        .select("o_orderkey", "o_orderstatus", "ver")
        .orderBy("o_orderkey")
    }),

    // Batch 1 zeroes every balance; batch 2 upserts real balances for
    // custkey % 3 = 0 — merge must keep batch-1 rows for the rest.
    "mat_incremental_merge" -> ((s, d) => {
      val wh = freshWh("mat_incremental_merge")
      def spec(build: SparkSession => DataFrame) = PipelineSpec(Seq(Model(
        "mim_cust", Nil, Materialization.IncrementalMerge(Seq("c_custkey")),
        (sp, _) => build(sp))))
      mustSucceed(new PipelineRunner(s,
        spec(sp => Tables.customer(sp, d)
          .select(col("c_custkey"), col("c_mktsegment"), lit(0.0).as("bal"))),
        wh).run(Seq("run")))
      val r2 = new PipelineRunner(s,
        spec(sp => Tables.customer(sp, d)
          .filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey"), col("c_mktsegment"),
            col("c_acctbal").as("bal"))), wh)
      mustSucceed(r2.run(Seq("run")))
      r2.readTable("mim_cust").orderBy("c_custkey")
    }),

    // MERGE-ON-READ variant of the same scenario: batch 2 APPENDS its
    // upsert as a versioned member (zero base files rewritten —
    // spec-asserted) and the READ reconciles latest-version-wins, so
    // the oracle-checked final state must equal copy-on-write merge's.
    "mat_incremental_merge_on_read" -> ((s, d) => {
      val wh = freshWh("mat_inc_mor")
      def spec(build: SparkSession => DataFrame) = PipelineSpec(Seq(Model(
        "mor_cust", Nil,
        Materialization.IncrementalMergeOnRead(Seq("c_custkey")),
        (sp, _) => build(sp))))
      mustSucceed(new PipelineRunner(s,
        spec(sp => Tables.customer(sp, d)
          .select(col("c_custkey"), col("c_mktsegment"), lit(0.0).as("bal"))),
        wh).run(Seq("run")))
      val r2 = new PipelineRunner(s,
        spec(sp => Tables.customer(sp, d)
          .filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey"), col("c_mktsegment"),
            col("c_acctbal").as("bal"))), wh)
      mustSucceed(r2.run(Seq("run")))
      r2.readTable("mor_cust").orderBy("c_custkey")
    }),

    // CDC ingestion onto the MoR table: batch 2 is a Debezium-style
    // change feed — upserts AND tombstones (is_deleted=true) in one
    // batch. Deleted keys disappear from reads; the flag column is
    // consumed, never part of the surface. Oracle states the net
    // final state directly over customer.
    "mat_merge_on_read_cdc" -> ((s, d) => {
      val wh = freshWh("mat_mor_cdc")
      def spec(build: SparkSession => DataFrame) = PipelineSpec(Seq(Model(
        "cdc_cust", Nil,
        Materialization.IncrementalMergeOnRead(Seq("c_custkey"),
          deleteCol = Some("is_deleted")),
        (sp, _) => build(sp))))
      mustSucceed(new PipelineRunner(s,
        spec(sp => Tables.customer(sp, d)
          .select(col("c_custkey"), col("c_mktsegment"),
            col("c_acctbal").as("bal"))
          .withColumn("is_deleted", lit(false))), wh).run(Seq("run")))
      val r2 = new PipelineRunner(s, spec(sp => {
        val c = Tables.customer(sp, d)
        val ups = c
          .filter(col("c_custkey") % 3 === 0 && col("c_custkey") % 10 =!= 0)
          .select(col("c_custkey"), col("c_mktsegment"),
            lit(0.0).as("bal"), lit(false).as("is_deleted"))
        val dels = c.filter(col("c_custkey") % 10 === 0)
          .select(col("c_custkey"), col("c_mktsegment"),
            lit(null).cast(DoubleType).as("bal"),
            lit(true).as("is_deleted"))
        ups.unionByName(dels)
      }), wh)
      mustSucceed(r2.run(Seq("run")))
      r2.readTable("cdc_cust").orderBy("c_custkey")
    }),

    // Merge composed with a user partition column (the 100 TB shape:
    // storage is o_orderstatus=…/__gbucket=…, so a delta confined to
    // one status rewrites only that partition's touched buckets, never
    // the whole bucket space). Batch 1 loads all orders at ver=1;
    // batch 2 upserts only status-'O' rows at ver=2.
    "mat_incremental_merge_partitioned" -> ((s, d) => {
      val wh = freshWh("mat_incremental_merge_part")
      def spec(build: SparkSession => DataFrame) = PipelineSpec(Seq(Model(
        "mimp_ord", Nil,
        Materialization.IncrementalMerge(Seq("o_orderkey"), buckets = 8,
          partitionBy = Seq("o_orderstatus")),
        (sp, _) => build(sp))))
      mustSucceed(new PipelineRunner(s,
        spec(sp => Tables.orders(sp, d)
          .select(col("o_orderkey"), col("o_orderstatus"),
            lit(1).as("ver"))), wh).run(Seq("run")))
      val r2 = new PipelineRunner(s,
        spec(sp => Tables.orders(sp, d)
          .filter(col("o_orderstatus") === "O")
          .select(col("o_orderkey"), col("o_orderstatus"),
            lit(2).as("ver"))), wh)
      mustSucceed(r2.run(Seq("run")))
      r2.readTable("mimp_ord")
        .select("o_orderkey", "o_orderstatus", "ver")
        .orderBy("o_orderkey")
    }),

    // ---- snapshots --------------------------------------------------------
    // Two `snapshot --at` command runs against the same warehouse with
    // a deterministic segment change for custkey % 5 = 0 between them;
    // the oracle states the full SCD2 history (closed v1 rows + open
    // v2 rows) directly. Exercises the runner's command loop AND the
    // persisted-history round-trip, not just the scd2 function.
    "snapshot_scd2" -> ((s, d) => {
      val wh = freshWh("snapshot_scd2")
      def spec(mutate: Boolean) = PipelineSpec(
        models = Seq(Model("cust_dim", Nil, Materialization.Table,
          (sp, _) => Tables.customer(sp, d).select(col("c_custkey"),
            (if (mutate)
              when(col("c_custkey") % 5 === 0, lit("MOVED"))
                .otherwise(col("c_mktsegment"))
            else col("c_mktsegment")).as("seg")))),
        snapshots = Seq(SnapshotDef("cust_snap", "cust_dim",
          Seq("c_custkey"), Seq("seg"))))
      mustSucceed(new PipelineRunner(s, spec(mutate = false), wh)
        .run(Seq("run", "snapshot --at 2024-01-01T00:00:00")))
      val r2 = new PipelineRunner(s, spec(mutate = true), wh)
      mustSucceed(r2.run(Seq("run", "snapshot --at 2024-02-01T00:00:00")))
      r2.readTable("cust_snap").orderBy("c_custkey", "valid_from")
    }),

    // SCD2 TEMPORAL JOIN — the pattern snapshots exist FOR: each fact
    // row joins the dimension version valid AT ITS OWN event time
    // (equi on the key + validity-range residual: still a hash join,
    // the range is a post-probe filter, never a BNLJ). Events before
    // the second cut see segment v1; later ones see the MOVED v2.
    "q_scd2_temporal_join" -> ((s, d) => {
      val wh = freshWh("scd2_tjoin")
      def spec(mutate: Boolean) = PipelineSpec(
        models = Seq(Model("cust_dim", Nil, Materialization.Table,
          (sp, _) => Tables.customer(sp, d).select(col("c_custkey"),
            (if (mutate)
              when(col("c_custkey") % 5 === 0, lit("MOVED"))
                .otherwise(col("c_mktsegment"))
            else col("c_mktsegment")).as("seg")))),
        snapshots = Seq(SnapshotDef("cust_snap", "cust_dim",
          Seq("c_custkey"), Seq("seg"))))
      mustSucceed(new PipelineRunner(s, spec(mutate = false), wh)
        .run(Seq("run", "snapshot --at 2024-01-01T00:00:00")))
      val r2 = new PipelineRunner(s, spec(mutate = true), wh)
      mustSucceed(r2.run(Seq("run", "snapshot --at 2024-01-15T00:00:00")))
      val dim = r2.readTable("cust_snap")
      Tables.events(s, d)
        .join(dim, col("user_id") === col("c_custkey") &&
          col("valid_from") <= col("ts") &&
          (col("valid_to").isNull || col("ts") < col("valid_to")))
        .groupBy("seg")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("seg")
    }),

    // dbt's TIMESTAMP (updated_at) strategy: per-customer rolling
    // state (latest order date + order count) snapshotted at two
    // widening date cuts. A customer whose max(o_orderdate) advanced
    // between cuts versions with ROW-time validity (closes at the
    // successor's updated_at, not the run clock); unchanged customers
    // keep one open row. The oracle reconstructs the full history
    // from the two states directly.
    "snapshot_scd2_timestamp" -> ((s, d) => {
      val wh = freshWh("snapshot_ts")
      def spec(cut: String) = PipelineSpec(
        models = Seq(Model("cust_state", Nil, Materialization.Table,
          (sp, _) => Tables.orders(sp, d)
            .filter(col("o_orderdate") < lit(cut).cast(TimestampType))
            .groupBy("o_custkey")
            .agg(max(col("o_orderdate")).as("updated_at"),
              count(lit(1)).as("n_orders")))),
        snapshots = Seq(SnapshotDef("cust_state_snap", "cust_state",
          Seq("o_custkey"), Seq("updated_at", "n_orders"),
          strategy = SnapshotStrategy.Timestamp("updated_at"))))
      mustSucceed(new PipelineRunner(s, spec("1997-01-01 00:00:00"), wh)
        .run(Seq("run", "snapshot --at 2024-01-01T00:00:00")))
      val r2 = new PipelineRunner(s, spec("1998-01-01 00:00:00"), wh)
      mustSucceed(r2.run(Seq("run", "snapshot --at 2024-02-01T00:00:00")))
      r2.readTable("cust_state_snap")
        .orderBy("o_custkey", "valid_from")
    }),

    // dbt 1.9 `hard_deletes=new_record`: between the two snapshot runs
    // custkey%7=0 keys VANISH (close + open deletion marker carrying
    // the last values, dbt_is_deleted=true) and custkey%5=0 survivors
    // change segment (ordinary re-version). The oracle reconstructs
    // the exact three-branch history, so a missing marker, a re-closed
    // marker, or a mis-flagged live row all hash-mismatch.
    "snapshot_scd2_hard_deletes" -> ((s, d) => {
      val wh = freshWh("snapshot_hd")
      def spec(second: Boolean) = PipelineSpec(
        models = Seq(Model("cust_dim_hd", Nil, Materialization.Table,
          (sp, _) => {
            val base = Tables.customer(sp, d).select(col("c_custkey"),
              (if (second)
                when(col("c_custkey") % 5 === 0, lit("MOVED"))
                  .otherwise(col("c_mktsegment"))
              else col("c_mktsegment")).as("seg"))
            if (second) base.filter(col("c_custkey") % 7 =!= 0) else base
          })),
        snapshots = Seq(SnapshotDef("cust_snap_hd", "cust_dim_hd",
          Seq("c_custkey"), Seq("seg"),
          hardDeletes = HardDeletes.NewRecord)))
      mustSucceed(new PipelineRunner(s, spec(second = false), wh)
        .run(Seq("run", "snapshot --at 2024-01-01T00:00:00")))
      val r2 = new PipelineRunner(s, spec(second = true), wh)
      mustSucceed(r2.run(Seq("run", "snapshot --at 2024-02-01T00:00:00")))
      r2.readTable("cust_snap_hd").orderBy("c_custkey", "valid_from")
    }),

    // ---- generic data tests (violating-rows SELECTs; dbt `test`) ----------
    "test_unique" -> ((s, d) =>
      DataTests.unique(Tables.lineitem(s, d), Seq("l_orderkey"))
        .orderBy("l_orderkey")),

    "test_not_null" -> ((s, d) =>
      DataTests.notNull(
        Tables.orders(s, d).select(col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("O")).as("maybe")),
        "maybe").orderBy("o_orderkey")),

    "test_accepted_values" -> ((s, d) =>
      DataTests.acceptedValues(
        Tables.orders(s, d).select("o_orderkey", "o_orderstatus"),
        "o_orderstatus", Seq("O", "F")).orderBy("o_orderkey")),

    // Parent side is filtered to custkey % 3 <> 0 to seed orphans.
    "test_relationships" -> ((s, d) =>
      DataTests.relationships(
        Tables.orders(s, d), "o_custkey",
        Tables.customer(s, d).filter(col("c_custkey") % 3 =!= 0), "c_custkey")
        .orderBy("o_custkey")),

    // dbt SINGULAR test: arbitrary SQL whose rows are the violations —
    // here "orders with no high-quantity lineitem", a two-table
    // business rule no generic test expresses. The refs are parsed
    // from the SQL and resolved against the runner's sources.
    "test_singular" -> ((s, d) => {
      val spec = PipelineSpec(Nil,
        tests = Seq(DataTest.Singular("orders_no_bulk_item",
          """SELECT o.o_orderkey, o.o_totalprice
            |FROM {{ source('sing_ord') }} o
            |LEFT JOIN (SELECT DISTINCT l_orderkey
            |           FROM {{ source('sing_li') }}
            |           WHERE l_quantity > 30) l
            |  ON o.o_orderkey = l.l_orderkey
            |WHERE l.l_orderkey IS NULL""".stripMargin)),
        sources = Map("sing_ord" -> s"$d/orders.parquet",
          "sing_li" -> s"$d/lineitem.parquet"))
      val r = new PipelineRunner(s, spec, freshWh("test_singular"))
      r.initialize()
      DataTests.violations(s, r, spec.tests.head).orderBy("o_orderkey")
    }),

    // ---- DAG execution with --select --------------------------------------
    // `run --select +dag_agg` must build dag_base and dag_agg but NOT
    // dag_poison (whose build throws) — selection and topo order are
    // both exercised; the oracle checks dag_agg's content.
    "run_select_dag" -> ((s, d) => {
      val spec = PipelineSpec(Seq(
        Model("dag_base", Nil, Materialization.View,
          (sp, _) => Tables.orders(sp, d).filter(col("o_orderstatus") === "F")),
        Model("dag_agg", Seq("dag_base"), Materialization.Table,
          (_, in) => in("dag_base").groupBy("o_custkey")
            .agg(count(lit(1)).as("n_f"))),
        Model("dag_poison", Seq("dag_agg"), Materialization.Table,
          (_, _) => sys.error("dag_poison must not be selected"))))
      val r = new PipelineRunner(s, spec, freshWh("run_select_dag"))
      mustSucceed(r.run(Seq("run --select +dag_agg")))
      r.readTable("dag_agg").orderBy("o_custkey")
    }),

    // ---- tag/exclude selection (dbt node-selection grammar) ---------------
    // `run -s tag:daily --exclude tg_skip`: the tagged subgraph runs,
    // the excluded (poisoned) model does not — tag:, the -s alias and
    // --exclude subtraction are all exercised end-to-end; the oracle
    // hash-checks the surviving aggregate.
    "run_select_tags" -> ((s, d) => {
      val spec = PipelineSpec(Seq(
        Model("tg_base", Nil, Materialization.View,
          (sp, _) => Tables.orders(sp, d)
            .filter(col("o_orderstatus") === "O"),
          tags = Seq("daily")),
        Model("tg_agg", Seq("tg_base"), Materialization.Table,
          (_, in) => in("tg_base").groupBy("o_custkey")
            .agg(count(lit(1)).as("n_o"),
              asDouble(sum(dec2(col("o_totalprice")))).as("sum_o")),
          tags = Seq("daily")),
        Model("tg_skip", Seq("tg_base"), Materialization.Table,
          (_, _) => sys.error("tg_skip must be excluded"),
          tags = Seq("daily"))))
      val r = new PipelineRunner(s, spec, freshWh("run_select_tags"))
      mustSucceed(r.run(Seq("run -s tag:daily --exclude tg_skip")))
      r.readTable("tg_agg").orderBy("o_custkey")
    }),

    // ---- --vars / {{ var() }} templating (dbt `run --vars`) ---------------
    // One SQL model exercises the whole var surface: a string var
    // spliced bare into SQL quotes (dbt/Jinja textual substitution),
    // a provided var overriding its declared default, and an
    // unprovided var falling back to its default — driven through the
    // command line as a single-quoted JSON span, proving the argv
    // tokenizer + JSON parsing end-to-end.
    "run_vars" -> ((s, d) => {
      val spec = PipelineSpec(
        models = Seq(Model.sql("vars_out",
          """SELECT o_orderkey, o_custkey, o_totalprice,
            |  '{{ var("label", 'vars_ok') }}' AS label
            |FROM {{ source('orders') }}
            |WHERE o_orderstatus = '{{ var("status") }}'
            |  AND o_totalprice < {{ var('max_price', 999999) }}"""
            .stripMargin,
          Materialization.Table)),
        sources = Map("orders" -> s"$d/orders.parquet"))
      val r = new PipelineRunner(s, spec, freshWh("run_vars"))
      mustSucceed(r.run(Seq(
        """run --vars '{"status": "F", "max_price": 50000}'""")))
      r.readTable("vars_out").orderBy("o_orderkey")
    }),

    // ---- compaction (the OPTIMIZE analogue) -------------------------------
    // Three streamed appends under an autoCompactMembers=2 policy (the
    // 3rd commit crosses the threshold and auto-compacts), then the
    // explicit `compact --select` command; the table must hash-match
    // the plain union of the three slices — compaction changes the
    // file layout, never the contents.
    "mat_compact" -> ((s, d) => {
      val r = new PipelineRunner(s, PipelineSpec(Nil),
        freshWh("mat_compact"), autoCompactMembers = 2)
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      for (i <- 0 to 2)
        r.appendBatch("cmp_orders",
          o.filter(pmod(col("o_orderkey"), lit(3)) === i), i.toLong)
      require(r.runCommand("compact --select cmp_orders").success,
        "compact command failed")
      r.readTable("cmp_orders").orderBy("o_orderkey")
    }),

    // ---- SQL-text model DAG (the reference's actual model format) ---------
    // Models are SQL strings with {{ ref }} / {{ source }} — what dbt
    // compiles and submits (`dbtoperator.py:342-360`). DAG: source
    // orders → sqlm_base (view) → sqlm_inc (incremental append, two
    // runs with a widening date cut) → sqlm_agg (table); sqlm_poison
    // (references a nonexistent table, would throw if built) proves
    // `--select +sqlm_agg` scoping. Oracle checks the final aggregate
    // after both incremental runs.
    "run_select_dag_sql" -> ((s, d) => {
      val wh = freshWh("run_select_dag_sql")
      def spec(cut: String) = PipelineSpec(
        models = Seq(
          Model.sql("sqlm_base",
            """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
              |FROM {{ source('orders') }}
              |WHERE o_orderstatus = 'F'""".stripMargin,
            Materialization.View),
          Model.sql("sqlm_inc",
            s"""SELECT * FROM {{ ref('sqlm_base') }}
               |WHERE o_orderdate < TIMESTAMP '$cut'""".stripMargin,
            Materialization.IncrementalAppend("o_orderdate")),
          Model.sql("sqlm_agg",
            """SELECT o_custkey, count(*) AS n_f,
              |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
              |    AS sum_f
              |FROM {{ ref('sqlm_inc') }} GROUP BY o_custkey""".stripMargin,
            Materialization.Table),
          Model.sql("sqlm_poison",
            "SELECT * FROM {{ ref('sqlm_agg') }} JOIN __no_such_table ON 1=1",
            Materialization.Table)),
        sources = Map("orders" -> s"$d/orders.parquet"))
      mustSucceed(new PipelineRunner(s, spec("1997-06-01 00:00:00"), wh)
        .run(Seq("run --select +sqlm_agg")))
      val r2 = new PipelineRunner(s, spec("1998-01-01 00:00:00"), wh)
      mustSucceed(r2.run(Seq("run --select +sqlm_agg")))
      r2.readTable("sqlm_agg").orderBy("o_custkey")
    }),

    // ---- is_incremental() / {{ this }} (dbt incremental model text) -------
    // A SQL-TEXT incremental model carrying its own delta predicate —
    // the exact text a dbt incremental model ships
    // (`WHERE ts > (SELECT max(ts) FROM {{ this }})` inside an
    // `{% if is_incremental() %}` guard, dbt-core 1.9 semantics that
    // the reference compiles verbatim, `dbtoperator.py:342-360`). Run
    // twice over a widening date cut: run 1 renders the guard FALSE
    // (batch_no=1, no predicate), run 2 renders it TRUE (batch_no=2,
    // delta above the table's own max). The oracle states the final
    // two-batch state directly — proving both the guard flip and the
    // {{ this }} subquery, not just the runner's implicit HWM.
    // dbt-spark's `file_format: delta` + `incremental merge` — the
    // configuration the reference's pin exists for (dbtoperator.py:274):
    // a SQL-text model with an is_incremental() guard materializes
    // INTO a real _delta_log table; run 1 creates (balances zeroed),
    // run 2 merges real balances for custkey%3=0, and the runner (and
    // any Delta reader) reads the merged table back.
    "run_file_format_delta" -> ((s, d) => {
      val wh = freshWh("run_ff_delta")
      val spec = PipelineSpec(
        models = Seq(Model.sql("cust_delta",
          """SELECT c_custkey, c_mktsegment,
            |  {% if is_incremental() %} c_acctbal {% else %} CAST(0.0 AS DOUBLE) {% endif %} AS bal
            |FROM {{ source('customer') }}
            |{% if is_incremental() %} WHERE c_custkey % 3 = 0 {% endif %}""".stripMargin,
          Materialization.IncrementalMerge(Seq("c_custkey"), buckets = 8))
          .copy(fileFormat = "delta")),
        sources = Map("customer" -> s"$d/customer.parquet"))
      mustSucceed(new PipelineRunner(s, spec, wh).run(Seq("run")))
      val r2 = new PipelineRunner(s, spec, wh)
      mustSucceed(r2.run(Seq("run")))
      // the table on disk IS Delta — read it back through the
      // interop reader, not just the runner
      graft.sources.DeltaRead.readDeltaTable(s, s"$wh/cust_delta")
        .orderBy("c_custkey")
    }),

    // dbt-spark's `file_format: iceberg` with the MERGE-ON-READ
    // incremental strategy: each scheduled run appends one
    // equality-delete + one data file (O(batch), no rewrite); the
    // runner — and any Iceberg reader — reconciles by sequence.
    "run_file_format_iceberg" -> ((s, d) => {
      val wh = freshWh("run_ff_iceberg")
      val spec = PipelineSpec(
        models = Seq(Model.sql("cust_iceberg",
          """SELECT c_custkey, c_mktsegment,
            |  {% if is_incremental() %} c_acctbal {% else %} CAST(0.0 AS DOUBLE) {% endif %} AS bal
            |FROM {{ source('customer') }}
            |{% if is_incremental() %} WHERE c_custkey % 3 = 0 {% endif %}""".stripMargin,
          Materialization.IncrementalMergeOnRead(Seq("c_custkey")))
          .copy(fileFormat = "iceberg")),
        sources = Map("customer" -> s"$d/customer.parquet"))
      mustSucceed(new PipelineRunner(s, spec, wh).run(Seq("run")))
      val r2 = new PipelineRunner(s, spec, wh)
      mustSucceed(r2.run(Seq("run")))
      // the table on disk IS Iceberg — read through the interop reader
      graft.sources.IcebergRead.readIcebergTable(s, s"$wh/cust_iceberg")
        .orderBy("c_custkey")
    }),

    "run_sql_incremental_predicate" -> ((s, d) => {
      val wh = freshWh("run_sql_inc_pred")
      def spec(cut: String) = PipelineSpec(
        models = Seq(Model.sql("sip_orders",
          s"""SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
             |  {% if is_incremental() %} 2 {% else %} 1 {% endif %} AS batch_no
             |FROM {{ source('orders') }}
             |WHERE o_orderdate < TIMESTAMP '$cut'
             |{% if is_incremental() %}
             |  AND o_orderdate > (SELECT max(o_orderdate) FROM {{ this }})
             |{% endif %}""".stripMargin,
          Materialization.IncrementalAppend("o_orderdate"))),
        sources = Map("orders" -> s"$d/orders.parquet"))
      mustSucceed(new PipelineRunner(s, spec("1997-01-01 00:00:00"), wh)
        .run(Seq("run")))
      val r2 = new PipelineRunner(s, spec("1998-01-01 00:00:00"), wh)
      mustSucceed(r2.run(Seq("run")))
      r2.readTable("sip_orders").orderBy("o_orderkey")
    }),

    // ---- microbatch incremental strategy (dbt-core 1.9) -------------------
    // The headline 1.9 materialization: event-time-windowed independent
    // batches. Run 1 backfills begin → Mar 15 12:00 (month batches,
    // the last one partial); run 2 advances the clock to Apr 10 —
    // its current window (April) plus lookback=1 (March) re-process,
    // healing March's partial batch by atomic window replacement. The
    // oracle states the final half-open interval directly, so a missed
    // window, a non-replaced partial batch, or a leaked out-of-window
    // row all hash-mismatch.
    "mat_incremental_microbatch" -> ((s, d) => {
      val wh = freshWh("mat_inc_microbatch")
      val spec = PipelineSpec(
        models = Seq(Model.sql("mbt_orders",
          """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
            |FROM {{ source('orders') }}""".stripMargin,
          Materialization.IncrementalMicrobatch(
            eventTime = "o_orderdate", batchSize = "month",
            begin = "1997-01-01"))),
        sources = Map("orders" -> s"$d/orders.parquet"),
        sourceEventTime = Map("orders" -> "o_orderdate"))
      val r = new PipelineRunner(s, spec, wh)
      mustSucceed(r.run(Seq("run --event-time-end 1997-03-15T12:00:00")))
      mustSucceed(r.run(Seq("run --event-time-end 1997-04-10T00:00:00")))
      r.readTable("mbt_orders").orderBy("o_orderkey")
    }),

    // ---- model hooks (dbt pre-hook/post-hook) -----------------------------
    // A post-hook writes the audit row dbt hooks are usually for:
    // after hk_agg materializes, `INSERT INTO hk_audit SELECT ... FROM
    // {{ this }}` appends (model, rows) into a warehouse audit table.
    // The key returns the AUDIT table — proving the hook ran inside
    // the model's scope, rendered {{ this }}, and appended through the
    // atomic manifest protocol.
    "run_hooks_audit" -> ((s, d) => {
      val spec = PipelineSpec(
        models = Seq(Model.sql("hk_agg",
          """SELECT o_orderstatus, count(*) AS n
            |FROM {{ source('orders') }} GROUP BY o_orderstatus""".stripMargin,
          Materialization.Table,
          postHooks = Seq(
            """INSERT INTO hk_audit
              |SELECT 'hk_agg' AS model_name, count(*) AS n_rows
              |FROM {{ this }}""".stripMargin))),
        sources = Map("orders" -> s"$d/orders.parquet"))
      val r = new PipelineRunner(s, spec, freshWh("run_hooks_audit"))
      mustSucceed(r.run(Seq("run")))
      r.readTable("hk_audit").orderBy("model_name")
    }),

    // ---- --defer --state (dbt slim CI) ------------------------------------
    // A "prod" warehouse materializes the base model; a fresh "CI"
    // warehouse then runs ONLY the downstream aggregate with
    // `--defer --state <prod>`, so its ref resolves to prod's table
    // (favor-local precedence, dbt defer). The key returns the CI
    // aggregate — the oracle states the full chain over orders, so a
    // defer that silently read nothing (or the wrong env) would
    // hash-mismatch; the require proves the base never built locally.
    "run_defer_state" -> ((s, d) => {
      val prod = freshWh("defer_prod")
      val base = Model.sql("dfo_base",
        """SELECT o_orderkey, o_custkey, o_totalprice
          |FROM {{ source('orders') }} WHERE o_orderstatus = 'F'""".stripMargin,
        Materialization.Table)
      val agg = Model.sql("dfo_agg",
        """SELECT o_custkey, count(*) AS n,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
          |    AS total
          |FROM {{ ref('dfo_base') }} GROUP BY o_custkey""".stripMargin,
        Materialization.Table)
      val spec = PipelineSpec(Seq(base, agg),
        sources = Map("orders" -> s"$d/orders.parquet"))
      mustSucceed(new PipelineRunner(s, spec, prod)
        .run(Seq("run -s dfo_base")))
      val r = new PipelineRunner(s, spec, freshWh("defer_ci"))
      mustSucceed(r.run(Seq(s"run -s dfo_agg --defer --state $prod")))
      require(!r.tableExists("dfo_base"),
        "deferred dep must not materialize in the CI warehouse")
      r.readTable("dfo_agg").orderBy("o_custkey")
    }),

    // ---- clone (dbt CI-bootstrap from a state warehouse) ------------------
    // A prod warehouse materializes a filtered projection; `clone
    // --state <prod>` copies the live generation file-verbatim into a
    // fresh warehouse (no recompute — parquet members are immutable),
    // and the key returns the CLONED table, oracle-checked against
    // the chain over orders.
    "run_clone_state" -> ((s, d) => {
      val prod = freshWh("clone_prod")
      val spec = PipelineSpec(Seq(Model.sql("cl_open",
        """SELECT o_orderkey, o_custkey, o_totalprice
          |FROM {{ source('orders') }}
          |WHERE o_orderstatus = 'O'""".stripMargin,
        Materialization.Table)),
        sources = Map("orders" -> s"$d/orders.parquet"))
      mustSucceed(new PipelineRunner(s, spec, prod).run(Seq("run")))
      val r = new PipelineRunner(s, spec, freshWh("clone_ci"))
      mustSucceed(r.run(Seq(s"clone --state $prod")))
      r.readTable("cl_open").orderBy("o_orderkey")
    }),

    // ---- time travel (generation-store reads) -----------------------------
    // Two full-refresh runs commit two generations; the key reads the
    // table AS OF the first one — the superseded manifest and its
    // batches are immutable until vacuum, so the read reproduces
    // batch-1 content exactly (hash-checked against the batch-1 SQL).
    "mat_time_travel" -> ((s, d) => {
      val wh = freshWh("mat_time_travel")
      def spec(cut: String) = PipelineSpec(Seq(Model.sql("tt_orders",
        s"""SELECT o_orderkey, o_custkey, o_totalprice
           |FROM {{ source('orders') }}
           |WHERE o_orderdate < TIMESTAMP '$cut'""".stripMargin,
        Materialization.Table)),
        sources = Map("orders" -> s"$d/orders.parquet"))
      mustSucceed(new PipelineRunner(s, spec("1997-01-01 00:00:00"), wh)
        .run(Seq("run")))
      val r2 = new PipelineRunner(s, spec("1998-01-01 00:00:00"), wh)
      mustSucceed(r2.run(Seq("run")))
      val gens = r2.generations("tt_orders")
      require(gens.size == 2, s"expected 2 generations, got $gens")
      r2.readTableAt("tt_orders", gens.head).orderBy("o_orderkey")
    }),

    // ---- restore (Delta RESTORE semantics) --------------------------------
    // Generation 1 is correct, generation 2 is a "bad deploy" (wrong
    // filter); restoreTable republishes gen-1's member list as gen 3 —
    // metadata-only, no data copied — and the LIVE read must equal
    // batch-1 content again while history keeps all three generations.
    "mat_restore" -> ((s, d) => {
      val wh = freshWh("mat_restore")
      def spec(status: String) = PipelineSpec(Seq(Model.sql("rs_orders",
        s"""SELECT o_orderkey, o_custkey, o_totalprice
           |FROM {{ source('orders') }}
           |WHERE o_orderstatus = '$status'""".stripMargin,
        Materialization.Table)),
        sources = Map("orders" -> s"$d/orders.parquet"))
      mustSucceed(new PipelineRunner(s, spec("F"), wh).run(Seq("run")))
      val r2 = new PipelineRunner(s, spec("P"), wh)
      mustSucceed(r2.run(Seq("run")))
      r2.restoreTable("rs_orders", r2.generations("rs_orders").head)
      require(r2.generations("rs_orders").size == 3,
        "restore must commit a NEW generation, not rewrite history")
      r2.readTable("rs_orders").orderBy("o_orderkey")
    }),

    // ---- vacuum (retention GC) --------------------------------------------
    // Three generations accumulate; vacuum(keep=1) must delete the two
    // superseded manifests and every batch only they referenced, while
    // the LIVE generation stays byte-identical (hash-checked). The
    // requires prove the GC actually happened — history is gone, a
    // time-travel read of a vacuumed generation fails loudly.
    "mat_vacuum" -> ((s, d) => {
      val wh = freshWh("mat_vacuum")
      def spec(cut: String) = PipelineSpec(Seq(Model.sql("vc_orders",
        s"""SELECT o_orderkey, o_orderstatus, o_totalprice
           |FROM {{ source('orders') }}
           |WHERE o_orderdate < TIMESTAMP '$cut'""".stripMargin,
        Materialization.Table)),
        sources = Map("orders" -> s"$d/orders.parquet"))
      Seq("1996-01-01", "1997-01-01", "1998-01-01").foreach(cut =>
        mustSucceed(new PipelineRunner(s, spec(s"$cut 00:00:00"), wh)
          .run(Seq("run"))))
      val r = new PipelineRunner(s, spec("1998-01-01 00:00:00"), wh)
      val before = r.generations("vc_orders")
      require(before.size == 3, s"expected 3 generations, got $before")
      r.vacuum("vc_orders", keepGenerations = 1, minAgeMs = 0L)
      val after = r.generations("vc_orders")
      require(after == Seq(before.last),
        s"vacuum(keep=1) must leave only the live generation: $after")
      require(
        scala.util.Try(r.readTableAt("vc_orders", before.head)).isFailure,
        "time travel to a vacuumed generation must fail loudly")
      r.readTable("vc_orders").orderBy("o_orderkey")
    }),

    // ---- on_schema_change=append_new_columns (dbt 1.9) --------------------
    // An incremental-append model gains a column between batches: the
    // evolved table surface appends the new column, rows written
    // before it READ AS NULL (schema-on-read parquet; no rewrite of
    // old batches), and the appended batch carries real values.
    "mat_schema_evolution" -> ((s, d) => {
      val wh = freshWh("mat_schema_evo")
      def spec(cut: String, withPrice: Boolean) = PipelineSpec(Seq(Model(
        "se_orders", Nil,
        Materialization.IncrementalAppend("o_orderdate"),
        (sp, _) => {
          val base = Tables.orders(sp, d)
            .filter(col("o_orderdate") < lit(cut).cast(TimestampType))
          if (withPrice)
            base.select("o_orderkey", "o_custkey", "o_orderdate",
              "o_totalprice")
          else base.select("o_orderkey", "o_custkey", "o_orderdate")
        })))
      mustSucceed(new PipelineRunner(s,
        spec("1997-01-01", withPrice = false), wh).run(Seq("run")))
      val r2 = new PipelineRunner(s, spec("1998-01-01", withPrice = true), wh)
      mustSucceed(r2.run(Seq("run")))
      r2.readTable("se_orders").orderBy("o_orderkey")
    }),

    // ---- docs generate (dbt catalog artifact) -----------------------------
    // Two models materialize from orders, `docs generate` writes
    // target/catalog.json, and the key returns the catalog's
    // (name, kind, row_count) rows read back from the ARTIFACT — so
    // the oracle checks the stats dbt's catalog carries, not the
    // tables themselves.
    "run_docs_catalog" -> ((s, d) => {
      val w = freshWh("docs_cat")
      val spec = PipelineSpec(Seq(
        Model.sql("dc_f",
          """SELECT o_orderkey, o_totalprice
            |FROM {{ source('orders') }}
            |WHERE o_orderstatus = 'F'""".stripMargin,
          Materialization.Table),
        Model.sql("dc_agg",
          """SELECT o_custkey, count(*) AS n
            |FROM {{ source('orders') }} GROUP BY o_custkey""".stripMargin,
          Materialization.Table)),
        sources = Map("orders" -> s"$d/orders.parquet"))
      val r = new PipelineRunner(s, spec, w)
      mustSucceed(r.run(Seq("run", "docs generate")))
      s.read.option("multiLine", "true").json(s"$w/target/catalog.json")
        .select(explode(col("nodes")).as("node"))
        .select(col("node.name").as("name"), col("node.kind").as("kind"),
          col("node.stats.row_count").as("row_count"))
        .orderBy("name")
    }),

    // ---- store_failures (dbt test audit tables) ---------------------------
    // A warn-severity accepted_values test with store_failures runs
    // via the RUNNER (not DataTests directly): its violating rows are
    // persisted to dbt_test__audit_<name> through the atomic publish
    // protocol, and the key returns that audit table — so storage,
    // threshold-from-stored-count, and warn-not-fail semantics are all
    // oracle-checked.
    "test_store_failures" -> ((s, d) => {
      val spec = PipelineSpec(Nil,
        tests = Seq(DataTest.AcceptedValues("orders", "o_orderstatus",
          Seq("O", "F"),
          TestConfig(severity = Severity.Warn, storeFailures = true))),
        sources = Map("orders" -> s"$d/orders.parquet"))
      val r = new PipelineRunner(s, spec, freshWh("test_store_failures"))
      mustSucceed(r.run(Seq("test")))
      r.readTable("dbt_test__audit_accepted_values_orders_o_orderstatus")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // ---- model contracts (dbt contract: enforced) -------------------------
    // A contracted model: the declared (name, type) set is checked on
    // the PLAN's schema before materializing (a violation fails the
    // build with nothing written — spec-tested); the key returns the
    // built table, so the oracle also pins the declared shape.
    "run_contract_enforced" -> ((s, d) => {
      val m = Model.sql("ctr_orders",
        """SELECT o_orderkey, o_orderstatus,
          |  CAST(o_totalprice AS DOUBLE) AS price
          |FROM {{ source('orders') }} WHERE o_orderstatus = 'P'""".stripMargin,
        Materialization.Table,
        contract = Some(StructType(Seq(
          StructField("o_orderkey", LongType),
          StructField("o_orderstatus", StringType),
          StructField("price", DoubleType)))))
      val spec = PipelineSpec(Seq(m),
        sources = Map("orders" -> s"$d/orders.parquet"))
      val r = new PipelineRunner(s, spec, freshWh("run_contract"))
      mustSucceed(r.run(Seq("run")))
      r.readTable("ctr_orders").orderBy("o_orderkey")
    }),

    // ---- unit tests (dbt 1.8+/1.9 `unit_tests:`) --------------------------
    // A unit test mocks the model's source with fixture rows and
    // declares the expected aggregate BEFORE anything materializes;
    // `build` runs it first and a failure would SKIP the model (dbt
    // gating), making the readTable below throw. The key returns the
    // model's REAL output, so the oracle checks both the gate fired
    // green and the model's logic over the actual table.
    "test_unit" -> ((s, d) => {
      val m = Model.sql("ut_status_agg",
        """SELECT o_orderstatus, count(*) AS n,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
          |    AS total
          |FROM {{ source('orders') }} GROUP BY o_orderstatus""".stripMargin,
        Materialization.Table)
      val given = Fixture(
        Seq("o_orderstatus,o_totalprice", "O,10.5", "O,4.5", "F,1.0"),
        StructType(Seq(StructField("o_orderstatus", StringType),
          StructField("o_totalprice", DoubleType))))
      val expect = Fixture(
        Seq("o_orderstatus,n,total", "O,2,15.0", "F,1,1.0"),
        StructType(Seq(StructField("o_orderstatus", StringType),
          StructField("n", LongType), StructField("total", DoubleType))))
      val spec = PipelineSpec(Seq(m),
        unitTests = Seq(UnitTest("ut_status_agg_basic", "ut_status_agg",
          Map("orders" -> given), expect)),
        sources = Map("orders" -> s"$d/orders.parquet"))
      val r = new PipelineRunner(s, spec, freshWh("test_unit"))
      mustSucceed(r.run(Seq("build")))
      r.readTable("ut_status_agg").orderBy("o_orderstatus")
    }),

    // ---- project-from-artifact (the reference's zip deploy path) ----------
    // A full project (sources.conf + SQL-text models with config
    // headers + a CSV seed with declared schema) is written, packed
    // into a zip (`Makefile:11-18`), extracted + located + loaded
    // (`dbtoperator.py:286-312`), then seeded and run; the oracle
    // checks the final aggregate, which joins a seed to a model.
    // Schema namespaces (SURVEY §1.2 database.schema.identifier, the
    // database level collapsed onto the warehouse root): TWO models
    // with the SAME name in different schemas (dbt `schema` /
    // generate_schema_name config), stored under warehouse subdirs,
    // ref'd qualified by a downstream model, and — the gateway
    // contract — resolved by QUALIFIED NAME in plain Spark SQL
    // through the published global views (the same resolution rule
    // every Thrift connection inherits; GatewaySpec proves it over a
    // real socket). The returned frame IS the SQL join of the two
    // same-named relations.
    "run_schema_namespace" -> ((s, d) => {
      val spec = PipelineSpec(Seq(
        Model("orders", Nil, Materialization.Table,
          (sp, _) => Tables.orders(sp, d).groupBy("o_custkey")
            .agg(asDouble(sum(dec2(col("o_totalprice")))).as("total")),
          schema = Some("sales")),
        Model("orders", Nil, Materialization.Table,
          (sp, _) => Tables.orders(sp, d)
            .filter(col("o_orderstatus") === "F")
            .groupBy("o_custkey").agg(count(lit(1)).as("n_closed")),
          schema = Some("finance")),
        Model("ns_summary", Seq("sales.orders", "finance.orders"),
          Materialization.Table,
          (sp, ins) => ins("sales.orders")
            .join(ins("finance.orders"), Seq("o_custkey")))))
      val r = new PipelineRunner(s, spec, freshWh("run_schema_namespace"))
      mustSucceed(r.run(Seq("run")))
      require(r.readTable("ns_summary").columns.length == 3)
      s.sql("""SELECT sq.o_custkey, sq.total, fq.n_closed
              |FROM sales.orders sq
              |JOIN finance.orders fq ON sq.o_custkey = fq.o_custkey
              |ORDER BY sq.o_custkey""".stripMargin)
    }),

    // ---- the dbt semantic layer --------------------------------------------
    // dbt ≥1.6 projects carry semantic_models:/metrics: YAML (parsed
    // into the manifest by the 1.9 the reference pins); the engine
    // parses + validates the same shapes AND compiles metric queries
    // natively (SemanticLayer.query — one aggregation pass per query,
    // simple/ratio/derived metrics). The oracle recomputes every
    // metric directly from orders.
    "run_semantic_metrics" -> ((s, d) => {
      val wh = freshWh("run_semantic_metrics")
      val proj = java.nio.file.Paths.get(freshWh("rsm_project"))
      java.nio.file.Files.createDirectories(proj.resolve("models"))
      java.nio.file.Files.writeString(proj.resolve("sources.conf"),
        s"raw_orders=$d/orders.parquet\n")
      java.nio.file.Files.writeString(
        proj.resolve("models/orders_m.sql"),
        """{{ config(materialized='table') }}
          |SELECT o_orderstatus AS status, o_custkey AS cust,
          |       CAST(o_totalprice AS DECIMAL(12,2)) AS amount
          |FROM {{ source('raw_orders') }}""".stripMargin)
      java.nio.file.Files.writeString(
        proj.resolve("semantic_models.yml"),
        """semantic_models:
          |  - name: orders_sm
          |    model: ref('orders_m')
          |    description: order facts
          |    entities:
          |      - name: cust
          |        type: foreign
          |    dimensions:
          |      - name: status
          |        type: categorical
          |    measures:
          |      - name: revenue
          |        agg: sum
          |        expr: amount
          |      - name: n_orders
          |        agg: count
          |        expr: amount
          |      - name: customers
          |        agg: count_distinct
          |        expr: cust
          |      - name: max_price
          |        agg: max
          |        expr: amount
          |      - name: min_price
          |        agg: min
          |        expr: amount
          |metrics:
          |  - name: revenue
          |    label: Revenue
          |    type: simple
          |    type_params:
          |      measure: revenue
          |  - name: customers
          |    type: simple
          |    type_params:
          |      measure: customers
          |  - name: max_price_m
          |    type: simple
          |    type_params:
          |      measure: max_price
          |  - name: min_price_m
          |    type: simple
          |    type_params:
          |      measure: min_price
          |  - name: avg_order_value
          |    type: ratio
          |    type_params:
          |      numerator: revenue
          |      denominator: n_orders
          |  - name: price_spread
          |    type: derived
          |    type_params:
          |      expr: max_price_m - min_price_m
          |      metrics:
          |        - max_price_m
          |        - min_price_m
          |""".stripMargin)
      val spec = PipelineProject.load(proj.toString)
      require(spec.semanticModels.map(_.name) == Seq("orders_sm") &&
        spec.metrics.size == 6, "semantic_models.yml parse wrong")
      val r = new PipelineRunner(s, spec, wh)
      mustSucceed(r.run(Seq("run")))
      r.semanticQuery(
        Seq("revenue", "avg_order_value", "customers", "price_spread"),
        groupBy = Seq("status"))
        .select(col("status"),
          col("revenue").cast(DoubleType).as("revenue"),
          col("avg_order_value"),
          col("customers"),
          col("price_spread").cast(DoubleType).as("price_spread"))
        .orderBy("status")
    }),

    // ---- the dbt-spark wire transcript ------------------------------------
    // The reference's literal production loop is dbt CLI → PyHive/
    // Thrift → Spark (dbtoperator.py:274,342-360). This key replays
    // the EXACT statement sequences dbt-spark 1.9 emits for the
    // view / table / incremental-append / insert_overwrite
    // materializations (graft.gateway.DbtTranscript, statements from
    // dbt-spark's public adapter macros) over a REAL hive-jdbc
    // connection to the engine's Thrift endpoint, then reads the
    // final tables back — the oracle recomputes every final state
    // from the raw orders table. The `merge` strategy's transcript
    // (MERGE INTO routed into the engine) is covered by
    // run_sql_merge_into and GatewaySpec.
    "run_thrift_dbt_transcript" -> ((s, d) => {
      import graft.gateway.{DbtTranscript => T, ThriftGateway}
      val db = "dbt_transcript"
      s.sql(s"drop database if exists $db cascade")
      // a crashed prior run can leave the location without the
      // catalog entry — clear it so CREATE SCHEMA starts clean
      val whDir = java.nio.file.Paths.get(
        s.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:"), s"$db.db")
      if (java.nio.file.Files.isDirectory(whDir)) {
        import scala.jdk.CollectionConverters._
        val w = java.nio.file.Files.walk(whDir)
        val all = try w.iterator().asScala.toSeq finally w.close()
        all.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
      }
      // the dbt SOURCE: an existing relation the models select from
      Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .createOrReplaceGlobalTempView("dbt_src_orders")
      val port = ThriftGateway.freePort()
      val srv = ThriftGateway.start(s, port)
      try {
        Class.forName("org.apache.hive.jdbc.HiveDriver")
        val conn = java.sql.DriverManager.getConnection(
          s"jdbc:hive2://127.0.0.1:$port", "dbt", "")
        try {
          val st = conn.createStatement()
          def run(stmts: Seq[String]): Unit = stmts.foreach(st.execute)
          run(T.runStart(db))
          // the dbt SOURCE lands as a persistent catalog table (a
          // persistent view may not reference the temp staging view)
          st.execute(s"create table $db.src_orders using parquet as " +
            "select * from dbt_src_orders")
          run(T.viewRun(db, "stg_orders",
            "select o_orderkey, o_custkey, o_orderstatus, " +
              "cast(cast(o_totalprice as decimal(12,2)) as double) " +
              s"as price from $db.src_orders"))
          val tblSel = "select o_orderstatus, count(*) as n, " +
            "cast(sum(cast(price as decimal(12,2))) as double) as total " +
            s"from $db.stg_orders group by o_orderstatus"
          run(T.tableRun(db, "orders_tbl", tblSel, rerun = false))
          run(T.tableRun(db, "orders_tbl", tblSel, rerun = true))
          run(T.incrementalAppendRun(db, "orders_inc",
            s"select o_orderkey, o_orderstatus from $db.stg_orders " +
              "where o_orderkey % 2 = 0", firstRun = true))
          run(T.incrementalAppendRun(db, "orders_inc",
            s"select o_orderkey, o_orderstatus from $db.stg_orders " +
              "where o_orderkey % 2 = 1", firstRun = false))
          // insert_overwrite: run 1 from HALF the data, run 2 full
          // recompute for statuses O and F only — the other statuses'
          // partitions must survive the dynamic overwrite untouched
          def partSel(where: String) = "select count(*) as n, " +
            "cast(sum(cast(price as decimal(12,2))) as double) as total, " +
            s"o_orderstatus from $db.stg_orders $where group by o_orderstatus"
          run(T.insertOverwriteRun(db, "orders_part",
            partSel("where o_orderkey % 2 = 0"),
            "o_orderstatus", firstRun = true))
          run(T.insertOverwriteRun(db, "orders_part",
            partSel("where o_orderstatus in ('O','F')"),
            "o_orderstatus", firstRun = false))
          // dbt's catalog introspection legs execute over the wire
          require(st.executeQuery(s"show tables in $db").next(),
            "SHOW TABLES returned nothing")
          require(st.executeQuery(s"describe extended $db.orders_tbl")
            .next(), "DESCRIBE EXTENDED returned nothing")
        } finally conn.close()
      } finally srv.close()
      s.catalog.dropGlobalTempView("dbt_src_orders")
      s.sql(
        s"""SELECT p.o_orderstatus, p.n, p.total,
           |  (SELECT COUNT(*) FROM $db.orders_inc) AS inc_rows,
           |  (SELECT COUNT(*) FROM $db.orders_tbl) AS tbl_groups,
           |  (SELECT COUNT(*) FROM $db.stg_orders) AS view_rows
           |FROM $db.orders_part p ORDER BY p.o_orderstatus""".stripMargin)
    }),

    "run_project_artifact" -> ((s, d) => {
      val wh = freshWh("run_project_artifact")
      val proj = java.nio.file.Paths.get(freshWh("rpa_project"))
      java.nio.file.Files.createDirectories(proj.resolve("models"))
      java.nio.file.Files.createDirectories(proj.resolve("seeds"))
      java.nio.file.Files.writeString(proj.resolve("sources.conf"),
        s"raw_orders=$d/orders.parquet\n")
      java.nio.file.Files.writeString(
        proj.resolve("models/po_base.sql"),
        """{{ config(materialized='view') }}
          |SELECT o_orderkey, o_orderstatus, o_totalprice
          |FROM {{ source('raw_orders') }}""".stripMargin)
      // the agg model renders through a project {% macro %}, a
      // {% set %} binding, AND a PACKAGE macro (packages/<pkg>/macros,
      // dbt's packages.yml install surface) called both qualified and
      // bare — the fixture's oracle is unchanged, so the hash-match
      // proves macro expansion compiles to the same SQL
      java.nio.file.Files.createDirectories(proj.resolve("macros"))
      java.nio.file.Files.writeString(
        proj.resolve("macros/money.sql"),
        """{% macro money_sum(col, alias='total') %}
          |CAST(SUM(CAST({{ col }} AS DECIMAL(12,2))) AS DOUBLE)
          |  AS {{ alias }}
          |{% endmacro %}""".stripMargin)
      java.nio.file.Files.createDirectories(
        proj.resolve("packages/metrics_utils/macros"))
      java.nio.file.Files.writeString(
        proj.resolve("packages/metrics_utils/macros/counts.sql"),
        """{% macro row_count(alias='n') %}
          |count(*) AS {{ alias }}
          |{% endmacro %}
          |{% macro eq_cond(l, r) %}
          |{{ l }} = {{ r }}
          |{% endmacro %}""".stripMargin)
      java.nio.file.Files.writeString(
        proj.resolve("models/po_agg.sql"),
        """{{ config(materialized='table') }}
          |{% set dim = 'sn.status_name' %}
          |SELECT {{ dim }}, {{ row_count() }},
          |  {{ money_sum('o.o_totalprice') }}
          |FROM {{ ref('po_base') }} o
          |JOIN {{ ref('status_names') }} sn
          |  ON {{ metrics_utils.eq_cond('o.o_orderstatus', 'sn.code') }}
          |GROUP BY {{ dim }}""".stripMargin)
      java.nio.file.Files.writeString(
        proj.resolve("seeds/status_names.csv"),
        "code,status_name\nO,open\nF,filled\nP,pending\n")
      java.nio.file.Files.writeString(
        proj.resolve("seeds/status_names.ddl"),
        "code STRING, status_name STRING")
      val zip = s"${freshWh("rpa_zip")}/project.zip"
      PipelineProject.pack(proj.toString, zip)
      val spec = PipelineProject.loadZip(zip, freshWh("rpa_extract"))
      val r = new PipelineRunner(s, spec, wh)
      mustSucceed(r.run(Seq("seed", "run")))
      r.readTable("po_agg").orderBy("status_name")
    }),

    // ---- source freshness (injected "now" → deterministic) ----------------
    "source_freshness" -> ((s, d) =>
      Freshness.check(Tables.events(s, d), "events", "ts",
        asOf = "1998-08-01 00:00:00",
        warnAfterSec = 7L * 86400, errorAfterSec = 30L * 86400))
  )

  override def oracles: Map[String, String] = Map(
    "mat_table" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "mat_view" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |ORDER BY o_orderkey""".stripMargin,

    "mat_ephemeral" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_sales
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "mat_incremental_append" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
        |FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |ORDER BY o_orderkey""".stripMargin,

    "mat_incremental_insert_overwrite" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CASE WHEN o_orderstatus = 'O' THEN 2 ELSE 1 END AS ver
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "mat_time_travel" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |ORDER BY o_orderkey""".stripMargin,

    "mat_restore" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_orderkey""".stripMargin,

    "mat_vacuum" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |ORDER BY o_orderkey""".stripMargin,

    "mat_schema_evolution" ->
      """SELECT o_orderkey, o_custkey, o_orderdate,
        |  CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |       THEN o_totalprice END AS o_totalprice
        |FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |ORDER BY o_orderkey""".stripMargin,

    "mat_incremental_merge" ->
      """SELECT c_custkey, c_mktsegment,
        |  CASE WHEN c_custkey % 3 = 0 THEN c_acctbal ELSE 0.0 END AS bal
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "mat_incremental_merge_on_read" ->
      """SELECT c_custkey, c_mktsegment,
        |  CASE WHEN c_custkey % 3 = 0 THEN c_acctbal ELSE 0.0 END AS bal
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "mat_merge_on_read_cdc" ->
      """SELECT c_custkey, c_mktsegment,
        |  CASE WHEN c_custkey % 3 = 0 THEN 0.0 ELSE c_acctbal END AS bal
        |FROM customer WHERE c_custkey % 10 <> 0
        |ORDER BY c_custkey""".stripMargin,

    "mat_incremental_merge_partitioned" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CASE WHEN o_orderstatus = 'O' THEN 2 ELSE 1 END AS ver
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "snapshot_scd2_timestamp" ->
      """WITH s1 AS (
        |  SELECT o_custkey, max(o_orderdate) AS updated_at,
        |    count(*) AS n_orders
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  GROUP BY o_custkey),
        |s2 AS (
        |  SELECT o_custkey, max(o_orderdate) AS updated_at,
        |    count(*) AS n_orders
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY o_custkey)
        |SELECT * FROM (
        |  -- v1 rows: closed at s2's row time when the state advanced,
        |  -- open otherwise (keys never vanish — cumulative source)
        |  SELECT s1.o_custkey, s1.updated_at, s1.n_orders,
        |    s1.updated_at AS valid_from,
        |    CASE WHEN s2.updated_at > s1.updated_at THEN s2.updated_at
        |         ELSE CAST(NULL AS TIMESTAMP) END AS valid_to
        |  FROM s1 JOIN s2 ON s1.o_custkey = s2.o_custkey
        |  UNION ALL
        |  -- v2 open rows: changed keys and brand-new keys
        |  SELECT s2.o_custkey, s2.updated_at, s2.n_orders,
        |    s2.updated_at AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to
        |  FROM s2 LEFT JOIN s1 ON s1.o_custkey = s2.o_custkey
        |  WHERE s1.o_custkey IS NULL OR s2.updated_at > s1.updated_at
        |) ORDER BY o_custkey, valid_from""".stripMargin,

    "snapshot_scd2" ->
      """SELECT c_custkey, c_mktsegment AS seg,
        |  TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
        |  CASE WHEN c_custkey % 5 = 0 THEN TIMESTAMP '2024-02-01 00:00:00'
        |       ELSE CAST(NULL AS TIMESTAMP) END AS valid_to
        |FROM customer
        |UNION ALL
        |SELECT c_custkey, 'MOVED' AS seg,
        |  TIMESTAMP '2024-02-01 00:00:00' AS valid_from,
        |  CAST(NULL AS TIMESTAMP) AS valid_to
        |FROM customer WHERE c_custkey % 5 = 0
        |ORDER BY c_custkey, valid_from""".stripMargin,

    // replay: version valid at each event's ts — before the second
    // cut every user sees v1; at-or-after it, %5 users see MOVED
    "q_scd2_temporal_join" ->
      """SELECT seg, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM (
        |  SELECT e.user_id,
        |    CASE WHEN c.c_custkey % 5 = 0
        |           AND e.ts >= TIMESTAMP '2024-01-15 00:00:00'
        |         THEN 'MOVED' ELSE c.c_mktsegment END AS seg
        |  FROM events e JOIN customer c ON e.user_id = c.c_custkey) t
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "snapshot_scd2_hard_deletes" ->
      """SELECT c_custkey, c_mktsegment AS seg,
        |  TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
        |  CASE WHEN c_custkey % 7 = 0 OR c_custkey % 5 = 0
        |       THEN TIMESTAMP '2024-02-01 00:00:00'
        |       ELSE CAST(NULL AS TIMESTAMP) END AS valid_to,
        |  false AS dbt_is_deleted
        |FROM customer
        |UNION ALL
        |SELECT c_custkey, c_mktsegment AS seg,
        |  TIMESTAMP '2024-02-01 00:00:00' AS valid_from,
        |  CAST(NULL AS TIMESTAMP) AS valid_to,
        |  true AS dbt_is_deleted
        |FROM customer WHERE c_custkey % 7 = 0
        |UNION ALL
        |SELECT c_custkey, 'MOVED' AS seg,
        |  TIMESTAMP '2024-02-01 00:00:00' AS valid_from,
        |  CAST(NULL AS TIMESTAMP) AS valid_to,
        |  false AS dbt_is_deleted
        |FROM customer WHERE c_custkey % 5 = 0 AND c_custkey % 7 <> 0
        |ORDER BY c_custkey, valid_from""".stripMargin,

    "test_unique" ->
      """SELECT l_orderkey, count(*) AS n
        |FROM lineitem GROUP BY l_orderkey HAVING count(*) > 1
        |ORDER BY l_orderkey""".stripMargin,

    "test_not_null" ->
      """SELECT o_orderkey, nullif(o_orderstatus, 'O') AS maybe
        |FROM orders WHERE nullif(o_orderstatus, 'O') IS NULL
        |ORDER BY o_orderkey""".stripMargin,

    "test_accepted_values" ->
      """SELECT o_orderkey, o_orderstatus
        |FROM orders
        |WHERE o_orderstatus NOT IN ('O', 'F') OR o_orderstatus IS NULL
        |ORDER BY o_orderkey""".stripMargin,

    "test_relationships" ->
      """SELECT DISTINCT o_custkey
        |FROM orders
        |WHERE o_custkey IS NOT NULL
        |  AND o_custkey NOT IN
        |    (SELECT c_custkey FROM customer WHERE c_custkey % 3 <> 0)
        |ORDER BY o_custkey""".stripMargin,

    "test_singular" ->
      """SELECT o.o_orderkey, o.o_totalprice
        |FROM orders o
        |LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem
        |           WHERE l_quantity > 30) l
        |  ON o.o_orderkey = l.l_orderkey
        |WHERE l.l_orderkey IS NULL
        |ORDER BY o.o_orderkey""".stripMargin,

    "run_select_dag" ->
      """SELECT o_custkey, count(*) AS n_f
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "run_select_tags" ->
      """SELECT o_custkey, count(*) AS n_o,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_o
        |FROM orders WHERE o_orderstatus = 'O'
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "run_vars" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, 'vars_ok' AS label
        |FROM orders
        |WHERE o_orderstatus = 'F' AND o_totalprice < 50000
        |ORDER BY o_orderkey""".stripMargin,

    "mat_compact" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "run_file_format_delta" ->
      """SELECT c_custkey, c_mktsegment,
        |  CASE WHEN c_custkey % 3 = 0 THEN c_acctbal ELSE 0.0 END AS bal
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "run_file_format_iceberg" ->
      """SELECT c_custkey, c_mktsegment,
        |  CASE WHEN c_custkey % 3 = 0 THEN c_acctbal ELSE 0.0 END AS bal
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "run_sql_incremental_predicate" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
        |  CASE WHEN o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |       THEN 1 ELSE 2 END AS batch_no
        |FROM orders
        |WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |ORDER BY o_orderkey""".stripMargin,

    "mat_incremental_microbatch" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-04-10 00:00:00'
        |ORDER BY o_orderkey""".stripMargin,

    "run_hooks_audit" ->
      """SELECT 'hk_agg' AS model_name,
        |  CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_rows
        |FROM orders ORDER BY model_name""".stripMargin,

    "run_clone_state" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_orderkey""".stripMargin,

    "run_docs_catalog" ->
      """SELECT * FROM (
        |  SELECT 'dc_agg' AS name, 'model' AS kind,
        |    (SELECT count(DISTINCT o_custkey) FROM orders) AS row_count
        |  UNION ALL
        |  SELECT 'dc_f' AS name, 'model' AS kind,
        |    (SELECT count(*) FROM orders WHERE o_orderstatus = 'F')
        |      AS row_count
        |) ORDER BY name""".stripMargin,

    "run_defer_state" ->
      """SELECT o_custkey, count(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "test_store_failures" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE o_orderstatus NOT IN ('O', 'F') OR o_orderstatus IS NULL
        |ORDER BY o_orderkey""".stripMargin,

    "run_contract_enforced" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CAST(o_totalprice AS DOUBLE) AS price
        |FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY o_orderkey""".stripMargin,

    "test_unit" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // every semantic-layer metric recomputed directly from orders:
    // simple = the measure's agg, ratio = double division, derived =
    // the expr over its input metrics
    "run_semantic_metrics" ->
      """WITH base AS (
        |  SELECT o_orderstatus AS status, o_custkey AS cust,
        |         CAST(o_totalprice AS DECIMAL(12,2)) AS amount
        |  FROM orders
        |), agg AS (
        |  SELECT status,
        |         SUM(amount) AS revenue_d,
        |         COUNT(amount) AS n_orders,
        |         COUNT(DISTINCT cust) AS customers,
        |         MAX(amount) AS mx, MIN(amount) AS mn
        |  FROM base GROUP BY status
        |)
        |SELECT status,
        |  CAST(revenue_d AS DOUBLE) AS revenue,
        |  CAST(revenue_d AS DOUBLE) / CAST(n_orders AS DOUBLE)
        |    AS avg_order_value,
        |  customers,
        |  CAST(mx - mn AS DOUBLE) AS price_spread
        |FROM agg ORDER BY status""".stripMargin,

    // every final state of the replayed dbt transcript, recomputed
    // from the raw orders table: orders_part keeps run-1 (half-data)
    // rows for statuses outside (O,F) — dynamic INSERT OVERWRITE only
    // replaced the batch's partitions — and full-data rows for O,F;
    // the scalar subqueries pin the append/table/view final states
    "run_thrift_dbt_transcript" ->
      """WITH stg AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price
        |  FROM orders),
        |part AS (
        |  SELECT o_orderstatus, COUNT(*) AS n,
        |    CAST(SUM(CAST(price AS DECIMAL(12,2))) AS DOUBLE) AS total
        |  FROM stg WHERE o_orderstatus IN ('O','F')
        |  GROUP BY o_orderstatus
        |  UNION ALL
        |  SELECT o_orderstatus, COUNT(*) AS n,
        |    CAST(SUM(CAST(price AS DECIMAL(12,2))) AS DOUBLE) AS total
        |  FROM stg WHERE o_orderkey % 2 = 0
        |    AND o_orderstatus NOT IN ('O','F')
        |  GROUP BY o_orderstatus)
        |SELECT p.o_orderstatus, p.n, p.total,
        |  (SELECT COUNT(*) FROM stg) AS inc_rows,
        |  (SELECT COUNT(DISTINCT o_orderstatus) FROM stg) AS tbl_groups,
        |  (SELECT COUNT(*) FROM stg) AS view_rows
        |FROM part p ORDER BY p.o_orderstatus""".stripMargin,

    // the qualified-name SQL join of the two same-named models
    "run_schema_namespace" ->
      """WITH sq AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |  FROM orders GROUP BY o_custkey),
        |fq AS (
        |  SELECT o_custkey, count(*) AS n_closed
        |  FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey)
        |SELECT sq.o_custkey, sq.total, fq.n_closed
        |FROM sq JOIN fq ON sq.o_custkey = fq.o_custkey
        |ORDER BY sq.o_custkey""".stripMargin,

    "run_project_artifact" ->
      """SELECT CASE o_orderstatus WHEN 'O' THEN 'open'
        |       WHEN 'F' THEN 'filled' ELSE 'pending' END AS status_name,
        |  count(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1 ORDER BY status_name""".stripMargin,

    "run_select_dag_sql" ->
      """SELECT o_custkey, count(*) AS n_f,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_f
        |FROM orders
        |WHERE o_orderstatus = 'F'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "source_freshness" ->
      """SELECT 'events' AS source, max(ts) AS max_loaded_at,
        |  CAST(floor(date_part('epoch', TIMESTAMP '1998-08-01 00:00:00')) AS BIGINT)
        |    - CAST(floor(date_part('epoch', max(ts))) AS BIGINT) AS age_sec,
        |  CASE
        |    WHEN max(ts) IS NULL
        |      OR CAST(floor(date_part('epoch', TIMESTAMP '1998-08-01 00:00:00')) AS BIGINT)
        |         - CAST(floor(date_part('epoch', max(ts))) AS BIGINT) > 2592000 THEN 'error'
        |    WHEN CAST(floor(date_part('epoch', TIMESTAMP '1998-08-01 00:00:00')) AS BIGINT)
        |         - CAST(floor(date_part('epoch', max(ts))) AS BIGINT) > 604800 THEN 'warn'
        |    ELSE 'pass' END AS status
        |FROM events""".stripMargin
  )
}
