package graft.queries

import graft.{QueryGroup, Tables}
import graft.Tables.{dec2, one2, asDouble}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** SURVEY §2.1 scans/sources/sinks + §2.2 projection/filter.
  *
  * The reference delegates all of this to Spark via dbt-spark
  * (reference `dbtoperator.py:273-274`); here it is the native
  * DataFrame surface. Every query carries an explicit total ORDER BY
  * so the DuckDB oracle hash-compare is deterministic.
  */
object Scans extends QueryGroup {

  /** dbt `seed` fixture: a tiny CSV with declared schema
    * (reference `dbtoperator.py:46,324` — seeds are just another dbt
    * command). Embedded so the oracle can mirror it as a VALUES list.
    */
  val seedCsvLines: Seq[String] = Seq(
    "id,code,tier",
    "1,DE,1",
    "2,FR,1",
    "3,US,2",
    "4,JP,2",
    "5,BR,3",
    "6,IN,3",
    "7,CN,1",
    "8,AU,2"
  )
  val seedSchema: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("code", StringType),
    StructField("tier", IntegerType)
  ))

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** This build ships Avro's FileFormat inside spark-sql but without
    * the `avro` short-name service registration (it normally rides
    * the external spark-avro module), so the datasource is addressed
    * by class name.
    */
  private val AvroFmt = "org.apache.spark.sql.avro.AvroFileFormat"

  override def queries: Map[String, Q] = Map(
    "scan_parquet" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")),

    // Delta-format read interop (graft.sources.DeltaRead — the public
    // delta.io log protocol, no Delta jar): a two-commit Delta table
    // is generated from `nation` (commit 1 REMOVES commit 0's file
    // and re-adds the rows split across two files), then scanned via
    // the log replay. The oracle is plain `nation` — a reader that
    // ignored the remove tombstone would dup 10 rows and hash-fail.
    "scan_delta" -> ((s, d) => {
      val dir = tmpDir("graft_scan_delta")
      val nat = Tables.nation(s, d)
      graft.sources.DeltaWrite.commit(dir, 0L, Seq(
        "part-000.parquet" -> nat.filter(col("n_nationkey") < 10)))
      graft.sources.DeltaWrite.commit(dir, 1L,
        adds = Seq(
          "part-001.parquet" -> nat.filter(col("n_nationkey") < 15),
          "part-002.parquet" -> nat.filter(col("n_nationkey") >= 15)),
        removes = Seq("part-000.parquet"))
      graft.sources.DeltaRead.readDeltaTable(s, dir)
        .orderBy("n_nationkey")
    }),

    // Deletion-vector read interop: `nation` lands as ONE sorted
    // data file, then a second commit attaches a DV masking the rows
    // whose n_nationkey is divisible by 5 (protocol reader 3 +
    // deletionVectors feature, roaring-bitmap sidecar). A reader that
    // ignored the DV would return 5 extra rows and hash-fail.
    "scan_delta_dv" -> ((s, d) => {
      val dir = tmpDir("graft_scan_delta_dv")
      val nat = Tables.nation(s, d)
      graft.sources.DeltaWrite.commit(dir, 0L, Seq(
        "part-000.parquet" ->
          nat.coalesce(1).sortWithinPartitions("n_nationkey")))
      // physical row order in the single sorted file = key order
      val keys = nat.select("n_nationkey").orderBy("n_nationkey")
        .collect().map(_.getAs[Number](0).longValue)
      val deleted = keys.zipWithIndex
        .collect { case (k, i) if k % 5 == 0 => i.toLong }.toSeq
      graft.sources.DeltaWrite.commitDeletionVector(
        dir, 1L, "part-000.parquet", deleted)
      graft.sources.DeltaRead.readDeltaTable(s, dir)
        .orderBy("n_nationkey")
    }),

    // Change-Data-Feed read interop: a three-commit Delta table with
    // `delta.enableChangeDataFeed=true` — commit 0 inserts nation in
    // two files, commit 1 removes one (derived deletes), commit 2 is
    // an UPDATE with `cdc` pre/post-image files under `_change_data/`
    // (whose add/remove rewrite actions a CDF reader must IGNORE).
    // readChanges replays the range into typed change rows; a reader
    // that double-counted the cdc commit's rewrite would emit the
    // whole table again as inserts+deletes and hash-fail.
    "scan_delta_cdf" -> ((s, d) => {
      val dir = tmpDir("graft_scan_delta_cdf")
      val nat = Tables.nation(s, d)
      val low = nat.filter(col("n_nationkey") < 20)
      graft.sources.DeltaWrite.commit(dir, 0L, Seq(
        "part-000.parquet" -> low,
        "part-001.parquet" -> nat.filter(col("n_nationkey") >= 20)),
        configuration = Map("delta.enableChangeDataFeed" -> "true"))
      graft.sources.DeltaWrite.commit(dir, 1L, adds = Nil,
        removes = Seq("part-001.parquet"))
      val hit = low.filter(col("n_nationkey") % 7 === 0)
      val pre = hit.withColumn("_change_type", lit("update_preimage"))
      val post = hit
        .withColumn("n_regionkey", (col("n_regionkey") + lit(10)).cast(IntegerType))
        .withColumn("_change_type", lit("update_postimage"))
      val rewritten = low.withColumn("n_regionkey",
        when(col("n_nationkey") % 7 === 0, col("n_regionkey") + lit(10))
          .otherwise(col("n_regionkey")).cast(IntegerType))
      graft.sources.DeltaWrite.commitCdc(dir, 2L,
        cdcFiles = Seq("cdc-000.parquet" -> pre.unionByName(post)),
        adds = Seq("part-002.parquet" -> rewritten),
        removes = Seq("part-000.parquet"))
      graft.sources.DeltaRead.readChanges(s, dir, 0L)
        .orderBy("_commit_version", "_change_type", "n_nationkey")
    }),

    // Iceberg-format read interop (graft.sources.IcebergRead — the
    // public iceberg.apache.org table spec, no Iceberg jar): three
    // commits build a table from `nation` (commit 2 REMOVES commit
    // 1's file and re-adds split files; commit 3 masks the rows with
    // n_nationkey % 6 == 0 via v2 POSITION DELETES), then the
    // metadata/manifest replay scans it. A reader that ignored remove
    // status or delete manifests would dup or resurrect rows and
    // hash-fail.
    "scan_iceberg" -> ((s, d) => {
      val dir = tmpDir("graft_scan_iceberg")
      val nat = Tables.nation(s, d)
      def sorted(df: org.apache.spark.sql.DataFrame) =
        df.coalesce(1).sortWithinPartitions("n_nationkey")
      graft.sources.IcebergWrite.commit(dir, Seq(
        "f0.parquet" -> sorted(nat.filter(col("n_nationkey") < 10))))
      graft.sources.IcebergWrite.commit(dir,
        adds = Seq(
          "f1.parquet" -> sorted(nat.filter(col("n_nationkey") < 15)),
          "f2.parquet" -> sorted(nat.filter(col("n_nationkey") >= 15))),
        removes = Seq("f0.parquet"))
      val keys = nat.select("n_nationkey").orderBy("n_nationkey")
        .collect().map(_.getAs[Number](0).longValue).toSeq
      def posOf(ks: Seq[Long]) = ks.zipWithIndex
        .collect { case (k, i) if k % 6 == 0 => i.toLong }
      val dels = Map(
        "f1.parquet" -> posOf(keys.filter(_ < 15)),
        "f2.parquet" -> posOf(keys.filter(_ >= 15)))
        .filter(_._2.nonEmpty)
      graft.sources.IcebergWrite.commit(dir, Nil, positionDeletes = dels)
      graft.sources.IcebergRead.readIcebergTable(s, dir)
        .orderBy("n_nationkey")
    }),

    // Iceberg CHANGELOG read interop (the `create_changelog_view`
    // contract): snapshot 1 inserts nation in two files, snapshot 2
    // rewrites the >=10 half (whole-file DELETE + INSERT of the same
    // rows — a reader diffing live sets must emit BOTH), snapshot 3
    // position-deletes the %6 rows of the <10 file (row-level DELETE
    // rows with the deleted VALUES re-read from the data file),
    // snapshot 4 is a Flink-style EQUALITY delete of keys 1 and 13 —
    // its DELETE rows replay the value predicate against snapshot
    // 3's live rows.
    "scan_iceberg_changes" -> ((s, d) => {
      val dir = tmpDir("graft_scan_iceberg_changes")
      val nat = Tables.nation(s, d)
      def sorted(df: org.apache.spark.sql.DataFrame) =
        df.coalesce(1).sortWithinPartitions("n_nationkey")
      graft.sources.IcebergWrite.commit(dir, Seq(
        "f0.parquet" -> sorted(nat.filter(col("n_nationkey") < 10)),
        "f1.parquet" -> sorted(nat.filter(col("n_nationkey") >= 10))))
      graft.sources.IcebergWrite.commit(dir,
        adds = Seq(
          "f2.parquet" -> sorted(nat.filter(col("n_nationkey").between(10, 17))),
          "f3.parquet" -> sorted(nat.filter(col("n_nationkey") >= 18))),
        removes = Seq("f1.parquet"))
      val keys = nat.select("n_nationkey").orderBy("n_nationkey")
        .collect().map(_.getAs[Number](0).longValue).toSeq
      val dels = keys.filter(_ < 10).zipWithIndex
        .collect { case (k, i) if k % 6 == 0 => i.toLong }
      graft.sources.IcebergWrite.commit(dir, Nil,
        positionDeletes = Map("f0.parquet" -> dels))
      graft.sources.IcebergWrite.commit(dir, Nil,
        equalityDelete = Some(Seq("n_nationkey") ->
          nat.filter(col("n_nationkey").isin(1, 13))
            .select("n_nationkey")))
      graft.sources.IcebergRead.readChanges(s, dir, 1L)
        .orderBy("_commit_snapshot_id", "_change_type", "n_nationkey")
    }),

    // dbt-spark `merge` strategy against a REAL Delta table (the
    // round-trip the reference's Delta pin exists for,
    // dbtoperator.py:274): batch 1 zeroes every balance (creates the
    // table, key-hash bucketed), batch 2 merges real balances for
    // custkey % 3 = 0 — one atomic commit rewrites exactly the
    // touched files, and the final state reads back through
    // DeltaRead (or any Delta reader). Final state must equal the
    // copy-on-write merge SQL.
    "mat_incremental_merge_delta" -> ((s, d) => {
      val dir = tmpDir("graft_mat_merge_delta")
      val cust = Tables.customer(s, d)
      graft.sources.DeltaWrite.merge(s, dir,
        cust.select(col("c_custkey"), col("c_mktsegment"),
          lit(0.0).as("bal")),
        Seq("c_custkey"))
      graft.sources.DeltaWrite.merge(s, dir,
        cust.filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey"), col("c_mktsegment"),
            col("c_acctbal").as("bal")),
        Seq("c_custkey"))
      graft.sources.DeltaRead.readDeltaTable(s, dir).orderBy("c_custkey")
    }),

    // The MERGE-ON-READ form of the same upsert: instead of
    // copy-on-write rewrites, each merge writes ONE packed DV file
    // masking the matched rows + ONE batch data file — O(batch)
    // commit cost, data files never rewritten (require-asserted
    // here; DeltaSpec proves the byte identity, mask merging and
    // protocol upgrade). Any DV-speaking Delta reader sees the same
    // final state, so the same oracle as the CoW merge.
    "mat_incremental_merge_delta_mor" -> ((s, d) => {
      val dir = tmpDir("graft_mat_merge_delta_mor")
      val cust = Tables.customer(s, d)
      graft.sources.DeltaWrite.mergeOnRead(s, dir,
        cust.select(col("c_custkey"), col("c_mktsegment"),
          lit(0.0).as("bal")),
        Seq("c_custkey"))
      def dataFiles(): Map[String, Long] = {
        import scala.jdk.CollectionConverters._
        val w = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
        try w.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(f => f.getFileName.toString -> java.nio.file.Files.size(f))
          .toMap
        finally w.close()
      }
      val before = dataFiles()
      graft.sources.DeltaWrite.mergeOnRead(s, dir,
        cust.filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey"), col("c_mktsegment"),
            col("c_acctbal").as("bal")),
        Seq("c_custkey"))
      val after = dataFiles()
      before.foreach { case (f, sz) => require(after.get(f).contains(sz),
        s"merge-on-read rewrote data file $f") }
      graft.sources.DeltaRead.readDeltaTable(s, dir).orderBy("c_custkey")
    }),

    // The same dbt-spark merge arriving as SQL TEXT — the literal
    // statement dbt's `merge` incremental strategy emits over Thrift
    // (dbtoperator.py:274,342-360): `MERGE INTO ... USING ... WHEN
    // MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`.
    // Vanilla Spark cannot execute MERGE against v1 relations; the
    // MergeIntoRoute resolution rule (GraftSqlExtensions) rewrites
    // the dbt shape into the engine's staged CoW Delta merge. Final
    // state == the programmatic merge's, so the same oracle.
    "run_sql_merge_into" -> ((s, d) => {
      val dir = tmpDir("graft_sql_merge_into")
      val cust = Tables.customer(s, d)
      graft.sources.DeltaWrite.merge(s, dir,
        cust.select(col("c_custkey"), col("c_mktsegment"),
          lit(0.0).as("bal")),
        Seq("c_custkey"))
      // the target exists as a relation (dbt's contract) + a route
      graft.sources.DeltaRead.readDeltaTable(s, dir)
        .createOrReplaceTempView("sql_merge_tgt")
      graft.gateway.MergeRoutes.register("sql_merge_tgt",
        (sess, batch, keys) =>
          graft.sources.DeltaWrite.merge(sess, dir, batch, keys))
      cust.filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"), col("c_mktsegment"),
          col("c_acctbal").as("bal"))
        .createOrReplaceTempView("sql_merge_src")
      // finally: a failure mid-statement must not leak the JVM-global
      // route into later keys of the same suite run
      try s.sql(
        """MERGE INTO sql_merge_tgt AS DBT_INTERNAL_DEST
          |USING sql_merge_src AS DBT_INTERNAL_SOURCE
          |ON DBT_INTERNAL_DEST.c_custkey = DBT_INTERNAL_SOURCE.c_custkey
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
      finally graft.gateway.MergeRoutes.unregister("sql_merge_tgt")
      graft.sources.DeltaRead.readDeltaTable(s, dir).orderBy("c_custkey")
    }),

    // dbt's `incremental_predicates` config: the merge macro appends
    // extra NON-equality conjuncts to the ON clause (`... AND
    // DBT_INTERNAL_DEST.ts >= '...'`) precisely to prune big merges.
    // MergeIntoRoute splits the ON condition into equality keys +
    // residual; the engine's Delta merge (a) PRUNES its touched-file
    // probe through the log's per-file stats — files whose ts bounds
    // fall outside the window are never opened (GatewaySpec proves it
    // with hidden files) — and (b) narrows the matched set to
    // in-window rows (SQL MERGE semantics). On this data every match
    // is in-window, so the final state equals the plain merge's — the
    // oracle.
    "run_sql_merge_predicates" -> ((s, d) => {
      val dir = tmpDir("graft_sql_merge_pred")
      val cust = Tables.customer(s, d)
      graft.sources.DeltaWrite.merge(s, dir,
        cust.select(col("c_custkey"), col("c_mktsegment"),
          lit(0.0).as("bal"),
          date_add(lit("2024-01-01").cast(DateType),
            (col("c_custkey") % 10).cast(IntegerType))
            .cast(TimestampType).as("ts")),
        Seq("c_custkey"))
      graft.sources.DeltaRead.readDeltaTable(s, dir)
        .createOrReplaceTempView("sql_merge_pred_tgt")
      graft.gateway.MergeRoutes.register("sql_merge_pred_tgt",
        new graft.gateway.MergeRoutes.Handler {
          override def apply(sess: SparkSession, batch: DataFrame,
              keys: Seq[String]): Long =
            graft.sources.DeltaWrite.merge(sess, dir, batch, keys)
          override def supportsResidual: Boolean = true
          override def mergeWithResidual(sess: SparkSession,
              batch: DataFrame, keys: Seq[String],
              residualSql: String): Long =
            graft.sources.DeltaWrite.merge(sess, dir, batch, keys,
              residualPredicate = Some(residualSql))
        })
      cust.filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"), col("c_mktsegment"),
          col("c_acctbal").as("bal"),
          lit("2024-02-01").cast(TimestampType).as("ts"))
        .createOrReplaceTempView("sql_merge_pred_src")
      try s.sql(
        """MERGE INTO sql_merge_pred_tgt AS DBT_INTERNAL_DEST
          |USING sql_merge_pred_src AS DBT_INTERNAL_SOURCE
          |ON (DBT_INTERNAL_DEST.c_custkey = DBT_INTERNAL_SOURCE.c_custkey)
          |  AND (DBT_INTERNAL_DEST.ts >= timestamp'2024-01-01 00:00:00')
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
      finally graft.gateway.MergeRoutes.unregister("sql_merge_pred_tgt")
      graft.sources.DeltaRead.readDeltaTable(s, dir).orderBy("c_custkey")
    }),

    // SELECT ... VERSION AS OF over SQL text: Spark parses the
    // time-travel suffix but cannot execute it on the engine's
    // relations; TimeTravelRoute rewrites a version-pinned read of a
    // routed relation to the engine's bounded log replay
    // (DeltaRead.readDeltaTable versionAsOf). Version 0 = creation,
    // version 1 = after the merge — both read in ONE statement and
    // tagged, so the oracle checks the pinned histories side by side.
    "run_sql_time_travel" -> ((s, d) => {
      val dir = tmpDir("graft_sql_time_travel")
      val cust = Tables.customer(s, d)
      graft.sources.DeltaWrite.merge(s, dir,
        cust.select(col("c_custkey"), lit(0.0).as("bal")),
        Seq("c_custkey"))
      graft.sources.DeltaWrite.merge(s, dir,
        cust.filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey"), col("c_acctbal").as("bal")),
        Seq("c_custkey"))
      // NOTE no LOCAL temp view: Spark's own ResolveRelations throws
      // its unsupported-time-travel error the moment the inner name
      // resolves to a session view — before any injected rule runs.
      // Published relations resolve through the GLOBAL-view fallback
      // (the Thrift production path), where the name reaches
      // TimeTravelRoute still unresolved and routes cleanly.
      graft.gateway.TimeTravelRoutes.register("sql_tt_tgt",
        (sess, v) => graft.sources.DeltaRead.readDeltaTable(
          sess, dir, versionAsOf = Some(v.toLong)))
      try s.sql(
        """SELECT 0 AS ver, c_custkey, bal
          |FROM sql_tt_tgt VERSION AS OF 0
          |UNION ALL
          |SELECT 1 AS ver, c_custkey, bal
          |FROM sql_tt_tgt VERSION AS OF 1
          |ORDER BY ver, c_custkey""".stripMargin)
      finally graft.gateway.TimeTravelRoutes.unregister("sql_tt_tgt")
    }),

    // `ALTER TABLE ... ADD COLUMNS` over SQL text (dbt-spark's
    // on_schema_change=append_new_columns wire statement):
    // SchemaDdlRoute lands it on the engine's schema evolution — one
    // metaData-only Delta commit widening the schema, carried files
    // surfacing NULL via schema-on-read — and the FOLLOW-UP merge
    // batch then matches the widened table exactly (no allowEvolution
    // needed), proving the ALTER took effect. Old rows read NULL in
    // the new column; merged rows carry it.
    "run_sql_alter_add_columns" -> ((s, d) => {
      val dir = tmpDir("graft_sql_alter_cols")
      val cust = Tables.customer(s, d)
      graft.sources.DeltaWrite.merge(s, dir,
        cust.select(col("c_custkey"), col("c_mktsegment"),
          lit(0.0).as("bal")),
        Seq("c_custkey"))
      // NOTE no LOCAL temp view: Spark's own ALTER TABLE resolution
      // rejects views before injected rules run — published names
      // reach SchemaDdlRoute unresolved (the Thrift path), same as
      // time travel
      graft.gateway.DdlRoutes.register("sql_alter_tgt",
        (sess, fields) =>
          graft.sources.DeltaWrite.addColumns(sess, dir, fields))
      try s.sql(
        "ALTER TABLE sql_alter_tgt ADD COLUMNS (note STRING)").collect()
      finally graft.gateway.DdlRoutes.unregister("sql_alter_tgt")
      graft.sources.DeltaWrite.merge(s, dir,
        cust.filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey"), col("c_mktsegment"),
            col("c_acctbal").as("bal"), lit("updated").as("note")),
        Seq("c_custkey"))
      graft.sources.DeltaRead.readDeltaTable(s, dir).orderBy("c_custkey")
    }),

    // `ALTER TABLE ... DROP COLUMNS` over SQL text (dbt-spark's
    // on_schema_change=sync_all_columns REMOVE leg): SchemaDdlRoute
    // lands it on the engine's schema evolution — one metaData-only
    // Delta commit NARROWING the schema (schema-on-read: carried
    // files' extra column stops being projected) — and the follow-up
    // merge batch matches the narrowed table exactly.
    "run_sql_alter_drop_columns" -> ((s, d) => {
      val dir = tmpDir("graft_sql_alter_drop")
      val cust = Tables.customer(s, d)
      graft.sources.DeltaWrite.merge(s, dir,
        cust.select(col("c_custkey"), col("c_mktsegment"),
          lit("stale").as("note"), lit(0.0).as("bal")),
        Seq("c_custkey"))
      graft.gateway.DdlRoutes.registerDrop("sql_alter_drop_tgt",
        (sess, cols) =>
          graft.sources.DeltaWrite.dropColumns(sess, dir, cols))
      try s.sql(
        "ALTER TABLE sql_alter_drop_tgt DROP COLUMNS (note)").collect()
      finally graft.gateway.DdlRoutes.unregisterDrop("sql_alter_drop_tgt")
      graft.sources.DeltaWrite.merge(s, dir,
        cust.filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey"), col("c_mktsegment"),
            col("c_acctbal").as("bal")),
        Seq("c_custkey"))
      graft.sources.DeltaRead.readDeltaTable(s, dir).orderBy("c_custkey")
    }),

    // MERGE with a `WHEN MATCHED ... THEN DELETE` leg, FUSED: the
    // matched delete rows' keys ship as a bounded keys-in-batch
    // predicate INTO the engine merge itself, so deletes (DV masks on
    // files the batch doesn't touch, row drops in rewritten files)
    // and the update/insert batch land in ONE atomic Delta commit —
    // SQL MERGE's never-a-partial-merge contract
    // (first-matching-action semantics across the legs). The oracle
    // replays the same statement as the equivalent anti-join +
    // conditional projection.
    "run_sql_merge_delete" -> ((s, d) => {
      val dir = tmpDir("graft_sql_merge_del")
      val cust = Tables.customer(s, d)
      graft.sources.DeltaWrite.merge(s, dir,
        cust.select(col("c_custkey"), col("c_mktsegment"),
          col("c_acctbal").as("bal")),
        Seq("c_custkey"))
      graft.sources.DeltaRead.readDeltaTable(s, dir)
        .createOrReplaceTempView("sql_merge_del_tgt")
      graft.gateway.MergeRoutes.register("sql_merge_del_tgt",
        new graft.gateway.MergeRoutes.Handler {
          override def apply(sess: SparkSession, batch: DataFrame,
              keys: Seq[String]): Long =
            graft.sources.DeltaWrite.merge(sess, dir, batch, keys)
          override def supportsMergeDelete: Boolean = true
          override def mergeWithDelete(sess: SparkSession,
              batch: DataFrame, keys: Seq[String],
              deletePredicateSql: String): Long =
            graft.sources.DeltaWrite.merge(sess, dir, batch, keys,
              deletePredicate = Some(deletePredicateSql))
        })
      // source: %4=0 keys delete, %4=1 keys double, fresh shifted
      // keys (%10=2) insert
      cust.filter(col("c_custkey") % 4 === 0)
        .select(col("c_custkey"), col("c_mktsegment"),
          lit(0.0).as("bal"), lit("del").as("op"))
        .unionByName(cust.filter(col("c_custkey") % 4 === 1)
          .select(col("c_custkey"), col("c_mktsegment"),
            (col("c_acctbal") * 2).as("bal"), lit("upd").as("op")))
        .unionByName(cust.filter(col("c_custkey") % 10 === 2)
          .select((col("c_custkey") + lit(10000000L)).as("c_custkey"),
            col("c_mktsegment"), col("c_acctbal").as("bal"),
            lit("ins").as("op")))
        .createOrReplaceTempView("sql_merge_del_src")
      try s.sql(
        """MERGE INTO sql_merge_del_tgt AS DBT_INTERNAL_DEST
          |USING sql_merge_del_src AS DBT_INTERNAL_SOURCE
          |ON DBT_INTERNAL_DEST.c_custkey = DBT_INTERNAL_SOURCE.c_custkey
          |WHEN MATCHED AND DBT_INTERNAL_SOURCE.op = 'del' THEN DELETE
          |WHEN MATCHED THEN UPDATE SET bal = DBT_INTERNAL_SOURCE.bal
          |WHEN NOT MATCHED THEN INSERT (c_custkey, c_mktsegment, bal)
          |  VALUES (DBT_INTERNAL_SOURCE.c_custkey,
          |          DBT_INTERNAL_SOURCE.c_mktsegment,
          |          DBT_INTERNAL_SOURCE.bal)""".stripMargin).collect()
      finally {
        graft.gateway.MergeRoutes.unregister("sql_merge_del_tgt")
        s.catalog.dropTempView("sql_merge_del_tgt")
        s.catalog.dropTempView("sql_merge_del_src")
      }
      graft.sources.DeltaRead.readDeltaTable(s, dir).orderBy("c_custkey")
    }),

    // The fused merge-delete COMPOSING with Change Data Feed: the
    // same single commit carries the DV masks / CoW rewrites / upsert
    // adds AND a cdc file whose rows are the TRUE row-level changes —
    // including the deleted rows' pre-images (computed from the same
    // pruned scan the DV build runs). The key returns the commit's
    // readChanges rows, so the oracle checks the full CDF contract:
    // delete pre-images, update pre/post-images, inserts.
    "run_sql_merge_delete_cdf" -> ((s, d) => {
      val dir = tmpDir("graft_sql_merge_del_cdf")
      val cust = Tables.customer(s, d)
      graft.sources.DeltaWrite.merge(s, dir,
        cust.select(col("c_custkey"), col("c_mktsegment"),
          col("c_acctbal").as("bal")),
        Seq("c_custkey"), enableCdf = true)
      graft.sources.DeltaRead.readDeltaTable(s, dir)
        .createOrReplaceTempView("sql_merge_del_cdf_tgt")
      graft.gateway.MergeRoutes.register("sql_merge_del_cdf_tgt",
        new graft.gateway.MergeRoutes.Handler {
          override def apply(sess: SparkSession, batch: DataFrame,
              keys: Seq[String]): Long =
            graft.sources.DeltaWrite.merge(sess, dir, batch, keys)
          override def supportsMergeDelete: Boolean = true
          override def mergeWithDelete(sess: SparkSession,
              batch: DataFrame, keys: Seq[String],
              deletePredicateSql: String): Long =
            graft.sources.DeltaWrite.merge(sess, dir, batch, keys,
              deletePredicate = Some(deletePredicateSql))
        })
      cust.filter(col("c_custkey") % 4 === 0)
        .select(col("c_custkey"), col("c_mktsegment"),
          lit(0.0).as("bal"), lit("del").as("op"))
        .unionByName(cust.filter(col("c_custkey") % 4 === 1)
          .select(col("c_custkey"), col("c_mktsegment"),
            (col("c_acctbal") * 2).as("bal"), lit("upd").as("op")))
        .unionByName(cust.filter(col("c_custkey") % 10 === 2)
          .select((col("c_custkey") + lit(10000000L)).as("c_custkey"),
            col("c_mktsegment"), col("c_acctbal").as("bal"),
            lit("ins").as("op")))
        .createOrReplaceTempView("sql_merge_del_cdf_src")
      try s.sql(
        """MERGE INTO sql_merge_del_cdf_tgt AS DBT_INTERNAL_DEST
          |USING sql_merge_del_cdf_src AS DBT_INTERNAL_SOURCE
          |ON DBT_INTERNAL_DEST.c_custkey = DBT_INTERNAL_SOURCE.c_custkey
          |WHEN MATCHED AND DBT_INTERNAL_SOURCE.op = 'del' THEN DELETE
          |WHEN MATCHED THEN UPDATE SET bal = DBT_INTERNAL_SOURCE.bal
          |WHEN NOT MATCHED THEN INSERT (c_custkey, c_mktsegment, bal)
          |  VALUES (DBT_INTERNAL_SOURCE.c_custkey,
          |          DBT_INTERNAL_SOURCE.c_mktsegment,
          |          DBT_INTERNAL_SOURCE.bal)""".stripMargin).collect()
      finally {
        graft.gateway.MergeRoutes.unregister("sql_merge_del_cdf_tgt")
        s.catalog.dropTempView("sql_merge_del_cdf_tgt")
        s.catalog.dropTempView("sql_merge_del_cdf_src")
      }
      // ONE table version for the whole statement (SQL MERGE's
      // atomicity — delete legs included): creation + the merge
      val commits = {
        val st = java.nio.file.Files.list(
          java.nio.file.Paths.get(dir, "_delta_log"))
        try st.filter(p =>
          p.getFileName.toString.matches("\\d{20}\\.json")).count()
        finally st.close()
      }
      require(commits == 2L,
        s"fused CDF merge-delete must commit exactly one version " +
          s"(found ${commits - 1} post-creation): $dir")
      graft.sources.DeltaRead.readChanges(s, dir, 1L)
        .select(col("c_custkey"), col("c_mktsegment"), col("bal"),
          col("_change_type"))
        .orderBy("_change_type", "c_custkey")
    }),

    // The Iceberg side of the FUSED merge-delete: the matched-DELETE
    // leg rewrites its files copy-on-write (Iceberg's native CoW
    // delete shape — no delete file written, so later CoW merges stay
    // unblocked) in the SAME atomic snapshot as the update/insert
    // batch; the delete probe prunes through manifest column bounds.
    // Same statement shape and oracle as the Delta key.
    "run_sql_merge_delete_iceberg" -> ((s, d) => {
      val dir = tmpDir("graft_sql_merge_del_ice")
      val cust = Tables.customer(s, d)
      graft.sources.IcebergWrite.merge(s, dir,
        cust.select(col("c_custkey"), col("c_mktsegment"),
          col("c_acctbal").as("bal")),
        Seq("c_custkey"))
      graft.sources.IcebergRead.readIcebergTable(s, dir)
        .createOrReplaceTempView("sql_mdel_ice_tgt")
      graft.gateway.MergeRoutes.register("sql_mdel_ice_tgt",
        new graft.gateway.MergeRoutes.Handler {
          override def apply(sess: SparkSession, batch: DataFrame,
              keys: Seq[String]): Long =
            graft.sources.IcebergWrite.merge(sess, dir, batch, keys)
          override def supportsMergeDelete: Boolean = true
          override def mergeWithDelete(sess: SparkSession,
              batch: DataFrame, keys: Seq[String],
              deletePredicateSql: String): Long =
            graft.sources.IcebergWrite.merge(sess, dir, batch, keys,
              deletePredicate = Some(deletePredicateSql))
        })
      cust.filter(col("c_custkey") % 4 === 0)
        .select(col("c_custkey"), col("c_mktsegment"),
          lit(0.0).as("bal"), lit("del").as("op"))
        .unionByName(cust.filter(col("c_custkey") % 4 === 1)
          .select(col("c_custkey"), col("c_mktsegment"),
            (col("c_acctbal") * 2).as("bal"), lit("upd").as("op")))
        .unionByName(cust.filter(col("c_custkey") % 10 === 2)
          .select((col("c_custkey") + lit(10000000L)).as("c_custkey"),
            col("c_mktsegment"), col("c_acctbal").as("bal"),
            lit("ins").as("op")))
        .createOrReplaceTempView("sql_mdel_ice_src")
      try s.sql(
        """MERGE INTO sql_mdel_ice_tgt AS DBT_INTERNAL_DEST
          |USING sql_mdel_ice_src AS DBT_INTERNAL_SOURCE
          |ON DBT_INTERNAL_DEST.c_custkey = DBT_INTERNAL_SOURCE.c_custkey
          |WHEN MATCHED AND DBT_INTERNAL_SOURCE.op = 'del' THEN DELETE
          |WHEN MATCHED THEN UPDATE SET bal = DBT_INTERNAL_SOURCE.bal
          |WHEN NOT MATCHED THEN INSERT (c_custkey, c_mktsegment, bal)
          |  VALUES (DBT_INTERNAL_SOURCE.c_custkey,
          |          DBT_INTERNAL_SOURCE.c_mktsegment,
          |          DBT_INTERNAL_SOURCE.bal)""".stripMargin).collect()
      finally {
        graft.gateway.MergeRoutes.unregister("sql_mdel_ice_tgt")
        s.catalog.dropTempView("sql_mdel_ice_tgt")
        s.catalog.dropTempView("sql_mdel_ice_src")
      }
      graft.sources.IcebergRead.readIcebergTable(s, dir)
        .orderBy("c_custkey")
    }),

    // Full-sync MERGE: `WHEN NOT MATCHED BY SOURCE` legs (the
    // warehouse mirror-the-source shape) compile over the target-side
    // anti-join — by-source UPDATEs build target-only post-images
    // that join the upsert batch, the conditioned by-source DELETE
    // joins the bounded delete set, and everything lands through the
    // FUSED single-commit engine merge. The oracle replays the
    // four-way classification closed-form.
    "run_sql_merge_not_matched_by_source" -> ((s, d) => {
      val dir = tmpDir("graft_sql_merge_nmbs")
      val cust = Tables.customer(s, d)
      graft.sources.DeltaWrite.merge(s, dir,
        cust.select(col("c_custkey"), col("c_mktsegment"),
          col("c_acctbal").as("bal")),
        Seq("c_custkey"))
      graft.sources.DeltaRead.readDeltaTable(s, dir)
        .createOrReplaceTempView("sql_nmbs_tgt")
      graft.gateway.MergeRoutes.register("sql_nmbs_tgt",
        new graft.gateway.MergeRoutes.Handler {
          override def apply(sess: SparkSession, batch: DataFrame,
              keys: Seq[String]): Long =
            graft.sources.DeltaWrite.merge(sess, dir, batch, keys)
          override def supportsMergeDelete: Boolean = true
          override def mergeWithDelete(sess: SparkSession,
              batch: DataFrame, keys: Seq[String],
              deletePredicateSql: String): Long =
            graft.sources.DeltaWrite.merge(sess, dir, batch, keys,
              deletePredicate = Some(deletePredicateSql))
        })
      // source: %3=0 keys (doubled bal), plus fresh shifted keys
      cust.filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"), col("c_mktsegment"),
          (col("c_acctbal") * 2).as("bal"))
        .unionByName(cust.filter(col("c_custkey") % 10 === 2)
          .select((col("c_custkey") + lit(20000000L)).as("c_custkey"),
            col("c_mktsegment"), col("c_acctbal").as("bal")))
        .createOrReplaceTempView("sql_nmbs_src")
      try s.sql(
        """MERGE INTO sql_nmbs_tgt AS DBT_INTERNAL_DEST
          |USING sql_nmbs_src AS DBT_INTERNAL_SOURCE
          |ON DBT_INTERNAL_DEST.c_custkey = DBT_INTERNAL_SOURCE.c_custkey
          |WHEN MATCHED THEN UPDATE SET bal = DBT_INTERNAL_SOURCE.bal
          |WHEN NOT MATCHED THEN INSERT (c_custkey, c_mktsegment, bal)
          |  VALUES (DBT_INTERNAL_SOURCE.c_custkey,
          |          DBT_INTERNAL_SOURCE.c_mktsegment,
          |          DBT_INTERNAL_SOURCE.bal)
          |WHEN NOT MATCHED BY SOURCE
          |  AND DBT_INTERNAL_DEST.c_mktsegment = 'BUILDING' THEN DELETE
          |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET bal = 0.0
          |""".stripMargin).collect()
      finally {
        graft.gateway.MergeRoutes.unregister("sql_nmbs_tgt")
        s.catalog.dropTempView("sql_nmbs_tgt")
        s.catalog.dropTempView("sql_nmbs_src")
      }
      graft.sources.DeltaRead.readDeltaTable(s, dir).orderBy("c_custkey")
    }),

    // Wire-native lakehouse CTAS: `CREATE TABLE ... USING delta AS
    // SELECT` (dbt's snapshot/table first run) executes through
    // Spark's OWN CTAS command — the registered writable `delta`
    // source (GraftDeltaCatalogSource) routes it into
    // DeltaWrite.replace's atomic creation commit, and the follow-up
    // `INSERT INTO` lands as an append commit via the relation's
    // InsertableRelation. Reads resolve through the same registered
    // source (pushed-filter file pruning); the oracle is the plain
    // union of both halves.
    "run_sql_ctas_delta" -> ((s, d) => {
      val dir = tmpDir("graft_sql_ctas_delta")
      val db = "g" + dir.split('/').last
        .replaceAll("[^a-zA-Z0-9_]", "_").toLowerCase
      Tables.customer(s, d).select(col("c_custkey"),
        col("c_mktsegment"), col("c_acctbal").as("bal"))
        .createOrReplaceTempView("ctas_delta_src")
      s.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$dir'")
      s.sql(s"CREATE TABLE $db.cust USING delta AS " +
        "SELECT * FROM ctas_delta_src WHERE c_custkey % 2 = 0")
      s.sql(s"INSERT INTO $db.cust " +
        "SELECT * FROM ctas_delta_src WHERE c_custkey % 2 = 1")
      // a real Delta log was committed (any Delta reader sees it)
      require(java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(dir, "cust", "_delta_log")),
        s"native CTAS wrote no Delta log under $dir/cust")
      s.sql(s"SELECT c_custkey, c_mktsegment, bal FROM $db.cust")
        .orderBy("c_custkey")
    }),

    // The Iceberg side of the native CTAS: `USING iceberg` routes
    // into IcebergWrite.replace (first snapshot + real metadata),
    // INSERT INTO appends a snapshot.
    "run_sql_ctas_iceberg" -> ((s, d) => {
      val dir = tmpDir("graft_sql_ctas_iceberg")
      val db = "g" + dir.split('/').last
        .replaceAll("[^a-zA-Z0-9_]", "_").toLowerCase
      Tables.customer(s, d).select(col("c_custkey"),
        col("c_mktsegment"), col("c_acctbal").as("bal"))
        .createOrReplaceTempView("ctas_ice_src")
      s.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$dir'")
      s.sql(s"CREATE TABLE $db.cust USING iceberg AS " +
        "SELECT * FROM ctas_ice_src WHERE c_custkey % 2 = 0")
      s.sql(s"INSERT INTO $db.cust " +
        "SELECT * FROM ctas_ice_src WHERE c_custkey % 2 = 1")
      require(java.nio.file.Files.isRegularFile(
        java.nio.file.Paths.get(dir, "cust", "metadata",
          "version-hint.text")),
        s"native CTAS wrote no Iceberg metadata under $dir/cust")
      s.sql(s"SELECT c_custkey, c_mktsegment, bal FROM $db.cust")
        .orderBy("c_custkey")
    }),

    // `CREATE OR REPLACE TABLE ... USING delta AS` — dbt-spark's
    // lakehouse table-rebuild statement (and the modern hand-typed
    // warehouse spelling), routed by the parser onto
    // DeltaWrite.replace's ATOMIC commit: run 2 swaps the whole table
    // in ONE version with no DROP window, and run 1's state stays
    // time-travelable (asserted via the engine reader).
    "run_sql_create_or_replace_delta" -> ((s, d) => {
      val dir = tmpDir("graft_sql_cor_delta")
      val db = "g" + dir.split('/').last
        .replaceAll("[^a-zA-Z0-9_]", "_").toLowerCase
      Tables.customer(s, d).select(col("c_custkey"),
        col("c_mktsegment"), col("c_acctbal").as("bal"))
        .createOrReplaceTempView("cor_delta_src")
      s.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$dir'")
      s.sql(s"CREATE OR REPLACE TABLE $db.cust USING delta AS " +
        "SELECT * FROM cor_delta_src WHERE c_custkey % 2 = 0")
      s.sql(s"CREATE OR REPLACE TABLE $db.cust USING delta AS " +
        "SELECT c_custkey, c_mktsegment, bal * 2 AS bal " +
        "FROM cor_delta_src")
      // run 1's state survives the rebuild, time-travelable through
      // BOTH the engine reader and the SQL spelling (the parser's
      // catalog time-travel route)
      require(graft.sources.DeltaRead.readDeltaTable(s, s"$dir/cust",
        versionAsOf = Some(0L)).count() > 0,
        s"version 0 lost by CREATE OR REPLACE: $dir/cust")
      require(s.sql(
        s"SELECT c_custkey FROM $db.cust VERSION AS OF 0").count() > 0,
        s"SQL VERSION AS OF 0 unreadable after CREATE OR REPLACE: " +
          s"$dir/cust")
      s.sql(s"SELECT c_custkey, c_mktsegment, bal FROM $db.cust")
        .orderBy("c_custkey")
    }),

    // the Iceberg side, with an identity PARTITIONED BY — the
    // replace keeps the partition spec and snapshot 1 stays readable
    "run_sql_create_or_replace_iceberg" -> ((s, d) => {
      val dir = tmpDir("graft_sql_cor_ice")
      val db = "g" + dir.split('/').last
        .replaceAll("[^a-zA-Z0-9_]", "_").toLowerCase
      Tables.customer(s, d).select(col("c_custkey"),
        col("c_mktsegment"), col("c_acctbal").as("bal"))
        .createOrReplaceTempView("cor_ice_src")
      s.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$dir'")
      s.sql(s"CREATE OR REPLACE TABLE $db.cust USING iceberg " +
        "PARTITIONED BY (c_mktsegment) AS " +
        "SELECT * FROM cor_ice_src WHERE c_custkey % 2 = 0")
      s.sql(s"CREATE OR REPLACE TABLE $db.cust USING iceberg " +
        "PARTITIONED BY (c_mktsegment) AS " +
        "SELECT c_custkey, c_mktsegment, bal * 2 AS bal " +
        "FROM cor_ice_src")
      require(graft.sources.IcebergRead.tablePartitionCols(
        s"$dir/cust") == Seq("c_mktsegment"),
        s"CREATE OR REPLACE lost the Iceberg partition spec: $dir/cust")
      require(graft.sources.IcebergRead.readIcebergTable(s, s"$dir/cust",
        snapshotId = Some(1L)).count() > 0,
        s"snapshot 1 lost by CREATE OR REPLACE: $dir/cust")
      require(s.sql(
        s"SELECT c_custkey FROM $db.cust VERSION AS OF 1").count() > 0,
        s"SQL VERSION AS OF 1 unreadable after CREATE OR REPLACE: " +
          s"$dir/cust")
      s.sql(s"SELECT c_custkey, c_mktsegment, bal FROM $db.cust")
        .orderBy("c_custkey")
    }),

    // `TIMESTAMP AS OF` over SQL text: the literal evaluates in the
    // session timezone and the route resolves it DRIVER-SIDE to the
    // version at-or-before it (Delta: commitInfo.inCommitTimestamp
    // when a commit carries one, commit-file mtimes otherwise —
    // pinned here to fixed instants so the key is deterministic),
    // then reuses the engine's bounded version-pinned read. Requests
    // OUTSIDE the history refuse loudly on both sides (pre-creation /
    // vacuumed, and future-dated past the latest commit — Delta's own
    // semantics; DeltaSpec + GatewaySpec pin those paths).
    // Both pinned histories read in ONE statement, same oracle as the
    // version form.
    "run_sql_time_travel_ts" -> ((s, d) => {
      val dir = tmpDir("graft_sql_tt_ts")
      val cust = Tables.customer(s, d)
      graft.sources.DeltaWrite.merge(s, dir,
        cust.select(col("c_custkey"), lit(0.0).as("bal")),
        Seq("c_custkey"))
      graft.sources.DeltaWrite.merge(s, dir,
        cust.filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey"), col("c_acctbal").as("bal")),
        Seq("c_custkey"))
      // pin the commit wall-times (mtime IS Delta's commit timestamp)
      Seq(0L -> "2024-01-01T00:00:00Z", 1L -> "2024-06-01T00:00:00Z")
        .foreach { case (v, t) =>
          java.nio.file.Files.setLastModifiedTime(
            java.nio.file.Paths.get(dir, "_delta_log", f"$v%020d.json"),
            java.nio.file.attribute.FileTime.from(
              java.time.Instant.parse(t))): Unit
        }
      graft.gateway.TimeTravelRoutes.registerTimestamp("sql_tt_ts_tgt",
        (sess, micros) => graft.sources.DeltaRead.readDeltaTable(
          sess, dir, versionAsOf = Some(graft.sources.DeltaRead
            .versionAtTimestamp(dir, micros))))
      try s.sql(
        """SELECT 0 AS ver, c_custkey, bal
          |FROM sql_tt_ts_tgt TIMESTAMP AS OF '2024-03-01 00:00:00'
          |UNION ALL
          |SELECT 1 AS ver, c_custkey, bal
          |FROM sql_tt_ts_tgt TIMESTAMP AS OF '2024-06-01 00:00:00'
          |ORDER BY ver, c_custkey""".stripMargin)
      finally graft.gateway.TimeTravelRoutes
        .unregisterTimestamp("sql_tt_ts_tgt")
    }),

    // UPDATE SQL on a published relation: vanilla Spark cannot run
    // UPDATE on v1 tables; DmlRoute compiles the post-image of the
    // matching rows (assignments applied, others kept, cast to the
    // column type) onto the relation's upsert handler, merging on the
    // DECLARED unique key. Untouched rows never enter the batch — the
    // engine merge rewrites only files with matches.
    "run_sql_update" -> ((s, d) => {
      val dir = tmpDir("graft_sql_update")
      val cust = Tables.customer(s, d)
      graft.sources.DeltaWrite.merge(s, dir,
        cust.select(col("c_custkey"), col("c_mktsegment"),
          col("c_acctbal").as("bal")),
        Seq("c_custkey"))
      graft.sources.DeltaRead.readDeltaTable(s, dir)
        .createOrReplaceTempView("sql_upd_tgt")
      graft.gateway.MergeRoutes.register("sql_upd_tgt",
        (sess, batch, keys) =>
          graft.sources.DeltaWrite.merge(sess, dir, batch, keys))
      graft.gateway.DmlRoutes.register("sql_upd_tgt",
        graft.gateway.DmlRoutes.Ops(Seq("c_custkey")))
      try s.sql("UPDATE sql_upd_tgt SET bal = bal * 2 " +
        "WHERE c_custkey % 5 = 0").collect()
      finally {
        graft.gateway.MergeRoutes.unregister("sql_upd_tgt")
        graft.gateway.DmlRoutes.unregister("sql_upd_tgt")
        s.catalog.dropTempView("sql_upd_tgt")
      }
      graft.sources.DeltaRead.readDeltaTable(s, dir).orderBy("c_custkey")
    }),

    // DELETE FROM SQL on a published relation, executed as the Delta
    // deletion-vector MERGE-ON-READ delete (DeltaWrite.deleteWhere):
    // matching rows are MASKED — one packed DV file + log actions, no
    // data file rewritten (DeltaSpec asserts byte-identity) — and
    // every Delta reader sees them gone. The predicate travels as
    // re-rendered SQL text from the statement's own WHERE clause.
    "run_sql_delete_from" -> ((s, d) => {
      val dir = tmpDir("graft_sql_delete")
      val cust = Tables.customer(s, d)
      graft.sources.DeltaWrite.merge(s, dir,
        cust.select(col("c_custkey"), col("c_mktsegment"),
          col("c_acctbal").as("bal")),
        Seq("c_custkey"))
      graft.sources.DeltaRead.readDeltaTable(s, dir)
        .createOrReplaceTempView("sql_del_tgt")
      graft.gateway.DmlRoutes.register("sql_del_tgt",
        graft.gateway.DmlRoutes.Ops(Seq("c_custkey"),
          deleteWhere = Some((sess, predicateSql) =>
            graft.sources.DeltaWrite.deleteWhere(sess, dir, predicateSql))))
      try s.sql("DELETE FROM sql_del_tgt WHERE c_mktsegment = 'BUILDING' " +
        "OR c_custkey % 100 = 7").collect()
      finally {
        graft.gateway.DmlRoutes.unregister("sql_del_tgt")
        s.catalog.dropTempView("sql_del_tgt")
      }
      graft.sources.DeltaRead.readDeltaTable(s, dir).orderBy("c_custkey")
    }),

    // `DELETE FROM` on a CDF-ENABLED Delta table: the DV masks and a
    // `_change_data/` cdc file with the deleted rows' PRE-IMAGES land
    // in ONE commit (the protocol's requirement — DV-only actions
    // would make derived CDF misreport). The key returns the
    // readChanges rows of that commit, so the oracle checks the cdc
    // contract end-to-end.
    "run_sql_delete_cdf" -> ((s, d) => {
      val dir = tmpDir("graft_sql_delete_cdf")
      val cust = Tables.customer(s, d)
      graft.sources.DeltaWrite.merge(s, dir,
        cust.select(col("c_custkey"), col("c_mktsegment"),
          col("c_acctbal").as("bal")),
        Seq("c_custkey"), enableCdf = true)
      graft.sources.DeltaRead.readDeltaTable(s, dir)
        .createOrReplaceTempView("sql_del_cdf_tgt")
      graft.gateway.DmlRoutes.register("sql_del_cdf_tgt",
        graft.gateway.DmlRoutes.Ops(Seq("c_custkey"),
          deleteWhere = Some((sess, predicateSql) =>
            graft.sources.DeltaWrite.deleteWhere(sess, dir, predicateSql))))
      try s.sql("DELETE FROM sql_del_cdf_tgt " +
        "WHERE c_mktsegment = 'BUILDING' OR c_custkey % 100 = 7")
        .collect()
      finally {
        graft.gateway.DmlRoutes.unregister("sql_del_cdf_tgt")
        s.catalog.dropTempView("sql_del_cdf_tgt")
      }
      graft.sources.DeltaRead.readChanges(s, dir, 1L)
        .select(col("c_custkey"), col("c_mktsegment"), col("bal"),
          col("_change_type"))
        .orderBy("c_custkey")
    }),

    // `DELETE FROM` on a PARTITIONED Delta table — the
    // date/segment-partitioned retention delete: the probe PRUNES to
    // the predicate's partitions through the log's partitionValues +
    // stats (DeltaSpec proves untouched partitions' files are never
    // opened with the hidden-file technique), matching rows are
    // DV-masked in place — no data file rewritten, O(partition) not
    // O(table).
    "run_sql_delete_partitioned" -> ((s, d) => {
      val dir = tmpDir("graft_sql_del_part")
      val cust = Tables.customer(s, d)
      graft.sources.DeltaWrite.merge(s, dir,
        cust.select(col("c_custkey"), col("c_mktsegment"),
          col("c_acctbal").as("bal")),
        Seq("c_custkey"), partitionBy = Seq("c_mktsegment"))
      graft.sources.DeltaRead.readDeltaTable(s, dir)
        .createOrReplaceTempView("sql_del_part_tgt")
      graft.gateway.DmlRoutes.register("sql_del_part_tgt",
        graft.gateway.DmlRoutes.Ops(Seq("c_custkey"),
          deleteWhere = Some((sess, predicateSql) =>
            graft.sources.DeltaWrite.deleteWhere(sess, dir, predicateSql))))
      try s.sql("DELETE FROM sql_del_part_tgt " +
        "WHERE c_mktsegment = 'BUILDING' AND c_custkey % 2 = 0")
        .collect()
      finally {
        graft.gateway.DmlRoutes.unregister("sql_del_part_tgt")
        s.catalog.dropTempView("sql_del_part_tgt")
      }
      graft.sources.DeltaRead.readDeltaTable(s, dir).orderBy("c_custkey")
    }),

    // The dbt snapshot CHECK strategy over the wire (dbt's DEFAULT
    // when no updated_at exists): row_changed = any check_cols column
    // IS DISTINCT FROM the current row's, valid_from/updated_at take
    // the RUN timestamp (dbt renders the snapshot start time as a SQL
    // literal — deterministic here by construction). Same verbatim
    // conditioned MERGE as the timestamp strategy.
    "run_sql_merge_snapshot_check" -> ((s, d) => {
      val now1 = "timestamp'2024-01-01 00:00:00'"
      val now2 = "timestamp'2024-06-01 00:00:00'"
      val dir = tmpDir("graft_sql_merge_snap_check")
      val ord = Tables.orders(s, d).select(
        col("o_orderkey").as("id"),
        col("o_orderstatus").as("status"))
      val v1 = ord
        .withColumn("dbt_updated_at", expr(now1))
        .withColumn("dbt_valid_from", expr(now1))
        .withColumn("dbt_valid_to", lit(null).cast(TimestampType))
        .withColumn("dbt_scd_id", md5(concat(
          coalesce(col("id").cast(StringType), lit("")), lit("|"),
          coalesce(expr(now1).cast(StringType), lit("")))))
      graft.sources.DeltaWrite.merge(s, dir, v1, Seq("dbt_scd_id"))
      graft.sources.DeltaRead.readDeltaTable(s, dir)
        .createOrReplaceTempView("snapchk_tgt")
      graft.gateway.MergeRoutes.register("snapchk_tgt",
        (sess, batch, keys) =>
          graft.sources.DeltaWrite.merge(sess, dir, batch, keys))
      ord.filter(col("id") % 4 === 0).withColumn("status", lit("X"))
        .unionByName(ord.filter(col("id") % 4 =!= 0))
        .unionByName(ord.filter(col("id") % 9 === 2)
          .withColumn("id", col("id") + lit(20000000L)))
        .createOrReplaceTempView("snapchk_src_v2")
      import graft.gateway.{DbtTranscript => T}
      try T.snapshotRun("snapchk_tgt", "snapchk",
        T.snapshotStagingSelectCheck("snapchk_tgt",
          "select * from snapchk_src_v2", "id", Seq("status"), now2))
        .foreach(stmt => s.sql(stmt).collect())
      finally {
        graft.gateway.MergeRoutes.unregister("snapchk_tgt")
        s.catalog.dropTempView("snapchk_src_v2")
        s.catalog.dropTempView("snapchk_tgt")
      }
      graft.sources.DeltaRead.readDeltaTable(s, dir)
        .orderBy("id", "dbt_valid_from")
    }),

    // The same DELETE FROM statement against an ICEBERG MoR table:
    // executed as a v2 equality-delete append (IcebergWrite
    // .deleteWhere) — one delete file carrying the matching keys,
    // written DISTRIBUTED (no driver position collect), no data file
    // touched; readers reconcile by sequence number.
    "run_sql_delete_iceberg" -> ((s, d) => {
      val dir = tmpDir("graft_sql_delete_ice")
      val cust = Tables.customer(s, d)
      graft.sources.IcebergWrite.mergeOnRead(s, dir,
        cust.select(col("c_custkey"), col("c_mktsegment"),
          col("c_acctbal").as("bal")),
        Seq("c_custkey"))
      graft.sources.IcebergRead.readIcebergTable(s, dir)
        .createOrReplaceTempView("sql_del_ice_tgt")
      graft.gateway.DmlRoutes.register("sql_del_ice_tgt",
        graft.gateway.DmlRoutes.Ops(Seq("c_custkey"),
          deleteWhere = Some((sess, predicateSql) =>
            graft.sources.IcebergWrite.deleteWhere(
              sess, dir, predicateSql, Seq("c_custkey")))))
      try s.sql("DELETE FROM sql_del_ice_tgt " +
        "WHERE c_mktsegment = 'MACHINERY' AND c_custkey % 2 = 1")
        .collect()
      finally {
        graft.gateway.DmlRoutes.unregister("sql_del_ice_tgt")
        s.catalog.dropTempView("sql_del_ice_tgt")
      }
      graft.sources.IcebergRead.readIcebergTable(s, dir)
        .orderBy("c_custkey")
    }),

    // The same DELETE FROM against a FORMAT-VERSION 3 Iceberg table:
    // executed as PUFFIN DELETION VECTORS (IcebergWrite.deleteWhere's
    // v3 branch) — one snapshot registers one deletion-vector-v1
    // blob per touched data file masking the matching row positions;
    // no data file rewritten, the probe prunes through manifest
    // bounds, and the blobs read back through the same decode path
    // external v3 tables use.
    "run_sql_delete_iceberg_dv" -> ((s, d) => {
      val dir = tmpDir("graft_sql_delete_ice_dv")
      val cust = Tables.customer(s, d).select(col("c_custkey"),
        col("c_mktsegment"), col("c_acctbal").as("bal"))
        .localCheckpoint(eager = false)
      graft.sources.IcebergWrite.commit(dir,
        (0 until 4).map(b => f"part-$b%02d.parquet" ->
          cust.filter(pmod(col("c_custkey"), lit(4)) === b)),
        formatVersion = 3)
      require(graft.sources.IcebergWrite.formatVersionOf(dir) == 3,
        s"v3 creation commit wrote the wrong format version: $dir")
      graft.sources.IcebergRead.readIcebergTable(s, dir)
        .createOrReplaceTempView("sql_del_ice_dv_tgt")
      graft.gateway.DmlRoutes.register("sql_del_ice_dv_tgt",
        graft.gateway.DmlRoutes.Ops(Seq("c_custkey"),
          deleteWhere = Some((sess, predicateSql) =>
            graft.sources.IcebergWrite.deleteWhere(
              sess, dir, predicateSql, Seq("c_custkey")))))
      try s.sql("DELETE FROM sql_del_ice_dv_tgt " +
        "WHERE c_mktsegment = 'MACHINERY' AND c_custkey % 2 = 1")
        .collect()
      finally {
        graft.gateway.DmlRoutes.unregister("sql_del_ice_dv_tgt")
        s.catalog.dropTempView("sql_del_ice_dv_tgt")
      }
      require(graft.sources.IcebergRead.snapshotState(dir, None)
        .deletionVectors.nonEmpty,
        s"v3 DELETE wrote no deletion vectors: $dir")
      graft.sources.IcebergRead.readIcebergTable(s, dir)
        .orderBy("c_custkey")
    }),

    // `DELETE FROM` on a PARTITIONED Iceberg table — the Iceberg side
    // of the date/segment-partitioned retention delete: the
    // matched-key probe prunes through the manifests' column bounds
    // (identity partition columns are data columns with bounds, so
    // only the predicate's partitions' files are opened —
    // IcebergSpec proves it with the hidden-foreign-file technique),
    // and ONE equality-delete file appends, no data file touched.
    "run_sql_delete_partitioned_iceberg" -> ((s, d) => {
      val dir = tmpDir("graft_sql_del_part_ice")
      val cust = Tables.customer(s, d)
      graft.sources.IcebergWrite.merge(s, dir,
        cust.select(col("c_custkey"), col("c_mktsegment"),
          col("c_acctbal").as("bal")),
        Seq("c_custkey"), partitionBy = Seq("c_mktsegment"))
      graft.sources.IcebergRead.readIcebergTable(s, dir)
        .createOrReplaceTempView("sql_del_part_ice_tgt")
      graft.gateway.DmlRoutes.register("sql_del_part_ice_tgt",
        graft.gateway.DmlRoutes.Ops(Seq("c_custkey"),
          deleteWhere = Some((sess, predicateSql) =>
            graft.sources.IcebergWrite.deleteWhere(
              sess, dir, predicateSql, Seq("c_custkey")))))
      try s.sql("DELETE FROM sql_del_part_ice_tgt " +
        "WHERE c_mktsegment = 'BUILDING' AND c_custkey % 2 = 0")
        .collect()
      finally {
        graft.gateway.DmlRoutes.unregister("sql_del_part_ice_tgt")
        s.catalog.dropTempView("sql_del_part_ice_tgt")
      }
      graft.sources.IcebergRead.readIcebergTable(s, dir)
        .orderBy("c_custkey")
    }),

    // The dbt SNAPSHOT wire form: the CONDITIONED merge dbt-core's
    // snapshot materialization emits through dbt-spark
    // (`spark__snapshot_merge_sql` — `WHEN MATCHED AND
    // DBT_INTERNAL_DEST.dbt_valid_to IS NULL AND ... THEN UPDATE SET
    // dbt_valid_to = ... WHEN NOT MATCHED AND ... THEN INSERT *`),
    // preceded by dbt's own staging select (snapshot_staging_table
    // semantics, timestamp strategy). MergeIntoRoute COMPILES the
    // conditional actions onto the engine's staged CoW Delta merge:
    // changed keys close their current row (valid_to set) and open a
    // new one, unchanged keys' files are untouched. The oracle
    // replays the SCD2 arithmetic — including dbt's md5 scd_id —
    // closed-form from orders.
    "run_sql_merge_snapshot" -> ((s, d) => {
      val dir = tmpDir("graft_sql_merge_snapshot")
      val ord = Tables.orders(s, d).select(
        col("o_orderkey").as("id"),
        col("o_orderstatus").as("status"),
        col("o_orderdate").as("updated_at"))
      // v1: every source row current (valid_to null), dbt scd columns
      val v1 = ord
        .withColumn("dbt_updated_at", col("updated_at"))
        .withColumn("dbt_valid_from", col("updated_at"))
        .withColumn("dbt_valid_to", lit(null).cast(TimestampType))
        .withColumn("dbt_scd_id", md5(concat(
          coalesce(col("id").cast(StringType), lit("")), lit("|"),
          coalesce(col("updated_at").cast(StringType), lit("")))))
      graft.sources.DeltaWrite.merge(s, dir, v1, Seq("dbt_scd_id"))
      graft.sources.DeltaRead.readDeltaTable(s, dir)
        .createOrReplaceTempView("snap_tgt")
      graft.gateway.MergeRoutes.register("snap_tgt",
        (sess, batch, keys) =>
          graft.sources.DeltaWrite.merge(sess, dir, batch, keys))
      // v2 source state: id%3=0 rows changed 30 days later, id%7=1
      // keys brand new (shifted ids), the rest untouched
      ord.filter(col("id") % 3 === 0)
        .withColumn("updated_at", date_add(col("updated_at"), 30))
        .withColumn("status", lit("U"))
        .unionByName(ord.filter(col("id") % 3 =!= 0))
        .unionByName(ord.filter(col("id") % 7 === 1)
          .withColumn("id", col("id") + lit(10000000L)))
        .createOrReplaceTempView("snap_src_v2")
      import graft.gateway.{DbtTranscript => T}
      try T.snapshotRun("snap_tgt", "snap",
        T.snapshotStagingSelect("snap_tgt", "select * from snap_src_v2",
          "id", "updated_at"))
        .foreach(stmt => s.sql(stmt).collect())
      finally {
        graft.gateway.MergeRoutes.unregister("snap_tgt")
        s.catalog.dropTempView("snap_src_v2")
        s.catalog.dropTempView("snap_tgt")
      }
      graft.sources.DeltaRead.readDeltaTable(s, dir)
        .orderBy("id", "dbt_valid_from")
    }),

    // The PARTITIONED dbt-spark merge: creation records partition
    // columns in the Delta metaData (partition values live in the
    // log, hive-style layout on disk), and each merge PRUNES its
    // touched-file probe to the batch's partitions — untouched
    // partitions' files are never read or rewritten (byte-identical,
    // spec-asserted in DeltaSpec). Same CoW merge semantics, so the
    // same oracle.
    "mat_incremental_merge_delta_partitioned" -> ((s, d) => {
      val dir = tmpDir("graft_mat_merge_delta_part")
      val cust = Tables.customer(s, d)
      graft.sources.DeltaWrite.merge(s, dir,
        cust.select(col("c_custkey"), col("c_mktsegment"),
          lit(0.0).as("bal")),
        Seq("c_custkey"), partitionBy = Seq("c_mktsegment"))
      graft.sources.DeltaWrite.merge(s, dir,
        cust.filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey"), col("c_mktsegment"),
            col("c_acctbal").as("bal")),
        Seq("c_custkey"))
      graft.sources.DeltaRead.readDeltaTable(s, dir).orderBy("c_custkey")
    }),

    // The Iceberg side of the partitioned merge: a REAL identity
    // partition spec + manifest partition records; the merge prunes
    // its probe on those records (IcebergSpec proves hidden foreign-
    // partition files are never scanned).
    "mat_incremental_merge_iceberg_partitioned" -> ((s, d) => {
      val dir = tmpDir("graft_mat_merge_iceberg_part")
      val cust = Tables.customer(s, d)
      graft.sources.IcebergWrite.merge(s, dir,
        cust.select(col("c_custkey"), col("c_mktsegment"),
          lit(0.0).as("bal")),
        Seq("c_custkey"), partitionBy = Seq("c_mktsegment"))
      graft.sources.IcebergWrite.merge(s, dir,
        cust.filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey"), col("c_mktsegment"),
            col("c_acctbal").as("bal")),
        Seq("c_custkey"))
      graft.sources.IcebergRead.readIcebergTable(s, dir)
        .orderBy("c_custkey")
    }),

    // Retention GC on an exported Delta table: three merges leave
    // superseded files + pre-checkpoint log JSON; vacuum() deletes
    // them (spec-asserted bytes) and the LIVE snapshot — what this
    // key reads — is unchanged. Time travel to vacuumed versions
    // refuses loudly (DeltaSpec).
    "mat_vacuum_delta" -> ((s, d) => {
      val dir = tmpDir("graft_mat_vacuum_delta")
      val cust = Tables.customer(s, d)
      graft.sources.DeltaWrite.merge(s, dir,
        cust.select(col("c_custkey"), col("c_mktsegment"),
          lit(0.0).as("bal")),
        Seq("c_custkey"))
      graft.sources.DeltaWrite.merge(s, dir,
        cust.filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey"), col("c_mktsegment"),
            col("c_acctbal").as("bal")),
        Seq("c_custkey"))
      val res = graft.sources.DeltaWrite.vacuum(s, dir)
      require(res.dataFilesDeleted > 0,
        s"vacuum GC'd nothing on a twice-merged table: $res")
      graft.sources.DeltaRead.readDeltaTable(s, dir).orderBy("c_custkey")
    }),

    // Snapshot retention GC on an exported Iceberg table
    // (expire_snapshots): expired snapshots' manifests + data files
    // are deleted, the current snapshot reads back identical, expired
    // time travel refuses loudly (IcebergSpec).
    "mat_expire_iceberg" -> ((s, d) => {
      val dir = tmpDir("graft_mat_expire_iceberg")
      val cust = Tables.customer(s, d)
      graft.sources.IcebergWrite.merge(s, dir,
        cust.select(col("c_custkey"), col("c_mktsegment"),
          lit(0.0).as("bal")),
        Seq("c_custkey"))
      graft.sources.IcebergWrite.merge(s, dir,
        cust.filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey"), col("c_mktsegment"),
            col("c_acctbal").as("bal")),
        Seq("c_custkey"))
      val res = graft.sources.IcebergWrite.expireSnapshots(s, dir,
        keepLast = 1)
      require(res.filesDeleted > 0,
        s"expireSnapshots GC'd nothing on a twice-merged table: $res")
      graft.sources.IcebergRead.readIcebergTable(s, dir)
        .orderBy("c_custkey")
    }),

    // A CDF-enabled Delta merge target: the merge commit carries cdc
    // actions with the TRUE row-level changes (pre/postimage/insert),
    // because its whole-file rewrites would make derived CDF
    // misreport carried rows — the key reads the CHANGE FEED back,
    // not the final state.
    "mat_incremental_merge_delta_cdf" -> ((s, d) => {
      val dir = tmpDir("graft_mat_merge_delta_cdf")
      val cust = Tables.customer(s, d)
      graft.sources.DeltaWrite.merge(s, dir,
        cust.select(col("c_custkey"), col("c_mktsegment"),
          lit(0.0).as("bal")),
        Seq("c_custkey"), enableCdf = true)
      graft.sources.DeltaWrite.merge(s, dir,
        cust.filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey"), col("c_mktsegment"),
            col("c_acctbal").as("bal")),
        Seq("c_custkey"))
      graft.sources.DeltaRead.readChanges(s, dir, 1L)
        .orderBy("_change_type", "c_custkey")
    }),

    // The same dbt-spark `merge` contract against a REAL Iceberg
    // table (copy-on-write): one atomic snapshot rewrites exactly the
    // touched files; the final state reads back through IcebergRead
    // (or any Iceberg reader) and every prior snapshot stays
    // time-travelable.
    "mat_incremental_merge_iceberg" -> ((s, d) => {
      val dir = tmpDir("graft_mat_merge_iceberg")
      val cust = Tables.customer(s, d)
      graft.sources.IcebergWrite.merge(s, dir,
        cust.select(col("c_custkey"), col("c_mktsegment"),
          lit(0.0).as("bal")),
        Seq("c_custkey"))
      graft.sources.IcebergWrite.merge(s, dir,
        cust.filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey"), col("c_mktsegment"),
            col("c_acctbal").as("bal")),
        Seq("c_custkey"))
      graft.sources.IcebergRead.readIcebergTable(s, dir)
        .orderBy("c_custkey")
    }),

    // Merge-on-read upsert into a REAL Iceberg table — the Flink/CDC
    // streaming shape: each merge writes ONE equality-delete file +
    // the batch, O(batch) commit cost regardless of table size; the
    // reader reconciles by sequence-numbered equality-delete
    // application (hash join, plan-asserted elsewhere).
    "mat_incremental_merge_iceberg_mor" -> ((s, d) => {
      val dir = tmpDir("graft_mat_merge_iceberg_mor")
      val cust = Tables.customer(s, d)
      graft.sources.IcebergWrite.mergeOnRead(s, dir,
        cust.select(col("c_custkey"), col("c_mktsegment"),
          lit(0.0).as("bal")),
        Seq("c_custkey"))
      graft.sources.IcebergWrite.mergeOnRead(s, dir,
        cust.filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey"), col("c_mktsegment"),
            col("c_acctbal").as("bal")),
        Seq("c_custkey"))
      graft.sources.IcebergRead.readIcebergTable(s, dir)
        .orderBy("c_custkey")
    }),

    // Routed through the runner's `seed` command (the reference's dbt
    // argv surface), not a bare csv read — the oracle checks the
    // loaded table's content after the publish round-trip.
    "scan_csv_seed" -> ((s, _) => {
      val spec = graft.pipeline.PipelineSpec(models = Nil,
        seeds = Seq(graft.pipeline.Seed("country_seed", seedCsvLines, seedSchema)))
      val r = new graft.pipeline.PipelineRunner(s, spec, tmpDir("graft_seed_wh"))
      val res = r.run(Seq("seed"))
      require(res.success, res.results.flatMap(_.error).mkString("; "))
      r.readTable("country_seed").orderBy("id")
    }),

    "scan_json" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
            .getField("k").as("jk"))
        .orderBy("event_id")),

    // Write → re-read round trip (dbt `table` materialization = CTAS,
    // derived from the dbt-spark pin). Aggregate after re-read so the
    // oracle compares stable values, not file layout.
    "sink_parquet" -> ((s, d) => {
      val out = tmpDir("graft_sink_parquet")
      Tables.lineitem(s, d)
        .filter(col("l_quantity").between(10, 40))
        .write.mode("overwrite").parquet(s"$out/t")
      s.read.parquet(s"$out/t")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          asDouble(sum(dec2(col("l_quantity")))).as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // Partitioned write (dbt-spark `partition_by` model config).
    // 100 TB note: partition columns must be low-cardinality
    // (event_type: 5 values) — high-cardinality partitioning would
    // create a small-files explosion at scale.
    "sink_partitioned" -> ((s, d) => {
      val out = tmpDir("graft_sink_part")
      Tables.events(s, d)
        .write.mode("overwrite").partitionBy("event_type").parquet(s"$out/t")
      s.read.parquet(s"$out/t")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          asDouble(sum(dec2(col("value")))).as("sum_value"))
        .orderBy("event_type")
    }),

    // Z-order-clustered write (the Delta/Iceberg OPTIMIZE ZORDER
    // layout): lineitem rewritten along a Morton curve over
    // (l_partkey, l_suppkey) so every output file covers a small
    // rectangle of the key space — parquet min/max stats then prune
    // scans filtered on EITHER column (a single-column sort prunes
    // only its own). One range exchange + per-partition sort; bounds
    // ride a 1-row broadcast. ZOrderSpec asserts the skipping
    // actually works (per-file extents shrink on both dims). The
    // oracle replays quantize+interleave bit-for-bit and the
    // round-trip proves the written data is intact.
    "sink_zorder" -> ((s, d) => {
      import graft.operators.ZOrder
      val out = tmpDir("graft_sink_zorder")
      val li = Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      val bounds = li.agg(
        min("l_partkey").as("pmin"), max("l_partkey").as("pmax"),
        min("l_suppkey").as("smin"), max("l_suppkey").as("smax"))
      val z = ZOrder.interleave(Seq(
        ZOrder.quantize(col("l_partkey"), col("pmin"), col("pmax"), 8),
        ZOrder.quantize(col("l_suppkey"), col("smin"), col("smax"), 8)),
        bits = 8)
      // compute zval, then project the broadcast bounds away — the
      // sink must carry only the data columns + the curve value
      val withZ = li.crossJoin(broadcast(bounds))
        .withColumn("zval", z)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "zval")
      ZOrder.clusteredWrite(withZ, col("zval"), s"$out/t", numFiles = 8)
      s.read.parquet(s"$out/t")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "zval")
        .orderBy("zval", "l_orderkey", "l_linenumber", "l_partkey",
          "l_suppkey")
    }),

    // Other dbt-spark file formats (model config `file_format`): each
    // writes the format, re-reads, and aggregates — proving the full
    // round-trip, with the oracle computed from the source table.
    "sink_orc" -> ((s, d) => {
      val out = tmpDir("graft_sink_orc")
      Tables.orders(s, d)
        .filter(col("o_orderstatus") =!= "P")
        .write.mode("overwrite").orc(s"$out/t")
      s.read.orc(s"$out/t")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          asDouble(sum(dec2(col("o_totalprice")))).as("sum_price"))
        .orderBy("o_orderstatus")
    }),

    "sink_csv_roundtrip" -> ((s, d) => {
      val out = tmpDir("graft_sink_csv")
      Tables.nation(s, d)
        .select("n_nationkey", "n_name", "n_regionkey")
        .write.mode("overwrite").option("header", "true").csv(s"$out/t")
      s.read.option("header", "true")
        .schema("n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT")
        .csv(s"$out/t")
        .orderBy("n_nationkey")
    }),

    "sink_json_roundtrip" -> ((s, d) => {
      val out = tmpDir("graft_sink_json")
      Tables.region(s, d).write.mode("overwrite").json(s"$out/t")
      s.read.schema("r_regionkey BIGINT, r_name STRING, r_comment STRING")
        .json(s"$out/t")
        .select("r_regionkey", "r_name")
        .orderBy("r_regionkey")
    }),

    // Spark's built-in `text` format: one string column per line.
    // Values must be newline-free (nation names are); the re-read
    // recovers exactly the written lines.
    "sink_text_roundtrip" -> ((s, d) => {
      val out = tmpDir("graft_sink_text")
      Tables.nation(s, d).select(col("n_name"))
        .write.mode("overwrite").text(s"$out/t")
      s.read.text(s"$out/t")
        .select(col("value").as("n_name"))
        .orderBy("n_name")
    }),

    // Avro (row-oriented, schema'd — the Kafka-adjacent interchange
    // format; Spark 4 ships the datasource in core). Write, re-read,
    // aggregate: proves schema fidelity incl. BIGINT/DOUBLE.
    "sink_avro_roundtrip" -> ((s, d) => {
      val out = tmpDir("graft_sink_avro")
      Tables.supplier(s, d)
        .select("s_suppkey", "s_nationkey", "s_acctbal")
        .write.mode("overwrite").format(AvroFmt).save(s"$out/t")
      s.read.format(AvroFmt).load(s"$out/t")
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"),
          asDouble(sum(dec2(col("s_acctbal")))).as("sum_bal"))
        .orderBy("s_nationkey")
    }),

    // XML (Spark 4 built-in datasource, rowTag framing). Values are
    // XML-escaped on write and recovered exactly on read; the re-read
    // declares the schema so types survive the text encoding.
    "sink_xml_roundtrip" -> ((s, d) => {
      val out = tmpDir("graft_sink_xml")
      Tables.nation(s, d)
        .select("n_nationkey", "n_name", "n_regionkey")
        .write.mode("overwrite").format("xml")
        .option("rowTag", "nation").save(s"$out/t")
      s.read.format("xml").option("rowTag", "nation")
        .schema("n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT")
        .load(s"$out/t")
        .orderBy("n_nationkey")
    }),

    // dbt `view` materialization → temp view + SQL over it.
    "create_view" -> ((s, d) => {
      val nr = Tables.nation(s, d).join(Tables.region(s, d),
        col("n_regionkey") === col("r_regionkey"))
      nr.createOrReplaceTempView("v_nation_region")
      s.sql("SELECT n_name, r_name FROM v_nation_region ORDER BY n_name")
    })
  )

  override def oracles: Map[String, String] = Map(
    "scan_parquet" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag""".stripMargin,

    // the Delta fixture's post-replay content IS nation (DuckDB's
    // delta extension can't install offline, so the source table is
    // the ground truth — the log replay still hash-verifies)
    "scan_delta" ->
      "SELECT * FROM nation ORDER BY n_nationkey",

    // the DV masks rows with n_nationkey % 5 == 0 out of the snapshot
    "scan_delta_dv" ->
      "SELECT * FROM nation WHERE n_nationkey % 5 <> 0 ORDER BY n_nationkey",

    // the change history the three-commit CDF fixture encodes:
    // inserts @0, deletes of the >=20 file @1, pre/post images of the
    // %7 rows @2 (the cdc commit's rewrite actions must NOT appear)
    "scan_delta_cdf" ->
      """SELECT n_nationkey, n_name, n_regionkey,
        |  'insert' AS _change_type, CAST(0 AS BIGINT) AS _commit_version
        |FROM nation
        |UNION ALL
        |SELECT n_nationkey, n_name, n_regionkey, 'delete', CAST(1 AS BIGINT)
        |FROM nation WHERE n_nationkey >= 20
        |UNION ALL
        |SELECT n_nationkey, n_name, n_regionkey, 'update_preimage', CAST(2 AS BIGINT)
        |FROM nation WHERE n_nationkey < 20 AND n_nationkey % 7 = 0
        |UNION ALL
        |SELECT n_nationkey, n_name, n_regionkey + 10, 'update_postimage', CAST(2 AS BIGINT)
        |FROM nation WHERE n_nationkey < 20 AND n_nationkey % 7 = 0
        |ORDER BY _commit_version, _change_type, n_nationkey""".stripMargin,

    // position deletes mask rows with n_nationkey % 6 == 0
    "scan_iceberg" ->
      "SELECT * FROM nation WHERE n_nationkey % 6 <> 0 ORDER BY n_nationkey",

    // the change history the four-snapshot fixture encodes: inserts
    // @1, the rewrite's whole-file delete+insert of the >=10 half @2,
    // row-level position-delete rows of the <10 file's %6 keys @3,
    // the equality delete's replay of keys 1 and 13 against @3's
    // live rows @4
    "scan_iceberg_changes" ->
      """SELECT n_nationkey, n_name, n_regionkey,
        |  'INSERT' AS _change_type, CAST(0 AS INTEGER) AS _change_ordinal,
        |  CAST(1 AS BIGINT) AS _commit_snapshot_id
        |FROM nation
        |UNION ALL
        |SELECT n_nationkey, n_name, n_regionkey, 'DELETE',
        |  CAST(1 AS INTEGER), CAST(2 AS BIGINT)
        |FROM nation WHERE n_nationkey >= 10
        |UNION ALL
        |SELECT n_nationkey, n_name, n_regionkey, 'INSERT',
        |  CAST(1 AS INTEGER), CAST(2 AS BIGINT)
        |FROM nation WHERE n_nationkey >= 10
        |UNION ALL
        |SELECT n_nationkey, n_name, n_regionkey, 'DELETE',
        |  CAST(2 AS INTEGER), CAST(3 AS BIGINT)
        |FROM nation WHERE n_nationkey < 10 AND n_nationkey % 6 = 0
        |UNION ALL
        |SELECT n_nationkey, n_name, n_regionkey, 'DELETE',
        |  CAST(3 AS INTEGER), CAST(4 AS BIGINT)
        |FROM nation WHERE n_nationkey IN (1, 13)
        |ORDER BY _commit_snapshot_id, _change_type, n_nationkey""".stripMargin,

    // the merged-into-Delta final state must equal the CoW merge SQL
    "mat_incremental_merge_delta" ->
      """SELECT c_custkey, c_mktsegment,
        |  CASE WHEN c_custkey % 3 = 0 THEN c_acctbal ELSE 0.0 END AS bal
        |FROM customer ORDER BY c_custkey""".stripMargin,

    // the DV-masking merge-on-read lands on the same final state as
    // the CoW merge
    "mat_incremental_merge_delta_mor" ->
      """SELECT c_custkey, c_mktsegment,
        |  CASE WHEN c_custkey % 3 = 0 THEN c_acctbal ELSE 0.0 END AS bal
        |FROM customer ORDER BY c_custkey""".stripMargin,

    // the SQL-text MERGE INTO routes into the same CoW merge — same
    // final state
    "run_sql_merge_into" ->
      """SELECT c_custkey, c_mktsegment,
        |  CASE WHEN c_custkey % 3 = 0 THEN c_acctbal ELSE 0.0 END AS bal
        |FROM customer ORDER BY c_custkey""".stripMargin,

    // the residual-ON merge equals the plain merge on in-window data
    "run_sql_merge_predicates" ->
      """SELECT c_custkey, c_mktsegment,
        |  CASE WHEN c_custkey % 3 = 0 THEN c_acctbal ELSE 0.0 END AS bal,
        |  CASE WHEN c_custkey % 3 = 0 THEN TIMESTAMP '2024-02-01 00:00:00'
        |       ELSE CAST(DATE '2024-01-01' +
        |                 CAST(c_custkey % 10 AS INTEGER) AS TIMESTAMP)
        |  END AS ts
        |FROM customer ORDER BY c_custkey""".stripMargin,

    // both pinned histories: creation (all zero) and post-merge
    "run_sql_time_travel" ->
      """SELECT 0 AS ver, c_custkey, 0.0 AS bal FROM customer
        |UNION ALL
        |SELECT 1, c_custkey,
        |  CASE WHEN c_custkey % 3 = 0 THEN c_acctbal ELSE 0.0 END
        |FROM customer
        |ORDER BY ver, c_custkey""".stripMargin,

    // the widened table: old rows NULL in the new column
    "run_sql_alter_add_columns" ->
      """SELECT c_custkey, c_mktsegment,
        |  CASE WHEN c_custkey % 3 = 0 THEN c_acctbal ELSE 0.0 END AS bal,
        |  CASE WHEN c_custkey % 3 = 0 THEN 'updated' END AS note
        |FROM customer ORDER BY c_custkey""".stripMargin,

    // the narrowed table: note dropped, merged keys carry real bal
    "run_sql_alter_drop_columns" ->
      """SELECT c_custkey, c_mktsegment,
        |  CASE WHEN c_custkey % 3 = 0 THEN c_acctbal ELSE 0.0 END AS bal
        |FROM customer ORDER BY c_custkey""".stripMargin,

    // full-sync merge: matched update ∪ insert ∪ by-source update,
    // by-source BUILDING rows deleted
    "run_sql_merge_not_matched_by_source" ->
      """SELECT c_custkey, c_mktsegment, bal FROM (
        |  SELECT c_custkey, c_mktsegment, c_acctbal * 2 AS bal
        |  FROM customer WHERE c_custkey % 3 = 0
        |  UNION ALL
        |  SELECT c_custkey + 20000000, c_mktsegment, c_acctbal
        |  FROM customer WHERE c_custkey % 10 = 2
        |  UNION ALL
        |  SELECT c_custkey, c_mktsegment, CAST(0.0 AS DOUBLE)
        |  FROM customer
        |  WHERE c_custkey % 3 <> 0 AND c_mktsegment <> 'BUILDING'
        |) ORDER BY c_custkey""".stripMargin,

    // native CTAS + INSERT INTO = the whole table
    "run_sql_ctas_delta" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal AS bal
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "run_sql_ctas_iceberg" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal AS bal
        |FROM customer ORDER BY c_custkey""".stripMargin,

    // both CREATE OR REPLACE keys end on the run-2 rebuild: every
    // customer with doubled balance
    "run_sql_create_or_replace_delta" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal * 2 AS bal
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "run_sql_create_or_replace_iceberg" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal * 2 AS bal
        |FROM customer ORDER BY c_custkey""".stripMargin,

    // the delete+update+insert merge equals the anti-join + merge SQL
    "run_sql_merge_delete" ->
      """SELECT c_custkey, c_mktsegment, bal FROM (
        |  SELECT c_custkey, c_mktsegment,
        |    CASE WHEN c_custkey % 4 = 1 THEN c_acctbal * 2
        |         ELSE c_acctbal END AS bal
        |  FROM customer WHERE c_custkey % 4 <> 0
        |  UNION ALL
        |  SELECT c_custkey + 10000000, c_mktsegment, c_acctbal
        |  FROM customer WHERE c_custkey % 10 = 2
        |) ORDER BY c_custkey""".stripMargin,

    // the CDF merge-delete key returns the commit's readChanges rows:
    // delete pre-images, update pre/post-images, inserts — closed-form
    // from customer
    "run_sql_merge_delete_cdf" ->
      """SELECT c_custkey, c_mktsegment, bal, _change_type FROM (
        |  SELECT c_custkey, c_mktsegment, c_acctbal AS bal,
        |    'delete' AS _change_type
        |  FROM customer WHERE c_custkey % 4 = 0
        |  UNION ALL
        |  SELECT c_custkey, c_mktsegment, c_acctbal,
        |    'update_preimage'
        |  FROM customer WHERE c_custkey % 4 = 1
        |  UNION ALL
        |  SELECT c_custkey, c_mktsegment, c_acctbal * 2,
        |    'update_postimage'
        |  FROM customer WHERE c_custkey % 4 = 1
        |  UNION ALL
        |  SELECT c_custkey + 10000000, c_mktsegment, c_acctbal,
        |    'insert'
        |  FROM customer WHERE c_custkey % 10 = 2
        |) ORDER BY _change_type, c_custkey""".stripMargin,

    // the Iceberg fused merge-delete lands on the same final state
    "run_sql_merge_delete_iceberg" ->
      """SELECT c_custkey, c_mktsegment, bal FROM (
        |  SELECT c_custkey, c_mktsegment,
        |    CASE WHEN c_custkey % 4 = 1 THEN c_acctbal * 2
        |         ELSE c_acctbal END AS bal
        |  FROM customer WHERE c_custkey % 4 <> 0
        |  UNION ALL
        |  SELECT c_custkey + 10000000, c_mktsegment, c_acctbal
        |  FROM customer WHERE c_custkey % 10 = 2
        |) ORDER BY c_custkey""".stripMargin,

    // timestamp travel resolves to the same two pinned histories
    "run_sql_time_travel_ts" ->
      """SELECT 0 AS ver, c_custkey, 0.0 AS bal FROM customer
        |UNION ALL
        |SELECT 1, c_custkey,
        |  CASE WHEN c_custkey % 3 = 0 THEN c_acctbal ELSE 0.0 END
        |FROM customer
        |ORDER BY ver, c_custkey""".stripMargin,

    // UPDATE's post-image upsert: doubled balances where the
    // predicate matched, untouched rows identical
    "run_sql_update" ->
      """SELECT c_custkey, c_mktsegment,
        |  CASE WHEN c_custkey % 5 = 0 THEN c_acctbal * 2
        |       ELSE c_acctbal END AS bal
        |FROM customer ORDER BY c_custkey""".stripMargin,

    // DELETE's DV-masked final state: everything the predicate did
    // NOT match
    "run_sql_delete_from" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal AS bal
        |FROM customer
        |WHERE NOT (c_mktsegment = 'BUILDING' OR c_custkey % 100 = 7)
        |ORDER BY c_custkey""".stripMargin,

    // the CDF delete key returns the delete commit's cdc rows: the
    // deleted rows' pre-images
    "run_sql_delete_cdf" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal AS bal,
        |  'delete' AS _change_type
        |FROM customer
        |WHERE c_mktsegment = 'BUILDING' OR c_custkey % 100 = 7
        |ORDER BY c_custkey""".stripMargin,

    // partitioned DV delete: survivors of the partition-pruned
    // predicate
    "run_sql_delete_partitioned" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal AS bal
        |FROM customer
        |WHERE NOT (c_mktsegment = 'BUILDING' AND c_custkey % 2 = 0)
        |ORDER BY c_custkey""".stripMargin,

    // check-strategy snapshot final state: changed keys (id%4=0,
    // status forced to 'X' which never equals a TPC-H status) close
    // at the run timestamp and reopen; unchanged keys stay current
    // from the first run; fresh keys open at the run timestamp
    "run_sql_merge_snapshot_check" ->
      """WITH ord AS (
        |  SELECT o_orderkey AS id, o_orderstatus AS status FROM orders
        |), t1 AS (SELECT TIMESTAMP '2024-01-01 00:00:00' AS ts),
        |   t2 AS (SELECT TIMESTAMP '2024-06-01 00:00:00' AS ts),
        |final AS (
        |  SELECT id, status, (SELECT ts FROM t1) AS dbt_updated_at,
        |         (SELECT ts FROM t1) AS dbt_valid_from,
        |         CAST(NULL AS TIMESTAMP) AS dbt_valid_to,
        |         md5(CAST(id AS VARCHAR) || '|' ||
        |             CAST((SELECT ts FROM t1) AS VARCHAR)) AS dbt_scd_id
        |  FROM ord WHERE id % 4 <> 0
        |  UNION ALL
        |  SELECT id, status, (SELECT ts FROM t1), (SELECT ts FROM t1),
        |         (SELECT ts FROM t2),
        |         md5(CAST(id AS VARCHAR) || '|' ||
        |             CAST((SELECT ts FROM t1) AS VARCHAR))
        |  FROM ord WHERE id % 4 = 0
        |  UNION ALL
        |  SELECT id, 'X', (SELECT ts FROM t2), (SELECT ts FROM t2),
        |         CAST(NULL AS TIMESTAMP),
        |         md5(CAST(id AS VARCHAR) || '|' ||
        |             CAST((SELECT ts FROM t2) AS VARCHAR))
        |  FROM ord WHERE id % 4 = 0
        |  UNION ALL
        |  SELECT id + 20000000, status, (SELECT ts FROM t2),
        |         (SELECT ts FROM t2), CAST(NULL AS TIMESTAMP),
        |         md5(CAST(id + 20000000 AS VARCHAR) || '|' ||
        |             CAST((SELECT ts FROM t2) AS VARCHAR))
        |  FROM ord WHERE id % 9 = 2
        |)
        |SELECT * FROM final ORDER BY id, dbt_valid_from""".stripMargin,

    // the Iceberg equality-delete final state: survivors of the
    // predicate
    "run_sql_delete_iceberg" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal AS bal
        |FROM customer
        |WHERE NOT (c_mktsegment = 'MACHINERY' AND c_custkey % 2 = 1)
        |ORDER BY c_custkey""".stripMargin,

    "run_sql_delete_partitioned_iceberg" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal AS bal
        |FROM customer
        |WHERE NOT (c_mktsegment = 'BUILDING' AND c_custkey % 2 = 0)
        |ORDER BY c_custkey""".stripMargin,

    // the v3 deletion-vector delete lands on the same survivors as
    // the v2 equality-delete key
    "run_sql_delete_iceberg_dv" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal AS bal
        |FROM customer
        |WHERE NOT (c_mktsegment = 'MACHINERY' AND c_custkey % 2 = 1)
        |ORDER BY c_custkey""".stripMargin,

    // dbt snapshot over the wire: the SCD2 final state is closed-form
    // in orders — changed keys (id%3=0) close the v1 row at +30 days
    // and open a new current row, fresh keys (id%7=1, shifted ids)
    // insert, everything else stays current; scd_id is dbt's md5 form
    "run_sql_merge_snapshot" ->
      """WITH ord AS (
        |  SELECT o_orderkey AS id, o_orderstatus AS status,
        |         o_orderdate AS updated_at FROM orders
        |), final AS (
        |  SELECT id, status, updated_at,
        |         updated_at AS dbt_updated_at,
        |         updated_at AS dbt_valid_from,
        |         CAST(NULL AS TIMESTAMP) AS dbt_valid_to,
        |         md5(CAST(id AS VARCHAR) || '|' ||
        |             CAST(updated_at AS VARCHAR)) AS dbt_scd_id
        |  FROM ord WHERE id % 3 <> 0
        |  UNION ALL
        |  SELECT id, status, updated_at, updated_at, updated_at,
        |         CAST(updated_at + INTERVAL 30 DAY AS TIMESTAMP),
        |         md5(CAST(id AS VARCHAR) || '|' ||
        |             CAST(updated_at AS VARCHAR))
        |  FROM ord WHERE id % 3 = 0
        |  UNION ALL
        |  SELECT id, 'U',
        |         CAST(updated_at + INTERVAL 30 DAY AS TIMESTAMP),
        |         CAST(updated_at + INTERVAL 30 DAY AS TIMESTAMP),
        |         CAST(updated_at + INTERVAL 30 DAY AS TIMESTAMP),
        |         CAST(NULL AS TIMESTAMP),
        |         md5(CAST(id AS VARCHAR) || '|' ||
        |             CAST(CAST(updated_at + INTERVAL 30 DAY
        |                       AS TIMESTAMP) AS VARCHAR))
        |  FROM ord WHERE id % 3 = 0
        |  UNION ALL
        |  SELECT id + 10000000, status, updated_at, updated_at,
        |         updated_at, CAST(NULL AS TIMESTAMP),
        |         md5(CAST(id + 10000000 AS VARCHAR) || '|' ||
        |             CAST(updated_at AS VARCHAR))
        |  FROM ord WHERE id % 7 = 1
        |)
        |SELECT * FROM final ORDER BY id, dbt_valid_from""".stripMargin,

    // partitioned/GC'd variants land on the same CoW-merge final
    // state — partitioning and retention are storage strategies, not
    // semantics
    "mat_incremental_merge_delta_partitioned" ->
      """SELECT c_custkey, c_mktsegment,
        |  CASE WHEN c_custkey % 3 = 0 THEN c_acctbal ELSE 0.0 END AS bal
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "mat_incremental_merge_iceberg_partitioned" ->
      """SELECT c_custkey, c_mktsegment,
        |  CASE WHEN c_custkey % 3 = 0 THEN c_acctbal ELSE 0.0 END AS bal
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "mat_vacuum_delta" ->
      """SELECT c_custkey, c_mktsegment,
        |  CASE WHEN c_custkey % 3 = 0 THEN c_acctbal ELSE 0.0 END AS bal
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "mat_expire_iceberg" ->
      """SELECT c_custkey, c_mktsegment,
        |  CASE WHEN c_custkey % 3 = 0 THEN c_acctbal ELSE 0.0 END AS bal
        |FROM customer ORDER BY c_custkey""".stripMargin,

    // the merge's change feed: every custkey%3=0 row updates (old
    // balance 0.0 → real balance); nothing inserts
    "mat_incremental_merge_delta_cdf" ->
      """SELECT c_custkey, c_mktsegment, 0.0 AS bal,
        |  'update_preimage' AS _change_type,
        |  CAST(1 AS BIGINT) AS _commit_version
        |FROM customer WHERE c_custkey % 3 = 0
        |UNION ALL
        |SELECT c_custkey, c_mktsegment, c_acctbal AS bal,
        |  'update_postimage', CAST(1 AS BIGINT)
        |FROM customer WHERE c_custkey % 3 = 0
        |ORDER BY _change_type, c_custkey""".stripMargin,

    // the Iceberg merge targets must land on the SAME final state —
    // copy-on-write and merge-on-read are storage strategies, not
    // semantics
    "mat_incremental_merge_iceberg" ->
      """SELECT c_custkey, c_mktsegment,
        |  CASE WHEN c_custkey % 3 = 0 THEN c_acctbal ELSE 0.0 END AS bal
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "mat_incremental_merge_iceberg_mor" ->
      """SELECT c_custkey, c_mktsegment,
        |  CASE WHEN c_custkey % 3 = 0 THEN c_acctbal ELSE 0.0 END AS bal
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "scan_csv_seed" -> {
      val rows = seedCsvLines.drop(1).map { l =>
        val Array(id, code, tier) = l.split(","); s"($id,'$code',$tier)"
      }.mkString(", ")
      s"SELECT * FROM (VALUES $rows) AS t(id, code, tier) ORDER BY id"
    },

    "scan_json" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS jk
        |FROM events ORDER BY event_id""".stripMargin,

    "sink_parquet" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem WHERE l_quantity BETWEEN 10 AND 40
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "sink_partitioned" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "create_view" ->
      """SELECT n_name, r_name FROM nation
        |JOIN region ON n_regionkey = r_regionkey ORDER BY n_name""".stripMargin,

    "sink_zorder" -> {
      import graft.operators.ZOrder
      val q = (c: String, lo: String, hi: String) =>
        s"CASE WHEN $hi = $lo THEN 0 ELSE " +
          s"CAST(FLOOR(($c - $lo) * 255 / ($hi - $lo)) AS BIGINT) END"
      s"""WITH b AS (
         |  SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax,
         |    min(l_suppkey) AS smin, max(l_suppkey) AS smax
         |  FROM lineitem)
         |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         |  ${ZOrder.interleaveSql(Seq(
               q("l_partkey", "pmin", "pmax"),
               q("l_suppkey", "smin", "smax")), bits = 8)} AS zval
         |FROM lineitem, b
         |ORDER BY zval, l_orderkey, l_linenumber, l_partkey,
         |  l_suppkey""".stripMargin
    },

    "sink_orc" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM orders WHERE o_orderstatus <> 'P'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "sink_csv_roundtrip" ->
      """SELECT n_nationkey, n_name, n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "sink_json_roundtrip" ->
      """SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey""".stripMargin,

    "sink_text_roundtrip" ->
      "SELECT n_name FROM nation ORDER BY n_name",

    "sink_avro_roundtrip" ->
      """SELECT s_nationkey, count(*) AS n,
        |  CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,

    "sink_xml_roundtrip" ->
      """SELECT n_nationkey, n_name, n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin
  )
}

/** SURVEY §2.2 projection / filter / predicates. */
object Projections extends QueryGroup {
  override def queries: Map[String, Q] = Map(
    "project_select" -> ((s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("net_price"),
        upper(col("l_returnflag")).as("rf"))
        .orderBy("l_orderkey", "l_linenumber", "net_price", "rf")),

    "filter_pred" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity").between(5, 45)
          && col("l_returnflag").isin("A", "R")
          && col("l_shipdate") >= lit("1996-01-01").cast(TimestampType)
          && col("l_shipdate").isNotNull
          && !(col("l_discount") < 0.02)
          && col("l_linestatus").like("F%"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount")),

    "filter_case_when" -> ((s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        when(col("l_quantity") < 10, "low")
          .when(col("l_quantity") < 30, "mid")
          .otherwise("high").as("band"))
        .orderBy("l_orderkey", "l_linenumber", "band")),

    "distinct_rows" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus"))
  )

  override def oracles: Map[String, String] = Map(
    "project_select" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1.0 - l_discount) AS net_price,
        |  upper(l_returnflag) AS rf
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, net_price, rf""".stripMargin,

    "filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem
        |WHERE l_quantity BETWEEN 5 AND 45
        |  AND l_returnflag IN ('A','R')
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate IS NOT NULL
        |  AND NOT (l_discount < 0.02)
        |  AND l_linestatus LIKE 'F%'
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount""".stripMargin,

    "filter_case_when" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_quantity < 10 THEN 'low'
        |       WHEN l_quantity < 30 THEN 'mid'
        |       ELSE 'high' END AS band
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, band""".stripMargin,

    "distinct_rows" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}

/** SURVEY §2.3 joins. Broadcast hints on the dim sides; the theta/range
  * join uses band-bucketing so it stays an equi-join at 100 TB instead
  * of a quadratic nested-loop.
  */
object Joins extends QueryGroup {
  private def revenue: Column =
    asDouble(sum(dec2(col("l_extendedprice")) * (one2 - dec2(col("l_discount")))))

  override def queries: Map[String, Q] = Map(
    "join_inner_equi" -> ((s, d) =>
      Tables.orders(s, d).join(Tables.customer(s, d),
        col("o_custkey") === col("c_custkey"), "inner")
        .select("o_orderkey", "o_totalprice", "c_name")
        .orderBy("o_orderkey")),

    "join_left" -> ((s, d) =>
      Tables.customer(s, d).join(Tables.orders(s, d),
        col("o_custkey") === col("c_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")),

    "join_right" -> ((s, d) =>
      Tables.orders(s, d).join(Tables.customer(s, d),
        col("o_custkey") === col("c_custkey"), "right")
        .select("c_custkey", "o_orderkey")
        .orderBy(col("c_custkey").asc, col("o_orderkey").asc_nulls_first)),

    "join_full" -> ((s, d) => {
      val c = Tables.customer(s, d).groupBy(col("c_nationkey").as("ck"))
        .agg(count(lit(1)).as("n_cust"))
      val sup = Tables.supplier(s, d).groupBy(col("s_nationkey").as("sk"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(sup, col("ck") === col("sk"), "full")
        .select(coalesce(col("ck"), col("sk")).as("nationkey"),
          col("n_cust"), col("n_supp"))
        .orderBy("nationkey")
    }),

    "join_semi" -> ((s, d) =>
      Tables.customer(s, d).join(
        Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")),

    "join_anti" -> ((s, d) =>
      Tables.customer(s, d).join(
        Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")),

    "join_cross" -> ((s, d) =>
      Tables.region(s, d).crossJoin(Tables.nation(s, d))
        .select("r_name", "n_name").orderBy("r_name", "n_name")),

    // Null-safe equality (`<=>` / IS NOT DISTINCT FROM): NULL keys
    // match each other — the join SQL's `=` silently drops. Nulls are
    // synthesized deterministically (region 2 → NULL on both sides)
    // so the null-match rows are part of the hash-checked result.
    // Planned as a hash join (null-safe equi-keys are still
    // hashable), not a nested loop.
    "join_null_safe" -> ((s, d) => {
      val n = Tables.nation(s, d).select(col("n_nationkey"),
        col("n_name"), nullif(col("n_regionkey"), lit(2L)).as("k"))
      val r = Tables.region(s, d).select(col("r_name"),
        nullif(col("r_regionkey"), lit(2L)).as("k2"))
      n.join(r, col("k") <=> col("k2"))
        .select("n_nationkey", "n_name", "r_name", "k")
        .orderBy("n_nationkey")
    }),

    // Small dims explicitly broadcast — at 100 TB the fact side never
    // shuffles for these joins. A plan test asserts
    // BroadcastHashJoinExec.
    "join_broadcast" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name").agg(revenue.as("revenue"))
        .orderBy("n_name")),

    // Range/theta join via band-bucketing: equi-join on the price
    // band (the build side replicated to the 3 adjacent bands), then
    // apply the exact range predicate — a shuffled hash join, never a
    // O(n²) BroadcastNestedLoopJoin. The build side is the DISTINCT-
    // price histogram, not the row set: a count-within-range theta
    // join is quadratic in BAND OCCUPANCY if rows pair with rows
    // (the sf1 soak measured 128× wall for 10× rows — density
    // squared), but only |distinct prices| values can ever exist per
    // band, so pairing rows with (price, count) and summing counts
    // keeps the join linear in rows + distinct values at any scale.
    // `sum(cnt) − 1` drops the row's self-pair (its own price bucket
    // always qualifies at Δ=0), preserving the pk <> qk semantics.
    "join_theta_range" -> ((s, d) => {
      val p = Tables.part(s, d)
        .select(col("p_partkey").as("pk"), col("p_retailprice").as("pp"))
        .withColumn("band", floor(col("pp") / 5))
      val q = Tables.part(s, d)
        .groupBy(col("p_retailprice").as("qp"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("qband", floor(col("qp") / 5))
        .withColumn("band", explode(array(col("qband") - 1, col("qband"),
          col("qband") + 1)))
        .drop("qband")
      p.join(q, Seq("band"))
        .filter(col("qp") >= col("pp") - 5 && col("qp") <= col("pp") + 5)
        .groupBy(col("pk").as("p_partkey"))
        .agg((sum(col("cnt")) - 1).as("n"))
        // a part with NO other part in range has n=0 here (its own
        // price always matched) — the pair-join form emits no row
        .filter(col("n") > 0)
        .orderBy("p_partkey")
    }),

    // TPC-H Q5-shaped star join: fact tables joined on shuffled keys,
    // dims broadcast. Join order: lineitem⋈orders first (biggest
    // reduction from the date filter), then the dim chain.
    "join_multiway" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType)
          && col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
      Tables.lineitem(s, d)
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey")
            && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy("n_name").agg(revenue.as("revenue"))
        .orderBy("n_name")
    }),

    // Bucketed co-located join (SURVEY §4): both tables CTAS'd with
    // bucketBy on the join key → the join reads bucket-aligned files
    // and needs NO exchange on either side. At 100 TB this is the
    // difference between a full-fact-table shuffle and a local merge;
    // the plan test asserts the exchange-free shape.
    "join_bucketed" -> ((s, d) => {
      // fresh runs use a fresh in-memory catalog but a persistent
      // warehouse dir — clear both or CTAS refuses the stale location
      Seq("b_orders", "b_customer").foreach { t =>
        s.sql(s"DROP TABLE IF EXISTS $t")
        val loc = java.nio.file.Paths.get(
          s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
        if (Files.exists(loc)) {
          import scala.jdk.CollectionConverters._
          Files.walk(loc).iterator().asScala.toSeq.reverse
            .foreach(Files.deleteIfExists(_))
        }
      }
      Tables.orders(s, d).write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("b_orders")
      Tables.customer(s, d).write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("b_customer")
      s.table("b_orders")
        .join(s.table("b_customer"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          countDistinct(col("o_custkey")).as("n_cust"))
        .orderBy("c_mktsegment")
    }),

    // Salted skew join: row-identical to the plain join (oracle
    // asserts it), but hot keys are split `salts` ways so no single
    // reducer owns a celebrity key.
    "join_skew_salted" -> ((s, d) =>
      graft.operators.SkewJoin.saltedInnerJoin(
        Tables.orders(s, d), Tables.customer(s, d)
          .withColumnRenamed("c_custkey", "o_custkey"),
        key = "o_custkey", leftDiscriminator = "o_orderkey", salts = 8)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          asDouble(sum(dec2(col("o_totalprice")))).as("sum_price"))
        .orderBy("c_mktsegment")),

    // Bloom-prefiltered join (the runtime-filter pattern Spark's own
    // AQE applies to shuffle joins, made explicit): the selective dim
    // subset's keys build a ~1.2-byte-per-key Bloom filter on the
    // driver, which ships as a plan literal; the fact side is
    // membership-tested MAP-ONLY (codegen'd BloomMightContain) BEFORE
    // any join, so at 100 TB only probable-match rows reach the join
    // shuffle/probe at all. Blooms have no false negatives and the
    // exact join kills false positives, so the result is identical to
    // the plain join (the oracle replays it join-only).
    "join_bloom_prefilter" -> ((s, d) => {
      graft.functions.BloomFunctions.register(s)
      val dim = Tables.part(s, d).filter(col("p_size") <= 5)
        .select("p_partkey", "p_type")
        .localCheckpoint(eager = false) // feeds the bloom build AND the confirm join
      val bf = dim.stat.bloomFilter("p_partkey",
        math.max(dim.count(), 1L), 0.01)
      val bytes = graft.functions.BloomFunctions.serialize(bf)
      Tables.lineitem(s, d)
        .select("l_partkey", "l_extendedprice")
        .filter(graft.functions.BloomFunctions
          .mightContain(col("l_partkey"), bytes))
        .join(broadcast(dim), col("l_partkey") === col("p_partkey"))
        .groupBy("p_type")
        .agg(count(lit(1)).as("n"),
          asDouble(sum(dec2(col("l_extendedprice")))).as("rev"))
        .orderBy("p_type")
    }),

    // As-of join (north-star; no native batch as-of in Spark 4): for
    // each click, the latest purchase by the same user at-or-before
    // its timestamp. Delegates to operators.AsOfJoin — the union+window
    // trick: ONE shuffle on user_id, no per-row subquery, linear scale.
    // Reference basis: SURVEY §2.3 join_asof.
    "join_asof" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
      graft.operators.AsOfJoin
        .leftAsOf(clicks, purchases, "user_id", "ts", Seq("purchase_id"))
        .select("event_id", "user_id", "purchase_id")
        .orderBy("event_id")
    }),

    // Interval-overlap join: click 30-min windows × purchase 30-min
    // windows that intersect — banded into 1-hour buckets so the plan
    // is a hash EQUI-join on bucket id, never a nested-loop over the
    // inequality (plan-asserted in PlanSpec). Each true pair emitted
    // exactly once via the max-start-bucket rule.
    "join_interval_overlap" -> ((s, d) => {
      val ev = Tables.events(s, d)
      def win(t: String) = ev.filter(col("event_type") === t)
        .select(col("event_id"), col("ts").as("s"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("e"))
      graft.operators.IntervalJoin.overlapJoin(
          win("click"), win("purchase"),
          "event_id", "s", "e", "event_id", "s", "e",
          bucketSec = 3600L)
        .withColumnRenamed("l_id", "click_id")
        .withColumnRenamed("r_id", "purchase_id")
        .orderBy("click_id", "purchase_id")
    }),

    // The OPTIMIZER-rewritten form of join_interval_overlap: the
    // NAIVE inequality condition a SQL author would write, with
    // graft.plans.BandedIntervalJoinRule installed — Catalyst rewrites
    // the BNLJ-bound logical join into the banded hash equi-join
    // (Generate + hash join, plan-asserted in PlanSpec) while the
    // result stays row-identical (oracle replays the inequality).
    "join_interval_auto_banded" -> ((s, d) => {
      // a CHILD session keeps the rule out of the shared session:
      // installing on `s` would silently re-plan every later-built
      // query in the same JVM (bench keys, other suites) — plan
      // shapes must not depend on key execution order
      val s2 = s.newSession()
      graft.plans.BandedIntervalJoinRule.install(s2)
      val ev = Tables.events(s2, d)
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("ts").as("cs"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("ce"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("ts").as("ps"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("pe"))
      c.join(p, col("cs") < col("pe") && col("ps") < col("ce"))
        .select("click_id", "purchase_id")
        .orderBy("click_id", "purchase_id")
    }),

    // Point-in-interval lookup join (IP→geo / price-band shape): each
    // purchase instant joins every 45-min click window containing it.
    // The point side is MAP-ONLY (one bucket per point, no explode);
    // only intervals replicate to covering buckets; hash equi-join on
    // bucket + exact containment — never a BNLJ (plan-asserted).
    "join_point_in_range" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val pts = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), unix_micros(col("ts")).as("p"))
      val rng = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("rid"),
          unix_micros(col("ts")).as("s0"),
          (unix_micros(col("ts")) + 2700L * 1000000L).as("e0"))
      graft.operators.IntervalJoin.pointInRangeJoin(pts, rng,
          "pid", "p", "rid", "s0", "e0", bucketWidth = 3600L * 1000000L)
        .withColumnRenamed("p_id", "purchase_id")
        .withColumnRenamed("r_id", "click_id")
        .orderBy("purchase_id", "click_id")
    }),

    // Forward as-of with a tolerance bound (pandas merge_asof
    // direction='forward', tolerance=1h): for each click, the NEXT
    // purchase by the same user within an hour — the
    // click-to-conversion attribution shape. Same single-shuffle
    // union+window plan, descending time order.
    "join_asof_forward" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
      graft.operators.AsOfJoin
        .leftAsOf(clicks, purchases, "user_id", "ts", Seq("purchase_id"),
          direction = "forward", tolerance = Some(3600L))
        .select("event_id", "user_id", "purchase_id")
        .orderBy("event_id")
    })
  )

  private val revenueSql =
    """CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |  (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)""".stripMargin

  override def oracles: Map[String, String] = Map(
    "join_inner_equi" ->
      """SELECT o_orderkey, o_totalprice, c_name FROM orders
        |JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey""".stripMargin,

    "join_left" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,

    "join_right" ->
      """SELECT c_custkey, o_orderkey FROM orders
        |RIGHT JOIN customer ON o_custkey = c_custkey
        |ORDER BY c_custkey ASC, o_orderkey ASC NULLS FIRST""".stripMargin,

    "join_full" ->
      """SELECT coalesce(c.ck, s.sk) AS nationkey, c.n_cust, s.n_supp
        |FROM (SELECT c_nationkey AS ck, count(*) AS n_cust FROM customer GROUP BY 1) c
        |FULL JOIN (SELECT s_nationkey AS sk, count(*) AS n_supp FROM supplier GROUP BY 1) s
        |  ON c.ck = s.sk
        |ORDER BY nationkey""".stripMargin,

    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,

    "join_null_safe" ->
      """SELECT n_nationkey, n_name, r_name, nullif(n_regionkey, 2) AS k
        |FROM nation JOIN region
        |  ON nullif(n_regionkey, 2) IS NOT DISTINCT FROM
        |     nullif(r_regionkey, 2)
        |ORDER BY n_nationkey""".stripMargin,

    "join_broadcast" ->
      s"""SELECT n_name, $revenueSql AS revenue
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "join_theta_range" ->
      """SELECT p.p_partkey, count(*) AS n
        |FROM part p JOIN part q
        |  ON q.p_retailprice >= p.p_retailprice - 5
        | AND q.p_retailprice <= p.p_retailprice + 5
        | AND p.p_partkey <> q.p_partkey
        |GROUP BY p.p_partkey ORDER BY p.p_partkey""".stripMargin,

    "join_multiway" ->
      s"""SELECT n_name, $revenueSql AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "join_bloom_prefilter" ->
      """SELECT p_type, count(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        |    AS rev
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size <= 5
        |GROUP BY p_type ORDER BY p_type""".stripMargin,

    "join_asof" ->
      """SELECT c.event_id, c.user_id, p.event_id AS purchase_id
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND p.ts <= c.ts
        |ORDER BY c.event_id""".stripMargin,

    "join_interval_overlap" ->
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.ts < p.ts + INTERVAL 30 MINUTE
        | AND p.ts < c.ts + INTERVAL 30 MINUTE
        |ORDER BY click_id, purchase_id""".stripMargin,

    "join_interval_auto_banded" ->
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.ts < p.ts + INTERVAL 30 MINUTE
        | AND p.ts < c.ts + INTERVAL 30 MINUTE
        |ORDER BY click_id, purchase_id""".stripMargin,

    "join_point_in_range" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON c.ts <= p.ts AND p.ts < c.ts + INTERVAL 45 MINUTE
        |ORDER BY purchase_id, click_id""".stripMargin,

    "join_asof_forward" ->
      """SELECT c.event_id, c.user_id,
        |  CASE WHEN p.ts <= c.ts + INTERVAL 3600 SECOND
        |       THEN p.event_id END AS purchase_id
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND p.ts >= c.ts
        |ORDER BY c.event_id""".stripMargin,

    "join_bucketed" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  count(DISTINCT o_custkey) AS n_cust
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "join_skew_salted" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  )
}
