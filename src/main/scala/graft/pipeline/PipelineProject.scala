package graft.pipeline

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.types.StructType

/** Load a packaged pipeline project from a directory or zip — the
  * engine-native analogue of the reference's S3-zip dbt project
  * (`dbtoperator.py:286-312` downloads, unzips, and locates the
  * project; `Makefile:11-18` packs it). Layout:
  *
  * {{{
  * project/
  *   sources.conf          # one `name=path` per line (# comments)
  *   models/<name>.sql     # SQL-text model (Model.sql semantics);
  *                         # may open with a {{ config(...) }} header
  *   seeds/<name>.csv      # header row + data rows
  *   seeds/<name>.ddl      # declared schema ("id INT, name STRING")
  *   tests.conf            # dbt generic tests, one per line:
  *                         #   unique:model:col1,col2
  *                         #   not_null:model:col
  *                         #   accepted_values:model:col:v1|v2
  *                         #   relationships:model:col:parent:pcol
  *                         # each may append `:severity=warn|error`
  *   tests/<name>.sql      # dbt SINGULAR test: SQL whose rows are
  *                         # violations; {{ ref }}/{{ source }} declare
  *                         # what it reads
  *   unit_tests/<name>/    # dbt unit test (dbt-core >=1.8):
  *     model               #   the model under test (one line)
  *     given_<dep>.csv/.ddl#   fixture rows per mocked input
  *     expect.csv/.ddl     #   expected output rows
  *   snapshots.conf        # SCD2 snapshots, one per line:
  *                         #   name:source:key1,key2:cmp1,cmp2
  *   exposures.conf        # dbt exposures, one per line:
  *                         #   name:type:ref1,ref2[:owner[:url]]
  *   versions.conf         # dbt versioned models, one per line:
  *                         #   name:latest  (instances are <name>_v<k>.sql)
  * }}}
  *
  * Model config grammar — dbt's `config()` call, the subset dbt-spark
  * materializations use (semantics pinned by `dbtoperator.py:273-274`):
  * {{{
  *   {{ config(materialized='view'|'table'|'ephemeral') }}
  *   {{ config(materialized='incremental', strategy='append', ts_col='c') }}
  *   {{ config(materialized='incremental', strategy='insert_overwrite',
  *             partition_by='c1,c2') }}
  *   {{ config(materialized='incremental', strategy='merge_on_read',
  *             unique_key='k1[,k2]'[, delete_col='is_deleted']) }}
  *   {{ config(materialized='incremental', strategy='merge',
  *             unique_key='c1,c2'[, buckets='32'][, partition_by='c3']) }}
  *   {{ config(materialized='incremental', strategy='microbatch',
  *             event_time='c', batch_size='day', begin='2024-01-01'
  *             [, lookback='1']) }}
  * }}}
  * Any form may add `pre_hook='sql'` / `post_hook='sql'` (`;;` joins
  * multiple statements — dbt's list form), `tags='t1,t2'` (dbt
  * config tags, feeding `--select tag:`), and `event_time='c'` (dbt's
  * model-level event-time declaration — microbatch refs to this model
  * filter it per window). No header → `view` (dbt's default
  * materialization). A `sources.conf` value may carry
  * `|event_time=c` after the path — dbt's source-level event_time.
  */
object PipelineProject {

  // lazy up to the first `) }}` so quoted values may contain parens
  // (hook SQL like count(*)); a value containing the literal sequence
  // `) }}` is out of grammar
  private val configRe = """(?s)\{\{\s*config\((.*?)\)\s*\}\}""".r
  private val kvRe = """(\w+)\s*=\s*'([^']*)'""".r

  private def listFiles(p: Path): Seq[Path] = {
    import scala.jdk.CollectionConverters._
    val s = Files.list(p)
    try s.iterator().asScala.toSeq finally s.close()
  }

  private def parseMat(header: Option[String], name: String): Materialization =
    header match {
      case None => Materialization.View
      case Some(args) =>
        val kv = kvRe.findAllMatchIn(args)
          .map(m => m.group(1) -> m.group(2)).toMap
        def need(k: String): String = kv.getOrElse(k,
          sys.error(s"model $name: config is missing '$k'"))
        kv.getOrElse("materialized", "view") match {
          case "view"      => Materialization.View
          case "table"     => Materialization.Table
          case "ephemeral" => Materialization.Ephemeral
          case "incremental" => kv.getOrElse("strategy", "append") match {
            case "append" => Materialization.IncrementalAppend(need("ts_col"))
            case "insert_overwrite" => Materialization.IncrementalInsertOverwrite(
              need("partition_by").split(',').map(_.trim).toSeq)
            case "merge" => Materialization.IncrementalMerge(
              need("unique_key").split(',').map(_.trim).toSeq,
              kv.get("buckets").map(_.toInt).getOrElse(16),
              kv.get("partition_by")
                .map(_.split(',').map(_.trim).toSeq).getOrElse(Nil))
            case "merge_on_read" => Materialization.IncrementalMergeOnRead(
              need("unique_key").split(',').map(_.trim).toSeq,
              deleteCol = kv.get("delete_col"))
            case "microbatch" => Materialization.IncrementalMicrobatch(
              need("event_time"), need("batch_size"), need("begin"),
              kv.get("lookback").map(_.toInt).getOrElse(1),
              concurrentBatches =
                kv.get("concurrent_batches").contains("true"))
            case other => sys.error(s"model $name: unknown strategy '$other'")
          }
          case other =>
            sys.error(s"model $name: unknown materialization '$other'")
        }
    }

  /** Load a project directory into a PipelineSpec. */
  def load(dir: String): PipelineSpec = {
    val root = Paths.get(dir)
    require(Files.isDirectory(root), s"not a project directory: $dir")

    val sourcesFile = root.resolve("sources.conf")
    // `name=path` with an optional `|event_time=col` suffix (dbt's
    // source-level event_time config, read by microbatch filtering)
    val sourceLines: Seq[(String, String, Option[String])] =
      if (!Files.exists(sourcesFile)) Nil
      else Files.readString(sourcesFile).linesIterator
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
        .map { l =>
          val Array(k, v0) = l.split("=", 2)
          v0.split("\\|", 2) match {
            case Array(path, et) if et.trim.startsWith("event_time=") =>
              (k.trim, path.trim,
                Some(et.trim.stripPrefix("event_time=").trim))
            case _ => (k.trim, v0.trim, None)
          }
        }.toSeq
    val sources: Map[String, String] =
      sourceLines.map(s => s._1 -> s._2).toMap
    val sourceEventTime: Map[String, String] =
      sourceLines.collect { case (n, _, Some(c)) => n -> c }.toMap

    // macros/*.sql: {% macro %} definitions shared by every model
    // (dbt's project macro namespace — real dbt projects ship these,
    // which the reference loads wholesale, `dbtoperator.py:286-312`).
    // Name collisions across macro files fail loudly at load.
    def loadMacroDir(dir: Path, scope: String): Seq[Model.MacroDef] =
      if (!Files.isDirectory(dir)) Nil
      else listFiles(dir)
        .filter(_.getFileName.toString.endsWith(".sql"))
        .sortBy(_.getFileName.toString)
        .flatMap { p =>
          val (ds, rest) = Model.parseMacros(
            s"$scope/${p.getFileName}", Files.readString(p))
          require(rest.trim.isEmpty,
            s"$scope/${p.getFileName}: only {% macro %} definitions " +
              s"are allowed in a macro file, found: ${rest.trim.take(80)}")
          ds
        }
    val projectDefs = loadMacroDir(root.resolve("macros"), "macros")
    projectDefs.groupBy(_.name).foreach { case (n, ds) =>
      require(ds.size == 1, s"macro '$n' defined ${ds.size} times")
    }

    // packages/<pkg>/macros/*.sql: dbt package macros (`packages.yml`
    // installs — dbt_utils and friends). Every package macro is
    // callable QUALIFIED as `{{ pkg.name(...) }}` (dbt's explicit
    // package call form); the bare name also resolves when nothing
    // shadows it — project macros win over packages, and a bare name
    // exported by TWO packages stays qualified-only (calling it bare
    // fails at render like dbt's ambiguity error).
    val packagesDir = root.resolve("packages")
    val packageDefs: Seq[(String, Model.MacroDef)] =
      if (!Files.isDirectory(packagesDir)) Nil
      else listFiles(packagesDir).filter(Files.isDirectory(_))
        .sortBy(_.getFileName.toString)
        .flatMap { pkgDir =>
          val pkg = pkgDir.getFileName.toString
          val defs = loadMacroDir(pkgDir.resolve("macros"),
            s"packages/$pkg/macros")
          defs.groupBy(_.name).foreach { case (n, ds) =>
            require(ds.size == 1,
              s"package $pkg: macro '$n' defined ${ds.size} times")
          }
          defs.map(d => pkg -> d)
        }
    val qualified = packageDefs.map { case (pkg, d) =>
      s"$pkg.${d.name}" -> d.copy(name = s"$pkg.${d.name}")
    }.toMap
    val projectNames = projectDefs.map(_.name).toSet
    val bareFromPackages = packageDefs.groupBy(_._2.name).collect {
      // unambiguous and not shadowed by a project macro
      case (n, Seq((_, d))) if !projectNames.contains(n) => n -> d
    }
    val macroLib: Map[String, Model.MacroDef] =
      qualified ++ bareFromPackages ++ projectDefs.map(d => d.name -> d)

    val modelsDir = root.resolve("models")
    val models: Seq[Model] =
      if (!Files.isDirectory(modelsDir)) Nil
      else listFiles(modelsDir)
        .filter(_.getFileName.toString.endsWith(".sql"))
        .sortBy(_.getFileName.toString)
        .map { p =>
          val name = p.getFileName.toString.stripSuffix(".sql")
          val text = Files.readString(p)
          val header = configRe.findFirstMatchIn(text).map(_.group(1))
          val body = configRe.replaceAllIn(text, "").trim
          // dbt hook configs: pre_hook='sql'/post_hook='sql' (no
          // embedded single quotes in this conf grammar; `;;` joins
          // multiple statements, dbt's list form)
          val kv = header.map(a => kvRe.findAllMatchIn(a)
            .map(m => m.group(1) -> m.group(2)).toMap).getOrElse(Map.empty)
          def hooks(k: String): Seq[String] = kv.get(k).toSeq
            .flatMap(_.split(";;")).map(_.trim).filter(_.nonEmpty)
          Model.sql(name, body, parseMat(header, name),
            tags = kv.get("tags").toSeq
              .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty),
            preHooks = hooks("pre_hook"), postHooks = hooks("post_hook"),
            // dbt contract: `contract='id BIGINT, v STRING'` (DDL) —
            // the output schema must match exactly or the build fails
            contract = kv.get("contract").map(StructType.fromDDL),
            // dbt model-level event_time (microbatch input filtering)
            eventTime = kv.get("event_time"),
            // dbt governance: group='g', access='private' — a private
            // model may only be ref'd within its group
            group = kv.get("group"),
            access = kv.getOrElse("access", "protected"),
            // dbt description/persist_docs: free text carried into
            // manifest.json and docs generate's catalog.json
            description = kv.get("description"),
            macros = macroLib)
        }

    val seedsDir = root.resolve("seeds")
    val seeds: Seq[Seed] =
      if (!Files.isDirectory(seedsDir)) Nil
      else listFiles(seedsDir)
        .filter(_.getFileName.toString.endsWith(".csv"))
        .sortBy(_.getFileName.toString)
        .map { p =>
          val name = p.getFileName.toString.stripSuffix(".csv")
          val ddl = seedsDir.resolve(s"$name.ddl")
          require(Files.exists(ddl),
            s"seed $name: missing declared schema file $name.ddl")
          Seed(name,
            Files.readString(p).linesIterator.filter(_.nonEmpty).toSeq,
            StructType.fromDDL(Files.readString(ddl).trim))
        }

    val testsFile = root.resolve("tests.conf")
    def cfg(extra: Seq[String], line: String): TestConfig = extra match {
      case Nil => TestConfig()
      case Seq(s) if s.startsWith("severity=") =>
        TestConfig(severity = Severity.parse(s.stripPrefix("severity=")))
      case _ => sys.error(s"tests.conf: unparseable line: $line")
    }
    val generic: Seq[DataTest] =
      if (!Files.exists(testsFile)) Nil
      else Files.readString(testsFile).linesIterator
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
        .map { l =>
          l.split(":", -1).toSeq match {
            case "unique" +: m +: cols +: extra =>
              DataTest.Unique(m, cols.split(',').map(_.trim).toSeq,
                cfg(extra, l))
            case "not_null" +: m +: c +: extra =>
              DataTest.NotNull(m, c, cfg(extra, l))
            case "accepted_values" +: m +: c +: vs +: extra =>
              DataTest.AcceptedValues(m, c,
                vs.split('|').map(_.trim).toSeq, cfg(extra, l))
            case "relationships" +: m +: c +: pm +: pc +: extra =>
              DataTest.Relationships(m, c, pm, pc, cfg(extra, l))
            case _ => sys.error(s"tests.conf: unparseable line: $l")
          }
        }.toSeq
    // dbt singular tests: tests/<name>.sql, rows = violations
    val testsDir = root.resolve("tests")
    val singular: Seq[DataTest] =
      if (!Files.isDirectory(testsDir)) Nil
      else listFiles(testsDir)
        .filter(_.getFileName.toString.endsWith(".sql"))
        .sortBy(_.getFileName.toString)
        .map { p =>
          DataTest.Singular(p.getFileName.toString.stripSuffix(".sql"),
            Files.readString(p))
        }
    val tests = generic ++ singular

    // dbt unit tests (>=1.8): unit_tests/<name>/ with a `model` file,
    // given_<dep>.csv/.ddl fixtures, expect.csv/.ddl
    val unitDir = root.resolve("unit_tests")
    def fixture(csv: Path, name: String): Fixture = {
      val ddl = csv.resolveSibling(
        csv.getFileName.toString.stripSuffix(".csv") + ".ddl")
      require(Files.exists(ddl),
        s"unit test fixture ${csv.getFileName}: missing schema ${ddl.getFileName}")
      Fixture(Files.readString(csv).linesIterator.filter(_.nonEmpty).toSeq,
        StructType.fromDDL(Files.readString(ddl).trim))
    }
    val unitTests: Seq[UnitTest] =
      if (!Files.isDirectory(unitDir)) Nil
      else listFiles(unitDir).filter(Files.isDirectory(_))
        .sortBy(_.getFileName.toString)
        .map { d =>
          val name = d.getFileName.toString
          val modelFile = d.resolve("model")
          require(Files.exists(modelFile),
            s"unit test $name: missing `model` file")
          val given = listFiles(d)
            .filter(_.getFileName.toString
              .matches("given_.*\\.csv"))
            .map { p =>
              val dep = p.getFileName.toString
                .stripPrefix("given_").stripSuffix(".csv")
              dep -> fixture(p, name)
            }.toMap
          UnitTest(name, Files.readString(modelFile).trim, given,
            fixture(d.resolve("expect.csv"), name))
        }

    val snapsFile = root.resolve("snapshots.conf")
    val snapshots: Seq[SnapshotDef] =
      if (!Files.exists(snapsFile)) Nil
      else Files.readString(snapsFile).linesIterator
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
        .map { l =>
          l.split(":", -1).toSeq match {
            // required `name:source:keys:compare`, then optional
            // `timestamp=<col>` (dbt's updated_at strategy; default
            // `check`) and `hard_deletes=<mode>` (dbt 1.9;
            // ignore|invalidate|new_record) fields in any order
            case n +: src +: ks +: cs +: rest if rest.forall(f =>
                f.startsWith("timestamp=") || f.startsWith("hard_deletes=")) =>
              var strategy: SnapshotStrategy = SnapshotStrategy.Check
              var hd: HardDeletes = HardDeletes.Invalidate
              rest.foreach {
                case f if f.startsWith("timestamp=") =>
                  strategy = SnapshotStrategy.Timestamp(
                    f.stripPrefix("timestamp=").trim)
                case f =>
                  hd = HardDeletes.parse(f.stripPrefix("hard_deletes=").trim)
              }
              SnapshotDef(n, src,
                ks.split(',').map(_.trim).toSeq,
                cs.split(',').map(_.trim).toSeq,
                strategy = strategy, hardDeletes = hd)
            case _ => sys.error(s"snapshots.conf: unparseable line: $l")
          }
        }.toSeq

    // freshness.conf: `source:ts_col:warn_after_sec:error_after_sec`
    // per line — dbt carries the same config in sources.yml
    val freshFile = root.resolve("freshness.conf")
    val freshness: Seq[FreshnessDef] =
      if (!Files.exists(freshFile)) Nil
      else Files.readString(freshFile).linesIterator
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
        .map { l =>
          l.split(":", -1).toSeq match {
            case Seq(src, ts, warn, err) =>
              FreshnessDef(src, ts, warn.trim.toLong, err.trim.toLong)
            case _ => sys.error(s"freshness.conf: unparseable line: $l")
          }
        }.toSeq

    // versions.conf: `name:latest` per line — dbt's versioned-model
    // declaration (`latest_version:` in schema YAML); instances are
    // ordinary model files named `<name>_v<k>.sql`
    val verFile = root.resolve("versions.conf")
    val modelVersions: Map[String, Int] =
      if (!Files.exists(verFile)) Map.empty
      else Files.readString(verFile).linesIterator
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
        .map { l =>
          l.split(":", -1).toSeq match {
            case Seq(n, v) if v.trim.forall(_.isDigit) && v.trim.nonEmpty =>
              n.trim -> v.trim.toInt
            case _ => sys.error(s"versions.conf: unparseable line: $l")
          }
        }.toMap

    // exposures.conf: `name:type:ref1,ref2[:owner[:url]]` — dbt's
    // exposures: block (declared downstream consumers)
    val expoFile = root.resolve("exposures.conf")
    val exposures: Seq[ExposureDef] =
      if (!Files.exists(expoFile)) Nil
      else Files.readString(expoFile).linesIterator
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
        .map { l =>
          // split capped at 5: the trailing url field may itself
          // contain colons (https://…)
          l.split(":", 5).toSeq match {
            case n +: tpe +: refs +: rest =>
              ExposureDef(n.trim, tpe.trim,
                refs.split(',').map(_.trim).filter(_.nonEmpty).toSeq,
                owner = rest.headOption.map(_.trim).getOrElse(""),
                url = rest.drop(1).headOption.map(_.trim).getOrElse(""))
            case _ => sys.error(s"exposures.conf: unparseable line: $l")
          }
        }.toSeq

    // operations/: one .sql per named `run-operation` statement
    // (dbt's macro-invocation surface; hook SQL grammar)
    val opsDir = root.resolve("operations")
    val operations: Map[String, String] =
      if (!Files.isDirectory(opsDir)) Map.empty
      else listFiles(opsDir)
        .filter(_.getFileName.toString.endsWith(".sql"))
        .map(p => p.getFileName.toString.stripSuffix(".sql") ->
          Files.readString(p).trim).toMap

    val selFile = root.resolve("selectors.yml")
    val selectors: Seq[SelectorDef] =
      if (!Files.exists(selFile)) Nil
      else parseSelectorsYaml(Files.readString(selFile))

    // semantic_models.yml: the dbt semantic layer (dbt keeps these
    // blocks in models/*.yml schema files; this project grammar
    // gives them a dedicated root file, like selectors.yml)
    val semFile = root.resolve("semantic_models.yml")
    val (semModels, metricDefs): (Seq[SemanticModelDef], Seq[MetricDef]) =
      if (!Files.exists(semFile)) (Nil, Nil)
      else parseSemanticYaml(Files.readString(semFile))

    PipelineSpec(models = models, modelVersions = modelVersions,
      tests = tests, unitTests = unitTests,
      sources = sources, sourceEventTime = sourceEventTime, seeds = seeds,
      snapshots = snapshots, freshness = freshness, exposures = exposures,
      operations = operations, selectors = selectors,
      semanticModels = semModels, metrics = metricDefs)
  }

  // ---------------------------------------------------------------
  // selectors.yml (dbt named selectors)
  // ---------------------------------------------------------------

  /** Minimal YAML-subset parser for `selectors.yml`: block maps
    * (`key: value` / `key:` + indented child), block lists (`- item`,
    * including inline-map items `- key: value` continued by
    * deeper-indented keys), quoted or plain scalars, `#` comments.
    * Flow styles, anchors and multi-document streams are out of
    * scope — a file using them fails loudly on its first
    * unrecognized line, never parses silently wrong. NOTE a selection
    * atom like `tag:daily` is a SCALAR (no space after the colon) —
    * YAML's own rule, and what dbt's selector files rely on.
    */
  private[pipeline] def yamlLite(text: String): Any = {
    def stripComment(l: String): String = {
      var inS = false; var inD = false
      val i = l.indices.find { j =>
        val c = l.charAt(j)
        if (c == '\'' && !inD) inS = !inS
        else if (c == '"' && !inS) inD = !inD
        c == '#' && !inS && !inD &&
          (j == 0 || l.charAt(j - 1).isWhitespace)
      }
      i.fold(l)(l.take(_))
    }
    val lines: Vector[(Int, String)] = text.linesIterator
      .map(stripComment)
      .filter(_.trim.nonEmpty)
      .map(l => (l.takeWhile(_ == ' ').length, l.trim))
      .toVector
    def scalar(s: String): Any = {
      val t = s.trim
      if (t.length >= 2 &&
          ((t.head == '\'' && t.last == '\'') ||
            (t.head == '"' && t.last == '"')))
        t.substring(1, t.length - 1)
      else t
    }
    // a content line is a map ENTRY iff it has ": " or ends with ":"
    def entryOf(c: String): Option[(String, String)] = {
      val iSp = c.indexOf(": ")
      if (iSp > 0) Some((c.take(iSp).trim, c.drop(iSp + 2).trim))
      else if (c.endsWith(":") && !c.dropRight(1).contains(':'))
        Some((c.dropRight(1).trim, ""))
      else None
    }
    def parseBlock(i: Int): (Any, Int) = {
      val (ind, c) = lines(i)
      if (c == "-" || c.startsWith("- ")) parseList(i, ind)
      else parseMap(i, ind)
    }
    def parseMap(i0: Int, indent: Int): (Any, Int) = {
      var i = i0
      val out = scala.collection.mutable.LinkedHashMap.empty[String, Any]
      while (i < lines.length && lines(i)._1 == indent &&
          !lines(i)._2.startsWith("- ") && lines(i)._2 != "-") {
        val c = lines(i)._2
        val (k, v) = entryOf(c).getOrElse(sys.error(
          s"selectors.yml: expected 'key: value' or 'key:', got '$c'"))
        if (v.nonEmpty) { out(k) = scalar(v); i += 1 }
        else {
          i += 1
          // child block: deeper-indented, or a list at the SAME
          // indent (YAML permits un-indented block sequences)
          if (i < lines.length && (lines(i)._1 > indent ||
              (lines(i)._1 == indent && (lines(i)._2 == "-" ||
                lines(i)._2.startsWith("- "))))) {
            val (child, ni) = parseBlock(i)
            out(k) = child; i = ni
          } else out(k) = ""
        }
      }
      (out.toMap, i)
    }
    def parseList(i0: Int, indent: Int): (Any, Int) = {
      var i = i0
      val out = scala.collection.mutable.Buffer.empty[Any]
      while (i < lines.length && lines(i)._1 == indent &&
          (lines(i)._2 == "-" || lines(i)._2.startsWith("- "))) {
        val body = lines(i)._2.drop(1).trim
        if (body.isEmpty) {
          require(i + 1 < lines.length && lines(i + 1)._1 > indent,
            "selectors.yml: bare '-' with no nested block")
          val (child, ni) = parseBlock(i + 1)
          out += child; i = ni
        } else entryOf(body) match {
          case None => out += scalar(body); i += 1
          case Some((k, v)) =>
            // inline-map item: first entry on the '-' line, later
            // entries on deeper-indented lines
            val first = scala.collection.mutable
              .LinkedHashMap.empty[String, Any]
            if (v.nonEmpty) { first(k) = scalar(v); i += 1 }
            else {
              i += 1
              if (i < lines.length && lines(i)._1 > indent &&
                  (lines(i)._2 == "-" || lines(i)._2.startsWith("- ") ||
                    entryOf(lines(i)._2).isEmpty)) {
                val (child, ni) = parseBlock(i)
                first(k) = child; i = ni
              } else if (i < lines.length && lines(i)._1 > indent) {
                // ambiguous: could be the key's child map or the
                // item's next entries — dbt selector files only nest
                // list/scalar under an empty-valued key, so child map
                // keys here are the ITEM's remaining entries
                first(k) = ""
              } else first(k) = ""
            }
            if (i < lines.length && lines(i)._1 > indent &&
                entryOf(lines(i)._2).isDefined &&
                !lines(i)._2.startsWith("- ")) {
              val (rest, ni) = parseMap(i, lines(i)._1)
              first ++= rest.asInstanceOf[Map[String, Any]]; i = ni
            }
            out += first.toMap
        }
      }
      (out.toSeq, i)
    }
    if (lines.isEmpty) Map.empty[String, Any]
    else {
      val (v, ni) = parseBlock(0)
      require(ni == lines.length,
        s"selectors.yml: trailing content from line ${ni + 1}: " +
          s"'${lines(ni)._2}'")
      v
    }
  }

  /** `selectors.yml` → [[SelectorDef]]s: each `definition` compiles
    * to include/exclude atoms in the runner's selection grammar —
    * `union` of entries = space-separated include atoms,
    * `intersection` = ONE comma-joined atom, `method`/`value` dicts
    * (`parents`/`children` booleans → `+` prefix/suffix; method `fqn`
    * is the bare-name method), `exclude` lists → exclude atoms.
    * Shapes beyond that (an intersection of unions) reject loudly.
    */
  private[pipeline] def parseSelectorsYaml(text: String): Seq[SelectorDef] = {
    val doc = yamlLite(text) match {
      case m: Map[String @unchecked, Any @unchecked] => m
      case other => sys.error(
        s"selectors.yml: top level must be a map, got $other")
    }
    val entries = doc.getOrElse("selectors",
      sys.error("selectors.yml: missing top-level 'selectors:' key")) match {
      case l: Seq[Any @unchecked] => l
      case other => sys.error(
        s"selectors.yml: 'selectors' must be a list, got $other")
    }
    def boolOf(v: Any): Boolean = v match {
      case s: String => s.equalsIgnoreCase("true")
      case b: Boolean => b
      case _ => false
    }
    def methodAtom(m: Map[String, Any]): String = {
      val method = m.getOrElse("method",
        sys.error("selector method entry lacks 'method'")).toString
      val value = m.getOrElse("value",
        sys.error("selector method entry lacks 'value'")).toString
      val core = if (method == "fqn") value else s"$method:$value"
      (if (boolOf(m.getOrElse("parents", ""))) "+" else "") + core +
        (if (boolOf(m.getOrElse("children", ""))) "+" else "")
    }
    // → (include atoms, exclude atoms)
    def compile(d: Any): (Seq[String], Seq[String]) = d match {
      case s: String => (Seq(s), Nil)
      case m: Map[String @unchecked, Any @unchecked]
          if m.contains("union") =>
        val parts = m("union").asInstanceOf[Seq[Any]].map(compile)
        (parts.flatMap(_._1), parts.flatMap(_._2))
      case m: Map[String @unchecked, Any @unchecked]
          if m.contains("intersection") =>
        val parts = m("intersection").asInstanceOf[Seq[Any]].map(compile)
        require(parts.forall(p => p._2.isEmpty && p._1.size == 1),
          "selectors.yml: an intersection may only hold atoms / " +
            "method entries (no nested unions or excludes)")
        (Seq(parts.map(_._1.head).mkString(",")), Nil)
      case m: Map[String @unchecked, Any @unchecked]
          if m.contains("exclude") =>
        val parts = m("exclude").asInstanceOf[Seq[Any]].map(compile)
        require(parts.forall(_._2.isEmpty),
          "selectors.yml: exclude cannot nest another exclude")
        (Nil, parts.flatMap(_._1))
      case m: Map[String @unchecked, Any @unchecked]
          if m.contains("method") =>
        (Seq(methodAtom(m)), Nil)
      case other => sys.error(
        s"selectors.yml: unsupported definition shape: $other")
    }
    entries.map {
      case m: Map[String @unchecked, Any @unchecked] =>
        val name = m.getOrElse("name",
          sys.error("selectors.yml: entry lacks 'name'")).toString
        val (inc, exc) = compile(m.getOrElse("definition",
          sys.error(s"selector '$name' lacks 'definition'")))
        require(inc.nonEmpty,
          s"selector '$name': definition selects nothing")
        SelectorDef(name,
          description = m.get("description").map(_.toString),
          default = boolOf(m.getOrElse("default", "")),
          include = inc, exclude = exc)
      case other => sys.error(
        s"selectors.yml: each selector must be a map, got $other")
    }
  }

  /** `semantic_models.yml` → ([[SemanticModelDef]]s, [[MetricDef]]s):
    * the dbt semantic-layer blocks (`semantic_models:` with entities /
    * dimensions / measures / defaults, `metrics:` with
    * simple / ratio / derived `type_params`) in the MetricFlow YAML
    * shape dbt ≥1.6 parses. `model: ref('x')` and bare names both
    * resolve; a `measure` / `numerator` / `denominator` may be a bare
    * name or a `name:`-keyed map (both dbt-legal). Validation of the
    * references happens in [[SemanticLayer.validate]] at runner
    * construction — this is shape parsing only.
    */
  private[pipeline] def parseSemanticYaml(text: String)
      : (Seq[SemanticModelDef], Seq[MetricDef]) = {
    val doc = yamlLite(text) match {
      case m: Map[String @unchecked, Any @unchecked] => m
      case other => sys.error(
        s"semantic_models.yml: top level must be a map, got $other")
    }
    def mapsOf(v: Any, ctx: String): Seq[Map[String, Any]] = v match {
      case l: Seq[Any @unchecked] => l.map {
        case m: Map[String @unchecked, Any @unchecked] => m
        case other => sys.error(
          s"semantic_models.yml: each $ctx entry must be a map, got $other")
      }
      case "" => Nil
      case other => sys.error(
        s"semantic_models.yml: '$ctx' must be a list, got $other")
    }
    def str(m: Map[String, Any], k: String, ctx: String): String =
      m.get(k).map(_.toString).filter(_.nonEmpty).getOrElse(
        sys.error(s"semantic_models.yml: $ctx lacks '$k'"))
    def opt(m: Map[String, Any], k: String): Option[String] =
      m.get(k).map(_.toString).filter(_.nonEmpty)
    def subMap(m: Map[String, Any], k: String): Map[String, Any] =
      m.get(k) match {
        case Some(mm: Map[String @unchecked, Any @unchecked]) => mm
        case _ => Map.empty
      }
    // `ref('x')` (dbt's model reference call) or a bare node name
    val refRe = """ref\(\s*'([^']+)'\s*\)""".r
    def refName(v: String): String = v.trim match {
      case refRe(n) => n
      case plain => plain
    }
    // a measure reference: bare name or a `name:`-keyed map
    def measureRef(v: Any, ctx: String): String = v match {
      case s: String if s.nonEmpty => s
      case m: Map[String @unchecked, Any @unchecked] =>
        m.get("name").map(_.toString).getOrElse(sys.error(
          s"semantic_models.yml: $ctx measure map lacks 'name'"))
      case other => sys.error(
        s"semantic_models.yml: $ctx has unparseable measure: $other")
    }

    val sms = mapsOf(doc.getOrElse("semantic_models", Nil: Seq[Any]),
      "semantic_models").map { m =>
      val name = str(m, "name", "semantic model")
      SemanticModelDef(
        name = name,
        modelRef = refName(str(m, "model", s"semantic model $name")),
        entities = mapsOf(m.getOrElse("entities", Nil: Seq[Any]),
          s"$name entities").map(e => SemEntity(
          str(e, "name", s"$name entity"),
          str(e, "type", s"$name entity"), opt(e, "expr"))),
        dimensions = mapsOf(m.getOrElse("dimensions", Nil: Seq[Any]),
          s"$name dimensions").map(d => SemDimension(
          str(d, "name", s"$name dimension"),
          str(d, "type", s"$name dimension"), opt(d, "expr"),
          grain = opt(subMap(d, "type_params"), "time_granularity"))),
        measures = mapsOf(m.getOrElse("measures", Nil: Seq[Any]),
          s"$name measures").map { mm =>
          val n = str(mm, "name", s"$name measure")
          SemMeasure(n, str(mm, "agg", s"$name measure $n"),
            opt(mm, "expr").getOrElse(n))
        },
        aggTimeDimension = opt(subMap(m, "defaults"), "agg_time_dimension"),
        description = opt(m, "description"))
    }

    val mets = mapsOf(doc.getOrElse("metrics", Nil: Seq[Any]), "metrics")
      .map { m =>
        val name = str(m, "name", "metric")
        val tp = subMap(m, "type_params")
        val inputs = tp.get("metrics") match {
          case Some(l: Seq[Any @unchecked]) => l.map {
            case s: String => s
            case mm: Map[String @unchecked, Any @unchecked] =>
              mm.get("name").map(_.toString).getOrElse(sys.error(
                s"semantic_models.yml: metric $name input lacks 'name'"))
            case other => sys.error(
              s"semantic_models.yml: metric $name has unparseable " +
                s"input: $other")
          }
          case _ => Nil
        }
        MetricDef(name,
          metricType = str(m, "type", s"metric $name"),
          label = opt(m, "label"),
          description = opt(m, "description"),
          measure = tp.get("measure").map(measureRef(_, s"metric $name")),
          numerator = tp.get("numerator")
            .map(measureRef(_, s"metric $name")),
          denominator = tp.get("denominator")
            .map(measureRef(_, s"metric $name")),
          expr = opt(tp, "expr"),
          inputMetrics = inputs)
      }
    (sms, mets)
  }

  /** Unzip (rejecting path-traversal entries) into `scratchDir`, locate
    * the project root (the dir holding `models/` — the reference walks
    * the extracted tree the same way to find `profiles/`,
    * `dbtoperator.py:300-312`), and load it.
    */
  def loadZip(zipPath: String, scratchDir: String): PipelineSpec = {
    val target = Paths.get(scratchDir)
    Files.createDirectories(target)
    val zis = new java.util.zip.ZipInputStream(
      Files.newInputStream(Paths.get(zipPath)))
    try {
      var e = zis.getNextEntry
      while (e != null) {
        val out = target.resolve(e.getName).normalize()
        require(out.startsWith(target),
          s"zip entry escapes extraction dir: ${e.getName}")
        if (e.isDirectory) Files.createDirectories(out)
        else {
          Files.createDirectories(out.getParent)
          Files.copy(zis, out, StandardCopyOption.REPLACE_EXISTING)
        }
        e = zis.getNextEntry
      }
    } finally zis.close()
    val root =
      if (Files.isDirectory(target.resolve("models"))) target
      else listFiles(target).filter(Files.isDirectory(_))
        .find(p => Files.isDirectory(p.resolve("models")))
        .getOrElse(target)
    load(root.toString)
  }

  /** Pack a project directory into a zip — the `Makefile:11-18` deploy
    * step, provided so round-trips are testable end-to-end.
    */
  def pack(dir: String, zipPath: String): Unit = {
    val root = Paths.get(dir)
    val zos = new java.util.zip.ZipOutputStream(
      Files.newOutputStream(Paths.get(zipPath)))
    try {
      import scala.jdk.CollectionConverters._
      val s = Files.walk(root)
      val all = try s.iterator().asScala.toSeq finally s.close()
      all.filter(Files.isRegularFile(_)).sortBy(_.toString).foreach { f =>
        zos.putNextEntry(new java.util.zip.ZipEntry(
          root.relativize(f).toString.replace('\\', '/')))
        zos.write(Files.readAllBytes(f))
        zos.closeEntry()
      }
    } finally zos.close()
  }
}
