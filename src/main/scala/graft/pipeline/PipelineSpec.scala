package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Declarative pipeline spec — the engine-native analogue of the dbt
  * project the reference ships to S3 and shells out to
  * (reference `dbtoperator.py:286-312` loads the project;
  * `dbtoperator.py:273` pins dbt-core 1.9 whose model/materialization
  * semantics these types mirror).
  */
/** dbt 1.9 `on_schema_change` config for incremental models: what to
  * do when a new batch's columns differ from the stored table's.
  * All modes reject a TYPE change on a shared column — the members
  * already written are schema-on-read parquet, and re-typing a column
  * would mis-read every old file (dbt adapters hit the same wall;
  * `--full-refresh` is the type-change path).
  *
  *  - `Ignore` (dbt's default): the stored schema wins — the batch is
  *    projected onto it (new columns dropped, missing columns NULL).
  *  - `AppendNewColumns` (OUR default): new columns are appended to
  *    the stored schema (old rows read NULL); columns missing from
  *    the batch stay in the table (new rows read NULL). We default
  *    stricter than dbt because silently DROPPING a column a model
  *    just started producing (Ignore) is invisible data loss.
  *  - `SyncAllColumns`: the stored schema follows the batch — new
  *    columns appended AND missing columns dropped from the surface
  *    (already-written files keep the bytes; reads project them out).
  *  - `Fail`: any column-set difference fails the model.
  */
sealed trait OnSchemaChange
object OnSchemaChange {
  case object Ignore extends OnSchemaChange
  case object AppendNewColumns extends OnSchemaChange
  case object SyncAllColumns extends OnSchemaChange
  case object Fail extends OnSchemaChange

  def parse(s: String): OnSchemaChange = s match {
    case "ignore"             => Ignore
    case "append_new_columns" => AppendNewColumns
    case "sync_all_columns"   => SyncAllColumns
    case "fail"               => Fail
    case other => sys.error(s"unknown on_schema_change: $other")
  }
}

sealed trait Materialization
object Materialization {
  /** dbt `view` — registered as a temp view, no data written. */
  case object View extends Materialization
  /** dbt `table` — CTAS full refresh (overwrite parquet). */
  case object Table extends Materialization
  /** dbt `ephemeral` — inlined into downstream models, never written. */
  case object Ephemeral extends Materialization
  /** dbt-spark incremental, strategy `append`: insert rows newer than
    * the target's high-water mark on `tsCol`.
    */
  final case class IncrementalAppend(tsCol: String,
      onSchemaChange: OnSchemaChange = OnSchemaChange.AppendNewColumns)
    extends Materialization
  /** dbt-spark incremental, strategy `insert_overwrite`: replace
    * exactly the partitions present in the new batch.
    */
  final case class IncrementalInsertOverwrite(partitionCols: Seq[String],
      onSchemaChange: OnSchemaChange = OnSchemaChange.AppendNewColumns)
    extends Materialization
  /** dbt-spark incremental, strategy `merge` on `uniqueKey` — emulated
    * for vanilla parquet (no Delta/Iceberg in this image), scoped to
    * key-hash bucket partitions: the table is stored under
    * `__gbucket = pmod(xxhash64(uniqueKey), buckets)` directories, so
    * a matched key is ALWAYS in a touched bucket (key→bucket is
    * deterministic) and each merge rewrites O(touched buckets), never
    * the whole table. Size `buckets` so table_size/buckets fits a
    * comfortable rewrite unit (at 100 TB: thousands of buckets).
    *
    * `partitionBy` composes a USER partition dimension with the hash
    * buckets: storage becomes `part=…/__gbucket=…` and a merge
    * rewrites only `touched partitions ∩ touched buckets`. This is
    * the 100 TB shape: with hash-only buckets, a uniformly-distributed
    * delta of ≥ buckets keys touches EVERY bucket (hash-scatter
    * amplification — each merge degrades to an O(table) rewrite), but
    * real upsert deltas cluster on a time/tenant column, so
    * partitioning by it localizes the rewrite to the delta's
    * partitions. CONTRACT (same as Delta/Iceberg merge with partition
    * pruning, and dbt-spark insert_overwrite): a key's partition value
    * must be stable across upserts — a key that moves partitions
    * leaves its old row behind in the unmerged partition.
    */
  final case class IncrementalMerge(uniqueKey: Seq[String],
      buckets: Int = 16,
      partitionBy: Seq[String] = Nil,
      onSchemaChange: OnSchemaChange = OnSchemaChange.AppendNewColumns)
    extends Materialization
  /** MERGE-ON-READ upsert on `uniqueKey` — the Iceberg/Hudi MoR
    * counterpart to [[IncrementalMerge]]'s copy-on-write: each merge
    * APPENDS its batch as a new member stamped with a monotonically
    * increasing hidden `__gver` (O(delta) write I/O, ZERO existing
    * files touched — no bucket rewrite at all), and READS reconcile
    * latest-version-wins per key (one window pass over the scanned
    * members). `compact` (and the `autoCompactMembers` threshold)
    * folds superseded versions away, returning reads to scan speed.
    *
    * The 100 TB trade vs copy-on-write merge: MoR wins when upserts
    * are frequent relative to reads (streaming CDC, hourly upsert
    * feeds) — writes never amplify and never stall on bucket
    * rewrites, and read overhead is bounded by compaction cadence;
    * CoW wins for read-heavy tables. CONTRACT (same as dbt merge /
    * Delta MERGE): each batch is unique per `uniqueKey` — duplicate
    * keys within one batch have no defined winner.
    *
    * `deleteCol` (CDC tombstones): names a BOOLEAN batch column; rows
    * where it is true DELETE their key (the column is consumed into a
    * hidden tombstone marker, not part of the table surface). A
    * tombstone winning the version race hides the key from reads;
    * `compact` drops folded tombstones entirely (the deletion becomes
    * physical). Re-upserting the key later resurrects it — Debezium
    * op='d' semantics.
    */
  final case class IncrementalMergeOnRead(uniqueKey: Seq[String],
      onSchemaChange: OnSchemaChange = OnSchemaChange.AppendNewColumns,
      deleteCol: Option[String] = None)
    extends Materialization
  /** dbt-core 1.9 `microbatch` incremental strategy (the headline 1.9
    * materialization; the reference's pin at `dbtoperator.py:273-274`
    * carries it): the model is built and stored in INDEPENDENT
    * event-time batches. Config mirrors dbt's: `eventTime` is the
    * model's event-time column, `batchSize` the window granularity
    * (`hour`/`day`/`month`/`year`), `begin` the model's epoch (first
    * build processes `begin` → the injected end clock), `lookback`
    * how many closed batches a scheduled run re-processes besides the
    * current one (late-arrival healing).
    *
    * Per-batch, upstream refs/sources that DECLARE an event-time
    * column ([[Model.eventTime]] / [[PipelineSpec.sourceEventTime]])
    * are pre-filtered to the batch window before the model builds —
    * dbt's automatic input filtering, and the property that makes the
    * strategy the 100 TB backfill shape: each batch reads O(window)
    * input (partition-pruned at the scan when the input is stored
    * partitioned on time), never the full history, and a year-long
    * backfill is N independent idempotent window jobs instead of one
    * giant run. Inputs with no declared event time (dimension tables)
    * pass through whole, like dbt.
    *
    * Each batch replaces exactly its window's storage partition
    * (`__gwindow=<start>` member swap, atomic per batch) — re-running
    * a window is idempotent, and a mid-backfill failure keeps every
    * completed batch. The model's OUTPUT is also bounded to the
    * window on `eventTime`, which is what makes the replace
    * idempotent regardless of what the model text returns.
    *
    * DIVERGENCE (determinism): dbt derives the current batch from
    * wall-clock "now"; this engine requires the clock injected via
    * `run --event-time-end <ts>` (dbt's own backfill flag), like
    * `snapshot --at`. `--event-time-start` overrides the window start
    * for explicit backfills, exactly as in dbt.
    */
  final case class IncrementalMicrobatch(eventTime: String,
      batchSize: String,
      begin: String,
      lookback: Int = 1,
      onSchemaChange: OnSchemaChange = OnSchemaChange.AppendNewColumns,
      /** dbt 1.9 `concurrent_batches`: windows are independent jobs,
        * so a backfill may run them in parallel — each still commits
        * its own atomic member swap, so correctness is unchanged and
        * a failure still keeps every completed window. Batch schema
        * must be stable across concurrent windows (dbt's contract
        * too); leave false when batches must see each other's writes.
        */
      concurrentBatches: Boolean = false)
    extends Materialization
}

/** Per-invocation context a SQL-text model's build renders against —
  * the dbt compile context (dbt-core 1.9 semantics; the reference
  * compiles exactly this before submitting, `dbtoperator.py:342-360`):
  *
  *  - `vars`: the command's `--vars` map (`{{ var(...) }}`).
  *  - `isIncremental`: what `is_incremental()` returns — true only
  *    when the model IS an incremental materialization, its target
  *    table already exists, and the run is not `--full-refresh`.
  *  - `thisRelation`: lazily reads the model's CURRENT target table
  *    (`{{ this }}`) — present whenever the table exists. A thunk, so
  *    models that never mention `this` pay no read.
  */
final case class BuildCtx(
    vars: Map[String, String] = Map.empty,
    isIncremental: Boolean = false,
    thisRelation: Option[() => DataFrame] = None)

/** One model: a named SELECT over sources and upstream models
  * (dbt `ref()` ⇒ `deps`). `tags` feed the `tag:` node-selection
  * method (dbt config `tags=[...]`).
  */
final case class Model(
    name: String,
    deps: Seq[String],
    materialization: Materialization,
    build: (SparkSession, Map[String, DataFrame]) => DataFrame,
    tags: Seq[String] = Nil,
    /** Var-aware build, used by the runner when present (SQL-text
      * models): receives the invocation's `--vars` map (dbt
      * `run --vars '{"k": v}'`). `build` stays the no-vars view of
      * the same model so direct callers keep working.
      */
    buildV: Option[(SparkSession, Map[String, DataFrame], Map[String, String])
      => DataFrame] = None,
    /** Context-aware build (SQL-text models): additionally receives
      * the incremental compile context ([[BuildCtx]]) so
      * `{% if is_incremental() %}` / `{{ this }}` render per
      * invocation. Preferred by the runner when present.
      */
    buildC: Option[(SparkSession, Map[String, DataFrame], BuildCtx)
      => DataFrame] = None,
    /** The model's raw Jinja-SQL text when it IS a SQL-text model —
      * what `compile` renders and what the state:modified checksum
      * hashes (dbt checksums the model file).
      */
    sqlText: Option[String] = None,
    /** dbt model contract (`contract: enforced` + column specs): the
      * model's OUTPUT schema must carry exactly these (name, type)
      * pairs — extra, missing, or re-typed columns fail the build
      * BEFORE anything materializes, so downstream consumers can bind
      * to the declared shape. Order-insensitive and nullability-
      * agnostic, like dbt's checks.
      */
    contract: Option[org.apache.spark.sql.types.StructType] = None,
    /** dbt `pre-hook` / `post-hook` config: SQL statements run
      * before / after the model materializes, INSIDE its fail-fast
      * scope (a failing hook fails the model and skips its
      * descendants — the reference's stop-on-failure contract,
      * `dbtoperator.py:431-434`). Hook text renders `{{ var }}`,
      * `{{ ref/source }}` and `{{ this }}` (the model's own
      * relation); `INSERT INTO <table> <query>` appends the query's
      * rows to a warehouse table — the audit-row pattern hooks are
      * usually for.
      */
    preHooks: Seq[String] = Nil,
    postHooks: Seq[String] = Nil,
    /** dbt `event_time` config: the column that places each row in
      * event time. When a microbatch model refs this one, its input
      * frame is pre-filtered to the batch window on this column
      * (dbt's automatic input filtering). A microbatch model's own
      * [[Materialization.IncrementalMicrobatch.eventTime]] doubles as
      * its declared event time — set this only on non-microbatch
      * upstream models.
      */
    eventTime: Option[String] = None,
    /** dbt model governance (dbt-core ≥1.5, in the 1.9 pin): `group`
      * names the owning group; `access` is who may ref this model —
      * `public` (anyone), `protected` (same package; a single-package
      * engine, so equivalent to public here), `private` (same group
      * only). A ref that violates access fails at runner construction
      * — dbt's parse-time DbtReferenceError, before anything runs.
      */
    group: Option[String] = None,
    access: String = "protected",
    /** dbt `schema` config (the `generate_schema_name` output): the
      * namespace this model's relation lives in. The engine's
      * relation identity is `schema.identifier` — a schema'd model's
      * NODE NAME normalizes to `<schema>.<name>`
      * ([[PipelineSpec.normalized]]), its table lands under
      * `<warehouse>/<schema>/<name>`, and gateways resolve it by the
      * qualified name. Refs may use the qualified name always, or the
      * bare name when it is unambiguous across schemas (dbt's
      * unique-name convention); an ambiguous bare ref fails loudly at
      * construction. Equivalent to writing the qualified name
      * directly in `name`.
      */
    schema: Option[String] = None,
    /** dbt `description` (persist_docs surface): free-text doc for
      * the model, carried into `manifest.json` and `docs generate`'s
      * catalog.json, and part of the state:modified checksum (dbt
      * checksums the model file, which includes its docs).
      */
    description: Option[String] = None,
    /** dbt-spark `file_format` config: `graft` (default) stores the
      * model in the engine's manifest warehouse; `delta` / `iceberg`
      * materialize it as a REAL `_delta_log` Delta table /
      * Hadoop-catalog Iceberg table under the same warehouse path —
      * the dbt-spark contract the reference's pin exists for
      * (`dbtoperator.py:274`: `merge` needs a lakehouse format).
      * Lakehouse models support `table` and `incremental merge`
      * (plus `incremental merge_on_read` on Iceberg — the v2
      * equality-delete form), unpartitioned; other materializations
      * reject loudly. `ref()`/`{{ this }}`/runner reads route through
      * the matching interop reader, so any external Delta/Iceberg
      * reader sees the same table.
      */
    fileFormat: String = "graft")

object Model {
  // single- or double-quoted name (quotes must MATCH — `'m"` is a
  // typo, not a ref) — dbt/Jinja accepts both forms, and
  // `show --inline '…'` NEEDS the double form (the argv tokenizer
  // owns single quotes there). The optional `, v=N` is dbt's
  // versioned-model pin: `ref('m', v=2)`.
  private val refRe =
    ("""\{\{\s*(ref|source)\(\s*(?:'([^'"]+)'|"([^'"]+)")""" +
      """(?:\s*,\s*(?:'([^'"]+)'|"([^'"]+)"))?""" +
      """\s*(?:,\s*v\s*=\s*(\d+)\s*)?\)\s*\}\}""").r

  /** The ref name from a [[refRe]] match, whichever quote form hit.
    * A two-arg `source('raw','events')` (dbt's source grammar always
    * carries the source NAME plus the table) textualizes to the
    * qualified relation `raw.events` (warehouse subdir layout). A
    * two-arg `ref('pkg','model')` is dbt's (package, model) form —
    * the package is a NAMESPACE, not a schema, so it resolves through
    * the model registry by bare model name exactly like a one-arg
    * ref (dbt model names are project-unique). A version pin
    * textualizes to the version instance's node name
    * (`ref('m', v=2)` → `m_v2`, dbt's versioned-relation naming); a
    * bare ref of a versioned model stays symbolic and the runner
    * resolves it to the latest version.
    */
  private def refName(m: scala.util.matching.Regex.Match): String = {
    val keyword = m.group(1)
    val first = Option(m.group(2)).getOrElse(m.group(3))
    val second = Option(m.group(4)).orElse(Option(m.group(5)))
    val base = second match {
      case Some(s) if keyword == "source" => s"$first.$s"
      case Some(s) => s // ref('pkg','model') — model name, not pkg.model
      case None => first
    }
    Option(m.group(6)).map(v => s"${base}_v$v").getOrElse(base)
  }

  // {% if is_incremental() %} ... [{% else %} ...] {% endif %} — the
  // dbt incremental guard (non-nested, like real dbt model files);
  // (?s) so the branch bodies span lines
  private val ifIncRe =
    ("""(?s)\{%\s*if\s+is_incremental\(\)\s*%\}(.*?)""" +
      """(?:\{%\s*else\s*%\}(.*?))?\{%\s*endif\s*%\}""").r

  private[pipeline] val thisRe = """\{\{\s*this\s*\}\}""".r

  /** Render the `{% if is_incremental() %}` guard: keep the if-branch
    * on incremental runs, the else-branch (or nothing) otherwise —
    * dbt-core 1.9 semantics, where `is_incremental()` is true only on
    * a non-full-refresh run of an EXISTING incremental table. A lone
    * `{%` outside a recognized guard is rejected loudly rather than
    * submitted to Spark as literal text.
    */
  def renderIncremental(model: String, sqlText: String,
      isIncremental: Boolean): String = {
    val out = ifIncRe.replaceAllIn(sqlText, m => {
      val branch =
        if (isIncremental) m.group(1) else Option(m.group(2)).getOrElse("")
      scala.util.matching.Regex.quoteReplacement(branch)
    })
    require(!out.contains("{%"),
      s"model $model: unsupported or unterminated {% ... %} block " +
        "(recognized: non-nested {% if is_incremental() %}[{% else %}]" +
        "{% endif %} and {% for x in ['a','b'] %}...{% endfor %} with " +
        "an optional {% if not loop.last %} separator guard)")
    out
  }

  // {% for x in ['a', 'b'] %} body {% endfor %} — the Jinja loop real
  // dbt models lean on to generate UNION branches / repeated CASE
  // arms over a literal list. Non-nested; the body may use
  // {{ x }} and the canonical separator guard
  // {% if not loop.last %}...{% endif %}.
  private val forRe =
    ("""(?s)\{%\s*for\s+(\w+)\s+in\s+\[([^\]]*)\]\s*%\}(.*?)""" +
      """\{%\s*endfor\s*%\}""").r
  private val notLastRe =
    """(?s)\{%\s*if\s+not\s+loop\.last\s*%\}(.*?)\{%\s*endif\s*%\}""".r

  /** Parse a `{% for %}` literal list quote-aware — a naive
    * comma-split would shred a quoted item containing a comma into
    * stray-quote fragments and SUBMIT the corrupted SQL (violating
    * the module's loud-failure contract). Items are 'single'- or
    * "double"-quoted strings (commas inside are literal) or bare
    * unquoted tokens; anything else fails the model loudly.
    */
  private def parseForItems(model: String, items: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    def skipWs(): Unit = while (i < items.length && items(i).isWhitespace) i += 1
    while ({ skipWs(); i < items.length }) {
      items(i) match {
        case q @ ('\'' | '"') =>
          val end = items.indexOf(q, i + 1)
          require(end >= 0, s"model $model: unterminated string in " +
            s"{% for %} list: ${items.substring(i)}")
          out += items.substring(i + 1, end)
          i = end + 1
        case _ =>
          var j = i
          while (j < items.length && items(j) != ',') j += 1
          val tok = items.substring(i, j).trim
          require(tok.nonEmpty && !tok.exists(c => c == '\'' || c == '"'),
            s"model $model: malformed {% for %} list item: '$tok'")
          out += tok
          i = j
      }
      skipWs()
      if (i < items.length) {
        require(items(i) == ',', s"model $model: expected ',' in " +
          s"{% for %} list before: ${items.substring(i)}")
        i += 1
      }
    }
    val vals = out.result()
    require(vals.nonEmpty, s"model $model: empty {% for %} list")
    vals
  }

  /** Expand `{% for %}` loops over literal lists — each iteration
    * substitutes `{{ var }}` in the body (quoted items render their
    * content, like Jinja) and resolves `{% if not loop.last %}`
    * separator guards. Runs BEFORE the incremental-guard renderer, so
    * both nestings compose: a `{% for %}` inside an incremental
    * branch expands first and the surviving branch keeps its copy,
    * and an `{% if is_incremental() %}` inside a for body is
    * duplicated per iteration and then resolved per copy. Any OTHER
    * leftover `{%` is rejected loudly downstream.
    */
  def renderFor(model: String, sqlText: String): String =
    forRe.replaceAllIn(sqlText, m => {
      val (v, items, body) = (m.group(1), m.group(2), m.group(3))
      val vals = parseForItems(model, items)
      val itemRe = ("""\{\{\s*""" + v + """\s*\}\}""").r
      val expanded = vals.zipWithIndex.map { case (value, i) =>
        val withSep = notLastRe.replaceAllIn(body, g =>
          scala.util.matching.Regex.quoteReplacement(
            if (i < vals.length - 1) g.group(1) else ""))
        itemRe.replaceAllIn(withSep,
          scala.util.matching.Regex.quoteReplacement(value))
      }.mkString("")
      scala.util.matching.Regex.quoteReplacement(expanded)
    })

  // {{ var('name') }} / {{ var('name', default) }} — single or double
  // quotes around the name; the default is everything up to the
  // closing paren (no nested parens — dbt defaults are scalars here)
  private val varRe =
    """\{\{\s*var\(\s*['"]([^'"]+)['"]\s*(?:,\s*([^)]*?)\s*)?\)\s*\}\}""".r

  /** Render `{{ var(...) }}` calls in a model's SQL text against the
    * invocation vars — dbt/Jinja semantics: substitution is TEXTUAL
    * and string values render bare (the model quotes where SQL needs
    * a string literal: `... = '{{ var("status") }}'`). A missing var
    * falls back to the declared default (a default written as a
    * 'quoted' literal renders its content, like Jinja); no var and no
    * default fails the model loudly, matching dbt's compile error.
    */
  def renderVars(model: String, sqlText: String,
      vars: Map[String, String]): String =
    varRe.replaceAllIn(sqlText, m => {
      val k = m.group(1)
      val v = vars.getOrElse(k, Option(m.group(2)).filter(_.nonEmpty) match {
        case Some(d) if d.length >= 2 && d.head == '\'' && d.last == '\'' =>
          d.substring(1, d.length - 1)
        case Some(d) => d
        case None => sys.error(
          s"model $model: required var '$k' not provided " +
            "(pass --vars '{\"" + k + "\": ...}' or declare a default)")
      })
      scala.util.matching.Regex.quoteReplacement(v)
    })

  /** A parsed `{% macro name(p1, p2='default') %} body {% endmacro %}`
    * definition (dbt `macros/` surface). Params are positional with
    * optional literal defaults; the body substitutes `{{ param }}`
    * occurrences and may itself use `{{ var/ref/source }}`,
    * `{% for %}` and `{% if is_incremental() %}` — macro expansion
    * runs FIRST, so the existing render passes see the expanded text.
    */
  final case class MacroDef(name: String,
      params: Seq[(String, Option[String])], body: String)

  // {% macro name(params) %} body {% endmacro %} — non-nested, like
  // real dbt macro files
  private val macroDefRe =
    ("""(?s)\{%\s*macro\s+(\w+)\s*\(([^)]*)\)\s*%\}(.*?)""" +
      """\{%\s*endmacro\s*%\}""").r
  // a param: `name` or `name='default'` / `name="default"` / `name=42`
  private val macroParamRe =
    """\s*(\w+)\s*(?:=\s*(?:'([^']*)'|"([^"]*)"|([^,\s]+)))?\s*""".r

  /** Collect macro definitions from a text and return them with the
    * text STRIPPED of the definitions (what remains is the renderable
    * model body — dbt macro files are all-defs, model files may embed
    * file-local macros).
    */
  def parseMacros(scope: String, text: String): (Seq[MacroDef], String) = {
    val defs = macroDefRe.findAllMatchIn(text).map { m =>
      val params = m.group(2).split(",").toSeq
        .map(_.trim).filter(_.nonEmpty).map {
          case macroParamRe(n, sq, dq, bare) =>
            n -> Option(sq).orElse(Option(dq)).orElse(Option(bare))
          case other => sys.error(
            s"$scope: malformed macro parameter '$other'")
        }
      MacroDef(m.group(1), params, m.group(3))
    }.toSeq
    (defs, macroDefRe.replaceAllIn(text, ""))
  }

  /** Quote-aware split of a macro invocation's argument list: items
    * are 'single'-/"double"-quoted literals (commas inside stay
    * literal, quotes strip like Jinja) or bare paren-free tokens,
    * optionally as `name=value` keyword form. Returns
    * (positional, keyword) argument texts.
    */
  private def parseMacroArgs(scope: String, macroName: String,
      argText: String): (Seq[String], Map[String, String]) = {
    // split on commas outside quotes
    val items = scala.collection.mutable.ListBuffer.empty[String]
    var quote = ' ' // current quote char, or space for none
    val cur = new StringBuilder
    argText.foreach { c =>
      if (quote != ' ') { cur += c; if (c == quote) quote = ' ' }
      else if (c == '\'' || c == '"') { cur += c; quote = c }
      else if (c == ',') { items += cur.result(); cur.clear() }
      else cur += c
    }
    require(quote == ' ',
      s"$scope: unterminated string in arguments of $macroName(...)")
    if (cur.result().trim.nonEmpty || items.nonEmpty)
      items += cur.result()
    def unquote(s: String): String = {
      val t = s.trim
      if (t.length >= 2 && (t.head == '\'' || t.head == '"') &&
        t.last == t.head) t.substring(1, t.length - 1)
      else t
    }
    val kwRe = """(?s)\s*(\w+)\s*=\s*(.+)""".r
    val (kw, pos) = items.toList.filter(_.trim.nonEmpty)
      .partition(i => kwRe.pattern.matcher(i).matches() &&
        // a quoted value starting the item is positional ('a=b' is a
        // literal, not a kwarg)
        !i.trim.startsWith("'") && !i.trim.startsWith("\""))
    val kwargs = kw.map { case kwRe(k, v) => k -> unquote(v) }.toMap
    (pos.map(unquote), kwargs)
  }

  /** Expand macro invocations `{{ name(args) }}` against a macro
    * library, innermost-first up to a fixed depth so macros may call
    * macros without unbounded recursion. Unknown names are left
    * untouched (they may be engine functions rendered later, e.g.
    * `{{ var(...) }}`); arity/unknown-kwarg violations on a KNOWN
    * macro fail loudly like dbt's compile error.
    */
  def renderMacros(scope: String, text: String,
      macros: Map[String, MacroDef]): String = {
    if (macros.isEmpty) return text
    // args may not contain parens outside quotes (pass complex
    // expressions via {% set %} or a var); lazily to the first `)`
    val callRe = ("""\{\{\s*(""" + macros.keys.map(
      java.util.regex.Pattern.quote).mkString("|") +
      """)\(([^)]*)\)\s*\}\}""").r
    var out = text
    var depth = 0
    while (callRe.findFirstIn(out).isDefined) {
      require(depth < 8,
        s"$scope: macro expansion exceeded depth 8 (recursive macro?)")
      depth += 1
      out = callRe.replaceAllIn(out, m => {
        val mac = macros(m.group(1))
        val (pos, kwargs) = parseMacroArgs(scope, mac.name, m.group(2))
        require(pos.length <= mac.params.length,
          s"$scope: macro ${mac.name} takes at most " +
            s"${mac.params.length} arguments, got ${pos.length}")
        kwargs.keys.foreach(k => require(mac.params.exists(_._1 == k),
          s"$scope: macro ${mac.name} has no parameter '$k'"))
        val bound = mac.params.zipWithIndex.map { case ((p, dflt), i) =>
          val v = if (i < pos.length) pos(i)
          else kwargs.getOrElse(p, dflt.getOrElse(sys.error(
            s"$scope: macro ${mac.name} missing argument '$p'")))
          p -> v
        }
        val bodyOut = bound.foldLeft(mac.body) { case (b, (p, v)) =>
          ("""\{\{\s*""" + p + """\s*\}\}""").r.replaceAllIn(b,
            scala.util.matching.Regex.quoteReplacement(v))
        }
        scala.util.matching.Regex.quoteReplacement(bodyOut.trim)
      })
    }
    // fail-loudly contract: a call to a KNOWN macro whose argument
    // list contains a paren (nested call, or ')' inside a quoted
    // literal) can never match callRe and would otherwise surface
    // later as an opaque Spark parse error on the literal '{{ … }}'
    val leftoverRe = ("""\{\{\s*(""" + macros.keys.map(
      java.util.regex.Pattern.quote).mkString("|") + """)\s*\(""").r
    leftoverRe.findFirstMatchIn(out).foreach(m => sys.error(
      s"$scope: call to macro ${m.group(1)} was not expanded — macro " +
        "argument lists may not contain parentheses (pass the value " +
        "through {% set %} or a var instead)"))
    out
  }

  // {% set name = value %} — value: 'string' / "string" / number /
  // bare token / [literal list]
  private val setRe =
    """\{%\s*set\s+(\w+)\s*=\s*('[^']*'|"[^"]*"|\[[^\]]*\]|[^%]+?)\s*%\}""".r

  /** Bind `{% set %}` literals: the statement is stripped, scalar
    * values substitute `{{ name }}` occurrences, and list values
    * substitute `{% for x in name %}` loop sources (the common dbt
    * `{% set cols = [...] %} … {% for c in cols %}` shape). Runs
    * after macro expansion (macro bodies may emit sets) and before
    * `{% for %}` / var rendering.
    */
  def renderSet(scope: String, text: String): String = {
    var out = text
    setRe.findAllMatchIn(text).foreach { m =>
      val (name, raw) = (m.group(1), m.group(2).trim)
      if (raw.startsWith("[")) {
        // list: substitute into for-loop sources
        val forUse = ("""(\{%\s*for\s+\w+\s+in\s+)""" + name +
          """(\s*%\})""").r
        out = forUse.replaceAllIn(out, fm =>
          scala.util.matching.Regex.quoteReplacement(
            fm.group(1) + raw + fm.group(2)))
      } else {
        val v = if (raw.length >= 2 && (raw.head == '\'' || raw.head == '"')
          && raw.last == raw.head) raw.substring(1, raw.length - 1)
        else raw
        out = ("""\{\{\s*""" + name + """\s*\}\}""").r.replaceAllIn(out,
          scala.util.matching.Regex.quoteReplacement(v))
      }
    }
    setRe.replaceAllIn(out, "")
  }

  /** SQL-text model — the reference's ACTUAL model format. dbt models
    * are Jinja-SQL files whose `{{ ref('m') }}` / `{{ source('s') }}`
    * calls both declare the DAG edges and are compiled to relation
    * names before the SQL is submitted to Spark (the reference shells
    * out to dbt to do exactly this compile+submit,
    * `dbtoperator.py:342-360`; the dbt-spark pin at `:273-274` fixes
    * the semantics). Here the refs ARE the dependency declaration
    * (parsed out of the text), each resolved input is registered under
    * a model-scoped temp view, and the substituted SQL runs through
    * `spark.sql` — so a dbt user ports their model file verbatim, not
    * a Scala lambda. Materializations, incremental strategies,
    * `--select` and topo order all apply unchanged: this is only an
    * alternative `build`.
    */
  def sql(name: String, sqlText: String,
          materialization: Materialization,
          tags: Seq[String] = Nil,
          preHooks: Seq[String] = Nil,
          postHooks: Seq[String] = Nil,
          contract: Option[org.apache.spark.sql.types.StructType] = None,
          eventTime: Option[String] = None,
          group: Option[String] = None,
          access: String = "protected",
          description: Option[String] = None,
          macros: Map[String, MacroDef] = Map.empty)
          : Model = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"model name must be a SQL identifier: $name")
    // macro + {% set %} expansion runs ONCE, at parse time (dbt
    // compiles macros before everything else): file-local {% macro %}
    // defs override the project library under the same name; the
    // expanded text is what declares deps (a ref inside a macro body
    // IS a DAG edge, as in dbt), renders downstream, and checksums
    // for state:modified (a macro edit modifies its callers).
    val (localMacros, stripped) = parseMacros(s"model $name", sqlText)
    val expandedText = renderSet(s"model $name",
      renderMacros(s"model $name", stripped,
        macros ++ localMacros.map(d => d.name -> d).toMap)).trim
    val deps = parseRefs(expandedText)
    def run(spark: SparkSession, inputs: Map[String, DataFrame],
        ctx: BuildCtx): DataFrame = {
      val rendered = renderIncremental(name,
        renderFor(name, renderVars(name, expandedText, ctx.vars)),
        ctx.isIncremental)
      // {{ this }} → the model's CURRENT target table, via a scoped
      // temp view (dbt renders it to the target relation name; the
      // usual use is the delta predicate
      // `WHERE ts > (SELECT max(ts) FROM {{ this }})` inside an
      // is_incremental() guard). Reading the live generation while
      // the new batch stages is safe — see replaceTable's scaladoc.
      if (thisRe.findFirstIn(rendered).isEmpty)
        runSqlText(name, rendered, spark, inputs)
      else {
        val thisDf = ctx.thisRelation.map(_()).getOrElse(sys.error(
          s"model $name: {{ this }} used but the target table does " +
            "not exist yet — guard it with {% if is_incremental() %}"))
        val view = s"__graft_this_${name.replace('.', '_')}"
        thisDf.createOrReplaceTempView(view)
        runSqlText(name, thisRe.replaceAllIn(rendered, view), spark, inputs)
      }
    }
    Model(name, deps, materialization,
      (spark, inputs) => run(spark, inputs, BuildCtx()), tags,
      buildV = Some((spark, inputs, vars) =>
        run(spark, inputs, BuildCtx(vars = vars))),
      buildC = Some(run),
      sqlText = Some(expandedText),
      contract = contract,
      preHooks = preHooks,
      postHooks = postHooks,
      eventTime = eventTime,
      group = group,
      access = access,
      description = description)
  }

  /** Render a SQL-text model to its COMPILED form — what `dbt compile`
    * emits to `target/compiled` and what the reference's dbt
    * invocation submits to Spark (`dbtoperator.py:342-360`): vars
    * substituted, the `is_incremental()` guard resolved against the
    * invocation's state, and `{{ ref }}` / `{{ source }}` /
    * `{{ this }}` rendered to their RELATION names (dbt renders
    * database.schema.identifier; this engine's relation identity is
    * the resource name itself).
    */
  def compileText(model: Model, vars: Map[String, String],
      isIncremental: Boolean): String = {
    val raw = model.sqlText.getOrElse(sys.error(
      s"model ${model.name} is not a SQL-text model — nothing to compile"))
    val t = renderIncremental(model.name,
      renderFor(model.name, renderVars(model.name, raw, vars)),
      isIncremental)
    thisRe.replaceAllIn(refRe.replaceAllIn(t, m => refName(m)), model.name)
  }

  /** The distinct `{{ ref }}` / `{{ source }}` names in a SQL text
    * (declaration order) — the DAG edges the text declares.
    */
  def parseRefs(sqlText: String): Seq[String] = {
    val deps = refRe.findAllMatchIn(sqlText).map(refName).toSeq.distinct
    deps.foreach(dep => require(dep.matches(
      "[A-Za-z_][A-Za-z0-9_]*(\\.[A-Za-z_][A-Za-z0-9_]*)?"),
      s"ref/source name must be identifier or schema.identifier: $dep"))
    deps
  }

  /** Register each resolved input under a scope-qualified temp view
    * and run the ref-substituted SQL. Scoped view names let
    * concurrent nodes in the same DAG level (`run --threads N`) share
    * a dep without colliding.
    */
  private[pipeline] def runSqlText(scope: String, sqlText: String,
      spark: SparkSession, inputs: Map[String, DataFrame]): DataFrame = {
    // '.' in a qualified scope/dep is not a temp-view character
    def view(dep: String) =
      s"__graft_ref_${scope.replace('.', '_')}_${dep.replace('.', '_')}"
    parseRefs(sqlText).foreach(dep =>
      inputs(dep).createOrReplaceTempView(view(dep)))
    spark.sql(refRe.replaceAllIn(sqlText, m => view(refName(m))))
  }
}

/** dbt test severity: a failing `Warn` test logs a warning but never
  * fails the command or gates `build` descendants.
  */
sealed trait Severity
object Severity {
  case object Warn extends Severity
  case object Error extends Severity
  def parse(s: String): Severity = s match {
    case "warn"  => Warn
    case "error" => Error
    case other   => sys.error(s"unknown severity: $other")
  }
}

/** dbt 1.9 test configs (`severity` / `where` / `limit` /
  * `warn_if` / `error_if`):
  *
  *  - `where`: SQL predicate filtering the TESTED MODEL's rows before
  *    the test compiles (dbt injects it around the model relation) —
  *    generic tests only; a singular test embeds its own WHERE.
  *  - `limit`: cap on violating rows the compiled query returns
  *    (dbt's stored-failures cap); thresholds see at most `limit`.
  *  - `warnIf` / `errorIf`: conditions over the violation count
  *    (`"!=0"`, `">100"`, …). With `severity=error`, `errorIf`
  *    decides failure and `warnIf` decides a warning otherwise; with
  *    `severity=warn` only `warnIf` is evaluated, never an error —
  *    exactly dbt's precedence.
  *  - `storeFailures`: persist the violating rows (limit-capped) to
  *    the warehouse table `dbt_test__audit_<test_name>` each run —
  *    dbt's `store_failures` config, whose audit table an on-call
  *    debugs from instead of re-running the test query. The table is
  *    (re)written even on a pass (zero rows), so its presence always
  *    reflects the LAST run; the `test --store-failures` flag forces
  *    storing for every test in the invocation. The threshold count
  *    is taken from the stored rows, so what's judged is exactly
  *    what's auditable.
  */
final case class TestConfig(
    severity: Severity = Severity.Error,
    where: Option[String] = None,
    limit: Option[Int] = None,
    warnIf: String = "!=0",
    errorIf: String = "!=0",
    storeFailures: Boolean = false) {
  private val condRe = """(!=|>=|<=|=|>|<)\s*(\d+)""".r
  private def eval(cond: String, n: Long): Boolean = cond.trim match {
    case condRe(op, v) =>
      val k = v.toLong
      op match {
        case "!=" => n != k
        case ">"  => n > k
        case ">=" => n >= k
        case "<"  => n < k
        case "<=" => n <= k
        case "="  => n == k
      }
    case other => sys.error(s"unparseable test condition: $other")
  }
  /** Count → outcome under dbt precedence: (fails, warns). */
  def judge(n: Long): (Boolean, Boolean) = severity match {
    case Severity.Warn  => (false, eval(warnIf, n))
    case Severity.Error =>
      val f = eval(errorIf, n)
      (f, !f && eval(warnIf, n))
  }
  /** True when a `limit(1).count` short-circuit is sound: both
    * thresholds only distinguish zero from non-zero.
    */
  def zeroOnly: Boolean = warnIf.trim == "!=0" && errorIf.trim == "!=0"
}

/** Generic data tests (dbt 1.9 built-ins): each compiles to a SELECT
  * returning violating rows; pass = 0 rows (reference intent:
  * `dbtoperator.py:334` runs `dbt test`). `Singular` is dbt's other
  * test kind — an arbitrary SQL file returning violating rows.
  */
sealed trait DataTest {
  def model: String
  def name: String
  def config: TestConfig
  /** Every node the test reads — selection (`test --select m`) runs
    * the test when ANY referenced node is selected, like dbt's
    * attached-node expansion.
    */
  def refs: Seq[String] = Seq(model)
}
object DataTest {
  final case class Unique(model: String, cols: Seq[String],
      config: TestConfig = TestConfig()) extends DataTest {
    def name = s"unique_${model}_${cols.mkString("_")}"
  }
  final case class NotNull(model: String, col: String,
      config: TestConfig = TestConfig()) extends DataTest {
    def name = s"not_null_${model}_$col"
  }
  final case class AcceptedValues(model: String, col: String,
      values: Seq[String], config: TestConfig = TestConfig())
      extends DataTest {
    def name = s"accepted_values_${model}_$col"
  }
  final case class Relationships(model: String, col: String,
      parentModel: String, parentCol: String,
      config: TestConfig = TestConfig()) extends DataTest {
    def name = s"relationships_${model}_${col}__${parentModel}_$parentCol"
    override def refs: Seq[String] = Seq(model, parentModel)
  }
  /** dbt singular test: arbitrary SQL whose rows are the violations.
    * `{{ ref('m') }}` / `{{ source('s') }}` declare what it reads
    * (parsed like [[Model.sql]]); the FIRST ref is the `model` the
    * test attaches to for `build` gating and `ls` grouping.
    * `config.where` is rejected here — a singular test owns its SQL
    * and embeds its own predicates.
    */
  final case class Singular(name: String, sql: String,
      config: TestConfig = TestConfig()) extends DataTest {
    require(config.where.isEmpty,
      s"singular test $name: `where` config is undefined for singular " +
        "tests (embed the predicate in the SQL)")
    override val refs: Seq[String] = Model.parseRefs(sql)
    require(refs.nonEmpty,
      s"singular test $name: SQL must {{ ref(...) }} at least one node")
    def model: String = refs.head
  }
}

/** Inline fixture rows for a unit test: CSV lines (header + data —
  * the Seed format) with a declared schema. dbt 1.8+ expresses these
  * as YAML dict rows; the content is the same.
  */
final case class Fixture(csvLines: Seq[String],
    schema: org.apache.spark.sql.types.StructType)

/** dbt 1.8+/1.9 unit test (`unit_tests:` in schema YAML): run one
  * model's LOGIC against mocked inputs and compare to declared
  * expected rows — no warehouse state involved. Semantics mirrored
  * from dbt-core 1.9 (the reference's pin, `dbtoperator.py:273`):
  *
  *  - `given` mocks the model's inputs by ref/source name. EVERY
  *    input the model reads must be mocked — a real relation leaking
  *    into a unit test makes it environment-dependent, so a missing
  *    mock fails loudly (dbt defaults unmocked inputs to empty rows;
  *    we reject instead — an empty default silently vacuously-passes
  *    join-shaped models).
  *  - `expect` is compared on ITS columns only (dbt compares just the
  *    columns the fixture declares), order-insensitive, as a multiset
  *    (duplicate rows must match in count). Expected values are cast
  *    to the model output's types before comparing, like dbt's
  *    union-based compare.
  *  - `vars` feeds `{{ var(...) }}` rendering (dbt `overrides:`).
  *    `is_incremental()` renders FALSE — dbt unit-tests incremental
  *    models in their initial-build form unless overridden.
  *
  * In `build`, a model's unit tests run BEFORE it materializes and a
  * failure SKIPS the model and its descendants (dbt 1.8 gating); in
  * `test`, unit tests run alongside data tests.
  */
final case class UnitTest(
    name: String,
    model: String,
    given: Map[String, Fixture],
    expect: Fixture,
    vars: Map[String, String] = Map.empty)

/** dbt `seed`: a CSV (embedded lines + declared schema) loaded as a
  * table (reference surface: seeds are just another dbt argv,
  * `dbtoperator.py:46,324`).
  */
final case class Seed(
    name: String,
    csvLines: Seq[String],
    schema: org.apache.spark.sql.types.StructType,
    tags: Seq[String] = Nil)

/** dbt snapshot change-detection strategy (dbt-core 1.9):
  *  - `Check`: a row changed when any tracked column differs
  *    (null-safe); `valid_from`/`valid_to` carry the injected run
  *    clock.
  *  - `Timestamp(tsCol)`: a row changed when its `tsCol` is STRICTLY
  *    newer than the open row's — dbt's `updated_at` strategy;
  *    `valid_from` is the row version's own `tsCol` and a superseded
  *    row closes at its successor's `tsCol` (hard deletes close at
  *    the run clock, dbt's `invalidate_hard_deletes`).
  */
sealed trait SnapshotStrategy
object SnapshotStrategy {
  case object Check extends SnapshotStrategy
  final case class Timestamp(tsCol: String) extends SnapshotStrategy
}

/** dbt-core 1.9 snapshot `hard_deletes` config — what happens to a
  * key absent from the source:
  *
  *  - `Ignore`: nothing; the stale row stays open (dbt's default).
  *  - `Invalidate`: close the open row at the run clock — the old
  *    `invalidate_hard_deletes: true` (this engine's historical
  *    behavior, kept as ITS default for compatibility with existing
  *    snapshot tables).
  *  - `NewRecord`: close the open row AND insert a deletion-marker
  *    row (same values, `valid_from` = run clock, open) carrying
  *    `dbt_is_deleted = true`; every row then carries the flag
  *    (false for live rows). A key that reappears re-versions even
  *    with unchanged values: the marker closes and a fresh live row
  *    opens — dbt 1.9's resurrection semantics.
  */
sealed trait HardDeletes
object HardDeletes {
  case object Ignore extends HardDeletes
  case object Invalidate extends HardDeletes
  case object NewRecord extends HardDeletes
  def parse(s: String): HardDeletes = s match {
    case "ignore"     => Ignore
    case "invalidate" => Invalidate
    case "new_record" => NewRecord
    case other => sys.error(s"unknown hard_deletes: $other " +
      "(ignore|invalidate|new_record)")
  }
}

/** dbt `snapshot`: SCD2-track a source/model under `name`. The
  * snapshot timestamp is injected per run (`snapshot --at <ts>`) so
  * history is deterministic.
  */
final case class SnapshotDef(
    name: String,
    source: String,
    keyCols: Seq[String],
    /** Tracked columns. The single-element form `Seq("all")` is dbt's
      * `check_cols: all` sentinel — every non-key source column,
      * resolved per run. (A source column literally named `all` can't
      * be tracked alone under this grammar; list it alongside another
      * tracked column.)
      */
    compareCols: Seq[String],
    tags: Seq[String] = Nil,
    strategy: SnapshotStrategy = SnapshotStrategy.Check,
    hardDeletes: HardDeletes = HardDeletes.Invalidate)

/** dbt exposure (`exposures:` in schema YAML): a DECLARED downstream
  * consumer — dashboard, notebook, ML job, application — whose
  * `refs` are real graph edges. Exposures never execute; they exist
  * for lineage (`ls`, manifest.json) and selection: `build -s
  * +exposure_name` materializes exactly what the consumer needs,
  * dbt's "refresh this dashboard's inputs" invocation.
  */
final case class ExposureDef(
    name: String,
    exposureType: String = "dashboard",
    refs: Seq[String] = Nil,
    owner: String = "",
    url: String = "")

/** dbt source-freshness config: warn/error when `max(tsCol)` of
  * `source` ages past the thresholds (checked by the
  * `source freshness --at <ts>` command; the clock is injected for
  * determinism where dbt uses wall-clock).
  */
final case class FreshnessDef(
    source: String,
    tsCol: String,
    warnAfterSec: Long,
    errorAfterSec: Long)

/** One dbt `selectors.yml` entry — a NAMED, reusable selection
  * (`dbt run --selector nightly`). The YAML `definition` (string
  * atoms, `method`/`value` dicts with `parents`/`children`, `union`,
  * `intersection`, `exclude`) compiles at load time onto the runner's
  * existing selection grammar: union → space-separated include atoms,
  * intersection → one comma-joined atom, exclude → exclude atoms —
  * exactly the CLI form dbt documents each definition as shorthand
  * for.
  */
final case class SelectorDef(name: String,
    description: Option[String] = None,
    default: Boolean = false,
    include: Seq[String] = Nil,
    exclude: Seq[String] = Nil)

// ---- dbt semantic layer (dbt-core ≥1.6; 1.9 parses these into the
// manifest — `dbtoperator.py:273` pins 1.9.10) -----------------------
//
// A SEMANTIC MODEL maps one materialized model to entities (join
// keys), dimensions (group-bys), and measures (aggregations); METRICS
// are defined over measures (simple), measure ratios (ratio), or
// expressions over other metrics (derived) — MetricFlow's public
// spec. dbt 1.9 itself is parse-only (validation + manifest nodes;
// query serving lives in MetricFlow); the engine additionally
// COMPILES metric queries natively (see
// [[graft.pipeline.SemanticLayer]]).

/** An entity: a join-key column of the semantic model.
  * `entityType` ∈ primary | unique | foreign | natural.
  */
final case class SemEntity(name: String, entityType: String,
    expr: Option[String] = None)

/** A dimension: a group-by column. `dimType` ∈ categorical | time
  * (time carries an optional `time_granularity`).
  */
final case class SemDimension(name: String, dimType: String,
    expr: Option[String] = None, grain: Option[String] = None)

/** A measure: an aggregation over the semantic model's rows.
  * `agg` ∈ sum | count | count_distinct | avg | min | max; `expr`
  * defaults to the measure name (dbt's own default).
  */
final case class SemMeasure(name: String, agg: String, expr: String)

final case class SemanticModelDef(
    name: String,
    /** The underlying model node, as written (`ref('orders')` or a
      * bare name — normalized to the bare name at parse).
      */
    modelRef: String,
    entities: Seq[SemEntity] = Nil,
    dimensions: Seq[SemDimension] = Nil,
    measures: Seq[SemMeasure] = Nil,
    /** `defaults: agg_time_dimension` — the time dimension measures
      * aggregate over when a query asks for a time grain.
      */
    aggTimeDimension: Option[String] = None,
    description: Option[String] = None)

/** One `metrics:` entry. `metricType` ∈ simple | ratio | derived;
  * exactly the type's own fields are set (simple → `measure`,
  * ratio → `numerator`/`denominator` measure names, derived →
  * `expr` over `inputMetrics` names).
  */
final case class MetricDef(
    name: String,
    metricType: String,
    label: Option[String] = None,
    description: Option[String] = None,
    measure: Option[String] = None,
    numerator: Option[String] = None,
    denominator: Option[String] = None,
    expr: Option[String] = None,
    inputMetrics: Seq[String] = Nil)

final case class PipelineSpec(
    models: Seq[Model],
    /** dbt model versions (dbt-core ≥1.5): versioned-model name →
      * latest version number. The version INSTANCES are ordinary
      * models named `<name>_v<k>`; `ref('name')` resolves to the
      * latest instance, `ref('name', v=k)` pins one (a pin below
      * latest logs dbt's deprecation warning), and selecting the bare
      * name selects every version, all per dbt's versioned-model
      * semantics.
      */
    modelVersions: Map[String, Int] = Map.empty,
    tests: Seq[DataTest] = Nil,
    unitTests: Seq[UnitTest] = Nil,
    sources: Map[String, String] = Map.empty,
    /** dbt source-level `event_time` config: source name → event-time
      * column, consulted by microbatch input filtering exactly like
      * [[Model.eventTime]] on model refs.
      */
    sourceEventTime: Map[String, String] = Map.empty,
    seeds: Seq[Seed] = Nil,
    snapshots: Seq[SnapshotDef] = Nil,
    freshness: Seq[FreshnessDef] = Nil,
    exposures: Seq[ExposureDef] = Nil,
    /** dbt `on-run-start` / `on-run-end` project hooks: run before the
      * first node / after the last node of every `run` and `build`
      * (on-run-end runs even when nodes failed, like dbt's). A failing
      * on-run-start fails the command before any node executes; a
      * failing on-run-end marks the command failed after the fact.
      * Same SQL surface as model hooks, minus `{{ this }}`.
      */
    onRunStart: Seq[String] = Nil,
    onRunEnd: Seq[String] = Nil,
    /** dbt `run-operation` surface: named maintenance/admin
      * statements invoked on demand (`run-operation <name>
      * [--args '{...}']`), with the hook SQL grammar — `{{ var }}` /
      * `{{ ref }}` render, `INSERT INTO t <query>` appends. dbt runs
      * a macro here; a single-engine runner's analog is a named
      * statement.
      */
    operations: Map[String, String] = Map.empty,
    /** dbt `selectors.yml` (named YAML selectors): each definition is
      * pre-compiled to include/exclude atom lists in the SAME grammar
      * `--select`/`--exclude` speak, and is invoked as
      * `--selector <name>` on any selection-taking command. At most
      * one may set `default = true` — it applies whenever a command
      * carries NO explicit selection, per dbt's default-selector
      * semantics.
      */
    selectors: Seq[SelectorDef] = Nil,
    /** dbt semantic layer (`semantic_models:` / `metrics:` blocks,
      * dbt ≥1.6): validated at runner construction, carried as
      * manifest nodes (kind `semantic_model` / `metric`, with their
      * model lineage), and natively queryable via
      * [[graft.pipeline.SemanticLayer]] / `PipelineRunner
      * .semanticQuery`.
      */
    semanticModels: Seq[SemanticModelDef] = Nil,
    metrics: Seq[MetricDef] = Nil) {

  /** Fold each model's `schema` config into its node name
    * (`sales` + `orders` → `sales.orders`) — the runner's canonical
    * relation identity. Idempotent; validates that every resulting
    * name is at most `schema.identifier` with identifier segments.
    */
  def normalized: PipelineSpec = {
    val ms = models.map { m =>
      m.schema match {
        case None => m
        case Some(s) =>
          require(!m.name.contains('.'),
            s"model ${m.name}: schema config on an already-qualified name")
          m.copy(name = s"$s.${m.name}", schema = None)
      }
    }
    (ms.map(_.name) ++ seeds.map(_.name) ++ snapshots.map(_.name) ++
      sources.keys).foreach { n =>
      val segs = n.split('.')
      require(segs.length <= 2 &&
        segs.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
        s"resource name must be identifier or schema.identifier: $n")
    }
    copy(models = ms)
  }
}
