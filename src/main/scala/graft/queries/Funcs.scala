package graft.queries

import graft.{QueryGroup, Tables}
import graft.operators.WeightedAvg
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.8 scalar function families — one query per family, all
  * codegen'd `org.apache.spark.sql.functions` (no UDFs in these), so
  * every expression stays inside WholeStageCodegen. Oracle notes:
  * DuckDB returns BIGINT from year()/len()/floor() etc. where Spark
  * returns INT/LONG — casts pin the shared type.
  */
object ScalarFuncs extends QueryGroup {

  /** Array cells → sorted-order CSV string: the driver's pandas
    * comparator cannot sort/hash ndarray cells, so every array-typed
    * output column is serialized on both sides (DuckDB mirrors with
    * `array_to_string`). Raw array types stay covered in unit tests.
    * Array-level cast (not a per-element transform lambda) keeps the
    * generated code small — eight lambda columns made Janino
    * compilation dominate the query's wall time.
    */
  private def aj(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    array_join(c.cast(ArrayType(StringType)), ",")

  override def queries: Map[String, Q] = Map(
    "fn_string" -> ((s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"),
        concat(col("c_name"), lit("-"), col("c_mktsegment")).as("cn"),
        upper(col("c_name")).as("up"),
        lower(col("c_name")).as("lo"),
        substring(col("c_name"), 10, 9).as("sub"),
        trim(concat(lit("  "), col("c_name"), lit("  "))).as("tr"),
        expr("replace(c_name, 'Customer', 'Cust')").as("rep"),
        element_at(split(col("c_name"), "#"), 2).as("spl"),
        length(col("c_name")).as("len"),
        lpad(col("c_custkey").cast(StringType), 10, "0").as("pad"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("rex"),
        regexp_replace(col("c_name"), "[0-9]+", "#").as("rrep"),
        col("c_name").like("Customer#%").as("lk"))
        .orderBy("c_custkey")),

    // ANSI-safe TRY arithmetic (Spark 4 error-handling surface):
    // try_divide nulls division-by-zero instead of failing the job,
    // try_element_at nulls out-of-range access — the graceful-
    // degradation forms ETL needs under ANSI mode. DuckDB nulls both
    // natively, so the oracle is plain SQL.
    "fn_try_arith" -> ((s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        expr("try_divide(l_quantity, l_linenumber - 1)").as("td"),
        expr("try_element_at(array(l_orderkey, l_linenumber), " +
          "l_linenumber)").as("tea"))
        .orderBy("l_orderkey", "l_linenumber", "td", "tea")),

    // dbt-utils `date_spine` + gap fill: a generated month calendar
    // (sequence/explode over the observed [min,max] — rows that exist
    // NOWHERE in the data appear with n=0) left-joined to monthly
    // order counts. The spine generates from a 1-row aggregate, so
    // the explode is driver-light and the join broadcasts the counts'
    // month dimension — no month can vanish just because no order
    // landed in it, which is the whole point of a spine.
    "fn_date_spine" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val spine = o.agg(
          date_trunc("month", min(col("o_orderdate"))).as("lo"),
          date_trunc("month", max(col("o_orderdate"))).as("hi"))
        .select(explode(expr(
          "sequence(lo, hi, INTERVAL 1 MONTH)")).as("month"))
      val counts = o
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n_orders"))
      spine.join(counts, Seq("month"), "left")
        .select(col("month"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .orderBy("month")
    }),

    "fn_date" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_trunc("month", col("o_orderdate")).as("mon"),
        (col("o_orderdate") + expr("INTERVAL 3 DAY")).as("plus3"),
        datediff(lit("1998-01-01").cast(TimestampType), col("o_orderdate"))
          .as("dd"),
        to_date(col("o_orderdate")).as("dt"),
        unix_timestamp(col("o_orderdate")).as("ue"),
        date_format(col("o_orderdate"), "yyyy-MM").as("fmt"))
        .orderBy("o_orderkey")),

    "fn_math" -> ((s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        round(col("p_retailprice") / 7, 3).as("r"),
        floor(col("p_retailprice")).as("fl"),
        ceil(col("p_retailprice")).as("ce"),
        abs(col("p_retailprice") - 910.0).as("ab"),
        sqrt(col("p_retailprice")).as("sq"),
        (col("p_retailprice") * col("p_retailprice")).as("pw"),
        round(log(col("p_retailprice")), 6).as("lg"),
        (col("p_size") % 7).as("md"),
        greatest(col("p_size"), lit(25)).as("gr"),
        least(col("p_size"), lit(25)).as("le"))
        .orderBy("p_partkey")),

    "fn_cast_null" -> ((s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"),
        col("c_custkey").cast(StringType).as("cs"),
        expr("try_cast(regexp_extract(c_name, '([0-9]+)', 1) AS INT)").as("tci"),
        expr("try_cast(c_mktsegment AS INT)").as("tcn"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("nf"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(none)"))
          .as("co"),
        expr("nvl(nullif(c_mktsegment, 'BUILDING'), '(none)')").as("nv"),
        col("c_acctbal").cast(DecimalType(10, 2)).cast(DoubleType).as("cd"))
        .orderBy("c_custkey")),

    "fn_array" -> ((s, d) =>
      Tables.lineitem(s, d)
        // sort FIRST on the four narrow long keys, derive the wide
        // string columns AFTER: the range-partition exchange then
        // moves 32 bytes/row instead of ~10 derived strings (order
        // is preserved through the downstream projection).
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic
        // lineitem; partkey/suppkey break the remaining ties — NUMERIC
        // sort keys (a tie on all four means an identical arr, hence
        // an identical row), dropped after so the output schema
        // matches the oracle's
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
        .withColumn("arr", array(col("l_orderkey"), col("l_partkey"), col("l_suppkey")))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          aj(col("arr")).as("arr_s"),
          size(col("arr")).as("sz"),
          array_contains(col("arr"), 42L).as("has42"),
          aj(array_sort(col("arr"))).as("srt"),
          aj(slice(col("arr"), 1, 2)).as("sl"),
          aj(transform(col("arr"), x => x * 2)).as("tr2"),
          aj(filter(col("arr"), x => x % 2 === 0)).as("evens"),
          aggregate(col("arr"), lit(0L), (a, x) => a + x).as("sm"),
          aj(flatten(array(col("arr"), array(lit(0L))))).as("flat"),
          aj(zip_with(col("arr"), col("arr"), (x, y) => x + y)).as("zp"))),

    "fn_map" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("m", map(lit("ty"), col("event_type"),
          lit("id"), col("event_id").cast(StringType)))
        .select(
          col("event_id"),
          array_join(array_sort(map_keys(col("m"))), ",").as("mk"),
          element_at(col("m"), "ty").as("ty"),
          element_at(col("m"), "id").as("idv"),
          size(col("m")).as("msz"))
        .orderBy("event_id")),

    // bitwise surface (hash/partition-bucket arithmetic in models)
    "fn_bitwise" -> ((s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        (col("p_partkey").bitwiseAND(lit(255L))).as("band"),
        (col("p_partkey").bitwiseOR(lit(16L))).as("bor"),
        (col("p_partkey").bitwiseXOR(col("p_size").cast(LongType))).as("bxor"),
        expr("shiftleft(p_partkey, 3)").as("shl"),
        expr("shiftright(p_partkey, 2)").as("shr"),
        bit_count(col("p_partkey")).as("pop"))
        .orderBy("p_partkey")),

    "fn_struct" -> ((s, d) =>
      Tables.customer(s, d)
        .withColumn("st", struct(col("c_custkey").as("k"),
          col("c_mktsegment").as("seg")))
        .select(
          col("c_custkey"),
          col("st.k").as("sk"),
          col("st.seg").as("sseg"),
          to_json(col("st")).as("sj"))
        .orderBy("c_custkey")),

    "fn_json" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k"),
        json_tuple(col("props"), "k").as("k2"),
        to_json(struct(col("event_id"))).as("tj"))
        .orderBy("event_id")),

    // Spark 4 VARIANT type: parse once, typed path extraction —
    // the open-schema semi-structured path (vs fn_json's per-access
    // string parsing). At scale the parse happens once per row and
    // every variant_get is a binary-encoded path walk, not a re-parse.
    "fn_variant" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          expr("variant_get(parse_json(props), '$.k', 'int')").as("k"))
        .withColumn("k_bucket", col("k") - pmod(col("k"), lit(10)))
        .filter(col("k").isNotNull && col("k") >= 50)
        .orderBy("event_id")),

    "fn_hash" -> ((s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"),
        md5(col("c_name")).as("hm"),
        sha2(col("c_name"), 256).as("hs"))
        .orderBy("c_custkey")),

    // Spark 4 collations: comparisons/distinct under UTF8_LCASE
    // (case-insensitive) vs binary semantics. Mixed-case values are
    // synthesized deterministically; the distinct-count pair proves
    // the collation actually changed equality (binary sees 2× the
    // values, LCASE folds them). Output is collation-free (counts +
    // lower() canonical) so the compare is engine-neutral.
    "fn_collation" -> ((s, d) => {
      val mixed = when(pmod(col("c_custkey"), lit(2)) === 0,
        lower(col("c_mktsegment"))).otherwise(col("c_mktsegment"))
      Tables.customer(s, d)
        .select(mixed.as("seg"))
        .agg(
          countDistinct(col("seg")).as("n_binary"),
          countDistinct(expr("collate(seg, 'UTF8_LCASE')")).as("n_ci"))
    }),

    // URL parsing family — the web-corpus curation workhorse (host
    // extraction feeds domain dedup/blocklists, path/query feed
    // boilerplate detection). URLs are synthesized deterministically
    // from doc columns so the oracle replays the EXPECTED parts and
    // the compare proves Spark's parse_url/url_decode semantics
    // against ground truth. All codegen'd expressions, map-only.
    "fn_url" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("url",
          concat(lit("https://www."), col("source"),
            lit(".example.com/"), col("lang"), lit("/doc-"),
            col("doc_id"), lit("?id="), col("doc_id"), lit("&q=a%20b")))
        .select(
          col("doc_id"),
          col("url"),
          expr("parse_url(url, 'PROTOCOL')").as("proto"),
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'PATH')").as("path"),
          expr("parse_url(url, 'QUERY')").as("query"),
          expr("parse_url(url, 'QUERY', 'id')").as("qid"),
          expr("url_decode(parse_url(url, 'QUERY', 'q'))").as("q_dec"),
          expr("concat(element_at(split(parse_url(url, 'HOST'), '\\\\.'), -2)," +
            " '.', element_at(split(parse_url(url, 'HOST'), '\\\\.'), -1))")
            .as("reg_domain"))
        .orderBy("doc_id"))
  )

  override def oracles: Map[String, String] = Map(
    "fn_string" ->
      """SELECT c_custkey,
        |  c_name || '-' || c_mktsegment AS cn,
        |  upper(c_name) AS up,
        |  lower(c_name) AS lo,
        |  substring(c_name, 10, 9) AS sub,
        |  trim('  ' || c_name || '  ') AS tr,
        |  replace(c_name, 'Customer', 'Cust') AS rep,
        |  string_split(c_name, '#')[2] AS spl,
        |  CAST(length(c_name) AS INTEGER) AS len,
        |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS pad,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS rex,
        |  regexp_replace(c_name, '[0-9]+', '#', 'g') AS rrep,
        |  c_name LIKE 'Customer#%' AS lk
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "fn_try_arith" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_quantity / (l_linenumber - 1) AS td,
        |  ([l_orderkey, CAST(l_linenumber AS BIGINT)])[l_linenumber]
        |    AS tea
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, td, tea""".stripMargin,

    "fn_date_spine" ->
      """WITH b AS (
        |  SELECT date_trunc('month', min(o_orderdate)) AS lo,
        |         date_trunc('month', max(o_orderdate)) AS hi
        |  FROM orders),
        |spine AS (
        |  SELECT unnest(generate_series(
        |    CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP),
        |    INTERVAL 1 MONTH)) AS month FROM b),
        |cnt AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
        |      AS month,
        |    count(*) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT s.month, CAST(coalesce(c.n_orders, 0) AS BIGINT) AS n_orders
        |FROM spine s LEFT JOIN cnt c ON s.month = c.month
        |ORDER BY s.month""".stripMargin,

    "fn_date" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  CAST(day(o_orderdate) AS INTEGER) AS dom,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon,
        |  o_orderdate + INTERVAL 3 DAY AS plus3,
        |  CAST(date_diff('day', o_orderdate, TIMESTAMP '1998-01-01 00:00:00') AS INTEGER) AS dd,
        |  CAST(o_orderdate AS DATE) AS dt,
        |  CAST(floor(date_part('epoch', o_orderdate)) AS BIGINT) AS ue,
        |  strftime(o_orderdate, '%Y-%m') AS fmt
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_math" ->
      """SELECT p_partkey,
        |  round(p_retailprice / 7, 3) AS r,
        |  CAST(floor(p_retailprice) AS BIGINT) AS fl,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS ce,
        |  abs(p_retailprice - 910.0) AS ab,
        |  sqrt(p_retailprice) AS sq,
        |  p_retailprice * p_retailprice AS pw,
        |  round(ln(p_retailprice), 6) AS lg,
        |  p_size % 7 AS md,
        |  greatest(p_size, 25) AS gr,
        |  least(p_size, 25) AS le
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_cast_null" ->
      """SELECT c_custkey,
        |  CAST(c_custkey AS VARCHAR) AS cs,
        |  TRY_CAST(regexp_extract(c_name, '([0-9]+)', 1) AS INTEGER) AS tci,
        |  TRY_CAST(c_mktsegment AS INTEGER) AS tcn,
        |  nullif(c_mktsegment, 'BUILDING') AS nf,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), '(none)') AS co,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), '(none)') AS nv,
        |  CAST(CAST(c_acctbal AS DECIMAL(10,2)) AS DOUBLE) AS cd
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "fn_array" ->
      """SELECT l_orderkey, l_linenumber,
        |  array_to_string([l_orderkey, l_partkey, l_suppkey], ',') AS arr_s,
        |  CAST(len([l_orderkey, l_partkey, l_suppkey]) AS INTEGER) AS sz,
        |  list_contains([l_orderkey, l_partkey, l_suppkey], 42) AS has42,
        |  array_to_string(list_sort([l_orderkey, l_partkey, l_suppkey]), ',') AS srt,
        |  array_to_string([l_orderkey, l_partkey, l_suppkey][1:2], ',') AS sl,
        |  array_to_string(list_transform([l_orderkey, l_partkey, l_suppkey], x -> x * 2), ',') AS tr2,
        |  coalesce(array_to_string(list_filter([l_orderkey, l_partkey, l_suppkey], x -> x % 2 = 0), ','), '') AS evens,
        |  CAST(list_sum([l_orderkey, l_partkey, l_suppkey]) AS BIGINT) AS sm,
        |  array_to_string(flatten([[l_orderkey, l_partkey, l_suppkey], [0]]), ',') AS flat,
        |  array_to_string(list_transform([l_orderkey, l_partkey, l_suppkey], x -> x + x), ',') AS zp
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,

    "fn_map" ->
      """SELECT event_id,
        |  array_to_string(list_sort(map_keys(map(['ty','id'], [event_type, CAST(event_id AS VARCHAR)]))), ',') AS mk,
        |  map(['ty','id'], [event_type, CAST(event_id AS VARCHAR)])['ty'][1] AS ty,
        |  map(['ty','id'], [event_type, CAST(event_id AS VARCHAR)])['id'][1] AS idv,
        |  CAST(cardinality(map(['ty','id'], [event_type, CAST(event_id AS VARCHAR)])) AS INTEGER) AS msz
        |FROM events ORDER BY event_id""".stripMargin,

    "fn_bitwise" ->
      """SELECT p_partkey,
        |  p_partkey & 255 AS band,
        |  p_partkey | 16 AS bor,
        |  xor(p_partkey, CAST(p_size AS BIGINT)) AS bxor,
        |  p_partkey << 3 AS shl,
        |  p_partkey >> 2 AS shr,
        |  CAST(bit_count(p_partkey) AS INTEGER) AS pop
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_struct" ->
      """SELECT c_custkey,
        |  struct_extract(struct_pack(k := c_custkey, seg := c_mktsegment), 'k') AS sk,
        |  struct_extract(struct_pack(k := c_custkey, seg := c_mktsegment), 'seg') AS sseg,
        |  to_json(struct_pack(k := c_custkey, seg := c_mktsegment)) AS sj
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "fn_json" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k,
        |  json_extract_string(props, '$.k') AS k2,
        |  to_json(struct_pack(event_id := event_id)) AS tj
        |FROM events ORDER BY event_id""".stripMargin,

    "fn_variant" ->
      """SELECT event_id,
        |  CAST(json_extract(props, '$.k') AS INTEGER) AS k,
        |  CAST(json_extract(props, '$.k') AS INTEGER)
        |    - CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_bucket
        |FROM events
        |WHERE json_extract(props, '$.k') IS NOT NULL
        |  AND CAST(json_extract(props, '$.k') AS INTEGER) >= 50
        |ORDER BY event_id""".stripMargin,

    "fn_hash" ->
      """SELECT c_custkey, md5(c_name) AS hm, sha256(c_name) AS hs
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "fn_collation" ->
      """SELECT count(DISTINCT CASE WHEN c_custkey % 2 = 0
        |    THEN lower(c_mktsegment) ELSE c_mktsegment END) AS n_binary,
        |  count(DISTINCT lower(c_mktsegment)) AS n_ci
        |FROM customer""".stripMargin,

    // expected-part replay: the URL is built from doc columns, so the
    // oracle reconstructs each component directly — agreement proves
    // Spark's parse_url/url_decode return ground truth.
    "fn_url" ->
      """SELECT doc_id,
        |  'https://www.' || source || '.example.com/' || lang || '/doc-'
        |    || doc_id || '?id=' || doc_id || '&q=a%20b' AS url,
        |  'https' AS proto,
        |  'www.' || source || '.example.com' AS host,
        |  '/' || lang || '/doc-' || doc_id AS path,
        |  'id=' || doc_id || '&q=a%20b' AS query,
        |  CAST(doc_id AS VARCHAR) AS qid,
        |  'a b' AS q_dec,
        |  'example.com' AS reg_domain
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}

/** SURVEY §2.9 UDF / UDAF / UDTF surface. `udf_scala` mirrors its
  * regex in SQL so the oracle agrees; `udtf_explode_custom` is the
  * one-row→many tokenizer via the Generator (explode) path.
  */
object UdfOps extends QueryGroup {

  override def queries: Map[String, Q] = Map(
    "udf_scala" -> ((s, d) => {
      val slugify = udf((name: String) =>
        if (name == null) null
        else name.toLowerCase
          .replaceAll("[^a-z0-9]+", "-")
          .replaceAll("^-|-$", ""))
      Tables.part(s, d)
        .select(col("p_partkey"),
          slugify(concat(col("p_name"), lit(" "), col("p_brand"))).as("slug"))
        .orderBy("p_partkey")
    }),

    "udaf_typed" -> ((s, d) => {
      import graft.Tables.dec2
      s.udf.register("wavg_udaf", udaf(WeightedAvg,
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong)))
      Tables.lineitem(s, d)
        .select(col("l_linestatus"),
          (dec2(col("l_extendedprice")) * lit(100)).cast(LongType).as("pc"),
          (dec2(col("l_quantity")) * lit(100)).cast(LongType).as("qc"))
        .createOrReplaceTempView("li_udaf")
      s.sql(
        """SELECT l_linestatus, wavg_udaf(pc, qc) AS wavg_price
          |FROM li_udaf GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)
    }),

    "udtf_explode_custom" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(split(lower(col("text")), "[^a-z0-9]+")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy("doc_id", "tok")
        .agg(count(lit(1)).as("n"))
        .orderBy("doc_id", "tok"))
  )

  override def oracles: Map[String, String] = Map(
    "udf_scala" ->
      """SELECT p_partkey,
        |  regexp_replace(regexp_replace(lower(p_name || ' ' || p_brand),
        |    '[^a-z0-9]+', '-', 'g'), '^-|-$', '', 'g') AS slug
        |FROM part ORDER BY p_partkey""".stripMargin,

    "udaf_typed" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |           CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) /
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS wavg_price
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "udtf_explode_custom" ->
      """SELECT doc_id, tok, count(*) AS n
        |FROM (SELECT doc_id,
        |        unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS tok
        |      FROM documents) t
        |WHERE tok <> ''
        |GROUP BY doc_id, tok ORDER BY doc_id, tok""".stripMargin
  )
}
