package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Scalar-function surface (SURVEY §2.8 gap rows): string, date/time, JSON
  * and conditional expressions, each exercised as a full query with a DuckDB
  * oracle. Everything here is a built-in Catalyst expression — fully
  * codegen'd, so at scale these fuse into the scan projection.
  */
object Functions {

  val qs: Map[String, Q] = Map(

    // String functions over part: regexp extraction, casing, padding, concat.
    "q22_string_funcs" -> Q(
      run = (s, d) => Tables.part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          length(col("p_name")).as("name_len"),
          regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).cast("long").as("brand_num"),
          substring(col("p_type"), 1, 5).as("type_prefix"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          lpad(col("p_partkey").cast("string"), 10, "0").as("key_padded"),
          translate(col("p_name"), " ", "_").as("name_snake"),
          when(col("p_name").contains("green"), lit("green"))
            .otherwise(lit("other")).as("color_flag"))
        .orderBy("p_partkey"),
      oracle = Some("""
        SELECT p_partkey,
               upper(p_name) AS name_upper,
               CAST(length(p_name) AS INT) AS name_len,
               CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS BIGINT) AS brand_num,
               substring(p_type, 1, 5) AS type_prefix,
               concat_ws('|', p_brand, p_type) AS brand_type,
               lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS key_padded,
               translate(p_name, ' ', '_') AS name_snake,
               CASE WHEN contains(p_name, 'green') THEN 'green' ELSE 'other' END AS color_flag
        FROM part ORDER BY p_partkey"""),
      doc = "string function inventory (regexp/substr/pad/translate/concat)"),

    // Date functions over orders: truncation, field extraction, arithmetic.
    "q23_date_funcs" -> Q(
      run = (s, d) => Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          date_trunc("month", col("o_orderdate")).as("order_month"),
          year(col("o_orderdate")).as("order_year"),
          month(col("o_orderdate")).as("order_mon"),
          dayofmonth(col("o_orderdate")).as("order_day"),
          quarter(col("o_orderdate")).as("order_quarter"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("timestamp")).as("days_since_epoch_start"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date_str"))
        .filter(col("o_orderkey") % 10 === 0)
        .orderBy("o_orderkey"),
      oracle = Some("""
        SELECT o_orderkey,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
               CAST(year(o_orderdate) AS INT) AS order_year,
               CAST(month(o_orderdate) AS INT) AS order_mon,
               CAST(day(o_orderdate) AS INT) AS order_day,
               CAST(quarter(o_orderdate) AS INT) AS order_quarter,
               CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since_epoch_start,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date_str
        FROM orders WHERE o_orderkey % 10 = 0 ORDER BY o_orderkey"""),
      doc = "date/time function inventory"),

    // JSON extraction from the events.props column (SURVEY §2.8 gap: the
    // reference (de)serializes JSON whole; the engine provides path access).
    "q24_json_extract" -> Q(
      run = (s, d) => Tables.events(s, d)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k_value"))
        .groupBy((col("k_value") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"), sum(col("k_value")).as("k_sum"))
        .orderBy("k_mod"),
      oracle = Some("""
        SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
               count(*) AS n,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
        FROM events
        GROUP BY 1 ORDER BY k_mod"""),
      doc = "JSON path extraction + agg over events.props"),

    // Conditional bucketing (CASE) + integer histogram.
    "q25_case_buckets" -> Q(
      run = (s, d) => Tables.orders(s, d)
        .select(
          when(col("o_totalprice") < 100000, "small")
            .when(col("o_totalprice") < 300000, "medium")
            .otherwise("large").as("price_band"))
        .groupBy("price_band")
        .agg(count(lit(1)).as("n"))
        .orderBy("price_band"),
      oracle = Some("""
        SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
                    WHEN o_totalprice < 300000 THEN 'medium'
                    ELSE 'large' END AS price_band,
               count(*) AS n
        FROM orders GROUP BY 1 ORDER BY price_band"""),
      doc = "CASE bucketing histogram"),

    // Array functions: build, dedup, sort, join — the reference's
    // multi-value fields (telefonos/rubros) as first-class arrays (§1.3).
    "q26_array_funcs" -> Q(
      run = (s, d) => Tables.documents(s, d)
        .select(
          col("doc_id"),
          split(col("text"), " ").as("tokens"))
        .select(
          col("doc_id"),
          size(col("tokens")).as("n_tokens"),
          size(array_distinct(col("tokens"))).as("n_unique"),
          array_join(slice(array_sort(array_distinct(col("tokens"))), 1, 5), ",").as("first5_sorted"),
          element_at(col("tokens"), 1).as("first_token"),
          element_at(col("tokens"), -1).as("last_token"))
        .orderBy("doc_id"),
      oracle = Some("""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents)
        SELECT doc_id,
               CAST(length(tokens) AS INT) AS n_tokens,
               CAST(length(list_distinct(tokens)) AS INT) AS n_unique,
               array_to_string(list_sort(list_distinct(tokens))[1:5], ',') AS first5_sorted,
               tokens[1] AS first_token,
               tokens[-1] AS last_token
        FROM t ORDER BY doc_id"""),
      doc = "array build/dedup/sort/slice/join (multi-value fields, §1.3)"),

    // HLL sketch cardinality (§2.4 gap): the sketch value itself has no
    // cross-engine-stable form, so the oracle-checked output is the exact
    // cardinality plus an in-plan assertion that the sketch landed within
    // its configured 2% standard error (×3 for headroom) — DuckDB supplies
    // the exact side and a literal TRUE.
    "q54_approx_distinct" -> Q(
      run = (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          count_distinct(col("l_partkey")).as("exact_parts"),
          count_distinct(col("l_suppkey")).as("exact_supps"),
          approx_count_distinct(col("l_partkey"), 0.02).as("ap"),
          approx_count_distinct(col("l_suppkey"), 0.02).as("as_"))
        .select(col("l_returnflag"), col("exact_parts"), col("exact_supps"),
          (abs(col("ap") - col("exact_parts")) * 100 <= col("exact_parts") * 6 &&
            abs(col("as_") - col("exact_supps")) * 100 <= col("exact_supps") * 6)
            .as("sketch_within_6pct"))
        .orderBy("l_returnflag"),
      oracle = Some("""
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS exact_parts,
               count(DISTINCT l_suppkey) AS exact_supps,
               TRUE AS sketch_within_6pct
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      doc = "approx_count_distinct (HLL++) error-bounded against exact counts"),

    // The 100 TB percentile path: approx_percentile (t-digest-style sketch,
    // no per-group sort) error-bounded against the exact percentile, q54's
    // technique — the oracle supplies the exact side and a literal TRUE.
    "q73_approx_percentile" -> Q(
      run = (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.5)").as("exact_median"),
          expr("approx_percentile(l_quantity, 0.5, 1000)").as("ap"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("exact_median"), col("n"),
          (abs(col("ap") - col("exact_median")) <= 2.0).as("sketch_within_2"))
        .orderBy("l_returnflag"),
      oracle = Some("""
        SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS exact_median,
               count(*) AS n, TRUE AS sketch_within_2
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      doc = "approx_percentile sketch error-bounded against exact (q54 pattern)"),

    // Conditional / argmax aggregates: count_if, bool_or/bool_and, and
    // max_by over a UNIQUE ordering key (event_id) so the argmax is
    // deterministic cross-engine.
    "q74_conditional_aggs" -> Q(
      run = (s, d) => Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          expr("count_if(value > 100.0)").as("n_high"),
          expr("bool_or(value > 450.0)").as("any_extreme"),
          expr("bool_and(value >= 0.0)").as("all_nonneg"),
          expr("max_by(user_id, event_id)").as("latest_event_user"),
          max(col("event_id")).as("max_event_id"))
        .orderBy("event_type"),
      oracle = Some("""
        SELECT event_type,
               count(*) FILTER (WHERE value > 100.0) AS n_high,
               bool_or(value > 450.0) AS any_extreme,
               bool_and(value >= 0.0) AS all_nonneg,
               arg_max(user_id, event_id) AS latest_event_user,
               max(event_id) AS max_event_id
        FROM events GROUP BY event_type ORDER BY event_type"""),
      doc = "count_if / bool_or / bool_and / deterministic max_by"),

    // MapType end-to-end (SURVEY §1.3): props parsed as MAP<STRING,BIGINT>,
    // exploded to (key, value) rows, per-key stats. The fixture's key domain
    // is {'k'}, which the oracle replays; the Spark side is generic over any
    // key set.
    "q71_map_explode" -> Q(
      run = (s, d) => Tables.events(s, d)
        .select(col("event_type"),
          explode(from_json(col("props"), "MAP<STRING, BIGINT>", Map.empty[String, String]))
            .as(Seq("key", "val")))
        .groupBy(col("event_type"), col("key"))
        .agg(count(lit(1)).as("n"), sum(col("val")).as("val_sum"),
          min(col("val")).as("val_min"), max(col("val")).as("val_max"))
        .orderBy("event_type", "key"),
      oracle = Some("""
        SELECT event_type, 'k' AS key, count(*) AS n,
               CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS val_sum,
               min(CAST(json_extract(props, '$.k') AS BIGINT)) AS val_min,
               max(CAST(json_extract(props, '$.k') AS BIGINT)) AS val_max
        FROM events
        WHERE json_extract(props, '$.k') IS NOT NULL
        GROUP BY event_type ORDER BY event_type, key"""),
      doc = "MapType parse + explode + per-key aggregation (§1.3 map path)"),

    // The SQL entry path end-to-end: temp view + spark.sql text, using the
    // extension-registered native poly_hash function inside a ranking window
    // — proves the engine's SQL surface (including its custom expression)
    // is oracle-gated, not just the DataFrame API.
    "q70_sql_surface" -> Q(
      run = (s, d) => {
        graft.GraftExtensions.register(s)
        Tables.documents(s, d).createOrReplaceTempView("documents_v")
        s.sql("""
          SELECT doc_id, poly_hash(text) AS text_hash, lang,
                 rank() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS size_rank
          FROM documents_v
          ORDER BY doc_id""")
      },
      oracle = Some("""
        SELECT doc_id,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
                 (acc, c) -> (acc * 31 + c) % 1000000007) AS text_hash,
               lang,
               CAST(rank() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS INT) AS size_rank
        FROM documents ORDER BY doc_id"""),
      doc = "spark.sql surface: temp view + native poly_hash in a ranking window"),

    // Exact interpolated percentiles (the quality-score stratification cut
    // points of a training pipeline). Interpolation fractions (.0/.25/.5/.75)
    // and integer-valued inputs make every output exact in binary floating
    // point, so Spark's percentile() and DuckDB's quantile_cont() agree
    // bit-for-bit. At 100 TB you'd switch to approx_percentile (t-digest) —
    // exact percentile sorts per group; here it doubles as the oracle check
    // for those cut points.
    "q69_percentiles" -> Q(
      run = (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.25)").as("q25"),
          expr("percentile(l_quantity, 0.5)").as("q50"),
          expr("percentile(l_quantity, 0.75)").as("q75"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      oracle = Some("""
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.25) AS q25,
               quantile_cont(l_quantity, 0.5) AS q50,
               quantile_cont(l_quantity, 0.75) AS q75,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      doc = "exact interpolated percentiles per group (stratification cuts)"),

    // Unpivot/melt — the inverse reshape of q21's pivot: wide measure
    // columns → (metric, value) rows, then a grouped roll-up. Spark plans
    // unpivot as an Expand (row generator), no shuffle until the agg.
    "q66_unpivot" -> Q(
      run = (s, d) => Tables.lineitem(s, d)
        .select(col("l_orderkey"),
          col("l_quantity").cast("decimal(18,6)").as("quantity"),
          col("l_discount").cast("decimal(18,6)").as("discount"),
          col("l_tax").cast("decimal(18,6)").as("tax"))
        .unpivot(Array(col("l_orderkey")),
          Array(col("quantity"), col("discount"), col("tax")), "metric", "val")
        .groupBy(col("metric"))
        .agg(count(lit(1)).as("n"),
          graft.MoneyOut.col(sum(col("val"))).as("total"))
        .orderBy("metric"),
      oracle = Some("""
        WITH melted AS (
          SELECT l_orderkey, 'quantity' AS metric, CAST(l_quantity AS DECIMAL(18,6)) AS val FROM lineitem
          UNION ALL
          SELECT l_orderkey, 'discount', CAST(l_discount AS DECIMAL(18,6)) FROM lineitem
          UNION ALL
          SELECT l_orderkey, 'tax', CAST(l_tax AS DECIMAL(18,6)) FROM lineitem)
        SELECT metric, count(*) AS n, (CAST(CAST(ROUND(sum(val), 2) * 100 AS BIGINT) AS DOUBLE) / 100.0) AS total
        FROM melted GROUP BY metric ORDER BY metric"""),
      doc = "unpivot/melt wide measures to rows (Expand, inverse of q21 pivot)"),

    // from_json with an explicit schema (S10/JSON modality): typed struct
    // access after parse, not just string path extraction (q24).
    "q55_json_struct" -> Q(
      run = (s, d) => Tables.events(s, d)
        .withColumn("parsed",
          from_json(col("props"), "k LONG", Map.empty[String, String]))
        .filter(col("parsed").isNotNull && col("parsed.k").isNotNull)
        .groupBy(col("event_type"))
        .agg(
          sum(col("parsed.k")).as("k_total"),
          max(col("parsed.k")).as("k_max"),
          count(lit(1)).as("n"))
        .orderBy("event_type"),
      oracle = Some("""
        SELECT event_type,
               CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
               max(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_max,
               count(*) AS n
        FROM events
        WHERE json_extract(props, '$.k') IS NOT NULL
        GROUP BY event_type ORDER BY event_type"""),
      doc = "from_json schema parse + typed struct field aggregation")
  )
}
