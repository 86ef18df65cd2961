"""Scalar function surface (SURVEY §2.7) + nested-type construction
(§2.5 T3-T6) + the synthetic message fabric re-expressed over the
``events`` fixture (§2.1 S5).

Every query is pure built-in Column expressions — JVM-side, inside
whole-stage codegen, no Python in the hot path. Oracle-parity notes:

- double→int truncation: Spark CAST truncates, DuckDB CAST rounds —
  oracles spell ``CAST(trunc(x) AS ...)`` to pin truncation;
- floor/ceil return LONG in Spark, DOUBLE in DuckDB — cast both;
- regexp_replace is replace-ALL in Spark, first-match in DuckDB —
  oracle passes the 'g' flag;
- libm-dependent funcs (exp/ln) are rounded at ≥6 decimals; sqrt is
  IEEE-exact and compared raw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import money
from ..schema import load_table
from ..sources.rate_fabric import purchase_event_columns


def str_functions(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.length("c_name").alias("nlen"),
        F.substring("c_name", 1, 8).alias("pfx"),
        F.concat(F.col("c_name"), F.lit(":"), F.col("c_mktsegment")).alias("tag"),
        F.split(F.col("c_name"), "#").getItem(1).alias("numpart"),
        F.regexp_extract("c_name", "([0-9]+)", 1).cast("bigint").alias("cnum"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.expr("replace(c_name, 'Customer', 'Cust')").alias("renamed"),
        F.trim(F.lit("  x  ")).alias("trimmed"),
    )


def date_functions(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    return e.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        F.to_date("ts").alias("dt"),
        F.date_trunc("hour", "ts").alias("hour_ts"),
        F.date_add(F.to_date("ts"), 7).alias("dt_plus7"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias("days_in"),
        F.unix_timestamp("ts").alias("epoch_s"),
        F.unix_millis("ts").alias("epoch_ms"),
    )


def math_functions(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    v = F.col("value")
    return e.select(
        "event_id",
        F.floor(v).cast("long").alias("flr"),
        F.ceil(v).cast("long").alias("cl"),
        F.abs(v - 10.0).alias("dist10"),
        F.pmod(F.col("event_id"), F.lit(7)).alias("bucket7"),
        (v * v).alias("sq"),
        F.sqrt(v).alias("rt"),
        F.greatest(v, F.lit(5.0)).alias("hi5"),
        F.least(v, F.lit(5.0)).alias("lo5"),
        # exponent domain bounded to [0, 0.5): exp stays O(1), so
        # 6-decimal rounding is far inside double precision — rounding
        # a ~1e9 exp result at 6 decimals sits AT the ulp boundary and
        # libm differences between engines flip the last digit
        F.round(F.exp(F.pmod(v, F.lit(10.0)) / F.lit(20.0)), 6).alias("exp6"),
    )


def json_functions(spark: SparkSession, sf: str) -> DataFrame:
    """JSON access over the events props column (§2.7 JSON family;
    result-serialization analog of duckdb_rest_server.py:81)."""
    e = load_table(spark, sf, "events")
    parsed = F.from_json(F.col("props"), "k INT")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        parsed.getField("k").alias("k_parsed"),
        F.to_json(F.struct(F.col("event_type").alias("et"))).alias("as_json"),
    )


def conditional_case(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    v = F.col("value")
    return e.select(
        "event_id",
        F.when(v > 15, "high").when(v > 5, "mid").otherwise("low").alias("tier"),
        F.coalesce(F.nullif("event_type", F.lit("view")), F.lit("filtered")).alias(
            "et_masked"
        ),
        v.isNull().alias("v_null"),
        F.when(F.col("event_type").isin("click", "view"), v).alias("engagement"),
    )


def cast_functions(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    return e.select(
        "event_id",
        F.col("user_id").cast("string").alias("uid_str"),
        F.col("event_id").cast("string").cast("bigint").alias("id_roundtrip"),
        F.col("value").cast("int").alias("v_trunc"),
        F.col("value").cast("string").alias("v_str"),
        F.timestamp_micros(F.lit(1_700_000_000_000_000)).alias("fixed_ts"),
        F.lit("2024-02-29").cast("date").alias("leap_day"),
    )


def nested_types(spark: SparkSession, sf: str) -> DataFrame:
    """T3-T5: build STRUCT/MAP/ARRAY, then extract scalars back out
    (flat output keeps the oracle hash comparable)."""
    e = load_table(spark, sf, "events")
    st = F.struct(F.col("event_type").alias("et"), F.col("value").alias("v"))
    mp = F.create_map(F.lit("t"), F.col("event_type"), F.lit("u"), F.col("user_id").cast("string"))
    ar = F.array(F.col("value"), F.col("value") * 2, F.lit(0.0))
    return e.select(
        "event_id",
        st.getField("v").alias("sv"),
        F.element_at(mp, "t").alias("mt"),
        F.element_at(ar, 2).alias("a2"),
        F.size(ar).alias("alen"),
        F.map_keys(mp).getItem(0).alias("mk0"),
    )


def array_hof(spark: SparkSession, sf: str) -> DataFrame:
    """Array higher-order functions over the embeddings fixture.

    ``sorted4`` is serialized to a comma-joined string of
    ``floor(x*1e6 + 0.5)`` integers: the driver's pandas canonicalizer
    cannot hash raw list cells (round-2 red row), and an integer
    encoding sidesteps engine float-formatting differences entirely —
    both engines run the identical IEEE double expression.
    """
    em = load_table(spark, sf, "embeddings")
    vd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return em.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.array_max("embedding").cast("double").alias("max_val"),
        F.round(
            F.aggregate(vd, F.lit(0.0), lambda acc, x: acc + x * x), 6
        ).alias("norm_sq"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.slice(vd, 1, 4)),
                lambda x: F.floor(x * 1000000 + F.lit(0.5)).cast("string"),
            ),
        ).alias("sorted4"),
    )


def explode_unnest(spark: SparkSession, sf: str) -> DataFrame:
    em = load_table(spark, sf, "embeddings")
    return em.select(
        "vec_id", F.explode("embedding").alias("val")
    ).withColumn("val", F.col("val").cast("double"))


def table_stats(spark: SparkSession, sf: str) -> DataFrame:
    """SUMMARIZE-style inspection (§2.6 sampling/inspection row)."""
    o = load_table(spark, sf, "orders")
    return o.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_custs"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
    )


def agg_approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """approx_count_distinct (HLL++) with an exact-oracle-checkable
    contract: per group, assert the sketch estimate is within 5% of the
    exact distinct count (rsd=0.02 leaves comfortable margin).  The
    DuckDB oracle returns literal TRUE per group, so the driver's
    hash compare actually pins the HLL error bound rather than just
    running the sketch (sketch internals differ per engine, so raw
    estimates can never cross-match)."""
    l = load_table(spark, sf, "lineitem")
    est = l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("ap"),
        F.countDistinct("l_partkey").alias("ep"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("ao"),
        F.countDistinct("l_orderkey").alias("eo"),
    )
    return est.select(
        "l_returnflag",
        (F.abs(F.col("ap") - F.col("ep")) <= 0.05 * F.col("ep")).alias(
            "parts_within_5pct"
        ),
        (F.abs(F.col("ao") - F.col("eo")) <= 0.05 * F.col("eo")).alias(
            "orders_within_5pct"
        ),
    )


def purchase_event_fabric(spark: SparkSession, sf: str) -> DataFrame:
    """S5/T3-T6: the reference's message fabric (kafka_publisher.py:303-330)
    as pure column exprs over the events fixture, flattened for the oracle."""
    e = load_table(spark, sf, "events")
    pe = e.select(
        F.col("event_id"),
        *purchase_event_columns(F.col("event_id"), F.unix_millis(F.col("ts"))),
    )
    return pe.select(
        "event_id",
        "timestamp",
        "user_id",
        "action",
        "amount",
        F.col("user_details.name").alias("name"),
        F.col("user_details.age").alias("age"),
        F.col("user_details.email").alias("email"),
        F.element_at("purchase_metadata", "device").alias("device"),
        F.element_at("purchase_metadata", "location").alias("location"),
        F.element_at("purchase_metadata", "payment_method").alias("payment_method"),
        F.element_at("purchase_metadata", "category").alias("category"),
        F.element_at("previous_purchases", 1).alias("prev_1"),
        F.element_at("previous_purchases", 2).alias("prev_2"),
        F.element_at("previous_purchases", 3).alias("prev_3"),
    )


def event_time_tumbling(spark: SparkSession, sf: str) -> DataFrame:
    """ST3 batch form: tumbling 1-hour event-time windows (the S3 sink's
    hourly partitions, s3-connector-config.json:21-25)."""
    e = load_table(spark, sf, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour").getField("start").alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(money("value")).cast("double").alias("total_value"),
        )
    )


def regex_functions(spark: SparkSession, sf: str) -> DataFrame:
    """Regex family: extract / replace / rlike. Patterns stay within
    the POSIX-compatible subset (character classes, alternation) that
    Java and RE2-style engines interpret identically — the portability
    rule for any cross-engine regex pipeline."""
    o = load_table(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.regexp_extract("o_orderpriority", r"^([0-9]+)", 1)
        .cast("int")
        .alias("prio_num"),
        F.regexp_replace(F.lower("o_orderpriority"), r"[^a-z]+", "_").alias(
            "prio_slug"
        ),
        F.col("o_orderpriority").rlike("URGENT|HIGH").alias("is_critical"),
    )


def bit_functions(spark: SparkSession, sf: str) -> DataFrame:
    """Bitwise family: and/or/xor, shifts, popcount — the primitives
    hash-partitioners and bitmap sketches are built from; all evaluate
    inside whole-stage codegen on primitive longs."""
    e = load_table(spark, sf, "events")
    return e.select(
        "event_id",
        F.expr("event_id & 255").alias("low_byte"),
        F.expr("event_id | 4096").alias("with_flag"),
        F.expr("event_id ^ user_id").alias("x"),
        F.expr("shiftleft(event_id, 2)").alias("shl"),
        F.expr("shiftright(event_id, 3)").alias("shr"),
        F.expr("bit_count(event_id)").cast("int").alias("bc"),
    )


def array_set_functions(spark: SparkSession, sf: str) -> DataFrame:
    """Array set algebra: union / intersect / except over token
    windows, normalized through array_sort so the comparison is
    order-insensitive (Spark's set functions keep first-occurrence
    order; the oracle's list ops keep theirs — sorting makes both
    canonical). Result arrays are serialized to '|'-joined strings on
    both engines: the driver's pandas canonicalizer cannot hash raw
    list cells (same treatment as ``array_hof``'s sorted4).
    Narrow per-row expressions, zero shuffle."""
    from .text import tokens

    d = load_table(spark, sf, "documents")
    with_toks = d.select("doc_id", tokens(F.col("text")).alias("toks"))
    a = F.slice("toks", 1, 5)
    b = F.slice("toks", 3, 5)
    return with_toks.select(
        "doc_id",
        F.concat_ws("|", F.array_sort(F.array_union(a, b))).alias("u"),
        F.concat_ws("|", F.array_sort(F.array_intersect(a, b))).alias("i"),
        F.concat_ws("|", F.array_sort(F.array_except(a, b))).alias("e"),
        F.array_contains("toks", "spark").alias("has_spark"),
    )


def sort_nulls_ordering(spark: SparkSession, sf: str) -> DataFrame:
    """NULLS FIRST / NULLS LAST semantics, captured as rank values (the
    driver's compare is order-insensitive, so the placement of NULL
    keys must be materialized into a column to be checkable): customers
    without orders produce NULL totals via the left join; the two rank
    columns pin both null-ordering policies.

    Scale: the ranks are distributed prefix-sum ranks
    (``distributed.ranked_total``), not global row_number windows —
    the range partitioner honors the same NULLS FIRST/LAST sort
    orders, so null placement is still pinned while no task ever sees
    more than one range slice of the customer frame."""
    from .distributed import ranked_total

    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.max("o_totalprice").alias("max_price"))
    )
    ranked, _ = ranked_total(
        per_cust,
        [F.col("max_price").desc_nulls_last(), F.col("c_custkey").asc()],
        "rk_desc_nulls_last",
    )
    ranked, _ = ranked_total(
        ranked,
        [F.col("max_price").asc_nulls_first(), F.col("c_custkey").asc()],
        "rk_asc_nulls_first",
    )
    return ranked.select(
        "c_custkey",
        "max_price",
        "rk_desc_nulls_last",
        "rk_asc_nulls_first",
    )


def agg_collect_list_set(spark: SparkSession, sf: str) -> DataFrame:
    """Array aggregation (collect_list / collect_set), canonicalized
    with sort_array so the nondeterministic accumulation order never
    reaches the output — the rule for ANY engine-portable array agg.
    Arrays are serialized to '|'-joined strings for the driver's
    pandas canonicalizer (raw list cells are unhashable)."""
    n = load_table(spark, sf, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(
            F.concat_ws("|", F.sort_array(F.collect_list("n_name"))).alias(
                "names"
            ),
            F.concat_ws(
                "|",
                F.transform(
                    F.sort_array(F.collect_set(F.col("n_nationkey") % 5)),
                    lambda x: x.cast("string"),
                ),
            ).alias("key_mods"),
            F.count("*").alias("n"),
        )
        .orderBy("n_regionkey")
    )


def str_format_functions(spark: SparkSession, sf: str) -> DataFrame:
    """printf-style formatting + pad/repeat/translate — the message-
    fabric string interpolation family (kafka_publisher.py:304-312
    f-strings re-expressed as column exprs)."""
    n = load_table(spark, sf, "nation")
    return n.select(
        "n_nationkey",
        F.format_string("nation_%04d", F.col("n_nationkey")).alias("tag"),
        F.lpad("n_name", 12, ".").alias("padded"),
        F.rpad("n_name", 12, "_").alias("rpadded"),
        F.repeat(F.lit("ab"), 3).alias("rep"),
        F.translate("n_name", "NATION", "nation").alias("xlate"),
    )


def null_safe_functions(spark: SparkSession, sf: str) -> DataFrame:
    """NULL-handling family: nullif-derived NULLs put through nvl,
    nvl2, nanvl, and the null-safe equality operator (<=> /
    IS NOT DISTINCT FROM) — the semantics every outer-join consumer
    depends on."""
    o = load_table(spark, sf, "orders")
    ns = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select(
        "o_orderkey",
        ns.alias("maybe_status"),
        F.expr("nvl(nullif(o_orderstatus, 'O'), 'OPEN')").alias("filled"),
        F.expr(
            "nvl2(nullif(o_orderstatus, 'O'), 'terminal', 'live')"
        ).alias("liveness"),
        ns.eqNullSafe(F.lit("F")).alias("is_f_nullsafe"),
        ns.isNull().alias("was_open"),
    )


def explode_outer_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """posexplode_outer: documents keep a row even when the exploded
    array is empty (NULL pos/token) — the outer-unnest semantics a
    LEFT JOIN LATERAL provides in SQL engines. The long-token filter
    makes some arrays genuinely empty at every sf."""
    from .text import tokens

    d = load_table(spark, sf, "documents")
    long_toks = F.filter(
        tokens(F.col("text")), lambda w: F.length(w) > 7
    )
    return d.select(
        "doc_id", F.posexplode_outer(long_toks).alias("pos", "token")
    )


QUERIES = {
    "null_safe_functions": null_safe_functions,
    "explode_outer_tokens": explode_outer_tokens,
    "sort_nulls_ordering": sort_nulls_ordering,
    "agg_collect_list_set": agg_collect_list_set,
    "str_format_functions": str_format_functions,
    "regex_functions": regex_functions,
    "bit_functions": bit_functions,
    "array_set_functions": array_set_functions,
    "str_functions": str_functions,
    "date_functions": date_functions,
    "math_functions": math_functions,
    "json_functions": json_functions,
    "conditional_case": conditional_case,
    "cast_functions": cast_functions,
    "nested_types": nested_types,
    "array_hof": array_hof,
    "explode_unnest": explode_unnest,
    "table_stats": table_stats,
    "agg_approx_distinct": agg_approx_distinct,
    "purchase_event_fabric": purchase_event_fabric,
    "event_time_tumbling": event_time_tumbling,
}

ORACLES = {
    "null_safe_functions": """
        SELECT o_orderkey,
               nullif(o_orderstatus, 'O') AS maybe_status,
               coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS filled,
               CASE WHEN nullif(o_orderstatus, 'O') IS NOT NULL
                    THEN 'terminal' ELSE 'live' END AS liveness,
               nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM 'F'
                 AS is_f_nullsafe,
               nullif(o_orderstatus, 'O') IS NULL AS was_open
        FROM orders
    """,
    "explode_outer_tokens": """
        WITH t AS (
          SELECT doc_id,
                 list_filter(list_filter(string_split(text, ' '),
                             x -> x != ''), w -> length(w) > 7) AS arr
          FROM documents
        ),
        u AS (
          SELECT doc_id,
                 CAST(unnest(generate_series(0, len(arr) - 1)) AS INT)
                   AS pos,
                 unnest(arr) AS token
          FROM t WHERE len(arr) > 0
        )
        SELECT doc_id, pos, token FROM u
        UNION ALL
        SELECT doc_id, CAST(NULL AS INT), CAST(NULL AS VARCHAR)
        FROM t WHERE len(arr) = 0
    """,
    "sort_nulls_ordering": """
        WITH per_cust AS (
          SELECT c_custkey, MAX(o_totalprice) AS max_price
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey
        )
        SELECT c_custkey, max_price,
               ROW_NUMBER() OVER (ORDER BY max_price DESC NULLS LAST,
                                  c_custkey ASC) AS rk_desc_nulls_last,
               ROW_NUMBER() OVER (ORDER BY max_price ASC NULLS FIRST,
                                  c_custkey ASC) AS rk_asc_nulls_first
        FROM per_cust
    """,
    "agg_collect_list_set": """
        SELECT n_regionkey,
               array_to_string(list_sort(list(n_name)), '|') AS names,
               array_to_string(
                 list_transform(
                   list_sort(list_distinct(list(n_nationkey % 5))),
                   x -> CAST(x AS VARCHAR)),
                 '|') AS key_mods,
               COUNT(*) AS n
        FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
    "str_format_functions": """
        SELECT n_nationkey,
               printf('nation_%04d', n_nationkey) AS tag,
               lpad(n_name, 12, '.') AS padded,
               rpad(n_name, 12, '_') AS rpadded,
               repeat('ab', 3) AS rep,
               translate(n_name, 'NATION', 'nation') AS xlate
        FROM nation
    """,
    "regex_functions": """
        SELECT o_orderkey,
               CAST(regexp_extract(o_orderpriority, '^([0-9]+)', 1) AS INT)
                 AS prio_num,
               regexp_replace(lower(o_orderpriority), '[^a-z]+', '_', 'g')
                 AS prio_slug,
               regexp_matches(o_orderpriority, 'URGENT|HIGH') AS is_critical
        FROM orders
    """,
    "bit_functions": """
        SELECT event_id,
               event_id & 255 AS low_byte,
               event_id | 4096 AS with_flag,
               xor(event_id, user_id) AS x,
               event_id << 2 AS shl,
               event_id >> 3 AS shr,
               CAST(bit_count(event_id) AS INT) AS bc
        FROM events
    """,
    "array_set_functions": """
        WITH t AS (SELECT doc_id,
                          list_filter(string_split(text, ' '), x -> x != '')
                            AS toks
                   FROM documents)
        SELECT doc_id,
               coalesce(array_to_string(
                 list_sort(list_distinct(list_concat(toks[1:5], toks[3:7]))),
                 '|'), '') AS u,
               coalesce(array_to_string(
                 list_sort(list_distinct(list_filter(toks[1:5],
                   x -> list_contains(toks[3:7], x)))), '|'), '') AS i,
               coalesce(array_to_string(
                 list_sort(list_distinct(list_filter(toks[1:5],
                   x -> NOT list_contains(toks[3:7], x)))), '|'), '') AS e,
               list_contains(toks, 'spark') AS has_spark
        FROM t
    """,
    "str_functions": """
        SELECT c_custkey,
               upper(c_name) AS uname,
               lower(c_mktsegment) AS lseg,
               CAST(length(c_name) AS INTEGER) AS nlen,
               substring(c_name, 1, 8) AS pfx,
               c_name || ':' || c_mktsegment AS tag,
               string_split(c_name, '#')[2] AS numpart,
               CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS cnum,
               lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
               replace(c_name, 'Customer', 'Cust') AS renamed,
               trim('  x  ') AS trimmed
        FROM customer
    """,
    "date_functions": """
        SELECT event_id,
               CAST(year(ts) AS INTEGER) AS y,
               CAST(month(ts) AS INTEGER) AS mo,
               CAST(day(ts) AS INTEGER) AS d,
               CAST(hour(ts) AS INTEGER) AS h,
               CAST(minute(ts) AS INTEGER) AS mi,
               CAST(ts AS DATE) AS dt,
               date_trunc('hour', ts) AS hour_ts,
               CAST(ts AS DATE) + 7 AS dt_plus7,
               CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INTEGER) AS days_in,
               CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
               epoch_ms(ts) AS epoch_ms
        FROM events
    """,
    "math_functions": """
        SELECT event_id,
               CAST(floor(value) AS BIGINT) AS flr,
               CAST(ceil(value) AS BIGINT) AS cl,
               abs(value - 10.0) AS dist10,
               event_id % 7 AS bucket7,
               value * value AS sq,
               sqrt(value) AS rt,
               greatest(value, 5.0) AS hi5,
               least(value, 5.0) AS lo5,
               round(exp((((value % 10.0) + 10.0) % 10.0) / 20.0), 6) AS exp6
        FROM events
    """,
    "json_functions": """
        SELECT event_id,
               json_extract_string(props, '$.k') AS k_str,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_parsed,
               to_json(struct_pack(et := event_type)) AS as_json
        FROM events
    """,
    "conditional_case": """
        SELECT event_id,
               CASE WHEN value > 15 THEN 'high' WHEN value > 5 THEN 'mid' ELSE 'low' END AS tier,
               coalesce(nullif(event_type, 'view'), 'filtered') AS et_masked,
               value IS NULL AS v_null,
               CASE WHEN event_type IN ('click','view') THEN value END AS engagement
        FROM events
    """,
    "cast_functions": """
        SELECT event_id,
               CAST(user_id AS VARCHAR) AS uid_str,
               CAST(CAST(event_id AS VARCHAR) AS BIGINT) AS id_roundtrip,
               CAST(trunc(value) AS INTEGER) AS v_trunc,
               CAST(value AS VARCHAR) AS v_str,
               make_timestamp(1700000000000000) AS fixed_ts,
               DATE '2024-02-29' AS leap_day
        FROM events
    """,
    "nested_types": """
        SELECT event_id,
               value AS sv,
               event_type AS mt,
               value * 2 AS a2,
               3 AS alen,
               't' AS mk0
        FROM events
    """,
    "array_hof": """
        SELECT vec_id,
               CAST(len(embedding) AS INTEGER) AS dim,
               CAST(embedding[1] AS DOUBLE) AS first_val,
               CAST(list_max(embedding) AS DOUBLE) AS max_val,
               round(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS norm_sq,
               array_to_string(
                   list_transform(
                       list_sort(list_transform(embedding[1:4], x -> CAST(x AS DOUBLE))),
                       x -> CAST(CAST(floor(x * 1000000 + 0.5) AS BIGINT) AS VARCHAR)),
                   ',') AS sorted4
        FROM embeddings
    """,
    "explode_unnest": """
        SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS val FROM embeddings
    """,
    "agg_approx_distinct": """
        SELECT l_returnflag,
               TRUE AS parts_within_5pct,
               TRUE AS orders_within_5pct
        FROM lineitem GROUP BY l_returnflag
    """,
    "table_stats": """
        SELECT COUNT(*) AS n_rows,
               COUNT(DISTINCT o_custkey) AS n_custs,
               min(o_totalprice) AS min_price,
               max(o_totalprice) AS max_price,
               min(o_orderdate) AS min_date,
               max(o_orderdate) AS max_date
        FROM orders
    """,
    "purchase_event_fabric": """
        WITH base AS (SELECT event_id, epoch_ms(ts) AS ts_ms FROM events)
        SELECT event_id,
               ts_ms AS "timestamp",
               'user_' || CAST(event_id % 1000 AS VARCHAR) AS user_id,
               'purchase' AS action,
               CAST((ts_ms // 10) % 1000 AS DOUBLE) / 100 AS amount,
               'User ' || CAST(event_id % 1000 AS VARCHAR) AS name,
               CAST(18 + event_id % 50 AS INTEGER) AS age,
               'user' || CAST(event_id % 1000 AS VARCHAR) || '@example.com' AS email,
               (['mobile','desktop','tablet'])[CAST(event_id % 3 AS INTEGER) + 1] AS device,
               (['US','EU','APAC'])[CAST((event_id + 1) % 3 AS INTEGER) + 1] AS location,
               (['credit','debit','paypal'])[CAST((event_id + 2) % 3 AS INTEGER) + 1] AS payment_method,
               (['electronics','books','clothing'])[CAST((event_id + 3) % 3 AS INTEGER) + 1] AS category,
               CAST(((ts_ms // 10) + 1) % 1000 AS DOUBLE) / 100 AS prev_1,
               CAST(((ts_ms // 10) + 2) % 1000 AS DOUBLE) / 100 AS prev_2,
               CAST(((ts_ms // 10) + 3) % 1000 AS DOUBLE) / 100 AS prev_3
        FROM base
    """,
    "event_time_tumbling": """
        SELECT date_trunc('hour', ts) AS hour_start, event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2
    """,
}


def json_variant_shred(spark: SparkSession, sf: str) -> DataFrame:
    """VARIANT semi-structured path (Spark 4): a JSON payload is
    assembled from typed columns (`to_json`), parsed ONCE into the
    binary VARIANT encoding (`parse_json` — the open-format shredded
    representation that replaces repeated string re-parsing), then
    fields come back out with typed `variant_get` paths, including a
    miss (`try_variant_get` on an absent key → NULL, not error). The
    engine-surface claim is the roundtrip: shredding JSON through
    VARIANT loses nothing — so the oracle computes the same aggregate
    straight from the typed columns.

    Scale: VARIANT parse + path extraction are JVM expression-tree
    ops (whole-stage codegen, no Python); one event_type-keyed
    aggregate after a narrow projection.
    """
    e = load_table(spark, sf, "events")
    payload = F.to_json(
        F.struct(
            F.col("event_id").alias("id"),
            F.col("event_type").alias("type"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            F.from_json("props", "k INT").alias("meta"),
        )
    )
    v = e.select(F.parse_json(payload).alias("v"))
    shredded = v.select(
        F.variant_get("v", "$.type", "string").alias("event_type"),
        F.variant_get("v", "$.cents", "bigint").alias("cents"),
        F.variant_get("v", "$.meta.k", "int").alias("k"),
        F.try_variant_get("v", "$.missing", "int").alias("absent"),
    )
    return (
        shredded.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("cents_sum"),
            F.sum("k").cast("long").alias("k_sum"),
            F.count("absent").cast("long").alias("n_absent_hits"),
        )
        .orderBy("event_type")
    )


QUERIES["json_variant_shred"] = json_variant_shred
ORACLES["json_variant_shred"] = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents_sum,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)
         AS k_sum,
       CAST(0 AS BIGINT) AS n_absent_hits
FROM events GROUP BY event_type ORDER BY event_type
"""
