"""Data-quality audit operators (SURVEY §2.9 extensions).

The validation layer a lakehouse ingest pipeline runs after every
commit (the reference's Kafka→Iceberg loop implies exactly this
gate before downstream consumers read a snapshot): fact↔detail
reconciliation and a declarative constraint suite (Deequ/
Great-Expectations shape re-expressed as one Spark scan).

Scale posture: both operators are single-scan conditional
aggregations plus one keyed shuffle (the reconciliation join / the
referential-integrity anti join) — no windows over raw data, no
driver-side row iteration. Output cardinality is constants
(statuses, constraint names), so collect cost is O(1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import load_table


def _line_total_cents() -> F.Column:
    """Net-of-discount, with-tax line total in exact int64 cents.

    The float product runs in the same literal order in Spark and the
    SQL oracle (IEEE doubles are deterministic for a fixed expression
    tree), and the single round-to-cents happens once at the end —
    the decimal-money rule from operators/relational.py.
    """
    return F.round(
        F.col("l_extendedprice")
        * (F.lit(1.0) - F.col("l_discount"))
        * (F.lit(1.0) + F.col("l_tax"))
        * 100
    ).cast("long")


def order_reconciliation_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Fact↔detail reconciliation: order headers vs line-item sums.

    Recomputes each order's total from its line items (net of
    discount, with tax, exact cents) and compares against the header
    ``o_totalprice``, reporting mismatch counts and the worst / total
    absolute drift per order status — the audit every warehouse runs
    to catch partial loads and double-applied updates.

    Plan: one map-side-combined shuffle on l_orderkey for the detail
    sums, one orderkey-partitioned join against headers (both sides
    order-count-sized; co-partitioned by the join key so AQE can pick
    sort-merge without an extra exchange), then a statuses-sized
    final aggregate.
    """
    li = (
        load_table(spark, sf, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(_line_total_cents()).cast("long").alias("line_cents"))
    )
    o = load_table(spark, sf, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("hdr_cents"),
    )
    joined = o.join(li, o.o_orderkey == li.l_orderkey, "left").select(
        "o_orderstatus",
        F.coalesce("line_cents", F.lit(0)).alias("line_cents"),
        "hdr_cents",
        F.col("line_cents").isNull().alias("no_lines"),
    )
    diff = F.abs(F.col("hdr_cents") - F.col("line_cents"))
    return (
        joined.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("no_lines").cast("long"))
            .cast("long")
            .alias("n_without_lines"),
            F.sum((diff > 0).cast("long")).cast("long").alias("n_mismatched"),
            F.sum(diff).cast("long").alias("total_abs_diff_cents"),
            F.max(diff).cast("long").alias("max_abs_diff_cents"),
        )
        .orderBy("o_orderstatus")
    )


# (constraint name, violation predicate as a SQL boolean over orders)
# Declarative so Spark and the oracle share ONE definition — the
# suite is data-independent: every check runs in the same single scan.
_ORDER_CONSTRAINTS = [
    ("custkey_not_null", "o_custkey IS NULL"),
    ("totalprice_positive_violated", "NOT (o_totalprice > 0)"),
    ("status_in_domain_violated", "o_orderstatus NOT IN ('O', 'F', 'P')"),
    ("orderdate_in_range_violated",
     "NOT (o_orderdate >= TIMESTAMP '1990-01-01 00:00:00' "
     "AND o_orderdate < TIMESTAMP '2030-01-01 00:00:00')"),
]


def dq_constraint_suite(spark: SparkSession, sf: str) -> DataFrame:
    """Declarative constraint suite over the orders table.

    One scan evaluates every predicate constraint (completeness,
    range, domain) as conditional sums; a key-uniqueness check runs
    as count-vs-distinct; referential integrity (every o_custkey
    exists in customer) runs as one anti join. Results unpivot to one
    row per constraint: (constraint, n_rows, n_violations, passed) —
    the Deequ `VerificationSuite` output shape, computable per
    Iceberg snapshot as a post-commit gate.

    Scale: predicate checks are a single map-side-combinable scan;
    uniqueness is one exact count-distinct (2-phase agg); the RI anti
    join shuffles on custkey. Nothing is quadratic, nothing collects.
    """
    o = load_table(spark, sf, "orders")
    n_rows = F.count("*")
    aggs = [
        F.sum(F.expr(pred).cast("long")).cast("long").alias(name)
        for name, pred in _ORDER_CONSTRAINTS
    ]
    aggs.append(
        (F.count("o_orderkey") - F.count_distinct(F.col("o_orderkey")))
        .cast("long")
        .alias("orderkey_duplicates")
    )
    aggs.append(n_rows.cast("long").alias("_n"))
    base = o.agg(*aggs)

    cust = load_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("o_custkey")
    )
    orphans = (
        o.select("o_custkey")
        .join(cust, "o_custkey", "left_anti")
        .agg(F.count("*").cast("long").alias("custkey_orphaned"))
    )
    names = [n for n, _ in _ORDER_CONSTRAINTS] + ["orderkey_duplicates"]
    stack_expr = "stack({n}, {pairs}) as (check_name, n_violations)".format(
        n=len(names) + 1,
        pairs=", ".join(f"'{n}', {n}" for n in names)
        + ", 'custkey_orphaned', custkey_orphaned",
    )
    wide = base.crossJoin(orphans)  # both sides are 1 row
    return (
        wide.select(F.col("_n").alias("n_rows"), F.expr(stack_expr))
        .select(
            "check_name",
            "n_rows",
            "n_violations",
            (F.col("n_violations") == 0).alias("passed"),
        )
        .orderBy("check_name")
    )


QUERIES = {
    "order_reconciliation_audit": order_reconciliation_audit,
    "dq_constraint_suite": dq_constraint_suite,
}

_LINE_CENTS_SQL = (
    "CAST(round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 100) "
    "AS BIGINT)"
)

ORACLES = {
    "order_reconciliation_audit": f"""
        WITH li AS (
          SELECT l_orderkey,
                 CAST(SUM({_LINE_CENTS_SQL}) AS BIGINT) AS line_cents
          FROM lineitem GROUP BY l_orderkey
        ),
        j AS (
          SELECT o.o_orderstatus,
                 COALESCE(li.line_cents, 0) AS line_cents,
                 CAST(round(o.o_totalprice * 100) AS BIGINT) AS hdr_cents,
                 li.line_cents IS NULL AS no_lines
          FROM orders o LEFT JOIN li ON o.o_orderkey = li.l_orderkey
        )
        SELECT o_orderstatus, COUNT(*) AS n_orders,
               CAST(SUM(CASE WHEN no_lines THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_without_lines,
               CAST(SUM(CASE WHEN abs(hdr_cents - line_cents) > 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatched,
               CAST(SUM(abs(hdr_cents - line_cents)) AS BIGINT)
                 AS total_abs_diff_cents,
               CAST(MAX(abs(hdr_cents - line_cents)) AS BIGINT)
                 AS max_abs_diff_cents
        FROM j GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "dq_constraint_suite": """
        WITH base AS (
          SELECT COUNT(*) AS _n,
        """
    + ",\n".join(
        f"CAST(SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT) AS {name}"
        for name, pred in _ORDER_CONSTRAINTS
    )
    + """,
                 CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey)
                   AS BIGINT) AS orderkey_duplicates
          FROM orders
        ),
        orphans AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS custkey_orphaned
          FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey)
        ),
        long AS (
        """
    + "\nUNION ALL\n".join(
        f"SELECT '{name}' AS check_name, _n AS n_rows, "
        f"{name} AS n_violations FROM base"
        for name in [n for n, _ in _ORDER_CONSTRAINTS]
        + ["orderkey_duplicates"]
    )
    + """
          UNION ALL
          SELECT 'custkey_orphaned', b._n, o.custkey_orphaned
          FROM base b, orphans o
        )
        SELECT check_name, n_rows, n_violations,
               n_violations = 0 AS passed
        FROM long ORDER BY check_name
    """,
}


RAPID_REPEAT_DAYS = 1


def orders_rapid_repeat_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Rapid-repeat detection: pairs of orders from the SAME customer
    placed within 1 day of each other — the duplicate-submission /
    double-charge screen a finance team runs daily (exact-amount
    matching is layered on top in systems where amounts repeat; this
    fixture's totals are fully dispersed, so the date window IS the
    signal). The self-join is keyed on custkey — per-customer order
    counts are small and bounded, so candidates stay basket-sized
    (the basket_pair_frequency argument), never a table-wide scan.

    Output: per-customer pair count and conservative exposure (the
    smaller total of each pair, exact cents).
    """
    o = load_table(spark, sf, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.to_date("o_orderdate").alias("d"),
    )
    a = o.select(
        F.col("o_custkey").alias("c"),
        F.col("cents").alias("cents1"),
        F.col("o_orderkey").alias("k1"),
        F.col("d").alias("d1"),
    )
    b = o.select(
        F.col("o_custkey").alias("c"),
        F.col("cents").alias("cents2"),
        F.col("o_orderkey").alias("k2"),
        F.col("d").alias("d2"),
    )
    pairs = a.join(b, "c").filter(
        (F.col("k1") < F.col("k2"))
        & (F.abs(F.datediff("d1", "d2")) <= RAPID_REPEAT_DAYS)
    )
    return (
        pairs.groupBy("c")
        .agg(
            F.count("*").cast("long").alias("n_rapid_pairs"),
            F.sum(F.least("cents1", "cents2"))
            .cast("long")
            .alias("exposure_cents"),
        )
        .withColumnRenamed("c", "o_custkey")
        .orderBy("o_custkey")
    )


ORACLES["orders_rapid_repeat_audit"] = f"""
WITH o AS (
  SELECT o_custkey, o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(o_orderdate AS DATE) AS d
  FROM orders
),
pairs AS (
  SELECT a.o_custkey AS c, LEAST(a.cents, b.cents) AS mc
  FROM o a JOIN o b
    ON a.o_custkey = b.o_custkey
   AND a.o_orderkey < b.o_orderkey
   AND abs(a.d - b.d) <= {RAPID_REPEAT_DAYS}
)
SELECT c AS o_custkey, CAST(COUNT(*) AS BIGINT) AS n_rapid_pairs,
       CAST(SUM(mc) AS BIGINT) AS exposure_cents
FROM pairs GROUP BY c ORDER BY c
"""

QUERIES["orders_rapid_repeat_audit"] = orders_rapid_repeat_audit


# (edge name, fact table, fact key, dim table, dim key)
_RI_EDGES = [
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


def dq_star_schema_ri_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Referential integrity across the WHOLE star schema: one row per
    foreign-key edge with fact rows, orphan rows (fact keys absent
    from the dimension), and distinct orphan keys — the conformance
    sweep a warehouse runs after every load, generalizing the single
    orders→customer check in dq_constraint_suite.

    Plan: one anti join per edge, each keyed on its FK (the dimension
    side broadcasts where small); results union to an edges-sized
    frame. Edges are independent, so at scale they run concurrently
    within one job.
    """
    out = None
    for name, fact, fk, dim, dk in _RI_EDGES:
        f = load_table(spark, sf, fact).select(F.col(fk).alias("k"))
        d = load_table(spark, sf, dim).select(F.col(dk).alias("k")).distinct()
        orphans = f.join(d, "k", "left_anti")
        row = (
            f.agg(F.count("*").cast("long").alias("n_fact_rows"))
            .crossJoin(
                orphans.agg(
                    F.count("*").cast("long").alias("n_orphan_rows"),
                    F.count_distinct("k").cast("long").alias("n_orphan_keys"),
                )
            )
            .select(
                F.lit(name).alias("fk_edge"),
                "n_fact_rows",
                "n_orphan_rows",
                "n_orphan_keys",
                (F.col("n_orphan_rows") == 0).alias("passed"),
            )
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("fk_edge")


QUERIES["dq_star_schema_ri_audit"] = dq_star_schema_ri_audit
ORACLES["dq_star_schema_ri_audit"] = (
    "WITH long AS ("
    + "\nUNION ALL\n".join(
        f"""SELECT '{name}' AS fk_edge,
               CAST((SELECT COUNT(*) FROM {fact}) AS BIGINT) AS n_fact_rows,
               CAST((SELECT COUNT(*) FROM {fact} f
                     WHERE NOT EXISTS (SELECT 1 FROM {dim} d
                                       WHERE d.{dk} = f.{fk}))
                 AS BIGINT) AS n_orphan_rows,
               CAST((SELECT COUNT(DISTINCT f.{fk}) FROM {fact} f
                     WHERE NOT EXISTS (SELECT 1 FROM {dim} d
                                       WHERE d.{dk} = f.{fk}))
                 AS BIGINT) AS n_orphan_keys"""
        for name, fact, fk, dim, dk in _RI_EDGES
    )
    + ") SELECT fk_edge, n_fact_rows, n_orphan_rows, n_orphan_keys, "
    "n_orphan_rows = 0 AS passed FROM long ORDER BY fk_edge"
)


# floor(log10(1 + 1/d) * 1e6) — exact integer literals shared with the
# oracle so no engine computes a log
BENFORD_EXP_PPM = {
    1: 301029, 2: 176091, 3: 124938, 4: 96910, 5: 79181,
    6: 66946, 7: 57991, 8: 51152, 9: 45757,
}


def dq_benford_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Benford's-law screen over order totals — the forensic DQ test
    for fabricated or re-keyed monetary data (organic amounts follow
    log-uniform leading digits; invented ones don't): per leading
    digit of the exact cents value, observed frequency vs the Benford
    expectation, both in integer ppm with the expectation baked in as
    literals (neither engine computes a log at query time). The
    deviation column is what a monitoring rule thresholds; this
    fixture's synthetic uniform prices FAIL Benford loudly — which is
    exactly what the screen is for.

    One scan → digit-keyed 9-row aggregate, map-side combined.
    """
    o = load_table(spark, sf, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    digit = F.substring(F.col("cents").cast("string"), 1, 1).cast("int")
    tot = o.agg(F.count("*").cast("long").alias("n_tot"))
    exp_map = F.create_map(
        *[
            x
            for d, ppm in BENFORD_EXP_PPM.items()
            for x in (F.lit(d), F.lit(ppm))
        ]
    )
    obs_ppm = (F.col("n_obs") * 1_000_000 / F.col("n_tot")).cast("long")
    return (
        o.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").cast("long").alias("n_obs"))
        .crossJoin(F.broadcast(tot))  # 1-row corpus total
        .select(
            "digit",
            "n_obs",
            obs_ppm.alias("obs_ppm"),
            F.element_at(exp_map, F.col("digit")).cast("long").alias("exp_ppm"),
            F.abs(obs_ppm - F.element_at(exp_map, F.col("digit")))
            .cast("long")
            .alias("abs_dev_ppm"),
        )
        .orderBy("digit")
    )


QUERIES["dq_benford_audit"] = dq_benford_audit
ORACLES["dq_benford_audit"] = f"""
WITH o AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
),
exp AS (
  SELECT * FROM (VALUES
    {", ".join(f"({d}, {p})" for d, p in BENFORD_EXP_PPM.items())})
    AS t(digit, exp_ppm)
),
obs AS (
  SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS digit,
         CAST(COUNT(*) AS BIGINT) AS n_obs,
         CAST(COUNT(*) * 1000000 // (SELECT COUNT(*) FROM o) AS BIGINT)
           AS obs_ppm
  FROM o GROUP BY 1
)
SELECT obs.digit, obs.n_obs, obs.obs_ppm,
       CAST(exp.exp_ppm AS BIGINT) AS exp_ppm,
       CAST(abs(obs.obs_ppm - exp.exp_ppm) AS BIGINT) AS abs_dev_ppm
FROM obs JOIN exp ON exp.digit = obs.digit
ORDER BY obs.digit
"""
