"""Time-series warehouse operators (SURVEY §2.9 extensions).

Three classic temporal shapes every metrics warehouse runs and the
reference's continuous-aggregate pipelines imply (the Kafka→Iceberg
event stream is exactly the input these serve): calendar gap-fill
with last-observation-carried-forward, interval-overlap concurrency
via a sweep line, and percentile winsorization for outlier-robust
metrics.

Scale posture: every operator aggregates to a bounded-cardinality
domain (days × event types, days, event types) BEFORE any global
window, so the single-partition sorts run over thousands of rows even
at 100 TB of input — the input-sized work is all map-side-combinable
groupBys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..schema import load_table


def _daily_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Per (event_type, day) purchase-value sum in exact int64 cents —
    the shared base aggregate (one map-side-combined shuffle)."""
    e = load_table(spark, sf, "events")
    return (
        e.where(F.col("event_type") == "purchase")
        .groupBy(
            F.to_date("ts").alias("day"),
            "event_type",
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("revenue_cents")
        )
    )


def time_gapfill_locf(spark: SparkSession, sf: str) -> DataFrame:
    """Calendar gap-fill + last-observation-carried-forward.

    Builds the full day calendar spanning the events table, left-joins
    the per-day purchase revenue onto it, and carries the last
    observed value forward across gaps — the standard densification
    step before charting/forecasting (TimescaleDB's ``time_bucket_gapfill
    + locf`` shape re-expressed in Spark).

    Plan: the observed aggregate is one shuffle; the calendar is built
    driver-free with ``sequence()`` over the min/max day (a 1-row
    cross join, broadcast); LOCF is ``last(ignorenulls=True)`` over a
    single GLOBAL day-ordered window — sound because the input is the
    day-collapsed aggregate (calendar-day cardinality, ≤ tens of
    thousands of rows even over decades), never raw events. A
    multi-series variant would add partitionBy(series) to the window.
    """
    rev = _daily_revenue(spark, sf).drop("event_type")
    span = load_table(spark, sf, "events").agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    cal = span.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        cal.join(rev, "day", "left")
        .select(
            "day",
            F.col("revenue_cents").isNotNull().alias("is_observed"),
            F.last("revenue_cents", ignorenulls=True)
            .over(w)
            .alias("revenue_cents_filled"),
        )
        .orderBy("day")
    )


def orders_open_concurrency(spark: SparkSession, sf: str) -> DataFrame:
    """Max-concurrent-open-orders sweep line.

    An order is "open" from its order date through its last line-item
    ship date (inclusive). Emits +1 at the start day and -1 the day
    after the end day, aggregates deltas per day, and takes a running
    sum in day order — the classic O(n log n) interval-overlap
    counter (vs the quadratic self-join). Output: every day the
    concurrency level changes, with the level in effect from that day.

    Scale: per-order interval extraction is ONE orderkey shuffle with
    map-side combine over the UNION of orders and lineitem rows — the
    r10 form paid two shuffles plus a sort-merge join for the same
    result (and its bench variance tracked exactly that join's
    scheduling exposure).  Both interval endpoints come out of the
    single aggregate; the ±1 deltas explode from it in-place (no
    self-union re-reading the join).  Deltas collapse to day
    cardinality BEFORE the running sum, so the final
    (single-partition) window is bounded by calendar days, not order
    count — the same shape at 100 TB.
    """
    li = load_table(spark, sf, "lineitem").select(
        F.col("l_orderkey").alias("k"),
        F.to_date("l_shipdate").alias("d"),
        F.lit(False).alias("is_start"),
    )
    o = load_table(spark, sf, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.to_date("o_orderdate").alias("d"),
        F.lit(True).alias("is_start"),
    )
    per_order = (
        o.unionAll(li)
        .groupBy("k")
        .agg(
            F.min(F.when(F.col("is_start"), F.col("d"))).alias("start_day"),
            F.max(F.when(~F.col("is_start"), F.col("d"))).alias("end_day"),
        )
        # inner-join semantics of the interval: an order with no
        # line items (no end) or a ship row with no order (no start)
        # contributes nothing
        .where(F.col("start_day").isNotNull() & F.col("end_day").isNotNull())
    )
    deltas = per_order.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("start_day").alias("day"), F.lit(1).alias("delta")
                ),
                F.struct(
                    F.date_add("end_day", 1).alias("day"),
                    F.lit(-1).alias("delta"),
                ),
            )
        ).alias("e")
    ).select("e.day", "e.delta")
    per_day = deltas.groupBy("day").agg(
        F.sum("delta").cast("long").alias("net_delta")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        per_day.select(
            "day",
            "net_delta",
            F.sum("net_delta").over(w).cast("long").alias("open_orders"),
        )
        .where(F.col("net_delta") != 0)
        .orderBy("day")
    )


def winsorize_event_values(spark: SparkSession, sf: str) -> DataFrame:
    """Per-type p05/p95 winsorization audit on exact cents.

    Computes discrete (type-7-free, index-based) 5th/95th percentile
    cut points per event type — the element at index
    ``floor(p·(n−1))`` in value order, so both engines pick the SAME
    int64 cent value with no interpolation — then reports how many
    values each tail clips and the winsorized sum. The standard
    outlier-robustification before averaging telemetry.

    Plan: one window rank per type + a broadcast of the per-type cut
    points (one row per type) back onto the aggregate — no second
    scan-sized shuffle. Ranking is input-sized but partitioned by
    event_type; at scale the heavy types dominate a partition, which
    is exactly what AQE skew-split handles (ranking within a type is
    order-parallel after a range partition).
    """
    e = load_table(spark, sf, "events").select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    w = W.partitionBy("event_type").orderBy("vc", "event_id")
    ranked = e.select(
        "event_type",
        "vc",
        (F.row_number().over(w) - 1).alias("idx"),
        F.count("*").over(W.partitionBy("event_type")).alias("n"),
    )
    cuts = (
        ranked.where(
            (F.col("idx") == F.floor(F.lit(0.05) * (F.col("n") - 1)))
            | (F.col("idx") == F.floor(F.lit(0.95) * (F.col("n") - 1)))
        )
        .groupBy("event_type")
        .agg(
            F.min("vc").cast("long").alias("p05_cents"),
            F.max("vc").cast("long").alias("p95_cents"),
        )
    )
    clipped = (
        e.join(F.broadcast(cuts), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_values"),
            F.max("p05_cents").alias("p05_cents"),
            F.max("p95_cents").alias("p95_cents"),
            F.sum((F.col("vc") < F.col("p05_cents")).cast("long"))
            .cast("long")
            .alias("n_clipped_low"),
            F.sum((F.col("vc") > F.col("p95_cents")).cast("long"))
            .cast("long")
            .alias("n_clipped_high"),
            F.sum(
                F.greatest(
                    F.col("p05_cents"), F.least(F.col("p95_cents"), F.col("vc"))
                )
            )
            .cast("long")
            .alias("winsorized_sum_cents"),
        )
        .orderBy("event_type")
    )
    return clipped


ROLLING_DAYS = 7


def events_rolling_distinct_users(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling 7-day distinct active users per day (the DAU/WAU
    metric) — COUNT(DISTINCT) over a sliding window, which no engine's
    window function computes directly. The scalable formulation:
    collapse to distinct (user, day) presence first (map-side
    combinable, the only input-sized shuffle), then explode each
    presence row to the ≤7 target days it contributes to and count
    distinct users per target day. Shuffle volume is 7× the PRESENCE
    table (users × active days), never 7× raw events — at 100 TB the
    presence collapse is the win, and the window width is a bounded
    constant multiplier.

    Only target days that exist in the data are reported (no calendar
    densification — compose with time_gapfill_locf for that).
    """
    e = load_table(spark, sf, "events")
    presence = e.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    contrib = presence.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"),
                F.date_add("day", ROLLING_DAYS - 1),
            )
        ).alias("target_day"),
    )
    days = presence.select(F.col("day").alias("target_day")).distinct()
    return (
        contrib.join(days, "target_day")
        .groupBy("target_day")
        .agg(F.count_distinct("user_id").cast("long").alias("rolling_users"))
        .orderBy("target_day")
    )


def events_median_abs_deviation(spark: SparkSession, sf: str) -> DataFrame:
    """Robust dispersion per event type: median absolute deviation
    (MAD) on exact cents — the outlier-resistant scale estimate that
    pairs with winsorization. Both medians are DISCRETE index-based
    (element at ⌊(n−1)/2⌋ in value order), so both engines pick the
    same int64 value with no interpolation.

    Plan: two ranking passes partitioned by event_type (rank values →
    lower median, broadcast back; rank |x − med| → MAD). Same skew
    posture as winsorize_event_values: per-type range partitions,
    AQE-splittable.
    """
    e = load_table(spark, sf, "events").select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )

    def _discrete_median(df: DataFrame, col: str) -> DataFrame:
        w = W.partitionBy("event_type").orderBy(col, "event_id")
        ranked = df.select(
            "event_type",
            F.col(col),
            (F.row_number().over(w) - 1).alias("idx"),
            F.count("*").over(W.partitionBy("event_type")).alias("n"),
        )
        return (
            ranked.where(F.col("idx") == F.floor((F.col("n") - 1) / 2))
            .groupBy("event_type")
            .agg(F.min(col).cast("long").alias(f"med_{col}"))
        )

    med = _discrete_median(e, "vc")
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type",
        "event_id",
        F.abs(F.col("vc") - F.col("med_vc")).alias("ad"),
    )
    mad = _discrete_median(dev, "ad")
    return (
        med.join(mad, "event_type")
        .select(
            "event_type",
            F.col("med_vc").alias("median_cents"),
            F.col("med_ad").alias("mad_cents"),
        )
        .orderBy("event_type")
    )


QUERIES = {
    "events_rolling_distinct_users": events_rolling_distinct_users,
    "events_median_abs_deviation": events_median_abs_deviation,
    "time_gapfill_locf": time_gapfill_locf,
    "orders_open_concurrency": orders_open_concurrency,
    "winsorize_event_values": winsorize_event_values,
}

ORACLES = {
    "events_rolling_distinct_users": f"""
        WITH presence AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ),
        contrib AS (
          SELECT user_id,
                 CAST(unnest(generate_series(day,
                   day + INTERVAL {ROLLING_DAYS - 1} DAY,
                   INTERVAL 1 DAY)) AS DATE) AS target_day
          FROM presence
        ),
        days AS (SELECT DISTINCT day AS target_day FROM presence)
        SELECT c.target_day,
               CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS rolling_users
        FROM contrib c JOIN days d ON c.target_day = d.target_day
        GROUP BY c.target_day
        ORDER BY c.target_day
    """,
    "events_median_abs_deviation": """
        WITH v AS (
          SELECT event_type, event_id,
                 CAST(round(value * 100) AS BIGINT) AS vc
          FROM events
        ),
        r1 AS (
          SELECT event_type, vc,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY vc, event_id) - 1 AS idx,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM v
        ),
        med AS (
          SELECT event_type, CAST(MIN(vc) AS BIGINT) AS med_vc
          FROM r1 WHERE idx = floor((n - 1) / 2) GROUP BY event_type
        ),
        dev AS (
          SELECT v.event_type, v.event_id,
                 abs(v.vc - m.med_vc) AS ad
          FROM v JOIN med m ON v.event_type = m.event_type
        ),
        r2 AS (
          SELECT event_type, ad,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY ad, event_id) - 1 AS idx,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM dev
        ),
        mad AS (
          SELECT event_type, CAST(MIN(ad) AS BIGINT) AS med_ad
          FROM r2 WHERE idx = floor((n - 1) / 2) GROUP BY event_type
        )
        SELECT m.event_type, m.med_vc AS median_cents,
               d.med_ad AS mad_cents
        FROM med m JOIN mad d ON m.event_type = d.event_type
        ORDER BY m.event_type
    """,
    "time_gapfill_locf": """
        WITH rev AS (
          SELECT CAST(ts AS DATE) AS day,
                 CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS revenue_cents
          FROM events WHERE event_type = 'purchase' GROUP BY 1
        ),
        span AS (
          SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi
          FROM events
        ),
        cal AS (
          SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
                   AS day
          FROM span
        )
        SELECT c.day,
               r.revenue_cents IS NOT NULL AS is_observed,
               last_value(r.revenue_cents IGNORE NULLS) OVER (
                 ORDER BY c.day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS revenue_cents_filled
        FROM cal c LEFT JOIN rev r ON c.day = r.day
        ORDER BY c.day
    """,
    "orders_open_concurrency": """
        WITH iv AS (
          SELECT CAST(o.o_orderdate AS DATE) AS start_day,
                 MAX(CAST(l.l_shipdate AS DATE)) AS end_day
          FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
          GROUP BY o.o_orderkey, 1
        ),
        deltas AS (
          SELECT start_day AS day, 1 AS delta FROM iv
          UNION ALL
          SELECT end_day + INTERVAL 1 DAY, -1 FROM iv
        ),
        per_day AS (
          SELECT CAST(day AS DATE) AS day,
                 CAST(SUM(delta) AS BIGINT) AS net_delta
          FROM deltas GROUP BY 1
        )
        SELECT day, net_delta,
               CAST(SUM(net_delta) OVER (
                 ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS open_orders
        FROM per_day
        QUALIFY net_delta <> 0
        ORDER BY day
    """,
    "winsorize_event_values": """
        WITH v AS (
          SELECT event_type, event_id,
                 CAST(round(value * 100) AS BIGINT) AS vc
          FROM events
        ),
        ranked AS (
          SELECT event_type, vc,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY vc, event_id) - 1 AS idx,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM v
        ),
        cuts AS (
          SELECT event_type,
                 CAST(MIN(vc) AS BIGINT) AS p05_cents,
                 CAST(MAX(vc) AS BIGINT) AS p95_cents
          FROM ranked
          WHERE idx = floor(0.05 * (n - 1)) OR idx = floor(0.95 * (n - 1))
          GROUP BY event_type
        )
        SELECT v.event_type, COUNT(*) AS n_values,
               MAX(c.p05_cents) AS p05_cents,
               MAX(c.p95_cents) AS p95_cents,
               CAST(SUM(CASE WHEN v.vc < c.p05_cents THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_clipped_low,
               CAST(SUM(CASE WHEN v.vc > c.p95_cents THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_clipped_high,
               CAST(SUM(GREATEST(c.p05_cents, LEAST(c.p95_cents, v.vc)))
                 AS BIGINT) AS winsorized_sum_cents
        FROM v JOIN cuts c ON v.event_type = c.event_type
        GROUP BY v.event_type
        ORDER BY v.event_type
    """,
}


def events_trend_slope(spark: SparkSession, sf: str) -> DataFrame:
    """Per-type revenue trend: closed-form OLS slope over the DAILY
    revenue series, computed entirely in exact int64 — x is the day
    index from each type's first day (bounded by series length), y is
    daily cents, and the classic n·Σxy − Σx·Σy / n·Σx² − (Σx)²
    numerator/denominator stay integers (day-granularity keeps every
    product far inside int64). ONE IEEE division produces the float
    slope, so parity is bit-exact. The trend gate every metrics
    alerting system runs.

    Plan: day collapse (map-side combined) → per-type min-day
    broadcast back → one types-sized aggregate. Nothing input-sized
    after the first shuffle.
    """
    daily = _daily_revenue(spark, sf).select(
        "day", F.col("revenue_cents").alias("y")
    )
    lo = daily.agg(F.min("day").alias("day0"))
    base = daily.crossJoin(F.broadcast(lo)).select(
        F.datediff("day", "day0").cast("long").alias("x"), "y"
    )
    agg = base.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return agg.select(
        "n",
        num.cast("long").alias("slope_num"),
        den.cast("long").alias("slope_den"),
        (num.cast("double") / den.cast("double")).alias(
            "slope_cents_per_day"
        ),
    )


def events_changepoint_cusum(spark: SparkSession, sf: str) -> DataFrame:
    """CUSUM change-point detection over daily revenue, integer-exact:
    the cumulative deviation from the global mean is tracked as
    S_k = n·Σ_{i≤k} y_i − k·Σy (the textbook statistic scaled by n so
    no rational mean ever materializes), and the change point is the
    day maximizing |S_k| — ties break to the earliest day. The
    shift-detection primitive behind telemetry drift alerts.

    Plan: day collapse, a 1-row totals broadcast, one ordered running
    sum over day cardinality, and a 1-row argmax via TakeOrdered.
    """
    daily = _daily_revenue(spark, sf).select(
        "day", F.col("revenue_cents").alias("y")
    )
    tot = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    scored = daily.crossJoin(F.broadcast(tot)).select(
        "day",
        (
            F.col("n") * F.sum("y").over(w)
            - F.row_number().over(W.orderBy("day")) * F.col("sy")
        )
        .cast("long")
        .alias("s_scaled"),
    )
    return (
        scored.orderBy(F.abs(F.col("s_scaled")).desc(), F.col("day").asc())
        .limit(1)
        .select(
            F.col("day").alias("changepoint_day"),
            "s_scaled",
            F.abs(F.col("s_scaled")).cast("long").alias("abs_deviation"),
        )
    )


QUERIES["events_trend_slope"] = events_trend_slope
QUERIES["events_changepoint_cusum"] = events_changepoint_cusum
ORACLES["events_trend_slope"] = """
        WITH 
  daily AS (
    SELECT CAST(ts AS DATE) AS day,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events WHERE event_type = 'purchase' GROUP BY 1
  ),
        lo AS (SELECT MIN(day) AS day0 FROM daily),
        base AS (
          SELECT CAST(day - day0 AS BIGINT) AS x, y FROM daily, lo
        ),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * y) AS BIGINT) AS sxy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx
          FROM base
        )
        SELECT n,
               CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
               CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
               CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_cents_per_day
        FROM agg
"""
ORACLES["events_changepoint_cusum"] = """
        WITH 
  daily AS (
    SELECT CAST(ts AS DATE) AS day,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events WHERE event_type = 'purchase' GROUP BY 1
  ),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(SUM(y) AS BIGINT) AS sy FROM daily),
        scored AS (
          SELECT day,
                 CAST(t.n * SUM(y) OVER (ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      - row_number() OVER (ORDER BY day) * t.sy
                   AS BIGINT) AS s_scaled
          FROM daily, tot t
        )
        SELECT day AS changepoint_day, s_scaled,
               CAST(abs(s_scaled) AS BIGINT) AS abs_deviation
        FROM scored ORDER BY abs(s_scaled) DESC, day ASC LIMIT 1
"""


def events_seasonality_dow(spark: SparkSession, sf: str) -> DataFrame:
    """Day-of-week seasonality profile: per ISO weekday, event count,
    exact cents total, traffic share vs a uniform week (ppm), and
    average event value — the weekly-cycle factor a capacity planner
    or a seasonal-adjust step extracts first.

    All integer-exact: shares and averages use true INTEGER division
    (Spark ``div`` == DuckDB ``//`` on the non-negative operands
    here), never a double divide whose 2⁵³ mantissa a 100 TB corpus
    can exceed. One map-side-combined groupBy over ≤7 keys, plus a
    broadcast 1-row total.
    ISO weekday (1=Mon..7=Sun): Spark ``weekday()+1`` == DuckDB
    ``isodow`` — the one day-numbering the two engines can agree on
    without a CASE ladder.
    """
    e = load_table(spark, sf, "events")
    per_dow = (
        e.select(
            (F.expr("weekday(ts)") + 1).cast("long").alias("iso_dow"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("iso_dow")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("cents_total"),
        )
    )
    tot = per_dow.agg(
        F.sum("n_events").cast("long").alias("all_events")
    )
    return (
        per_dow.join(F.broadcast(tot))
        .select(
            "iso_dow",
            "n_events",
            "cents_total",
            F.expr("n_events * 7000000L div all_events")
            .cast("long")
            .alias("share_ppm_vs_uniform"),
            F.expr("cents_total div n_events")
            .cast("long")
            .alias("avg_value_cents"),
        )
        .orderBy("iso_dow")
    )


QUERIES["events_seasonality_dow"] = events_seasonality_dow
ORACLES["events_seasonality_dow"] = """
WITH per_dow AS (
  SELECT isodow(ts) AS iso_dow,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS cents_total
  FROM events GROUP BY 1
),
tot AS (SELECT SUM(n_events) AS all_events FROM per_dow)
SELECT CAST(iso_dow AS BIGINT) AS iso_dow, n_events, cents_total,
       CAST(n_events * 7000000 // t.all_events AS BIGINT)
         AS share_ppm_vs_uniform,
       CAST(cents_total // n_events AS BIGINT) AS avg_value_cents
FROM per_dow, tot t ORDER BY iso_dow
"""


def time_gapfill_interpolate(spark: SparkSession, sf: str) -> DataFrame:
    """Calendar gap-fill + LINEAR interpolation — the second
    densification policy next to ``time_gapfill_locf`` (TimescaleDB's
    ``interpolate()``): missing days get the straight line between the
    surrounding observations, in exact integer cents
    (prev + floor(Δv·days_in/gap) — the product is ≤ |Δv|·gap ≈ 10¹⁰,
    double-exact, and floor is identical in both engines). Days
    outside the observed range stay NULL (strict interpolation, no
    extrapolation).

    Plan: same day-collapsed shape as LOCF — the global day-ordered
    window runs over calendar-day cardinality (bounded by the span,
    never raw events); the surrounding observations come from one
    IGNORE NULLS window pass in each direction.
    """
    rev = _daily_revenue(spark, sf).drop("event_type")
    span = load_table(spark, sf, "events").agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    cal = span.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    base = cal.join(rev, "day", "left").select(
        "day",
        "revenue_cents",
        F.when(F.col("revenue_cents").isNotNull(), F.col("day")).alias(
            "obs_day"
        ),
    )
    wb = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    wf = W.orderBy("day").rowsBetween(W.currentRow, W.unboundedFollowing)
    prev_v = F.last("revenue_cents", ignorenulls=True).over(wb)
    prev_d = F.last("obs_day", ignorenulls=True).over(wb)
    next_v = F.first("revenue_cents", ignorenulls=True).over(wf)
    next_d = F.first("obs_day", ignorenulls=True).over(wf)
    interp = prev_v + F.floor(
        (next_v - prev_v)
        * F.datediff(F.col("day"), prev_d)
        / F.datediff(next_d, prev_d)
    )
    filled = (
        F.when(F.col("revenue_cents").isNotNull(), F.col("revenue_cents"))
        .when(prev_v.isNotNull() & next_v.isNotNull(), interp)
        .otherwise(F.lit(None))
    )
    return base.select(
        "day",
        F.col("revenue_cents").isNotNull().alias("is_observed"),
        filled.cast("long").alias("revenue_cents_filled"),
    ).orderBy("day")


QUERIES["time_gapfill_interpolate"] = time_gapfill_interpolate
ORACLES["time_gapfill_interpolate"] = """
WITH rev AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
span AS (
  SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi
  FROM events
),
cal AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
           AS day
  FROM span
),
ctx AS (
  SELECT c.day, r.revenue_cents,
         last_value(r.revenue_cents IGNORE NULLS) OVER wb AS prev_v,
         last_value(CASE WHEN r.revenue_cents IS NOT NULL THEN c.day END
                    IGNORE NULLS) OVER wb AS prev_d,
         first_value(r.revenue_cents IGNORE NULLS) OVER wf AS next_v,
         first_value(CASE WHEN r.revenue_cents IS NOT NULL THEN c.day END
                     IGNORE NULLS) OVER wf AS next_d
  FROM cal c LEFT JOIN rev r ON c.day = r.day
  WINDOW wb AS (ORDER BY c.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (ORDER BY c.day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT day, revenue_cents IS NOT NULL AS is_observed,
       CAST(CASE
         WHEN revenue_cents IS NOT NULL THEN revenue_cents
         WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
           prev_v + floor((next_v - prev_v)
                          * date_diff('day', prev_d, day)
                          / date_diff('day', prev_d, next_d))
         ELSE NULL END AS BIGINT) AS revenue_cents_filled
FROM ctx ORDER BY day
"""


def events_markov_transitions(spark: SparkSession, sf: str) -> DataFrame:
    """First-order behavioral Markov chain: P(next event type | event
    type) per user journey, in exact ppm — the transition matrix
    behind next-action prediction and funnel-leak diagnosis (where
    ``session_funnel`` checks ONE prescribed path, this measures all
    of them at once).

    One user-keyed window (lead over the per-user timeline — per-user
    state, never global), a transition-pair count (map-side combined,
    ≤ |types|² keys), and integer division for the probabilities
    (Spark ``div`` == DuckDB ``//``).
    """
    e = load_table(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").cast("long").alias("n_transitions"))
    )
    totals = pairs.groupBy("from_type").agg(
        F.sum("n_transitions").cast("long").alias("n_from")
    )
    return (
        pairs.join(totals, "from_type")
        .select(
            "from_type",
            "to_type",
            "n_transitions",
            F.expr("n_transitions * 1000000L div n_from")
            .cast("long")
            .alias("p_ppm"),
        )
        .orderBy("from_type", "to_type")
    )


QUERIES["events_markov_transitions"] = events_markov_transitions
ORACLES["events_markov_transitions"] = """
WITH pairs AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events
),
cnt AS (
  SELECT from_type, to_type,
         CAST(COUNT(*) AS BIGINT) AS n_transitions
  FROM pairs WHERE to_type IS NOT NULL GROUP BY from_type, to_type
),
tot AS (
  SELECT from_type, SUM(n_transitions) AS n_from FROM cnt GROUP BY from_type
)
SELECT c.from_type, c.to_type, c.n_transitions,
       CAST(c.n_transitions * 1000000 // t.n_from AS BIGINT) AS p_ppm
FROM cnt c JOIN tot t ON c.from_type = t.from_type
ORDER BY c.from_type, c.to_type
"""


AUTOCORR_LAG = 7  # weekly seasonality probe


def events_autocorr_lag7(spark: SparkSession, sf: str) -> DataFrame:
    """Lag-7 autocorrelation of daily purchase revenue — the
    seasonality detector run before choosing a forecasting model (a
    high r₇ says weekly periodicity dominates). Pearson r over the
    (y_t, y_{t−7}) pairs of OBSERVED days (gap days contribute no
    pair, the standard treatment for sparse series).

    Exactness: the five sufficient statistics (n, Σx, Σy, Σxy, Σxx,
    Σyy) are int64 over exact cents; r is then num/√(d₁·d₂) — the
    int64 components are emitted alongside, and every float op (two
    casts, one multiply, one sqrt — IEEE-exact in both engines, unlike
    a round()) is identical on both sides. Day-collapsed before any
    join: the pair join runs on calendar-day cardinality.
    """
    daily = (
        _daily_revenue(spark, sf)
        .groupBy("day")
        .agg(F.sum("revenue_cents").cast("long").alias("y"))
    )
    lag = daily.select(
        F.date_add(F.col("day"), AUTOCORR_LAG).alias("day"),
        F.col("y").alias("x"),
    )
    pairs = daily.join(lag, "day")
    agg = pairs.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    d1 = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    d2 = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return agg.select(
        "n",
        num.cast("long").alias("r_num"),
        d1.cast("long").alias("r_den_x"),
        d2.cast("long").alias("r_den_y"),
        (
            num.cast("double")
            / F.sqrt(d1.cast("double") * d2.cast("double"))
        ).alias("autocorr_lag7"),
    )


QUERIES["events_autocorr_lag7"] = events_autocorr_lag7
ORACLES["events_autocorr_lag7"] = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         SUM(CAST(round(value * 100) AS BIGINT)) AS y
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
pairs AS (
  SELECT d.y AS y, l.y AS x
  FROM daily d JOIN daily l ON d.day = l.day + INTERVAL {AUTOCORR_LAG} DAY
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM pairs
)
SELECT n,
       CAST(n * sxy - sx * sy AS BIGINT) AS r_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS r_den_x,
       CAST(n * syy - sy * sy AS BIGINT) AS r_den_y,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                * CAST(n * syy - sy * sy AS DOUBLE)) AS autocorr_lag7
FROM agg
"""


M4_BUCKETS = 16


def events_m4_downsample(spark: SparkSession, sf: str) -> DataFrame:
    """M4 time-series downsampling (Jugel et al., VLDB 2014): per
    equal-width time bucket keep min, max, first, and last value —
    the error-free line-chart reduction (those four points are exactly
    what a pixel column can show), the standard dashboard-serving
    rollup over a raw series too big to ship.

    Exact and deterministic: values are int64 cents; first/last
    tie-break on (ts, event_id) via struct-min/max (never `min_by`,
    whose tie choice is undefined); bucket edges are integer
    microsecond arithmetic from the global [min, max] span (the last
    bucket absorbs the right edge). One events-keyed aggregate after a
    broadcast 1-row span attach — map-side combined, no window.
    """
    e = load_table(spark, sf, "events").where(
        F.col("event_type") == "purchase"
    )
    base = e.select(
        F.col("ts"),
        F.col("event_id"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.unix_micros("ts").alias("us"),
    )
    span = base.agg(
        F.min("us").alias("lo"), F.max("us").alias("hi")
    )
    b = base.crossJoin(F.broadcast(span)).select(
        # integer `div`, not double `/`+cast: when the true quotient
        # sits within 1 ulp below an integer, IEEE division rounds UP
        # to it and the cast keeps it — DuckDB's `//` (exact integer
        # floor) would disagree by one bucket
        F.least(
            F.lit(M4_BUCKETS - 1).cast("long"),
            F.expr(
                f"((us - lo) * {M4_BUCKETS}) div (hi - lo + 1)"
            ),
        ).alias("bucket"),
        "ts",
        "event_id",
        "cents",
    )
    first_s = F.min(F.struct("ts", "event_id", "cents"))
    last_s = F.max(F.struct("ts", "event_id", "cents"))
    return (
        b.groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_points"),
            F.min("cents").alias("v_min"),
            F.max("cents").alias("v_max"),
            first_s.getField("cents").alias("v_first"),
            last_s.getField("cents").alias("v_last"),
        )
        .orderBy("bucket")
    )


QUERIES["events_m4_downsample"] = events_m4_downsample
ORACLES["events_m4_downsample"] = f"""
WITH base AS (
  SELECT ts, event_id, CAST(round(value * 100) AS BIGINT) AS cents,
         epoch_us(ts) AS us
  FROM events WHERE event_type = 'purchase'
),
span AS (SELECT MIN(us) AS lo, MAX(us) AS hi FROM base),
b AS (
  SELECT least({M4_BUCKETS - 1},
               ((us - lo) * {M4_BUCKETS}) // (hi - lo + 1)) AS bucket,
         ts, event_id, cents
  FROM base CROSS JOIN span
),
firsts AS (
  SELECT bucket, cents AS v_first,
         row_number() OVER (PARTITION BY bucket
                            ORDER BY ts ASC, event_id ASC) AS rk
  FROM b
),
lasts AS (
  SELECT bucket, cents AS v_last,
         row_number() OVER (PARTITION BY bucket
                            ORDER BY ts DESC, event_id DESC) AS rk
  FROM b
)
SELECT g.bucket, CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(MIN(cents) AS BIGINT) AS v_min,
       CAST(MAX(cents) AS BIGINT) AS v_max,
       CAST(any_value(f.v_first) AS BIGINT) AS v_first,
       CAST(any_value(l.v_last) AS BIGINT) AS v_last
FROM b g
JOIN (SELECT bucket, v_first FROM firsts WHERE rk = 1) f USING (bucket)
JOIN (SELECT bucket, v_last FROM lasts WHERE rk = 1) l USING (bucket)
GROUP BY g.bucket ORDER BY g.bucket
"""


def events_peak_detection(spark: SparkSession, sf: str) -> DataFrame:
    """Local-maximum detection over the daily revenue series — the
    alerting primitive ("was yesterday a spike?"): a day is a peak if
    its exact cents revenue strictly exceeds BOTH calendar neighbors
    (missing neighbor = day stands alone on that side and qualifies,
    the boundary convention alert rules use). Neighbors come from two
    self-joins on day±1 — calendar-day-keyed equi-joins, NOT an
    ordered window, so there is no single-partition frame to whitelist
    and the plan is three day-cardinality frames end to end.
    """
    daily = (
        _daily_revenue(spark, sf)
        .groupBy("day")
        .agg(F.sum("revenue_cents").cast("long").alias("y"))
    )
    prev = daily.select(
        F.date_add(F.col("day"), 1).alias("day"), F.col("y").alias("y_prev")
    )
    nxt = daily.select(
        F.date_sub(F.col("day"), 1).alias("day"), F.col("y").alias("y_next")
    )
    return (
        daily.join(prev, "day", "left")
        .join(nxt, "day", "left")
        .where(
            (F.col("y") > F.coalesce(F.col("y_prev"), F.lit(-1)))
            & (F.col("y") > F.coalesce(F.col("y_next"), F.lit(-1)))
        )
        .select(
            "day",
            "y",
            F.coalesce(F.col("y_prev"), F.lit(-1)).alias("y_prev"),
            F.coalesce(F.col("y_next"), F.lit(-1)).alias("y_next"),
        )
        .orderBy("day")
    )


QUERIES["events_peak_detection"] = events_peak_detection
ORACLES["events_peak_detection"] = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT d.day, d.y,
       COALESCE(p.y, -1) AS y_prev,
       COALESCE(n.y, -1) AS y_next
FROM daily d
LEFT JOIN daily p ON p.day = d.day - INTERVAL 1 DAY
LEFT JOIN daily n ON n.day = d.day + INTERVAL 1 DAY
WHERE d.y > COALESCE(p.y, -1) AND d.y > COALESCE(n.y, -1)
ORDER BY d.day
"""


DOW_ANOM_TOP = 3  # most-anomalous days reported per weekday


def events_dow_adjusted_anomaly(spark: SparkSession, sf: str) -> DataFrame:
    """Weekday-adjusted anomaly ranking: a Monday is only anomalous
    relative to OTHER Mondays — per ISO weekday, mean and variance of
    daily revenue from exact int64 moment sums, every day scored by
    its squared residual against its own weekday (the naive unadjusted
    z-score fires on every weekend; this is the production form), and
    the top-3 per weekday reported. Ranking needs NO division: within
    a weekday the variance term is constant, so ordering by the
    decimal cross-product r² = (n·y − Σy)² is ordering by z²; the
    displayed z_milli is the single audited float expression
    (|r|·1000/√(n·(nΣy²−(Σy)²)), identical IEEE ops in the oracle).

    Day-collapsed before everything: weekday stats are 7-row frames,
    the rank window is weekday-partitioned over day-cardinality rows.
    """
    daily = (
        _daily_revenue(spark, sf)
        .groupBy("day")
        .agg(F.sum("revenue_cents").cast("long").alias("y"))
        .withColumn("dow", F.dayofweek("day").cast("long"))
    )
    stats = daily.groupBy("dow").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    j = daily.join(F.broadcast(stats), "dow")
    r = F.col("n").cast("decimal(38,0)") * F.col("y") - F.col("sy")
    var_n3 = F.col("n").cast("decimal(38,0)") * (
        F.col("n").cast("decimal(38,0)") * F.col("syy")
        - F.col("sy").cast("decimal(38,0)") * F.col("sy")
    )
    scored = j.select(
        "dow",
        "day",
        "y",
        (r * r).alias("r2"),
        F.floor(
            F.abs(r).cast("double")
            * F.lit(1000.0)
            / F.sqrt(var_n3.cast("double"))
        )
        .cast("long")
        .alias("z_milli"),
    )
    w = W.partitionBy("dow").orderBy(F.col("r2").desc(), F.col("day").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= DOW_ANOM_TOP)
        .select("dow", F.col("rk").cast("long").alias("rk"), "day", "y", "z_milli")
        .orderBy("dow", "rk")
    )


QUERIES["events_dow_adjusted_anomaly"] = events_dow_adjusted_anomaly
ORACLES["events_dow_adjusted_anomaly"] = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y,
         CAST(dayofweek(CAST(ts AS DATE)) + 1 AS BIGINT) AS dow
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 3
),
stats AS (
  SELECT dow, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM daily GROUP BY dow
),
scored AS (
  SELECT d.dow, d.day, d.y,
         (CAST(s.n AS DECIMAL(38,0)) * d.y - s.sy)
           * (CAST(s.n AS DECIMAL(38,0)) * d.y - s.sy) AS r2,
         CAST(floor(abs(CAST(CAST(s.n AS DECIMAL(38,0)) * d.y - s.sy
                        AS DOUBLE)) * 1000
              / sqrt(CAST(CAST(s.n AS DECIMAL(38,0))
                     * (CAST(s.n AS DECIMAL(38,0)) * s.syy
                        - CAST(s.sy AS DECIMAL(38,0)) * s.sy) AS DOUBLE)))
           AS BIGINT) AS z_milli
  FROM daily d JOIN stats s ON s.dow = d.dow
)
SELECT dow, CAST(rk AS BIGINT) AS rk, day, y, z_milli FROM (
  SELECT dow, day, y, z_milli,
         row_number() OVER (PARTITION BY dow
                            ORDER BY r2 DESC, day ASC) AS rk
  FROM scored
) WHERE rk <= {DOW_ANOM_TOP}
ORDER BY dow, rk
"""
