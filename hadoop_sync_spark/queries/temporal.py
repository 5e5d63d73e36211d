"""Temporal/sequence analytics over event streams and order history —
round-4 additions to the §2C surface: SCD2 interval construction (the
versioned-dimension pattern), ordered funnel conversion (sequential
pattern matching), and time-RANGE window frames (rolling aggregates
keyed by event time, not row position).

These are the query shapes a training-data pipeline's *telemetry* side
needs (attribute history, conversion audits, rolling volume/health
monitors) and the last window-frame family (RANGE over time) the L2
surface had not yet exercised — q14 covers ROWS frames, q40-q42 cover
tumbling/sliding/session buckets; RANGE INTERVAL frames are per-row
sliding windows, a different physical operator.

Timestamp discipline: `events.ts` is nanosecond parquet; both engines
reduce it to integer epoch MICROseconds (`unix_micros` / `epoch_us`)
before any arithmetic, the q13 idiom — integer comparisons and
differences are exact and engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from hadoop_sync_spark.queries import register
from hadoop_sync_spark.queries._util import scaled, t

_DAY_US = 86_400_000_000


# --------------------------------------------------------------------------
# q119 — SCD2 interval construction (type-2 slowly-changing dimension)
# --------------------------------------------------------------------------
@register(
    "q119_scd2_intervals",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        FROM events
    ), flag AS (
        SELECT user_id, event_id, event_type, us,
               CASE WHEN lag(event_type) OVER (
                        PARTITION BY user_id ORDER BY us, event_id
                    ) IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
        FROM e
    ), grp AS (
        SELECT *, SUM(chg) OVER (
                   PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS g
        FROM flag
    ), seg AS (
        SELECT user_id, g, event_type,
               MIN(us) AS valid_from_us,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM grp GROUP BY user_id, g, event_type
    )
    SELECT user_id, event_type, valid_from_us,
           lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY g)
             AS valid_to_us,
           n_events,
           lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY g)
             IS NULL AS is_current
    FROM seg
    """,
    tags=("temporal", "scd2", "window"),
)
def q119_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history: collapse each user's
    event stream into maximal runs of one `event_type` and emit
    [valid_from, valid_to) intervals with a current-row flag — the
    attribute-history table every warehouse maintains for dimensions,
    built here with the gaps-and-islands idiom (change flag → running
    sum → segment id → segment agg → lead() for the closing bound).

    Scale: ONE shuffle on user_id serves all three window passes and the
    segment aggregation (identical partitioning; Catalyst reuses the
    exchange).  Segment count ≤ event count, and no step materializes a
    per-user collection — mega-users stream through rank arithmetic."""
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    # null-safe change detection, the exact twin of the oracle's
    # IS DISTINCT FROM: with `coalesce(lag != cur, TRUE)` a NULL
    # event_type would start a new segment on EVERY row in Spark while
    # DuckDB treats NULL-follows-NULL as unchanged — latent divergence
    # (fixture types are non-null), the q24 class
    chg = (
        ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type"))
    ).cast("long")
    grp = (
        ev.withColumn("chg", chg)
        .withColumn(
            "g",
            F.sum("chg").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    seg = grp.groupBy("user_id", "g", "event_type").agg(
        F.min("us").alias("valid_from_us"),
        F.count("*").alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("g")
    valid_to = F.lead("valid_from_us").over(w2)
    return seg.select(
        "user_id",
        "event_type",
        "valid_from_us",
        valid_to.alias("valid_to_us"),
        "n_events",
        valid_to.isNull().alias("is_current"),
    )


# --------------------------------------------------------------------------
# q120 — ordered funnel conversion (signup → first later purchase)
# --------------------------------------------------------------------------
@register(
    "q120_funnel_conversion",
    oracle="""
    WITH s AS (
        SELECT user_id, MIN(epoch_us(ts)) AS signup_us
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), p AS (
        SELECT user_id, epoch_us(ts) AS pus
        FROM events WHERE event_type = 'purchase'
    )
    SELECT s.user_id, s.signup_us,
           MIN(CASE WHEN p.pus > s.signup_us THEN p.pus END) AS purchase_us,
           MIN(CASE WHEN p.pus > s.signup_us THEN p.pus END) IS NOT NULL
             AS converted,
           MIN(CASE WHEN p.pus > s.signup_us THEN p.pus END) - s.signup_us
             AS gap_us
    FROM s LEFT JOIN p ON s.user_id = p.user_id
    GROUP BY s.user_id, s.signup_us
    """,
    tags=("temporal", "funnel", "sequence"),
)
def q120_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered two-stage funnel: for every user who signed up, the first
    purchase STRICTLY AFTER their first signup (event order matters — a
    purchase before the signup does not convert), with conversion flag
    and time-to-convert.  The sequential-pattern query behind activation
    and retention metrics; the same shape audits pipeline stage ordering
    (ingest → validate → publish) at the metadata layer.

    Scale: the ordering predicate is NOT a range join — both sides
    reduce/join on the user_id equi-key (one shuffle each) and the
    sequence condition folds into a conditional MIN, so skew and plan
    shape match any grouped aggregation.  Purchases per user stream
    through the partial agg; nothing quadratic."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("us").alias("signup_us"))
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("us").alias("pus")
    )
    first_after = F.min(
        F.when(F.col("pus") > F.col("signup_us"), F.col("pus"))
    )
    return (
        s.join(p, "user_id", "left")
        .groupBy("user_id", "signup_us")
        .agg(first_after.alias("purchase_us"))
        .select(
            "user_id",
            "signup_us",
            "purchase_us",
            F.col("purchase_us").isNotNull().alias("converted"),
            (F.col("purchase_us") - F.col("signup_us")).alias("gap_us"),
        )
    )


# --------------------------------------------------------------------------
# q122 — time-RANGE window frame: 7-day rolling revenue per customer
# --------------------------------------------------------------------------
@register(
    "q122_rolling_7d_revenue",
    oracle="""
    WITH o AS (
        SELECT o_custkey, o_orderkey,
               epoch_us(o_orderdate) // 86400000000 AS day,
               o_totalprice
        FROM orders
    )
    SELECT o_custkey, o_orderkey, day,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
                PARTITION BY o_custkey ORDER BY day
                RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 100.0 AS rolling_7d,
           CAST(COUNT(*) OVER (
                PARTITION BY o_custkey ORDER BY day
                RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS orders_7d
    FROM o
    """,
    tags=("temporal", "window", "range-frame"),
)
def q122_rolling_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling revenue and order count per customer via a RANGE
    window frame over integer epoch days — the per-row sliding window
    (each row's frame is [day-6, day], including same-day peers) that
    ROWS frames (q14) and epoch-bucketed windows (q40/q41) cannot
    express.  Day arithmetic is exact integer division of epoch
    microseconds on both engines, so frame membership is bit-identical.

    Scale: one shuffle on o_custkey; Spark's WindowExec evaluates the
    RANGE frame with a sliding aggregate buffer bounded by the frame's
    row count (here: a week of one customer's orders), not the
    partition — hot customers cost memory proportional to their 7-day
    burst only.  The scaled-BIGINT sum keeps the rolling prefix exact."""
    from pyspark.sql.types import TimestampNTZType

    odf = t(spark, sf_dir, "orders")
    # o_orderdate ships as naive TIMESTAMP(US) (timestamp_ntz under Spark
    # 4's NTZ inference); pin it to a UTC instant so unix_micros accepts
    # it — session-tz-independent, the io.load_table events.ts idiom
    od = (
        F.to_utc_timestamp("o_orderdate", "UTC")
        if isinstance(odf.schema["o_orderdate"].dataType, TimestampNTZType)
        else F.col("o_orderdate")
    )
    o = odf.select(
        "o_custkey",
        "o_orderkey",
        F.unix_micros(od).alias("_us"),
        "o_totalprice",
    ).withColumn("day", F.expr(f"_us div {_DAY_US}"))
    from hadoop_sync_spark.queries._util import scaled

    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day")
        .rangeBetween(-6, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("day"),
        (F.sum(scaled("o_totalprice")).over(w).cast("double") / F.lit(100.0)).alias(
            "rolling_7d"
        ),
        F.count("*").over(w).alias("orders_7d"),
    )


# --------------------------------------------------------------------------
# q124 — retention cohort matrix (cohort day × age)
# --------------------------------------------------------------------------
@register(
    "q124_retention_cohorts",
    oracle="""
    WITH act AS (
        SELECT DISTINCT user_id,
               epoch_us(ts) // 86400000000 AS day
        FROM events
    ), coh AS (
        SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY user_id
    )
    SELECT c.cohort_day, a.day - c.cohort_day AS age_days,
           CAST(COUNT(*) AS BIGINT) AS active_users
    FROM act a JOIN coh c ON a.user_id = c.user_id
    GROUP BY 1, 2
    """,
    tags=("temporal", "cohort", "retention"),
)
def q124_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users grouped by first-seen day (their
    cohort), activity counted per (cohort_day, age_days) — the
    product-analytics staple that, at the pipeline layer, answers "how
    long do sources keep contributing after onboarding".  `act` is
    (user, day) distinct so COUNT(*) per cell IS distinct active users —
    no count_distinct needed in the final pass.

    Scale: ONE user-scale exchange — the frame repartitions on user_id
    once, and the (user, day) distinct, the cohort min (a window over
    the same key, replacing the aggregate+self-join), and the outgoing
    partial agg all ride that partitioning; the only other exchange
    moves cell-scale rows (cohort × age cardinality).  Plan-checked."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.expr(f"unix_micros(ts) div {_DAY_US}").alias("day")
    )
    # hash-partitioning on user_id alone satisfies the (user_id, day)
    # clustering the distinct needs AND the cohort window's requirement,
    # so everything below the final cell-agg shares this one shuffle
    act = ev.repartition("user_id").distinct()
    coh_day = F.min("day").over(Window.partitionBy("user_id"))
    return (
        act.withColumn("cohort_day", coh_day)
        .groupBy(
            "cohort_day", (F.col("day") - F.col("cohort_day")).alias("age_days")
        )
        .agg(F.count("*").alias("active_users"))
    )


# --------------------------------------------------------------------------
# q125 — top event-type trigram sequences (sequence pattern mining)
# --------------------------------------------------------------------------
@register(
    "q125_event_trigrams",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type, 1) OVER w AS p1,
               lag(event_type, 2) OVER w AS p2
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY epoch_us(ts), event_id)
    )
    SELECT p2 AS t1, p1 AS t2, event_type AS t3,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE p2 IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY n DESC, t1, t2, t3
    LIMIT 20
    """,
    tags=("temporal", "sequence", "pattern-mining"),
)
def q125_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 event-type trigram sequences across all user journeys —
    lightweight sequential pattern mining (the n-gram view of behavior
    that seeds funnel design and anomaly baselines).  Both lags ride ONE
    window pass; the LIMIT sits under a total order (count desc, then
    the trigram itself) so the top-20 is deterministic.

    Scale: one shuffle on user_id for the lags, one aggregation on the
    trigram key (cardinality ≤ |event_type|³ — tiny), then
    TakeOrdered(20); nothing global-sorts the event stream."""
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), "event_id"
    )
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    )
    return (
        ev.filter(F.col("p2").isNotNull())
        .groupBy(
            F.col("p2").alias("t1"),
            F.col("p1").alias("t2"),
            F.col("event_type").alias("t3"),
        )
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "t1", "t2", "t3")
        .limit(20)
    )


# --------------------------------------------------------------------------
# q134 — interval-weighted (time-weighted) average per user
# --------------------------------------------------------------------------
@register(
    "q134_interval_weighted_avg",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS us,
               CAST(ROUND(value * 100) AS BIGINT) AS val_c
        FROM events
    ), iv AS (
        SELECT user_id, val_c,
               (lead(us) OVER (
                    PARTITION BY user_id ORDER BY us, event_id
                ) - us) // 1000000 AS dur_s
        FROM e
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(dur_s) AS BIGINT) AS total_dur_s,
           CAST(CAST(SUM(val_c * dur_s) AS BIGINT) AS DOUBLE)
             / 100.0 / SUM(dur_s) AS twap
    FROM iv
    WHERE dur_s IS NOT NULL
    GROUP BY user_id
    HAVING SUM(dur_s) > 0
    """,
    tags=("temporal", "window", "twap"),
)
def q134_interval_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP) of `value` per user: each observation
    is held until the user's next event, so its weight is that interval's
    duration — the canonical downsampling/summary operator for irregular
    time series (billing meters, sensor states, position marks), which a
    plain AVG gets wrong whenever sampling is bursty.

    Exactness: weights are integer SECONDS (truncating integer division
    of the epoch-microsecond gap — both engines truncate toward zero),
    values go through the scaled-cents idiom, so the weighted sum is an
    exact BIGINT on both sides and the final double division applies IEEE
    ops to identical scalars.  Users whose events all share one timestamp
    (total weight 0) are excluded on both sides rather than dividing by
    zero; the stream's last observation per user has no closing bound and
    is likewise excluded (standard right-open TWAP).

    Scale: ONE shuffle on user_id serves both the lead() pass and the
    aggregation (identical partitioning — Catalyst reuses the exchange);
    per-user state is a sliding one-row lead buffer, never a collected
    series.  Overflow headroom: cents (≤1e5) × seconds-per-interval
    (≤~1e7 for a year-long gap) is ≤1e12 per row, leaving >9e6 intervals
    of int64 headroom per user — a per-user ceiling no real stream hits."""
    e = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        scaled("value").alias("val_c"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    iv = e.select(
        "user_id",
        "val_c",
        (F.lead("us").over(w) - F.col("us")).alias("dur_us"),
    ).select(
        "user_id",
        "val_c",
        F.expr("dur_us div 1000000").alias("dur_s"),
    ).filter(F.col("dur_s").isNotNull())
    return (
        iv.groupBy("user_id")
        .agg(
            F.count("*").alias("n_intervals"),
            F.sum("dur_s").alias("total_dur_s"),
            (
                F.sum(F.col("val_c") * F.col("dur_s")).cast("double")
                / F.lit(100.0)
                / F.sum("dur_s")
            ).alias("twap"),
        )
        .filter(F.col("total_dur_s") > 0)
    )
