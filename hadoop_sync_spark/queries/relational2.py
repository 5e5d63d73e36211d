"""L2 relational surface, second batch: grouping sets, exact quantiles,
min_by/max_by, conditional aggregation, ordered string agg, window
navigation, outer joins, range join, as-of join, pivot, exact variance,
date arithmetic, regexp, multiset ops, and the Spark SQL surface
(EXISTS / IN / scalar subqueries).

Same exact-parity discipline as :mod:`relational` (see ``_util``): money
sums ride scaled BIGINTs; doubles only ever come from identical scalar
arithmetic on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from hadoop_sync_spark.queries import register
from hadoop_sync_spark.queries._util import (
    dsum,
    scaled,
    sql_dsum,
    sql_scaled,
    t,
)


# --------------------------------------------------------------------------
# q23 — GROUPING SETS (SQL surface; complements q10 rollup / q11 cube)
# --------------------------------------------------------------------------
@register(
    "q23_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           COUNT(*) AS cnt
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("agg", "grouping-sets", "sql"),
)
def q23_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the Spark SQL front end (views
    registered per call) — the aggregation planner expands to a single
    shuffle with a grouping-id column, same as rollup/cube."""
    from hadoop_sync_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               {sql_dsum('l_quantity')} AS sum_qty,
               COUNT(*) AS cnt
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# --------------------------------------------------------------------------
# q24 — exact median via window ranks (deterministic, engine-portable)
# --------------------------------------------------------------------------
@register(
    "q24_exact_median",
    oracle="""
    WITH r AS (
        SELECT l_returnflag, l_quantity,
               ROW_NUMBER() OVER (
                   PARTITION BY l_returnflag
                   ORDER BY l_quantity, l_orderkey, l_linenumber
               ) AS rn,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem
    )
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN rn = (n+1)//2
                         THEN CAST(l_quantity AS BIGINT) ELSE 0 END
                  + CASE WHEN rn = (n+2)//2
                         THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS DOUBLE)
             / 2.0 AS median_qty,
           MAX(n) AS n
    FROM r
    GROUP BY l_returnflag
    """,
    tags=("agg", "window", "quantile"),
)
def q24_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact group median built from row_number + count windows instead of
    an engine-specific quantile function, so both engines compute literally
    the same integer arithmetic (l_quantity is integral in the fixtures).
    The two middle indices are summed as SEPARATE terms so an odd-sized
    group (lo == hi) counts its middle row twice before the /2 — the
    ``rn IN (lo, hi)`` spelling silently halved odd-group medians (latent:
    every fixture group happens to be even-sized; both engines agreed on
    the wrong value, so only inspection could catch it).

    Scale: one shuffle on the partition key; the rank window is the
    standard distributed exact-quantile pattern (vs approx_percentile for
    the sketch path)."""
    li = t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_quantity", "l_orderkey", "l_linenumber"
    )
    wc = Window.partitionBy("l_returnflag")
    r = li.select(
        "l_returnflag",
        "l_quantity",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n"),
    )
    lo = F.floor((F.col("n") + 1) / 2)
    hi = F.floor((F.col("n") + 2) / 2)
    zero = F.lit(0).cast("long")
    mid = F.when(F.col("rn") == lo, F.col("l_quantity").cast("long")).otherwise(
        zero
    ) + F.when(F.col("rn") == hi, F.col("l_quantity").cast("long")).otherwise(
        zero
    )
    return (
        r.groupBy("l_returnflag")
        .agg(
            (F.sum(mid).cast("double") / F.lit(2.0)).alias("median_qty"),
            F.max("n").alias("n"),
        )
    )


# --------------------------------------------------------------------------
# q25 — min_by / max_by (argmin/argmax) with deterministic tiebreak
# --------------------------------------------------------------------------
@register(
    "q25_minby_maxby",
    oracle="""
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
           arg_max(c_name, CAST(ROUND(c_acctbal*100) AS BIGINT)*1000000 + c_custkey)
             AS richest_customer,
           arg_min(c_name, CAST(ROUND(c_acctbal*100) AS BIGINT)*1000000 + c_custkey)
             AS poorest_customer,
           COUNT(*) AS cust_cnt
    FROM customer
    GROUP BY c_nationkey
    """,
    tags=("agg", "argminmax"),
)
def q25_minby_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation argmin/argmax customer by account balance.  The ordering
    key folds the scaled balance with the unique custkey so ties are
    deterministic in both engines (bare max_by on a duplicated balance
    would be engine-dependent)."""
    c = t(spark, sf_dir, "customer")
    key = scaled("c_acctbal") * F.lit(1000000).cast("long") + F.col("c_custkey")
    return (
        c.groupBy(F.col("c_nationkey").cast("long").alias("nationkey"))
        .agg(
            F.max_by("c_name", key).alias("richest_customer"),
            F.min_by("c_name", key).alias("poorest_customer"),
            F.count("*").alias("cust_cnt"),
        )
    )


# --------------------------------------------------------------------------
# q26 — conditional aggregation (CASE-gated sums/counts)
# --------------------------------------------------------------------------
@register(
    "q26_conditional_agg",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished_cnt,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_cnt,
           CAST(SUM(CASE WHEN o_orderpriority LIKE '1%'
                         THEN {sql_scaled('o_totalprice')} ELSE 0 END) AS DOUBLE)
             / 100.0 AS urgent_value,
           COUNT(*) AS total_cnt
    FROM orders
    GROUP BY year(o_orderdate)
    """,
    tags=("agg", "conditional"),
)
def q26_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered/conditional aggregates in one pass over the fact table —
    the map-side combine applies to every CASE branch, so this is still a
    single O(groups) shuffle."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias(
                "finished_cnt"
            ),
            F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias(
                "open_cnt"
            ),
            (
                F.sum(
                    F.when(
                        F.col("o_orderpriority").like("1%"),
                        scaled("o_totalprice"),
                    ).otherwise(F.lit(0).cast("long"))
                ).cast("double")
                / F.lit(100.0)
            ).alias("urgent_value"),
            F.count("*").alias("total_cnt"),
        )
    )


# --------------------------------------------------------------------------
# q27 — ordered string aggregation (listagg)
# --------------------------------------------------------------------------
@register(
    "q27_string_agg",
    oracle="""
    SELECT CAST(n_regionkey AS BIGINT) AS regionkey,
           string_agg(n_name, '|' ORDER BY n_name) AS nations,
           COUNT(*) AS nation_cnt
    FROM nation
    GROUP BY n_regionkey
    """,
    tags=("agg", "stringagg"),
)
def q27_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered listagg: collect_list → array_sort → array_join gives a
    deterministic concatenation identical to DuckDB's ordered string_agg
    (both sort on binary UTF-8)."""
    n = t(spark, sf_dir, "nation")
    return (
        n.groupBy(F.col("n_regionkey").cast("long").alias("regionkey"))
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), "|").alias(
                "nations"
            ),
            F.count("*").alias("nation_cnt"),
        )
    )


# --------------------------------------------------------------------------
# q28 — window navigation: first/last/nth, ntile, percent_rank, cume_dist
# --------------------------------------------------------------------------
@register(
    "q28_window_navigation",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_order,
           nth_value(o_orderkey, 2) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS second_order,
           lead(o_orderkey, 1, -1) OVER w AS next_order,
           lag(o_orderkey, 1, -1) OVER w AS prev_order,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM orders
    WHERE o_custkey % 100 = 0
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window", "navigation"),
)
def q28_window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full navigation-function family over a deterministic total order
    (date + unique key tiebreak).  percent_rank/cume_dist are exact integer
    ratios, identical IEEE division on both engines."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 100 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(wfull).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(wfull).alias("second_order"),
        F.lead("o_orderkey", 1, -1).over(w).alias("next_order"),
        F.lag("o_orderkey", 1, -1).over(w).alias("prev_order"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


# --------------------------------------------------------------------------
# q29 — right + full outer joins (completes q05's left-outer coverage)
# --------------------------------------------------------------------------
@register(
    "q29_outer_joins",
    oracle="""
    WITH cn AS (
        SELECT CAST(c_nationkey AS BIGINT) AS nk, COUNT(*) AS cust_cnt
        FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey
    ), sn AS (
        SELECT CAST(s_nationkey AS BIGINT) AS nk, COUNT(*) AS supp_cnt
        FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey
    )
    SELECT COALESCE(cn.nk, sn.nk) AS nationkey,
           COALESCE(cust_cnt, 0) AS cust_cnt,
           COALESCE(supp_cnt, 0) AS supp_cnt
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
    tags=("join", "outer"),
)
def q29_outer_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join of two filtered aggregates keyed by nation — rows
    survive from either side with COALESCE'd defaults (A12's symmetric
    difference, relationally).

    Scale: both inputs are post-aggregation (≤ |nations| rows), so the
    outer join is trivially broadcastable; at raw-fact scale a full outer
    join shuffles both sides on the key."""
    cn = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").cast("long").alias("nk"))
        .agg(F.count("*").alias("cust_cnt"))
    )
    sn = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").cast("long").alias("nk"))
        .agg(F.count("*").alias("supp_cnt"))
    )
    return (
        cn.join(sn, cn.nk == sn.nk, "full_outer")
        .select(
            F.coalesce(cn.nk, sn.nk).alias("nationkey"),
            F.coalesce(F.col("cust_cnt"), F.lit(0)).alias("cust_cnt"),
            F.coalesce(F.col("supp_cnt"), F.lit(0)).alias("supp_cnt"),
        )
    )


# --------------------------------------------------------------------------
# q30 — bounded range join on event time (interval predicate)
# --------------------------------------------------------------------------
@register(
    "q30_event_range_join",
    oracle="""
    SELECT a.event_id AS id_a, b.event_id AS id_b,
           CAST(date_diff('microsecond', a.ts::TIMESTAMP, b.ts::TIMESTAMP)
                AS BIGINT) AS gap_us
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts::TIMESTAMP > a.ts::TIMESTAMP
     AND b.ts::TIMESTAMP <= a.ts::TIMESTAMP + INTERVAL 5 MINUTE
     AND a.event_id <> b.event_id
    """,
    tags=("join", "range", "events"),
)
def q30_event_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval self-join: pairs of same-user events within a 5-minute
    window.  Implemented as an equi join on (user, 5-minute time block)
    with a two-block probe side — the same bucketing that makes q62
    hash-joinable — so Spark never plans a per-user nested loop.  The
    range predicate itself compares the full-precision TIMESTAMP_NTZ
    values (blocks only bound the candidates); microsecond offsets are
    relative to a fixed NTZ epoch, so nothing depends on session timezone.

    Scale: block width = interval width bounds candidates per row to the
    true neighborhood; the join shuffles once on (user_id, block)."""
    e = t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("ts").cast("timestamp_ntz").alias("ts")
    )
    span_us = 5 * 60 * 1000 * 1000
    epoch = F.lit("2024-01-01").cast("timestamp_ntz")
    eus = F.timestamp_diff("MICROSECOND", epoch, F.col("ts"))
    blk = F.floor(eus / span_us).cast("long")
    a = e.select(
        F.col("event_id").alias("id_a"),
        F.col("user_id").alias("u_a"),
        F.col("ts").alias("ts_a"),
        F.explode(F.array(blk, blk + 1)).alias("bk_a"),
    )
    b = e.select(
        F.col("event_id").alias("id_b"),
        F.col("user_id").alias("u_b"),
        F.col("ts").alias("ts_b"),
        blk.alias("bk_b"),
    )
    return (
        a.join(
            b,
            (F.col("bk_a") == F.col("bk_b"))
            & (F.col("u_a") == F.col("u_b"))
            & (F.col("ts_b") > F.col("ts_a"))
            & (
                F.col("ts_b")
                <= F.col("ts_a") + F.expr("INTERVAL 5 MINUTES")
            )
            & (F.col("id_a") != F.col("id_b")),
        )
        .select(
            "id_a",
            "id_b",
            F.timestamp_diff("MICROSECOND", F.col("ts_a"), F.col("ts_b")).alias(
                "gap_us"
            ),
        )
        .distinct()
    )


# --------------------------------------------------------------------------
# q31 — as-of join (latest prior event, union-merge formulation)
# --------------------------------------------------------------------------
@register(
    "q31_asof_join",
    oracle="""
    SELECT p.event_id,
           p.user_id,
           (SELECT max(v.ts::TIMESTAMP) FROM events v
             WHERE v.user_id = p.user_id
               AND v.event_type <> 'purchase'
               AND v.ts::TIMESTAMP <= p.ts::TIMESTAMP) AS asof_ts
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
    tags=("join", "asof", "events"),
)
def q31_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every purchase event, the timestamp of the user's
    most recent non-purchase event at-or-before it.  The oracle states the
    semantics with a correlated subquery; the Spark plan is the scalable
    union-merge: tag both streams, sort once per user, running last_value
    over the reference stream — one shuffle, no per-row probe.

    This is the pattern the engine offers for time-series alignment at
    100 TB (a nested-loop as-of is quadratic per key)."""
    e = t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
    )
    probe = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("is_probe")
    )
    refs = e.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts", F.lit(0).alias("is_probe")
    )
    merged = probe.unionByName(refs)
    # references sort before probes at equal ts (is_probe ascending) so an
    # equal-timestamp reference is visible to the probe — matches <= above
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_probe", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ref_ts = F.when(F.col("is_probe") == 0, F.col("ts"))
    return (
        merged.select(
            "event_id",
            "user_id",
            "is_probe",
            F.last(ref_ts, ignorenulls=True).over(w).alias("asof_ts"),
        )
        .filter(F.col("is_probe") == 1)
        .select("event_id", "user_id", "asof_ts")
    )


# --------------------------------------------------------------------------
# q32 — approximate distinct (HLL sketch; rows-only, engines' sketches differ)
# --------------------------------------------------------------------------
@register(
    "q32_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS approx_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "approx", "sketch"),
)
def q32_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-count sketch per return flag (rsd 1%) next to
    the exact count — the 100 TB path for cardinality questions (sketches
    merge in the combiner; exact distinct costs a full shuffle of keys).

    HLL implementations differ across engines by design, so the sketch
    value itself cannot hash-match an oracle; instead the exact count is
    oracle-checked value-for-value and the sketch is checked through the
    ``approx_ok`` contract column — TRUE iff the estimate lands within a
    5-sigma envelope of the exact count (rsd 1% → ±5%), which the oracle
    asserts as a constant (the q48 contract pattern)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct(
                "l_partkey", rsd=0.01
            ).alias("_approx"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("_approx") - F.col("exact_parts"))
                <= 0.05 * F.col("exact_parts")
            ).alias("approx_ok"),
        )
    )


# --------------------------------------------------------------------------
# q33 — pivot (wide aggregation over a fixed domain)
# --------------------------------------------------------------------------
@register(
    "q33_pivot_returnflag",
    oracle=f"""
    SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           CAST(SUM(CASE WHEN l_returnflag='A' THEN {sql_scaled('l_quantity')}
                         ELSE 0 END) AS DOUBLE) / 100.0 AS qty_A,
           CAST(SUM(CASE WHEN l_returnflag='N' THEN {sql_scaled('l_quantity')}
                         ELSE 0 END) AS DOUBLE) / 100.0 AS qty_N,
           CAST(SUM(CASE WHEN l_returnflag='R' THEN {sql_scaled('l_quantity')}
                         ELSE 0 END) AS DOUBLE) / 100.0 AS qty_R
    FROM lineitem
    GROUP BY year(l_shipdate)
    """,
    tags=("agg", "pivot"),
)
def q33_pivot_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot on the (fixed, enumerated) return-flag domain.  Passing the
    value list to ``pivot()`` matters at scale: without it Spark runs an
    extra distinct job to discover the domain."""
    li = t(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy(F.year("l_shipdate").cast("long").alias("ship_year"))
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum(scaled("l_quantity")))
    )
    return piv.select(
        "ship_year",
        *[
            (F.coalesce(F.col(f), F.lit(0)).cast("double") / F.lit(100.0)).alias(
                f"qty_{f}"
            )
            for f in ("A", "N", "R")
        ],
    )


# --------------------------------------------------------------------------
# q34 — exact variance/stddev from integer power sums
# --------------------------------------------------------------------------
@register(
    "q34_exact_variance",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               SUM(CAST(l_quantity AS BIGINT)) AS sx,
               SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           CAST(n*sxx - sx*sx AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
             AS var_pop,
           sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
                / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS stddev_pop
    FROM s
    """,
    tags=("agg", "variance"),
)
def q34_exact_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population variance/stddev reconstructed from exact integer power
    sums (l_quantity is integral), so the usual float-summation
    nondeterminism of var_pop() never appears: both engines divide and
    sqrt the same integers.

    Scale: power sums are plain codegen'd long aggregations — one shuffle,
    map-side combined, no second pass (vs the two-pass textbook form)."""
    li = t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(q).alias("sx"),
        F.sum(q * q).alias("sxx"),
    )
    num = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    den = F.col("n").cast("double") * F.col("n").cast("double")
    return s.select(
        "l_returnflag",
        "n",
        (num / den).alias("var_pop"),
        F.sqrt(num / den).alias("stddev_pop"),
    )


# --------------------------------------------------------------------------
# q35 — date/time arithmetic library
# --------------------------------------------------------------------------
@register(
    "q35_date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_3mo,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
                AS BIGINT) AS days_since_95,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
           CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow1,
           CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week_start
    FROM orders
    WHERE o_orderkey % 1000 = 0
    """,
    tags=("scalar", "datetime"),
)
def q35_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic: interval add (month-end clamped identically in
    both engines), last_day, day difference, quarter/doy, day-of-week
    (normalized to DuckDB's 0=Sunday + 1), ISO week truncation."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 1000 == 0)
    return o.select(
        "o_orderkey",
        F.add_months("o_orderdate", 3).cast("timestamp_ntz").alias("plus_3mo"),
        F.last_day("o_orderdate").cast("string").alias("month_end"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp_ntz")
        )
        .cast("long")
        .alias("days_since_95"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.dayofyear("o_orderdate").cast("long").alias("doy"),
        F.dayofweek("o_orderdate").cast("long").alias("dow1"),
        F.date_trunc("week", "o_orderdate")
        .cast("timestamp_ntz")
        .alias("week_start"),
    )


# --------------------------------------------------------------------------
# q36 — regular expressions over document text
# --------------------------------------------------------------------------
@register(
    "q36_regexp_text",
    oracle=r"""
    SELECT doc_id,
           regexp_extract(text, '([a-z]{6,})', 1) AS first_long_word,
           len(regexp_extract_all(text, '[aeiou]{2}')) AS vowel_pairs,
           length(regexp_replace(text, '[aeiou]', '', 'g')) AS consonant_len,
           CASE WHEN regexp_matches(text, '\bqu') THEN 1 ELSE 0 END AS has_qu
    FROM documents
    WHERE doc_id % 10 = 0
    """,
    tags=("scalar", "regexp", "text"),
)
def q36_regexp_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar library: extract, extract-all count, global replace,
    boolean match — patterns restricted to constructs Java regex and RE2
    interpret identically (character classes, bounded repetition, \\b)."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]{6,})", 1).alias("first_long_word"),
        F.size(F.regexp_extract_all("text", F.lit(r"[aeiou]{2}"), 0))
        .cast("long")
        .alias("vowel_pairs"),
        F.length(F.regexp_replace("text", r"[aeiou]", "")).cast("long").alias(
            "consonant_len"
        ),
        F.when(F.col("text").rlike(r"\bqu"), 1).otherwise(0).alias("has_qu"),
    )


# --------------------------------------------------------------------------
# q37 — multiset operations (INTERSECT ALL / EXCEPT ALL)
# --------------------------------------------------------------------------
@register(
    "q37_multiset_ops",
    oracle="""
    SELECT 'inter' AS op, o_orderpriority FROM (
        SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
          AND o_orderkey % 200 = 0
        INTERSECT ALL
        SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
          AND o_orderkey % 200 = 0
    )
    UNION ALL
    SELECT 'except', o_orderpriority FROM (
        SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
          AND o_orderkey % 200 = 0
        EXCEPT ALL
        SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
          AND o_orderkey % 200 = 0
    )
    """,
    tags=("setops", "multiset"),
)
def q37_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations (intersectAll / exceptAll) — the
    multiplicity-preserving forms of A12's set differences."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 200 == 0)
    f = o.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    inter = f.intersectAll(op).select(
        F.lit("inter").alias("op"), "o_orderpriority"
    )
    exc = f.exceptAll(op).select(F.lit("except").alias("op"), "o_orderpriority")
    return inter.unionAll(exc)


# --------------------------------------------------------------------------
# q38 — correlated EXISTS / NOT EXISTS through the SQL front end
# --------------------------------------------------------------------------
@register(
    "q38_exists_subquery",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier s
    WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49
          )
      AND NOT EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_suppkey = s.s_suppkey
              AND l2.l_quantity >= 49 AND l2.l_discount > 0.099
          )
    """,
    tags=("sql", "subquery", "semi", "anti"),
)
def q38_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + NOT EXISTS via Spark SQL — Catalyst rewrites
    them to the same semi/anti joins as q06/q07 (A12/A16's existence
    checks), shown here through the SQL surface.

    The NOT EXISTS predicate is deliberately rare (max-quantity AND
    near-max discount): the round-1 form (`l_discount > 0.09`) held for
    EVERY supplier on the fixture, so the query was vacuously empty and
    its green driver row validated nothing — caught by the round-3
    vacuity guard; current form keeps 4/10 (sf0.001) and 29/100 (sf0.01)
    suppliers."""
    from hadoop_sync_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier s
        WHERE EXISTS (
                SELECT 1 FROM lineitem l
                WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49
              )
          AND NOT EXISTS (
                SELECT 1 FROM lineitem l2
                WHERE l2.l_suppkey = s.s_suppkey
                  AND l2.l_quantity >= 49 AND l2.l_discount > 0.099
              )
        """
    )


# --------------------------------------------------------------------------
# q39 — scalar + IN subqueries through the SQL front end
# --------------------------------------------------------------------------
@register(
    "q39_scalar_in_subquery",
    oracle=f"""
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
    WHERE {sql_scaled('o_totalprice')} > (
            SELECT CAST(AVG({sql_scaled('o_totalprice')}) AS BIGINT) FROM orders
          )
      AND o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
          )
      AND o_orderkey % 50 = 0
    """,
    tags=("sql", "subquery", "scalar"),
)
def q39_scalar_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (above-average filter, on the exact scaled integer
    so the threshold is engine-identical) + uncorrelated IN subquery.
    Catalyst plans the scalar as a broadcast literal and the IN as a semi
    join."""
    from hadoop_sync_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
        FROM orders
        WHERE CAST(ROUND((o_totalprice) * 100) AS BIGINT) > (
                SELECT CAST(AVG(CAST(ROUND((o_totalprice) * 100) AS BIGINT))
                            AS BIGINT)
                FROM orders
              )
          AND o_custkey IN (
                SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
              )
          AND o_orderkey % 50 = 0
        """
    )


# --------------------------------------------------------------------------
# q48 — approximate percentiles (KLL/GK sketch family; rows-only)
# --------------------------------------------------------------------------
@register(
    "q48_approx_percentiles",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           quantile_cont(l_quantity, 0.25) AS p25,
           quantile_cont(l_quantity, 0.50) AS p50,
           quantile_cont(l_quantity, 0.75) AS p75,
           quantile_cont(l_quantity, 0.95) AS p95,
           TRUE AS approx_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "approx", "sketch", "quantile"),
)
def q48_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile sketch per return flag: approx_percentile with a 10k
    accuracy parameter next to exact interpolated percentiles — the 100 TB
    path for latency/price distribution questions, where exact quantiles
    need a full sort per group.

    Exact percentiles are oracle-checked value-for-value (Spark
    ``percentile`` and DuckDB ``quantile_cont`` share linear-interpolation
    semantics); the engine-specific sketch output is checked via the
    ``approx_ok`` contract column — TRUE iff every approximate quantile
    lands within 1% relative error of its exact counterpart, which the
    oracle asserts as a constant."""
    li = t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.expr("percentile(l_quantity, array(0.25, 0.5, 0.75, 0.95))").alias(
            "_exact"
        ),
        F.percentile_approx(
            "l_quantity", [0.25, 0.5, 0.75, 0.95], 10000
        ).alias("_approx"),
    )
    within = F.expr(
        "aggregate(zip_with(_approx, _exact, (a, e) ->"
        " abs(a - e) <= 0.01 * greatest(abs(e), 1.0)),"
        " true, (acc, x) -> acc AND x)"
    )
    return agg.select(
        "l_returnflag",
        "n",
        F.col("_exact")[0].alias("p25"),
        F.col("_exact")[1].alias("p50"),
        F.col("_exact")[2].alias("p75"),
        F.col("_exact")[3].alias("p95"),
        within.alias("approx_ok"),
    )
