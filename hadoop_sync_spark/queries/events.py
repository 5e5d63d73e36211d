"""Event-time windowing over `events` — batch faces of the §2C streaming
surface (tumbling/sliding/session windows, dedup).  The streaming versions of
the same computations live in ``hadoop_sync_spark.streaming``; these batch
queries share semantics and are DuckDB-oracle-checkable.

Window-start parity: Spark's ``F.window`` aligns window starts to the Unix
epoch; the oracles reproduce that with integer epoch arithmetic
(``epoch_us DIV window DIV`` …) rather than relying on DuckDB's
``time_bucket`` origin conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from hadoop_sync_spark.queries import register
from hadoop_sync_spark.queries._util import davg, memo, sql_davg, t

_10M_US = 600_000_000
_5M_US = 300_000_000


# --------------------------------------------------------------------------
# q40 — tumbling window aggregation
# --------------------------------------------------------------------------
@register(
    "q40_tumbling_window",
    oracle=f"""
    SELECT make_timestamp((epoch_us(ts::TIMESTAMP) // {_10M_US}) * {_10M_US})
             AS window_start,
           event_type,
           COUNT(*) AS event_cnt,
           {sql_davg('value')} AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("events", "window-agg", "streaming-batch"),
)
def q40_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling-window counts per event type (epoch-aligned, same
    grouping Structured Streaming would maintain incrementally).

    Scale: single shuffle on (window, type); partial agg bounds shuffle rows
    by distinct windows × types per task."""
    ev = t(spark, sf_dir, "events")
    win, aggs, out = memo(
        "q40",
        lambda: (
            F.window("ts", "10 minutes").alias("w"),
            [F.count("*").alias("event_cnt"), davg("value").alias("avg_value")],
            [
                F.col("w.start").alias("window_start"),
                F.col("event_type"),
                F.col("event_cnt"),
                F.col("avg_value"),
            ],
        ),
    )
    return ev.groupBy(win, "event_type").agg(*aggs).select(*out)


# --------------------------------------------------------------------------
# q41 — sliding window aggregation
# --------------------------------------------------------------------------
@register(
    "q41_sliding_window",
    oracle=f"""
    WITH assigned AS (
        SELECT make_timestamp((epoch_us(ts::TIMESTAMP) // {_5M_US}) * {_5M_US})
                 AS window_start, value
        FROM events
        UNION ALL
        SELECT make_timestamp((epoch_us(ts::TIMESTAMP) // {_5M_US}) * {_5M_US}
                              - {_5M_US}) AS window_start, value
        FROM events
    )
    SELECT window_start, COUNT(*) AS event_cnt,
           {sql_davg('value')} AS total_avg
    FROM assigned
    GROUP BY window_start
    """,
    tags=("events", "window-agg", "streaming-batch"),
)
def q41_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 — each event lands in exactly two
    overlapping windows (the oracle materializes that assignment with a
    2-way UNION of shifted epoch buckets)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("event_cnt"), davg("value").alias("total_avg"))
        .select(F.col("w.start").alias("window_start"), "event_cnt", "total_avg")
    )


# --------------------------------------------------------------------------
# q42 — session windows (gaps-and-islands oracle)
# --------------------------------------------------------------------------
@register(
    "q42_session_windows",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, ts::TIMESTAMP AS ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts::TIMESTAMP >= lag(ts) OVER w + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), islands AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS last_event,
           COUNT(*) AS event_cnt
    FROM islands
    GROUP BY user_id, session_no
    """,
    tags=("events", "session-window", "streaming-batch"),
)
def q42_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap
    (``F.session_window``); the oracle derives the same islands with
    LAG + running SUM.  Output keys on (user, session_start) so the
    windowed and island forms align."""
    ev = t(spark, sf_dir, "events")
    win, aggs, out = memo(
        "q42",
        lambda: (
            F.session_window("ts", "30 minutes").alias("w"),
            [F.max("ts").alias("last_event"), F.count("*").alias("event_cnt")],
            [
                F.col("user_id"),
                F.col("w.start").alias("session_start"),
                F.col("last_event"),
                F.col("event_cnt"),
            ],
        ),
    )
    return ev.groupBy(win, "user_id").agg(*aggs).select(*out)


# --------------------------------------------------------------------------
# q43 — deterministic dedup (streaming dropDuplicates, batch face)
# --------------------------------------------------------------------------
@register(
    "q43_dedup_events",
    oracle="""
    SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type, value
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id
                                     ORDER BY ts, user_id, event_type, value) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    tags=("events", "dedup", "streaming-batch"),
)
def q43_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup keeping a *deterministic* representative (lowest full
    sort order) — the batch face of streaming ``dropDuplicates`` on the
    `event_id` key (SURVEY §2C stateful dedup).  Unlike ``dropDuplicates``,
    the window form pins which duplicate survives, making it oracle-safe."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("event_id").orderBy("ts", "user_id", "event_type", "value")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


# --------------------------------------------------------------------------
# q44 — salted two-phase aggregation on a skewed key
# --------------------------------------------------------------------------
@register(
    "q44_salted_skew_agg",
    oracle="""
    SELECT event_type,
           COUNT(*) AS event_cnt,
           CAST(SUM(CAST(ROUND((value) * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS total_value
    FROM events
    GROUP BY event_type
    """,
    tags=("agg", "skew", "salting", "events"),
)
def q44_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation over `event_type` — a handful of hot keys, the
    archetypal skewed group-by — via salted two-phase aggregation
    (functions.skew.salted_agg): phase 1 groups on (key, salt) so each hot
    key fans out over 32 reducers, phase 2 recombines the partials.

    Result is hash-identical to the plain GROUP BY oracle (sums/counts are
    decomposable), which is the point: salting changes the shuffle shape,
    never the answer."""
    from hadoop_sync_spark.functions.skew import salted_agg
    from hadoop_sync_spark.queries._util import scaled

    e = t(spark, sf_dir, "events")
    return salted_agg(
        e.select("event_type", "value"),
        keys=["event_type"],
        aggs=[
            F.count("*").alias("_cnt"),
            F.sum(scaled("value")).alias("_sum_scaled"),
        ],
        final_aggs=[
            F.sum("_cnt").alias("event_cnt"),
            (F.sum("_sum_scaled").cast("double") / F.lit(100.0)).alias(
                "total_value"
            ),
        ],
    )


# --------------------------------------------------------------------------
# q45 — custom UDAF via applyInPandas (grouped mode with tiebreak)
# --------------------------------------------------------------------------
@register(
    "q45_grouped_mode_udaf",
    oracle="""
    WITH c AS (
        SELECT user_id, event_type, COUNT(*) AS cnt
        FROM events GROUP BY user_id, event_type
    ), r AS (
        SELECT user_id, event_type, cnt,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY cnt DESC, event_type) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS distinct_types
        FROM c
    )
    SELECT user_id, event_type AS mode_type, cnt AS mode_cnt, distinct_types
    FROM r WHERE rn = 1
    """,
    tags=("udaf", "applyInPandas", "events"),
)
def q45_grouped_mode_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user modal event type — a custom UDAF through
    ``groupBy().applyInPandas`` (SURVEY §2B's UDAF row): each group arrives
    as one pandas frame, the body is vectorized value_counts, ties break on
    the lexicographically smallest type so the oracle (arg_max over counts
    with the same tiebreak) matches exactly.

    Scale: one shuffle on the group key; state is bounded by the group, so
    hot users need the salting pattern (q44) — mode is decomposable into
    per-salt partial counts exactly like sum."""
    import pandas as pd

    ev = t(spark, sf_dir, "events").select("user_id", "event_type")

    def mode_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        counts = (
            pdf.groupby("event_type").size().reset_index(name="cnt")
            .sort_values(["cnt", "event_type"], ascending=[False, True])
        )
        top = counts.iloc[0]
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "mode_type": [top["event_type"]],
                "mode_cnt": [int(top["cnt"])],
                "distinct_types": [len(counts)],
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        mode_fn,
        "user_id bigint, mode_type string, mode_cnt bigint, distinct_types bigint",
    )


# --------------------------------------------------------------------------
# q46 — JSON → MapType → explode (A9's pg_options_to_table lateral unnest)
# --------------------------------------------------------------------------
@register(
    "q46_json_map_explode",
    oracle="""
    WITH kv AS (
        SELECT unnest(json_keys(props)) AS prop_key, props FROM events
    )
    SELECT prop_key,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(json_extract_string(props, '$.' || prop_key) AS BIGINT))
                AS BIGINT) AS sum_val
    FROM kv
    GROUP BY prop_key
    """,
    tags=("json", "map", "explode", "events"),
)
def q46_json_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the JSON props column into a MapType and explode its entries
    into (key, value) rows — the exact shape of the reference's
    `pg_options_to_table(ftoptions)` lateral unnest (A9,
    `CitusMasterNode.java:58-61,338-381`), which turns the foreign table's
    option array into queryable key/value rows."""
    ev = t(spark, sf_dir, "events")
    kv = ev.select(
        F.explode(F.from_json("props", "map<string,string>")).alias(
            "prop_key", "prop_val"
        )
    )
    return kv.groupBy("prop_key").agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("prop_val").cast("long")).alias("sum_val"),
    )


# --------------------------------------------------------------------------
# q47 — REAL Structured Streaming run (AvailableNow → memory sink)
# --------------------------------------------------------------------------
@register(
    "q47_streaming_tumbling_window",
    oracle=f"""
    SELECT make_timestamp((epoch_us(ts::TIMESTAMP) // {_10M_US}) * {_10M_US})
             AS window_start,
           event_type,
           COUNT(*) AS event_cnt,
           CAST(SUM(CAST(ROUND((value) * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("events", "streaming", "window-agg", "availableNow"),
)
def q47_streaming_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A genuine Structured Streaming execution, not a batch twin: file
    source over the events parquet → watermarked 10-minute tumbling windows
    (scaled-BIGINT sums, so incremental state merge is exact) → drained
    with ``Trigger.AvailableNow`` into a memory sink, whose final contents
    are hash-checked against the batch SQL oracle — Structured Streaming's
    stream==batch contract, driver-verified.

    A fresh checkpoint per call makes the run self-contained; production
    keeps the checkpoint so each run absorbs only new files — the
    reference's incremental sync loop (`README.md:10-13`)."""
    import tempfile
    import uuid

    from hadoop_sync_spark.queries._util import scaled
    from hadoop_sync_spark.streaming.pipeline import (
        run_available_now,
        stream_events,
    )

    events = stream_events(spark, sf_dir, path_glob_filter="events.parquet")
    agg = (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("event_cnt"),
            F.sum(scaled("value")).alias("_sv"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "event_cnt",
            (F.col("_sv").cast("double") / F.lit(100.0)).alias("total_value"),
        )
    )
    name = f"q47_sink_{uuid.uuid4().hex}"
    ckpt = tempfile.mkdtemp(prefix="hss_q47_ckpt_")
    return run_available_now(agg, ckpt, name, output_mode="complete")


# --------------------------------------------------------------------------
# q49 — interval attribution join (batch twin of the stream-stream join)
# --------------------------------------------------------------------------
@register(
    "q49_attribution_join",
    oracle="""
    SELECT p.user_id,
           p.event_id AS purchase_id,
           p.ts::TIMESTAMP AS purchase_ts,
           c.event_id AS click_id,
           c.ts::TIMESTAMP AS click_ts
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts::TIMESTAMP <= p.ts::TIMESTAMP
     AND c.ts::TIMESTAMP >= p.ts::TIMESTAMP - INTERVAL 30 MINUTE
    """,
    tags=("events", "interval-join", "streaming-batch"),
)
def q49_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase attribution: every purchase joined to the same
    user's clicks in the preceding 30 minutes — the batch twin of
    ``streaming.attribution_join`` (stream-stream interval join), declared
    here so the join semantics themselves are oracle-checked while the
    streaming test asserts stream == batch on the same operator.

    Scale: equi-key user_id carries the shuffle; the time band is a
    post-join filter per key.  In streaming the same band is what bounds
    join state (watermark + 30 min horizon per side)."""
    from hadoop_sync_spark.streaming import attribution_join

    ev = t(spark, sf_dir, "events")
    return attribution_join(ev).select(
        "user_id", "purchase_id", "purchase_ts", "click_id", "click_ts"
    )


# --------------------------------------------------------------------------
# q75 — time-series gap filling + LOCF (hypertable-rollup pattern)
# --------------------------------------------------------------------------
@register(
    "q75_gap_fill_locf",
    oracle=f"""
    WITH b AS (
        SELECT event_type,
               make_timestamp((epoch_us(ts::TIMESTAMP) // {_10M_US})
                              * {_10M_US}) AS bucket,
               COUNT(*) AS cnt,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS sv
        FROM events GROUP BY 1, 2
    ), spine AS (
        SELECT t.event_type, g.bucket
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (SELECT unnest(generate_series(
              (SELECT MIN(bucket) FROM b), (SELECT MAX(bucket) FROM b),
              INTERVAL 10 MINUTE)) AS bucket) g
    )
    SELECT s.event_type, s.bucket,
           COALESCE(b.cnt, 0) AS cnt,
           LAST_VALUE(CAST(b.sv AS DOUBLE) / 100.0 IGNORE NULLS)
             OVER (PARTITION BY s.event_type ORDER BY s.bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS locf_sum
    FROM spine s LEFT JOIN b USING (event_type, bucket)
    """,
    tags=("events", "timeseries", "gap-fill", "locf"),
)
def q75_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense time-series rollup: 10-minute per-type buckets joined onto a
    generated continuous bucket spine, empty buckets filled with zero
    counts and last-observation-carried-forward sums — the hypertable /
    continuous-aggregate pattern (gap filling + LOCF) dashboards need,
    since a plain GROUP BY silently omits empty intervals.

    Scale: the spine is |event_types| × |buckets| rows — generated, never
    scanned; the LOCF window partitions by type so state per partition is
    one running value.  Sums ride scaled BIGINTs until the final double
    division (exact parity)."""
    ev = t(spark, sf_dir, "events")
    bucket_a, aggs, bounds_a, spine_bucket, out = memo(
        "q75",
        lambda: (
            F.timestamp_micros(
                F.expr(f"unix_micros(ts) DIV {_10M_US}") * _10M_US
            ).alias("bucket"),
            [
                F.count("*").alias("cnt"),
                F.sum(F.round(F.col("value") * 100).cast("long")).alias("sv"),
            ],
            [F.min("bucket").alias("lo"), F.max("bucket").alias("hi")],
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 10 MINUTES"))
            ).alias("bucket"),
            [
                F.col("event_type"),
                F.col("bucket"),
                F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
                F.last(
                    F.col("sv").cast("double") / F.lit(100.0),
                    ignorenulls=True,
                )
                .over(
                    Window.partitionBy("event_type")
                    .orderBy("bucket")
                    .rowsBetween(Window.unboundedPreceding, Window.currentRow)
                )
                .alias("locf_sum"),
            ],
        ),
    )
    b = ev.groupBy(F.col("event_type"), bucket_a).agg(*aggs)
    bounds = b.agg(*bounds_a)
    spine = (
        ev.select("event_type").distinct()
        .crossJoin(F.broadcast(bounds))
        .select("event_type", spine_bucket)
    )
    return spine.join(b, ["event_type", "bucket"], "left").select(*out)


# --------------------------------------------------------------------------
# q140 — cogrouped-map as-of alignment (cogroup().applyInPandas)
# --------------------------------------------------------------------------
@register(
    "q140_cogroup_asof_align",
    oracle="""
    WITH p AS (
        SELECT user_id, event_id, ts FROM events
        WHERE event_type = 'purchase'
    ), c AS (
        SELECT user_id, event_id AS click_id, ts AS click_ts FROM events
        WHERE event_type = 'click'
    ), j AS (
        SELECT p.user_id, p.event_id, c.click_id,
               CASE WHEN c.click_ts IS NULL THEN NULL
                    ELSE epoch_us(p.ts) - epoch_us(c.click_ts) END AS gap_us,
               ROW_NUMBER() OVER (
                   PARTITION BY p.user_id, p.event_id
                   ORDER BY c.click_ts DESC, c.click_id DESC
               ) AS rn
        FROM p LEFT JOIN c
          ON c.user_id = p.user_id AND c.click_ts <= p.ts
    )
    SELECT user_id, event_id, click_id, CAST(gap_us AS BIGINT) AS gap_us
    FROM j WHERE rn = 1
    """,
    tags=("events", "cogroup", "applyInPandas", "asof"),
)
def q140_cogroup_asof_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of alignment through the COGROUPED-map Python extension point
    (``groupBy().cogroup().applyInPandas`` — the one pandas-API face the
    UDF family didn't yet exercise; q45 covers grouped-map, q76 the
    UDTF): for every purchase event, the user's latest click at or
    before the purchase, emitted as (click_id, exact microsecond gap).
    Purchases with no preceding click survive with NULLs — the
    left-as-of contract, same semantics as the builtin-composed q31 but
    computed per-user in pandas ``merge_asof``, the shape custom
    session/attribution logic takes when it outgrows SQL.

    Exactness: ties on click_ts break toward the larger click_id — the
    clicks frame is sorted by (click_ts, click_id) and merge_asof
    backward takes the LAST equal-key row, mirroring the oracle's
    ``ORDER BY click_ts DESC, click_id DESC`` pick.  Gaps are integer
    microseconds (pandas datetime64[ns] // 1000 vs epoch_us), exact in
    both engines.

    Scale: cogroup shuffles each side ONCE on user_id and streams
    matched group pairs through Arrow — per-group memory is one user's
    events, never the corpus; merge_asof inside the group is
    O(n log n) local work.  No driver-side anything."""
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    return cogroup_asof_align(purchases, clicks)


#: cogroup bucket fan-out: the physical group key is ``user_id % B``,
#: not user_id — applyInPandas pays a Python function call + two frame
#: constructions PER GROUP, so keying the cogroup by raw user_id makes
#: group-count the cost driver (measured 10 s for 1,500 users over 100k
#: events at sf0.1); with B buckets each call handles ~users/B users
#: vectorized through ``merge_asof(by="user_id")`` (3.4× here, and at
#: 100 TB the per-call overhead amortizes over millions of rows while B
#: still exceeds any cluster's task parallelism)
_ASOF_BUCKETS = 64


def cogroup_asof_align(
    purchases: DataFrame, clicks: DataFrame
) -> DataFrame:
    """The cogrouped as-of kernel behind q140, factored so behavioral
    tests can feed crafted (user_id, event_id, ts) / (user_id, click_id,
    click_ts) frames and pin the tie/NULL semantics directly.

    Per-user as-of semantics ride ``merge_asof``'s by-columns inside
    each bucket group: both frames are sorted by their ON key (ties on
    click_ts broken by click_id so backward's last-equal-row pick is the
    larger click_id), and the bucket key is dropped before emit.

    The click-side user key is RENAMED to ``c_user`` before the cogroup
    (hence ``left_by``/``right_by``): when both inputs derive from the
    same scan, the two ``user_id`` attributes share one exprId and the
    cogroup's right-side Arrow frame silently DROPS the duplicate —
    aliasing mints a fresh exprId and keeps the column (observed on
    Spark 4; the crafted-frame tests wouldn't catch it because
    independent createDataFrame lineages don't collide)."""
    import pandas as pd

    def align(p: pd.DataFrame, c: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return pd.DataFrame(
                columns=["user_id", "event_id", "click_id", "gap_us"]
            )
        if c.empty:
            # a side with no rows for this group can arrive WITHOUT its
            # schema columns, so merge_asof would KeyError on the
            # by-column — emit the all-unmatched frame directly
            return pd.DataFrame(
                {
                    "user_id": p["user_id"],
                    "event_id": p["event_id"],
                    "click_id": pd.array([None] * len(p), dtype="Int64"),
                    "gap_us": pd.array([None] * len(p), dtype="Int64"),
                }
            )
        p = p.sort_values(["ts", "event_id"])
        c = c.sort_values(["click_ts", "click_id"])
        m = pd.merge_asof(
            p.drop(columns=["_b"]), c.drop(columns=["_b"]),
            left_on="ts", right_on="click_ts",
            left_by="user_id", right_by="c_user",
            direction="backward",
        )
        # datetime64 subtraction is integer nanoseconds; floor-dividing
        # the timedelta by 1us stays integral (NaT rows surface as NA)
        gap_us = (m["ts"] - m["click_ts"]) // pd.Timedelta(microseconds=1)
        return pd.DataFrame(
            {
                "user_id": m["user_id"],
                "event_id": m["event_id"],
                "click_id": m["click_id"].astype("Int64"),
                "gap_us": gap_us.astype("Int64"),
            }
        )

    cl = clicks.select(
        F.col("user_id").alias("c_user"), "click_id", "click_ts"
    )
    bp = F.pmod(F.col("user_id"), F.lit(_ASOF_BUCKETS)).alias("_b")
    bc = F.pmod(F.col("c_user"), F.lit(_ASOF_BUCKETS)).alias("_b")
    return (
        purchases.select("*", bp).groupBy("_b")
        .cogroup(cl.select("*", bc).groupBy("_b"))
        .applyInPandas(
            align,
            "user_id bigint, event_id bigint, click_id bigint, gap_us bigint",
        )
    )
