"""Cross-engine idiom fuzzing: the oracle gate rests on a handful of
Spark↔DuckDB expression pairs (whitespace tokenization, the BPE-ish regex,
the md5-prefix integer hash, the rolling-hash fold).  The fixture corpus is
ASCII word soup, so it cannot catch divergence on the inputs engines
actually disagree about — exotic whitespace (U+000B!), unicode, quotes,
empty strings.  This test generates a seeded adversarial corpus and runs
every paired idiom through BOTH engines in one batch.

NULL text is deliberately excluded: Spark's `size(NULL)` is -1 while
DuckDB's `len(NULL)` is NULL — a real semantic difference the queries never
hit because the fixture schema is non-null.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from hadoop_sync_spark.functions.text import WS_RE, normalize, tokens
from hadoop_sync_spark.queries._util import md5_prefix_long, sql_md5_prefix_long
from hadoop_sync_spark.queries.text import (
    _BPE_RE,
    _RH_B,
    _RH_M,
    _RH_W,
    _SQL_NORM_TOKENS,
    _SQL_TOKENS,
)

_WS_CHARS = [" ", "\t", "\n", "\r", "\x0b", "\f"]
_ATOMS = (
    list("abcdefXYZ0123456789")
    + list(".,;:!?\"'`()[]{}<>@#$%^&*-_=+|\\/~")
    + ["é", "ü", "ß", "中", "文", "🚀", "–", "…", " ", " "]
)


def _corpus(n: int = 300, seed: int = 42) -> list[str]:
    rng = random.Random(seed)
    out = ["", " ", "\x0b", "a\x0bb", "  x  ", "\t\n"]
    while len(out) < n:
        length = rng.randint(1, 60)
        out.append(
            "".join(
                rng.choice(_WS_CHARS if rng.random() < 0.25 else _ATOMS)
                for _ in range(length)
            )
        )
    return out


@pytest.fixture(scope="module")
def frames(spark):
    texts = _corpus()
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    sdf = spark.createDataFrame(pdf, schema)
    con = duckdb.connect()
    con.register("documents", pdf)
    return sdf, con


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _sql(con, q):
    return sorted(tuple(r) for r in con.sql(q).fetchall())


def test_tokenizer_parity(frames):
    sdf, con = frames
    got = _rows(
        sdf.select(
            "doc_id",
            F.size(tokens(F.col("text"))).cast("long").alias("n"),
            F.size(F.array_distinct(tokens(normalize(F.col("text")))))
            .cast("long")
            .alias("nd"),
        )
    )
    want = _sql(
        con,
        f"""
        SELECT doc_id,
               CAST(len({_SQL_TOKENS}) AS BIGINT),
               CAST(len(list_distinct({_SQL_NORM_TOKENS})) AS BIGINT)
        FROM documents ORDER BY doc_id
        """,
    )
    assert got == want


def test_bpe_regex_parity(frames):
    sdf, con = frames
    got = _rows(
        sdf.select(
            "doc_id",
            F.size(
                F.regexp_extract_all(F.lower("text"), F.lit(_BPE_RE), 0)
            ).cast("long").alias("n"),
        )
    )
    want = _sql(
        con,
        f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(lower(text), '{_BPE_RE}', 0))
                    AS BIGINT)
        FROM documents ORDER BY doc_id
        """,
    )
    assert got == want


def test_md5_prefix_hash_parity(frames):
    sdf, con = frames
    got = _rows(
        sdf.select("doc_id", md5_prefix_long(F.col("text")).alias("h"))
    )
    want = _sql(
        con,
        f"SELECT doc_id, {sql_md5_prefix_long('text')} "
        "FROM documents ORDER BY doc_id",
    )
    assert got == want


def test_rolling_hash_parity(frames):
    sdf, con = frames
    toks = sdf.select("doc_id", tokens(normalize(F.col("text"))).alias("toks"))
    vals_df = toks.select(
        "doc_id", F.transform("toks", md5_prefix_long).alias("vals")
    )
    vals = F.col("vals")
    idx = F.sequence(F.lit(1), F.greatest(F.size(vals) - (_RH_W - 1), F.lit(1)))
    wh = F.transform(
        idx,
        lambda i: F.aggregate(
            F.slice(vals, i, _RH_W),
            F.lit(0).cast("long"),
            lambda a, b: (a * _RH_B + b) % _RH_M,
        ),
    )
    got = _rows(vals_df.select("doc_id", F.array_min(wh).alias("fp")))
    want = _sql(
        con,
        f"""
        WITH tok AS (
            SELECT doc_id,
                   {_SQL_NORM_TOKENS} AS toks
            FROM documents
        ), v AS (
            SELECT doc_id,
                   list_transform(toks, t -> {sql_md5_prefix_long('t')}) AS vals
            FROM tok
        ), w AS (
            SELECT doc_id,
                   list_transform(range(1, greatest(len(vals) - {_RH_W - 1}, 1) + 1),
                       i -> list_reduce(
                                list_prepend(CAST(0 AS BIGINT),
                                             list_slice(vals, i, i + {_RH_W - 1})),
                                (a, b) -> (a * {_RH_B} + b) % {_RH_M})) AS wh
            FROM v
        )
        SELECT doc_id, list_min(wh) FROM w ORDER BY doc_id
        """,
    )
    assert got == want


def test_row_digest_idiom_parity(spark):
    """The q97/q109 anti-entropy gate rests on the canonical lineitem row
    string rendering byte-identically in both engines: concat_ws over
    ROUND(x*100) scaled doubles, date → tz-pinned epoch micros, and the
    32/60-bit md5 prefixes.  The fixture's tame values (prices with 2
    clean decimals, post-1992 dates) can't expose divergence on the
    inputs engines disagree about — exact .5 rounding boundaries,
    negatives, pre-1970 dates, unicode flags — so fuzz those through BOTH
    engines directly."""
    import datetime as dt

    import pyarrow as pa

    from hadoop_sync_spark.queries._util import (
        md5_prefix60_long,
        sql_md5_prefix60_long,
    )
    from hadoop_sync_spark.queries.curation import _SQL_LI_ROWSTR, _li_rowstr

    rng = random.Random(7)
    n = 400
    # deliberately adversarial doubles: exact k/100 values, exact .5-cent
    # rounding boundaries (k/100 + 0.005), negatives, and wide magnitudes
    def money():
        k = rng.randint(-10**7, 10**7)
        case = rng.random()
        if case < 0.4:
            return k / 100.0
        if case < 0.7:
            return k / 100.0 + 0.005
        return rng.uniform(-1e9, 1e9)

    rows = {
        "l_orderkey": [rng.randint(-2**40, 2**40) for _ in range(n)],
        "l_partkey": [rng.randint(0, 2**31) for _ in range(n)],
        "l_suppkey": [rng.randint(0, 10**6) for _ in range(n)],
        "l_linenumber": [rng.randint(-100, 10**6) for _ in range(n)],
        "l_quantity": [money() for _ in range(n)],
        "l_extendedprice": [money() for _ in range(n)],
        "l_discount": [money() for _ in range(n)],
        "l_tax": [money() for _ in range(n)],
        "l_returnflag": [
            rng.choice(["A", "N", "R", "", "é", "中", "🚀", "a|b"])
            for _ in range(n)
        ],
        "l_linestatus": [
            rng.choice(["F", "O", "", "ß", "x|y"]) for _ in range(n)
        ],
        "l_shipdate": [
            dt.date(1900, 1, 1) + dt.timedelta(days=rng.randint(0, 110000))
            for _ in range(n)
        ],
    }
    at = pa.table(
        {
            **{k: pa.array(v, pa.int64()) for k, v in rows.items()
               if k.startswith("l_") and isinstance(rows[k][0], int)},
            **{k: pa.array(v, pa.float64()) for k, v in rows.items()
               if isinstance(rows[k][0], float)},
            "l_returnflag": pa.array(rows["l_returnflag"], pa.string()),
            "l_linestatus": pa.array(rows["l_linestatus"], pa.string()),
            "l_shipdate": pa.array(rows["l_shipdate"], pa.date32()),
        }
    )
    sdf = spark.createDataFrame(at.to_pandas())
    rowstr = _li_rowstr(F.col("l_linenumber"))
    got = sorted(
        (r["fp"], r["leaf"])
        for r in sdf.select(
            md5_prefix_long(rowstr).alias("fp"),
            md5_prefix60_long(rowstr).alias("leaf"),
        ).collect()
    )
    con = duckdb.connect()
    con.register("lineitem", at)
    expr = _SQL_LI_ROWSTR.format(LINENO="l_linenumber")
    want = sorted(
        (r[0], r[1])
        for r in con.sql(
            f"SELECT {sql_md5_prefix_long(expr)}, {sql_md5_prefix60_long(expr)}"
            " FROM lineitem"
        ).fetchall()
    )
    assert got == want


def test_span_dedup_parity(frames):
    """The q110 span idiom pair (split ' ' / sequence+slice+concat_ws /
    nullif-empty vs string_split / list-slice / array_to_string /
    string_agg-FILTER) over the adversarial corpus, including empty
    strings and exotic-whitespace-only documents — and at span width 3
    so multi-span documents with partial tails are common."""
    from hadoop_sync_spark.queries.dedup import (
        span_dedup_frame,
        span_dedup_sql,
    )

    sdf, con = frames
    got = _rows(span_dedup_frame(sdf, w=3))
    want = _sql(con, span_dedup_sql("documents", w=3))
    assert got == want


def test_gaps_and_islands_idiom_parity(spark):
    """Cross-engine fuzz of the q119 SCD2 idiom (change flag → running
    sum → segment agg → lead) on an adversarial event stream: timestamp
    TIES inside and across type runs, single-event runs, users with one
    event, and types that alternate every event.  The fixture stream is
    too benign to stress the tie-break (`ORDER BY us, event_id`), which
    is where window idioms actually diverge."""
    import random

    import duckdb

    rng = random.Random(7)
    rows = []
    eid = 0
    for uid in range(12):
        t = 1_000_000
        for _ in range(rng.randint(1, 40)):
            # ties: ~40% of steps do not advance the clock
            if rng.random() > 0.4:
                t += rng.randint(1, 5) * 1_000_000
            rows.append((eid, uid, t, rng.choice(["a", "b", "c"])))
            eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "us", "event_type"]
    )

    sdf = spark.createDataFrame(
        pdf, "event_id long, user_id long, us long, event_type string"
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    chg = F.coalesce(
        F.lag("event_type").over(w) != F.col("event_type"), F.lit(True)
    ).cast("long")
    grp = sdf.withColumn("chg", chg).withColumn(
        "g",
        F.sum("chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    seg = grp.groupBy("user_id", "g", "event_type").agg(
        F.min("us").alias("valid_from_us"), F.count("*").alias("n_events")
    )
    w2 = Window.partitionBy("user_id").orderBy("g")
    def _key(row):
        return tuple((x is None, x) for x in row)

    got = sorted(
        (
            tuple(r)
            for r in seg.select(
                "user_id",
                "event_type",
                "valid_from_us",
                F.lead("valid_from_us").over(w2).alias("valid_to_us"),
                "n_events",
            ).collect()
        ),
        key=_key,
    )

    con = duckdb.connect()
    con.register("e", pdf)
    want = sorted(
        (tuple(r)
        for r in con.sql(
            """
            WITH flag AS (
                SELECT user_id, event_id, event_type, us,
                       CASE WHEN lag(event_type) OVER (
                                PARTITION BY user_id ORDER BY us, event_id
                            ) IS DISTINCT FROM event_type
                            THEN 1 ELSE 0 END AS chg
                FROM e
            ), grp AS (
                SELECT *, SUM(chg) OVER (
                           PARTITION BY user_id ORDER BY us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS g
                FROM flag
            ), seg AS (
                SELECT user_id, g, event_type, MIN(us) AS valid_from_us,
                       CAST(COUNT(*) AS BIGINT) AS n_events
                FROM grp GROUP BY user_id, g, event_type
            )
            SELECT user_id, event_type, valid_from_us,
                   lead(valid_from_us) OVER (
                       PARTITION BY user_id ORDER BY g) AS valid_to_us,
                   n_events
            FROM seg
            """
        ).fetchall()),
        key=_key,
    )
    assert got == want
    # sanity: the adversarial stream must actually contain ties
    assert pdf.duplicated(subset=["user_id", "us"]).any()


def test_range_frame_idiom_parity(spark):
    """Cross-engine fuzz of the q122 RANGE-frame idiom on a TIE-heavy
    key: many rows per (customer, day) so every frame includes peers,
    plus sparse days that leave frames partially empty.  RANGE frames
    are the one window family whose peer-inclusion semantics could
    diverge silently — counts and cent-exact sums must match per ROW."""
    import random

    import duckdb

    rng = random.Random(11)
    rows = []
    oid = 0
    for cust in range(8):
        day = 0
        for _ in range(rng.randint(3, 30)):
            if rng.random() > 0.5:  # ~half the orders tie on the day
                day += rng.randint(1, 12)
            rows.append((oid, cust, day, round(rng.uniform(1, 500), 2)))
            oid += 1
    pdf = pd.DataFrame(rows, columns=["oid", "cust", "day", "price"])

    sdf = spark.createDataFrame(
        pdf, "oid long, cust long, day long, price double"
    )
    from pyspark.sql.window import Window

    from hadoop_sync_spark.queries._util import scaled

    w = Window.partitionBy("cust").orderBy("day").rangeBetween(-6, 0)
    got = sorted(
        tuple(r)
        for r in sdf.select(
            "oid",
            (F.sum(scaled("price")).over(w).cast("double") / 100.0).alias(
                "roll"
            ),
            F.count("*").over(w).alias("n"),
        ).collect()
    )
    con = duckdb.connect()
    con.register("o", pdf)
    want = sorted(
        tuple(r)
        for r in con.sql(
            """
            SELECT oid,
                   CAST(SUM(CAST(ROUND(price*100) AS BIGINT)) OVER (
                       PARTITION BY cust ORDER BY day
                       RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
                   ) AS DOUBLE)/100.0 AS roll,
                   CAST(COUNT(*) OVER (
                       PARTITION BY cust ORDER BY day
                       RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS n
            FROM o
            """
        ).fetchall()
    )
    assert got == want
    assert pdf.duplicated(subset=["cust", "day"]).any()  # ties exist


def test_posting_shard_width_bound(spark, sf_dir):
    """q132 invariant: no posting block may exceed the shard width — the
    anti-skew property the doc-sharded layout exists for (a stopword
    appearing in EVERY doc still caps each block at 256 postings)."""
    from hadoop_sync_spark.queries import load_all

    df = load_all()["q132_posting_blocks"].fn(spark, sf_dir)
    assert df.filter(F.col("n_docs") > 256).count() == 0


def test_asof_join_matches_duckdb_native_asof(spark):
    """Third-formulation probe for q31: the Spark union-merge as-of must
    agree with DuckDB's NATIVE `ASOF LEFT JOIN` — an implementation
    neither our Spark plan nor our correlated-subquery oracle shares, so
    agreement is evidence about SEMANTICS, not about two copies of the
    same idiom.  Fuzzed with timestamp ties between probe and reference
    (the <= boundary) and users with no reference at all."""
    import random

    import duckdb

    rng = random.Random(3)
    rows = []
    eid = 0
    for uid in range(10):
        t = 0
        for _ in range(rng.randint(1, 30)):
            if rng.random() > 0.3:  # ~30% exact-tie steps
                t += rng.randint(1, 9)
            rows.append(
                (eid, uid, t, "purchase" if rng.random() < 0.4 else "view")
            )
            eid += 1
    # one user with purchases but zero references (NULL asof)
    rows += [(eid, 99, 5, "purchase"), (eid + 1, 99, 9, "purchase")]
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "us", "event_type"])

    sdf = spark.createDataFrame(
        pdf, "event_id long, user_id long, us long, event_type string"
    )
    from pyspark.sql.window import Window

    probe = sdf.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "us", F.lit(1).alias("is_probe")
    )
    refs = sdf.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "us", F.lit(0).alias("is_probe")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "is_probe", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ref_us = F.when(F.col("is_probe") == 0, F.col("us"))
    got = {
        r["event_id"]: r["asof_us"]
        for r in probe.unionByName(refs)
        .select(
            "event_id",
            "is_probe",
            F.last(ref_us, ignorenulls=True).over(w).alias("asof_us"),
        )
        .filter(F.col("is_probe") == 1)
        .collect()
    }

    con = duckdb.connect()
    con.register("e", pdf)
    want = {
        r[0]: r[1]
        for r in con.sql(
            """
            SELECT p.event_id, r.us AS asof_us
            FROM (SELECT * FROM e WHERE event_type = 'purchase') p
            ASOF LEFT JOIN (SELECT * FROM e WHERE event_type <> 'purchase') r
              ON p.user_id = r.user_id AND r.us <= p.us
            """
        ).fetchall()
    }
    assert got == want
    assert any(v is None for v in got.values())  # the no-reference user
    # ties actually exercised: some probe shares a us with a reference
    ties = pdf.merge(pdf, on=["user_id", "us"]).query(
        "event_type_x == 'purchase' and event_type_y != 'purchase'"
    )
    assert len(ties) > 0


def test_variance_power_sums_match_native_var_pop(spark):
    """q34's integer power-sum variance must agree with DuckDB's native
    var_pop/stddev_pop to float tolerance — the independent-formulation
    probe (the oracle itself uses the same power sums, so parity alone
    can't catch an algebra slip in the shared formula)."""
    import duckdb

    from hadoop_sync_spark.queries import load_all
    from tests.conftest import SF_DIR

    got = {
        r["l_returnflag"]: (r["var_pop"], r["stddev_pop"])
        for r in load_all()["q34_exact_variance"].fn(spark, SF_DIR).collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    want = {
        r[0]: (r[1], r[2])
        for r in con.sql(
            "SELECT l_returnflag, var_pop(l_quantity), "
            "stddev_pop(l_quantity) FROM lineitem GROUP BY 1"
        ).fetchall()
    }
    assert set(got) == set(want)
    for k in got:
        assert abs(got[k][0] - want[k][0]) < 1e-9 * max(1.0, want[k][0])
        assert abs(got[k][1] - want[k][1]) < 1e-9 * max(1.0, want[k][1])


def test_regression_power_sums_match_native_regr_aggs(spark):
    """q94's power-sum regression must agree with DuckDB's native
    corr/regr_slope/regr_intercept to float tolerance — independent
    formulation probe (y is price ROUNDED to whole units, so the native
    aggregates run on the same rounded variable)."""
    import duckdb

    from hadoop_sync_spark.queries import load_all
    from tests.conftest import SF_DIR

    got = {
        r["l_returnflag"]: (
            r["corr_qty_price"],
            r["regr_slope"],
            r["regr_intercept"],
        )
        for r in load_all()["q94_regression_stats"].fn(spark, SF_DIR).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.sql(
            """
            SELECT l_returnflag,
                   corr(ROUND(l_extendedprice), l_quantity),
                   regr_slope(ROUND(l_extendedprice), l_quantity),
                   regr_intercept(ROUND(l_extendedprice), l_quantity)
            FROM lineitem GROUP BY 1
            """
        ).fetchall()
    }
    assert set(got) == set(want)
    for k in got:
        for g, w in zip(got[k], want[k]):
            assert abs(g - w) < 1e-9 * max(1.0, abs(w)), (k, got[k], want[k])


def test_locf_equals_native_asof_spine_join(spark):
    """Semantic probe for the q75 LOCF idiom: last-observation-carried-
    forward over a bucket spine IS an ASOF join of the spine against the
    observations — DuckDB's native ASOF provides the independent
    formulation.  Fuzzed with leading gaps (NULL until first observation)
    and long tails."""
    import random

    import duckdb

    rng = random.Random(5)
    obs_rows = []
    for series in ["a", "b"]:
        for b in range(0, 40):
            if rng.random() < 0.3:  # sparse observations
                obs_rows.append((series, b, rng.randint(1, 999)))
    pdf = pd.DataFrame(obs_rows, columns=["series", "bucket", "v"])
    spine = pd.DataFrame(
        [(s, b) for s in ["a", "b"] for b in range(0, 40)],
        columns=["series", "bucket"],
    )

    sdf = spark.createDataFrame(pdf, "series string, bucket long, v long")
    sp = spark.createDataFrame(spine, "series string, bucket long")
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("series")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = sorted(
        tuple(r)
        for r in sp.join(sdf, ["series", "bucket"], "left")
        .select(
            "series",
            "bucket",
            F.last("v", ignorenulls=True).over(w).alias("locf"),
        )
        .collect()
    )
    con = duckdb.connect()
    con.register("obs", pdf)
    con.register("spine", spine)
    want = sorted(
        tuple(r)
        for r in con.sql(
            """
            SELECT s.series, s.bucket, o.v AS locf
            FROM spine s
            ASOF LEFT JOIN obs o
              ON s.series = o.series AND o.bucket <= s.bucket
            """
        ).fetchall()
    )

    def _key(row):
        return tuple((x is None, x) for x in row)

    assert sorted(got, key=_key) == sorted(want, key=_key)
    assert any(r[2] is None for r in got)  # leading gap exercised


def test_integer_division_parity_including_negatives(spark):
    """Document-by-test the cross-engine integer-division semantics: Spark
    `div` truncates toward zero and — measured, not assumed — DuckDB's
    integer `//` ALSO truncates (-7 // 2 = -3, not the float-division
    floor), so the `div`/`//` oracle pairing (epoch-day buckets, doc-id
    shards, ppm shares) is exact over the FULL signed range, not just the
    non-negative operands current queries feed it."""
    import duckdb

    vals = [-7, -2, -1, 0, 1, 2, 7, 255, 256, 257]
    sdf = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        r["v"]: r["d"]
        for r in sdf.selectExpr("v", "v div 2 AS d").collect()
    }
    con = duckdb.connect()
    want = {
        v: con.sql(f"SELECT CAST({v} AS BIGINT) // 2").fetchone()[0]
        for v in vals
    }
    assert got == want  # identical everywhere, negatives included
    assert got[-7] == -3  # both truncate toward zero (no floor surprise)


def test_chunk_slice_idiom_parity(frames):
    """q133's chunking rests on THREE paired idioms beyond the shared
    tokenizer: Spark `sequence(0, n-1, stride)` ↔ DuckDB
    `generate_series(0, n-1, stride)` (both inclusive-stop; the n=0
    case CANNOT occur — Spark's sequence(0, -1, stride) with a positive
    stride actually RAISES rather than returning empty, but tokens()
    never yields a size-0 array because even empty text splits to ['']
    — do not rely on an n=0 both-empty equivalence), Spark
    `slice(arr, start+1, W)` ↔ DuckDB `arr[start+1 :
    start+W]` (1-based, end-inclusive, silently clipped), and the
    md5-of-joined-window signature.  The adversarial corpus hits the
    shapes the fixtures can't: empty strings (whose token list is [''],
    size 1), all-whitespace docs, and token counts straddling every
    stride/width boundary."""
    from hadoop_sync_spark.queries.pipeline_q import _CHUNK_S, _CHUNK_W

    sdf, con = frames
    toks = tokens(normalize(F.col("text")))
    chunks = sdf.select(
        "doc_id", toks.alias("tok")
    ).select(
        "doc_id",
        "tok",
        F.explode(
            F.sequence(F.lit(0), F.size("tok") - 1, F.lit(_CHUNK_S))
        ).alias("s"),
    )
    win = F.slice("tok", F.col("s") + 1, _CHUNK_W)
    got = _rows(
        chunks.select(
            "doc_id",
            F.col("s").cast("long"),
            F.size(win).cast("long"),
            F.md5(F.array_join(win, " ")),
        )
    )
    want = _sql(
        con,
        f"""
        WITH tok AS (
            SELECT doc_id, {_SQL_NORM_TOKENS} AS tok FROM documents
        ), starts AS (
            SELECT doc_id, tok,
                   unnest(generate_series(0, len(tok) - 1, {_CHUNK_S})) AS s
            FROM tok
        )
        SELECT doc_id, CAST(s AS BIGINT),
               CAST(len(tok[s + 1 : s + {_CHUNK_W}]) AS BIGINT),
               md5(array_to_string(tok[s + 1 : s + {_CHUNK_W}], ' '))
        FROM starts
        """,
    )
    assert got == want


def test_chunk_slice_idiom_parity_at_stride_boundaries(spark):
    """The shared fuzz corpus tops out around 60 characters — a dozen
    tokens, one chunk — so it never exercises a second chunk.  This frame
    pins every token count around the stride/width boundaries (stride±1,
    width±1, 2·stride±1, …): the exact places where inclusive-stop
    generate_series or end-inclusive list slicing could diverge from
    Spark's sequence/slice by one chunk or one token."""
    from hadoop_sync_spark.queries.pipeline_q import _CHUNK_S, _CHUNK_W

    counts = sorted(
        {1, 2}
        | {max(1, b + d) for b in (
            _CHUNK_S, _CHUNK_W, 2 * _CHUNK_S, _CHUNK_S + _CHUNK_W,
            3 * _CHUNK_S, 2 * _CHUNK_W,
        ) for d in (-1, 0, 1)}
    )
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(counts)),
            "text": [" ".join(f"w{i}" for i in range(n)) for n in counts],
        }
    )
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    sdf = spark.createDataFrame(pdf, schema)
    con = duckdb.connect()
    con.register("documents", pdf)

    toks = tokens(normalize(F.col("text")))
    chunks = sdf.select("doc_id", toks.alias("tok")).select(
        "doc_id",
        "tok",
        F.explode(
            F.sequence(F.lit(0), F.size("tok") - 1, F.lit(_CHUNK_S))
        ).alias("s"),
    )
    win = F.slice("tok", F.col("s") + 1, _CHUNK_W)
    got = _rows(
        chunks.select(
            "doc_id",
            F.col("s").cast("long"),
            F.size(win).cast("long"),
            F.md5(F.array_join(win, " ")),
        )
    )
    want = _sql(
        con,
        f"""
        WITH tok AS (
            SELECT doc_id, {_SQL_NORM_TOKENS} AS tok FROM documents
        ), starts AS (
            SELECT doc_id, tok,
                   unnest(generate_series(0, len(tok) - 1, {_CHUNK_S})) AS s
            FROM tok
        )
        SELECT doc_id, CAST(s AS BIGINT),
               CAST(len(tok[s + 1 : s + {_CHUNK_W}]) AS BIGINT),
               md5(array_to_string(tok[s + 1 : s + {_CHUNK_W}], ' '))
        FROM starts
        """,
    )
    assert got == want
    # sanity on the crafted shape itself: the 91-token doc (3·stride+1)
    # must produce 4 chunks
    n_91 = [n for n in counts if n == 3 * _CHUNK_S + 1]
    if n_91:
        per_doc = {}
        for d, s, ln, _h in got:
            per_doc.setdefault(d, 0)
            per_doc[d] += 1
        assert per_doc[counts.index(91)] == 4


def test_cdc_chunking_idiom_parity(frames):
    """q143's content-defined chunking run end-to-end over the
    adversarial corpus: md5-last-hex-digit boundary flags, the
    pre-boundary running count, ordered chunk reassembly
    (collect_list+array_sort ↔ string_agg ORDER BY), and the chunk
    signature must agree per (doc_id, chunk_id) — the places a
    whitespace-tokenization or ordered-agg divergence would corrupt
    chunk identities."""
    from hadoop_sync_spark.queries.pipeline_q import cdc_chunks_frame

    sdf, con = frames
    got = _rows(cdc_chunks_frame(sdf))
    want = _sql(
        con,
        f"""
        WITH toks AS (
            SELECT doc_id, {_SQL_NORM_TOKENS} AS tok FROM documents
        ), tokpos AS (
            SELECT doc_id, CAST(i + 1 AS BIGINT) AS pos, tok[i + 1] AS term
            FROM toks, unnest(range(len(tok))) AS u(i)
        ), flagged AS (
            SELECT doc_id, pos, term,
                   CASE WHEN substr(md5(term), 32, 1) IN ('0', '1')
                        THEN 1 ELSE 0 END AS flag
            FROM tokpos
        ), chunked AS (
            SELECT doc_id, pos, term,
                   COALESCE(SUM(flag) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS chunk_id
            FROM flagged
        )
        SELECT doc_id, chunk_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               md5(string_agg(term, ' ' ORDER BY pos)) AS chunk_sig
        FROM chunked GROUP BY doc_id, chunk_id
        """,
    )
    assert got == want


def test_shingle_coverage_idiom_parity(frames):
    """q141's per-doc shingle inventory over the adversarial corpus:
    Spark's shingles_of_tokens (sequence + slice + array_join) vs the
    DuckDB generate_series/list-slice mirror must produce identical
    DISTINCT shingle multisets — short docs (t < n yields ONE short
    shingle), empty strings, and exotic whitespace included."""
    from hadoop_sync_spark.functions.text import shingles_of_tokens

    sdf, con = frames
    toks_df = sdf.select(
        "doc_id", tokens(normalize(F.col("text"))).alias("tok")
    )
    got = _rows(
        toks_df.select(
            "doc_id",
            F.size(
                F.array_distinct(shingles_of_tokens(F.col("tok"), n=3))
            ).cast("long").alias("n_sh"),
            F.md5(
                F.array_join(
                    F.array_sort(
                        F.array_distinct(
                            shingles_of_tokens(F.col("tok"), n=3)
                        )
                    ),
                    "\x01",
                )
            ).alias("sig"),
        )
    )
    want = _sql(
        con,
        f"""
        WITH s AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       generate_series(0, greatest(len(tok) - 3, 0)),
                       i -> array_to_string(tok[i+1 : i+3], ' '))) AS sh
            FROM (SELECT doc_id, {_SQL_NORM_TOKENS} AS tok FROM documents)
        )
        SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_sh,
               md5(array_to_string(list_sort(sh), chr(1))) AS sig
        FROM s
        """,
    )
    assert got == want
