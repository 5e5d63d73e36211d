"""Z-order (Morton) clustering for multi-column file skipping.

A table sorted by one column prunes scans on that column only; a z-order
curve interleaves the bits of several columns' rank-space buckets so that
files covering contiguous z-ranges are small hyper-rectangles in the
original column space — parquet footer min/max then skips files/row-groups
for predicates on ANY clustered column (the technique behind Delta's
OPTIMIZE ZORDER BY and Iceberg's sort-order z-curve; public literature:
Morton 1966, Bayer's UB-tree).

Pipeline: per-column approximate quantile boundaries (one sample-based
pass) → per-row bucket id via a literal-array rank lookup (JVM builtin
`filter`/`size`, codegen'd, no Python) → bit interleave (static
shift/and/or expression tree) → `repartitionByRange` + in-file sort on the
z-value.  Everything after the quantile pass is a narrow per-row
expression; the only wide stage is the range partitioning any clustered
write needs.

Scale: boundary collection is Spark's reservoir-backed approxQuantile on
a sample (O(rows) scan, tiny result); the z-value fits a BIGINT up to
63 interleaved bits (e.g. 4 columns × 15 bits).  Skewed columns get
quantile (equi-depth) buckets, so a hot key range does not collapse the
curve the way equal-width bucketing would.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: default bits per clustered column (256 equi-depth buckets each)
DEFAULT_BITS = 8


def _bucket_expr(col: Column, boundaries: list[float]) -> Column:
    """Equi-depth bucket id of `col` in [0, len(boundaries)]: the number
    of boundaries strictly below the value — a rank lookup against a
    literal sorted array, evaluated JVM-side per row.  Nulls sort to
    bucket 0 (they carry no skipping information either way)."""
    lit = F.array(*[F.lit(float(b)) for b in boundaries])
    cnt = F.size(F.filter(lit, lambda b: b < col.cast("double")))
    return F.when(col.isNull(), F.lit(0)).otherwise(cnt).cast("long")


def _interleave(buckets: list[Column], bits: int) -> Column:
    """Morton-interleave k bucket ids: bit j of column c lands at curve
    position j*k + c.  Static expression tree of shift/and/or ops —
    whole-stage-codegen friendly, no UDF."""
    k = len(buckets)
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds a signed BIGINT")
    z = F.lit(0).cast("long")
    for c, b in enumerate(buckets):
        for j in range(bits):
            bit = F.shiftright(b, j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * k + c))
    return z


def zorder_value(
    df: DataFrame,
    cols: list[str],
    bits: int = DEFAULT_BITS,
    relative_error: float = 0.01,
) -> Column:
    """Z-value column for `df` over `cols`: collects per-column equi-depth
    boundaries (2^bits buckets) with approxQuantile, then interleaves."""
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    buckets = []
    for c in cols:
        bnds = df.approxQuantile(c, probs, relative_error)
        # dedupe (heavy hitters repeat a boundary; rank lookup needs
        # strictly increasing values to stay monotonic)
        uniq: list[float] = []
        for b in bnds:
            if not uniq or b > uniq[-1]:
                uniq.append(b)
        buckets.append(_bucket_expr(F.col(c), uniq))
    return _interleave(buckets, bits)


def write_zordered(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int,
    bits: int = DEFAULT_BITS,
    mode: str = "overwrite",
) -> None:
    """Write `df` as `n_files` parquet files clustered on the z-curve of
    `cols`: range-partition by z-value (each file = one contiguous
    z-range = one small hyper-rectangle per column) and sort within files
    so row-group stats are tight too."""
    z = zorder_value(df, cols, bits=bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
