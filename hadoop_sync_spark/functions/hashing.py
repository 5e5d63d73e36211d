"""Hash-family machinery for near-duplicate detection: MinHash, SimHash.

All JVM-side builtins (xxhash64, higher-order array lambdas) — no Python in
the per-row path.  Long arithmetic deliberately exploits Java's wrapping
overflow (deterministic, fine for hashing).

MinHash background: Broder, "On the resemblance and containment of
documents" (1997); banding/LSH analysis per Leskovec-Rajaraman-Ullman,
*Mining of Massive Datasets* ch.3 (public course text).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# deterministic odd multipliers/offsets for the permutation family
# h_i(x) = a_i * x + b_i  (mod 2^64, wrapping) — standard multiply-shift family
_MASK = (1 << 63) - 1


def _perm_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    """k (a, b) pairs derived from a splitmix64-style recurrence — pure
    Python ints, computed once on the driver."""
    params = []
    state = seed & 0xFFFFFFFFFFFFFFFF
    for _ in range(k):
        state = (state + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = state
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        a = (z | 1) & 0xFFFFFFFFFFFFFFFF  # odd → bijective mod 2^64
        state = (state + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        b = state
        params.append((_signed(a), _signed(b)))
    return params


def _signed(u: int) -> int:
    """Unsigned 64-bit → Java signed long (two's complement)."""
    return u - (1 << 64) if u >= (1 << 63) else u


def minhash_signature(items: Column, k: int = 32, seed: int = 42) -> Column:
    """MinHash signature (array<bigint>, length k) of an array<string>.

    One pass, no explode/shuffle: fold the item array once, keeping the
    element-wise minimum of the k permuted hashes.  Empty arrays yield the
    max-long sentinel signature (never collides with real content).
    """
    params = _perm_params(k, seed)
    init = F.array(*[F.lit(0x7FFFFFFFFFFFFFFF).cast("long") for _ in range(k)])

    def step(acc: Column, x: Column) -> Column:
        h = F.xxhash64(x)
        hashes = F.array(
            *[
                (F.lit(a).cast("long") * h + F.lit(b).cast("long"))
                .bitwiseAND(F.lit(_MASK).cast("long"))
                for a, b in params
            ]
        )
        return F.zip_with(acc, hashes, lambda m, v: F.least(m, v))

    return F.aggregate(items, init, step)


def lsh_band_keys(signature: Column, bands: int, rows: int) -> Column:
    """Band the signature for LSH: array of `bands` hashes, one per band of
    `rows` signature slots.  Two docs collide in a band iff that band of
    their signatures is identical — the classic (b, r) S-curve."""
    return F.array(
        *[
            F.xxhash64(
                F.lit(band), F.array_join(F.slice(signature, band * rows + 1, rows), ",")
            )
            for band in range(bands)
        ]
    )


def simhash64(items: Column) -> Column:
    """64-bit SimHash (Charikar 2002) of an array<string> → BIGINT.

    Single fold: accumulate a 64-slot counter array (+1/−1 per bit of each
    item's xxhash64), then assemble the sign bits.  No explode, no shuffle,
    no UDF — safe to run on every document of a 100 TB corpus.
    """
    init = F.array(*[F.lit(0).cast("long") for _ in range(64)])

    def step(acc: Column, x: Column) -> Column:
        h = F.xxhash64(x)
        # shift amounts must be Python ints in PySpark → unroll driver-side
        bits = F.array(
            *[
                F.shiftright(h, j).bitwiseAND(F.lit(1).cast("long")) * 2 - 1
                for j in range(64)
            ]
        )
        return F.zip_with(acc, bits, lambda a, b: a + b)

    counts = F.aggregate(items, init, step)
    out = F.lit(0).cast("long")
    for j in range(64):
        out = out.bitwiseOR(
            F.when(
                F.element_at(counts, j + 1) > 0,
                F.lit(_signed(1 << j)).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        )
    return out


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit SimHashes (BIGINT)."""
    return F.bit_count(a.bitwiseXOR(b)).cast("long")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    items_col: str,
    k: int = 32,
    bands: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash-LSH banding.

    Pipeline: signature (narrow) → explode band keys → self-join on
    (band, key) → distinct ordered pairs with estimated Jaccard from full
    signature agreement.

    Scale: the only shuffle is the band-bucket self-join, keyed on band
    hash — exactly the "join only within buckets" trick that turns O(n²)
    pair generation into O(n·b + collisions).  Skewed mega-buckets (e.g.
    empty-doc signatures) should be salted or capped upstream.
    """
    rows = k // bands
    sig = df.select(
        F.col(id_col).alias("_id"),
        minhash_signature(F.col(items_col), k=k, seed=seed).alias("_sig"),
    )
    banded = sig.select(
        "_id",
        "_sig",
        F.posexplode(lsh_band_keys(F.col("_sig"), bands, rows)).alias(
            "_band", "_bkey"
        ),
    )
    left = banded.select(
        F.col("_id").alias("id_a"), F.col("_sig").alias("sig_a"), "_band", "_bkey"
    )
    right = banded.select(
        F.col("_id").alias("id_b"), F.col("_sig").alias("sig_b"), "_band", "_bkey"
    )
    pairs = (
        left.join(right, ["_band", "_bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
    )
    est = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda a, b: a == b),
            lambda x: x,
        )
    ).cast("double") / F.lit(float(k))
    return pairs.select("id_a", "id_b", est.alias("est_jaccard"))
