"""Query registry: the engine's judgeable surface (SURVEY.md §2B/§2C).

Every capability the engine claims is declared here as a named :class:`Query`
pairing a Spark DataFrame implementation with (where SQL can express it) an
equivalent ANSI-SQL oracle string for DuckDB.  ``__spark_entry__.py`` exposes
this registry to the driver verbatim.

Exact-parity discipline (so the driver's value-hash matches bit-for-bit):

- SUM/AVG over 2-decimal double columns goes through the scaled-BIGINT
  idiom (``SUM(CAST(ROUND(x*100) AS BIGINT))``, see ``_util.py``) — integer
  aggregation is *exact* in both Spark and DuckDB, so reduction order cannot
  perturb low-order float bits, and long sums stay inside whole-stage
  codegen (5× faster than Decimal128 aggregation on the flagship query).
- AVG is always spelled ``CAST(sum AS DOUBLE) / 100.0 / count`` on both
  sides: identical scalar inputs → identical IEEE results.
- Integer-typed derivations (year(), counts, datediff) are cast to BIGINT on
  both sides (Spark would give INT, DuckDB BIGINT).
- Every computed column is aliased identically in Spark and SQL.
- LIMIT appears only under a total ordering (explicit tiebreaker keys).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""
    bench: bool = False  # include in bench.py headline set
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    bench: bool = False,
    tags: tuple[str, ...] = (),
):
    """Decorator registering a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(
            name=name,
            fn=fn,
            oracle=oracle,
            doc=(fn.__doc__ or "").strip(),
            bench=bench,
            tags=tags,
        )
        return fn

    return deco


_LOADED = False


def load_all() -> dict[str, Query]:
    """Import every query module (idempotent) and return the registry."""
    global _LOADED
    if not _LOADED:
        from hadoop_sync_spark.queries import (  # noqa: F401
            relational,
            relational2,
            relational3,
            events,
            text,
            dedup,
            sampling,
            vectors,
            registry_ops,
            multimodal_q,
        )

        _LOADED = True
    return REGISTRY


def queries_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in load_all().items()}


def oracle_map() -> dict[str, str]:
    return {name: q.oracle for name, q in load_all().items() if q.oracle}
