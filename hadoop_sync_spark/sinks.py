"""Source/sink surface beyond the parquet table model: CSV, JSON, ORC,
and partitioned/bucketed parquet writes.

The reference's only "sink" is the Citus catalog plus raw HDFS block files
(``README.md:4-8``); its only "source" is an HDFS directory per table
(``HdfsSynchronizer.java:29-34``).  A Spark-native engine generalizes both
ends: any Spark file source can back a registered table, and query results
land back on the filesystem in any of them.  Schema stays fixed and
external on read (explicit ``StructType``, mirroring the reference's
master-catalog-is-truth DDL model, ``CitusMasterNode.java:195-215``) — CSV
and JSON never run schema inference, which at 100 TB would mean an extra
full pass over the data.

Scale notes baked into the API:

- ``partition_by`` produces hive-style ``key=value`` directories so reads
  with a predicate on the partition key prune *directories* before any
  file is opened (PartitionFilters — the coarse-grained twin of the
  registry's min/max file pruning, SURVEY §4.1).
- Writers default to snappy parquet; CSV/JSON exist for interchange, not
  for the hot path (row formats forfeit column pruning and footer stats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession
from pyspark.sql.types import StructType

#: formats the engine will read/write; all ship inside vanilla Spark.
FORMATS: tuple[str, ...] = ("parquet", "orc", "csv", "json")

#: CSV NULL marker.  Spark's CSV layer compares values against nullValue
#: AFTER unquoting, so NULL and a data string equal to the marker are
#: fundamentally indistinguishable in the file (quoteAll doesn't help —
#: the writer quotes the marker too; verified empirically).  A marker
#: framed by NUL bytes makes that collision impossible for any real text
#: (strings containing U+0000 don't survive most text pipelines anyway);
#: the residual corruption case is data exactly equal to this 3-char
#: sequence.  The common markers ('', '\\N', 'NULL') all collide with
#: strings that genuinely occur in corpora.
CSV_NULL_MARKER = "\x00N\x00"


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
    compression: str | None = None,
) -> None:
    """Write a DataFrame to `path` in any supported format.

    ``mode="overwrite"`` keeps registration idempotent, the engine-wide
    analogue of the reference's DROP-IF-EXISTS-then-create idiom
    (``CitusWorkerNode.java:119-134``)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported sink format {fmt!r}; one of {FORMATS}")
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if compression:
        w = w.option("compression", compression)
    if fmt == "csv":
        # Lossless-CSV contract (verified by the adversarial round-trip
        # test): self-describing header; quote-escape so embedded
        # delimiters/quotes/newlines survive; distinct NULL vs empty-string
        # markers; and NO whitespace trimming — Spark's CSV writer trims
        # leading/trailing whitespace by default, which is silent data loss.
        w = (
            w.option("header", "true")
            .option("escape", '"')
            .option("nullValue", CSV_NULL_MARKER)
            .option("emptyValue", '""')
            .option("ignoreLeadingWhiteSpace", "false")
            .option("ignoreTrailingWhiteSpace", "false")
        )
    getattr(w, fmt)(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
) -> DataFrame:
    """Read a table from `path` in any supported format.

    For CSV/JSON a schema is REQUIRED: inference costs a full extra scan
    at 100 TB and can drift between runs — the registry, not the data, is
    the source of truth for types (reference: DDL events replayed from the
    master catalog, never inferred from block contents)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported source format {fmt!r}; one of {FORMATS}")
    r: DataFrameReader = spark.read
    if fmt in ("csv", "json"):
        if schema is None:
            raise ValueError(f"{fmt} sources require an explicit schema")
        r = r.schema(schema)
        if fmt == "csv":
            # mirror of write_table's lossless-CSV contract
            r = (
                r.option("header", "true")
                .option("escape", '"')
                .option("multiLine", "true")
                .option("nullValue", CSV_NULL_MARKER)
            )
    elif schema is not None:
        r = r.schema(schema)
    return getattr(r, fmt)(path)
