"""hadoop_sync_spark — a PySpark-native analytics engine.

Brand-new engine with the query and data-processing capabilities of the
reference `kavita26/hadoop-sync` (an HDFS→CitusDB metadata synchronizer),
re-expressed Spark-first:

- L1: the reference's own metadata operations (directory scan, diff/anti-join
  sync, min/max stats, transactional catalog publish) → ``registry``.
- L2: the SQL surface the reference exists to enable (full relational queries
  over directory-backed tables with stat-based file pruning) → ``queries``.
- L3: large-scale training-data pipeline operators (dedup, similarity search,
  text analysis, multimodal columns, streaming) → ``functions``/``streaming``.

All execution is the Spark DataFrame/SQL API (Catalyst + Tungsten); Python
UDFs appear only where built-ins cannot express the semantics, and then only
as Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"

from hadoop_sync_spark.session import get_spark  # noqa: F401
from hadoop_sync_spark.io import load_table, TABLES  # noqa: F401
