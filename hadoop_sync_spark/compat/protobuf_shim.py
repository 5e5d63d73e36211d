"""google.protobuf availability shim for ``transformWithStateInPandas``.

Spark 4's arbitrary-stateful-processing API speaks a protobuf protocol
between the Python worker and the JVM state server, so both the driver
AND every Python worker must be able to ``import google.protobuf``.
This container ships no ``protobuf`` wheel (and installing one is out of
scope), but it DOES ship Google's own pure-Python protobuf runtime,
vendored inside the Cloud SDK under the ``cloudsdk.google`` namespace
(``/usr/lib/google-cloud-sdk/lib/third_party``).  Two gaps separate it
from what PySpark's generated protos need:

1. the package answers to ``cloudsdk.google.protobuf``, not
   ``google.protobuf`` — bridged by a one-file ``google`` namespace
   package (``vendor_shims/google/__init__.py``) whose ``__path__``
   points into the Cloud SDK tree.  The vendored modules self-reference
   exclusively via ``cloudsdk.google.protobuf.*`` imports, so loading
   them a second time under ``google.protobuf.*`` names is internally
   consistent (verified by full message round-trips);
2. PySpark's gencode (protoc 6.33) calls
   ``google.protobuf.runtime_version.ValidateProtobufRuntimeVersion``,
   which the 4.23 runtime predates — bridged by registering a no-op
   ``runtime_version`` module.  The version check is the ONLY thing
   missing: the 4.23 runtime builds, serializes, and parses the
   StateMessage descriptors correctly (round-trip tested in
   tests/test_streaming.py before any streaming query runs).

Worker propagation: in local mode the Python workers are forked by the
driver JVM, which inherits the driver process environment — so
:func:`ensure_protobuf` must run (and prepend PYTHONPATH) BEFORE the
first SparkSession is created.  tests/conftest.py does this at import
time.  On a real cluster you would install the protobuf wheel instead;
this shim then short-circuits to a no-op because the plain import
succeeds.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

#: repo-local namespace package that routes ``google`` into the SDK tree
_SHIM_DIR = str(Path(__file__).resolve().parent.parent.parent / "vendor_shims")


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable here and in future Spark
    workers.  Returns True when protobuf is usable (real wheel or shim),
    False when neither exists in this environment."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        pass
    if not os.path.isdir(
        "/usr/lib/google-cloud-sdk/lib/third_party/cloudsdk/google/protobuf"
    ):
        return False
    if _SHIM_DIR not in sys.path:
        sys.path.insert(0, _SHIM_DIR)
    # future Python workers (forked by the not-yet-started driver JVM)
    # inherit PYTHONPATH from this process's environment
    existing = os.environ.get("PYTHONPATH", "")
    parts = existing.split(os.pathsep) if existing else []
    if _SHIM_DIR not in parts:
        os.environ["PYTHONPATH"] = os.pathsep.join([_SHIM_DIR, *parts])
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False
