"""``google`` namespace shim (see hadoop_sync_spark/compat/protobuf_shim.py).

Routes ``google.protobuf`` to the pure-Python protobuf runtime the Cloud
SDK vendors under ``cloudsdk.google`` in this container, and registers a
no-op ``runtime_version`` module for protoc>=5 gencode (the 4.23 runtime
predates the version handshake but handles the descriptors themselves).
Only ever imported when the real ``protobuf`` wheel is absent — with the
wheel installed this directory is not on sys.path at all.
"""

import os
import sys
import types

_TP = "/usr/lib/google-cloud-sdk/lib/third_party"
if _TP not in sys.path:
    # APPEND, never insert at the front: the SDK tree vendors dozens of
    # packages (six, dateutil, certifi, jsonschema, httplib2, ...) that
    # would otherwise shadow the installed versions process-wide; only
    # the `cloudsdk` namespace actually needs resolving from here, and
    # nothing at site-packages shadows it (ADVICE r7)
    sys.path.append(_TP)

# resolve google.protobuf.* submodules from the SDK tree; the vendored
# modules self-reference via cloudsdk.google.protobuf.*, so double-loading
# under these names stays internally consistent
__path__ = [os.path.join(_TP, "cloudsdk", "google")]

from google import protobuf as _protobuf  # noqa: E402  (self-referential on purpose)

_rv = types.ModuleType("google.protobuf.runtime_version")


class _Domain:
    GOOGLE_INTERNAL = 1
    PUBLIC = 2


_rv.Domain = _Domain
_rv.ValidateProtobufRuntimeVersion = lambda *args, **kwargs: None
sys.modules["google.protobuf.runtime_version"] = _rv
_protobuf.runtime_version = _rv
