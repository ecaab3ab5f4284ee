"""Process-scoped scratch dirs for queries that materialize intermediates.

A handful of gate queries must write real artifacts mid-plan — XES shards,
streaming file sources, checkpoints, index/output partitions — and then
return a DataFrame that reads them back LAZILY. Cleaning up inside the query
would race the driver's later ``collect()``, and never cleaning up (the old
behavior) accumulated dirs in /tmp across every parity and driver invocation.

``scratch_dir`` parks every such dir under one per-process root that is
removed via ``atexit``: the lazy reads stay valid for the whole process
lifetime, and nothing survives the process.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ROOT: str | None = None


def scratch_dir(prefix: str) -> str:
    """A fresh empty directory under the process-scoped scratch root."""
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="meleg_spark_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_ROOT)
