"""Named query corpus registered into :mod:`pandas_aws_spark.registry`.

Each module covers one slice of SURVEY.md §2's operator inventory plus
the north-star extension operators. Import via ``registry.load_registry()``.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_SCRATCH_DIRS: list[str] = []


@atexit.register
def _cleanup_scratch_dirs() -> None:
    for d in _SCRATCH_DIRS:
        shutil.rmtree(d, ignore_errors=True)


def scratch_dir(prefix: str) -> str:
    """mkdtemp that is removed at interpreter exit (r7 ADVICE: the
    roundtrip/index entries leaked one directory per run). Cleanup must
    be deferred to process end — the returned DataFrames hold LAZY
    scans over these paths, materialized by the driver at an arbitrary
    later point in the same process. Driver-local paths are correct on
    local-mode clusters only; distributed deployments pass an object-
    store URI to the underlying writer APIs instead of using these
    self-contained demo entries."""
    d = tempfile.mkdtemp(prefix=prefix)
    _SCRATCH_DIRS.append(d)
    return d
