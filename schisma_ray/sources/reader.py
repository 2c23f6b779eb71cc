"""Table readers: Lance-first with parquet fallback.

The north-star input is a Lance table of image+caption pairs
(BASELINE.json input_hint). The ``lance`` package is not installed in
this sandbox, so ``read_table`` prefers ``ray.data.read_lance`` when the
dependency (and a ``.lance`` dataset) is present and otherwise reads the
same schema from parquet fragments — callers are agnostic.
"""

from __future__ import annotations

from pathlib import Path

import ray.data as rd

try:  # pragma: no cover - lance not present in this container
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_table(path: str | Path, columns: list[str] | None = None,
               override_num_blocks: int | None = None):
    """Read a dataset directory: `.lance` via read_lance when available,
    else parquet fragments (one block per file unless overridden)."""
    path = Path(path)
    if HAVE_LANCE and (path.suffix == ".lance" or (path / "_versions").exists()):
        return rd.read_lance(str(path), columns=columns)  # pragma: no cover
    if path.is_dir():
        files = sorted(str(p) for p in path.glob("*.parquet"))
        if files:
            return rd.read_parquet(
                files,
                columns=columns,
                override_num_blocks=override_num_blocks or len(files),
            )
    return rd.read_parquet(str(path), columns=columns,
                           override_num_blocks=override_num_blocks)
