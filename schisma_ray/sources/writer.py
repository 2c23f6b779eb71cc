"""Partitioned parquet sink (SURVEY.md §2.4 sinks; north_rule resumable
output): hive-partitioned directories (one per key value) so downstream
readers prune by partition and a re-run can target only affected
partitions — never one giant file. For input-fragment-aligned resume
with lineage records, use state/checkpoint.run_resumable instead; this
writer is for KEY-partitioned outputs (per-language corpora, per-format
image shards, per-day event outputs).
"""

from __future__ import annotations

from pathlib import Path


def write_partitioned(ds, out_dir: str | Path, *, partition_cols: list[str],
                      min_rows_per_file: int | None = None) -> Path:
    """Write ``ds`` as hive-partitioned parquet; returns the output dir.

    Data lands in ``{out_dir}.inprogress`` and is renamed into place
    with a ``_MANIFEST.json`` of partition directories — readers never
    observe a HALF-WRITTEN output (out_dir always holds a complete
    dataset when present; it is briefly absent during the two-rename
    swap, which POSIX cannot make atomic for directories), a crash at
    any point is recovered losslessly on the next call, and a crashed
    attempt's temp dir is replaced on retry (same contract as
    state/checkpoint).
    """
    import json
    import os
    import shutil

    out_dir = Path(out_dir)
    tmp = out_dir.with_name(out_dir.name + ".inprogress")
    old = out_dir.with_name(out_dir.name + ".replaced")
    # crash recovery: a previous attempt that died between the two
    # renames leaves the only good copy at .replaced with out_dir
    # absent — restore it BEFORE clearing stale state, so the prior
    # output is never lost
    if old.exists() and not out_dir.exists():
        os.rename(old, out_dir)
    for stale in (tmp, old):
        if stale.exists():
            shutil.rmtree(stale)
    ds.write_parquet(
        str(tmp),
        partition_cols=partition_cols,
        min_rows_per_file=min_rows_per_file,
    )
    parts = sorted(
        str(d.relative_to(tmp)) for d in {f.parent for f in tmp.rglob("*.parquet")}
    )
    (tmp / "_MANIFEST.json").write_text(
        json.dumps({"partition_cols": partition_cols, "partitions": parts}, indent=1)
    )
    # replacement: move the previous output ASIDE (rename, atomic), move
    # the new one in, THEN delete the old copy. POSIX cannot swap two
    # directories atomically, so out_dir is absent for the instant
    # between the renames; a crash there is recovered losslessly by the
    # restore-from-.replaced step above on the next call, and at every
    # other point a complete dataset sits at out_dir
    if out_dir.exists():
        os.rename(out_dir, old)
    os.rename(tmp, out_dir)
    if old.exists():
        shutil.rmtree(old)
    return out_dir


def read_partitioned(path: str | Path, *, columns: list[str] | None = None,
                     partition_filter: dict[str, str] | None = None):
    """Read a hive-partitioned dataset back; ``partition_filter`` prunes
    whole directories before any file IO (pushed into the parquet
    fragment listing)."""
    import ray.data as rd
    from ray.data.datasource.partitioning import Partitioning

    base = Path(path)
    if partition_filter:
        # prune whole DIRECTORIES by hive path segments before any file
        # IO (a filter expression would still list and sample fragments)
        def matches(d: Path) -> bool:
            segs = dict(
                seg.split("=", 1) for seg in d.relative_to(base).parts if "=" in seg
            )
            return all(segs.get(k) == str(v) for k, v in partition_filter.items())

        leaf_dirs = sorted({f.parent for f in base.rglob("*.parquet")})
        chosen = [str(d) for d in leaf_dirs if matches(d)]
        return rd.read_parquet(
            chosen, columns=columns,
            partitioning=Partitioning("hive", base_dir=str(base)),
        )
    return rd.read_parquet(str(base), columns=columns,
                           partitioning=Partitioning("hive"))


def write_table(ds, out: str, *, fmt: str | None = None):
    """Format-dispatched sink: ``parquet`` (default), ``jsonl``/``json``
    or ``csv``, inferred from ``fmt`` or the output path suffix — the
    write half of ``reader.read_table`` (parquet <-> jsonl <-> csv
    conversion for raw drops / downstream consumers). Streaming
    Dataset writes; one file per block."""
    from pathlib import Path

    suffix = (fmt or Path(out).suffix.lstrip(".") or "parquet").lower()
    if suffix in ("jsonl", "json"):
        ds.write_json(out)
    elif suffix == "csv":
        ds.write_csv(out)
    elif suffix == "parquet":
        ds.write_parquet(out)
    else:
        raise ValueError(f"unknown output format {suffix!r}")
