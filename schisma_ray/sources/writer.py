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
    """Write ``ds`` as hive-partitioned parquet; returns the output dir."""
    out_dir = Path(out_dir)
    ds.write_parquet(
        str(out_dir),
        partition_cols=partition_cols,
        min_rows_per_file=min_rows_per_file,
    )
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
