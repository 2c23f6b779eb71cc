"""Per-partition checkpoint/lineage records and resumable runs.

"Resumable from checkpoint with per-partition lineage + metrics"
(BASELINE.json north_rule): a run over a fragmented table commits one
record per partition:

    {out_dir}/_commits/{partition_id}.json
      {"partition_id", "inputs": [fragment paths], "schema_version",
       "row_count", "violation_counts": {code: n}, "duration_s",
       "engine_version"}

and writes that partition's outputs under ``{out_dir}/{partition_id}/``.
Records are written atomically (tmp file + rename) AFTER the partition's
parquet output is fully written, so a killed run never leaves a commit
without its data; on resume, committed partitions are skipped and the
rest re-run idempotently (same inputs -> same outputs).

Two further guarantees:

* **no stale partials** — partition output is written to a
  ``.inprogress`` temp dir and renamed into place; any leftover temp or
  uncommitted output directory from a crashed attempt is deleted before
  the re-run, so a crash between ``write_parquet`` and the commit never
  double-counts rows on resume.
* **content-addressed identity** — the partition id embeds a hash of
  its input file list (``part-{idx}-{hash}``), so a commit can never be
  silently reused for a *different* input group (files added/removed,
  ``files_per_partition`` changed). A committed index whose input hash
  no longer matches the recomputed assignment raises instead of
  skipping or re-running against the wrong lineage record.

The partition unit is a group of input files (parquet fragments) — the
same unit a multi-node run would assign to workers, so resume behavior
is identical at 100 TB; only the fragment count grows.
"""

from __future__ import annotations

import json
import os
import time
from collections import Counter
from pathlib import Path
from typing import Callable

import ray.data as rd

from .. import __version__

SCHEMA_VERSION = 1


def partition_inputs(table_dir: str | Path, files_per_partition: int = 4,
                     subdir: str = "images") -> list[list[str]]:
    """Group a table's parquet fragments into partition input lists.
    ``subdir=""`` partitions the directory itself (text corpora);
    the default matches the image-table layout."""
    root = Path(table_dir) / subdir if subdir else Path(table_dir)
    files = sorted(str(p) for p in root.glob("*.parquet"))
    return [
        files[i : i + files_per_partition]
        for i in range(0, len(files), files_per_partition)
    ]


def _inputs_hash(inputs: list[str]) -> str:
    import hashlib

    return hashlib.blake2b("\n".join(inputs).encode(), digest_size=4).hexdigest()


def partition_id(idx: int, inputs: list[str]) -> str:
    return f"part-{idx:05d}-{_inputs_hash(inputs)}"


def _commit_path(out_dir: Path, pid: str) -> Path:
    return out_dir / "_commits" / f"{pid}.json"


def committed_partitions(out_dir: str | Path) -> set[str]:
    d = Path(out_dir) / "_commits"
    if not d.exists():
        return set()
    return {p.stem for p in d.glob("*.json")}


def run_resumable(
    table_dir: str | Path,
    out_dir: str | Path,
    pipeline: Callable[[rd.Dataset], rd.Dataset],
    *,
    files_per_partition: int = 4,
    max_partitions: int | None = None,
) -> list[dict]:
    """Run ``pipeline`` per input partition, committing lineage records.

    ``pipeline`` maps a Dataset of input rows to a Dataset of violation
    rows. Returns the commit records of this invocation (already-
    committed partitions are skipped). ``max_partitions`` lets tests
    simulate a crash mid-run.
    """
    import shutil

    out_dir = Path(out_dir)
    (out_dir / "_commits").mkdir(parents=True, exist_ok=True)
    done = committed_partitions(out_dir)
    records = []
    ran = 0
    for idx, inputs in enumerate(partition_inputs(table_dir, files_per_partition)):
        pid = partition_id(idx, inputs)
        if pid in done:
            continue
        # a commit for this index with a DIFFERENT input hash means the
        # input assignment changed under the checkpoint (files added or
        # removed, files_per_partition changed) — refuse rather than
        # silently pairing old lineage records with new input groups
        stale = [d for d in done if d.startswith(f"part-{idx:05d}-")]
        if stale:
            raise RuntimeError(
                f"checkpoint mismatch at partition {idx}: committed {stale[0]} "
                f"does not match current inputs (hash {_inputs_hash(inputs)}); "
                "the input assignment changed — use a fresh out_dir"
            )
        if max_partitions is not None and ran >= max_partitions:
            break
        t0 = time.monotonic()
        ds = rd.read_parquet(inputs)
        input_rows = ds.count()  # parquet metadata count (no data read)
        result = pipeline(ds)
        part_dir = out_dir / pid
        # crash hygiene: write to a temp dir and rename into place; clear
        # any leftovers of a previous uncommitted attempt first so a
        # resumed run never appends to (or reads metrics from) stale
        # partial output
        tmp_dir = out_dir / f"{pid}.inprogress"
        for leftover in (tmp_dir, part_dir):
            if leftover.exists():
                shutil.rmtree(leftover)
        result.write_parquet(str(tmp_dir))
        # metrics from the *written* files (column-pruned re-read of just
        # `code`; avoids re-executing the pipeline a second time)
        counts: Counter = Counter()
        rows = 0
        import pyarrow.dataset as pads

        written = pads.dataset(str(tmp_dir), format="parquet")
        if "code" in written.schema.names:
            for frag_batch in written.to_batches(columns=["code"]):
                rows += frag_batch.num_rows
                import pyarrow as pa

                t = (
                    pa.Table.from_batches([frag_batch])
                    .group_by("code")
                    .aggregate([("code", "count")])
                )
                for code, n in zip(
                    t["code"].to_pylist(), t["code_count"].to_pylist()
                ):
                    counts[code] += n
        else:
            rows = written.count_rows()
        record = {
            "partition_id": pid,
            "inputs": inputs,
            "schema_version": SCHEMA_VERSION,
            "engine_version": __version__,
            "input_rows": input_rows,
            "row_count": rows,
            "violation_counts": dict(counts),
            "duration_s": round(time.monotonic() - t0, 3),
        }
        os.rename(tmp_dir, part_dir)  # output visible only when complete
        tmp = _commit_path(out_dir, pid).with_suffix(".tmp")
        tmp.write_text(json.dumps(record, indent=1))
        os.rename(tmp, _commit_path(out_dir, pid))
        records.append(record)
        ran += 1
    return records


def load_records(out_dir: str | Path) -> list[dict]:
    d = Path(out_dir) / "_commits"
    if not d.exists():
        return []
    return [json.loads(p.read_text()) for p in sorted(d.glob("*.json"))]
