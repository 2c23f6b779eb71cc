"""Co-located (bucketed) joins: pre-partition both tables ONCE by the
same key hash, then join bucket-by-bucket with ZERO shuffle at join
time.

This is the "pick ONE partitioning key and reuse it" doctrine
(DESIGN.md shuffle policy) as working code: at 100 TB a fact table is
joined on its primary key dozens of times; paying one bucketed write
amortizes every later join into an embarrassingly-parallel per-bucket
merge — no all-to-all exchange, no join-time skew surprises (the hash
pre-balanced the buckets), and a failed join retries per bucket.

The per-bucket join runs as raw Ray tasks by necessity: Ray Data's
``Dataset.join`` always plans a hash shuffle — the Dataset API cannot
express "these two directories are ALREADY co-partitioned" (the
documented escape hatch for raw tasks: semantics the Dataset API can't
reach). Bucket assignment is ``md5_u32(key) % num_buckets`` — the
engine's one hashing convention, shared with split/sample keys.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray


def bucket_write(ds, key: str, out_dir: str, *, num_buckets: int = 16):
    """Write ``ds`` as hive-partitioned parquet under
    ``out_dir/bucket=<b>/`` with ``b = md5_u32(key) % num_buckets``.
    One streaming pass; blocks append to their bucket files via Ray
    Data's partitioned writer, so nothing materializes."""
    from ._digest import md5_u32

    def tag(t: pa.Table) -> pa.Table:
        u = md5_u32(t[key].combine_chunks())
        return t.append_column(
            "bucket", pa.array(u % num_buckets, pa.int64()))

    ds.map_batches(tag, batch_format="pyarrow",
                   zero_copy_batch=True).write_parquet(
        out_dir, partition_cols=["bucket"])
    return out_dir


@ray.remote
def _join_bucket(dir_a: str, dir_b: str, on: str, right_on: str,
                 b: int) -> pa.Table:
    import pyarrow.dataset as pads

    ta = pads.dataset(str(Path(dir_a) / f"bucket={b}")).to_table()
    tb = pads.dataset(str(Path(dir_b) / f"bucket={b}")).to_table()
    out = ta.join(tb, keys=[on], right_keys=[right_on],
                  join_type="inner")
    drop = [c for c in out.column_names if c == "bucket"]
    return out.drop_columns(drop) if drop else out


def bucketed_join(dir_a: str, dir_b: str, *, on: str,
                  right_on: str | None = None, num_buckets: int = 16):
    """Join two bucket_write outputs (SAME key hash, SAME bucket count)
    bucket-by-bucket: one Ray task per bucket, each a local Arrow hash
    join over co-located rows, block refs handed to the Dataset without
    a driver hop. Correct because equal keys hash to equal buckets —
    cross-bucket matches cannot exist by construction. Buckets missing
    on either side (possible when a bucket received no rows) are
    skipped via a metadata-only directory check."""
    import ray.data as rd

    refs = [
        _join_bucket.remote(dir_a, dir_b, on, right_on or on, b)
        for b in range(num_buckets)
        if (Path(dir_a) / f"bucket={b}").exists()
        and (Path(dir_b) / f"bucket={b}").exists()
    ]
    if not refs:
        return rd.from_arrow(pa.schema([]).empty_table())
    return rd.from_arrow_refs(refs)
