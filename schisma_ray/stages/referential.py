"""Referential integrity: anti-join of a key column against a reference
id set -> ``invalid`` violations for orphans.

Two strategies (SURVEY.md §2 joins/lookups):

* ``broadcast`` (default) — the reference side is ``ray.put`` once and
  each batch filters with a vectorized ``is_in``; no shuffle at all.
  Right whenever the id set fits comfortably in the object store (a
  10^9-id string set is a few tens of GB — prefer the shuffle path
  beyond that).
* ``shuffle`` — both sides get a ``bucket = hash(key) % B`` column, are
  unioned with a side tag, grouped by bucket, and each bucket performs
  a local Arrow anti-join inside ``map_groups``. One all-to-all over
  (key, tag) pairs only — bytes-light even at 10^12 rows.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..sources.image_table import VIOLATION_SCHEMA


def _violation_table(ids: pa.Array, column: str) -> pa.Table:
    n = len(ids)
    return pa.Table.from_arrays(
        [
            pc.cast(ids, pa.string()),
            pa.array([column] * n, pa.string()),
            pa.array(["invalid"] * n, pa.string()),
            pa.array([f"known {column}"] * n, pa.string()),
            pc.cast(ids, pa.string()),
            pa.array([None] * n, pa.string()),
            pa.array(["referential"] * n, pa.string()),
        ],
        schema=VIOLATION_SCHEMA,
    )


def referential_violations(
    ds,
    column: str,
    reference_ids,
    *,
    strategy: str = "broadcast",
    num_buckets: int = 64,
):
    """`reference_ids`: pa.Table/Array of valid ids, or a Dataset of them."""
    if strategy == "broadcast":
        if hasattr(reference_ids, "to_pandas") and not isinstance(
            reference_ids, (pa.Table, pa.Array, pa.ChunkedArray)
        ):
            reference_ids = pa.Table.from_pandas(reference_ids.to_pandas())
        if isinstance(reference_ids, pa.Table):
            reference_ids = reference_ids.column(0).combine_chunks()
        ref = ray.put(reference_ids)

        def emit(batch: pa.Table) -> pa.Table:
            keys = ray.get(ref)
            col = batch[column].combine_chunks()
            known = pc.fill_null(pc.is_in(col, value_set=keys), False)
            present = pc.is_valid(col)
            orphan = pc.and_(pc.invert(known), present)
            hit = batch.filter(orphan)
            if hit.num_rows == 0:
                return VIOLATION_SCHEMA.empty_table()
            return _violation_table(hit[column].combine_chunks(), column)

        return ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)

    if strategy == "shuffle":
        import ray.data as rd

        def tag(side: str):
            def fn(batch: pa.Table) -> pa.Table:
                col = pc.cast(batch[column].combine_chunks(), pa.string())
                bucket = pc.bit_wise_and(pc.hash_64(col) if hasattr(pc, "hash_64") else _hash64(col), num_buckets - 1)
                return pa.table(
                    {"key": col, "side": pa.array([side] * len(col)), "bucket": pc.cast(bucket, pa.int32())}
                )

            return fn

        fact = ds.map_batches(tag("fact"), batch_format="pyarrow")
        if not hasattr(reference_ids, "map_batches"):
            tbl = reference_ids if isinstance(reference_ids, pa.Table) else pa.table({column: reference_ids})
            reference_ids = rd.from_arrow(tbl)
        ref = reference_ids.map_batches(tag("ref"), batch_format="pyarrow")

        def anti(group: pa.Table) -> pa.Table:
            sides = group["side"]
            has_ref = pc.any(pc.equal(sides, "ref")).as_py()
            if has_ref:
                return VIOLATION_SCHEMA.empty_table()
            facts = group.filter(pc.equal(sides, "fact"))
            if facts.num_rows == 0:
                return VIOLATION_SCHEMA.empty_table()
            return _violation_table(facts["key"].combine_chunks(), column)

        return fact.union(ref).groupby("key").map_groups(anti, batch_format="pyarrow")

    raise ValueError(f"unknown strategy {strategy!r}")


def _hash64(col: pa.Array) -> pa.Array:
    import numpy as np
    import pandas as pd

    h = pd.util.hash_array(col.to_numpy(zero_copy_only=False)).astype(np.int64)
    return pa.array(np.abs(h))
