"""Salted two-phase aggregation for skewed keys.

A plain ``groupby(key)`` sends every row of a hot key to one reducer; a
70%-skewed key (like this table's ``fmt``) serializes the shuffle. The
classic fix (SURVEY.md §4): phase 1 groups by ``(key, salt)`` where
``salt = hash(row) % S`` — splitting each hot key across S reducers —
and phase 2 re-aggregates the S partial rows per key.

``salted_aggregate`` supports the decomposable aggregations (count, sum,
min, max, mean via sum+count). Phase 1 additionally pre-combines inside
each batch with Arrow ``group_by`` (combiner), so the shuffle carries at
most ``distinct_keys x S x batches`` rows regardless of skew.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_PHASE2 = {
    "count": "sum",
    "sum": "sum",
    "min": "min",
    "max": "max",
}


def salted_aggregate(
    ds,
    key: str,
    aggs: dict[str, tuple[str, str]],
    *,
    num_salts: int = 16,
    seed: int = 11,
):
    """Grouped aggregation with salt-split hot keys.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {count, sum, min, max, mean}. Returns a Dataset with columns
    ``[key, *aggs]``.
    """
    # unique partial stats needed across all requested outputs
    needed: set[tuple[str, str]] = set()
    for out, (col, fn) in aggs.items():
        if fn == "mean":
            needed.add((col, "sum"))
            needed.add((col, "count"))
        else:
            needed.add((col, fn))
    phase1_aggs = sorted(needed)
    rename_1 = {f"{col}_{fn}": f"__p_{col}_{fn}" for col, fn in phase1_aggs}

    rng_seed = np.uint64(seed)

    def phase1(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        # deterministic per-row salt (row content independent — only its
        # position within the batch matters for splitting)
        salt = (np.arange(n, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                + rng_seed) % np.uint64(num_salts)
        t = batch.append_column("__salt", pa.array(salt.astype(np.int32)))
        grouped = t.group_by([key, "__salt"]).aggregate(phase1_aggs)
        cols = {}
        for name in grouped.schema.names:
            if name in (key, "__salt"):
                cols[name] = grouped[name]
            else:
                cols[rename_1.get(name, name)] = grouped[name]
        return pa.table(cols)

    partials = ds.map_batches(phase1, batch_format="pyarrow", zero_copy_batch=True)

    # phase 2: merge the partial stats by key alone (salt collapsed)
    from ray.data.aggregate import Max, Min, Sum

    merge_fn = {"sum": Sum, "count": Sum, "min": Min, "max": Max}
    ray_aggs = [
        merge_fn[fn](f"__p_{col}_{fn}", alias_name=f"__p_{col}_{fn}")
        for col, fn in phase1_aggs
    ]
    result = partials.groupby(key).aggregate(*ray_aggs)

    def finalize(t: pa.Table) -> pa.Table:
        cols = {key: t[key]}
        for out, (col, fn) in aggs.items():
            if fn == "mean":
                cols[out] = pc.divide(
                    pc.cast(t[f"__p_{col}_sum"], pa.float64()),
                    pc.cast(t[f"__p_{col}_count"], pa.float64()),
                )
            else:
                cols[out] = t[f"__p_{col}_{fn}"]
        return pa.table(cols)

    return result.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)
