"""Equi-join operators (SURVEY.md §2.4 joins/lookups).

The referential anti-join (stages/referential.py) covers the
existence-check direction; this module adds the enrichment direction —
attaching columns of a dimension table to a fact stream:

* ``broadcast_hash_join`` — the small side is ``ray.put`` ONCE as an
  Arrow table and every batch runs a vectorized ``pa.Table.join``
  against it. No shuffle at all; the join cost is a per-batch hash
  probe. The right shape whenever the dimension side fits the object
  store (the common case: dimensions are orders of magnitude smaller
  than facts).
* ``shuffle_hash_join`` — delegates to Ray Data's native hash-shuffle
  ``Dataset.join`` (both sides repartition on the key, per-partition
  hash joins). The fallback when the dimension side outgrows a
  broadcast; ``num_partitions`` is the shuffle width.

Both match ANSI inner/left-outer semantics (duplicate right keys
multiply rows), verified against DuckDB oracles.
"""

from __future__ import annotations

import pyarrow as pa
import ray


def _as_arrow(ref) -> pa.Table | None:
    if isinstance(ref, pa.Table):
        return ref
    if hasattr(ref, "iter_batches"):
        parts = [
            b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
            for b in ref.iter_batches(batch_format="pyarrow", batch_size=None)
        ]
        parts = [t for t in parts if t.num_rows]
        return pa.concat_tables(parts) if parts else None
    raise TypeError(type(ref))


def broadcast_hash_join(ds, ref, on: str, right_on: str | None = None,
                        *, how: str = "inner"):
    """Join ``ds`` (fact Dataset) with ``ref`` (small side: Arrow table
    or Dataset) on an equi-key. ``how``: "inner" or "left outer"."""
    right = _as_arrow(ref)
    right_key = right_on or on
    ref_handle = ray.put(right)

    def fn(batch: pa.Table) -> pa.Table:
        r = ray.get(ref_handle)
        return batch.join(r, keys=on, right_keys=right_key, join_type=how)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def shuffle_hash_join(ds, ref, on: str, right_on: str | None = None,
                      *, how: str = "inner", num_partitions: int = 32):
    """Hash-shuffle equi-join via Ray Data's native ``Dataset.join``."""
    import ray.data as rd

    if not hasattr(ref, "join"):
        ref = rd.from_arrow(ref)
    return ds.join(
        ref,
        join_type=("left_outer" if how == "left outer" else how),
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on or on,),
    )
