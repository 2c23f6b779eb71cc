"""Single implementation of the bounded driver fold.

Several operators end with a deliberately SMALL driver-resident result
(local top-k rows per block, distinct-id arrays, non-keeper label ids,
|terms|-row partials). They all fold the same way; keeping one
implementation stops the copies from drifting and gives tests a single
place to reason about. Never use this on anything O(rows-of-corpus) —
the Dataset paths exist for that.
"""

from __future__ import annotations

import pyarrow as pa


def fold_table(ds) -> pa.Table | None:
    """Collect a (bounded) Dataset to one pa.Table; None when empty."""
    parts = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=None)
    ]
    parts = [t for t in parts if t.num_rows]
    return pa.concat_tables(parts) if parts else None
