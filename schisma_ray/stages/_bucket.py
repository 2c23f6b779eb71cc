"""Shared type-agnostic key -> hash-bucket helper.

Used by the segmented per-bucket scans in window.py and the
functional-dependency audit in profile.py (ADVICE r3: shared util, not
a cross-module import of a private name).
"""

from __future__ import annotations

import pyarrow as pa


def key_bucket(key, num_buckets: int) -> pa.Array:
    """Type-agnostic hash bucket for a key column — or a list of
    columns for composite keys (int, string, UUID...).

    pandas hash_array works on any dtype (object included), unlike an
    int64 cast which rejects strings and silently *parses* numeric
    strings. Multi-column hashes combine with odd multipliers so
    (a, b) != (b, a). Identical key tuples always co-locate, which is
    all the segmented per-bucket scans need."""
    import numpy as np
    import pandas as pd

    arrays = key if isinstance(key, (list, tuple)) else [key]
    h = np.zeros(len(arrays[0]), np.uint64)
    for i, a in enumerate(arrays):
        h ^= pd.util.hash_array(
            a.to_numpy(zero_copy_only=False)
        ) * np.uint64(2 * i + 1)
    return pa.array((h % np.uint64(num_buckets)).astype(np.int32), pa.int32())
