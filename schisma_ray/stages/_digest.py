"""Shared batched md5 digests for the md5-keyed sampling stages.

md5 is the one hash both sides of every oracle share (DuckDB's
``md5()``), so it is load-bearing for determinism and parity — but
``hashlib.md5`` per row was the last per-row Python in hot per-batch
partials (VERDICT r3 #5). This module computes the digests through
DuckDB's vectorized C++ ``md5()`` — the very engine the oracles run
on, so parity is by construction — with the hashlib loop kept as a
fallback. Values are stringified exactly like ``str(v)`` (Arrow cast
for ints/strings; nulls become the literal ``"None"`` to match the
historical hashlib path).
"""

from __future__ import annotations

import hashlib
import threading

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_LOCAL = threading.local()


def _connection():
    con = getattr(_LOCAL, "con", None)
    if con is None:
        import duckdb

        con = duckdb.connect()
        _LOCAL.con = con
    return con


def _stringify(values) -> pa.Array:
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if not isinstance(values, pa.Array):
        # plain Python sequences (tests, small driver sides) can be
        # mixed-type or exceed int64 — stringify per value, exactly
        # like the historical hashlib path did
        return pa.array(
            ["None" if v is None else str(v) for v in values], pa.string()
        )
    return pc.fill_null(pc.cast(values, pa.string()), "None")


def md5_hex(values) -> np.ndarray:
    """Per-value 32-char md5 hex digests of str(value), as a numpy
    object array (order-preserving)."""
    s = _stringify(values)
    if len(s) == 0:
        return np.empty(0, dtype=object)
    try:
        con = _connection()
        t = pa.table({"v": s})
        con.register("_digest_t", t)
        out = con.execute("SELECT md5(v) AS h FROM _digest_t").arrow()
        return np.asarray(out["h"].to_pylist(), dtype=object)
    except Exception:
        return np.asarray(
            [hashlib.md5(x.encode()).hexdigest() for x in s.to_pylist()],
            dtype=object,
        )


def md5_u32(values) -> np.ndarray:
    """int(md5(str(v))[:8], 16) per value as int64 — the md5-uniform
    used by sampling keys (DuckDB mirror:
    ``CAST(concat('0x', substr(md5(v),1,8)) AS BIGINT)``)."""
    s = _stringify(values)
    if len(s) == 0:
        return np.empty(0, dtype=np.int64)
    try:
        con = _connection()
        t = pa.table({"v": s})
        con.register("_digest_t", t)
        out = con.execute(
            "SELECT CAST(concat('0x', substr(md5(v), 1, 8)) AS BIGINT) AS u"
            " FROM _digest_t"
        ).arrow()
        return out["u"].combine_chunks().to_numpy(zero_copy_only=False).astype(
            np.int64
        )
    except Exception:
        out = np.empty(len(s), dtype=np.int64)
        for i, x in enumerate(s.to_pylist()):
            out[i] = int(hashlib.md5(x.encode()).hexdigest()[:8], 16)
        return out


def md5_bucket(values, mod: int = 10000) -> np.ndarray:
    """md5_u32 % mod — the stratified-sampling bucket."""
    return md5_u32(values) % mod
