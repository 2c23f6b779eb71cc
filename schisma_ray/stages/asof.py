"""As-of join: for each left row, the most recent right row at-or-before
its timestamp, per key.

Ray Data has no asof join; the composition (SURVEY.md §2 custom
operators, option a) is: align both sides to a common narrow schema,
``union``, ``groupby(key)``, and resolve each group with a sorted
``searchsorted`` pass inside ``map_groups``. Partitioning assumption:
one key's rows fit one group task (true for per-user/per-entity event
streams; a pathological single hot key would need salting by time
range, at the cost of duplicating the right side per range).

The shuffle carries only (key, ts, side, id) — never the wide payloads.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def asof_join_latest(
    left_ds,
    right_ds,
    *,
    key: str,
    right_key: str | None = None,
    left_ts: str = "ts",
    right_ts: str = "ts",
    left_id: str = "event_id",
    tolerance_s: int | None = None,
):
    """(left_id, key, asof_ts) — asof_ts = max right ts <= left ts, or
    null. ``tolerance_s`` bounds staleness (pandas ``merge_asof``
    tolerance semantics): a match older than the tolerance is treated
    as no match."""
    right_key = right_key or key
    tol_us = None if tolerance_s is None else tolerance_s * 1_000_000

    def prep_left(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pc.cast(t[key], pa.int64()),
                "ts_us": pc.cast(t[left_ts], pa.int64()),
                "row_id": pc.cast(t[left_id], pa.int64()),
                "side": pa.array(["L"] * t.num_rows),
            }
        )

    def prep_right(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pc.cast(t[right_key], pa.int64()),
                "ts_us": pc.cast(t[right_ts], pa.int64()),
                "row_id": pa.array([None] * t.num_rows, pa.int64()),
                "side": pa.array(["R"] * t.num_rows),
            }
        )

    left = left_ds.map_batches(prep_left, batch_format="pyarrow", zero_copy_batch=True)
    right = right_ds.map_batches(prep_right, batch_format="pyarrow", zero_copy_batch=True)

    def resolve(group: pd.DataFrame) -> pd.DataFrame:
        lf = group[group["side"] == "L"]
        rt = np.sort(group.loc[group["side"] == "R", "ts_us"].to_numpy())
        if len(lf) == 0:
            return pd.DataFrame({"row_id": [], "k": [], "asof_ts_us": []})
        if len(rt) == 0:
            asof = np.full(len(lf), np.nan)
        else:
            lts = lf["ts_us"].to_numpy()
            idx = np.searchsorted(rt, lts, side="right") - 1
            asof = np.where(idx >= 0, rt[np.clip(idx, 0, None)], np.nan)
            if tol_us is not None:
                asof = np.where(lts - asof <= tol_us, asof, np.nan)
        out = pd.DataFrame(
            {
                "row_id": lf["row_id"].to_numpy(),
                "k": lf["k"].to_numpy(),
                "asof_ts_us": asof,
            }
        )
        return out

    joined = left.union(right).groupby("k").map_groups(resolve, batch_format="pandas")

    def finalize(t: pa.Table) -> pa.Table:
        vals = t["asof_ts_us"].to_pylist()
        secs = [
            None if v is None or (isinstance(v, float) and v != v)
            else int(v) // 1_000_000
            for v in vals
        ]
        return pa.table(
            {
                "row_id": pc.cast(t["row_id"], pa.int64()),
                "k": pc.cast(t["k"], pa.int64()),
                "asof_epoch_s": pa.array(secs, pa.int64()),
            }
        )

    return joined.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)
