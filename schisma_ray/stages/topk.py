"""Grouped top-k: the per-group reporting pattern (top offenders per
code, heaviest users per event type, ...).

Combiner-first (SURVEY.md §2.4 sorts/limits): per-batch Arrow
``group_by(group, item).count`` partials collapse duplicates before the
shuffle; the global groupby then carries one row per (group, item) per
batch, and the final per-group top-k is a vectorized sort + head inside
``map_groups`` (one call per GROUP KEY — group count is the operator's
cardinality, small by definition for reporting).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def grouped_count_topk(ds, group_col: str, item_col: str, *, k: int = 3):
    """(group, item, n): the k most frequent items per group.

    Deterministic order: n desc, item asc (the same ordering as SQL
    ``row_number() OVER (PARTITION BY group ORDER BY count(*) DESC,
    item)``).
    """

    def partial(batch: pa.Table) -> pa.Table:
        t = (
            batch.select([group_col, item_col])
            .group_by([group_col, item_col])
            .aggregate([(item_col, "count")])
        )
        return t.rename_columns([group_col, item_col, "n"])

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    totals = partials.groupby([group_col, item_col]).sum("n")

    def topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sum(n)", item_col], ascending=[False, True]).head(k)
        return pd.DataFrame(
            {
                group_col: g[group_col].to_numpy(),
                item_col: g[item_col].to_numpy(),
                "n": g["sum(n)"].to_numpy("int64"),
            }
        )

    return totals.groupby(group_col).map_groups(topk, batch_format="pandas")
