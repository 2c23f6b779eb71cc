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

import numpy as np
import pandas as pd
import pyarrow as pa


def _count_local_topk_fn(group_col: str, item_col: str, k: int):
    """Per-block local top-k over the collapsed (group, item) totals —
    module-level so the skew bound (at most k rows per group per block
    entering the final merge) is directly unit-testable. Exact, not a
    heuristic: after the global groupby-sum each (group, item) total is
    exactly one row, so any item outside a block's per-group top k is
    outside the global top k too."""

    def local_topk(t: pa.Table) -> pa.Table:
        g = t.to_pandas()
        g = g.sort_values(["sum(n)", item_col], ascending=[False, True],
                          kind="mergesort")
        return pa.Table.from_pandas(
            g.groupby(group_col, sort=False).head(k), preserve_index=False
        )

    return local_topk


def grouped_count_topk(ds, group_col: str, item_col: str, *, k: int = 3):
    """(group, item, n): the k most frequent items per group.

    Deterministic order: n desc, item asc (the same ordering as SQL
    ``row_number() OVER (PARTITION BY group ORDER BY count(*) DESC,
    item)``).

    Skew shape (the tfidf_top_terms / bm25_topk pattern): the final
    per-group task never receives a hot group's full distinct-item set
    — each block of the collapsed totals keeps only its local top k
    per group first, so the merge group is bounded by k x blocks, not
    by the group's item cardinality.
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
    locals_ds = totals.map_batches(
        _count_local_topk_fn(group_col, item_col, k), batch_format="pyarrow"
    )

    def topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sum(n)", item_col], ascending=[False, True],
                              kind="mergesort").head(k)
        return pd.DataFrame(
            {
                group_col: g[group_col].to_numpy(),
                item_col: g[item_col].to_numpy(),
                "n": g["sum(n)"].to_numpy("int64"),
            }
        )

    return locals_ds.groupby(group_col).map_groups(topk, batch_format="pandas")


def grouped_vector_mean(ds, group_col: str, vec_col: str):
    """(group, dim, mean_v): per-group centroid of an embedding column —
    the class-centroid / cluster-profile aggregation. Combiner-first:
    each batch emits one (sum-vector, count) partial per group (numpy
    matmul-free segment sums); the global fold is over
    groups x batches tiny partials; division happens once at the end.
    Output is long-format (1-based dim) so a SQL oracle can reproduce it
    via unnest + generate_subscripts.
    """
    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        arr = batch[vec_col].combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        dim = len(flat) // len(arr) if len(arr) else 0
        mat = flat.reshape(len(arr), dim)
        groups = batch[group_col].to_pandas()
        out_g, out_sum, out_n = [], [], []
        df = pd.DataFrame({"g": groups})
        for g, idx in df.groupby("g", sort=False).groups.items():
            out_g.append(g)
            out_sum.append(mat[np.asarray(idx)].sum(axis=0).tolist())
            out_n.append(len(idx))
        return pa.table(
            {
                group_col: pa.array(out_g),
                "vsum": pa.array(out_sum, pa.list_(pa.float64())),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        vs = np.stack([np.asarray(v, dtype=np.float64) for v in group["vsum"]])
        total = vs.sum(axis=0)
        n = int(group["n"].sum())
        mean = np.round(total / max(n, 1), 6)
        g = group[group_col].iloc[0]
        return pd.DataFrame(
            {
                group_col: [g] * len(mean),
                "dim": np.arange(1, len(mean) + 1, dtype=np.int64),
                "mean_v": mean,
            }
        )

    return partials.groupby(group_col).map_groups(fold, batch_format="pandas")


def grouped_distinct_count(ds, group_col: str, item_col: str):
    """(group, n_distinct): EXACT distinct items per group.

    Two-level combiner: per-batch distinct (group, item) pairs shrink
    the shuffle to unique pairs per batch; the global groupby dedupes
    across batches; a per-batch count partial + tiny final sum produces
    the per-group cardinality. Memory floor is O(distinct pairs) spread
    over the cluster — the exact-distinct lower bound (use the HLL
    aggregate when an estimate suffices).
    """

    def pair_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.select([group_col, item_col])
        # null items don't count (SQL COUNT(DISTINCT) semantics); null
        # groups are kept as their own group (SQL GROUP BY semantics)
        t = t.filter(pc.is_valid(t[item_col]))
        return t.group_by([group_col, item_col]).aggregate([])

    pairs = ds.map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True)
    distinct_pairs = pairs.groupby([group_col, item_col]).count()

    def count_partial(batch: pa.Table) -> pa.Table:
        # count_all, not count(group_col): a NULL group key must still
        # count its rows (count(col) skips nulls)
        t = batch.select([group_col]).group_by(group_col).aggregate(
            [([], "count_all")]
        )
        return pa.table({group_col: t[group_col], "partial": t["count_all"]})

    partials = distinct_pairs.map_batches(
        count_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    total = partials.groupby(group_col).sum("partial")
    return total.map_batches(
        lambda t: pa.table({group_col: t[group_col], "n_distinct": t["sum(partial)"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def grouped_distinct_hll(ds, group_col: str, item_col: str, *, p: int = 12):
    """(group, n_distinct): APPROXIMATE distinct items per group via a
    per-group HyperLogLog — the constant-state-per-group scale path next
    to the exact ``grouped_distinct_count`` (whose memory floor is the
    distinct-pair count). Registers tree-merge by elementwise max inside
    Ray's grouped aggregation; ~1.6% relative error at p=12.
    """
    from .stats import HLL

    out = ds.groupby(group_col).aggregate(HLL(item_col, p=p, alias_name="n_distinct"))

    def project(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                group_col: t[group_col],
                "n_distinct": pc.cast(t["n_distinct"], pa.int64()),
            }
        )

    return out.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def pivot_counts(ds, row_key: str, col_key: str, categories: list[str], *,
                 num_buckets: int = 32):
    """Wide pivot table: one row per ``row_key`` value, one BIGINT count
    column per category in the FIXED ``categories`` list (explicit so
    the output schema is stable no matter which categories appear in
    which bucket — dynamic pivot schemas don't distribute).

    Combiner-first: each batch collapses to (row, col) partial counts
    with one Arrow group_by; the shuffle carries those partials
    bucketed by row-key hash; each bucket does one vectorized
    pandas pivot + reindex."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        agg = (
            t.select([row_key, col_key])
            .group_by([row_key, col_key])
            .aggregate([([], "count_all")])
        )
        agg = agg.rename_columns([row_key, col_key, "n"])
        h = pd.util.hash_array(
            agg[row_key].combine_chunks().to_numpy(zero_copy_only=False)
        )
        return agg.append_column(
            "_rb", pa.array((h % num_buckets).astype(np.int32), pa.int32())
        )

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        wide = group.pivot_table(
            index=row_key, columns=col_key, values="n",
            aggfunc="sum", fill_value=0,
        ).reindex(columns=categories, fill_value=0).astype(np.int64)
        wide.columns = list(categories)
        return wide.reset_index()

    return partials.groupby("_rb").map_groups(merge, batch_format="pandas")


def unpivot(ds, id_cols: list[str], value_cols: list[str], *,
            var_col: str = "variable", value_col: str = "value"):
    """Long/melt reshape — the inverse of ``pivot_counts``: each input
    row becomes ``len(value_cols)`` rows of (id..., variable, value).
    Row-local and zero shuffle (the batch is concatenated once per
    value column, all Arrow takes/casts); the value columns must share
    a castable type (everything goes through int64 — counts, flags,
    integer metrics)."""
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        parts = []
        for c in value_cols:
            cols = {k: t[k] for k in id_cols}
            cols[var_col] = pa.array([c] * t.num_rows, pa.string())
            cols[value_col] = pc.cast(t[c], pa.int64())
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def cube_counts(ds, dims: list[str], val_col: str, *,
                val_scale: int = 100, all_label: str = "ALL") -> pa.Table:
    """GROUP BY CUBE over low-cardinality dimensions: row counts and an
    integer-scaled value sum for EVERY subset of ``dims`` (the BI
    subtotal lattice — 2^len(dims) grouping sets), rolled-up levels
    marked with ``all_label``. Dimensions are cast to string so the
    output schema is uniform across grouping sets.

    Scale: ONE combiner pass over the data (per-batch partials at
    finest-grouping cardinality), a bounded driver fold, then the
    2^d expansion computed on the already-aggregated finest table —
    never on raw rows. Dimension cardinality must be small (formats,
    event types, weekdays); rows with a null dim or value are dropped
    (SQL WHERE ... IS NOT NULL convention)."""
    import itertools

    import pyarrow.compute as pc

    from ._fold import fold_table

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.is_valid(t[val_col])
        for d in dims:
            keep = pc.and_(keep, pc.is_valid(t[d]))
        t = t.filter(keep)
        v = np.floor(
            t[val_col].to_numpy(zero_copy_only=False) * val_scale + 0.5
        ).astype(np.int64)
        cols = {d: pc.cast(t[d], pa.string()) for d in dims}
        cols["s"] = pa.array(v, pa.int64())
        agg = (
            pa.table(cols).group_by(dims)
            .aggregate([([], "count_all"), ("s", "sum")])
        )
        return agg.rename_columns(list(dims) + ["n", "s"])

    folded = fold_table(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    )
    schema = pa.schema([(d, pa.string()) for d in dims]
                       + [("n", pa.int64()), ("sum_val", pa.int64())])
    if folded is None:
        return schema.empty_table()
    finest = (
        folded.group_by(dims).aggregate([("n", "sum"), ("s", "sum")])
        .rename_columns(list(dims) + ["n", "s"])
    )
    import pandas as pd

    fin = finest.to_pandas()
    outs = []
    for r in range(len(dims) + 1):
        for keep_dims in itertools.combinations(dims, r):
            if keep_dims:
                g = fin.groupby(list(keep_dims), sort=False, as_index=False)[
                    ["n", "s"]].sum()
            else:
                g = pd.DataFrame({"n": [fin["n"].sum()],
                                  "s": [fin["s"].sum()]})
            for d in dims:
                if d not in keep_dims:
                    g[d] = all_label
            outs.append(g[list(dims) + ["n", "s"]])
    allg = pd.concat(outs, ignore_index=True)
    return pa.table({
        **{d: pa.array(allg[d].astype(str), pa.string()) for d in dims},
        "n": pa.array(allg["n"].to_numpy().astype(np.int64), pa.int64()),
        "sum_val": pa.array(allg["s"].to_numpy().astype(np.int64),
                            pa.int64()),
    })
