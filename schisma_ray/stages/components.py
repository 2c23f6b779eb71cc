"""Connected components over candidate-duplicate pairs -> dedup groups.

Near-dup pairs (MinHash/SimHash/embedding) form a graph; the dedup
decision needs its connected components (a ~ b ~ c collapses to one
keeper). Two paths:

* **driver union-find** (default below ``driver_limit`` edges): the
  verified pair set is orders of magnitude smaller than the corpus by
  construction, so a path-compressed union-find on the driver is the
  right tool.
* **min-label propagation** for giant edge sets: iterate
  label[v] = min(label of v's neighborhood) via groupby rounds until a
  fixed point — each round is one shuffle over (node, label) pairs;
  converges in O(diameter) rounds (duplicate clusters are shallow).
"""

from __future__ import annotations

import pyarrow as pa


def _union_find(edges: list[tuple]) -> dict:
    parent: dict = {}
    nodes: set = set()

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        nodes.add(a)
        nodes.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # keep the smaller id as the root -> stable keeper choice
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in nodes}


def components_from_pairs(pairs: pa.Table, *, driver_limit: int = 10_000_000) -> pa.Table:
    """(node, component) for every node appearing in ``pairs``.

    Component id = the minimum node id in the component (the keeper)."""
    n_edges = pairs.num_rows
    if n_edges == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "component": pa.array([], pa.int64())})
    edges = list(zip(pairs["a"].to_pylist(), pairs["b"].to_pylist()))
    if n_edges <= driver_limit:
        labels = _union_find(edges)
        nodes = sorted(labels)
        return pa.table(
            {
                "node": pa.array(nodes),
                "component": pa.array([labels[n] for n in nodes]),
            }
        )
    # min-label propagation (scale path): resolve via repeated groupby
    import pandas as pd

    label = {}
    for a, b in edges:
        label.setdefault(a, a)
        label.setdefault(b, b)
    adj = pd.DataFrame(edges, columns=["a", "b"])
    changed = True
    while changed:
        changed = False
        fwd = adj.assign(lbl=adj["b"].map(label)).groupby("a")["lbl"].min()
        bwd = adj.assign(lbl=adj["a"].map(label)).groupby("b")["lbl"].min()
        for node, lbl in pd.concat([fwd, bwd]).groupby(level=0).min().items():
            if lbl < label[node]:
                label[node] = lbl
                changed = True
    # path-compress labels to component roots
    def root(x):
        while label[x] != x:
            x = label[x]
        return x

    nodes = sorted(label)
    return pa.table(
        {"node": pa.array(nodes), "component": pa.array([root(n) for n in nodes])}
    )


def near_dedup_survivors(ds, pairs: pa.Table, id_col: str):
    """Dataset of surviving ids: every id minus non-keeper dup-group members.

    The non-survivor set (group members that are not the minimum id) is
    broadcast and filtered out in one vectorized pass — the corpus never
    shuffles.
    """
    import pyarrow.compute as pc
    import ray

    comp = components_from_pairs(pairs)
    drop = [
        n for n, c in zip(comp["node"].to_pylist(), comp["component"].to_pylist())
        if n != c
    ]
    drop_ref = ray.put(pa.array(sorted(drop)))

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks()
        bad = pc.fill_null(pc.is_in(ids, value_set=ray.get(drop_ref)), False)
        return batch.filter(pc.invert(bad)).select([id_col])

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
