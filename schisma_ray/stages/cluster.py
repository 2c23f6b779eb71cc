"""Iterative distributed clustering (Lloyd's k-means) over an
embedding column — the representative of the brief's "iterative
algorithms" category (not SQL-expressible; rows-only driver check,
convergence/determinism pinned in tests).

Scale shape per iteration: centroids broadcast once (``ray.put``), ONE
streaming pass assigns every vector to its nearest centroid with a
vectorized matmul and emits per-cluster (sum-vector, count) partials —
k x d floats per batch, folded on the driver (k x d is model-sized,
not data-sized). No shuffle anywhere; iterations cost one corpus scan
each. Empty clusters keep their previous centroid (deterministic, no
re-seeding randomness).

Initialization is deterministic: one pass collects a bounded sample
(the ``sample_size`` lowest-md5 ids — the same process-invariant
ordering primitive as ``cap_per_key``), then greedy farthest-point
picks k seeds from it (kmeans++-style spread without randomness), so
runs agree across parallelism levels and restarts.
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa
import ray


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col].combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(arr), -1) if len(arr) else flat.reshape(0, 0)


def kmeans(ds, *, col: str = "embedding", id_col: str = "vec_id",
           k: int = 8, iters: int = 5, sample_size: int = 512):
    """Returns (centroids ndarray (k, d), assign_fn) after ``iters``
    Lloyd iterations. ``assign_fn`` is a map_batches-ready closure
    producing (id, cluster) rows from the final centroids."""
    # deterministic bounded sample: the sample_size lowest-md5 rows.
    # Selection happens INSIDE map_batches (each batch ships only its
    # local winners), so the driver folds sample_size x batches rows,
    # never the corpus.
    def sample_partial(t: pa.Table) -> pa.Table:
        from ._digest import md5_hex

        hexes = md5_hex(t[id_col]).tolist()
        keep = np.argsort(np.asarray(hexes))[:sample_size]
        m = pa.array(np.isin(np.arange(len(hexes)), keep))
        kept = t.filter(m)
        return pa.table(
            {
                "h": pa.array(
                    [hexes[i] for i in sorted(keep.tolist())], pa.string()
                ),
                col: kept[col],
            }
        )

    seed_rows: list[tuple[str, np.ndarray]] = []
    for b in ds.map_batches(
        lambda t: t.select([id_col, col]), batch_format="pyarrow",
        zero_copy_batch=True,
    ).map_batches(
        sample_partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        vecs = _batch_matrix(t, col)
        for i, h in enumerate(t["h"].to_pylist()):
            seed_rows.append((h, vecs[i]))
        seed_rows.sort(key=lambda x: x[0])
        del seed_rows[sample_size:]
    if not seed_rows:
        raise ValueError("empty dataset")
    sample = np.stack([v for _, v in seed_rows])
    k = min(k, len(sample))
    # greedy farthest-point over the sample: spread-out seeds without
    # randomness (first seed = lowest-md5 row)
    chosen = [0]
    d2 = ((sample - sample[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        nxt = int(np.argmax(d2))
        chosen.append(nxt)
        d2 = np.minimum(d2, ((sample - sample[nxt]) ** 2).sum(axis=1))
    centroids = sample[chosen]

    for _ in range(iters):
        cref = ray.put(centroids)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            x = _batch_matrix(batch, col)
            if x.shape[0] == 0:
                return pa.table(
                    {
                        "cluster": pa.array([], pa.int64()),
                        "vsum": pa.array([], pa.list_(pa.float64())),
                        "n": pa.array([], pa.int64()),
                    }
                )
            # nearest centroid by squared L2, vectorized:
            # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 (drop ||x||^2, same argmin)
            scores = x @ c.T - 0.5 * (c * c).sum(axis=1)[None, :]
            assign = np.argmax(scores, axis=1)
            sums, ns = [], []
            clusters = np.unique(assign)
            for ci in clusters:
                m = assign == ci
                sums.append(x[m].sum(axis=0).tolist())
                ns.append(int(m.sum()))
            return pa.table(
                {
                    "cluster": pa.array(clusters.astype(np.int64)),
                    "vsum": pa.array(sums, pa.list_(pa.float64())),
                    "n": pa.array(ns, pa.int64()),
                }
            )

        # collect all partial rows FIRST, then fold in a deterministic
        # sorted order: iter_batches arrival order is not guaranteed and
        # float addition is non-associative, which would make centroids
        # (and near-tie assignments) parallelism-dependent
        rows: list[tuple] = []
        for b in ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=None):
            t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
            for ci, vs, n in zip(
                t["cluster"].to_pylist(), t["vsum"].to_pylist(), t["n"].to_pylist()
            ):
                rows.append((ci, n, tuple(vs)))
        rows.sort()
        acc_sum = np.zeros_like(centroids)
        acc_n = np.zeros(len(centroids), dtype=np.int64)
        for ci, n, vs in rows:
            acc_sum[ci] += np.asarray(vs)
            acc_n[ci] += n
        nonempty = acc_n > 0
        centroids = centroids.copy()
        centroids[nonempty] = acc_sum[nonempty] / acc_n[nonempty, None]

    final_ref = ray.put(centroids)

    def assign_fn(batch: pa.Table) -> pa.Table:
        c = ray.get(final_ref)
        x = _batch_matrix(batch, col)
        if x.shape[0] == 0:
            return pa.table(
                {
                    id_col: pa.array([], batch[id_col].type),
                    "cluster": pa.array([], pa.int64()),
                }
            )
        scores = x @ c.T - 0.5 * (c * c).sum(axis=1)[None, :]
        assign = np.argmax(scores, axis=1)
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array(assign.astype(np.int64)),
            }
        )

    return centroids, assign_fn


def kmeans_assignments(ds, *, col: str = "embedding", id_col: str = "vec_id",
                       k: int = 8, iters: int = 5):
    """(id, cluster) Dataset: run k-means then one assignment pass."""
    _, assign_fn = kmeans(ds, col=col, id_col=id_col, k=k, iters=iters)
    return ds.map_batches(assign_fn, batch_format="pyarrow", zero_copy_batch=True)


def kmeans_train_numpy(ids, x: np.ndarray, *, k: int = 8, iters: int = 5,
                       sample_size: int = 512) -> np.ndarray:
    """Driver-side trainer with the SAME deterministic seeding as the
    distributed ``kmeans`` (lowest-md5 sample in hex order, greedy
    farthest-point seeds, Lloyd with empty clusters keeping their
    previous centroid). Produces the centroid artifact that both the
    distributed assignment pass and a SQL oracle consume — model-sized
    training (k x d), corpus-sized assignment stays in Ray."""
    from ._digest import md5_hex

    x = np.asarray(x, np.float64)
    hexes = md5_hex(ids)
    order = np.argsort(hexes, kind="stable")[:sample_size]
    sample = x[order]
    k = min(k, len(sample))
    if k == 0:
        raise ValueError("empty dataset")
    chosen = [0]
    d2 = ((sample - sample[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        nxt = int(np.argmax(d2))
        chosen.append(nxt)
        d2 = np.minimum(d2, ((sample - sample[nxt]) ** 2).sum(axis=1))
    centroids = sample[chosen]
    for _ in range(iters):
        scores = x @ centroids.T - 0.5 * (centroids * centroids).sum(axis=1)[None, :]
        assign = np.argmax(scores, axis=1)
        centroids = centroids.copy()
        for ci in range(k):
            m = assign == ci
            if m.any():
                centroids[ci] = x[m].mean(axis=0)
    return centroids


def assign_with_centroids(ds, centroids: np.ndarray, *,
                          col: str = "embedding", id_col: str = "vec_id"):
    """Distributed nearest-centroid assignment against a FIXED centroid
    matrix: centroids broadcast once (``ray.put``), one streaming pass,
    vectorized matmul per batch — zero shuffle, k x d wire cost."""
    cref = ray.put(np.asarray(centroids, np.float64))

    def assign_fn(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        x = _batch_matrix(batch, col)
        if x.shape[0] == 0:
            return pa.table(
                {
                    id_col: pa.array([], batch[id_col].type),
                    "cluster": pa.array([], pa.int64()),
                }
            )
        scores = x @ c.T - 0.5 * (c * c).sum(axis=1)[None, :]
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array(np.argmax(scores, axis=1).astype(np.int64)),
            }
        )

    return ds.map_batches(assign_fn, batch_format="pyarrow", zero_copy_batch=True)
