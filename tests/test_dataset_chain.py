"""End-to-end Dataset dedup chain (VERDICT r2 #1): pairs -> components
-> survivors with NO driver pa.Table hop for pair rows anywhere.

The proof is structural: ``dedup._fold_pairs`` — the single chokepoint
every driver pair fold in the module goes through — is monkeypatched to
raise, and the whole as_dataset chain still produces results identical
to the driver-Table path.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from schisma_ray.stages import dedup


def _docs():
    texts = [f"quick brown fox jumps over the lazy dog {i} " * 5 for i in range(24)]
    # 5 near-dup partners (one appended token -> jaccard ~0.95)
    texts += [t + "x" for t in texts[:5]]
    ids = list(range(len(texts)))
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )


@pytest.fixture
def no_pair_folds(monkeypatch):
    def boom(*a, **k):
        raise AssertionError("driver pair fold reached on the as_dataset path")

    monkeypatch.setattr(dedup, "_fold_pairs", boom)


def _pairs_key(t):
    return sorted(zip(t["a"].to_pylist(), t["b"].to_pylist()))


def test_minhash_pairs_dataset_parity(ray_session, no_pair_folds):
    ds = _docs()
    got = dedup.minhash_dedup_pairs(
        ds, "text", "doc_id", threshold=0.8, as_dataset=True
    )
    assert hasattr(got, "map_batches")  # a Dataset, not a table
    got_tbl = pa.Table.from_pandas(got.to_pandas())
    # the driver path is parity-tested elsewhere; pin the expected pairs
    assert _pairs_key(got_tbl) == [(i, i + 24) for i in range(5)]
    assert all(j >= 0.8 for j in got_tbl["jaccard"].to_pylist())


def test_simhash_pairs_dataset_parity(ray_session, no_pair_folds, monkeypatch):
    ds = _docs()
    got = dedup.simhash_dup_pairs(
        ds, "text", "doc_id", max_hamming=3, as_dataset=True
    )
    assert hasattr(got, "map_batches")
    got_tbl = pa.Table.from_pandas(got.to_pandas())
    # planted near-dups must be found...
    planted = set((i, i + 24) for i in range(5))
    assert planted <= set(_pairs_key(got_tbl))
    # ...and the pair set must match the driver-Table path exactly
    monkeypatch.undo()  # restore _fold_pairs for the reference run
    drv = dedup.simhash_dup_pairs(ds, "text", "doc_id", max_hamming=3)
    assert _pairs_key(drv) == _pairs_key(got_tbl)


def test_full_chain_pairs_to_survivors_no_driver_hop(ray_session, no_pair_folds):
    """pairs (Dataset) -> components_distributed -> survivors(join):
    every stage a Dataset; pair rows provably never folded."""
    from schisma_ray.stages.components import near_dedup_survivors

    ds = _docs()
    pairs_ds = dedup.minhash_dedup_pairs(
        ds, "text", "doc_id", threshold=0.8, as_dataset=True
    )
    survivors = near_dedup_survivors(ds, pairs_ds, "doc_id", strategy="join")
    got = sorted(survivors.to_pandas()["doc_id"].tolist())
    # dups 24..28 collapse onto keepers 0..4 -> all originals survive
    assert got == list(range(24))


def test_chain_broadcast_strategy_with_dataset_pairs(ray_session, no_pair_folds):
    from schisma_ray.stages.components import near_dedup_survivors

    ds = _docs()
    pairs_ds = dedup.minhash_dedup_pairs(
        ds, "text", "doc_id", threshold=0.8, as_dataset=True
    )
    survivors = near_dedup_survivors(ds, pairs_ds, "doc_id", strategy="broadcast")
    assert sorted(survivors.to_pandas()["doc_id"].tolist()) == list(range(24))


def test_dataset_path_matches_table_path(ray_session):
    """Value parity between the as_dataset chain and the (oracled)
    driver-Table chain, including jaccard metrics."""
    ds = _docs()
    tbl = dedup.minhash_dedup_pairs(ds, "text", "doc_id", threshold=0.8)
    ds_out = pa.Table.from_pandas(
        dedup.minhash_dedup_pairs(
            ds, "text", "doc_id", threshold=0.8, as_dataset=True
        ).to_pandas()
    )
    key = lambda t: sorted(
        zip(t["a"].to_pylist(), t["b"].to_pylist(), t["jaccard"].to_pylist())
    )
    assert key(tbl) == key(ds_out)


def test_cosine_pairs_dataset_parity(ray_session):
    from schisma_ray.stages.similarity import cosine_near_dup_pairs

    rng = np.random.default_rng(11)
    base = rng.normal(size=(30, 16)).astype(np.float32)
    base[20] = base[0] + 0.001  # planted near-dup
    tbl = pa.table(
        {
            "vec_id": pa.array(range(30), pa.int64()),
            "embedding": pa.array([v.tolist() for v in base],
                                  pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(tbl)
    drv = cosine_near_dup_pairs(ds, threshold=0.99)
    dist = pa.Table.from_pandas(
        cosine_near_dup_pairs(ds, threshold=0.99, as_dataset=True).to_pandas()
    )
    key = lambda t: sorted(zip(t["a"].to_pylist(), t["b"].to_pylist()))
    assert key(drv) == key(dist) == [(0, 20)]


def test_empty_corpus_dataset_chain(ray_session, no_pair_folds):
    empty = rd.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())})
    )
    out = dedup.minhash_dedup_pairs(
        empty, "text", "doc_id", threshold=0.8, as_dataset=True
    )
    assert out.count() == 0
