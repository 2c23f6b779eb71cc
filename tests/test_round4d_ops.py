"""Round-4 fourth batch: cross-split leakage audit, unpivot/melt."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _md5_u32(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)


def test_split_leakage_bruteforce(ray_session):
    from schisma_ray.stages.corpus import split_leakage

    rng = np.random.default_rng(7)
    n = 400
    ids = np.arange(n, dtype=np.int64)
    # 40 distinct contents shared by many ids -> guaranteed both-side keys
    fps = rng.integers(0, 40, n).astype(np.int64)
    t = pa.table({"doc_id": ids, "fp": fps})

    out = split_leakage(
        rd.from_arrow(t).repartition(5), key_col="fp", id_col="doc_id",
        train_pct=8, mod=10,
    ).to_pandas().sort_values("fp").reset_index(drop=True)

    df = pd.DataFrame({"fp": fps,
                       "is_train": [( _md5_u32(i) % 10) < 8 for i in ids]})
    g = df.groupby("fp")["is_train"].agg(train_n="sum", val_n=lambda s: (~s).sum())
    exp = g[(g.train_n > 0) & (g.val_n > 0)].reset_index()
    exp["val_n"] = exp["val_n"].astype(np.int64)
    assert len(out) == len(exp) > 0
    got = {(r.fp, r.train_n, r.val_n) for r in out.itertuples(index=False)}
    want = {(r.fp, r.train_n, r.val_n) for r in exp.itertuples(index=False)}
    assert got == want


def test_split_leakage_null_keys_and_parallelism(ray_session):
    from schisma_ray.stages.corpus import split_leakage

    t = pa.table({
        "doc_id": pa.array(list(range(20)), pa.int64()),
        "fp": pa.array([None if i % 4 == 0 else i % 3 for i in range(20)],
                       pa.int64()),
    })
    a = split_leakage(rd.from_arrow(t), key_col="fp", id_col="doc_id")
    b = split_leakage(rd.from_arrow(t).repartition(7), key_col="fp",
                      id_col="doc_id")
    pa_ = a.to_pandas().sort_values("fp").reset_index(drop=True)
    pb = b.to_pandas().sort_values("fp").reset_index(drop=True)
    pd.testing.assert_frame_equal(pa_, pb)
    assert pa_["fp"].notna().all()  # null keys never leak through


def test_unpivot_roundtrips_pivot(ray_session):
    from schisma_ray.stages.topk import pivot_counts, unpivot

    rng = np.random.default_rng(3)
    n = 300
    cats = ["a", "b", "c"]
    t = pa.table({
        "k": pa.array(rng.integers(0, 25, n), pa.int64()),
        "c": pa.array([cats[i] for i in rng.integers(0, 3, n)], pa.string()),
    })
    wide = pivot_counts(rd.from_arrow(t).repartition(4), "k", "c", cats)
    long = unpivot(wide, ["k"], cats, var_col="c", value_col="n").to_pandas()

    exp = (pd.DataFrame({"k": t["k"].to_numpy(), "c": t["c"].to_pylist()})
           .groupby(["k", "c"]).size().rename("n"))
    full = exp.reindex(
        pd.MultiIndex.from_product([sorted(set(t["k"].to_pylist())), cats],
                                   names=["k", "c"]),
        fill_value=0,
    ).reset_index()
    got = long.sort_values(["k", "c"]).reset_index(drop=True)
    want = full.sort_values(["k", "c"]).reset_index(drop=True)
    want["n"] = want["n"].astype(np.int64)
    pd.testing.assert_frame_equal(got, want)


def test_unpivot_empty_and_multi_id(ray_session):
    from schisma_ray.stages.topk import unpivot

    t = pa.table({
        "k1": pa.array([1, 2], pa.int64()),
        "k2": pa.array(["x", "y"], pa.string()),
        "m1": pa.array([10, 20], pa.int64()),
        "m2": pa.array([1, 0], pa.int64()),
    })
    out = unpivot(rd.from_arrow(t), ["k1", "k2"], ["m1", "m2"]).to_pandas()
    assert len(out) == 4
    assert set(out.columns) == {"k1", "k2", "variable", "value"}
    assert set(map(tuple, out.itertuples(index=False))) == {
        (1, "x", "m1", 10), (2, "y", "m1", 20),
        (1, "x", "m2", 1), (2, "y", "m2", 0),
    }
