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


def test_grouped_corr_vs_numpy(ray_session):
    from schisma_ray.stages.stats import grouped_corr

    rng = np.random.default_rng(11)
    n = 1000
    g = np.array(["a", "b"])[rng.integers(0, 2, n)]
    x = rng.uniform(1, 50, n).round(2)
    y = 3.0 * x + rng.normal(0, 10, n).round(2)
    t = pa.table({"g": g, "x": x, "y": y})
    out = grouped_corr(
        rd.from_arrow(t).repartition(6), "g", "x", "y"
    ).to_pandas().set_index("g")
    for grp in ["a", "b"]:
        m = g == grp
        xi = np.floor(x[m] * 100 + 0.5)
        yi = np.floor(y[m] * 100 + 0.5)
        ref = np.corrcoef(xi, yi)[0, 1]
        assert abs(out.loc[grp, "corr_e6"] / 1e6 - ref) < 1e-5
        assert out.loc[grp, "n"] == m.sum()


def test_grouped_corr_degenerate(ray_session):
    from schisma_ray.stages.stats import grouped_corr

    t = pa.table({"g": ["z"] * 4, "x": [5.0] * 4, "y": [1.0, 2, 3, 4]})
    out = grouped_corr(rd.from_arrow(t), "g", "x", "y").to_pandas()
    assert out["corr_e6"].tolist() == [0]  # zero variance -> 0


def test_cube_counts_vs_pandas(ray_session):
    import pandas as pd

    from schisma_ray.stages.topk import cube_counts

    rng = np.random.default_rng(5)
    n = 500
    d1 = np.array(["x", "y", "z"])[rng.integers(0, 3, n)]
    d2 = np.array(["p", "q"])[rng.integers(0, 2, n)]
    v = rng.uniform(0, 10, n).round(2)
    t = pa.table({"d1": d1, "d2": d2, "v": v})
    out = cube_counts(rd.from_arrow(t).repartition(4), ["d1", "d2"], "v")
    got = out.to_pandas()
    vi = np.floor(v * 100 + 0.5).astype(np.int64)
    df = pd.DataFrame({"d1": d1, "d2": d2, "vi": vi})
    # grand total row
    gt = got[(got.d1 == "ALL") & (got.d2 == "ALL")]
    assert gt["n"].tolist() == [n] and gt["sum_val"].tolist() == [vi.sum()]
    # one marginal
    m = got[(got.d1 == "x") & (got.d2 == "ALL")]
    assert m["n"].tolist() == [(d1 == "x").sum()]
    assert m["sum_val"].tolist() == [df[df.d1 == "x"]["vi"].sum()]
    # full lattice size: 3*2 + 3 + 2 + 1
    assert len(got) == 12


def test_grouped_mode_tiebreak(ray_session):
    from schisma_ray.stages.rank import grouped_mode

    t = pa.table({
        "k": pa.array([1, 1, 1, 1, 2, 2, 3], pa.int64()),
        "v": pa.array(["b", "b", "a", "a", "c", None, "z"], pa.string()),
    })
    out = grouped_mode(rd.from_arrow(t).repartition(3), "k", "v")
    got = {(r.k, r.mode, r.n) for r in
           out.to_pandas().itertuples(index=False)}
    # k=1: tie a/b at 2 -> 'a' (smallest); k=2: null dropped -> c
    assert got == {(1, "a", 2), (2, "c", 1), (3, "z", 1)}


def test_quantile_bins_percentile_disc(ray_session):
    from schisma_ray.stages.rank import quantile_bins

    rng = np.random.default_rng(9)
    vals = rng.integers(1, 51, 2000).astype(np.float64)
    t = pa.table({"id": pa.array(np.arange(2000), pa.int64()),
                  "v": pa.array(vals, pa.float64())})
    out = quantile_bins(rd.from_arrow(t).repartition(5), "v", ["id"])
    got = out.to_pandas().sort_values("id").reset_index(drop=True)
    import math
    s = np.sort(vals.astype(np.int64))
    n = len(s)
    breaks = [s[math.ceil(q * n) - 1] for q in (0.25, 0.5, 0.75)]
    exp = sum((vals.astype(np.int64)[:, None] > np.array(breaks)).T)
    assert (got["bin"].to_numpy() == exp[np.argsort(np.argsort(np.arange(2000)))]).all()
    # bins roughly balanced
    counts = got["bin"].value_counts()
    assert set(counts.index) == {0, 1, 2, 3}


def test_sentence_explode_bruteforce(ray_session):
    from schisma_ray.stages.text import sentence_explode

    texts = [
        "one two. three four five. six",
        "single sentence no split",
        "a.  b",          # double space -> empty token in word split
        "trail. ",        # trailing sep -> empty final sentence
        None,             # dropped
        "",               # one empty sentence, 0 words
    ]
    t = pa.table({"doc_id": pa.array(range(6), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = sentence_explode(rd.from_arrow(t).repartition(3)).to_pandas()
    got = {(r.doc_id, r.sent_idx, r.sentence, r.n_words)
           for r in out.itertuples(index=False)}
    want = set()
    for i, txt in enumerate(texts):
        if txt is None:
            continue
        for j, s in enumerate(txt.split(". "), start=1):
            nw = len([w for w in s.split(" ") if w])
            want.add((i, j, s, nw))
    assert got == want


def test_res_tier_assign_bands(ray_session):
    from schisma_ray.stages.multimodal import res_tier_assign

    t = pa.table({
        "image_id": pa.array([f"i{i}" for i in range(8)], pa.string()),
        "w": pa.array([10, 32, 200, 400, 800, 0, None, 50], pa.int32()),
        "h": pa.array([500, 40, 128, 900, 768, 5, 9, 31], pa.int32()),
    })
    out = res_tier_assign(rd.from_arrow(t).repartition(3)).to_pandas()
    got = {(r.image_id, r.min_side, r.tier, r.tier_name)
           for r in out.itertuples(index=False)}
    # w=0 and null-w rows dropped
    assert got == {
        ("i0", 10, 0, "reject"),
        ("i1", 32, 1, "thumb"),
        ("i2", 128, 2, "small"),
        ("i3", 400, 3, "medium"),
        ("i4", 768, 4, "large"),
        ("i7", 31, 0, "reject"),
    }


def test_quantile_bins_invariants_multiseed(ray_session):
    """Bins are monotone in value and every quartile holds >= 15% of
    rows (equal-frequency property, slack for ties) across seeds."""
    from schisma_ray.stages.rank import quantile_bins

    for seed in (1, 2, 3):
        rng = np.random.default_rng(seed)
        vals = rng.integers(1, 30, 1500).astype(np.float64)
        t = pa.table({"id": pa.array(np.arange(1500), pa.int64()),
                      "v": pa.array(vals, pa.float64())})
        got = quantile_bins(
            rd.from_arrow(t).repartition(4), "v", ["id"]
        ).to_pandas()
        s = got.sort_values("val")
        assert (np.diff(s["bin"].to_numpy()) >= 0).all()
        frac = got["bin"].value_counts(normalize=True)
        assert frac.min() > 0.10


def test_grouped_corr_bounds_multiseed(ray_session):
    from schisma_ray.stages.stats import grouped_corr

    for seed in (4, 5):
        rng = np.random.default_rng(seed)
        n = 600
        t = pa.table({
            "g": np.array(["a", "b", "c"])[rng.integers(0, 3, n)],
            "x": rng.uniform(0, 100, n).round(2),
            "y": rng.uniform(0, 100, n).round(2),
        })
        out = grouped_corr(rd.from_arrow(t).repartition(5),
                           "g", "x", "y").to_pandas()
        assert (out["corr_e6"].abs() <= 1_000_000).all()
        assert out["n"].sum() == n


def test_cube_lattice_consistency_multiseed(ray_session):
    """Marginals must sum to the grand total along every axis."""
    from schisma_ray.stages.topk import cube_counts

    for seed in (6, 7):
        rng = np.random.default_rng(seed)
        n = 400
        t = pa.table({
            "d1": np.array(["x", "y"])[rng.integers(0, 2, n)],
            "d2": np.array(["p", "q", "r"])[rng.integers(0, 3, n)],
            "v": rng.uniform(0, 5, n).round(2),
        })
        got = cube_counts(rd.from_arrow(t).repartition(3),
                          ["d1", "d2"], "v").to_pandas()
        total = got[(got.d1 == "ALL") & (got.d2 == "ALL")]["n"].iloc[0]
        for axis, other in (("d1", "d2"), ("d2", "d1")):
            marg = got[(got[axis] != "ALL") & (got[other] == "ALL")]
            assert marg["n"].sum() == total
        fin = got[(got.d1 != "ALL") & (got.d2 != "ALL")]
        assert fin["n"].sum() == total
        assert fin["sum_val"].sum() == \
            got[(got.d1 == "ALL") & (got.d2 == "ALL")]["sum_val"].iloc[0]


def test_tier_fmt_residuals_contingency(ray_session):
    from schisma_ray.stages.multimodal import tier_fmt_residuals

    rng = np.random.default_rng(13)
    n = 900
    w = rng.integers(8, 1000, n).astype(np.int32)
    h = rng.integers(8, 1000, n).astype(np.int32)
    fmt = np.array(["png", "jpg"])[rng.integers(0, 2, n)]
    t = pa.table({"w": w, "h": h, "fmt": fmt})
    out = tier_fmt_residuals(
        rd.from_arrow(t).repartition(4)
    ).to_pandas()
    # totals reconcile
    assert out["n"].sum() == n
    # expected counts under independence reconcile per tier
    g = out.groupby("tier")[["n"]].sum()
    e = out.groupby("tier")["expected_e6"].sum() / 1e6
    assert np.allclose(g["n"].to_numpy(), e.to_numpy(), atol=0.01)
    # residual definition holds per cell
    tier_tot = out.groupby("tier")["n"].sum()
    fmt_tot = out.groupby("fmt")["n"].sum()
    for r in out.itertuples(index=False):
        exp = tier_tot[r.tier] * fmt_tot[r.fmt] / n
        resid = (r.n - exp) / np.sqrt(exp)
        assert abs(r.resid_e6 / 1e6 - resid) < 1e-5


def test_key_skew_report_bruteforce(ray_session):
    from schisma_ray.stages.stats import key_skew_report

    rng = np.random.default_rng(17)
    # zipf-ish: one hot key plus a uniform tail, and some nulls
    keys = np.concatenate([
        np.zeros(300, np.int64),
        rng.integers(1, 100, 700),
    ])
    arr = pa.array(list(keys) + [None, None], pa.int64())
    out = key_skew_report(
        rd.from_arrow(pa.table({"k": arr})).repartition(6), "k"
    ).to_pandas()
    import collections
    c = collections.Counter(keys.tolist())
    n = len(keys)
    assert out["n_keys"].iloc[0] == len(c)
    assert out["total"].iloc[0] == n
    assert out["max_n"].iloc[0] == max(c.values())
    hhi = sum(v * v for v in c.values()) / (n * n)
    imb = max(c.values()) * len(c) / n
    assert abs(out["hhi_e6"].iloc[0] / 1e6 - hhi) < 2e-6
    assert abs(out["imbalance_e6"].iloc[0] / 1e6 - imb) < 2e-6


def test_exact_dot_paths():
    from schisma_ray.stages.stats import _exact_dot

    assert _exact_dot(np.array([], np.int64)) == 0
    assert _exact_dot(np.array([3, 4], np.int64)) == 25
    big = np.array([2**31, 5], np.int64)  # forces the Python-int path
    assert _exact_dot(big) == (2**31) ** 2 + 25
    import pytest

    with pytest.raises(OverflowError):
        _exact_dot(np.array([2**32, 5], np.int64))  # 2^64 > int64
