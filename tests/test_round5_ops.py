"""Round-5 operator batch: transitions, repeat gap, trend slope,
weighted median, dim profile, PMI — brute-force parity + determinism."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _events(rows):
    return rd.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    })).repartition(3)


def test_event_transition_counts_bruteforce(ray_session):
    from schisma_ray.stages.window import event_transition_counts

    rng = np.random.default_rng(5)
    rows = []
    for i in range(200):
        rows.append((i, int(rng.integers(0, 10**9)), int(rng.integers(0, 12)),
                     ["a", "b", "c"][int(rng.integers(0, 3))]))
    out = event_transition_counts(_events(rows)).to_pandas()
    got = {(r.prev_type, r.next_type): r.n for r in out.itertuples()}
    # brute force
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    want: dict = {}
    for _, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        ty = g["event_type"].tolist()
        for a, b in zip(ty, ty[1:]):
            want[(a, b)] = want.get((a, b), 0) + 1
    assert got == want


def test_first_repeat_gap_bruteforce(ray_session):
    from schisma_ray.stages.window import first_repeat_gap

    day = 86_400_000_000
    rows = [
        (1, 10, 0 * day), (2, 10, 3 * day + 5), (3, 10, 9 * day),
        (4, 11, 7 * day),                      # single row: no gap
        (5, 12, 2 * day), (6, 12, 2 * day),    # same-day repeat: gap 0
    ]
    ds = rd.from_arrow(pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
        "o_orderdate": pa.array([r[2] for r in rows], pa.timestamp("us")),
    })).repartition(3)
    out = first_repeat_gap(ds).to_pandas().sort_values("o_custkey")
    assert out["o_custkey"].tolist() == [10, 12]
    assert out["gap_days"].tolist() == [3, 0]


def test_grouped_trend_slope_exact(ray_session):
    from schisma_ray.stages.stats import grouped_trend_slope

    day = 86_400_000_000
    # type 'up': counts 1,2,3 on days 0,1,2 -> slope exactly 1
    # type 'flat': counts 2,2 -> slope 0; type 'one': single day -> omitted
    rows = []
    eid = 0
    for d, c in [(0, 1), (1, 2), (2, 3)]:
        for _ in range(c):
            rows.append(("up", d * day + eid)); eid += 1
    for d in (0, 1):
        for _ in range(2):
            rows.append(("flat", d * day + eid)); eid += 1
    rows.append(("one", 5 * day))
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    })).repartition(4)
    out = grouped_trend_slope(ds, "event_type").to_pandas()
    got = dict(zip(out["event_type"], out["slope"]))
    assert got == {"up": 1.0, "flat": 0.0}


def test_grouped_weighted_median_bruteforce(ray_session):
    from schisma_ray.stages.rank import grouped_weighted_median

    rng = np.random.default_rng(9)
    flags, vals, wts = [], [], []
    for _ in range(300):
        flags.append(["A", "B", "C"][int(rng.integers(0, 3))])
        vals.append(float(rng.integers(1, 40)))
        wts.append(float(rng.integers(1, 6)))
    ds = rd.from_arrow(pa.table({
        "f": pa.array(flags, pa.string()),
        "v": pa.array(vals, pa.float64()),
        "w": pa.array(wts, pa.float64()),
    })).repartition(5)
    out = grouped_weighted_median(ds, "f", "v", "w")
    got = dict(zip(out["f"].to_pylist(), out["wmedian"].to_pylist()))
    df = pd.DataFrame({"f": flags, "v": vals, "w": wts})
    for f, g in df.groupby("f"):
        agg = g.groupby("v")["w"].sum().sort_index()
        cum = agg.cumsum()
        tot = agg.sum()
        want = float(cum.index[(2 * cum >= tot).values.argmax()])
        assert got[f] == want, (f, got[f], want)


def test_embedding_dim_profile_bruteforce(ray_session):
    from schisma_ray.stages.similarity import embedding_dim_profile

    rng = np.random.default_rng(2)
    mat = rng.standard_normal((50, 6))
    mat[:, 3] = 7.5  # dead dimension
    ds = rd.from_arrow(pa.table({
        "embedding": pa.array([r.tolist() for r in mat],
                              pa.list_(pa.float64())),
    })).repartition(4)
    out = embedding_dim_profile(ds)
    assert out["dim"].to_pylist() == [1, 2, 3, 4, 5, 6]
    means = np.asarray(out["mean_v"].to_pylist())
    stds = np.asarray(out["std_v"].to_pylist())
    assert np.allclose(means, np.round(mat.mean(axis=0), 6), atol=2e-6)
    assert np.allclose(stds, np.round(mat.std(axis=0), 6), atol=2e-6)
    assert stds[3] == 0.0  # dead dim detected


def test_word_pmi_top_planted_collocation(ray_session):
    from schisma_ray.stages.text import word_pmi_top

    # 'alpha beta' co-occur in 10 docs; 'alpha', 'gamma' never co-occur;
    # filler words appear everywhere (PMI ~ 0)
    docs = []
    for i in range(10):
        docs.append(f"alpha beta fill{i % 2} common words here")
    for i in range(10):
        docs.append(f"gamma fill{i % 2} common words here")
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    })).repartition(3)
    out = word_pmi_top(ds, vocab_k=10, top_pairs=5, min_pair=5).to_pandas()
    top = (out.iloc[0]["word_a"], out.iloc[0]["word_b"])
    assert top == ("alpha", "beta")
    # pmi of (alpha, beta): 10 co-docs * 20 docs / (10 * 10) = 2 -> ln 2
    assert abs(out.iloc[0]["pmi"] - round(np.log(2.0), 6)) < 1e-9
    assert ("alpha", "gamma") not in set(zip(out["word_a"], out["word_b"]))
