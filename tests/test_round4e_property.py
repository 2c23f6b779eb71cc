"""Property tests for the round-4 sixth-batch kernels, brute-forced
against definitional implementations on randomized inputs:

* benford_digits == a Python-loop digit count, invariant to
  partition layout, chi-square terms within 1e-6 of the float formula
* lexical_diversity == collections.Counter per doc
* volume_drift == a pure-pandas half-split count, partition-invariant
* null_cooccurrence == itertools pair loop over null masks
"""

from __future__ import annotations

import collections

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("parts", [1, 5])
def test_benford_bruteforce_and_partition_invariance(ray_session, seed, parts):
    from schisma_ray.stages.stats import BENFORD_P_E6, benford_digits

    rng = np.random.default_rng(seed)
    vals = 10.0 ** rng.uniform(-2, 5, 400)
    vals[rng.integers(0, 400, 20)] = 0.0
    t = pa.table({"v": pa.array(list(vals), pa.float64())})
    out = benford_digits(
        rd.from_arrow(t).repartition(parts), "v"
    ).to_pandas().set_index("digit")

    cents = np.floor(vals * 100.0 + 0.5).astype(np.int64)
    cents = cents[cents > 0]
    counts = collections.Counter(int(str(c)[0]) for c in cents)
    total = sum(counts.values())
    for d in range(1, 10):
        assert out.loc[d, "n_obs"] == counts.get(d, 0)
        p = BENFORD_P_E6[d - 1] / 1e6
        want = 1e6 * ((counts.get(d, 0) - total * p) ** 2) / (total * p)
        assert abs(out.loc[d, "chi2_term_e6"] - want) <= 1.0


@pytest.mark.parametrize("seed", [0, 1])
def test_lexical_diversity_matches_counter(ray_session, seed):
    from schisma_ray.stages.text import lexical_diversity

    rng = np.random.default_rng(seed)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    docs = [" ".join(rng.choice(vocab, rng.integers(0, 12)))
            for _ in range(60)]
    t = pa.table({
        "doc_id": pa.array(list(range(60)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    })
    out = lexical_diversity(
        rd.from_arrow(t).repartition(4)
    ).to_pandas().set_index("doc_id")
    for i, doc in enumerate(docs):
        words = doc.split()
        if not words:
            assert i not in out.index
            continue
        c = collections.Counter(words)
        assert out.loc[i, "n_words"] == len(words)
        assert out.loc[i, "n_distinct"] == len(c)
        assert out.loc[i, "n_hapax"] == sum(v == 1 for v in c.values())


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_volume_drift_partition_invariance(ray_session, seed):
    from schisma_ray.stages.stats import volume_drift

    rng = np.random.default_rng(seed)
    n = 300
    base = 1_600_000_000_000_000
    us = base + rng.integers(0, 10_000_000, n)
    keys = rng.choice(["x", "y", "z"], n)
    t = pa.table({
        "ts": pa.array(pd.to_datetime(us, unit="us"), pa.timestamp("us")),
        "k": pa.array(keys, pa.string()),
    })
    a = volume_drift(rd.from_arrow(t).repartition(1), "ts", "k").to_pandas()
    b = volume_drift(rd.from_arrow(t).repartition(7), "ts", "k").to_pandas()
    pd.testing.assert_frame_equal(a, b)

    mid = (int(us.min()) + int(us.max())) // 2
    df = pd.DataFrame({"k": keys, "us": us})
    for k, g in df.groupby("k"):
        row = a[a["k"] == k].iloc[0]
        assert row["n_first"] == int((g["us"] < mid).sum())
        assert row["n_second"] == int((g["us"] >= mid).sum())


@pytest.mark.parametrize("seed", [0, 1])
def test_null_cooccurrence_matches_pair_loop(ray_session, seed):
    import itertools

    from schisma_ray.stages.profile import null_cooccurrence

    rng = np.random.default_rng(seed)
    n, cols = 200, ["a", "b", "c", "d"]
    data = {}
    masks = {}
    for c in cols:
        m = rng.random(n) < rng.uniform(0.05, 0.4)
        masks[c] = m
        data[c] = pa.array(
            [None if mm else int(i) for i, mm in enumerate(m)], pa.int64()
        )
    out = null_cooccurrence(
        rd.from_arrow(pa.table(data)).repartition(3), cols
    ).to_pandas().set_index(["col_a", "col_b"])
    for a, b in itertools.combinations(cols, 2):
        na, nb = int(masks[a].sum()), int(masks[b].sum())
        both = int((masks[a] & masks[b]).sum())
        row = out.loc[(a, b)]
        assert (row.n_a_null, row.n_b_null, row.n_both_null) == (na, nb, both)
        union = na + nb - both
        want = 0 if union == 0 else (2 * both * 1_000_000 + union) // (2 * union)
        assert row.jaccard_e6 == want


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ewma_anomalies_bruteforce(ray_session, seed):
    from schisma_ray.stages.stats import ewma_anomalies

    rng = np.random.default_rng(seed)
    n_days = 15
    day_us = 86_400_000_000
    counts = rng.integers(1, 40, n_days)
    counts[rng.integers(0, n_days)] *= 5  # plant a spike
    us = np.concatenate([
        d * day_us + rng.integers(0, day_us, c)
        for d, c in enumerate(counts)
    ])
    t = pa.table({
        "ts": pa.array(pd.to_datetime(us, unit="us"), pa.timestamp("us")),
    })
    out = ewma_anomalies(
        rd.from_arrow(t).repartition(4), "ts"
    ).to_pandas().sort_values("day_idx").reset_index(drop=True)

    # integer fixed-point recursion reproduced independently
    s = None
    for i, c in enumerate(counts):
        row = out.iloc[i]
        assert row["day_idx"] == i and row["n"] == c
        if s is None:
            assert row["ewma_prev_e6"] == -1 and not row["anomalous"]
            s = int(c) * 1_000_000
        else:
            assert row["ewma_prev_e6"] == s
            want_flag = abs(int(c) * 1_000_000 - s) * 1_000_000 > 100_000 * s
            assert bool(row["anomalous"]) == want_flag
            # integer EWMA tracks the float recursion within 1 ulp e6
            num = 300_000 * int(c) * 1_000_000 + 700_000 * s
            s = (2 * num + 1_000_000) // 2_000_000
    # the planted 5x spike must flag (unless it is day 0)
    spike = int(np.argmax(counts))
    if spike > 0:
        assert bool(out.iloc[spike]["anomalous"])


@pytest.mark.parametrize("seed", [0, 1])
def test_daily_active_users_bruteforce(ray_session, seed):
    from schisma_ray.stages.stats import daily_active_users

    rng = np.random.default_rng(seed)
    n = 500
    day_us = 86_400_000_000
    days = rng.integers(0, 10, n)
    users = rng.integers(0, 25, n)
    us = days * day_us + rng.integers(0, day_us, n)
    t = pa.table({
        "ts": pa.array(pd.to_datetime(us, unit="us"), pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
    })
    out = daily_active_users(
        rd.from_arrow(t).repartition(5), "ts", "user_id"
    ).to_pandas().set_index("day_idx")

    df = pd.DataFrame({"d": days, "u": users})
    dau = df.groupby("d")["u"].nunique()
    first = df.groupby("u")["d"].min().value_counts()
    for d in dau.index:
        assert out.loc[d, "dau"] == dau[d]
        assert out.loc[d, "new_users"] == int(first.get(d, 0))
    assert out["new_users"].sum() == df["u"].nunique()


def test_rate_wilson_ci_properties(ray_session):
    from schisma_ray.stages.stats import rate_wilson_ci

    t = pa.table({"c": pa.array(["e"] * 20 + ["x"] * 80, pa.string())})
    out = rate_wilson_ci(
        rd.from_arrow(t).repartition(3), "c", "e"
    ).to_pandas().iloc[0]
    assert (out["n"], out["k"], out["rate_e6"]) == (100, 20, 200_000)
    # Wilson bounds bracket the point estimate and tighten with n
    assert out["lo"] < 0.2 < out["hi"]
    big = pa.table({"c": pa.array((["e"] * 20 + ["x"] * 80) * 50,
                                  pa.string())})
    wide = out["hi"] - out["lo"]
    out2 = rate_wilson_ci(rd.from_arrow(big), "c", "e").to_pandas().iloc[0]
    assert (out2["hi"] - out2["lo"]) < wide / 4
    # hand-computed check: k=20 n=100 z=1.96 -> [0.1334, 0.2888] (4dp)
    assert abs(out["lo"] - 0.13337) < 5e-4 and abs(out["hi"] - 0.28883) < 5e-4
    # nulls count in n, not k
    t3 = pa.table({"c": pa.array(["e", None, "x", None], pa.string())})
    out3 = rate_wilson_ci(rd.from_arrow(t3), "c", "e").to_pandas().iloc[0]
    assert (out3["n"], out3["k"]) == (4, 1)


def test_string_length_profile_bruteforce(ray_session):
    from schisma_ray.stages.profile import string_length_profile

    t = pa.table({
        "a": pa.array(["abc", "", None, "fifty", "x"], pa.string()),
        "b": pa.array([None, None, None, None, None], pa.string()),
    })
    out = string_length_profile(
        rd.from_arrow(t).repartition(3), ["a", "b"]
    ).to_pandas().set_index("column")
    r = out.loc["a"]
    assert (r.n_rows, r.n_nulls, r.n_empty) == (5, 1, 1)
    assert (r.min_len, r.max_len) == (0, 5)
    # mean over valid: (3+0+5+1)/4 = 2.25 -> 2250000
    assert r.mean_len_e6 == 2_250_000
    rb = out.loc["b"]
    assert (rb.n_nulls, rb.min_len, rb.max_len, rb.mean_len_e6) == (5, -1, -1, -1)


@pytest.mark.parametrize("seed", [0, 1])
def test_hourly_profile_drift_bruteforce(ray_session, seed):
    from schisma_ray.stages.stats import hourly_profile_drift

    rng = np.random.default_rng(seed)
    n = 600
    hour_us = 3_600_000_000
    us = 1_600_000_000_000_000 + rng.integers(0, 200 * hour_us, n)
    t = pa.table({
        "ts": pa.array(pd.to_datetime(us, unit="us"), pa.timestamp("us")),
    })
    out = hourly_profile_drift(
        rd.from_arrow(t).repartition(4), "ts"
    ).to_pandas().set_index("hour")
    assert len(out) == 24

    mid = (int(us.min()) + int(us.max())) // 2
    hours = (us // hour_us) % 24
    second = us >= mid
    tf, ts_ = int((~second).sum()), int(second.sum())
    for h in range(24):
        nf = int(((hours == h) & ~second).sum())
        nsec = int(((hours == h) & second).sum())
        assert out.loc[h, "n_first"] == nf
        assert out.loc[h, "n_second"] == nsec
        assert out.loc[h, "share_first_e6"] == (
            2 * nf * 1_000_000 + tf) // (2 * tf)
    # shares of each half sum to ~1e6 (within 24 half-up roundings)
    assert abs(out["share_first_e6"].sum() - 1_000_000) <= 12
    assert abs(out["share_second_e6"].sum() - 1_000_000) <= 12
    assert (out["delta_e6"]
            == out["share_second_e6"] - out["share_first_e6"]).all()


def test_grouped_share_ci_properties(ray_session):
    from schisma_ray.stages.stats import grouped_share_ci

    t = pa.table({"k": pa.array(["a"] * 30 + ["b"] * 70 + [None] * 5,
                                pa.string())})
    out = grouped_share_ci(
        rd.from_arrow(t).repartition(3), "k"
    ).to_pandas().set_index("k")
    assert len(out) == 2
    # null keys excluded from n entirely
    assert out["n_key"].sum() == 100
    assert out.loc["a", "share_e6"] == 300_000
    assert out.loc["a", "lo"] < 0.3 < out.loc["a", "hi"]
    assert out.loc["b", "lo"] < 0.7 < out.loc["b", "hi"]
    # shares sum to 1e6 and the bounds bracket consistently
    assert out["share_e6"].sum() == 1_000_000


@pytest.mark.parametrize("seed", [0, 1])
def test_grouped_key_entropy_bruteforce(ray_session, seed):
    import math

    from schisma_ray.stages.text import build_log2_table
    from schisma_ray.stages.stats import grouped_key_entropy

    rng = np.random.default_rng(seed)
    n = 400
    users = rng.integers(0, 12, n)
    types = rng.choice(["a", "b", "c", "d"], n)
    # one pure-single-type user: entropy must be exactly 0
    users = np.concatenate([users, np.full(20, 99)])
    types = np.concatenate([types, np.array(["a"] * 20)])
    t = pa.table({
        "u": pa.array(users, pa.int64()),
        "k": pa.array(types, pa.string()),
    })
    L = build_log2_table(1024)["l_e12"].to_numpy(zero_copy_only=False)
    out = grouped_key_entropy(
        rd.from_arrow(t).repartition(4), "u", "k", L
    ).to_pandas().set_index("u")

    import collections
    per_user = collections.defaultdict(collections.Counter)
    for u, k in zip(users, types):
        per_user[int(u)][k] += 1
    for u, cnt in per_user.items():
        nn = sum(cnt.values())
        row = out.loc[u]
        assert row["n"] == nn and row["n_keys"] == len(cnt)
        want = -sum((c / nn) * math.log2(c / nn) for c in cnt.values())
        assert abs(row["entropy_e6"] - want * 1e6) <= 1.0
    assert out.loc[99, "entropy_e6"] == 0
