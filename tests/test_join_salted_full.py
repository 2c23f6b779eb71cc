"""Round-4 join additions: skew-aware salted shuffle join and the
full-outer reconciliation join (completing the join-type matrix)."""

import numpy as np
import pyarrow as pa
import ray.data as rd


def _facts(n=500, hot_frac=0.6, seed=3):
    """Fact table with one HOT key: `hot_frac` of rows share key 7."""
    rng = np.random.default_rng(seed)
    keys = np.where(
        rng.random(n) < hot_frac, 7, rng.integers(0, 40, n)
    ).astype(np.int64)
    return pa.table(
        {
            "fid": pa.array(np.arange(n, dtype=np.int64)),
            "k": pa.array(keys),
            "x": pa.array(rng.integers(0, 1000, n).astype(np.int64)),
        }
    )


def _dim():
    ks = np.arange(0, 40, 2, dtype=np.int64)  # half the keys match
    return pa.table(
        {"dk": pa.array(ks), "label": pa.array([f"L{k}" for k in ks])}
    )


def _sorted_rows(t: pa.Table, cols):
    df = t.select(cols).to_pandas()
    return sorted(map(tuple, df.astype(str).to_numpy().tolist()))


def test_salted_join_matches_unsalted(ray_session):
    from schisma_ray.stages.join import salted_shuffle_join, shuffle_hash_join

    facts, dim = _facts(), _dim()
    ds = rd.from_arrow(facts).repartition(8)
    plain = shuffle_hash_join(
        rd.from_arrow(facts).repartition(8), rd.from_arrow(dim),
        on="k", right_on="dk",
    )
    salted = salted_shuffle_join(
        ds, rd.from_arrow(dim), on="k", right_on="dk",
        salt_on="fid", salt=4,
    )
    cols = ["fid", "k", "x", "label"]
    a = _sorted_rows(pa.Table.from_pandas(plain.to_pandas()), cols)
    b = _sorted_rows(pa.Table.from_pandas(salted.to_pandas()), cols)
    assert a == b
    assert len(a) > 0
    # no salt plumbing may leak into the output schema
    assert set(salted.schema().names) == set(cols)


def test_salted_join_left_outer_keeps_unmatched(ray_session):
    from schisma_ray.stages.join import salted_shuffle_join

    facts, dim = _facts(200), _dim()
    out = salted_shuffle_join(
        rd.from_arrow(facts), rd.from_arrow(dim), on="k", right_on="dk",
        salt_on="fid", salt=3, how="left outer",
    ).to_pandas()
    assert len(out) == 200  # every fact row survives exactly once
    odd = out[out.k % 2 == 1]
    assert len(odd) > 0 and odd.label.isna().all()
    even = out[out.k % 2 == 0]
    assert even.label.notna().all()


def test_salted_join_spreads_hot_key(ray_session):
    """The hot key's fact rows must land in more than one salt bucket —
    the whole point of the operator."""
    from schisma_ray.stages._bucket import key_bucket

    facts = _facts()
    hot = facts.filter(pa.compute.equal(facts["k"], 7))
    salts = key_bucket(hot["fid"].combine_chunks(), 4).to_numpy()
    assert len(np.unique(salts)) > 1


def test_full_outer_join_both_null_sides(ray_session):
    from schisma_ray.stages.join import full_outer_join

    left = pa.table(
        {"k": pa.array([1, 2, 3], pa.int64()),
         "v": pa.array(["a", "b", "c"])}
    )
    right = pa.table(
        {"rk": pa.array([2, 3, 4], pa.int64()),
         "w": pa.array(["x", "y", "z"])}
    )
    out = full_outer_join(
        rd.from_arrow(left), rd.from_arrow(right), on="k", right_on="rk",
    ).to_pandas().sort_values("k").reset_index(drop=True)
    assert out.k.tolist() == [1, 2, 3, 4]  # right key coalesced into k
    assert out.v.tolist()[:3] == ["a", "b", "c"] and out.v.isna().tolist()[3]
    assert out.w.isna().tolist() == [True, False, False, False]


def test_catalog_queries_smoke(ray_session):
    from schisma_ray.pipelines.catalog import (
        q_events_enriched_salted,
        q_orders_customer_full,
    )

    sf = "/root/testdata/sf0.001"
    salted = q_events_enriched_salted(sf)
    assert salted.num_rows > 0
    full = q_orders_customer_full(sf)
    df = full.to_pandas()
    # the F-status filter makes both null sides live
    assert df.n_orders.isna().any() or df.c_name.isna().any()


def test_winsorize_known_values(ray_session):
    from schisma_ray.stages.rank import winsorize

    vals = list(range(1, 101))  # 1..100
    t = pa.table({"i": pa.array(range(100), pa.int64()),
                  "v": pa.array(vals, pa.float64())})
    # P05 rank = floor(99*0.05)+1 = 5th value = 5; P95 -> 95
    out = (
        winsorize(rd.from_arrow(t).repartition(4), "v",
                  lo_q=0.05, hi_q=0.95)
        .to_pandas().sort_values("i")
    )
    w = out.v_winsorized.tolist()
    assert min(w) == 5.0 and max(w) == 95.0
    assert w[0] == 5.0 and w[-1] == 95.0 and w[49] == 50.0
    # untouched middle stays identical to the input
    assert out.v.tolist()[10:90] == w[10:90]
