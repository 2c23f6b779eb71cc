"""Round-5 property tests: hypothesis brute-force + partition
invariance for the new operator batch."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st




def test_event_transitions_property(ray_session):
    from schisma_ray.stages.window import event_transition_counts

    @settings(max_examples=15, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 50),
                              st.sampled_from("abc")),
                    min_size=0, max_size=60),
           st.integers(2, 5))
    def check(rows, parts):
        t = pa.table({
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
        })
        out = event_transition_counts(
            rd.from_arrow(t).repartition(parts)).to_pandas()
        got = {(r.prev_type, r.next_type): r.n for r in out.itertuples()}
        want: dict = {}
        df = pd.DataFrame({
            "event_id": range(len(rows)),
            "ts": [r[1] for r in rows],
            "user_id": [r[0] for r in rows],
            "event_type": [r[2] for r in rows],
        })
        for _, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
            ty = g["event_type"].tolist()
            for a, b in zip(ty, ty[1:]):
                want[(a, b)] = want.get((a, b), 0) + 1
        assert got == want

    check()


def test_weighted_median_property(ray_session):
    from schisma_ray.stages.rank import grouped_weighted_median

    @settings(max_examples=10, deadline=None)
    @given(st.lists(st.tuples(st.sampled_from("AB"),
                              st.integers(1, 15),      # value
                              st.integers(1, 4)),      # weight
                    min_size=1, max_size=40),
           st.integers(2, 5))
    def check(rows, parts):
        ds = rd.from_arrow(pa.table({
            "f": pa.array([r[0] for r in rows], pa.string()),
            "v": pa.array([float(r[1]) for r in rows], pa.float64()),
            "w": pa.array([float(r[2]) for r in rows], pa.float64()),
        })).repartition(parts)
        out = grouped_weighted_median(ds, "f", "v", "w")
        got = dict(zip(out["f"].to_pylist(), out["wmedian"].to_pylist()))
        df = pd.DataFrame([(r[0], r[1], r[2]) for r in rows],
                          columns=["f", "v", "w"])
        for f, g in df.groupby("f"):
            agg = g.groupby("v")["w"].sum().sort_index()
            cum = agg.cumsum()
            want = float(cum.index[(2 * cum >= agg.sum()).values.argmax()])
            assert got[f] == want

    check()


def test_trend_slope_matches_duckdb_regr_slope(ray_session):
    """The integer-moment formula must agree with DuckDB's native
    regr_slope at 6dp on a realistic daily-count table."""
    import duckdb

    from schisma_ray.stages.stats import grouped_trend_slope

    day = 86_400_000_000
    rng = np.random.default_rng(11)
    rows = []
    for ty in ("a", "b", "c"):
        for d in range(14):
            for _ in range(int(rng.integers(1, 30))):
                rows.append((ty, d * day + int(rng.integers(0, day))))
    t = pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    })
    out = grouped_trend_slope(
        rd.from_arrow(t).repartition(5), "event_type").to_pandas()
    got = dict(zip(out["event_type"], out["slope"]))
    con = duckdb.connect()
    con.register("events", t)
    ref = con.execute("""
        WITH d AS (SELECT event_type,
                          CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                          count(*) AS cnt
                     FROM events GROUP BY 1, 2)
        SELECT event_type, round(regr_slope(cnt, day), 6) FROM d GROUP BY 1
    """).fetchall()
    for ty, slope in ref:
        assert abs(got[ty] - slope) <= 1e-6, (ty, got[ty], slope)


def test_char_exact_substr_partition_invariant(ray_session):
    from schisma_ray.stages.dedup import exact_substr_spans

    boiler = "一二三四五六七八九十"
    texts = [f"{'x' * i}{boiler}{'y' * (i % 3)}" for i in range(12)]
    t = pa.table({
        "doc_id": pa.array(range(12), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    outs = []
    for parts in (1, 3, 7):
        out = exact_substr_spans(
            rd.from_arrow(t).repartition(parts), "text", "doc_id",
            k=10, granularity="char").to_pandas()
        outs.append(sorted(map(tuple, out.values.tolist())))
    assert outs[0] == outs[1] == outs[2]
    assert len(outs[0]) == 12  # every doc holds the boilerplate run
