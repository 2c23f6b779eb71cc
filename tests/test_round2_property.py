"""Property tests for round-2 pure kernels (no Ray in the loop) plus
randomized Ray-operator equivalences on a few seeds.

* simhash64_batch == scalar simhash64 for arbitrary unicode text lists
* MinHasher.signatures_batch == per-doc signature() (chunking included)
* _mix_bucket stays in range and is deterministic
* approx_quantiles tracks exact quantiles within one bin width
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from schisma_ray.stages.components import _mix_bucket, _union_find
from schisma_ray.stages.dedup import MinHasher, simhash64, simhash64_batch

texts_strategy = st.lists(
    st.one_of(
        st.none(),
        st.text(max_size=80),
        st.text(alphabet=" abcdef", max_size=200),  # whitespace-heavy
    ),
    min_size=0,
    max_size=12,
)


@settings(max_examples=60, deadline=None)
@given(texts_strategy)
def test_simhash_batch_matches_scalar(texts):
    got = simhash64_batch(texts)
    exp = np.asarray([simhash64(t or "") for t in texts], dtype=np.int64)
    assert np.array_equal(got, np.asarray(exp, dtype=np.int64))


@settings(max_examples=30, deadline=None)
@given(texts_strategy)
def test_minhash_batch_matches_scalar(texts):
    m = MinHasher("text", "doc_id", num_perm=16)
    m._CHUNK_TOKENS = 7  # force many tiny chunks through the reduceat path
    got = m.signatures_batch(texts)
    exp = np.stack([m.signature(t or "") for t in texts]) if texts else got
    assert np.array_equal(got, exp)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=50),
       st.sampled_from([2, 16, 64, 100]))
def test_mix_bucket_range_and_determinism(nodes, num_buckets):
    arr = np.asarray(nodes, dtype=np.int64)
    b1 = _mix_bucket(arr, num_buckets)
    b2 = _mix_bucket(arr, num_buckets)
    assert np.array_equal(b1, b2)
    assert b1.min() >= 0 and b1.max() < num_buckets


@settings(max_examples=40, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 60), st.integers(0, 60)), min_size=0, max_size=80))
def test_union_find_label_is_component_min(edges):
    labels = _union_find([(a, b) for a, b in edges])
    # every label must be reachable and be <= its node; applying the
    # labeling twice is a fixpoint (path compression complete)
    for node, lbl in labels.items():
        assert lbl <= node
        assert labels.get(lbl, lbl) == lbl


def test_approx_quantiles_within_bin_width(ray_session):
    import ray.data as rd

    from schisma_ray.stages.rank import approx_quantiles, exact_quantiles

    rng = np.random.default_rng(5)
    vals = rng.exponential(scale=100.0, size=20_000)
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.float64())})).repartition(8)
    qs = [0.1, 0.5, 0.9, 0.99]
    approx = approx_quantiles(ds, "x", qs, bins=2048).to_pydict()["value"]
    exact = exact_quantiles(ds, "x", qs).to_pydict()["value"]
    bin_w = (vals.max() - vals.min()) / 2048
    for a, e in zip(approx, exact):
        assert abs(a - e) <= bin_w + 1e-9, (a, e, bin_w)


def test_approx_quantiles_constant_column(ray_session):
    import ray.data as rd

    from schisma_ray.stages.rank import approx_quantiles

    ds = rd.from_arrow(pa.table({"x": pa.array([7.0] * 100, pa.float64())}))
    out = approx_quantiles(ds, "x", [0.0, 0.5, 1.0]).to_pydict()
    assert out["value"] == [7.0, 7.0, 7.0]
