"""Property tests for the corpus-prep kernels (pure logic — batch fns
called directly on Arrow tables, no Ray in the loop).

* chunk_text batch fn == the plain-Python window reference for
  arbitrary unicode text (codepoint slicing, empty-doc chunk)
* _word_ngrams == brute-force n-gram set under the single-space split
* _md5_bucket determinism + range
* cm_estimate never undercounts vs true frequencies
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from schisma_ray.stages.corpus import _md5_bucket, _word_ngrams


def _py_chunks(text, size, stride):
    out, start, k = [], 0, 0
    while start < max(len(text), 1):
        out.append((k, text[start : start + size]))
        start += stride
        k += 1
    return out


@settings(max_examples=150, deadline=None)
@given(
    texts=st.lists(st.text(max_size=300), min_size=1, max_size=8),
    size=st.integers(1, 100),
    stride=st.integers(1, 100),
)
def test_chunk_batch_fn_matches_reference(texts, size, stride):
    from schisma_ray.stages import corpus

    # call the inner batch fn via a 1-stage fake: build the same closure
    captured = {}

    class FakeDs:
        def map_batches(self, fn, **kw):
            captured["fn"] = fn
            return None

    corpus.chunk_text(FakeDs(), size=size, stride=stride)
    fn = captured["fn"]
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = fn(batch)
    got: dict[int, list] = {i: [] for i in range(len(texts))}
    for rid, idx, chunk in zip(
        out["doc_id"].to_pylist(), out["chunk_idx"].to_pylist(),
        out["chunk_text"].to_pylist(),
    ):
        got[rid].append((idx, chunk))
    for i, text in enumerate(texts):
        assert sorted(got[i]) == _py_chunks(text, size, stride)


@settings(max_examples=200, deadline=None)
@given(text=st.text(alphabet=" abcxyz", max_size=120), n=st.integers(1, 6))
def test_word_ngrams_bruteforce(text, n):
    w = text.split(" ")
    want = set()
    for i in range(len(w) - n + 1):
        want.add(" ".join(w[i : i + n]))
    assert _word_ngrams(text, n) == want


@settings(max_examples=50, deadline=None)
@given(vals=st.lists(st.one_of(st.integers(), st.text(max_size=20)), max_size=50))
def test_md5_bucket_deterministic_in_range(vals):
    a = _md5_bucket(vals)
    b = _md5_bucket(vals)
    assert (a == b).all()
    assert ((a >= 0) & (a < 10000)).all()
    for v, bucket in zip(vals, a):
        assert bucket == int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) % 10000


@settings(max_examples=50, deadline=None)
@given(
    keys=st.lists(st.integers(0, 30), min_size=1, max_size=400),
    w=st.sampled_from([64, 256, 4096]),
)
def test_count_min_never_undercounts(keys, w):
    from schisma_ray.stages.stats import CountMin, cm_estimate

    d = 4
    cm = CountMin("k", w=w, d=d)
    mat = cm.accumulate_block(
        np.zeros((d, w), dtype=np.int64),
        pa.table({"k": pa.array(keys, pa.int64())}),
    )
    uniq = sorted(set(keys))
    est = cm_estimate(mat, pa.array(uniq, pa.int64()), w, d)
    true = np.array([keys.count(u) for u in uniq])
    assert (est >= true).all()
