"""Property-based codec tests (hypothesis): round-trip fidelity holds
for arbitrary dimensions including sub-block (<8 px) and 1-px images."""

import numpy as np
from hypothesis import given, settings, strategies as st

from schisma_ray.sources import codec


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 64),
    h=st.integers(1, 64),
    fmt=st.sampled_from(list(codec.FORMATS)),
    seed=st.integers(0, 2**31 - 1),
)
def test_roundtrip_psnr(w, h, fmt, seed):
    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    out, f = codec.decode(codec.encode(px, fmt))
    assert f == fmt
    assert out.shape == px.shape
    p = codec.psnr(px, out)
    assert p == float("inf") or p >= 40.0  # the conform-fidelity bar


@settings(max_examples=30, deadline=None, derandomize=True)
@given(
    w=st.integers(8, 48),
    h=st.integers(8, 48),
    seed=st.integers(0, 2**31 - 1),
)
def test_phash_robust_under_lossy_roundtrip(w, h, seed):
    """Avg-hash bits near the mean threshold can flip under quantization;
    robustness (small Hamming distance), not equality, is the property —
    the pipeline's stored phash is computed from source pixels, so exact
    equality is never load-bearing. Random noise images are the worst
    case for avg-hash (every 8x8 cell mean sits near the global mean);
    hypothesis found inputs with 4 flipped bits, so the bound is 6 —
    still far inside the >= 32-bit expected distance of unrelated
    images."""
    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    ph = codec.phash64(px)
    for fmt in ("jpeg", "webp"):
        out, _ = codec.decode(codec.encode(px, fmt))
        ph2 = codec.phash64(out)
        hamming = bin((ph ^ ph2) & ((1 << 64) - 1)).count("1")
        assert hamming <= 6


@settings(max_examples=40, deadline=None)
@given(data=st.binary(min_size=0, max_size=64))
def test_decode_never_crashes_on_garbage(data):
    try:
        codec.decode(data)
    except codec.CodecError:
        pass  # the only acceptable failure mode
