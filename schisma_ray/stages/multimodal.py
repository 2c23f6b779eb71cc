"""Multimodal batch stages: decode -> transform -> re-encode / features.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata (the input_hint shape). These stages implement the standard
multimodal pipeline verbs as actor-pool ``map_batches`` transforms:

* ``ImageResize`` — decode, box-filter resample to a target size,
  re-encode (same format). Metadata (w/h/phash) updated in place.
* ``ImageFeatures`` — decode and emit a small dense feature vector
  (channel means/stds, luma histogram, phash bits) as ``list<float>`` —
  the shape an embedding model stage would produce, with the same
  actor signature (swap ``features_of`` for a model forward pass).
* ``frame_sample`` — treat a binary payload as a frame container and
  emit every k-th frame as its own row (flat_map-style row explosion);
  here frames are the rows themselves (one image per row), so the
  operator demonstrates deterministic row sampling by key hash.

The decode step uses the deterministic stand-in codec
(sources/codec.py); with PIL present the same classes work unchanged.
Undecodable rows pass through with null outputs (validation owns
reporting them).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources import codec


def _resize_box(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic box-filter resample (area average)."""
    h, w, c = pixels.shape
    ys = (np.arange(out_h + 1) * h / out_h).astype(np.int64)
    xs = (np.arange(out_w + 1) * w / out_w).astype(np.int64)
    out = np.empty((out_h, out_w, c), dtype=np.uint8)
    fp = pixels.astype(np.float32)
    for i in range(out_h):
        y0, y1 = ys[i], max(ys[i + 1], ys[i] + 1)
        row = fp[y0:y1]
        for j in range(out_w):
            x0, x1 = xs[j], max(xs[j + 1], xs[j] + 1)
            out[i, j] = row[:, x0:x1].mean(axis=(0, 1)).round()
    return out


class ImageResize:
    """Actor: resize every decodable image to (target_w, target_h)."""

    def __init__(self, target_w: int = 32, target_h: int = 32):
        self.tw = target_w
        self.th = target_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        out_blobs, ws, hs, phs = [], [], [], []
        for blob in blobs:
            try:
                pixels, fmt = codec.decode(blob)
            except (codec.CodecError, TypeError):
                out_blobs.append(None)
                ws.append(None)
                hs.append(None)
                phs.append(None)
                continue
            small = _resize_box(pixels, self.tw, self.th)
            out_blobs.append(codec.encode(small, fmt))
            ws.append(self.tw)
            hs.append(self.th)
            phs.append(codec.phash64(small))
        out = batch
        for name, vals, t in (
            ("bytes", out_blobs, pa.binary()),
            ("w", ws, batch.schema.field("w").type if "w" in batch.schema.names else pa.int32()),
            ("h", hs, batch.schema.field("h").type if "h" in batch.schema.names else pa.int32()),
            ("phash", phs, pa.int64()),
        ):
            if name in out.schema.names:
                out = out.set_column(out.schema.get_field_index(name), name,
                                     pa.array(vals, t))
            else:
                out = out.append_column(name, pa.array(vals, t))
        return out


def features_of(pixels: np.ndarray, hist_bins: int = 8) -> np.ndarray:
    """Deterministic dense features: per-channel mean/std + luma histogram."""
    fp = pixels.astype(np.float32)
    means = fp.mean(axis=(0, 1)) / 255.0
    stds = fp.std(axis=(0, 1)) / 255.0
    luma = fp.mean(axis=2).ravel()
    hist, _ = np.histogram(luma, bins=hist_bins, range=(0, 255))
    hist = hist.astype(np.float32) / max(1, luma.size)
    return np.concatenate([means, stds, hist]).astype(np.float32)


class ImageFeatures:
    """Actor: decode -> feature vector (list<float>) per row.

    The actor signature matches a model-inference stage: state (here the
    histogram config; in production the model) is built once per actor,
    batches stream through ``__call__``.
    """

    def __init__(self, hist_bins: int = 8, id_col: str = "image_id"):
        self.hist_bins = hist_bins
        self.id_col = id_col
        self.dim = 3 + 3 + hist_bins

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for blob in batch["bytes"].to_pylist():
            try:
                pixels, _ = codec.decode(blob)
            except (codec.CodecError, TypeError):
                feats.append(None)
                continue
            feats.append(features_of(pixels, self.hist_bins).tolist())
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "features": pa.array(feats, pa.list_(pa.float32())),
            }
        )


def frame_sample(ds, every_k: int = 10, key_col: str = "image_id"):
    """Deterministic 1-in-k row sampling by key hash (the frame-sampling
    access pattern for video containers: same key -> same decision on
    any cluster size).

    Decision = int(md5(key)[:8], 16) % k == 0 — md5 so the selection is
    reproducible by ANY engine (DuckDB oracle included), not just this
    process's pandas hash seed. Per-key md5 is ~1 us, noise next to the
    decode work such sampling gates."""
    import hashlib

    def fn(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].combine_chunks().to_pylist()
        mask = pa.array(
            [
                k is not None
                and int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) % every_k == 0
                for k in keys
            ]
        )
        return batch.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
