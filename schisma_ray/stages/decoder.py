"""Decoder stage: actor-pool validation/conform of image bytes.

The reference's ``$unmarshal`` + ``$validate`` pair (src/schisma.mjs:
138-172, test/class.mjs:31-62) is how one validates "a value that must
be constructed before checking"; for the image table that construction
is *decoding*, so it runs as a stateful ``map_batches`` actor pool:

    ds.map_batches(DecodeValidator(), batch_format="pyarrow",
                   batch_size=256, concurrency=(2, 8), num_cpus=1)

* ``DecodeValidator`` — decodes ``bytes`` and checks the stored
  ``w``/``h``/``fmt`` against the decoded truth; emits ``invalid`` rows
  (the reference's ``$validate`` failure code) with check='decode'.
* ``DecodeConformer`` — repairs metadata from the decoded truth (the
  conform direction: coerce the value to satisfy the invariant), and
  replaces undecodable payloads with a deterministic placeholder.

Batch size should stay small (bytes-heavy rows); the actor pool isolates
codec state and lets Ray scale the pool independently of the cheap
schema stage. Decoded pixels never leave the stage (no pixel
materialization across stage boundaries).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources import codec
from ..sources.image_table import VIOLATION_SCHEMA

_PLACEHOLDER_FMT = "png"


def _placeholder() -> tuple[bytes, int, int, int]:
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    return codec.encode(px, _PLACEHOLDER_FMT), 8, 8, codec.phash64(px)


class DecodeValidator:
    """Actor: decode + invariant checks -> violations table."""

    def __init__(self, full_decode: bool = True, report_missing_bytes: bool = True,
                 backend: str | None = None):
        # full_decode=False uses header sniffing only (no decompression):
        # the cheap path for when only dims/format labels are audited.
        # report_missing_bytes=False when a fused schema stage already
        # owns the bytes null check (avoids duplicate rows).
        # backend selects the codec implementation ("builtin"/"pil") and
        # is applied HERE — actor constructors run once per worker
        # process, which is where module state must be set (a driver-side
        # set_backend never reaches the pool).
        if backend is not None:
            codec.set_backend(backend)
        self.full_decode = full_decode
        self.report_missing_bytes = report_missing_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        refs, paths, codes, exps, recs, checks = [], [], [], [], [], []

        def add(i, path, expected, received, code="invalid", check="decode"):
            refs.append(ids[i])
            paths.append(path)
            codes.append(code)
            exps.append(expected)
            recs.append(received)
            checks.append(check)

        for i, blob in enumerate(blobs):
            if blob is None:
                # this stage owns the bytes column (the schema stage runs
                # on a bytes-free projection), so the required-null check
                # lands here
                if self.report_missing_bytes:
                    add(i, "bytes", None, None, code="missing key", check="schema")
                continue
            if self.full_decode:
                try:
                    pixels, actual_fmt = codec.decode(blob)
                    ah, aw = pixels.shape[0], pixels.shape[1]
                except codec.CodecError:
                    add(i, "bytes", "decodable image", "undecodable")
                    continue
            else:
                dims = codec.sniff_dims(blob)
                actual_fmt = codec.sniff_format(blob)
                if dims is None or actual_fmt is None:
                    add(i, "bytes", "decodable image", "undecodable")
                    continue
                aw, ah = dims
            if ws[i] is not None and ws[i] != aw:
                add(i, "w", str(aw), str(ws[i]))
            if hs[i] is not None and hs[i] != ah:
                add(i, "h", str(ah), str(hs[i]))
            if fmts[i] is not None and fmts[i] != actual_fmt:
                add(i, "fmt", actual_fmt, fmts[i])
        n = len(refs)
        return pa.Table.from_arrays(
            [
                pa.array(refs, pa.string()),
                pa.array(paths, pa.string()),
                pa.array(codes, pa.string()),
                pa.array(exps, pa.string()),
                pa.array(recs, pa.string()),
                pa.array([None] * n, pa.string()),
                pa.array(checks, pa.string()),
            ],
            schema=VIOLATION_SCHEMA,
        )


class DecodeConformer:
    """Actor: repair w/h/fmt/phash from the decoded truth.

    Undecodable payloads become a deterministic placeholder image (the
    conform-with-default path, C4). Pixels of decodable rows are never
    re-encoded — label repairs are metadata-only, so decoded-pixel
    fidelity is exact (PSNR = inf).
    """

    def __init__(self, fix_phash: bool = False, backend: str | None = None):
        if backend is not None:
            codec.set_backend(backend)
        self.fix_phash = fix_phash
        self.placeholder = _placeholder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        phashes = batch["phash"].to_pylist()
        for i, blob in enumerate(blobs):
            if blob is None:
                blob, aw, ah, ph = self.placeholder
                blobs[i], ws[i], hs[i] = blob, aw, ah
                fmts[i], phashes[i] = _PLACEHOLDER_FMT, ph
                continue
            try:
                pixels, actual_fmt = codec.decode(blob)
            except codec.CodecError:
                blob, aw, ah, ph = self.placeholder
                blobs[i], ws[i], hs[i] = blob, aw, ah
                fmts[i], phashes[i] = _PLACEHOLDER_FMT, ph
                continue
            ws[i] = pixels.shape[1]
            hs[i] = pixels.shape[0]
            fmts[i] = actual_fmt
            if self.fix_phash:
                phashes[i] = codec.phash64(pixels)
        out = batch
        for name, vals, t in (
            ("bytes", blobs, pa.binary()),
            ("w", ws, batch.schema.field("w").type),
            ("h", hs, batch.schema.field("h").type),
            ("fmt", fmts, pa.string()),
            ("phash", phashes, pa.int64()),
        ):
            idx = out.schema.get_field_index(name)
            out = out.set_column(idx, name, pa.array(vals, t))
        return out
