"""Cross-field (multi-column) constraint validation.

The table-level analogue of a schisma ``$validate`` custom-predicate
hook (reference ``/root/reference/src/schisma.mjs:137-212`` — a hook
sees the whole value and returns ok/invalid): each rule reads SEVERAL
columns of the same row at once and emits a schisma-style violation
row (row_ref, path, code, expected, received) when the row fails.
Single-column shape/range checks stay in the schema validator
(stages/table_schema.py); the rules here are the constraints no
single-column check can express — aspect ratio, area bounds,
inter-column consistency.

Scale shape: a pure ``map_batches`` — zero shuffle, embarrassingly
parallel at 100 TB. Every rule is a vectorized Arrow expression; a row
with a null in any referenced column is SKIPPED by that rule (null-ness
is the schema validator's jurisdiction — one defect, one violation),
which also matches the SQL oracle's ``IS NOT NULL`` guards.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc


@dataclass(frozen=True)
class CrossRule:
    """One multi-column predicate.

    ``fn(batch) -> (fail_mask, received)``: a boolean Array that is
    True where the row VIOLATES the rule (False/null where it passes or
    a referenced column is null), plus a string Array of received
    values aligned with the batch.
    """

    path: str
    expected: str
    fn: Callable[[pa.Table], tuple[pa.Array, pa.Array]]
    code: str = "invalid"


def _i64(col) -> pa.Array:
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return pc.cast(col, pa.int64())


def aspect_rule(w: str = "w", h: str = "h",
                lo_e6: int = 500_000, hi_e6: int = 2_000_000) -> CrossRule:
    """w/h aspect ratio as an e6 integer (``(w * 1e6) // h`` — floor
    divide on positive ints, identical in Arrow and DuckDB) must lie in
    ``[lo_e6, hi_e6]``."""

    def fn(batch: pa.Table):
        wa, ha = _i64(batch[w]), _i64(batch[h])
        ok_in = pc.and_(pc.is_valid(wa), pc.and_(pc.is_valid(ha),
                                                 pc.not_equal(ha, 0)))
        aspect = pc.divide(pc.multiply(wa, 1_000_000), pc.if_else(
            pc.equal(pc.fill_null(ha, 0), 0), pa.scalar(1, pa.int64()), ha))
        fail = pc.and_(ok_in, pc.or_(pc.less(aspect, lo_e6),
                                     pc.greater(aspect, hi_e6)))
        return fail, pc.cast(aspect, pa.string())

    return CrossRule(
        path=f"{w}/{h}",
        expected=f"aspect_e6 in [{lo_e6}, {hi_e6}]",
        fn=fn,
    )


def area_rule(w: str = "w", h: str = "h",
              lo: int = 100, hi: int = 900) -> CrossRule:
    """Pixel area ``w * h`` must lie in ``[lo, hi]`` (the min/max
    resolution gate every image-training pipeline runs)."""

    def fn(batch: pa.Table):
        wa, ha = _i64(batch[w]), _i64(batch[h])
        ok_in = pc.and_(pc.is_valid(wa), pc.is_valid(ha))
        area = pc.multiply(wa, ha)
        fail = pc.and_(ok_in, pc.or_(pc.less(area, lo), pc.greater(area, hi)))
        return fail, pc.cast(area, pa.string())

    return CrossRule(path=f"{w}*{h}", expected=f"area in [{lo}, {hi}]", fn=fn)


def length_rule(col: str = "caption", lo: int = 1, hi: int = 256) -> CrossRule:
    """Character length of ``col`` must lie in ``[lo, hi]`` — catches
    both the empty caption and the runaway one. (Technically
    single-column, but it is a VALUE constraint the schema's
    type/required checks don't express, i.e. hook territory.)"""

    def fn(batch: pa.Table):
        c = batch[col].combine_chunks() if isinstance(
            batch[col], pa.ChunkedArray) else batch[col]
        n = pc.utf8_length(c)
        fail = pc.and_(pc.is_valid(c),
                       pc.or_(pc.less(n, lo), pc.greater(n, hi)))
        return fail, pc.cast(n, pa.string())

    return CrossRule(path=col, expected=f"length in [{lo}, {hi}]", fn=fn)


def payload_ratio_rule(bytes_col: str = "bytes", w: str = "w",
                       h: str = "h", lo_e6: int = 1_000_000) -> CrossRule:
    """Payload bytes per claimed pixel as an e6 integer
    (``octet_length(bytes) * 1e6 // (w * h)``) must be at least
    ``lo_e6`` — a DECODE-FREE truncation detector: a payload an order
    of magnitude smaller than its declared dimensions cannot decode,
    and this catches it at parquet-scan cost instead of codec cost
    (on the seeded fixture the rule separates cleanly: truncated rows
    sit under 160k e6, the smallest intact payload at 2.2M e6)."""

    def fn(batch: pa.Table):
        b = pc.cast(pc.binary_length(batch[bytes_col]), pa.int64())
        wa, ha = _i64(batch[w]), _i64(batch[h])
        area = pc.multiply(wa, ha)
        ok_in = pc.and_(
            pc.is_valid(b),
            pc.and_(pc.is_valid(area),
                    pc.greater(pc.fill_null(area, 0), 0)),
        )
        safe_area = pc.if_else(pc.greater(pc.fill_null(area, 0), 0),
                               area, pa.scalar(1, pa.int64()))
        ratio = pc.divide(pc.multiply(b, 1_000_000), safe_area)
        fail = pc.and_(ok_in, pc.less(ratio, lo_e6))
        return fail, pc.cast(ratio, pa.string())

    return CrossRule(
        path=bytes_col,
        expected=f"payload_e6_per_px >= {lo_e6}",
        fn=fn,
    )


#: the default image-table rule set (fires on the seeded fixture:
#: extreme aspect from independent w/h draws, empty + runaway captions)
IMAGE_CROSS_RULES = (aspect_rule(), area_rule(), length_rule())


def cross_field_violations(ds, rules=IMAGE_CROSS_RULES, *,
                           id_col: str = "image_id"):
    """Violation rows (row_ref, path, code, expected, received) for
    every (row, rule) failure. One streaming map_batches pass."""
    rules = tuple(rules)

    def fn(batch: pa.Table) -> pa.Table:
        parts = []
        ids = batch[id_col]
        for rule in rules:
            fail, received = rule.fn(batch)
            mask = pc.fill_null(fail, False)
            if not pc.any(mask).as_py():
                continue
            n = pc.sum(pc.cast(mask, pa.int64())).as_py() or 0
            parts.append(pa.table({
                "row_ref": ids.filter(mask),
                "path": pa.array([rule.path] * n, pa.string()),
                "code": pa.array([rule.code] * n, pa.string()),
                "expected": pa.array([rule.expected] * n, pa.string()),
                "received": received.filter(mask),
            }))
        if not parts:
            return pa.table({
                "row_ref": pa.array([], batch.schema.field(id_col).type),
                "path": pa.array([], pa.string()),
                "code": pa.array([], pa.string()),
                "expected": pa.array([], pa.string()),
                "received": pa.array([], pa.string()),
            })
        return pa.concat_tables(parts)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def fmt_magic_mismatches(ds, *, bytes_col: str = "bytes",
                         fmt_col: str = "fmt", id_col: str = "image_id"):
    """Decode-free container check: the payload's 4-byte magic header
    versus the declared format column — wrong-container rows (a jpeg
    payload labeled png) caught at parquet-scan cost, no codec, like
    ``payload_ratio_rule`` catches truncation. Emits (id, fmt,
    sniffed_fmt) for every row where they differ (null-aware: an
    unknown/absent magic with a declared fmt is a mismatch, and vice
    versa). Pure vectorized map — ``pc.binary_slice`` + three scalar
    equalities — zero shuffle.

    Magic values are the builtin codec's container signatures
    (sources/codec.py _MAGICS); the pil backend shares the real PNG /
    JPEG / RIFF prefixes for the first bytes checked here."""
    from ..sources.codec import _MAGICS

    magics = {fmt: magic[:4] for fmt, magic in _MAGICS.items()}

    def fn(batch: pa.Table) -> pa.Table:
        b = batch[bytes_col].combine_chunks()
        head = pc.binary_slice(b, 0, 4)
        sniffed = pa.nulls(len(batch), pa.string())
        for fmt, magic in magics.items():
            hit = pc.fill_null(
                pc.equal(head, pa.scalar(magic, pa.binary())), False)
            sniffed = pc.if_else(hit, fmt, sniffed)
        declared = batch[fmt_col].combine_chunks()
        # null-aware inequality: mismatch unless both null or equal
        eq = pc.fill_null(pc.equal(declared, sniffed), False)
        both_null = pc.and_(pc.is_null(declared), pc.is_null(sniffed))
        bad = pc.and_(pc.invert(eq), pc.invert(both_null))
        out = pa.table({
            id_col: batch[id_col],
            fmt_col: declared,
            "sniffed_fmt": sniffed,
        })
        return out.filter(bad)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
