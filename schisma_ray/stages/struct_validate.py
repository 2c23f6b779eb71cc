"""Native ``pa.struct`` column validation — vectorized nested descent.

SURVEY.md §1.4 maps schisma's nested objects to Arrow struct columns;
the row kernel handles them as Python dicts (exact reference
semantics), and ``JsonColumnValidator`` handles JSON-string columns.
This stage is the third shape: a REAL struct column validated without
leaving Arrow — every field check is one compute-kernel pass over the
child array (``pc.struct_field``), nested structs recurse with dotted
paths, and a null child under a non-null parent is schisma's
``missing key`` (the same null-as-undefined convention as
table_schema.py).

Scale shape: pure ``map_batches``, zero shuffle; violations emit as
(id, path, code, expected) rows — the reference's flattened result
contract (src/schisma_result.mjs:34-57 codes).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .table_schema import Check


@dataclass
class StructField:
    """One struct member: ``required`` drives missing-key emission;
    ``checks`` are the vectorized invariants (range_check / in_set /
    ...); ``fields`` makes this member itself a nested struct."""

    required: bool = True
    checks: list[Check] = field(default_factory=list)
    fields: dict[str, "StructField"] | None = None


def _np_bool(arr) -> np.ndarray:
    return pc.fill_null(arr, False).to_numpy(zero_copy_only=False)


def _validate_node(ids: pa.Array, arr: pa.Array, path: str,
                   spec: dict[str, StructField], parent_valid: np.ndarray,
                   out: dict) -> None:
    for name, fs in spec.items():
        child = pc.struct_field(arr, name)
        child_valid = _np_bool(pc.is_valid(child)) & parent_valid
        if fs.required:
            missing = parent_valid & ~_np_bool(pc.is_valid(child))
            if missing.any():
                idx = np.flatnonzero(missing)
                out["id"].append(ids.take(pa.array(idx)))
                n = len(idx)
                out["path"].extend([f"{path}.{name}"] * n)
                out["code"].extend(["missing key"] * n)
                out["expected"].extend([None] * n)
        for chk in fs.checks:
            bad = chk.fn(child) & child_valid
            if bad.any():
                idx = np.flatnonzero(bad)
                out["id"].append(ids.take(pa.array(idx)))
                n = len(idx)
                out["path"].extend([f"{path}.{name}"] * n)
                out["code"].extend(["invalid"] * n)
                out["expected"].extend([chk.expected] * n)
        if fs.fields:
            _validate_node(ids, child, f"{path}.{name}", fs.fields,
                           child_valid, out)


def validate_struct_column(ds, *, col: str, id_col: str,
                           spec: dict[str, StructField],
                           required: bool = True):
    """Violations Dataset (id, path, code, expected) for a struct
    column: missing required members (null child under non-null
    parent), failed vectorized checks, recursing into nested structs.
    A null top-level struct on a required column is its own
    ``missing key`` at the column path."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks()
        arr = batch[col].combine_chunks()
        parent_valid = _np_bool(pc.is_valid(arr))
        out = {"id": [], "path": [], "code": [], "expected": []}
        if required:
            missing = ~parent_valid
            if missing.any():
                idx = np.flatnonzero(missing)
                out["id"].append(ids.take(pa.array(idx)))
                n = len(idx)
                out["path"].extend([col] * n)
                out["code"].extend(["missing key"] * n)
                out["expected"].extend([None] * n)
        _validate_node(ids, arr, col, spec, parent_valid, out)
        id_arr = (
            pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                              else a for a in out["id"]])
            if out["id"] else pa.array([], ids.type)
        )
        return pa.table(
            {
                id_col: id_arr,
                "path": pa.array(out["path"], pa.string()),
                "code": pa.array(out["code"], pa.string()),
                "expected": pa.array(out["expected"], pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def validate_list_column(ds, *, col: str, id_col: str,
                         element_checks: list[Check] = (),
                         min_len: int | None = None,
                         max_len: int | None = None):
    """Native ``pa.list_`` column validation — the array-side twin of
    ``validate_struct_column``: length invariants per row plus
    vectorized element checks over the FLATTENED child array (one
    kernel pass for the whole batch; violating elements report their
    0-based indexed path ``col.IDX`` — schisma's array path shape).
    Null lists on a required column are the caller's concern
    (compose with the table validator); null lists here emit nothing."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks()
        arr = batch[col].combine_chunks()
        out_ids, paths, codes, expect = [], [], [], []

        lens = pc.list_value_length(arr)
        lens_np = pc.fill_null(lens, -1).to_numpy(zero_copy_only=False)
        valid = lens_np >= 0
        if min_len is not None or max_len is not None:
            bad = np.zeros(len(arr), bool)
            if min_len is not None:
                bad |= valid & (lens_np < min_len)
            if max_len is not None:
                bad |= valid & (lens_np > max_len)
            if bad.any():
                idx = np.flatnonzero(bad)
                out_ids.append(ids.take(pa.array(idx)))
                desc = (f"length in [{min_len}, {max_len}]"
                        if min_len is not None and max_len is not None
                        else f"length >= {min_len}" if min_len is not None
                        else f"length <= {max_len}")
                n = len(idx)
                paths.extend([col] * n)
                codes.extend(["invalid"] * n)
                expect.extend([desc] * n)

        if element_checks:
            flat = pc.list_flatten(arr)
            parent = pc.list_parent_indices(arr).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            starts = np.zeros(len(arr), np.int64)
            ln = np.where(lens_np < 0, 0, lens_np)
            if len(ln) > 1:
                starts[1:] = np.cumsum(ln)[:-1]
            pos = np.arange(len(flat), dtype=np.int64) - starts[parent]
            for chk in element_checks:
                bad = chk.fn(flat) & _np_bool(pc.is_valid(flat))
                if bad.any():
                    idx = np.flatnonzero(bad)
                    out_ids.append(ids.take(pa.array(parent[idx])))
                    paths.extend(
                        f"{col}.{p}" for p in pos[idx]
                    )
                    n = len(idx)
                    codes.extend(["invalid"] * n)
                    expect.extend([chk.expected] * n)

        id_arr = (
            pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                              else a for a in out_ids])
            if out_ids else pa.array([], ids.type)
        )
        return pa.table(
            {
                id_col: id_arr,
                "path": pa.array(paths, pa.string()),
                "code": pa.array(codes, pa.string()),
                "expected": pa.array(expect, pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
