"""Shared encoding between the Python kernel and the node reference harness.

Mirrors tools/ref_harness.mjs: decodes case schemas/docs into kernel
inputs, encodes kernel outputs into the tagged-JSON form the harness
emits, so golden fixtures compare structurally.
"""

from __future__ import annotations

import math
from typing import Any

from schisma_ray.schema import (
    BigInt,
    Boolean,
    Null,
    Number,
    SchemaResult,
    String,
    UNDEFINED,
    UNSET,
)
from schisma_ray.schema.jstypes import HOLE, js_number, js_string, js_typeof

CLASSES = {"Number": Number, "BigInt": BigInt, "String": String,
           "Boolean": Boolean, "Null": Null}

# Hook registry — semantics identical to tools/ref_harness.mjs.
VALIDATORS = {
    "always_true": lambda v, dot: True,
    "always_undefined": lambda v, dot: None,
    "always_false": lambda v, dot: False,
    "is_positive": lambda v, dot: isinstance(v, float) and v > 0,
    "msg_if_neg": lambda v, dot: (
        "must be non-negative" if isinstance(v, float) and v < 0 else None
    ),
    "obj_if_neg": lambda v, dot: (
        {"expected": ">=0", "received": v}
        if isinstance(v, float) and v < 0
        else True
    ),
    "max_len_5": lambda v, dot: (
        {"expected": "<=5 chars", "received": float(len(v))}
        if isinstance(v, str) and len(v) > 5
        else True
    ),
}
UNMARSHALS = {
    "identity": lambda v: v,
    "to_number": lambda v: js_number(v),
    "upper": lambda v: js_string(v).upper(),
}
DEFAULT_FNS = {
    "default_seven": lambda d: 7.0,
    "default_from_data": lambda d: "empty" if d is UNDEFINED else js_string(d),
}


def dec_value(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, list):
        return [dec_value(x) for x in v]
    if isinstance(v, dict):
        if v.get("$undef"):
            return UNDEFINED
        if "$bigint" in v:
            return int(v["$bigint"])
        if "$num" in v:
            return float(v["$num"])
        if "$fn" in v:
            return CLASSES[v["$fn"]]
        return {k: dec_value(x) for k, x in v.items()}
    if isinstance(v, bool):
        return v
    if isinstance(v, int):
        return float(v)  # plain JSON numbers are JS numbers
    return v


def dec_schema(s: Any) -> Any:
    from schisma_ray.schema import SchemaNode

    if s is None or (isinstance(s, dict) and s.get("$null")):
        return None
    if "$node" in s:
        return SchemaNode(dec_schema(s["$node"]))
    if "$class" in s:
        return CLASSES[s["$class"]]
    if "$arr" in s:
        return [dec_schema(x) for x in s["$arr"]]
    if "$lit" in s:
        return dec_value(s["$lit"])
    if "$obj" in s:
        out = {}
        for k, v in s["$obj"].items():
            out[k] = [dec_schema(x) for x in v] if k.startswith("$/") else dec_schema(v)
        return out
    if "$sobj" in s:
        src, out = s["$sobj"], {}
        if "typeof" in src:
            out["$typeof"] = [dec_schema(x) for x in src["typeof"]]
        if "type" in src:
            out["$type"] = dec_schema(src["type"])
        if "default" in src:
            out["$default"] = dec_value(src["default"])
        if "defaultFn" in src:
            out["$default"] = DEFAULT_FNS[src["defaultFn"]]
        if "required" in src:
            out["$required"] = src["required"]
        if "validate" in src:
            out["$validate"] = VALIDATORS[src["validate"]]
        if "unmarshal" in src:
            out["$unmarshal"] = UNMARSHALS[src["unmarshal"]]
        return out
    raise ValueError(f"bad schema encoding: {s!r}")


def enc_value(v: Any) -> Any:
    if v is HOLE:
        return None
    if v is UNDEFINED or v is UNSET:
        return {"$undef": True}
    if v is None:
        return None
    if isinstance(v, SchemaResult):
        return enc_result(v)
    if isinstance(v, bool):
        return v
    if isinstance(v, int):
        return {"$bigint": str(v)}
    if isinstance(v, float):
        if math.isnan(v) or math.isinf(v):
            return {"$num": js_string(v)}
        return v
    if isinstance(v, str):
        return v
    if v in (Number, BigInt, String, Boolean, Null):
        return {"$fn": v.name}
    if isinstance(v, list):
        # HOLE models a JS array hole -> JSON null; explicit undefined keeps its tag
        return [None if x is HOLE else enc_value(x) for x in v]
    if isinstance(v, dict):
        return {k: enc_value(x) for k, x in v.items()}
    if isinstance(v, type) or callable(v):
        return {"$fn": getattr(v, "__name__", "anonymous")}
    return str(v)


def enc_result(r: SchemaResult) -> dict:
    d: dict[str, Any] = {"code": r.code}
    for field, name in (
        ("where", "where"), ("expected", "expected"),
        ("expected_schema", "expectedSchema"), ("received", "received"),
        ("value", "value"), ("type_index", "__typeIndex"),
    ):
        v = getattr(r, field)
        if v is not UNSET and v is not UNDEFINED:
            d[name] = v if name in ("where", "__typeIndex") and isinstance(v, int) else enc_value(v)
    if r.errors is not None:
        d["errors"] = [enc_result(e) for e in r.errors]
    if r.results is not None:
        d["results"] = [enc_result(e) for e in r.results]
    if r.message:
        d["message"] = r.message
    return d


def normalize(v: Any) -> Any:
    """Normalize parsed JSON for comparison (int/float unification)."""
    if isinstance(v, bool):
        return v
    if isinstance(v, int):
        return float(v)
    if isinstance(v, list):
        return [normalize(x) for x in v]
    if isinstance(v, dict):
        return {k: normalize(x) for k, x in sorted(v.items())}
    return v
