"""JS-compatible value model for the schema kernel.

The reference operates on JavaScript values; its semantics lean on
``typeof`` and on the Number/BigInt/String/Boolean constructors
(/root/reference/src/schisma.mjs:75-92, 337, 567-607). This module fixes
the Python carrier types and reimplements the coercions:

==============  =================  ==================
JS value        Python carrier     js_typeof
==============  =================  ==================
number          float              'number'
bigint          int (non-bool)     'bigint'
string          str                'string'
boolean         bool               'boolean'
null            None               'object'  (JS quirk)
undefined       UNDEFINED          'undefined'
object/array    dict/list/other    'object'
function/class  callable           'function'
==============  =================  ==================

Deliberate consequence: a Python ``int`` document value is a *bigint*,
not a *number* — write ``5.0`` where the JS corpus wrote ``5``. The
Arrow-side planner (stages/) maps Arrow integer columns explicitly, so
this strictness never leaks into table validation.
"""

from __future__ import annotations

import json
import math
import re
from typing import Any

from .result import UNSET  # noqa: F401  (re-export convenience)


class _Undefined:
    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self):
        return "undefined"

    def __bool__(self):
        return False


UNDEFINED = _Undefined()


class _Hole:
    """JS array hole: reads as undefined, serializes as null."""

    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self):
        return "<hole>"

    def __bool__(self):
        return False


HOLE = _Hole()


def is_undefined(v: Any) -> bool:
    return v is UNDEFINED or v is HOLE


class JSError(Exception):
    """Raised where the reference would throw (TypeError/SyntaxError/RangeError)."""


def js_typeof(v: Any) -> str:
    if v is UNDEFINED or v is HOLE:
        return "undefined"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "bigint"
    if isinstance(v, float):
        return "number"
    if isinstance(v, str):
        return "string"
    if callable(v) or isinstance(v, type):
        return "function"
    # null, dict, list, class instances, bytes, ... are all 'object'
    return "object"


_NUM_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")
_HEX_RE = re.compile(r"^0[xX][0-9a-fA-F]+$")
_BIN_RE = re.compile(r"^0[bB][01]+$")
_OCT_RE = re.compile(r"^0[oO][0-7]+$")


def js_number(data: Any) -> float:
    """JS ``Number(data)`` — NaN on failure, never raises."""
    if is_undefined(data):
        return math.nan
    if data is None:
        return 0.0
    if isinstance(data, bool):
        return 1.0 if data else 0.0
    if isinstance(data, (int, float)):
        return float(data)
    if isinstance(data, str):
        s = data.strip()
        if s == "":
            return 0.0
        if s in ("Infinity", "+Infinity"):
            return math.inf
        if s == "-Infinity":
            return -math.inf
        if _HEX_RE.match(s):
            return float(int(s, 16))
        if _BIN_RE.match(s):
            return float(int(s, 2))
        if _OCT_RE.match(s):
            return float(int(s, 8))
        if _NUM_RE.match(s):
            try:
                return float(s)
            except ValueError:
                return math.nan
        return math.nan
    if isinstance(data, list):
        # JS ToPrimitive(array) -> joined string, then string->number:
        # Number([]) = 0, Number([5]) = 5, Number([true]) = NaN ('true')
        return js_number(js_string(data))
    return math.nan  # plain objects


def js_bigint(data: Any) -> int:
    """JS ``BigInt(data)`` — raises JSError exactly where JS throws."""
    if is_undefined(data) or data is None:
        raise JSError(f"Cannot convert {data!r} to a BigInt")
    if isinstance(data, bool):
        return 1 if data else 0
    if isinstance(data, int):
        return data
    if isinstance(data, float):
        if not math.isfinite(data) or data != int(data):
            raise JSError(f"The number {data} cannot be converted to a BigInt")
        return int(data)
    if isinstance(data, str):
        s = data.strip()
        if s == "":
            return 0
        try:
            if _HEX_RE.match(s) or _BIN_RE.match(s) or _OCT_RE.match(s):
                return int(s, 0)
            return int(s)
        except ValueError:
            raise JSError(f"Cannot convert {data!r} to a BigInt") from None
    if isinstance(data, list):
        # JS ToPrimitive(array) -> joined string: BigInt([]) = 0, BigInt([5]) = 5
        return js_bigint(js_string(data))
    raise JSError(f"Cannot convert {type(data).__name__} to a BigInt")


def format_number(v: float) -> str:
    """JS ``String(number)`` per ECMA-262 Number::toString (radix 10).

    Shortest round-trip digits (Python repr provides them), then the
    spec's placement rule: fixed notation while the decimal exponent n
    satisfies -6 < n <= 21, exponential otherwise — with the exponent
    NOT zero-padded and carrying an explicit sign (``1e-7``, ``1e+21``),
    unlike Python repr (``1e-07``, ``1e+21``).
    """
    if math.isnan(v):
        return "NaN"
    if v == math.inf:
        return "Infinity"
    if v == -math.inf:
        return "-Infinity"
    if v == 0:
        return "0"  # JS String(-0) is '0'
    sign = "-" if v < 0 else ""
    s = repr(abs(v))
    mant, _, exp_s = s.partition("e")
    exp = int(exp_s) if exp_s else 0
    int_part, _, frac = mant.partition(".")
    digits_all = int_part + frac
    first_sig = len(digits_all) - len(digits_all.lstrip("0"))
    # value = 0.<digits> * 10^n  (n = decimal-point position)
    n = len(int_part) - first_sig + exp
    digits = digits_all[first_sig:].rstrip("0")
    k = len(digits)
    if k <= n <= 21:
        out = digits + "0" * (n - k)
    elif 0 < n <= 21:
        out = digits[:n] + "." + digits[n:]
    elif -6 < n <= 0:
        out = "0." + "0" * (-n) + digits
    else:
        e = n - 1
        m = digits[0] + ("." + digits[1:] if k > 1 else "")
        out = f"{m}e{'+' if e >= 0 else '-'}{abs(e)}"
    return sign + out


def js_string(data: Any) -> str:
    """JS ``String(data)`` for the values the kernel produces."""
    if is_undefined(data):
        return "undefined"
    if data is None:
        return "null"
    if isinstance(data, bool):
        return "true" if data else "false"
    if isinstance(data, float):
        return format_number(data)
    if isinstance(data, int):
        return str(data)  # bigint → no 'n' suffix in String()
    if isinstance(data, str):
        return data
    if isinstance(data, list):
        return ",".join("" if x is None or is_undefined(x) else js_string(x) for x in data)
    return str(data)


def js_boolean(data: Any) -> bool:
    """JS ``Boolean(data)`` truthiness."""
    if is_undefined(data) or data is None:
        return False
    if isinstance(data, bool):
        return data
    if isinstance(data, (int, float)):
        return not (data == 0 or (isinstance(data, float) and math.isnan(data)))
    if isinstance(data, str):
        return data != ""
    return True  # objects/arrays/functions are truthy


def js_json_stringify(data: Any) -> str:
    """JSON.stringify for plain dict/list/primitive values (JS number format)."""
    if data is None:
        return "null"
    if isinstance(data, bool):
        return "true" if data else "false"
    if isinstance(data, float):
        return "null" if (math.isnan(data) or math.isinf(data)) else format_number(data)
    if isinstance(data, int):
        raise JSError("Do not know how to serialize a BigInt")
    if isinstance(data, str):
        return json.dumps(data)
    if isinstance(data, list):
        return "[" + ",".join(
            "null" if is_undefined(x) else js_json_stringify(x) for x in data
        ) + "]"
    if isinstance(data, dict):
        parts = [
            f"{json.dumps(str(k))}:{js_json_stringify(v)}"
            for k, v in data.items() if not is_undefined(v)
        ]
        return "{" + ",".join(parts) + "}"
    return json.dumps(str(data))


class JSType:
    """A JS constructor function stand-in (Number, BigInt, String, Boolean, Null).

    Instances are callable like the JS constructors; the kernel's class
    check treats them via typeof probing exactly as the reference does
    (src/schisma.mjs:337).
    """

    __slots__ = ("name",)

    def __init__(self, name: str):
        self.name = name

    def __call__(self, data: Any = UNDEFINED) -> Any:
        if self.name == "Number":
            return js_number(data) if data is not UNDEFINED else math.nan
        if self.name == "BigInt":
            return js_bigint(data)
        if self.name == "String":
            return js_string(data) if data is not UNDEFINED else "undefined"
        if self.name == "Boolean":
            return js_boolean(data)
        if self.name == "Null":
            return None
        raise AssertionError(self.name)

    def __repr__(self):
        return f"<JSType {self.name}>"

    def __deepcopy__(self, memo):
        return self

    def __reduce__(self):  # pickle as the module-level singleton
        return (_get_type, (self.name,))


Number = JSType("Number")
BigInt = JSType("BigInt")
String = JSType("String")
Boolean = JSType("Boolean")
Null = JSType("Null")  # reference: Schisma.Null (src/schisma.mjs:675-677)

_SINGLETONS = {"Number": Number, "BigInt": BigInt, "String": String,
               "Boolean": Boolean, "Null": Null}


def _get_type(name: str) -> JSType:
    return _SINGLETONS[name]


#: Python builtin types accepted as schema-literal aliases.
BUILTIN_ALIASES: dict[Any, JSType] = {
    float: Number,
    int: BigInt,
    str: String,
    bool: Boolean,
}
