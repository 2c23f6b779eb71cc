"""Row-level schema kernel: compile / validate / conform / create.

This is a from-scratch Python implementation of the semantics of the
reference validator (kettek/schisma, /root/reference/src/schisma.mjs):

* ``SchemaNode.__init__`` mirrors ``_understand`` (schisma.mjs:25-95):
  six node kinds (Array, Null, SchismaObject, Object, Class, Primitive).
* ``validate`` mirrors ``validate``/``_validate`` (schisma.mjs:109-358),
  including the union-resolution heuristic ``_getHeuristics``
  (schisma.mjs:359-394) whose +2/-1/+1 scoring and first-wins tie-break
  drive ``type_index``, which ``conform`` repair dispatch depends on.
* ``conform`` mirrors ``conform``/``_conformFromErrors``
  (schisma.mjs:407-524); we pin *code* behavior, not README behavior
  (``removeUnexpected``/``insertMissing``/``matchArray`` are accepted
  but never read by the reference — same here).
* ``create`` mirrors ``create``/``createProperty`` (schisma.mjs:536-652)
  including the coercion kernel (NaN -> default fallback, JSON.stringify
  for object->string, zero values).

Value model: see :mod:`schisma_ray.schema.jstypes` (JS number = Python
float, JS bigint = Python int, null = None, undefined = UNDEFINED).

The kernel is deliberately row-wise and pure-Python: it is the semantic
oracle and the residual path for nested/union/hook checks. Flat typed
tables take the vectorized Arrow path in :mod:`schisma_ray.stages`.
Fidelity is enforced by differential tests against the reference run
under node (tests/golden/*.json).
"""

from __future__ import annotations

import re
from typing import Any, Callable

from .jstypes import (
    BUILTIN_ALIASES,
    HOLE,
    is_undefined,
    JSError,
    Null,
    UNDEFINED,
    js_boolean,
    js_json_stringify,
    js_number,
    js_string,
    js_typeof,
    js_bigint,
    BigInt,
    Boolean,
    Number,
    String,
)
from .result import (
    EXACT_MATCH,
    INVALID,
    MISSING_KEY,
    NO_MATCH,
    PARTIAL_MATCH,
    SchemaResult,
    UNEXPECTED_KEY,
    UNSET,
    VALID,
)

_VALIDATE_DEFAULTS = {
    "ignoreUnexpected": False,
    "ignoreRequired": False,
    "ignoreShortArrays": True,
    "ignoreLongArrays": True,
    "matchArray": "any",
    "flattenErrors": True,
    "filterNonErrors": True,
}

_CONFORM_DEFAULTS = {
    "removeUnexpected": True,
    "insertMissing": True,
    "matchArray": "any",
    "growArrays": False,
    "shrinkArrays": False,
    "populateArrays": False,
    "flattenErrors": False,
}


def _normalize_type(o: Any) -> Any:
    """Map Python builtin type aliases (float/int/str/bool) to JS types."""
    if isinstance(o, type) and o in BUILTIN_ALIASES:
        return BUILTIN_ALIASES[o]
    return o


class JSArray(list):
    """A list carrying JS-style string properties.

    JS allows ``arr['k'] = v``: the property is visible to Object.keys
    and property reads but invisible to JSON serialization. The kernel
    models the rare conform paths that assign object keys onto array
    documents with this subclass (props ordered after indices, as JS
    orders integer indices first).
    """

    def __init__(self, *args):
        super().__init__(*args)
        self.props: dict = {}


def _keys_of(o: Any) -> list:
    """JS Object.keys for dict-like and array-like documents."""
    if isinstance(o, dict):
        return [k for k in o.keys()]
    if isinstance(o, list):
        keys = [str(i) for i in range(len(o))]
        if isinstance(o, JSArray):
            keys += [k for k in o.props]
        return keys
    return []


def _get_key(o: Any, key: Any) -> Any:
    if isinstance(o, dict):
        return o.get(key, UNDEFINED)
    if isinstance(o, list):
        try:
            i = int(key)
        except (TypeError, ValueError):
            if isinstance(o, JSArray):
                return o.props.get(key, UNDEFINED)
            return UNDEFINED
        return o[i] if 0 <= i < len(o) else UNDEFINED
    return UNDEFINED


class SchemaNode:
    """Compiled schema node (the reference's ``Schisma`` class)."""

    __slots__ = (
        "typeof",
        "required",
        "default",
        "validate_fn",
        "unmarshal",
        "kind",
        "_zero_typeof",
    )

    def __init__(self, root: Any = UNDEFINED):
        self.typeof: list = []
        self.required: bool = True
        self.default: Any = UNSET
        self.validate_fn: Callable | None = None
        self.unmarshal: Callable | None = None
        self.kind: str | None = None
        self._zero_typeof: str | None = None
        self._understand(root)

    # -- compile (schisma.mjs:25-95) ------------------------------------
    def _understand(self, o: Any) -> None:
        o = _normalize_type(o)
        if isinstance(o, SchemaNode):
            # Decompose: share the compiled subtree (schisma.mjs:26-30).
            self.typeof = o.typeof
            self.required = o.required
            self.default = o.default
            self.validate_fn = o.validate_fn
            self.unmarshal = o.unmarshal
            self.kind = o.kind
        elif isinstance(o, list):
            self.typeof = [[SchemaNode(t) for t in o]]
            self.kind = "Array"
        elif o is None:
            self.default = None
            self.typeof = [Null]
            self.kind = "Null"
        elif isinstance(o, dict):
            if "$typeof" in o or "$type" in o or "$validate" in o:
                if "$typeof" in o:
                    self.typeof = [SchemaNode(t) for t in o["$typeof"]]
                elif "$type" in o:
                    self.typeof = [SchemaNode(o["$type"])]
                if "$default" in o:
                    self.default = o["$default"]
                if "$required" in o:
                    self.required = o["$required"]
                if "$validate" in o:
                    self.validate_fn = o["$validate"]
                if "$unmarshal" in o:
                    self.unmarshal = o["$unmarshal"]
                self.kind = "SchismaObject"
            else:
                mapping: dict[str, Any] = {}
                for key, val in o.items():
                    if key.startswith("$/"):
                        mapping[key] = [SchemaNode(t) for t in val]
                    else:
                        mapping[key] = SchemaNode(val)
                self.typeof = [mapping]
                self.kind = "Object"
        elif callable(o) or isinstance(o, type):
            self.typeof = [o]
            self.kind = "Class"
        else:
            # Primitive literal: type inferred, literal becomes default
            # (schisma.mjs:74-93). bool before int (Python subclassing).
            if isinstance(o, bool):
                self.default = o
                self.typeof = [Boolean]
            elif isinstance(o, float):
                self.default = o
                self.typeof = [Number]
            elif isinstance(o, int):
                self.default = o
                self.typeof = [BigInt]
            elif isinstance(o, str):
                self.default = o
                self.typeof = [String]
            self.kind = "Primitive"

    # -- validate (schisma.mjs:109-136) ---------------------------------
    def validate(self, o: Any, conf: dict | None = None, dot: Any = "") -> list[SchemaResult]:
        conf = {**_VALIDATE_DEFAULTS, **(conf or {})}
        results = self._validate(o, conf, dot)
        errors = results.errors if results.errors is not None else [results]
        if conf["filterNonErrors"]:
            errors = [r for r in errors if r.is_problem()]
        if conf["flattenErrors"]:
            flat: list[SchemaResult] = []

            def add_children(err: SchemaResult) -> None:
                if err.errors is not None:
                    next_errors = err.errors
                    for e in next_errors:
                        e.where = f"{err.where}.{e.where}"
                    err.errors = None
                    flat.append(err)
                    for e in next_errors:
                        add_children(e)
                else:
                    flat.append(err)

            for e in errors:
                add_children(e)
            return [e for e in flat if e.code != PARTIAL_MATCH]
        return errors

    # -- _validate (schisma.mjs:137-358) --------------------------------
    def _validate(self, o: Any, conf: dict, dot: Any) -> SchemaResult:
        if self.unmarshal is not None:
            o = self.unmarshal(o)
        if self.validate_fn is not None:
            return self._run_validate_hook(o, dot)

        types_results: list[SchemaResult] = []
        for type_index, alt in enumerate(self.typeof):
            if isinstance(alt, SchemaNode):
                r = alt._validate(o, conf, dot)
                r.type_index = type_index
                types_results.append(r)
            elif isinstance(alt, list):
                types_results.append(self._validate_array(alt, o, conf, dot, type_index))
            elif isinstance(alt, dict):
                types_results.append(self._validate_object(alt, o, conf, dot, type_index))
            elif callable(alt) or isinstance(alt, type):
                types_results.append(self._validate_class(alt, o, dot, type_index))
            else:  # pragma: no cover
                raise JSError("unhandled (this shouldn't happen)")
        return self._get_best_result(types_results)

    def _run_validate_hook(self, o: Any, dot: Any) -> SchemaResult:
        result = self.validate_fn(o, dot)
        if result is not None and result is not True and not is_undefined(result):
            if isinstance(result, list):
                errors = [r for r in result if isinstance(r, SchemaResult) and r.is_problem()]
                others = [r for r in result if isinstance(r, SchemaResult) and not r.is_problem()]
                if not errors and not others:
                    errors = result
                return SchemaResult(
                    INVALID if errors else VALID,
                    value=o, where=dot, errors=errors, results=others,
                )
            if isinstance(result, dict):
                fields = {"value": o, "where": dot}
                for src, dst in (
                    ("where", "where"), ("expected", "expected"),
                    ("expectedSchema", "expected_schema"), ("received", "received"),
                    ("value", "value"), ("message", "message"),
                    ("__typeIndex", "type_index"),
                ):
                    if src in result:
                        fields[dst] = result[src]
                return SchemaResult(INVALID, **fields)
            if isinstance(result, str):
                return SchemaResult(INVALID, value=o, where=dot, message=result)
            return SchemaResult(INVALID, value=o, where=dot)
        return SchemaResult(VALID, value=o, where=dot)

    def _validate_array(self, alt: list, o: Any, conf: dict, dot: Any, type_index: int) -> SchemaResult:
        if not isinstance(o, list):
            return SchemaResult(
                NO_MATCH, where=dot, expected="array", received=js_typeof(o),
                value=o, type_index=type_index,
            )
        match_results: list[SchemaResult] = []
        match_errors: list[SchemaResult] = []
        # reverse iteration, as the reference does (schisma.mjs:194)
        for index in range(len(o) - 1, -1, -1):
            if index > len(alt) - 1 and not conf["ignoreLongArrays"]:
                match_errors.append(SchemaResult(UNEXPECTED_KEY, where=index))
                continue
            check_results = [t._validate(o[index], conf, index) for t in alt]
            best = self._get_best_result(check_results)
            (match_errors if best.is_problem() else match_results).append(best)
        if len(o) < len(alt) and not conf["ignoreShortArrays"]:
            for i in range(len(o), len(alt)):
                match_errors.append(SchemaResult(MISSING_KEY, where=i, type_index=i))
        return SchemaResult(
            PARTIAL_MATCH if match_errors else EXACT_MATCH,
            where=dot, errors=match_errors, results=match_results,
            type_index=type_index,
        )

    def _validate_object(self, alt: dict, o: Any, conf: dict, dot: Any, type_index: int) -> SchemaResult:
        if js_typeof(o) != "object":
            return SchemaResult(
                NO_MATCH, where=dot, expected="object", received=js_typeof(o),
                value=o, type_index=type_index,
            )
        if o is None:
            return SchemaResult(
                NO_MATCH, where=dot, expected="object", received="null",
                value=o, type_index=type_index,
            )
        match_results: list[SchemaResult] = []
        match_errors: list[SchemaResult] = []
        pending_keys = _keys_of(o)
        pending_key_results: dict[Any, dict] = {}
        search_keys = [k for k in alt.keys() if k.startswith("$/")]
        for search_key in search_keys:
            pattern = re.compile(search_key[2:])
            for obj_key in pending_keys:
                if alt.get(obj_key) is None and pattern.search(obj_key):
                    check_results = [
                        value_type._validate(_get_key(o, obj_key), conf, obj_key)
                        for value_type in alt[search_key]
                    ]
                    best = self._get_best_result(check_results)
                    bucket = pending_key_results.setdefault(
                        obj_key, {"results": [], "errors": []}
                    )
                    bucket["errors" if best.is_problem() else "results"].append(best)
        for key, bucket in pending_key_results.items():
            if bucket["results"]:
                match_results.append(self._get_best_result(bucket["results"]))
            elif bucket["errors"]:
                match_errors.append(self._get_best_result(bucket["errors"]))
            pending_keys.remove(key)
        # ordered union: schema keys (non-search) first, then remaining doc keys
        shared = list(dict.fromkeys(
            [k for k in alt.keys() if k not in search_keys] + pending_keys
        ))
        for key in shared:
            if key not in alt:
                if conf["ignoreUnexpected"]:
                    continue
                match_errors.append(
                    SchemaResult(UNEXPECTED_KEY, where=key, received=_get_key(o, key))
                )
            elif is_undefined(_get_key(o, key)):
                if not alt[key].required or conf["ignoreRequired"]:
                    continue
                match_errors.append(SchemaResult(MISSING_KEY, where=key))
            else:
                r = alt[key]._validate(_get_key(o, key), conf, key)
                (match_errors if r.is_problem() else match_results).append(r)
        return SchemaResult(
            PARTIAL_MATCH if match_errors else EXACT_MATCH,
            where=dot, errors=match_errors, results=match_results,
            type_index=type_index,
        )

    def _validate_class(self, alt: Any, o: Any, dot: Any, type_index: int) -> SchemaResult:
        # typeof probe against the node's own create() (schisma.mjs:337)
        if self._zero_typeof is None:
            try:
                self._zero_typeof = js_typeof(self.create({}))
            except Exception:
                self._zero_typeof = "undefined"
        is_instance = isinstance(o, alt) if isinstance(alt, type) else False
        if js_typeof(o) != self._zero_typeof and not is_instance:
            return SchemaResult(
                NO_MATCH, where=dot, expected=alt, received=js_typeof(o),
                type_index=type_index, value=o,
            )
        return SchemaResult(EXACT_MATCH, where=dot, type_index=type_index)

    # -- heuristics (schisma.mjs:359-394) -------------------------------
    def _get_best_result(self, results: list[SchemaResult]) -> SchemaResult:
        if not results:
            raise JSError("unhandled: empty result set")
        best_i = 0
        heuristics = [self._get_heuristics(r) for r in results]
        for i, x in enumerate(heuristics):
            if x > heuristics[best_i]:
                best_i = i
        return results[best_i]

    def _get_heuristics(self, r: SchemaResult) -> int:
        h = 0
        if r.code == PARTIAL_MATCH:
            for child in (r.results or []):
                h += self._get_heuristics(child)
            for child in (r.errors or []):
                h += self._get_heuristics(child)
        elif r.code == EXACT_MATCH:
            h += 2
            for child in (r.results or []):
                h += self._get_heuristics(child)
        elif r.code == NO_MATCH:
            h -= 1
        elif r.is_problem():
            h -= 1
        else:
            h += 1
        return h

    # -- conform (schisma.mjs:407-524) ----------------------------------
    def conform(self, o: Any, conf: dict | None = None) -> Any:
        conf = {**_CONFORM_DEFAULTS, **(conf or {})}
        vconf = {
            "ignoreShortArrays": not conf["growArrays"],
            "ignoreLongArrays": not conf["shrinkArrays"],
            "filterNonErrors": False,
            **conf,
        }
        results = self.validate(o, vconf)
        return self._conform_from_errors(o, results, conf)

    def _conform_from_errors(self, data: Any, errs: list[SchemaResult], conf: dict) -> Any:
        if self.unmarshal is not None:
            data = self.unmarshal(data)
        for err in errs:
            is_root = err.where is UNSET or (isinstance(err.where, str) and err.where == "")
            w = err.where
            ti = err.type_index
            if self.kind == "Object":
                if err.code == NO_MATCH:
                    if is_root:
                        data = self.create(conf, data)
                    else:
                        data = _set_key(data, w, self._child(ti, w).create(conf, _get_key(data, w)))
                elif err.code == EXACT_MATCH:
                    pass
                elif err.code == PARTIAL_MATCH:
                    if is_root:
                        data = self._child(ti, w)._conform_from_errors(data, err.errors or [], conf)
                    else:
                        data = _set_key(
                            data, w,
                            self._child(ti, w)._conform_from_errors(_get_key(data, w), err.errors or [], conf),
                        )
                elif err.code == UNEXPECTED_KEY:
                    if is_root:
                        raise JSError(f"Unhandled: {err.code}:{self.kind} root")
                    _del_key(data, w)
                elif err.code == MISSING_KEY:
                    target = self._child(ti if ti is not UNSET else 0, w)
                    if is_root:
                        data = target.create(conf)
                    else:
                        data = _set_key(data, w, target.create(conf))
                else:
                    raise JSError(f"Unhandled: {err.code}:{self.kind}")
            elif self.kind == "SchismaObject":
                if err.code == NO_MATCH:
                    if is_root:
                        data = self.typeof[ti].create(conf, data)
                    else:
                        data = _set_key(data, w, self.typeof[ti].create(conf, _get_key(data, w)))
                elif err.code == EXACT_MATCH:
                    pass
                elif err.code == PARTIAL_MATCH:
                    if is_root:
                        data = self.typeof[ti]._conform_from_errors(data, err.errors or [], conf)
                    else:
                        alt = self.typeof[ti]
                        if isinstance(alt, SchemaNode) and alt.kind == "Array":
                            # reference's array-in-SchismaObject indirection
                            # (schisma.mjs:468-470)
                            target = self.typeof[0].typeof[ti][0]
                        else:
                            target = alt
                        data = _set_key(
                            data, w,
                            target._conform_from_errors(_get_key(data, w), err.errors or [], conf),
                        )
                else:
                    raise JSError(f"Unhandled: {err.code}:{self.kind}")
            elif self.kind == "Class":
                if err.code == NO_MATCH:
                    if is_root:
                        data = self.create(conf, data)
                    else:
                        data = _set_key(data, w, self.create(conf, _get_key(data, w)))
                elif err.code == EXACT_MATCH:
                    pass
                else:
                    raise JSError(f"Unhandled: {err.code}:{self.kind}")
            elif self.kind == "Array":
                if err.code == NO_MATCH:
                    if is_root:
                        data = self.create(conf, data)
                    else:
                        data = _set_key(data, w, self.typeof[0][ti].create(conf, _get_key(data, w)))
                elif err.code == PARTIAL_MATCH:
                    target = self.typeof[0]
                    if isinstance(target, list):
                        # nested-array indirection (schisma.mjs:497-498)
                        target = _index(target[ti].typeof[0], 0)
                    else:
                        target = target.typeof[ti]
                    if is_root:
                        data = target._conform_from_errors(data, err.errors or [], conf)
                    else:
                        data = _set_key(
                            data, w,
                            target._conform_from_errors(_get_key(data, w), err.errors or [], conf),
                        )
                elif err.code == UNEXPECTED_KEY:
                    del data[int(w):]  # Array.splice(where) truncation
                elif err.code == MISSING_KEY:
                    target = self.typeof[0][ti]
                    data = _set_key(data, w, target.create(conf, _get_key(data, w)))
                else:
                    raise JSError(f"Unhandled: {err.code}:{self.kind}")
            elif self.kind == "Primitive":
                raise JSError(f"Unhandled: {err.code}:{self.kind}")
            elif self.kind == "Null":
                data = None
            else:
                raise JSError(f"Unhandled: {err.code}:{self.kind}")
        return data

    def _child(self, ti: Any, where: Any) -> "SchemaNode":
        """this.$typeof[ti][where] with JS-undefined -> error surfacing."""
        try:
            alt = self.typeof[ti]
        except (IndexError, TypeError):
            raise JSError(f"Unhandled: no alternative {ti}") from None
        child = alt.get(where) if isinstance(alt, dict) else None
        if not isinstance(child, SchemaNode):
            raise JSError(f"Unhandled: no child schema at {where!r}")
        return child

    # -- create (schisma.mjs:536-610) -----------------------------------
    def create(self, conf: dict | None = None, data: Any = UNDEFINED) -> Any:
        conf = {"populateArrays": False, **(conf or {})}
        if self.default is not UNSET:
            if callable(self.default):
                return self.default(data)
            if is_undefined(data):
                return _deep_clone(self.default)
        if self.unmarshal is not None:
            return self.unmarshal(data)
        type_ = self.typeof[0] if self.typeof else None

        if isinstance(type_, SchemaNode):
            return type_.create(conf, data)
        if isinstance(type_, list):
            if conf["populateArrays"]:
                return [v.create(conf) for v in type_]
            return []
        if isinstance(type_, dict):
            out = {}
            for k, v in type_.items():
                if k.startswith("$/"):
                    continue
                if not v.required:
                    continue
                out[k] = v.create(conf)
            return out
        if callable(type_) or isinstance(type_, type):
            if is_undefined(data):
                if type_ is String:
                    return ""
                if type_ is Number:
                    return 0.0
                if type_ is BigInt:
                    return 0
                if type_ is Boolean:
                    return False
                if type_ is Null:
                    return None
            if type_ is Number:
                value = js_number(data)
                if value != value:  # NaN -> fall back to default (mjs:579-584)
                    return self.create(conf)
                return value
            if type_ is BigInt:
                return js_bigint(data)  # raises JSError exactly where JS throws
            if type_ is String:
                if js_typeof(data) == "object":
                    return js_json_stringify(data)
                return js_string(data)
            if type_ is Boolean:
                return js_boolean(data)
            if type_ is Null:
                return None
            # user class: type(data), falling back to no-arg construction
            try:
                return type_() if is_undefined(data) else type_(data)
            except Exception:
                return type_()
        return "FIXME"

    # -- createProperty (schisma.mjs:631-652) ---------------------------
    def create_property(self, which: str = "", conf: dict | None = None, data: Any = UNDEFINED) -> Any:
        if which == "":
            return self.create(conf, data)
        key, _, next_which = which.partition(".")
        if key.startswith("$"):
            try:
                target = self.typeof[int(key[1:])]
            except (IndexError, ValueError):
                return UNDEFINED
        else:
            target = self.typeof[0] if self.typeof else None
            if target is not None:
                if isinstance(target, dict):
                    target = target.get(key)
                elif isinstance(target, list):
                    try:
                        target = target[int(key)]
                    except (IndexError, ValueError):
                        target = None
                elif isinstance(target, SchemaNode):
                    target = None
        if not isinstance(target, SchemaNode):
            return UNDEFINED
        return target.create_property(next_which, conf, data)

    # camelCase alias matching the reference API name
    createProperty = create_property


def _index(seq: Any, i: int) -> Any:
    try:
        return seq[i]
    except (IndexError, KeyError, TypeError):
        raise JSError(f"Unhandled: no element {i}") from None


def _set_key(data: Any, key: Any, value: Any) -> Any:
    if isinstance(data, dict):
        data[key] = value
        return data
    if isinstance(data, list):
        try:
            i = int(key)
        except (TypeError, ValueError):
            # JS: string-key property assignment on an array — visible to
            # Object.keys, invisible to serialization
            if not isinstance(data, JSArray):
                data = JSArray(data)
            data.props[key] = value
            return data
        while len(data) <= i:
            data.append(HOLE)  # JS sparse assignment leaves holes
        data[i] = value
        return data
    raise JSError(f"Unhandled: cannot set {key!r} on {js_typeof(data)}")


def _del_key(data: Any, key: Any) -> None:
    if isinstance(data, dict):
        data.pop(key, None)
    elif isinstance(data, list):
        # JS `delete arr[i]` leaves a hole (reads as undefined), no shift
        try:
            i = int(key)
        except (TypeError, ValueError):
            if isinstance(data, JSArray):
                data.props.pop(key, None)
            return
        if 0 <= i < len(data):
            data[i] = HOLE
    else:
        raise JSError(f"Unhandled: cannot delete {key!r}")


def _deep_clone(v: Any) -> Any:
    if isinstance(v, list):
        return [_deep_clone(x) for x in v]
    if isinstance(v, dict):
        return {k: _deep_clone(x) for k, x in v.items()}
    return v


def schema(literal: Any) -> SchemaNode:
    """Public factory, mirroring ``schisma(newSchema)`` (schisma.mjs:679-681)."""
    return SchemaNode(literal)
