"""Readable semantic unit tests for the schema kernel.

A 1:1 port of the load-bearing expectations from the reference ava
corpus (/root/reference/test/*.mjs), adjusted for the Python value
model (JS number = float, JS bigint = int; see schema/jstypes.py).
"""

import math

import pytest

from schisma_ray.schema import (
    BigInt,
    Boolean,
    INVALID,
    MISSING_KEY,
    NO_MATCH,
    Null,
    Number,
    SchemaNode,
    String,
    UNDEFINED,
    UNEXPECTED_KEY,
    schema,
)
from schisma_ray.schema.jstypes import JSError


# --- test/basic.mjs:4-16 — zero-value create
@pytest.mark.parametrize(
    "literal,expected",
    [
        (Number, 0.0),
        (BigInt, 0),
        (String, ""),
        (Boolean, False),
        (Null, None),
        ({"x": Number}, {"x": 0.0}),
        ([Number], []),
        (5.0, 5.0),
        ("hey", "hey"),
        (True, True),
        (7, 7),  # Python int literal -> bigint default
        (None, None),
    ],
)
def test_create_zero(literal, expected):
    assert schema(literal).create() == expected


def test_create_populate_arrays():
    assert schema([Number, String]).create({"populateArrays": True}) == [0.0, ""]


# --- test/basic.mjs:18-30 — conform coercions
@pytest.mark.parametrize(
    "literal,doc,expected",
    [
        (Number, "32", 32.0),
        (String, 0.0, "0"),
        (Boolean, 1.0, True),
        (None, False, None),
        ({"a": Number}, 0.0, {"a": 0.0}),
        ([Number], 0.0, []),
    ],
)
def test_conform_primitive(literal, doc, expected):
    assert schema({"v": literal}).conform({"v": doc}) == {"v": expected}


# --- test/conformance.mjs:4-34
def test_conform_flat_record():
    sch = schema({"number": Number, "string": String})
    assert sch.conform({"number": "32", "string": 11.0}) == {
        "number": 32.0,
        "string": "11",
    }


def test_validate_flat_record():
    sch = schema({"number": Number, "string": String})
    errs = sch.validate({"number": "32", "string": 11.0})
    assert [(e.code, e.where) for e in errs] == [
        (NO_MATCH, "number"),
        (NO_MATCH, "string"),
    ]
    assert errs[0].received == "string"
    assert errs[1].received == "number"


# --- test/conformance.mjs:36-75 — union conform keeps matching alternative
def test_conform_union_no_cross_contamination():
    a = schema({"name": {"$type": String, "$default": "Aa"}, "array": []})
    b = schema({"name": {"$type": String, "$default": "Ab"}, "string": String})
    sch = schema({"variableTypes": {"$typeof": [a, b]}})
    doc_a = {"variableTypes": {"name": "Aa", "array": []}}
    doc_b = {"variableTypes": {"name": "Ab", "string": ""}}
    assert sch.conform(doc_a) == {"variableTypes": {"name": "Aa", "array": []}}
    assert sch.conform(doc_b) == {"variableTypes": {"name": "Ab", "string": ""}}


# --- test/arrays.mjs
def test_arrays_grow_shrink():
    sch = schema([Number, Number, Number])
    assert sch.conform([1.0, 2.0], {"growArrays": True}) == [1.0, 2.0, 0.0]
    assert sch.conform([1.0, 2.0, 3.0, 4.0], {"shrinkArrays": True}) == [1.0, 2.0, 3.0]
    assert sch.conform("nope") == []
    assert sch.conform("nope", {"populateArrays": True}) == [0.0, 0.0, 0.0]


# --- test/complexArray.mjs — per-element coercion
def test_nested_array_coercion():
    sch = schema([[Number]])
    assert sch.conform([["32", 1.0, "junk"]]) == [[32.0, 1.0, 0.0]]


# --- test/complexObject.mjs — missing subtree inserted, unexpected dropped
def test_complex_object_conform():
    sch = schema(
        {
            "a": Number,
            "b": {"bA": String, "bB": [Boolean]},
            "c": [{"cA": Number}],
        }
    )
    assert sch.conform({"a": 1.0}) == {
        "a": 1.0,
        "b": {"bA": "", "bB": []},
        "c": [],
    }
    got = sch.conform(
        {"a": 1.0, "b": {"bA": "x", "bB": [True]}, "c": [], "d": {"junk": 1.0}}
    )
    assert got == {"a": 1.0, "b": {"bA": "x", "bB": [True]}, "c": []}


# --- test/schemaObject.mjs
def test_schema_object_variants():
    assert schema({"$type": Number}).create() == 0.0
    assert schema({"$typeof": [String, Number]}).create() == ""
    assert schema({"$type": Number, "$default": 32.0}).create() == 32.0
    errs = schema({"v": {"$type": Number, "$validate": lambda v, dot: v > 0}}).validate(
        {"v": -5.0}
    )
    assert [e.code for e in errs] == [INVALID]
    assert schema({"v": {"$type": Number, "$required": False}}).validate({}) == []
    errs = schema({"v": Number}).validate({})
    assert [(e.code, e.where) for e in errs] == [(MISSING_KEY, "v")]


# --- flatten paths (README.md:213-238 style)
def test_flatten_dot_paths():
    sch = schema({"owns": {"cats": [{"hairless": Boolean}]}})
    errs = sch.validate({"owns": {"cats": [{"hairless": "maybe"}]}})
    assert [(e.code, e.where) for e in errs] == [(NO_MATCH, "owns.cats.0.hairless")]
    assert errs[0].received == "string"
    assert errs[0].value == "maybe"


def test_unexpected_key():
    errs = schema({"a": Number}).validate({"a": 1.0, "b": 2.0})
    assert [(e.code, e.where) for e in errs] == [(UNEXPECTED_KEY, "b")]
    assert errs[0].received == 2.0
    assert schema({"a": Number}).validate(
        {"a": 1.0, "b": 2.0}, {"ignoreUnexpected": True}
    ) == []


# --- test/regexKeys.mjs
def test_regex_keys():
    sch = schema({"$/.*": [String], "fixed": Number})
    assert sch.validate({"fixed": 1.0, "anything": "s"}) == []
    errs = sch.validate({"fixed": 1.0, "anything": 5.0})
    assert [e.code for e in errs] == [NO_MATCH]
    # regex keys excluded from create (schisma.mjs:559-566)
    assert sch.create() == {"fixed": 0.0}


# --- test/recursiveSchema.mjs — recursion via $validate closure
def test_recursive_schema():
    tree: SchemaNode = None

    def check_children(v, dot):
        if not isinstance(v, list):
            return "expected list"
        for child in v:
            errs = tree.validate(child)
            if errs:
                return "child invalid"
        return True

    tree = schema({"name": String, "children": {"$type": [], "$validate": check_children}})
    doc = {
        "name": "root",
        "children": [
            {"name": "a", "children": []},
            {"name": "b", "children": [{"name": "c", "children": []}]},
        ],
    }
    assert tree.validate(doc) == []
    bad = {"name": "root", "children": [{"name": 5.0, "children": []}]}
    assert [e.code for e in tree.validate(bad)] == [INVALID]


# --- test/createProperty.mjs
def test_create_property():
    sch = schema({"a": {"B": 0.0}, "variadic": {"$typeof": [String, Number]}})
    assert sch.create_property("a") == {"B": 0.0}
    assert sch.create_property("a.B") == 0.0
    assert sch.create_property("variadic.$0") == ""
    assert sch.create_property("variadic.$1") == 0.0
    assert sch.create_property("missing.path") is UNDEFINED
    sch2 = schema({"a": {"s": String}})
    assert sch2.create_property("a.s", {}, "test") == "test"


# --- test/uuid.mjs / class.mjs style: user classes + $unmarshal + $validate
class UserId:
    def __init__(self, raw=""):
        self.raw = str(raw)

    def __eq__(self, other):
        return isinstance(other, UserId) and other.raw == self.raw


def test_user_class():
    sch = schema({"id": UserId})
    assert sch.validate({"id": UserId("x")}) == []
    # JS quirk preserved: any object passes a class typeof check
    assert sch.validate({"id": {}}) == []
    errs = sch.validate({"id": 5.0})
    assert [e.code for e in errs] == [NO_MATCH]
    # $unmarshal applies where conform enters the tree: at the root
    # (test/class.mjs:31-36); a child-level $unmarshal affects validation
    # only, and conform leaves the raw child value (reference behavior).
    sch2 = schema({"$type": UserId, "$unmarshal": lambda v: UserId(v)})
    assert sch2.conform("abc") == UserId("abc")
    sch3 = schema({"id": {"$type": UserId, "$unmarshal": lambda v: UserId(v)}})
    assert sch3.conform({"id": "abc"}) == {"id": "abc"}


# --- test/automated.mjs flavor: coercion kernel edge cases
def test_coercion_kernel():
    assert schema({"v": Number}).conform({"v": "junk"}) == {"v": 0.0}  # NaN->default
    # NaN falls back to the *alternative node's* create() — the inner
    # Number node has no $default, so 0, not 9 (reference-verified).
    assert schema({"v": {"$type": Number, "$default": 9.0}}).conform({"v": "junk"}) == {
        "v": 0.0
    }
    assert schema({"v": String}).conform({"v": {"k": 1.0}}) == {"v": '{"k":1}'}
    assert schema({"v": BigInt}).conform({"v": "42"}) == {"v": 42}
    assert schema({"v": BigInt}).conform({"v": True}) == {"v": 1}
    with pytest.raises(JSError):
        schema({"v": BigInt}).conform({"v": "abc"})  # JS throws SyntaxError
    assert schema({"v": Boolean}).conform({"v": ""}) == {"v": False}
    assert schema({"v": Boolean}).conform({"v": "x"}) == {"v": True}


def test_nan_passes_number_check():
    assert schema({"v": Number}).validate({"v": math.nan}) == []


def test_default_function():
    sch = schema({"v": {"$type": String, "$default": lambda d: "gen"}})
    assert sch.create() == {"v": "gen"}


def test_union_first_wins_tie():
    errs = schema({"$typeof": [String, Number]}).validate(True)
    assert errs[0].type_index == 0  # declaration-order priority


# --- test/date.mjs analogue: construct-then-validate via $unmarshal
def test_date_analogue():
    """Mirrors test/date.mjs:7-33 with Python datetime as the class."""
    from datetime import datetime

    sch = schema(
        {
            "ts": {
                "$type": datetime,
                # hooks must tolerate undefined, exactly as JS hooks must
                # (create() calls $unmarshal(undefined), schisma.mjs:546-548)
                "$unmarshal": lambda v: (
                    v if isinstance(v, datetime)
                    else datetime(2000, 1, 1) if not isinstance(v, str)
                    else datetime.fromisoformat(v)
                ),
                "$validate": lambda v, dot: (
                    True if isinstance(v, datetime) and v.year >= 2000
                    else {"expected": "datetime >= 2000", "received": str(v)}
                ),
            }
        }
    )
    assert sch.validate({"ts": datetime(2024, 5, 1)}) == []
    assert sch.validate({"ts": "2024-05-01T10:00:00"}) == []  # unmarshal constructs
    errs = sch.validate({"ts": "1990-01-01T00:00:00"})
    assert [e.code for e in errs] == [INVALID]
    assert errs[0].expected == "datetime >= 2000"
    # create with data constructs through $unmarshal (schisma.mjs:546-548)
    made = sch.create({}, {"ts": "2030-01-01T00:00:00"})
    assert isinstance(made, dict)


# --- test/uuid.mjs analogue: class with a serializable round trip
def test_uuid_analogue():
    import uuid

    sch = schema(
        {
            "id": {
                "$type": uuid.UUID,
                "$unmarshal": lambda v: (
                    v if isinstance(v, uuid.UUID)
                    else uuid.UUID(int=0) if not isinstance(v, str)
                    else uuid.UUID(v)
                ),
            }
        }
    )
    u = uuid.uuid5(uuid.NAMESPACE_DNS, "schisma-ray")
    assert sch.validate({"id": u}) == []
    assert sch.validate({"id": str(u)}) == []  # string constructs via unmarshal
    # $unmarshal coerces everything to a UUID before the type check, so a
    # bare class check passes — pair with $validate to reject (the same
    # pattern the reference tests use, test/class.mjs:38-62)
    assert sch.validate({"id": 5.0}) == []
    strict = schema(
        {
            "id": {
                "$type": uuid.UUID,
                "$validate": lambda v, dot: isinstance(v, uuid.UUID),
            }
        }
    )
    errs = strict.validate({"id": 5.0})
    assert [e.code for e in errs] == [INVALID]


def test_compat_facade():
    """The reference-shaped API surface (schisma_ray.compat)."""
    from schisma_ray.compat import schisma as compat

    sch = compat({"name": str, "age": {"$type": float, "$default": 0.0}})
    errs = sch.validate({"name": "x", "age": "oops"})
    assert [e.code for e in errs] == [compat.SchismaResult.NO_MATCH]
    assert sch.conform({"name": 5.0}) == {"name": "5", "age": 0.0}
    assert sch.create() == {"name": "", "age": 0.0}
    assert sch.createProperty("age") == 0.0
    assert compat.SchismaResult.MISSING_KEY == "missing key"


def test_js_array_properties():
    """Conform onto an array document persists string-key repairs as
    JS-style properties: visible to subsequent validation, invisible to
    the list content (JSON semantics)."""
    sch = schema({"k": Number})
    out = sch.conform([1.0, 2.0])  # array doc vs object schema
    # indices dropped (unexpected), 'k' inserted as a property
    from schisma_ray.schema.kernel import JSArray, _get_key
    from schisma_ray.schema.jstypes import HOLE

    assert isinstance(out, JSArray)
    assert _get_key(out, "k") == 0.0
    assert list(out) == [HOLE, HOLE]  # deleted indices leave holes
    # second conform sees the property and leaves it intact (idempotent)
    out2 = sch.conform(out)
    assert _get_key(out2, "k") == 0.0
