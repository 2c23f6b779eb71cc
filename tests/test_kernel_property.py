"""Property-based kernel totality: for arbitrary JSON-ish documents,
validate/conform/create either succeed or raise JSError (the modeled JS
throw) — never an unexpected Python exception. (Value-level correctness
is pinned by the golden differential corpus; this guards totality.)"""

from hypothesis import given, settings, strategies as st

from schisma_ray.schema import BigInt, Boolean, Null, Number, String, schema
from schisma_ray.schema.jstypes import JSError

json_values = st.recursive(
    st.one_of(
        st.none(),
        st.booleans(),
        st.floats(allow_nan=True, allow_infinity=True, width=64),
        st.integers(-(2**62), 2**62),
        st.text(max_size=12),
    ),
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=6), children, max_size=4),
    ),
    max_leaves=12,
)

SCHEMAS = [
    schema(Number),
    schema({"a": Number, "b": String}),
    schema([Number, String]),
    schema({"$typeof": [String, Number, Boolean]}),
    schema({"x": {"$typeof": [{"k": Number}, [Boolean]], "$required": False}}),
    schema({"$/^p": [String], "fixed": {"$type": BigInt, "$default": 3}}),
    schema({"n": Null, "deep": {"in": {"$type": Number, "$validate": lambda v, d: v > 0}}}),
]


@settings(max_examples=150, deadline=None)
@given(doc=json_values, i=st.integers(0, len(SCHEMAS) - 1))
def test_validate_total(doc, i):
    try:
        SCHEMAS[i].validate(doc)
    except JSError:
        pass


@settings(max_examples=150, deadline=None)
@given(doc=json_values, i=st.integers(0, len(SCHEMAS) - 1))
def test_conform_total(doc, i):
    try:
        SCHEMAS[i].conform(doc)
    except JSError:
        pass


@settings(max_examples=60, deadline=None)
@given(doc=json_values, i=st.integers(0, len(SCHEMAS) - 1))
def test_create_total(doc, i):
    try:
        SCHEMAS[i].create({}, doc)
    except JSError:
        pass
