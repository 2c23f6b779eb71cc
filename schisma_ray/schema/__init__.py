"""Schema kernel: compile / validate / conform / create (reference semantics)."""

from .jstypes import (  # noqa: F401
    BigInt,
    Boolean,
    JSError,
    JSType,
    Null,
    Number,
    String,
    UNDEFINED,
    js_typeof,
)
from .kernel import SchemaNode, schema  # noqa: F401
from .result import (  # noqa: F401
    EXACT_MATCH,
    INVALID,
    MISSING_KEY,
    NO_MATCH,
    PARTIAL_MATCH,
    PROBLEM_CODES,
    SchemaResult,
    UNEXPECTED_KEY,
    UNHANDLED,
    UNSET,
    VALID,
)
