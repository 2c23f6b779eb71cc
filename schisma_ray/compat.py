"""Drop-in facade with the reference's exact API surface.

A user of the reference (``import schisma from 'schisma'``) switches to::

    from schisma_ray.compat import schisma

    sch = schisma({"name": str, "age": {"$type": float, "$default": 0.0}})
    sch.validate({"name": "x", "age": "oops"})   # -> [SchemaResult...]
    sch.conform({"name": 5.0})                    # -> {"name": "5", "age": 0.0}
    sch.create()                                  # -> {"name": "", "age": 0.0}
    sch.createProperty("age")                     # -> 0.0

``schisma.Schisma`` and ``schisma.SchismaResult`` mirror the reference's
exports (src/schisma.mjs:679-685); result codes are the same string
literals. Value model: JS number = float, bigint = int (see
schema/jstypes.py).
"""

from .schema import SchemaNode, SchemaResult
from .schema import result as _result


def schisma(new_schema):
    """Mirror of the reference factory (src/schisma.mjs:679-681)."""
    return SchemaNode(new_schema)


schisma.Schisma = SchemaNode
schisma.SchismaResult = SchemaResult

# result-code constants under the names the reference exposes
for _name in ("UNHANDLED", "PARTIAL_MATCH", "EXACT_MATCH", "NO_MATCH",
              "UNEXPECTED_KEY", "MISSING_KEY", "INVALID", "VALID"):
    setattr(SchemaResult, _name, getattr(_result, _name))
