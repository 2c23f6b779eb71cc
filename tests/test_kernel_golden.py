"""Differential conformance: kernel vs reference golden fixtures.

tests/golden/cases.json was produced by tools/gen_golden.py, which runs
the *reference* implementation (/root/reference, under node) on every
case. Here we replay each case through the Python kernel and require
structural equality — this pins validate/conform/create semantics
row-for-row (codes, paths, expected/received, union type_index).
"""

import json
from pathlib import Path

import pytest

import ref_codec as rc
from schisma_ray.schema import SchemaNode, UNDEFINED

CASES = json.loads((Path(__file__).parent / "golden" / "cases.json").read_text())


def run_kernel(case):
    sch = SchemaNode(rc.dec_schema(case["schema"]))
    doc = rc.dec_value(case["doc"]) if "doc" in case else UNDEFINED
    conf = case.get("conf") or {}
    op = case["op"]
    if op == "validate":
        return sch.validate(doc, conf)
    if op == "conform":
        return sch.conform(doc, conf)
    if op == "conform2":  # conform idempotence differential
        return sch.conform(sch.conform(doc, conf), conf)
    if op == "create":
        return sch.create(conf, doc)
    if op == "createProperty":
        return sch.create_property(case.get("which", ""), conf, doc)
    raise ValueError(op)


@pytest.mark.parametrize(
    "entry", CASES, ids=[c["case"]["name"] for c in CASES]
)
def test_matches_reference(entry):
    case, ref = entry["case"], entry["ref"]
    if not ref["ok"]:
        with pytest.raises(Exception):
            run_kernel(case)
        return
    result = run_kernel(case)
    assert rc.normalize(rc.enc_value(result)) == rc.normalize(ref["result"])
