"""Generate golden fixtures by running the node reference harness, and
differentially check the Python kernel against them.

Usage:  python tools/gen_golden.py [--fuzz N] [--write]

--write stores {case, ref} pairs into tests/golden/cases.json (consumed
by tests/test_kernel_golden.py; pytest never needs node). Without
--write it only reports mismatches between kernel and reference.
"""

from __future__ import annotations

import argparse
import json
import random
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import ref_codec as rc  # noqa: E402
from schisma_ray.schema import SchemaNode  # noqa: E402

C = lambda n: {"$class": n}
LIT = lambda v: {"$lit": v}
ARR = lambda *xs: {"$arr": list(xs)}
OBJ = lambda **kw: {"$obj": kw}
BIG = lambda s: {"$bigint": str(s)}
NUM = lambda s: {"$num": s}
UNDEF = {"$undef": True}


def obj(d):
    return {"$obj": d}


def sobj(**kw):
    return {"$sobj": kw}


def hand_cases() -> list[dict]:
    cases = []

    def add(name, schema, op, doc=None, conf=None, which=None):
        c = {"name": name, "schema": schema, "op": op}
        if doc is not None:
            c["doc"] = doc
        if conf is not None:
            c["conf"] = conf
        if which is not None:
            c["which"] = which
        cases.append(c)

    prim = [C("Number"), C("BigInt"), C("String"), C("Boolean"), C("Null")]
    # --- test/basic.mjs: zero-value create for all kinds
    for p in prim:
        add(f"create-zero-{p['$class']}", p, "create")
    add("create-zero-object", obj({"x": C("Number")}), "create")
    add("create-zero-array", ARR(C("Number")), "create")
    add("create-zero-lit-number", LIT(5), "create")
    add("create-zero-lit-string", LIT("hey"), "create")
    add("create-zero-lit-bool", LIT(True), "create")
    add("create-zero-lit-bigint", LIT(BIG(5)), "create")
    add("create-null", {"$null": True}, "create")
    # conform primitive mismatches ('32'->32, 0->'0', 1->true, false->null, 0->{}, 0->[])
    add("conform-num<-str", obj({"v": C("Number")}), "conform", obj_doc(v="32"))
    add("conform-str<-num", obj({"v": C("String")}), "conform", obj_doc(v=0))
    add("conform-bool<-num", obj({"v": C("Boolean")}), "conform", obj_doc(v=1))
    add("conform-null<-bool", obj({"v": {"$null": True}}), "conform", obj_doc(v=False))
    add("conform-obj<-num", obj({"v": obj({"a": C("Number")})}), "conform", obj_doc(v=0))
    add("conform-arr<-num", obj({"v": ARR(C("Number"))}), "conform", obj_doc(v=0))
    add("conform-standalone-number", C("Number"), "conform", "42")
    add("conform-standalone-type", sobj(type=C("Number")), "conform", "42")

    # --- test/schemaObject.mjs
    add("sobj-create-type", sobj(type=C("Number")), "create")
    add("sobj-create-typeof-first", sobj(typeof=[C("String"), C("Number")]), "create")
    add("sobj-create-default", sobj(type=C("Number"), default=32), "create")
    add("sobj-create-default-fn", sobj(type=C("String"), defaultFn="default_from_data"), "create")
    add("sobj-validate-ok", obj({"v": sobj(type=C("Number"), validate="is_positive")}),
        "validate", obj_doc(v=5))
    add("sobj-validate-fail", obj({"v": sobj(type=C("Number"), validate="is_positive")}),
        "validate", obj_doc(v=-5))
    add("sobj-validate-msg", obj({"v": sobj(type=C("Number"), validate="msg_if_neg")}),
        "validate", obj_doc(v=-5))
    add("sobj-validate-objresult", obj({"v": sobj(type=C("Number"), validate="obj_if_neg")}),
        "validate", obj_doc(v=-5))
    add("required-missing", obj({"v": C("Number")}), "validate", obj_doc())
    add("required-false", obj({"v": sobj(type=C("Number"), required=False)}),
        "validate", obj_doc())
    add("required-false-create", obj({"a": C("Number"),
                                      "b": sobj(type=C("Number"), required=False)}), "create")

    # --- test/conformance.mjs
    add("conform-flat-record", obj({"number": C("Number"), "string": C("String")}),
        "conform", obj_doc(number="32", string=11))
    add("validate-flat-record", obj({"number": C("Number"), "string": C("String")}),
        "validate", obj_doc(number="32", string=11))
    complexAa = obj({"name": sobj(type=C("String"), default="Aa"), "array": ARR()})
    complexAb = obj({"name": sobj(type=C("String"), default="Ab"), "string": C("String")})
    complexA = obj({"variableTypes": sobj(typeof=[complexAa, complexAb])})
    add("conform-union-A", complexA, "conform",
        obj_doc(variableTypes={"name": "Aa", "array": []}))
    add("conform-union-B", complexA, "conform",
        obj_doc(variableTypes={"name": "Ab", "string": ""}))
    add("validate-union-A", complexA, "validate",
        obj_doc(variableTypes={"name": "Aa", "array": []}))

    # --- test/arrays.mjs + complexArray.mjs
    arr3 = ARR(C("Number"), C("Number"), C("Number"))
    add("arr-grow", arr3, "conform", [1, 2], {"growArrays": True})
    add("arr-shrink", arr3, "conform", [1, 2, 3, 4, 5], {"shrinkArrays": True})
    add("arr-mismatch", arr3, "conform", "nope")
    add("arr-grow-populate", arr3, "conform", [1], {"growArrays": True, "populateArrays": True})
    nested = ARR(ARR(C("Number")))
    add("arr-nested-coerce", nested, "conform", [["32", 1, "junk"]])
    add("arr-nested-validate", nested, "validate", [["32", 1, "junk"]])
    add("arr-validate-long", arr3, "validate", [1, 2, 3, 4], {"ignoreLongArrays": False})
    add("arr-validate-short", arr3, "validate", [1], {"ignoreShortArrays": False})

    # --- test/complexObject.mjs
    complexObj = obj({
        "a": C("Number"),
        "b": obj({"bA": C("String"), "bB": ARR(C("Boolean"))}),
        "c": ARR(obj({"cA": C("Number")})),
    })
    add("complex-create", complexObj, "create")
    add("complex-conform-missing", complexObj, "conform", obj_doc(a=1))
    add("complex-conform-unexpected", complexObj, "conform",
        obj_doc(a=1, b={"bA": "x", "bB": [True]}, c=[], d={"junk": 1}))
    add("complex-validate", complexObj, "validate",
        obj_doc(a="no", b={"bA": 5}, d=1))
    add("complex-validate-unflat", complexObj, "validate",
        obj_doc(a="no", b={"bA": 5}, d=1), {"flattenErrors": False, "filterNonErrors": False})

    # --- test/deepSchema.mjs-style: union-of-object-schemas inside arrays
    variantA = obj({"kind": sobj(type=C("String"), default="a"), "x": C("Number")})
    variantB = obj({"kind": sobj(type=C("String"), default="b"), "y": C("String")})
    deep = obj({"items": ARR(sobj(typeof=[variantA, variantB]))})
    add("deep-validate", deep, "validate",
        obj_doc(items=[{"kind": "a", "x": 1}, {"kind": "b", "y": "s"}]))
    add("deep-conform-keep", deep, "conform",
        obj_doc(items=[{"kind": "a", "x": 1}, {"kind": "b", "y": "s"}]))
    add("deep-conform-fix", deep, "conform",
        obj_doc(items=[{"kind": "a", "x": "32"}]))

    # --- test/automated.mjs: primitive x primitive conform matrix
    vals = {"Number": 1, "BigInt": BIG(1), "String": "1", "Boolean": True,
            "Null": None}
    for pname in vals:
        for qname, qval in vals.items():
            add(f"auto-{pname}<-{qname}",
                obj({"type": C("String"), "value": C(pname)}),
                "conform", obj_doc(type="t", value=qval))
    add("auto-array-typeof", ARR(sobj(typeof=prim)), "conform",
        [1, BIG(1), "1", True, None])
    add("auto-array-nested", ARR(ARR(sobj(typeof=prim))), "conform",
        [[1, BIG(1), "1", True, None], [1, BIG(1), "1", True, None]])

    # --- test/regexKeys.mjs
    rx = obj({"$/.*": [C("String")], "$/^y": [C("Boolean")], "fixed": C("Number")})
    add("regex-validate-ok", rx, "validate", obj_doc(fixed=1, anything="s", yes=True))
    add("regex-validate-fail", rx, "validate", obj_doc(fixed=1, anything=5))
    add("regex-create", rx, "create")
    add("regex-conform", rx, "conform", obj_doc(fixed="5", anything="s"))

    # --- $unmarshal (test/date.mjs / class.mjs style, with registry hooks)
    add("unmarshal-validate", obj({"v": sobj(type=C("Number"), unmarshal="to_number")}),
        "validate", obj_doc(v="42"))
    add("unmarshal-conform", obj({"v": sobj(type=C("Number"), unmarshal="to_number")}),
        "conform", obj_doc(v="42"))
    add("unmarshal-upper-create", obj({"v": sobj(type=C("String"), unmarshal="upper")}),
        "create", obj_doc(v="abc"))

    # --- createProperty (test/createProperty.mjs)
    cp = obj({"a": obj({"B": LIT(0)}),
              "variadic": sobj(typeof=[C("String"), C("Number")])})
    add("cp-a", cp, "createProperty", which="a")
    add("cp-a.B", cp, "createProperty", which="a.B")
    add("cp-variadic.$0", cp, "createProperty", which="variadic.$0")
    add("cp-variadic.$1", cp, "createProperty", which="variadic.$1")
    add("cp-missing", cp, "createProperty", which="nope.deep")
    add("cp-data", obj({"a": obj({"s": C("String")})}), "createProperty",
        doc="test", which="a.s")

    # --- validate conf flags
    rec = obj({"a": C("Number")})
    add("conf-ignore-unexpected", rec, "validate", obj_doc(a=1, b=2),
        {"ignoreUnexpected": True})
    add("conf-ignore-required", rec, "validate", obj_doc(), {"ignoreRequired": True})
    add("conf-nofilter", rec, "validate", obj_doc(a=1), {"filterNonErrors": False})
    add("conf-noflatten", rec, "validate", obj_doc(a="s"),
        {"flattenErrors": False, "filterNonErrors": False})

    # --- test/complexSchemas.mjs: Schisma-instance composition
    child = obj({"name": C("String"), "age": C("Number")})
    add("compose-create", obj({"child": {"$node": child},
                               "children": ARR({"$node": child})}), "create")
    add("compose-validate", obj({"child": {"$node": child}}), "validate",
        obj_doc(child={"name": "x", "age": "bad"}))
    add("compose-conform", obj({"child": {"$node": child}}), "conform",
        obj_doc(child={"name": 5, "age": "3"}))
    add("compose-sobj", sobj(typeof=[{"$node": child}, C("Number")]), "validate",
        obj_doc(name="x", age=1))

    # --- quirks
    add("quirk-object-passes-null", obj({"x": {"$null": True}}), "validate",
        obj_doc(x={}))
    add("quirk-nan-passes-number", obj({"x": C("Number")}), "validate",
        obj_doc(x=NUM("NaN")))
    add("quirk-null-vs-object", obj({"x": obj({"y": C("Number")})}), "validate",
        obj_doc(x=None))
    add("quirk-union-tie", sobj(typeof=[C("String"), C("Number")]), "validate", True)
    add("quirk-union-default", sobj(typeof=[C("String"), C("Number")], default=5),
        "validate", obj_doc())
    # --- JS Number::toString bands (small/large magnitudes; ADVICE.md):
    # String coercion + violation 'received' stringification must follow
    # ECMA-262 fixed-vs-exponential placement, not Python repr
    numfmt_vals = [5e-05, 1e-7, 1.5e-7, 1e-6, 1.234e-6, 1e21, 1.5e21,
                   9.999e20, 1e16, -5e-05, -1e-7, 2.5e-8, 1e-21]
    for i, v in enumerate(numfmt_vals):
        add(f"numfmt-conform-{i}", obj({"s": C("String")}), "conform", obj_doc(s=v))
        add(f"numfmt-received-{i}", obj({"s": C("String")}), "validate", obj_doc(s=v))
    return cases


def obj_doc(**kw):
    return dict(kw)


# ---------------------------------------------------------------- fuzzer
PRIM_CLASSES = ["Number", "BigInt", "String", "Boolean", "Null"]
DOC_POOL = [0, 1.5, -3, "", "32", "abc", "xxxxxxx", True, False, None,
            BIG(0), BIG(7), NUM("NaN"), {"$undef": True}, [], {}, [1, "a"],
            {"k": 1.0},
            # small/large-magnitude floats: exercise the ECMA Number::toString
            # fixed-vs-exponential bands in String coercion / received fields
            5e-05, 1e-7, 1.5e21, 1e-6, "0b101", "0o17"]


def rand_schema(rng: random.Random, depth: int) -> dict:
    kinds = ["class", "lit"]
    if depth > 0:
        kinds += ["obj", "arr", "sobj", "obj", "arr", "sobj", "regex", "node"]
    k = rng.choice(kinds)
    if k == "class":
        return C(rng.choice(PRIM_CLASSES))
    if k == "node" :
        return {"$node": rand_schema(rng, depth - 1)}
    if k == "lit":
        return LIT(rng.choice([5, "s", True, BIG(3), 0]))
    if k == "obj":
        return obj({f"k{i}": rand_schema(rng, depth - 1)
                    for i in range(rng.randint(1, 3))})
    if k == "arr":
        return ARR(*[rand_schema(rng, depth - 1)
                     for _ in range(rng.randint(0, 2))])
    if k == "regex":
        return obj({"$/^p": [rand_schema(rng, depth - 1)],
                    "fixed": rand_schema(rng, depth - 1)})
    # sobj
    kw = {"typeof": [rand_schema(rng, depth - 1)
                     for _ in range(rng.randint(1, 2))]}
    if rng.random() < 0.3:
        kw["default"] = rng.choice([5, "d", True])
    if rng.random() < 0.2:
        kw["required"] = rng.choice([True, False])
    if rng.random() < 0.25:
        kw["validate"] = rng.choice(list(rc.VALIDATORS.keys()))
    if rng.random() < 0.15:
        kw["unmarshal"] = rng.choice(["identity", "to_number"])
    return sobj(**kw)


def doc_for(schema: dict, rng: random.Random, mutate: float):
    """Generate a doc roughly matching `schema`, with random mutations."""
    if rng.random() < mutate:
        return rng.choice(DOC_POOL)
    if "$node" in schema:
        return doc_for(schema["$node"], rng, mutate)
    if "$class" in schema:
        return {"Number": 1.5, "BigInt": BIG(2), "String": "s",
                "Boolean": True, "Null": None}[schema["$class"]]
    if "$lit" in schema:
        return schema["$lit"]
    if "$null" in schema:
        return None
    if "$arr" in schema:
        elems = schema["$arr"]
        n = rng.randint(0, max(len(elems), 2))
        out = []
        for i in range(n):
            src = elems[i % len(elems)] if elems else C("Number")
            out.append(doc_for(src, rng, mutate))
        return out
    if "$obj" in schema:
        out = {}
        for key, sub in schema["$obj"].items():
            if key.startswith("$/"):
                if rng.random() < 0.6:
                    out["p" + key[3:].strip("^$")] = doc_for(sub[0], rng, mutate)
                continue
            if rng.random() < 0.9:
                out[key] = doc_for(sub, rng, mutate)
        if rng.random() < 0.25:
            out["extra"] = rng.choice(DOC_POOL)
        return out
    if "$sobj" in schema:
        alts = schema["$sobj"].get("typeof")
        if alts:
            return doc_for(rng.choice(alts), rng, mutate)
        t = schema["$sobj"].get("type")
        return doc_for(t, rng, mutate) if t else rng.choice(DOC_POOL)
    return rng.choice(DOC_POOL)


def rand_which(schema: dict, rng: random.Random) -> str:
    """Random dot-path into (or near) the schema, including $N segments
    and occasional garbage keys."""
    parts = []
    node = schema
    for _ in range(rng.randint(1, 3)):
        if rng.random() < 0.15:
            parts.append(rng.choice(["nope", "$9", "x.y"]))
            break
        if "$node" in node:
            node = node["$node"]
        if "$obj" in node:
            keys = [k for k in node["$obj"] if not k.startswith("$/")]
            if not keys:
                break
            k = rng.choice(keys)
            parts.append(k)
            node = node["$obj"][k]
        elif "$sobj" in node and node["$sobj"].get("typeof"):
            alts = node["$sobj"]["typeof"]
            i = rng.randrange(len(alts))
            parts.append(f"${i}")
            node = alts[i]
        elif "$arr" in node and node["$arr"]:
            i = rng.randrange(len(node["$arr"]))
            parts.append(str(i))
            node = node["$arr"][i]
        else:
            break
    return ".".join(parts) if parts else "a"


def fuzz_cases(n: int, seed: int = 42) -> list[dict]:
    rng = random.Random(seed)
    cases = []
    for i in range(n):
        schema = rand_schema(rng, rng.randint(1, 4))
        op = rng.choice(["validate", "validate", "conform", "conform", "create",
                         "createProperty", "conform2"])
        case = {"name": f"fuzz-{i}-{op}", "schema": schema, "op": op}
        if op == "createProperty":
            case["which"] = rand_which(schema, rng)
        if op in ("validate", "conform") or rng.random() < 0.5:
            case["doc"] = doc_for(schema, rng, rng.choice([0.0, 0.15, 0.4]))
        conf = {}
        if op == "validate":
            for flag in ("ignoreUnexpected", "ignoreRequired",
                         "ignoreShortArrays", "ignoreLongArrays",
                         "filterNonErrors", "flattenErrors"):
                if rng.random() < 0.25:
                    conf[flag] = rng.choice([True, False])
        elif op == "conform":
            for flag in ("growArrays", "shrinkArrays", "populateArrays"):
                if rng.random() < 0.3:
                    conf[flag] = True
        elif rng.random() < 0.3:
            conf["populateArrays"] = True
        if conf:
            case["conf"] = conf
        cases.append(case)
    return cases


# ------------------------------------------------------------- execution
def run_reference(cases: list[dict]) -> list[dict]:
    inp = "".join(json.dumps(c) + "\n" for c in cases)
    proc = subprocess.run(
        ["node", str(REPO / "tools" / "ref_harness.mjs")],
        input=inp, capture_output=True, text=True, timeout=300,
    )
    if proc.returncode != 0:
        sys.exit(f"harness failed: {proc.stderr[-2000:]}")
    return [json.loads(line) for line in proc.stdout.splitlines() if line.strip()]


def run_kernel(case: dict) -> dict:
    try:
        sch = SchemaNode(rc.dec_schema(case["schema"]))
        doc = rc.dec_value(case["doc"]) if "doc" in case else rc.UNDEFINED
        conf = case.get("conf") or {}
        op = case["op"]
        if op == "validate":
            result = sch.validate(doc, conf)
        elif op == "conform":
            result = sch.conform(doc, conf)
        elif op == "conform2":
            result = sch.conform(sch.conform(doc, conf), conf)
        elif op == "create":
            result = sch.create(conf, doc)
        elif op == "createProperty":
            result = sch.create_property(case.get("which", ""), conf, doc)
        else:
            raise ValueError(op)
        return {"ok": True, "result": rc.enc_value(result)}
    except Exception as e:  # mirrors the harness's catch-all
        return {"ok": False, "error": f"{type(e).__name__}: {e}"}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fuzz", type=int, default=300)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--write", action="store_true")
    ap.add_argument("--only", help="substring filter on case name")
    args = ap.parse_args()

    cases = hand_cases() + fuzz_cases(args.fuzz, args.seed)
    if args.only:
        cases = [c for c in cases if args.only in c["name"]]
    refs = run_reference(cases)
    assert len(refs) == len(cases)

    mismatches = 0
    for case, ref in zip(cases, refs):
        mine = run_kernel(case)
        if ref["ok"] != mine["ok"]:
            mismatches += 1
            print(f"MISMATCH(ok) {case['name']}: ref={ref} mine={mine}")
            continue
        if ref["ok"] and rc.normalize(ref["result"]) != rc.normalize(mine["result"]):
            mismatches += 1
            print(f"MISMATCH {case['name']}:\n  case={json.dumps(case)}"
                  f"\n  ref ={json.dumps(ref['result'], sort_keys=True)}"
                  f"\n  mine={json.dumps(mine['result'], sort_keys=True)}")
    print(f"{len(cases)} cases, {mismatches} mismatches")

    if args.write:
        out = [{"case": c, "ref": r} for c, r in zip(cases, refs)]
        path = REPO / "tests" / "golden" / "cases.json"
        path.write_text(json.dumps(out, indent=1))
        print(f"wrote {path} ({len(out)} cases)")
    return 1 if mismatches else 0


if __name__ == "__main__":
    sys.exit(main())
