// Differential-test harness: runs the REFERENCE implementation
// (/root/reference, read-only) on JSON-encoded cases from stdin and
// prints JSON-encoded results, one line per case. Used only at
// golden-fixture generation time (tools/gen_golden.py); pytest consumes
// the committed fixtures and never needs node.
//
// Value encoding (shared with tests/ref_codec.py):
//   undefined -> {"$undef":true}; bigint -> {"$bigint":"5"};
//   NaN/Inf -> {"$num":"NaN"}; function -> {"$fn":"Number"}; else plain JSON.
// Schema encoding: {"$class":name} | {"$arr":[..]} | {"$obj":{..}} |
//   {"$sobj":{..}} | {"$lit":value} | {"$null":true}

import schisma from '/root/reference/src/schisma.mjs'
import { createInterface } from 'node:readline'

const Null = schisma.Schisma.Null
const CLASSES = { Number, BigInt, String, Boolean, Null, Date }

// Hook registry — semantics duplicated in tests/ref_codec.py.
const VALIDATORS = {
  always_true: () => true,
  always_undefined: () => undefined,
  always_false: () => false,
  is_positive: (v) => (typeof v === 'number' && v > 0),
  msg_if_neg: (v) => (typeof v === 'number' && v < 0 ? 'must be non-negative' : undefined),
  obj_if_neg: (v) => (typeof v === 'number' && v < 0 ? { expected: '>=0', received: v } : true),
  max_len_5: (v) => (typeof v === 'string' && v.length > 5 ? { expected: '<=5 chars', received: v.length } : true),
}
const UNMARSHALS = {
  identity: (v) => v,
  to_number: (v) => Number(v),
  upper: (v) => String(v).toUpperCase(),
}
const DEFAULT_FNS = {
  default_seven: () => 7,
  default_from_data: (d) => (d === undefined ? 'empty' : String(d)),
}

function decValue(v) {
  if (v === null) return null
  if (Array.isArray(v)) return v.map(decValue)
  if (typeof v === 'object') {
    if (v.$undef) return undefined
    if (v.$bigint !== undefined) return BigInt(v.$bigint)
    if (v.$num !== undefined) return Number(v.$num)
    if (v.$fn !== undefined) return CLASSES[v.$fn]
    const o = {}
    for (const k of Object.keys(v)) o[k] = decValue(v[k])
    return o
  }
  return v
}

function decSchema(s) {
  if (s === null || s.$null) return null
  if (s.$node !== undefined) return schisma(decSchema(s.$node))
  if (s.$class !== undefined) return CLASSES[s.$class]
  if (s.$arr !== undefined) return s.$arr.map(decSchema)
  if (s.$lit !== undefined) return decValue(s.$lit)
  if (s.$obj !== undefined) {
    const o = {}
    for (const [k, v] of Object.entries(s.$obj)) {
      o[k] = k.startsWith('$/') ? v.map(decSchema) : decSchema(v)
    }
    return o
  }
  if (s.$sobj !== undefined) {
    const src = s.$sobj, o = {}
    if (src.typeof !== undefined) o.$typeof = src.typeof.map(decSchema)
    if (src.type !== undefined) o.$type = decSchema(src.type)
    if (src.default !== undefined) o.$default = decValue(src.default)
    if (src.defaultFn !== undefined) o.$default = DEFAULT_FNS[src.defaultFn]
    if (src.required !== undefined) o.$required = src.required
    if (src.validate !== undefined) o.$validate = VALIDATORS[src.validate]
    if (src.unmarshal !== undefined) o.$unmarshal = UNMARSHALS[src.unmarshal]
    return o
  }
  throw new Error('bad schema encoding: ' + JSON.stringify(s))
}

function fnName(v) {
  for (const [name, fn] of Object.entries(CLASSES)) if (fn === v) return name
  return v.name || 'anonymous'
}

function enc(v) {
  if (v === undefined) return { $undef: true }
  if (v === null) return null
  if (typeof v === 'bigint') return { $bigint: v.toString() }
  if (typeof v === 'number') {
    if (Number.isNaN(v) || !Number.isFinite(v)) return { $num: String(v) }
    return v
  }
  if (typeof v === 'function') return { $fn: fnName(v) }
  if (Array.isArray(v)) return v.map(enc)
  if (typeof v === 'object') {
    const o = {}
    for (const k of Object.keys(v)) o[k] = enc(v[k])
    return o
  }
  return v
}

const rl = createInterface({ input: process.stdin, terminal: false })
rl.on('line', (line) => {
  if (!line.trim()) return
  const c = JSON.parse(line)
  let out
  try {
    const sch = schisma(decSchema(c.schema))
    let result
    if (c.op === 'validate') result = sch.validate(decValue(c.doc), c.conf || {})
    else if (c.op === 'conform') result = sch.conform(decValue(c.doc), c.conf || {})
    else if (c.op === 'conform2') result = sch.conform(sch.conform(decValue(c.doc), c.conf || {}), c.conf || {})
    else if (c.op === 'create') result = sch.create(c.conf || {}, c.doc !== undefined ? decValue(c.doc) : undefined)
    else if (c.op === 'createProperty') result = sch.createProperty(c.which, c.conf || {}, c.doc !== undefined ? decValue(c.doc) : undefined)
    else throw new Error('bad op ' + c.op)
    out = { ok: true, result: enc(result) }
  } catch (e) {
    out = { ok: false, error: String(e && e.message ? e.message : e) }
  }
  process.stdout.write(JSON.stringify(out) + '\n')
})
