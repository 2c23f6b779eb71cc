// Measure the REFERENCE implementation's single-node validation
// throughput on the image-table row shape (the "matches-or-beats the
// reference" comparison in BASELINE.md). Usage: node tools/bench_reference.mjs [rows]

import schisma from '/root/reference/src/schisma.mjs'

const N = parseInt(process.argv[2] || '100000', 10)

const imageSchema = schisma({
  image_id: String,
  w: { $type: Number, $validate: (v) => v >= 1 && v <= 65535 },
  h: { $type: Number, $validate: (v) => v >= 1 && v <= 65535 },
  fmt: { $type: String, $validate: (v) => ['png', 'jpeg', 'webp'].includes(v) },
  caption: String,
  phash: BigInt,
})

// materialize rows first (generation excluded from the timing)
const fmts = ['png', 'jpeg', 'webp']
const rows = new Array(N)
for (let i = 0; i < N; i++) {
  const row = {
    image_id: `img-${String(i).padStart(9, '0')}`,
    w: 8 + (i % 25),
    h: 8 + ((i * 7) % 25),
    fmt: fmts[i % 3],
    caption: `a photo of thing number ${i}`,
    phash: BigInt(i) * 2654435761n,
  }
  if (i % 109 === 11) delete row.caption
  if (i % 113 === 13) delete row.w
  rows[i] = row
}

// warm-up pass
for (let i = 0; i < Math.min(N, 5000); i++) imageSchema.validate(rows[i])

let violations = 0
const t0 = process.hrtime.bigint()
for (let i = 0; i < N; i++) {
  violations += imageSchema.validate(rows[i]).length
}
const sec = Number(process.hrtime.bigint() - t0) / 1e9
console.log(JSON.stringify({
  engine: 'reference (kettek/schisma under node, single thread)',
  rows: N,
  violations,
  sec: Math.round(sec * 1000) / 1000,
  rows_per_s: Math.round(N / sec),
}))
