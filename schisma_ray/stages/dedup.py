"""Deduplication operators for large text corpora.

Four families (the dedup battery a training-data pipeline needs):

* **exact** — content key (raw value or md5) -> hash-partitioned keep-min.
  Pre-aggregated: per-batch ``group_by(key).min(id)`` partials, then a
  small global groupby — a hot key contributes one row per batch, not
  one per duplicate, so the shuffle carries distinct keys only.
* **MinHash + LSH** — word-shingle sets -> k-permutation MinHash
  signature -> banded LSH buckets (groupby on (band, band_hash)) ->
  candidate pairs -> exact-Jaccard verification. Candidates, not the
  corpus, go through the pairwise stage.
* **SimHash** — 64-bit SimHash of token hashes; banded into 4x16-bit
  keys so any pair within Hamming distance 3 shares >= 1 band (pigeon-
  hole); candidates verified by true Hamming distance.
* **n-gram Jaccard** — the verification kernel, exposed standalone.

All hashing is seeded/deterministic (pandas hash_array + splitmix-style
mixing), so outputs are reproducible across runs and cluster sizes.
"""

from __future__ import annotations

import hashlib
from typing import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray


def _hash_tokens(tokens: Iterable[str]) -> np.ndarray:
    arr = np.asarray(list(tokens), dtype=object)
    if len(arr) == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(arr).astype(np.uint64)


def word_shingles(text: str, n: int = 3) -> list[str]:
    words = text.split()
    if len(words) < n:
        return [" ".join(words)] if words else []
    return [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]


# ----------------------------------------------------------------- exact
def exact_dedup_keep_first(ds, key: str, id_col: str):
    """Dataset of the surviving (minimum) id per distinct key value."""

    def partial(batch: pa.Table) -> pa.Table:
        t = (
            batch.select([key, id_col])
            .group_by(key)
            .aggregate([(id_col, "min")])
        )
        return t.rename_columns([key, id_col])

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    kept = partials.groupby(key).min(id_col)
    # output column named like the input id column

    def project(t: pa.Table) -> pa.Table:
        return pa.table({id_col: t[f"min({id_col})"]})

    return kept.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def content_fingerprint(ds, col: str, id_col: str):
    """(id, fingerprint=md5(col)) — exact-dup key; matches SQL md5()."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[col].to_pylist()
        fps = [
            None if t is None else hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in texts
        ]
        return pa.table(
            {id_col: batch[id_col], "fingerprint": pa.array(fps, pa.string())}
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------- MinHash
class MinHasher:
    """Actor-pool stage: per-row MinHash signature over word shingles.

    Permutation parameters are generated once per actor in ``__init__``
    (seeded), not per batch.
    """

    def __init__(self, col: str, id_col: str, num_perm: int = 64,
                 shingle: int = 3, seed: int = 1234):
        rng = np.random.default_rng(seed)
        mersenne = np.uint64((1 << 61) - 1)
        self.a = rng.integers(1, mersenne, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, mersenne, size=num_perm, dtype=np.uint64)
        self.p = mersenne
        self.col = col
        self.id_col = id_col
        self.num_perm = num_perm
        self.shingle = shingle

    def signature(self, text: str) -> np.ndarray:
        h = _hash_tokens(set(word_shingles(text, self.shingle)))
        if len(h) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (a*h + b) mod p for all permutations, vectorized (num_perm x n)
        vals = (self.a[:, None] * (h[None, :] % self.p) + self.b[:, None]) % self.p
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.col].to_pylist()
        sigs = [self.signature(t or "") for t in texts]
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "signature": pa.array(
                    [s.astype(np.int64).tolist() for s in sigs],
                    pa.list_(pa.int64()),
                ),
            }
        )


def _band_rows(batch: pa.Table, id_col: str, bands: int, rows_per_band: int) -> pa.Table:
    ids, band_ids, band_hashes = [], [], []
    for rid, sig in zip(batch[id_col].to_pylist(), batch["signature"].to_pylist()):
        sig = np.asarray(sig, dtype=np.uint64)
        for b in range(bands):
            chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
            digest = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
            ids.append(rid)
            band_ids.append(b)
            band_hashes.append(int.from_bytes(digest, "little", signed=True))
    return pa.table(
        {
            id_col: pa.array(ids),
            "band": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(band_hashes, pa.int64()),
        }
    )


def minhash_candidate_pairs(ds, col: str, id_col: str, *, num_perm: int = 64,
                            bands: int = 16, shingle: int = 3, seed: int = 1234,
                            max_bucket: int = 1000, actor_pool: bool = False):
    """LSH candidate pairs (a < b) from banded MinHash signatures.

    Default is task mode (the signature stage fuses into the read; the
    permutation table costs microseconds to build). ``actor_pool=True``
    switches to an autoscaling pool — the right shape if the hasher ever
    grows heavy state (e.g. a tokenizer model).
    """
    rows_per_band = num_perm // bands
    if actor_pool:
        sigs = ds.map_batches(
            MinHasher,
            fn_constructor_args=(col, id_col, num_perm, shingle, seed),
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=(1, 8),
        )
    else:
        sigs = ds.map_batches(
            MinHasher(col, id_col, num_perm, shingle, seed),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    band_rows = sigs.map_batches(
        lambda b: _band_rows(b, id_col, bands, rows_per_band),
        batch_format="pyarrow",
    )

    return _bucket_pairs(band_rows, ["band", "band_hash"], id_col, max_bucket)


def _bucket_pairs(banded_ds, group_cols: list[str], id_col: str,
                  max_bucket: int, driver_limit: int = 5_000_000) -> pa.Table:
    """(a, b) id pairs per bucket, a < b.

    Small banded sets (<= driver_limit rows) fold on the driver with a
    pandas groupby — Ray's sort shuffle has seconds of fixed cost that
    dwarfs corpora below millions of rows. Larger sets go through the
    scalable ``groupby(bucket).map_groups`` path. Buckets larger than
    ``max_bucket`` are truncated (degenerate all-identical content)."""
    collected: list[pa.Table] = []
    total = 0
    overflow = False
    for batch in banded_ds.iter_batches(batch_format="pyarrow", batch_size=None):
        t = batch if isinstance(batch, pa.Table) else pa.Table.from_batches([batch])
        collected.append(t)
        total += t.num_rows
        if total > driver_limit:
            overflow = True
            break

    def emit_pairs(ids: list) -> tuple[list, list]:
        ids = sorted(ids)[:max_bucket]
        a_out, b_out = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_out.append(ids[i])
                b_out.append(ids[j])
        return a_out, b_out

    if not overflow:
        if not collected:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        df = pa.concat_tables(collected).to_pandas()
        a_all, b_all = [], []
        for _, group in df.groupby(group_cols, sort=False):
            if len(group) < 2:
                continue
            a_out, b_out = emit_pairs(group[id_col].tolist())
            a_all.extend(a_out)
            b_all.extend(b_out)
        return pa.table({"a": pa.array(a_all), "b": pa.array(b_all)})

    def pairs(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_pylist()
        if len(ids) < 2:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        a_out, b_out = emit_pairs(ids)
        return pa.table({"a": pa.array(a_out), "b": pa.array(b_out)})

    cand = banded_ds.groupby(group_cols).map_groups(pairs, batch_format="pyarrow")
    return pa.Table.from_pandas(cand.to_pandas(), preserve_index=False)


def jaccard(text_a: str, text_b: str, shingle: int = 3) -> float:
    sa = set(word_shingles(text_a, shingle))
    sb = set(word_shingles(text_b, shingle))
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    union = len(sa | sb)
    return inter / union if union else 0.0


def minhash_dedup_pairs(ds, col: str, id_col: str, *, threshold: float = 0.8,
                        num_perm: int = 64, bands: int = 16, shingle: int = 3,
                        seed: int = 1234) -> pa.Table:
    """Verified near-duplicate pairs (a, b, jaccard >= threshold).

    Candidates come from LSH; verification joins the candidate ids back
    to their texts via a broadcast lookup (candidate set << corpus).
    Returns a driver-side table (the verified pair set is small by
    construction; at extreme scales feed candidates through a bucketed
    join instead).
    """
    cand_tbl = minhash_candidate_pairs(
        ds, col, id_col, num_perm=num_perm, bands=bands, shingle=shingle, seed=seed
    )
    if cand_tbl.num_rows == 0:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    # distinct pairs
    cand_tbl = cand_tbl.group_by(["a", "b"]).aggregate([])
    need = set(cand_tbl["a"].to_pylist()) | set(cand_tbl["b"].to_pylist())
    need_arr = pa.array(sorted(need))
    texts_ds = ds.map_batches(
        lambda t: t.select([id_col, col]).filter(
            pc.is_in(t[id_col].combine_chunks(), value_set=need_arr)
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    texts = {}
    for batch in texts_ds.iter_batches(batch_format="pyarrow"):
        for rid, txt in zip(batch[id_col].to_pylist(), batch[col].to_pylist()):
            texts[rid] = txt or ""
    a_out, b_out, j_out = [], [], []
    for a, b in zip(cand_tbl["a"].to_pylist(), cand_tbl["b"].to_pylist()):
        j = jaccard(texts.get(a, ""), texts.get(b, ""), shingle)
        if j >= threshold:
            a_out.append(a)
            b_out.append(b)
            j_out.append(round(j, 6))
    return pa.table({"a": pa.array(a_out), "b": pa.array(b_out),
                     "jaccard": pa.array(j_out, pa.float64())})


# --------------------------------------------------------------- SimHash
def simhash64(text: str) -> int:
    h = _hash_tokens(text.split())
    if len(h) == 0:
        return 0
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    value = 0
    for i in range(64):
        if votes[i] > 0:
            value |= 1 << i
    return value - (1 << 64) if value >= (1 << 63) else value


def simhash_signatures(ds, col: str, id_col: str):
    def fn(batch: pa.Table) -> pa.Table:
        sigs = [simhash64(t or "") for t in batch[col].to_pylist()]
        return pa.table({id_col: batch[id_col], "simhash": pa.array(sigs, pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def simhash_dup_pairs(ds, col: str, id_col: str, *, max_hamming: int = 3) -> pa.Table:
    """Near-dup pairs by SimHash banding (4 x 16-bit) + Hamming verify."""
    sigs = simhash_signatures(ds, col, id_col)

    def bands(batch: pa.Table) -> pa.Table:
        ids, band_ids, keys, full = [], [], [], []
        for rid, sh in zip(batch[id_col].to_pylist(), batch["simhash"].to_pylist()):
            u = sh & ((1 << 64) - 1)
            for b in range(4):
                ids.append(rid)
                band_ids.append(b)
                keys.append((u >> (16 * b)) & 0xFFFF)
                full.append(sh)
        return pa.table(
            {
                id_col: pa.array(ids),
                "band": pa.array(band_ids, pa.int32()),
                "key": pa.array(keys, pa.int32()),
                "simhash": pa.array(full, pa.int64()),
            }
        )

    banded = sigs.map_batches(bands, batch_format="pyarrow")
    empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                      "hamming": pa.array([], pa.int32())})
    cand = _bucket_pairs(banded, ["band", "key"], id_col, max_bucket=1000)
    if cand.num_rows == 0:
        return empty
    cand = cand.group_by(["a", "b"]).aggregate([])
    # Hamming verification: look up the simhash of candidate ids only
    need = set(cand["a"].to_pylist()) | set(cand["b"].to_pylist())
    need_arr = pa.array(sorted(need))
    sig_map: dict = {}
    filtered = sigs.map_batches(
        lambda t: t.filter(pc.is_in(t[id_col].combine_chunks(), value_set=need_arr)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    for batch in filtered.iter_batches(batch_format="pyarrow"):
        for rid, sh in zip(batch[id_col].to_pylist(), batch["simhash"].to_pylist()):
            sig_map[rid] = sh
    a_out, b_out, d_out = [], [], []
    for a, b in zip(cand["a"].to_pylist(), cand["b"].to_pylist()):
        d = bin((sig_map[a] ^ sig_map[b]) & ((1 << 64) - 1)).count("1")
        if d <= max_hamming:
            a_out.append(a)
            b_out.append(b)
            d_out.append(d)
    if not a_out:
        return empty
    return pa.table({"a": pa.array(a_out), "b": pa.array(b_out),
                     "hamming": pa.array(d_out, pa.int32())})
