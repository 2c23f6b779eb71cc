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


_ROLL_B = np.uint64(1000003)  # odd -> invertible mod 2^64


def _modinv_pow2_64(a: int) -> int:
    """Inverse of odd a mod 2^64 (Newton iteration on 2-adic integers)."""
    x = a  # correct to 3 bits
    for _ in range(5):
        x = (x * (2 - a * x)) & 0xFFFFFFFFFFFFFFFF
    return x


_ROLL_BINV = np.uint64(_modinv_pow2_64(int(_ROLL_B)))


def rolling_hashes(data: bytes, k: int) -> np.ndarray:
    """All k-gram rolling hashes of ``data`` (uint64, mod 2^64), fully
    vectorized: h[i] = sum_j data[i+j] * B^j (reversed-polynomial Rabin
    hash — position-independent: equal k-grams hash equally).

    One cumulative sum S[i] = sum_{j<=i} c[j]*B^j gives
    h[i] = (S[i+k-1] - S[i-1]) * Binv^i (Binv = modular inverse of the
    odd base mod 2^64) — no per-position loop. The extra constant
    B^(k-1) factor below is a bijection mod 2^64 (odd), harmless.
    """
    c = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    n = len(c)
    if n < k:
        return np.empty(0, dtype=np.uint64)
    idx = np.arange(n, dtype=np.uint64)
    powB = np.empty(n, dtype=np.uint64)
    powB[0] = 1
    np.multiply.accumulate(np.full(n - 1, _ROLL_B, np.uint64), out=powB[1:])
    powBinv = np.empty(n, dtype=np.uint64)
    powBinv[0] = 1
    np.multiply.accumulate(np.full(n - 1, _ROLL_BINV, np.uint64), out=powBinv[1:])
    S = np.cumsum(c * powB, dtype=np.uint64)
    diff = S[k - 1 :].copy()
    diff[1:] -= S[: n - k]
    # h[i] = diff[i] * Binv^i * B^(k-1)... fold the constants:
    return diff * powBinv[: n - k + 1] * powB[k - 1]


def winnow_fingerprints_one(text: str, k: int = 8, window: int = 4) -> np.ndarray:
    """Winnowing (Schleimer/Wilkerson/Aiken-style): k-gram rolling hashes,
    then the minimum of every ``window`` consecutive hashes (rightmost
    min per window), deduplicated. Guarantees any shared substring of
    length >= k + window - 1 contributes >= 1 shared fingerprint."""
    h = rolling_hashes(text.encode("utf-8"), k)
    if len(h) == 0:
        return np.empty(0, dtype=np.uint64)
    if len(h) <= window:
        return np.unique(h.min(keepdims=True))
    from numpy.lib.stride_tricks import sliding_window_view

    win = sliding_window_view(h, window)
    # rightmost minimum: argmin on the reversed window
    rev_arg = np.argmin(win[:, ::-1], axis=1)
    pos = np.arange(len(win)) + (window - 1 - rev_arg)
    return np.unique(h[np.unique(pos)])


def winnow_fingerprints(ds, col: str, id_col: str, *, k: int = 8, window: int = 4):
    """(id, fingerprint) rows — content-defined rolling-hash fingerprints
    (the brief's 'document fingerprinting (rolling hash)'). Exploded so
    downstream overlap detection is a plain groupby on fingerprint."""

    def fn(batch: pa.Table) -> pa.Table:
        ids_out, fps_out = [], []
        for rid, t in zip(batch[id_col].to_pylist(), batch[col].to_pylist()):
            fps = winnow_fingerprints_one(t or "", k, window)
            ids_out.extend([rid] * len(fps))
            fps_out.append(fps)
        flat = (
            np.concatenate(fps_out) if fps_out else np.empty(0, np.uint64)
        ).view(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids_out),
                "fingerprint": pa.array(flat, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def winnow_overlap_pairs(ds, col: str, id_col: str, *, k: int = 8,
                         window: int = 4, min_shared: int = 2,
                         max_bucket: int = 1000) -> pa.Table:
    """Candidate near-dup/plagiarism pairs: docs sharing >= min_shared
    winnow fingerprints. Same banded-bucket shape as MinHash LSH — the
    all-to-all carries (fingerprint, id) rows only."""
    fps = winnow_fingerprints(ds, col, id_col, k=k, window=window)
    cand = _bucket_pairs(fps, ["fingerprint"], id_col, max_bucket)
    if cand.num_rows == 0:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "shared": pa.array([], pa.int64())})
    counted = (
        cand.group_by(["a", "b"])
        .aggregate([([], "count_all")])
        .rename_columns(["a", "b", "shared"])
    )
    return counted.filter(
        pc.greater_equal(counted["shared"], min_shared)
    ).sort_by([("a", "ascending"), ("b", "ascending")])


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


def payload_md5_hex(blobs) -> list:
    """Per-payload md5 over the UPPERCASE hex encoding, matching SQL
    ``md5(hex(bytes))`` (DuckDB's md5 only takes VARCHAR, so the hex
    round-trip is the portable definition — the single place this
    SQL-parity-critical contract is spelled). None stays None."""
    import binascii

    return [
        None if b is None
        else hashlib.md5(binascii.hexlify(b).upper()).hexdigest()
        for b in blobs
    ]


def binary_fingerprint(ds, col: str, id_col: str):
    """(id, fingerprint) for a BINARY column via ``payload_md5_hex`` —
    the multimodal exact-dup key: identical encoded images/audio
    collapse to one fingerprint. Null payloads emit a null
    fingerprint."""

    def fn(batch: pa.Table) -> pa.Table:
        fps = payload_md5_hex(batch[col].to_pylist())
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

    #: token budget per (num_perm x tokens) temp matrix — bounds the
    #: transient to ~50 MB at 64 permutations
    _CHUNK_TOKENS = 100_000

    def signatures_batch(self, texts: list) -> np.ndarray:
        """(n_docs, num_perm) uint64 — ONE hash_array over every distinct
        shingle of every doc, then chunked (a*h+b) mod p with per-doc
        np.minimum.reduceat. Identical values to per-doc signature()
        (min is order-invariant over the same shingle set)."""
        n = len(texts)
        counts = np.empty(n, np.int64)
        all_sh: list[str] = []
        for i, t in enumerate(texts):
            sh = set(word_shingles(t or "", self.shingle))
            counts[i] = len(sh)
            all_sh.extend(sh)
        sigs = np.full((n, self.num_perm), np.iinfo(np.uint64).max, np.uint64)
        if not all_sh:
            return sigs
        h = _hash_tokens(all_sh) % self.p
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        doc_idx = np.nonzero(counts > 0)[0]
        i0 = 0
        while i0 < len(doc_idx):
            i1, tok = i0, 0
            while i1 < len(doc_idx) and (
                tok == 0 or tok + counts[doc_idx[i1]] <= self._CHUNK_TOKENS
            ):
                tok += counts[doc_idx[i1]]
                i1 += 1
            docs = doc_idx[i0:i1]
            s0 = starts[docs[0]]
            s1 = starts[docs[-1]] + counts[docs[-1]]
            hh = h[s0:s1]
            vals = (self.a[:, None] * hh[None, :] + self.b[:, None]) % self.p
            mins = np.minimum.reduceat(vals, (starts[docs] - s0), axis=1)
            sigs[docs] = mins.T
            i0 = i1
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = self.signatures_batch(batch[self.col].to_pylist())
        flat = sigs.astype(np.int64).reshape(-1)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "signature": pa.FixedSizeListArray.from_arrays(
                    pa.array(flat, pa.int64()), self.num_perm
                ).cast(pa.list_(pa.int64())),
            }
        )


def _band_rows(batch: pa.Table, id_col: str, bands: int, rows_per_band: int) -> pa.Table:
    """Banded LSH rows, fully vectorized: the (n, bands, rows_per_band)
    signature tensor folds to one 64-bit band hash via an FNV-1a-style
    word fold (rows_per_band numpy iterations over the whole batch — no
    per-row Python, no per-band digest calls). LSH recall depends only
    on chunk EQUALITY (equal chunks -> equal hash, guaranteed by any
    deterministic fold); collisions at 2^-64 are as negligible as the
    blake2b digests this replaces."""
    n = batch.num_rows
    if n == 0:
        return pa.table(
            {
                id_col: pa.array([], batch.schema.field(id_col).type),
                "band": pa.array([], pa.int32()),
                "band_hash": pa.array([], pa.int64()),
            }
        )
    sig_col = batch["signature"].combine_chunks()
    flat = sig_col.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
    arr = flat.reshape(n, bands, rows_per_band)
    # zero-shingle documents (empty/whitespace text) carry the all-max
    # sentinel signature — real minima are < p < 2^61, so slot [0,0]
    # suffices. They must never enter LSH: the SQL oracles emit no
    # grams (hence no pairs) for them, and without this mask every
    # blank doc lands in one bucket and verifies jaccard(0,0) = 1.0
    real = arr[:, 0, 0] != np.iinfo(np.uint64).max
    if not real.all():
        batch = batch.filter(pa.array(real))
        n = batch.num_rows
        arr = arr[real]
        if n == 0:
            return pa.table(
                {
                    id_col: pa.array([], batch.schema.field(id_col).type),
                    "band": pa.array([], pa.int32()),
                    "band_hash": pa.array([], pa.int64()),
                }
            )
    h = np.full((n, bands), np.uint64(0xCBF29CE484222325), np.uint64)
    prime = np.uint64(0x100000001B3)
    for r in range(rows_per_band):
        # fold each 64-bit word in two 32-bit halves (FNV-1a shape)
        w = arr[:, :, r]
        h = (h ^ (w & np.uint64(0xFFFFFFFF))) * prime
        h = (h ^ (w >> np.uint64(32))) * prime
    ids = batch[id_col].combine_chunks()
    return pa.table(
        {
            id_col: pa.concat_arrays([ids] * bands),
            "band": pa.array(
                np.repeat(np.arange(bands, dtype=np.int32), n), pa.int32()
            ),
            "band_hash": pa.array(
                h.T.reshape(-1).view(np.int64), pa.int64()
            ),
        }
    )


def _fold_pairs(pairs_ds) -> pa.Table:
    """Driver fold of a PAIR dataset -> pa.Table. Every driver hop for
    candidate/verified pair tables in this module goes through here, so
    tests can disable it outright and prove the ``as_dataset`` chain
    never collects pairs (VERDICT r2 #1)."""
    from ._fold import fold_table

    return fold_table(pairs_ds)


def minhash_candidate_pairs(ds, col: str, id_col: str, *, num_perm: int = 64,
                            bands: int = 16, shingle: int = 3, seed: int = 1234,
                            max_bucket: int = 1000, actor_pool: bool = False,
                            as_dataset: bool = False):
    """LSH candidate pairs (a < b) from banded MinHash signatures.

    Default is task mode (the signature stage fuses into the read; the
    permutation table costs microseconds to build). ``actor_pool=True``
    switches to an autoscaling pool — the right shape if the hasher ever
    grows heavy state (e.g. a tokenizer model). ``as_dataset=True``
    returns the pair Dataset without any driver fold (the 100-TB path).
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

    return _bucket_pairs(band_rows, ["band", "band_hash"], id_col, max_bucket,
                         as_dataset=as_dataset)


_EMPTY_PAIRS = None


def _empty_pairs() -> pa.Table:
    global _EMPTY_PAIRS
    if _EMPTY_PAIRS is None:
        _EMPTY_PAIRS = pa.table({"a": pa.array([], pa.int64()),
                                 "b": pa.array([], pa.int64())})
    return _EMPTY_PAIRS


def _pair_shapes(banded_ds, group_cols: list[str], id_col: str, emit,
                 driver_limit: int = 5_000_000, as_dataset: bool = False):
    """The shared three-shape harness for bucketed pair emission
    (``emit(ids) -> (a, b)`` numpy arrays, possibly empty):

    * ``as_dataset=True`` — ``groupby(bucket).map_groups`` pair Dataset,
      no driver hop at any size (the end-to-end Dataset chain);
    * small banded sets (<= driver_limit rows) fold on the driver with
      a pandas groupby — Ray's sort shuffle has seconds of fixed cost
      that dwarfs corpora below millions of rows;
    * larger sets run the scalable map_groups path and fold only the
      (bounded-by-emit) pair set as Arrow."""

    def pairs(group: pa.Table) -> pa.Table:
        a_out, b_out = emit(group[id_col].to_pylist())
        if len(a_out) == 0:
            return _empty_pairs()
        return pa.table({"a": pa.array(a_out), "b": pa.array(b_out)})

    if as_dataset:
        return banded_ds.groupby(group_cols).map_groups(
            pairs, batch_format="pyarrow"
        )

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

    if not overflow:
        if not collected:
            return _empty_pairs()
        df = pa.concat_tables(collected).to_pandas()
        # singleton buckets emit nothing; dropping them first turns a
        # loop over ~n_keys groups (65k+ per band, mostly singletons —
        # measured 75 s at 100k sigs) into one over just the colliding
        # groups (thousands)
        df = df[df.duplicated(subset=group_cols, keep=False)]
        a_all, b_all = [], []
        for _, group in df.groupby(group_cols, sort=False):
            a_out, b_out = emit(group[id_col].tolist())
            if len(a_out):
                a_all.append(a_out)
                b_all.append(b_out)
        if not a_all:
            return _empty_pairs()
        return pa.table({"a": pa.array(np.concatenate(a_all)),
                         "b": pa.array(np.concatenate(b_all))})

    cand = banded_ds.groupby(group_cols).map_groups(pairs, batch_format="pyarrow")
    folded = _fold_pairs(cand)
    if folded is None:
        return _empty_pairs()
    return folded


def _bucket_pairs(banded_ds, group_cols: list[str], id_col: str,
                  max_bucket: int, driver_limit: int = 5_000_000,
                  as_dataset: bool = False):
    """(a, b) id pairs per bucket, a < b (the within-corpus shape).
    Buckets larger than ``max_bucket`` are truncated (degenerate
    all-identical content). Shapes: see ``_pair_shapes``."""

    def emit(ids) -> tuple[np.ndarray, np.ndarray]:
        # vectorized upper-triangle pairing: a bucket of m ids emits
        # C(m,2) rows with zero per-pair Python (matters when duplicate-
        # heavy content fills buckets to max_bucket)
        if len(ids) < 2:
            z = np.empty(0, np.int64)
            return z, z
        ids = np.array(sorted(ids)[:max_bucket])
        iu, ju = np.triu_indices(len(ids), k=1)
        return ids[iu], ids[ju]

    return _pair_shapes(banded_ds, group_cols, id_col, emit,
                        driver_limit=driver_limit, as_dataset=as_dataset)


def _verify_pairs_bucketed(ds, cand, col: str, id_col: str,
                           verify_fn=None, *, num_buckets: int = 64,
                           as_dataset: bool = False,
                           prepare_fn=None, pair_fn=None):
    """Distributed pair verification: attach both payloads of every
    candidate pair via two bucketed shuffles over CANDIDATE-sized data,
    then run ``verify_fn(payload_a, payload_b)`` inside buckets.

    The 100-TB path (SURVEY.md §2 joins/lookups): payloads (texts) are
    never driver-resident —

    1. each pair (a, b) becomes two slot rows (id, pair_id, slot),
       hash-bucketed by id;
    2. the corpus projection (id, payload), pre-filtered to candidate
       ids with one broadcast ``is_in``, is bucketed the same way; a
       per-bucket vectorized merge attaches the payload to each slot row;
    3. slot rows re-bucket by pair_id; each pair's two rows meet in one
       bucket where ``verify_fn`` runs.

    ``cand`` may be a driver pa.Table or a pair DATASET; with
    ``as_dataset=True`` the (a, b, metric) result is returned as a
    Dataset too — the only driver-resident state on that path is the
    distinct candidate-ID array broadcast for the corpus prune (ids,
    never pairs and never payloads). Metric is unfiltered — the caller
    applies its threshold.
    """
    import ray.data as rd

    def id_bucket(arr: pa.Array) -> np.ndarray:
        # works for int AND string ids
        h = pd.util.hash_array(arr.to_numpy(zero_copy_only=False))
        return (h % num_buckets).astype(np.int32)

    if isinstance(cand, pa.Table):
        n = cand.num_rows
        id_type = cand["a"].type
        empty = pa.table({"a": pa.array([], id_type),
                          "b": pa.array([], id_type),
                          "metric": pa.array([], pa.float64())})
        if n == 0:
            return rd.from_arrow(empty) if as_dataset else empty
        a = cand["a"].combine_chunks() if isinstance(cand["a"], pa.ChunkedArray) else cand["a"]
        b = cand["b"].combine_chunks() if isinstance(cand["b"], pa.ChunkedArray) else cand["b"]
        pair_id = np.arange(n, dtype=np.int64)
        ids = pa.concat_arrays([a, b])
        slot_tbl = pa.table(
            {
                "bucket": pa.array(id_bucket(ids), pa.int32()),
                "id": ids,
                "pair_id": pa.array(np.concatenate([pair_id, pair_id]), pa.int64()),
                "slot": pa.array(
                    np.concatenate([np.zeros(n, np.int8), np.ones(n, np.int8)]),
                    pa.int8(),
                ),
                "payload": pa.array([None] * (2 * n), pa.string()),
            }
        )
        slots = rd.from_arrow(slot_tbl)
        need = pc.unique(ids)
    else:
        from .rank import zip_with_index

        empty = None
        # pair_id = global ordinal via block-offset prefix sums (rows
        # never touch the driver); materialized once, read twice below
        indexed = zip_with_index(cand, index_col="pair_id", start=0)
        id_type = _pair_id_type(indexed)
        need = _distinct_pair_ids(indexed)

        def make_slots(t: pa.Table) -> pa.Table:
            if "a" not in t.column_names or t.num_rows == 0:
                return pa.table(
                    {
                        "bucket": pa.array([], pa.int32()),
                        "id": pa.array([], id_type),
                        "pair_id": pa.array([], pa.int64()),
                        "slot": pa.array([], pa.int8()),
                        "payload": pa.array([], pa.string()),
                    }
                )
            a = t["a"].combine_chunks()
            b = t["b"].combine_chunks()
            pid = t["pair_id"].combine_chunks().to_numpy(zero_copy_only=False)
            n = t.num_rows
            ids = pa.concat_arrays([a, b])
            return pa.table(
                {
                    "bucket": pa.array(id_bucket(ids), pa.int32()),
                    "id": ids,
                    "pair_id": pa.array(
                        np.concatenate([pid, pid]).astype(np.int64), pa.int64()
                    ),
                    "slot": pa.array(
                        np.concatenate([np.zeros(n, np.int8), np.ones(n, np.int8)]),
                        pa.int8(),
                    ),
                    "payload": pa.array([None] * (2 * n), pa.string()),
                }
            )

        slots = indexed.map_batches(
            make_slots, batch_format="pyarrow", zero_copy_batch=True
        )
    need_ref = ray.put(need)

    def project(t: pa.Table) -> pa.Table:
        idc = pc.cast(t[id_col].combine_chunks(), id_type)
        keep = pc.fill_null(pc.is_in(idc, value_set=ray.get(need_ref)), False)
        t = pa.table({"id": idc, "payload": pc.cast(t[col].combine_chunks(), pa.string())}).filter(keep)
        idn = t["id"].combine_chunks() if isinstance(t["id"], pa.ChunkedArray) else t["id"]
        return pa.table(
            {
                "bucket": pa.array(id_bucket(idn), pa.int32()),
                "id": t["id"],
                "pair_id": pa.array(np.full(t.num_rows, -1, np.int64), pa.int64()),
                "slot": pa.array(np.full(t.num_rows, -1, np.int8), pa.int8()),
                "payload": t["payload"],
            }
        )

    payloads = ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)

    def attach(group: pd.DataFrame) -> pd.DataFrame:
        slots = group[group["slot"] >= 0][["id", "pair_id", "slot"]]
        texts = group[group["slot"] < 0][["id", "payload"]].drop_duplicates("id")
        m = slots.merge(texts, on="id", how="left")
        return pd.DataFrame(
            {
                "bucket": (m["pair_id"].to_numpy() % num_buckets).astype(np.int32),
                "pair_id": m["pair_id"].to_numpy(),
                "slot": m["slot"].to_numpy(),
                "id": m["id"].to_numpy(),
                "payload": m["payload"],
            }
        )

    attached = slots.union(payloads).groupby("bucket").map_groups(
        attach, batch_format="pandas"
    )

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["pair_id", "slot"]).reset_index(drop=True)
        g0 = g.iloc[0::2]
        g1 = g.iloc[1::2]
        if prepare_fn is not None:
            # payload-level memoization: each DISTINCT payload in the
            # bucket is prepared (tokenized/parsed) once, then pairs
            # compare prepared objects — with duplicate-heavy content a
            # payload appears in hundreds of pairs, so this turns the
            # dominant cost from O(pairs) tokenizations into O(distinct
            # payloads)
            cache: dict = {}

            def prep(p):
                p = "" if pd.isna(p) else p
                got = cache.get(p)
                if got is None:
                    got = prepare_fn(p)
                    cache[p] = got
                return got

            metric = [
                pair_fn(prep(ta), prep(tb))
                for ta, tb in zip(g0["payload"], g1["payload"])
            ]
        else:
            metric = [
                verify_fn("" if pd.isna(ta) else ta, "" if pd.isna(tb) else tb)
                for ta, tb in zip(g0["payload"], g1["payload"])
            ]
        return pd.DataFrame(
            {
                "a": g0["id"].to_numpy(),  # keeps int or string dtype
                "b": g1["id"].to_numpy(),
                "metric": np.asarray(metric, np.float64),
            }
        )

    out = attached.groupby("bucket").map_groups(verify, batch_format="pandas")
    if as_dataset:
        return out
    folded = _fold_pairs(out)
    return folded if folded is not None else empty


def _distinct_pairs_ds(pairs_ds):
    """Distributed distinct over (a, b) — one aggregate row per pair
    (a proper shuffle aggregate, NOT a per-pair map_groups)."""
    counted = pairs_ds.groupby(["a", "b"]).count()
    return counted.map_batches(
        lambda t: t.select(["a", "b"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _pair_id_type(pairs_ds) -> pa.DataType:
    schema = pairs_ds.schema()
    base = getattr(schema, "base_schema", schema)
    # an empty upstream map_groups can surface its INPUT schema; pairs
    # default to int64 ids in that case
    if base is None or "a" not in base.names:
        return pa.int64()
    return base.field("a").type


def _distinct_pair_ids(pairs_ds) -> pa.Array:
    """Distinct ids appearing in a pair Dataset — the broadcast side of
    the corpus prune. This collects IDS (O(distinct candidate ids), the
    same scale class as a survivor broadcast), never pair rows."""
    id_type = _pair_id_type(pairs_ds)

    def block_ids(t: pa.Table) -> pa.Table:
        if "a" not in t.column_names or t.num_rows == 0:
            return pa.table({"id": pa.array([], id_type)})
        return pa.table(
            {
                "id": pc.unique(
                    pa.concat_arrays(
                        [t["a"].combine_chunks(), t["b"].combine_chunks()]
                    )
                )
            }
        )

    per_block = pairs_ds.map_batches(
        block_ids, batch_format="pyarrow", zero_copy_batch=True
    )
    from ._fold import fold_table

    folded = fold_table(per_block)
    if folded is None:
        return pa.array([], id_type)
    return pc.unique(folded["id"].combine_chunks())


def _jaccard_sets(sa: frozenset, sb: frozenset) -> float:
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


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
                        seed: int = 1234,
                        verify_driver_limit: int = 100_000,
                        as_dataset: bool = False):
    """Verified near-duplicate pairs (a, b, jaccard >= threshold).

    Candidates come from LSH banding. Verification has three shapes:

    * ``as_dataset=True`` — the whole chain stays a Dataset: banded
      pairs -> distributed distinct -> ``_verify_pairs_bucketed``
      Dataset output. No pair row ever lands on the driver (feedable
      straight into ``components_distributed`` /
      ``near_dedup_survivors(strategy="join")``);
    * up to ``verify_driver_limit`` candidate pairs (the common
      driver-Table case — the pair set is small by construction): the
      candidate texts are fetched with one broadcast-filtered scan and
      verified locally;
    * beyond it, ``_verify_pairs_bucketed`` joins texts to pairs with
      two candidate-sized bucketed shuffles — texts never accumulate on
      the driver (force with verify_driver_limit=0).
    """
    if as_dataset:
        cand_ds = minhash_candidate_pairs(
            ds, col, id_col, num_perm=num_perm, bands=bands,
            shingle=shingle, seed=seed, as_dataset=True,
        )
    else:
        cand_ds = minhash_candidate_pairs(
            ds, col, id_col, num_perm=num_perm, bands=bands,
            shingle=shingle, seed=seed,
        )
    return _verified_jaccard_pairs(
        ds, cand_ds, col, id_col, threshold=threshold, shingle=shingle,
        verify_driver_limit=verify_driver_limit, as_dataset=as_dataset,
    )


def _verified_jaccard_pairs(ds, cand, col: str, id_col: str, *,
                            threshold: float, shingle: int,
                            verify_driver_limit: int = 100_000,
                            as_dataset: bool = False):
    """Shared verification tail for candidate-pair producers whose
    exact metric is n-gram Jaccard (MinHash LSH banding, prefix-filtered
    AllPairs): distinct candidates -> exact set Jaccard (payloads
    memoized per bucket) -> threshold -> (a, b, jaccard)."""
    if as_dataset:
        distinct = _distinct_pairs_ds(cand)
        verified = _verify_pairs_bucketed(
            ds, distinct, col, id_col,
            prepare_fn=lambda t: frozenset(word_shingles(t, shingle)),
            pair_fn=_jaccard_sets,
            as_dataset=True,
        )

        def thresh(t: pa.Table) -> pa.Table:
            hit = t.filter(pc.greater_equal(t["metric"], threshold))
            return pa.table(
                {
                    "a": hit["a"],
                    "b": hit["b"],
                    "jaccard": pc.round(hit["metric"], ndigits=6),
                }
            )

        return verified.map_batches(
            thresh, batch_format="pyarrow", zero_copy_batch=True
        )

    cand_tbl = cand
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
    if cand_tbl.num_rows == 0:
        return empty
    # distinct pairs
    cand_tbl = cand_tbl.group_by(["a", "b"]).aggregate([])

    if cand_tbl.num_rows > verify_driver_limit:
        verified = _verify_pairs_bucketed(
            ds, cand_tbl, col, id_col,
            prepare_fn=lambda t: frozenset(word_shingles(t, shingle)),
            pair_fn=_jaccard_sets,
        )
        keep = pc.greater_equal(verified["metric"], threshold)
        hit = verified.filter(keep)
        return pa.table(
            {
                "a": hit["a"],
                "b": hit["b"],
                "jaccard": pc.round(hit["metric"], ndigits=6),
            }
        ).sort_by([("a", "ascending"), ("b", "ascending")])

    need = set(cand_tbl["a"].to_pylist()) | set(cand_tbl["b"].to_pylist())
    need_arr = pa.array(sorted(need))
    texts_ds = ds.map_batches(
        lambda t: t.select([id_col, col]).filter(
            pc.is_in(t[id_col].combine_chunks(), value_set=need_arr)
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # each candidate text is tokenized ONCE (ids appear in many pairs)
    sets: dict = {}
    for batch in texts_ds.iter_batches(batch_format="pyarrow"):
        for rid, txt in zip(batch[id_col].to_pylist(), batch[col].to_pylist()):
            sets[rid] = frozenset(word_shingles(txt or "", shingle))
    nothing: frozenset = frozenset()
    a_out, b_out, j_out = [], [], []
    for a, b in zip(cand_tbl["a"].to_pylist(), cand_tbl["b"].to_pylist()):
        j = _jaccard_sets(sets.get(a, nothing), sets.get(b, nothing))
        if j >= threshold:
            a_out.append(a)
            b_out.append(b)
            j_out.append(round(j, 6))
    return pa.table({"a": pa.array(a_out), "b": pa.array(b_out),
                     "jaccard": pa.array(j_out, pa.float64())})


# ------------------------------------- exact n-gram Jaccard (AllPairs)
def _distinct_gram_rows(batch: pa.Table, col: str, id_col: str,
                        shingle: int, num_buckets: int) -> pa.Table:
    """Per-document DISTINCT word-shingle hash rows: ``(id, gram, n,
    gb)`` where ``n`` is the doc's distinct-gram count (carried on every
    row) and ``gb`` the gram-hash shuffle bucket. Per-batch distinct is
    globally exact — a document lives in exactly one batch."""
    nb = np.uint64(num_buckets)
    texts = batch[col].to_pylist()
    empty = pa.table(
        {
            id_col: pa.array([], batch.schema.field(id_col).type),
            "gram": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "gb": pa.array([], pa.int32()),
        }
    )
    if not texts:
        return empty
    all_sh: list[str] = []
    offs = [0]
    for t in texts:
        all_sh.extend(word_shingles(t or "", shingle))
        offs.append(len(all_sh))
    hashes = _hash_tokens(all_sh)
    per_doc: list[np.ndarray] = []
    take_idx: list[int] = []
    for i in range(len(texts)):
        u = np.unique(hashes[offs[i]:offs[i + 1]])
        if len(u):
            per_doc.append(u)
            take_idx.append(i)
    if not per_doc:
        return empty
    grams = np.concatenate(per_doc)
    lens = np.array([len(u) for u in per_doc], np.int64)
    ids = batch[id_col].take(pa.array(np.repeat(take_idx, lens)))
    return pa.table(
        {
            id_col: ids,
            "gram": pa.array(grams.view(np.int64), pa.int64()),
            "n": pa.array(np.repeat(lens, lens), pa.int64()),
            "gb": pa.array((grams % nb).astype(np.int32), pa.int32()),
        }
    )


def dup_gram_stats(ds, col: str, id_col: str, *, shingle: int = 3,
                   num_buckets: int = 32):
    """Cross-document duplicated n-gram audit — the exact-substring
    memorization-risk signal of Lee et al. 2021 ("Deduplicating
    Training Data Makes Language Models Better", arXiv:2107.06499) at
    word-shingle granularity: for each document, the count and e6
    fraction of its DISTINCT shingles that also occur in at least one
    OTHER document. Unlike ``doc_repetition``/``gopher_repetition``
    (within-doc) and ``ngram_jaccard_pairs`` (thresholded pairs), this
    reports corpus-wide per-doc overlap with no pair explosion.

    Scale shape: distinct gram rows -> ONE gram-hash bucket shuffle
    (all rows of a gram land in one bucket, so the per-bucket count IS
    the global document frequency — df without a join; same trick as
    the AllPairs path) emitting per-(doc, bucket) partial counts ->
    ONE doc-hash bucket shuffle folding partials per doc. No stage
    ever holds more than a bucket; nothing reaches the driver.

    Returns a Dataset of (id, n_grams, n_dup_grams, dup_frac_e6);
    documents with zero shingles (empty text) carry no gram rows and
    are absent, matching the SQL oracle's grams CTE."""
    from ._math import frac_e6

    grams = ds.map_batches(
        lambda batch: _distinct_gram_rows(batch, col, id_col, shingle,
                                          num_buckets),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def bucket_partials(group: pd.DataFrame) -> pd.DataFrame:
        df = group.groupby("gram")["gram"].transform("size")
        out = (
            group.assign(dup=(df > 1).astype(np.int64))
            .groupby(id_col, sort=False)
            .agg(n_grams=("n", "first"), n_dup=("dup", "sum"))
            .reset_index()
        )
        out["db"] = (
            pd.util.hash_array(out[id_col].to_numpy()) % num_buckets
        ).astype(np.int32)
        return out

    partials = grams.groupby("gb").map_groups(
        bucket_partials, batch_format="pandas"
    )

    def fold_doc(group: pd.DataFrame) -> pd.DataFrame:
        out = (
            group.groupby(id_col, sort=False)
            .agg(n_grams=("n_grams", "first"), n_dup_grams=("n_dup", "sum"))
            .reset_index()
        )
        out["dup_frac_e6"] = frac_e6(
            out["n_dup_grams"].to_numpy().astype(np.int64),
            out["n_grams"].to_numpy().astype(np.int64),
        )
        return out

    return partials.groupby("db").map_groups(
        fold_doc, batch_format="pandas"
    ).map_batches(
        lambda t: t.select([id_col, "n_grams", "n_dup_grams",
                            "dup_frac_e6"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def ngram_jaccard_pairs(ds, col: str, id_col: str, *, threshold: float = 0.8,
                        shingle: int = 3, num_buckets: int = 32,
                        max_bucket: int = 1000,
                        verify_driver_limit: int = 100_000,
                        as_dataset: bool = False):
    """Exact n-gram Jaccard near-dup pairs WITHOUT sketching — the
    prefix-filtered AllPairs set-similarity join (Bayardo et al., WWW'07
    "Scaling Up All Pairs Similarity Search"; public algorithm).

    Candidate generation is deterministic and has 100% recall: order
    every document's distinct shingles by global rarity (document
    frequency asc, then shingle hash); a pair with J >= t MUST share a
    shingle inside both docs' length-``n - ceil(t*n) + 1`` prefixes (the
    globally-smallest shared shingle is in both, else either prefix
    would exclude the whole intersection). Only prefix shingles — the
    RAREST per doc — enter the pair-generating groupby, so hot shingles
    never explode: a shingle shared by m docs generates pairs only if it
    is rare enough to sit in prefixes, unlike a naive shared-shingle
    self-join.

    Scale shape: three bucketed shuffles over gram rows (global df per
    gram via gram-hash buckets; per-doc prefix selection via doc-hash
    buckets, one vectorized sort + cumcount per bucket; candidate
    groupby over prefix grams), then the shared exact-Jaccard verify.
    ``max_bucket`` caps degenerate all-identical groups exactly like the
    MinHash path."""
    grams = ds.map_batches(
        lambda batch: _distinct_gram_rows(batch, col, id_col, shingle,
                                          num_buckets),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    # all rows of one gram share a gb bucket, so the per-bucket count IS
    # the global document frequency — df without a join
    def annotate_df(group: pd.DataFrame) -> pd.DataFrame:
        group = group.copy()
        group["df"] = group.groupby("gram")["gram"].transform("size")
        group["db"] = (
            pd.util.hash_array(group[id_col].to_numpy()) % num_buckets
        ).astype(np.int32)
        return group.drop(columns=["gb"])

    with_df = grams.groupby("gb").map_groups(
        annotate_df, batch_format="pandas"
    )

    # all rows of one doc share a db bucket: ONE vectorized sort +
    # cumcount per bucket selects every doc's rarest-first prefix
    def prefix(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([id_col, "df", "gram"], kind="mergesort")
        pos = g.groupby(id_col, sort=False).cumcount().to_numpy()
        n = g["n"].to_numpy()
        # required overlap ceil(t*n), nudged DOWN so float error can only
        # lengthen the prefix (never breaks recall)
        req = np.ceil(threshold * n - 1e-9)
        return g.loc[pos < (n - req + 1), [id_col, "gram"]]

    pref = with_df.groupby("db").map_groups(prefix, batch_format="pandas")

    cand = _bucket_pairs(pref, ["gram"], id_col, max_bucket,
                         as_dataset=as_dataset)
    return _verified_jaccard_pairs(
        ds, cand, col, id_col, threshold=threshold, shingle=shingle,
        verify_driver_limit=verify_driver_limit, as_dataset=as_dataset,
    )


# --------------------------------------------------------------- SimHash
def simhash64_batch(texts: list) -> np.ndarray:
    """Vectorized 64-bit SimHash for a whole batch: ONE hash_array call
    over every token of every doc, bit votes as one (tokens, 64) int8
    matrix, per-doc segment sums via np.add.reduceat, vectorized bit
    packing. Bit-identical to per-doc simhash64."""
    counts = np.empty(len(texts), dtype=np.int64)
    all_tokens: list[str] = []
    for i, t in enumerate(texts):
        toks = (t or "").split()
        counts[i] = len(toks)
        all_tokens.extend(toks)
    out = np.zeros(len(texts), dtype=np.uint64)
    if all_tokens:
        h = _hash_tokens(all_tokens)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int8
        )
        votes = 2 * bits - 1  # int8, one row per token
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        pos = counts > 0
        seg = np.add.reduceat(votes.astype(np.int32), starts[pos], axis=0)
        powers = np.uint64(1) << np.arange(64, dtype=np.uint64)
        out[pos] = ((seg > 0).astype(np.uint64) * powers[None, :]).sum(axis=1)
    return out.view(np.int64)


def simhash64(text: str) -> int:
    return int(simhash64_batch([text])[0])


def simhash_signatures(ds, col: str, id_col: str):
    def fn(batch: pa.Table) -> pa.Table:
        sigs = simhash64_batch(batch[col].to_pylist())
        return pa.table({id_col: batch[id_col], "simhash": pa.array(sigs, pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_POP8 = np.array([bin(i).count("1") for i in range(256)], np.uint8)


def _popcount64(arr: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (byte-LUT sum; numpy 1.x has no
    bitwise_count)."""
    return _POP8[arr.view(np.uint8).reshape(len(arr), 8)].sum(
        axis=1
    ).astype(np.int64)


def _hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def simhash_dup_pairs(ds, col: str, id_col: str, *, max_hamming: int = 3,
                      verify_driver_limit: int = 100_000,
                      as_dataset: bool = False):
    """Near-dup pairs by SimHash banding (4 x 16-bit) + Hamming verify.

    Verification mirrors minhash: ``as_dataset=True`` keeps the whole
    chain a Dataset (no pair row on the driver); otherwise a driver
    lookup of the (small) int64 signature map below
    ``verify_driver_limit`` candidates, the bucketed pair-join
    (`_verify_pairs_bucketed` over stringified signatures) beyond it.

    Signatures are used twice (banding, then verification lookup), so
    the narrow (id, int64) signature table is materialized once instead
    of recomputing the text hashing pass — 16 bytes/row, object-store
    resident (spills at extreme scale rather than re-hashing the corpus).
    """
    sigs = simhash_signatures(ds, col, id_col).materialize()
    return hamming_near_dup_pairs(
        sigs, sig_col="simhash", id_col=id_col, max_hamming=max_hamming,
        verify_driver_limit=verify_driver_limit, as_dataset=as_dataset,
    )


def hamming_near_dup_pairs(sigs, *, sig_col: str, id_col: str,
                           max_hamming: int = 3, max_bucket: int = 1000,
                           verify_driver_limit: int = 100_000,
                           as_dataset: bool = False):
    """Near-dup pairs among 64-bit signatures by 4 x 16-bit banding +
    exact Hamming verify — the generalized core behind SimHash text
    dedup AND stored-hash near-dup detection (e.g. an image table's
    perceptual ``phash`` column). Pigeonhole: any pair within Hamming
    distance 3 differs in <= 3 bands, so >= 1 of the 4 band keys is
    intact and the pair always surfaces as a candidate.

    ``sigs``: Dataset of (id_col, sig_col int64). Banding is fully
    vectorized (numpy shifts, no per-row loop). Verification mirrors
    minhash: ``as_dataset=True`` keeps the whole chain a Dataset; else
    a driver signature lookup below ``verify_driver_limit`` candidates
    and the bucketed pair-join beyond it.
    """

    def bands(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks()
        sig = batch[sig_col].combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        u = sig.view(np.uint64)
        n = len(u)
        shifts = (np.arange(4, dtype=np.uint64) * np.uint64(16))[:, None]
        keys = ((u[None, :] >> shifts) & np.uint64(0xFFFF)).astype(np.int32)
        return pa.table(
            {
                id_col: pa.concat_arrays([ids] * 4),
                "band": pa.array(
                    np.repeat(np.arange(4, dtype=np.int32), n), pa.int32()
                ),
                "key": pa.array(keys.reshape(-1), pa.int32()),
                sig_col: pa.array(np.tile(sig, 4), pa.int64()),
            }
        )

    banded = sigs.map_batches(bands, batch_format="pyarrow")
    empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                      "hamming": pa.array([], pa.int32())})
    if as_dataset:
        cand_ds = _bucket_pairs(
            banded, ["band", "key"], id_col, max_bucket=max_bucket,
            as_dataset=True,
        )
        verified = _verify_pairs_bucketed(
            sigs, _distinct_pairs_ds(cand_ds), sig_col, id_col,
            prepare_fn=lambda s_: int(s_ or 0),
            pair_fn=lambda a_, b_: float(_hamming64(a_, b_)),
            as_dataset=True,
        )

        def thresh(t: pa.Table) -> pa.Table:
            hit = t.filter(pc.less_equal(t["metric"], float(max_hamming)))
            return pa.table(
                {
                    "a": hit["a"],
                    "b": hit["b"],
                    "hamming": pc.cast(hit["metric"], pa.int32()),
                }
            )

        return verified.map_batches(
            thresh, batch_format="pyarrow", zero_copy_batch=True
        )
    # driver fold WITH INLINE verification: banded rows already carry
    # the signature, so each (band, key) group verifies its own
    # triangle with one vectorized xor+popcount and only SURVIVING
    # pairs materialize. A skewed band key can generate millions of
    # candidates that verify down to almost nothing (measured: 5.1M
    # cands -> 1040 pairs at 100k image phashes; routing them through
    # the separate bucketed-verify shuffle cost ~50 s) — verifying
    # in-group makes the cost proportional to the candidates TOUCHED,
    # never shuffled.
    collected: list[pa.Table] = []
    total = 0
    overflow = False
    for batch in banded.iter_batches(batch_format="pyarrow", batch_size=None):
        t = batch if isinstance(batch, pa.Table) else pa.Table.from_batches([batch])
        collected.append(t)
        total += t.num_rows
        if total > 5_000_000:
            overflow = True
            break
    if overflow:
        # banded set too big for a driver fold: scalable candidate
        # emission + bucketed pair verify (payloads never on driver)
        cand = _bucket_pairs(banded, ["band", "key"], id_col,
                             max_bucket=max_bucket)
        if cand.num_rows == 0:
            return empty
        cand = cand.group_by(["a", "b"]).aggregate([])
        verified = _verify_pairs_bucketed(
            sigs, cand, sig_col, id_col,
            prepare_fn=lambda s_: int(s_ or 0),
            pair_fn=lambda a_, b_: float(_hamming64(a_, b_)),
        )
        hit = verified.filter(
            pc.less_equal(verified["metric"], float(max_hamming))
        )
        if hit.num_rows == 0:
            return empty
        return pa.table(
            {
                "a": hit["a"],
                "b": hit["b"],
                "hamming": pc.cast(hit["metric"], pa.int32()),
            }
        ).sort_by([("a", "ascending"), ("b", "ascending")])

    if not collected:
        return empty
    big = pa.concat_tables(collected)
    band_np = big["band"].to_numpy(zero_copy_only=False)
    key_np = big["key"].to_numpy(zero_copy_only=False)
    ids_np = big[id_col].to_numpy(zero_copy_only=False)
    sig_np = (big[sig_col].to_numpy(zero_copy_only=False)
              .astype(np.int64).view(np.uint64))
    # one lexsort groups AND orders ids within each (band, key) segment
    order = np.lexsort((ids_np, key_np, band_np))
    band_s, key_s = band_np[order], key_np[order]
    ids_s, sig_s = ids_np[order], sig_np[order]
    change = np.flatnonzero(
        (band_s[1:] != band_s[:-1]) | (key_s[1:] != key_s[:-1]))
    starts = np.r_[0, change + 1]
    lens = np.minimum(np.diff(np.r_[starts, len(band_s)]), max_bucket)
    # batch all groups of equal (capped) size m: (G, m) gathers, one
    # triangle per size — no per-group Python (80k colliding groups at
    # 100k sigs made the group loop the whole cost)
    a_all, b_all, d_all = [], [], []
    for m in np.unique(lens[lens >= 2]):
        g_starts = starts[lens == m]
        mat = g_starts[:, None] + np.arange(m)[None, :]
        ids_m = ids_s[mat]
        sig_m = sig_s[mat]
        iu, ju = np.triu_indices(int(m), k=1)
        d = _popcount64((sig_m[:, iu] ^ sig_m[:, ju]).ravel())
        keep = d <= max_hamming
        if keep.any():
            a_all.append(ids_m[:, iu].ravel()[keep])
            b_all.append(ids_m[:, ju].ravel()[keep])
            d_all.append(d[keep])
    if not a_all:
        return empty
    out = pd.DataFrame({
        "a": np.concatenate(a_all),
        "b": np.concatenate(b_all),
        "hamming": np.concatenate(d_all).astype("int32"),
    }).drop_duplicates(subset=["a", "b"]).sort_values(["a", "b"])
    return pa.table({
        "a": pa.array(out["a"]),
        "b": pa.array(out["b"]),
        "hamming": pa.array(out["hamming"], pa.int32()),
    })

def _bucket_cross_pairs(banded_ds, group_cols: list[str], id_col: str,
                        max_bucket: int, driver_limit: int = 5_000_000,
                        as_dataset: bool = False):
    """(a, b) CROSS pairs per bucket for parity-encoded two-corpus
    banding (even ids = new side, odd ids = base side): every bucket
    emits new x base pairs only — never new x new or base x base.
    Each side is capped at ``max_bucket``. Shapes: see
    ``_pair_shapes``."""

    def emit(ids) -> tuple[np.ndarray, np.ndarray]:
        ids = np.unique(np.asarray(ids, np.int64))
        new = ids[ids % 2 == 0][:max_bucket]
        base = ids[ids % 2 == 1][:max_bucket]
        if len(new) == 0 or len(base) == 0:
            z = np.empty(0, np.int64)
            return z, z
        return np.repeat(new, len(base)), np.tile(base, len(new))

    return _pair_shapes(banded_ds, group_cols, id_col, emit,
                        driver_limit=driver_limit, as_dataset=as_dataset)


def cross_corpus_near_duplicates(new_ds, base_ds, *, col: str = "text",
                                 id_col: str = "doc_id",
                                 threshold: float = 0.8,
                                 num_perm: int = 64, bands: int = 16,
                                 shingle: int = 3, seed: int = 1234,
                                 max_bucket: int = 1000,
                                 verify_driver_limit: int = 100_000,
                                 as_dataset: bool = False):
    """Incremental FUZZY dedup: (new_id, base_id, jaccard >= threshold)
    pairs between a new crawl and the existing corpus — the near-dup
    analogue of ``cross_corpus_duplicates``. Both sides sign with the
    SAME MinHash permutations (same seed), so an unchanged document
    lands in the same LSH buckets it did when the base corpus was
    built; buckets emit CROSS pairs only (never within-side), and the
    exact n-gram Jaccard verify runs over the union corpus through the
    standard bucketed machinery.

    Scale shape: one banding pass per side (per-batch, zero shuffle),
    one bucket groupby over band rows, candidate-sized verify shuffles.
    Integer ids required (the side rides in the id's parity bit:
    ``id * 2 + side``)."""
    import pyarrow.compute as pc

    rows_per_band = num_perm // bands

    def enc_fn(side: int):
        def enc(t: pa.Table) -> pa.Table:
            ids = pc.add(pc.multiply(pc.cast(t[id_col], pa.int64()), 2), side)
            return pa.table({id_col: ids, col: t[col]})

        return enc

    corpus = new_ds.map_batches(
        enc_fn(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(base_ds.map_batches(
        enc_fn(1), batch_format="pyarrow", zero_copy_batch=True
    ))
    banded = corpus.map_batches(
        MinHasher(col, id_col, num_perm, shingle, seed),
        batch_format="pyarrow", zero_copy_batch=True,
    ).map_batches(
        lambda b: _band_rows(b, id_col, bands, rows_per_band),
        batch_format="pyarrow",
    )
    cand = _bucket_cross_pairs(
        banded, ["band", "band_hash"], id_col, max_bucket,
        as_dataset=as_dataset,
    )
    verified = _verified_jaccard_pairs(
        corpus, cand, col, id_col, threshold=threshold, shingle=shingle,
        verify_driver_limit=verify_driver_limit, as_dataset=as_dataset,
    )

    def decode(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "new_id": pc.divide(t["a"], 2),
                "base_id": pc.divide(pc.subtract(t["b"], 1), 2),
                "jaccard": t["jaccard"],
            }
        )

    if as_dataset:
        return verified.map_batches(
            decode, batch_format="pyarrow", zero_copy_batch=True
        )
    return decode(verified)


def cross_corpus_duplicates(new_ds, base_ds, *, col: str = "text",
                            id_col: str = "doc_id",
                            strategy: str = "broadcast",
                            num_buckets: int = 64):
    """Incremental dedup: rows of ``new_ds`` whose content md5 already
    exists in ``base_ds`` — the "dedup the new crawl against the
    existing corpus" direction. Output: (id, fingerprint).

    * ``broadcast`` (default): the base side is reduced to its DISTINCT
      md5 fingerprints (per-batch ``pc.unique`` partials, one Arrow
      concat+unique fold — never Python objects; 16 bytes/doc means a
      10^9-doc corpus is ~16 GB, still broadcastable) and ``ray.put``
      once; the new corpus streams through one vectorized ``is_in``.
    * ``shuffle``: for base corpora too big to broadcast — both sides'
      fingerprints hash-bucket, and each bucket runs one vectorized
      semi-join (``is_in`` against the bucket's distinct base set).
      One all-to-all over (id, fingerprint) narrow rows only.
    """
    import pyarrow.compute as pc
    import ray

    new_fp = content_fingerprint(new_ds, col, id_col)

    def batch_unique(t: pa.Table) -> pa.Table:
        fp = t["fingerprint"].combine_chunks().drop_null()
        return pa.table({"fingerprint": pc.unique(fp)})

    base_fp = content_fingerprint(base_ds, col, id_col).map_batches(
        batch_unique, batch_format="pyarrow", zero_copy_batch=True
    )

    if strategy == "broadcast":
        from ._fold import fold_table

        folded = fold_table(base_fp)
        fps_all = (
            pc.unique(folded["fingerprint"].combine_chunks())
            if folded is not None
            else pa.array([], pa.string())
        )
        fp_ref = ray.put(fps_all)

        def flag(t: pa.Table) -> pa.Table:
            fps = t["fingerprint"].combine_chunks()
            hit = pc.fill_null(pc.is_in(fps, value_set=ray.get(fp_ref)), False)
            return t.filter(hit)

        return new_fp.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)

    if strategy == "shuffle":
        def fp_bucket(fp: pa.Array) -> pa.Array:
            h = pd.util.hash_array(fp.to_numpy(zero_copy_only=False))
            return pa.array((h % num_buckets).astype(np.int32), pa.int32())

        # the two sides union, so base rows need a typed null id column
        schema = new_fp.schema()
        base_schema = getattr(schema, "base_schema", schema)
        id_type = base_schema.field(id_col).type

        def tag_new(t: pa.Table) -> pa.Table:
            fp = t["fingerprint"].combine_chunks()
            keep = pc.is_valid(fp)
            t = pa.table({id_col: t[id_col], "fingerprint": fp}).filter(keep)
            fp = t["fingerprint"].combine_chunks()
            return pa.table(
                {
                    "bucket": fp_bucket(fp),
                    id_col: t[id_col],
                    "fingerprint": fp,
                    "side": pa.array(
                        np.ones(t.num_rows, np.int8), pa.int8()
                    ),
                }
            )

        def tag_base(t: pa.Table) -> pa.Table:
            fp = t["fingerprint"].combine_chunks()
            return pa.table(
                {
                    "bucket": fp_bucket(fp),
                    id_col: pa.array([None] * len(fp), id_type),
                    "fingerprint": fp,
                    "side": pa.array(np.zeros(len(fp), np.int8), pa.int8()),
                }
            )

        tagged_new = new_fp.map_batches(
            tag_new, batch_format="pyarrow", zero_copy_batch=True
        )
        tagged_base = base_fp.map_batches(
            tag_base, batch_format="pyarrow", zero_copy_batch=True
        )

        def semi(group: pa.Table) -> pa.Table:
            is_new = pc.equal(group["side"], 1)
            new_rows = group.filter(is_new)
            if new_rows.num_rows == 0:
                return pa.table(
                    {
                        id_col: pa.array([], group.schema.field(id_col).type),
                        "fingerprint": pa.array([], pa.string()),
                    }
                )
            base_keys = pc.unique(
                group.filter(pc.invert(is_new))["fingerprint"].combine_chunks()
            )
            hit = pc.fill_null(
                pc.is_in(
                    new_rows["fingerprint"].combine_chunks(), value_set=base_keys
                ),
                False,
            )
            out = new_rows.filter(hit)
            return pa.table(
                {id_col: out[id_col], "fingerprint": out["fingerprint"]}
            )

        return (
            tagged_new.union(tagged_base)
            .groupby("bucket")
            .map_groups(semi, batch_format="pyarrow")
        )

    raise ValueError(f"unknown strategy {strategy!r}")


# ------------------------------------------------------ exact substrings
def _positioned_gram_rows(batch: pa.Table, col: str, id_col: str,
                          k: int, num_buckets: int) -> pa.Table:
    """Positional word-shingle hash rows ``(id, pos, gram, gb)`` — one
    row per k-gram START position (0-based token index). Documents with
    fewer than ``k`` tokens emit nothing (they cannot hold a k-token
    span), unlike ``_distinct_gram_rows``'s whole-doc fallback."""
    nb = np.uint64(num_buckets)
    empty = pa.table({
        id_col: pa.array([], batch.schema.field(id_col).type),
        "pos": pa.array([], pa.int64()),
        "gram": pa.array([], pa.int64()),
        "gb": pa.array([], pa.int32()),
    })
    if not len(batch):
        return empty
    # fully vectorized: split once with Arrow, hash each WORD once,
    # then a k-term polynomial rolling combine over the word-hash
    # array — no per-position Python, no joined gram strings (a gram
    # hash collides iff the k-word sequence matches, exactly like
    # hashing the joined string; positions make this the data-heavy
    # emitter, ~len(corpus) rows per pass)
    texts = pc.fill_null(batch[col].combine_chunks(), "")
    lists = pc.utf8_split_whitespace(texts)
    flat = pc.list_flatten(lists)
    par = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    wcounts = (np.bincount(par[keep], minlength=len(texts))
               if len(par) else np.zeros(len(texts), np.int64))
    m_doc = np.maximum(wcounts - k + 1, 0).astype(np.int64)
    total = int(m_doc.sum())
    if total == 0:
        return empty
    wh = pd.util.hash_array(
        flat.filter(pa.array(keep)).to_numpy(zero_copy_only=False)
    ).astype(np.uint64)
    offs = np.concatenate([[0], np.cumsum(wcounts)])[:-1]
    # global word index of every gram START
    doc_of = np.repeat(np.arange(len(texts)), m_doc)
    pos = (np.arange(total, dtype=np.int64)
           - np.repeat(np.cumsum(m_doc) - m_doc, m_doc))
    start = offs[doc_of] + pos
    # FNV prime powers mod 2^64, precomputed as Python ints (a numpy
    # scalar *= would emit an overflow RuntimeWarning per batch; the
    # wraparound itself is the intended ring arithmetic)
    _B = 1099511628211
    powers = np.array([pow(_B, j, 1 << 64) for j in range(k)], np.uint64)
    h = np.zeros(total, np.uint64)
    for j in range(k):
        h += wh[start + j] * powers[j]
    ids = batch[id_col].take(pa.array(doc_of))
    return pa.table({
        id_col: ids,
        "pos": pa.array(pos, pa.int64()),
        "gram": pa.array(h.view(np.int64), pa.int64()),
        "gb": pa.array((h % nb).astype(np.int32), pa.int32()),
    })


def _positioned_char_gram_rows(batch: pa.Table, col: str, id_col: str,
                               k: int, num_buckets: int) -> pa.Table:
    """Positional CHARACTER-shingle hash rows ``(id, pos, gram, gb)`` —
    one row per k-codepoint window start (0-based codepoint index), the
    ExactSubstr emitter for unsegmented scripts (zh/ja/th), where
    ``utf8_split_whitespace`` would degrade to whole-line granularity
    (VERDICT r4 missing #2; Lee et al. 2021 operate at token/byte
    level). Same fully-vectorized plan as the word emitter: one batch
    join -> one utf-32 decode -> bijective odd-constant codepoint mix
    -> k-term polynomial rolling combine. Documents shorter than ``k``
    codepoints emit nothing."""
    nb = np.uint64(num_buckets)
    empty = pa.table({
        id_col: pa.array([], batch.schema.field(id_col).type),
        "pos": pa.array([], pa.int64()),
        "gram": pa.array([], pa.int64()),
        "gb": pa.array([], pa.int32()),
    })
    if not len(batch):
        return empty
    texts = pc.fill_null(batch[col].combine_chunks(), "")
    lens = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(
        np.int64)
    m_doc = np.maximum(lens - k + 1, 0).astype(np.int64)
    total = int(m_doc.sum())
    if total == 0:
        return empty
    joined = "".join(texts.to_pylist())
    cps = np.frombuffer(joined.encode("utf-32-le"), np.uint32).astype(
        np.uint64)
    # odd-constant multiply is a bijection mod 2^64: distinct codepoints
    # stay distinct, and the high bits spread for the polynomial combine
    ch = (cps + np.uint64(1)) * np.uint64(0x9E3779B97F4A7C15)
    offs = np.concatenate([[0], np.cumsum(lens)])[:-1]
    doc_of = np.repeat(np.arange(len(texts)), m_doc)
    pos = (np.arange(total, dtype=np.int64)
           - np.repeat(np.cumsum(m_doc) - m_doc, m_doc))
    start = offs[doc_of] + pos
    _B = 1099511628211
    powers = np.array([pow(_B, j, 1 << 64) for j in range(k)], np.uint64)
    h = np.zeros(total, np.uint64)
    for j in range(k):
        h += ch[start + j] * powers[j]
    ids = batch[id_col].take(pa.array(doc_of))
    return pa.table({
        id_col: ids,
        "pos": pa.array(pos, pa.int64()),
        "gram": pa.array(h.view(np.int64), pa.int64()),
        "gb": pa.array((h % nb).astype(np.int32), pa.int32()),
    })


def _gram_emitter(granularity: str):
    if granularity == "word":
        return _positioned_gram_rows
    if granularity == "char":
        return _positioned_char_gram_rows
    raise ValueError(f"unknown granularity {granularity!r}")


def _dup_positions(ds, col: str, id_col: str, k: int, num_buckets: int,
                   granularity: str = "word"):
    """Dataset of ``(id, pos, db)`` — every k-gram start position whose
    shingle occurs at >= 2 positions corpus-wide (cross- OR intra-doc:
    the ExactSubstr duplication criterion, unlike ``dup_gram_stats``'s
    other-doc-only df). One gram-hash bucket shuffle; a gram's rows all
    land in one bucket, so the in-bucket occurrence count IS global."""
    emit = _gram_emitter(granularity)
    grams = ds.map_batches(
        lambda batch: emit(batch, col, id_col, k, num_buckets),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def bucket_dups(group: pd.DataFrame) -> pa.Table:
        # explicitly-typed Arrow output: buckets with zero duplicated
        # grams emit an empty block that must still carry the schema
        cnt = group.groupby("gram")["gram"].transform("size")
        out = group.loc[cnt > 1, [id_col, "pos"]]
        db = (pd.util.hash_array(out[id_col].to_numpy()) % num_buckets)
        id_type = pa.Array.from_pandas(group[id_col].iloc[:1]).type
        return pa.table({
            id_col: pa.Array.from_pandas(out[id_col], type=id_type),
            "pos": pa.array(out["pos"].to_numpy(np.int64), pa.int64()),
            "db": pa.array(db.astype(np.int32), pa.int32()),
        })

    return grams.groupby("gb").map_groups(bucket_dups, batch_format="pandas")


from ._math import merge_constant_windows as _merge_spans  # shared kernel


def exact_substr_spans(ds, col: str, id_col: str, *, k: int = 5,
                       num_buckets: int = 32, granularity: str = "word"):
    """Maximal duplicated-substring spans per document — the span
    EXTRACTION half of ExactSubstr dedup (Lee et al. 2021,
    arXiv:2107.06499 §4.1) at word granularity: any duplicated token
    run of length >= ``k`` contains a duplicated k-shingle at every
    start offset it spans, so marking duplicated k-gram starts and
    merging overlapping/adjacent windows recovers exactly the maximal
    duplicated regions. Returns (id, span_start, span_end, span_toks)
    with token-index bounds, end exclusive.

    Scale shape: positioned gram rows -> one gram-hash bucket shuffle
    (global occurrence counts without a join) -> one doc-hash bucket
    shuffle -> per-doc vectorized interval merge. No pair explosion,
    nothing on the driver.

    ``granularity="char"`` shingles CODEPOINT windows instead of
    whitespace tokens (pick a larger ``k``, e.g. 20-50) — the mode for
    unsegmented scripts; span bounds and span_toks are then codepoint
    units."""
    dup = _dup_positions(ds, col, id_col, k, num_buckets,
                         granularity=granularity)

    def fold_spans(group: pd.DataFrame) -> pa.Table:
        # explicitly-typed Arrow output: zero-span buckets must still
        # carry the schema (empty pandas blocks are schema-less through
        # Ray's bundle path)
        outs = []
        for doc, sub in group.groupby(id_col, sort=False):
            p = np.sort(sub["pos"].to_numpy(np.int64))
            s, e = _merge_spans(p, k)
            outs.append(pd.DataFrame({
                id_col: doc, "span_start": s, "span_end": e,
            }))
        if not outs:
            out = pd.DataFrame({id_col: pd.Series(dtype=group[id_col].dtype),
                                "span_start": pd.Series(dtype="int64"),
                                "span_end": pd.Series(dtype="int64")})
        else:
            out = pd.concat(outs, ignore_index=True)
        start = out["span_start"].to_numpy(np.int64)
        end = out["span_end"].to_numpy(np.int64)
        # pin the id type from the (always non-empty) input group so an
        # empty output block still carries it
        id_type = pa.Array.from_pandas(group[id_col].iloc[:1]).type
        return pa.table({
            id_col: pa.Array.from_pandas(out[id_col], type=id_type),
            "span_start": pa.array(start, pa.int64()),
            "span_end": pa.array(end, pa.int64()),
            "span_toks": pa.array(end - start, pa.int64()),
        })

    return dup.groupby("db").map_groups(fold_spans, batch_format="pandas")


def exact_substr_clean(ds, col: str, id_col: str, *, k: int = 5,
                       num_buckets: int = 32, emit_all: bool = False,
                       carry_cols: tuple = (), granularity: str = "word"):
    """The REMOVAL half of ExactSubstr dedup: for every document that
    contains at least one duplicated span, drop all covered tokens and
    rebuild the text (single-space joined, '' when fully covered).
    Returns (id, clean_text, n_removed_toks, *carry_cols); by default
    span-free documents are untouched and absent (bounded output —
    union them back unchanged downstream), while ``emit_all=True``
    passes them through with their original text and n_removed_toks=0
    (the corpus-rewrite mode ``prepare_corpus`` uses).

    The document text rides the same doc-hash bucket shuffle as the
    duplicated positions (a union with pos = -1 sentinel rows), so no
    broadcast of an unbounded span set and no second join.

    ``granularity="char"`` removes covered CODEPOINTS (rebuilt with no
    separator) — the unsegmented-script mode; n_removed_toks then
    counts codepoints."""
    dup = _dup_positions(ds, col, id_col, k, num_buckets,
                         granularity=granularity)

    def tag_pos(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: t[id_col], "pos": t["pos"],
            col: pa.nulls(len(t), pa.string()),
            **{c: pa.nulls(len(t), pa.string()) for c in carry_cols},
            "db": t["db"],
        })

    def tag_text(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks()
        db = pd.util.hash_array(ids.to_numpy(zero_copy_only=False)) % num_buckets
        return pa.table({
            id_col: t[id_col],
            "pos": pa.array(np.full(len(t), -1, np.int64)),
            col: t[col],
            **{c: t[c] for c in carry_cols},
            "db": pa.array(db.astype(np.int32)),
        })

    both = dup.map_batches(
        tag_pos, batch_format="pyarrow", zero_copy_batch=True,
    ).union(ds.map_batches(
        tag_text, batch_format="pyarrow", zero_copy_batch=True,
    ))

    def rebuild(group: pd.DataFrame) -> pd.DataFrame:
        ids_out, texts_out, removed = [], [], []
        carry_out: dict = {c: [] for c in carry_cols}
        has_dup = set(group.loc[group["pos"] >= 0, id_col])
        for doc, sub in group.groupby(id_col, sort=False):
            text_rows = sub.loc[sub["pos"] < 0]
            if not len(text_rows):
                continue  # dup rows for a doc filtered out upstream
            if doc not in has_dup:
                if not emit_all:
                    continue
                ids_out.append(doc)
                texts_out.append(text_rows[col].iloc[0])
                removed.append(0)
                for c in carry_cols:
                    carry_out[c].append(text_rows[c].iloc[0])
                continue
            raw = text_rows[col].iloc[0] or ""
            units = raw.split() if granularity == "word" else list(raw)
            covered = np.zeros(len(units), bool)
            p = np.sort(sub.loc[sub["pos"] >= 0, "pos"].to_numpy(np.int64))
            s, e = _merge_spans(p, k)
            for a, b in zip(s, e):
                covered[a:b] = True
            sep = " " if granularity == "word" else ""
            kept = [w for w, c in zip(units, covered) if not c]
            ids_out.append(doc)
            texts_out.append(sep.join(kept))
            removed.append(int(covered.sum()))
            for c in carry_cols:
                carry_out[c].append(text_rows[c].iloc[0])
        # explicitly-typed Arrow output (same empty-block lesson as
        # fold_spans): buckets with no surviving docs keep the schema
        id_type = pa.Array.from_pandas(group[id_col].iloc[:1]).type
        return pa.table({
            id_col: pa.Array.from_pandas(
                pd.Series(ids_out, dtype=group[id_col].dtype),
                type=id_type),
            "clean_text": pa.array(texts_out, pa.string()),
            "n_removed_toks": pa.array(
                np.asarray(removed, np.int64), pa.int64()),
            **{c: pa.array(carry_out[c], pa.string())
               for c in carry_cols},
        })

    return both.groupby("db").map_groups(rebuild, batch_format="pandas")


def normalized_text_dups(ds, *, col: str = "text", id_col: str = "doc_id",
                         num_buckets: int = 32):
    """(id, keeper, group_size) for every document whose NORMALIZED
    text (lowercase, non-alphanumerics stripped, whitespace collapsed)
    collides with another's — casing/punctuation-invariant exact dedup,
    the cheap screen between byte-equality and MinHash. keeper = the
    group's minimum id (the survivor exact-dedup would pick). The RE2
    normalize chain is identical on both oracle sides.

    Scale shape: one vectorized normalize pass that collapses the text
    to its 128-bit md5 BEFORE the shuffle — only (id, 32-char digest)
    rides the wire, not the corpus — then ONE digest-hash bucket
    shuffle, per-bucket transform('size') + min. md5 both routes AND
    decides: DuckDB's md5 is the identical function, so the oracle is
    exact by construction (collision odds at 128 bits are nil)."""
    from ._digest import md5_hex

    def norm(batch: pa.Table) -> pa.Table:
        t = pc.utf8_lower(pc.fill_null(batch[col].combine_chunks(), ""))
        t = pc.replace_substring_regex(t, "[^a-z0-9 ]", "")
        t = pc.replace_substring_regex(t, " +", " ")
        t = pc.utf8_trim(t, " ")
        h = md5_hex(t)
        nb = (pd.util.hash_array(h) % num_buckets).astype(np.int32)
        return pa.table({
            id_col: batch[id_col],
            "norm": pa.array(h, pa.string()),
            "nb": pa.array(nb, pa.int32()),
        })

    def dups(group: pd.DataFrame) -> pa.Table:
        # return an explicitly-typed Arrow table: groups with zero dups
        # emit an EMPTY block, and an empty pandas block is schema-less
        # through Ray's bundle path ("new schema: ." warnings; ArrowInvalid
        # on some lineages). Building from the always-non-empty group and
        # filtering in Arrow keeps the schema pinned even at zero rows.
        g = group.groupby("norm")
        size = g["norm"].transform("size").to_numpy()
        keeper = g[id_col].transform("min")
        t = pa.table({
            id_col: pa.Array.from_pandas(group[id_col]),
            "keeper": pa.Array.from_pandas(keeper),
            "group_size": pa.array(size.astype(np.int64), pa.int64()),
        })
        return t.filter(pa.array(size > 1))

    return (
        ds.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("nb")
        .map_groups(dups, batch_format="pandas")
    )


def dedup_lang_shift(ds, *, key: str = "text", id_col: str = "doc_id",
                     group_col: str = "lang"):
    """Dedup survivorship-bias audit: per stratum (language, source),
    the row count and e6 share BEFORE exact dedup vs AFTER
    keep-first dedup, plus the signed share shift — the check that
    deduplication didn't silently reweight the corpus mixture (a
    heavily-templated language loses disproportionately many rows; a
    mixture tuned on pre-dedup shares is then wrong).

    The survivor of a key group is the minimum id; its stratum must
    ride the min aggregation, so the per-batch partial packs
    ``(zero-padded id | stratum)`` into one string whose lexicographic
    min IS the numeric id min — an exact argmin through a plain string
    ``min`` aggregate, no join back to the corpus. Null key / stratum
    rows are excluded on both sides. Combiner-first everywhere: batch
    partials collapse before the one key-hash groupby; the final table
    is |strata| rows."""
    from ray.data.aggregate import Sum

    def before_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[key]),
                             pc.is_valid(t[group_col])))
        g = pa.table({
            group_col: t[group_col],
            "n_before": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
        }).group_by(group_col).aggregate([("n_before", "sum")])
        return g.rename_columns([group_col, "n_before"])

    before = (
        ds.map_batches(before_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(group_col).sum("n_before")
    )

    def pack_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[key]),
                             pc.is_valid(t[group_col])))
        if t.num_rows == 0:
            return pa.schema(
                [(key, pa.string()), ("packed", pa.string())]
            ).empty_table()
        ids = pc.cast(t[id_col], pa.string())
        padded = pc.utf8_lpad(ids, 20, "0")
        packed = pc.binary_join_element_wise(
            padded, pc.cast(t[group_col], pa.string()), "|")
        g = pa.table({key: t[key], "packed": packed}).group_by(
            key).aggregate([("packed", "min")])
        return g.rename_columns([key, "packed"])

    survivors = (
        ds.map_batches(pack_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(key).min("packed")
    )

    def after_partial(t: pa.Table) -> pa.Table:
        packed = t["min(packed)"].combine_chunks()
        lang = pc.utf8_slice_codeunits(packed, 21, 2_147_483_647)
        g = pa.table({
            group_col: lang,
            "n_after": pa.array(np.ones(len(lang), np.int64), pa.int64()),
        }).group_by(group_col).aggregate([("n_after", "sum")])
        return g.rename_columns([group_col, "n_after"])

    after = (
        survivors.map_batches(after_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
        .groupby(group_col).sum("n_after")
    )

    from ._fold import fold_table

    bt = fold_table(before)
    at = fold_table(after)
    per: dict[str, list[int]] = {}
    if bt is not None:
        for lang, n in zip(bt[group_col].to_pylist(),
                           bt["sum(n_before)"].to_pylist()):
            per.setdefault(lang, [0, 0])[0] = int(n)
    if at is not None:
        for lang, n in zip(at[group_col].to_pylist(),
                           at["sum(n_after)"].to_pylist()):
            per.setdefault(lang, [0, 0])[1] = int(n)
    langs = sorted(per)
    tot_b = sum(v[0] for v in per.values())
    tot_a = sum(v[1] for v in per.values())

    def share(n, d):
        return (2_000_000 * n + d) // (2 * d) if d else 0

    rows = {
        group_col: langs,
        "n_before": [per[g][0] for g in langs],
        "n_after": [per[g][1] for g in langs],
        "share_before_e6": [share(per[g][0], tot_b) for g in langs],
        "share_after_e6": [share(per[g][1], tot_a) for g in langs],
    }
    rows["shift_e6"] = [a - b for a, b in zip(rows["share_after_e6"],
                                              rows["share_before_e6"])]
    return pa.table({
        group_col: pa.array(rows[group_col], pa.string()),
        "n_before": pa.array(rows["n_before"], pa.int64()),
        "n_after": pa.array(rows["n_after"], pa.int64()),
        "share_before_e6": pa.array(rows["share_before_e6"], pa.int64()),
        "share_after_e6": pa.array(rows["share_after_e6"], pa.int64()),
        "shift_e6": pa.array(rows["shift_e6"], pa.int64()),
    })


def _edit_distance_capped(a: str, b: str, cap: int = 1) -> int:
    """Exact Levenshtein distance if <= ``cap``, else ``cap + 1`` —
    banded DP, O(len(a) * (2*cap + 1)) instead of the full matrix."""
    la, lb = len(a), len(b)
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if lb - la > cap:
        return cap + 1
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        lo = max(1, i - cap)
        hi = min(lb, i + cap)
        cur = [cap + 1] * (lb + 1)
        if lo == 1:
            cur[0] = i
        ca = a[i - 1]
        for j in range(lo, hi + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (ca != b[j - 1]),
            )
        if min(cur[lo:hi + 1]) > cap:
            return cap + 1
        prev = cur
    return prev[lb] if prev[lb] <= cap else cap + 1


def _deletion_variant_rows(col: str, id_col: str, max_len: int,
                           k: int = 1):
    """Per-batch FastSS blocking rows: each string emits itself plus
    every variant reachable by deleting up to ``k`` characters, as
    ``(variant, id)`` — two strings within Levenshtein distance d <= k
    provably share a variant (an optimal alignment has >= len-d matched
    positions; deleting each side's unmatched positions — at most d per
    side — yields the SAME common subsequence, so both k-deletion
    neighborhoods contain it; the k=1 cases: identical -> the string
    itself, substitution at i -> both i-deletions, insert/delete -> the
    longer one's deletion IS the shorter). Vectorized over POSITIONS
    (k=1: <= max_len slice/join passes per batch; k=2: additionally
    C(max_len, 2) position-pair passes — emission is O(len^k) rows per
    string, which is why k=2 enforces a tighter length cap at the
    caller), never over rows. Strings longer than ``max_len`` are
    dropped."""

    def fn(t: pa.Table) -> pa.Table:
        s = t[col].combine_chunks()
        n = pc.utf8_length(s)
        keep = pc.and_(pc.is_valid(s), pc.less_equal(n, max_len))
        t2 = t.filter(keep)
        if t2.num_rows == 0:
            return pa.schema([("variant", pa.string()),
                              (id_col, t.schema.field(id_col).type)]
                             ).empty_table()
        s = t2[col].combine_chunks()
        ids = t2[id_col].combine_chunks()
        n = pc.utf8_length(s).to_numpy(zero_copy_only=False)
        var_chunks = [s]
        id_chunks = [ids]
        big = 2_147_483_647
        maxn = int(n.max()) if len(n) else 0
        for i in range(maxn):
            mask = pa.array(n > i)
            sub = s.filter(mask)
            sub_ids = ids.filter(mask)
            pref = pc.utf8_slice_codeunits(sub, 0, i)
            suf = pc.utf8_slice_codeunits(sub, i + 1, big)
            var_chunks.append(pc.binary_join_element_wise(pref, suf, ""))
            id_chunks.append(sub_ids)
        if k >= 2:
            for i in range(maxn):
                for j in range(i + 1, maxn):
                    mask = pa.array(n > j)
                    sub = s.filter(mask)
                    if len(sub) == 0:
                        continue
                    sub_ids = ids.filter(mask)
                    a = pc.utf8_slice_codeunits(sub, 0, i)
                    b = pc.utf8_slice_codeunits(sub, i + 1, j)
                    c = pc.utf8_slice_codeunits(sub, j + 1, big)
                    var_chunks.append(
                        pc.binary_join_element_wise(a, b, c, ""))
                    id_chunks.append(sub_ids)
        out = pa.table({
            "variant": pa.concat_arrays(
                [c.cast(pa.string()) for c in var_chunks]),
            id_col: pa.concat_arrays(id_chunks),
        })
        # a string with repeated characters emits the same deletion
        # variant more than once (deleting either '1' of "11") — its id
        # would then appear twice in that variant's bucket and pair
        # with itself. A row is atomic to one batch, so the in-batch
        # distinct IS the global distinct.
        return out.group_by(["variant", id_col]).aggregate([])

    return fn


def edit_distance_pairs(ds, col: str, id_col: str, *, max_dist: int = 1,
                        max_len: int = 64, max_bucket: int = 1000,
                        verify_driver_limit: int = 100_000,
                        as_dataset: bool = False):
    """Fuzzy string matching: id pairs whose ``col`` values are within
    Levenshtein distance ``max_dist`` (currently 1 — the FastSS
    deletion-variant blocking below is complete only for one edit;
    higher distances would need k-deletion variants). The near-identical
    title/name/URL matcher exact dedup can't see and MinHash shingles
    are too coarse for.

    Scale shape: blocking emits O(len) ``(variant, id)`` rows per
    string (strings above ``max_len`` chars are excluded — emission and
    the DuckDB-oracled semantics are both length-bounded); one
    variant-keyed groupby yields candidate buckets (capped at
    ``max_bucket`` like every banding stage); candidates dedup to
    distinct pairs; the exact banded-DP distance runs inside
    ``_verify_pairs_bucketed`` so payloads ride two candidate-sized
    bucket shuffles, never the driver. Reference parity: validate-style
    cross-field checks (stages/crossfield.py) flag rows; this flags
    near-duplicate row PAIRS, completing the dedup family
    (/root/reference/src/schisma.mjs has no distributed analogue)."""
    if max_dist not in (1, 2):
        raise ValueError("edit_distance_pairs: k-deletion blocking is "
                         "implemented for max_dist in (1, 2)")
    if max_dist == 2 and max_len > 40:
        # O(len^2) variant emission per string: keep the cap tight
        max_len = 40
    narrow = ds.map_batches(
        lambda t: t.select([id_col, col]),
        batch_format="pyarrow", zero_copy_batch=True)
    variants = narrow.map_batches(
        _deletion_variant_rows(col, id_col, max_len, k=max_dist),
        batch_format="pyarrow", zero_copy_batch=True)
    cand = _bucket_pairs(variants, ["variant"], id_col, max_bucket,
                         as_dataset=as_dataset)

    def dist(a: str, b: str) -> float:
        return float(_edit_distance_capped(a, b, max_dist))

    if as_dataset:
        distinct = _distinct_pairs_ds(cand)
        verified = _verify_pairs_bucketed(
            ds, distinct, col, id_col, verify_fn=dist, as_dataset=True)

        def thresh(t: pa.Table) -> pa.Table:
            hit = t.filter(pc.less_equal(t["metric"], float(max_dist)))
            return pa.table({
                "a": hit["a"],
                "b": hit["b"],
                "dist": pc.cast(hit["metric"], pa.int64()),
            })

        return verified.map_batches(thresh, batch_format="pyarrow",
                                    zero_copy_batch=True)

    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "dist": pa.array([], pa.int64())})
    if cand.num_rows == 0:
        return empty
    cand = cand.group_by(["a", "b"]).aggregate([])
    verified = _verify_pairs_bucketed(ds, cand, col, id_col,
                                      verify_fn=dist)
    hit = verified.filter(
        pc.less_equal(verified["metric"], float(max_dist)))
    return pa.table({
        "a": hit["a"],
        "b": hit["b"],
        "dist": pc.cast(hit["metric"], pa.int64()),
    })


_LINK_SEP = "\x1f"


def record_linkage_scores(ds, *, id_col: str, name_col: str,
                          exact_cols: list, value_col: str,
                          value_tol: int, max_len: int = 64,
                          max_bucket: int = 1000,
                          as_dataset: bool = False):
    """Entity resolution (Fellegi–Sunter-style deterministic scoring):
    candidate record pairs from the FastSS name blocking
    (``edit_distance_pairs`` machinery), each scored by an integer
    agreement vector — exact name (+2) / distance-1 name (+1), one
    point per agreeing ``exact_cols`` field, one point when the two
    ``value_col`` integers sit within ``value_tol`` — so near-duplicate
    CUSTOMERS (not just near-duplicate strings) rank to the top. The
    multi-field payload rides the candidate-sized bucket shuffles as
    one ``\\x1f``-joined string (fields must not contain the
    separator); nothing record-shaped touches the driver.

    Returns (a, b, name_dist, n_exact_agree, value_close, score)."""
    import pyarrow.compute as pc

    def pack(t: pa.Table) -> pa.Table:
        cents = pc.cast(t[value_col], pa.int64())
        cols = [pc.fill_null(pc.cast(t[c], pa.string()), "")
                for c in exact_cols]
        payload = pc.binary_join_element_wise(
            pc.fill_null(t[name_col], ""),
            *cols,
            pc.cast(pc.fill_null(cents, 0), pa.string()),
            _LINK_SEP,
        )
        return pa.table({id_col: t[id_col], "__payload": payload})

    packed = ds.map_batches(pack, batch_format="pyarrow",
                            zero_copy_batch=True)

    narrow = ds.map_batches(
        lambda t: t.select([id_col, name_col]),
        batch_format="pyarrow", zero_copy_batch=True)
    variants = narrow.map_batches(
        _deletion_variant_rows(name_col, id_col, max_len),
        batch_format="pyarrow", zero_copy_batch=True)
    cand = _bucket_pairs(variants, ["variant"], id_col, max_bucket,
                         as_dataset=as_dataset)
    empty = pa.table({
        "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
        "name_dist": pa.array([], pa.int64()),
        "n_exact_agree": pa.array([], pa.int64()),
        "value_close": pa.array([], pa.int64()),
        "score": pa.array([], pa.int64()),
    })
    if not as_dataset:
        if cand.num_rows == 0:
            return empty
        cand = cand.group_by(["a", "b"]).aggregate([])

    n_fields = len(exact_cols)

    def score(pa_, pb_) -> float:
        fa = pa_.split(_LINK_SEP)
        fb = pb_.split(_LINK_SEP)
        d = _edit_distance_capped(fa[0], fb[0], 1)
        if d > 1:
            return -1.0  # variant collision at distance >= 2: not a link
        s = 2 - d
        agree = sum(1 for x, y in zip(fa[1:1 + n_fields],
                                      fb[1:1 + n_fields]) if x == y)
        close = int(abs(int(fa[-1]) - int(fb[-1])) <= value_tol)
        # pack the vector into one float: dist, agree, close recoverable
        return float(((2 - d) * 100 + agree * 10 + close) * 1000
                     + (s + agree + close))

    if as_dataset:
        # corpus-sized path: pair rows never touch the driver — distinct
        # candidates, bucketed verify and the unpack all stay Datasets
        distinct = _distinct_pairs_ds(cand)
        verified = _verify_pairs_bucketed(packed, distinct, "__payload",
                                          id_col, verify_fn=score,
                                          as_dataset=True)

        def unpack(t: pa.Table) -> pa.Table:
            hit = t.filter(pc.greater_equal(t["metric"], 0.0))
            m = hit["metric"].to_numpy(
                zero_copy_only=False).astype(np.int64)
            code = m // 1000
            return pa.table({
                "a": hit["a"],
                "b": hit["b"],
                "name_dist": pa.array(2 - (code // 100), pa.int64()),
                "n_exact_agree": pa.array((code % 100) // 10,
                                          pa.int64()),
                "value_close": pa.array(code % 10, pa.int64()),
                "score": pa.array(m % 1000, pa.int64()),
            })

        return verified.map_batches(unpack, batch_format="pyarrow",
                                    zero_copy_batch=True)

    verified = _verify_pairs_bucketed(packed, cand, "__payload", id_col,
                                      verify_fn=score)
    hit = verified.filter(pc.greater_equal(verified["metric"], 0.0))
    m = hit["metric"].to_numpy(zero_copy_only=False).astype(np.int64)
    code = m // 1000
    name_dist = 2 - (code // 100)
    agree = (code % 100) // 10
    close = code % 10
    return pa.table({
        "a": hit["a"],
        "b": hit["b"],
        "name_dist": pa.array(name_dist, pa.int64()),
        "n_exact_agree": pa.array(agree, pa.int64()),
        "value_close": pa.array(close, pa.int64()),
        "score": pa.array(m % 1000, pa.int64()),
    })
