"""Referential integrity: anti-join of a key column against a reference
id set -> ``invalid`` violations for orphans.

Two strategies (SURVEY.md §2 joins/lookups):

* ``broadcast`` (default) — the reference side is ``ray.put`` once and
  each batch filters with a vectorized ``is_in``; no shuffle at all.
  Right whenever the id set fits comfortably in the object store (a
  10^9-id string set is a few tens of GB — prefer the shuffle path
  beyond that).
* ``shuffle`` — both sides get a ``bucket = hash(key) % B`` column, are
  unioned with a side tag, grouped by bucket, and each bucket performs
  a local Arrow anti-join inside ``map_groups``. One all-to-all over
  (key, tag) pairs only — bytes-light even at 10^12 rows.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..sources.image_table import VIOLATION_SCHEMA


def _violation_table(ids: pa.Array, column: str) -> pa.Table:
    n = len(ids)
    return pa.Table.from_arrays(
        [
            pc.cast(ids, pa.string()),
            pa.array([column] * n, pa.string()),
            pa.array(["invalid"] * n, pa.string()),
            pa.array([f"known {column}"] * n, pa.string()),
            pc.cast(ids, pa.string()),
            pa.array([None] * n, pa.string()),
            pa.array(["referential"] * n, pa.string()),
        ],
        schema=VIOLATION_SCHEMA,
    )


def referential_violations(
    ds,
    column: str,
    reference_ids,
    *,
    strategy: str = "broadcast",
    num_buckets: int = 64,
):
    """`reference_ids`: pa.Table/Array of valid ids, or a Dataset of them."""
    if strategy == "broadcast":
        if hasattr(reference_ids, "to_pandas") and not isinstance(
            reference_ids, (pa.Table, pa.Array, pa.ChunkedArray)
        ):
            from ._fold import fold_table

            folded = fold_table(reference_ids)
            if folded is None:  # empty reference Dataset: keep its key type
                pa_sch = getattr(reference_ids.schema(), "base_schema", None)
                folded = (
                    pa_sch.empty_table()
                    if pa_sch is not None
                    else pa.table({"id": pa.array([], pa.string())})
                )
            reference_ids = folded
        if isinstance(reference_ids, pa.Table):
            reference_ids = reference_ids.column(0).combine_chunks()
        ref = ray.put(reference_ids)

        def emit(batch: pa.Table) -> pa.Table:
            keys = ray.get(ref)
            col = batch[column].combine_chunks()
            known = pc.fill_null(pc.is_in(col, value_set=keys), False)
            present = pc.is_valid(col)
            orphan = pc.and_(pc.invert(known), present)
            hit = batch.filter(orphan)
            if hit.num_rows == 0:
                return VIOLATION_SCHEMA.empty_table()
            return _violation_table(hit[column].combine_chunks(), column)

        return ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)

    if strategy == "shuffle":
        import ray.data as rd

        def tag(side: str):
            def fn(batch: pa.Table) -> pa.Table:
                col = pc.cast(batch[column].combine_chunks(), pa.string())
                col = col.filter(pc.is_valid(col))
                bucket = pc.bit_wise_and(pc.hash_64(col) if hasattr(pc, "hash_64") else _hash64(col), num_buckets - 1)
                return pa.table(
                    {"key": col, "side": pa.array([side] * len(col)), "bucket": pc.cast(bucket, pa.int32())}
                )

            return fn

        fact = ds.map_batches(tag("fact"), batch_format="pyarrow")
        if not hasattr(reference_ids, "map_batches"):
            tbl = reference_ids if isinstance(reference_ids, pa.Table) else pa.table({column: reference_ids})
            reference_ids = rd.from_arrow(tbl)
        ref = reference_ids.map_batches(tag("ref"), batch_format="pyarrow")

        def anti(group: pa.Table) -> pa.Table:
            # one vectorized Arrow left-anti join per BUCKET (not per key):
            # num_buckets group tasks total, each O(bucket) hash-join work
            facts = group.filter(pc.equal(group["side"], "fact")).select(["key"])
            if facts.num_rows == 0:
                return VIOLATION_SCHEMA.empty_table()
            refs = (
                group.filter(pc.equal(group["side"], "ref"))
                .select(["key"])
                .group_by("key")
                .aggregate([])  # distinct — keeps the join build side minimal
            )
            orphans = facts.join(refs, keys="key", join_type="left anti")
            if orphans.num_rows == 0:
                return VIOLATION_SCHEMA.empty_table()
            return _violation_table(orphans["key"].combine_chunks(), column)

        return fact.union(ref).groupby("bucket").map_groups(anti, batch_format="pyarrow")

    raise ValueError(f"unknown strategy {strategy!r}")


def _hash64(col: pa.Array) -> pa.Array:
    import numpy as np
    import pandas as pd

    h = pd.util.hash_array(col.to_numpy(zero_copy_only=False)).astype(np.int64)
    return pa.array(np.abs(h))


class BloomFilter:
    """Vectorized Bloom filter over string/int keys (numpy bit array).

    k hash functions derived by salting pandas.util.hash_array. No false
    negatives: "absent" answers are certain — exactly the property the
    anti-join prefilter needs (an absent key is *definitely* an orphan).
    """

    @staticmethod
    def _set_bits(bits, values, n_bits: int, k: int):
        import numpy as np
        import pandas as pd

        arr = np.asarray(values, dtype=object)
        for salt in range(k):
            h = pd.util.hash_array(arr, hash_key=f"{salt:016d}") % n_bits
            np.bitwise_or.at(bits, h // 8, (1 << (h % 8)).astype(np.uint8))

    def __init__(self, values, n_bits: int = 1 << 22, k: int = 5):
        import numpy as np

        self.n_bits = n_bits
        self.k = k
        self.bits = np.zeros(n_bits // 8, dtype=np.uint8)
        self._set_bits(self.bits, values, n_bits, k)

    @classmethod
    def from_bits(cls, bits, n_bits: int, k: int = 5) -> "BloomFilter":
        obj = cls.__new__(cls)
        obj.n_bits = n_bits
        obj.k = k
        obj.bits = bits
        return obj

    def maybe_contains(self, values) -> "np.ndarray":
        import numpy as np
        import pandas as pd

        arr = np.asarray(values, dtype=object)
        out = np.ones(len(arr), dtype=bool)
        for salt in range(self.k):
            h = pd.util.hash_array(arr, hash_key=f"{salt:016d}") % self.n_bits
            out &= (self.bits[h // 8] & (1 << (h % 8)).astype(np.uint8)) != 0
        return out


class BloomBits:
    """Mergeable Bloom bit array as a Ray ``AggregateFn``: each block
    contributes a partial bit array, partials OR-merge through the
    aggregation tree (associative + commutative, the HLL pattern) — the
    reference id set never exists on the driver; only the fixed-size
    bit array (n_bits/8 bytes) does. Keys are cast to string before
    hashing so the probe side (which stringifies) always agrees."""

    def __new__(cls, on: str, n_bits: int = 1 << 22, k: int = 5,
                alias_name: str | None = None):
        import numpy as np
        import pandas as pd
        from ray.data.aggregate import AggregateFn

        def accumulate_block(bits, block):
            if isinstance(block, pd.DataFrame):
                block = pa.Table.from_pandas(block, preserve_index=False)
            col = pc.cast(block[on].combine_chunks(), pa.string()).drop_null()
            if len(col) == 0:
                return bits
            bits = bits.copy()
            BloomFilter._set_bits(
                bits, col.to_numpy(zero_copy_only=False), n_bits, k
            )
            return bits

        return AggregateFn(
            init=lambda _: np.zeros(n_bits // 8, dtype=np.uint8),
            merge=np.bitwise_or,
            accumulate_block=accumulate_block,
            finalize=lambda b: b,
            name=alias_name or f"bloom({on})",
        )


def referential_violations_bloom(
    ds,
    column: str,
    reference_ids,
    *,
    n_bits: int = 1 << 22,
    num_buckets: int = 64,
):
    """Anti-join via Bloom prefilter + exact residual check.

    Phase 1 broadcasts only the Bloom bits (n_bits/8 bytes, vs the full
    id set): keys the filter rejects are *certain* orphans and are
    flagged locally with no shuffle. Phase 2 exact-checks the remaining
    "maybe present" keys (members + false positives) through the
    bucketed shuffle anti-join — the shuffle now carries only that
    residual instead of every row. The two violation streams union.

    The Bloom bits are BUILT distributed (``BloomBits`` mergeable
    aggregate) — the reference side may be a Dataset that is never
    collected; a pa.Table/Array reference is wrapped into one.
    """
    import numpy as np
    import ray.data as rd

    if not hasattr(reference_ids, "map_batches"):
        tbl = (
            reference_ids
            if isinstance(reference_ids, pa.Table)
            else pa.table({column: reference_ids})
        )
        reference_ids = rd.from_arrow(tbl)
    ref_schema = reference_ids.schema()
    ref_col = getattr(ref_schema, "names", [column])[0]
    bits = reference_ids.aggregate(BloomBits(ref_col, n_bits=n_bits, alias_name="b"))["b"]
    bloom = BloomFilter.from_bits(bits, n_bits=n_bits)
    bloom_ref = ray.put(bloom)

    def split(batch: pa.Table) -> pa.Table:
        bf = ray.get(bloom_ref)
        col = pc.cast(batch[column].combine_chunks(), pa.string())
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        vals = col.to_numpy(zero_copy_only=False)
        maybe = np.zeros(len(vals), dtype=bool)
        if valid.any():
            arr = np.where(valid, vals, "").astype(object)
            maybe = bf.maybe_contains(arr) & valid
        certain_orphan = valid & ~maybe
        return pa.table(
            {
                "key": col,
                "certain": pa.array(certain_orphan),
                "maybe": pa.array(maybe),
            }
        )

    tagged = ds.map_batches(split, batch_format="pyarrow", zero_copy_batch=True)

    def certain_violations(t: pa.Table) -> pa.Table:
        hit = t.filter(t["certain"])
        if hit.num_rows == 0:
            return VIOLATION_SCHEMA.empty_table()
        return _violation_table(hit["key"].combine_chunks(), column)

    certain = tagged.map_batches(
        certain_violations, batch_format="pyarrow", zero_copy_batch=True
    )
    residual = tagged.map_batches(
        lambda t: pa.table({column: t.filter(t["maybe"])["key"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    ref_for_exact = reference_ids.map_batches(
        lambda t: pa.table({column: t[ref_col]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    exact = referential_violations(
        residual,
        column,
        ref_for_exact,
        strategy="shuffle",
        num_buckets=num_buckets,
    )
    return certain.union(exact)
