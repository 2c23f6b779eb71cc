"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 and compares row count, sorted
column names and an order-insensitive value hash against the matching
``oracle_sql()`` DuckDB result. Queries without an oracle get a
rows-only sanity check.

Usage: python tools/check_oracle.py [--sf DIR] [--only SUBSTR]
"""

from __future__ import annotations

import argparse
import hashlib
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: repr(v))
    rows = sorted(tuple(r) for r in df.itertuples(index=False, name=None))
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    failures = 0
    for name, fn in qs.items():
        if args.only and args.only not in name:
            continue
        t0 = time.monotonic()
        try:
            mine = to_pandas(fn(args.sf))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            print(f"ok   {name:32s} rows={len(mine):6d} (rows-only) {dt:5.1f}s")
            continue
        try:
            ref = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {ex}")
            failures += 1
            continue
        problems = []
        if len(mine) != len(ref):
            problems.append(f"rows {len(mine)} != {len(ref)}")
        if sorted(map(str, mine.columns)) != sorted(map(str, ref.columns)):
            problems.append(f"cols {sorted(mine.columns)} != {sorted(ref.columns)}")
        elif value_hash(mine) != value_hash(ref):
            problems.append("value-hash mismatch")
        if problems:
            failures += 1
            print(f"FAIL {name}: {'; '.join(problems)}")
            if "value-hash mismatch" in problems or len(mine) != len(ref):
                m = mine[sorted(mine.columns)]
                r = ref[sorted(ref.columns)]
                ms = set(map(tuple, m.astype(str).values.tolist()))
                rs = set(map(tuple, r.astype(str).values.tolist()))
                print("   mine-only:", sorted(ms - rs)[:3])
                print("   ref-only: ", sorted(rs - ms)[:3])
        else:
            print(f"ok   {name:32s} rows={len(mine):6d} (oracle)    {dt:5.1f}s")
    print(f"{failures} failures")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
