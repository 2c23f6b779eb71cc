"""Shuffle-op scaling measurement (supplementary to bench.py --scaling).

Measures a groupby-shuffle operator — ``tfidf_top_terms`` (explode ->
(lang, word) combiner -> all-to-all -> per-lang top-k) — at two
parallelism levels in fresh processes, over BOTH the raw sf0.1
documents table (5k docs: demonstrates the honest small-data inversion)
and a 40x-replicated re-keyed copy (200k docs: the shuffle-bound
scaling number). Prints one JSON line; see BASELINE.md "Shuffle-op
scaling".

Usage: python tools/bench_shuffle_scaling.py            # both sizes
       SCHISMA_SHUFFLE_SIZE=200000 ... (workers only)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
BIG_DIR = "/tmp/schisma_ray_cache/docs_200k"


def make_big_table() -> str:
    """40x-replicated, re-keyed sf0.1 documents table (cached)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = Path(BIG_DIR)
    if (out / "_DONE").exists():
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    base = pq.read_table(f"{SF_DIR}/documents.parquet")
    n = base.num_rows
    import pyarrow.compute as pc

    for rep in range(40):
        t = base.set_column(
            base.schema.get_field_index("doc_id"),
            "doc_id",
            pc.add(base["doc_id"], rep * 10 * n),
        )
        pq.write_table(t, out / f"part-{rep:02d}.parquet")
    (out / "_DONE").touch()
    return str(out)


def run_worker() -> dict:
    import ray

    ncpu = int(os.environ["RAY_GRAFT_CPUS"])
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from schisma_ray.stages.text import tfidf_top_terms

    src = os.environ["SCHISMA_SHUFFLE_SRC"]
    # warm: worker pool + page cache (untimed)
    def _warm(batch):
        import schisma_ray.stages.text  # noqa: F401

        time.sleep(0.5)
        return batch

    rd.range(ncpu * 2, override_num_blocks=ncpu * 2).map_batches(
        _warm, batch_size=1
    ).count()
    rd.read_parquet(src).count()

    def timed() -> float:
        t0 = time.monotonic()
        ds = tfidf_top_terms(rd.read_parquet(src), k=5)
        for _ in ds.iter_batches(batch_format="pyarrow"):
            pass
        return time.monotonic() - t0

    sec = round(min(timed(), timed()), 3)
    ray.shutdown()
    return {"sec": sec, "num_cpus": ncpu}


def one(ncpu: int, src: str) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
               SCHISMA_SHUFFLE_SRC=src, SCHISMA_SHUFFLE_MODE="worker",
               PYTHONPATH=REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", ""))
    proc = subprocess.run([sys.executable, __file__], env=env,
                          capture_output=True, text=True, check=True)
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> dict:
    big = make_big_table()
    lo, hi = 8, 32
    out = {"metric": "tfidf_top_terms (groupby shuffle) scaling, fresh processes, best-of-2",
           "pairs": {}}
    for label, src in (("sf0.1_5k_docs", f"{SF_DIR}/documents.parquet"),
                       ("200k_docs", big)):
        lo_s = min(one(lo, src)["sec"], one(lo, src)["sec"])
        hi_s = min(one(hi, src)["sec"], one(hi, src)["sec"])
        speed = round(lo_s / hi_s, 2)
        out["pairs"][label] = {
            "sec_lo8": lo_s, "sec_hi32": hi_s, "speedup": speed,
            "absolute_efficiency": round(speed / (hi / lo), 3),
        }
    return out


if __name__ == "__main__":
    if os.environ.get("SCHISMA_SHUFFLE_MODE") == "worker":
        print(json.dumps(run_worker()))
    else:
        print(json.dumps(main()))
