"""Actor-pool amortization micro-benchmark (DESIGN.md 'decode
validate/conform' row): quantifies why heavy-state stages must be
callable CLASSES on an actor pool, not per-task closures.

Two runs over the same dataset and the same per-batch work:

* **actor pool** — `map_batches(HeavyStage, concurrency=N)`: the
  simulated model load (``setup_s`` sleep + table build) runs once per
  actor in ``__init__``.
* **per-task setup** (anti-pattern) — a plain function that pays the
  same setup inside every task invocation, the shape you get when
  loading a model lazily inside the batch fn.

Prints one JSON line; record the numbers in BASELINE.md.

Usage: python tools/bench_actor_pool.py [--setup-s 1.0] [--blocks 64]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import pyarrow as pa


SETUP_S = 1.0


def _simulated_model(setup_s: float) -> np.ndarray:
    """Stand-in for a model load: sleep (I/O) + a table build (CPU)."""
    time.sleep(setup_s)
    rng = np.random.default_rng(0)
    return rng.standard_normal((256, 256))


def _work(batch: pa.Table, model: np.ndarray) -> pa.Table:
    x = batch["id"].to_numpy(zero_copy_only=False).astype(np.float64)
    feats = np.outer(x[:64] if len(x) >= 64 else x, model[0][: len(x)])
    return pa.table({"id": batch["id"], "s": pa.array(
        np.full(len(x), float(feats.sum())), pa.float64())})


class HeavyStage:
    def __init__(self, setup_s: float):
        self.model = _simulated_model(setup_s)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _work(batch, self.model)


def per_task_setup(setup_s: float):
    def fn(batch: pa.Table) -> pa.Table:
        model = _simulated_model(setup_s)  # paid EVERY task
        return _work(batch, model)

    return fn


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--setup-s", type=float, default=SETUP_S)
    ap.add_argument("--blocks", type=int, default=64)
    ap.add_argument("--rows", type=int, default=640_000)
    ap.add_argument("--concurrency", type=int, default=8)
    args = ap.parse_args()

    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    def dataset():
        return rd.range(args.rows, override_num_blocks=args.blocks).map_batches(
            lambda t: t, batch_format="pyarrow"
        )

    t0 = time.perf_counter()
    n1 = dataset().map_batches(
        HeavyStage,
        fn_constructor_args=(args.setup_s,),
        batch_format="pyarrow",
        concurrency=args.concurrency,
    ).count()
    actor_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    n2 = dataset().map_batches(
        per_task_setup(args.setup_s), batch_format="pyarrow"
    ).count()
    task_sec = time.perf_counter() - t0

    assert n1 == n2 == args.rows
    print(json.dumps({
        "metric": "actor-pool amortization of heavy stage setup",
        "setup_s": args.setup_s,
        "blocks": args.blocks,
        "concurrency": args.concurrency,
        "actor_pool_sec": round(actor_sec, 3),
        "per_task_setup_sec": round(task_sec, 3),
        "speedup": round(task_sec / actor_sec, 2),
        "setup_paid_actor": args.concurrency,
        "setup_paid_task": args.blocks,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
