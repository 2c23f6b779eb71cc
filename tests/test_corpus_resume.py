"""Resumable prepare_corpus (plan/apply): crash-resume parity with the
one-shot pipeline, stale-partial cleanup, plan-mismatch refusal."""

import json
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from schisma_ray.pipelines.corpus_pipeline import (
    prepare_corpus,
    prepare_resumable,
)


def _corpus_dir(tmp_path: Path) -> Path:
    """3 fragments; text duplicates CROSS partitions (global dedup must
    keep the corpus-wide first), mixed langs/quality, 2 sources."""
    d = tmp_path / "docs"
    d.mkdir()
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "short",
        "a solid english document with enough words to pass the filter",
        "une ligne de texte francais qui ne passe pas le filtre langue",
        "another perfectly reasonable english sentence for the corpus",
    ]
    rows = []
    for i in range(30):
        rows.append({
            "doc_id": i,
            # ids 0/10/20 share text (cross-fragment dup), etc.
            "text": texts[i % 5] + ("" if i < 10 else ""),
            "lang": "fr" if i % 5 == 3 else "en",
            "source": "web" if i % 2 == 0 else "books",
        })
    for frag in range(3):
        part = rows[frag * 10:(frag + 1) * 10]
        pq.write_table(
            pa.table({
                "doc_id": pa.array([r["doc_id"] for r in part], pa.int64()),
                "text": pa.array([r["text"] for r in part], pa.string()),
                "lang": pa.array([r["lang"] for r in part], pa.string()),
                "source": pa.array([r["source"] for r in part], pa.string()),
            }),
            d / f"part-{frag:02d}.parquet",
        )
    return d


KNOBS = dict(min_quality=0.2, cap_per_source=3, chunk_size=30,
             chunk_stride=20)


def _read_chunks(out: Path):
    parts = sorted(p for p in out.iterdir()
                   if p.is_dir() and p.name.startswith("part-")
                   and not p.name.endswith(".inprogress"))
    tables = [pq.read_table(f) for p in parts for f in sorted(p.glob("*.parquet"))]
    t = pa.concat_tables(tables)
    return sorted(zip(t["doc_id"].to_pylist(), t["chunk_idx"].to_pylist(),
                      t["chunk_text"].to_pylist()))


def test_prepare_resumable_matches_oneshot(ray_session, tmp_path):
    docs = _corpus_dir(tmp_path)
    out = tmp_path / "out"
    recs = prepare_resumable(docs, out, files_per_partition=1, **KNOBS)
    assert len(recs) == 3
    got = _read_chunks(out)
    ref = prepare_corpus(
        rd.read_parquet(sorted(str(p) for p in docs.glob("*.parquet"))),
        **KNOBS,
    ).to_pandas()
    want = sorted(zip(ref["doc_id"], ref["chunk_idx"], ref["chunk_text"]))
    assert got == want
    assert len(got) > 0
    # cross-fragment dedup: only the min doc_id per text survives
    surviving_docs = {d for d, _, _ in got}
    assert surviving_docs <= {0, 1, 2, 4}  # firsts of each kept text


def test_prepare_resumable_crash_resume_identical(ray_session, tmp_path):
    docs = _corpus_dir(tmp_path)
    full, crash = tmp_path / "full", tmp_path / "crash"
    prepare_resumable(docs, full, files_per_partition=1, **KNOBS)

    first = prepare_resumable(docs, crash, files_per_partition=1,
                              max_partitions=1, **KNOBS)
    assert len(first) == 1
    # plant junk simulating a crashed uncommitted attempt
    pid_dirs = [p for p in crash.iterdir() if p.is_dir()
                and p.name.startswith("part-") and p.name != "_commits"]
    junk = crash / "part-00001-deadbeef.inprogress"
    junk.mkdir()
    (junk / "garbage.parquet").write_bytes(b"not parquet")
    second = prepare_resumable(docs, crash, files_per_partition=1, **KNOBS)
    assert len(second) == 2  # only the uncommitted partitions re-ran
    assert _read_chunks(crash) == _read_chunks(full)
    # third run: everything committed, nothing runs
    assert prepare_resumable(docs, crash, files_per_partition=1,
                             **KNOBS) == []
    # commit records carry lineage
    recs = [json.loads(p.read_text())
            for p in sorted((crash / "_commits").glob("*.json"))]
    assert len(recs) == 3
    assert all(r["inputs"] and "row_count" in r and "n_docs" in r
               for r in recs)
    # plan committed once with the survivor count
    plan = json.loads((crash / "_plan" / "plan.json").read_text())
    assert plan["n_survivors"] >= 1


def test_prepare_resumable_plan_mismatch_refuses(ray_session, tmp_path):
    docs = _corpus_dir(tmp_path)
    out = tmp_path / "out"
    prepare_resumable(docs, out, files_per_partition=1, **KNOBS)
    changed = dict(KNOBS, min_quality=0.9)
    with pytest.raises(RuntimeError, match="plan mismatch"):
        prepare_resumable(docs, out, files_per_partition=1, **changed)
    with pytest.raises(RuntimeError, match="plan mismatch"):
        prepare_resumable(docs, out, files_per_partition=3, **KNOBS)
