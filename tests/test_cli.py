"""CLI smoke tests (subprocess — the CLI owns its own Ray session)."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run(*args):
    return subprocess.run(
        [sys.executable, "-m", "schisma_ray.cli", "--num-cpus", "4", *args],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )


def test_cli_generate_validate_report(tmp_path):
    gen = _run("generate", "--rows", "1500")
    assert gen.returncode == 0, gen.stderr[-2000:]
    table_dir = gen.stdout.strip().splitlines()[-1]
    out = tmp_path / "vio"
    val = _run("validate", "--table", table_dir, "--out", str(out), "--resumable")
    assert val.returncode == 0, val.stderr[-2000:]
    assert json.loads(val.stdout.strip().splitlines()[-1])["partitions_run"] >= 1
    rep = _run("report", "--out", str(out))
    assert rep.returncode == 0
    records = [json.loads(line) for line in rep.stdout.strip().splitlines()]
    assert records and all("violation_counts" in r for r in records)
    # resume: second run does nothing
    val2 = _run("validate", "--table", table_dir, "--out", str(out), "--resumable")
    assert json.loads(val2.stdout.strip().splitlines()[-1])["partitions_run"] == 0


def test_cli_infer():
    res = _run("infer", "--table", "/root/testdata/sf0.001/events.parquet")
    assert res.returncode == 0, res.stderr[-2000:]
    lit = json.loads(res.stdout.strip().splitlines()[-1])
    assert lit["event_type"] == "String"
    assert lit["value"] == "Number"
    assert lit["event_id"] == "BigInt"


def test_cli_prepare(tmp_path):
    out = tmp_path / "chunks"
    res = _run(
        "prepare", "--docs", "/root/testdata/sf0.001/documents.parquet",
        "--out", str(out), "--langs", "en", "--cap-per-source", "5",
        "--chunk-size", "100", "--chunk-stride", "80",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    info = json.loads(res.stdout.strip().splitlines()[-1])
    assert info["chunks_written"] > 0
    import pyarrow.dataset as pads

    t = pads.dataset(str(out)).to_table()
    assert sorted(t.column_names) == ["chunk_idx", "chunk_text", "doc_id"]
    assert all(len(c) <= 100 for c in t["chunk_text"].to_pylist())
