"""Resume invariance: crash after k chunks + resume == single uninterrupted run."""

from invoice_extraction_ray import fixtures as F
from invoice_extraction_ray import oracle as O
from invoice_extraction_ray.state.checkpoint import read_output, run_checkpointed

from .conftest import assert_tables_equal, dataset_to_sorted_table, oracle_rows_to_table

N_CONVS = 120
SEED = 42


def _inputs(tmp_path):
    return F.write_transcripts_parquet(
        str(tmp_path / "in"), N_CONVS, convs_per_file=20, seed=SEED
    )


def test_resume_invariance(tmp_path):
    paths = _inputs(tmp_path)
    assert len(paths) == 6

    # uninterrupted run
    full = run_checkpointed(paths, str(tmp_path / "full"), files_per_chunk=2)
    assert full["chunks_run"] == 3 and full["chunks_skipped"] == 0

    # crash after 1 chunk, then resume
    crash = run_checkpointed(
        paths, str(tmp_path / "resumed"), files_per_chunk=2, stop_after_chunks=1
    )
    assert crash["chunks_run"] == 1
    resumed = run_checkpointed(paths, str(tmp_path / "resumed"), files_per_chunk=2)
    assert resumed["chunks_skipped"] == 1 and resumed["chunks_run"] == 2
    assert resumed["rows"] == full["rows"]

    a = dataset_to_sorted_table(read_output(str(tmp_path / "full")))
    b = dataset_to_sorted_table(read_output(str(tmp_path / "resumed")))
    assert_tables_equal(a, b)

    # and both match the oracle
    rows = []
    for i in range(N_CONVS):
        rows.extend(F.gen_conversation(SEED, i))
    oracle = oracle_rows_to_table(O.extract_table(rows))
    assert_tables_equal(oracle, a)


def test_partial_chunk_is_rerun(tmp_path):
    import json
    import os

    paths = _inputs(tmp_path)
    out = str(tmp_path / "out")
    run_checkpointed(paths, out, files_per_chunk=2)
    # corrupt: delete one manifest (simulates crash between data and manifest)
    mpath = os.path.join(out, "_manifests", "chunk-00001.json")
    with open(mpath) as f:
        before = json.load(f)
    os.remove(mpath)
    again = run_checkpointed(paths, out, files_per_chunk=2)
    assert again["chunks_run"] == 1 and again["chunks_skipped"] == 2
    with open(mpath) as f:
        after = json.load(f)
    assert after["row_count"] == before["row_count"]


def test_job_cli_runs_and_resumes(tmp_path):
    """The `ray job submit` entry point end-to-end in a subprocess: first run
    processes all chunks, second run resumes (skips everything)."""
    import json
    import os
    import subprocess
    import sys

    from invoice_extraction_ray.fixtures import write_transcripts_parquet

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = write_transcripts_parquet(str(tmp_path / "in"), 60, convs_per_file=20, seed=4)
    out_dir = str(tmp_path / "out")
    env = dict(os.environ, PYTHONPATH=repo)
    cmd = [
        sys.executable, "-m", "invoice_extraction_ray.job",
        "--input", ",".join(paths), "--output", out_dir, "--files-per-chunk", "2",
    ]
    r1 = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=300, cwd=repo)
    assert r1.returncode == 0, r1.stderr[-1500:]
    s1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert s1["chunks_run"] == 2 and s1["rows"] > 0
    r2 = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=300, cwd=repo)
    assert r2.returncode == 0, r2.stderr[-1500:]
    s2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert s2["chunks_run"] == 0 and s2["chunks_skipped"] == 2
    assert s2["rows"] == s1["rows"]
    # S9 report sink: per-run metrics JSON written next to data + manifests
    with open(os.path.join(out_dir, "report.json")) as f:
        report = json.load(f)
    assert report["total_rows"] == s1["rows"]
    assert set(report["field_coverage"]) == {
        "entity", "code", "power", "amount", "region_a", "region_b"
    }
    assert report["failures"]["most_common"]
