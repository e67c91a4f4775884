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


def _doc_inputs(tmp_path, n_files=6, rows_per_file=80):
    """Split the sf0.001 documents table into n_files small parquet files."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    d = tmp_path / "docs_in"
    d.mkdir()
    paths = []
    for i in range(n_files):
        sl = t.slice(i * rows_per_file, rows_per_file)
        p = str(d / f"docs-{i:03d}.parquet")
        pq.write_table(sl, p)
        paths.append(p)
    return paths


def test_prep_resume_invariance(tmp_path):
    """Checkpointed curation (quality -> exact dedup -> near-dup removal):
    kill after chunk 1, resume, output equals the uninterrupted run."""
    from invoice_extraction_ray.state.checkpoint import run_prep_checkpointed

    paths = _doc_inputs(tmp_path)

    full = run_prep_checkpointed(paths, str(tmp_path / "pfull"), files_per_chunk=2)
    assert full["chunks_run"] == 3 and full["chunks_skipped"] == 0
    assert full["rows"] > 0

    crash = run_prep_checkpointed(
        paths, str(tmp_path / "pres"), files_per_chunk=2, stop_after_chunks=1
    )
    assert crash["chunks_run"] == 1
    resumed = run_prep_checkpointed(paths, str(tmp_path / "pres"), files_per_chunk=2)
    assert resumed["chunks_skipped"] == 1 and resumed["chunks_run"] == 2
    assert resumed["rows"] == full["rows"]

    def _sorted(out):
        import pyarrow as pa
        import ray

        tables = [ray.get(r) for r in read_output(out).to_arrow_refs()]
        t = pa.concat_tables([x for x in tables if x.num_rows])
        return t.sort_by([("doc_id", "ascending")])

    a = _sorted(str(tmp_path / "pfull"))
    b = _sorted(str(tmp_path / "pres"))
    assert_tables_equal(a, b)
    assert set(a.column_names) == {"doc_id", "n_copies", "score_e5"}


def test_prep_partial_chunk_is_rerun(tmp_path):
    import json
    import os

    from invoice_extraction_ray.state.checkpoint import run_prep_checkpointed

    paths = _doc_inputs(tmp_path)
    out = str(tmp_path / "pout")
    run_prep_checkpointed(paths, out, files_per_chunk=2)
    mpath = os.path.join(out, "_manifests", "chunk-00001.json")
    with open(mpath) as f:
        before = json.load(f)
    os.remove(mpath)
    again = run_prep_checkpointed(paths, out, files_per_chunk=2)
    assert again["chunks_run"] == 1 and again["chunks_skipped"] == 2
    with open(mpath) as f:
        after = json.load(f)
    # deterministic re-run reproduces the manifest (parquet file names are
    # session-unique, so compare everything but them)
    drop = lambda m: {k: v for k, v in m.items() if k != "output_files"}
    assert drop(after) == drop(before)


def test_compact_parquet_preserves_content_and_reduces_files(tmp_path):
    """Compaction: 40 tiny files -> few large files, exact row multiset
    preserved, crash-safe output (no .tmp left), refuses to clobber."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from invoice_extraction_ray.state.compact import compact_parquet

    src = tmp_path / "small"
    src.mkdir()
    rng = np.random.RandomState(0)
    all_rows = []
    for i in range(40):
        n = int(rng.randint(5, 60))
        ids = rng.randint(0, 10**9, n).astype(np.int64)
        vals = rng.randint(0, 1000, n).astype(np.int64)
        all_rows += list(zip(ids.tolist(), vals.tolist()))
        pq.write_table(
            pa.table({"id": pa.array(ids), "v": pa.array(vals)}),
            src / f"part-{i:04d}.parquet",
        )
    out = tmp_path / "compacted"
    stats = compact_parquet(str(src), str(out), target_rows_per_file=100_000)
    assert stats["files_in"] == 40
    assert stats["files_out"] < 40 and stats["files_out"] >= 1
    assert stats["rows"] == len(all_rows)
    got = pq.read_table(str(out))
    assert sorted(zip(got.column("id").to_pylist(), got.column("v").to_pylist())) == sorted(all_rows)
    assert not any(".tmp" in n for n in os.listdir(tmp_path))
    with pytest.raises(ValueError, match="not empty"):
        compact_parquet(str(src), str(out))
