"""FIXTURES.md invariance property 2, taken literally: the flagship pipeline
produces IDENTICAL output under ray.init(num_cpus=2) and ray.init(num_cpus=8)
— run in fresh subprocesses so each owns its Ray session."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = """
import sys, json, hashlib
import ray
ray.init(address="local", num_cpus=int(sys.argv[1]), include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from invoice_extraction_ray.fixtures import gen_transcripts
from invoice_extraction_ray.pipelines.extract import build_pipeline

t = gen_transcripts(120, seed=77)
ds = build_pipeline(t)
rows = sorted(
    (
        (r["conv_id"], r["turn_idx"], r["extracted_text"], r["confidence"], r["notes"])
        for r in ds.select_columns(
            ["conv_id", "turn_idx", "extracted_text", "confidence", "notes"]
        ).take_all()
    )
)
digest = hashlib.sha256(json.dumps(rows).encode()).hexdigest()
print(json.dumps({"n": len(rows), "sha": digest}))
ray.shutdown()
"""


def _run(num_cpus: int) -> dict:
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT, str(num_cpus)],
        capture_output=True,
        text=True,
        env=env,
        timeout=420,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_output_identical_across_num_cpus():
    lo = _run(2)
    hi = _run(8)
    assert lo["n"] > 0
    assert lo == hi


def test_ngram_pairs_and_clusters_partition_invariant():
    """The inverted-index pair generation and the label-propagation clustering
    must return identical results regardless of input partitioning."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from invoice_extraction_ray.ops.dedup import neardup_clusters, ngram_jaccard_neardup

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )

    def run(nblocks):
        ds = rd.from_arrow(docs).repartition(nblocks)
        pairs = sorted(
            (r["a_id"], r["b_id"], r["n_inter"], r["n_union"])
            for r in ngram_jaccard_neardup(ds, threshold=0.5).take_all()
        )
        clusters = sorted(
            (r["doc_id"], r["cluster_id"])
            for r in neardup_clusters(ds, threshold=0.5).take_all()
        )
        return pairs, clusters

    one = run(1)
    many = run(7)
    assert one == many
    assert one[0], "fixture corpus must contain near-dup pairs"
