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


def test_pair_count_combine_is_partition_invariant():
    """_pair_partials/_sum_pair_counts implement a distributive count: any
    split of the raw pair multiset into blocks must combine to the exact
    global per-pair counts (hypothesis over multisets AND block layouts)."""
    from collections import Counter

    import numpy as np
    import ray.data as rd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from invoice_extraction_ray.ops.dedup import _pair_partials, _sum_pair_counts

    @settings(max_examples=15, deadline=None)
    @given(
        pairs=st.lists(
            st.tuples(st.integers(0, 9), st.integers(10, 19)), min_size=1, max_size=60
        ),
        nsplit=st.integers(1, 5),
        data=st.data(),
    )
    def check(pairs, nsplit, data):
        want = Counter(pairs)
        cuts = sorted(
            data.draw(
                st.lists(
                    st.integers(0, len(pairs)), min_size=nsplit - 1, max_size=nsplit - 1
                )
            )
        )
        blocks, prev = [], 0
        for c in cuts + [len(pairs)]:
            chunk = pairs[prev:c]
            prev = c
            if not chunk:
                continue
            a = np.array([p[0] for p in chunk], np.int64)
            b = np.array([p[1] for p in chunk], np.int64)
            blocks.append(_pair_partials(a, b))
        got = {
            (r["a_id"], r["b_id"]): r["n"]
            for r in _sum_pair_counts(rd.from_arrow(blocks), "n").take_all()
        }
        assert got == dict(want)

    check()


def test_novelty_and_vocab_partition_invariant():
    """novelty_scores and token_frequencies must be invariant to the input
    block layout (their per-block combiners are exact)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from invoice_extraction_ray.ops.dedup import novelty_scores

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )

    def run(nblocks):
        ds = rd.from_arrow(docs).repartition(nblocks)
        return sorted(
            (r["doc_id"], r["n_grams"], r["n_unique"], r["novelty_e4"])
            for r in novelty_scores(ds).take_all()
        )

    assert run(1) == run(9)


def test_funnel_retention_q3_shard_count_invariant():
    """The coarse-shard message-passing ops must be exact for ANY shard
    count (each key lives wholly in one shard; per-shard logic is exact)."""
    from invoice_extraction_ray.ops.relational import (
        funnel_counts,
        retention_cohorts,
        top_revenue_orders,
    )

    SF = "/root/testdata/sf0.001"

    assert funnel_counts(SF, num_shards=1).to_pylist() == funnel_counts(
        SF, num_shards=7
    ).to_pylist()

    rc = lambda n: sorted(
        (r["cohort_week"], r["week"], r["n_users"])
        for r in retention_cohorts(SF, num_shards=n).take_all()
    )
    assert rc(1) == rc(7)

    q3 = lambda n: [
        (r["o_orderkey"], r["revenue_i"])
        for r in top_revenue_orders(SF, num_shards=n).take_all()
    ]
    assert q3(1) == q3(7)


def test_new_shard_ops_shard_count_invariant():
    """event_type_pivot / dedup_keep_best must be exact for ANY shard count
    (associative combiners; each key lives wholly in one shard)."""
    from invoice_extraction_ray.ops.dedup import dedup_keep_best
    from invoice_extraction_ray.ops.relational import event_type_pivot

    SF = "/root/testdata/sf0.001"

    piv = lambda n: sorted(
        tuple(sorted(r.items()))
        for r in event_type_pivot(SF, n_shards=n).take_all()
    )
    assert piv(1) == piv(16)

    dkb = lambda n: sorted(
        (r["doc_id"], r["score_e5"], r["n_copies"])
        for r in dedup_keep_best(SF, n_shards=n).take_all()
    )
    assert dkb(1) == dkb(16)


def test_continuation_ops_shard_count_invariant(tmp_path, monkeypatch):
    """The continuation ops must be exact for ANY shard count: gap fill and
    custdist (associative per-key partials), Q2 argmin (witness carried),
    incremental refresh (base+delta merge), BFS (vertex ownership is
    hash(v) % n_shards on both edge and message sides)."""
    from invoice_extraction_ray.ops.graph import bfs_hops
    from invoice_extraction_ray.ops.relational import (
        cheapest_supplier,
        customer_order_distribution,
        incremental_user_value,
    )
    from invoice_extraction_ray.ops.window import user_gap_fill

    SF = "/root/testdata/sf0.001"
    monkeypatch.setenv("IER_INCR_CACHE", str(tmp_path / "ic"))

    gap = lambda n: sorted(
        (r["user_id"], r["day_i"], r["value_c"], r["observed"])
        for r in user_gap_fill(SF, n_shards=n).take_all()
    )
    assert gap(1) == gap(16)

    cod = lambda n: sorted(
        (r["c_count"], r["custdist"])
        for r in customer_order_distribution(SF, n_shards=n).to_pylist()
    )
    assert cod(1) == cod(16)

    chs = lambda n: sorted(
        (r["p_partkey"], r["s_suppkey"], r["s_name"], r["min_price_c"])
        for r in cheapest_supplier(SF, num_shards=n).take_all()
    )
    assert chs(1) == chs(16)

    inc = lambda n: sorted(
        (r["user_id"], r["total_c"], r["n"])
        for r in incremental_user_value(SF, n_shards=n).take_all()
    )
    assert inc(1) == inc(16)

    bfs = lambda n: sorted(
        (r["kind"], r["key"], r["hops"])
        for r in bfs_hops(SF, n_shards=n).take_all()
    )
    assert bfs(2) == bfs(8)


def test_lifecycle_ops_shard_count_invariant():
    """CDC apply / interval union / SCD2: output is invariant to the shard
    count (1 vs 16) — equal keys co-locate at any n_shards and the kernels
    are order-independent within a shard."""
    from invoice_extraction_ray.ops.dedup import apply_changelog
    from invoice_extraction_ray.ops.interval import user_active_spans
    from invoice_extraction_ray.ops.window import scd2_user_bands

    SF = "/root/testdata/sf0.001"

    cdc = lambda n: sorted(
        (r["doc_id"], r["n_chars"])
        for r in apply_changelog(SF, n_shards=n).take_all()
    )
    assert cdc(1) == cdc(16)

    spans = lambda n: sorted(
        (r["user_id"], r["n_spans"], r["covered_sec"], r["max_span_sec"])
        for r in user_active_spans(SF, n_shards=n).take_all()
    )
    assert spans(1) == spans(16)

    scd = lambda n: sorted(
        (
            r["user_id"],
            r["band"],
            r["valid_from"],
            -1 if r["valid_to"] is None else r["valid_to"],
            r["n_days"],
        )
        for r in scd2_user_bands(SF, n_shards=n).take_all()
    )
    assert scd(1) == scd(16)
