"""Extreme-skew stress: a conversation holding HALF the corpus through the
salted groupby seal, and a giant (whole-corpus) near-dup component through
the min-label cluster propagation — the two skew shapes a web corpus throws
at the wide stages (VERDICT r3 item 6)."""

import zlib

import pyarrow as pa

from invoice_extraction_ray import fixtures as F
from invoice_extraction_ray.pipelines.extract import build_pipeline, to_dataset
from invoice_extraction_ray.stages.seal import SEAL_SHARDS, compute_hot_convs

from .conftest import assert_tables_equal, dataset_to_sorted_table

GIANT = "conv-zz-giant"


def _skewed_corpus(n_base: int = 80, seed: int = 7) -> pa.Table:
    """Base corpus plus ONE conversation holding as many turns as the whole
    rest: gen_conversation output rewritten onto a single conv_id with a
    fresh contiguous turn_idx (text/roles stay realistic)."""
    rows = []
    for i in range(n_base):
        rows.extend(F.gen_conversation(seed, i))
    n_target = len(rows)
    giant, idx, ci = [], 0, 10_000
    while idx < n_target:
        for r in F.gen_conversation(seed, ci):
            if idx >= n_target:
                break
            r = dict(r)
            r["conv_id"] = GIANT
            r["turn_idx"] = idx
            idx += 1
            giant.append(r)
        ci += 1
    rows.extend(giant)
    import numpy as np

    order = np.random.default_rng(seed).permutation(len(rows))
    return F.rows_to_table([rows[i] for i in order])


def test_seal_groupby_with_half_corpus_conversation():
    corpus = _skewed_corpus()
    n_total = corpus.num_rows
    n_giant = corpus.filter(
        pa.compute.equal(corpus.column("conv_id"), GIANT)
    ).num_rows
    assert n_giant * 2 >= n_total  # the skew premise: one conv >= 50%

    salt_block = 64
    by_sort = dataset_to_sorted_table(build_pipeline(corpus, seal_strategy="sort"))
    by_groupby = dataset_to_sorted_table(
        build_pipeline(
            corpus, seal_strategy="groupby", hot_threshold=200, salt_block=salt_block
        )
    )
    assert_tables_equal(by_sort, by_groupby)

    # bounded per-task state: recompute the seal keys by the documented
    # salting contract (conv#(turn_idx//salt_block) for hot convs, shard =
    # crc32(key) & (SEAL_SHARDS-1)) and assert no shard group — the unit a
    # single map_groups task sorts in memory — holds more than a small
    # multiple of salt_block, instead of the unsalted 50% of the corpus
    hot = compute_hot_convs(to_dataset(corpus), 200)
    assert GIANT in hot
    shard_rows: dict[int, int] = {}
    convs = corpus.column("conv_id").to_pylist()
    turns = corpus.column("turn_idx").to_pylist()
    for c, t in zip(convs, turns):
        key = f"{c}#{t // salt_block}" if c in hot else c
        s = zlib.crc32(key.encode()) & (SEAL_SHARDS - 1)
        shard_rows[s] = shard_rows.get(s, 0) + 1
    worst = max(shard_rows.values())
    assert worst <= 4 * salt_block, (
        f"seal shard holds {worst} rows (> {4 * salt_block}) — salting failed"
    )
    assert worst < 0.1 * n_total  # vs 0.5 * n_total without salting


def test_neardup_clusters_giant_component():
    """One component covering the ENTIRE corpus (every doc shares a long
    common template): pair state stays O(pairs), propagation converges to
    min-doc_id labels for all members in O(diameter)=O(1) rounds."""
    from invoice_extraction_ray.ops.dedup import neardup_clusters, ngram_jaccard_neardup

    n = 150
    common = " ".join(f"w{j}" for j in range(30))
    docs = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": [f"{common} unique{i}" for i in range(n)],
        }
    )
    # clique premise: adjacent trigram sets differ by ~2 grams of ~30
    pairs = ngram_jaccard_neardup(docs, threshold=0.5).take_all()
    assert len(pairs) == n * (n - 1) // 2

    got = {r["doc_id"]: r["cluster_id"] for r in neardup_clusters(docs, 0.5).take_all()}
    assert len(got) == n
    assert all(lbl == 0 for lbl in got.values()), "giant component must fold to min id"
