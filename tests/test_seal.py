"""Seal-stage properties: salting invariance + within-conversation ordering."""

import ray

from invoice_extraction_ray import fixtures as F
from invoice_extraction_ray.pipelines.extract import build_pipeline, to_dataset
from invoice_extraction_ray.stages.seal import compute_hot_convs

from .conftest import assert_tables_equal, dataset_to_sorted_table


def test_hot_conv_census():
    t = F.gen_transcripts(400, seed=42)
    counts = {}
    for c in t.column("conv_id").to_pylist():
        counts[c] = counts.get(c, 0) + 1
    expected = {c for c, n in counts.items() if n >= 50}
    assert expected, "fixture should contain hot conversations at this scale"
    got = compute_hot_convs(to_dataset(t), 50)
    assert got == expected


def test_salting_invariance():
    t = F.gen_transcripts(200, seed=42)
    # force salting for everything vs no salting at all
    salted = dataset_to_sorted_table(
        build_pipeline(t, seal_strategy="groupby", hot_threshold=1, salt_block=8)
    )
    unsalted = dataset_to_sorted_table(
        build_pipeline(t, seal_strategy="groupby", hot_threshold=10**9)
    )
    assert_tables_equal(unsalted, salted)


def test_sort_strategy_equals_groupby_strategy():
    t = F.gen_transcripts(150, seed=9)
    by_sort = dataset_to_sorted_table(build_pipeline(t, seal_strategy="sort"))
    by_groupby = dataset_to_sorted_table(
        build_pipeline(t, seal_strategy="groupby", hot_threshold=30, salt_block=16)
    )
    assert_tables_equal(by_sort, by_groupby)


def test_aligned_strategy_equals_sort_strategy(tmp_path):
    # multi-file corpus with the writer's conversation-disjoint layout
    from invoice_extraction_ray.fixtures import write_transcripts_parquet

    paths = write_transcripts_parquet(str(tmp_path / "in"), 120, convs_per_file=30, seed=5)
    assert len(paths) == 4
    by_aligned = dataset_to_sorted_table(build_pipeline(paths, seal_strategy="aligned"))
    by_sort = dataset_to_sorted_table(build_pipeline(paths, seal_strategy="sort"))
    assert_tables_equal(by_sort, by_aligned)
    # task-map compute folds the per-shard seal sort into the classify call
    # (fold_sort fast path) — must stay byte-identical, including the
    # ALREADY-ORDERED concatenated stream property
    task_aligned = build_pipeline(paths, seal_strategy="aligned", compute="task")
    keys = [
        (r["conv_id"], r["turn_idx"])
        for b in task_aligned.iter_batches(batch_size=256, batch_format="pyarrow")
        for r in b.select(["conv_id", "turn_idx"]).to_pylist()
    ]
    assert keys == sorted(keys)
    task_aligned = build_pipeline(paths, seal_strategy="aligned", compute="task")
    assert_tables_equal(by_sort, dataset_to_sorted_table(task_aligned))


def test_sort_strategy_is_globally_ordered():
    t = F.gen_transcripts(80, seed=3)
    ds = build_pipeline(t, seal_strategy="sort")
    keys = [
        (r["conv_id"], r["turn_idx"])
        for b in ds.iter_batches(batch_size=256, batch_format="pyarrow")
        for r in b.select(["conv_id", "turn_idx"]).to_pylist()
    ]
    assert keys == sorted(keys)


def test_groups_are_turn_sorted():
    salt_block = 16
    t = F.gen_transcripts(100, seed=7)
    ds = build_pipeline(
        t, seal_strategy="groupby", hot_threshold=40, salt_block=salt_block
    )
    # ordering guarantee is per seal group: within a contiguous run of the same
    # (conv_id, turn_idx // salt_block), turn_idx is non-decreasing.  (A salted
    # hot conversation is split across groups whose relative order is free.)
    seen_any = False
    for ref in ds.to_arrow_refs():
        blk = ray.get(ref)
        rows = blk.select(["conv_id", "turn_idx"]).to_pylist()
        for a, b in zip(rows, rows[1:]):
            if (
                a["conv_id"] == b["conv_id"]
                and a["turn_idx"] // salt_block == b["turn_idx"] // salt_block
            ):
                assert a["turn_idx"] <= b["turn_idx"]
                seen_any = True
    assert seen_any


def test_extreme_skew_single_giant_conversation():
    """One conversation with ~100x the median turns: every strategy seals it
    identically (the north_rule skew case)."""
    import pyarrow as pa

    normal = F.gen_transcripts(30, seed=21)
    giant_rows = F.gen_conversation(99, 0, mean_turns=600)
    for i, r in enumerate(giant_rows):
        r["conv_id"] = "conv-giant"
    t = pa.concat_tables([normal, F.rows_to_table(giant_rows)])
    by_sort = dataset_to_sorted_table(build_pipeline(t, seal_strategy="sort"))
    by_salted = dataset_to_sorted_table(
        build_pipeline(t, seal_strategy="groupby", hot_threshold=50, salt_block=64)
    )
    assert_tables_equal(by_sort, by_salted)
    giant_n = sum(1 for c in by_sort.column("conv_id").to_pylist() if c == "conv-giant")
    assert giant_n == len(giant_rows) > 100  # ~20-100x the ~6-turn median
