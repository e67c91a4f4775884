"""Fixture generator determinism + schema (FIXTURES.md F1/F2)."""

import pyarrow as pa

from invoice_extraction_ray import config as C
from invoice_extraction_ray import fixtures as F


def test_schema_matches_input_hint():
    t = F.gen_transcripts(20, seed=7)
    assert t.schema.equals(C.input_schema())
    assert t.column("ts").type == pa.timestamp("us")


def test_generation_is_deterministic():
    a = F.gen_transcripts(50, seed=123)
    b = F.gen_transcripts(50, seed=123)
    assert a.equals(b)


def test_conversation_independent_of_batching():
    # conversation content is a pure function of (seed, conv_index)
    solo = F.gen_conversation(42, 7)
    in_bulk = [r for r in F.gen_transcripts(20, seed=42, shuffle=False).to_pylist()
               if r["conv_id"] == "conv-00000007"]
    in_bulk.sort(key=lambda r: r["turn_idx"])
    assert [r["text"] for r in solo] == [r["text"] for r in in_bulk]


def test_skew_and_nulls_present():
    t = F.gen_transcripts(400, seed=42)
    counts = {}
    for c in t.column("conv_id").to_pylist():
        counts[c] = counts.get(c, 0) + 1
    sizes = sorted(counts.values())
    assert sizes[-1] > 10 * sizes[len(sizes) // 2], "expect Zipfian hot conversations"
    texts = t.column("text").to_pylist()
    assert any(x is None for x in texts)
    assert any(x == "" for x in texts)


def test_shard_writer_deterministic(tmp_path):
    p1 = F.write_transcripts_parquet(str(tmp_path / "a"), 30, convs_per_file=10, seed=9)
    p2 = F.write_transcripts_parquet(str(tmp_path / "b"), 30, convs_per_file=10, seed=9)
    import pyarrow.parquet as pq

    for f1, f2 in zip(p1, p2):
        assert pq.read_table(f1).equals(pq.read_table(f2))
    assert len(p1) == 3
