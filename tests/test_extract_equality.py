"""The correctness gate: Ray pipeline output == pure-Python oracle, byte for
byte, after stable (conv_id, turn_idx) ordering (BASELINE.json north_rule)."""

import pytest

from invoice_extraction_ray import fixtures as F
from invoice_extraction_ray import oracle as O
from invoice_extraction_ray.pipelines.extract import build_pipeline

from .conftest import assert_tables_equal, dataset_to_sorted_table, oracle_rows_to_table

N_CONVS = 300
SEED = 42


@pytest.fixture(scope="module")
def corpus():
    return F.gen_transcripts(N_CONVS, seed=SEED)


@pytest.fixture(scope="module")
def oracle_table(corpus):
    rows = corpus.to_pylist()
    return oracle_rows_to_table(O.extract_table(rows))


def test_pipeline_matches_oracle(corpus, oracle_table):
    ds = build_pipeline(corpus, hot_threshold=50)
    actual = dataset_to_sorted_table(ds)
    assert_tables_equal(oracle_table, actual)


def test_permutation_invariance(corpus, oracle_table):
    # a differently-shuffled copy of the same logical rows -> identical output
    reshuffled = F.gen_transcripts(N_CONVS, seed=SEED, shuffle=False)
    ds = build_pipeline(reshuffled, hot_threshold=50)
    assert_tables_equal(oracle_table, dataset_to_sorted_table(ds))


def test_batch_size_invariance(corpus, oracle_table):
    ds = build_pipeline(corpus, batch_size=64, hot_threshold=50)
    assert_tables_equal(oracle_table, dataset_to_sorted_table(ds))


def test_null_and_empty_turns(corpus):
    ds = build_pipeline(corpus, seal=False)
    out = dataset_to_sorted_table(ds)
    by_key = {
        (r["conv_id"], r["turn_idx"]): r["extracted_text"] for r in out.to_pylist()
    }
    for r in corpus.to_pylist():
        if r["text"] is None or r["text"] == "":
            assert by_key[(r["conv_id"], r["turn_idx"])] == ""


def test_parquet_roundtrip(tmp_path, oracle_table):
    paths = F.write_transcripts_parquet(
        str(tmp_path / "in"), N_CONVS, convs_per_file=100, seed=SEED
    )
    ds = build_pipeline(paths, hot_threshold=50)
    assert_tables_equal(oracle_table, dataset_to_sorted_table(ds))


def test_consensus_matches_oracle(corpus, oracle_table):
    """E16/A6/E17: engine consensus stage == oracle.consensus_turn exactly
    (final_confidence bitwise after fixed rounding, anomalies string)."""
    from invoice_extraction_ray.stages.consensus import consensus_batch

    ds = build_pipeline(corpus, seal=False).map_batches(
        consensus_batch, batch_format="pyarrow"
    )
    got = {
        (r["conv_id"], r["turn_idx"]): (r["final_confidence"], r["anomalies"])
        for r in ds.select_columns(
            ["conv_id", "turn_idx", "final_confidence", "anomalies"]
        ).take_all()
    }
    rows = corpus.to_pylist()
    oracle_out = O.extract_table(rows)
    assert len(got) == len(oracle_out)
    n_anom = n_boosted = 0
    for orow in oracle_out:
        c = O.consensus_turn(orow)
        key = (orow["conv_id"], orow["turn_idx"])
        assert got[key] == (c["final_confidence"], c["anomalies"]), key
        n_anom += bool(c["anomalies"])
        n_boosted += c["final_confidence"] > 0.5
    # the fixture corpus must actually exercise both code paths
    assert n_anom > 0 and n_boosted > 0
