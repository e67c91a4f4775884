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
