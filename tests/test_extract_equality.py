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


def test_flat_output_matches_projection(corpus, oracle_table):
    # projection pushdown (flat_only classifier) must equal the full
    # pipeline's flat projection byte-for-byte
    ds = build_pipeline(corpus, hot_threshold=50, flat_output=True)
    actual = dataset_to_sorted_table(ds)
    expected = oracle_table.select(
        ["conv_id", "turn_idx", "extracted_text", "confidence", "notes"]
    )
    assert_tables_equal(expected, actual)


def test_task_compute_matches_oracle(corpus, oracle_table):
    # compute="task" (per-worker-process cached classifier, fused with the
    # read) must be byte-identical to the actor-pool mode in both output
    # shapes
    ds = build_pipeline(corpus, hot_threshold=50, compute="task")
    assert_tables_equal(oracle_table, dataset_to_sorted_table(ds))
    flat = build_pipeline(corpus, hot_threshold=50, compute="task", flat_output=True)
    expected = oracle_table.select(
        ["conv_id", "turn_idx", "extracted_text", "confidence", "notes"]
    )
    assert_tables_equal(expected, dataset_to_sorted_table(flat))


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


def test_concurrency_invariance(corpus, oracle_table):
    """Parallelism invariance (FIXTURES.md §invariance 2, in-session proxy):
    identical output with a 1-actor pool and a 3-actor pool."""
    one = build_pipeline(corpus, concurrency=1, hot_threshold=50)
    three = build_pipeline(corpus, concurrency=3, batch_size=128, hot_threshold=50)
    assert_tables_equal(oracle_table, dataset_to_sorted_table(one))
    assert_tables_equal(oracle_table, dataset_to_sorted_table(three))


def test_metric_tables_match_oracle(corpus):
    """F4 golden aggregates: field coverage, error categories, severity
    rollup, confidence bins — engine groupbys vs brute-force over the
    oracle's output rows."""
    from collections import Counter

    from invoice_extraction_ray.pipelines import metrics as M

    rows = corpus.to_pylist()
    oracle_out = O.extract_table(rows)

    def flags(fields):
        return {
            "entity": fields["entity"] is not None,
            "code": fields["code"] is not None,
            "power": fields["power"] is not None,
            "amount": fields["amount"] is not None,
            "region_a": bool(fields["region_a"]["present"]),
            "region_b": bool(fields["region_b"]["present"]),
        }

    ds = build_pipeline(corpus, seal=False)

    # --- A1 field coverage
    cov = {r["field"]: r for r in M.field_coverage(ds).to_pylist()}
    for name in M.FIELD_NAMES:
        expected_n = sum(flags(o["fields"])[name] for o in oracle_out)
        assert cov[name]["n_filled"] == expected_n
        assert cov[name]["total"] == len(oracle_out)

    # --- A2 error categories (deterministic 8-category rule set)
    def categories(o):
        f = flags(o["fields"])
        cats = []
        missing = 0
        for n2, cat in (
            ("entity", "missing_entity"),
            ("code", "missing_code"),
            ("power", "missing_power"),
            ("amount", "missing_amount"),
        ):
            if not f[n2]:
                cats.append(cat)
                missing += 1
        if not f["region_a"]:
            cats.append("no_region_a")
        if o["confidence"] < M.LOW_CONFIDENCE_THRESHOLD:
            cats.append("low_confidence")
        if 1 <= missing <= 3:
            cats.append("partial_extraction")
        if o["extracted_text"] == "":
            cats.append("empty_turn")
        return cats

    expected_counts = Counter(c for o in oracle_out for c in categories(o))
    got_counts = {
        r["category"]: r["n"] for r in M.error_categories(ds).take_all()
    }
    assert got_counts == dict(expected_counts)

    # --- A3 severity rollup
    expected_sev = Counter(
        M.SEVERITY_OF[c] for o in oracle_out for c in categories(o)
    )
    got_sev = {r["severity"]: r["n"] for r in M.severity_rollup(ds).take_all()}
    assert got_sev == dict(expected_sev)

    # --- A4 confidence bins
    def bin_of(c):
        for edge, name in zip(M.CONF_BIN_EDGES, ("q1_lt25", "q2_lt50", "q3_lt75")):
            if c < edge:
                return name
        return "q4_ge75"

    expected_bins = Counter(bin_of(o["confidence"]) for o in oracle_out)
    got_bins = {r["bin"]: r["n"] for r in M.confidence_bins(ds).take_all()}
    assert got_bins == dict(expected_bins)
