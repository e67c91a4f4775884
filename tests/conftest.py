import pyarrow as pa
import pytest
import ray

from invoice_extraction_ray import config as C


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


def oracle_rows_to_table(oracle_rows: list[dict]) -> pa.Table:
    cols = {
        k: [r[k] for r in oracle_rows]
        for k in ("conv_id", "turn_idx", "extracted_text", "spans", "fields", "confidence", "notes")
    }
    return pa.Table.from_pydict(cols, schema=C.output_schema())


def dataset_to_sorted_table(ds) -> pa.Table:
    tables = [ray.get(ref) for ref in ds.to_arrow_refs()]
    tables = [t for t in tables if t.num_rows]
    t = pa.concat_tables(tables, promote_options="permissive")
    return t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def assert_tables_equal(expected: pa.Table, actual: pa.Table):
    assert expected.num_rows == actual.num_rows, (
        f"row count {expected.num_rows} != {actual.num_rows}"
    )
    assert set(expected.column_names) == set(actual.column_names)
    for name in expected.column_names:
        a = expected.column(name).combine_chunks()
        b = actual.column(name).cast(expected.column(name).type).combine_chunks()
        if a.equals(b):
            continue
        for i in range(len(a)):
            av, bv = a[i].as_py(), b[i].as_py()
            assert av == bv, (
                f"column {name} row {i} "
                f"({expected.column('conv_id')[i].as_py()},"
                f"{expected.column('turn_idx')[i].as_py()}):\n"
                f" expected={av!r}\n actual={bv!r}"
            )
        raise AssertionError(f"column {name}: chunk-level mismatch with equal values?")
