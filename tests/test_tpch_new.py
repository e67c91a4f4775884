"""Shard-count invariance for the round-5 TPC-H shapes: every shard-merge
kernel must combine cross-block partials correctly, so changing num_shards
(which re-deals every key to a different group composition) must not change
a single output value.  Value correctness vs DuckDB is the oracle gate's
job (tools/check_queries.py); this pins the distributed-combine algebra."""

import pyarrow as pa

from invoice_extraction_ray.ops import relational

SF = "/root/testdata/sf0.001"


def _eq(a: pa.Table, b: pa.Table) -> None:
    assert a.schema.equals(b.schema)
    assert a.num_rows == b.num_rows
    assert a.to_pydict() == b.to_pydict()


def test_late_shipment_orders_shard_invariant(ray_session):
    _eq(
        relational.late_shipment_orders(SF),
        relational.late_shipment_orders(SF, num_shards=3),
    )


def test_nation_profit_shard_invariant(ray_session):
    _eq(
        relational.nation_profit(SF),
        relational.nation_profit(SF, num_shards=3),
    )


def test_dominant_part_suppliers_shard_invariant(ray_session):
    _eq(
        relational.dominant_part_suppliers(SF),
        relational.dominant_part_suppliers(SF, num_shards=3),
    )


def test_tax_band_priority_shard_invariant(ray_session):
    _eq(
        relational.tax_band_priority(SF),
        relational.tax_band_priority(SF, num_shards=3),
    )


def test_discounted_revenue_counts_consistent(ray_session):
    # Q6 has no shards (pure per-batch partials); pin the internal
    # consistency instead: revenue is 0 iff no rows matched.
    t = relational.discounted_revenue(SF)
    assert t.num_rows == 1
    assert t.column("n_rows")[0].as_py() > 0
    assert t.column("revenue_i")[0].as_py() > 0
