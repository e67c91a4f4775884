"""Loud-failure guards: bit-pack width asserts (pagerank, copurchase_pairs)
and the value_moments int64 square-sum bound must RAISE on out-of-shape
data instead of silently corrupting results (VERDICT r4 items 2/ADVICE)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_sf(tmp_path, lineitem=None, events=None):
    d = tmp_path / "sf"
    d.mkdir()
    if lineitem is not None:
        pq.write_table(lineitem, str(d / "lineitem.parquet"))
    if events is not None:
        pq.write_table(events, str(d / "events.parquet"))
    return str(d)


def test_pagerank_wide_partkey_raises(tmp_path, ray_session):
    li = pa.table(
        {
            "l_partkey": pa.array([1 << 20, 5], pa.int64()),  # >= 2^20
            "l_suppkey": pa.array([1, 2], pa.int64()),
        }
    )
    from invoice_extraction_ray.ops.graph import pagerank

    with pytest.raises(Exception, match="pagerank: part/supp keys"):
        pagerank(_write_sf(tmp_path, lineitem=li)).materialize()


def test_pagerank_in_range_keys_ok(tmp_path, ray_session):
    li = pa.table(
        {
            "l_partkey": pa.array([1, 1, 2], pa.int64()),
            "l_suppkey": pa.array([1, 2, 1], pa.int64()),
        }
    )
    from invoice_extraction_ray.ops.graph import pagerank

    out = pagerank(_write_sf(tmp_path, lineitem=li)).take_all()
    # 2 parts + 2 suppliers, every vertex ranked
    assert len(out) == 4
    assert all(r["rank_ppm"] > 0 for r in out)


def test_copurchase_wide_partkey_raises(tmp_path, ray_session):
    li = pa.table(
        {
            "l_orderkey": pa.array([1, 1], pa.int64()),
            "l_partkey": pa.array([1 << 21, 3], pa.int64()),  # >= 2^21
        }
    )
    from invoice_extraction_ray.ops.relational import copurchase_pairs

    with pytest.raises(Exception, match="copurchase_pairs: partkey"):
        copurchase_pairs(_write_sf(tmp_path, lineitem=li)).materialize()


def test_value_moments_wide_cents_raises(tmp_path, ray_session):
    ev = pa.table(
        {
            "event_type": pa.array(["click"], pa.string()),
            "value": pa.array([float(1 << 23) / 100.0 + 10.0]),  # cents >= 2^23
        }
    )
    from invoice_extraction_ray.ops.sketch import value_moments

    with pytest.raises(Exception, match="value_moments"):
        value_moments(_write_sf(tmp_path, events=ev))
