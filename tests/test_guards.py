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


def test_assoc_rules_wide_partkey_raises(tmp_path, ray_session):
    from invoice_extraction_ray.ops.relational import assoc_rules

    li = pa.table(
        {
            "l_orderkey": pa.array([1, 1], pa.int64()),
            "l_partkey": pa.array([1 << 21, 3], pa.int64()),  # >= 2^21
        }
    )
    with pytest.raises(Exception, match="assoc_rules: partkey"):
        assoc_rules(_write_sf(tmp_path, lineitem=li))


def test_assoc_rules_wide_orderkey_raises(tmp_path, ray_session):
    from invoice_extraction_ray.ops.relational import assoc_rules

    li = pa.table(
        {
            "l_orderkey": pa.array([1 << 42, 1 << 42], pa.int64()),  # >= 2^42
            "l_partkey": pa.array([1, 3], pa.int64()),
        }
    )
    with pytest.raises(Exception, match="assoc_rules: orderkey"):
        assoc_rules(_write_sf(tmp_path, lineitem=li))


def test_value_band_pairs_wide_user_raises(tmp_path, ray_session):
    from invoice_extraction_ray.ops.relational import value_band_pairs

    ev = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "user_id": pa.array([1 << 30, 1], pa.int64()),  # >= 2^30
            "event_type": pa.array(["click", "purchase"], pa.string()),
            "value": pa.array([1.0, 1.5]),
        }
    )
    with pytest.raises(Exception, match="value_band_pairs: user_id"):
        value_band_pairs(_write_sf(tmp_path, events=ev)).materialize()


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


def test_copurchase_wide_orderkey_raises(tmp_path, ray_session):
    li = pa.table(
        {
            "l_orderkey": pa.array([1 << 42, 1 << 42], pa.int64()),  # >= 2^42
            "l_partkey": pa.array([1, 3], pa.int64()),
        }
    )
    from invoice_extraction_ray.ops.relational import copurchase_pairs

    with pytest.raises(Exception, match="copurchase_pairs: orderkey"):
        copurchase_pairs(_write_sf(tmp_path, lineitem=li)).materialize()


def test_triangles_wide_keys_raise(tmp_path, ray_session):
    from invoice_extraction_ray.ops.graph import copurchase_triangles

    wide_part = pa.table(
        {
            "l_orderkey": pa.array([1, 1], pa.int64()),
            "l_partkey": pa.array([1 << 21, 3], pa.int64()),
        }
    )
    with pytest.raises(Exception, match="copurchase_triangles: partkey"):
        copurchase_triangles(_write_sf(tmp_path, lineitem=wide_part))
    wide_order = pa.table(
        {
            "l_orderkey": pa.array([1 << 42, 1 << 42], pa.int64()),
            "l_partkey": pa.array([1, 3], pa.int64()),
        }
    )
    d2 = tmp_path / "sf2"
    d2.mkdir()
    pq.write_table(wide_order, str(d2 / "lineitem.parquet"))
    with pytest.raises(Exception, match="copurchase_triangles: orderkey"):
        copurchase_triangles(str(d2))


def test_dq_report_wide_linenumber_raises(tmp_path, ray_session):
    li = pa.table(
        {
            "l_orderkey": pa.array([1], pa.int64()),
            "l_linenumber": pa.array([9], pa.int32()),  # >= 8: pack-corrupting
            "l_quantity": pa.array([1.0]),
            "l_extendedprice": pa.array([10.0]),
            "l_discount": pa.array([0.05]),
        }
    )
    from invoice_extraction_ray.ops.relational import data_quality_report

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(li, str(d / "lineitem.parquet"))
    pq.write_table(
        pa.table({"o_orderkey": pa.array([1], pa.int64())}),
        str(d / "orders.parquet"),
    )
    with pytest.raises(Exception, match="data_quality_report"):
        data_quality_report(str(d))


def test_doc_skyline_wide_axis_raises(tmp_path, ray_session):
    docs = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["one two"], pa.string()),
            "n_chars": pa.array([1 << 21], pa.int64()),  # >= 2^21
        }
    )
    from invoice_extraction_ray.ops.relational import doc_skyline

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))
    with pytest.raises(Exception, match="doc_skyline"):
        doc_skyline(str(d))


def test_user_gap_fill_wide_day_raises(tmp_path, ray_session):
    ev = pa.table(
        {
            "user_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(
                [(1 << 20) * 86_400_000_000, 0], pa.int64()
            ).cast(pa.timestamp("us")),
            "value": pa.array([1.0, 2.0], pa.float64()),
        }
    )
    from invoice_extraction_ray.ops.window import user_gap_fill

    with pytest.raises(Exception, match="pack width"):
        user_gap_fill(_write_sf(tmp_path, events=ev)).materialize()


def test_user_gap_fill_wide_user_raises(tmp_path, ray_session):
    ev = pa.table(
        {
            "user_id": pa.array([1 << 43, 2], pa.int64()),
            "ts": pa.array([0, 86_400_000_000], pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array([1.0, 2.0], pa.float64()),
        }
    )
    from invoice_extraction_ray.ops.window import user_gap_fill

    with pytest.raises(Exception, match="pack width"):
        user_gap_fill(_write_sf(tmp_path, events=ev)).materialize()


def test_zorder_wide_axis_raises(tmp_path, ray_session, monkeypatch):
    monkeypatch.setenv("IER_ZORDER_CACHE", str(tmp_path / "zc"))
    ev = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([0, 86_400_000_000], pa.int64()).cast(pa.timestamp("us")),
            "user_id": pa.array([1 << 31, 2], pa.int64()),
            "value": pa.array([1.0, 2.0], pa.float64()),
        }
    )
    from invoice_extraction_ray.ops.relational import zorder_layout

    with pytest.raises(Exception, match="Morton axis"):
        zorder_layout(_write_sf(tmp_path, events=ev))


def test_bfs_hops_wide_partkey_raises(tmp_path, ray_session):
    li = pa.table(
        {
            "l_partkey": pa.array([1 << 20, 5], pa.int64()),
            "l_suppkey": pa.array([1, 2], pa.int64()),
        }
    )
    from invoice_extraction_ray.ops.graph import bfs_hops

    with pytest.raises(Exception, match="bfs_hops: part/supp keys"):
        bfs_hops(_write_sf(tmp_path, lineitem=li)).materialize()
