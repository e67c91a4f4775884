"""Broadcast-vs-sharded auto-dispatch equivalence for the dimension-join
family (VERDICT r4 item 1): each query must produce IDENTICAL rows whether
the dimension is driver-collected + ray.put broadcast (small-dim fast path)
or kept distributed via join-free shard message passing (``dim_cap=0``
forces the fallback the metadata guard would pick past 5M dimension rows).
"""

import pandas as pd
import pytest

from invoice_extraction_ray.ops import relational

SF = "/root/testdata/sf0.001"


def _frame(ds, sort_cols):
    df = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
    return df.sort_values(sort_cols).reset_index(drop=True)


@pytest.mark.parametrize(
    "fn,sort_cols",
    [
        (relational.brand_revenue, ["p_brand"]),
        (relational.orders_by_segment, ["c_mktsegment"]),
        (relational.nation_revenue, ["n_name"]),
        (relational.small_quantity_revenue, ["p_brand"]),
        (relational.top_revenue_orders, ["o_orderkey"]),
        (relational.segment_top_orders, ["c_mktsegment", "o_orderkey"]),
    ],
    ids=lambda x: getattr(x, "__name__", str(x)),
)
def test_broadcast_and_sharded_paths_agree(fn, sort_cols):
    fast = _frame(fn(SF), sort_cols)
    forced = _frame(fn(SF, dim_cap=0), sort_cols)
    forced = forced[fast.columns]
    pd.testing.assert_frame_equal(fast, forced, check_dtype=False)
    assert len(fast) > 0
