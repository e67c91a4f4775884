"""segment_top_orders census kernels + value_concentration boundary.

The census partial's associativity proof (global top-k distinct prices
survive EVERY batch-local truncation with full counts) is the whole
correctness argument — exercise it under adversarial batchings, and pin
the RANK() tie semantics (ties straddling K all surface; strictly-greater
row count decides, not row position).
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from invoice_extraction_ray.ops import relational
from invoice_extraction_ray.ops.relational import _census_keep, _seg_price_census


def _census_of(segs, prices, k):
    return _seg_price_census(
        pa.array(segs, pa.string()),
        np.asarray(prices, np.int64),
        np.ones(len(prices), np.int64),
        k,
    )


def _finish(parts, k):
    merged = pa.concat_tables(parts)
    out = {}
    for seg in set(merged.column("seg").to_pylist()):
        g = merged.filter(pa.compute.equal(merged.column("seg"), pa.scalar(seg)))
        f = _census_keep(g, k)
        out[seg] = dict(
            zip(f.column("price_c").to_pylist(), f.column("rnk").to_pylist())
        )
    return out


def _rank_oracle(segs, prices, k):
    out = {}
    bys = {}
    for s, p in zip(segs, prices):
        bys.setdefault(s, []).append(p)
    for s, ps in bys.items():
        arr = np.asarray(ps, np.int64)
        out[s] = {
            int(p): int((arr > p).sum()) + 1
            for p in np.unique(arr)
            if (arr > p).sum() <= k - 1
        }
    return out


def test_census_split_invariance():
    rng = np.random.default_rng(7)
    n, k = 3000, 5
    segs = rng.choice(["A", "B", "C"], n).tolist()
    # heavy ties: few distinct values so tie groups straddle k
    prices = rng.integers(100, 130, n).tolist()
    want = _rank_oracle(segs, prices, k)
    for cuts in ([n], [1, n // 7, n // 2, n], [3, 4, 5, 6, n]):
        parts, lo = [], 0
        for hi in cuts:
            parts.append(_census_of(segs[lo:hi], prices[lo:hi], k))
            lo = hi
        assert _finish(parts, k) == want


def test_rank_ties_straddle_k():
    # prices [10,10,10,9]: rank(10)=1 (three rows), rank(9)=4 > k=2 — the
    # three tied rows ALL surface even though k=2
    got = _finish([_census_of(["A"] * 4, [10, 10, 10, 9], 2)], 2)
    assert got == {"A": {10: 1}}
    # [10,9,9,8] k=2: rank(9)=2, both 9s surface; 8 has two greater rows
    got = _finish([_census_of(["A"] * 4, [10, 9, 9, 8], 2)], 2)
    assert got == {"A": {10: 1, 9: 2}}


@pytest.fixture()
def tiny_sf(tmp_path):
    # one dominant supplier (>ppm of total), one EXACTLY at the fraction
    # boundary (must be excluded: strict >), the rest dust
    ppm = 1000  # config.Q11_FRACTION_PPM
    rows = {"l_suppkey": [], "l_extendedprice": [], "l_discount": []}
    # total cents = 1_000_000 so boundary supplier holds exactly 1000 ppm
    parts = [(1, 900_000), (2, 1_000), (3, 99_000)]
    for sk, cents in parts:
        rows["l_suppkey"].append(sk)
        rows["l_extendedprice"].append(cents / 100.0)
        rows["l_discount"].append(0.0)
    pq.write_table(pa.table(rows), str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def test_value_concentration_strict_boundary(ray_session, tiny_sf):
    out = relational.value_concentration(tiny_sf)
    got = list(
        zip(out.column("l_suppkey").to_pylist(), out.column("value_i").to_pylist())
    )
    # supplier 2 holds EXACTLY Q11_FRACTION_PPM of the total -> excluded
    assert got == [(1, 900_000 * 10000), (3, 99_000 * 10000)]
