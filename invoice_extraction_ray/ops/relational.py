"""Generic relational operator library over the testdata tables.

Each function takes ``sf_dir`` (a /root/testdata/sf* directory) and returns a
lazy ``ray.data.Dataset`` (or a small pyarrow Table for global aggregates).
Every function here has a DuckDB oracle in ``__ray_entry__.oracle_sql()`` —
the driver's correctness gate — and maps to a SURVEY.md §2 operator family
(noted per function).

Scale discipline (SURVEY.md §4, ray_guide):
- column pruning at the read (``read_parquet(columns=...)``)
- vectorized Arrow kernels inside ``map_batches`` — no per-row Python in hot paths
- partial aggregation before every groupby where the key space is small
- broadcast (``ray.put`` / closure capture) for small sides instead of shuffles
- ``Dataset.join`` (hash-partitioned) only when both sides are genuinely large
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Std, Sum

from ..config import BROADCAST_DIM_MAX_ROWS
from ._util import drop_if_present as _dropg


def _pq(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def _read_sized(
    sf_dir: str,
    name: str,
    columns: list[str],
    filter=None,  # noqa: A002 — mirrors read_parquet's kwarg
    rows_per_block: int = 131072,
):
    """``read_parquet`` with the block count sized from the parquet FOOTER
    row count (no data read): Ray over-splits small single-file tables
    into ~hundreds-of-row blocks whose per-read-task dispatch (~15 ms)
    dwarfs the scan — a 20k-row dimension read measured 1.6 s over-split
    vs 0.1 s sized.  Scales naturally: a 100-TB table still gets
    rows/131072 blocks."""
    from ._util import parquet_num_rows, strip_schema_metadata

    path = _pq(sf_dir, name)
    nb = max(1, parquet_num_rows(path) // rows_per_block)
    kw = {"columns": columns, "override_num_blocks": nb}
    if filter is not None:
        kw["filter"] = filter
    return strip_schema_metadata(ray.data.read_parquet(path, **kw))


def _safe_isum(a) -> int:
    """Exact int64-safe sum of a non-negative int64 array: when the cheap
    ``max * n`` bound says the numpy int64 accumulator COULD wrap, redo the
    sum in arbitrary-precision python ints; if even the exact sum exceeds
    int64 (the emitted partial column's width), raise loudly — the fix is
    more shards, never a silently wrapped revenue."""
    n = len(a)
    if n == 0:
        return 0
    if int(a.max()) <= (2**63 - 1) // n:
        return int(a.sum())
    s = sum(int(x) for x in a)
    if s >= 2**63:
        raise ValueError(
            "per-shard int64 partial would overflow; increase num_shards"
        )
    return s


def _partial_groupby(
    keys: list[str], sums: list[str] | None = None, count_as: str | None = None
):
    """map_batches combiner: per-batch group sums/counts so the global
    groupby shuffles O(groups) partial rows per block instead of raw rows.
    Output columns keep the input sum-column names (+ ``count_as``)."""
    sums = sums or []

    def fn(t: pa.Table) -> pa.Table:
        aggs = [(c, "sum") for c in sums]
        if count_as:
            # count_all, NOT (key, "count"): the latter counts non-null key
            # values only, silently zeroing groups keyed by null (e.g. a
            # broadcast-lookup miss producing a null dimension value)
            aggs.append(([], "count_all"))
        g = t.group_by(keys).aggregate(aggs)
        cols = {k: g.column(k) for k in keys}
        for c in sums:
            cols[c] = g.column(f"{c}_sum")
        if count_as:
            cols[count_as] = pc.cast(g.column("count_all"), pa.int64())
        return pa.table(cols)

    return fn


def _fixed_point(ds, cols: dict[str, int]):
    """Convert float columns to fixed-point int64 (col -> scale, e.g. 100 =
    cents).  Fractional doubles rounded to N digits land on *adjacent* doubles
    depending on the engine (pc.round vs DuckDB ROUND), so value-hash
    comparison of float aggregates is unstable — integers are exact.  Round
    mode half_towards_infinity == DuckDB's ROUND (half away from zero)."""

    def fn(t: pa.Table) -> pa.Table:
        for c, scale in cols.items():
            i = t.column_names.index(c)
            v = pc.round(
                pc.multiply(pc.cast(t.column(c), pa.float64()), float(scale)),
                ndigits=0,
                round_mode="half_towards_infinity",
            )
            t = t.set_column(i, c, pc.cast(v, pa.int64()))
        return t

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# A1: global coverage summary (partial-per-batch + tiny final combine;
#     reference executable.py:155-181)
# ---------------------------------------------------------------------------


def coverage_summary(sf_dir: str) -> pa.Table:
    ds = ray.data.read_parquet(_pq(sf_dir, "documents"), columns=["text", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "total": pa.array([t.num_rows], pa.int64()),
                "n_text": pa.array([t.num_rows - t.column("text").null_count], pa.int64()),
                "sum_chars": pa.array(
                    [pc.sum(t.column("n_chars")).as_py() or 0], pa.int64()
                ),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    total = sum(p["total"] for p in parts)
    n_text = sum(p["n_text"] for p in parts)
    sum_chars = sum(p["sum_chars"] for p in parts)
    avg = int(sum_chars / total * 10_000 + 0.5) if total else 0
    return pa.table(
        {
            "total": pa.array([total], pa.int64()),
            "n_text": pa.array([n_text], pa.int64()),
            "avg_chars": pa.array([avg], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# A7: grouped stats (groupby + Mean/Std/Count; reference EDA notebook)
# ---------------------------------------------------------------------------


def groupby_stats(sf_dir: str) -> ray.data.Dataset:
    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        # mean-centered partials (n, sum, mean, M2 = ddof-0 variance * n) per
        # batch-group: M2 merges via Chan's pairwise update, which bounds the
        # catastrophic cancellation the raw sum-of-squares formula suffers on
        # large-n low-variance groups.  Shuffle still carries |groups|
        # rows/block.
        g = t.group_by(["event_type"]).aggregate(
            [
                ("value", "count"),
                ("value", "sum"),
                ("value", "mean"),
                ("value", "variance", pc.VarianceOptions(ddof=0)),
            ]
        )
        import numpy as np

        n = pc.cast(g.column("value_count"), pa.int64())
        var0 = g.column("value_variance").to_numpy(zero_copy_only=False)
        m2 = var0 * n.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "n": n,
                "s": g.column("value_sum"),
                "m": g.column("value_mean"),
                "m2": pa.array(np.nan_to_num(m2, nan=0.0), pa.float64()),
            }
        )

    def chan_merge(g: pa.Table) -> pa.Table:
        """One group = one event_type; fold the block partials with Chan's
        update in a DETERMINISTIC order (sorted by (n, m)) so the float
        result is run-invariant.  The fold length is the number of input
        blocks — trivial."""
        import numpy as np

        ns = g.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        ss = g.column("s").to_numpy(zero_copy_only=False)
        ms = g.column("m").to_numpy(zero_copy_only=False)
        m2s = g.column("m2").to_numpy(zero_copy_only=False)
        order = np.lexsort((ms, ns))
        N, M, M2 = 0, 0.0, 0.0
        for i in order:
            ni = int(ns[i])
            if ni == 0:
                continue
            delta = ms[i] - M
            tot = N + ni
            M2 = M2 + m2s[i] + delta * delta * (N * ni / tot)
            M = M + delta * (ni / tot)
            N = tot
        S = float(np.sort(ss).sum())  # exact-order-pinned sum for the output
        avg = S / N
        # sample std of a single-row group is NULL (stddev_samp semantics),
        # not 0.0 — mask n==1 to null so the DuckDB oracle agrees
        std = float(np.sqrt(max(M2, 0.0) / max(N - 1, 1)))
        return pa.table(
            {
                "event_type": g.column("event_type").slice(0, 1),
                "n": pa.array([N], pa.int64()),
                "sum_value": pa.array([S], pa.float64()),
                "avg_value": pa.array([avg], pa.float64()),
                "std_value": pa.array([std], pa.float64(), mask=np.array([N <= 1])),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(chan_merge, batch_format="pyarrow")
    )

    return _fixed_point(
        out,
        {"sum_value": 100, "avg_value": 10_000, "std_value": 10_000},
    )


# ---------------------------------------------------------------------------
# A3: dimension-lookup + severity rollup (reference error_analysis.py:159-200)
# ---------------------------------------------------------------------------

SEVERITY_MAP = {
    "error": "high",
    "purchase": "high",
    "signup": "medium",
    "click": "low",
    "view": "low",
}


def severity_rollup(sf_dir: str) -> ray.data.Dataset:
    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "value"])

    def add_sev(t: pa.Table) -> pa.Table:
        # tiny-dimension lookup, map-side (broadcast semantics; no shuffle)
        et = t.column("event_type")
        sev = pc.case_when(
            pc.make_struct(
                pc.is_in(et, value_set=pa.array(["error", "purchase"])),
                pc.is_in(et, value_set=pa.array(["signup"])),
            ),
            "high",
            "medium",
            "low",
        )
        return t.append_column("severity", sev)

    partial = _partial_groupby(["severity"], ["value"], "n")
    out = (
        ds.map_batches(lambda t: partial(add_sev(t)), batch_format="pyarrow")
        .groupby("severity")
        .aggregate(Sum("n", alias_name="n"), Sum("value", alias_name="sum_value"))
    )
    return _fixed_point(out, {"sum_value": 100})


# ---------------------------------------------------------------------------
# A4: bucketize + per-bin aggregate (reference error_analysis.py:288-335)
# ---------------------------------------------------------------------------

BIN_EDGES = [50.0, 100.0, 200.0]  # bins: <50, <100, <200, >=200


def value_bins(sf_dir: str) -> ray.data.Dataset:
    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["value"])

    def add_bin(t: pa.Table) -> pa.Table:
        v = t.column("value")
        b = pc.case_when(
            pc.make_struct(
                pc.less(v, BIN_EDGES[0]),
                pc.less(v, BIN_EDGES[1]),
                pc.less(v, BIN_EDGES[2]),
            ),
            "b0_lt50",
            "b1_lt100",
            "b2_lt200",
            "b3_ge200",
        )
        return t.append_column("bin", b)

    partial = _partial_groupby(["bin"], ["value"], "n")
    out = (
        ds.map_batches(lambda t: partial(add_bin(t)), batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"), Sum("value", alias_name="sum_value"))
    )

    def finish(t: pa.Table) -> pa.Table:
        avg = pc.divide(
            pc.cast(t.column("sum_value"), pa.float64()),
            pc.cast(t.column("n"), pa.float64()),
        )
        return pa.table(
            {"bin": t.column("bin"), "n": t.column("n"), "avg_value": avg}
        )

    return _fixed_point(out.map_batches(finish, batch_format="pyarrow"), {"avg_value": 10_000})


# ---------------------------------------------------------------------------
# A8/O3: top-k with deterministic tie-break (sort + limit)
# ---------------------------------------------------------------------------


def topk_docs(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    ds = ray.data.read_parquet(
        _pq(sf_dir, "documents"), columns=["doc_id", "n_chars", "lang"]
    )
    return ds.sort(["n_chars", "doc_id"], descending=[True, False]).limit(k)


# ---------------------------------------------------------------------------
# A8 variant: per-GROUP top-k (training-data curation: best docs per language)
# ---------------------------------------------------------------------------


def topk_docs_per_lang(sf_dir: str, k: int = 5) -> ray.data.Dataset:
    """Top-k documents per language by (n_chars desc, doc_id asc).

    Scale plan: each batch keeps only its own per-group top-k (vectorized
    sort + run-detection — a combiner, since the global top-k per group is a
    subset of the union of per-batch top-ks), then one tiny groupby over
    k x groups x blocks rows finishes per group."""
    import numpy as np

    ds = ray.data.read_parquet(
        _pq(sf_dir, "documents"), columns=["doc_id", "lang", "n_chars"]
    )

    def partial_topk(t: pa.Table) -> pa.Table:
        t = t.sort_by(
            [("lang", "ascending"), ("n_chars", "descending"), ("doc_id", "ascending")]
        )
        lang = t.column("lang").to_numpy(zero_copy_only=False)
        new_grp = np.ones(len(lang), dtype=bool)
        new_grp[1:] = lang[1:] != lang[:-1]
        # rank within group = index - index of group start
        starts = np.maximum.accumulate(np.where(new_grp, np.arange(len(lang)), 0))
        rank = np.arange(len(lang)) - starts
        return t.filter(pa.array(rank < k))

    def final_topk(t: pa.Table) -> pa.Table:
        t = t.sort_by([("n_chars", "descending"), ("doc_id", "ascending")])
        return t.slice(0, k)

    return (
        ds.map_batches(partial_topk, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(final_topk, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# M-layer + A1: filter -> computed column -> grouped aggregate (TPC-H Q1 shape)
# ---------------------------------------------------------------------------

Q6_CUTOFF = "1997-01-01"


def pricing_summary(sf_dir: str) -> ray.data.Dataset:
    ds = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )
    cutoff = pa.scalar(Q6_CUTOFF).cast(pa.timestamp("us"))

    keys = ["l_returnflag", "l_linestatus"]
    partial = _partial_groupby(
        keys, sums=["l_quantity", "l_extendedprice", "disc_price"], count_as="n"
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t.column("l_shipdate"), cutoff))
        disc = pc.multiply(
            t.column("l_extendedprice"), pc.subtract(1.0, t.column("l_discount"))
        )
        # combiner: each block contributes <= |groups| partial rows to the
        # shuffle (the sort-aggregate cost is driven by shuffled row count)
        return partial(t.append_column("disc_price", disc))

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(keys)
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Sum("n", alias_name="n"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        avg = pc.divide(
            pc.cast(t.column("sum_qty"), pa.float64()),
            pc.cast(t.column("n"), pa.float64()),
        )
        return t.append_column("avg_qty", avg)

    return _fixed_point(
        out.map_batches(finish, batch_format="pyarrow"),
        {"sum_qty": 100, "sum_base_price": 100, "sum_disc_price": 100, "avg_qty": 10_000},
    )


# ---------------------------------------------------------------------------
# J1/J2: broadcast hash join (small dimension shipped once via ray.put;
#     reference validators.py:134-200 lookup-join semantics)
# ---------------------------------------------------------------------------


def _orders_by_segment_sharded(sf_dir: str, n_shards: int = 64) -> ray.data.Dataset:
    """Distributed fallback for :func:`orders_by_segment` past the customer
    broadcast cap: orders pre-combine (count, cents) per custkey per batch,
    the customer dimension rides the same custkey-shard stream, each shard
    maps key -> segment and pre-aggregates, and the final groupby sees
    <= n_shards x |segments| rows.  Integer cents (o_totalprice carries two
    decimals, so per-row cents are exact and the sum matches the float
    oracle wherever the oracle's own float64 sum is within half a cent)."""
    import numpy as np

    from ._util import absorb_empty_blocks, int_bincount, int_segment_sum

    _MERGED = pa.schema(
        [
            ("cshard", pa.int32()),
            ("ck", pa.int64()),
            ("n", pa.int64()),
            ("cents", pa.int64()),
            ("seg", pa.string()),
            ("side", pa.int8()),
        ]
    )

    def _shard_of(keys: "np.ndarray") -> "np.ndarray":
        return (((keys * 2654435761) % (1 << 32)) % n_shards).astype(np.int32)

    def cust_rows(t: pa.Table) -> pa.Table:
        ck = t.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ck)
        return pa.table(
            {
                "cshard": pa.array(_shard_of(ck)),
                "ck": pa.array(ck, pa.int64()),
                "n": pa.array(np.zeros(n, np.int64), pa.int64()),
                "cents": pa.array(np.zeros(n, np.int64), pa.int64()),
                "seg": t.column("c_mktsegment").cast(pa.string()),
                "side": pa.array(np.ones(n, np.int8), pa.int8()),
            },
            schema=_MERGED,
        )

    def ord_partial(t: pa.Table) -> pa.Table:
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.floor(
            t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        order = np.argsort(ck, kind="stable")
        ck, cents = ck[order], cents[order]
        new = np.ones(len(ck), dtype=bool)
        new[1:] = ck[1:] != ck[:-1]
        starts = np.flatnonzero(new)
        uck = ck[starts]
        n = len(uck)
        return pa.table(
            {
                "cshard": pa.array(_shard_of(uck)),
                "ck": pa.array(uck, pa.int64()),
                "n": pa.array(
                    int_segment_sum(np.ones(len(ck), np.int64), starts), pa.int64()
                ),
                "cents": pa.array(int_segment_sum(cents, starts), pa.int64()),
                "seg": pa.nulls(n, pa.string()),
                "side": pa.array(np.zeros(n, np.int8), pa.int8()),
            },
            schema=_MERGED,
        )

    _PART = pa.schema(
        [
            ("c_mktsegment", pa.string()),
            ("n_orders", pa.int64()),
            ("sum_totalprice", pa.int64()),
        ]
    )

    def merge_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _PART.empty_table()
        side = g.column("side").to_numpy(zero_copy_only=False)
        ck = g.column("ck").to_numpy(zero_copy_only=False)
        bmask = side == 1
        bkey = ck[bmask]
        if len(bkey) == 0:
            return _PART.empty_table()
        seg = g.column("seg").combine_chunks().filter(pa.array(bmask))
        order = np.argsort(bkey, kind="stable")
        bkey = bkey[order]
        seg = pc.take(seg, pa.array(order))
        fmask = ~bmask
        fk = ck[fmask]
        fn = g.column("n").to_numpy(zero_copy_only=False)[fmask]
        fc = g.column("cents").to_numpy(zero_copy_only=False)[fmask]
        pos = np.searchsorted(bkey, fk)
        hit = (pos < len(bkey)) & (bkey[np.minimum(pos, len(bkey) - 1)] == fk)
        enc = pc.take(seg, pa.array(pos[hit])).dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(enc.dictionary)
        return pa.table(
            {
                "c_mktsegment": enc.dictionary,
                "n_orders": pa.array(int_bincount(idx, fn[hit], minlength=k)),
                "sum_totalprice": pa.array(int_bincount(idx, fc[hit], minlength=k)),
            },
            schema=_PART,
        )

    orders = ray.data.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"]
    ).map_batches(ord_partial, batch_format="pyarrow")
    cust = ray.data.read_parquet(
        _pq(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    ).map_batches(cust_rows, batch_format="pyarrow")
    return (
        absorb_empty_blocks(orders.union(cust), batch_size=131072)
        .groupby("cshard")
        .map_groups(
            lambda g: merge_shard(_dropg(g, ["cshard"])),
            batch_format="pyarrow",
        )
        .groupby("c_mktsegment")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("sum_totalprice", alias_name="sum_totalprice"),
        )
    )


def orders_by_segment(
    sf_dir: str, dim_cap: int = BROADCAST_DIM_MAX_ROWS
) -> ray.data.Dataset:
    import pyarrow.parquet as pq

    from ._util import parquet_num_rows

    # customer scales WITH the corpus: past the broadcast cap (parquet
    # footer row count — no data read) dispatch to the join-free shard
    # fallback, pytest-equated to this path.
    if parquet_num_rows(_pq(sf_dir, "customer")) > dim_cap:
        return _orders_by_segment_sharded(sf_dir)

    cust = pq.read_table(
        _pq(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    )
    # broadcast the dimension as Arrow arrays once; probe with one vectorized
    # index_in + take gather per batch (no per-row dict hashing)
    lookup_ref = ray.put(
        (
            cust.column("c_custkey").combine_chunks(),
            cust.column("c_mktsegment").combine_chunks(),
        )
    )

    partial = _partial_groupby(["c_mktsegment"], ["o_totalprice"], "n_orders")

    def segment_join(t: pa.Table) -> pa.Table:
        # stateless task map: the broadcast dimension is fetched per batch
        # from plasma (zero-copy shared memory on the node — one copy per
        # node, not per task), so no actor pool is needed and the probe
        # scales to every CPU with no pool-startup cost
        keys, vals = ray.get(lookup_ref)
        idx = pc.index_in(t.column("o_custkey"), value_set=keys)
        seg = pc.take(vals, idx)  # missing keys -> null, like dict.get
        return partial(t.append_column("c_mktsegment", seg))

    ds = ray.data.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"]
    )
    out = (
        ds.map_batches(segment_join, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("o_totalprice", alias_name="sum_totalprice"),
        )
    )
    return _fixed_point(out, {"sum_totalprice": 100})


# ---------------------------------------------------------------------------
# J-layer: large x large hash-partitioned join (Dataset.join)
# ---------------------------------------------------------------------------


def lineitem_order_priority(sf_dir: str, num_partitions: int = 16) -> ray.data.Dataset:
    from ._util import strip_schema_metadata

    li = strip_schema_metadata(
        ray.data.read_parquet(
            _pq(sf_dir, "lineitem"), columns=["l_orderkey", "l_extendedprice"]
        )
    )
    orders = strip_schema_metadata(
        ray.data.read_parquet(
            _pq(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority"]
        )
    )
    # Ray's hash-shuffle join aggregator errors on fully-empty inputs
    # (zero-block finalize) — an empty side means an empty inner join, so
    # short-circuit it (count() here is parquet-metadata, not a scan)
    if li.count() == 0 or orders.count() == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "o_orderpriority": pa.array([], pa.string()),
                    "n_items": pa.array([], pa.int64()),
                    "sum_price": pa.array([], pa.int64()),
                }
            )
        )
    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    out = joined.groupby("o_orderpriority").aggregate(
        Count(alias_name="n_items"), Sum("l_extendedprice", alias_name="sum_price")
    )
    return _fixed_point(out, {"sum_price": 100})


Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = __import__("datetime").datetime(1998, 7, 1)


def top_revenue_orders(
    sf_dir: str,
    k: int = 10,
    num_shards: int = 64,
    dim_cap: int = BROADCAST_DIM_MAX_ROWS,
) -> ray.data.Dataset:
    """TPC-H Q3 analogue: top-k unshipped orders by revenue for one market
    segment — the canonical dimension-filter -> fact-fact join -> top-k
    composition.

    Scale shape: the customer DIMENSION filters to the segment and only its
    distinct key set broadcasts (ray.put once, vectorized is_in probe —
    bounded by dimension cardinality, never the fact tables); orders and
    lineitem prune columns + push their date filters to the read; lineitem
    computes EXACT-INTEGER revenue per row (cents x (10000 - discount_bp),
    so no float-sum order dependence can split engine and oracle) and
    pre-combines per l_orderkey per batch.  The fact-fact join runs as
    JOIN-FREE groupby message passing (the neardup_clusters pattern): both
    sides union into one stream tagged by side, ONE coarse-int-shard groupby
    co-locates every row of an orderkey (a groupby on the fine-grained key
    would pay Ray's sort-aggregate per distinct key — measured 6x this
    query's wall; ``Dataset.join`` pays ~70ms per input block plus
    aggregator-actor startup — measured 9.3s remote wall), and each shard
    segment-sums the lineitem side and searchsorted-probes the orders side
    vectorized.  Sort/limit finishes on (revenue desc, orderkey asc).

    Customer scales WITH the corpus: past ``dim_cap`` (parquet footer row
    count, no data read) the segment filter runs as a custkey-shard SEMIJOIN
    instead of a driver-collected key broadcast — one extra all-to-all over
    the window orders only, nothing dimension-sized on the driver
    (pytest-equated to the broadcast path)."""
    import numpy as np

    from ._util import parquet_num_rows, strip_schema_metadata

    broadcast_dim = parquet_num_rows(_pq(sf_dir, "customer")) <= dim_cap
    if broadcast_dim:
        # dimension key set via a predicate-pushdown point read (row groups
        # whose stats exclude the segment are never decoded) — bounded by
        # DIMENSION cardinality, and ~3s cheaper than a Ray-side distinct
        # whose all-to-all constants dwarf a dimension-sized input
        import pyarrow.parquet as _pqm

        seg_tbl = _pqm.read_table(
            _pq(sf_dir, "customer"),
            columns=["c_custkey"],
            filters=[("c_mktsegment", "==", Q3_SEGMENT)],
        )
        key_ref = ray.put(pc.unique(seg_tbl.column("c_custkey").combine_chunks()))

    _MERGED = pa.schema(
        [
            ("oshard", pa.int32()),
            ("key", pa.int64()),
            ("rev_i", pa.int64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_orderpriority", pa.string()),
            ("side", pa.int8()),
        ]
    )

    def _shard_of(keys: "np.ndarray") -> "np.ndarray":
        return (((keys * 2654435761) % (1 << 32)) % num_shards).astype(np.int32)

    def _ord_rows(t: pa.Table) -> pa.Table:
        okey = t.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(okey)
        return pa.table(
            {
                "oshard": pa.array(_shard_of(okey)),
                "key": pa.array(okey, pa.int64()),
                "rev_i": pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
                "o_orderdate": t.column("o_orderdate").cast(pa.timestamp("us")),
                "o_orderpriority": t.column("o_orderpriority"),
                "side": pa.array(np.ones(n, dtype=np.int8), pa.int8()),
            },
            schema=_MERGED,
        )

    orders_raw = strip_schema_metadata(
        ray.data.read_parquet(
            _pq(sf_dir, "orders"),
            columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
            filter=(pc.field("o_orderdate") < Q3_CUTOFF),
        )
    )

    if broadcast_dim:

        def ord_filter(t: pa.Table) -> pa.Table:
            keep = pc.is_in(t.column("o_custkey"), value_set=ray.get(key_ref))
            return _ord_rows(t.filter(keep))

        orders = orders_raw.map_batches(ord_filter, batch_format="pyarrow")
    else:
        # custkey-shard SEMIJOIN: segment-filtered customer keys and window
        # orders union into one custkey-hashed stream; each shard keeps the
        # orders whose custkey appears on the customer side and emits them
        # straight into the orderkey-shard _MERGED layout.
        _SEMI = pa.schema(
            [
                ("cshard", pa.int32()),
                ("ck", pa.int64()),
                ("o_orderkey", pa.int64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_orderpriority", pa.string()),
                ("side", pa.int8()),
            ]
        )

        def _cshard_of(keys: "np.ndarray") -> "np.ndarray":
            return (((keys * 2654435761) % (1 << 32)) % num_shards).astype(
                np.int32
            )

        def cust_rows(t: pa.Table) -> pa.Table:
            ck = np.unique(
                t.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
            )
            n = len(ck)
            return pa.table(
                {
                    "cshard": pa.array(_cshard_of(ck)),
                    "ck": pa.array(ck, pa.int64()),
                    "o_orderkey": pa.array(np.zeros(n, np.int64), pa.int64()),
                    "o_orderdate": pa.nulls(n, pa.timestamp("us")),
                    "o_orderpriority": pa.nulls(n, pa.string()),
                    "side": pa.array(np.ones(n, np.int8), pa.int8()),
                },
                schema=_SEMI,
            )

        def ord_semi_rows(t: pa.Table) -> pa.Table:
            ck = t.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
            n = len(ck)
            return pa.table(
                {
                    "cshard": pa.array(_cshard_of(ck)),
                    "ck": pa.array(ck, pa.int64()),
                    "o_orderkey": t.column("o_orderkey").cast(pa.int64()),
                    "o_orderdate": t.column("o_orderdate").cast(pa.timestamp("us")),
                    "o_orderpriority": t.column("o_orderpriority").cast(pa.string()),
                    "side": pa.array(np.zeros(n, np.int8), pa.int8()),
                },
                schema=_SEMI,
            )

        def semi_shard(g: pa.Table) -> pa.Table:
            if g.num_rows == 0:
                return _MERGED.empty_table()
            side = g.column("side").to_numpy(zero_copy_only=False)
            ck = g.column("ck").to_numpy(zero_copy_only=False)
            have = np.unique(ck[side == 1])
            if len(have) == 0:
                return _MERGED.empty_table()
            fmask = side == 0
            fk = ck[fmask]
            pos = np.searchsorted(have, fk)
            hit = (pos < len(have)) & (have[np.minimum(pos, len(have) - 1)] == fk)
            keep = np.zeros(len(ck), dtype=bool)
            keep[np.flatnonzero(fmask)[hit]] = True
            return _ord_rows(g.filter(pa.array(keep)))

        cust = ray.data.read_parquet(
            _pq(sf_dir, "customer"),
            columns=["c_custkey"],
            filter=(pc.field("c_mktsegment") == Q3_SEGMENT),
        ).map_batches(cust_rows, batch_format="pyarrow")
        from ._util import absorb_empty_blocks as _absorb

        orders = (
            _absorb(
                orders_raw.map_batches(ord_semi_rows, batch_format="pyarrow").union(
                    cust
                ),
                batch_size=131072,
            )
            .groupby("cshard")
            .map_groups(
                lambda g: semi_shard(_dropg(g, ["cshard"])),
                batch_format="pyarrow",
            )
        )

    def li_rev(t: pa.Table) -> pa.Table:
        ep = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        dc = t.column("l_discount").to_numpy(zero_copy_only=False)
        rev = np.floor(ep * 100.0 + 0.5).astype(np.int64) * (
            10000 - np.floor(dc * 10000.0 + 0.5).astype(np.int64)
        )
        tt = pa.table(
            {"key": t.column("l_orderkey"), "rev_i": pa.array(rev, pa.int64())}
        )
        tt = _partial_groupby(["key"], sums=["rev_i"])(tt)
        kk = tt.column("key").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(kk)
        return pa.table(
            {
                "oshard": pa.array(_shard_of(kk)),
                "key": pa.array(kk, pa.int64()),
                "rev_i": tt.column("rev_i"),
                "o_orderdate": pa.nulls(n, pa.timestamp("us")),
                "o_orderpriority": pa.nulls(n, pa.string()),
                "side": pa.array(np.zeros(n, dtype=np.int8), pa.int8()),
            },
            schema=_MERGED,
        )

    li = strip_schema_metadata(
        ray.data.read_parquet(
            _pq(sf_dir, "lineitem"),
            columns=["l_orderkey", "l_extendedprice", "l_discount"],
            filter=(pc.field("l_shipdate") > Q3_CUTOFF),
        )
    ).map_batches(li_rev, batch_format="pyarrow")

    _OUT = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_orderpriority", pa.string()),
            ("revenue_i", pa.int64()),
        ]
    )

    def merge_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        side = g.column("side").to_numpy(zero_copy_only=False)
        keys = g.column("key").to_numpy(zero_copy_only=False)
        # lineitem side: exact integer revenue per orderkey (segment sums)
        k0 = keys[side == 0]
        v0 = g.column("rev_i").to_numpy(zero_copy_only=False)[side == 0]
        if len(k0) == 0:
            return _OUT.empty_table()
        order = np.argsort(k0, kind="stable")
        k0, v0 = k0[order], v0[order]
        new = np.ones(len(k0), dtype=bool)
        new[1:] = k0[1:] != k0[:-1]
        seg = np.cumsum(new) - 1
        # int64 accumulate (bincount's float64 weights would lose exactness
        # past 2^53 on huge per-order sums)
        tot = np.zeros(int(seg[-1]) + 1, dtype=np.int64)
        np.add.at(tot, seg, v0.astype(np.int64))
        uk = k0[np.flatnonzero(new)]
        # orders side: vectorized probe (orderkey is the orders PK, so each
        # right row matches at most one revenue bucket)
        right = g.filter(pa.array(side == 1))
        k1 = right.column("key").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(uk, k1)
        pos_c = np.minimum(pos, len(uk) - 1)
        hit = uk[pos_c] == k1
        out = right.filter(pa.array(hit))
        return pa.table(
            {
                "o_orderkey": out.column("key"),
                "o_orderdate": out.column("o_orderdate"),
                "o_orderpriority": out.column("o_orderpriority"),
                "revenue_i": pa.array(tot[pos_c[hit]], pa.int64()),
            },
            schema=_OUT,
        )

    from ._util import absorb_empty_blocks

    # coalesce the skinny union blocks before the shard groupby: the sort's
    # cost here is per-TASK dispatch (128 map + 66 merge + 128 reduce tasks
    # for 2.5s of actual remote work), so a few right-sized blocks beat many
    # tiny ones — at real scale target_max_block_size does this for free
    return (
        absorb_empty_blocks(li.union(orders), batch_size=131072)
        .groupby("oshard")
        .map_groups(merge_shard, batch_format="pyarrow")
        .sort(["revenue_i", "o_orderkey"], descending=[True, False])
        .limit(k)
    )


# ---------------------------------------------------------------------------
# D-layer: exact dedup (hash-partition + per-group first; ray_guide pattern)
# ---------------------------------------------------------------------------


def exact_dedup(sf_dir: str) -> ray.data.Dataset:
    ds = ray.data.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])

    def hash_and_combine(t: pa.Table) -> pa.Table:
        import hashlib

        import numpy as np

        # group key = first 16 digest bytes as two int64 columns: int sort in
        # the shuffle beats 64-char hex strings, collision odds are 2^-128-ish
        # (64-bit keys WOULD birthday-collide at 10^10-doc corpora).  The
        # per-row sha256 call is C-speed (~1us/row) and stays off the driver.
        digests = b"".join(
            hashlib.sha256((s or "").encode()).digest()[:16]
            for s in t.column("text").to_pylist()
        )
        h = np.frombuffer(digests, dtype="<i8").reshape(-1, 2)
        tt = pa.table(
            {
                "doc_id": t.column("doc_id"),
                "h1": pa.array(h[:, 0]),
                "h2": pa.array(h[:, 1]),
            }
        )
        # per-batch combiner: in-batch duplicates collapse BEFORE the shuffle
        # (min doc_id + count are mergeable), so the groupby moves at most
        # one row per distinct digest per block
        g = tt.group_by(["h1", "h2"]).aggregate([("doc_id", "min"), ([], "count_all")])
        return pa.table(
            {
                "h1": g.column("h1"),
                "h2": g.column("h2"),
                "doc_id": g.column("doc_id_min"),
                "n": pc.cast(g.column("count_all"), pa.int64()),
            }
        )

    out = (
        ds.map_batches(hash_and_combine, batch_format="pyarrow")
        .groupby(["h1", "h2"])
        .aggregate(Min("doc_id", alias_name="doc_id"), Sum("n", alias_name="n_copies"))
    )
    return out.select_columns(["doc_id", "n_copies"])


# ---------------------------------------------------------------------------
# A10: distinct over a composite key
# ---------------------------------------------------------------------------


def distinct_lang_source(sf_dir: str) -> ray.data.Dataset:
    ds = ray.data.read_parquet(_pq(sf_dir, "documents"), columns=["lang", "source"])

    # per-batch distinct first (partial), then the tiny global groupby
    def local_distinct(t: pa.Table) -> pa.Table:
        return t.group_by(["lang", "source"]).aggregate([])

    return (
        ds.map_batches(local_distinct, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Count(alias_name="_c"))
        .select_columns(["lang", "source"])
    )


# ---------------------------------------------------------------------------
# §2.9 streaming analogue: event-time tumbling window rollup
# ---------------------------------------------------------------------------


def hourly_rollup(sf_dir: str) -> ray.data.Dataset:
    ds = ray.data.read_parquet(
        _pq(sf_dir, "events"), columns=["ts", "event_type", "value"]
    )

    partial = _partial_groupby(["hour", "event_type"], ["value"], "n")

    def add_hour(t: pa.Table) -> pa.Table:
        return partial(
            t.append_column("hour", pc.floor_temporal(t.column("ts"), unit="hour"))
        )

    out = (
        ds.map_batches(add_hour, batch_format="pyarrow")
        .groupby(["hour", "event_type"])
        .aggregate(Sum("n", alias_name="n"), Sum("value", alias_name="sum_value"))
    )
    return _fixed_point(out, {"sum_value": 100})


# ---------------------------------------------------------------------------
# §2.9 streaming analogue: sessionization via per-key ordered map_groups
# (partitioning assumption: one group = one user_id, sorted by ts inside)
# ---------------------------------------------------------------------------

SESSION_GAP_MIN = 30


SESSION_SHARDS = 64


FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_counts(sf_dir: str, num_shards: int = 64) -> pa.Table:
    """Behavioral funnel analysis: how many users progressed view -> click ->
    purchase in strict timestamp order (each step's event must be strictly
    later than the user's earliest completion of the previous step).

    Scale shape: one coarse user-shard groupby co-locates each user's funnel
    events (a user lives wholly in one shard, so per-shard completion counts
    are exact and mergeable); inside a shard the three step times resolve
    with np.minimum.at over unique-user indices — no per-user Python.  Only
    one 3-integer partial row leaves each shard; the driver sums 64 of
    them.  Output: (step, n_users), 3 rows."""
    import numpy as np

    step_arr = pa.array(list(FUNNEL_STEPS), pa.string())
    ds = ray.data.read_parquet(
        _pq(sf_dir, "events"),
        columns=["user_id", "event_type", "ts"],
        filter=(pc.field("event_type").isin(list(FUNNEL_STEPS))),
    )

    def prep(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        # vectorized stage lookup: position in FUNNEL_STEPS IS the stage
        st = (
            pc.index_in(t.column("event_type"), value_set=step_arr)
            .to_numpy(zero_copy_only=False)
            .astype(np.int8)
        )
        shard = (((u * 2654435761) % (1 << 32)) % num_shards).astype(np.int32)
        return pa.table(
            {
                "ushard": pa.array(shard),
                "user_id": pa.array(u, pa.int64()),
                "ts_us": pa.array(ts, pa.int64()),
                "stage": pa.array(st, pa.int8()),
            }
        )

    _PART = pa.schema([("n1", pa.int64()), ("n2", pa.int64()), ("n3", pa.int64())])

    def funnel_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _PART.empty_table()
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        st = g.column("stage").to_numpy(zero_copy_only=False)
        _, seg = np.unique(u, return_inverse=True)
        nu = int(seg.max()) + 1
        inf = np.int64(1) << 62
        t_prev = None
        counts = []
        for stage in range(len(FUNNEL_STEPS)):
            m = st == stage
            if t_prev is not None:
                m = m & (ts > t_prev[seg])
            t_cur = np.full(nu, inf, dtype=np.int64)
            np.minimum.at(t_cur, seg[m], ts[m])
            counts.append(int((t_cur < inf).sum()))
            t_prev = t_cur
        return pa.table(
            {k: pa.array([v], pa.int64()) for k, v in zip(("n1", "n2", "n3"), counts)}
        )

    parts = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("ushard")
        .map_groups(funnel_shard, batch_format="pyarrow")
        .take_all()
    )
    totals = [sum(p[k] for p in parts) for k in ("n1", "n2", "n3")]
    labels = ["1_view", "2_click", "3_purchase"]
    return pa.table(
        {
            "step": pa.array(labels, pa.string()),
            "n_users": pa.array(totals, pa.int64()),
        }
    )


WEEK_US = 7 * 86400 * 1_000_000


def retention_cohorts(sf_dir: str, num_shards: int = 64) -> ray.data.Dataset:
    """Retention-cohort triangle: users grouped by the week of their FIRST
    event (cohort), counted as active in every week they have any event —
    the engagement-analysis standard.

    Scale shape: per-batch distinct (user, week) partials (only distinct
    rows shuffle), one coarse user-shard groupby (a user's history lives
    wholly in one shard, so its cohort week is shard-locally exact), then a
    tiny (cohort_week, week) Sum groupby — bounded by weeks^2 pairs, never
    users."""
    import numpy as np

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        wk = (
            t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False) // WEEK_US
        ).astype(np.int64)
        # per-batch distinct combine: composite key, weeks < 2^20 in practice
        key = u * (1 << 20) + wk
        uk = np.unique(key)
        uu, ww = uk // (1 << 20), uk % (1 << 20)
        shard = (((uu * 2654435761) % (1 << 32)) % num_shards).astype(np.int32)
        return pa.table(
            {
                "ushard": pa.array(shard),
                "user_id": pa.array(uu, pa.int64()),
                "week": pa.array(ww, pa.int64()),
            }
        )

    _PAIR = pa.schema(
        [("cohort_week", pa.int64()), ("week", pa.int64()), ("n", pa.int64())]
    )

    def cohort_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _PAIR.empty_table()
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        wk = g.column("week").to_numpy(zero_copy_only=False)
        _, seg = np.unique(u, return_inverse=True)
        nu = int(seg.max()) + 1
        first = np.full(nu, np.int64(1) << 62, dtype=np.int64)
        np.minimum.at(first, seg, wk)
        # distinct (user, week) may repeat across batches of the same shard
        key = seg.astype(np.int64) * (1 << 20) + wk
        uk = np.unique(key)
        useg, uwk = (uk // (1 << 20)).astype(np.int64), uk % (1 << 20)
        pair = first[useg] * (1 << 20) + uwk
        pk, cnt = np.unique(pair, return_counts=True)
        return pa.table(
            {
                "cohort_week": pa.array(pk // (1 << 20), pa.int64()),
                "week": pa.array(pk % (1 << 20), pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("ushard")
        .map_groups(cohort_shard, batch_format="pyarrow")
        .groupby(["cohort_week", "week"])
        .aggregate(Sum("n", alias_name="n_users"))
    )
    return out.sort(["cohort_week", "week"])


def sessionize(sf_dir: str) -> ray.data.Dataset:
    """Per-user gap sessionization.  Groups by a 64-way shard of user_id
    (NOT per user: map_groups pays ~1ms dispatch per group) and runs one
    vectorized numpy-on-Arrow pass inside each shard — same co-location,
    far fewer dispatches, and no Arrow->pandas shard copy (the funnel_shard
    idiom)."""
    import numpy as np
    import pyarrow.compute as pc

    from ._util import int_segment_sum

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts"])
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000

    def add_shard(t: pa.Table) -> pa.Table:
        shard = pc.cast(
            pc.bit_wise_and(t.column("user_id"), SESSION_SHARDS - 1), pa.int32()
        )
        return t.append_column("shard", shard)

    _OUT = pa.schema(
        [("user_id", pa.int64()), ("n_events", pa.int64()), ("n_sessions", pa.int64())]
    )

    def per_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        g = g.sort_by([("user_id", "ascending"), ("ts", "ascending")])
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = pc.cast(g.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        new_user = np.ones(len(uid), dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        diff = np.empty(len(ts), dtype=np.int64)
        diff[0] = 0
        diff[1:] = ts[1:] - ts[:-1]
        # a session opens at each user's first event or on a gap STRICTLY
        # longer than the threshold (the oracle's `ts - lag(ts) > INTERVAL`)
        new_session = new_user | (diff > gap_us)
        starts = np.flatnonzero(new_user)
        n_events = np.diff(np.append(starts, len(uid))).astype(np.int64)
        n_sessions = int_segment_sum(new_session, starts)
        return pa.table(
            {
                "user_id": pa.array(uid[starts].astype(np.int64)),
                "n_events": pa.array(n_events),
                "n_sessions": pa.array(n_sessions),
            }
        )

    return (
        ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(per_shard, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# J3/J4: range predicate against a broadcast dimension (band join)
# ---------------------------------------------------------------------------


def price_in_band(sf_dir: str) -> ray.data.Dataset:
    import numpy as np
    import pyarrow.parquet as pq

    part = pq.read_table(
        _pq(sf_dir, "part"), columns=["p_partkey", "p_brand", "p_retailprice"]
    )
    # broadcast Arrow arrays; probe via one index_in, then two vectorized takes
    ref = ray.put(
        (
            part.column("p_partkey").combine_chunks(),
            part.column("p_brand").combine_chunks(),
            part.column("p_retailprice").combine_chunks(),
        )
    )

    partial = _partial_groupby(["p_brand"], ["in_band"], "n_total")

    def band_join(t: pa.Table) -> pa.Table:
        import numpy as np

        keys, brands_d, retail_d = ray.get(ref)  # plasma zero-copy per batch
        idx = pc.index_in(t.column("l_partkey"), value_set=keys)
        brands = pc.take(brands_d, idx)
        retail = pc.take(retail_d, idx).to_numpy(zero_copy_only=False)
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        in_band = (price >= 0.5 * retail) & (price <= 1.5 * retail)
        return partial(
            pa.table(
                {
                    "p_brand": brands,
                    "in_band": pa.array(in_band.astype("int64")),
                }
            )
        )

    ds = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"), columns=["l_partkey", "l_extendedprice"]
    )
    return (
        ds.map_batches(band_join, batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(
            Sum("n_total", alias_name="n_total"), Sum("in_band", alias_name="n_in_band")
        )
    )


# ---------------------------------------------------------------------------
# set ops: union + rollup
# ---------------------------------------------------------------------------


def union_lang_counts(sf_dir: str) -> ray.data.Dataset:
    a = ray.data.read_parquet(
        _pq(sf_dir, "documents"),
        columns=["lang", "n_chars"],
        filter=(pc.field("lang") == "en"),
    )
    b = ray.data.read_parquet(
        _pq(sf_dir, "documents"),
        columns=["lang", "n_chars"],
        filter=(pc.field("n_chars") > 300),
    )
    partial = _partial_groupby(["lang"], [], "n")
    return (
        a.union(b)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n", alias_name="n"))
    )


# ---------------------------------------------------------------------------
# deterministic hash sampling (O5 analogue at scale: partition-friendly,
# reproducible — unlike RNG sampling, the SAME rows are picked on any
# cluster size, and the predicate pushes into the scan)
# ---------------------------------------------------------------------------

SAMPLE_MULT = 2654435761  # Knuth multiplicative hash constant
SAMPLE_MOD = 1 << 32
SAMPLE_RATE_DENOM = 10


STRATUM_RATES = {"en": 2, "de": 5, "es": 5, "fr": 5, "zh": 10}  # keep 1/rate
STRATUM_DEFAULT_RATE = 1  # unknown languages kept whole


def stratified_sample_docs(sf_dir: str) -> ray.data.Dataset:
    """Deterministic per-stratum sample: language l keeps rows where
    hash(doc_id) % rate(l) == 0 — the standard balanced-corpus downsampling
    step of a training-data pipeline (downsample dominant languages harder).
    Pure integer arithmetic, reproducible on any partitioning/engine."""
    ds = ray.data.read_parquet(
        _pq(sf_dir, "documents"), columns=["doc_id", "lang", "n_chars"]
    )

    def fn(t: pa.Table) -> pa.Table:
        import numpy as np

        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        langs = t.column("lang").to_pylist()
        rates = np.array(
            [STRATUM_RATES.get(l, STRATUM_DEFAULT_RATE) for l in langs], dtype=np.int64
        )
        keep = ((ids * SAMPLE_MULT) % SAMPLE_MOD) % rates == 0
        return t.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


def sample_docs(sf_dir: str) -> ray.data.Dataset:
    """~1/10 deterministic sample of documents: keep rows where
    (doc_id * 2654435761) mod 2^32 mod 10 == 0 — exact integer arithmetic
    reproducible in any engine."""
    ds = ray.data.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "lang", "n_chars"])

    def fn(t: pa.Table) -> pa.Table:
        import numpy as np

        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ((ids * SAMPLE_MULT) % SAMPLE_MOD) % SAMPLE_RATE_DENOM == 0
        return t.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# broadcast semi / anti joins
# ---------------------------------------------------------------------------


BIG_ORDER_THRESHOLD = 300_000.0


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def parse_props(sf_dir: str) -> ray.data.Dataset:
    """Semi-structured field extraction (the log/JSON-ingestion step of an
    event pipeline): pull the integer ``k`` field out of the JSON-ish
    ``events.props`` string into a typed column.  One vectorized
    ``pc.extract_regex`` pass per batch (RE2 on both engines, so the DuckDB
    ``regexp_extract`` oracle matches the capture exactly); rows whose props
    don't match emit a NULL, like SQL TRY_CAST.  Pure per-batch map — no
    shuffle, embarrassingly parallel at any corpus size."""
    ds = ray.data.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "event_type", "props"]
    )

    def fn(t: pa.Table) -> pa.Table:
        hit = pc.extract_regex(
            pc.fill_null(t.column("props"), ""), r'"k": (?P<k>[0-9]+)'
        )
        k = pc.cast(pc.struct_field(hit, "k"), pa.int64())
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "k": k,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def event_type_pivot(sf_dir: str, n_shards: int = 64) -> ray.data.Dataset:
    """Pivot (long -> wide): per-user event counts with one column per event
    type plus the row total — the feature-table layout classifiers consume.

    Scale shape: each batch collapses to per-user partial count VECTORS
    (np.unique + one np.add.at scatter — only one row per distinct user per
    block ever shuffles), users are co-partitioned by a coarse 64-way shard
    (never one group per user: map_groups costs ~1 ms per GROUP), and each
    shard merges its partials with run-detected exact int64 segment sums.
    The type set is the fixed public ``EVENT_TYPES`` vocabulary, so the wide
    schema is static."""
    import numpy as np

    from ._util import int_segment_sum

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "event_type"])
    n_types = len(EVENT_TYPES)
    type_arr = pa.array(EVENT_TYPES, pa.string())
    cols = [f"n_{t}" for t in EVENT_TYPES]

    def partial(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ti = pc.index_in(t.column("event_type"), value_set=type_arr).to_numpy(
            zero_copy_only=False
        )
        uu, inv = np.unique(u, return_inverse=True)
        mat = np.zeros((len(uu), n_types), dtype=np.int64)
        np.add.at(mat, (inv, ti.astype(np.int64)), 1)
        out = {"user_id": pa.array(uu), "ushard": pa.array((uu % n_shards).astype(np.int32))}
        for j, c in enumerate(cols):
            out[c] = pa.array(mat[:, j])
        return pa.table(out)

    _OUT = pa.schema(
        [("user_id", pa.int64())]
        + [(c, pa.int64()) for c in cols]
        + [("n_total", pa.int64())]
    )

    def merge_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        order = np.argsort(u, kind="stable")
        u = u[order]
        new = np.ones(len(u), dtype=bool)
        new[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new)
        out = {"user_id": pa.array(u[starts])}
        total = np.zeros(len(starts), dtype=np.int64)
        for c in cols:
            v = g.column(c).to_numpy(zero_copy_only=False)[order]
            s = int_segment_sum(v, starts)
            out[c] = pa.array(s)
            total += s
        out["n_total"] = pa.array(total)
        return pa.table(out)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ushard")
        .map_groups(merge_shard, batch_format="pyarrow")
        .select_columns(["user_id"] + cols + ["n_total"])
    )


def _brand_revenue_sharded(sf_dir: str, n_shards: int) -> ray.data.Dataset:
    """Distributed fallback for :func:`brand_revenue` when ``part`` exceeds
    the broadcast cap: join-free shard message passing (top_revenue_orders'
    shape).  Lineitem pre-combines (count, cents) per partkey per batch, the
    part dimension rides the same partkey-shard stream, each shard maps
    key -> brand with one searchsorted and pre-aggregates per brand, and the
    final groupby sees <= n_shards x |brands| rows.  Nothing dimension- or
    corpus-sized ever touches the driver."""
    import numpy as np

    from ._util import absorb_empty_blocks, int_bincount, int_segment_sum

    _MERGED = pa.schema(
        [
            ("pshard", pa.int32()),
            ("pk", pa.int64()),
            ("n", pa.int64()),
            ("cents", pa.int64()),
            ("p_brand", pa.string()),
            ("side", pa.int8()),
        ]
    )

    def _shard_of(keys: "np.ndarray") -> "np.ndarray":
        return (((keys * 2654435761) % (1 << 32)) % n_shards).astype(np.int32)

    def part_rows(t: pa.Table) -> pa.Table:
        pk = t.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(pk)
        return pa.table(
            {
                "pshard": pa.array(_shard_of(pk)),
                "pk": pa.array(pk, pa.int64()),
                "n": pa.array(np.zeros(n, np.int64), pa.int64()),
                "cents": pa.array(np.zeros(n, np.int64), pa.int64()),
                "p_brand": t.column("p_brand").cast(pa.string()),
                "side": pa.array(np.ones(n, np.int8), pa.int8()),
            },
            schema=_MERGED,
        )

    def li_partial(t: pa.Table) -> pa.Table:
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.floor(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        order = np.argsort(pk, kind="stable")
        pk, cents = pk[order], cents[order]
        new = np.ones(len(pk), dtype=bool)
        new[1:] = pk[1:] != pk[:-1]
        starts = np.flatnonzero(new)
        upk = pk[starts]
        n = len(upk)
        return pa.table(
            {
                "pshard": pa.array(_shard_of(upk)),
                "pk": pa.array(upk, pa.int64()),
                "n": pa.array(
                    int_segment_sum(np.ones(len(pk), np.int64), starts), pa.int64()
                ),
                "cents": pa.array(int_segment_sum(cents, starts), pa.int64()),
                "p_brand": pa.nulls(n, pa.string()),
                "side": pa.array(np.zeros(n, np.int8), pa.int8()),
            },
            schema=_MERGED,
        )

    _PART = pa.schema(
        [
            ("p_brand", pa.string()),
            ("n_items", pa.int64()),
            ("sum_price_c", pa.int64()),
        ]
    )

    def merge_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _PART.empty_table()
        side = g.column("side").to_numpy(zero_copy_only=False)
        pk = g.column("pk").to_numpy(zero_copy_only=False)
        bmask = side == 1
        bkey = pk[bmask]
        if len(bkey) == 0:
            return _PART.empty_table()  # inner join: no dimension rows here
        brand = g.column("p_brand").combine_chunks().filter(pa.array(bmask))
        order = np.argsort(bkey, kind="stable")
        bkey = bkey[order]
        brand = pc.take(brand, pa.array(order))
        fmask = ~bmask
        fk = pk[fmask]
        fn = g.column("n").to_numpy(zero_copy_only=False)[fmask]
        fc = g.column("cents").to_numpy(zero_copy_only=False)[fmask]
        pos = np.searchsorted(bkey, fk)
        hit = (pos < len(bkey)) & (bkey[np.minimum(pos, len(bkey) - 1)] == fk)
        enc = pc.take(brand, pa.array(pos[hit])).dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(enc.dictionary)
        return pa.table(
            {
                "p_brand": enc.dictionary,
                "n_items": pa.array(int_bincount(idx, fn[hit], minlength=k)),
                "sum_price_c": pa.array(int_bincount(idx, fc[hit], minlength=k)),
            },
            schema=_PART,
        )

    li = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"), columns=["l_partkey", "l_extendedprice"]
    ).map_batches(li_partial, batch_format="pyarrow")
    parts = ray.data.read_parquet(
        _pq(sf_dir, "part"), columns=["p_partkey", "p_brand"]
    ).map_batches(part_rows, batch_format="pyarrow")
    return (
        absorb_empty_blocks(li.union(parts), batch_size=131072)
        .groupby("pshard")
        .map_groups(
            lambda g: merge_shard(_dropg(g, ["pshard"])),
            batch_format="pyarrow",
        )
        .groupby("p_brand")
        .aggregate(
            Sum("n_items", alias_name="n_items"),
            Sum("sum_price_c", alias_name="sum_price_c"),
        )
    )


def brand_revenue(
    sf_dir: str, n_shards: int = 64, dim_cap: int = BROADCAST_DIM_MAX_ROWS
) -> ray.data.Dataset:
    """Broadcast dimension join over the LARGEST fact table — the canonical
    star-schema pattern at 100 TB: the small ``part`` dimension is read once
    driver-side, dictionary-encoded, and ``ray.put`` broadcast (one physical
    copy per node); the ``lineitem`` fact stream probes it with one
    vectorized ``index_in`` per batch and pre-aggregates to per-brand
    partial (count, cents) rows BEFORE any shuffle — so the groupby moves
    |brands| rows per block, never the fact table, and there is NO
    hash-partitioned join anywhere.  Exact integer cents throughout.

    In TPC-H ``part`` scales WITH the corpus, so broadcasting is only valid
    below a cap: when the parquet FOOTER reports more than ``dim_cap`` rows
    the query auto-dispatches to the join-free shard fallback (the
    unigram_surprisal vocab-cap pattern) — pytest-equated to this path."""
    import numpy as np
    import pyarrow.parquet as pqm

    from ._util import int_bincount, parquet_num_rows

    if parquet_num_rows(_pq(sf_dir, "part")) > dim_cap:
        return _brand_revenue_sharded(sf_dir, n_shards)

    # the dimension is small (guarded above); only (key, brand) columns are
    # read, dictionary-encoded to int indices
    part = pqm.read_table(_pq(sf_dir, "part"), columns=["p_partkey", "p_brand"])
    keys = part.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
    brands_d = part.column("p_brand").combine_chunks().dictionary_encode()
    brand_names = brands_d.dictionary.to_pylist()
    brand_idx = brands_d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(keys, kind="stable")
    dim_ref = ray.put((keys[order], brand_idx[order]))
    n_brands = len(brand_names)

    ds = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"), columns=["l_partkey", "l_extendedprice"]
    )

    def probe(t: pa.Table) -> pa.Table:
        d_keys, d_brand = ray.get(dim_ref)  # plasma zero-copy per batch
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(d_keys, pk)
        pos = np.clip(pos, 0, len(d_keys) - 1)
        hit = d_keys[pos] == pk  # inner-join semantics: drop dangling keys
        b = d_brand[pos[hit]]
        cents = np.floor(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False)[hit] * 100.0
            + 0.5
        ).astype(np.int64)
        n = int_bincount(b, np.ones(len(b), np.int64), minlength=n_brands)
        s = int_bincount(b, cents, minlength=n_brands)
        nz = np.flatnonzero(n)
        return pa.table(
            {
                "brand_i": pa.array(nz.astype(np.int64)),
                "n_items": pa.array(n[nz]),
                "sum_price_c": pa.array(s[nz]),
            }
        )

    agg = (
        ds.map_batches(probe, batch_format="pyarrow")
        .groupby("brand_i")
        .aggregate(
            Sum("n_items", alias_name="n_items"),
            Sum("sum_price_c", alias_name="sum_price_c"),
        )
    )

    names_arr = pa.array(brand_names, pa.string())

    def label(t: pa.Table) -> pa.Table:
        bi = t.column("brand_i")
        return pa.table(
            {
                "p_brand": pc.take(names_arr, bi),
                "n_items": t.column("n_items"),
                "sum_price_c": t.column("sum_price_c"),
            }
        )

    return agg.map_batches(label, batch_format="pyarrow")


def orders_rollup(sf_dir: str) -> pa.Table:
    """Multi-level OLAP rollup — ``GROUP BY ROLLUP(o_orderpriority,
    o_orderstatus)``: leaf groups, per-priority subtotals, and the grand
    total in one result, with NULL group markers exactly like SQL.

    Scale shape: ONE distributed pass builds the leaf aggregate (per-batch
    partial groupby combiner, so only one row per distinct key pair per
    block shuffles — the Aggregate sees |priorities x statuses| rows
    total); both coarser levels then derive from the LEAF table by local
    re-aggregation, which is valid because count/sum are associative.  The
    leaf table is bounded by the key-pair cardinality (15 here, small by
    construction for enum-like keys), so deriving subtotals driver-side
    costs nothing at any corpus size.  Totals are exact integer cents."""
    import numpy as np

    ds = ray.data.read_parquet(
        _pq(sf_dir, "orders"),
        columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(t.column("o_totalprice"), 100.0), 0.5)),
            pa.int64(),
        )
        g = (
            t.set_column(2, "cents", cents)
            .group_by(["o_orderpriority", "o_orderstatus"])
            .aggregate([("cents", "sum"), ([], "count_all")])
        )
        return pa.table(
            {
                "o_orderpriority": g.column("o_orderpriority"),
                "o_orderstatus": g.column("o_orderstatus"),
                "sum_price_c": g.column("cents_sum"),
                "n": pc.cast(g.column("count_all"), pa.int64()),
            }
        )

    leaf = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["o_orderpriority", "o_orderstatus"])
        .aggregate(
            Sum("sum_price_c", alias_name="sum_price_c"), Sum("n", alias_name="n")
        )
        .select_columns(["o_orderpriority", "o_orderstatus", "sum_price_c", "n"])
        .take_all()
    )
    prio = [r["o_orderpriority"] for r in leaf]
    stat = [r["o_orderstatus"] for r in leaf]
    sums = np.array([r["sum_price_c"] for r in leaf], dtype=np.int64)
    ns = np.array([r["n"] for r in leaf], dtype=np.int64)
    out_p, out_s, out_sum, out_n = list(prio), list(stat), list(sums), list(ns)
    for p in sorted(set(prio)):  # per-priority subtotal rows
        m = np.array([x == p for x in prio])
        out_p.append(p)
        out_s.append(None)
        out_sum.append(int(sums[m].sum()))
        out_n.append(int(ns[m].sum()))
    out_p.append(None)  # grand total
    out_s.append(None)
    out_sum.append(int(sums.sum()))
    out_n.append(int(ns.sum()))
    return pa.table(
        {
            "o_orderpriority": pa.array(out_p, pa.string()),
            "o_orderstatus": pa.array(out_s, pa.string()),
            "sum_price_c": pa.array(out_sum, pa.int64()),
            "n": pa.array(out_n, pa.int64()),
        }
    )


def customers_without_big_order(sf_dir: str) -> ray.data.Dataset:
    """Broadcast anti-join: customers with NO order above the threshold.
    The qualifying custkey set is computed IN RAY (pushed-down filter over the
    orders fact table + distributed distinct — the fact table never touches
    the driver); only the small distinct key set is collected and broadcast
    (ray.put once).  The probe side is a vectorized inverted is_in filter —
    anti-join semantics with no shuffle of the probe table."""
    big_ds = ray.data.read_parquet(
        _pq(sf_dir, "orders"),
        columns=["o_custkey"],
        filter=(pc.field("o_totalprice") > BIG_ORDER_THRESHOLD),
    )
    # partial distinct per batch, then the tiny global distinct; only the
    # deduplicated key set (small by construction) reaches the driver
    big_keys = (
        big_ds.map_batches(
            lambda t: t.group_by("o_custkey").aggregate([]), batch_format="pyarrow"
        )
        .unique("o_custkey")
    ) or []  # Dataset.unique returns None on a fully-empty input
    big_ref = ray.put(pa.array(sorted(big_keys), pa.int64()))

    def anti_filter(t: pa.Table) -> pa.Table:
        keep = pc.invert(pc.is_in(t.column("c_custkey"), value_set=ray.get(big_ref)))
        return t.filter(keep)

    ds = ray.data.read_parquet(
        _pq(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    )
    return ds.map_batches(anti_filter, batch_format="pyarrow")


Q5_LO = __import__("datetime").datetime(1997, 1, 1)
Q5_HI = __import__("datetime").datetime(1998, 1, 1)


def nation_revenue(
    sf_dir: str, num_shards: int = 64, dim_cap: int = BROADCAST_DIM_MAX_ROWS
) -> ray.data.Dataset:
    """TPC-H Q5 analogue: revenue per CUSTOMER NATION for orders placed in a
    one-year window — the canonical multi-way star join (two fact tables,
    two dimension hops) composed from this repo's proven shapes:

    - Both dimensions broadcast: ``customer`` collapses to a sorted
      (custkey -> nationkey) pair of arrays probed with searchsorted
      (brand_revenue's shape), ``nation`` to a 25-entry name map applied at
      emit.  Dimension bytes move once per node, never per row.
    - The orders<->lineitem fact-fact join is JOIN-FREE groupby message
      passing (top_revenue_orders' shape): lineitem pre-combines EXACT
      integer revenue (cents x (10000 - discount_bp)) per orderkey per
      batch, both sides union into one coarse orderkey-shard stream, and
      each shard segment-sums revenue, probes the order's custkey, hops to
      nationkey, and pre-aggregates to <= |nations| rows BEFORE the final
      tiny groupby.  Per-shard output is dimension-bounded; the corpus
      never re-shuffles.

    Customer scales WITH the corpus: past ``dim_cap`` (parquet footer row
    count) the custkey -> nationkey hop runs as a SECOND custkey-shard
    message-passing stage over per-custkey order partials instead of a
    driver-collected broadcast — nothing dimension-sized on the driver
    (pytest-equated).  ``nation`` itself is a constant 25-row map and
    always broadcasts."""
    import numpy as np
    import pyarrow.parquet as _pqm

    from ._util import parquet_num_rows, strip_schema_metadata

    broadcast_dim = parquet_num_rows(_pq(sf_dir, "customer")) <= dim_cap
    cust_ref = None
    if broadcast_dim:
        cust = _pqm.read_table(
            _pq(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
        )
        ck = cust.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        nk = cust.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ck, kind="stable")
        cust_ref = ray.put((ck[order], nk[order]))

    nat = _pqm.read_table(_pq(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    name_of = dict(
        zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist())
    )

    _MERGED = pa.schema(
        [
            ("oshard", pa.int32()),
            ("key", pa.int64()),
            ("rev_i", pa.int64()),
            ("custkey", pa.int64()),
            ("side", pa.int8()),
        ]
    )

    def _shard_of(keys: "np.ndarray") -> "np.ndarray":
        return (((keys * 2654435761) % (1 << 32)) % num_shards).astype(np.int32)

    def ord_rows(t: pa.Table) -> pa.Table:
        okey = t.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(okey)
        return pa.table(
            {
                "oshard": pa.array(_shard_of(okey)),
                "key": pa.array(okey, pa.int64()),
                "rev_i": pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
                "custkey": t.column("o_custkey").cast(pa.int64()),
                "side": pa.array(np.ones(n, dtype=np.int8), pa.int8()),
            },
            schema=_MERGED,
        )

    orders = strip_schema_metadata(
        ray.data.read_parquet(
            _pq(sf_dir, "orders"),
            columns=["o_orderkey", "o_custkey"],
            filter=(
                (pc.field("o_orderdate") >= Q5_LO) & (pc.field("o_orderdate") < Q5_HI)
            ),
        )
    ).map_batches(ord_rows, batch_format="pyarrow")

    def li_rev(t: pa.Table) -> pa.Table:
        ep = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        dc = t.column("l_discount").to_numpy(zero_copy_only=False)
        rev = np.floor(ep * 100.0 + 0.5).astype(np.int64) * (
            10000 - np.floor(dc * 10000.0 + 0.5).astype(np.int64)
        )
        tt = pa.table(
            {"key": t.column("l_orderkey"), "rev_i": pa.array(rev, pa.int64())}
        )
        tt = _partial_groupby(["key"], sums=["rev_i"])(tt)
        kk = tt.column("key").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(kk)
        return pa.table(
            {
                "oshard": pa.array(_shard_of(kk)),
                "key": pa.array(kk, pa.int64()),
                "rev_i": tt.column("rev_i"),
                "custkey": pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
                "side": pa.array(np.zeros(n, dtype=np.int8), pa.int8()),
            },
            schema=_MERGED,
        )

    li = strip_schema_metadata(
        ray.data.read_parquet(
            _pq(sf_dir, "lineitem"), columns=["l_orderkey", "l_extendedprice", "l_discount"]
        )
    ).map_batches(li_rev, batch_format="pyarrow")

    _PART = pa.schema(
        [("nationkey", pa.int64()), ("n_orders", pa.int64()), ("revenue_i", pa.int64())]
    )
    # sharded-fallback stage-B row layout: per-custkey order partials
    # (side=0) union customer dimension rows (side=1), custkey-hashed
    _CPART = pa.schema(
        [
            ("cshard", pa.int32()),
            ("ck", pa.int64()),
            ("n_orders", pa.int64()),
            ("rev_i", pa.int64()),
            ("nationkey", pa.int64()),
            ("side", pa.int8()),
        ]
    )

    def merge_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _PART.empty_table() if broadcast_dim else _CPART.empty_table()
        side = g.column("side").to_numpy(zero_copy_only=False)
        keys = g.column("key").to_numpy(zero_copy_only=False)
        k0 = keys[side == 0]
        v0 = g.column("rev_i").to_numpy(zero_copy_only=False)[side == 0]
        k1 = keys[side == 1]
        c1 = g.column("custkey").to_numpy(zero_copy_only=False)[side == 1]
        if len(k0) == 0 or len(k1) == 0:
            return _PART.empty_table()
        order = np.argsort(k0, kind="stable")
        k0, v0 = k0[order], v0[order]
        new = np.ones(len(k0), dtype=bool)
        new[1:] = k0[1:] != k0[:-1]
        starts = np.flatnonzero(new)
        from ._util import int_segment_sum

        uk = k0[starts]
        rev = int_segment_sum(v0, starts)
        # inner-join: keep window orders that have >=1 lineitem row
        o = np.argsort(k1, kind="stable")
        k1, c1 = k1[o], c1[o]
        pos = np.searchsorted(k1, uk)
        hit = (pos < len(k1)) & (k1[np.minimum(pos, len(k1) - 1)] == uk)
        cust_k = c1[pos[hit]]
        rev = rev[hit]
        if broadcast_dim:
            # custkey -> nationkey via the broadcast sorted dimension
            dck, dnk = ray.get(cust_ref)
            nkeys = dnk[np.searchsorted(dck, cust_k)]
            un, inv = np.unique(nkeys, return_inverse=True)
            n_ord = np.zeros(len(un), dtype=np.int64)
            np.add.at(n_ord, inv, 1)
            tot = np.zeros(len(un), dtype=np.int64)
            np.add.at(tot, inv, rev)
            return pa.table(
                {
                    "nationkey": pa.array(un, pa.int64()),
                    "n_orders": pa.array(n_ord, pa.int64()),
                    "revenue_i": pa.array(tot, pa.int64()),
                },
                schema=_PART,
            )
        # sharded fallback: emit per-custkey partials for the stage-B hop
        un, inv = np.unique(cust_k, return_inverse=True)
        n_ord = np.zeros(len(un), dtype=np.int64)
        np.add.at(n_ord, inv, 1)
        tot = np.zeros(len(un), dtype=np.int64)
        np.add.at(tot, inv, rev)
        return pa.table(
            {
                "cshard": pa.array(
                    (((un * 2654435761) % (1 << 32)) % num_shards).astype(np.int32)
                ),
                "ck": pa.array(un, pa.int64()),
                "n_orders": pa.array(n_ord, pa.int64()),
                "rev_i": pa.array(tot, pa.int64()),
                "nationkey": pa.array(np.zeros(len(un), np.int64), pa.int64()),
                "side": pa.array(np.zeros(len(un), np.int8), pa.int8()),
            },
            schema=_CPART,
        )

    _OUT = pa.schema(
        [("n_name", pa.string()), ("n_orders", pa.int64()), ("revenue_i", pa.int64())]
    )

    def final_merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        nk_ = g.column("nationkey").to_numpy(zero_copy_only=False)
        no = g.column("n_orders").to_numpy(zero_copy_only=False)
        rv = g.column("revenue_i").to_numpy(zero_copy_only=False)
        order = np.argsort(nk_, kind="stable")
        nk_, no, rv = nk_[order], no[order], rv[order]
        new = np.ones(len(nk_), dtype=bool)
        new[1:] = nk_[1:] != nk_[:-1]
        starts = np.flatnonzero(new)
        from ._util import int_segment_sum

        return pa.table(
            {
                "n_name": pa.array(
                    [name_of[int(x)] for x in nk_[starts]], pa.string()
                ),
                "n_orders": pa.array(int_segment_sum(no, starts), pa.int64()),
                "revenue_i": pa.array(int_segment_sum(rv, starts), pa.int64()),
            },
            schema=_OUT,
        )

    from ._util import absorb_empty_blocks

    merged = (
        absorb_empty_blocks(orders.union(li), batch_size=131072)
        .groupby("oshard")
        .map_groups(merge_shard, batch_format="pyarrow")
    )

    if not broadcast_dim:
        # stage B: custkey-shard hop — per-custkey order partials union the
        # customer dimension rows; each shard maps ck -> nationkey with one
        # searchsorted and pre-aggregates to <= |nations| rows.
        def cust_rows(t: pa.Table) -> pa.Table:
            cks = t.column("c_custkey").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            nks = t.column("c_nationkey").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            n = len(cks)
            return pa.table(
                {
                    "cshard": pa.array(
                        (((cks * 2654435761) % (1 << 32)) % num_shards).astype(
                            np.int32
                        )
                    ),
                    "ck": pa.array(cks, pa.int64()),
                    "n_orders": pa.array(np.zeros(n, np.int64), pa.int64()),
                    "rev_i": pa.array(np.zeros(n, np.int64), pa.int64()),
                    "nationkey": pa.array(nks, pa.int64()),
                    "side": pa.array(np.ones(n, np.int8), pa.int8()),
                },
                schema=_CPART,
            )

        def nation_hop(g: pa.Table) -> pa.Table:
            if g.num_rows == 0:
                return _PART.empty_table()
            side = g.column("side").to_numpy(zero_copy_only=False)
            cks = g.column("ck").to_numpy(zero_copy_only=False)
            bmask = side == 1
            bkey = cks[bmask]
            if len(bkey) == 0:
                return _PART.empty_table()
            bnk = g.column("nationkey").to_numpy(zero_copy_only=False)[bmask]
            order = np.argsort(bkey, kind="stable")
            bkey, bnk = bkey[order], bnk[order]
            fmask = ~bmask
            fk = cks[fmask]
            fn = g.column("n_orders").to_numpy(zero_copy_only=False)[fmask]
            fr = g.column("rev_i").to_numpy(zero_copy_only=False)[fmask]
            pos = np.searchsorted(bkey, fk)
            hit = (pos < len(bkey)) & (bkey[np.minimum(pos, len(bkey) - 1)] == fk)
            nkeys = bnk[pos[hit]]
            un, inv = np.unique(nkeys, return_inverse=True)
            n_ord = np.zeros(len(un), dtype=np.int64)
            np.add.at(n_ord, inv, fn[hit])
            tot = np.zeros(len(un), dtype=np.int64)
            np.add.at(tot, inv, fr[hit])
            return pa.table(
                {
                    "nationkey": pa.array(un, pa.int64()),
                    "n_orders": pa.array(n_ord, pa.int64()),
                    "revenue_i": pa.array(tot, pa.int64()),
                },
                schema=_PART,
            )

        cust_side = ray.data.read_parquet(
            _pq(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
        ).map_batches(cust_rows, batch_format="pyarrow")
        merged = (
            absorb_empty_blocks(merged.union(cust_side), batch_size=131072)
            .groupby("cshard")
            .map_groups(
                lambda g: nation_hop(_dropg(g, ["cshard"])),
                batch_format="pyarrow",
            )
        )

    # <= num_shards * |nations| partial rows remain — one tiny final groupby
    out = merged.groupby("nationkey").map_groups(final_merge, batch_format="pyarrow")
    return out.sort(["revenue_i", "n_name"], descending=[True, False])


def brand_supplier_counts(sf_dir: str, n_shards: int = 64) -> ray.data.Dataset:
    """Per-group COUNT(DISTINCT) — TPC-H Q16's core pattern: for every part
    brand, how many DISTINCT suppliers and DISTINCT parts appear in the
    lineitem fact stream.  Naive COUNT(DISTINCT) shuffles every fact row;
    the scale shape is two-stage distinct:

    - stage 1 (per batch): probe the broadcast ``part`` dimension for the
      brand, then collapse to the batch's DISTINCT (kind, brand, key) pairs
      via one ``np.unique`` on a packed int64 — so the shuffle moves at most
      the distinct-pair count per block, never fact rows.
    - stage 2: pairs hash-shard by (brand, key) so every copy of a pair
      lands in ONE shard group; each shard dedups with a second
      ``np.unique`` and emits per-(kind, brand) partial counts.  Shards
      partition the distinct-pair space, so partial counts are additive —
      the final groupby sees <= n_shards x |brands| x 2 rows.

    Reference analogue: SURVEY §2 A10 distinct stats, composed with the J2
    exact-lookup join (submission/utils/fields.py lookup tables)."""
    import numpy as np
    import pyarrow.parquet as pqm

    from ._util import int_segment_sum

    part = pqm.read_table(_pq(sf_dir, "part"), columns=["p_partkey", "p_brand"])
    keys = part.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
    brands_d = part.column("p_brand").combine_chunks().dictionary_encode()
    brand_names = brands_d.dictionary.to_pylist()
    brand_idx = brands_d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(keys, kind="stable")
    dim_ref = ray.put((keys[order], brand_idx[order]))

    ds = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"), columns=["l_partkey", "l_suppkey"]
    )

    # packed pair layout: kind (0=supplier, 1=part) in the top bits, brand
    # below, key in the low 40 bits — one int64 np.unique dedups all three
    _KEY_BITS = 40

    def pairs(t: pa.Table) -> pa.Table:
        d_keys, d_brand = ray.get(dim_ref)
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(d_keys, pk)
        pos = np.clip(pos, 0, len(d_keys) - 1)
        hit = d_keys[pos] == pk  # inner-join semantics
        b = d_brand[pos[hit]]
        packed = np.concatenate(
            [
                (0 << 62) | (b << _KEY_BITS) | sk[hit],
                (1 << 62) | (b << _KEY_BITS) | pk[hit],
            ]
        )
        uniq = np.unique(packed)
        shard = (((uniq * 2654435761) % (1 << 32)) % n_shards).astype(np.int32)
        return pa.table(
            {"pshard": pa.array(shard), "packed": pa.array(uniq, pa.int64())}
        )

    _PART = pa.schema(
        [("brand_i", pa.int64()), ("kind", pa.int8()), ("n", pa.int64())]
    )

    def shard_count(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _PART.empty_table()
        uniq = np.unique(g.column("packed").to_numpy(zero_copy_only=False))
        group = uniq >> _KEY_BITS  # (kind, brand) composite, already sorted
        new = np.ones(len(group), dtype=bool)
        new[1:] = group[1:] != group[:-1]
        starts = np.flatnonzero(new)
        heads = group[starts]
        return pa.table(
            {
                "brand_i": pa.array(heads & ((1 << 22) - 1), pa.int64()),
                "kind": pa.array((heads >> 22).astype(np.int8), pa.int8()),
                "n": pa.array(
                    int_segment_sum(np.ones(len(group), np.int64), starts), pa.int64()
                ),
            },
            schema=_PART,
        )

    _OUT = pa.schema(
        [("p_brand", pa.string()), ("n_suppliers", pa.int64()), ("n_parts", pa.int64())]
    )
    names_arr = pa.array(brand_names, pa.string())

    def final(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        bi = g.column("brand_i").to_numpy(zero_copy_only=False)
        kind = g.column("kind").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        ub, inv = np.unique(bi, return_inverse=True)
        n_sup = np.zeros(len(ub), dtype=np.int64)
        n_prt = np.zeros(len(ub), dtype=np.int64)
        np.add.at(n_sup, inv[kind == 0], n[kind == 0])
        np.add.at(n_prt, inv[kind == 1], n[kind == 1])
        return pa.table(
            {
                "p_brand": pc.take(names_arr, pa.array(ub)),
                "n_suppliers": pa.array(n_sup, pa.int64()),
                "n_parts": pa.array(n_prt, pa.int64()),
            },
            schema=_OUT,
        )

    from ._util import absorb_empty_blocks

    partials = absorb_empty_blocks(
        ds.map_batches(pairs, batch_format="pyarrow"), batch_size=131072
    )
    counted = partials.groupby("pshard").map_groups(shard_count, batch_format="pyarrow")
    # final input is tiny (<= n_shards x |brands| x 2 rows): single group
    out = counted.map_batches(
        lambda t: t.append_column("g", pa.array([0] * t.num_rows, pa.int32())),
        batch_format="pyarrow",
    )
    return (
        out.groupby("g")
        .map_groups(lambda g: final(_dropg(g, ["g"])), batch_format="pyarrow")
        .sort("p_brand")
    )


def _small_quantity_revenue_sharded(sf_dir: str, n_shards: int) -> ray.data.Dataset:
    """Distributed fallback for :func:`small_quantity_revenue` past the
    ``part`` broadcast cap — and a strictly better shape: ONE lineitem pass.
    Facts pre-combine per (partkey, quantity) per batch (quantity is a small
    integer, so the pair cardinality per block is bounded); the part
    dimension rides the same partkey-shard stream.  Each shard derives the
    per-part totals from its own (pk, qty, n) rows (cnt = sum n,
    sum_qty = sum qty*n — the pair partials are a sufficient statistic),
    applies the division-free predicate ``5*qty*cnt < sum_qty`` per pair
    row, maps pk -> brand, and pre-aggregates per brand.  Nothing
    dimension-sized on the driver; the final groupby sees
    <= n_shards x |brands| rows."""
    import numpy as np

    from ._util import absorb_empty_blocks, int_bincount, int_segment_sum

    _MERGED = pa.schema(
        [
            ("pshard", pa.int32()),
            ("pk", pa.int64()),
            ("qty", pa.int64()),
            ("n", pa.int64()),
            ("cents", pa.int64()),
            ("p_brand", pa.string()),
            ("side", pa.int8()),
        ]
    )

    def _shard_of(keys: "np.ndarray") -> "np.ndarray":
        return (((keys * 2654435761) % (1 << 32)) % n_shards).astype(np.int32)

    def part_rows(t: pa.Table) -> pa.Table:
        pk = t.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(pk)
        z = np.zeros(n, np.int64)
        return pa.table(
            {
                "pshard": pa.array(_shard_of(pk)),
                "pk": pa.array(pk, pa.int64()),
                "qty": pa.array(z, pa.int64()),
                "n": pa.array(z, pa.int64()),
                "cents": pa.array(z, pa.int64()),
                "p_brand": t.column("p_brand").cast(pa.string()),
                "side": pa.array(np.ones(n, np.int8), pa.int8()),
            },
            schema=_MERGED,
        )

    def fact_pairs(t: pa.Table) -> pa.Table:
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        qty = np.floor(
            t.column("l_quantity").to_numpy(zero_copy_only=False) + 0.5
        ).astype(np.int64)
        cents = np.floor(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        order = np.lexsort((qty, pk))
        pk, qty, cents = pk[order], qty[order], cents[order]
        new = np.ones(len(pk), dtype=bool)
        new[1:] = (pk[1:] != pk[:-1]) | (qty[1:] != qty[:-1])
        starts = np.flatnonzero(new)
        upk, uq = pk[starts], qty[starts]
        return pa.table(
            {
                "pshard": pa.array(_shard_of(upk)),
                "pk": pa.array(upk, pa.int64()),
                "qty": pa.array(uq, pa.int64()),
                "n": pa.array(
                    int_segment_sum(np.ones(len(pk), np.int64), starts), pa.int64()
                ),
                "cents": pa.array(int_segment_sum(cents, starts), pa.int64()),
                "p_brand": pa.nulls(len(upk), pa.string()),
                "side": pa.array(np.zeros(len(upk), np.int8), pa.int8()),
            },
            schema=_MERGED,
        )

    _PART = pa.schema(
        [
            ("p_brand", pa.string()),
            ("n_small", pa.int64()),
            ("small_rev_c", pa.int64()),
        ]
    )

    def merge_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _PART.empty_table()
        side = g.column("side").to_numpy(zero_copy_only=False)
        pk = g.column("pk").to_numpy(zero_copy_only=False)
        bmask = side == 1
        bkey = pk[bmask]
        if len(bkey) == 0:
            return _PART.empty_table()
        brand = g.column("p_brand").combine_chunks().filter(pa.array(bmask))
        order = np.argsort(bkey, kind="stable")
        bkey = bkey[order]
        brand = pc.take(brand, pa.array(order))
        fmask = ~bmask
        fk = pk[fmask]
        if len(fk) == 0:
            return _PART.empty_table()
        fq = g.column("qty").to_numpy(zero_copy_only=False)[fmask]
        fn = g.column("n").to_numpy(zero_copy_only=False)[fmask]
        fc = g.column("cents").to_numpy(zero_copy_only=False)[fmask]
        forder = np.lexsort((fq, fk))
        fk, fq, fn, fc = fk[forder], fq[forder], fn[forder], fc[forder]
        new = np.ones(len(fk), dtype=bool)
        new[1:] = fk[1:] != fk[:-1]
        starts = np.flatnonzero(new)
        seg = np.cumsum(new) - 1
        cnt = int_segment_sum(fn, starts)
        sumq = int_segment_sum(fq * fn, starts)
        small = 5 * fq * cnt[seg] < sumq[seg]
        pos = np.searchsorted(bkey, fk)
        hit = (pos < len(bkey)) & (bkey[np.minimum(pos, len(bkey) - 1)] == fk)
        keep = small & hit
        if not keep.any():
            return _PART.empty_table()
        enc = pc.take(brand, pa.array(pos[keep])).dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(enc.dictionary)
        return pa.table(
            {
                "p_brand": enc.dictionary,
                "n_small": pa.array(int_bincount(idx, fn[keep], minlength=k)),
                "small_rev_c": pa.array(int_bincount(idx, fc[keep], minlength=k)),
            },
            schema=_PART,
        )

    li = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    ).map_batches(fact_pairs, batch_format="pyarrow")
    parts = ray.data.read_parquet(
        _pq(sf_dir, "part"), columns=["p_partkey", "p_brand"]
    ).map_batches(part_rows, batch_format="pyarrow")
    return (
        absorb_empty_blocks(li.union(parts), batch_size=131072)
        .groupby("pshard")
        .map_groups(
            lambda g: merge_shard(_dropg(g, ["pshard"])),
            batch_format="pyarrow",
        )
        .groupby("p_brand")
        .aggregate(
            Sum("n_small", alias_name="n_small"),
            Sum("small_rev_c", alias_name="small_rev_c"),
        )
        .sort("p_brand")
    )


def small_quantity_revenue(
    sf_dir: str, n_shards: int = 64, dim_cap: int = BROADCAST_DIM_MAX_ROWS
) -> ray.data.Dataset:
    """Aggregate-then-rejoin — TPC-H Q17's pattern: revenue from lineitems
    whose quantity is below 20% of that PART's average quantity, reported
    per brand.  Two streaming passes, division-free:

    - pass 1: per-batch partial (sum_qty, cnt) per partkey, merged by a
      coarse partkey-shard groupby; the result is DIMENSION-bounded
      (<= |part| rows) so it is collected and ``ray.put`` broadcast —
      exactly the brand_revenue dimension discipline.
    - pass 2: the fact stream probes the broadcast per-part stats and keeps
      rows where ``5 * qty * cnt < sum_qty`` (the exact integer form of
      ``qty < 0.2 * avg``: no float division on either engine), probes the
      brand, and pre-aggregates per-brand partials before one tiny groupby.

    Reference analogue: SURVEY §2 A9/J5 (per-group statistics feeding a
    row-level validation pass, submission/utils/validate.py).

    ``part`` (and the per-part stats) scale WITH the corpus: past
    ``dim_cap`` (parquet footer row count) the query auto-dispatches to
    :func:`_small_quantity_revenue_sharded` — pytest-equated."""
    import numpy as np
    import pyarrow.parquet as pqm

    from ._util import int_bincount, parquet_num_rows

    if parquet_num_rows(_pq(sf_dir, "part")) > dim_cap:
        return _small_quantity_revenue_sharded(sf_dir, n_shards)

    from ._util import absorb_empty_blocks, int_segment_sum

    # pass 1 — per-part quantity stats: per-batch partials stamped with a
    # coarse partkey shard, merged by ONE shard groupby with exact segment
    # sums (Ray's sort-Aggregate costs ~120us per shuffled row — the shard
    # shape shuffles the same partial rows but reduces them vectorized)
    def qty_partial(t: pa.Table) -> pa.Table:
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        qty = np.floor(
            t.column("l_quantity").to_numpy(zero_copy_only=False) + 0.5
        ).astype(np.int64)
        order = np.argsort(pk, kind="stable")
        pk, qty = pk[order], qty[order]
        new = np.ones(len(pk), dtype=bool)
        new[1:] = pk[1:] != pk[:-1]
        starts = np.flatnonzero(new)
        upk = pk[starts]
        return pa.table(
            {
                "pshard": pa.array(
                    (((upk * 2654435761) % (1 << 32)) % n_shards).astype(np.int32)
                ),
                "pk": pa.array(upk, pa.int64()),
                "qty_i": pa.array(int_segment_sum(qty, starts), pa.int64()),
                "cnt": pa.array(int_segment_sum(np.ones(len(pk), np.int64), starts)),
            }
        )

    _STATS = pa.schema(
        [("pk", pa.int64()), ("qty_i", pa.int64()), ("cnt", pa.int64())]
    )

    def qty_merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _STATS.empty_table()
        pk = g.column("pk").to_numpy(zero_copy_only=False)
        qs = g.column("qty_i").to_numpy(zero_copy_only=False)
        cs = g.column("cnt").to_numpy(zero_copy_only=False)
        order = np.argsort(pk, kind="stable")
        pk, qs, cs = pk[order], qs[order], cs[order]
        new = np.ones(len(pk), dtype=bool)
        new[1:] = pk[1:] != pk[:-1]
        starts = np.flatnonzero(new)
        return pa.table(
            {
                "pk": pa.array(pk[starts], pa.int64()),
                "qty_i": pa.array(int_segment_sum(qs, starts), pa.int64()),
                "cnt": pa.array(int_segment_sum(cs, starts), pa.int64()),
            },
            schema=_STATS,
        )

    stats = (
        absorb_empty_blocks(
            ray.data.read_parquet(
                _pq(sf_dir, "lineitem"), columns=["l_partkey", "l_quantity"]
            ).map_batches(qty_partial, batch_format="pyarrow"),
            batch_size=131072,
        )
        .groupby("pshard")
        .map_groups(
            lambda g: qty_merge(_dropg(g, ["pshard"])), batch_format="pyarrow"
        )
        .take_all()  # dimension-bounded: <= |part| rows
    )
    s_pk = np.array([r["pk"] for r in stats], dtype=np.int64)
    s_sum = np.array([r["qty_i"] for r in stats], dtype=np.int64)
    s_cnt = np.array([r["cnt"] for r in stats], dtype=np.int64)
    order = np.argsort(s_pk, kind="stable")
    stats_ref = ray.put((s_pk[order], s_sum[order], s_cnt[order]))

    part = pqm.read_table(_pq(sf_dir, "part"), columns=["p_partkey", "p_brand"])
    keys = part.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
    brands_d = part.column("p_brand").combine_chunks().dictionary_encode()
    brand_names = brands_d.dictionary.to_pylist()
    brand_idx = brands_d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(keys, kind="stable")
    dim_ref = ray.put((keys[order], brand_idx[order]))
    n_brands = len(brand_names)

    def probe(t: pa.Table) -> pa.Table:
        p_keys, p_sum, p_cnt = ray.get(stats_ref)
        d_keys, d_brand = ray.get(dim_ref)
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        qty = np.floor(
            t.column("l_quantity").to_numpy(zero_copy_only=False) + 0.5
        ).astype(np.int64)
        pos = np.searchsorted(p_keys, pk)  # every fact partkey is in pass-1 stats
        small = 5 * qty * p_cnt[pos] < p_sum[pos]
        pk_s = pk[small]
        cents = np.floor(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False)[small] * 100.0
            + 0.5
        ).astype(np.int64)
        dpos = np.clip(np.searchsorted(d_keys, pk_s), 0, len(d_keys) - 1)
        hit = d_keys[dpos] == pk_s
        b = d_brand[dpos[hit]]
        n = int_bincount(b, np.ones(len(b), np.int64), minlength=n_brands)
        s = int_bincount(b, cents[hit], minlength=n_brands)
        nz = np.flatnonzero(n)
        return pa.table(
            {
                "brand_i": pa.array(nz.astype(np.int64)),
                "n_small": pa.array(n[nz]),
                "small_rev_c": pa.array(s[nz]),
            }
        )

    agg = (
        ray.data.read_parquet(
            _pq(sf_dir, "lineitem"),
            columns=["l_partkey", "l_quantity", "l_extendedprice"],
        )
        .map_batches(probe, batch_format="pyarrow")
        .groupby("brand_i")
        .aggregate(
            Sum("n_small", alias_name="n_small"),
            Sum("small_rev_c", alias_name="small_rev_c"),
        )
    )

    names_arr = pa.array(brand_names, pa.string())

    def label(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_brand": pc.take(names_arr, t.column("brand_i")),
                "n_small": t.column("n_small"),
                "small_rev_c": t.column("small_rev_c"),
            }
        )

    return agg.map_batches(label, batch_format="pyarrow").sort("p_brand")


def user_event_overlap(
    sf_dir: str, type_a: str = "click", type_b: str = "purchase", n_shards: int = 64
) -> pa.Table:
    """Distributed set operations on distinct keys — SQL INTERSECT / EXCEPT:
    how many distinct users did BOTH event types, only A, only B.  The
    audience-overlap primitive (and the shape of any distinct-key set
    algebra between two filtered streams).

    Scale shape: the read prunes to two columns and pushes the type filter
    into the scan; each batch collapses to DISTINCT (user, membership-bit)
    pairs OR-merged per user (np.unique + bitwise_or), so the shuffle moves
    at most the distinct users per block; a user-shard groupby OR-merges
    the bitmasks (each user lands in exactly ONE shard, so per-shard
    category counts are additive) and emits 3 numbers per shard.

    Reference analogue: SURVEY §2 A10 distinct stats / D-layer set merges
    (submission/utils/merge.py membership reconciliation)."""
    import numpy as np

    from ._util import absorb_empty_blocks

    ds = ray.data.read_parquet(
        _pq(sf_dir, "events"),
        columns=["user_id", "event_type"],
        filter=pc.field("event_type").isin([type_a, type_b]),
    )

    def partial(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        is_b = pc.equal(t.column("event_type"), type_b).to_numpy(zero_copy_only=False)
        flags = np.where(is_b, 2, 1).astype(np.int64)
        uu, inv = np.unique(u, return_inverse=True)
        acc = np.zeros(len(uu), dtype=np.int64)
        np.bitwise_or.at(acc, inv, flags)
        return pa.table(
            {
                "ushard": pa.array(
                    (((uu * 2654435761) % (1 << 32)) % n_shards).astype(np.int32)
                ),
                "user_id": pa.array(uu, pa.int64()),
                "flags": pa.array(acc, pa.int64()),
            }
        )

    _PART = pa.schema(
        [("n_both", pa.int64()), ("n_a_only", pa.int64()), ("n_b_only", pa.int64())]
    )

    def shard_merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _PART.empty_table()
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        f = g.column("flags").to_numpy(zero_copy_only=False)
        uu, inv = np.unique(u, return_inverse=True)
        acc = np.zeros(len(uu), dtype=np.int64)
        np.bitwise_or.at(acc, inv, f)
        return pa.table(
            {
                "n_both": pa.array([int(np.sum(acc == 3))], pa.int64()),
                "n_a_only": pa.array([int(np.sum(acc == 1))], pa.int64()),
                "n_b_only": pa.array([int(np.sum(acc == 2))], pa.int64()),
            },
            schema=_PART,
        )

    rows = (
        absorb_empty_blocks(
            ds.map_batches(partial, batch_format="pyarrow"), batch_size=131072
        )
        .groupby("ushard")
        .map_groups(
            lambda g: shard_merge(_dropg(g, ["ushard"])), batch_format="pyarrow"
        )
        .take_all()  # <= n_shards rows
    )
    return pa.table(
        {
            "n_both": pa.array([sum(r["n_both"] for r in rows)], pa.int64()),
            "n_a_only": pa.array([sum(r["n_a_only"] for r in rows)], pa.int64()),
            "n_b_only": pa.array([sum(r["n_b_only"] for r in rows)], pa.int64()),
        }
    )


def orders_without_lineitems(sf_dir: str, num_shards: int = 64) -> ray.data.Dataset:
    """Fact-fact ANTI-join (SQL NOT EXISTS) when NEITHER side is
    broadcastable: join-free groupby message passing — both facts project
    to slim key rows, union into one coarse orderkey-shard stream (every
    copy of a key lands in ONE shard), and each shard emits the probe rows
    whose key has no build-side row.  The complement of
    customers_without_big_order's broadcast anti-join: use THIS shape when
    the key set itself is corpus-sized.

    Scale notes: lineitem pre-collapses to DISTINCT orderkeys per batch
    (np.unique), so the shuffle carries distinct keys per block, not fact
    rows; per-shard state is one sorted membership array."""
    import numpy as np

    from ._util import strip_schema_metadata

    _MERGED = pa.schema(
        [
            ("oshard", pa.int32()),
            ("key", pa.int64()),
            ("custkey", pa.int64()),
            ("side", pa.int8()),
        ]
    )

    def _shard_of(keys: "np.ndarray") -> "np.ndarray":
        return (((keys * 2654435761) % (1 << 32)) % num_shards).astype(np.int32)

    def ord_rows(t: pa.Table) -> pa.Table:
        okey = t.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "oshard": pa.array(_shard_of(okey)),
                "key": pa.array(okey, pa.int64()),
                "custkey": t.column("o_custkey").cast(pa.int64()),
                "side": pa.array(np.ones(len(okey), dtype=np.int8), pa.int8()),
            },
            schema=_MERGED,
        )

    def li_keys(t: pa.Table) -> pa.Table:
        k = np.unique(
            t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return pa.table(
            {
                "oshard": pa.array(_shard_of(k)),
                "key": pa.array(k, pa.int64()),
                "custkey": pa.array(np.zeros(len(k), dtype=np.int64), pa.int64()),
                "side": pa.array(np.zeros(len(k), dtype=np.int8), pa.int8()),
            },
            schema=_MERGED,
        )

    orders = strip_schema_metadata(
        ray.data.read_parquet(_pq(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"])
    ).map_batches(ord_rows, batch_format="pyarrow")
    li = strip_schema_metadata(
        ray.data.read_parquet(_pq(sf_dir, "lineitem"), columns=["l_orderkey"])
    ).map_batches(li_keys, batch_format="pyarrow")

    _OUT = pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())])

    def anti(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        side = g.column("side").to_numpy(zero_copy_only=False)
        keys = g.column("key").to_numpy(zero_copy_only=False)
        have = np.unique(keys[side == 0])
        ok = keys[side == 1]
        ck = g.column("custkey").to_numpy(zero_copy_only=False)[side == 1]
        pos = np.searchsorted(have, ok)
        miss = (pos >= len(have)) | (have[np.minimum(pos, max(len(have) - 1, 0))] != ok)
        return pa.table(
            {
                "o_orderkey": pa.array(ok[miss], pa.int64()),
                "o_custkey": pa.array(ck[miss], pa.int64()),
            },
            schema=_OUT,
        )

    from ._util import absorb_empty_blocks

    return (
        absorb_empty_blocks(orders.union(li), batch_size=131072)
        .groupby("oshard")
        .map_groups(anti, batch_format="pyarrow")
    )


def daily_active_users(sf_dir: str, n_shards: int = 64) -> ray.data.Dataset:
    """DAU — distinct users per UTC day: the two-stage-distinct shape keyed
    by time bucket.  Per batch: collapse to DISTINCT (day, user) pairs (one
    packed-int64 np.unique); pairs hash-shard by (day, user) so every copy
    lands in one shard; each shard dedups and emits per-day partial counts,
    which are additive across shards (shards partition the pair space)."""
    import numpy as np

    from ._util import absorb_empty_blocks, int_segment_sum

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["ts", "user_id"])
    _US_PER_DAY = 86_400_000_000

    def pairs(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = us // _US_PER_DAY
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        packed = np.unique((day << 32) | u)  # user_id < 2^32 by testdata shape
        return pa.table(
            {
                "pshard": pa.array(
                    (((packed * 2654435761) % (1 << 32)) % n_shards).astype(np.int32)
                ),
                "packed": pa.array(packed, pa.int64()),
            }
        )

    _PART = pa.schema([("day_i", pa.int64()), ("n", pa.int64())])

    def shard_count(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _PART.empty_table()
        uniq = np.unique(g.column("packed").to_numpy(zero_copy_only=False))
        day = uniq >> 32
        new = np.ones(len(day), dtype=bool)
        new[1:] = day[1:] != day[:-1]
        starts = np.flatnonzero(new)
        return pa.table(
            {
                "day_i": pa.array(day[starts], pa.int64()),
                "n": pa.array(int_segment_sum(np.ones(len(day), np.int64), starts)),
            },
            schema=_PART,
        )

    agg = (
        absorb_empty_blocks(
            ds.map_batches(pairs, batch_format="pyarrow"), batch_size=131072
        )
        .groupby("pshard")
        .map_groups(
            lambda g: shard_count(_dropg(g, ["pshard"])), batch_format="pyarrow"
        )
        .groupby("day_i")
        .aggregate(Sum("n", alias_name="n_users"))
    )

    def label(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.multiply(t.column("day_i"), _US_PER_DAY), pa.timestamp("us")
        )
        return pa.table({"day": day, "n_users": t.column("n_users")})

    return agg.map_batches(label, batch_format="pyarrow").sort("day")


def session_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-SESSION rows (sessionize emits per-user rollups): session index
    within user, event count, and duration — the table session-replay /
    engagement analytics feed from.  Same coarse user-shard groupby and one
    vectorized numpy pass: session boundaries by gap rule, per-segment
    counts via run starts, duration from the sorted run's endpoints."""
    import numpy as np

    from ._util import strip_schema_metadata

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts"])
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000

    def add_shard(t: pa.Table) -> pa.Table:
        shard = pc.cast(
            pc.bit_wise_and(t.column("user_id"), SESSION_SHARDS - 1), pa.int32()
        )
        return t.append_column("shard", shard)

    _OUT = pa.schema(
        [
            ("user_id", pa.int64()),
            ("session_idx", pa.int64()),
            ("n_events", pa.int64()),
            ("duration_sec", pa.int64()),
        ]
    )

    def per_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        g = g.sort_by([("user_id", "ascending"), ("ts", "ascending")])
        uid = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = pc.cast(g.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        new_user = np.ones(len(uid), dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        diff = np.empty(len(ts), dtype=np.int64)
        diff[0] = 0
        diff[1:] = ts[1:] - ts[:-1]
        new_session = new_user | (diff > gap_us)
        s_starts = np.flatnonzero(new_session)
        s_ends = np.append(s_starts[1:], len(uid))
        su = uid[s_starts]
        first = np.ones(len(su), dtype=bool)
        first[1:] = su[1:] != su[:-1]
        seg0 = np.maximum.accumulate(np.where(first, np.arange(len(su)), 0))
        ordinal = np.arange(len(su)) - seg0
        return pa.table(
            {
                "user_id": pa.array(su, pa.int64()),
                "session_idx": pa.array(ordinal.astype(np.int64), pa.int64()),
                "n_events": pa.array((s_ends - s_starts).astype(np.int64), pa.int64()),
                "duration_sec": pa.array(
                    (ts[s_ends - 1] - ts[s_starts]) // 1_000_000, pa.int64()
                ),
            },
            schema=_OUT,
        )

    return (
        ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(per_shard, batch_format="pyarrow")
    )


def user_first_seen(sf_dir: str, n_shards: int = 64) -> ray.data.Dataset:
    """New users per UTC day (growth accounting: the new-vs-returning
    split's "new" curve).  A global per-key MIN followed by a time-bucket
    count: per batch collapse to per-user min timestamp (one lexsort +
    run firsts — min is associative, so batch minima are a valid
    combiner), hash-shard by user so every partial for a user lands in
    one shard, each shard resolves the global min per user and emits
    per-day partial counts (additive across shards — shards partition
    the user space).  Only |distinct users per block| rows ever shuffle.
    """
    import numpy as np

    from ._util import absorb_empty_blocks, int_segment_sum

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["ts", "user_id"])
    _US_PER_DAY = 86_400_000_000

    _PAIR = pa.schema(
        [("ushard", pa.int32()), ("user", pa.int64()), ("min_us", pa.int64())]
    )

    def partial_min(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((us, u))
        su, sus = u[order], us[order]
        first = np.ones(len(su), dtype=bool)
        first[1:] = su[1:] != su[:-1]
        keep = np.flatnonzero(first)
        ku = su[keep]
        return pa.table(
            {
                "ushard": pa.array(
                    (((ku * 2654435761) % (1 << 32)) % n_shards).astype(np.int32)
                ),
                "user": pa.array(ku, pa.int64()),
                "min_us": pa.array(sus[keep], pa.int64()),
            },
            schema=_PAIR,
        )

    _PART = pa.schema([("day_i", pa.int64()), ("n", pa.int64())])

    def shard_days(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _PART.empty_table()
        u = g.column("user").to_numpy(zero_copy_only=False)
        us = g.column("min_us").to_numpy(zero_copy_only=False)
        order = np.lexsort((us, u))
        su, sus = u[order], us[order]
        first = np.ones(len(su), dtype=bool)
        first[1:] = su[1:] != su[:-1]
        day = np.sort(sus[np.flatnonzero(first)] // _US_PER_DAY)
        new = np.ones(len(day), dtype=bool)
        new[1:] = day[1:] != day[:-1]
        starts = np.flatnonzero(new)
        return pa.table(
            {
                "day_i": pa.array(day[starts], pa.int64()),
                "n": pa.array(int_segment_sum(np.ones(len(day), np.int64), starts)),
            },
            schema=_PART,
        )

    agg = (
        absorb_empty_blocks(
            ds.map_batches(partial_min, batch_format="pyarrow"), batch_size=131072
        )
        .groupby("ushard")
        .map_groups(
            lambda g: shard_days(_dropg(g, ["ushard"])), batch_format="pyarrow"
        )
        .groupby("day_i")
        .aggregate(Sum("n", alias_name="n_new_users"))
    )

    def label(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.multiply(t.column("day_i"), _US_PER_DAY), pa.timestamp("us"))
        return pa.table({"day": day, "n_new_users": t.column("n_new_users")})

    return agg.map_batches(label, batch_format="pyarrow").sort("day")


def order_details(sf_dir: str, num_shards: int = 64) -> ray.data.Dataset:
    """Row-LEVEL fact-fact inner equi-join (urgent orders x their
    lineitems) — the canonical hash-partition (repartition) join, for when
    the join must emit JOINED ROWS rather than an aggregate and neither
    side is broadcastable: both facts project to slim payload rows, union
    into one orderkey-shard stream, and each shard does a vectorized
    sorted-merge probe (orders are unique per key, so one searchsorted).
    Contrast brand_revenue (broadcast small side) and
    orders_without_lineitems (anti-join, keys only): this is the shape
    that moves per-row payloads and streams join output block-by-block.

    Scale notes: each side ships only the projected payload columns; the
    probe filter is pushed into the orders READ (row-group pruning); the
    output is fact-sized but never concentrated — each shard emits its own
    blocks straight into the downstream stream."""
    import numpy as np

    from ._util import absorb_empty_blocks

    _MERGED = pa.schema(
        [
            ("oshard", pa.int32()),
            ("key", pa.int64()),
            ("side", pa.int8()),
            ("a", pa.int64()),  # orders: o_custkey     | lineitem: l_linenumber
            ("b", pa.int64()),  # orders: o_orderdate us | lineitem: price cents
        ]
    )

    def _shard_of(keys: "np.ndarray") -> "np.ndarray":
        return (((keys * 2654435761) % (1 << 32)) % num_shards).astype(np.int32)

    def ord_rows(t: pa.Table) -> pa.Table:
        okey = t.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "oshard": pa.array(_shard_of(okey)),
                "key": pa.array(okey, pa.int64()),
                "side": pa.array(np.ones(len(okey), dtype=np.int8), pa.int8()),
                "a": t.column("o_custkey").cast(pa.int64()),
                "b": t.column("o_orderdate").cast(pa.int64()),
            },
            schema=_MERGED,
        )

    def li_rows(t: pa.Table) -> pa.Table:
        lkey = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        price_c = np.floor(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "oshard": pa.array(_shard_of(lkey)),
                "key": pa.array(lkey, pa.int64()),
                "side": pa.array(np.zeros(len(lkey), dtype=np.int8), pa.int8()),
                "a": t.column("l_linenumber").cast(pa.int64()),
                "b": pa.array(price_c, pa.int64()),
            },
            schema=_MERGED,
        )

    orders = ray.data.read_parquet(
        _pq(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderpriority") == "1-URGENT"),
    ).map_batches(ord_rows, batch_format="pyarrow")
    li = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
    ).map_batches(li_rows, batch_format="pyarrow")

    _OUT = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("l_linenumber", pa.int64()),
            ("o_custkey", pa.int64()),
            ("o_orderdate", pa.timestamp("us")),
            ("l_price_c", pa.int64()),
        ]
    )

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        side = g.column("side").to_numpy(zero_copy_only=False)
        keys = g.column("key").to_numpy(zero_copy_only=False)
        a = g.column("a").to_numpy(zero_copy_only=False)
        b = g.column("b").to_numpy(zero_copy_only=False)
        bmask = side == 1
        bkey, bcust, bdate = keys[bmask], a[bmask], b[bmask]
        if len(bkey) == 0:
            # Selective order filter can empty a shard's build side while
            # lineitem probes remain; the fancy-indexed probe would
            # IndexError on an empty build array.
            return _OUT.empty_table()
        order = np.argsort(bkey)
        bkey, bcust, bdate = bkey[order], bcust[order], bdate[order]
        pk, pln, pprice = keys[~bmask], a[~bmask], b[~bmask]
        pos = np.searchsorted(bkey, pk)
        hit = (pos < len(bkey)) & (
            bkey[np.minimum(pos, max(len(bkey) - 1, 0))] == pk
        )
        pos = pos[hit]
        return pa.table(
            {
                "o_orderkey": pa.array(pk[hit], pa.int64()),
                "l_linenumber": pa.array(pln[hit], pa.int64()),
                "o_custkey": pa.array(bcust[pos], pa.int64()),
                "o_orderdate": pa.array(bdate[pos], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "l_price_c": pa.array(pprice[hit], pa.int64()),
            },
            schema=_OUT,
        )

    return (
        absorb_empty_blocks(orders.union(li), batch_size=131072)
        .groupby("oshard")
        .map_groups(merge, batch_format="pyarrow")
    )


def _splitmix_u64(x: "np.ndarray", seed: int) -> "np.ndarray":
    """Vectorized splitmix64 finalizer over uint64 keys (wrapping mults)."""
    import numpy as np

    x = (x.astype(np.uint64) + np.uint64(seed)) * np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _bloom_of(ds, col: str, m_bits: int = 1 << 17, k_hashes: int = 4):
    """OR-mergeable bloom over ``ds[col]`` (int keys): one M/8-byte word
    row per block, OR-merged on the driver — bounded state at ANY input
    size (order_details_bloom's shape, factored for the join chains).
    Returns the plasma ref of the uint64 word array."""
    import numpy as np

    n_words = m_bits // 64

    def partial(t: pa.Table) -> pa.Table:
        keys = t.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        words = np.zeros(n_words, dtype=np.uint64)
        for j in range(k_hashes):
            idx = _splitmix_u64(keys, j + 1) % np.uint64(m_bits)
            np.bitwise_or.at(
                words, (idx >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (idx & np.uint64(63)),
            )
        return pa.table(
            {"words": pa.array([words.astype(np.int64).tolist()], pa.list_(pa.int64()))}
        )

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    words = (
        np.bitwise_or.reduce(
            np.asarray([r["words"] for r in rows], dtype=np.int64).astype(np.uint64),
            axis=0,
        )
        if rows
        else np.zeros(n_words, dtype=np.uint64)
    )
    return ray.put(words)


def _bloom_keep(keys, words, m_bits: int = 1 << 17, k_hashes: int = 4):
    """Vectorized membership probe: True where the key MIGHT be in the set
    (false positives pass; the exact shard merge drops them)."""
    import numpy as np

    keep = np.ones(len(keys), dtype=bool)
    for j in range(k_hashes):
        idx = _splitmix_u64(keys, j + 1) % np.uint64(m_bits)
        keep &= (
            words[(idx >> np.uint64(6)).astype(np.int64)] >> (idx & np.uint64(63))
        ) & np.uint64(1) != 0
    return keep


def order_details_bloom(
    sf_dir: str,
    num_shards: int = 64,
    m_bits: int = 1 << 17,
    k_hashes: int = 4,
) -> ray.data.Dataset:
    """``order_details`` with BLOOM-FILTER JOIN PRUNING — the standard
    100-TB shuffle-join optimization: build an OR-mergeable bloom over the
    (filtered, much smaller) build side's keys, broadcast it once via
    ``ray.put``, and drop probe rows that cannot match BEFORE they enter
    the all-to-all.  False positives pass the bloom but are dropped by the
    exact sorted-merge probe in the shard, so the output is byte-identical
    to ``order_details`` (same oracle) — only the shuffled probe volume
    changes (~|selectivity| + FP-rate of lineitem instead of all of it).

    Scale notes: bloom partials are one M/8-byte word row per block,
    OR-merged on the driver (bounded state, any retry/partitioning gives
    the same filter); size ``m_bits`` ~ 10x the expected build keys for a
    ~1% FP rate and grow it with the build side (or partition the filter
    by key range) — the filter is per-RUN state, never per-row."""
    import numpy as np

    from ._util import absorb_empty_blocks

    n_words = m_bits // 64

    def bloom_partial(t: pa.Table) -> pa.Table:
        okey = t.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        words = np.zeros(n_words, dtype=np.uint64)
        for j in range(k_hashes):
            idx = _splitmix_u64(okey, j + 1) % np.uint64(m_bits)
            np.bitwise_or.at(
                words, (idx >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (idx & np.uint64(63)),
            )
        return pa.table(
            {"words": pa.array([words.astype(np.int64).tolist()], pa.list_(pa.int64()))}
        )

    build_read = dict(
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderpriority") == "1-URGENT"),
    )
    partials = (
        ray.data.read_parquet(_pq(sf_dir, "orders"), **build_read)
        .map_batches(bloom_partial, batch_format="pyarrow")
        .take_all()
    )  # one M/8-byte row per block
    bloom = np.bitwise_or.reduce(
        np.asarray([r["words"] for r in partials], dtype=np.int64).astype(np.uint64),
        axis=0,
    ) if partials else np.zeros(n_words, dtype=np.uint64)
    bloom_ref = ray.put(bloom)

    _MERGED = pa.schema(
        [
            ("oshard", pa.int32()),
            ("key", pa.int64()),
            ("side", pa.int8()),
            ("a", pa.int64()),
            ("b", pa.int64()),
        ]
    )

    def _shard_of(keys: "np.ndarray") -> "np.ndarray":
        return (((keys * 2654435761) % (1 << 32)) % num_shards).astype(np.int32)

    def ord_rows(t: pa.Table) -> pa.Table:
        okey = t.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "oshard": pa.array(_shard_of(okey)),
                "key": pa.array(okey, pa.int64()),
                "side": pa.array(np.ones(len(okey), dtype=np.int8), pa.int8()),
                "a": t.column("o_custkey").cast(pa.int64()),
                "b": t.column("o_orderdate").cast(pa.int64()),
            },
            schema=_MERGED,
        )

    def li_rows_pruned(t: pa.Table) -> pa.Table:
        """ray.get per batch is a plasma zero-copy handle (one physical
        copy per node); probe rows failing any hash row never shuffle."""
        w = ray.get(bloom_ref)
        lkey = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.ones(len(lkey), dtype=bool)
        for j in range(k_hashes):
            idx = _splitmix_u64(lkey, j + 1) % np.uint64(m_bits)
            keep &= (
                w[(idx >> np.uint64(6)).astype(np.int64)]
                >> (idx & np.uint64(63))
            ) & np.uint64(1) != 0
        t = t.filter(pa.array(keep))
        lkey = lkey[keep]
        price_c = np.floor(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "oshard": pa.array(_shard_of(lkey)),
                "key": pa.array(lkey, pa.int64()),
                "side": pa.array(np.zeros(len(lkey), dtype=np.int8), pa.int8()),
                "a": t.column("l_linenumber").cast(pa.int64()),
                "b": pa.array(price_c, pa.int64()),
            },
            schema=_MERGED,
        )

    orders = ray.data.read_parquet(_pq(sf_dir, "orders"), **build_read).map_batches(
        ord_rows, batch_format="pyarrow"
    )
    li = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
    ).map_batches(li_rows_pruned, batch_format="pyarrow")

    _OUT = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("l_linenumber", pa.int64()),
            ("o_custkey", pa.int64()),
            ("o_orderdate", pa.timestamp("us")),
            ("l_price_c", pa.int64()),
        ]
    )

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        side = g.column("side").to_numpy(zero_copy_only=False)
        keys = g.column("key").to_numpy(zero_copy_only=False)
        a = g.column("a").to_numpy(zero_copy_only=False)
        b = g.column("b").to_numpy(zero_copy_only=False)
        bmask = side == 1
        bkey, bcust, bdate = keys[bmask], a[bmask], b[bmask]
        if len(bkey) == 0:
            return _OUT.empty_table()
        order = np.argsort(bkey)
        bkey, bcust, bdate = bkey[order], bcust[order], bdate[order]
        pk, pln, pprice = keys[~bmask], a[~bmask], b[~bmask]
        pos = np.searchsorted(bkey, pk)
        hit = (pos < len(bkey)) & (
            bkey[np.minimum(pos, max(len(bkey) - 1, 0))] == pk
        )  # bloom false positives die here — output stays exact
        pos = pos[hit]
        return pa.table(
            {
                "o_orderkey": pa.array(pk[hit], pa.int64()),
                "l_linenumber": pa.array(pln[hit], pa.int64()),
                "o_custkey": pa.array(bcust[pos], pa.int64()),
                "o_orderdate": pa.array(bdate[pos], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "l_price_c": pa.array(pprice[hit], pa.int64()),
            },
            schema=_OUT,
        )

    return (
        absorb_empty_blocks(orders.union(li), batch_size=131072)
        .groupby("oshard")
        .map_groups(merge, batch_format="pyarrow")
    )


def copurchase_pairs(
    sf_dir: str,
    k: int = 20,
    n_shards: int = 64,
    n_pair_shards: int = 64,
    max_basket: int = 64,
) -> ray.data.Dataset:
    """Market-basket pair mining (the frequent-itemset / co-occurrence
    kernel): the top-k part PAIRS appearing together in the most orders.
    Never a self-join: baskets co-locate by order hash, each shard expands
    its baskets' distinct-part pairs with a VECTORIZED triangular index
    build (no per-basket python loop), pre-counts pairs locally, and the
    pair-sharded segment sum + per-shard partial top-k means only
    <= n_pair_shards * k survivor rows reach the final sort.  Pair volume
    is sum(min(basket, max_basket)^2): baskets above ``max_basket``
    distinct parts are DROPPED before expansion (the standard
    market-basket fanout cap, mirrored in the SQL oracle, same discipline
    as ngram dedup's max_df) so one pathological order can never emit a
    quadratic shard."""
    import numpy as np

    from ._util import absorb_empty_blocks, int_segment_sum

    ds = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"), columns=["l_orderkey", "l_partkey"]
    )

    def key_rows(t: pa.Table) -> pa.Table:
        o = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        p = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(p) and (p.max() >= (1 << 21) or p.min() < 0):
            raise ValueError(
                "copurchase_pairs: partkey must be in [0, 2^21) for the "
                "int64 (orderkey<<21)|partkey pack; got max %d" % int(p.max())
            )
        if len(o) and (o.max() >= (1 << 42) or o.min() < 0):
            raise ValueError(
                "copurchase_pairs: orderkey must be in [0, 2^42) for the "
                "int64 (orderkey<<21)|partkey pack; got max %d" % int(o.max())
            )
        packed = np.unique((o << 21) | p)
        o = packed >> 21
        return pa.table(
            {
                "oshard": pa.array(
                    (((o * 2654435761) % (1 << 32)) % n_shards).astype(np.int32)
                ),
                "packed": pa.array(packed, pa.int64()),
            }
        )

    _PAIRS = pa.schema([("pshard", pa.int32()), ("pair", pa.int64()), ("n", pa.int64())])

    def expand_pairs(g: pa.Table) -> pa.Table:
        """Triangular within-basket pair expansion, fully vectorized:
        element i (sorted by (order, part)) pairs with the c_i elements
        after it in its run; b-indices come from one arange minus the
        repeated block starts."""
        if g.num_rows == 0:
            return _PAIRS.empty_table()
        packed = np.unique(g.column("packed").to_numpy(zero_copy_only=False))
        o = packed >> 21
        new = np.ones(len(o), dtype=bool)
        new[1:] = o[1:] != o[:-1]
        lens = np.diff(np.append(np.flatnonzero(new), len(o)))
        elem_keep = np.repeat(lens <= max_basket, lens)  # fanout cap
        packed = packed[elem_keep]
        o, p = packed >> 21, packed & ((1 << 21) - 1)
        if len(o) == 0:
            return _PAIRS.empty_table()
        new = np.ones(len(o), dtype=bool)
        new[1:] = o[1:] != o[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(o))
        run_end = np.repeat(ends, np.diff(np.append(starts, len(o))))
        counts = run_end - np.arange(len(o)) - 1  # pairs led by each element
        a_idx = np.repeat(np.arange(len(o)), counts)
        blk = np.cumsum(counts) - counts
        b_idx = a_idx + 1 + (np.arange(counts.sum()) - np.repeat(blk, counts))
        pair = (p[a_idx] << 21) | p[b_idx]  # part_a < part_b by sort order
        upair, cnt = np.unique(pair, return_counts=True)
        return pa.table(
            {
                "pshard": pa.array(
                    (((upair * 2654435761) % (1 << 32)) % n_pair_shards).astype(
                        np.int32
                    )
                ),
                "pair": pa.array(upair, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            },
            schema=_PAIRS,
        )

    _OUT = pa.schema(
        [("part_a", pa.int64()), ("part_b", pa.int64()), ("n_orders", pa.int64())]
    )

    def shard_topk(g: pa.Table) -> pa.Table:
        """Pairs partition by pshard, so per-shard totals are global totals
        and a per-shard top-k is an exact prefilter."""
        if g.num_rows == 0:
            return _OUT.empty_table()
        pair = g.column("pair").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(pair, kind="stable")
        pair, n = pair[order], n[order]
        new = np.ones(len(pair), dtype=bool)
        new[1:] = pair[1:] != pair[:-1]
        starts = np.flatnonzero(new)
        upair = pair[starts]
        tot = int_segment_sum(n, starts)
        # (n desc, pair asc) total order == the SQL ORDER BY tie-break
        top = np.lexsort((upair, -tot))[:k]
        return pa.table(
            {
                "part_a": pa.array(upair[top] >> 21, pa.int64()),
                "part_b": pa.array(upair[top] & ((1 << 21) - 1), pa.int64()),
                "n_orders": pa.array(tot[top], pa.int64()),
            },
            schema=_OUT,
        )

    survivors = (
        absorb_empty_blocks(
            absorb_empty_blocks(
                ds.map_batches(key_rows, batch_format="pyarrow"), batch_size=131072
            )
            .groupby("oshard")
            .map_groups(
                lambda g: expand_pairs(_dropg(g, ["oshard"])),
                batch_format="pyarrow",
            ),
            batch_size=131072,
        )
        .groupby("pshard")
        .map_groups(
            lambda g: shard_topk(_dropg(g, ["pshard"])), batch_format="pyarrow"
        )
    )
    return survivors.sort(
        ["n_orders", "part_a", "part_b"], descending=[True, False, False]
    ).limit(k)


def data_quality_report(sf_dir: str, n_shards: int = 64) -> pa.Table:
    """Data-contract validation (the expectations/audit pass every pipeline
    runs before training): one report row per CHECK with its violation
    count over lineitem — null field, non-positive price, out-of-range
    discount, duplicate primary key (o_orderkey, l_linenumber), and
    dangling foreign key (lineitem rows whose order does not exist).

    Scale shape: the scalar checks reduce to ONE counter row per block
    (driver sees <= |blocks| rows); duplicate-pk is the two-stage-distinct
    shape (per-batch np.unique over packed keys, pair-shard dedup,
    additive per-shard distinct counts); the FK check is the shuffle
    anti-join shape with per-key ROW counts riding the probe side so the
    violation count weights rows, not keys.  Nothing fact-sized reaches
    the driver."""
    import numpy as np

    from ._util import absorb_empty_blocks

    cols = [
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    ]
    li = ray.data.read_parquet(_pq(sf_dir, "lineitem"), columns=cols)

    # ---- scalar per-row checks: one partial counter row per block --------
    def scalar_partial(t: pa.Table) -> pa.Table:
        q = t.column("l_quantity")
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "rows_total": pa.array([t.num_rows], pa.int64()),
                "null_quantity": pa.array([q.null_count], pa.int64()),
                "nonpositive_price": pa.array([int((price <= 0).sum())], pa.int64()),
                "discount_out_of_range": pa.array(
                    [int(((disc < 0) | (disc > 1)).sum())], pa.int64()
                ),
            }
        )

    scalars = li.map_batches(scalar_partial, batch_format="pyarrow").take_all()
    agg = {
        k: sum(r[k] for r in scalars)
        for k in ("rows_total", "null_quantity", "nonpositive_price",
                  "discount_out_of_range")
    }

    # ---- duplicate PK: two-stage distinct over packed (okey, linenumber) -
    def pk_partial(t: pa.Table) -> pa.Table:
        o = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        ln = t.column("l_linenumber").to_numpy(zero_copy_only=False).astype(np.int64)
        # dirty VALUES are what this op counts, but dirty KEY WIDTHS would
        # silently corrupt the pack — those raise loudly instead
        if len(ln) and (
            ln.max() >= 8 or ln.min() < 0 or o.max() >= (1 << 60) or o.min() < 0
        ):
            raise ValueError(
                "data_quality_report: (orderkey << 3) | linenumber pack "
                "requires linenumber in [0, 8) and orderkey in [0, 2^60); "
                "got linenumber max %d, orderkey max %d"
                % (int(ln.max()), int(o.max()))
            )
        packed = np.unique((o << 3) | ln)  # linenumber in 1..7 (3 bits)
        return pa.table(
            {
                "pshard": pa.array(
                    (((packed * 2654435761) % (1 << 32)) % n_shards).astype(np.int32)
                ),
                "packed": pa.array(packed, pa.int64()),
            }
        )

    def pk_count(g: pa.Table) -> pa.Table:
        n = len(np.unique(g.column("packed").to_numpy(zero_copy_only=False)))
        return pa.table({"n": pa.array([n], pa.int64())})

    distinct_rows = (
        absorb_empty_blocks(
            li.map_batches(pk_partial, batch_format="pyarrow"), batch_size=131072
        )
        .groupby("pshard")
        .map_groups(
            lambda g: pk_count(_dropg(g, ["pshard"])), batch_format="pyarrow"
        )
        .take_all()  # <= n_shards rows
    )
    dup_pk = agg["rows_total"] - sum(r["n"] for r in distinct_rows)

    # ---- dangling FK: shuffle anti-join with row counts on the probe side
    _KEYS = pa.schema([("kshard", pa.int32()), ("key", pa.int64()),
                       ("cnt", pa.int64()), ("side", pa.int8())])

    def li_keys(t: pa.Table) -> pa.Table:
        k = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        uk, cnt = np.unique(k, return_counts=True)
        return pa.table(
            {
                "kshard": pa.array(
                    (((uk * 2654435761) % (1 << 32)) % n_shards).astype(np.int32)
                ),
                "key": pa.array(uk, pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
                "side": pa.array(np.zeros(len(uk), np.int8), pa.int8()),
            },
            schema=_KEYS,
        )

    def ord_keys(t: pa.Table) -> pa.Table:
        k = np.unique(
            t.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return pa.table(
            {
                "kshard": pa.array(
                    (((k * 2654435761) % (1 << 32)) % n_shards).astype(np.int32)
                ),
                "key": pa.array(k, pa.int64()),
                "cnt": pa.array(np.zeros(len(k), np.int64), pa.int64()),
                "side": pa.array(np.ones(len(k), np.int8), pa.int8()),
            },
            schema=_KEYS,
        )

    def dangling(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"n": pa.array([0], pa.int64())})
        side = g.column("side").to_numpy(zero_copy_only=False)
        keys = g.column("key").to_numpy(zero_copy_only=False)
        cnt = g.column("cnt").to_numpy(zero_copy_only=False)
        have = np.unique(keys[side == 1])
        pk, pc_ = keys[side == 0], cnt[side == 0]
        if len(have) == 0:
            # No orders landed in this shard: every lineitem key dangles.
            return pa.table({"n": pa.array([int(pc_.sum())], pa.int64())})
        pos = np.searchsorted(have, pk)
        miss = (pos >= len(have)) | (have[np.minimum(pos, max(len(have) - 1, 0))] != pk)
        return pa.table({"n": pa.array([int(pc_[miss].sum())], pa.int64())})

    li_s = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"), columns=["l_orderkey"]
    ).map_batches(li_keys, batch_format="pyarrow")
    or_s = ray.data.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_orderkey"]
    ).map_batches(ord_keys, batch_format="pyarrow")
    dangle_rows = (
        absorb_empty_blocks(li_s.union(or_s), batch_size=131072)
        .groupby("kshard")
        .map_groups(
            lambda g: dangling(_dropg(g, ["kshard"])), batch_format="pyarrow"
        )
        .take_all()  # <= n_shards rows
    )
    dangling_fk = sum(r["n"] for r in dangle_rows)

    checks = sorted(
        [
            ("dangling_orderkey", dangling_fk),
            ("discount_out_of_range", agg["discount_out_of_range"]),
            ("duplicate_pk", dup_pk),
            ("nonpositive_price", agg["nonpositive_price"]),
            ("null_quantity", agg["null_quantity"]),
            ("rows_total", agg["rows_total"]),
        ]
    )
    return pa.table(
        {
            "check_name": pa.array([c for c, _ in checks], pa.string()),
            "n_violations": pa.array([int(v) for _, v in checks], pa.int64()),
        }
    )


def rolling_active_users(
    sf_dir: str, window_days: int = 7, n_shards: int = 64
) -> ray.data.Dataset:
    """Rolling distinct actives (WAU-style): for every day, the count of
    DISTINCT users active in the trailing ``window_days`` window.  Distinct
    sets don't difference, so a sliding distinct can't cumsum like
    rolling_event_stats — instead each (day, user) pair FANS OUT to the
    ``window_days`` window-end days it belongs to (vectorized repeat +
    arange), and the two-stage-distinct shape finishes: pairs hash-shard
    by (window_day, user) so every copy lands in one shard, shards dedup
    and emit additive per-day partial counts.  Shuffle volume is
    window_days x |distinct (day, user) per block| — bounded fan-out,
    never corpus x window.  Output is restricted to days with >= 1 event
    (the SQL mirror joins from the observed-day list)."""
    import numpy as np

    from ._util import absorb_empty_blocks, int_segment_sum

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["ts", "user_id"])
    _US_PER_DAY = 86_400_000_000

    def pairs(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = us // _US_PER_DAY
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        base = np.unique((day << 32) | u)  # user_id < 2^32 by testdata shape
        # fan out each (day, user) to its window-end days [day, day+w-1];
        # observed days also ride along (bit 62 tags an observed-day row;
        # fan values keep day in bits 32..62, far below the tag)
        w = np.arange(window_days, dtype=np.int64)
        fan = (base[:, None] + (w << 32)[None, :]).ravel()
        fan = np.unique(fan)
        obs = np.unique(day) | (1 << 62)
        packed = np.concatenate([fan, obs])
        return pa.table(
            {
                "pshard": pa.array(
                    (((packed * 2654435761) % (1 << 32)) % n_shards).astype(np.int32)
                ),
                "packed": pa.array(packed, pa.int64()),
            }
        )

    _PART = pa.schema(
        [("day_i", pa.int64()), ("n", pa.int64()), ("observed", pa.bool_())]
    )

    def shard_count(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _PART.empty_table()
        uniq = np.unique(g.column("packed").to_numpy(zero_copy_only=False))
        obs_mask = (uniq & (1 << 62)) != 0
        obs_days = uniq[obs_mask] & ~(1 << 62)
        uniq = uniq[~obs_mask]
        day = uniq >> 32
        new = np.ones(len(day), dtype=bool)
        new[1:] = day[1:] != day[:-1]
        starts = np.flatnonzero(new)
        return pa.table(
            {
                "day_i": pa.array(
                    np.concatenate([day[starts], obs_days]), pa.int64()
                ),
                "n": pa.array(
                    np.concatenate(
                        [
                            int_segment_sum(np.ones(len(day), np.int64), starts),
                            np.zeros(len(obs_days), np.int64),
                        ]
                    )
                ),
                "observed": pa.array(
                    np.concatenate(
                        [np.zeros(len(starts), bool), np.ones(len(obs_days), bool)]
                    )
                ),
            },
            schema=_PART,
        )

    agg = (
        absorb_empty_blocks(
            ds.map_batches(pairs, batch_format="pyarrow"), batch_size=131072
        )
        .groupby("pshard")
        .map_groups(
            lambda g: shard_count(_dropg(g, ["pshard"])), batch_format="pyarrow"
        )
        .groupby("day_i")
        .aggregate(
            Sum("n", alias_name="n_active"),
            Max("observed", alias_name="observed"),
        )
    )

    def label(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("observed"), True))
        day = pc.cast(pc.multiply(t.column("day_i"), _US_PER_DAY), pa.timestamp("us"))
        return pa.table(
            {"day": day, "n_active": pc.cast(t.column("n_active"), pa.int64())}
        )

    return agg.map_batches(label, batch_format="pyarrow").sort("day")


def order_lineitem_left(sf_dir: str, num_shards: int = 64) -> ray.data.Dataset:
    """Row-level fact-fact LEFT OUTER join — completes the shard-merge join
    triad (order_details = inner, orders_without_lineitems = anti): every
    LOW-priority order row appears, extended with each of its lineitem
    rows, or with NULL lineitem columns when none exist.  Same union
    co-partition as the inner join; the shard kernel emits matched rows
    via the searchsorted probe PLUS one null-extended row per unmatched
    build order (exactly SQL's null extension).

    Scale notes: identical to order_details — slim payloads only, filter
    pushed into the orders read, output streams per shard."""
    import numpy as np

    from ._util import absorb_empty_blocks

    _MERGED = pa.schema(
        [
            ("oshard", pa.int32()),
            ("key", pa.int64()),
            ("side", pa.int8()),
            ("a", pa.int64()),  # orders: o_custkey | lineitem: l_linenumber
            ("b", pa.int64()),  # orders: unused    | lineitem: price cents
        ]
    )

    def _shard_of(keys: "np.ndarray") -> "np.ndarray":
        return (((keys * 2654435761) % (1 << 32)) % num_shards).astype(np.int32)

    def ord_rows(t: pa.Table) -> pa.Table:
        okey = t.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "oshard": pa.array(_shard_of(okey)),
                "key": pa.array(okey, pa.int64()),
                "side": pa.array(np.ones(len(okey), dtype=np.int8), pa.int8()),
                "a": t.column("o_custkey").cast(pa.int64()),
                "b": pa.array(np.zeros(len(okey), np.int64), pa.int64()),
            },
            schema=_MERGED,
        )

    def li_rows(t: pa.Table) -> pa.Table:
        lkey = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        price_c = np.floor(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "oshard": pa.array(_shard_of(lkey)),
                "key": pa.array(lkey, pa.int64()),
                "side": pa.array(np.zeros(len(lkey), dtype=np.int8), pa.int8()),
                "a": t.column("l_linenumber").cast(pa.int64()),
                "b": pa.array(price_c, pa.int64()),
            },
            schema=_MERGED,
        )

    orders = ray.data.read_parquet(
        _pq(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey"],
        filter=(pc.field("o_orderpriority") == "5-LOW"),
    ).map_batches(ord_rows, batch_format="pyarrow")
    li = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
    ).map_batches(li_rows, batch_format="pyarrow")

    _OUT = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("o_custkey", pa.int64()),
            ("l_linenumber", pa.int64()),
            ("l_price_c", pa.int64()),
        ]
    )

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        side = g.column("side").to_numpy(zero_copy_only=False)
        keys = g.column("key").to_numpy(zero_copy_only=False)
        a = g.column("a").to_numpy(zero_copy_only=False)
        b = g.column("b").to_numpy(zero_copy_only=False)
        bmask = side == 1
        bkey, bcust = keys[bmask], a[bmask]
        if len(bkey) == 0:
            # Left side (orders) empty in this shard after the priority
            # filter: no matched rows and no null-extended rows to emit.
            return _OUT.empty_table()
        order = np.argsort(bkey)
        bkey, bcust = bkey[order], bcust[order]
        pk, pln, pprice = keys[~bmask], a[~bmask], b[~bmask]
        pos = np.searchsorted(bkey, pk)
        hit = (pos < len(bkey)) & (bkey[np.minimum(pos, max(len(bkey) - 1, 0))] == pk)
        pos = pos[hit]
        # unmatched build orders -> one null-extended row each
        matched = np.zeros(len(bkey), dtype=bool)
        matched[pos] = True
        un = ~matched
        n_m, n_u = int(hit.sum()), int(un.sum())
        null_i64 = pa.array(np.zeros(n_u, np.int64), mask=np.ones(n_u, bool))
        return pa.table(
            {
                "o_orderkey": pa.array(
                    np.concatenate([pk[hit], bkey[un]]), pa.int64()
                ),
                "o_custkey": pa.array(
                    np.concatenate([bcust[pos], bcust[un]]), pa.int64()
                ),
                "l_linenumber": pa.concat_arrays(
                    [pa.array(pln[hit], pa.int64()), null_i64]
                ),
                "l_price_c": pa.concat_arrays(
                    [pa.array(pprice[hit], pa.int64()), null_i64]
                ),
            },
            schema=_OUT,
        )

    return (
        absorb_empty_blocks(orders.union(li), batch_size=131072)
        .groupby("oshard")
        .map_groups(merge, batch_format="pyarrow")
    )


def order_lineitem_full(sf_dir: str, num_shards: int = 64) -> ray.data.Dataset:
    """Row-level fact-fact FULL OUTER join — the fourth leg of the
    shard-merge join family (order_details = inner,
    orders_without_lineitems = anti, order_lineitem_left = left): matched
    rows carry both sides, LOW-priority orders with no lineitems get NULL
    lineitem columns, and lineitems whose order misses the priority filter
    (or dangles) get NULL order columns.  ``orderkey`` is SQL's
    ``coalesce(o.o_orderkey, l.l_orderkey)`` so one key column covers both
    null extensions.

    Scale shape: identical to order_lineitem_left — slim payload
    projections union into one orderkey-shard stream (filter pushed into
    the orders read), per-shard sorted-membership probe; the kernel adds
    the third output class (probe rows with no build match) for free from
    the same ``hit`` mask.  Output streams per shard; nothing fact-sized
    reaches the driver."""
    import numpy as np

    from ._util import absorb_empty_blocks

    _MERGED = pa.schema(
        [
            ("oshard", pa.int32()),
            ("key", pa.int64()),
            ("side", pa.int8()),
            ("a", pa.int64()),  # orders: o_custkey | lineitem: l_linenumber
            ("b", pa.int64()),  # orders: unused    | lineitem: price cents
        ]
    )

    def _shard_of(keys: "np.ndarray") -> "np.ndarray":
        return (((keys * 2654435761) % (1 << 32)) % num_shards).astype(np.int32)

    def ord_rows(t: pa.Table) -> pa.Table:
        okey = t.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "oshard": pa.array(_shard_of(okey)),
                "key": pa.array(okey, pa.int64()),
                "side": pa.array(np.ones(len(okey), dtype=np.int8), pa.int8()),
                "a": t.column("o_custkey").cast(pa.int64()),
                "b": pa.array(np.zeros(len(okey), np.int64), pa.int64()),
            },
            schema=_MERGED,
        )

    def li_rows(t: pa.Table) -> pa.Table:
        lkey = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        price_c = np.floor(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "oshard": pa.array(_shard_of(lkey)),
                "key": pa.array(lkey, pa.int64()),
                "side": pa.array(np.zeros(len(lkey), dtype=np.int8), pa.int8()),
                "a": t.column("l_linenumber").cast(pa.int64()),
                "b": pa.array(price_c, pa.int64()),
            },
            schema=_MERGED,
        )

    orders = ray.data.read_parquet(
        _pq(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey"],
        filter=(pc.field("o_orderpriority") == "5-LOW"),
    ).map_batches(ord_rows, batch_format="pyarrow")
    li = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
    ).map_batches(li_rows, batch_format="pyarrow")

    _OUT = pa.schema(
        [
            ("orderkey", pa.int64()),
            ("o_custkey", pa.int64()),
            ("l_linenumber", pa.int64()),
            ("l_price_c", pa.int64()),
        ]
    )

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        side = g.column("side").to_numpy(zero_copy_only=False)
        keys = g.column("key").to_numpy(zero_copy_only=False)
        a = g.column("a").to_numpy(zero_copy_only=False)
        b = g.column("b").to_numpy(zero_copy_only=False)
        bmask = side == 1
        bkey, bcust = keys[bmask], a[bmask]
        pk, pln, pprice = keys[~bmask], a[~bmask], b[~bmask]
        order = np.argsort(bkey)
        bkey, bcust = bkey[order], bcust[order]
        if len(bkey) == 0:
            # no build rows in this shard: every probe row null-extends left
            n_p = len(pk)
            null_i64 = pa.array(np.zeros(n_p, np.int64), mask=np.ones(n_p, bool))
            return pa.table(
                {
                    "orderkey": pa.array(pk, pa.int64()),
                    "o_custkey": null_i64,
                    "l_linenumber": pa.array(pln, pa.int64()),
                    "l_price_c": pa.array(pprice, pa.int64()),
                },
                schema=_OUT,
            )
        pos = np.searchsorted(bkey, pk)
        hit = (pos < len(bkey)) & (bkey[np.minimum(pos, len(bkey) - 1)] == pk)
        mpos = pos[hit]
        miss = ~hit  # probe rows with no matching build order
        matched = np.zeros(len(bkey), dtype=bool)
        matched[mpos] = True
        un = ~matched  # build orders with no probe rows
        n_m, n_u, n_x = int(hit.sum()), int(un.sum()), int(miss.sum())
        null_u = pa.array(np.zeros(n_u, np.int64), mask=np.ones(n_u, bool))
        null_x = pa.array(np.zeros(n_x, np.int64), mask=np.ones(n_x, bool))
        return pa.table(
            {
                "orderkey": pa.array(
                    np.concatenate([pk[hit], bkey[un], pk[miss]]), pa.int64()
                ),
                "o_custkey": pa.concat_arrays(
                    [
                        pa.array(bcust[mpos], pa.int64()),
                        pa.array(bcust[un], pa.int64()),
                        null_x,
                    ]
                ),
                "l_linenumber": pa.concat_arrays(
                    [pa.array(pln[hit], pa.int64()), null_u,
                     pa.array(pln[miss], pa.int64())]
                ),
                "l_price_c": pa.concat_arrays(
                    [pa.array(pprice[hit], pa.int64()), null_u,
                     pa.array(pprice[miss], pa.int64())]
                ),
            },
            schema=_OUT,
        )

    return (
        absorb_empty_blocks(orders.union(li), batch_size=131072)
        .groupby("oshard")
        .map_groups(merge, batch_format="pyarrow")
    )


def doc_skyline(sf_dir: str) -> pa.Table:
    """SKYLINE (Pareto frontier) query — multi-objective data selection:
    the documents not dominated on (MAXIMIZE token count, MINIMIZE chars),
    i.e. the token-density frontier a curation pipeline selects from when
    two quality axes trade off.  Dominance is the standard strict skyline
    (b dominates a iff b is >= on both axes with at least one strict);
    ties on both axes all survive.

    Scale shape: the local frontier is a VALID COMBINER (any globally
    non-dominated point is locally non-dominated), so each block reduces
    to its own frontier — one lexsort + exclusive running-min over the
    block's DISTINCT (tokens, chars) points — and only local-frontier
    rows leave the workers; the driver finishes with the same kernel over
    the bounded candidate set.  Assumes the frontier (not the corpus)
    fits the driver — true for real quality axes; an anticorrelated
    adversarial corpus degrades to a corpus-sized frontier, in which case
    chain another frontier-of-frontiers pass."""
    import numpy as np
    import pyarrow.compute as pc_

    from ._util import absorb_empty_blocks

    ds = ray.data.read_parquet(
        _pq(sf_dir, "documents"), columns=["doc_id", "text", "n_chars"]
    )

    def _frontier(t: "np.ndarray", c: "np.ndarray") -> "np.ndarray":
        """Packed (t, c) points on the frontier; both axes must fit 21
        bits for the int64 pack — out-of-shape docs raise loudly instead
        of silently corrupting the frontier."""
        if len(t) and (
            t.max() >= (1 << 21) or t.min() < 0 or c.max() >= (1 << 21) or c.min() < 0
        ):
            raise ValueError(
                "doc_skyline: token/char counts must be in [0, 2^21) for "
                "the int64 pack; got tokens max %d, chars max %d — widen "
                "the pack or pre-clip the axes" % (int(t.max()), int(c.max()))
            )
        packed = np.unique((t << 21) | c)
        pt, pcn = packed >> 21, packed & ((1 << 21) - 1)
        order = np.lexsort((pcn, -pt))  # t desc, c asc
        packed, pcn = packed[order], pcn[order]
        cummin = np.minimum.accumulate(pcn)
        excl = np.concatenate(([np.int64(1) << 62], cummin[:-1]))
        return packed[pcn < excl]

    _OUT = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()), ("n_chars", pa.int64())]
    )

    def local(tb: pa.Table) -> pa.Table:
        t = (
            pc_.cast(
                pc_.count_substring_regex(pc_.fill_null(tb.column("text"), ""), r"\S+"),
                pa.int64(),
            )
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        c = tb.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        kept = _frontier(t, c)
        mask = np.isin((t << 21) | c, kept)
        return pa.table(
            {
                "doc_id": tb.column("doc_id").filter(pa.array(mask)),
                "n_tokens": pa.array(t[mask], pa.int64()),
                "n_chars": pa.array(c[mask], pa.int64()),
            },
            schema=_OUT,
        )

    rows = (
        absorb_empty_blocks(
            ds.map_batches(local, batch_format="pyarrow"), batch_size=131072
        ).take_all()  # local frontiers only
    )
    if not rows:
        return _OUT.empty_table()
    d = np.array([r["doc_id"] for r in rows], dtype=np.int64)
    t = np.array([r["n_tokens"] for r in rows], dtype=np.int64)
    c = np.array([r["n_chars"] for r in rows], dtype=np.int64)
    kept = _frontier(t, c)
    mask = np.isin((t << 21) | c, kept)
    order = np.lexsort((d[mask], c[mask], -t[mask]))
    return pa.table(
        {
            "doc_id": pa.array(d[mask][order], pa.int64()),
            "n_tokens": pa.array(t[mask][order], pa.int64()),
            "n_chars": pa.array(c[mask][order], pa.int64()),
        },
        schema=_OUT,
    )


def user_favorite_event(sf_dir: str, n_shards: int = 64) -> ray.data.Dataset:
    """Per-group MODE — each user's most frequent event type (ties broken
    by lexicographically smallest type), the categorical summary aggregate
    Ray's Aggregate API lacks.  Mode is NOT associative, but its COUNT
    table is: per batch collapse to (user, type, partial n) rows — one
    np.unique over dictionary-encoded pairs — hash-shard by user, and each
    shard finishes with exact segment sums + a vectorized argmax under the
    (n desc, type asc) order.  Only distinct (user, type) pair rows per
    block ever shuffle."""
    import numpy as np

    from ._util import absorb_empty_blocks, int_segment_sum

    ds = ray.data.read_parquet(
        _pq(sf_dir, "events"), columns=["user_id", "event_type"]
    )

    _PART = pa.schema(
        [
            ("ushard", pa.int32()),
            ("user", pa.int64()),
            ("etype", pa.string()),
            ("n", pa.int64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        enc = t.column("event_type").combine_chunks().dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        packed, cnt = np.unique((u << 8) | idx, return_counts=True)
        pu, pidx = packed >> 8, packed & 0xFF
        return pa.table(
            {
                "ushard": pa.array(
                    (((pu * 2654435761) % (1 << 32)) % n_shards).astype(np.int32)
                ),
                "user": pa.array(pu, pa.int64()),
                "etype": enc.dictionary.take(pa.array(pidx, pa.int32())),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            },
            schema=_PART,
        )

    _OUT = pa.schema(
        [("user_id", pa.int64()), ("favorite", pa.string()), ("n_events", pa.int64())]
    )

    def shard_mode(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        g = g.sort_by([("user", "ascending"), ("etype", "ascending")])
        u = g.column("user").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        # sum partials per (user, etype) run (types sorted within user)
        et = g.column("etype").combine_chunks()
        same = np.zeros(len(u), dtype=bool)
        if len(u) > 1:
            same[1:] = (u[1:] == u[:-1]) & pc.equal(
                et.slice(1), et.slice(0, len(u) - 1)
            ).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(~same)
        tot = int_segment_sum(n, starts)
        ru, ret = u[starts], et.take(pa.array(starts, pa.int64()))
        # per-user argmax under (n desc, type asc): types are sorted asc,
        # so the FIRST index achieving the user's max count wins ties
        unew = np.ones(len(ru), dtype=bool)
        unew[1:] = ru[1:] != ru[:-1]
        ustarts = np.flatnonzero(unew)
        uid = np.cumsum(unew) - 1
        nmax = np.maximum.reduceat(tot, ustarts)
        is_max = tot == nmax[uid]
        cum = np.cumsum(is_max)
        base = np.concatenate(([0], cum[ustarts[1:] - 1])) if len(ustarts) > 1 else np.array([0])
        within = cum - base[uid]
        first_max = is_max & (within == 1)
        return pa.table(
            {
                "user_id": pa.array(ru[first_max], pa.int64()),
                "favorite": ret.filter(pa.array(first_max)),
                "n_events": pa.array(tot[first_max], pa.int64()),
            },
            schema=_OUT,
        )

    out = (
        absorb_empty_blocks(
            ds.map_batches(partial, batch_format="pyarrow"), batch_size=131072
        )
        .groupby("ushard")
        .map_groups(
            lambda g: shard_mode(_dropg(g, ["ushard"])), batch_format="pyarrow"
        )
    )
    return absorb_empty_blocks(out, batch_size=131072).sort("user_id")


# ---------------------------------------------------------------------------
# A1/A8 x J5 composite: GROUP BY + HAVING feeding a two-hop row-level join
# (TPC-H Q18 shape — "which customers placed the very largest orders");
# reference validators.py:134-341 master-data joins at arbitrary master size
# ---------------------------------------------------------------------------


def large_order_customers(sf_dir: str, num_shards: int = 64) -> ray.data.Dataset:
    """TPC-H Q18 analogue: orders whose TOTAL lineitem quantity reaches
    ``config.LARGE_ORDER_MIN_QTY``, joined back to the order row and then to
    the customer's name — the canonical GROUP-BY-HAVING-then-join report.

    Scale shape — two co-partitioned hops, nothing broadcast (customer and
    orders both scale WITH the corpus, so neither side may land on the
    driver):

      1. lineitem pre-collapses to per-batch (orderkey, qty) partial sums,
         unions with slim order rows into ONE orderkey-shard groupby: each
         shard segment-sums quantities, applies the HAVING threshold, and
         merge-probes the surviving keys into its (unique-per-key) order
         rows.  The shuffle carries distinct-key partials + slim order
         rows; survivors are threshold-bounded (a tiny fraction of orders).
      2. survivors re-shard by custkey and union with slim customer rows
         for the name hop — the same sorted-merge kernel.

    Output: (c_custkey, c_name, o_orderkey, total_c, sum_qty)."""
    import numpy as np

    from ._util import absorb_empty_blocks, combine_by_key
    from ..config import LARGE_ORDER_MIN_QTY

    _M1 = pa.schema(
        [
            ("oshard", pa.int32()),
            ("key", pa.int64()),
            ("side", pa.int8()),
            ("q", pa.int64()),  # lineitem: batch-partial qty | orders: 0
            ("cust", pa.int64()),
            ("total_c", pa.int64()),
        ]
    )

    def _shard_of(keys: "np.ndarray") -> "np.ndarray":
        return (((keys * 2654435761) % (1 << 32)) % num_shards).astype(np.int32)

    def li_partial(t: pa.Table) -> pa.Table:
        k = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        q = np.floor(
            t.column("l_quantity").to_numpy(zero_copy_only=False) + 0.5
        ).astype(np.int64)
        kk, qq = combine_by_key(k, q)
        z = np.zeros(len(kk), dtype=np.int64)
        return pa.table(
            {
                "oshard": pa.array(_shard_of(kk)),
                "key": pa.array(kk, pa.int64()),
                "side": pa.array(np.zeros(len(kk), dtype=np.int8), pa.int8()),
                "q": pa.array(qq, pa.int64()),
                "cust": pa.array(z, pa.int64()),
                "total_c": pa.array(z, pa.int64()),
            },
            schema=_M1,
        )

    def ord_rows(t: pa.Table) -> pa.Table:
        okey = t.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        total_c = np.floor(
            t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "oshard": pa.array(_shard_of(okey)),
                "key": pa.array(okey, pa.int64()),
                "side": pa.array(np.ones(len(okey), dtype=np.int8), pa.int8()),
                "q": pa.array(np.zeros(len(okey), dtype=np.int64), pa.int64()),
                "cust": t.column("o_custkey").cast(pa.int64()),
                "total_c": pa.array(total_c, pa.int64()),
            },
            schema=_M1,
        )

    li = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"), columns=["l_orderkey", "l_quantity"]
    ).map_batches(li_partial, batch_format="pyarrow")
    orders = ray.data.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_totalprice"]
    ).map_batches(ord_rows, batch_format="pyarrow")

    _SURV = pa.schema(
        [
            ("cshard", pa.int32()),
            ("key", pa.int64()),  # custkey
            ("side", pa.int8()),
            ("okey", pa.int64()),
            ("total_c", pa.int64()),
            ("sum_qty", pa.int64()),
            ("name", pa.string()),
        ]
    )

    def merge_orders(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _SURV.empty_table()
        side = g.column("side").to_numpy(zero_copy_only=False)
        keys = g.column("key").to_numpy(zero_copy_only=False)
        lmask = side == 0
        lk, lq = combine_by_key(keys[lmask], g.column("q").to_numpy(zero_copy_only=False)[lmask])
        big = lq >= LARGE_ORDER_MIN_QTY
        lk, lq = lk[big], lq[big]
        bkey = keys[~lmask]
        if len(lk) == 0 or len(bkey) == 0:
            return _SURV.empty_table()
        bcust = g.column("cust").to_numpy(zero_copy_only=False)[~lmask]
        btot = g.column("total_c").to_numpy(zero_copy_only=False)[~lmask]
        order = np.argsort(bkey)
        bkey, bcust, btot = bkey[order], bcust[order], btot[order]
        pos = np.searchsorted(bkey, lk)
        hit = (pos < len(bkey)) & (bkey[np.minimum(pos, len(bkey) - 1)] == lk)
        pos, lk, lq = pos[hit], lk[hit], lq[hit]
        cust = bcust[pos]
        return pa.table(
            {
                "cshard": pa.array(_shard_of(cust)),
                "key": pa.array(cust, pa.int64()),
                "side": pa.array(np.zeros(len(cust), dtype=np.int8), pa.int8()),
                "okey": pa.array(lk, pa.int64()),
                "total_c": pa.array(btot[pos], pa.int64()),
                "sum_qty": pa.array(lq, pa.int64()),
                "name": pa.array([""] * len(cust), pa.string()),
            },
            schema=_SURV,
        )

    def cust_rows(t: pa.Table) -> pa.Table:
        ck = t.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        z = np.zeros(len(ck), dtype=np.int64)
        return pa.table(
            {
                "cshard": pa.array(_shard_of(ck)),
                "key": pa.array(ck, pa.int64()),
                "side": pa.array(np.ones(len(ck), dtype=np.int8), pa.int8()),
                "okey": pa.array(z, pa.int64()),
                "total_c": pa.array(z, pa.int64()),
                "sum_qty": pa.array(z, pa.int64()),
                "name": t.column("c_name").cast(pa.string()),
            },
            schema=_SURV,
        )

    survivors = (
        absorb_empty_blocks(li.union(orders), batch_size=131072)
        .groupby("oshard")
        .map_groups(
            lambda g: merge_orders(_dropg(g, ["oshard"])),
            batch_format="pyarrow",
        )
    )
    cust = ray.data.read_parquet(
        _pq(sf_dir, "customer"), columns=["c_custkey", "c_name"]
    ).map_batches(cust_rows, batch_format="pyarrow")

    _OUT = pa.schema(
        [
            ("c_custkey", pa.int64()),
            ("c_name", pa.string()),
            ("o_orderkey", pa.int64()),
            ("total_c", pa.int64()),
            ("sum_qty", pa.int64()),
        ]
    )

    def merge_cust(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        side = g.column("side").to_numpy(zero_copy_only=False)
        keys = g.column("key").to_numpy(zero_copy_only=False)
        bmask = side == 1
        bkey = keys[bmask]
        pk = keys[~bmask]
        if len(pk) == 0 or len(bkey) == 0:
            return _OUT.empty_table()
        bname = g.column("name").to_numpy(zero_copy_only=False)[bmask]
        order = np.argsort(bkey)
        bkey, bname = bkey[order], bname[order]
        pok = g.column("okey").to_numpy(zero_copy_only=False)[~bmask]
        ptot = g.column("total_c").to_numpy(zero_copy_only=False)[~bmask]
        pq_ = g.column("sum_qty").to_numpy(zero_copy_only=False)[~bmask]
        pos = np.searchsorted(bkey, pk)
        hit = (pos < len(bkey)) & (bkey[np.minimum(pos, len(bkey) - 1)] == pk)
        pos = pos[hit]
        return pa.table(
            {
                "c_custkey": pa.array(pk[hit], pa.int64()),
                "c_name": pa.array(bname[pos], pa.string()),
                "o_orderkey": pa.array(pok[hit], pa.int64()),
                "total_c": pa.array(ptot[hit], pa.int64()),
                "sum_qty": pa.array(pq_[hit], pa.int64()),
            },
            schema=_OUT,
        )

    return (
        absorb_empty_blocks(survivors.union(cust), batch_size=131072)
        .groupby("cshard")
        .map_groups(
            lambda g: merge_cust(_dropg(g, ["cshard"])), batch_format="pyarrow"
        )
    )


# ---------------------------------------------------------------------------
# row-level EXISTS semijoin — completes the shard-merge join family
# (inner order_details / anti orders_without_lineitems / left / full / SEMI)
# ---------------------------------------------------------------------------


def order_lineitem_semi(sf_dir: str, num_shards: int = 64) -> ray.data.Dataset:
    """Fact-fact SEMI-join (SQL ``WHERE EXISTS``): orders having at least
    one lineitem with ``l_returnflag = config.SEMI_JOIN_RETURNFLAG`` — the
    complement of :func:`orders_without_lineitems`'s anti-join, sharing its
    shape: the probe filter is pushed into the lineitem READ (row-group
    pruning), lineitem pre-collapses to DISTINCT orderkeys per batch, both
    sides union into one orderkey-shard stream, and each shard emits the
    order rows whose key IS present.  Output rows appear exactly once (the
    EXISTS contract) no matter how many lineitems match."""
    import numpy as np

    from ._util import absorb_empty_blocks, strip_schema_metadata
    from ..config import SEMI_JOIN_RETURNFLAG

    _MERGED = pa.schema(
        [
            ("oshard", pa.int32()),
            ("key", pa.int64()),
            ("custkey", pa.int64()),
            ("priority", pa.string()),
            ("side", pa.int8()),
        ]
    )

    def _shard_of(keys: "np.ndarray") -> "np.ndarray":
        return (((keys * 2654435761) % (1 << 32)) % num_shards).astype(np.int32)

    def ord_rows(t: pa.Table) -> pa.Table:
        okey = t.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "oshard": pa.array(_shard_of(okey)),
                "key": pa.array(okey, pa.int64()),
                "custkey": t.column("o_custkey").cast(pa.int64()),
                "priority": t.column("o_orderpriority").cast(pa.string()),
                "side": pa.array(np.ones(len(okey), dtype=np.int8), pa.int8()),
            },
            schema=_MERGED,
        )

    def li_keys(t: pa.Table) -> pa.Table:
        k = np.unique(
            t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return pa.table(
            {
                "oshard": pa.array(_shard_of(k)),
                "key": pa.array(k, pa.int64()),
                "custkey": pa.array(np.zeros(len(k), dtype=np.int64), pa.int64()),
                "priority": pa.array([""] * len(k), pa.string()),
                "side": pa.array(np.zeros(len(k), dtype=np.int8), pa.int8()),
            },
            schema=_MERGED,
        )

    orders = strip_schema_metadata(
        ray.data.read_parquet(
            _pq(sf_dir, "orders"),
            columns=["o_orderkey", "o_custkey", "o_orderpriority"],
        )
    ).map_batches(ord_rows, batch_format="pyarrow")
    li = strip_schema_metadata(
        ray.data.read_parquet(
            _pq(sf_dir, "lineitem"),
            columns=["l_orderkey"],
            filter=(pc.field("l_returnflag") == SEMI_JOIN_RETURNFLAG),
        )
    ).map_batches(li_keys, batch_format="pyarrow")

    _OUT = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("o_custkey", pa.int64()),
            ("o_orderpriority", pa.string()),
        ]
    )

    def semi(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        side = g.column("side").to_numpy(zero_copy_only=False)
        keys = g.column("key").to_numpy(zero_copy_only=False)
        have = np.unique(keys[side == 0])
        ok = keys[side == 1]
        if len(have) == 0 or len(ok) == 0:
            return _OUT.empty_table()
        ck = g.column("custkey").to_numpy(zero_copy_only=False)[side == 1]
        prio = g.column("priority").to_numpy(zero_copy_only=False)[side == 1]
        pos = np.searchsorted(have, ok)
        hit = (pos < len(have)) & (have[np.minimum(pos, len(have) - 1)] == ok)
        return pa.table(
            {
                "o_orderkey": pa.array(ok[hit], pa.int64()),
                "o_custkey": pa.array(ck[hit], pa.int64()),
                "o_orderpriority": pa.array(prio[hit], pa.string()),
            },
            schema=_OUT,
        )

    return (
        absorb_empty_blocks(orders.union(li), batch_size=131072)
        .groupby("oshard")
        .map_groups(semi, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# A2/A10: full CUBE grouping sets over enum keys (ROLLUP's sibling —
# orders_rollup lacks the (None, status) slice and the cross combinations)
# ---------------------------------------------------------------------------


def lineitem_cube(sf_dir: str) -> pa.Table:
    """``GROUP BY CUBE(l_returnflag, l_linestatus)`` over quantity, Q1-style
    discounted revenue (exact integer cents) and row count — all FOUR
    grouping sets ((f,s), (f), (s), ()) with SQL's NULL markers.

    Scale shape: ONE distributed pass emits per-batch leaf partials (<=
    |flags x statuses| rows per block); the bounded leaf partials collect on
    the driver and every coarser set derives locally by re-aggregation —
    valid because the measures are associative sums.  Revenue rounds to
    cents PER ROW (floor(p*(1-d)*100 + 0.5), identical double ops both
    engines) so sums are exact integers."""
    ds = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        qty = pc.cast(pc.floor(pc.add(t.column("l_quantity"), 0.5)), pa.int64())
        rev = pc.cast(
            pc.floor(
                pc.add(
                    pc.multiply(
                        pc.multiply(
                            t.column("l_extendedprice"),
                            pc.subtract(1.0, t.column("l_discount")),
                        ),
                        100.0,
                    ),
                    0.5,
                )
            ),
            pa.int64(),
        )
        g = (
            pa.table(
                {
                    "l_returnflag": t.column("l_returnflag"),
                    "l_linestatus": t.column("l_linestatus"),
                    "qty": qty,
                    "rev": rev,
                }
            )
            .group_by(["l_returnflag", "l_linestatus"])
            .aggregate([("qty", "sum"), ("rev", "sum"), ([], "count_all")])
        )
        return pa.table(
            {
                "l_returnflag": g.column("l_returnflag"),
                "l_linestatus": g.column("l_linestatus"),
                "sum_qty": g.column("qty_sum"),
                "revenue_c": g.column("rev_sum"),
                "n": pc.cast(g.column("count_all"), pa.int64()),
            }
        )

    leaf_rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    if not leaf_rows:
        # SQL's () grouping set over an empty table: one row, NULL sums, n=0
        return pa.table(
            {
                "l_returnflag": pa.array([None], pa.string()),
                "l_linestatus": pa.array([None], pa.string()),
                "sum_qty": pa.array([None], pa.int64()),
                "revenue_c": pa.array([None], pa.int64()),
                "n": pa.array([0], pa.int64()),
            }
        )
    agg: dict[tuple, list[int]] = {}
    for r in leaf_rows:  # bounded: <= |flags x statuses| x blocks partials
        k = (r["l_returnflag"], r["l_linestatus"])
        a = agg.setdefault(k, [0, 0, 0])
        a[0] += r["sum_qty"]
        a[1] += r["revenue_c"]
        a[2] += r["n"]
    rows: list[tuple] = []
    for (f, s), (q, v, n) in agg.items():  # leaf set (f, s)
        rows.append((f, s, q, v, n))
    for pick in (0, 1):  # (f, None) and (None, s)
        sub: dict[str, list[int]] = {}
        for (ks), (q, v, n) in agg.items():
            a = sub.setdefault(ks[pick], [0, 0, 0])
            a[0] += q
            a[1] += v
            a[2] += n
        for k, (q, v, n) in sub.items():
            rows.append((k, None, q, v, n) if pick == 0 else (None, k, q, v, n))
    tq = sum(a[0] for a in agg.values())  # grand total ()
    tv = sum(a[1] for a in agg.values())
    tn = sum(a[2] for a in agg.values())
    rows.append((None, None, tq, tv, tn))
    return pa.table(
        {
            "l_returnflag": pa.array([r[0] for r in rows], pa.string()),
            "l_linestatus": pa.array([r[1] for r in rows], pa.string()),
            "sum_qty": pa.array([r[2] for r in rows], pa.int64()),
            "revenue_c": pa.array([r[3] for r in rows], pa.int64()),
            "n": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# sort-merge-bucket (SMB) layout: pay the partitioning shuffle ONCE at write
# time, then co-partitioned joins read aligned buckets with ZERO all-to-all —
# the standard 100-TB storage-layout amortization (Hive/Spark bucketed
# tables); contrast order_details (per-query shuffle) and order_details_bloom
# (per-query shuffle with probe pruning)
# ---------------------------------------------------------------------------

_BUCKET_CACHE_ROOT = "/tmp/ier_bucketed"
_BUCKET_LAYOUT_VERSION = 1


def _require_layout_visible(root: str) -> None:
    """Raise unless ``root`` carries its completion marker on THIS node —
    a bucket-zip worker that cannot see the layout must fail loudly, never
    silently contribute an empty bucket."""
    import os

    if not os.path.exists(f"{root}/_COMPLETE"):
        raise RuntimeError(
            f"bucketed layout {root} is not visible on this node — "
            "the SMB cache must live on storage all readers share"
        )


def bucketed_layout(
    sf_dir: str, table: str, key: str, n_buckets: int, columns: list[str]
) -> str:
    """Materialize (once) a hash-bucketed parquet layout of ``table`` keyed
    by ``key``: rows land in ``bucket=B/`` hive directories with B =
    hash(key) % n_buckets (the same multiplicative hash as the shard-merge
    joins, so layouts produced here co-partition with each other).  Returns
    the layout directory; subsequent calls reuse it via a completion marker
    (tmp-rename discipline, crash-safe like state/checkpoint.py).

    Cache key covers the SOURCE parquet's (size, mtime) as well as the
    layout parameters, so regenerating the data at the same path re-buckets
    instead of serving a stale layout.  The cache root must live on storage
    every reader node can see — /tmp works single-node; point
    ``IER_BUCKETED_CACHE`` at shared/object storage on a real cluster
    (consumers raise loudly when a layout is not visible, never return
    partial results).

    At 100 TB this is the shuffle you pay ONCE per table per key instead of
    once per query; every co-bucketed join afterwards is a metadata-only
    bucket zip."""
    import hashlib
    import json
    import os
    import shutil

    import numpy as np

    src = _pq(sf_dir, table)
    st = os.stat(src)
    spec = json.dumps(
        [os.path.abspath(sf_dir), table, key, n_buckets, sorted(columns),
         st.st_size, int(st.st_mtime_ns), _BUCKET_LAYOUT_VERSION],
        sort_keys=True,
    )
    digest = hashlib.sha256(spec.encode()).hexdigest()[:16]
    root = os.environ.get("IER_BUCKETED_CACHE", _BUCKET_CACHE_ROOT)
    dest = f"{root}/{digest}/{table}"
    marker = f"{dest}/_COMPLETE"
    if os.path.exists(marker):
        return dest
    tmp = f"{dest}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        b = (((k * 2654435761) % (1 << 32)) % n_buckets).astype(np.int64)
        return t.append_column("bucket", pa.array(b, pa.int64()))

    (
        ray.data.read_parquet(src, columns=columns)
        .map_batches(add_bucket, batch_format="pyarrow")
        .write_parquet(tmp, partition_cols=["bucket"])
    )
    _publish_layout_dir(tmp, dest, spec)
    return dest


def _publish_layout_dir(tmp: str, dest: str, spec: str) -> None:
    """Commit a built layout directory under the tmp-rename + marker
    discipline shared by every cached materialization (SMB buckets,
    incremental-aggregate bases): rename is atomic, the marker lands LAST,
    a racing winner's result is kept, and a markerless dest (crash between
    rename and marker) is replaced rather than rebuilt forever.  An EMPTY
    build that wrote no files still commits a valid empty layout."""
    import os
    import shutil

    marker = f"{dest}/_COMPLETE"
    os.makedirs(tmp, exist_ok=True)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    if not os.path.exists(marker):  # racing writer may have finished first
        try:
            os.rename(tmp, dest)
        except OSError:
            if os.path.exists(marker):  # racer won cleanly
                shutil.rmtree(tmp, ignore_errors=True)
                return
            # dest exists WITHOUT a marker: a prior run crashed between
            # rename and marker write — replace the suspect directory
            # (never leave a markerless dest that would rebuild forever)
            shutil.rmtree(dest, ignore_errors=True)
            os.rename(tmp, dest)
        with open(marker, "w") as f:
            f.write(spec)
    else:
        shutil.rmtree(tmp, ignore_errors=True)


def order_details_bucketed(sf_dir: str, n_buckets: int = 32) -> ray.data.Dataset:
    """``order_details`` (urgent orders x their lineitems, row-level inner
    join) over SMB bucketed layouts: both tables are bucketed by orderkey
    ONCE (cached under /tmp, amortized across every co-partitioned query),
    then the join is one raw task per bucket PAIR reading two aligned
    directories — ZERO query-time shuffle; the only data movement is the
    bucket reads themselves.  Output and oracle are byte-identical to
    ``order_details``.  Raw tasks are the documented escape hatch: Ray Data
    cannot express 'zip the i-th partition of two datasets without an
    exchange'."""
    import os

    import numpy as np

    odir = bucketed_layout(
        sf_dir, "orders", "o_orderkey", n_buckets,
        ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )
    ldir = bucketed_layout(
        sf_dir, "lineitem", "l_orderkey", n_buckets,
        ["l_orderkey", "l_linenumber", "l_extendedprice"],
    )

    _OUT = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("l_linenumber", pa.int64()),
            ("o_custkey", pa.int64()),
            ("o_orderdate", pa.timestamp("us")),
            ("l_price_c", pa.int64()),
        ]
    )

    @ray.remote
    def join_bucket(odir_root: str, ldir_root: str, bucket: int) -> pa.Table:
        import pyarrow.parquet as pq_

        # layout visibility is a hard precondition: a worker node that
        # cannot see the cache directory must FAIL, never silently
        # contribute an empty bucket (point IER_BUCKETED_CACHE at shared
        # storage on a multi-node cluster)
        _require_layout_visible(odir_root)
        _require_layout_visible(ldir_root)
        opath = f"{odir_root}/bucket={bucket}"
        lpath = f"{ldir_root}/bucket={bucket}"
        # with the marker present, a missing bucket dir means the bucket is
        # legitimately empty (write_parquet creates no dir for zero rows)
        if not (os.path.isdir(opath) and os.path.isdir(lpath)):
            return _OUT.empty_table()
        o = pq_.read_table(
            opath, columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
        )
        o = o.filter(pc.equal(o.column("o_orderpriority"), "1-URGENT"))
        li = pq_.read_table(lpath)
        if o.num_rows == 0 or li.num_rows == 0:
            return _OUT.empty_table()
        bkey = o.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(bkey)
        bkey = bkey[order]
        bcust = o.column("o_custkey").to_numpy(zero_copy_only=False)[order]
        bdate = o.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )[order]
        pk = li.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        pln = li.column("l_linenumber").to_numpy(zero_copy_only=False).astype(np.int64)
        price_c = np.floor(
            li.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        pos = np.searchsorted(bkey, pk)
        hit = (pos < len(bkey)) & (bkey[np.minimum(pos, len(bkey) - 1)] == pk)
        pos = pos[hit]
        return pa.table(
            {
                "o_orderkey": pa.array(pk[hit], pa.int64()),
                "l_linenumber": pa.array(pln[hit], pa.int64()),
                "o_custkey": pa.array(bcust[pos], pa.int64()),
                "o_orderdate": pa.array(bdate[pos], pa.int64()).cast(pa.timestamp("us")),
                "l_price_c": pa.array(price_c[hit], pa.int64()),
            },
            schema=_OUT,
        )

    outs = [
        join_bucket.remote(odir, ldir, b)
        for b in range(n_buckets)
    ]
    return ray.data.from_arrow_refs(outs)


# ---------------------------------------------------------------------------
# A7 x J5: aggregate-of-aggregates with an outer-join zero class (TPC-H Q13
# "custdist" — how many customers placed exactly k orders, INCLUDING the
# customers that placed none); reference validators.py master-data coverage
# reports count per-field hit/miss distributions the same way
# ---------------------------------------------------------------------------


def customer_order_distribution(sf_dir: str, n_shards: int = 64) -> pa.Table:
    """TPC-H Q13 shape: the distribution of per-customer order counts with
    the LEFT-JOIN zero bucket — ``(c_count, custdist)`` rows, one per
    distinct order count observed (plus ``c_count = 0`` for order-less
    customers).

    Scale shape — the customer table is never read, let alone joined:

      1. orders pre-collapse to per-batch (custkey, n) partials (one
         np.unique per block), so the custkey shuffle carries O(distinct
         custkeys per block) rows, not raw orders;
      2. each custkey shard finishes the per-customer counts exactly
         (disjoint key ranges) and immediately re-collapses to its LOCAL
         count histogram — at most |distinct count values| rows per shard
         reach the driver;
      3. the zero class needs ONLY the customer row count: ``c_custkey`` is
         the table's primary key (enforced by data_quality_report's PK
         audit), so the parquet FOOTER row count — no data pages — gives
         |customer|, and custdist(0) = |customer| − |customers with ≥1
         order|.  The FK side (every o_custkey exists in customer) is the
         same precondition the SQL LEFT JOIN oracle assumes; dirty corpora
         surface in data_quality_report's dangling-FK audit first.
    """
    import numpy as np

    from ._util import absorb_empty_blocks, combine_by_key, parquet_num_rows

    total_customers = parquet_num_rows(_pq(sf_dir, "customer"))
    ds = ray.data.read_parquet(_pq(sf_dir, "orders"), columns=["o_custkey"])

    _PART = pa.schema(
        [("cshard", pa.int32()), ("cust", pa.int64()), ("n", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        u, cnt = np.unique(ck, return_counts=True)
        return pa.table(
            {
                "cshard": pa.array(
                    (((u * 2654435761) % (1 << 32)) % n_shards).astype(np.int32)
                ),
                "cust": pa.array(u, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            },
            schema=_PART,
        )

    _HIST = pa.schema([("c_count", pa.int64()), ("custdist", pa.int64())])

    def shard_hist(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _HIST.empty_table()
        cust = g.column("cust").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        _, tot = combine_by_key(cust, n)  # exact per-customer order counts
        cc, ncust = np.unique(tot, return_counts=True)
        return pa.table(
            {
                "c_count": pa.array(cc.astype(np.int64), pa.int64()),
                "custdist": pa.array(ncust.astype(np.int64), pa.int64()),
            },
            schema=_HIST,
        )

    parts = (
        absorb_empty_blocks(
            ds.map_batches(partial, batch_format="pyarrow"), batch_size=131072
        )
        .groupby("cshard")
        .map_groups(
            lambda g: shard_hist(_dropg(g, ["cshard"])), batch_format="pyarrow"
        )
        .take_all()  # bounded: <= n_shards x |distinct count values| rows
    )
    if parts:
        cc = np.array([r["c_count"] for r in parts], dtype=np.int64)
        nc = np.array([r["custdist"] for r in parts], dtype=np.int64)
        ucc, dist = combine_by_key(cc, nc)  # shards own disjoint customers
    else:
        ucc = np.empty(0, dtype=np.int64)
        dist = np.empty(0, dtype=np.int64)
    zero = total_customers - int(dist.sum())
    if zero > 0:
        ucc = np.concatenate(([0], ucc))
        dist = np.concatenate(([zero], dist))
    order = np.lexsort((-ucc, -dist))  # TPC-H: custdist DESC, c_count DESC
    return pa.table(
        {
            "c_count": pa.array(ucc[order], pa.int64()),
            "custdist": pa.array(dist[order], pa.int64()),
        },
        schema=_HIST,
    )


# ---------------------------------------------------------------------------
# A9 x J5: groupwise ARGMIN feeding a row-recovery join (TPC-H Q2 shape —
# "the cheapest supplier for every part"); reference extractors.py picks the
# min-cost candidate per field the same way before the lookup that names it
# ---------------------------------------------------------------------------


def cheapest_supplier(sf_dir: str, num_shards: int = 64) -> ray.data.Dataset:
    """TPC-H Q2 analogue over the tables we have: for every part observed in
    lineitem, the supplier that charged the minimum extended price (ties →
    smallest suppkey), recovered to the supplier's name — groupwise argmin
    whose WITNESS ROW must survive to a later join, the shape a plain
    ``groupby().min()`` cannot express.

    Scale shape — two co-partitioned hops, neither side broadcast (part and
    supplier both scale with the corpus in TPC-H):

      1. lineitem pre-collapses per batch to one (partkey, suppkey, price_c)
         argmin witness per partkey (lexsort + first-of-run — vectorized),
         so the partkey shuffle carries O(distinct parts per block) rows;
      2. each partkey shard repeats the same kernel on the partials —
         argmin is associative with the witness carried, so partials lose
         nothing;
      3. winners re-shard by SUPPKEY and union with slim supplier rows; the
         shard merge recovers ``s_name`` via searchsorted — the repo's
         standard union co-partition join, nothing driver-side.
    """
    import numpy as np

    from ._util import absorb_empty_blocks, strip_schema_metadata

    def _argmin_first(part, price, supp):
        """First row per part under (price asc, suppkey asc) order."""
        order = np.lexsort((supp, price, part))
        p = part[order]
        first = np.ones(len(p), dtype=bool)
        first[1:] = p[1:] != p[:-1]
        keep = order[first]
        return part[keep], price[keep], supp[keep]

    _WIT = pa.schema(
        [
            ("pshard", pa.int32()),
            ("part", pa.int64()),
            ("supp", pa.int64()),
            ("price_c", pa.int64()),
        ]
    )

    def li_partial(t: pa.Table) -> pa.Table:
        part = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        supp = t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        price = np.floor(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        part, price, supp = _argmin_first(part, price, supp)
        return pa.table(
            {
                "pshard": pa.array(
                    (((part * 2654435761) % (1 << 32)) % num_shards).astype(np.int32)
                ),
                "part": pa.array(part, pa.int64()),
                "supp": pa.array(supp, pa.int64()),
                "price_c": pa.array(price, pa.int64()),
            },
            schema=_WIT,
        )

    def shard_argmin(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _WIT.empty_table().drop_columns(["pshard"])
        part, price, supp = _argmin_first(
            g.column("part").to_numpy(zero_copy_only=False),
            g.column("price_c").to_numpy(zero_copy_only=False),
            g.column("supp").to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {
                "part": pa.array(part, pa.int64()),
                "supp": pa.array(supp, pa.int64()),
                "price_c": pa.array(price, pa.int64()),
            }
        )

    winners = (
        absorb_empty_blocks(
            ray.data.read_parquet(
                _pq(sf_dir, "lineitem"),
                columns=["l_partkey", "l_suppkey", "l_extendedprice"],
            ).map_batches(li_partial, batch_format="pyarrow"),
            batch_size=131072,
        )
        .groupby("pshard")
        .map_groups(
            lambda g: shard_argmin(_dropg(g, ["pshard"])), batch_format="pyarrow"
        )
    )

    _MERGED = pa.schema(
        [
            ("sshard", pa.int32()),
            ("supp", pa.int64()),
            ("part", pa.int64()),
            ("price_c", pa.int64()),
            ("name", pa.string()),
            ("side", pa.int8()),
        ]
    )

    def _sshard(keys: "np.ndarray") -> "np.ndarray":
        return (((keys * 2654435761) % (1 << 32)) % num_shards).astype(np.int32)

    def win_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "supp" not in t.column_names:
            return _MERGED.empty_table()
        sk = t.column("supp").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "sshard": pa.array(_sshard(sk)),
                "supp": pa.array(sk, pa.int64()),
                "part": t.column("part").cast(pa.int64()),
                "price_c": t.column("price_c").cast(pa.int64()),
                "name": pa.array([""] * len(sk), pa.string()),
                "side": pa.array(np.zeros(len(sk), dtype=np.int8), pa.int8()),
            },
            schema=_MERGED,
        )

    def sup_rows(t: pa.Table) -> pa.Table:
        sk = t.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        z = np.zeros(len(sk), dtype=np.int64)
        return pa.table(
            {
                "sshard": pa.array(_sshard(sk)),
                "supp": pa.array(sk, pa.int64()),
                "part": pa.array(z, pa.int64()),
                "price_c": pa.array(z, pa.int64()),
                "name": t.column("s_name").cast(pa.string()),
                "side": pa.array(np.ones(len(sk), dtype=np.int8), pa.int8()),
            },
            schema=_MERGED,
        )

    supplier = strip_schema_metadata(
        ray.data.read_parquet(_pq(sf_dir, "supplier"), columns=["s_suppkey", "s_name"])
    ).map_batches(sup_rows, batch_format="pyarrow")

    _OUT = pa.schema(
        [
            ("p_partkey", pa.int64()),
            ("s_suppkey", pa.int64()),
            ("s_name", pa.string()),
            ("min_price_c", pa.int64()),
        ]
    )

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        side = g.column("side").to_numpy(zero_copy_only=False)
        supp = g.column("supp").to_numpy(zero_copy_only=False)
        bkey = supp[side == 1]
        wk = supp[side == 0]
        if len(bkey) == 0 or len(wk) == 0:
            return _OUT.empty_table()
        order = np.argsort(bkey)
        bkey = bkey[order]
        bname = g.column("name").filter(pa.array(side == 1)).take(
            pa.array(order, pa.int64())
        )
        part = g.column("part").to_numpy(zero_copy_only=False)[side == 0]
        price = g.column("price_c").to_numpy(zero_copy_only=False)[side == 0]
        pos = np.searchsorted(bkey, wk)
        hit = (pos < len(bkey)) & (bkey[np.minimum(pos, len(bkey) - 1)] == wk)
        pos = pos[hit]
        return pa.table(
            {
                "p_partkey": pa.array(part[hit], pa.int64()),
                "s_suppkey": pa.array(wk[hit], pa.int64()),
                "s_name": bname.take(pa.array(pos, pa.int64())),
                "min_price_c": pa.array(price[hit], pa.int64()),
            },
            schema=_OUT,
        )

    tagged = winners.map_batches(win_rows, batch_format="pyarrow").union(supplier)
    return (
        absorb_empty_blocks(tagged, batch_size=131072)
        .groupby("sshard")
        .map_groups(lambda g: merge(_dropg(g, ["sshard"])), batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# A1 x S6: incremental aggregate maintenance (materialized-view refresh) —
# the base partials are computed ONCE and cached; each refresh rescans only
# the trailing hot-delta days.  Reference error_analysis.py recomputes its
# metrics report from scratch per run; at 100 TB a daily refresh must not.
# ---------------------------------------------------------------------------

_INCR_CACHE_ROOT = "/tmp/ier_incr"
_INCR_VERSION = 1


def incremental_user_value(sf_dir: str, n_shards: int = 64) -> ray.data.Dataset:
    """Per-user ``(total_c, n)`` over ALL events, maintained incrementally:
    events older than the trailing ``config.INCREMENTAL_DELTA_DAYS`` window
    are served from a CACHED parquet of per-user base partials (built once
    under the tmp-rename + marker discipline, keyed by source (size,
    mtime) + cutoff); only the hot delta days rescan per refresh.  Sums and
    counts are associative, so base partials + delta partials merge to the
    exact full GROUP BY — the oracle is the plain full recompute, making
    refresh correctness the thing the gate proves.

    Scale shape: the cutoff needs one bounded max-ts scan (one int per
    block); the base build and the refresh both pre-combine per batch and
    ride one user-shard groupby; both reads push the ts cutoff into the
    parquet scan (row-group pruning — at 100 TB with date-partitioned
    layouts the base build reads each cold partition exactly once, ever).
    Cache invalidation is conservative: ANY source change (size/mtime)
    rebuilds the base — correct-by-default for a single mutable file;
    append-only arrivals keep their old partitions' row groups pruned by
    the same ts predicate."""
    import hashlib
    import json
    import os

    import numpy as np

    from ..config import INCREMENTAL_DELTA_DAYS
    from ._util import absorb_empty_blocks, combine_by_key

    _US_PER_DAY = 86_400_000_000
    _OUT = pa.schema(
        [("user_id", pa.int64()), ("total_c", pa.int64()), ("n", pa.int64())]
    )
    src = _pq(sf_dir, "events")

    # cutoff from the parquet FOOTER's exact ts max statistics — no data
    # pages read (the 100-TB answer: one footer per fragment); falls back
    # to a bounded max scan when a writer omitted stats
    ref_us = _parquet_ts_max(src, "ts")
    if ref_us is None:

        def day_max(t: pa.Table) -> pa.Table:
            us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            if len(us) == 0:
                return pa.table({"mx": pa.array([], pa.int64())})
            return pa.table({"mx": pa.array([int(us.max())], pa.int64())})

        mx_rows = (
            ray.data.read_parquet(src, columns=["ts"])
            .map_batches(day_max, batch_format="pyarrow")
            .take_all()
        )
        ref_us = max((r["mx"] for r in mx_rows), default=None)
    if ref_us is None:
        return ray.data.from_arrow(_OUT.empty_table())
    ref_day = ref_us // _US_PER_DAY
    cutoff_us = (ref_day - INCREMENTAL_DELTA_DAYS + 1) * _US_PER_DAY

    def partial(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        vc = np.floor(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        uu, cc, nn = combine_by_key(u, vc, np.ones(len(u), dtype=np.int64))
        return pa.table(
            {
                "user_id": pa.array(uu, pa.int64()),
                "total_c": pa.array(cc, pa.int64()),
                "n": pa.array(nn, pa.int64()),
            },
            schema=_OUT,
        )

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        uu, cc, nn = combine_by_key(
            g.column("user_id").to_numpy(zero_copy_only=False),
            g.column("total_c").to_numpy(zero_copy_only=False),
            g.column("n").to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {
                "user_id": pa.array(uu, pa.int64()),
                "total_c": pa.array(cc, pa.int64()),
                "n": pa.array(nn, pa.int64()),
            },
            schema=_OUT,
        )

    def add_shard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return pa.schema(
                [("shard", pa.int32())] + list(_OUT)
            ).empty_table()
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "shard": pa.array(
                    (((u * 2654435761) % (1 << 32)) % n_shards).astype(np.int32)
                ),
                "user_id": t.column("user_id").cast(pa.int64()),
                "total_c": t.column("total_c").cast(pa.int64()),
                "n": t.column("n").cast(pa.int64()),
            }
        )

    # base layout: per-user partials over days < cutoff, built once
    st = os.stat(src)
    spec = json.dumps(
        [os.path.abspath(src), st.st_size, int(st.st_mtime_ns),
         int(cutoff_us), _INCR_VERSION],
        sort_keys=True,
    )
    digest = hashlib.sha256(spec.encode()).hexdigest()[:16]
    root = os.environ.get("IER_INCR_CACHE", _INCR_CACHE_ROOT)
    dest = f"{root}/{digest}"
    if not os.path.exists(f"{dest}/_COMPLETE"):
        tmp = f"{dest}.tmp.{os.getpid()}"
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        (
            # absorb the 64 per-shard groupby outputs before writing so the
            # base layout lands in few large files, not one tiny file per
            # shard (per-file open cost dominated the warm refresh)
            absorb_empty_blocks(
                ray.data.read_parquet(
                    src,
                    columns=["user_id", "value"],
                    filter=(
                        pc.field("ts")
                        < pa.scalar(cutoff_us).cast(pa.timestamp("us"))
                    ),
                )
                .map_batches(partial, batch_format="pyarrow")
                .map_batches(add_shard, batch_format="pyarrow")
                .groupby("shard")
                .map_groups(
                    lambda g: merge(_dropg(g, ["shard"])), batch_format="pyarrow"
                ),
                batch_size=1 << 20,
            ).write_parquet(tmp)
        )
        _publish_layout_dir(tmp, dest, spec)

    base_files = sorted(
        f"{dest}/{f}" for f in os.listdir(dest) if f.endswith(".parquet")
    )
    base = (
        ray.data.read_parquet(base_files, columns=["user_id", "total_c", "n"])
        if base_files
        else ray.data.from_arrow(_OUT.empty_table())
    )

    delta = ray.data.read_parquet(
        src,
        columns=["user_id", "value"],
        filter=(pc.field("ts") >= pa.scalar(cutoff_us).cast(pa.timestamp("us"))),
    ).map_batches(partial, batch_format="pyarrow")

    return (
        absorb_empty_blocks(
            base.union(delta).map_batches(add_shard, batch_format="pyarrow"),
            batch_size=131072,
        )
        .groupby("shard")
        .map_groups(lambda g: merge(_dropg(g, ["shard"])), batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# S6 x O1: multi-dimensional clustering layout (z-order) — the third member
# of the storage-maintenance family (hash buckets = join locality,
# compaction = file hygiene, z-order = 2-D range-scan locality).  Reference
# utils/preprocess.py re-tiles images into scan-friendly order for the same
# reason: make later rectangular reads touch few pages.
# ---------------------------------------------------------------------------


def _morton2(x: "np.ndarray", y: "np.ndarray") -> "np.ndarray":  # noqa: F821
    """Interleave the low 31 bits of two non-negative int64 arrays into one
    int64 Morton key (x even bits, y odd).  31+31 = 62 bits stays int64-
    positive; callers assert range first."""
    import numpy as np

    def part1by1(v: "np.ndarray") -> "np.ndarray":
        v = v.astype(np.uint64) & np.uint64(0xFFFFFFFF)
        v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
        v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
        return v

    return (part1by1(x) | (part1by1(y) << np.uint64(1))).astype(np.int64)


_ZORDER_CACHE_ROOT = "/tmp/ier_zorder"
_ZORDER_VERSION = 1


def zorder_layout(sf_dir: str, row_group_rows: int = 131072) -> str:
    """Materialize (once) a z-ordered parquet layout of events: rows sort
    globally by the Morton interleave of (user_id, epoch-day), so every
    parquet row group covers a TIGHT rectangle in (user, day) space and its
    footer min/max statistics prune 2-D range scans on BOTH axes — the
    clustering win a single-column sort can only give one axis.

    The global sort is the build cost, paid ONCE per source version (cache
    keyed by source size/mtime, row-group size, version; tmp-rename +
    marker discipline shared with the SMB layout).  ``day_i`` lands as a
    real column so the scan predicate pushes straight into the footer
    stats.  Pack guard: both axes assert < 2^31 (Morton stays int64)."""
    import hashlib
    import json
    import os
    import shutil

    import numpy as np

    src = _pq(sf_dir, "events")
    st = os.stat(src)
    spec = json.dumps(
        [os.path.abspath(src), st.st_size, int(st.st_mtime_ns),
         row_group_rows, _ZORDER_VERSION],
        sort_keys=True,
    )
    digest = hashlib.sha256(spec.encode()).hexdigest()[:16]
    root = os.environ.get("IER_ZORDER_CACHE", _ZORDER_CACHE_ROOT)
    dest = f"{root}/{digest}"
    if os.path.exists(f"{dest}/_COMPLETE"):
        return dest
    tmp = f"{dest}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)

    _US_PER_DAY = 86_400_000_000

    def add_zkey(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        day = (
            t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // _US_PER_DAY
        )
        if len(u):
            assert u.max() < (1 << 31) and u.min() >= 0, (
                "zorder: user_id exceeds 31-bit Morton axis"
            )
            assert day.max() < (1 << 31) and day.min() >= 0, (
                "zorder: epoch-day exceeds 31-bit Morton axis"
            )
        t = t.append_column("day_i", pa.array(day, pa.int64()))
        return t.append_column("zkey", pa.array(_morton2(u, day), pa.int64()))

    from ._util import absorb_empty_blocks as _absorb

    (
        # absorb the sort's skinny output blocks before writing: map_batches
        # preserves row order, so adjacent sorted blocks coalesce into few
        # LARGE files instead of one tiny file per sort partition (per-file
        # open cost was 3x the warm scan wall at sf0.1)
        _absorb(
            ray.data.read_parquet(
                src, columns=["event_id", "user_id", "ts", "value"]
            )
            .map_batches(add_zkey, batch_format="pyarrow")
            .sort("zkey"),
            batch_size=max(4 * row_group_rows, 131072),
        ).write_parquet(tmp, row_group_size=row_group_rows)
    )
    _publish_layout_dir(tmp, dest, spec)
    return dest


def events_zorder_scan(sf_dir: str) -> ray.data.Dataset:
    """2-D range scan over the z-ordered layout: events with ``user_id`` in
    [config.ZORDER_USER_LO, HI] and day in the trailing window
    [max_day − BACK_LO, max_day − BACK_HI].  The predicate pushes into the
    layout read, where z-clustering makes the row-group min/max stats tight
    on BOTH axes — at 100 TB the scan touches O(selected rectangle) row
    groups instead of every group that matches either axis alone.  Output
    (and oracle) are layout-invariant: exactly the matching event rows."""
    import numpy as np

    from ..config import (
        ZORDER_DAY_BACK_HI,
        ZORDER_DAY_BACK_LO,
        ZORDER_USER_HI,
        ZORDER_USER_LO,
    )

    _US_PER_DAY = 86_400_000_000

    # bounded max-day scan (one int per block) — same pass the oracle's
    # max(day_i) subquery performs
    def day_max(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        if len(us) == 0:
            return pa.table({"mx": pa.array([], pa.int64())})
        return pa.table({"mx": pa.array([int(us.max()) // _US_PER_DAY], pa.int64())})

    _OUT = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("day_i", pa.int64()),
            ("value_c", pa.int64()),
        ]
    )
    mx_rows = (
        ray.data.read_parquet(_pq(sf_dir, "events"), columns=["ts"])
        .map_batches(day_max, batch_format="pyarrow")
        .take_all()
    )
    if not mx_rows:
        return ray.data.from_arrow(_OUT.empty_table())
    mx = max(r["mx"] for r in mx_rows)
    lo_day, hi_day = mx - ZORDER_DAY_BACK_LO, mx - ZORDER_DAY_BACK_HI

    layout = zorder_layout(sf_dir)

    def project(t: pa.Table) -> pa.Table:
        vc = np.floor(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "event_id": t.column("event_id").cast(pa.int64()),
                "user_id": t.column("user_id").cast(pa.int64()),
                "day_i": t.column("day_i").cast(pa.int64()),
                "value_c": pa.array(vc, pa.int64()),
            },
            schema=_OUT,
        )

    import os

    files = sorted(
        f"{layout}/{f}" for f in os.listdir(layout) if f.endswith(".parquet")
    )
    if not files:
        return ray.data.from_arrow(_OUT.empty_table())
    scan = ray.data.read_parquet(
        files,
        columns=["event_id", "user_id", "day_i", "value"],
        filter=(
            (pc.field("user_id") >= ZORDER_USER_LO)
            & (pc.field("user_id") <= ZORDER_USER_HI)
            & (pc.field("day_i") >= lo_day)
            & (pc.field("day_i") <= hi_day)
        ),
    ).map_batches(project, batch_format="pyarrow")
    # a fully-pruned scan yields ZERO blocks and loses the schema — union a
    # schema-carrying empty table so consumers always see _OUT's columns
    return scan.union(ray.data.from_arrow(_OUT.empty_table()))


def _parquet_ts_max(path: str, col: str) -> int | None:
    """Exact max of a timestamp column in EPOCH MICROSECONDS from the
    parquet footer statistics alone (no data pages).  None when any row
    group lacks stats (caller falls back to a scan) or the file is empty."""
    import pyarrow.parquet as pq_

    md = pq_.ParquetFile(path).metadata
    names = {md.schema.column(i).name: i for i in range(md.num_columns)}
    idx = names[col]
    best = None
    for g in range(md.num_row_groups):
        st = md.row_group(g).column(idx).statistics
        if st is None or not st.has_min_max:
            return None
        v = st.max
        # naive-datetime -> epoch us via Arrow (datetime.timestamp() would
        # apply the LOCAL timezone and float-round the microseconds)
        us = (
            pa.scalar(v, pa.timestamp("us")).cast(pa.int64()).as_py()
            if not isinstance(v, int)
            else int(v)
        )
        best = us if best is None else max(best, us)
    return best


def assoc_rules(
    sf_dir: str,
    k: int = 20,
    n_shards: int = 64,
    n_pair_shards: int = 64,
    max_basket: int = 64,
) -> pa.Table:
    """Market-basket ASSOCIATION RULES (support / confidence / lift) for the
    top-k co-purchased part pairs — the ratio-of-aggregates layer on top of
    ``copurchase_pairs``'s raw pair counts (reference analogue: the
    master-data co-occurrence checks in submission/utils/validators.py).

    Three aggregate families ride ONE scan of lineitem and one unified
    (kind, shard) groupby: pair counts (kind 0, pair-sharded with an exact
    per-shard top-k prefilter), item marginals (kind 1 — orders co-locate
    wholly within an order shard, so per-shard per-part counts are additive
    partials), and the capped-basket universe size N (kind 2, one counter
    row per shard).  The driver sees only the k winner pairs, the <=2k
    marginals it filters for, and <= n_shards scalar rows; the |part|-sized
    marginal table stays distributed (materialized small summary, never
    take_all'd).  Ratios are exact python-int floor divisions in e6 fixed
    point, HUGEINT-mirrored in the oracle.  Baskets above ``max_basket``
    distinct parts are dropped before expansion (same fanout cap and SQL
    mirror as copurchase_pairs)."""
    import numpy as np

    from ._util import absorb_empty_blocks, combine_by_key

    ds = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"), columns=["l_orderkey", "l_partkey"]
    )

    def key_rows(t: pa.Table) -> pa.Table:
        o = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        p = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(p) and (p.max() >= (1 << 21) or p.min() < 0):
            raise ValueError(
                "assoc_rules: partkey must be in [0, 2^21) for the "
                "int64 (orderkey<<21)|partkey pack; got max %d" % int(p.max())
            )
        if len(o) and (o.max() >= (1 << 42) or o.min() < 0):
            raise ValueError(
                "assoc_rules: orderkey must be in [0, 2^42) for the "
                "int64 (orderkey<<21)|partkey pack; got max %d" % int(o.max())
            )
        packed = np.unique((o << 21) | p)
        o = packed >> 21
        return pa.table(
            {
                "oshard": pa.array(
                    (((o * 2654435761) % (1 << 32)) % n_shards).astype(np.int32)
                ),
                "packed": pa.array(packed, pa.int64()),
            }
        )

    # unified partial rows: gs = (kind << 8) | shard, kind 0=pair 1=item 2=N
    _PART = pa.schema([("gs", pa.int32()), ("key", pa.int64()), ("n", pa.int64())])

    def expand(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _PART.empty_table()
        packed = np.unique(g.column("packed").to_numpy(zero_copy_only=False))
        o = packed >> 21
        new = np.ones(len(o), dtype=bool)
        new[1:] = o[1:] != o[:-1]
        lens = np.diff(np.append(np.flatnonzero(new), len(o)))
        elem_keep = np.repeat(lens <= max_basket, lens)  # fanout cap
        packed = packed[elem_keep]
        if len(packed) == 0:
            return _PART.empty_table()
        o, p = packed >> 21, packed & ((1 << 21) - 1)
        new = np.ones(len(o), dtype=bool)
        new[1:] = o[1:] != o[:-1]
        starts = np.flatnonzero(new)
        # ---- pairs (triangular within-run expansion, vectorized) ----------
        ends = np.append(starts[1:], len(o))
        run_end = np.repeat(ends, np.diff(np.append(starts, len(o))))
        counts = run_end - np.arange(len(o)) - 1
        a_idx = np.repeat(np.arange(len(o)), counts)
        blk = np.cumsum(counts) - counts
        b_idx = a_idx + 1 + (np.arange(counts.sum()) - np.repeat(blk, counts))
        pair = (p[a_idx] << 21) | p[b_idx]
        upair, pcnt = np.unique(pair, return_counts=True)
        # ---- item marginals: distinct orders containing each part ---------
        uitem, icnt = np.unique(p, return_counts=True)
        gs = np.concatenate(
            [
                (((upair * 2654435761) % (1 << 32)) % n_pair_shards).astype(np.int64),
                (1 << 8)
                | (((uitem * 2654435761) % (1 << 32)) % n_pair_shards).astype(np.int64),
                np.array([2 << 8], dtype=np.int64),
            ]
        )
        key = np.concatenate([upair, uitem, np.zeros(1, dtype=np.int64)])
        n = np.concatenate(
            [
                pcnt.astype(np.int64),
                icnt.astype(np.int64),
                np.array([len(starts)], dtype=np.int64),  # capped orders here
            ]
        )
        return pa.table(
            {
                "gs": pa.array(gs.astype(np.int32), pa.int32()),
                "key": pa.array(key, pa.int64()),
                "n": pa.array(n, pa.int64()),
            },
            schema=_PART,
        )

    _SUM = pa.schema([("kind", pa.int8()), ("key", pa.int64()), ("n", pa.int64())])

    def finish(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _SUM.empty_table()
        gs = int(g.column("gs")[0].as_py())
        kind = gs >> 8
        keys = g.column("key").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        ukey, tot = combine_by_key(keys, n)
        if kind == 0 and len(ukey) > k:
            # pairs partition by shard -> per-shard top-k is an exact prefilter
            top = np.lexsort((ukey, -tot))[:k]
            top.sort()
            ukey, tot = ukey[top], tot[top]
        return pa.table(
            {
                "kind": pa.array(np.full(len(ukey), kind, dtype=np.int8), pa.int8()),
                "key": pa.array(ukey, pa.int64()),
                "n": pa.array(tot, pa.int64()),
            },
            schema=_SUM,
        )

    summary = (
        absorb_empty_blocks(
            absorb_empty_blocks(
                ds.map_batches(key_rows, batch_format="pyarrow"), batch_size=131072
            )
            .groupby("oshard")
            .map_groups(
                lambda g: expand(_dropg(g, ["oshard"])), batch_format="pyarrow"
            ),
            batch_size=131072,
        )
        .groupby("gs")
        .map_groups(finish, batch_format="pyarrow")
    ).materialize()

    _OUT = pa.schema(
        [
            ("part_a", pa.int64()),
            ("part_b", pa.int64()),
            ("n_orders", pa.int64()),
            ("n_a", pa.int64()),
            ("n_b", pa.int64()),
            ("support_e6", pa.int64()),
            ("conf_ab_e6", pa.int64()),
            ("conf_ba_e6", pa.int64()),
            ("lift_e6", pa.int64()),
        ]
    )

    def _pick(kind: int, keys: "np.ndarray | None" = None):
        """Vectorized kind/key selection over the small summary table."""

        def sel(t: pa.Table) -> pa.Table:
            m = t.column("kind").to_numpy(zero_copy_only=False) == kind
            if keys is not None:
                m &= np.isin(t.column("key").to_numpy(zero_copy_only=False), keys)
            return t.filter(pa.array(m))

        return summary.map_batches(sel, batch_format="pyarrow")

    top = (
        _pick(0).sort(["n", "key"], descending=[True, False]).limit(k).take_all()
    )  # bounded: k rows
    if not top:
        return _OUT.empty_table()
    need = np.unique(
        np.array(
            [r["key"] >> 21 for r in top] + [r["key"] & ((1 << 21) - 1) for r in top],
            dtype=np.int64,
        )
    )
    marg_rows = _pick(1, need).take_all()  # bounded: <= 2k rows
    marg = {r["key"]: r["n"] for r in marg_rows}
    total = sum(r["n"] for r in _pick(2).take_all())
    cols = {f.name: [] for f in _OUT}
    for r in top:
        a, b, nab = r["key"] >> 21, r["key"] & ((1 << 21) - 1), int(r["n"])
        na, nb = int(marg[a]), int(marg[b])
        cols["part_a"].append(a)
        cols["part_b"].append(b)
        cols["n_orders"].append(nab)
        cols["n_a"].append(na)
        cols["n_b"].append(nb)
        cols["support_e6"].append(10**6 * nab // total)
        cols["conf_ab_e6"].append(10**6 * nab // na)
        cols["conf_ba_e6"].append(10**6 * nab // nb)
        cols["lift_e6"].append(10**6 * total * nab // (na * nb))
    return pa.table(cols, schema=_OUT)


def value_band_pairs(sf_dir: str, n_shards: int = 64) -> ray.data.Dataset:
    """Numeric BAND JOIN (range join on a value axis): pair same-user events
    of the two ``config.BAND_TYPES`` whose cent values differ by at most
    ``config.BAND_EPS_C`` — the |a.v - b.v| <= eps join family member
    (contrast ``interval_overlap``, the time-interval overlap join).
    Reference analogue: the amount-tolerance matching in
    submission/utils/validators.py range checks.

    Scale shape: rows co-partition by user hash (a user's events live
    wholly in one shard, so per-user caps and matches are exact per shard);
    inside a shard both sides lexsort by (user, value) ONCE and every
    B row finds its A window with two vectorized ``searchsorted`` calls on
    a packed (user << 32 | cents) key — no per-row loop, no quadratic
    blowup (users over ``BAND_MAX_PER_SIDE`` on either side are dropped
    before expansion, mirrored in the oracle's HAVING).  Pack widths are
    guarded loudly (user < 2^30, cents < 2^32)."""
    import numpy as np

    from ..config import BAND_EPS_C, BAND_MAX_PER_SIDE, BAND_TYPES
    from ._util import absorb_empty_blocks

    ds = ray.data.read_parquet(
        _pq(sf_dir, "events"),
        columns=["event_id", "user_id", "event_type", "value"],
        filter=(pc.field("event_type").isin(list(BAND_TYPES))),
    )

    _ROWS = pa.schema(
        [
            ("ushard", pa.int32()),
            ("user_id", pa.int64()),
            ("side", pa.int8()),
            ("event_id", pa.int64()),
            ("vc", pa.int64()),
        ]
    )

    def key_rows(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(u) and (u.max() >= (1 << 30) or u.min() < 0):
            raise ValueError(
                "value_band_pairs: user_id must be in [0, 2^30) for the "
                "(user << 32) | cents searchsorted pack; got max %d" % int(u.max())
            )
        vc = np.floor(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        if len(vc) and (vc.max() >= (1 << 32) or vc.min() < 0):
            raise ValueError(
                "value_band_pairs: cents must be in [0, 2^32) for the "
                "(user << 32) | cents searchsorted pack; got %d" % int(vc.max())
            )
        side = pc.equal(t.column("event_type"), BAND_TYPES[1]).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "ushard": pa.array(
                    (((u * 2654435761) % (1 << 32)) % n_shards).astype(np.int32)
                ),
                "user_id": pa.array(u, pa.int64()),
                "side": pa.array(side.astype(np.int8), pa.int8()),
                "event_id": t.column("event_id").cast(pa.int64()),
                "vc": pa.array(vc, pa.int64()),
            },
            schema=_ROWS,
        )

    _OUT = pa.schema(
        [
            ("user_id", pa.int64()),
            ("click_id", pa.int64()),
            ("purchase_id", pa.int64()),
            ("diff_c", pa.int64()),
        ]
    )

    def band_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        side = g.column("side").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        vc = g.column("vc").to_numpy(zero_copy_only=False)
        # per-(user, side) cap: users are whole within this shard, so the
        # counts (and therefore the drop decision) are exact and global
        keep = np.ones(len(u), dtype=bool)
        for s in (0, 1):
            m = side == s
            uu, cnt = np.unique(u[m], return_counts=True)
            hot = uu[cnt > BAND_MAX_PER_SIDE]
            if len(hot):
                keep &= ~(m & np.isin(u, hot))
        u, side, eid, vc = u[keep], side[keep], eid[keep], vc[keep]
        am, bm = side == 0, side == 1
        if not am.any() or not bm.any():
            return _OUT.empty_table()
        apack = (u[am] << 32) | vc[am]
        order = np.argsort(apack, kind="stable")
        apack, aid = apack[order], eid[am][order]
        bu, bv, bid = u[bm], vc[bm], eid[bm]
        lo = np.searchsorted(
            apack, (bu << 32) | np.maximum(bv - BAND_EPS_C, 0), side="left"
        )
        hi = np.searchsorted(
            apack,
            (bu << 32) | np.minimum(bv + BAND_EPS_C, (1 << 32) - 1),
            side="right",
        )
        counts = hi - lo
        b_idx = np.repeat(np.arange(len(bu)), counts)
        blk = np.cumsum(counts) - counts
        a_idx = np.repeat(lo, counts) + (np.arange(counts.sum()) - np.repeat(blk, counts))
        avc = (apack & ((1 << 32) - 1))[a_idx]
        return pa.table(
            {
                "user_id": pa.array(bu[b_idx], pa.int64()),
                "click_id": pa.array(aid[a_idx], pa.int64()),
                "purchase_id": pa.array(bid[b_idx], pa.int64()),
                "diff_c": pa.array(avc - bv[b_idx], pa.int64()),
            },
            schema=_OUT,
        )

    return (
        absorb_empty_blocks(
            ds.map_batches(key_rows, batch_format="pyarrow"), batch_size=131072
        )
        .groupby("ushard")
        .map_groups(lambda g: band_shard(_dropg(g, ["ushard"])), batch_format="pyarrow")
    )


def event_path_topk(sf_dir: str, p: int = 3, k: int = 20, n_shards: int = 64) -> pa.Table:
    """USER-JOURNEY path mining: the top-k most common event-type SEQUENCES
    formed by each user's first ``p`` events (ordered by ts, event_id),
    joined with ``>`` — the full-path sibling of ``event_transitions``'s
    bigram counts (reference analogue: the per-invoice extraction-strategy
    sequencing in submission/utils/extractor.py).

    Scale shape: "first p per user" is an associative min-p combiner, so
    every batch locally sorts by (user, ts, event_id) and keeps at most p
    rows per user BEFORE the user-shard shuffle (the wire carries <= p rows
    per distinct user per block); each user shard finishes the exact first-p
    per user, builds path strings vectorized per count class (the path
    vocabulary is the EVENT_TYPES enum, <= |types|^p values), and collapses
    to (path, n) partials — the driver sees only enum-bounded rows.  Users
    never concentrate: the hottest user still contributes p rows."""
    import numpy as np

    from ._util import absorb_empty_blocks

    ds = ray.data.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "ts", "user_id", "event_type"]
    )

    _ROWS = pa.schema(
        [
            ("ushard", pa.int32()),
            ("user_id", pa.int64()),
            ("ts", pa.int64()),
            ("event_id", pa.int64()),
            ("event_type", pa.string()),
        ]
    )

    def firstp(u, ts, eid) -> "np.ndarray":
        """Indices of the first <= p rows per user given (u, ts, eid) sort
        order keys — shared by the per-batch combiner and the shard finish."""
        order = np.lexsort((eid, ts, u))
        uu = u[order]
        new = np.ones(len(uu), dtype=bool)
        new[1:] = uu[1:] != uu[:-1]
        starts = np.flatnonzero(new)
        run_start = np.repeat(starts, np.diff(np.append(starts, len(uu))))
        rank = np.arange(len(uu)) - run_start
        return order[rank < p], rank[rank < p]

    def batch_partial(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        keep, _ = firstp(u, ts, eid)
        uk = u[keep]
        return pa.table(
            {
                "ushard": pa.array(
                    (((uk * 2654435761) % (1 << 32)) % n_shards).astype(np.int32)
                ),
                "user_id": pa.array(uk, pa.int64()),
                "ts": pa.array(ts[keep], pa.int64()),
                "event_id": pa.array(eid[keep], pa.int64()),
                "event_type": t.column("event_type").take(pa.array(keep)),
            },
            schema=_ROWS,
        )

    _PATHS = pa.schema([("path", pa.string()), ("n_users", pa.int64())])

    def shard_paths(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _PATHS.empty_table()
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        keep, rank = firstp(u, ts, eid)
        types = g.column("event_type").take(pa.array(keep))
        uu = u[keep]
        udoc, inv = np.unique(uu, return_inverse=True)
        cnt = np.bincount(inv, minlength=len(udoc))
        # per-rank type columns aligned by user index; paths built per
        # count class with one vectorized binary join each (no user loop)
        cols = []
        for r in range(p):
            vals = np.full(len(udoc), "", dtype=object)
            m = rank == r
            tv = types.filter(pa.array(m)).to_pylist()
            vals[inv[m]] = tv
            cols.append(vals)
        paths = np.full(len(udoc), "", dtype=object)
        for c in range(1, p + 1):
            m = cnt == c
            if not m.any():
                continue
            joined = cols[0][m]
            for r in range(1, c):
                joined = np.char.add(np.char.add(joined.astype(str), ">"), cols[r][m].astype(str))
            paths[m] = joined
        upath, pcnt = np.unique(paths.astype(str), return_counts=True)
        return pa.table(
            {
                "path": pa.array(upath.tolist(), pa.string()),
                "n_users": pa.array(pcnt.astype(np.int64), pa.int64()),
            },
            schema=_PATHS,
        )

    partials = (
        absorb_empty_blocks(
            ds.map_batches(batch_partial, batch_format="pyarrow"), batch_size=131072
        )
        .groupby("ushard")
        .map_groups(
            lambda g: shard_paths(_dropg(g, ["ushard"])), batch_format="pyarrow"
        )
        .take_all()
    )  # enum-bounded: <= |EVENT_TYPES|^p paths per shard
    agg: dict[str, int] = {}
    for r in partials:
        agg[r["path"]] = agg.get(r["path"], 0) + r["n_users"]
    top = sorted(agg.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pa.table(
        {
            "path": pa.array([t[0] for t in top], pa.string()),
            "n_users": pa.array([t[1] for t in top], pa.int64()),
        },
        schema=_PATHS,
    )


# ---------------------------------------------------------------------------
# TPC-H Q21 shape: per-group exactly-one-witness logic (EXISTS another
# supplier AND NOT EXISTS another *failing* supplier, re-expressed as
# distinct counting inside one orderkey-shard groupby)
# ---------------------------------------------------------------------------


def sole_return_suppliers(
    sf_dir: str, num_shards: int = 64, k: int | None = None
) -> ray.data.Dataset:
    """TPC-H Q21's EXISTS / NOT-EXISTS pair: suppliers credited for orders
    that involve >= 2 distinct suppliers but where EXACTLY ONE supplier has
    a returned (``config.SEMI_JOIN_RETURNFLAG``) lineitem — that supplier
    "caused" the return; report the top ``config.SOLE_RETURN_TOPK``
    suppliers by credited-order count (count desc, suppkey asc).

    Scale shape: Q21's correlated subqueries become distinct counting over
    (orderkey, suppkey) pairs.  Lineitem pre-collapses PER BATCH to
    distinct (orderkey, suppkey, any_returned) triples — an associative OR
    partial, so duplicates across batches merge exactly — and only those
    slim triples ride ONE orderkey-shard groupby.  Each shard finishes the
    per-order logic fully vectorized (lexsort + run detection + segment
    sums: n_supp >= 2 and n_returned == 1 picks the witness row) and emits
    bounded (s_suppkey, n_orders) partials; a tiny supplier-level Sum plus
    sort + limit ends it.  Nothing order- or lineitem-scaled reaches the
    driver; no broadcast side.
    """
    import numpy as np

    from ._util import absorb_empty_blocks, int_segment_sum
    from ..config import SEMI_JOIN_RETURNFLAG, SOLE_RETURN_TOPK

    if k is None:
        k = SOLE_RETURN_TOPK

    def _shard_of(keys: "np.ndarray") -> "np.ndarray":
        return (((keys * 2654435761) % (1 << 32)) % num_shards).astype(np.int32)

    _PART = pa.schema(
        [
            ("oshard", pa.int32()),
            ("okey", pa.int64()),
            ("skey", pa.int64()),
            ("has_r", pa.int64()),
        ]
    )

    def _collapse(ok, sk, hr):
        """Distinct (okey, skey) pairs with OR-combined has_r (as 0/1)."""
        order = np.lexsort((sk, ok))
        ok, sk, hr = ok[order], sk[order], hr[order]
        new = np.ones(len(ok), dtype=bool)
        new[1:] = (ok[1:] != ok[:-1]) | (sk[1:] != sk[:-1])
        starts = np.flatnonzero(new)
        hr_any = (int_segment_sum(hr, starts) > 0).astype(np.int64)
        return ok[starts], sk[starts], hr_any

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PART.empty_table()
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        hr = (
            pc.equal(t.column("l_returnflag"), SEMI_JOIN_RETURNFLAG)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        ok, sk, hr = _collapse(ok, sk, hr)
        return pa.table(
            {
                "oshard": pa.array(_shard_of(ok)),
                "okey": pa.array(ok, pa.int64()),
                "skey": pa.array(sk, pa.int64()),
                "has_r": pa.array(hr, pa.int64()),
            },
            schema=_PART,
        )

    _OUT = pa.schema([("s_suppkey", pa.int64()), ("n_orders", pa.int64())])

    def merge_shard(g: pa.Table) -> pa.Table:
        g = _dropg(g, ["oshard"])
        if g.num_rows == 0:
            return _OUT.empty_table()
        ok = g.column("okey").to_numpy(zero_copy_only=False)
        sk = g.column("skey").to_numpy(zero_copy_only=False)
        hr = g.column("has_r").to_numpy(zero_copy_only=False)
        ok, sk, hr = _collapse(ok, sk, hr)
        # per-order segments over the now-distinct pair rows
        new_o = np.ones(len(ok), dtype=bool)
        new_o[1:] = ok[1:] != ok[:-1]
        ostarts = np.flatnonzero(new_o)
        n_supp = np.diff(np.append(ostarts, len(ok)))
        n_r = int_segment_sum(hr, ostarts)
        seg = np.cumsum(new_o) - 1
        qual = (n_supp >= 2) & (n_r == 1)
        witness = qual[seg] & (hr == 1)
        if not witness.any():
            return _OUT.empty_table()
        us, cnt = np.unique(sk[witness], return_counts=True)
        return pa.table(
            {
                "s_suppkey": pa.array(us, pa.int64()),
                "n_orders": pa.array(cnt.astype(np.int64), pa.int64()),
            },
            schema=_OUT,
        )

    ds = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_returnflag"],
    ).map_batches(partial, batch_format="pyarrow")
    return (
        absorb_empty_blocks(ds, batch_size=131072)
        .groupby("oshard")
        .map_groups(merge_shard, batch_format="pyarrow")
        .groupby("s_suppkey")
        .aggregate(Sum("n_orders", alias_name="n_orders"))
        .sort(["n_orders", "s_suppkey"], descending=[True, False])
        .limit(k)
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: global scalar subquery (avg positive balance) broadcast
# into a stream filter, then a fact anti-join and a per-segment rollup
# ---------------------------------------------------------------------------


def rich_idle_customers(sf_dir: str, num_shards: int = 64) -> ray.data.Dataset:
    """TPC-H Q22's shape: customers whose account balance is STRICTLY above
    the global average positive balance (the scalar subquery) and who have
    placed no order above ``BIG_ORDER_THRESHOLD`` (the predicated NOT
    EXISTS anti-join), rolled up per market segment as
    (c_mktsegment, numcust, totacctbal_c).

    Scale shape, in three scalable pieces:
    - the scalar subquery is a mergeable (sum_cents, n) partial per batch;
      only the tiny partial rows reach the driver, and the comparison stays
      exact-integer (``cents * n > sum``) — no float average.
    - the anti-join is the union co-partition shard merge (orders is
      fact-sized, so NO broadcast side): rich customer rows + per-batch
      DISTINCT big-order custkeys (threshold filter pushed into the orders
      READ for row-group pruning) ride one custkey-shard groupby.
    - each shard pre-collapses survivors to per-segment partials, so the
      final segment groupby shuffles O(segments) rows per shard.
    """
    import numpy as np

    from ._util import absorb_empty_blocks, int_bincount

    def _cents(col) -> "np.ndarray":
        v = col.to_numpy(zero_copy_only=False).astype(np.float64)
        return np.floor(v * 100.0 + 0.5).astype(np.int64)

    # --- pass 1: the scalar subquery as mergeable integer partials -------
    def bal_partial(t: pa.Table) -> pa.Table:
        c = _cents(t.column("c_acctbal"))
        pos = c[c > 0]
        return pa.table(
            {
                "s": pa.array([int(pos.sum())], pa.int64()),
                "n": pa.array([len(pos)], pa.int64()),
            }
        )

    parts = (
        ray.data.read_parquet(_pq(sf_dir, "customer"), columns=["c_acctbal"])
        .map_batches(bal_partial, batch_format="pyarrow")
        .take_all()
    )  # bounded: one row per block
    S = sum(int(r["s"]) for r in parts)
    N = sum(int(r["n"]) for r in parts)

    _MERGED = pa.schema(
        [
            ("cshard", pa.int32()),
            ("key", pa.int64()),
            ("cents", pa.int64()),
            ("segment", pa.string()),
            ("side", pa.int8()),
        ]
    )

    def _shard_of(keys: "np.ndarray") -> "np.ndarray":
        return (((keys * 2654435761) % (1 << 32)) % num_shards).astype(np.int32)

    def cust_rows(t: pa.Table) -> pa.Table:
        c = _cents(t.column("c_acctbal"))
        # exact-integer strictly-above-average test; loud width guard (the
        # product must not wrap int64 — |cents| < 2^27 and N < 2^35 here)
        if len(c) and abs(int(c[np.argmax(np.abs(c))])) * N >= (1 << 62):
            raise ValueError("rich_idle_customers: cents*N would overflow int64")
        rich = c * N > S
        k = t.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)[rich]
        seg = t.column("c_mktsegment").filter(pa.array(rich)).cast(pa.string())
        return pa.table(
            {
                "cshard": pa.array(_shard_of(k)),
                "key": pa.array(k, pa.int64()),
                "cents": pa.array(c[rich], pa.int64()),
                "segment": seg,
                "side": pa.array(np.ones(len(k), dtype=np.int8), pa.int8()),
            },
            schema=_MERGED,
        )

    def order_keys(t: pa.Table) -> pa.Table:
        k = np.unique(
            t.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return pa.table(
            {
                "cshard": pa.array(_shard_of(k)),
                "key": pa.array(k, pa.int64()),
                "cents": pa.array(np.zeros(len(k), dtype=np.int64), pa.int64()),
                "segment": pa.array([""] * len(k), pa.string()),
                "side": pa.array(np.zeros(len(k), dtype=np.int8), pa.int8()),
            },
            schema=_MERGED,
        )

    _OUT = pa.schema(
        [
            ("c_mktsegment", pa.string()),
            ("numcust", pa.int64()),
            ("totacctbal_c", pa.int64()),
        ]
    )

    def anti_rollup(g: pa.Table) -> pa.Table:
        g = _dropg(g, ["cshard"])
        if g.num_rows == 0:
            return _OUT.empty_table()
        side = g.column("side").to_numpy(zero_copy_only=False)
        keys = g.column("key").to_numpy(zero_copy_only=False)
        have = np.unique(keys[side == 0])
        cmask = side == 1
        ck = keys[cmask]
        if len(ck) == 0:
            return _OUT.empty_table()
        if len(have):
            pos = np.searchsorted(have, ck)
            hit = (pos < len(have)) & (have[np.minimum(pos, len(have) - 1)] == ck)
        else:
            hit = np.zeros(len(ck), dtype=bool)
        keep = ~hit
        if not keep.any():
            return _OUT.empty_table()
        cents = g.column("cents").to_numpy(zero_copy_only=False)[cmask][keep]
        seg = g.column("segment").filter(pa.array(cmask)).filter(pa.array(keep))
        enc = seg.combine_chunks().dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nseg = len(enc.dictionary)
        ones = np.ones(len(idx), dtype=np.int64)
        return pa.table(
            {
                "c_mktsegment": enc.dictionary,
                "numcust": pa.array(int_bincount(idx, ones, minlength=nseg)),
                "totacctbal_c": pa.array(int_bincount(idx, cents, minlength=nseg)),
            },
            schema=_OUT,
        )

    cust = ray.data.read_parquet(
        _pq(sf_dir, "customer"),
        columns=["c_custkey", "c_acctbal", "c_mktsegment"],
    ).map_batches(cust_rows, batch_format="pyarrow")
    orders = ray.data.read_parquet(
        _pq(sf_dir, "orders"),
        columns=["o_custkey"],
        filter=(pc.field("o_totalprice") > BIG_ORDER_THRESHOLD),
    ).map_batches(order_keys, batch_format="pyarrow")
    agg = (
        absorb_empty_blocks(cust.union(orders), batch_size=131072)
        .groupby("cshard")
        .map_groups(anti_rollup, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(
            Sum("numcust", alias_name="numcust"),
            Sum("totacctbal_c", alias_name="totacctbal_c"),
        )
    )
    # an all-filtered corpus aggregates to ZERO schema-less blocks — union a
    # schema-carrying empty so consumers always see _OUT's columns
    return agg.union(ray.data.from_arrow(_OUT.empty_table())).sort("c_mktsegment")


# ---------------------------------------------------------------------------
# grouped distribution statistic: per-user Shannon entropy of the event-type
# mix, in exact floor-log2 (bitlen) units so both engines agree bit-for-bit
# ---------------------------------------------------------------------------


def user_event_entropy(sf_dir: str, num_shards: int = 64) -> ray.data.Dataset:
    """Per-user Shannon entropy of the event-type distribution, in the
    repo's bitlen-exact floor-log2 units (``unigram_surprisal``'s trick,
    applied per GROUP instead of against a broadcast global census):
    ``entropy_fl2 = sum_t c_t * (bitlen(n) - bitlen(c_t))`` with
    ``bitlen = np.frexp exponent == length(bin(x))`` oracle-side, plus the
    half-up e4 mean ``(20000*ent + n) // (2*n)``.

    Scale shape: per-batch Arrow group_by emits (user, type, c) partials —
    O(users x types) per block, not O(rows) — and ONE user-shard groupby
    finishes: counts merge by lexsort + run detection, per-user totals and
    the entropy sum are segment sums; nothing user-scaled reaches the
    driver.  Exactness guard: frexp is exact only below 2^53, asserted per
    shard."""
    import numpy as np

    from ._util import absorb_empty_blocks, int_segment_sum

    _PART = pa.schema(
        [
            ("ushard", pa.int32()),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("c", pa.int64()),
        ]
    )

    def _shard_of(keys: "np.ndarray") -> "np.ndarray":
        return (((keys * 2654435761) % (1 << 32)) % num_shards).astype(np.int32)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PART.empty_table()
        g = t.group_by(["user_id", "event_type"]).aggregate([("user_id", "count")])
        u = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "ushard": pa.array(_shard_of(u)),
                "user_id": pa.array(u, pa.int64()),
                "event_type": g.column("event_type").cast(pa.string()),
                "c": g.column("user_id_count").cast(pa.int64()),
            },
            schema=_PART,
        )

    _OUT = pa.schema(
        [
            ("user_id", pa.int64()),
            ("n_events", pa.int64()),
            ("entropy_fl2", pa.int64()),
            ("mean_entropy_e4", pa.int64()),
        ]
    )

    def _bitlen(x: "np.ndarray") -> "np.ndarray":
        return np.frexp(x.astype(np.float64))[1].astype(np.int64)

    def merge_shard(g: pa.Table) -> pa.Table:
        g = _dropg(g, ["ushard"])
        if g.num_rows == 0:
            return _OUT.empty_table()
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        ty = g.column("event_type").combine_chunks().dictionary_encode()
        ti = ty.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        c = g.column("c").to_numpy(zero_copy_only=False)
        order = np.lexsort((ti, u))
        u, ti, c = u[order], ti[order], c[order]
        new = np.ones(len(u), dtype=bool)
        new[1:] = (u[1:] != u[:-1]) | (ti[1:] != ti[:-1])
        starts = np.flatnonzero(new)
        cu = int_segment_sum(c, starts)  # merged per-(user, type) counts
        uu = u[starts]
        new_u = np.ones(len(uu), dtype=bool)
        new_u[1:] = uu[1:] != uu[:-1]
        ustarts = np.flatnonzero(new_u)
        n = int_segment_sum(cu, ustarts)  # per-user totals
        if len(n) and n.max() >= (1 << 53):
            raise ValueError("user_event_entropy: count exceeds exact-frexp range")
        seg = np.cumsum(new_u) - 1
        ent_terms = cu * (_bitlen(n)[seg] - _bitlen(cu))
        ent = int_segment_sum(ent_terms, ustarts)
        mean_e4 = (20000 * ent + n) // (2 * n)
        return pa.table(
            {
                "user_id": pa.array(uu[ustarts], pa.int64()),
                "n_events": pa.array(n, pa.int64()),
                "entropy_fl2": pa.array(ent, pa.int64()),
                "mean_entropy_e4": pa.array(mean_e4, pa.int64()),
            },
            schema=_OUT,
        )

    ds = ray.data.read_parquet(
        _pq(sf_dir, "events"), columns=["user_id", "event_type"]
    ).map_batches(partial, batch_format="pyarrow")
    return (
        absorb_empty_blocks(ds, batch_size=131072)
        .groupby("ushard")
        .map_groups(merge_shard, batch_format="pyarrow")
        .sort("user_id")
    )


# ---------------------------------------------------------------------------
# TPC-H Q7 analogue — bilateral trade flows (the deepest dimension chain:
# supplier-nation AND customer-nation hops on the same fact rows)
# ---------------------------------------------------------------------------


def nation_trade_flows(sf_dir: str, num_shards: int = 64) -> pa.Table:
    """TPC-H Q7 analogue: revenue flowing between the two
    ``config.Q7_NATIONS`` (both directions), by supplier nation, customer
    nation and ship YEAR, inside the ``config.Q7_SHIP_*`` window — the
    canonical two-independent-dimension-hop star: the SAME fact row needs
    its supplier's nation (via l_suppkey) and its customer's nation (via
    l_orderkey -> o_custkey), so no single co-partitioning serves both.

    Scale shape — three chained shard-merge hops, nothing broadcast except
    the spec-constant 25-row nation table (read once on the driver for the
    two target nationkeys + names):

      1. suppkey shard: window-filtered lineitem rows union slim
         NATION-FILTERED supplier rows — the most selective hop runs FIRST,
         so ~(2/|nations|) of the fact survives to the wide hops.
         Survivors re-key by orderkey, pre-combined per (okey, snk, year).
      2. orderkey shard: survivors union slim order rows; probe attaches
         o_custkey; re-key by custkey, pre-combined per (ck, snk, year).
      3. custkey shard: union nation-filtered customer rows; probe attaches
         the customer nation; cross-pair rows (snk != cnk) pre-aggregate to
         <= 2 x 2 x |years| partials per shard — only those reach the
         driver.

    Output: (supp_nation, cust_nation, l_year, revenue_i) ordered by the
    three keys; revenue_i = cents x (10000 - discount_bp), exact integers.
    Reference semantics: submission/utils/validators.py master-data joins
    (multi-hop entity resolution) at arbitrary master size."""
    import datetime as _dt

    import numpy as np
    import pyarrow.parquet as _pqm

    from ..config import Q7_NATIONS, Q7_SHIP_HI, Q7_SHIP_LO
    from ._util import absorb_empty_blocks, strip_schema_metadata

    nat = _pqm.read_table(_pq(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    key_of = dict(
        zip(nat.column("n_name").to_pylist(), nat.column("n_nationkey").to_pylist())
    )
    name_of = {v: k for k, v in key_of.items()}
    _OUT = pa.schema(
        [
            ("supp_nation", pa.string()),
            ("cust_nation", pa.string()),
            ("l_year", pa.int64()),
            ("revenue_i", pa.int64()),
        ]
    )
    if Q7_NATIONS[0] not in key_of or Q7_NATIONS[1] not in key_of:
        return _OUT.empty_table()
    nk = [key_of[Q7_NATIONS[0]], key_of[Q7_NATIONS[1]]]
    lo = _dt.datetime.fromisoformat(Q7_SHIP_LO)
    hi = _dt.datetime.fromisoformat(Q7_SHIP_HI)

    def _shard_of(keys: "np.ndarray") -> "np.ndarray":
        return (((keys * 2654435761) % (1 << 32)) % num_shards).astype(np.int32)

    def _combine3(k1, k2, k3, w):
        """Exact integer sum of w per distinct (k1, k2, k3) triple."""
        order = np.lexsort((k3, k2, k1))
        k1, k2, k3, w = k1[order], k2[order], k3[order], w[order]
        new = np.ones(len(k1), dtype=bool)
        new[1:] = (
            (k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1]) | (k3[1:] != k3[:-1])
        )
        starts = np.flatnonzero(new)
        from ._util import int_segment_sum

        return k1[starts], k2[starts], k3[starts], int_segment_sum(w, starts)

    # ---- stage 1: suppkey shard (nation semijoin + snk attach) ----
    _S1 = pa.schema(
        [
            ("sshard", pa.int32()),
            ("key", pa.int64()),  # suppkey
            ("side", pa.int8()),
            ("okey", pa.int64()),
            ("year", pa.int64()),
            ("rev_i", pa.int64()),
            ("snk", pa.int64()),
        ]
    )

    def li_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _S1.empty_table()
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        ep = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        dc = t.column("l_discount").to_numpy(zero_copy_only=False)
        rev = np.floor(ep * 100.0 + 0.5).astype(np.int64) * (
            10000 - np.floor(dc * 10000.0 + 0.5).astype(np.int64)
        )
        sd = t.column("l_shipdate").to_numpy(zero_copy_only=False)
        year = sd.astype("datetime64[Y]").astype(np.int64) + 1970
        n = len(sk)
        return pa.table(
            {
                "sshard": pa.array(_shard_of(sk)),
                "key": pa.array(sk, pa.int64()),
                "side": pa.array(np.zeros(n, np.int8), pa.int8()),
                "okey": t.column("l_orderkey").cast(pa.int64()),
                "year": pa.array(year, pa.int64()),
                "rev_i": pa.array(rev, pa.int64()),
                "snk": pa.array(np.zeros(n, np.int64), pa.int64()),
            },
            schema=_S1,
        )

    def supp_rows(t: pa.Table) -> pa.Table:
        sk = t.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(sk)
        z = np.zeros(n, np.int64)
        return pa.table(
            {
                "sshard": pa.array(_shard_of(sk)),
                "key": pa.array(sk, pa.int64()),
                "side": pa.array(np.ones(n, np.int8), pa.int8()),
                "okey": pa.array(z, pa.int64()),
                "year": pa.array(z, pa.int64()),
                "rev_i": pa.array(z, pa.int64()),
                "snk": t.column("s_nationkey").cast(pa.int64()),
            },
            schema=_S1,
        )

    li = strip_schema_metadata(
        ray.data.read_parquet(
            _pq(sf_dir, "lineitem"),
            columns=[
                "l_orderkey",
                "l_suppkey",
                "l_extendedprice",
                "l_discount",
                "l_shipdate",
            ],
            filter=(pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi),
        )
    ).map_batches(li_rows, batch_format="pyarrow")
    supp = _read_sized(
        sf_dir, "supplier", ["s_suppkey", "s_nationkey"],
        filter=pc.field("s_nationkey").isin(nk),
    ).map_batches(supp_rows, batch_format="pyarrow")

    _S2 = pa.schema(
        [
            ("oshard", pa.int32()),
            ("key", pa.int64()),  # orderkey
            ("side", pa.int8()),
            ("snk", pa.int64()),
            ("year", pa.int64()),
            ("rev_i", pa.int64()),
            ("cust", pa.int64()),
        ]
    )

    def merge_supp(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _S2.empty_table()
        side = g.column("side").to_numpy(zero_copy_only=False)
        keys = g.column("key").to_numpy(zero_copy_only=False)
        bmask = side == 1
        bkey = keys[bmask]
        pk = keys[~bmask]
        if len(bkey) == 0 or len(pk) == 0:
            return _S2.empty_table()
        bsnk = g.column("snk").to_numpy(zero_copy_only=False)[bmask]
        order = np.argsort(bkey)
        bkey, bsnk = bkey[order], bsnk[order]
        pos = np.searchsorted(bkey, pk)
        hit = (pos < len(bkey)) & (bkey[np.minimum(pos, len(bkey) - 1)] == pk)
        snk = bsnk[pos[hit]]
        okey = g.column("okey").to_numpy(zero_copy_only=False)[~bmask][hit]
        year = g.column("year").to_numpy(zero_copy_only=False)[~bmask][hit]
        rev = g.column("rev_i").to_numpy(zero_copy_only=False)[~bmask][hit]
        okey, snk, year, rev = _combine3(okey, snk, year, rev)
        n = len(okey)
        return pa.table(
            {
                "oshard": pa.array(_shard_of(okey)),
                "key": pa.array(okey, pa.int64()),
                "side": pa.array(np.zeros(n, np.int8), pa.int8()),
                "snk": pa.array(snk, pa.int64()),
                "year": pa.array(year, pa.int64()),
                "rev_i": pa.array(rev, pa.int64()),
                "cust": pa.array(np.zeros(n, np.int64), pa.int64()),
            },
            schema=_S2,
        )

    def ord_rows(t: pa.Table) -> pa.Table:
        ok = t.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ok)
        z = np.zeros(n, np.int64)
        return pa.table(
            {
                "oshard": pa.array(_shard_of(ok)),
                "key": pa.array(ok, pa.int64()),
                "side": pa.array(np.ones(n, np.int8), pa.int8()),
                "snk": pa.array(z, pa.int64()),
                "year": pa.array(z, pa.int64()),
                "rev_i": pa.array(z, pa.int64()),
                "cust": t.column("o_custkey").cast(pa.int64()),
            },
            schema=_S2,
        )

    stage1 = (
        absorb_empty_blocks(li.union(supp), batch_size=131072)
        .groupby("sshard")
        .map_groups(
            lambda g: merge_supp(_dropg(g, ["sshard"])), batch_format="pyarrow"
        )
    )
    orders = _read_sized(
        sf_dir, "orders", ["o_orderkey", "o_custkey"]
    ).map_batches(ord_rows, batch_format="pyarrow")

    _S3 = pa.schema(
        [
            ("cshard", pa.int32()),
            ("key", pa.int64()),  # custkey
            ("side", pa.int8()),
            ("snk", pa.int64()),
            ("year", pa.int64()),
            ("rev_i", pa.int64()),
            ("cnk", pa.int64()),
        ]
    )

    def merge_ord(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _S3.empty_table()
        side = g.column("side").to_numpy(zero_copy_only=False)
        keys = g.column("key").to_numpy(zero_copy_only=False)
        bmask = side == 1
        bkey = keys[bmask]
        pk = keys[~bmask]
        if len(bkey) == 0 or len(pk) == 0:
            return _S3.empty_table()
        bcust = g.column("cust").to_numpy(zero_copy_only=False)[bmask]
        order = np.argsort(bkey)
        bkey, bcust = bkey[order], bcust[order]
        pos = np.searchsorted(bkey, pk)
        hit = (pos < len(bkey)) & (bkey[np.minimum(pos, len(bkey) - 1)] == pk)
        cust = bcust[pos[hit]]
        snk = g.column("snk").to_numpy(zero_copy_only=False)[~bmask][hit]
        year = g.column("year").to_numpy(zero_copy_only=False)[~bmask][hit]
        rev = g.column("rev_i").to_numpy(zero_copy_only=False)[~bmask][hit]
        # pre-combine per (cust, snk, year): snk has 2 values, years few
        packed_sy = snk * 8192 + year  # year < 8192 by datetime64 range
        cust, packed, _, rev = _combine3(
            cust, packed_sy, np.zeros(len(cust), np.int64), rev
        )
        n = len(cust)
        return pa.table(
            {
                "cshard": pa.array(_shard_of(cust)),
                "key": pa.array(cust, pa.int64()),
                "side": pa.array(np.zeros(n, np.int8), pa.int8()),
                "snk": pa.array(packed // 8192, pa.int64()),
                "year": pa.array(packed % 8192, pa.int64()),
                "rev_i": pa.array(rev, pa.int64()),
                "cnk": pa.array(np.zeros(n, np.int64), pa.int64()),
            },
            schema=_S3,
        )

    def cust_rows(t: pa.Table) -> pa.Table:
        ck = t.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ck)
        z = np.zeros(n, np.int64)
        return pa.table(
            {
                "cshard": pa.array(_shard_of(ck)),
                "key": pa.array(ck, pa.int64()),
                "side": pa.array(np.ones(n, np.int8), pa.int8()),
                "snk": pa.array(z, pa.int64()),
                "year": pa.array(z, pa.int64()),
                "rev_i": pa.array(z, pa.int64()),
                "cnk": t.column("c_nationkey").cast(pa.int64()),
            },
            schema=_S3,
        )

    stage2 = (
        absorb_empty_blocks(stage1.union(orders), batch_size=131072)
        .groupby("oshard")
        .map_groups(
            lambda g: merge_ord(_dropg(g, ["oshard"])), batch_format="pyarrow"
        )
    )
    cust = _read_sized(
        sf_dir, "customer", ["c_custkey", "c_nationkey"],
        filter=pc.field("c_nationkey").isin(nk),
    ).map_batches(cust_rows, batch_format="pyarrow")

    _PARTIAL = pa.schema(
        [("snk", pa.int64()), ("cnk", pa.int64()), ("year", pa.int64()), ("rev_i", pa.int64())]
    )

    def merge_cust(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _PARTIAL.empty_table()
        side = g.column("side").to_numpy(zero_copy_only=False)
        keys = g.column("key").to_numpy(zero_copy_only=False)
        bmask = side == 1
        bkey = keys[bmask]
        pk = keys[~bmask]
        if len(bkey) == 0 or len(pk) == 0:
            return _PARTIAL.empty_table()
        bcnk = g.column("cnk").to_numpy(zero_copy_only=False)[bmask]
        order = np.argsort(bkey)
        bkey, bcnk = bkey[order], bcnk[order]
        pos = np.searchsorted(bkey, pk)
        hit = (pos < len(bkey)) & (bkey[np.minimum(pos, len(bkey) - 1)] == pk)
        cnk = bcnk[pos[hit]]
        snk = g.column("snk").to_numpy(zero_copy_only=False)[~bmask][hit]
        year = g.column("year").to_numpy(zero_copy_only=False)[~bmask][hit]
        rev = g.column("rev_i").to_numpy(zero_copy_only=False)[~bmask][hit]
        cross = snk != cnk
        snk, cnk, year, rev = snk[cross], cnk[cross], year[cross], rev[cross]
        if len(snk) == 0:
            return _PARTIAL.empty_table()
        snk, cnk, year2, rev = _combine3(snk, cnk, year, rev)
        return pa.table(
            {
                "snk": pa.array(snk, pa.int64()),
                "cnk": pa.array(cnk, pa.int64()),
                "year": pa.array(year2, pa.int64()),
                "rev_i": pa.array(rev, pa.int64()),
            },
            schema=_PARTIAL,
        )

    rows = (
        absorb_empty_blocks(stage2.union(cust), batch_size=131072)
        .groupby("cshard")
        .map_groups(
            lambda g: merge_cust(_dropg(g, ["cshard"])), batch_format="pyarrow"
        )
        .take_all()
    )
    agg: dict[tuple[int, int, int], int] = {}
    for r in rows:
        k = (int(r["snk"]), int(r["cnk"]), int(r["year"]))
        agg[k] = agg.get(k, 0) + int(r["rev_i"])
    keys = sorted(agg, key=lambda k: (name_of[k[0]], name_of[k[1]], k[2]))
    return pa.table(
        {
            "supp_nation": pa.array([name_of[k[0]] for k in keys], pa.string()),
            "cust_nation": pa.array([name_of[k[1]] for k in keys], pa.string()),
            "l_year": pa.array([k[2] for k in keys], pa.int64()),
            "revenue_i": pa.array([agg[k] for k in keys], pa.int64()),
        },
        schema=_OUT,
    )


# ---------------------------------------------------------------------------
# TPC-H Q15 analogue — global argmax WITH TIES over an aggregated view
# ---------------------------------------------------------------------------


def top_supplier_revenue(sf_dir: str, num_shards: int = 64) -> pa.Table:
    """TPC-H Q15 analogue: the supplier(s) with the MAXIMUM total revenue
    inside the ``config.Q15_SHIP_*`` quarter — ties all surface, names
    recovered.  The shape the registry lacked: a GLOBAL argmax over an
    aggregated view (cheapest_supplier is the groupwise cousin).

    Scale shape: window-filtered lineitem pre-combines (suppkey, rev_i) per
    batch; ONE suppkey-shard groupby finishes exact per-supplier totals
    (totals are complete per shard since sharded by key) and emits only its
    LOCAL max rows — <= ties-per-shard rows reach the driver, never the
    supplier census.  The global max + ties resolve over <= num_shards
    candidate groups; name recovery reads supplier with an isin filter on
    the tie set (result-bounded, typically 1).

    Output: (s_suppkey, s_name, total_revenue_i) ordered by s_suppkey."""
    import datetime as _dt

    import numpy as np
    import pyarrow.parquet as _pqm

    from ..config import Q15_SHIP_HI, Q15_SHIP_LO
    from ._util import absorb_empty_blocks, combine_by_key

    lo = _dt.datetime.fromisoformat(Q15_SHIP_LO)
    hi = _dt.datetime.fromisoformat(Q15_SHIP_HI)
    _OUT = pa.schema(
        [
            ("s_suppkey", pa.int64()),
            ("s_name", pa.string()),
            ("total_revenue_i", pa.int64()),
        ]
    )

    def _shard_of(keys: "np.ndarray") -> "np.ndarray":
        return (((keys * 2654435761) % (1 << 32)) % num_shards).astype(np.int32)

    _P = pa.schema(
        [("sshard", pa.int32()), ("key", pa.int64()), ("rev_i", pa.int64())]
    )

    def li_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _P.empty_table()
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        ep = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        dc = t.column("l_discount").to_numpy(zero_copy_only=False)
        rev = np.floor(ep * 100.0 + 0.5).astype(np.int64) * (
            10000 - np.floor(dc * 10000.0 + 0.5).astype(np.int64)
        )
        kk, rr = combine_by_key(sk, rev)
        return pa.table(
            {
                "sshard": pa.array(_shard_of(kk)),
                "key": pa.array(kk, pa.int64()),
                "rev_i": pa.array(rr, pa.int64()),
            },
            schema=_P,
        )

    _CAND = pa.schema([("key", pa.int64()), ("rev_i", pa.int64())])

    def shard_max(g: pa.Table) -> pa.Table:
        g = _dropg(g, ["sshard"])
        if g.num_rows == 0:
            return _CAND.empty_table()
        k = g.column("key").to_numpy(zero_copy_only=False)
        r = g.column("rev_i").to_numpy(zero_copy_only=False)
        kk, rr = combine_by_key(k, r)
        m = rr.max()
        keep = rr == m
        return pa.table(
            {"key": pa.array(kk[keep], pa.int64()), "rev_i": pa.array(rr[keep], pa.int64())},
            schema=_CAND,
        )

    li = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi),
    ).map_batches(li_partial, batch_format="pyarrow")
    cands = (
        absorb_empty_blocks(li, batch_size=131072)
        .groupby("sshard")
        .map_groups(shard_max, batch_format="pyarrow")
        .take_all()
    )
    if not cands:
        return _OUT.empty_table()
    best = max(int(r["rev_i"]) for r in cands)
    winners = sorted(int(r["key"]) for r in cands if int(r["rev_i"]) == best)
    # result-bounded recovery: |winners| is the global tie count
    names = _pqm.read_table(
        _pq(sf_dir, "supplier"),
        columns=["s_suppkey", "s_name"],
        filters=[("s_suppkey", "in", winners)],
    )
    nmap = dict(
        zip(names.column("s_suppkey").to_pylist(), names.column("s_name").to_pylist())
    )
    return pa.table(
        {
            "s_suppkey": pa.array(winners, pa.int64()),
            "s_name": pa.array([nmap.get(w) for w in winners], pa.string()),
            "total_revenue_i": pa.array([best] * len(winners), pa.int64()),
        },
        schema=_OUT,
    )


# ---------------------------------------------------------------------------
# TPC-H Q14 analogue — conditional ratio aggregate over a dimension join
# ---------------------------------------------------------------------------


def promo_revenue_share(sf_dir: str, num_shards: int = 64) -> pa.Table:
    """TPC-H Q14 analogue: the share (e6 fixed point) of ship-month revenue
    coming from parts of type ``config.Q14_PROMO_TYPE`` — the conditional
    RATIO-of-sums over a join, computed without ever materializing the
    join: lineitem pre-combines (partkey, rev_i) per batch inside the
    ``config.Q14_SHIP_*`` window; slim (partkey, is_promo) part rows ride
    the same partkey-shard groupby; each shard emits ONE (promo_i, total_i)
    scalar row.  Only rows whose partkey exists in ``part`` count (join
    semantics, not FK trust).  The driver sums <= num_shards partials in
    arbitrary-precision ints and divides once.

    Output: one row (promo_revenue_i, total_revenue_i, promo_share_e6);
    empty table when the window has no joined rows (the oracle's HAVING
    mirrors this)."""
    import datetime as _dt

    import numpy as np

    from ..config import Q14_PROMO_TYPE, Q14_SHIP_HI, Q14_SHIP_LO
    from ._util import absorb_empty_blocks, combine_by_key, strip_schema_metadata

    lo = _dt.datetime.fromisoformat(Q14_SHIP_LO)
    hi = _dt.datetime.fromisoformat(Q14_SHIP_HI)

    def _shard_of(keys: "np.ndarray") -> "np.ndarray":
        return (((keys * 2654435761) % (1 << 32)) % num_shards).astype(np.int32)

    _M = pa.schema(
        [
            ("pshard", pa.int32()),
            ("key", pa.int64()),
            ("side", pa.int8()),
            ("rev_i", pa.int64()),
            ("promo", pa.int8()),
        ]
    )

    def li_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _M.empty_table()
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        ep = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        dc = t.column("l_discount").to_numpy(zero_copy_only=False)
        rev = np.floor(ep * 100.0 + 0.5).astype(np.int64) * (
            10000 - np.floor(dc * 10000.0 + 0.5).astype(np.int64)
        )
        kk, rr = combine_by_key(pk, rev)
        n = len(kk)
        return pa.table(
            {
                "pshard": pa.array(_shard_of(kk)),
                "key": pa.array(kk, pa.int64()),
                "side": pa.array(np.zeros(n, np.int8), pa.int8()),
                "rev_i": pa.array(rr, pa.int64()),
                "promo": pa.array(np.zeros(n, np.int8), pa.int8()),
            },
            schema=_M,
        )

    def part_rows(t: pa.Table) -> pa.Table:
        pk = t.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        promo = pc.equal(t.column("p_type"), Q14_PROMO_TYPE).to_numpy(
            zero_copy_only=False
        )
        n = len(pk)
        return pa.table(
            {
                "pshard": pa.array(_shard_of(pk)),
                "key": pa.array(pk, pa.int64()),
                "side": pa.array(np.ones(n, np.int8), pa.int8()),
                "rev_i": pa.array(np.zeros(n, np.int64), pa.int64()),
                "promo": pa.array(promo.astype(np.int8), pa.int8()),
            },
            schema=_M,
        )

    _S = pa.schema([("promo_i", pa.int64()), ("total_i", pa.int64())])

    def merge_shard(g: pa.Table) -> pa.Table:
        g = _dropg(g, ["pshard"])
        if g.num_rows == 0:
            return _S.empty_table()
        side = g.column("side").to_numpy(zero_copy_only=False)
        keys = g.column("key").to_numpy(zero_copy_only=False)
        bmask = side == 1
        bkey = keys[bmask]
        pk = keys[~bmask]
        if len(bkey) == 0 or len(pk) == 0:
            return _S.empty_table()
        bpromo = g.column("promo").to_numpy(zero_copy_only=False)[bmask]
        order = np.argsort(bkey)
        bkey, bpromo = bkey[order], bpromo[order]
        pos = np.searchsorted(bkey, pk)
        hit = (pos < len(bkey)) & (bkey[np.minimum(pos, len(bkey) - 1)] == pk)
        rev = g.column("rev_i").to_numpy(zero_copy_only=False)[~bmask][hit]
        promo = bpromo[pos[hit]].astype(bool)
        if len(rev) == 0:
            return _S.empty_table()
        return pa.table(
            {
                "promo_i": pa.array([_safe_isum(rev[promo])], pa.int64()),
                "total_i": pa.array([_safe_isum(rev)], pa.int64()),
            },
            schema=_S,
        )

    li = strip_schema_metadata(
        ray.data.read_parquet(
            _pq(sf_dir, "lineitem"),
            columns=["l_partkey", "l_extendedprice", "l_discount"],
            filter=(pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi),
        )
    ).map_batches(li_partial, batch_format="pyarrow")
    part = _read_sized(
        sf_dir, "part", ["p_partkey", "p_type"]
    ).map_batches(part_rows, batch_format="pyarrow")
    rows = (
        absorb_empty_blocks(li.union(part), batch_size=131072)
        .groupby("pshard")
        .map_groups(merge_shard, batch_format="pyarrow")
        .take_all()
    )
    _OUT = pa.schema(
        [
            ("promo_revenue_i", pa.int64()),
            ("total_revenue_i", pa.int64()),
            ("promo_share_e6", pa.int64()),
        ]
    )
    promo_i = sum(int(r["promo_i"]) for r in rows)
    total_i = sum(int(r["total_i"]) for r in rows)
    if not rows or total_i == 0:
        return _OUT.empty_table()
    return pa.table(
        {
            "promo_revenue_i": pa.array([promo_i], pa.int64()),
            "total_revenue_i": pa.array([total_i], pa.int64()),
            "promo_share_e6": pa.array([(1_000_000 * promo_i) // total_i], pa.int64()),
        },
        schema=_OUT,
    )


# ---------------------------------------------------------------------------
# TPC-H Q19 analogue — disjunctive (OR-of-ANDs) predicate join
# ---------------------------------------------------------------------------


def disjunctive_revenue(sf_dir: str, num_shards: int = 64) -> pa.Table:
    """TPC-H Q19 analogue: total revenue of lineitems whose part satisfies
    ANY of the ``config.Q19_CLAUSES`` (brand, size band, quantity band)
    conjunctions — the disjunctive multi-clause predicate that defeats
    single-predicate pushdown.

    Scale shape: the part side collapses each part to a CLAUSE BITMASK
    (brand+size are part-local) and ships only parts with a nonzero mask —
    the disjunction's part-side selectivity prunes the shuffle; lineitem
    pre-combines (partkey, qty) pair partials per batch (qty is a small
    int, so pairs are bounded per block — Q17's sufficient-statistic
    trick); each partkey shard probes the mask, applies the qty band PER
    CLAUSE BIT vectorized, and emits one scalar.  Driver sums
    <= num_shards rows.

    Output: one row (revenue_i); empty when nothing qualifies."""
    import numpy as np

    from ..config import Q19_CLAUSES
    from ._util import absorb_empty_blocks, int_segment_sum, strip_schema_metadata

    def _shard_of(keys: "np.ndarray") -> "np.ndarray":
        return (((keys * 2654435761) % (1 << 32)) % num_shards).astype(np.int32)

    _M = pa.schema(
        [
            ("pshard", pa.int32()),
            ("key", pa.int64()),
            ("side", pa.int8()),
            ("qty", pa.int64()),
            ("rev_i", pa.int64()),
            ("mask", pa.int64()),
        ]
    )

    def part_rows(t: pa.Table) -> pa.Table:
        pk = t.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        brand = t.column("p_brand").to_numpy(zero_copy_only=False)
        size = t.column("p_size").to_numpy(zero_copy_only=False).astype(np.int64)
        mask = np.zeros(len(pk), np.int64)
        for b, (cb, slo, shi, _, _) in enumerate(Q19_CLAUSES):
            mask |= ((brand == cb) & (size >= slo) & (size <= shi)).astype(
                np.int64
            ) << b
        keep = mask != 0
        pk, mask = pk[keep], mask[keep]
        n = len(pk)
        z = np.zeros(n, np.int64)
        return pa.table(
            {
                "pshard": pa.array(_shard_of(pk)),
                "key": pa.array(pk, pa.int64()),
                "side": pa.array(np.ones(n, np.int8), pa.int8()),
                "qty": pa.array(z, pa.int64()),
                "rev_i": pa.array(z, pa.int64()),
                "mask": pa.array(mask, pa.int64()),
            },
            schema=_M,
        )

    def li_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _M.empty_table()
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        qty = np.floor(
            t.column("l_quantity").to_numpy(zero_copy_only=False) + 0.5
        ).astype(np.int64)
        ep = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        dc = t.column("l_discount").to_numpy(zero_copy_only=False)
        rev = np.floor(ep * 100.0 + 0.5).astype(np.int64) * (
            10000 - np.floor(dc * 10000.0 + 0.5).astype(np.int64)
        )
        order = np.lexsort((qty, pk))
        pk, qty, rev = pk[order], qty[order], rev[order]
        new = np.ones(len(pk), dtype=bool)
        new[1:] = (pk[1:] != pk[:-1]) | (qty[1:] != qty[:-1])
        starts = np.flatnonzero(new)
        upk, uq = pk[starts], qty[starts]
        n = len(upk)
        return pa.table(
            {
                "pshard": pa.array(_shard_of(upk)),
                "key": pa.array(upk, pa.int64()),
                "side": pa.array(np.zeros(n, np.int8), pa.int8()),
                "qty": pa.array(uq, pa.int64()),
                "rev_i": pa.array(int_segment_sum(rev, starts), pa.int64()),
                "mask": pa.array(np.zeros(n, np.int64), pa.int64()),
            },
            schema=_M,
        )

    _S = pa.schema([("rev_i", pa.int64())])

    def merge_shard(g: pa.Table) -> pa.Table:
        g = _dropg(g, ["pshard"])
        if g.num_rows == 0:
            return _S.empty_table()
        side = g.column("side").to_numpy(zero_copy_only=False)
        keys = g.column("key").to_numpy(zero_copy_only=False)
        bmask = side == 1
        bkey = keys[bmask]
        pk = keys[~bmask]
        if len(bkey) == 0 or len(pk) == 0:
            return _S.empty_table()
        bm = g.column("mask").to_numpy(zero_copy_only=False)[bmask]
        order = np.argsort(bkey)
        bkey, bm = bkey[order], bm[order]
        pos = np.searchsorted(bkey, pk)
        hit = (pos < len(bkey)) & (bkey[np.minimum(pos, len(bkey) - 1)] == pk)
        mask = bm[pos[hit]]
        qty = g.column("qty").to_numpy(zero_copy_only=False)[~bmask][hit]
        rev = g.column("rev_i").to_numpy(zero_copy_only=False)[~bmask][hit]
        ok = np.zeros(len(qty), dtype=bool)
        for b, (_, _, _, qlo, qhi) in enumerate(Q19_CLAUSES):
            ok |= (((mask >> b) & 1) == 1) & (qty >= qlo) & (qty <= qhi)
        if not ok.any():
            return _S.empty_table()
        return pa.table(
            {"rev_i": pa.array([_safe_isum(rev[ok])], pa.int64())}, schema=_S
        )

    part = _read_sized(
        sf_dir, "part", ["p_partkey", "p_brand", "p_size"]
    ).map_batches(part_rows, batch_format="pyarrow")
    li = strip_schema_metadata(
        ray.data.read_parquet(
            _pq(sf_dir, "lineitem"),
            columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        )
    ).map_batches(li_pairs, batch_format="pyarrow")
    rows = (
        absorb_empty_blocks(li.union(part), batch_size=131072)
        .groupby("pshard")
        .map_groups(merge_shard, batch_format="pyarrow")
        .take_all()
    )
    _OUT = pa.schema([("revenue_i", pa.int64())])
    if not rows:
        return _OUT.empty_table()
    return pa.table(
        {"revenue_i": pa.array([sum(int(r["rev_i"]) for r in rows)], pa.int64())},
        schema=_OUT,
    )


# ---------------------------------------------------------------------------
# TPC-H Q10 analogue — returned-item customer report (top-K with recovery)
# ---------------------------------------------------------------------------


def returned_item_report(sf_dir: str, num_shards: int = 64) -> pa.Table:
    """TPC-H Q10 analogue: the ``config.Q10_TOPK`` customers by revenue of
    RETURNED (``config.SEMI_JOIN_RETURNFLAG``) lineitems whose order falls
    in the ``config.Q10_ORDER_*`` quarter, with name / account balance /
    nation recovered — the lost-revenue triage report.

    Scale shape: returnflag-filtered lineitem pre-combines (orderkey,
    rev_i) per batch and union-merges with window-filtered slim order rows
    on ONE orderkey shard (both filters pushed to the reads); surviving
    (custkey, rev_i) partials ride a SECOND custkey-shard groupby whose
    shards own complete per-customer totals and emit only their LOCAL
    top-K — <= K x num_shards rows reach the driver, never the customer
    census.  Recovery reads customer with an isin filter on the K winners
    (result-bounded); nation is the spec-constant 25-row map.

    Output: (c_custkey, c_name, acctbal_c, n_name, revenue_i) ordered by
    revenue DESC then custkey (the oracle's deterministic tie-break).
    The customer-name join runs BEFORE the final cut (a dangling custkey
    promotes the next candidate, mirroring SQL's LIMIT-on-joined-view);
    the per-shard candidate cut itself assumes the declared FK contract
    (``data_quality_report`` audits violations)."""
    import datetime as _dt

    import numpy as np
    import pyarrow.parquet as _pqm

    from ..config import Q10_ORDER_HI, Q10_ORDER_LO, Q10_TOPK, SEMI_JOIN_RETURNFLAG
    from ._util import absorb_empty_blocks, combine_by_key, strip_schema_metadata

    lo = _dt.datetime.fromisoformat(Q10_ORDER_LO)
    hi = _dt.datetime.fromisoformat(Q10_ORDER_HI)
    _OUT = pa.schema(
        [
            ("c_custkey", pa.int64()),
            ("c_name", pa.string()),
            ("acctbal_c", pa.int64()),
            ("n_name", pa.string()),
            ("revenue_i", pa.int64()),
        ]
    )

    def _shard_of(keys: "np.ndarray") -> "np.ndarray":
        return (((keys * 2654435761) % (1 << 32)) % num_shards).astype(np.int32)

    _M = pa.schema(
        [
            ("oshard", pa.int32()),
            ("key", pa.int64()),
            ("side", pa.int8()),
            ("rev_i", pa.int64()),
            ("cust", pa.int64()),
        ]
    )

    def li_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _M.empty_table()
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        ep = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        dc = t.column("l_discount").to_numpy(zero_copy_only=False)
        rev = np.floor(ep * 100.0 + 0.5).astype(np.int64) * (
            10000 - np.floor(dc * 10000.0 + 0.5).astype(np.int64)
        )
        kk, rr = combine_by_key(ok, rev)
        n = len(kk)
        return pa.table(
            {
                "oshard": pa.array(_shard_of(kk)),
                "key": pa.array(kk, pa.int64()),
                "side": pa.array(np.zeros(n, np.int8), pa.int8()),
                "rev_i": pa.array(rr, pa.int64()),
                "cust": pa.array(np.zeros(n, np.int64), pa.int64()),
            },
            schema=_M,
        )

    def ord_rows(t: pa.Table) -> pa.Table:
        ok = t.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ok)
        return pa.table(
            {
                "oshard": pa.array(_shard_of(ok)),
                "key": pa.array(ok, pa.int64()),
                "side": pa.array(np.ones(n, np.int8), pa.int8()),
                "rev_i": pa.array(np.zeros(n, np.int64), pa.int64()),
                "cust": t.column("o_custkey").cast(pa.int64()),
            },
            schema=_M,
        )

    _C = pa.schema(
        [("cshard", pa.int32()), ("key", pa.int64()), ("rev_i", pa.int64())]
    )

    def merge_orders(g: pa.Table) -> pa.Table:
        g = _dropg(g, ["oshard"])
        if g.num_rows == 0:
            return _C.empty_table()
        side = g.column("side").to_numpy(zero_copy_only=False)
        keys = g.column("key").to_numpy(zero_copy_only=False)
        bmask = side == 1
        bkey = keys[bmask]
        pk = keys[~bmask]
        if len(bkey) == 0 or len(pk) == 0:
            return _C.empty_table()
        bcust = g.column("cust").to_numpy(zero_copy_only=False)[bmask]
        order = np.argsort(bkey)
        bkey, bcust = bkey[order], bcust[order]
        pos = np.searchsorted(bkey, pk)
        hit = (pos < len(bkey)) & (bkey[np.minimum(pos, len(bkey) - 1)] == pk)
        cust = bcust[pos[hit]]
        rev = g.column("rev_i").to_numpy(zero_copy_only=False)[~bmask][hit]
        kk, rr = combine_by_key(cust, rev)
        return pa.table(
            {
                "cshard": pa.array(_shard_of(kk)),
                "key": pa.array(kk, pa.int64()),
                "rev_i": pa.array(rr, pa.int64()),
            },
            schema=_C,
        )

    _T = pa.schema([("key", pa.int64()), ("rev_i", pa.int64())])

    def shard_topk(g: pa.Table) -> pa.Table:
        g = _dropg(g, ["cshard"])
        if g.num_rows == 0:
            return _T.empty_table()
        kk, rr = combine_by_key(
            g.column("key").to_numpy(zero_copy_only=False),
            g.column("rev_i").to_numpy(zero_copy_only=False),
        )
        order = np.lexsort((kk, -rr))[: Q10_TOPK]
        return pa.table(
            {
                "key": pa.array(kk[order], pa.int64()),
                "rev_i": pa.array(rr[order], pa.int64()),
            },
            schema=_T,
        )

    li = strip_schema_metadata(
        ray.data.read_parquet(
            _pq(sf_dir, "lineitem"),
            columns=["l_orderkey", "l_extendedprice", "l_discount"],
            filter=pc.field("l_returnflag") == SEMI_JOIN_RETURNFLAG,
        )
    ).map_batches(li_partial, batch_format="pyarrow")
    orders = _read_sized(
        sf_dir, "orders", ["o_orderkey", "o_custkey"],
        filter=(pc.field("o_orderdate") >= lo) & (pc.field("o_orderdate") < hi),
    ).map_batches(ord_rows, batch_format="pyarrow")

    cands = (
        absorb_empty_blocks(li.union(orders), batch_size=131072)
        .groupby("oshard")
        .map_groups(merge_orders, batch_format="pyarrow")
        .groupby("cshard")
        .map_groups(shard_topk, batch_format="pyarrow")
        .take_all()
    )
    if not cands:
        return _OUT.empty_table()
    # join BEFORE the cut (the oracle's LIMIT runs on the joined view, so a
    # dangling custkey must promote the next candidate, not shrink the K):
    # probe ALL candidates — bounded by K x num_shards, never customer-sized
    all_keys = sorted({int(r["key"]) for r in cands})
    cust = _pqm.read_table(
        _pq(sf_dir, "customer"),
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
        filters=[("c_custkey", "in", all_keys)],
    )
    nat = _pqm.read_table(_pq(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    nname = dict(
        zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist())
    )
    info = {int(r["c_custkey"]): r for r in cust.to_pylist()}
    joined = [r for r in cands if int(r["key"]) in info]
    top = sorted(joined, key=lambda r: (-int(r["rev_i"]), int(r["key"])))[:Q10_TOPK]
    keep = [int(r["key"]) for r in top]
    rev_of = {int(r["key"]): int(r["rev_i"]) for r in top}
    return pa.table(
        {
            "c_custkey": pa.array(keep, pa.int64()),
            "c_name": pa.array([info[k]["c_name"] for k in keep], pa.string()),
            "acctbal_c": pa.array(
                [int(np.floor(info[k]["c_acctbal"] * 100.0 + 0.5)) for k in keep],
                pa.int64(),
            ),
            "n_name": pa.array(
                [nname.get(info[k]["c_nationkey"]) for k in keep], pa.string()
            ),
            "revenue_i": pa.array([rev_of[k] for k in keep], pa.int64()),
        },
        schema=_OUT,
    )


# ---------------------------------------------------------------------------
# TPC-H Q8 analogue — market share (the deepest dimension chain + ratio)
# ---------------------------------------------------------------------------


def market_share(sf_dir: str, num_shards: int = 64) -> pa.Table:
    """TPC-H Q8 analogue: per ship YEAR, the e6 revenue share supplied by
    ``config.Q8_NATION`` within the market defined by customers in region
    ``config.Q8_REGION`` and parts of type ``config.Q8_PART_TYPE``, inside
    the ``config.Q8_SHIP_*`` window — the registry's deepest chain: every
    dimension table participates (part, supplier, orders, customer, plus
    the spec-constant nation/region maps).

    Scale shape — FOUR chained shard-merge hops, most selective first,
    each hop's survivors pre-combined before re-keying; only
    (year, is_target) scalar partials reach the driver:

      1. partkey shard: window-filtered lineitem rows semijoin
         type-filtered part keys (the chain's sharpest filter).
      2. suppkey shard: survivors union slim supplier rows; the nation
         test collapses to an is_target BIT at attach (the nation id
         itself never rides further hops).
      3. orderkey shard: attach o_custkey; combine per (cust, flag, year).
      4. custkey shard: semijoin region-filtered customer keys (the
         nationkey-set filter is the constant 25-row nation->region map
         pushed INTO the customer read); emit per-shard
         (year, target_i, total_i) rows.

    Output: (l_year, target_revenue_i, total_revenue_i, share_e6) ordered
    by year; the share divides once per year in python ints."""
    import datetime as _dt

    import numpy as np
    import pyarrow.parquet as _pqm

    from ..config import Q8_NATION, Q8_PART_TYPE, Q8_REGION, Q8_SHIP_HI, Q8_SHIP_LO
    from ._util import absorb_empty_blocks, int_segment_sum, strip_schema_metadata

    _OUT = pa.schema(
        [
            ("l_year", pa.int64()),
            ("target_revenue_i", pa.int64()),
            ("total_revenue_i", pa.int64()),
            ("share_e6", pa.int64()),
        ]
    )
    nat = _pqm.read_table(_pq(sf_dir, "nation"))
    reg = _pqm.read_table(_pq(sf_dir, "region"))
    rkeys = [
        r["r_regionkey"] for r in reg.to_pylist() if r["r_name"] == Q8_REGION
    ]
    target_nk = [
        r["n_nationkey"] for r in nat.to_pylist() if r["n_name"] == Q8_NATION
    ]
    region_nks = [
        r["n_nationkey"] for r in nat.to_pylist() if r["n_regionkey"] in rkeys
    ]
    if not target_nk or not region_nks:
        return _OUT.empty_table()
    target_nk = target_nk[0]
    lo = _dt.datetime.fromisoformat(Q8_SHIP_LO)
    hi = _dt.datetime.fromisoformat(Q8_SHIP_HI)

    def _shard_of(keys: "np.ndarray") -> "np.ndarray":
        return (((keys * 2654435761) % (1 << 32)) % num_shards).astype(np.int32)

    # one wire schema for all four hops: key is the CURRENT hop key; a/b
    # carry the remaining future keys (suppkey/orderkey, then custkey slot)
    _W = pa.schema(
        [
            ("shard", pa.int32()),
            ("key", pa.int64()),
            ("side", pa.int8()),
            ("a", pa.int64()),
            ("b", pa.int64()),
            ("year", pa.int64()),
            ("rev_i", pa.int64()),
            ("flag", pa.int8()),
        ]
    )

    def _wire(shard, key, side, a, b, year, rev, flag) -> pa.Table:
        return pa.table(
            {
                "shard": pa.array(shard),
                "key": pa.array(key, pa.int64()),
                "side": pa.array(side, pa.int8()),
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "year": pa.array(year, pa.int64()),
                "rev_i": pa.array(rev, pa.int64()),
                "flag": pa.array(flag, pa.int8()),
            },
            schema=_W,
        )

    def _zero(n):
        return np.zeros(n, np.int64)

    # bloom-prune lineitem by the TYPE-FILTERED part keys BEFORE the first
    # shuffle (the chain's sharpest filter applied at the probe side):
    # bounded M/8-byte state at any part size; FPs die in the exact merge
    part_bloom = _bloom_of(
        _read_sized(
            sf_dir, "part", ["p_partkey"],
            filter=pc.field("p_type") == Q8_PART_TYPE,
        ),
        "p_partkey",
    )

    def li_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _W.empty_table()
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = _bloom_keep(pk, ray.get(part_bloom))
        t = t.filter(pa.array(keep))
        pk = pk[keep]
        ep = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        dc = t.column("l_discount").to_numpy(zero_copy_only=False)
        rev = np.floor(ep * 100.0 + 0.5).astype(np.int64) * (
            10000 - np.floor(dc * 10000.0 + 0.5).astype(np.int64)
        )
        year = (
            t.column("l_shipdate")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        n = len(pk)
        return _wire(
            _shard_of(pk),
            pk,
            np.zeros(n, np.int8),
            t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64),
            t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64),
            year,
            rev,
            np.zeros(n, np.int8),
        )

    def _dim_keys(col):
        def rows(t: pa.Table) -> pa.Table:
            k = t.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
            n = len(k)
            return _wire(
                _shard_of(k), k, np.ones(n, np.int8), _zero(n), _zero(n),
                _zero(n), _zero(n), np.zeros(n, np.int8),
            )

        return rows

    def supp_rows(t: pa.Table) -> pa.Table:
        k = t.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        flag = (
            t.column("s_nationkey").to_numpy(zero_copy_only=False) == target_nk
        ).astype(np.int8)
        n = len(k)
        return _wire(
            _shard_of(k), k, np.ones(n, np.int8), _zero(n), _zero(n),
            _zero(n), _zero(n), flag,
        )

    def _ord_rows_with(bloom_ref):
        def ord_rows(t: pa.Table) -> pa.Table:
            k = t.column("o_orderkey").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            keep = _bloom_keep(k, ray.get(bloom_ref))
            t = t.filter(pa.array(keep))
            k = k[keep]
            n = len(k)
            return _wire(
                _shard_of(k), k, np.ones(n, np.int8),
                t.column("o_custkey")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                _zero(n), _zero(n), _zero(n), np.zeros(n, np.int8),
            )

        return ord_rows

    def _probe(g: pa.Table):
        """Split the group into fact/dim, sort-probe fact keys into dim
        keys; return (hit-row fact arrays dict, dim pos, dim table)."""
        side = g.column("side").to_numpy(zero_copy_only=False)
        keys = g.column("key").to_numpy(zero_copy_only=False)
        bmask = side == 1
        bkey = keys[bmask]
        pk = keys[~bmask]
        if len(bkey) == 0 or len(pk) == 0:
            return None
        order = np.argsort(bkey)
        bkey = bkey[order]
        pos = np.searchsorted(bkey, pk)
        hit = (pos < len(bkey)) & (bkey[np.minimum(pos, len(bkey) - 1)] == pk)
        fact = {
            c: g.column(c).to_numpy(zero_copy_only=False)[~bmask][hit]
            for c in ("a", "b", "year", "rev_i", "flag")
        }
        return fact, order[pos[hit]], bmask

    def merge_part(g: pa.Table) -> pa.Table:
        g = _dropg(g, ["shard"])
        if g.num_rows == 0:
            return _W.empty_table()
        p = _probe(g)
        if p is None:
            return _W.empty_table()
        f, _, _ = p
        sk = f["a"]
        n = len(sk)
        return _wire(
            _shard_of(sk), sk, np.zeros(n, np.int8), f["b"], _zero(n),
            f["year"], f["rev_i"], f["flag"],
        )

    def merge_supp(g: pa.Table) -> pa.Table:
        g = _dropg(g, ["shard"])
        if g.num_rows == 0:
            return _W.empty_table()
        p = _probe(g)
        if p is None:
            return _W.empty_table()
        f, dpos, bmask = p
        dflag = g.column("flag").to_numpy(zero_copy_only=False)[bmask][dpos]
        ok = f["a"]
        n = len(ok)
        return _wire(
            _shard_of(ok), ok, np.zeros(n, np.int8), _zero(n), _zero(n),
            f["year"], f["rev_i"], dflag,
        )

    def merge_ord(g: pa.Table) -> pa.Table:
        g = _dropg(g, ["shard"])
        if g.num_rows == 0:
            return _W.empty_table()
        p = _probe(g)
        if p is None:
            return _W.empty_table()
        f, dpos, bmask = p
        cust = g.column("a").to_numpy(zero_copy_only=False)[bmask][dpos]
        # pre-combine per (cust, flag, year) before the custkey shuffle
        fy = f["flag"].astype(np.int64) * 8192 + f["year"]
        order = np.lexsort((fy, cust))
        cust, fy, rev = cust[order], fy[order], f["rev_i"][order]
        new = np.ones(len(cust), dtype=bool)
        new[1:] = (cust[1:] != cust[:-1]) | (fy[1:] != fy[:-1])
        starts = np.flatnonzero(new)
        cust, fy = cust[starts], fy[starts]
        rev = int_segment_sum(rev, starts)
        n = len(cust)
        return _wire(
            _shard_of(cust), cust, np.zeros(n, np.int8), _zero(n), _zero(n),
            fy % 8192, rev, (fy // 8192).astype(np.int8),
        )

    _P = pa.schema(
        [("year", pa.int64()), ("target_i", pa.int64()), ("total_i", pa.int64())]
    )

    def merge_cust(g: pa.Table) -> pa.Table:
        g = _dropg(g, ["shard"])
        if g.num_rows == 0:
            return _P.empty_table()
        p = _probe(g)
        if p is None:
            return _P.empty_table()
        f, _, _ = p
        fy = f["flag"].astype(np.int64) * 8192 + f["year"]
        order = np.argsort(fy)
        fy, rev = fy[order], f["rev_i"][order]
        new = np.ones(len(fy), dtype=bool)
        new[1:] = fy[1:] != fy[:-1]
        starts = np.flatnonzero(new)
        fy = fy[starts]
        rev = int_segment_sum(rev, starts)
        years = fy % 8192
        flags = fy // 8192
        uy = np.unique(years)
        tgt = np.array(
            [rev[(years == y) & (flags == 1)].sum() for y in uy], np.int64
        )
        tot = np.array([rev[years == y].sum() for y in uy], np.int64)
        return pa.table(
            {
                "year": pa.array(uy, pa.int64()),
                "target_i": pa.array(tgt, pa.int64()),
                "total_i": pa.array(tot, pa.int64()),
            },
            schema=_P,
        )

    li = strip_schema_metadata(
        ray.data.read_parquet(
            _pq(sf_dir, "lineitem"),
            columns=[
                "l_partkey", "l_suppkey", "l_orderkey",
                "l_extendedprice", "l_discount", "l_shipdate",
            ],
            filter=(pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi),
        )
    ).map_batches(li_rows, batch_format="pyarrow")
    part = _read_sized(
        sf_dir, "part", ["p_partkey"],
        filter=pc.field("p_type") == Q8_PART_TYPE,
    ).map_batches(_dim_keys("p_partkey"), batch_format="pyarrow")
    supp = _read_sized(
        sf_dir, "supplier", ["s_suppkey", "s_nationkey"]
    ).map_batches(supp_rows, batch_format="pyarrow")
    cust = _read_sized(
        sf_dir, "customer", ["c_custkey"],
        filter=pc.field("c_nationkey").isin(region_nks),
    ).map_batches(_dim_keys("c_custkey"), batch_format="pyarrow")

    def _hop(ds, dim, fn):
        return (
            absorb_empty_blocks(ds.union(dim), batch_size=131072)
            .groupby("shard")
            .map_groups(fn, batch_format="pyarrow")
        )

    s1 = _hop(li, part, merge_part)
    # materialize the hop-2 survivors once: they feed hop 3 AND the bloom
    # that prunes the (corpus-scaled) orders stream before its shuffle
    s2 = _hop(s1, supp, merge_supp).materialize()
    surv_bloom = _bloom_of(s2, "key")
    orders = _read_sized(
        sf_dir, "orders", ["o_orderkey", "o_custkey"]
    ).map_batches(_ord_rows_with(surv_bloom), batch_format="pyarrow")
    s3 = _hop(s2, orders, merge_ord)
    rows = _hop(s3, cust, merge_cust).take_all()
    agg: dict[int, list[int]] = {}
    for r in rows:
        e = agg.setdefault(int(r["year"]), [0, 0])
        e[0] += int(r["target_i"])
        e[1] += int(r["total_i"])
    years = sorted(y for y, (_, tot) in agg.items() if tot != 0)
    if not years:
        return _OUT.empty_table()
    return pa.table(
        {
            "l_year": pa.array(years, pa.int64()),
            "target_revenue_i": pa.array([agg[y][0] for y in years], pa.int64()),
            "total_revenue_i": pa.array([agg[y][1] for y in years], pa.int64()),
            "share_e6": pa.array(
                [(1_000_000 * agg[y][0]) // agg[y][1] for y in years], pa.int64()
            ),
        },
        schema=_OUT,
    )


# ---------------------------------------------------------------------------
# TPC-H Q11 analogue — group-vs-global-fraction HAVING
# ---------------------------------------------------------------------------


def value_concentration(sf_dir: str, num_shards: int = 64) -> pa.Table:
    """TPC-H Q11 analogue: suppliers whose total lineitem revenue exceeds
    ``config.Q11_FRACTION_PPM`` parts-per-million of the GLOBAL total — the
    group-vs-global-fraction HAVING (Q11's ``> sum(...) * fraction``
    correlated scalar subquery).  Reference semantics: the master-data
    share-of-total validation family (submission/utils/validators.py:134).

    Exactness: the HAVING compares by integer cross-multiplication —
    ``value*1e6 > ppm*total`` is evaluated as ``value > (ppm*total)//1e6``
    (equivalent for integer ``value`` since ``v > t/1e6  <=>  v > floor``),
    with the product kept in arbitrary-precision python ints, so engine and
    gate can never diverge on rounding.

    Scale shape: lineitem pre-combines (suppkey, rev_i) per batch; ONE
    suppkey-shard groupby finishes exact per-supplier totals, materialized
    ONCE in the object store (slim supplier-census-sized rows, distributed
    — never on the driver).  The global total is a streaming scalar Sum
    over the cached blocks; the filter is a vectorized second pass over the
    same blocks.  Output is HAVING-bounded: at most 1e6/ppm suppliers can
    each hold more than ppm/1e6 of the total, so ``take_all`` collects at
    most 1000 rows at the default ppm — at ANY corpus size.

    Output: (l_suppkey, value_i) ordered by value_i DESC, suppkey."""
    import numpy as np

    from ..config import Q11_FRACTION_PPM
    from ._util import absorb_empty_blocks, combine_by_key

    _OUT = pa.schema([("l_suppkey", pa.int64()), ("value_i", pa.int64())])
    _P = pa.schema(
        [("sshard", pa.int32()), ("key", pa.int64()), ("value_i", pa.int64())]
    )

    def _shard_of(keys: "np.ndarray") -> "np.ndarray":
        return (((keys * 2654435761) % (1 << 32)) % num_shards).astype(np.int32)

    def li_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _P.empty_table()
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        ep = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        dc = t.column("l_discount").to_numpy(zero_copy_only=False)
        rev = np.floor(ep * 100.0 + 0.5).astype(np.int64) * (
            10000 - np.floor(dc * 10000.0 + 0.5).astype(np.int64)
        )
        kk, vv = combine_by_key(sk, rev)
        return pa.table(
            {
                "sshard": pa.array(_shard_of(kk)),
                "key": pa.array(kk, pa.int64()),
                "value_i": pa.array(vv, pa.int64()),
            },
            schema=_P,
        )

    _TOT = pa.schema([("key", pa.int64()), ("value_i", pa.int64())])

    def shard_totals(g: pa.Table) -> pa.Table:
        g = _dropg(g, ["sshard"])
        if g.num_rows == 0:
            return _TOT.empty_table()
        k = g.column("key").to_numpy(zero_copy_only=False)
        v = g.column("value_i").to_numpy(zero_copy_only=False)
        kk, vv = combine_by_key(k, v)
        return pa.table(
            {"key": pa.array(kk, pa.int64()), "value_i": pa.array(vv, pa.int64())},
            schema=_TOT,
        )

    li = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_partial, batch_format="pyarrow")
    totals = (
        absorb_empty_blocks(li, batch_size=131072)
        .groupby("sshard")
        .map_groups(shard_totals, batch_format="pyarrow")
        .materialize()  # slim (key, value) rows, cached distributed; read twice
    )
    grand = totals.sum("value_i")
    if not grand:
        return _OUT.empty_table()
    # value*1e6 > ppm*grand  <=>  value > (ppm*grand) // 1e6  (integer value)
    cut = (Q11_FRACTION_PPM * int(grand)) // 1_000_000
    if cut >= (1 << 63):  # per-supplier int64 totals can never clear it
        return _OUT.empty_table()

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t.column("value_i"), pa.scalar(cut, pa.int64())))

    rows = totals.map_batches(keep, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (-int(r["value_i"]), int(r["key"])))
    return pa.table(
        {
            "l_suppkey": pa.array([int(r["key"]) for r in rows], pa.int64()),
            "value_i": pa.array([int(r["value_i"]) for r in rows], pa.int64()),
        },
        schema=_OUT,
    )


# ---------------------------------------------------------------------------
# RANK()-with-ties top-N per group (QUALIFY rank() <= K)
# ---------------------------------------------------------------------------


def _seg_price_census(seg: pa.Array, price_c, cnt, k: int) -> pa.Table:
    """Per-(segment) top-``k`` DISTINCT price census with exact row counts.

    The partial is ASSOCIATIVE-EXACT for the global top-k distinct prices:
    if price p is among a segment's global top-k distinct values, then every
    batch holds < k distinct prices above p (else the global order would
    too), so p survives every batch-local truncation WITH its full count —
    merging partials and re-truncating loses only prices that were never
    global candidates.  Ranks derived from the merged census are exact for
    the kept prefix because every row above a kept price has a price that is
    itself in the top-k distinct set (hence fully counted)."""
    import numpy as np

    from ._util import combine_by_key

    _P = pa.schema(
        [("seg", pa.string()), ("price_c", pa.int64()), ("cnt", pa.int64())]
    )
    if len(price_c) == 0:
        return _P.empty_table()
    enc = seg.combine_chunks().dictionary_encode() if isinstance(
        seg, pa.ChunkedArray
    ) else seg.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    segs, prices, cnts = [], [], []
    for s in range(len(enc.dictionary)):  # enum-bounded segment loop
        m = codes == s
        pk, pn = combine_by_key(price_c[m], cnt[m])
        tail = slice(max(0, len(pk) - k), None)  # largest k distinct (asc)
        pk, pn = pk[tail], pn[tail]
        segs.extend([enc.dictionary[s].as_py()] * len(pk))
        prices.append(pk)
        cnts.append(pn)
    return pa.table(
        {
            "seg": pa.array(segs, pa.string()),
            "price_c": pa.array(np.concatenate(prices), pa.int64()),
            "cnt": pa.array(np.concatenate(cnts), pa.int64()),
        },
        schema=_P,
    )


def _census_keep(g: pa.Table, k: int) -> pa.Table:
    """Finish one segment's merged census: top-k distinct desc, keep the
    prefix whose strictly-greater row count <= k-1, rank = that count + 1."""
    import numpy as np

    from ._util import combine_by_key

    _F = pa.schema(
        [("seg", pa.string()), ("price_c", pa.int64()), ("rnk", pa.int64())]
    )
    g = _dropg(g, [])
    if g.num_rows == 0 or "price_c" not in g.column_names:
        return _F.empty_table()
    pk, pn = combine_by_key(
        g.column("price_c").to_numpy(zero_copy_only=False),
        g.column("cnt").to_numpy(zero_copy_only=False),
    )
    pk, pn = pk[::-1][:k], pn[::-1][:k]  # desc, top-k distinct
    above = np.concatenate(([0], np.cumsum(pn)[:-1]))  # rows strictly greater
    keep = above <= k - 1
    seg0 = g.column("seg")[0].as_py()
    return pa.table(
        {
            "seg": pa.array([seg0] * int(keep.sum()), pa.string()),
            "price_c": pa.array(pk[keep], pa.int64()),
            "rnk": pa.array(above[keep] + 1, pa.int64()),
        },
        schema=_F,
    )


_SEG_ROW = pa.schema(
    [
        ("seg", pa.string()),
        ("okey", pa.int64()),
        ("price_c", pa.int64()),
        ("rnk", pa.int64()),
    ]
)


def _kept_tag(seg: pa.Array, okey, price, km: dict) -> pa.Table:
    """Vectorized kept-set probe: per segment (enum-bounded loop) an
    equality mask + searchsorted gather against the <=K sorted kept
    prices; ranks ride the same gather."""
    import numpy as np

    if isinstance(seg, pa.ChunkedArray):
        seg = seg.combine_chunks()
    out = []
    for s, pm in km.items():
        m = np.asarray(
            pc.equal(seg, pa.scalar(s)).to_numpy(zero_copy_only=False), dtype=bool
        )
        if not m.any():
            continue
        kp = np.array(sorted(pm), dtype=np.int64)
        kr = np.array([pm[p] for p in sorted(pm)], dtype=np.int64)
        pv = price[m]
        pos = np.searchsorted(kp, pv)
        hit = (pos < len(kp)) & (kp[np.minimum(pos, len(kp) - 1)] == pv)
        n = int(hit.sum())
        if n == 0:
            continue
        out.append(
            pa.table(
                {
                    "seg": pa.array([s] * n, pa.string()),
                    "okey": pa.array(okey[m][hit], pa.int64()),
                    "price_c": pa.array(pv[hit], pa.int64()),
                    "rnk": pa.array(kr[pos[hit]], pa.int64()),
                },
                schema=_SEG_ROW,
            )
        )
    return pa.concat_tables(out) if out else _SEG_ROW.empty_table()


def _segment_census_sharded(
    sf_dir: str, k: int, n_shards: int
) -> ray.data.Dataset:
    """Distributed census for :func:`segment_top_orders` past the customer
    broadcast cap: slim (custkey, price_c) fact rows and (custkey, seg)
    dimension rows union co-partition by custkey shard; each shard maps
    key -> segment with one searchsorted and emits its LOCAL top-k distinct
    census (<= |segments| x k rows per shard) — exact by the same
    pigeonhole argument with shards as batches."""
    import numpy as np

    from ._util import absorb_empty_blocks

    _M = pa.schema(
        [
            ("cshard", pa.int32()),
            ("ck", pa.int64()),
            ("price_c", pa.int64()),
            ("seg", pa.string()),
            ("side", pa.int8()),
        ]
    )

    def _shard_of(keys: "np.ndarray") -> "np.ndarray":
        return (((keys * 2654435761) % (1 << 32)) % n_shards).astype(np.int32)

    def ord_rows(t: pa.Table) -> pa.Table:
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        price = np.floor(
            t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        n = len(ck)
        return pa.table(
            {
                "cshard": pa.array(_shard_of(ck)),
                "ck": pa.array(ck, pa.int64()),
                "price_c": pa.array(price, pa.int64()),
                "seg": pa.nulls(n, pa.string()),
                "side": pa.array(np.zeros(n, np.int8), pa.int8()),
            },
            schema=_M,
        )

    def cust_rows(t: pa.Table) -> pa.Table:
        ck = t.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ck)
        return pa.table(
            {
                "cshard": pa.array(_shard_of(ck)),
                "ck": pa.array(ck, pa.int64()),
                "price_c": pa.array(np.zeros(n, np.int64), pa.int64()),
                "seg": t.column("c_mktsegment").cast(pa.string()),
                "side": pa.array(np.ones(n, np.int8), pa.int8()),
            },
            schema=_M,
        )

    def merge_shard(g: pa.Table) -> pa.Table:
        g = _dropg(g, ["cshard"])
        _P = pa.schema(
            [("seg", pa.string()), ("price_c", pa.int64()), ("cnt", pa.int64())]
        )
        if g.num_rows == 0 or "side" not in g.column_names:
            return _P.empty_table()
        side = g.column("side").to_numpy(zero_copy_only=False)
        ck = g.column("ck").to_numpy(zero_copy_only=False)
        bmask = side == 1
        bkey = ck[bmask]
        if len(bkey) == 0 or bmask.all():
            return _P.empty_table()
        seg = g.column("seg").combine_chunks().filter(pa.array(bmask))
        order = np.argsort(bkey, kind="stable")
        bkey = bkey[order]
        seg = pc.take(seg, pa.array(order))
        fmask = ~bmask
        fk = ck[fmask]
        fp = g.column("price_c").to_numpy(zero_copy_only=False)[fmask]
        pos = np.searchsorted(bkey, fk)
        hit = (pos < len(bkey)) & (bkey[np.minimum(pos, len(bkey) - 1)] == fk)
        if not hit.any():
            return _P.empty_table()
        return _seg_price_census(
            pc.take(seg, pa.array(pos[hit])),
            fp[hit],
            np.ones(int(hit.sum()), np.int64),
            k,
        )

    orders = ray.data.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"]
    ).map_batches(ord_rows, batch_format="pyarrow")
    cust = ray.data.read_parquet(
        _pq(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    ).map_batches(cust_rows, batch_format="pyarrow")
    return (
        absorb_empty_blocks(orders.union(cust), batch_size=131072)
        .groupby("cshard")
        .map_groups(merge_shard, batch_format="pyarrow")
    )


def _segment_recover_sharded(
    sf_dir: str, kept_ref, read_filter, n_shards: int
) -> list:
    """Distributed recovery for :func:`segment_top_orders` past the
    broadcast cap: price-floor-filtered (footer-pruned) candidate order
    rows and slim customer rows co-partition by custkey shard; each shard
    maps key -> segment and probes the broadcast kept set (<= |segments|
    x K entries) — only output rows reach the driver."""
    import numpy as np

    from ._util import absorb_empty_blocks

    _M = pa.schema(
        [
            ("cshard", pa.int32()),
            ("ck", pa.int64()),
            ("okey", pa.int64()),
            ("price_c", pa.int64()),
            ("seg", pa.string()),
            ("side", pa.int8()),
        ]
    )

    def _shard_of(keys: "np.ndarray") -> "np.ndarray":
        return (((keys * 2654435761) % (1 << 32)) % n_shards).astype(np.int32)

    def ord_rows(t: pa.Table) -> pa.Table:
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        price = np.floor(
            t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        n = len(ck)
        return pa.table(
            {
                "cshard": pa.array(_shard_of(ck)),
                "ck": pa.array(ck, pa.int64()),
                "okey": t.column("o_orderkey").cast(pa.int64()),
                "price_c": pa.array(price, pa.int64()),
                "seg": pa.nulls(n, pa.string()),
                "side": pa.array(np.zeros(n, np.int8), pa.int8()),
            },
            schema=_M,
        )

    def cust_rows(t: pa.Table) -> pa.Table:
        ck = t.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ck)
        return pa.table(
            {
                "cshard": pa.array(_shard_of(ck)),
                "ck": pa.array(ck, pa.int64()),
                "okey": pa.array(np.zeros(n, np.int64), pa.int64()),
                "price_c": pa.array(np.zeros(n, np.int64), pa.int64()),
                "seg": t.column("c_mktsegment").cast(pa.string()),
                "side": pa.array(np.ones(n, np.int8), pa.int8()),
            },
            schema=_M,
        )

    def merge_shard(g: pa.Table) -> pa.Table:
        g = _dropg(g, ["cshard"])
        if g.num_rows == 0 or "side" not in g.column_names:
            return _SEG_ROW.empty_table()
        km = ray.get(kept_ref)
        side = g.column("side").to_numpy(zero_copy_only=False)
        ck = g.column("ck").to_numpy(zero_copy_only=False)
        bmask = side == 1
        bkey = ck[bmask]
        if len(bkey) == 0 or bmask.all():
            return _SEG_ROW.empty_table()
        seg = g.column("seg").combine_chunks().filter(pa.array(bmask))
        order = np.argsort(bkey, kind="stable")
        bkey = bkey[order]
        seg = pc.take(seg, pa.array(order))
        fmask = ~bmask
        fk = ck[fmask]
        fo = g.column("okey").to_numpy(zero_copy_only=False)[fmask]
        fp = g.column("price_c").to_numpy(zero_copy_only=False)[fmask]
        pos = np.searchsorted(bkey, fk)
        hit = (pos < len(bkey)) & (bkey[np.minimum(pos, len(bkey) - 1)] == fk)
        if not hit.any():
            return _SEG_ROW.empty_table()
        return _kept_tag(pc.take(seg, pa.array(pos[hit])), fo[hit], fp[hit], km)

    orders = ray.data.read_parquet(
        _pq(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
        filter=read_filter,
    ).map_batches(ord_rows, batch_format="pyarrow")
    cust = ray.data.read_parquet(
        _pq(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    ).map_batches(cust_rows, batch_format="pyarrow")
    return (
        absorb_empty_blocks(orders.union(cust), batch_size=131072)
        .groupby("cshard")
        .map_groups(merge_shard, batch_format="pyarrow")
        .take_all()
    )


def segment_top_orders(
    sf_dir: str,
    k: int | None = None,
    n_shards: int = 64,
    dim_cap: int = BROADCAST_DIM_MAX_ROWS,
) -> pa.Table:
    """Top-``config.SEGMENT_TOP_K`` orders per customer market segment by
    o_totalprice with SQL RANK() tie semantics (``QUALIFY rank() <= K`` —
    ties at the boundary all surface, so a segment can return more than K
    rows).  The ORDER-BY-window-per-partition shape where the partition key
    is enum-bounded but the fact is corpus-sized.

    Scale shape, two result-bounded passes — the fact never sorts:
    1. census: each batch emits <= |segments| x K (seg, price, cnt) rows —
       the batch-local top-K DISTINCT prices with counts (associative-exact,
       see :func:`_seg_price_census`); one enum-bounded seg groupby merges
       them into per-segment kept prices + ranks (<= K rows each).
    2. recovery: re-read orders with the price floor PUSHED INTO the read
       (footer/row-group pruning skips everything below the global cut),
       tag rows with their segment, keep (seg, price) pairs in the kept
       set — output-bounded rows reach the driver.
    The custkey->segment hop follows the dimension-broadcast discipline:
    customer under ``dim_cap`` (parquet FOOTER row count) broadcasts once
    via ray.put; past it BOTH passes run as union co-partitioned
    custkey-shard merges (nothing dimension-sized on the driver).

    Output: (c_mktsegment, o_orderkey, price_c, rnk) ordered by
    (segment, rnk, orderkey)."""
    import numpy as np
    import pyarrow.parquet as _pqm

    from ..config import SEGMENT_TOP_K
    from ._util import absorb_empty_blocks, parquet_num_rows

    if k is None:
        k = SEGMENT_TOP_K
    _OUT = pa.schema(
        [
            ("c_mktsegment", pa.string()),
            ("o_orderkey", pa.int64()),
            ("price_c", pa.int64()),
            ("rnk", pa.int64()),
        ]
    )

    def _price_c(t: pa.Table) -> "np.ndarray":
        return np.floor(
            t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)

    broadcast = parquet_num_rows(_pq(sf_dir, "customer")) <= dim_cap
    if broadcast:
        cust = _pqm.read_table(
            _pq(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
        )
        lookup_ref = ray.put(
            (
                cust.column("c_custkey").combine_chunks(),
                cust.column("c_mktsegment").combine_chunks(),
            )
        )

        def census_partial(t: pa.Table) -> pa.Table:
            keys, vals = ray.get(lookup_ref)
            idx = pc.index_in(t.column("o_custkey"), value_set=keys)
            seg = pc.take(vals, idx)
            ok = pc.is_valid(seg)  # inner-join semantics: unknown custkey drops
            t2 = t.filter(ok)
            return _seg_price_census(
                pc.take(vals, idx).filter(ok),
                _price_c(t2),
                np.ones(t2.num_rows, np.int64),
                k,
            )

        partials = ray.data.read_parquet(
            _pq(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"]
        ).map_batches(census_partial, batch_format="pyarrow")
    else:
        partials = _segment_census_sharded(sf_dir, k, n_shards)

    kept = (
        absorb_empty_blocks(partials, batch_size=131072)
        .groupby("seg")
        .map_groups(lambda g: _census_keep(g, k), batch_format="pyarrow")
        .take_all()
    )
    if not kept:
        return _OUT.empty_table()
    kept_map: dict[str, dict[int, int]] = {}
    for r in kept:
        kept_map.setdefault(r["seg"], {})[int(r["price_c"])] = int(r["rnk"])
    lo = min(p for m in kept_map.values() for p in m)
    # price_c >= lo  <=  o_totalprice >= (lo-1)/100 (slack absorbs rounding)
    read_filter = pc.field("o_totalprice") >= (lo - 1) / 100.0
    kept_ref = ray.put(kept_map)

    if broadcast:

        def recover(t: pa.Table) -> pa.Table:
            keys, vals = ray.get(lookup_ref)
            km = ray.get(kept_ref)
            idx = pc.index_in(t.column("o_custkey"), value_set=keys)
            seg = pc.take(vals, idx)
            ok = pc.is_valid(seg)
            t2 = t.filter(ok)
            if t2.num_rows == 0:
                return _SEG_ROW.empty_table()
            return _kept_tag(
                seg.filter(ok),
                t2.column("o_orderkey").to_numpy(zero_copy_only=False),
                _price_c(t2),
                km,
            )

        rows = (
            ray.data.read_parquet(
                _pq(sf_dir, "orders"),
                columns=["o_orderkey", "o_custkey", "o_totalprice"],
                filter=read_filter,
            )
            .map_batches(recover, batch_format="pyarrow")
            .take_all()
        )
    else:
        rows = _segment_recover_sharded(sf_dir, kept_ref, read_filter, n_shards)

    rows.sort(key=lambda r: (r["seg"], int(r["rnk"]), int(r["okey"])))
    return pa.table(
        {
            "c_mktsegment": pa.array([r["seg"] for r in rows], pa.string()),
            "o_orderkey": pa.array([int(r["okey"]) for r in rows], pa.int64()),
            "price_c": pa.array([int(r["price_c"]) for r in rows], pa.int64()),
            "rnk": pa.array([int(r["rnk"]) for r in rows], pa.int64()),
        },
        schema=_OUT,
    )


# ---------------------------------------------------------------------------
# TPC-H Q6 analogue — the forecast-revenue-change scan
# ---------------------------------------------------------------------------


def discounted_revenue(sf_dir: str) -> pa.Table:
    """TPC-H Q6 analogue: total ``extendedprice * discount`` revenue give-up
    inside the ``config.Q6_*`` (ship-year, discount-band, qty-cap) window —
    the pure scan-aggregate with no join and no groupby, the cheapest query
    shape and the one every engine should run at storage bandwidth.

    Scale shape: the ship window pushes into the read (row-group pruning);
    the discount band and qty cap evaluate vectorized per batch in e4/unit
    fixed point (shared with the oracle via config — no float boundary can
    split the engines); each batch emits ONE (rev_i, n) partial row and the
    driver sums a block-count-bounded list in python ints.

    Output: one row (revenue_i, n_rows); empty when nothing matches
    (mirrored by the oracle's HAVING)."""
    import datetime as _dt

    import numpy as np

    from ..config import (
        Q6_DISC_HI_E4,
        Q6_DISC_LO_E4,
        Q6_QTY_MAX,
        Q6_SHIP_HI,
        Q6_SHIP_LO,
    )

    lo = _dt.datetime.fromisoformat(Q6_SHIP_LO)
    hi = _dt.datetime.fromisoformat(Q6_SHIP_HI)
    _OUT = pa.schema([("revenue_i", pa.int64()), ("n_rows", pa.int64())])
    _P = pa.schema([("rev_i", pa.int64()), ("n", pa.int64())])

    def part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _P.empty_table()
        disc = np.floor(
            t.column("l_discount").to_numpy(zero_copy_only=False) * 10000.0 + 0.5
        ).astype(np.int64)
        qty = np.floor(
            t.column("l_quantity").to_numpy(zero_copy_only=False) + 0.5
        ).astype(np.int64)
        keep = (disc >= Q6_DISC_LO_E4) & (disc <= Q6_DISC_HI_E4) & (qty < Q6_QTY_MAX)
        if not keep.any():
            return _P.empty_table()
        ep = t.column("l_extendedprice").to_numpy(zero_copy_only=False)[keep]
        rev = np.floor(ep * 100.0 + 0.5).astype(np.int64) * disc[keep]
        return pa.table(
            {
                "rev_i": pa.array([int(rev.sum())], pa.int64()),
                "n": pa.array([int(keep.sum())], pa.int64()),
            },
            schema=_P,
        )

    rows = (
        ray.data.read_parquet(
            _pq(sf_dir, "lineitem"),
            columns=["l_extendedprice", "l_discount", "l_quantity"],
            filter=(pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi),
        )
        .map_batches(part, batch_format="pyarrow")
        .take_all()
    )
    n = sum(int(r["n"]) for r in rows)
    if n == 0:
        return _OUT.empty_table()
    return pa.table(
        {
            "revenue_i": pa.array([sum(int(r["rev_i"]) for r in rows)], pa.int64()),
            "n_rows": pa.array([n], pa.int64()),
        },
        schema=_OUT,
    )


# ---------------------------------------------------------------------------
# TPC-H Q4 analogue — cross-side-predicate EXISTS semijoin
# ---------------------------------------------------------------------------


def late_shipment_orders(sf_dir: str, num_shards: int = 64) -> pa.Table:
    """TPC-H Q4 analogue: per order priority, how many orders placed in the
    ``config.Q4_ORDER_*`` window have >= 1 lineitem shipped more than
    ``config.Q4_LATE_DAYS`` after the order date.  The EXISTS predicate
    compares columns from BOTH sides (l_shipdate vs o_orderdate), so unlike
    :func:`order_lineitem_semi` nothing about it can push into either read
    — the canonical cross-side-predicate semijoin.

    Scale shape: ``EXISTS(ship > cutoff)`` collapses to
    ``max(ship) > cutoff``, and max is associative — lineitem pre-combines
    (orderkey, max_ship) per batch, so the orderkey shuffle carries one row
    per distinct key per block, never the lineitem rows.  Window-filtered
    order rows ride the same orderkey-shard groupby; each shard combines
    maxima, probes with one searchsorted, and emits <= |priorities| partial
    rows; the driver folds shards x 5 rows.

    Output: (o_orderpriority, n_late) ordered by priority."""
    import datetime as _dt

    import numpy as np

    from ..config import Q4_LATE_DAYS, Q4_ORDER_HI, Q4_ORDER_LO
    from ._util import absorb_empty_blocks, int_segment_sum

    lo = _dt.datetime.fromisoformat(Q4_ORDER_LO)
    hi = _dt.datetime.fromisoformat(Q4_ORDER_HI)
    late_us = Q4_LATE_DAYS * 86_400_000_000
    _OUT = pa.schema([("o_orderpriority", pa.string()), ("n_late", pa.int64())])
    _W = pa.schema(
        [
            ("oshard", pa.int32()),
            ("key", pa.int64()),
            ("ship_us", pa.int64()),
            ("odate_us", pa.int64()),
            ("prio", pa.string()),
            ("side", pa.int8()),
        ]
    )

    def _shard_of(keys: "np.ndarray") -> "np.ndarray":
        return (((keys * 2654435761) % (1 << 32)) % num_shards).astype(np.int32)

    def li_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _W.empty_table()
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        ship = (
            t.column("l_shipdate")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        order = np.argsort(ok, kind="stable")
        ok, ship = ok[order], ship[order]
        new = np.ones(len(ok), dtype=bool)
        new[1:] = ok[1:] != ok[:-1]
        starts = np.flatnonzero(new)
        uok = ok[starts]
        mx = np.maximum.reduceat(ship, starts) if len(starts) else ship[:0]
        n = len(uok)
        return pa.table(
            {
                "oshard": pa.array(_shard_of(uok)),
                "key": pa.array(uok, pa.int64()),
                "ship_us": pa.array(mx, pa.int64()),
                "odate_us": pa.array(np.zeros(n, np.int64), pa.int64()),
                "prio": pa.nulls(n, pa.string()),
                "side": pa.array(np.zeros(n, np.int8), pa.int8()),
            },
            schema=_W,
        )

    def ord_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _W.empty_table()
        ok = t.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        od = (
            t.column("o_orderdate")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        n = len(ok)
        return pa.table(
            {
                "oshard": pa.array(_shard_of(ok)),
                "key": pa.array(ok, pa.int64()),
                "ship_us": pa.array(np.zeros(n, np.int64), pa.int64()),
                "odate_us": pa.array(od, pa.int64()),
                "prio": t.column("o_orderpriority").cast(pa.string()),
                "side": pa.array(np.ones(n, np.int8), pa.int8()),
            },
            schema=_W,
        )

    _P = pa.schema([("prio", pa.string()), ("n", pa.int64())])

    def merge_shard(g: pa.Table) -> pa.Table:
        g = _dropg(g, ["oshard"])
        if g.num_rows == 0 or "side" not in g.column_names:
            return _P.empty_table()
        side = g.column("side").to_numpy(zero_copy_only=False)
        key = g.column("key").to_numpy(zero_copy_only=False)
        lmask = side == 0
        lk = key[lmask]
        if len(lk) == 0 or lmask.all():
            return _P.empty_table()
        lship = g.column("ship_us").to_numpy(zero_copy_only=False)[lmask]
        # combine cross-block maxima per orderkey
        order = np.argsort(lk, kind="stable")
        lk, lship = lk[order], lship[order]
        new = np.ones(len(lk), dtype=bool)
        new[1:] = lk[1:] != lk[:-1]
        starts = np.flatnonzero(new)
        ulk = lk[starts]
        umax = np.maximum.reduceat(lship, starts)
        omask = ~lmask
        okey = key[omask]
        odate = g.column("odate_us").to_numpy(zero_copy_only=False)[omask]
        pos = np.searchsorted(ulk, okey)
        hit = (pos < len(ulk)) & (ulk[np.minimum(pos, len(ulk) - 1)] == okey)
        late = hit & (umax[np.minimum(pos, len(ulk) - 1)] > odate + late_us)
        if not late.any():
            return _P.empty_table()
        prio = g.column("prio").combine_chunks().filter(pa.array(omask)).filter(
            pa.array(late)
        )
        enc = prio.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = np.bincount(idx, minlength=len(enc.dictionary)).astype(np.int64)
        return pa.table(
            {"prio": enc.dictionary, "n": pa.array(cnt, pa.int64())}, schema=_P
        )

    # a qualifying lineitem has ship > odate + delay >= window_lo + delay,
    # so the bound pushes into the read even though the predicate itself is
    # cross-side (row-group pruning skips everything shipped early)
    li = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_shipdate"],
        filter=pc.field("l_shipdate") > lo + _dt.timedelta(days=Q4_LATE_DAYS),
    ).map_batches(li_partial, batch_format="pyarrow")
    orders = ray.data.read_parquet(
        _pq(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        filter=(pc.field("o_orderdate") >= lo) & (pc.field("o_orderdate") < hi),
    ).map_batches(ord_rows, batch_format="pyarrow")
    rows = (
        absorb_empty_blocks(li.union(orders), batch_size=131072)
        .groupby("oshard")
        .map_groups(merge_shard, batch_format="pyarrow")
        .take_all()
    )
    agg: dict[str, int] = {}
    for r in rows:
        agg[r["prio"]] = agg.get(r["prio"], 0) + int(r["n"])
    prios = sorted(agg)
    return pa.table(
        {
            "o_orderpriority": pa.array(prios, pa.string()),
            "n_late": pa.array([agg[p] for p in prios], pa.int64()),
        },
        schema=_OUT,
    )


# ---------------------------------------------------------------------------
# TPC-H Q9 analogue — product-line profit by nation and year
# ---------------------------------------------------------------------------


def nation_profit(sf_dir: str, num_shards: int = 64) -> pa.Table:
    """TPC-H Q9 analogue: profit per (supplier nation, ship year) over parts
    whose name contains ``config.Q9_PART_TOKEN``.  The testdata has no
    partsupp, so ``p_retailprice`` is the unit-cost proxy:
    ``amount_i = rev_i - qty * retail_cents * 10000`` (both cents*e4).
    Unlike Q8's semijoins this chain ATTACHES a dimension measure
    (retail_cents) to every fact row, so the part hop is a real value join.

    Scale shape: a bloom over the token-matched part keys prunes lineitem
    before its first shuffle; hop 1 (partkey shard) attaches retail_cents
    and pre-combines per (suppkey, year) so the suppkey shuffle carries
    group partials, never lineitem rows; hop 2 attaches the supplier's
    nationkey and combines per (nationkey, year) — the driver folds
    shards x |nations x years| scalar rows and maps nationkey -> name via
    the spec-constant 25-row nation table.

    Output: (n_name, l_year, profit_i) ordered by (n_name, l_year)."""
    import numpy as np
    import pyarrow.parquet as _pqm

    from ..config import Q9_PART_TOKEN
    from ._util import absorb_empty_blocks, int_segment_sum, strip_schema_metadata

    _OUT = pa.schema(
        [("n_name", pa.string()), ("l_year", pa.int64()), ("profit_i", pa.int64())]
    )

    def _shard_of(keys: "np.ndarray") -> "np.ndarray":
        return (((keys * 2654435761) % (1 << 32)) % num_shards).astype(np.int32)

    # one wire schema for both hops: key is the CURRENT hop key; aux carries
    # the next hop key (suppkey) on fact rows and the attached dimension
    # measure (retail_cents / nationkey) on dim rows
    _W = pa.schema(
        [
            ("shard", pa.int32()),
            ("key", pa.int64()),
            ("side", pa.int8()),
            ("aux", pa.int64()),
            ("year", pa.int64()),
            ("rev_i", pa.int64()),
            ("qty", pa.int64()),
        ]
    )

    def _wire(shard, key, side, aux, year, rev, qty) -> pa.Table:
        return pa.table(
            {
                "shard": pa.array(shard),
                "key": pa.array(key, pa.int64()),
                "side": pa.array(side, pa.int8()),
                "aux": pa.array(aux, pa.int64()),
                "year": pa.array(year, pa.int64()),
                "rev_i": pa.array(rev, pa.int64()),
                "qty": pa.array(qty, pa.int64()),
            },
            schema=_W,
        )

    part_filter = pc.match_substring(pc.field("p_name"), Q9_PART_TOKEN)
    part_bloom = _bloom_of(
        _read_sized(sf_dir, "part", ["p_partkey"], filter=part_filter),
        "p_partkey",
    )

    def li_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _W.empty_table()
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = _bloom_keep(pk, ray.get(part_bloom))
        if not keep.any():
            return _W.empty_table()
        t = t.filter(pa.array(keep))
        pk = pk[keep]
        ep = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        dc = t.column("l_discount").to_numpy(zero_copy_only=False)
        rev = np.floor(ep * 100.0 + 0.5).astype(np.int64) * (
            10000 - np.floor(dc * 10000.0 + 0.5).astype(np.int64)
        )
        qty = np.floor(
            t.column("l_quantity").to_numpy(zero_copy_only=False) + 0.5
        ).astype(np.int64)
        year = (
            t.column("l_shipdate")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(pk)
        return _wire(_shard_of(pk), pk, np.zeros(n, np.int8), sk, year, rev, qty)

    def part_rows(t: pa.Table) -> pa.Table:
        k = t.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        retail_c = np.floor(
            t.column("p_retailprice").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        n = len(k)
        z = np.zeros(n, np.int64)
        return _wire(_shard_of(k), k, np.ones(n, np.int8), retail_c, z, z, z)

    def supp_rows(t: pa.Table) -> pa.Table:
        k = t.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        nk = t.column("s_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(k)
        z = np.zeros(n, np.int64)
        return _wire(_shard_of(k), k, np.ones(n, np.int8), nk, z, z, z)

    def _probe(g: pa.Table):
        side = g.column("side").to_numpy(zero_copy_only=False)
        keys = g.column("key").to_numpy(zero_copy_only=False)
        bmask = side == 1
        bkey = keys[bmask]
        fmask = ~bmask
        fk = keys[fmask]
        if len(bkey) == 0 or len(fk) == 0:
            return None
        order = np.argsort(bkey)
        bkey = bkey[order]
        pos = np.searchsorted(bkey, fk)
        hit = (pos < len(bkey)) & (bkey[np.minimum(pos, len(bkey) - 1)] == fk)
        fact = {
            c: g.column(c).to_numpy(zero_copy_only=False)[fmask][hit]
            for c in ("aux", "year", "rev_i", "qty")
        }
        dval = g.column("aux").to_numpy(zero_copy_only=False)[bmask][
            order[pos[hit]]
        ]
        return fact, dval

    def merge_part(g: pa.Table) -> pa.Table:
        g = _dropg(g, ["shard"])
        if g.num_rows == 0:
            return _W.empty_table()
        p = _probe(g)
        if p is None:
            return _W.empty_table()
        f, retail_c = p
        amt = f["rev_i"] - f["qty"] * retail_c * 10000
        sk, year = f["aux"], f["year"]
        # pre-combine per (suppkey, year) before the suppkey shuffle;
        # the (key<<13)|year pack needs suppkey < 2^50 — fail loudly, never
        # silently collide (the pagerank guard pattern)
        if len(sk) and int(sk.max()) >= (1 << 50):
            raise ValueError("nation_profit: suppkey >= 2^50 breaks the pack")
        sy = sk * 8192 + year
        order = np.argsort(sy)
        sy, amt = sy[order], amt[order]
        new = np.ones(len(sy), dtype=bool)
        new[1:] = sy[1:] != sy[:-1]
        starts = np.flatnonzero(new)
        sy = sy[starts]
        amt = int_segment_sum(amt, starts)
        sk = sy // 8192
        n = len(sk)
        z = np.zeros(n, np.int64)
        return _wire(
            _shard_of(sk), sk, np.zeros(n, np.int8), z, sy % 8192, amt, z
        )

    _P = pa.schema(
        [("nk", pa.int64()), ("year", pa.int64()), ("amt", pa.int64())]
    )

    def merge_supp(g: pa.Table) -> pa.Table:
        g = _dropg(g, ["shard"])
        if g.num_rows == 0:
            return _P.empty_table()
        p = _probe(g)
        if p is None:
            return _P.empty_table()
        f, nk = p
        ny = nk * 8192 + f["year"]
        order = np.argsort(ny)
        ny, amt = ny[order], f["rev_i"][order]
        new = np.ones(len(ny), dtype=bool)
        new[1:] = ny[1:] != ny[:-1]
        starts = np.flatnonzero(new)
        ny = ny[starts]
        amt = int_segment_sum(amt, starts)
        return pa.table(
            {
                "nk": pa.array(ny // 8192, pa.int64()),
                "year": pa.array(ny % 8192, pa.int64()),
                "amt": pa.array(amt, pa.int64()),
            },
            schema=_P,
        )

    li = strip_schema_metadata(
        ray.data.read_parquet(
            _pq(sf_dir, "lineitem"),
            columns=[
                "l_partkey", "l_suppkey", "l_quantity",
                "l_extendedprice", "l_discount", "l_shipdate",
            ],
        )
    ).map_batches(li_rows, batch_format="pyarrow")
    part = _read_sized(
        sf_dir, "part", ["p_partkey", "p_retailprice"], filter=part_filter
    ).map_batches(part_rows, batch_format="pyarrow")
    supp = _read_sized(
        sf_dir, "supplier", ["s_suppkey", "s_nationkey"]
    ).map_batches(supp_rows, batch_format="pyarrow")

    def _hop(ds, dim, fn):
        return (
            absorb_empty_blocks(ds.union(dim), batch_size=131072)
            .groupby("shard")
            .map_groups(fn, batch_format="pyarrow")
        )

    rows = _hop(_hop(li, part, merge_part), supp, merge_supp).take_all()
    # nation is the spec-constant 25-row map: name lookup stays driver-side
    nat = _pqm.read_table(_pq(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    names = dict(zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist()))
    agg: dict[tuple[str, int], int] = {}
    for r in rows:
        k = (names[int(r["nk"])], int(r["year"]))
        agg[k] = agg.get(k, 0) + int(r["amt"])
    keys = sorted(agg)
    return pa.table(
        {
            "n_name": pa.array([k[0] for k in keys], pa.string()),
            "l_year": pa.array([k[1] for k in keys], pa.int64()),
            "profit_i": pa.array([agg[k] for k in keys], pa.int64()),
        },
        schema=_OUT,
    )


# ---------------------------------------------------------------------------
# TPC-H Q20 analogue — share-of-part dominance (GROUP-local HAVING semijoin)
# ---------------------------------------------------------------------------


def dominant_part_suppliers(sf_dir: str, num_shards: int = 64) -> pa.Table:
    """TPC-H Q20 analogue: suppliers shipping MORE THAN
    ``config.Q20_SHARE_PCT`` percent of some ``config.Q20_PART_TOKEN``-
    matched part's total shipped quantity.  The qualifier compares a
    (part, supplier) group sum against its PART group's sum — a
    group-vs-coarser-group HAVING that co-partitions for free because
    both groupings share the partkey.

    Scale shape: a bloom over the token-matched part keys prunes lineitem
    before anything shuffles; per-batch (partkey, suppkey) qty partials
    ride ONE partkey-shard groupby with the token part keys (exact
    semijoin kills bloom FPs); inside a shard every part's total is a
    segment sum over its already-grouped pair rows, and the dominance test
    is the integer cross-multiplication ``100*q > pct*total`` (no
    division).  Qualifying suppkeys (deduped per shard) re-key ONCE to a
    suppkey shard that attaches ``s_name`` — survivors are
    threshold-bounded (< 100/pct per part), never lineitem-sized.

    Output: (s_suppkey, s_name) distinct, ordered by s_suppkey."""
    import numpy as np

    from ..config import Q20_PART_TOKEN, Q20_SHARE_PCT
    from ._util import absorb_empty_blocks, int_segment_sum, strip_schema_metadata

    _OUT = pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string())])

    def _shard_of(keys: "np.ndarray") -> "np.ndarray":
        return (((keys * 2654435761) % (1 << 32)) % num_shards).astype(np.int32)

    _W = pa.schema(
        [
            ("shard", pa.int32()),
            ("key", pa.int64()),
            ("side", pa.int8()),
            ("sk", pa.int64()),
            ("qty", pa.int64()),
            ("name", pa.string()),
        ]
    )

    def _wire(shard, key, side, sk, qty, name=None) -> pa.Table:
        n = len(key)
        return pa.table(
            {
                "shard": pa.array(shard),
                "key": pa.array(key, pa.int64()),
                "side": pa.array(side, pa.int8()),
                "sk": pa.array(sk, pa.int64()),
                "qty": pa.array(qty, pa.int64()),
                "name": pa.nulls(n, pa.string()) if name is None else name,
            },
            schema=_W,
        )

    part_filter = pc.match_substring(pc.field("p_name"), Q20_PART_TOKEN)
    part_bloom = _bloom_of(
        _read_sized(sf_dir, "part", ["p_partkey"], filter=part_filter),
        "p_partkey",
    )

    def li_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _W.empty_table()
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = _bloom_keep(pk, ray.get(part_bloom))
        if not keep.any():
            return _W.empty_table()
        t = t.filter(pa.array(keep))
        pk = pk[keep]
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        qty = np.floor(
            t.column("l_quantity").to_numpy(zero_copy_only=False) + 0.5
        ).astype(np.int64)
        # per-batch (partkey, suppkey) pre-combine before the shuffle
        order = np.lexsort((sk, pk))
        pk, sk, qty = pk[order], sk[order], qty[order]
        new = np.ones(len(pk), dtype=bool)
        new[1:] = (pk[1:] != pk[:-1]) | (sk[1:] != sk[:-1])
        starts = np.flatnonzero(new)
        pk, sk = pk[starts], sk[starts]
        qty = int_segment_sum(qty, starts)
        n = len(pk)
        return _wire(_shard_of(pk), pk, np.zeros(n, np.int8), sk, qty)

    def part_rows(t: pa.Table) -> pa.Table:
        k = t.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(k)
        z = np.zeros(n, np.int64)
        return _wire(_shard_of(k), k, np.ones(n, np.int8), z, z)

    def merge_part(g: pa.Table) -> pa.Table:
        g = _dropg(g, ["shard"])
        if g.num_rows == 0:
            return _W.empty_table()
        side = g.column("side").to_numpy(zero_copy_only=False)
        keys = g.column("key").to_numpy(zero_copy_only=False)
        bmask = side == 1
        bkey = np.sort(keys[bmask])
        fmask = ~bmask
        pk = keys[fmask]
        if len(bkey) == 0 or len(pk) == 0:
            return _W.empty_table()
        pos = np.searchsorted(bkey, pk)
        hit = (pos < len(bkey)) & (bkey[np.minimum(pos, len(bkey) - 1)] == pk)
        pk = pk[hit]
        if len(pk) == 0:
            return _W.empty_table()
        sk = g.column("sk").to_numpy(zero_copy_only=False)[fmask][hit]
        qty = g.column("qty").to_numpy(zero_copy_only=False)[fmask][hit]
        # combine cross-block partials per (pk, sk), then per-part totals
        order = np.lexsort((sk, pk))
        pk, sk, qty = pk[order], sk[order], qty[order]
        new = np.ones(len(pk), dtype=bool)
        new[1:] = (pk[1:] != pk[:-1]) | (sk[1:] != sk[:-1])
        starts = np.flatnonzero(new)
        pk, sk = pk[starts], sk[starts]
        q = int_segment_sum(qty, starts)
        pnew = np.ones(len(pk), dtype=bool)
        pnew[1:] = pk[1:] != pk[:-1]
        pstarts = np.flatnonzero(pnew)
        totals = np.repeat(
            int_segment_sum(q, pstarts), np.diff(np.append(pstarts, len(pk)))
        )
        dom = 100 * q > Q20_SHARE_PCT * totals
        usk = np.unique(sk[dom])
        n = len(usk)
        z = np.zeros(n, np.int64)
        return _wire(_shard_of(usk), usk, np.zeros(n, np.int8), z, z)

    def supp_rows(t: pa.Table) -> pa.Table:
        k = t.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(k)
        z = np.zeros(n, np.int64)
        return _wire(
            _shard_of(k), k, np.ones(n, np.int8), z, z,
            t.column("s_name").cast(pa.string()),
        )

    _P = pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string())])

    def merge_supp(g: pa.Table) -> pa.Table:
        g = _dropg(g, ["shard"])
        if g.num_rows == 0:
            return _P.empty_table()
        side = g.column("side").to_numpy(zero_copy_only=False)
        keys = g.column("key").to_numpy(zero_copy_only=False)
        bmask = side == 1
        bkey = keys[bmask]
        # fact suppkeys arrive once per source shard: dedupe here
        fk = np.unique(keys[~bmask])
        if len(bkey) == 0 or len(fk) == 0:
            return _P.empty_table()
        order = np.argsort(bkey)
        bkey = bkey[order]
        pos = np.searchsorted(bkey, fk)
        hit = (pos < len(bkey)) & (bkey[np.minimum(pos, len(bkey) - 1)] == fk)
        fk = fk[hit]
        name = (
            g.column("name")
            .combine_chunks()
            .filter(pa.array(bmask))
            .take(pa.array(order[pos[hit]]))
        )
        return pa.table(
            {"s_suppkey": pa.array(fk, pa.int64()), "s_name": name}, schema=_P
        )

    li = strip_schema_metadata(
        ray.data.read_parquet(
            _pq(sf_dir, "lineitem"),
            columns=["l_partkey", "l_suppkey", "l_quantity"],
        )
    ).map_batches(li_rows, batch_format="pyarrow")
    part = _read_sized(
        sf_dir, "part", ["p_partkey"], filter=part_filter
    ).map_batches(part_rows, batch_format="pyarrow")
    supp = _read_sized(
        sf_dir, "supplier", ["s_suppkey", "s_name"]
    ).map_batches(supp_rows, batch_format="pyarrow")

    def _hop(ds, dim, fn):
        return (
            absorb_empty_blocks(ds.union(dim), batch_size=131072)
            .groupby("shard")
            .map_groups(fn, batch_format="pyarrow")
        )

    rows = _hop(_hop(li, part, merge_part), supp, merge_supp).take_all()
    rows.sort(key=lambda r: int(r["s_suppkey"]))
    return pa.table(
        {
            "s_suppkey": pa.array([int(r["s_suppkey"]) for r in rows], pa.int64()),
            "s_name": pa.array([r["s_name"] for r in rows], pa.string()),
        },
        schema=_OUT,
    )


# ---------------------------------------------------------------------------
# TPC-H Q12 analogue — priority-class counts per tax band
# ---------------------------------------------------------------------------


def tax_band_priority(sf_dir: str, num_shards: int = 64) -> pa.Table:
    """TPC-H Q12 analogue: per tax band (``floor(l_tax*1e4+0.5)``, the
    testdata's shipmode stand-in), how many lineitems belong to
    high-priority (``config.Q12_HIGH_PRIORITIES``) vs other orders — the
    fact-fact join whose ONLY payload is one bit from the other side,
    finished by a CASE-split conditional count.

    Scale shape: lineitem pre-combines (orderkey, band) counts per batch
    (bands are a small discrete set, so partials collapse hard); order rows
    carry the priority as ONE pre-computed bit; both ride the orderkey-shard
    groupby and each shard emits <= 2*|bands| aggregate rows — the driver
    folds shards x bands scalars.  Nothing broadcasts; neither fact table
    is collected.

    Output: (tax_e4, high_n, low_n) ordered by tax_e4."""
    import numpy as np

    from ..config import Q12_HIGH_PRIORITIES
    from ._util import absorb_empty_blocks, int_segment_sum, strip_schema_metadata

    _OUT = pa.schema(
        [("tax_e4", pa.int64()), ("high_n", pa.int64()), ("low_n", pa.int64())]
    )

    def _shard_of(keys: "np.ndarray") -> "np.ndarray":
        return (((keys * 2654435761) % (1 << 32)) % num_shards).astype(np.int32)

    # band slot doubles as the is_high bit on order rows
    _W = pa.schema(
        [
            ("shard", pa.int32()),
            ("key", pa.int64()),
            ("side", pa.int8()),
            ("band", pa.int64()),
            ("cnt", pa.int64()),
        ]
    )

    def li_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _W.empty_table()
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        band = np.floor(
            t.column("l_tax").to_numpy(zero_copy_only=False) * 10000.0 + 0.5
        ).astype(np.int64)
        if len(band) and (
            int(band.max()) >= (1 << 13) or int(ok.max()) >= (1 << 50)
        ):
            raise ValueError(
                "tax_band_priority: band >= 2^13 or orderkey >= 2^50 "
                "breaks the (key<<13)|band pack"
            )
        kb = ok * 8192 + band
        order = np.argsort(kb)
        kb = kb[order]
        new = np.ones(len(kb), dtype=bool)
        new[1:] = kb[1:] != kb[:-1]
        starts = np.flatnonzero(new)
        kb = kb[starts]
        cnt = int_segment_sum(np.ones(len(order), np.int64), starts)
        ok = kb // 8192
        n = len(ok)
        return pa.table(
            {
                "shard": pa.array(_shard_of(ok)),
                "key": pa.array(ok, pa.int64()),
                "side": pa.array(np.zeros(n, np.int8), pa.int8()),
                "band": pa.array(kb % 8192, pa.int64()),
                "cnt": pa.array(cnt, pa.int64()),
            },
            schema=_W,
        )

    high = set(Q12_HIGH_PRIORITIES)

    def ord_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _W.empty_table()
        ok = t.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        prio = t.column("o_orderpriority")
        is_high = pc.is_in(
            prio, value_set=pa.array(sorted(high), pa.string())
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ok)
        return pa.table(
            {
                "shard": pa.array(_shard_of(ok)),
                "key": pa.array(ok, pa.int64()),
                "side": pa.array(np.ones(n, np.int8), pa.int8()),
                "band": pa.array(is_high, pa.int64()),
                "cnt": pa.array(np.zeros(n, np.int64), pa.int64()),
            },
            schema=_W,
        )

    _P = pa.schema(
        [("band", pa.int64()), ("high_n", pa.int64()), ("low_n", pa.int64())]
    )

    def merge_shard(g: pa.Table) -> pa.Table:
        g = _dropg(g, ["shard"])
        if g.num_rows == 0:
            return _P.empty_table()
        side = g.column("side").to_numpy(zero_copy_only=False)
        key = g.column("key").to_numpy(zero_copy_only=False)
        bmask = side == 1
        bkey = key[bmask]
        fmask = ~bmask
        fk = key[fmask]
        if len(bkey) == 0 or len(fk) == 0:
            return _P.empty_table()
        order = np.argsort(bkey)
        bkey = bkey[order]
        bhigh = g.column("band").to_numpy(zero_copy_only=False)[bmask][order]
        pos = np.searchsorted(bkey, fk)
        hit = (pos < len(bkey)) & (bkey[np.minimum(pos, len(bkey) - 1)] == fk)
        band = g.column("band").to_numpy(zero_copy_only=False)[fmask][hit]
        cnt = g.column("cnt").to_numpy(zero_copy_only=False)[fmask][hit]
        is_high = bhigh[pos[hit]]
        if len(band) == 0:
            return _P.empty_table()
        bh = band * 2 + is_high
        so = np.argsort(bh)
        bh, cnt = bh[so], cnt[so]
        new = np.ones(len(bh), dtype=bool)
        new[1:] = bh[1:] != bh[:-1]
        starts = np.flatnonzero(new)
        bh = bh[starts]
        tot = int_segment_sum(cnt, starts)
        bands = np.unique(bh // 2)
        hi = np.zeros(len(bands), np.int64)
        lo = np.zeros(len(bands), np.int64)
        bpos = np.searchsorted(bands, bh // 2)
        np.add.at(hi, bpos[bh % 2 == 1], tot[bh % 2 == 1])
        np.add.at(lo, bpos[bh % 2 == 0], tot[bh % 2 == 0])
        return pa.table(
            {
                "band": pa.array(bands, pa.int64()),
                "high_n": pa.array(hi, pa.int64()),
                "low_n": pa.array(lo, pa.int64()),
            },
            schema=_P,
        )

    li = strip_schema_metadata(
        ray.data.read_parquet(
            _pq(sf_dir, "lineitem"), columns=["l_orderkey", "l_tax"]
        )
    ).map_batches(li_rows, batch_format="pyarrow")
    orders = strip_schema_metadata(
        ray.data.read_parquet(
            _pq(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority"]
        )
    ).map_batches(ord_rows, batch_format="pyarrow")
    rows = (
        absorb_empty_blocks(li.union(orders), batch_size=131072)
        .groupby("shard")
        .map_groups(merge_shard, batch_format="pyarrow")
        .take_all()
    )
    agg: dict[int, list[int]] = {}
    for r in rows:
        e = agg.setdefault(int(r["band"]), [0, 0])
        e[0] += int(r["high_n"])
        e[1] += int(r["low_n"])
    bands = sorted(agg)
    return pa.table(
        {
            "tax_e4": pa.array(bands, pa.int64()),
            "high_n": pa.array([agg[b][0] for b in bands], pa.int64()),
            "low_n": pa.array([agg[b][1] for b in bands], pa.int64()),
        },
        schema=_OUT,
    )
