"""Windowed / temporal operators the Dataset API lacks natively (SURVEY.md
§2.10 "custom operators"): as-of join and sliding-window aggregation —
expressed as map_batches + sharded groupby compositions per the brief's
option (a), with the partitioning assumption documented on each.

Partitioning assumption (both ops): rows are co-located per key by ONE
sharded hash groupby over slim (key, ts, ...) projections — payloads never
shuffle.  Inside a shard group the work is a vectorized pandas/numpy kernel,
so group dispatch stays O(shards), not O(keys) (see BASELINE.md notes on
map_groups dispatch cost).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ._util import drop_if_present as _dropg

KEY_SHARDS = 64


def _pq(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def _add_shard(t: pa.Table, key: str = "user_id") -> pa.Table:
    import pyarrow.compute as pc

    shard = pc.cast(pc.bit_wise_and(t.column(key), KEY_SHARDS - 1), pa.int32())
    return t.append_column("shard", shard)


# ---------------------------------------------------------------------------
# as-of join (backward): for each left event, the most recent right event of
# the same key with right.ts <= left.ts
# ---------------------------------------------------------------------------


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str = "user_id",
    ts: str = "ts",
) -> ray.data.Dataset:
    """Backward as-of join of two (key, ts, id) datasets.

    Both sides are tagged, unioned, co-partitioned by a shard of ``key``, and
    each shard group runs a vectorized sorted merge (np.searchsorted per key
    run).  Output: (key, left_id, left_ts, right_id, right_ts) with
    right_* null when no prior right row exists.
    """

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column("side", pa.array([side] * t.num_rows, pa.int32()))

        return fn

    both = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow")
    )
    return asof_join_tagged(both, key=key, ts=ts)


def asof_join_tagged(
    both: ray.data.Dataset, key: str = "user_id", ts: str = "ts"
) -> ray.data.Dataset:
    """As-of join over a single pre-tagged dataset (columns key, id, ts,
    side: 0=left/1=right) — lets callers derive both sides from ONE scan of
    a shared source instead of reading it twice."""

    import numpy as np
    import pyarrow.compute as pc

    def per_shard(g: pa.Table) -> pa.Table:
        """Vectorized backward as-of across ALL keys of the shard at once —
        numpy on Arrow, no pandas copy: sort by (key, ts, side) with right
        rows BEFORE left at equal ts (backward is at-or-before), then a
        global cummax of right-row indices; a pointed-to right row is valid
        iff it carries the SAME key (rows are key-sorted, so a different key
        means this key has no prior right row)."""
        ts_type = g.column(ts).type
        out_schema = pa.schema(
            [
                (key, pa.int64()),
                ("left_id", pa.int64()),
                ("left_ts", ts_type),
                ("right_id", pa.int64()),
                ("right_ts", ts_type),
            ]
        )
        if g.num_rows == 0:
            return out_schema.empty_table()
        k = g.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        t_us = pc.cast(g.column(ts), pa.int64()).to_numpy(zero_copy_only=False)
        side = g.column("side").to_numpy(zero_copy_only=False)
        ids = g.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        # side: 0=left, 1=right — at equal (key, ts) the right row must sort
        # FIRST so the left row can match it (backward = at-or-before);
        # lexsort ascending puts 0 first, so sort on the negated side
        order = np.lexsort((-side, t_us, k))
        k, t_us, side, ids = k[order], t_us[order], side[order], ids[order]
        n = len(k)
        is_right = side == 1
        last_right = np.maximum.accumulate(np.where(is_right, np.arange(n), -1))
        lm = ~is_right
        ptr = last_right[lm]
        valid = ptr >= 0
        valid[valid] &= k[ptr[valid]] == k[lm][valid]
        r_id = np.where(valid, ids[np.where(valid, ptr, 0)], 0)
        r_ts = np.where(valid, t_us[np.where(valid, ptr, 0)], 0)
        return pa.table(
            {
                key: pa.array(k[lm]),
                "left_id": pa.array(ids[lm]),
                "left_ts": pa.array(t_us[lm]).cast(ts_type),
                "right_id": pa.array(r_id, mask=~valid),
                "right_ts": pa.array(r_ts, mask=~valid).cast(ts_type),
            }
        )

    return (
        both.map_batches(lambda t: _add_shard(t, key), batch_format="pyarrow")
        .groupby("shard")
        .map_groups(per_shard, batch_format="pyarrow")
    )


def purchase_last_view(sf_dir: str) -> ray.data.Dataset:
    """Driver-testdata instantiation: each purchase event joined to the same
    user's most recent page_view at-or-before it (DuckDB ASOF JOIN oracle).
    Both join sides come from ONE scan of events (tagged in a single
    map_batches) rather than two reads."""
    import pyarrow.compute as pc

    cols = ["user_id", "event_id", "event_type", "ts"]

    def tag_both(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        keep = pc.is_in(et, value_set=pa.array(["purchase", "page_view"]))
        t = t.filter(keep)
        side = pc.if_else(
            pc.equal(t.column("event_type"), "purchase"),
            pa.scalar(0, pa.int32()),
            pa.scalar(1, pa.int32()),
        )
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "id": t.column("event_id"),
                "ts": t.column("ts"),
                "side": side,
            }
        )

    both = ray.data.read_parquet(_pq(sf_dir, "events"), columns=cols).map_batches(
        tag_both, batch_format="pyarrow"
    )
    out = asof_join_tagged(both)

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "purchase_id": t.column("left_id"),
                "view_id": t.column("right_id"),
            }
        )

    return out.map_batches(project, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# sliding-window aggregate
# ---------------------------------------------------------------------------

WINDOW_MIN = 60
SLIDE_MIN = 15


def sliding_window_counts(sf_dir: str) -> ray.data.Dataset:
    """Sliding-window aggregate over events: count + fixed-point value sum
    per (window_start, event_type) for 60-minute windows sliding every 15
    minutes.

    Shuffle-minimal plan: events are first reduced per (slide-bucket,
    event_type) — a per-batch partial groupby, then one Sum groupby over the
    tiny bucket table — and only THEN fanned out x4 into overlapping windows
    and re-summed.  The x(window/slide) row expansion happens on the
    aggregated table (O(buckets x types) rows), never on the raw events, and
    all sums are exact integers (cents), so partials merge exactly."""
    import pyarrow.compute as pc

    k = WINDOW_MIN // SLIDE_MIN
    slide_us = SLIDE_MIN * 60 * 1_000_000

    def partial(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        value = t.column("value").to_numpy(zero_copy_only=False)
        bucket = (ts_us // slide_us) * slide_us
        v100 = np.floor(value * 100.0 + 0.5).astype(np.int64)
        tbl = pa.table(
            {
                "bucket": pa.array(bucket),
                "event_type": t.column("event_type"),
                "value_c": pa.array(v100),
            }
        )
        g = tbl.group_by(["bucket", "event_type"]).aggregate(
            [("value_c", "sum"), ("bucket", "count")]
        )
        return pa.table(
            {
                "bucket": g.column("bucket"),
                "event_type": g.column("event_type"),
                "value_c": g.column("value_c_sum"),
                "n": pc.cast(g.column("bucket_count"), pa.int64()),
            }
        )

    def fan_out(t: pa.Table) -> pa.Table:
        """Expand each pre-aggregated (bucket, type) partial x``k`` into the
        overlapping windows it contributes to, keyed by a 64-way coarse
        window shard: every row of a given (window_start, event_type) lands
        in the same shard, so one map_groups merge finishes the aggregate."""
        b = t.column("bucket").to_numpy(zero_copy_only=False)
        starts = (b[:, None] - np.arange(k, dtype=np.int64)[None, :] * slide_us).reshape(-1)
        idx = np.repeat(np.arange(len(b)), k)
        return pa.table(
            {
                "window_start": pa.array(starts).cast(pa.timestamp("us")),
                "event_type": pc.take(t.column("event_type").combine_chunks(), pa.array(idx)),
                "value_c": pc.take(t.column("value_c").combine_chunks(), pa.array(idx)),
                "n": pc.take(t.column("n").combine_chunks(), pa.array(idx)),
                "wshard": pa.array(((starts // slide_us) & 63).astype(np.int32)),
            }
        )

    _OUT = pa.schema(
        [
            ("window_start", pa.timestamp("us")),
            ("event_type", pa.string()),
            ("n", pa.int64()),
            ("sum_value_c", pa.int64()),
        ]
    )

    def merge_windows(g: pa.Table) -> pa.Table:
        """Vectorized per-shard merge: one Arrow sort + run-detected exact
        int64 segment sums.  Replaces TWO chained Ray sort-Aggregates,
        whose map substage costs ~120us per shuffled row regardless of
        block layout (measured: 14.6k rows -> 1.76s CPU per shuffle at
        sf0.1) — the shard merge does the same reduction in ~2ms."""
        from ._util import int_segment_sum

        if g.num_rows == 0:
            return _OUT.empty_table()
        g = g.sort_by([("window_start", "ascending"), ("event_type", "ascending")])
        ws = g.column("window_start").combine_chunks()
        et = g.column("event_type").combine_chunks()
        new = np.ones(g.num_rows, dtype=bool)
        if g.num_rows > 1:
            same_ws = pc.equal(ws.slice(1), ws.slice(0, g.num_rows - 1)).to_numpy(
                zero_copy_only=False
            )
            same_et = pc.equal(et.slice(1), et.slice(0, g.num_rows - 1)).to_numpy(
                zero_copy_only=False
            )
            new[1:] = ~(same_ws & same_et)
        starts = np.flatnonzero(new)
        return pa.table(
            {
                "window_start": pc.take(ws, pa.array(starts)),
                "event_type": pc.take(et, pa.array(starts)),
                "n": pa.array(
                    int_segment_sum(g.column("n").to_numpy(zero_copy_only=False), starts)
                ),
                "sum_value_c": pa.array(
                    int_segment_sum(
                        g.column("value_c").to_numpy(zero_copy_only=False), starts
                    )
                ),
            }
        )

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["ts", "event_type", "value"])
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(fan_out, batch_format="pyarrow")
        .groupby("wshard")
        .map_groups(merge_windows, batch_format="pyarrow")
        .select_columns(["window_start", "event_type", "n", "sum_value_c"])
    )


def user_cumulative_value(sf_dir: str) -> ray.data.Dataset:
    """Expanding (cumulative) per-key window — the running-total window
    function ``SUM(...) OVER (PARTITION BY user ORDER BY ts, event_id ROWS
    UNBOUNDED PRECEDING)``: per event, the user's running event count and
    fixed-point value sum in (ts, event_id) order.  Values sum as exact
    integer cents (floor(v*100 + 0.5)) so the running totals are
    order-exact on both engine and oracle sides.

    One 64-way user-shard groupby (never one group per user — map_groups
    costs ~1 ms per GROUP), then a fully vectorized segment cumsum inside:
    lexsort by (user, ts, event_id), global cumsum, subtract each
    segment's base.  A user's history must fit one shard's group — the
    same per-key assumption as sessionize/asof; salt hot keys upstream."""
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "ts", "user_id", "value"]
    )

    _OUT = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("cum_n", pa.int64()),
            ("cum_value_c", pa.int64()),
        ]
    )

    def cum(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = pc.cast(g.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        v = g.column("value").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, eid, v = u[order], eid[order], v[order]
        cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
        total = np.cumsum(cents)
        new = np.ones(len(u), dtype=bool)
        new[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new)
        seg_id = np.cumsum(new) - 1
        base_total = np.where(starts > 0, total[starts - 1], 0)
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(u, pa.int64()),
                "cum_n": pa.array(
                    np.arange(1, len(u) + 1, dtype=np.int64) - starts[seg_id]
                ),
                "cum_value_c": pa.array(total - base_total[seg_id]),
            }
        )

    return (
        ds.map_batches(_add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(cum, batch_format="pyarrow")
    )


def event_transitions(sf_dir: str) -> ray.data.Dataset:
    """First-order transition counts over each user's event sequence — the
    Markov-chain estimation step of behavioral analytics: for every
    consecutive pair in (ts, event_id) order within a user, count
    (from_type -> to_type) corpus-wide.

    One 64-way user-shard groupby; inside each shard the pairs are formed
    by one lexsort + shifted compare and collapsed to (from, to, n)
    partials vectorized, so only a few-dozen-row partial table per shard
    reaches the final tiny groupby."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "ts", "user_id", "event_type"]
    )

    _OUT = pa.schema(
        [("from_type", pa.string()), ("to_type", pa.string()), ("n", pa.int64())]
    )

    def pairs(g: pa.Table) -> pa.Table:
        if g.num_rows < 2:
            return _OUT.empty_table()
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = pc.cast(g.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        et = np.asarray(g.column("event_type").to_pylist())
        order = np.lexsort((eid, ts, u))
        u, et = u[order], et[order]
        same = u[1:] == u[:-1]
        if not same.any():
            return _OUT.empty_table()
        types, codes = np.unique(et, return_inverse=True)
        k = len(types)
        pair_code = codes[:-1][same] * k + codes[1:][same]
        counts = np.bincount(pair_code, minlength=k * k)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "from_type": pa.array(types[nz // k].tolist(), pa.string()),
                "to_type": pa.array(types[nz % k].tolist(), pa.string()),
                "n": pa.array(counts[nz], pa.int64()),
            }
        )

    return (
        ds.map_batches(_add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["from_type", "to_type"])
        .aggregate(Sum("n", alias_name="n"))
    )


def lag_features(sf_dir: str) -> ray.data.Dataset:
    """Per-key lag features — the ``LAG(...) OVER (PARTITION BY user ORDER BY
    ts, event_id)`` feature-engineering step of a behavioral-ML pipeline:
    for every event, microseconds since the user's previous event and the
    fixed-point cents delta vs that event's value.  First event per user
    emits the (-1, 0) sentinel pair (COALESCE'd identically in the oracle)
    so the output stays non-null int64 on both engines.

    One 64-way user-shard groupby over a slim (event_id, ts, user, cents)
    projection — payload columns never shuffle; inside a shard the whole
    window is one lexsort + shifted subtract with segment boundaries masked,
    exact integer arithmetic throughout.  A user's history must fit one
    shard group (same per-key assumption as sessionize / as-of)."""
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "ts", "user_id", "value"]
    )

    _OUT = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("gap_us", pa.int64()),
            ("delta_value_c", pa.int64()),
        ]
    )

    def lag(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = pc.cast(g.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        v = g.column("value").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, ts, eid = u[order], ts[order], eid[order]
        cents = np.floor(v[order] * 100.0 + 0.5).astype(np.int64)
        gap = np.full(len(u), -1, dtype=np.int64)
        delta = np.zeros(len(u), dtype=np.int64)
        if len(u) > 1:
            cont = u[1:] == u[:-1]  # same-user continuation rows
            gap[1:][cont] = (ts[1:] - ts[:-1])[cont]
            delta[1:][cont] = (cents[1:] - cents[:-1])[cont]
        return pa.table(
            {
                "event_id": pa.array(eid),
                "user_id": pa.array(u),
                "gap_us": pa.array(gap),
                "delta_value_c": pa.array(delta),
            }
        )

    return (
        ds.map_batches(_add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(lag, batch_format="pyarrow")
        .select_columns(["event_id", "user_id", "gap_us", "delta_value_c"])
    )


def rolling_event_stats(sf_dir: str, frame: int = 3) -> ray.data.Dataset:
    """Per-key ROWS-frame rolling window — ``SUM / COUNT OVER (PARTITION BY
    user ORDER BY ts, event_id ROWS BETWEEN frame-1 PRECEDING AND CURRENT
    ROW)``: each event's trailing-``frame`` event count and exact cents sum
    for the same user (the moving-average feature of a behavioral model,
    kept integer-exact by emitting the sum + count instead of a float mean).

    Same shape as ``lag_features``: one 64-way user-shard groupby over the
    slim (event_id, ts, user, cents) projection, then a vectorized
    cumsum-difference inside the shard — roll[i] = cum[i] - cum[i-frame]
    with both the frame edge and the user-segment start clamped, no Python
    row loop.  A user's history must fit one shard group."""
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "ts", "user_id", "value"]
    )

    _OUT = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("roll_n", pa.int64()),
            ("roll_sum_c", pa.int64()),
        ]
    )

    def roll(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = pc.cast(g.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        v = g.column("value").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, eid = u[order], eid[order]
        cents = np.floor(v[order] * 100.0 + 0.5).astype(np.int64)
        n = len(u)
        idx = np.arange(n, dtype=np.int64)
        new = np.ones(n, dtype=bool)
        new[1:] = u[1:] != u[:-1]
        seg_start = np.maximum.accumulate(np.where(new, idx, 0))
        # window start = max(segment start, i - frame + 1)
        w_start = np.maximum(seg_start, idx - (frame - 1))
        cum = np.cumsum(cents)
        base = np.where(w_start > 0, cum[w_start - 1], 0)
        return pa.table(
            {
                "event_id": pa.array(eid),
                "user_id": pa.array(u),
                "roll_n": pa.array(idx - w_start + 1),
                "roll_sum_c": pa.array(cum - base),
            }
        )

    return (
        ds.map_batches(_add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(roll, batch_format="pyarrow")
        .select_columns(["event_id", "user_id", "roll_n", "roll_sum_c"])
    )


def time_weighted_value(sf_dir: str, n_shards: int = 64) -> ray.data.Dataset:
    """Time-weighted average over an IRREGULAR event series (the TWAP
    shape): per user, each event's value holds until the next event, so
    the mean is sum(cents_i * dt_i) / sum(dt_i) over the inter-event gaps
    in (ts, event_id) order — the last event opens no interval, users with
    a single event emit nothing (no gap exists, same as the SQL LEAD
    mirror).  Exact integers throughout: per-user numerators are bounded
    by observed-span-us x max-cents (~1.3e17 on this corpus — inside
    int64; re-derive the bound before reusing on wider spans), and the
    floored cents mean ``num // dur`` is division-stable on both engines.

    Same slim-projection user-shard groupby as lag_features: one lexsort +
    shifted subtract per shard, segment sums per user via run detection."""
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "ts", "user_id", "value"]
    )

    _OUT = pa.schema(
        [
            ("user_id", pa.int64()),
            ("dur_us", pa.int64()),
            ("num_cents_us", pa.int64()),
            ("twa_c", pa.int64()),
        ]
    )

    def add_shard(t: pa.Table) -> pa.Table:
        cents = pa.array(
            np.floor(
                t.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
        )
        shard = pc.cast(pc.bit_wise_and(t.column("user_id"), n_shards - 1), pa.int32())
        return pa.table(
            {
                "shard": shard,
                "user_id": t.column("user_id").cast(pa.int64()),
                "us": t.column("ts").cast(pa.int64()),
                "event_id": t.column("event_id").cast(pa.int64()),
                "cents": cents,
            }
        )

    def per_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        us = g.column("us").to_numpy(zero_copy_only=False)
        ev = g.column("event_id").to_numpy(zero_copy_only=False)
        c = g.column("cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((ev, us, u))
        u, us, c = u[order], us[order], c[order]
        n = len(u)
        same = np.zeros(n, dtype=bool)
        same[:-1] = u[:-1] == u[1:]  # row opens an interval to its successor
        dt = np.zeros(n, dtype=np.int64)
        dt[:-1] = us[1:] - us[:-1]
        dt[~same] = 0
        from ._util import int_segment_sum

        new = np.ones(n, dtype=bool)
        new[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new)
        dur = int_segment_sum(dt, starts)
        num = int_segment_sum(c * dt, starts)
        keep = dur > 0  # single-event users open no interval
        uu = u[starts][keep]
        dur, num = dur[keep], num[keep]
        return pa.table(
            {
                "user_id": pa.array(uu, pa.int64()),
                "dur_us": pa.array(dur, pa.int64()),
                "num_cents_us": pa.array(num, pa.int64()),
                "twa_c": pa.array(num // dur, pa.int64()),
            },
            schema=_OUT,
        )

    from ._util import absorb_empty_blocks

    out = (
        ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: per_shard(_dropg(g, ["shard"])), batch_format="pyarrow"
        )
    )
    # per-shard outputs are |users/shard| skinny blocks: coalesce before the
    # presentation sort so it pays per-row, not per-task dispatch
    return absorb_empty_blocks(out, batch_size=131072).sort("user_id")


def user_running_zscore(sf_dir: str, n_shards: int = 64) -> ray.data.Dataset:
    """Streaming per-key anomaly gate — flag every event whose value sits
    more than 2 standard deviations from the RUNNING mean of the user's
    PRIOR events (the online z-score monitor), kept exact by
    cross-multiplying the condition into integers:
    ``|c - s1/n| > 2*sqrt((n*s2 - s1^2)/n^2)  <=>
    (n*c - s1)^2 > 4*(n*s2 - s1^2)`` — no division, no sqrt, no float,
    so engine and the SQL window mirror agree bit-for-bit.  First events
    (no prior history) emit n_prior=0 and flag 0; bounds are safe while
    a user's event count x max cents stays under ~3e9 (LHS square below
    2^63) — re-derive before reusing on wider domains.

    Shape: the expanding-window family's user-shard groupby (one lexsort
    per shard), EXCLUSIVE running sums via per-segment base subtraction —
    three int64 cumsums, no per-row python."""
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "ts", "user_id", "value"]
    )

    _OUT = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("n_prior", pa.int64()),
            ("dev_n", pa.int64()),
            ("var4_n2", pa.int64()),
            ("is_outlier", pa.int64()),
        ]
    )

    def add_shard(t: pa.Table) -> pa.Table:
        cents = pa.array(
            np.floor(
                t.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
        )
        shard = pc.cast(pc.bit_wise_and(t.column("user_id"), n_shards - 1), pa.int32())
        return pa.table(
            {
                "shard": shard,
                "user_id": t.column("user_id").cast(pa.int64()),
                "us": t.column("ts").cast(pa.int64()),
                "event_id": t.column("event_id").cast(pa.int64()),
                "cents": cents,
            }
        )

    def per_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        us = g.column("us").to_numpy(zero_copy_only=False)
        ev = g.column("event_id").to_numpy(zero_copy_only=False)
        c = g.column("cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((ev, us, u))
        u, ev, c = u[order], ev[order], c[order]
        n = len(u)
        new = np.ones(n, dtype=bool)
        new[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new)
        run_id = np.cumsum(new) - 1
        # EXCLUSIVE per-user running count / sum / sum-of-squares
        idx = np.arange(n, dtype=np.int64)
        n_prior = idx - starts[run_id]
        cs1 = np.cumsum(c) - c
        s1 = cs1 - cs1[starts][run_id]
        c2 = c * c
        cs2 = np.cumsum(c2) - c2
        s2 = cs2 - cs2[starts][run_id]
        dev = n_prior * c - s1
        var4 = 4 * (n_prior * s2 - s1 * s1)
        flag = ((n_prior >= 1) & (dev * dev > var4)).astype(np.int64)
        return pa.table(
            {
                "event_id": pa.array(ev, pa.int64()),
                "user_id": pa.array(u, pa.int64()),
                "n_prior": pa.array(n_prior, pa.int64()),
                "dev_n": pa.array(dev, pa.int64()),
                "var4_n2": pa.array(var4, pa.int64()),
                "is_outlier": pa.array(flag, pa.int64()),
            },
            schema=_OUT,
        )

    return (
        ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: per_shard(_dropg(g, ["shard"])), batch_format="pyarrow"
        )
        .sort(["user_id", "event_id"])
    )


# ---------------------------------------------------------------------------
# distributed global rank / NTILE: an ORDER BY over the WHOLE dataset with no
# partition key — the one window shape a sharded-by-key groupby cannot
# express, because every row's rank depends on every other row
# ---------------------------------------------------------------------------


def _rank_bin(v: np.ndarray) -> np.ndarray:
    """Monotone bucketing of int64 totals into ~1k pseudo-log bins: (binary
    exponent, 4-bit mantissa slice) via np.frexp — exact for |v| < 2**53
    (asserted), so the bin function is strictly monotone NON-decreasing in
    ``v``.  Monotonicity is the only correctness requirement: bins partition
    the sorted order into contiguous ranges and ties always share a bin;
    boundary placement steers bucket BALANCE only.  v <= 0 collapses into
    bin 0 (still monotone — the within-bin exact sort orders them)."""
    if len(v) and int(np.abs(v).max()) >= 1 << 53:
        raise ValueError("_rank_bin: |total| >= 2^53 breaks frexp exactness")
    m, e = np.frexp(v.astype(np.float64))
    sub = ((m - 0.5) * 32.0).astype(np.int64)  # 16 slices per octave
    return np.where(v <= 0, 0, e.astype(np.int64) * 16 + sub + 1)


def _ntile_of_rank(r0: np.ndarray, n: int, t: int) -> np.ndarray:
    """SQL NTILE(t) from 0-based global rank: the first n%t tiles carry
    floor(n/t)+1 rows, the rest floor(n/t) (DuckDB/ANSI convention)."""
    q, rem = divmod(n, t)
    if q == 0:  # fewer rows than tiles: one row per tile
        return (r0 + 1).astype(np.int64)
    big = q + 1
    cut = rem * big
    small = np.maximum(r0 - cut, 0)  # keep the unused branch division-safe
    return np.where(r0 < cut, r0 // big, rem + small // q).astype(np.int64) + 1


def user_value_ntile(sf_dir: str) -> ray.data.Dataset:
    """Global rank + NTILE over per-user lifetime value — ``row_number() /
    NTILE(config.NTILE_N) OVER (ORDER BY total_c DESC, user_id)`` with no
    PARTITION BY, computed WITHOUT a global Dataset.sort and without any
    corpus- or user-scaled driver state.  Three stages:

      1. per-user total cents: per-batch segment-sum combine, one 64-way
         user-shard groupby (user-scaled, stays distributed; materialized
         once because two passes consume it);
      2. a bounded ~1k-bin monotone histogram of totals (mergeable
         partials; only the bin table reaches the driver) turns into each
         bin's global DESC-order base offset, broadcast via ray.put;
      3. one coarse bin-shard groupby ranks every bin locally (vectorized
         lexsort — bins are contiguous under (total DESC, user) order) and
         adds the base: rank = base[bin] + local index.

    Skew caveat: one bin spans a ~±3% relative value slice, so a corpus
    where most users share one total concentrates that bin's group — the
    same per-group-fits-memory assumption as sessionize; pre-salt upstream
    if so.  Output: (user_id, total_c, rnk, tile), rnk 1-based."""
    import pyarrow.compute as pc  # noqa: F401  (schema casts below)
    import ray as _ray

    from ._util import combine_by_key
    from ..config import NTILE_N

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "value"])

    _TOT = pa.schema([("user_id", pa.int64()), ("total_c", pa.int64())])
    _OUT = pa.schema(
        [
            ("user_id", pa.int64()),
            ("total_c", pa.int64()),
            ("rnk", pa.int64()),
            ("tile", pa.int64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _TOT.empty_table().append_column(
                "shard", pa.array([], pa.int32())
            )
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        v = t.column("value").to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
        uu, cc = combine_by_key(u, cents)
        return pa.table(
            {
                "user_id": pa.array(uu, pa.int64()),
                "total_c": pa.array(cc, pa.int64()),
                "shard": pa.array((uu & (KEY_SHARDS - 1)).astype(np.int32)),
            }
        )

    def merge_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _TOT.empty_table()
        uu, cc = combine_by_key(
            g.column("user_id").to_numpy(zero_copy_only=False),
            g.column("total_c").to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {"user_id": pa.array(uu, pa.int64()), "total_c": pa.array(cc, pa.int64())}
        )

    totals = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: merge_shard(_dropg(g, ["shard"])), batch_format="pyarrow"
        )
        .materialize()  # consumed twice: histogram pass, then rank pass
    )

    # -- stage 2: bounded mergeable bin histogram -> global DESC base offsets
    def hist_partial(t: pa.Table) -> pa.Table:
        b = _rank_bin(t.column("total_c").to_numpy(zero_copy_only=False))
        vals, cnts = np.unique(b, return_counts=True)
        return pa.table(
            {
                "bin": pa.array(vals, pa.int64()),
                "cnt": pa.array(cnts.astype(np.int64)),
                "bshard": pa.array((vals & 15).astype(np.int32)),
            }
        )

    def hist_reduce(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {"bin": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
        bb, cc = combine_by_key(
            g.column("bin").to_numpy(zero_copy_only=False),
            g.column("cnt").to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {
                "bin": pa.array(bb, pa.int64()),
                "cnt": pa.array(cc, pa.int64()),
            }
        )

    hist_rows = (
        totals.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("bshard")
        .map_groups(
            lambda g: hist_reduce(_dropg(g, ["bshard"])), batch_format="pyarrow"
        )
        .take_all()
    )  # <= ~1k rows — bin-bounded, never user-scaled
    if not hist_rows:
        return ray.data.from_arrow(_OUT.empty_table())

    bins = np.array([r["bin"] for r in hist_rows], dtype=np.int64)
    cnts = np.array([r["cnt"] for r in hist_rows], dtype=np.int64)
    order = np.argsort(-bins)  # DESC total_c order
    bins, cnts = bins[order], cnts[order]
    base = np.zeros(len(bins), dtype=np.int64)
    base[1:] = np.cumsum(cnts[:-1])
    n_total = int(cnts.sum())
    state_ref = _ray.put((bins, base, n_total))

    # -- stage 3: coarse bin-shard groupby; exact rank inside, vectorized
    def add_rshard(t: pa.Table) -> pa.Table:
        b = _rank_bin(t.column("total_c").to_numpy(zero_copy_only=False))
        return t.append_column("rshard", pa.array((b >> 4).astype(np.int32)))

    def rank_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        bins_d, base_d, n = _ray.get(state_ref)
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        c = g.column("total_c").to_numpy(zero_copy_only=False)
        order = np.lexsort((u, -c))  # (total DESC, user ASC)
        u, c = u[order], c[order]
        b = _rank_bin(c)  # descending, so bins form contiguous runs
        new = np.ones(len(b), dtype=bool)
        new[1:] = b[1:] != b[:-1]
        starts = np.flatnonzero(new)
        run_id = np.cumsum(new) - 1
        local = np.arange(len(b), dtype=np.int64) - starts[run_id]
        pos = np.searchsorted(-bins_d, -b[starts])  # bins_d is DESC-sorted
        rnk = base_d[pos][run_id] + local + 1
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "total_c": pa.array(c, pa.int64()),
                "rnk": pa.array(rnk, pa.int64()),
                "tile": pa.array(_ntile_of_rank(rnk - 1, n, NTILE_N), pa.int64()),
            }
        )

    return (
        totals.map_batches(add_rshard, batch_format="pyarrow")
        .groupby("rshard")
        .map_groups(
            lambda g: rank_shard(_dropg(g, ["rshard"])), batch_format="pyarrow"
        )
    )


# ---------------------------------------------------------------------------
# per-bucket OHLC: grouped argmin/argmax BY A DIFFERENT COLUMN (open = value
# at the bucket's earliest timestamp), made mergeable — the time-series
# candlestick shape the registry's other aggregates (sum/min/max/mode) lack
# ---------------------------------------------------------------------------


def daily_ohlc(sf_dir: str, n_shards: int = 16) -> ray.data.Dataset:
    """Open/high/low/close/count of event value per UTC day.  Open/close are
    NOT plain min/max — they are the value AT the day's first/last (ts,
    event_id) — but the triple (ts, event_id, value_c) under lexicographic
    (ts, event_id) order IS an associative mergeable summary: per batch each
    day contributes one partial carrying its first/last triple plus
    high/low/n, and merging keeps the lexicographically smaller/larger
    triple.  One coarse day-shard groupby finishes; nothing day- or
    event-scaled reaches the driver.  Output (day_i = epoch days):
    (day_i, open_c, high_c, low_c, close_c, n), exact integer cents."""
    _US_PER_DAY = 86_400_000_000

    _PART = pa.schema(
        [
            ("dshard", pa.int32()),
            ("day_i", pa.int64()),
            ("o_ts", pa.int64()),
            ("o_eid", pa.int64()),
            ("o_vc", pa.int64()),
            ("c_ts", pa.int64()),
            ("c_eid", pa.int64()),
            ("c_vc", pa.int64()),
            ("high_c", pa.int64()),
            ("low_c", pa.int64()),
            ("n", pa.int64()),
        ]
    )
    _OUT = pa.schema(
        [
            ("day_i", pa.int64()),
            ("open_c", pa.int64()),
            ("high_c", pa.int64()),
            ("low_c", pa.int64()),
            ("close_c", pa.int64()),
            ("n", pa.int64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PART.empty_table()
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        vc = np.floor(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        day = us // _US_PER_DAY
        order = np.lexsort((eid, us, day))
        day, us, eid, vc = day[order], us[order], eid[order], vc[order]
        new = np.ones(len(day), dtype=bool)
        new[1:] = day[1:] != day[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(day)) - 1
        counts = np.append(starts[1:], len(day)) - starts
        d = day[starts]
        return pa.table(
            {
                "dshard": pa.array((d % n_shards).astype(np.int32)),
                "day_i": pa.array(d, pa.int64()),
                "o_ts": pa.array(us[starts], pa.int64()),
                "o_eid": pa.array(eid[starts], pa.int64()),
                "o_vc": pa.array(vc[starts], pa.int64()),
                "c_ts": pa.array(us[ends], pa.int64()),
                "c_eid": pa.array(eid[ends], pa.int64()),
                "c_vc": pa.array(vc[ends], pa.int64()),
                "high_c": pa.array(np.maximum.reduceat(vc, starts), pa.int64()),
                "low_c": pa.array(np.minimum.reduceat(vc, starts), pa.int64()),
                "n": pa.array(counts, pa.int64()),
            },
            schema=_PART,
        )

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        cols = {c: g.column(c).to_numpy(zero_copy_only=False) for c in g.column_names}
        day = cols["day_i"]
        # open: lexicographically FIRST (o_ts, o_eid) triple per day
        oo = np.lexsort((cols["o_eid"], cols["o_ts"], day))
        d_o = day[oo]
        first_o = np.ones(len(d_o), dtype=bool)
        first_o[1:] = d_o[1:] != d_o[:-1]
        # close: lexicographically LAST (c_ts, c_eid) triple per day
        co = np.lexsort((-cols["c_eid"], -cols["c_ts"], day))
        d_c = day[co]
        first_c = np.ones(len(d_c), dtype=bool)
        first_c[1:] = d_c[1:] != d_c[:-1]
        # high/low/n: plain segment reductions under any day-sorted order
        so = np.argsort(day, kind="stable")
        d_s = day[so]
        new = np.ones(len(d_s), dtype=bool)
        new[1:] = d_s[1:] != d_s[:-1]
        starts = np.flatnonzero(new)
        from ._util import int_segment_sum

        return pa.table(
            {
                "day_i": pa.array(d_s[starts], pa.int64()),
                "open_c": pa.array(cols["o_vc"][oo][first_o], pa.int64()),
                "high_c": pa.array(
                    np.maximum.reduceat(cols["high_c"][so], starts), pa.int64()
                ),
                "low_c": pa.array(
                    np.minimum.reduceat(cols["low_c"][so], starts), pa.int64()
                ),
                "close_c": pa.array(cols["c_vc"][co][first_c], pa.int64()),
                "n": pa.array(int_segment_sum(cols["n"][so], starts), pa.int64()),
            },
            schema=_OUT,
        )

    ds = ray.data.read_parquet(
        _pq(sf_dir, "events"), columns=["ts", "event_id", "value"]
    )
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("dshard")
        .map_groups(
            lambda g: merge(_dropg(g, ["dshard"])), batch_format="pyarrow"
        )
    )


# ---------------------------------------------------------------------------
# grouped OLS trend: per-user linear slope of value over time — the drift
# diagnostic (is this user/source's value rising?); regression sums are NOT
# expressible as any single Dataset aggregate, and exactness needs the
# shift-invariance trick below
# ---------------------------------------------------------------------------


def user_value_trend(sf_dir: str, n_shards: int = 64) -> ray.data.Dataset:
    """Per-user least-squares slope of event value (cents) against event DAY,
    as e6 fixed point: ``slope_e6 = floor(1e6 * (n*Sxy - Sx*Sy) /
    (n*Sxx - Sx^2))`` — NULL when the user's events all fall on one day
    (zero x-variance).

    Exactness: the slope is invariant to shifting x, so x = day -
    min(day of THIS user) — per-user day offsets (tiny ints) instead of
    absolute epoch days keep the int64 SEGMENT SUMS exact (the kernel
    bounds rows x span x cents per user and raises loudly past 2^62);
    num/den then form in arbitrary-precision python ints (one element per
    USER), so the rational can neither wrap nor falsely reject.  Floor
    division of a possibly-negative numerator is mirrored in SQL with the
    positive-mod identity ((nm - ((nm % dn) + dn) % dn) // dn) because
    DuckDB's ``//`` truncates while numpy floors.

    Scale shape: the user_running_zscore projection — slim (user, day,
    cents) rows hash-shard by user (one co-location pass, no global sort);
    inside a shard one lexsort + segment sums produce every user's five
    regression sums vectorized.  Output: (user_id, n, slope_e6)."""
    from ._util import absorb_empty_blocks, int_segment_sum

    _US_PER_DAY = 86_400_000_000
    _OUT = pa.schema(
        [("user_id", pa.int64()), ("n", pa.int64()), ("slope_e6", pa.int64())]
    )

    def slim(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        vc = np.floor(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "shard": pa.array((u & (n_shards - 1)).astype(np.int32)),
                "user_id": pa.array(u, pa.int64()),
                "day_i": pa.array(us // _US_PER_DAY, pa.int64()),
                "vc": pa.array(vc, pa.int64()),
            }
        )

    def fit(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        d = g.column("day_i").to_numpy(zero_copy_only=False)
        y = g.column("vc").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, u))
        u, d, y = u[order], d[order], y[order]
        new = np.ones(len(u), dtype=bool)
        new[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new)
        run_id = np.cumsum(new) - 1
        x = d - d[starts][run_id]  # per-user day offset (sorted: first = min)
        n = np.append(starts[1:], len(u)) - starts
        # the int64 SEGMENT SUMS must not wrap (a wrapped sum is garbage the
        # later exact math cannot repair): bound them by exact python-int
        # operand maxima BEFORE computing — per-user sxy <= nm*mx*my etc.
        mx = int(x.max()) if len(x) else 0
        my = int(np.abs(y).max()) if len(y) else 0
        nm = int(n.max()) if len(n) else 0
        if nm * mx * max(my, mx) >= (1 << 62):
            raise ValueError(
                "user_value_trend: per-user (rows x day-span x cents) too "
                "large for exact int64 regression sums — reduce per-user "
                "row count or rescale"
            )
        sx = int_segment_sum(x, starts)
        sy = int_segment_sum(y, starts)
        sxx = int_segment_sum(x * x, starts)
        sxy = int_segment_sum(x * y, starts)
        # num/den in EXACT python ints (object dtype): the per-user vectors
        # are small (one element per user), so arbitrary-precision products
        # cost nothing and can neither wrap nor falsely reject skewed-but-
        # valid inputs (one element per USER, not per event)
        n_o = n.astype(object)
        num = n_o * sxy.astype(object) - sx.astype(object) * sy.astype(object)
        den = n_o * sxx.astype(object) - sx.astype(object) * sx.astype(object)
        ok = np.array([v > 0 for v in den], dtype=bool)
        slope_obj = [
            (1_000_000 * nu) // de if de > 0 else 0
            for nu, de in zip(num.tolist(), den.tolist())
        ]
        if any(abs(s) >= (1 << 63) for s in slope_obj):
            raise ValueError("user_value_trend: slope_e6 exceeds int64")
        slope = np.array(slope_obj, dtype=np.int64)
        return pa.table(
            {
                "user_id": pa.array(u[starts], pa.int64()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
                "slope_e6": pa.array(
                    np.where(ok, slope, 0), pa.int64(), mask=~ok
                ),
            },
            schema=_OUT,
        )

    ds = ray.data.read_parquet(
        _pq(sf_dir, "events"), columns=["user_id", "ts", "value"]
    )
    return (
        absorb_empty_blocks(
            ds.map_batches(slim, batch_format="pyarrow"), batch_size=131072
        )
        .groupby("shard")
        .map_groups(lambda g: fit(_dropg(g, ["shard"])), batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# temporal decay weighting: recency-weighted per-user value with an integer
# half-life — the recsys / curation "recent activity counts more" primitive;
# a power-of-two half-life makes the weight an exact bit shift, so the score
# is deterministic integer arithmetic on both engines
# ---------------------------------------------------------------------------


def user_decayed_value(sf_dir: str, n_shards: int = 64) -> ray.data.Dataset:
    """Per-user exponentially time-decayed value: each event contributes
    ``cents >> age_days`` (half-life = 1 day, weight halves per day of age
    relative to the corpus's LAST observed day; shift capped at 63).  Two
    passes: a bounded max-day scan (one int per block reaches the driver),
    then row-local decayed contributions pre-sum per user per batch and
    ride one user-shard groupby.  All-integer — floor-of-halving per day —
    so both engines agree bit-for-bit.  Output: (user_id, decayed_c, n)."""
    from ._util import absorb_empty_blocks, combine_by_key

    _US_PER_DAY = 86_400_000_000
    _OUT = pa.schema(
        [("user_id", pa.int64()), ("decayed_c", pa.int64()), ("n", pa.int64())]
    )

    ds = ray.data.read_parquet(
        _pq(sf_dir, "events"), columns=["user_id", "ts", "value"]
    )

    def day_max(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        if len(us) == 0:
            return pa.table({"mx": pa.array([], pa.int64())})
        return pa.table({"mx": pa.array([int(us.max()) // _US_PER_DAY], pa.int64())})

    mx_rows = ds.map_batches(day_max, batch_format="pyarrow").take_all()
    if not mx_rows:
        return ray.data.from_arrow(_OUT.empty_table())
    ref_day = max(r["mx"] for r in mx_rows)

    def partial(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        vc = np.floor(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        age = np.minimum(ref_day - us // _US_PER_DAY, 63)
        uu, cc, nn = combine_by_key(u, vc >> age, np.ones(len(u), dtype=np.int64))
        return pa.table(
            {
                "shard": pa.array((uu & (n_shards - 1)).astype(np.int32)),
                "user_id": pa.array(uu, pa.int64()),
                "decayed_c": pa.array(cc, pa.int64()),
                "n": pa.array(nn, pa.int64()),
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        uu, cc, nn = combine_by_key(
            g.column("user_id").to_numpy(zero_copy_only=False),
            g.column("decayed_c").to_numpy(zero_copy_only=False),
            g.column("n").to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {
                "user_id": pa.array(uu, pa.int64()),
                "decayed_c": pa.array(cc, pa.int64()),
                "n": pa.array(nn, pa.int64()),
            },
            schema=_OUT,
        )

    return (
        absorb_empty_blocks(
            ds.map_batches(partial, batch_format="pyarrow"), batch_size=131072
        )
        .groupby("shard")
        .map_groups(lambda g: merge(_dropg(g, ["shard"])), batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# dense time-grid resample + forward fill (gap fill): the one window shape
# that EXPANDS rows — every (user, day) cell of the user's observed span is
# materialized, carrying the most recent observed daily total.  Reference
# error_analysis.py renders per-day metric series the same way (missing
# days carry the last value) before charting.
# ---------------------------------------------------------------------------

_GAP_DAY_BITS = 20  # epoch-day < 2^20 holds until year ~4840
_GAP_OUT = pa.schema(
    [
        ("user_id", pa.int64()),
        ("day_i", pa.int64()),
        ("value_c", pa.int64()),
        ("observed", pa.int64()),
    ]
)


def user_gap_fill(sf_dir: str, n_shards: int = 64) -> ray.data.Dataset:
    """Per-user daily resample with forward fill: for EVERY day in
    [user's first day, user's last day] emit the user's daily cents total,
    gap days carrying the most recent observed total (``observed = 0``).

    Scale shape: per-batch (user, day) partial sums collapse raw events to
    distinct observed cells before the one user-shard shuffle; the shard
    kernel is fully vectorized — the packed (user << 20 | day) key is
    GLOBALLY sorted, so one ``np.searchsorted(side='right') - 1`` maps every
    grid cell to its forward-fill source across all users at once (grid
    days never precede the user's first observed day, so the probe cannot
    escape its user's segment).  Output size is the sum of user spans —
    the dense grid a charting/feature layer needs, produced distributed,
    never on the driver.  Pack widths assert loudly (user < 2^43,
    epoch-day < 2^20) per the repo's guard convention."""
    import numpy as np

    from ._util import absorb_empty_blocks, combine_by_key

    ds = ray.data.read_parquet(
        _pq(sf_dir, "events"), columns=["user_id", "ts", "value"]
    )

    _PART = pa.schema(
        [("ushard", pa.int32()), ("key", pa.int64()), ("vc", pa.int64())]
    )
    _DAY_US = 86400 * 10**6

    def partial(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = ts // _DAY_US
        vc = np.floor(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        if len(u):
            assert u.max() < (1 << 43) and u.min() >= 0, "user_id exceeds pack width"
            assert day.max() < (1 << _GAP_DAY_BITS) and day.min() >= 0, (
                "epoch-day exceeds pack width"
            )
        packed = (u << _GAP_DAY_BITS) | day
        k, s = combine_by_key(packed, vc)
        return pa.table(
            {
                "ushard": pa.array(
                    ((((k >> _GAP_DAY_BITS) * 2654435761) % (1 << 32)) % n_shards
                     ).astype(np.int32)
                ),
                "key": pa.array(k, pa.int64()),
                "vc": pa.array(s, pa.int64()),
            },
            schema=_PART,
        )

    def shard_fill(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _GAP_OUT.empty_table()
        k, vc = combine_by_key(
            g.column("key").to_numpy(zero_copy_only=False),
            g.column("vc").to_numpy(zero_copy_only=False),
        )
        user = k >> _GAP_DAY_BITS
        day = k & ((1 << _GAP_DAY_BITS) - 1)
        new = np.ones(len(user), dtype=bool)
        new[1:] = user[1:] != user[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(user))
        lo, hi = day[starts], day[ends - 1]
        span = hi - lo + 1
        total = int(span.sum())
        out_starts = np.concatenate(([0], np.cumsum(span)[:-1]))
        grid_day = (
            np.arange(total, dtype=np.int64)
            - np.repeat(out_starts, span)
            + np.repeat(lo, span)
        )
        grid_user = np.repeat(user[starts], span)
        grid_key = (grid_user << _GAP_DAY_BITS) | grid_day
        src = np.searchsorted(k, grid_key, side="right") - 1
        return pa.table(
            {
                "user_id": pa.array(grid_user, pa.int64()),
                "day_i": pa.array(grid_day, pa.int64()),
                "value_c": pa.array(vc[src], pa.int64()),
                "observed": pa.array(
                    (k[src] == grid_key).astype(np.int64), pa.int64()
                ),
            },
            schema=_GAP_OUT,
        )

    return (
        absorb_empty_blocks(
            ds.map_batches(partial, batch_format="pyarrow"), batch_size=131072
        )
        .groupby("ushard")
        .map_groups(
            lambda g: shard_fill(_dropg(g, ["ushard"])), batch_format="pyarrow"
        )
    )


_SCD2_OUT = pa.schema(
    [
        ("user_id", pa.int64()),
        ("band", pa.int32()),
        ("valid_from", pa.int64()),
        ("valid_to", pa.int64()),
        ("n_days", pa.int64()),
    ]
)


def scd2_user_bands(sf_dir: str, n_shards: int = 64) -> ray.data.Dataset:
    """SCD Type-2 dimension build: a user's daily cents total maps to a
    value band (``config.SCD2_BAND_EDGES_C``); consecutive observed days in
    the same band collapse into ONE validity version row
    ``(user_id, band, valid_from, valid_to, n_days)`` — ``valid_to`` is the
    next version's ``valid_from`` (NULL on the current version), the
    data-warehouse versioned-dimension contract.

    Scale shape: identical to :func:`user_gap_fill`'s — per-batch
    ``(user << 20 | day, cents)`` partials pre-combine raw events before
    the one user-shard shuffle; the shard kernel is a vectorized run
    detection over the globally sorted packed key (band-change OR
    user-change starts a version), so per-shard work is O(cells log cells)
    with no per-user Python.  Pack widths guarded as in user_gap_fill."""
    from ._util import absorb_empty_blocks, combine_by_key

    from ..config import SCD2_BAND_EDGES_C

    edges = np.asarray(SCD2_BAND_EDGES_C, dtype=np.int64)

    ds = ray.data.read_parquet(
        _pq(sf_dir, "events"), columns=["user_id", "ts", "value"]
    )

    _PART = pa.schema(
        [("ushard", pa.int32()), ("key", pa.int64()), ("vc", pa.int64())]
    )
    _DAY_US = 86400 * 10**6

    def partial(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = ts // _DAY_US
        vc = np.floor(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        if len(u):
            assert u.max() < (1 << 43) and u.min() >= 0, "user_id exceeds pack width"
            assert day.max() < (1 << _GAP_DAY_BITS) and day.min() >= 0, (
                "epoch-day exceeds pack width"
            )
        packed = (u << _GAP_DAY_BITS) | day
        k, s = combine_by_key(packed, vc)
        return pa.table(
            {
                "ushard": pa.array(
                    ((((k >> _GAP_DAY_BITS) * 2654435761) % (1 << 32)) % n_shards
                     ).astype(np.int32)
                ),
                "key": pa.array(k, pa.int64()),
                "vc": pa.array(s, pa.int64()),
            },
            schema=_PART,
        )

    def shard_scd2(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _SCD2_OUT.empty_table()
        k, vc = combine_by_key(
            g.column("key").to_numpy(zero_copy_only=False),
            g.column("vc").to_numpy(zero_copy_only=False),
        )
        user = k >> _GAP_DAY_BITS
        day = k & ((1 << _GAP_DAY_BITS) - 1)
        band = np.digitize(vc, edges).astype(np.int32)
        new_ver = np.ones(len(user), dtype=bool)
        new_ver[1:] = (user[1:] != user[:-1]) | (band[1:] != band[:-1])
        starts = np.flatnonzero(new_ver)
        vu = user[starts]
        vfrom = day[starts]
        n_days = np.append(starts[1:], len(user)) - starts
        same_next = np.zeros(len(starts), dtype=bool)
        same_next[:-1] = vu[1:] == vu[:-1]
        vto = np.zeros(len(starts), dtype=np.int64)
        vto[:-1] = vfrom[1:]
        return pa.table(
            {
                "user_id": pa.array(vu, pa.int64()),
                "band": pa.array(band[starts], pa.int32()),
                "valid_from": pa.array(vfrom, pa.int64()),
                "valid_to": pa.array(vto, pa.int64(), mask=~same_next),
                "n_days": pa.array(n_days, pa.int64()),
            },
            schema=_SCD2_OUT,
        )

    return (
        absorb_empty_blocks(
            ds.map_batches(partial, batch_format="pyarrow"), batch_size=131072
        )
        .groupby("ushard")
        .map_groups(
            lambda g: shard_scd2(_dropg(g, ["ushard"])), batch_format="pyarrow"
        )
    )


_ROLLMED_OUT = pa.schema(
    [
        ("event_id", pa.int64()),
        ("user_id", pa.int64()),
        ("med2_c", pa.int64()),
    ]
)


def rolling_median_value(sf_dir: str, n_shards: int = 64) -> ray.data.Dataset:
    """Per-user rolling EXACT median: for every event, the median of the
    user's last ``config.ROLLMED_WINDOW`` values (cents) in (ts, event_id)
    order — the order-statistic moving frame, the one ROWS-window shape a
    running-sum kernel cannot express (median is not mergeable; the frame
    must be re-ranked at every row).  Output is 2x the median
    (``med2_c``), so the even-width prefix frames (frame grows 1..W at a
    user's start) stay exact integers on both engines.

    Scale shape: the expanding-window family's user-shard groupby (slim
    (user, ts, event_id, cents) rows; one lexsort per shard), then ONE
    vectorized pass per frame width L in 1..W: rows whose frame has
    exactly L values gather their L-column window matrix with index
    arithmetic and take the two middle order statistics via one
    ``np.sort(axis=1)`` — W small-constant passes, no per-row Python.
    Frames never cross user boundaries (the frame start is clamped to the
    user's segment start)."""
    import pyarrow.compute as pc

    from ..config import ROLLMED_WINDOW

    ds = ray.data.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "ts", "user_id", "value"]
    )

    def add_shard(t: pa.Table) -> pa.Table:
        cents = pa.array(
            np.floor(
                t.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
        )
        shard = pc.cast(pc.bit_wise_and(t.column("user_id"), n_shards - 1), pa.int32())
        return pa.table(
            {
                "shard": shard,
                "user_id": t.column("user_id").cast(pa.int64()),
                "us": t.column("ts").cast(pa.int64()),
                "event_id": t.column("event_id").cast(pa.int64()),
                "cents": cents,
            }
        )

    def per_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _ROLLMED_OUT.empty_table()
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        us = g.column("us").to_numpy(zero_copy_only=False)
        ev = g.column("event_id").to_numpy(zero_copy_only=False)
        c = g.column("cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((ev, us, u))
        u, ev, c = u[order], ev[order], c[order]
        n = len(u)
        new = np.ones(n, dtype=bool)
        new[1:] = u[1:] != u[:-1]
        seg_start = np.flatnonzero(new)[np.cumsum(new) - 1]
        pos = np.arange(n)
        width = np.minimum(pos - seg_start + 1, ROLLMED_WINDOW)
        med2 = np.empty(n, dtype=np.int64)
        for L in range(1, ROLLMED_WINDOW + 1):
            rows = np.flatnonzero(width == L)
            if not len(rows):
                continue
            # (m, L) window matrix: columns are the frame's last L values
            win = c[rows[:, None] - (L - 1) + np.arange(L)[None, :]]
            win.sort(axis=1)
            med2[rows] = win[:, (L - 1) // 2] + win[:, L // 2]
        return pa.table(
            {
                "event_id": pa.array(ev, pa.int64()),
                "user_id": pa.array(u, pa.int64()),
                "med2_c": pa.array(med2, pa.int64()),
            },
            schema=_ROLLMED_OUT,
        )

    return (
        ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: per_shard(_dropg(g, ["shard"])), batch_format="pyarrow"
        )
    )


def user_bands_asof(sf_dir: str, n_shards: int = 64) -> ray.data.Dataset:
    """Bitemporal point-in-time lookup against the SCD2 dimension: each
    user's band version valid AS OF ``config.SCD2_ASOF_DAY``
    (``valid_from <= d < valid_to``, open versions unbounded) — the query
    half of the versioned-dimension contract :func:`scd2_user_bands`
    builds.  Users whose first observed day is after d correctly drop out.

    Scale shape: the filter is pushed into the SCD2 build's own shard
    kernel output (a vectorized mask per shard — the dimension never
    re-shuffles), so the as-of read costs one streaming pass over version
    rows."""
    import pyarrow.compute as pc

    from ..config import SCD2_ASOF_DAY

    d = SCD2_ASOF_DAY

    def pick(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        lo_ok = pc.less_equal(t.column("valid_from"), d)
        hi_ok = pc.or_kleene(
            pc.is_null(t.column("valid_to")), pc.greater(t.column("valid_to"), d)
        )
        return t.filter(pc.and_(lo_ok, pc.fill_null(hi_ok, False)))

    return scd2_user_bands(sf_dir, n_shards=n_shards).map_batches(
        pick, batch_format="pyarrow"
    )
