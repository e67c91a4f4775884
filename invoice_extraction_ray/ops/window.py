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

    def per_shard(g):
        """One pd.merge_asof per shard — vectorized backward as-of across all
        keys of the shard at once (``by=key``); no per-key Python loop."""
        import pandas as pd

        lm = g["side"].to_numpy() == 0
        l = pd.DataFrame(
            {
                key: g[key].to_numpy()[lm],
                ts: g[ts].to_numpy()[lm],
                "left_id": g["id"].to_numpy()[lm],
            }
        ).sort_values(ts, kind="mergesort")
        r = pd.DataFrame(
            {
                key: g[key].to_numpy()[~lm],
                ts: g[ts].to_numpy()[~lm],
                # nullable Int64 so missing matches stay true nulls
                "right_id": pd.array(g["id"].to_numpy()[~lm], dtype="Int64"),
                "right_ts": g[ts].to_numpy()[~lm],
            }
        ).sort_values(ts, kind="mergesort")
        m = pd.merge_asof(l, r, on=ts, by=key, direction="backward")
        return pd.DataFrame(
            {
                key: m[key],
                "left_id": m["left_id"].astype("int64"),
                "left_ts": m[ts],
                "right_id": m["right_id"].astype("Int64"),
                "right_ts": m["right_ts"],
            }
        )

    return (
        both.map_batches(lambda t: _add_shard(t, key), batch_format="pyarrow")
        .groupby("shard")
        .map_groups(per_shard, batch_format="pandas")
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
    minutes.  Each event fans out to window_min/slide_min = 4 window rows
    inside map_batches (no per-event python), then one small groupby."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    k = WINDOW_MIN // SLIDE_MIN
    slide_us = SLIDE_MIN * 60 * 1_000_000

    def explode(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        etype = t.column("event_type").to_pylist()
        value = t.column("value").to_numpy(zero_copy_only=False)
        # window starts are slide-aligned; an event at time x belongs to the
        # k windows starting at floor(x/slide)*slide - i*slide, i in [0, k)
        base = (ts_us // slide_us) * slide_us
        starts = base[:, None] - np.arange(k, dtype=np.int64)[None, :] * slide_us
        n = len(ts_us)
        idx = np.repeat(np.arange(n), k)
        v100 = np.floor(value * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "window_start": pa.array(starts.reshape(-1)).cast(
                    pa.timestamp("us")
                ),
                "event_type": pa.array([etype[i] for i in idx], pa.string()),
                "value_c": pa.array(v100[idx]),
            }
        )

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["ts", "event_type", "value"])
    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["window_start", "event_type"])
        .aggregate(Count(alias_name="n"), Sum("value_c", alias_name="sum_value_c"))
    )
