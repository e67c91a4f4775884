"""Interval/overlap join (SURVEY.md §2.4 J6 — the reference's designed
OCR-bbox x YOLO-region spatial fusion, reference README.md:171-176, mapped to
1-D intervals).

Distributed plan: both sides are reduced to tiny (key, id, start, end) rows,
co-partitioned by a 64-way SHARD of the key with ONE groupby (sketch rows
only — payloads never shuffle; sharding keeps map_groups dispatch O(shards),
not O(keys)), and each shard runs a fully vectorized sort + searchsorted
sweep that emits overlapping id pairs.  Payload columns are joined back
afterwards by id if needed.  The row-local variant of the same predicate
powers the classifier's span-vs-region attachment (stages/classify.py
consensus merge).

Partitioning assumption: per-key interval counts are bounded
(the vectorized candidate expansion enumerates, per left interval, the rights
of the same key whose start precedes its end, then masks on the end bound).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import ray.data

KEY_SHARDS = 64


def _shard_of(arr) -> pa.Array:
    """Consistent KEY_SHARDS-way shard of a key column of any type: integer
    keys use a bitmask; other types crc32 their distinct values (vectorized
    gather over a per-batch dictionary encoding)."""
    import pyarrow.compute as pc

    if pa.types.is_integer(arr.type):
        return pc.cast(pc.bit_wise_and(arr, KEY_SHARDS - 1), pa.int32())
    d = pc.dictionary_encode(arr).combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr.dictionary_encode()
    shard_of_val = np.array(
        [zlib.crc32(str(v).encode()) & (KEY_SHARDS - 1) for v in d.dictionary.to_pylist()],
        dtype=np.int32,
    )
    idx = d.indices.to_numpy(zero_copy_only=False)
    return pa.array(shard_of_val[idx], pa.int32())

_OUT_FIELDS = [
    ("a_id", pa.int64()),
    ("b_id", pa.int64()),
    ("ov_start", pa.float64()),
    ("ov_end", pa.float64()),
]


def _sweep_shard(t: pa.Table) -> pa.Table:
    """Vectorized overlap sweep over ONE shard (many keys).

    Rights are sorted by (key-rank, start); each left's matching rights are
    the segment prefix with ``r.start < l.end`` — key-segment bounds via
    exact integer searchsorted on the rank, start bound via a vectorized
    log-n bisection on the raw floats (a composite rank*span+offset
    position loses sub-ulp start/end distinctions) — expanded with a
    repeat/arange gather and masked on ``r.end > l.start``.  No per-row or
    per-key Python.
    """
    key_type = t.schema.field("key").type
    schema = pa.schema([("key", key_type)] + _OUT_FIELDS)
    if t.num_rows == 0:
        return schema.empty_table()
    key = t.column("key").to_numpy(zero_copy_only=False)
    sid = t.column("side").to_numpy(zero_copy_only=False)
    iid = t.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
    s = t.column("start").to_numpy(zero_copy_only=False).astype(np.float64)
    e = t.column("end").to_numpy(zero_copy_only=False).astype(np.float64)

    lm = sid == 0
    lk, li, ls, le = key[lm], iid[lm], s[lm], e[lm]
    rk, ri, rs, re_ = key[~lm], iid[~lm], s[~lm], e[~lm]
    if not len(lk) or not len(rk):
        return schema.empty_table()

    # dense key ranks; rights sorted by (rank, start)
    ku = np.unique(np.concatenate([lk, rk]))
    lkr = np.searchsorted(ku, lk)
    rkr = np.searchsorted(ku, rk)
    ro = np.lexsort((ri, rs, rkr))
    rkr, ri, rs, re_ = rkr[ro], ri[ro], rs[ro], re_[ro]

    # rights of my key with r.start < l.end: [kbeg, hi).  The key segment
    # bounds come from EXACT integer searchsorted on the rank; the start
    # bound from a vectorized bisection on the RAW floats — a composite
    # rank*span + offset position would absorb sub-ulp start/end
    # differences (measured: a 1.4e-14 overlap sliver vanished once shifted
    # by rank*span ~ 1e5, dropping true pairs).
    kbeg = np.searchsorted(rkr, lkr, side="left")
    kend = np.searchsorted(rkr, lkr, side="right")
    lo_b, hi_b = kbeg.copy(), kend.copy()
    guard = max(len(rs) - 1, 0)
    while True:
        act = lo_b < hi_b
        if not act.any():
            break
        mid = (lo_b + hi_b) // 2
        go_right = rs[np.minimum(mid, guard)] < le  # first rs >= le is right of mid
        lo_b = np.where(act & go_right, mid + 1, lo_b)
        hi_b = np.where(act & ~go_right, mid, hi_b)
    hi = lo_b

    counts = hi - kbeg
    total = int(counts.sum())
    if total == 0:
        return schema.empty_table()
    lidx = np.repeat(np.arange(len(lk)), counts)
    offs = np.zeros(len(lk), dtype=np.int64)
    offs[1:] = np.cumsum(counts)[:-1]
    ridx = kbeg[lidx] + (np.arange(total) - offs[lidx])
    mask = re_[ridx] > ls[lidx]  # the end-side overlap bound
    lidx, ridx = lidx[mask], ridx[mask]

    return pa.table(
        {
            "key": pa.array(lk[lidx]).cast(key_type),
            "a_id": pa.array(li[lidx], pa.int64()),
            "b_id": pa.array(ri[ridx], pa.int64()),
            "ov_start": pa.array(np.maximum(ls[lidx], rs[ridx]), pa.float64()),
            "ov_end": pa.array(np.minimum(le[lidx], re_[ridx]), pa.float64()),
        },
        schema=schema,
    )


def interval_join(
    left: ray.data.Dataset, right: ray.data.Dataset
) -> ray.data.Dataset:
    """Overlap-join two interval datasets with columns (key, id, start, end).

    Returns (key, a_id, b_id, ov_start, ov_end) for pairs where
    ``a.start < b.end AND b.start < a.end`` within the same key.
    """
    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            t = t.append_column("side", pa.array([side] * t.num_rows, pa.int32()))
            return t.append_column("shard", _shard_of(t.column("key")))

        return fn

    both = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow")
    )
    return both.groupby("shard").map_groups(_sweep_shard, batch_format="pyarrow")


def event_interval_overlaps(sf_dir: str) -> ray.data.Dataset:
    """Driver-testdata instantiation: per user, an event covers the value
    band [value, value+25); error events (left side) are joined to purchase
    events (right side) whose bands overlap."""
    import pyarrow.compute as pc

    def to_intervals(event_type: str):
        def fn(t: pa.Table) -> pa.Table:
            m = pc.equal(t.column("event_type"), event_type)
            t = t.filter(m)
            start = pc.cast(t.column("value"), pa.float64())
            return pa.table(
                {
                    "key": t.column("user_id"),
                    "id": t.column("event_id"),
                    "start": start,
                    "end": pc.add(start, 25.0),
                }
            )

        return fn

    cols = ["user_id", "event_id", "event_type", "value"]
    base = f"{sf_dir}/events.parquet"
    left = ray.data.read_parquet(base, columns=cols).map_batches(
        to_intervals("error"), batch_format="pyarrow"
    )
    right = ray.data.read_parquet(base, columns=cols).map_batches(
        to_intervals("purchase"), batch_format="pyarrow"
    )
    joined = interval_join(left, right)

    def to_fixed(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        return pa.table(
            {
                "key": t.column("key"),
                "a_id": t.column("a_id"),
                "b_id": t.column("b_id"),
                "ov_start_e4": pc2.cast(
                    pc2.round(
                        pc2.multiply(t.column("ov_start"), 10_000.0),
                        ndigits=0,
                        round_mode="half_towards_infinity",
                    ),
                    pa.int64(),
                ),
            }
        )

    return joined.map_batches(to_fixed, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Interval UNION / coverage (the merge-overlaps sibling of interval_join):
# activity-span consolidation, the classic sessionization-by-interval shape.

_SPAN_SLIM = pa.schema(
    [
        ("ushard", pa.int32()),
        ("user", pa.int64()),
        ("s", pa.int64()),
        ("e", pa.int64()),
    ]
)
_SPAN_OUT = pa.schema(
    [
        ("user_id", pa.int64()),
        ("n_spans", pa.int64()),
        ("covered_sec", pa.int64()),
        ("max_span_sec", pa.int64()),
    ]
)


def _merge_user_spans(user, s, e):
    """Merge overlapping-OR-touching ``[s, e)`` int64 intervals per user.

    Fully vectorized: one lexsort by (user, s, e), then a single global
    ``np.maximum.accumulate`` computes the per-user running max end via the
    rank-offset trick (each user's keys live in a disjoint ``rank * width``
    band, so the global prefix max never leaks across users).  A new span
    starts where ``s > running_max_end`` of the same user's prefix; the
    running max at a span's last row equals the span's max end (every
    earlier span's max end is < this span's first start).  Returns
    ``(user, start, end)`` per merged span, sorted by (user, start).

    The offset pack is guarded loudly (repo convention): it needs
    ``n_users_in_shard * time_width_sec < 2^62``."""
    if len(user) == 0:
        return user, s, e
    order = np.lexsort((e, s, user))
    u, ss, ee = user[order], s[order], e[order]
    new_user = np.ones(len(u), dtype=bool)
    new_user[1:] = u[1:] != u[:-1]
    rank = np.cumsum(new_user) - 1
    base = int(ss.min())
    width = int(ee.max()) - base + 1
    n_ranks = int(rank[-1]) + 1
    if n_ranks * width >= (1 << 62):
        raise ValueError(
            "user_active_spans: rank-offset pack exceeds int64 "
            f"(users_in_shard={n_ranks}, time_width_sec={width}) — "
            "raise n_shards"
        )
    keyed = (ee - base) + rank * width
    rm = np.maximum.accumulate(keyed) - rank * width + base
    new_span = new_user.copy()
    new_span[1:] |= ss[1:] > rm[:-1]
    starts = np.flatnonzero(new_span)
    last = np.append(starts[1:], len(u)) - 1
    return u[starts], ss[starts], rm[last]


def user_active_spans(sf_dir: str, n_shards: int = 64) -> ray.data.Dataset:
    """Per-user activity-span coverage: each event opens an interval
    ``[ts, ts + gap)`` whose length depends on the event type
    (``config.SPAN_GAP_BY_TYPE`` / ``SPAN_GAP_DEFAULT``);
    overlapping-or-touching intervals of one user merge, and the output is
    one row per user: span count, total covered seconds, longest span.
    (Interval UNION — the coverage complement of :func:`interval_join`'s
    overlap JOIN; reference parity: the bbox-region consolidation step of
    the OCR fusion, reference utils/extractor.py region grouping, mapped
    to 1-D time.)

    Scale shape: interval union is associative, so each input batch
    pre-merges its own intervals with the same vectorized kernel before
    anything shuffles — only merged (user, start, end) span rows ride the
    ONE user-shard groupby, where the shard re-merges and aggregates.
    Texts/payloads never move; per-shard work is O(rows log rows) numpy."""
    import pyarrow.compute as pc

    from ..config import SPAN_GAP_BY_TYPE, SPAN_GAP_DEFAULT
    from ._util import absorb_empty_blocks, int_segment_sum

    def _pq(name: str) -> str:
        return f"{sf_dir}/{name}.parquet"

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _SPAN_SLIM.empty_table()
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        s = ts // 10**6
        et = t.column("event_type")
        d = (
            et.combine_chunks().dictionary_encode()
            if isinstance(et, pa.ChunkedArray)
            else et.dictionary_encode()
        )
        gap_of = np.array(
            [
                SPAN_GAP_BY_TYPE.get(v, SPAN_GAP_DEFAULT)
                for v in d.dictionary.to_pylist()
            ],
            dtype=np.int64,
        )
        e = s + gap_of[d.indices.to_numpy(zero_copy_only=False)]
        mu, ms, me = _merge_user_spans(u, s, e)
        return pa.table(
            {
                "ushard": pa.array(
                    (((mu * 2654435761) % (1 << 32)) % n_shards).astype(np.int32)
                ),
                "user": pa.array(mu, pa.int64()),
                "s": pa.array(ms, pa.int64()),
                "e": pa.array(me, pa.int64()),
            },
            schema=_SPAN_SLIM,
        )

    def finish(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _SPAN_OUT.empty_table()
        mu, ms, me = _merge_user_spans(
            g.column("user").to_numpy(zero_copy_only=False),
            g.column("s").to_numpy(zero_copy_only=False),
            g.column("e").to_numpy(zero_copy_only=False),
        )
        new_user = np.ones(len(mu), dtype=bool)
        new_user[1:] = mu[1:] != mu[:-1]
        starts = np.flatnonzero(new_user)
        lengths = me - ms
        return pa.table(
            {
                "user_id": pa.array(mu[starts], pa.int64()),
                "n_spans": pa.array(
                    np.append(starts[1:], len(mu)) - starts, pa.int64()
                ),
                "covered_sec": pa.array(
                    int_segment_sum(lengths, starts), pa.int64()
                ),
                "max_span_sec": pa.array(
                    np.maximum.reduceat(lengths, starts), pa.int64()
                ),
            },
            schema=_SPAN_OUT,
        )

    from ._util import drop_if_present as _dropg2

    ds = ray.data.read_parquet(
        _pq("events"), columns=["user_id", "ts", "event_type"]
    ).map_batches(slim, batch_format="pyarrow")
    return absorb_empty_blocks(ds, batch_size=131072).groupby("ushard").map_groups(
        lambda g: finish(_dropg2(g, ["ushard"])), batch_format="pyarrow"
    )
