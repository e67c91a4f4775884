"""Interval/overlap join (SURVEY.md §2.4 J6 — the reference's designed
OCR-bbox x YOLO-region spatial fusion, reference README.md:171-176, mapped to
1-D intervals).

Distributed plan: both sides are reduced to tiny (key, id, start, end) rows,
co-partitioned by key with ONE groupby (sketch rows only — payloads never
shuffle), and each group runs a sort-sweep that emits overlapping id pairs.
Payload columns are joined back afterwards by id if needed.  The row-local
variant of the same predicate powers the classifier's span-vs-region
attachment (stages/classify.py consensus merge).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data


def _sweep(t: pa.Table) -> pa.Table:
    """Sort-sweep one key group: emit (key, a_id, b_id, ov_start, ov_end) for
    every left x right pair with start < other.end (half-open overlap)."""
    rows = sorted(
        zip(
            t.column("side").to_pylist(),
            t.column("id").to_pylist(),
            t.column("start").to_pylist(),
            t.column("end").to_pylist(),
        ),
        key=lambda r: (r[2], r[3], r[0], r[1]),
    )
    key = t.column("key")[0].as_py() if t.num_rows else None
    active_l: list[tuple] = []
    active_r: list[tuple] = []
    out_a, out_b, out_s, out_e = [], [], [], []
    for side, rid, s, e in rows:
        others = active_r if side == 0 else active_l
        mine = active_l if side == 0 else active_r
        others[:] = [o for o in others if o[2] > s]  # drop non-overlapping
        for oid, os_, oe in others:
            a, b = (rid, oid) if side == 0 else (oid, rid)
            out_a.append(a)
            out_b.append(b)
            out_s.append(max(s, os_))
            out_e.append(min(e, oe))
        mine.append((rid, s, e))
    n = len(out_a)
    return pa.table(
        {
            "key": pa.array([key] * n, t.column("key").type),
            "a_id": pa.array(out_a, pa.int64()),
            "b_id": pa.array(out_b, pa.int64()),
            "ov_start": pa.array(out_s, pa.float64()),
            "ov_end": pa.array(out_e, pa.float64()),
        }
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
            return t.append_column(
                "side", pa.array([side] * t.num_rows, pa.int32())
            )

        return fn

    both = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow")
    )
    return both.groupby("key").map_groups(_sweep, batch_format="pyarrow")


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
