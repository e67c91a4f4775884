"""Aggregation/analytics pipelines over the extraction output table.

Ray Data counterparts of the reference's batch scoreboard and error-analysis
passes (SURVEY.md §2.5: A1 field-coverage summary, A2/A3 error category +
severity rollups, A4 confidence-bin table, A5/A8 top-k worst rows).  All of
them consume the extraction output Dataset (FIXTURES.md F3 schema) and produce
small Arrow tables — partial aggregation inside map_batches, tiny final
groupby/combine.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Mean, Sum

from .. import config as C

FIELD_NAMES = ["entity", "code", "power", "amount", "region_a", "region_b"]


def _field_flags(t: pa.Table) -> dict[str, pa.Array]:
    """Per-field non-null / present boolean arrays from the fields struct."""
    fields = t.column("fields").combine_chunks()
    flags = {}
    for name in ("entity", "code", "power", "amount"):
        flags[name] = pc.is_valid(fields.field(name))
    for name in ("region_a", "region_b"):
        flags[name] = pc.fill_null(fields.field(name).field("present"), False)
    return flags


def field_coverage(out_ds: ray.data.Dataset) -> pa.Table:
    """A1: per-field filled counts + coverage pct + overall mean confidence
    (reference executable.py:155-181)."""

    def partial(t: pa.Table) -> pa.Table:
        flags = _field_flags(t)
        row = {"total": [t.num_rows]}
        for name in FIELD_NAMES:
            row[f"n_{name}"] = [pc.sum(pc.cast(flags[name], pa.int64())).as_py() or 0]
        row["sum_conf"] = [
            pc.sum(pc.cast(t.column("confidence"), pa.float64())).as_py() or 0.0
        ]
        return pa.Table.from_pydict(row)

    parts = out_ds.map_batches(partial, batch_format="pyarrow").take_all()
    total = sum(p["total"] for p in parts)
    rows = {"field": [], "n_filled": [], "total": [], "pct": []}
    for name in FIELD_NAMES:
        n = sum(p[f"n_{name}"] for p in parts)
        rows["field"].append(name)
        rows["n_filled"].append(n)
        rows["total"].append(total)
        rows["pct"].append(round(100.0 * n / total, 4) if total else 0.0)
    tbl = pa.Table.from_pydict(rows)
    mean_conf = (
        round(sum(p["sum_conf"] for p in parts) / total, 4) if total else None
    )
    return tbl.append_column(
        "mean_confidence", pa.array([mean_conf] * len(FIELD_NAMES), pa.float64())
    )


# --- E15 analogue: rule-based error categorization (deterministic — the
#     reference's np.random branch at error_analysis.py:94-98 is dropped) ---

LOW_CONFIDENCE_THRESHOLD = 0.5

SEVERITY_OF = {
    "missing_entity": "high",
    "missing_code": "high",
    "missing_power": "medium",
    "missing_amount": "medium",
    "no_region_a": "low",
    "low_confidence": "high",
    "partial_extraction": "medium",
    "empty_turn": "low",
}


def categorize_batch(t: pa.Table) -> pa.Table:
    """Explode each output row into zero-or-more (conv_id, turn_idx, category)
    rows — the flat_map step of A2."""
    flags = _field_flags(t)
    conf = t.column("confidence").to_pylist()
    ext = pc.equal(pc.utf8_length(t.column("extracted_text")), 0).to_pylist()
    conv = t.column("conv_id").to_pylist()
    turn = t.column("turn_idx").to_pylist()
    f = {k: v.to_pylist() for k, v in flags.items()}

    out_conv, out_turn, out_cat = [], [], []

    def emit(i, cat):
        out_conv.append(conv[i])
        out_turn.append(turn[i])
        out_cat.append(cat)

    for i in range(t.num_rows):
        missing = 0
        for name, cat in (
            ("entity", "missing_entity"),
            ("code", "missing_code"),
            ("power", "missing_power"),
            ("amount", "missing_amount"),
        ):
            if not f[name][i]:
                emit(i, cat)
                missing += 1
        if not f["region_a"][i]:
            emit(i, "no_region_a")
        if conf[i] < LOW_CONFIDENCE_THRESHOLD:
            emit(i, "low_confidence")
        if 1 <= missing <= 3:
            emit(i, "partial_extraction")
        if ext[i]:
            emit(i, "empty_turn")
    return pa.table(
        {
            "conv_id": pa.array(out_conv, pa.string()),
            "turn_idx": pa.array(out_turn, pa.int32()),
            "category": pa.array(out_cat, pa.string()),
        }
    )


def error_categories(out_ds: ray.data.Dataset) -> ray.data.Dataset:
    """A2: grouped counts of error categories."""
    return (
        out_ds.map_batches(categorize_batch, batch_format="pyarrow")
        .groupby("category")
        .aggregate(Count(alias_name="n"))
    )


def severity_rollup(out_ds: ray.data.Dataset) -> ray.data.Dataset:
    """A3: category -> severity dimension lookup + rollup."""

    def add_sev(t: pa.Table) -> pa.Table:
        sev = pa.array(
            [SEVERITY_OF[c] for c in t.column("category").to_pylist()], pa.string()
        )
        return t.append_column("severity", sev)

    return (
        out_ds.map_batches(categorize_batch, batch_format="pyarrow")
        .map_batches(add_sev, batch_format="pyarrow")
        .groupby("severity")
        .aggregate(Count(alias_name="n"))
    )


CONF_BIN_EDGES = [0.25, 0.5, 0.75]


def confidence_bins(out_ds: ray.data.Dataset) -> ray.data.Dataset:
    """A4: confidence-bucket table (reference error_analysis.py:288-335)."""

    def add_bin(t: pa.Table) -> pa.Table:
        v = t.column("confidence")
        b = pc.case_when(
            pc.make_struct(
                pc.less(v, CONF_BIN_EDGES[0]),
                pc.less(v, CONF_BIN_EDGES[1]),
                pc.less(v, CONF_BIN_EDGES[2]),
            ),
            "q1_lt25",
            "q2_lt50",
            "q3_lt75",
            "q4_ge75",
        )
        return pa.table({"bin": b})

    return (
        out_ds.map_batches(add_bin, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Count(alias_name="n"))
    )


def worst_turns(out_ds: ray.data.Dataset, k: int = 10) -> ray.data.Dataset:
    """A5/A8: top-k lowest-confidence rows with deterministic tie-break."""
    slim = out_ds.select_columns(["conv_id", "turn_idx", "confidence", "notes"])
    return slim.sort(
        ["confidence", "conv_id", "turn_idx"], descending=[False, False, False]
    ).limit(k)


def conversation_stats(source) -> ray.data.Dataset:
    """Per-conversation rollup over the INPUT transcript table: turn count,
    role mix, wall-clock duration from the ts column (carried as payload per
    SURVEY §2.9; this is its aggregate consumer).  Partial-aggregates inside
    map_batches before the small groupby — the combiner pattern."""
    from ..pipelines.extract import to_dataset

    ds = to_dataset(source) if not isinstance(source, ray.data.Dataset) else source

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        g = (
            t.select(["conv_id", "turn_idx", "role", "ts"])
            .group_by("conv_id")
            .aggregate(
                [
                    ("turn_idx", "count"),
                    ("ts", "min"),
                    ("ts", "max"),
                ]
            )
        )
        tool_mask = pc2.equal(t.column("role"), "tool")
        tools = (
            t.append_column("is_tool", pc2.cast(tool_mask, pa.int64()))
            .select(["conv_id", "is_tool"])
            .group_by("conv_id")
            .aggregate([("is_tool", "sum")])
        )
        g = g.join(tools, keys="conv_id")
        return pa.table(
            {
                "conv_id": g.column("conv_id"),
                "n": pc2.cast(g.column("turn_idx_count"), pa.int64()),
                "ts_min": g.column("ts_min"),
                "ts_max": g.column("ts_max"),
                "n_tool": pc2.cast(g.column("is_tool_sum"), pa.int64()),
            }
        )

    from ray.data.aggregate import Max, Min

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("conv_id")
        .aggregate(
            Sum("n", alias_name="n_turns"),
            Min("ts_min", alias_name="first_ts"),
            Max("ts_max", alias_name="last_ts"),
            Sum("n_tool", alias_name="n_tool_turns"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        sub = pc2.subtract(t.column("last_ts"), t.column("first_ts"))
        # the aggregate may emit any timestamp unit — scale by the actual one
        factor = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}[
            sub.type.unit
        ]
        dur = pc2.cast(pc2.divide(pc2.cast(sub, pa.int64()), factor), pa.int64())
        return t.append_column("duration_sec", dur)

    return agg.map_batches(finish, batch_format="pyarrow")


PSEUDO_LABEL_MIN_CONF = 0.85


def pseudo_labels(out_ds: ray.data.Dataset) -> ray.data.Dataset:
    """E18 analogue (reference consensus.py:196-222): high-confidence rows
    become training pseudo-labels — a filtered side-output dataset."""
    return out_ds.filter(
        expr=f"confidence >= {PSEUDO_LABEL_MIN_CONF}"
    ).select_columns(["conv_id", "turn_idx", "extracted_text", "confidence"])
