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
from ..ops._util import drop_if_present as _dropg

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
    (reference executable.py:155-181).

    Coverage pct and mean confidence are emitted as FIXED-POINT 1e-4
    integers derived from exact integer sums (per-row confidence is pct/100
    with integer pct, so sum_pct is partition-order-exact — a float
    confidence sum is not), making the values reproducible bit-for-bit by
    any engine."""
    import math

    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        flags = _field_flags(t)
        row = {"total": [t.num_rows]}
        for name in FIELD_NAMES:
            row[f"n_{name}"] = [pc.sum(pc.cast(flags[name], pa.int64())).as_py() or 0]
        conf = t.column("confidence").combine_chunks().to_numpy(zero_copy_only=False)
        row["sum_pct"] = [int(np.rint(conf * 100.0).astype(np.int64).sum())]
        return pa.Table.from_pydict(row)

    parts = out_ds.map_batches(partial, batch_format="pyarrow").take_all()
    total = sum(p["total"] for p in parts)
    sum_pct = sum(p["sum_pct"] for p in parts)
    mean_conf_e4 = int(math.floor(100.0 * sum_pct / total + 0.5)) if total else 0
    rows = {"field": [], "n_filled": [], "total": [], "pct_e4": []}
    for name in FIELD_NAMES:
        n = sum(p[f"n_{name}"] for p in parts)
        rows["field"].append(name)
        rows["n_filled"].append(n)
        rows["total"].append(total)
        rows["pct_e4"].append(
            int(math.floor(1_000_000.0 * n / total + 0.5)) if total else 0
        )
    tbl = pa.Table.from_pydict(rows)
    return tbl.append_column(
        "mean_conf_e4", pa.array([mean_conf_e4] * len(FIELD_NAMES), pa.int64())
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
    rows — the flat_map step of A2.  Vectorized: one boolean mask per
    category, rows gathered with take; downstream consumers (groupby counts,
    Counter partials) are row-order-insensitive."""
    import numpy as np

    flags = _field_flags(t)
    f = {
        k: pc.fill_null(v, False).to_numpy(zero_copy_only=False)
        for k, v in flags.items()
    }
    conf = (
        t.column("confidence").combine_chunks().to_numpy(zero_copy_only=False)
    )
    empty = pc.equal(
        pc.utf8_length(t.column("extracted_text")), 0
    ).to_numpy(zero_copy_only=False)
    missing = (~f["entity"]).astype(np.int64)
    for name in ("code", "power", "amount"):
        missing += ~f[name]

    cat_masks = [
        ("missing_entity", ~f["entity"]),
        ("missing_code", ~f["code"]),
        ("missing_power", ~f["power"]),
        ("missing_amount", ~f["amount"]),
        ("no_region_a", ~f["region_a"]),
        ("low_confidence", conf < LOW_CONFIDENCE_THRESHOLD),
        ("partial_extraction", (missing >= 1) & (missing <= 3)),
        ("empty_turn", empty),
    ]
    idx_parts = [np.flatnonzero(m) for _, m in cat_masks]
    idx = pa.array(np.concatenate(idx_parts), pa.int64())
    cats = pa.array(
        np.repeat(
            np.array([c for c, _ in cat_masks], dtype=object),
            [len(p) for p in idx_parts],
        ),
        pa.string(),
    )
    return pa.table(
        {
            "conv_id": pc.take(t.column("conv_id"), idx),
            "turn_idx": pc.take(t.column("turn_idx"), idx),
            "category": cats,
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


# --- A5 composed failure report + S9 metrics-JSON report sink (reference
#     error_analysis.py:202-286 failure summary and :153,211-283 report
#     writes).  ONE fused pass over the output dataset: every batch emits a
#     single partial row of integer counters (field coverage, category
#     counts, confidence bins, low-confidence stats), combined driver-side —
#     no per-metric re-execution of the pipeline, no driver materialization.
# ---------------------------------------------------------------------------

CATEGORIES = sorted(SEVERITY_OF)
_BIN_LABELS = ["q1_lt25", "q2_lt50", "q3_lt75", "q4_ge75"]
# every column the report partial touches — callers reading parquet back
# should project to this (drops the wide spans column)
REPORT_COLUMNS = ["conv_id", "turn_idx", "extracted_text", "fields", "confidence"]


def _report_partial(t: pa.Table) -> pa.Table:
    import collections

    import numpy as np

    flags = _field_flags(t)
    row: dict[str, list] = {"total": [t.num_rows]}
    for name in FIELD_NAMES:
        row[f"n_{name}"] = [pc.sum(pc.cast(flags[name], pa.int64())).as_py() or 0]
    # confidence is pct/100 with integer pct — sum integer pct so the combine
    # is exact under any partitioning
    conf = t.column("confidence").combine_chunks().to_numpy(zero_copy_only=False)
    pct = np.rint(conf * 100.0).astype(np.int64)
    row["sum_conf_pct"] = [int(pct.sum())]
    cats = collections.Counter(
        categorize_batch(t).column("category").to_pylist()
    )
    for cat in CATEGORIES:
        row[f"c_{cat}"] = [cats.get(cat, 0)]
    edges = np.array([int(e * 100) for e in CONF_BIN_EDGES])
    bins = np.searchsorted(edges, pct, side="right")
    counts = np.bincount(bins, minlength=4)
    for j, lbl in enumerate(_BIN_LABELS):
        row[f"b_{lbl}"] = [int(counts[j])]
    low = pct[pct < int(LOW_CONFIDENCE_THRESHOLD * 100)]
    row["n_low"] = [int(low.size)]
    row["sum_low_pct"] = [int(low.sum())]
    return pa.Table.from_pydict(row)


def run_report(out_ds: ray.data.Dataset) -> dict:
    """Compute the full per-run metrics report in one streaming pass."""
    parts = out_ds.map_batches(_report_partial, batch_format="pyarrow").take_all()

    def tot(col: str) -> int:
        return sum(p[col] for p in parts)

    total = tot("total")
    coverage = {
        name: {
            "n_filled": tot(f"n_{name}"),
            "pct": round(100.0 * tot(f"n_{name}") / total, 4) if total else 0.0,
        }
        for name in FIELD_NAMES
    }
    cats = {cat: tot(f"c_{cat}") for cat in CATEGORIES}
    severity: dict[str, int] = {}
    for cat, n in cats.items():
        severity[SEVERITY_OF[cat]] = severity.get(SEVERITY_OF[cat], 0) + n
    n_low = tot("n_low")
    return {
        "total_rows": total,
        "mean_confidence": round(tot("sum_conf_pct") / total / 100.0, 4) if total else None,
        "field_coverage": coverage,
        "error_categories": cats,
        "severity": dict(sorted(severity.items())),
        "confidence_bins": {lbl: tot(f"b_{lbl}") for lbl in _BIN_LABELS},
        "failures": {
            "total_events": sum(cats.values()),
            "n_low_confidence": n_low,
            "sum_low_pct": tot("sum_low_pct"),
            "mean_low_confidence": (
                round(tot("sum_low_pct") / n_low / 100.0, 4) if n_low else None
            ),
            "most_common": [
                [c, v] for c, v in sorted(cats.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
            ],
        },
    }


def write_report(out_ds: ray.data.Dataset, path: str) -> dict:
    """S9 report sink: write the per-run metrics JSON the reference emits
    alongside its batch output (tmp-rename for atomicity); returns the dict."""
    import json
    import os

    report = run_report(out_ds)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path + ".tmp", "w") as f:
        json.dump(report, f, indent=1)
    os.rename(path + ".tmp", path)
    return report


def failure_summary(out_ds: ray.data.Dataset, k: int = 5) -> pa.Table:
    """A5 composed failure report as a table: top-k error categories with the
    global failure totals attached (total events, low-confidence count and
    mean low confidence in fixed-point e4)."""
    import math

    r = run_report(out_ds)
    top = r["failures"]["most_common"][:k]
    n = len(top)
    n_low = r["failures"]["n_low_confidence"]
    # e4 from the exact integer sums (not the display-rounded float), so a
    # SQL mirror reproduces it: floor(100 * sum_pct / n + 0.5)
    mean_low_e4 = (
        int(math.floor(100.0 * r["failures"]["sum_low_pct"] / n_low + 0.5))
        if n_low
        else 0
    )
    return pa.table(
        {
            "rank": pa.array(range(1, n + 1), pa.int64()),
            "category": pa.array([c for c, _ in top], pa.string()),
            "n": pa.array([v for _, v in top], pa.int64()),
            "total_failure_events": pa.array([r["failures"]["total_events"]] * n, pa.int64()),
            "n_low_conf": pa.array([n_low] * n, pa.int64()),
            "mean_low_conf_e4": pa.array([mean_low_e4] * n, pa.int64()),
        }
    )


PSEUDO_LABEL_MIN_CONF = 0.85


def pseudo_labels(out_ds: ray.data.Dataset) -> ray.data.Dataset:
    """E18 analogue (reference consensus.py:196-222): high-confidence rows
    become training pseudo-labels — a filtered side-output dataset."""
    return out_ds.filter(
        expr=f"confidence >= {PSEUDO_LABEL_MIN_CONF}"
    ).select_columns(["conv_id", "turn_idx", "extracted_text", "confidence"])


def conversation_pack(
    out_ds: ray.data.Dataset,
    num_shards: int = 64,
    sep: str = "\n\n",
    aligned: bool = False,
) -> ray.data.Dataset:
    """SFT-corpus assembly: concatenate each conversation's extracted turn
    texts (in sealed turn order) into ONE training document — the step that
    turns the per-turn extraction table into model-ready documents
    (reference analogue: the per-document field table the app assembles
    from per-region OCR rows, submission/app.py result view; here it is a
    first-class distributed op).

    Scale shape: conversations hash to coarse crc32 shards so the groupby
    moves each turn's slim (conv_id, turn_idx, text) projection exactly
    once; inside a shard the pack is one dictionary-encode + lexsort +
    ``pa.ListArray`` build + ``pc.binary_join`` — no per-row Python.  Doc
    payloads never re-shuffle after assembly.

    ``aligned=True`` is the zero-shuffle fast path under the SAME
    precondition as ``seal_strategy="aligned"`` (every conversation fully
    contained in one upstream block): the pack kernel runs as a plain
    whole-block ``map_batches`` that Ray fuses into the extraction
    operator — read -> classify -> pack in one task, NO exchange at all."""
    import numpy as np
    import zlib

    slim = out_ds.select_columns(["conv_id", "turn_idx", "extracted_text"])

    def stamp(t: pa.Table) -> pa.Table:
        conv = t.column("conv_id").combine_chunks()
        d = conv.dictionary_encode()
        # hash each DISTINCT conv_id once, then gather per row
        dh = np.array(
            [zlib.crc32(s.encode()) % num_shards for s in d.dictionary.to_pylist()],
            dtype=np.int32,
        )
        idx = d.indices.to_numpy(zero_copy_only=False)
        return t.append_column("cshard", pa.array(dh[idx], pa.int32()))

    _OUT = pa.schema(
        [("conv_id", pa.string()), ("n_turns", pa.int64()), ("doc", pa.string())]
    )

    def pack_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        conv = g.column("conv_id").combine_chunks().dictionary_encode()
        ci = conv.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ti = g.column("turn_idx").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ti, ci))
        ci_s = ci[order]
        new = np.ones(len(ci_s), dtype=bool)
        new[1:] = ci_s[1:] != ci_s[:-1]
        starts = np.flatnonzero(new)
        offsets = np.append(starts, len(ci_s)).astype(np.int32)
        txt = pc.take(g.column("extracted_text").combine_chunks(), pa.array(order))
        docs = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), txt),
            sep,
        )
        return pa.table(
            {
                "conv_id": pc.take(conv.dictionary, pa.array(ci_s[starts])),
                "n_turns": pa.array(np.diff(offsets).astype(np.int64), pa.int64()),
                "doc": docs,
            },
            schema=_OUT,
        )

    if aligned:
        return slim.map_batches(pack_shard, batch_format="pyarrow", batch_size=None)
    return (
        slim.map_batches(stamp, batch_format="pyarrow")
        .groupby("cshard")
        .map_groups(
            lambda g: pack_shard(_dropg(g, ["cshard"])), batch_format="pyarrow"
        )
    )
