"""Consensus stage: cross-field consistency boosts (E16), weighted document
confidence (A6), anomaly detection (E17) — reference consensus.py:64-255,
transplanted to the transcript fields struct.

Row-local and stateless: one vectorized ``map_batches`` over the extraction
output table, appending ``final_confidence`` and ``anomalies``.  Semantics are
defined by ``oracle.consensus_turn`` (pytest-verified equality); the two share
only the constants in ``config``.  Float determinism: span/turn confidences
are read back as float32 exactly as Arrow stores them, accumulated in span
order in float64, combined in a fixed expression order, and final rounding
uses Python's correctly-rounded ``round`` (numpy's scaled round can differ on
ties).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import config as C


def consensus_batch(t: pa.Table) -> pa.Table:
    n = t.num_rows
    fields = t.column("fields").combine_chunks()
    power = fields.field("power").to_numpy(zero_copy_only=False)
    amount = fields.field("amount").to_numpy(zero_copy_only=False)
    code_arr = fields.field("code")
    entity_null = pc.is_null(fields.field("entity")).to_numpy(zero_copy_only=False)
    code_null = pc.is_null(code_arr).to_numpy(zero_copy_only=False)
    ra = pc.fill_null(fields.field("region_a").field("present"), False).to_numpy(
        zero_copy_only=False
    )
    rb = pc.is_valid(fields.field("region_b").field("span")).to_numpy(
        zero_copy_only=False
    )

    has_pa = ~np.isnan(power) & ~np.isnan(amount)
    p = np.nan_to_num(power)
    a = np.nan_to_num(amount)
    ratio_ok = has_pa & (
        (p * C.CONSENSUS_AMOUNT_PER_POWER_MIN <= a)
        & (a <= p * C.CONSENSUS_AMOUNT_PER_POWER_MAX)
    )
    floor_ok = has_pa & (a > p * C.CONSENSUS_AMOUNT_FLOOR_PER_POWER)

    bare = pc.replace_substring(
        pc.replace_substring(pc.fill_null(code_arr, ""), "-", ""), " ", ""
    )
    code_len = pc.utf8_length(pc.fill_null(code_arr, "")).to_numpy(
        zero_copy_only=False
    )
    code_ok = (
        ~code_null
        & pc.fill_null(pc.utf8_is_alnum(bare), False).to_numpy(zero_copy_only=False)
        & (code_len >= C.CONSENSUS_CODE_MIN_LEN)
        & (code_len <= C.CONSENSUS_CODE_MAX_LEN)
    )

    boost = np.zeros(n, dtype=np.float64)
    boost += np.where(
        ratio_ok,
        C.CONSENSUS_BOOST_RATIO_OK,
        np.where(has_pa, C.CONSENSUS_PENALTY_RATIO_BAD, 0.0),
    )
    boost += np.where(floor_ok, C.CONSENSUS_BOOST_FLOOR_OK, 0.0)
    boost += np.where(code_ok, C.CONSENSUS_BOOST_CODE_OK, 0.0)
    boost += np.where(ra & rb, C.CONSENSUS_BOOST_BOTH_REGIONS, 0.0)

    # mean span confidence: flatten list<struct>.conf (float32, accumulated in
    # span order exactly like the oracle's sequential sum)
    spans = t.column("spans").combine_chunks()
    conf_flat = spans.values.field("conf").to_numpy(zero_copy_only=False).astype(
        np.float64
    )
    parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    sums = np.zeros(n, dtype=np.float64)
    np.add.at(sums, parent, conf_flat)
    counts = np.bincount(parent, minlength=n).astype(np.float64)
    span_mean = np.divide(sums, counts, out=np.zeros(n), where=counts > 0)

    region_score = np.where(ra, 0.5, 0.0) + np.where(rb, 0.5, 0.0)
    w_f, w_s, w_r, w_b = C.CONSENSUS_WEIGHTS
    conf = (
        t.column("confidence").combine_chunks().to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )
    base = np.clip(0.5 + boost, 0.0, 1.0)
    final = np.clip(w_f * conf + w_s * span_mean + w_r * region_score + w_b * base,
                    0.0, 1.0)
    final_r = [round(float(x), C.CONSENSUS_ROUND_DECIMALS) for x in final]

    miss_crit = entity_null & code_null
    p_bad = ~np.isnan(power) & (
        (power < C.ANOMALY_POWER_RANGE[0]) | (power > C.ANOMALY_POWER_RANGE[1])
    )
    a_bad = ~np.isnan(amount) & (
        (amount < C.ANOMALY_AMOUNT_RANGE[0]) | (amount > C.ANOMALY_AMOUNT_RANGE[1])
    )
    no_regions = ~ra & ~rb
    anomalies = []
    for i in range(n):
        parts = []
        if miss_crit[i]:
            parts.append(C.ANOMALY_MISSING_CRITICAL)
        if p_bad[i]:
            parts.append(C.ANOMALY_POWER)
        if a_bad[i]:
            parts.append(C.ANOMALY_AMOUNT)
        if no_regions[i]:
            parts.append(C.ANOMALY_NO_REGIONS)
        anomalies.append(C.ANOMALY_SEP.join(parts))

    # float64: keeps the rounded decimal exact so oracle equality is bitwise
    t = t.append_column("final_confidence", pa.array(final_r, pa.float64()))
    return t.append_column("anomalies", pa.array(anomalies, pa.string()))
