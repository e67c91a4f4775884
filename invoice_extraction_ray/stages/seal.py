"""Seal stage: the pipeline's single wide (all-to-all) step.

Restores stable turn ordering — the reference's reading-order sort
(ocr.py:265-266) transplanted per BASELINE.json north_rule: repartition by
hash(conv_id) with explicit skew mitigation (hot conversations are salted into
``conv_id#shard`` sub-keys so no single group exceeds ``salt_block`` turns),
then ``groupby(key).map_groups(sort by turn_idx)``.

Sealed output is identical whether or not a conversation was salted (the
map_groups body is order-restoring only, never cross-turn), which is the
salting-invariance property tested in tests/test_seal.py.

Scale notes (100 TB): the hot-conversation census is a partial-aggregate pass
over ONLY the conv_id column (pre-aggregated per batch before the tiny
groupby), so its shuffle input is a few bytes per distinct conversation, not
the data. The main groupby is the one unavoidable exchange; everything
upstream is row-local map_batches.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Sum


def compute_hot_convs(ds: Dataset, threshold: int) -> set[str]:
    """conv_ids with >= threshold turns, via partial per-batch counts."""

    def partial_counts(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t.column("conv_id").combine_chunks())
        return pa.table(
            {"conv_id": vc.field("values"), "n": pc.cast(vc.field("counts"), pa.int64())}
        )

    counts = (
        ds.select_columns(["conv_id"])
        .map_batches(partial_counts, batch_format="pyarrow")
        .groupby("conv_id")
        .aggregate(Sum("n", alias_name="n_turns"))
    )
    hot = counts.filter(
        expr=f"n_turns >= {int(threshold)}"
    ).take_all()
    return {r["conv_id"] for r in hot}


def seal_conversations(
    ds: Dataset, hot_convs: set[str], salt_block: int = 256
) -> Dataset:
    """Hash-partition by (salted) conv_id and sort each group by turn_idx."""
    hot_list = sorted(hot_convs)

    if hot_list:
        value_set = pa.array(hot_list, type=pa.string())

        def add_key(t: pa.Table) -> pa.Table:
            conv = t.column("conv_id")
            mask = pc.is_in(conv, value_set=value_set)
            shard = pc.cast(
                pc.divide(t.column("turn_idx"), pa.scalar(salt_block, pa.int32())),
                pa.string(),
            )
            salted = pc.binary_join_element_wise(
                pc.cast(conv, pa.string()), shard, "#"
            )
            keys = pc.if_else(mask, salted, pc.cast(conv, pa.string()))
            return t.append_column("seal_key", keys)

    else:

        def add_key(t: pa.Table) -> pa.Table:
            return t.append_column("seal_key", t.column("conv_id"))

    def sort_group(t: pa.Table) -> pa.Table:
        return t.sort_by([("turn_idx", "ascending")]).drop_columns(["seal_key"])

    return (
        ds.map_batches(add_key, batch_format="pyarrow")
        .groupby("seal_key")
        .map_groups(sort_group, batch_format="pyarrow")
    )
