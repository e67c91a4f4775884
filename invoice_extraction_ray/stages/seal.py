"""Seal stage: the pipeline's single wide (all-to-all) step.

Restores stable turn ordering — the reference's reading-order sort
(ocr.py:265-266) transplanted per BASELINE.json north_rule.  Two physical
strategies produce the same logical order (conv_id asc, turn_idx asc):

``strategy="sort"`` (default) — ``ds.sort(["conv_id", "turn_idx"])``.  Ray's
sort is a sampled range-partitioned shuffle: partition boundaries are chosen
from key samples by ROW COUNT, so a pathologically hot conversation is split
across adjacent range partitions automatically — skew mitigation without a
census pass, and no per-group UDF dispatch.  Measured at sf0.1 (136k turns,
32 cpus): 1.3s vs 18.5s for the groupby path (map_groups pays per-group
invocation overhead across ~15k conversations).

``strategy="groupby"`` — explicit hash-partition by salted conv_id then
``groupby(key).map_groups(sort by turn_idx)``: hot conversations (found by a
partial-aggregate census over only the conv_id column) are salted into
``conv_id#shard`` sub-keys so no single group exceeds ``salt_block`` turns.
Use when downstream needs per-conversation group processing beyond ordering
(conversation-level seals/aggregates), where whole-group batches matter.

Sealed output is identical across strategies and whether or not a
conversation was salted (the group body is order-restoring only, never
cross-turn) — the invariance properties tested in tests/test_seal.py.
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


def seal_sorted(ds: Dataset) -> Dataset:
    """Range-partitioned global sort by (conv_id, turn_idx): the fast default
    seal.  Same logical order as the salted groupby; skew handled by Ray's
    sampled row-count range partitioning."""
    return ds.sort(["conv_id", "turn_idx"])


SEAL_SHARDS = 512


def seal_conversations(
    ds: Dataset, hot_convs: set[str], salt_block: int = 256
) -> Dataset:
    """Hash-partition by a shard of the (salted) conv_id and sort each shard
    partition by (conv_id, turn_idx).

    Partitioning key: ``hash(seal_key) % SEAL_SHARDS`` where seal_key is
    conv_id, or ``conv_id#turn_block`` for hot conversations — so a giant
    conversation's salted sub-keys spread across shards (the skew
    mitigation) while normal conversations stay whole in one shard.
    Grouping by the SHARD rather than per conversation keeps map_groups
    dispatch at O(shards), not O(conversations) (~1ms per group dispatch —
    see BASELINE.md); the within-shard sort restores per-conversation turn
    order in one vectorized Arrow call."""
    hot_list = sorted(hot_convs)

    def _shard_of(keys) -> pa.Array:
        """Deterministic hash shard per key: dictionary-encode the batch
        (distinct keys are few), crc32 the small dictionary in Python, and
        gather — vectorized without a pyarrow hash kernel."""
        import zlib

        import numpy as np

        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        d = keys.dictionary_encode()
        hashed = np.fromiter(
            (zlib.crc32(v.encode()) & (SEAL_SHARDS - 1) for v in d.dictionary.to_pylist()),
            dtype=np.int32,
            count=len(d.dictionary),
        )
        idx = d.indices.to_numpy(zero_copy_only=False)
        return pa.array(hashed[idx], pa.int32())

    if hot_list:
        value_set = pa.array(hot_list, type=pa.string())

        def add_key(t: pa.Table) -> pa.Table:
            conv = t.column("conv_id")
            mask = pc.is_in(conv, value_set=value_set)
            blk = pc.cast(
                pc.divide(t.column("turn_idx"), pa.scalar(salt_block, pa.int32())),
                pa.string(),
            )
            salted = pc.binary_join_element_wise(
                pc.cast(conv, pa.string()), blk, "#"
            )
            keys = pc.if_else(mask, salted, pc.cast(conv, pa.string()))
            return t.append_column("seal_shard", _shard_of(keys))

    else:

        def add_key(t: pa.Table) -> pa.Table:
            return t.append_column("seal_shard", _shard_of(t.column("conv_id")))

    def sort_shard(t: pa.Table) -> pa.Table:
        return t.sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")]
        ).drop_columns(["seal_shard"])

    return (
        ds.map_batches(add_key, batch_format="pyarrow")
        .groupby("seal_shard")
        .map_groups(sort_shard, batch_format="pyarrow")
    )
