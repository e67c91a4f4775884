"""Flagship pipeline builder: per-turn main-content extraction.

    read_parquet(transcripts, columns=pruned)          # S-layer
      -> map_batches(TurnClassifier, actor pool)       # normalize (fused) + extraction
      -> salted groupby(conv_id).map_groups(sort)      # the one wide step
      -> write_parquet / iter_batches                  # caller consumes

Everything streams: no stage materializes the dataset; the only all-to-all
exchange is the seal groupby (skippable with seal=False for purely row-local
consumers).  Ray sessions are owned by callers — this module never calls
ray.init().
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data

from ..fixtures import master_data
from ..stages.classify import TurnClassifier
from ..stages.seal import compute_hot_convs, seal_conversations, seal_sorted

INPUT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool"]


def to_dataset(
    source,
    columns: list[str] | None = None,
    one_block_per_file: bool = False,
) -> ray.data.Dataset:
    """Accept parquet path(s) / pa.Table / Dataset; prune columns at the read.

    ``one_block_per_file``: map each input file to exactly one block (needed
    by the "aligned" seal strategy, which sorts per input shard).
    """
    if isinstance(source, ray.data.Dataset):
        return source.select_columns(columns) if columns else source
    if isinstance(source, pa.Table):
        t = source.select(columns) if columns else source
        return ray.data.from_arrow(t)
    # str or list of str -> parquet
    kwargs = {}
    if one_block_per_file and isinstance(source, (list, tuple)):
        kwargs["override_num_blocks"] = len(source)
    return ray.data.read_parquet(source, columns=columns, **kwargs)


def sort_block(t: pa.Table) -> pa.Table:
    """Order one conversation-complete shard by (conv_id, turn_idx)."""
    return t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def build_pipeline(
    source,
    master: dict | None = None,
    *,
    batch_size: int = 1024,
    concurrency=None,
    num_cpus: float = 0.8,
    seal: bool = True,
    seal_strategy: str = "sort",
    hot_threshold: int = 1000,
    salt_block: int = 256,
    flat_output: bool = False,
) -> ray.data.Dataset:
    """Build the lazy extraction Dataset over transcript parquet/table input.

    ``seal_strategy`` picks how stable (conv_id, turn_idx) ordering is
    restored (the north_rule's equality-defining step):

    - ``"sort"`` (default): global range-partitioned sort after extraction —
      correct for ANY input layout; one all-to-all exchange.
    - ``"groupby"``: salted hash-partition + per-group sort (see stages.seal).
    - ``"aligned"``: zero-shuffle fast path for PARTITION-ALIGNED input —
      every conversation fully contained in one input file and each file
      small enough to stay one block (< DataContext.target_max_block_size).
      Each shard is sorted locally before extraction; with
      ``execution_options.preserve_order`` the concatenated output is
      globally ordered because shards hold disjoint, monotonic conv ranges.
      This is the 100 TB design: when upstream layout already co-locates the
      partition key, skip the exchange entirely.  The fixture corpus
      (fixtures.write_transcripts_parquet) guarantees this precondition.

    ``num_cpus=0.8`` per classifier actor deliberately undersubscribes so
    read/shuffle/write tasks are never starved by the actor pool (measured
    2-3x end-to-end win over num_cpus=1 pools at 32 cpus).
    """
    aligned = seal and seal_strategy == "aligned"
    ds = to_dataset(source, columns=INPUT_COLUMNS, one_block_per_file=aligned)
    if aligned:
        # whole-block batches: each batch is exactly one input shard
        ds = ds.map_batches(sort_block, batch_size=None, batch_format="pyarrow")

    if master is None:
        master = master_data()
    master_ref = ray.put(master)  # broadcast once; each actor ray.get()s it

    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        # fixed-size pool: autoscaling (1,N) ramps too slowly and loses ~2x
        # wall on this CPU-bound stage; leave 2 CPUs of headroom for the
        # read / shuffle / consume stages so they aren't starved
        concurrency = max(1, cpus - 2)

    # normalize is FUSED into the classifier actor (TurnClassifier.__call__
    # normalizes batches that lack norm_text): a separate task-pool map would
    # round-trip every normalized text block through the object store
    ds = ds.map_batches(
        TurnClassifier,
        # flat_output pushes the caller's projection into the operator: the
        # spans/fields columns are never built, serialized, or shuffled
        fn_constructor_kwargs={"master_ref": master_ref, "flat_only": flat_output},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )

    if seal and not aligned:
        if seal_strategy == "sort":
            # sampled range-partitioned sort: skew-robust, no census needed
            ds = seal_sorted(ds)
        else:
            # hot-key census on a fresh conv_id-only read (never re-executes
            # the extraction stage; reads one column)
            census = to_dataset(source, columns=["conv_id"])
            hot = compute_hot_convs(census, hot_threshold)
            ds = seal_conversations(ds, hot, salt_block)
    return ds
