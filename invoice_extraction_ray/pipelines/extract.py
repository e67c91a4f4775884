"""Flagship pipeline builder: per-turn main-content extraction.

    read_parquet(transcripts, columns=pruned)          # S-layer
      -> map_batches(normalize_batch, pyarrow)         # stateless, vectorized
      -> map_batches(TurnClassifier, actor pool)       # stateful extraction
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
from ..stages.normalize import normalize_batch
from ..stages.seal import compute_hot_convs, seal_conversations

INPUT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool"]


def to_dataset(source, columns: list[str] | None = None) -> ray.data.Dataset:
    """Accept parquet path(s) / pa.Table / Dataset; prune columns at the read."""
    if isinstance(source, ray.data.Dataset):
        return source.select_columns(columns) if columns else source
    if isinstance(source, pa.Table):
        t = source.select(columns) if columns else source
        return ray.data.from_arrow(t)
    # str or list of str -> parquet
    return ray.data.read_parquet(source, columns=columns)


def build_pipeline(
    source,
    master: dict | None = None,
    *,
    batch_size: int = 1024,
    concurrency=None,
    num_cpus: float = 1,
    seal: bool = True,
    hot_threshold: int = 1000,
    salt_block: int = 256,
) -> ray.data.Dataset:
    """Build the lazy extraction Dataset over transcript parquet/table input."""
    ds = to_dataset(source, columns=INPUT_COLUMNS)

    if master is None:
        master = master_data()
    master_ref = ray.put(master)  # broadcast once; each actor ray.get()s it

    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        # leave headroom for read / shuffle / write stages (ray_guide: a pool
        # that reserves every CPU starves the other stages)
        concurrency = (1, max(1, cpus - 2))

    ds = ds.map_batches(normalize_batch, batch_format="pyarrow")
    ds = ds.map_batches(
        TurnClassifier,
        fn_constructor_kwargs={"master_ref": master_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )

    if seal:
        # hot-key census on a fresh conv_id-only read (never re-executes the
        # extraction stage; reads one column)
        census = to_dataset(source, columns=["conv_id"])
        hot = compute_hot_convs(census, hot_threshold)
        ds = seal_conversations(ds, hot, salt_block)
    return ds
