"""Shared helpers for the operator library."""

from __future__ import annotations


def pool_size(cap: int = 4) -> int:
    """Fixed actor-pool size for operator stages: min(cap, cluster CPUs - 1).

    Fixed pools beat autoscaling (1,N) by ~2x on short jobs (no ramp), but a
    pool that reserves EVERY cpu deadlocks the read/shuffle stages feeding it
    — always leave at least one CPU free (measured; see BASELINE.md notes).
    """
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(1, min(cap, cpus - 1))


def strip_schema_metadata(ds):
    """Drop parquet's pandas schema metadata before hash joins: Ray's join
    aggregators try to hash block schemas for deduplication and warn
    ("unhashable type: 'dict'") on every bundle whose metadata carries the
    pandas dict.  Projection-only map; zero-copy."""
    return ds.map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    )


def absorb_empty_blocks(ds, batch_size: int = 65536):
    """Dataset.join emits empty partitions that BYPASS downstream transforms
    (map UDFs are never invoked on empty blocks, and rename_columns leaves
    them with stale/absent schemas), so a downstream join fails with "No
    match or multiple matches for key field reference".  An identity
    map_batches with an EXPLICIT batch_size makes the batcher coalesce
    blocks, and empty blocks vanish into their neighbors — the output
    carries only schema-correct blocks."""
    return ds.map_batches(lambda t: t, batch_format="pyarrow", batch_size=batch_size)


def as_docs_dataset(source, max_blocks: int = 32, min_rows: int = 256):
    """Dataset from a docs source that may be an in-memory ``pa.Table``.

    A single ``from_arrow(table)`` yields ONE block, so every downstream map
    runs as one task — zero parallelism.  Slice the table into up to
    ``max_blocks`` deterministic contiguous chunks (never smaller than
    ``min_rows`` rows: tiny blocks triple shuffle/join constant costs — see
    the over-split note in CLAUDE.md).  Datasets pass through unchanged."""
    import math

    import pyarrow as pa
    import ray

    if not isinstance(source, pa.Table):
        return source
    n = source.num_rows
    k = max(1, min(max_blocks, math.ceil(n / min_rows)))
    if k == 1:
        return ray.data.from_arrow(source)
    step = math.ceil(n / k)
    return ray.data.from_arrow(
        [source.slice(i * step, step) for i in range(k) if i * step < n]
    )


def int_segment_sum(weights, starts):
    """Exact int64 sums of CONSECUTIVE runs (callers pass ``starts =
    np.flatnonzero(new_run)`` over run-sorted rows).  ``np.bincount(seg,
    weights=...)`` accumulates in float64 — exact only below 2**53 — while
    ``np.add.reduceat`` on an int64 view is exact over the full int64 range
    (the repo's exactness discipline: integer counts never touch floats)."""
    import numpy as np

    w = np.asarray(weights).astype(np.int64, copy=False)
    if len(w) == 0:
        return np.zeros(0, dtype=np.int64)
    return np.add.reduceat(w, starts)


def int_bincount(idx, weights, minlength: int = 0):
    """Exact int64 bincount for UNSORTED indices: np.add.at on an int64
    accumulator (same rationale as ``int_segment_sum``; np.add.at is
    unbuffered-exact, and these run on shard-sized groups, not the corpus)."""
    import numpy as np

    idx = np.asarray(idx)
    n = max(minlength, (int(idx.max()) + 1) if len(idx) else 0)
    out = np.zeros(n, dtype=np.int64)
    if len(idx):
        np.add.at(out, idx, np.asarray(weights).astype(np.int64, copy=False))
    return out


def embedding_matrix(col, dtype="float64", dim: int = 0):
    """Zero-copy-ish (n, dim) numpy matrix from an Arrow list<float> column
    with equal-length lists — flatten + reshape instead of to_pylist (the
    python-object path is ~30x slower and allocates n*dim PyFloats).

    ``dim`` is only consulted for EMPTY columns (Ray can emit empty blocks
    after filters/joins): reshape(0, -1) cannot infer the trailing dimension,
    so an explicit hint keeps downstream matmuls shape-correct."""
    import numpy as np
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, dim), dtype=dtype)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.astype(dtype, copy=False).reshape(n, -1)


def parquet_num_rows(path) -> int:
    """Row count from the parquet FOOTER only — no data pages are read.
    The metadata guard for broadcast-vs-shard-join auto-dispatch."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def drop_if_present(t, cols):
    """``drop_columns`` tolerant of Ray's ZERO-COLUMN empty group tables:
    union + groupby can hand ``map_groups`` a schema-less empty table (the
    same hazard CLAUDE.md documents for join output), and a plain
    ``drop_columns`` then raises ``KeyError: Field ... does not exist``.
    Intermittent by block layout — always use this in map_groups lambdas."""
    names = [c for c in cols if c in t.column_names]
    return t.drop_columns(names) if names else t


def combine_by_key(keys, *weight_cols):
    """Sort-and-segment-sum combine: group int64 ``keys`` and sum each of
    ``weight_cols`` per distinct key (stable sort; exact int64 sums via
    int_segment_sum).  Returns (unique_keys_ascending, *summed_cols).  The
    shared kernel behind the per-batch/per-shard combiners — one place to
    get the stable-sort and empty-input edge cases right."""
    import numpy as np

    order = np.argsort(keys, kind="stable")
    k = keys[order]
    new = np.ones(len(k), dtype=bool)
    new[1:] = k[1:] != k[:-1]
    starts = np.flatnonzero(new)
    return (k[starts],) + tuple(
        int_segment_sum(np.asarray(w)[order], starts) for w in weight_cols
    )
