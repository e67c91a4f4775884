"""Small-file compaction — the standard table-maintenance op at 100 TB.

Long-running ingestion (per-chunk checkpointed writes, streaming sinks, many
small deltas) accumulates directories of tiny parquet files; reads then pay
per-file open/footer/metadata cost and the scheduler pays per-fragment task
dispatch (~15 ms/task, see CLAUDE.md) — the classic "small files problem".
``compact_parquet`` rewrites a file set into few large row-grouped files
with the same crash-safe discipline as ``state/checkpoint.py``: data lands
in a ``.tmp`` directory and is renamed into place only when complete, so a
crash mid-compaction never leaves a half-written output directory.

Content is preserved exactly (row multiset equality — order is NOT
guaranteed, matching every distributed rewrite); schema is preserved.  The
rewrite streams through Ray Data (never materializes the table), so a
terabyte directory compacts under constant memory.
"""

from __future__ import annotations

import os
import shutil

import ray.data


def compact_parquet(
    source,
    out_dir: str,
    target_rows_per_file: int = 1 << 20,
) -> dict:
    """Rewrite ``source`` (a parquet path, directory, or list of paths)
    into ``out_dir`` as files of ~``target_rows_per_file`` rows.  Returns
    ``{"files_in", "files_out", "rows"}``.  Refuses to overwrite an
    existing non-empty ``out_dir`` (delete it explicitly to re-compact —
    the op is maintenance, not a sink with resume semantics)."""
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        raise ValueError(f"compact_parquet: {out_dir} exists and is not empty")
    paths = source if isinstance(source, (list, tuple)) else [source]
    files_in = 0
    for p in paths:
        if os.path.isdir(p):
            files_in += sum(
                1 for n in os.listdir(p) if n.endswith(".parquet")
            )
        else:
            files_in += 1
    ds = ray.data.read_parquet(list(paths))
    tmp = f"{out_dir.rstrip('/')}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    ds.write_parquet(
        tmp,
        min_rows_per_file=target_rows_per_file,
        max_rows_per_file=target_rows_per_file,
    )
    rows = ds.count()
    os.makedirs(os.path.dirname(out_dir) or ".", exist_ok=True)
    os.rename(tmp, out_dir)
    files_out = sum(1 for n in os.listdir(out_dir) if n.endswith(".parquet"))
    return {"files_in": files_in, "files_out": files_out, "rows": rows}
