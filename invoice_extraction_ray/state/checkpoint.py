"""Checkpointed, resumable pipeline runs with per-partition lineage manifests.

The reference keeps its whole batch in a driver list — a crash loses
everything (reference executable.py:122-130; SURVEY.md §4 "Checkpoint /
resume").  Here the unit of recovery is an input *chunk*: a deterministic
slice of the sorted input-file list.  Each chunk runs the full streaming
pipeline and writes

    out_dir/chunk=<k>/part-*.parquet          (data, written to .tmp then renamed)
    out_dir/_manifests/chunk-<k>.json         (lineage manifest, written LAST)

A manifest records the chunk's input fragments (file paths), output row
count, file count, and extraction metrics.  Resume = skip chunks whose
manifest exists and matches the planned input; chunks with data but no
manifest (a crash mid-write) are deleted and re-run.  Because chunk
membership is a pure function of the input file list, manifests line up
across runs (SURVEY.md §7.4 "Resume semantics").
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import pyarrow.compute as _pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq


def chunk_plan(input_paths: list[str], files_per_chunk: int) -> list[list[str]]:
    paths = sorted(input_paths)
    return [
        paths[i : i + files_per_chunk] for i in range(0, len(paths), files_per_chunk)
    ]


def _manifest_path(out_dir: str, k: int) -> str:
    return os.path.join(out_dir, "_manifests", f"chunk-{k:05d}.json")


def _chunk_dir(out_dir: str, k: int) -> str:
    return os.path.join(out_dir, f"chunk={k:05d}")


def run_checkpointed(
    input_paths: list[str],
    out_dir: str,
    *,
    files_per_chunk: int = 4,
    stop_after_chunks: int | None = None,
    **pipeline_kwargs,
) -> dict:
    """Run the extraction pipeline chunk-by-chunk with resume.

    ``stop_after_chunks`` simulates a crash for resume-invariance tests.
    Returns a summary dict {chunks_total, chunks_run, chunks_skipped, rows}.
    """
    from ..pipelines.extract import build_pipeline

    os.makedirs(os.path.join(out_dir, "_manifests"), exist_ok=True)
    plan = chunk_plan(input_paths, files_per_chunk)
    run = skipped = 0

    for k, files in enumerate(plan):
        if stop_after_chunks is not None and run >= stop_after_chunks:
            break
        mpath = _manifest_path(out_dir, k)
        cdir = _chunk_dir(out_dir, k)
        if os.path.exists(mpath):
            with open(mpath) as f:
                manifest = json.load(f)
            if manifest.get("input_files") == files and os.path.isdir(cdir):
                skipped += 1
                continue
        # incomplete/partial chunk: clear and re-run
        for stale in (cdir, cdir + ".tmp"):
            if os.path.isdir(stale):
                shutil.rmtree(stale)
        if os.path.exists(mpath):
            os.remove(mpath)

        ds = build_pipeline(files, **pipeline_kwargs)
        tmp = cdir + ".tmp"
        ds.write_parquet(tmp)
        os.rename(tmp, cdir)

        out_files = sorted(glob.glob(os.path.join(cdir, "*.parquet")))
        rows = sum(pq.read_metadata(f).num_rows for f in out_files)
        # lineage metrics: read back only the tiny confidence column
        conf = pads.dataset(out_files).to_table(columns=["confidence"])
        mean_conf = (
            _pc.mean(conf.column("confidence").cast("float64")).as_py()
            if rows
            else None
        )
        manifest = {
            "chunk_id": k,
            "input_files": files,
            "row_count": rows,
            "output_files": [os.path.basename(f) for f in out_files],
            "metrics": {"mean_confidence": mean_conf},
        }
        with open(mpath + ".tmp", "w") as f:
            json.dump(manifest, f, indent=1)
        os.rename(mpath + ".tmp", mpath)
        run += 1

    total_rows = 0
    for k in range(len(plan)):
        mp = _manifest_path(out_dir, k)
        if os.path.exists(mp):
            with open(mp) as f:
                total_rows += json.load(f)["row_count"]
    return {
        "chunks_total": len(plan),
        "chunks_run": run,
        "chunks_skipped": skipped,
        "rows": total_rows,
    }


def run_prep_checkpointed(
    input_paths: list[str],
    out_dir: str,
    *,
    files_per_chunk: int = 4,
    stop_after_chunks: int | None = None,
    **prep_kwargs,
) -> dict:
    """Checkpointed, resumable CURATION runs: ``prepare_corpus`` (quality
    filter -> exact dedup -> near-dup cluster removal) chunk-by-chunk with
    the same lineage-manifest discipline as the flagship job.

    Dedup scope in checkpointed mode is the CHUNK: each chunk's documents
    dedup against each other, not across chunks — the standard
    hash-partitioned dedup discipline at corpus scale (route related docs
    into the same chunk upstream if cross-file dedup is needed).  Chunk
    membership is a pure function of the sorted file list, so a resumed
    run reproduces a clean run bit-for-bit (resume-invariance tested by
    killing after chunk k and re-running).

    Returns {chunks_total, chunks_run, chunks_skipped, rows}."""
    import ray.data

    from ..pipelines.prep import prepare_corpus

    os.makedirs(os.path.join(out_dir, "_manifests"), exist_ok=True)
    plan = chunk_plan(input_paths, files_per_chunk)
    run = skipped = 0

    for k, files in enumerate(plan):
        if stop_after_chunks is not None and run >= stop_after_chunks:
            break
        mpath = _manifest_path(out_dir, k)
        cdir = _chunk_dir(out_dir, k)
        if os.path.exists(mpath):
            with open(mpath) as f:
                manifest = json.load(f)
            if manifest.get("input_files") == files and os.path.isdir(cdir):
                skipped += 1
                continue
        for stale in (cdir, cdir + ".tmp"):
            if os.path.isdir(stale):
                shutil.rmtree(stale)
        if os.path.exists(mpath):
            os.remove(mpath)

        docs = ray.data.read_parquet(files, columns=["doc_id", "text"])
        ds = prepare_corpus(docs, **prep_kwargs)
        tmp = cdir + ".tmp"
        ds.write_parquet(tmp)
        os.rename(tmp, cdir)

        out_files = sorted(glob.glob(os.path.join(cdir, "*.parquet")))
        rows = sum(pq.read_metadata(f).num_rows for f in out_files)
        if rows:
            t = pads.dataset(out_files).to_table(columns=["score_e5", "n_copies"])
            mean_score = _pc.mean(t.column("score_e5").cast("float64")).as_py()
            dup_copies = _pc.sum(t.column("n_copies")).as_py()
        else:
            mean_score = None
            dup_copies = 0
        manifest = {
            "chunk_id": k,
            "input_files": files,
            "row_count": rows,
            "output_files": [os.path.basename(f) for f in out_files],
            "metrics": {
                "mean_score_e5": mean_score,
                "copies_represented": dup_copies,
            },
        }
        with open(mpath + ".tmp", "w") as f:
            json.dump(manifest, f, indent=1)
        os.rename(mpath + ".tmp", mpath)
        run += 1

    total_rows = 0
    for k in range(len(plan)):
        mp = _manifest_path(out_dir, k)
        if os.path.exists(mp):
            with open(mp) as f:
                total_rows += json.load(f)["row_count"]
    return {
        "chunks_total": len(plan),
        "chunks_run": run,
        "chunks_skipped": skipped,
        "rows": total_rows,
    }


def read_output(out_dir: str):
    """Ray Dataset over all completed chunks' parquet output."""
    import ray.data

    dirs = sorted(glob.glob(os.path.join(out_dir, "chunk=*")))
    files = [f for d in dirs for f in sorted(glob.glob(os.path.join(d, "*.parquet")))]
    # partitioning=None: don't hive-infer a "chunk" column from the dir names
    return ray.data.read_parquet(files, partitioning=None)
