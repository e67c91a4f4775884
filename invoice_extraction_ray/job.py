"""`ray job submit` entry point for the extraction pipeline.

On a fixed-size multi-node cluster:

    ray job submit --working-dir . -- python -m invoice_extraction_ray.job \
        --input 's3://bucket/transcripts/*.parquet' --output s3://bucket/out \
        --files-per-chunk 64

In this sandbox (single node):

    python -m invoice_extraction_ray.job --sf /root/testdata/sf0.01 \
        --output /tmp/job_out

The job runs the checkpointed pipeline (state.checkpoint.run_checkpointed):
each chunk of input files streams read -> normalize -> classify -> seal ->
partitioned parquet + lineage manifest, so a preempted job resumes by
skipping completed chunks.  This script OWNS the Ray session (`ray job
submit` drivers connect with address="auto"); library code never inits.
"""

from __future__ import annotations

import argparse
import glob
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", help="parquet glob/paths (comma-separated)")
    ap.add_argument("--sf", help="testdata sf dir -> deterministic transcript corpus")
    ap.add_argument("--output", required=True)
    ap.add_argument("--files-per-chunk", type=int, default=8)
    ap.add_argument("--seal-strategy", default="sort",
                    choices=["sort", "groupby", "aligned"])
    ap.add_argument("--address", default=None,
                    help="Ray address (default: auto under `ray job submit`, "
                         "local otherwise)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():  # pragma: no branch
        ray.init(
            address=args.address or "local",
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.shuffle_strategy = "sort_shuffle_push_based"

    from invoice_extraction_ray.state.checkpoint import run_checkpointed

    if args.sf:
        from invoice_extraction_ray.corpus import transcripts_for

        paths = transcripts_for(args.sf)
    elif args.input:
        paths = sorted(
            p for pat in args.input.split(",") for p in (glob.glob(pat) or [pat])
        )
    else:
        ap.error("one of --input / --sf is required")
        return

    t0 = time.perf_counter()
    summary = run_checkpointed(
        paths,
        args.output,
        files_per_chunk=args.files_per_chunk,
        seal_strategy=args.seal_strategy,
    )
    # S9 report sink: per-run metrics JSON next to the data + manifests
    # (pruned read-back: the report never touches the wide spans column).
    # A pure resume (nothing re-ran) keeps the existing report.
    import os

    report_path = f"{args.output}/report.json"
    if summary["chunks_run"] > 0 or not os.path.exists(report_path):
        from invoice_extraction_ray.pipelines.metrics import REPORT_COLUMNS, write_report
        from invoice_extraction_ray.state.checkpoint import read_output

        write_report(
            read_output(args.output).select_columns(REPORT_COLUMNS), report_path
        )
    summary["report"] = f"{args.output}/report.json"
    summary["wall_sec"] = round(time.perf_counter() - t0, 3)
    json.dump(summary, sys.stdout)
    print()
    ray.shutdown()


if __name__ == "__main__":
    main()
