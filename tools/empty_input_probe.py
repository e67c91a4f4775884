"""Empty-input robustness sweep: run EVERY registered (non-pinned) query
against a directory of schema-only empty parquet tables.  At 100 TB,
fully-empty partitions/filters are routine — every op must either return
an empty (or zero-count) result or raise the documented clear
"query ... not found" error for missing query/reference assets, never an
incidental IndexError/ZeroDivisionError deep in a kernel.

Usage: PYTHONPATH=. python tools/empty_input_probe.py
Exit 0 iff every query is clean.  The fast regression subset (the 17 ops
that crashed before the round-5 hardening) runs in the pytest suite
(tests/test_empty_inputs.py); this tool is the full sweep.
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# query/reference-asset ops: a missing query id must raise CLEARLY
QUERY_REF = {
    "ann_topk", "lsh_ann_topk", "ann_range_search", "filtered_ann_topk",
    "media_ann_topk", "hybrid_rrf_topk", "ann_topk_multi", "ivf_ann_topk",
    "pq_ann_topk", "ann_recall_report", "knn_graph",
}


def make_empty_dir(dst: str, src: str = "/root/testdata/sf0.001") -> str:
    os.makedirs(dst, exist_ok=True)
    for name in TABLES:
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        pq.write_table(t.schema.empty_table(), os.path.join(dst, f"{name}.parquet"))
    return dst


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as E

    empty = make_empty_dir("/tmp/sf_empty_probe")
    pinned = set(getattr(E, "SF001_PINNED", []))
    ok = clear = 0
    failures = []
    for name, fn in E.queries().items():
        if name in pinned:
            continue
        try:
            res = fn(empty)
            if hasattr(res, "count"):
                res.count()
            ok += 1
        except ValueError as ex:
            if name in QUERY_REF and "not found" in str(ex):
                clear += 1
            else:
                failures.append((name, f"ValueError: {ex}"))
        except Exception as ex:  # noqa: BLE001 — report, don't mask
            failures.append((name, f"{type(ex).__name__}: {ex}"))
    print(f"ok={ok} clear_raise={clear} failures={len(failures)}")
    for n, e in failures:
        print(f"[FAIL] {n}: {e}")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
