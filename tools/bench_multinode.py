"""Two-CLUSTER-SIZE scaling evidence on virtual nodes (BASELINE.json
north_rule): run the flagship extraction on a ray.cluster_utils.Cluster
with 1 node and with 2 nodes (same per-node shape: 2 cpus + its own object
store), fresh process per level, same input — the closest in-sandbox
analogue to "N nodes vs 2N nodes" because each virtual node has a separate
plasma store, so the 2-node run pays real cross-node object transfer for
the seal shuffle and broadcast.

Usage: PYTHONPATH=. python tools/bench_multinode.py            # both levels
       PYTHONPATH=. python tools/bench_multinode.py --nodes N  # one level
       PYTHONPATH=. python tools/bench_multinode.py --op pagerank
           # 1-vs-2-node pair for one of: flagship (default), pagerank,
           # minhash_neardup, nation_revenue (the shuffle-heaviest ops)
Prints one JSON line per level; the no-arg parent combines them.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS_PER_NODE = 2
# 1 GiB per virtual node: at 512 MiB the sort shuffles of the heavier ops
# (nation_revenue's two chained shard exchanges) fall into object-spill
# thrash (measured 114 s vs 3.8 s on the SAME 1-node run) — an artifact of
# the miniature store, not of the pipeline shape; real nodes have tens of
# GiB.  Per-node shape stays identical across levels, as the north rule
# requires.
STORE_BYTES = 1024 * 1024**2


def _op_dataset(op: str):
    """Build the op's Dataset (lazy).  Returns (build_fn, warm_fn)."""
    if op == "flagship":
        from invoice_extraction_ray.corpus import transcripts_for
        from invoice_extraction_ray.pipelines.extract import build_pipeline

        paths = transcripts_for(SF)
        return lambda: build_pipeline(
            paths, seal_strategy="aligned", flat_output=True
        )
    if op == "pagerank":
        from invoice_extraction_ray.ops.graph import pagerank

        return lambda: pagerank(SF)
    if op == "pagerank12":
        # 12 supersteps: same operator, 4x the iterative phase — the
        # sf0.1 3-iteration walls are ~80% fixed floor (measured via an
        # sf0.001 run: 1.25 s of 1.6 s), so the short pair can't show
        # scaling; this variant makes the scalable phase dominate.
        from invoice_extraction_ray.ops.graph import pagerank

        return lambda: pagerank(SF, iterations=12)
    if op == "minhash_neardup":
        import pyarrow.parquet as pq

        from invoice_extraction_ray.ops.dedup import minhash_neardup

        docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        return lambda: minhash_neardup(docs, jaccard_threshold=0.8)
    if op == "nation_revenue":
        from invoice_extraction_ray.ops.relational import nation_revenue

        # dim_cap=0 forces the DISTRIBUTED shard fallback — the path whose
        # cross-node exchange behavior actually matters at cluster scale
        return lambda: nation_revenue(SF, dim_cap=0)
    if op == "nation_profit":
        from invoice_extraction_ray.ops.relational import nation_profit

        # the r5 Q9 chain: bloom-pruned lineitem + two chained shard
        # exchanges with a dimension-measure attach
        return lambda: nation_profit(SF)
    if op == "late_shipment_orders":
        from invoice_extraction_ray.ops.relational import late_shipment_orders

        # the r5 Q4 cross-side EXISTS: one fact-fact orderkey exchange
        return lambda: late_shipment_orders(SF)
    if op == "snm_candidate_pairs":
        from invoice_extraction_ray.ops.dedup import snm_candidate_pairs

        # the sort + boundary raw tasks — the r5 op whose all-to-all is
        # the algorithm itself
        return lambda: snm_candidate_pairs(SF)
    if op == "copurchase_triangles":
        from invoice_extraction_ray.ops.graph import copurchase_triangles

        return lambda: copurchase_triangles(SF)
    if op == "user_active_spans":
        from invoice_extraction_ray.ops.interval import user_active_spans

        # the interval-union coverage op: per-batch pre-merge, one
        # user-shard exchange of merged span rows
        return lambda: user_active_spans(SF)
    if op == "apply_changelog":
        from invoice_extraction_ray.ops.dedup import apply_changelog

        # the CDC merge: one id-shard exchange of slim log rows
        return lambda: apply_changelog(SF)
    if op == "order_details_bucketed":
        # the SMB zero-query-shuffle join: pre-materialize the bucketed
        # layout OUTSIDE the timed region (it is a one-time amortized
        # cost), so the pair measures the query-time bucket-zip itself
        from invoice_extraction_ray.ops.relational import (
            bucketed_layout,
            order_details_bucketed,
        )

        bucketed_layout(
            SF, "orders", "o_orderkey", 32,
            ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        )
        bucketed_layout(
            SF, "lineitem", "l_orderkey", 32,
            ["l_orderkey", "l_linenumber", "l_extendedprice"],
        )
        return lambda: order_details_bucketed(SF)
    raise SystemExit(f"unknown --op {op}")


def run_level(n_nodes: int, op: str = "flagship") -> dict:
    import ray
    from ray.cluster_utils import Cluster

    cluster = Cluster(
        initialize_head=True,
        head_node_args=dict(
            num_cpus=CPUS_PER_NODE, object_store_memory=STORE_BYTES
        ),
    )
    for _ in range(n_nodes - 1):
        cluster.add_node(num_cpus=CPUS_PER_NODE, object_store_memory=STORE_BYTES)
    ray.init(address=cluster.address, include_dashboard=False, logging_level="ERROR")
    cluster.wait_for_nodes()
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa

    def _consume(res) -> int:
        # some ops return an already-executed pa.Table (driver-final ops)
        if isinstance(res, pa.Table):
            return res.num_rows
        return res.count()

    build = _op_dataset(op)
    # warm caches / imports / worker startup outside the timed section
    _consume(build())

    t0 = time.perf_counter()
    rows = _consume(build())
    wall = time.perf_counter() - t0
    ray.shutdown()
    cluster.shutdown()
    return {
        "op": op,
        "nodes": n_nodes,
        "cpus_per_node": CPUS_PER_NODE,
        "sec": round(wall, 3),
        "turns": rows,
        "turns_per_sec": round(rows / wall, 1),
    }


def main() -> None:
    op = "flagship"
    if "--op" in sys.argv:
        op = sys.argv[sys.argv.index("--op") + 1]
    if "--nodes" in sys.argv:
        n = int(sys.argv[sys.argv.index("--nodes") + 1])
        print(json.dumps(run_level(n, op)))
        return
    # fresh process per level — node shutdown leaves GCS state behind otherwise
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env.pop("RAY_ADDRESS", None)
    levels = []
    for n in (1, 2):
        out = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--nodes",
                str(n),
                "--op",
                op,
            ],
            capture_output=True,
            text=True,
            timeout=900,
            env=env,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        levels.append(json.loads(line))
    speedup = levels[1]["turns_per_sec"] / levels[0]["turns_per_sec"]
    print(
        json.dumps(
            {
                "metric": "multinode_scaling_efficiency",
                "op": op,
                "value": round(speedup / 2, 3),
                "unit": "ratio",
                "speedup": round(speedup, 3),
                "levels": levels,
                "sf": os.path.basename(SF),
            }
        )
    )


if __name__ == "__main__":
    main()
