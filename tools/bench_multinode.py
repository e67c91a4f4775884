"""Two-CLUSTER-SIZE scaling evidence on virtual nodes (BASELINE.json
north_rule): run the flagship extraction on a ray.cluster_utils.Cluster
with 1 node and with 2 nodes (same per-node shape: 2 cpus + its own object
store), fresh process per level, same input — the closest in-sandbox
analogue to "N nodes vs 2N nodes" because each virtual node has a separate
plasma store, so the 2-node run pays real cross-node object transfer for
the seal shuffle and broadcast.

Usage: PYTHONPATH=. python tools/bench_multinode.py            # both levels
       PYTHONPATH=. python tools/bench_multinode.py --nodes N  # one level
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


def run_level(n_nodes: int) -> dict:
    import ray
    from ray.cluster_utils import Cluster

    cluster = Cluster(
        initialize_head=True,
        head_node_args=dict(
            num_cpus=CPUS_PER_NODE, object_store_memory=512 * 1024**2
        ),
    )
    for _ in range(n_nodes - 1):
        cluster.add_node(num_cpus=CPUS_PER_NODE, object_store_memory=512 * 1024**2)
    ray.init(address=cluster.address, include_dashboard=False, logging_level="ERROR")
    cluster.wait_for_nodes()
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from invoice_extraction_ray.corpus import transcripts_for
    from invoice_extraction_ray.pipelines.extract import build_pipeline

    paths = transcripts_for(SF)
    # warm the corpus cache / imports outside the timed section
    build_pipeline(paths, seal_strategy="aligned", flat_output=True).limit(1).take(1)

    t0 = time.perf_counter()
    ds = build_pipeline(paths, seal_strategy="aligned", flat_output=True)
    turns = ds.count()
    wall = time.perf_counter() - t0
    ray.shutdown()
    cluster.shutdown()
    return {
        "nodes": n_nodes,
        "cpus_per_node": CPUS_PER_NODE,
        "sec": round(wall, 3),
        "turns": turns,
        "turns_per_sec": round(turns / wall, 1),
    }


def main() -> None:
    if "--nodes" in sys.argv:
        n = int(sys.argv[sys.argv.index("--nodes") + 1])
        print(json.dumps(run_level(n)))
        return
    # fresh process per level — node shutdown leaves GCS state behind otherwise
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env.pop("RAY_ADDRESS", None)
    levels = []
    for n in (1, 2):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--nodes", str(n)],
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
