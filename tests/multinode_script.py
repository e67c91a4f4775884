"""2-virtual-node validation script (run by tests/test_multinode.py in a
FRESH process — never under the session-scoped single-node ray fixture).

Uses ray.cluster_utils.Cluster: two nodes with separate object stores, so
the seal shuffle, the checkpointed job, and the classifier's broadcast
master path all exercise real cross-node object transfer — the shape the
engine claims to scale to but single-box fresh-process pairs never test.
"""

import shutil

import pyarrow as pa
import ray
from ray.cluster_utils import Cluster

cluster = Cluster(
    initialize_head=True,
    head_node_args=dict(num_cpus=2, object_store_memory=256 * 1024**2),
)
cluster.add_node(num_cpus=2, object_store_memory=256 * 1024**2)
ray.init(address=cluster.address, include_dashboard=False, logging_level="ERROR")
cluster.wait_for_nodes()
assert int(ray.cluster_resources().get("CPU", 0)) == 4, ray.cluster_resources()
assert len([n for n in ray.nodes() if n["Alive"]]) == 2, ray.nodes()

from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False


# --- 1) prove simultaneous scheduling spans BOTH nodes ---------------------
# barrier: 4 one-cpu tasks must run AT ONCE; a 2-cpu node cannot host them
@ray.remote
class Barrier:
    def __init__(self, n):
        self.n = n
        self.c = 0

    def arrive(self):
        self.c += 1

    def done(self):
        return self.c >= self.n


@ray.remote(num_cpus=1)
def hold(b):
    import time

    ray.get(b.arrive.remote())
    while not ray.get(b.done.remote()):
        time.sleep(0.05)
    return ray.get_runtime_context().get_node_id()


bar = Barrier.options(num_cpus=0).remote(4)
node_ids = set(ray.get([hold.remote(bar) for _ in range(4)], timeout=120))
assert len(node_ids) == 2, f"tasks did not span both nodes: {node_ids}"
print("both nodes scheduled tasks:", len(node_ids))

# --- 2) checkpointed job end-to-end across nodes + resume no-op ------------
from invoice_extraction_ray.fixtures import write_transcripts_parquet
from invoice_extraction_ray.state.checkpoint import run_checkpointed

shutil.rmtree("/tmp/mn", ignore_errors=True)
paths = write_transcripts_parquet("/tmp/mn/in", 120, convs_per_file=30, seed=23)
s1 = run_checkpointed(paths, "/tmp/mn/out", files_per_chunk=1)
assert s1["chunks_run"] == 4 and s1["rows"] > 0, s1
s2 = run_checkpointed(paths, "/tmp/mn/out", files_per_chunk=1)
assert s2["chunks_skipped"] == 4 and s2["chunks_run"] == 0, s2
print("checkpointed job:", s1)

# --- 3) cross-node value equality: salted-groupby seal vs pure oracle ------
from invoice_extraction_ray import fixtures as F
from invoice_extraction_ray import oracle as O
from invoice_extraction_ray.pipelines.extract import build_pipeline

corpus = F.gen_transcripts(120, seed=23)
exp_rows = O.extract_table(corpus.to_pylist())
FLAT = ["conv_id", "turn_idx", "extracted_text", "confidence", "notes"]
_FLAT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("extracted_text", pa.string()),
        ("confidence", pa.float32()),  # engine emits float32, like config.output_schema
        ("notes", pa.string()),
    ]
)
exp = pa.Table.from_pydict(
    {k: [r[k] for r in exp_rows] for k in FLAT}, schema=_FLAT_SCHEMA
).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])

ds = build_pipeline(corpus, hot_threshold=50, seal_strategy="groupby", flat_output=True)
parts = [t for t in (ray.get(r) for r in ds.to_arrow_refs()) if t.num_rows]
act = (
    pa.concat_tables(parts, promote_options="permissive")
    .select(FLAT)
    .sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
)
assert act.num_rows == exp.num_rows, (act.num_rows, exp.num_rows)
for nm in FLAT:
    a = exp.column(nm).combine_chunks()
    b = act.column(nm).cast(a.type).combine_chunks()
    assert a.equals(b), f"column {nm} differs across nodes"
print("cross-node seal output == oracle:", act.num_rows, "rows")

# --- iterative message passing across nodes: pagerank's per-superstep
# all-to-alls move edge/message rows between the two object stores
import numpy as np
import pyarrow.parquet as pq

from invoice_extraction_ray.ops.graph import pagerank

SF = "/root/testdata/sf0.001"
li = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_partkey", "l_suppkey"])
pairs = sorted(
    set(zip(li.column("l_partkey").to_pylist(), li.column("l_suppkey").to_pylist()))
)
edges = [(p * 2, s * 2 + 1) for p, s in pairs] + [(s * 2 + 1, p * 2) for p, s in pairs]
deg = {}
for u, _ in edges:
    deg[u] = deg.get(u, 0) + 1
r = {u: 1_000_000 for u in deg}
for _ in range(3):
    inc = {}
    for u, v in edges:
        inc[v] = inc.get(v, 0) + r[u] // deg[u]
    r = {v: 150_000 + 85 * m // 100 for v, m in inc.items()}
want = sorted(
    ("part" if v % 2 == 0 else "supplier", v >> 1, rv) for v, rv in r.items()
)
got = sorted(
    (row["kind"], row["key"], row["rank_ppm"]) for row in pagerank(SF).take_all()
)
assert got == want, "pagerank differs on the 2-node cluster"
print("cross-node pagerank == python power iteration:", len(got), "vertices")

ray.shutdown()
cluster.shutdown()
print("MULTINODE OK")
