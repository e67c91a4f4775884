"""Multi-node-shaped validation: the checkpointed job, the salted-groupby
seal shuffle, and the broadcast master path on a 2-virtual-node
ray.cluster_utils.Cluster with SEPARATE object stores (cross-node object
transfer — the claim single-box scaling pairs can't test).

Runs in a subprocess: the virtual cluster needs to own its Ray instance and
must not collide with the session-scoped single-node fixture."""

import os
import subprocess
import sys


def test_two_virtual_node_cluster():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(repo, "tests", "multinode_script.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("RAY_ADDRESS", None)  # the script addresses its own cluster
    proc = subprocess.run(
        [sys.executable, script],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=repo,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "MULTINODE OK" in proc.stdout
    assert "both nodes scheduled tasks: 2" in proc.stdout
