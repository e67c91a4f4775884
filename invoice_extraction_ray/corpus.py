"""Deterministic transcript corpora tied to the testdata scale factors.

BASELINE.json's input is a transcript table that doesn't exist in
/root/testdata — it is synthesized deterministically (fixtures.py) at a scale
matched to each sf directory and cached under /tmp so repeated driver/bench
runs reuse the same parquet shards.
"""

from __future__ import annotations

import os

from .fixtures import write_transcripts_parquet

# conversations per scale factor (mean ~6-8 turns/conv incl. Zipfian tail)
SF_CONVS = {
    "sf0.001": 150,
    "sf0.01": 1500,
    "sf0.1": 15000,
    # dedicated --scaling corpus: ~8x sf0.1 (~1.1M turns) so the job carries
    # enough compute to amortize fixed costs (actor startup, sort sampling)
    # at both parallelism levels
    "scaling": 120000,
}
SEED = 42
CACHE_ROOT = os.environ.get("IER_CORPUS_CACHE", "/tmp/ier_transcripts")


def sf_name(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir))


def transcripts_for(sf_dir: str, convs_per_file: int = 2000) -> list[str]:
    """Parquet shard paths for the transcript corpus matching sf_dir's scale
    (generated on first use, cached)."""
    name = sf_name(sf_dir)
    n_convs = SF_CONVS.get(name, 150)
    out_dir = os.path.join(CACHE_ROOT, f"{name}-{n_convs}-{SEED}")
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        import glob

        return sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
    paths = write_transcripts_parquet(
        out_dir, n_convs, convs_per_file=convs_per_file, seed=SEED
    )
    with open(done, "w") as f:
        f.write(str(len(paths)))
    return paths
