"""Materialized pure-Python-oracle outputs for the driver's DuckDB value gate.

The flagship extraction pipeline cannot be rewritten in SQL (regex banks,
greedy consensus merge, fuzzy lookups) — but the driver's correctness gate
only needs a DuckDB-queryable EXPECTED result.  So we run the independent
row-at-a-time oracle (`oracle.py`, the same one pytest byte-compares the
engine against) over the sf-matched transcript corpus ON THE DRIVER, write
its per-turn output (plus the consensus columns) to parquet, and the
`oracle_sql()` entries become plain SELECTs / aggregations over that parquet
— moving all eight `extract_*` queries from rows-only into the hard gate.

The cache key includes a content hash of oracle.py + config.py + fixtures.py
so stale expectations can never survive a semantics change.
"""

from __future__ import annotations

import hashlib
import os

_CACHE_ROOT = os.environ.get("IER_ORACLE_CACHE", "/tmp/ier_oracle")


def _code_hash() -> str:
    here = os.path.dirname(__file__)
    h = hashlib.sha256()
    # oracle_gate.py itself is in the hash: an edit to the expectation-table
    # construction below must invalidate cached parquet too
    for name in ("oracle.py", "config.py", "fixtures.py", "corpus.py", "oracle_gate.py"):
        with open(os.path.join(here, name), "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:12]


def oracle_outputs_for(sf_dir: str) -> dict[str, str]:
    """Return {"turns": path, "consensus": path} of the oracle's expected
    outputs for sf_dir's transcript corpus, generating them (driver-side,
    pure Python — this IS the oracle) on first use."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from . import oracle as O
    from .corpus import SEED, SF_CONVS, sf_name, transcripts_for

    name = sf_name(sf_dir)
    n_convs = SF_CONVS.get(name, 150)
    out_dir = os.path.join(_CACHE_ROOT, f"{name}-{n_convs}-{SEED}-{_code_hash()}")
    turns_path = os.path.join(out_dir, "turns.parquet")
    cons_path = os.path.join(out_dir, "consensus.parquet")
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return {"turns": turns_path, "consensus": cons_path}

    os.makedirs(out_dir, exist_ok=True)
    rows: list[dict] = []
    for p in transcripts_for(sf_dir):
        rows.extend(pq.read_table(p).to_pylist())
    out = O.extract_table(rows)
    cons = [O.consensus_turn(r) for r in out]

    conv = pa.array([r["conv_id"] for r in out], pa.string())
    turn = pa.array([r["turn_idx"] for r in out], pa.int32())
    conf_pct = np.array([int(round(r["confidence"] * 100)) for r in out], np.int64)

    def flag(fn):
        return pa.array([fn(r["fields"]) for r in out], pa.bool_())

    turns = pa.table(
        {
            "conv_id": conv,
            "turn_idx": turn,
            "extracted_text": pa.array([r["extracted_text"] for r in out], pa.string()),
            # float32 like the engine's output schema, bit-identical values
            "confidence": pa.array([r["confidence"] for r in out], pa.float32()),
            "notes": pa.array([r["notes"] for r in out], pa.string()),
            "conf_pct": pa.array(conf_pct),
            "entity_filled": flag(lambda f: f["entity"] is not None),
            "code_filled": flag(lambda f: f["code"] is not None),
            "power_filled": flag(lambda f: f["power"] is not None),
            "amount_filled": flag(lambda f: f["amount"] is not None),
            "region_a_present": flag(lambda f: bool(f["region_a"]["present"])),
            "region_b_present": flag(lambda f: bool(f["region_b"]["present"])),
        }
    )
    consensus = pa.table(
        {
            "conv_id": conv,
            "turn_idx": turn,
            "final_confidence": pa.array(
                [c["final_confidence"] for c in cons], pa.float64()
            ),
            "anomalies": pa.array([c["anomalies"] for c in cons], pa.string()),
        }
    )
    pq.write_table(turns, turns_path + ".tmp")
    os.rename(turns_path + ".tmp", turns_path)
    pq.write_table(consensus, cons_path + ".tmp")
    os.rename(cons_path + ".tmp", cons_path)
    with open(done, "w") as f:
        f.write(str(len(out)))
    return {"turns": turns_path, "consensus": cons_path}
