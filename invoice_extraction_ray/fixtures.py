"""Deterministic synthetic transcript fixtures (FIXTURES.md F1/F2).

Follows the reference's own fixture pattern — seeded synthetic generation with
deliberate missing fields and skewed distributions (reference
error_analysis.py:356-376, EDA notebook cell 4) — transplanted to the
transcript schema mandated by BASELINE.json.input_hint:

    (conv_id: string, turn_idx: int32, role: string, text: string,
     tool: string, ts: timestamp[us])

Determinism contract: every conversation's content is a pure function of
``(seed, conv_index)`` via ``random.Random(f"{seed}:{conv_index}")`` (CPython
seeds string arguments with SHA-512 — stable across processes and
PYTHONHASHSEED).  This lets the generator fan out over Ray tasks at bench
scale while producing bit-identical rows regardless of partitioning.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa

from .config import input_schema

# ---------------------------------------------------------------------------
# Master data (FIXTURES.md F2; mirrors reference master_data_example.json)
# ---------------------------------------------------------------------------

ENTITIES = [
    "Sabar Agrotech",
    "Acme Tools",
    "Bharat Tractors",
    "Green Valley Motors",
    "Kisan Agro Works",
    "Mahindra Agencies",
    "Northfield Equipment",
    "Orchid Machinery",
    "Prime Harvest Co",
    "Quantum Farm Supply",
    "Riverside Implements",
    "Shakti Enterprises",
    "Tafe Distributors",
    "Universal Agritech",
    "Vikram Traders",
    "Western Field Services",
]

CODES = [
    "MF-241",
    "TX-1500A",
    "DI-740",
    "XP-2030",
    "AG-555",
    "RK-8800B",
    "NH-3630",
    "JD-5050D",
    "SW-724",
    "PT-425",
    "KB-9100",
    "EC-310C",
]

TOOLS = ["search", "calculator", "browser", "db_query", "code_run"]
TOOL_MISSPELLS = {"search": "serch", "calculator": "calcuator", "browser": "bowser"}

ROLES = ["user", "assistant", "system", "tool"]
ROLE_WEIGHTS = [0.35, 0.40, 0.05, 0.20]

WORDS = (
    "the quick analysis shows that quarterly demand for irrigation units rose "
    "while spare part inventory fell across northern districts and the field "
    "team recommends scheduling maintenance visits before monsoon season to "
    "avoid downtime costs tractor dealership network expansion continues with "
    "steady adoption of precision farming telemetry modules"
).split()

DEVANAGARI_SNIPPETS = [
    "किसान सहायता केंद्र",
    "ट्रैक्टर रखरखाव अनुसूची",
    "वितरक सूचना",
]

# combining-character sequence (e + COMBINING ACUTE) exercises NFC normalization
NFC_SNIPPET = "résumé attaché"

GREETINGS = ["Hi team,", "Hello,", "Dear support,", "Greetings all,", "Hey there,"]
SIGNOFFS = ["Regards,", "Best regards,", "Thanks,", "Thank you,", "Sincerely,", "Cheers,"]
NAMES = ["Priya Sharma", "Alex Chen", "Ravi Patel", "Dana Lee", "Sam Okafor"]
DISCLAIMERS = [
    "This message is CONFIDENTIAL and intended only for the recipient.",
    "Disclaimer: do not distribute without authorization.",
    "[auto-generated message]",
]


def master_data() -> dict:
    """Broadcast side-input (F2): canonical entities, codes, numeric ranges."""
    ranges = {}
    for i, code in enumerate(CODES):
        p_min = 20.0 + 10.0 * i
        ranges[code] = {
            "power": {"min": p_min, "max": p_min + 40.0},
            "amount": {"min": 50_000.0 + 25_000.0 * i, "max": 400_000.0 + 60_000.0 * i},
        }
    return {"entities": list(ENTITIES), "codes": list(CODES), "numeric_ranges": ranges}


# ---------------------------------------------------------------------------
# Per-turn text assembly
# ---------------------------------------------------------------------------


def _perturb(rng: random.Random, s: str) -> str:
    """Light perturbation to exercise the fuzzy-lookup path."""
    roll = rng.random()
    if roll < 0.15 and len(s) > 4:  # swap two adjacent chars
        i = rng.randrange(1, len(s) - 2)
        s = s[:i] + s[i + 1] + s[i] + s[i + 2:]
    elif roll < 0.3:
        s = s.upper()
    elif roll < 0.45:
        s = s.lower()
    return s


def _sentence(rng: random.Random) -> str:
    n = rng.randint(5, 14)
    ws = [rng.choice(WORDS) for _ in range(n)]
    return " ".join(ws).capitalize() + "."


def _anchor_lines(rng: random.Random) -> list[str]:
    lines = []
    if rng.random() < 0.55:
        ent = rng.choice(ENTITIES)
        label = rng.choice(["Dealer", "Vendor", "Supplier"])
        lines.append(f"{label}: {_perturb(rng, ent)}")
        if rng.random() < 0.2:  # duplicated/overlapping candidate for consensus merge
            lines.append(f"dealer services by {ent.title()} Group today")
    if rng.random() < 0.5:
        code = rng.choice(CODES)
        form = rng.choice([code, code.replace("-", " "), code.replace("-", "")])
        lines.append(f"{rng.choice(['Model', 'Code', 'SKU'])}: {form}")
    if rng.random() < 0.45:
        p = round(rng.uniform(8, 220), rng.choice([0, 1]))
        lines.append(f"Power: {p:g} {rng.choice(['HP', 'hp', 'kW'])} rated output")
    if rng.random() < 0.45:
        amt = rng.randint(500, 5_000_000)
        s = f"{amt:,}"
        cur = rng.choice(["₹", "Rs.", "$", ""])
        lines.append(f"{rng.choice(['Total', 'Amount', 'Cost'])}: {cur}{s}")
        if rng.random() < 0.15:
            lines.append(f"grand total ₹ {amt:,} payable")
    return lines


def _code_fence(rng: random.Random) -> list[str]:
    body = [f"x_{i} = {rng.randint(0, 99)}" for i in range(rng.randint(1, 4))]
    return ["```python", *body, "```"]


def _table_block(rng: random.Random) -> list[str]:
    rows = rng.randint(2, 5)
    out = ["item | qty | price"]
    for _ in range(rows):
        out.append(f"{rng.choice(WORDS)} | {rng.randint(1, 9)} | {rng.randint(100, 9999)}")
    return out


def _quote_block(rng: random.Random) -> list[str]:
    return [f"> {_sentence(rng)}" for _ in range(rng.randint(1, 3))]


def _json_payload(rng: random.Random, tool: str) -> str:
    body = f'{{"tool": "{tool}", "status": "ok", "rows": {rng.randint(0, 500)}}}'
    roll = rng.random()
    if roll < 0.08:  # recoverable: smart quotes
        body = body.replace('"', "”", 2).replace('"', "“", 1)
    elif roll < 0.12:  # malformed beyond recovery
        body = body[:-1]
    return body


def make_turn_text(rng: random.Random, role: str, tool: str | None) -> str | None:
    """Deterministic per-turn text per the FIXTURES.md F1 content recipe."""
    roll = rng.random()
    if roll < 0.01:
        return None
    if roll < 0.02:
        return ""

    lines: list[str] = []
    # 1. boilerplate preamble
    if rng.random() < 0.6:
        lines.append(rng.choice(GREETINGS))
        if rng.random() < 0.25:  # header-zone org mention (E3 middle strategy)
            org = rng.choice(ENTITIES + ["Apex Motors", "Zenith Industries", "Nova Traders"])
            lines.append(f"Forwarded from {org} front desk")
        if rng.random() < 0.3:
            lines.append(rng.choice(DISCLAIMERS))
        lines.append("")

    # 2-5. main content: prose + anchors + region blocks + noise
    for _ in range(rng.randint(1, 4)):
        lines.append(_sentence(rng))
    if rng.random() < 0.1:
        lines.append(rng.choice(DEVANAGARI_SNIPPETS))
    if rng.random() < 0.05:
        lines.append(NFC_SNIPPET)
    if rng.random() < 0.05:
        lines.append("5 &lt; 7 &amp; x &gt; 2")  # HTML entities
    lines.extend(_anchor_lines(rng))
    if rng.random() < 0.25:
        lines.extend(_code_fence(rng))
    if rng.random() < 0.2:
        lines.extend(_table_block(rng))
    if rng.random() < 0.2:
        lines.extend(_quote_block(rng))
    if role == "tool" and tool is not None:
        lines.append(_json_payload(rng, tool))

    # trailer boilerplate
    if rng.random() < 0.5:
        lines.append("")
        if rng.random() < 0.3:
            lines.append("---")
        lines.append(rng.choice(SIGNOFFS))
        lines.append(rng.choice(NAMES))

    text = "\n".join(lines)
    # raw-text noise: CRLF and trailing spaces to exercise normalization
    if rng.random() < 0.15:
        text = text.replace("\n", "\r\n")
    if rng.random() < 0.15:
        text = text.replace(".", ".  \t", 1) + "   "
    if rng.random() < 0.05:
        text = text + "\n\n\n\n" + _sentence(rng)
    return text


# ---------------------------------------------------------------------------
# Conversation / table generation
# ---------------------------------------------------------------------------

_EPOCH = datetime(2026, 1, 1)


def _turn_count(rng: random.Random, mean_turns: int) -> int:
    """Zipf-ish skew: ~1% of conversations are 20-60x the median."""
    if rng.random() < 0.01:
        return rng.randint(mean_turns * 20, mean_turns * 60)
    return max(1, int(rng.expovariate(1.0 / mean_turns)) + 1)


def gen_conversation(seed: int, conv_index: int, mean_turns: int = 6) -> list[dict]:
    """All rows of one conversation — pure function of (seed, conv_index)."""
    rng = random.Random(f"{seed}:{conv_index}")
    conv_id = f"conv-{conv_index:08d}"
    n = _turn_count(rng, mean_turns)
    base_ts = _EPOCH + timedelta(seconds=conv_index * 3601)
    rows = []
    for t in range(n):
        role = rng.choices(ROLES, ROLE_WEIGHTS)[0]
        tool = None
        if role == "tool":
            tool = rng.choice(TOOLS)
            if rng.random() < 0.05:
                tool = TOOL_MISSPELLS.get(tool, tool)
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": role,
                "text": make_turn_text(rng, role, tool),
                "tool": tool,
                "ts": base_ts + timedelta(seconds=7 * t),
            }
        )
    return rows


def rows_to_table(rows: list[dict]) -> pa.Table:
    schema = input_schema()
    cols = {name: [r[name] for r in rows] for name in schema.names}
    return pa.Table.from_pydict(cols, schema=schema)


def gen_transcripts(
    n_convs: int, mean_turns: int = 6, seed: int = 42, shuffle: bool = True
) -> pa.Table:
    """Small-scale driver-side generation (tests).  Rows are deterministically
    shuffled across the table so pipelines must re-establish turn ordering
    rather than inherit it (FIXTURES.md F1)."""
    rows: list[dict] = []
    for i in range(n_convs):
        rows.extend(gen_conversation(seed, i, mean_turns))
    if shuffle:
        perm_rng = np.random.default_rng(seed)
        order = perm_rng.permutation(len(rows))
        rows = [rows[i] for i in order]
    return rows_to_table(rows)


def write_transcripts_parquet(
    out_dir: str,
    n_convs: int,
    mean_turns: int = 6,
    seed: int = 42,
    convs_per_file: int = 2000,
) -> list[str]:
    """Materialize a transcript corpus as a directory of Parquet shards.

    Shard i holds conversations [i*convs_per_file, (i+1)*convs_per_file) —
    a deterministic function of the inputs, so checkpoint manifests line up
    across runs (SURVEY.md §7.4).  Each shard is generated independently;
    at bench scale this is fanned out over Ray tasks by the caller.
    """
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    shards = [
        (shard, lo, min(lo + convs_per_file, n_convs))
        for shard, lo in enumerate(range(0, n_convs, convs_per_file))
    ]

    def _write_shard(shard: int, lo: int, hi: int) -> str:
        rows: list[dict] = []
        for i in range(lo, hi):
            rows.extend(gen_conversation(seed, i, mean_turns))
        # shuffle within shard so turn order is not inherited from layout
        perm_rng = np.random.default_rng(seed + shard)
        order = perm_rng.permutation(len(rows))
        rows = [rows[i] for i in order]
        path = os.path.join(out_dir, f"transcripts-{shard:05d}.parquet")
        pq.write_table(rows_to_table(rows), path)
        return path

    # fan shard generation out over Ray when a session exists and the corpus
    # is big enough to matter — each shard is a pure function of its inputs,
    # so parallel and serial generation are bit-identical
    try:
        import ray

        use_ray = ray.is_initialized() and len(shards) > 1
    except ImportError:  # pragma: no cover
        use_ray = False
    if use_ray:
        gen_task = ray.remote(_write_shard)
        return ray.get([gen_task.remote(s, lo, hi) for s, lo, hi in shards])
    return [_write_shard(s, lo, hi) for s, lo, hi in shards]
