"""Pure-Python row-at-a-time ORACLE for per-turn main-content extraction.

This is the correctness reference the Ray Data engine is tested against
(pytest asserts byte-equality of `extracted_text`, span-set equality,
confidence equality after stable (conv_id, turn_idx) ordering — SURVEY.md §5).
It is intentionally simple, sequential, and unoptimized; the engine in
`invoice_extraction_ray.stages` reimplements the same semantics batched and
vectorized, sharing only the constants in `invoice_extraction_ray.config`.

Semantics (transcript-domain analogues of the reference invoice pipeline):
  1. normalize        <- reference preprocess.py:15-70
  2. boilerplate strip<- reference ocr.py:280-306 (header/body/footer layout)
  3. region detection <- reference vision.py:44-110 (code fence / table grid /
                         quote chain / JSON tool payload with recovery per
                         reference extractor.py:147-171)
  4. anchor detection <- reference extractors.py:94-311 (multi-strategy,
                         confidence-ranked candidates)
  5. consensus merge  <- reference ocr.py:134-233 (IoU + text-similarity
                         grouping, source-priority resolution)
  6. validation       <- reference validators.py:11-341 (fuzzy entity >=0.90,
                         exact code, +/-5% numeric ranges, forced-present
                         region_b quirk per validators.py:113-130)
  7. confidence/notes <- reference confidence.py:6-73 (caps 97/95)
"""

from __future__ import annotations

import difflib
import json
import math
import re
import unicodedata
from dataclasses import dataclass

from . import config as C

# ---------------------------------------------------------------------------
# 1. normalize
# ---------------------------------------------------------------------------

_NORM_STEPS = [(re.compile(p), r) for p, r in C.NORMALIZE_REGEX_STEPS]


def normalize_text(text: str | None) -> str:
    if text is None:
        return ""
    t = unicodedata.normalize("NFC", text)
    for lit, rep in C.HTML_ENTITIES:
        t = t.replace(lit, rep)
    for pat, rep in _NORM_STEPS:
        t = pat.sub(rep, t)
    return t


# ---------------------------------------------------------------------------
# 2. boilerplate strip
# ---------------------------------------------------------------------------

_GREETING = re.compile(C.GREETING_RE)
_SIGNOFF = re.compile(C.SIGNOFF_RE)
_DISCLAIMER = re.compile(C.DISCLAIMER_RE)
_SEPARATOR = re.compile(C.SEPARATOR_RE)
_COLLAPSE = re.compile(r"\n{3,}")


def strip_boilerplate(norm: str) -> str:
    if not norm:
        return ""
    lines = norm.split("\n")
    n = len(lines)
    h = math.ceil(C.HEADER_FRAC * n)
    f = math.ceil(C.FOOTER_FRAC * n)
    kept: list[str] = []
    prev_dropped_signoff = False
    for i, ln in enumerate(lines):
        in_hdr = i < h
        in_ftr = i >= n - f
        drop = False
        if in_hdr or in_ftr:
            if (
                _GREETING.search(ln)
                or _SIGNOFF.search(ln)
                or _DISCLAIMER.search(ln)
                or _SEPARATOR.search(ln)
            ):
                drop = True
            elif (
                in_ftr
                and prev_dropped_signoff
                and 0 < len(ln.strip()) <= C.SIGNATURE_MAX_LEN
            ):
                drop = True
        prev_dropped_signoff = drop and bool(_SIGNOFF.search(ln))
        if not drop:
            kept.append(ln)
    out = "\n".join(kept)
    out = _COLLAPSE.sub("\n\n", out)
    return out.strip("\n")


# ---------------------------------------------------------------------------
# Span candidates
# ---------------------------------------------------------------------------


@dataclass
class Span:
    label: str
    start: int
    end: int
    value: str
    conf: float
    method: str


def _line_offsets(norm: str) -> tuple[list[str], list[int]]:
    lines = norm.split("\n")
    offs = []
    pos = 0
    for ln in lines:
        offs.append(pos)
        pos += len(ln) + 1
    return lines, offs


# ---------------------------------------------------------------------------
# 3. region detection
# ---------------------------------------------------------------------------


def detect_regions(norm: str, role: str | None) -> list[Span]:
    spans: list[Span] = []
    if not norm:
        return spans
    lines, offs = _line_offsets(norm)

    def block_span(a: int, b: int) -> tuple[int, int]:
        return offs[a], offs[b] + len(lines[b])

    # code fences: sequential ``` pairing; unclosed fence ignored
    fence_idx = [i for i, ln in enumerate(lines) if ln.startswith("```")]
    for k in range(0, len(fence_idx) - 1, 2):
        a, b = fence_idx[k], fence_idx[k + 1]
        s, e = block_span(a, b)
        spans.append(Span("region_code", s, e, "", C.REGION_CODE_CONF, "fence"))

    # table grid: maximal runs of >=TABLE_MIN_LINES lines with >=TABLE_MIN_PIPES '|'
    run_start = None
    for i in range(len(lines) + 1):
        is_tbl = i < len(lines) and lines[i].count("|") >= C.TABLE_MIN_PIPES
        if is_tbl and run_start is None:
            run_start = i
        elif not is_tbl and run_start is not None:
            if i - run_start >= C.TABLE_MIN_LINES:
                s, e = block_span(run_start, i - 1)
                spans.append(Span("region_table", s, e, "", C.REGION_TABLE_CONF, "grid"))
            run_start = None

    # quote chains: maximal runs of lines starting with '>'
    run_start = None
    for i in range(len(lines) + 1):
        is_q = i < len(lines) and (lines[i].startswith("> ") or lines[i] == ">")
        if is_q and run_start is None:
            run_start = i
        elif not is_q and run_start is not None:
            s, e = block_span(run_start, i - 1)
            spans.append(Span("region_quote", s, e, "", C.REGION_QUOTE_CONF, "quote"))
            run_start = None

    # JSON tool payload (role == "tool"): outermost {...}; graceful recovery
    if role == "tool":
        first = norm.find("{")
        last = norm.rfind("}")
        if 0 <= first < last:
            cand = norm[first : last + 1]
            try:
                json.loads(cand)
                spans.append(
                    Span("region_json", first, last + 1, "", C.REGION_JSON_CONF, "json")
                )
            except ValueError:
                fixed = cand
                for bad, good in C.JSON_RECOVERY_TRANS.items():
                    fixed = fixed.replace(bad, good)
                try:
                    json.loads(fixed)
                    spans.append(
                        Span(
                            "region_json",
                            first,
                            last + 1,
                            "",
                            C.REGION_JSON_RECOVERED_CONF,
                            "json_recovered",
                        )
                    )
                except ValueError:
                    pass
    return spans


# ---------------------------------------------------------------------------
# 4. anchor detection
# ---------------------------------------------------------------------------

_ANCHORS = [
    (label, re.compile(pat), conf, method)
    for label, pat, conf, method in C.ANCHOR_PATTERNS
]
_H_ENT_KEY = re.compile(C.HEURISTIC_ENTITY_KEYWORD_RE)
_H_TITLECASE = re.compile(C.HEURISTIC_TITLECASE_RE)
_H_POWER = re.compile(C.HEURISTIC_POWER_RE)
_NER_ORG = re.compile(C.NER_ORG_RE)


def detect_anchors(norm: str) -> list[Span]:
    spans: list[Span] = []
    if not norm:
        return spans
    for label, pat, conf, method in _ANCHORS:
        for m in pat.finditer(norm):
            spans.append(Span(label, m.start(1), m.end(1), m.group(1), conf, method))
    # heuristic entity: keyword line without ':'/'=' containing a TitleCase run
    lines, offs = _line_offsets(norm)
    for i, ln in enumerate(lines):
        if _H_ENT_KEY.search(ln) and ":" not in ln and "=" not in ln:
            m = _H_TITLECASE.search(ln)
            if m:
                spans.append(
                    Span(
                        "entity",
                        offs[i] + m.start(1),
                        offs[i] + m.end(1),
                        m.group(1),
                        C.HEURISTIC_ENTITY_CONF,
                        "heuristic",
                    )
                )
    # E3 middle strategy (reference spaCy ORG-NER on header text at .75,
    # extractors.py:115-125): org-suffix gazetteer over HEADER-ZONE lines
    h = math.ceil(C.HEADER_FRAC * len(lines))
    for i, ln in enumerate(lines[:h]):
        for m in _NER_ORG.finditer(ln):
            spans.append(
                Span(
                    "entity",
                    offs[i] + m.start(1),
                    offs[i] + m.end(1),
                    m.group(1),
                    C.NER_ENTITY_CONF,
                    "ner",
                )
            )
    # heuristic power: number within 20 chars after 'power'
    for m in _H_POWER.finditer(norm):
        spans.append(
            Span(
                "power",
                m.start(1),
                m.end(1),
                m.group(1),
                C.HEURISTIC_POWER_CONF,
                "proximity",
            )
        )
    return spans


# ---------------------------------------------------------------------------
# 5. consensus merge
# ---------------------------------------------------------------------------


def _iou(a: Span, b: Span) -> float:
    inter = max(0, min(a.end, b.end) - max(a.start, b.start))
    union = max(a.end, b.end) - min(a.start, b.start)
    return inter / union if union > 0 else 0.0


def _sim(a: str, b: str) -> float:
    return difflib.SequenceMatcher(None, a.lower(), b.lower()).ratio()


def merge_spans(cands: list[Span]) -> list[Span]:
    """Greedy grouping in canonical candidate order (SURVEY.md §7.4: the
    reference's merge is input-order-sensitive, ocr.py:156-177 — we fix a
    canonical ordering so the result is partition-invariant)."""
    cands = sorted(
        cands,
        key=lambda c: (c.start, c.end, C.METHOD_PRIORITY[c.method], c.label),
    )
    groups: list[list[Span]] = []
    for c in cands:
        placed = False
        for g in groups:
            rep = g[0]
            if rep.label != c.label:
                continue
            if _iou(rep, c) > C.MERGE_IOU_THRESHOLD or (
                rep.value
                and c.value
                and _sim(rep.value, c.value) > C.MERGE_TEXT_SIM_THRESHOLD
            ):
                g.append(c)
                placed = True
                break
        if not placed:
            groups.append([c])
    merged: list[Span] = []
    for g in groups:
        best = min(
            g,
            key=lambda c: (-c.conf, c.start, c.end - c.start, C.METHOD_PRIORITY[c.method]),
        )
        conf = round(sum(c.conf for c in g) / len(g), C.CONF_ROUND_DECIMALS)
        merged.append(Span(best.label, best.start, best.end, best.value, conf, best.method))
    merged.sort(key=lambda s: (s.start, s.end, s.label))
    return merged


# ---------------------------------------------------------------------------
# 6. validation + field assembly (master-data broadcast lookups)
# ---------------------------------------------------------------------------

_CODE_NORM = re.compile(r"^([A-Z]{2,4})[ -]?(\d{3,5}[A-Z]?)$")
_WS = re.compile(r"\s+")


def normalize_code(raw: str) -> str:
    v = _WS.sub(" ", raw.strip()).upper()
    m = _CODE_NORM.match(v)
    if m:
        return f"{m.group(1)}-{m.group(2)}"
    return v


def validate_entity(raw: str, master: dict) -> str | None:
    v = _WS.sub(" ", raw.strip())
    if v.lower() in C.ENTITY_BLOCKLIST:
        return None
    best_name, best_ratio = None, -1.0
    for name in master["entities"]:
        r = _sim(v, name)
        if r > best_ratio:
            best_name, best_ratio = name, r
    if best_ratio >= C.FUZZY_ENTITY_THRESHOLD:
        return best_name
    return v


def validate_code(raw: str, master: dict) -> tuple[str | None, bool]:
    norm = normalize_code(raw)
    if norm in master["_code_set"]:
        return norm, True
    v = _WS.sub(" ", raw.strip()).upper()
    if C.CODE_MIN_LEN <= len(v) <= C.CODE_MAX_LEN:
        return v, False
    return None, False


def _range_ok(x: float, lo: float, hi: float) -> bool:
    return lo * (1 - C.RANGE_TOLERANCE) <= x <= hi * (1 + C.RANGE_TOLERANCE)


def validate_power(raw: str, code: str | None, code_valid: bool, master: dict) -> float | None:
    try:
        p = float(raw)
    except ValueError:
        return None
    if code_valid and code in master["numeric_ranges"]:
        r = master["numeric_ranges"][code]["power"]
        return p if _range_ok(p, r["min"], r["max"]) else None
    lo, hi = C.POWER_GLOBAL_RANGE
    return p if lo <= p <= hi else None


def validate_amount(raw: str, code: str | None, code_valid: bool, master: dict) -> float | None:
    try:
        a = float(raw.replace(",", ""))
    except ValueError:
        return None
    if code_valid and code in master["numeric_ranges"]:
        r = master["numeric_ranges"][code]["amount"]
        return a if _range_ok(a, r["min"], r["max"]) else None
    lo, hi = C.AMOUNT_GLOBAL_RANGE
    return a if lo <= a <= hi else None


def prepare_master(master: dict) -> dict:
    m = dict(master)
    m["_code_set"] = set(master["codes"])
    return m


def _best(spans: list[Span], label: str) -> Span | None:
    cs = [s for s in spans if s.label == label]
    if not cs:
        return None
    return min(cs, key=lambda c: (-c.conf, c.start, c.end - c.start))


def assemble_fields(merged: list[Span], master: dict) -> dict:
    ent_s = _best(merged, "entity")
    code_s = _best(merged, "code")
    pow_s = _best(merged, "power")
    amt_s = _best(merged, "amount")

    code, code_valid = (None, False)
    if code_s is not None:
        code, code_valid = validate_code(code_s.value, master)
    entity = validate_entity(ent_s.value, master) if ent_s is not None else None
    power = (
        validate_power(pow_s.value, code, code_valid, master) if pow_s is not None else None
    )
    amount = (
        validate_amount(amt_s.value, code, code_valid, master) if amt_s is not None else None
    )

    code_regions = sorted(
        (s for s in merged if s.label == "region_code"), key=lambda s: s.start
    )
    table_regions = sorted(
        (s for s in merged if s.label == "region_table"), key=lambda s: s.start
    )
    region_a = {
        "present": bool(code_regions),
        "span": [code_regions[0].start, code_regions[0].end] if code_regions else None,
    }
    # forced-present business rule (reference validators.py:113-130)
    region_b = {
        "present": True if C.FORCE_REGION_B_PRESENT else bool(table_regions),
        "span": [table_regions[0].start, table_regions[0].end] if table_regions else None,
    }
    return {
        "entity": entity,
        "code": code,
        "power": power,
        "amount": amount,
        "region_a": region_a,
        "region_b": region_b,
    }


# ---------------------------------------------------------------------------
# 7. confidence + notes (reference confidence.py:6-73)
# ---------------------------------------------------------------------------


def score_confidence(fields: dict) -> tuple[float, str]:
    filled = {
        "entity": fields["entity"] is not None,
        "code": fields["code"] is not None,
        "power": fields["power"] is not None,
        "amount": fields["amount"] is not None,
        "region_a": bool(fields["region_a"]["present"]),
        "region_b": bool(fields["region_b"]["present"]),
    }
    n = sum(filled.values())
    pct = round(n / 6 * 100)
    if n == 6:
        pct = min(pct, C.CONF_CAP_ALL)
    elif n >= 5:
        pct = min(pct, C.CONF_CAP_MOST)
    missing = [f for f in C.FIELD_ORDER if not filled[f]]
    if missing:
        notes = C.NOTES_MISSING_FMT.format(missing=", ".join(missing))
    else:
        notes = C.NOTES_ALL
    return pct / 100.0, notes


# ---------------------------------------------------------------------------
# full per-turn extraction
# ---------------------------------------------------------------------------


def extract_turn(row: dict, master: dict) -> dict:
    """row: dict with conv_id, turn_idx, role, text, tool.  master: output of
    prepare_master(). Returns one output row matching config.output_schema()."""
    norm = normalize_text(row.get("text"))
    extracted = strip_boilerplate(norm)
    cands = detect_regions(norm, row.get("role")) + detect_anchors(norm)
    merged = merge_spans(cands)
    fields = assemble_fields(merged, master)
    confidence, notes = score_confidence(fields)
    return {
        "conv_id": row["conv_id"],
        "turn_idx": row["turn_idx"],
        "extracted_text": extracted,
        "spans": [
            {
                "label": s.label,
                "start": s.start,
                "end": s.end,
                "value": s.value,
                "conf": s.conf,
                "method": s.method,
            }
            for s in merged
        ],
        "fields": fields,
        "confidence": confidence,
        "notes": notes,
    }


def extract_table(rows: list[dict], master: dict | None = None) -> list[dict]:
    """Oracle over a list of input rows; output sorted by (conv_id, turn_idx)."""
    from .fixtures import master_data

    m = prepare_master(master if master is not None else master_data())
    out = [extract_turn(r, m) for r in rows]
    out.sort(key=lambda r: (r["conv_id"], r["turn_idx"]))
    return out


# ---------------------------------------------------------------------------
# consensus: cross-field consistency + weighted confidence + anomalies
# (reference consensus.py:64-194 E16/A6 and 224-255 E17)
# ---------------------------------------------------------------------------


def _f32(x: float) -> float:
    """Arrow stores span/turn confidences as float32; mirror that exactly so
    oracle and engine arithmetic see identical inputs."""
    import struct

    return struct.unpack("f", struct.pack("f", x))[0]


def consensus_turn(out_row: dict) -> dict:
    """Consensus over ONE extraction-output row (the dict shape extract_turn
    returns). Emits final_confidence (A6 weighted score, clamped/rounded)
    and an anomalies string (E17; '' when clean)."""
    fields = out_row["fields"]
    spans = out_row["spans"]
    power, amount, code = fields["power"], fields["amount"], fields["code"]
    ra = bool(fields["region_a"]["present"])
    rb = fields["region_b"]["span"] is not None  # true detection, not the forced flag

    boost = 0.0
    if power is not None and amount is not None:
        if (
            power * C.CONSENSUS_AMOUNT_PER_POWER_MIN
            <= amount
            <= power * C.CONSENSUS_AMOUNT_PER_POWER_MAX
        ):
            boost += C.CONSENSUS_BOOST_RATIO_OK
        else:
            boost += C.CONSENSUS_PENALTY_RATIO_BAD
        if amount > power * C.CONSENSUS_AMOUNT_FLOOR_PER_POWER:
            boost += C.CONSENSUS_BOOST_FLOOR_OK
    if code is not None:
        bare = code.replace("-", "").replace(" ", "")
        if (
            bare.isalnum()
            and C.CONSENSUS_CODE_MIN_LEN <= len(code) <= C.CONSENSUS_CODE_MAX_LEN
        ):
            boost += C.CONSENSUS_BOOST_CODE_OK
    if ra and rb:
        boost += C.CONSENSUS_BOOST_BOTH_REGIONS

    span_mean = (
        sum(_f32(s["conf"]) for s in spans) / len(spans) if spans else 0.0
    )
    region_score = (0.5 if ra else 0.0) + (0.5 if rb else 0.0)
    w_f, w_s, w_r, w_b = C.CONSENSUS_WEIGHTS
    base = min(max(0.5 + boost, 0.0), 1.0)
    final = (
        w_f * _f32(out_row["confidence"])
        + w_s * span_mean
        + w_r * region_score
        + w_b * base
    )
    final = round(min(max(final, 0.0), 1.0), C.CONSENSUS_ROUND_DECIMALS)

    anomalies = []
    if fields["entity"] is None and code is None:
        anomalies.append(C.ANOMALY_MISSING_CRITICAL)
    if power is not None and not (
        C.ANOMALY_POWER_RANGE[0] <= power <= C.ANOMALY_POWER_RANGE[1]
    ):
        anomalies.append(C.ANOMALY_POWER)
    if amount is not None and not (
        C.ANOMALY_AMOUNT_RANGE[0] <= amount <= C.ANOMALY_AMOUNT_RANGE[1]
    ):
        anomalies.append(C.ANOMALY_AMOUNT)
    if not ra and not rb:
        anomalies.append(C.ANOMALY_NO_REGIONS)

    return {
        "final_confidence": final,
        "anomalies": C.ANOMALY_SEP.join(anomalies),
    }
