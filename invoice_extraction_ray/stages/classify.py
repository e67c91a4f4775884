"""TurnClassifier — the stateful actor-pool extraction stage.

The engine-side implementation of stages 2-7 of the per-turn extraction
(boilerplate strip, region detection, anchor detection, consensus merge,
master-data validation, confidence scoring).  Semantics are the transcript
analogues of the reference invoice pipeline (see SURVEY.md §2 / §7.1 and the
docstring of ``invoice_extraction_ray.oracle``, which is the row-at-a-time
reference this class is pytest-verified against — the two share only the
constants in ``config``).

Ray Data usage:  ``ds.map_batches(TurnClassifier, batch_format="pyarrow",
concurrency=(min,max), batch_size=B, fn_constructor_kwargs={...})``.
State built ONCE per actor in ``__init__`` (compiled pattern bank, broadcast
master-data lookup tables, fuzzy-match memo caches — the reference loads its
models per-process the same way, reference ocr.py:17-33, vision.py:16-42);
``__call__`` does row-local work only, so the stage needs no shuffle and is
embarrassingly parallel across blocks.
"""

from __future__ import annotations

import difflib
import json
import math
import re

import numpy as np
import pyarrow as pa

from .. import config as C

# ---------------------------------------------------------------------------
# Module-level compiled pattern bank — cheap state shared by every actor in a
# worker process (reference extractors.py:26-65 compiles its banks the same
# way; module-level compile keeps stateless-task fallbacks cheap too).
# ---------------------------------------------------------------------------

_ANCHORS = [
    (label, re.compile(pat), conf, method)
    for label, pat, conf, method in C.ANCHOR_PATTERNS
]
_GREETING = re.compile(C.GREETING_RE)
_SIGNOFF = re.compile(C.SIGNOFF_RE)
_DISCLAIMER = re.compile(C.DISCLAIMER_RE)
_SEPARATOR = re.compile(C.SEPARATOR_RE)
# one-pass alternation: a line is boilerplate iff ANY of the four patterns
# matches, so the common (non-matching) case costs one search instead of four
# (global (?i) flags become scoped (?i:...) groups to allow joining)
def _scoped(p: str) -> str:
    return f"(?i:{p[4:]})" if p.startswith("(?i)") else f"(?:{p})"


_BOILERPLATE = re.compile(
    "|".join(
        _scoped(p)
        for p in (C.GREETING_RE, C.SIGNOFF_RE, C.DISCLAIMER_RE, C.SEPARATOR_RE)
    )
)
_COLLAPSE = re.compile(r"\n{3,}")
_H_ENT_KEY = re.compile(C.HEURISTIC_ENTITY_KEYWORD_RE)
_H_TITLECASE = re.compile(C.HEURISTIC_TITLECASE_RE)
_H_POWER = re.compile(C.HEURISTIC_POWER_RE)
_NER_ORG = re.compile(C.NER_ORG_RE)
_CODE_NORM = re.compile(r"^([A-Z]{2,4})[ -]?(\d{3,5}[A-Z]?)$")
_WS = re.compile(r"\s+")

_PRIO = C.METHOD_PRIORITY


def _ratio(a: str, b: str) -> float:
    return difflib.SequenceMatcher(None, a, b).ratio()


def _sim_gt(a: str, b: str, thr: float) -> bool:
    """ratio(a, b) > thr, short-circuited through difflib's upper bounds
    (length bound >= real_quick_ratio >= quick_ratio >= ratio) — boolean
    identical to computing the full ratio."""
    la, lb = len(a), len(b)
    if la + lb == 0:
        return 1.0 > thr  # SequenceMatcher ratio of two empty strings is 1.0
    if 2.0 * min(la, lb) / (la + lb) <= thr:
        return False
    sm = difflib.SequenceMatcher(None, a, b)
    if sm.real_quick_ratio() <= thr or sm.quick_ratio() <= thr:
        return False
    return sm.ratio() > thr


class TurnClassifier:
    """Callable class for ``map_batches``; one instance per pool actor.

    ``flat_only=True`` is projection pushdown INTO the operator: consumers
    that only read the flat columns (conv_id, turn_idx, extracted_text,
    confidence, notes — e.g. the driver's flagship query) skip building the
    spans/fields Arrow structures entirely, so the dropped columns never
    cost CPU, never serialize, and never transit the object store or the
    seal exchange.  Span/field SEMANTICS still run (confidence depends on
    them); only the output assembly is pruned."""

    def __init__(self, master=None, master_ref=None, flat_only: bool = False):
        import ray

        self.flat_only = bool(flat_only)

        if master is None:
            if master_ref is not None:
                master = ray.get(master_ref)  # broadcast side input, fetched once
            else:
                from ..fixtures import master_data

                master = master_data()
        self.entities: list[str] = list(master["entities"])
        self.entities_lower = [e.lower() for e in self.entities]
        self.code_set = set(master["codes"])
        self.ranges = master["numeric_ranges"]
        # memo caches: candidate values repeat heavily across turns, and the
        # fuzzy scan is O(|entities|) difflib calls — amortize per actor.
        self._ent_cache: dict[str, str | None] = {}
        self._code_cache: dict[str, tuple[str | None, bool]] = {}

    # -- per-row pieces ----------------------------------------------------

    def _scan_lines(self, norm: str, role):
        """ONE pass over lines computing offsets, boilerplate drops, region
        flags, and heuristic-entity candidates together (was 6 separate
        per-line loops; identical semantics, oracle/fuzz-verified)."""
        lines = norm.split("\n")
        n = len(lines)
        h = math.ceil(C.HEADER_FRAC * n)
        f = math.ceil(C.FOOTER_FRAC * n)
        body_lo, body_hi = h, n - f

        offs = [0] * n
        kept = []
        fence_rows: list[int] = []
        tbl_flags = [False] * (n + 1)
        quote_flags = [False] * (n + 1)
        ent_spans = []  # heuristic-entity candidates, appended after regions
        prev_signoff_dropped = False
        pos = 0
        for i, ln in enumerate(lines):
            offs[i] = pos
            pos += len(ln) + 1
            # boilerplate strip (header/footer layout, ocr.py:280-306 analogue)
            drop = False
            if i < body_lo or i >= body_hi:
                if _BOILERPLATE.search(ln):
                    drop = True
                elif (
                    i >= body_hi
                    and prev_signoff_dropped
                    and 0 < len(ln.strip()) <= C.SIGNATURE_MAX_LEN
                ):
                    drop = True
            prev_signoff_dropped = drop and bool(_SIGNOFF.search(ln))
            if not drop:
                kept.append(ln)
            # region flags
            if ln.startswith("```"):
                fence_rows.append(i)
            if ln.count("|") >= C.TABLE_MIN_PIPES:
                tbl_flags[i] = True
            if ln.startswith("> ") or ln == ">":
                quote_flags[i] = True
            # heuristic entity detector (keyword line w/o ':'/'=' anchors);
            # C-level substring precheck skips the regex for ~95% of lines
            ll = ln.lower()
            if "dealer" in ll or "vendor" in ll or "supplier" in ll:
                if _H_ENT_KEY.search(ln) and ":" not in ln and "=" not in ln:
                    m = _H_TITLECASE.search(ln)
                    if m:
                        ent_spans.append(
                            ("entity", pos - len(ln) - 1 + m.start(1),
                             pos - len(ln) - 1 + m.end(1), m.group(1),
                             C.HEURISTIC_ENTITY_CONF, "heuristic")
                        )
            # E3 middle strategy: org-suffix NER analogue over HEADER lines
            if i < body_lo:
                for m in _NER_ORG.finditer(ln):
                    ent_spans.append(
                        ("entity", pos - len(ln) - 1 + m.start(1),
                         pos - len(ln) - 1 + m.end(1), m.group(1),
                         C.NER_ENTITY_CONF, "ner")
                    )
        extracted = _COLLAPSE.sub("\n\n", "\n".join(kept)).strip("\n")

        # --- line-block regions from the flags
        spans = []  # (label, start, end, value, conf, method)

        def _end(i):
            return offs[i] + len(lines[i])

        for k in range(0, len(fence_rows) - 1, 2):
            a, b = fence_rows[k], fence_rows[k + 1]
            spans.append(("region_code", offs[a], _end(b), "", C.REGION_CODE_CONF, "fence"))

        start = -1
        for i in range(n + 1):
            if tbl_flags[i] and start < 0:
                start = i
            elif not tbl_flags[i] and start >= 0:
                if i - start >= C.TABLE_MIN_LINES:
                    spans.append(
                        ("region_table", offs[start], _end(i - 1), "", C.REGION_TABLE_CONF, "grid")
                    )
                start = -1

        start = -1
        for i in range(n + 1):
            if quote_flags[i] and start < 0:
                start = i
            elif not quote_flags[i] and start >= 0:
                spans.append(
                    ("region_quote", offs[start], _end(i - 1), "", C.REGION_QUOTE_CONF, "quote")
                )
                start = -1

        if role == "tool":
            a = norm.find("{")
            b = norm.rfind("}")
            if 0 <= a < b:
                blob = norm[a : b + 1]
                try:
                    json.loads(blob)
                    spans.append(("region_json", a, b + 1, "", C.REGION_JSON_CONF, "json"))
                except ValueError:
                    for bad, good in C.JSON_RECOVERY_TRANS.items():
                        blob = blob.replace(bad, good)
                    try:
                        json.loads(blob)
                        spans.append(
                            ("region_json", a, b + 1, "", C.REGION_JSON_RECOVERED_CONF, "json_recovered")
                        )
                    except ValueError:
                        pass

        spans.extend(ent_spans)
        return extracted, spans

    @staticmethod
    def _merge(cands):
        """Consensus merge in canonical order (ocr.py:134-233 analogue)."""
        cands.sort(key=lambda c: (c[1], c[2], _PRIO[c[5]], c[0]))
        # fast path: grouping only ever merges SAME-label candidates (the
        # r[0] != c[0] guard below), so all-distinct labels ⇒ every group is
        # a singleton ⇒ output = canonical-sorted candidates with rounded conf
        labels = [c[0] for c in cands]
        if len(set(labels)) == len(labels):
            out = [
                (c[0], c[1], c[2], c[3], round(c[4], C.CONF_ROUND_DECIMALS), c[5])
                for c in cands
            ]
            out.sort(key=lambda s: (s[1], s[2], s[0]))
            return out
        groups = []
        for c in cands:
            for g in groups:
                r = g[0]
                if r[0] != c[0]:
                    continue
                inter = min(r[2], c[2]) - max(r[1], c[1])
                union = max(r[2], c[2]) - min(r[1], c[1])
                if (union > 0 and inter / union > C.MERGE_IOU_THRESHOLD) or (
                    r[3]
                    and c[3]
                    and _sim_gt(r[3].lower(), c[3].lower(), C.MERGE_TEXT_SIM_THRESHOLD)
                ):
                    g.append(c)
                    break
            else:
                groups.append([c])
        out = []
        for g in groups:
            best = min(g, key=lambda c: (-c[4], c[1], c[2] - c[1], _PRIO[c[5]]))
            conf = round(sum(c[4] for c in g) / len(g), C.CONF_ROUND_DECIMALS)
            out.append((best[0], best[1], best[2], best[3], conf, best[5]))
        out.sort(key=lambda s: (s[1], s[2], s[0]))
        return out

    # -- validation lookups (broadcast-join semantics, validators.py:134-341)

    def _lookup_entity(self, raw: str):
        hit = self._ent_cache.get(raw)
        if raw in self._ent_cache:
            return hit
        v = _WS.sub(" ", raw.strip())
        if v.lower() in C.ENTITY_BLOCKLIST:
            res = None
        else:
            vl = v.lower()
            lv = len(vl)
            best_i, best_r = -1, -1.0
            for i, el in enumerate(self.entities_lower):
                # upper bounds before the O(n^2) ratio: length bound, then
                # difflib's quick bounds (each >= ratio, so skipping entries
                # that cannot be STRICTLY greater preserves the argmax and
                # its first-max tie-break exactly)
                if 2.0 * min(lv, len(el)) / (lv + len(el)) <= best_r:
                    continue
                sm = difflib.SequenceMatcher(None, vl, el)
                if sm.real_quick_ratio() <= best_r or sm.quick_ratio() <= best_r:
                    continue
                r = sm.ratio()
                if r > best_r:
                    best_i, best_r = i, r
            res = self.entities[best_i] if best_r >= C.FUZZY_ENTITY_THRESHOLD else v
        self._ent_cache[raw] = res
        return res

    def _lookup_code(self, raw: str):
        hit = self._code_cache.get(raw)
        if raw in self._code_cache:
            return hit
        v = _WS.sub(" ", raw.strip()).upper()
        m = _CODE_NORM.match(v)
        norm = f"{m.group(1)}-{m.group(2)}" if m else v
        if norm in self.code_set:
            res = (norm, True)
        elif C.CODE_MIN_LEN <= len(v) <= C.CODE_MAX_LEN:
            res = (v, False)
        else:
            res = (None, False)
        self._code_cache[raw] = res
        return res

    def _check_range(self, x: float, code, code_valid: bool, kind: str, global_range):
        if code_valid and code in self.ranges:
            r = self.ranges[code][kind]
            lo, hi = r["min"] * (1 - C.RANGE_TOLERANCE), r["max"] * (1 + C.RANGE_TOLERANCE)
        else:
            lo, hi = global_range
        return x if lo <= x <= hi else None

    # -- the batch entry point ----------------------------------------------

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "norm_text" not in batch.column_names:
            # fused normalize: running it inside the actor avoids one full
            # serialize -> object store -> deserialize round trip of the
            # text corpus between stages (Ray does not fuse a task-pool map
            # into an actor-pool map) — the saturated-core pair is memory-
            # bandwidth-bound, so the skipped block hop is a direct win
            from .normalize import normalize_batch

            batch = normalize_batch(batch)
        norms = batch.column("norm_text").to_pylist()
        roles = batch.column("role").to_pylist()
        n_rows = len(norms)

        extracted_col: list[str] = []
        notes_col: list[str] = []
        n_filled = np.empty(n_rows, dtype=np.int64)
        # columnar span builders (flat values + list offsets): ~3x cheaper to
        # convert to Arrow than a per-row list of python dicts
        sp_off = [0]
        sp_label: list[str] = []
        sp_start: list[int] = []
        sp_end: list[int] = []
        sp_value: list[str] = []
        sp_conf: list[float] = []
        sp_method: list[str] = []
        # columnar fields builders
        f_entity: list = []
        f_code: list = []
        f_power: list = []
        f_amount: list = []
        f_ra_present: list = []
        f_ra_span: list = []
        f_rb_present: list = []
        f_rb_span: list = []

        for i in range(n_rows):
            norm = norms[i]
            if norm:
                extracted, cands = self._scan_lines(norm, roles[i])
                for label, pat, conf, method in _ANCHORS:
                    for m in pat.finditer(norm):
                        cands.append((label, m.start(1), m.end(1), m.group(1), conf, method))
                for m in _H_POWER.finditer(norm):
                    cands.append(
                        ("power", m.start(1), m.end(1), m.group(1), C.HEURISTIC_POWER_CONF, "proximity")
                    )
                merged = self._merge(cands)
            else:
                extracted, merged = "", []

            # best candidate per field label: (-conf, start, width) argmin
            best: dict[str, tuple] = {}
            first_region: dict[str, tuple] = {}
            for s in merged:
                lbl = s[0]
                if lbl in ("entity", "code", "power", "amount"):
                    k = (-s[4], s[1], s[2] - s[1])
                    if lbl not in best or k < best[lbl][0]:
                        best[lbl] = (k, s)
                elif lbl in ("region_code", "region_table") and lbl not in first_region:
                    first_region[lbl] = s  # merged is start-sorted

            code, code_valid = (None, False)
            if "code" in best:
                code, code_valid = self._lookup_code(best["code"][1][3])
            entity = self._lookup_entity(best["entity"][1][3]) if "entity" in best else None
            power = amount = None
            if "power" in best:
                try:
                    power = self._check_range(
                        float(best["power"][1][3]), code, code_valid, "power", C.POWER_GLOBAL_RANGE
                    )
                except ValueError:
                    power = None
            if "amount" in best:
                try:
                    amount = self._check_range(
                        float(best["amount"][1][3].replace(",", "")),
                        code, code_valid, "amount", C.AMOUNT_GLOBAL_RANGE,
                    )
                except ValueError:
                    amount = None

            ra = first_region.get("region_code")
            rb = first_region.get("region_table")
            rb_present = True if C.FORCE_REGION_B_PRESENT else rb is not None
            if not self.flat_only:
                f_entity.append(entity)
                f_code.append(code)
                f_power.append(power)
                f_amount.append(amount)
                f_ra_present.append(ra is not None)
                f_ra_span.append([ra[1], ra[2]] if ra else None)
                f_rb_present.append(rb_present)
                f_rb_span.append([rb[1], rb[2]] if rb else None)
            flags = {
                "entity": entity is not None,
                "code": code is not None,
                "power": power is not None,
                "amount": amount is not None,
                "region_a": ra is not None,
                "region_b": rb_present,
            }
            n_filled[i] = sum(flags.values())
            missing = [f for f in C.FIELD_ORDER if not flags[f]]
            notes_col.append(
                C.NOTES_MISSING_FMT.format(missing=", ".join(missing)) if missing else C.NOTES_ALL
            )
            extracted_col.append(extracted)
            if not self.flat_only:
                for s in merged:
                    sp_label.append(s[0])
                    sp_start.append(s[1])
                    sp_end.append(s[2])
                    sp_value.append(s[3])
                    sp_conf.append(s[4])
                    sp_method.append(s[5])
                sp_off.append(len(sp_label))

        # vectorized confidence (confidence.py:6-41 analogue, caps 97/95)
        pct = np.rint(n_filled / 6 * 100)
        cap = np.where(n_filled == 6, C.CONF_CAP_ALL, np.where(n_filled >= 5, C.CONF_CAP_MOST, 100))
        confidence = (np.minimum(pct, cap) / 100.0).astype(np.float32)

        if self.flat_only:
            return pa.Table.from_arrays(
                [
                    batch.column("conv_id"),
                    batch.column("turn_idx"),
                    pa.array(extracted_col, type=pa.string()),
                    pa.array(confidence),
                    pa.array(notes_col, type=pa.string()),
                ],
                names=["conv_id", "turn_idx", "extracted_text", "confidence", "notes"],
            )

        span_struct = pa.StructArray.from_arrays(
            [
                pa.array(sp_label, pa.string()),
                pa.array(sp_start, pa.int32()),
                pa.array(sp_end, pa.int32()),
                pa.array(sp_value, pa.string()),
                pa.array(sp_conf, pa.float32()),
                pa.array(sp_method, pa.string()),
            ],
            names=["label", "start", "end", "value", "conf", "method"],
        )
        spans_arr = pa.ListArray.from_arrays(pa.array(sp_off, pa.int32()), span_struct)
        span_list_t = pa.list_(pa.int32())
        region_names = ["present", "span"]
        fields_arr = pa.StructArray.from_arrays(
            [
                pa.array(f_entity, pa.string()),
                pa.array(f_code, pa.string()),
                pa.array(f_power, pa.float64()),
                pa.array(f_amount, pa.float64()),
                pa.StructArray.from_arrays(
                    [pa.array(f_ra_present, pa.bool_()), pa.array(f_ra_span, span_list_t)],
                    names=region_names,
                ),
                pa.StructArray.from_arrays(
                    [pa.array(f_rb_present, pa.bool_()), pa.array(f_rb_span, span_list_t)],
                    names=region_names,
                ),
            ],
            names=["entity", "code", "power", "amount", "region_a", "region_b"],
        )
        return pa.Table.from_arrays(
            [
                batch.column("conv_id"),
                batch.column("turn_idx"),
                pa.array(extracted_col, type=pa.string()),
                spans_arr,
                fields_arr,
                pa.array(confidence),
                pa.array(notes_col, type=pa.string()),
            ],
            schema=C.output_schema(),
        )
