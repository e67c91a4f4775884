"""Scalar-function library (SURVEY.md §2.2 M15): the engine's equivalents of
the reference's ad-hoc string/number helpers (strip/lower/upper, whitespace
collapse, comma-stripped float parse, rounding — reference validators.py:24,
80-83,119, extractors.py:206,260).

Two tiers:
- Arrow-kernel column functions (``*_col``) for vectorized map_batches stages;
- plain-Python scalars used by the classifier's row loop and the oracle —
  both import from HERE so semantics can never diverge.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

_WS = re.compile(r"\s+")
_NON_NUMERIC = re.compile(r"[^\d.]")


# --- scalar tier ---------------------------------------------------------


def collapse_ws(s: str) -> str:
    """' '.join-style whitespace normalization."""
    return _WS.sub(" ", s.strip())


def parse_amount(s: str) -> float | None:
    """Comma/currency-tolerant number parse ('₹ 8,30,000.50' -> 830000.5);
    None when nothing numeric remains (reference cost regex strip)."""
    cleaned = _NON_NUMERIC.sub("", s)
    if not cleaned or cleaned.count(".") > 1 or cleaned == ".":
        return None
    try:
        return float(cleaned)
    except ValueError:
        return None


def clamp_span(start: int, end: int, n: int) -> tuple[int, int]:
    """Offset clamping to [0, n) — the bbox-coercion analogue
    (reference detector.py:10-45)."""
    start = max(0, min(start, n))
    end = max(start, min(end, n))
    return start, end


# --- Arrow-kernel tier ---------------------------------------------------


def collapse_ws_col(arr: pa.Array | pa.ChunkedArray):
    return pc.replace_substring_regex(
        pc.utf8_trim_whitespace(arr), pattern=r"\s+", replacement=" "
    )


def lower_col(arr):
    return pc.utf8_lower(arr)


def upper_col(arr):
    return pc.utf8_upper(arr)


def strip_non_numeric_col(arr):
    return pc.replace_substring_regex(arr, pattern=r"[^\d.]", replacement="")


def round_col(arr, ndigits: int = 2):
    return pc.round(arr, ndigits=ndigits, round_mode="half_to_even")
