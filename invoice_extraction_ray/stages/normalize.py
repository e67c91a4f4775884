"""Stateless text-normalization stage (reference preprocess.py:15-70 analogue).

Fully vectorized over zero-copy Arrow batches: Unicode NFC via
``pyarrow.compute.utf8_normalize``, entity decode via literal
``replace_substring`` chains, and the regex cleanup steps via RE2
(``replace_substring_regex``).  All pattern strings live in
``invoice_extraction_ray.config`` and are written in the RE2-compatible
subset so the oracle (Python ``re``) and this stage agree byte-for-byte.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .. import config as C


def normalize_batch(batch: pa.Table) -> pa.Table:
    """Append ``norm_text`` (never null) to the batch."""
    arr = batch.column("text")
    if arr.null_count > 0:
        arr = pc.fill_null(arr, "")
    # NFC via unicodedata: pyarrow's utf8_normalize mis-handles composition in
    # this build (returns NFD for every requested form), so compose in Python —
    # unicodedata.normalize has a C fast path (NFC quick-check) that returns
    # already-normalized strings (the common case) untouched.
    import unicodedata

    arr = pa.array(
        [unicodedata.normalize("NFC", s) for s in arr.to_pylist()], type=pa.string()
    )
    for lit, rep in C.HTML_ENTITIES:
        arr = pc.replace_substring(arr, pattern=lit, replacement=rep)
    for pat, rep in C.NORMALIZE_REGEX_STEPS:
        arr = pc.replace_substring_regex(arr, pattern=pat, replacement=rep)
    if "norm_text" in batch.column_names:
        batch = batch.drop_columns(["norm_text"])
    return batch.append_column("norm_text", arr)
