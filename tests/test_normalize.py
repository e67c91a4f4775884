"""Arrow-kernel normalize stage == oracle normalize, byte for byte."""

import pyarrow as pa

from invoice_extraction_ray import fixtures as F
from invoice_extraction_ray import oracle as O
from invoice_extraction_ray.stages.normalize import normalize_batch


def test_normalize_parity_on_corpus():
    t = F.gen_transcripts(200, seed=42)
    out = normalize_batch(t).column("norm_text").to_pylist()
    for txt, en in zip(t.column("text").to_pylist(), out):
        assert O.normalize_text(txt) == en


def test_normalize_edge_cases():
    cases = [
        None,
        "",
        "a\r\nb\rc",
        "x &amp;&lt;&gt;&quot;&#39;&nbsp;y",
        "line   \t\nnext",
        "a\n\n\n\n\nb",
        "éclair",  # NFC composition
        "ctrl\x00\x07\x1fchars",
        "tabs\tand\nnewlines kept",
    ]
    t = pa.table({"text": pa.array(cases, type=pa.string())})
    out = normalize_batch(t).column("norm_text").to_pylist()
    for txt, en in zip(cases, out):
        assert O.normalize_text(txt) == en
    assert out[6] == "éclair"
