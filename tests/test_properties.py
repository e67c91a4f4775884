"""Hypothesis property tests for the pure kernels (no Ray needed): oracle
invariants, scalar functions, sketch determinism."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from invoice_extraction_ray import oracle as O
from invoice_extraction_ray.functions.scalar import clamp_span, collapse_ws, parse_amount

text_strategy = st.text(
    alphabet=string.ascii_letters + string.digits + " \t\r\n.,:|>`#-₹$'\"{}",
    max_size=400,
)


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_normalize_idempotent(s):
    once = O.normalize_text(s)
    assert O.normalize_text(once) == once


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_strip_boilerplate_is_line_subset(s):
    norm = O.normalize_text(s)
    kept = O.strip_boilerplate(norm)
    src_lines = norm.split("\n")
    # every non-empty surviving line existed in the normalized input
    for ln in kept.split("\n"):
        if ln:
            assert ln in src_lines


@settings(max_examples=200, deadline=None)
@given(text_strategy, st.sampled_from(["user", "assistant", "system", "tool"]))
def test_spans_within_bounds_and_sorted(s, role):
    norm = O.normalize_text(s)
    merged = O.merge_spans(O.detect_regions(norm, role) + O.detect_anchors(norm))
    keys = [(sp.start, sp.end, sp.label) for sp in merged]
    assert keys == sorted(keys)
    for sp in merged:
        assert 0 <= sp.start <= sp.end <= len(norm)
        assert 0.0 <= sp.conf <= 1.0


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=50))
def test_collapse_ws_idempotent_and_single_spaced(s):
    out = collapse_ws(s)
    assert collapse_ws(out) == out
    assert "  " not in out and not out.startswith(" ") and not out.endswith(" ")


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="0123456789.,₹$Rs ab", max_size=30))
def test_parse_amount_total(s):
    v = parse_amount(s)  # never raises; None or non-negative finite float
    if v is not None:
        assert v >= 0.0 and v == v  # not NaN


@settings(max_examples=300, deadline=None)
@given(st.integers(-100, 200), st.integers(-100, 200), st.integers(0, 100))
def test_clamp_span_invariants(a, b, n):
    s, e = clamp_span(a, b, n)
    assert 0 <= s <= e <= n


@settings(max_examples=100, deadline=None)
@given(text_strategy)
def test_sketches_deterministic(s):
    from invoice_extraction_ray.ops.dedup import minhash_signature, simhash64
    from invoice_extraction_ray.ops.text import fingerprint64

    assert (minhash_signature(s) == minhash_signature(s)).all()
    assert simhash64(s) == simhash64(s)
    assert fingerprint64(s) == fingerprint64(s)
    assert -(1 << 63) <= simhash64(s) < (1 << 63)  # fits Arrow int64


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=100), st.text(max_size=100))
def test_jaccard_symmetric_bounded(a, b):
    from invoice_extraction_ray.ops.dedup import jaccard

    j = jaccard(a, b)
    assert 0.0 <= j <= 1.0
    assert j == jaccard(b, a)
    assert jaccard(a, a) == 1.0


# vocab lines make detector-dense inputs likely: anchor keys, NER org
# suffixes, TitleCase runs, units, currency, boilerplate — raw random text
# almost never hits these code paths
_vocab_line = st.lists(
    st.sampled_from(
        [
            "Ltd", "Motors", "Apex", "Industries", "Green", "Valley",
            "dealer", "Dealer:", "Vendor =", "supplier", "Model: MF-241",
            "power", "42", "hp", "kW", "Total:", "₹", "1,200", "$", "3.5",
            "Hi", "Regards,", "---", "```", "| a | b |", "> quoted",
        ]
    ),
    max_size=8,
).map(" ".join)
_rich_text = st.one_of(
    text_strategy, st.lists(_vocab_line, max_size=6).map("\n".join)
)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(_rich_text, st.sampled_from(["user", "assistant", "tool"])),
        min_size=1,
        max_size=8,
    )
)
def test_engine_equals_oracle_on_arbitrary_text(rows):
    """Differential fuzz: the batched engine classifier and the row-at-a-time
    oracle agree on ARBITRARY text, not just fixture-shaped text."""
    import numpy as np
    import pyarrow as pa

    from invoice_extraction_ray.fixtures import master_data
    from invoice_extraction_ray.stages.classify import TurnClassifier
    from invoice_extraction_ray.stages.normalize import normalize_batch

    table = pa.table(
        {
            "conv_id": pa.array([f"c{i}" for i in range(len(rows))], pa.string()),
            "turn_idx": pa.array(range(len(rows)), pa.int32()),
            "role": pa.array([r for _, r in rows], pa.string()),
            "text": pa.array([t for t, _ in rows], pa.string()),
            "tool": pa.array(["search" if r == "tool" else None for _, r in rows],
                             pa.string()),
        }
    )
    clf = TurnClassifier(master=master_data())
    got = clf(normalize_batch(table)).to_pylist()

    oracle_rows = O.extract_table(table.to_pylist())
    by_key = {(r["conv_id"], r["turn_idx"]): r for r in oracle_rows}
    assert len(got) == len(oracle_rows)
    for g in got:
        o = by_key[(g["conv_id"], g["turn_idx"])]
        assert g["extracted_text"] == o["extracted_text"]
        assert g["spans"] == [
            {**s, "conf": np.float32(s["conf"]).item()} for s in o["spans"]
        ]
        assert g["fields"] == o["fields"]
        assert abs(g["confidence"] - o["confidence"]) < 1e-6
        assert g["notes"] == o["notes"]


def test_interval_sweep_kernel_matches_bruteforce_randomized():
    """The vectorized per-shard sweep (_sweep_shard) must equal the O(n*m)
    brute force on randomized interval sets (no Ray needed — pure kernel)."""
    import random

    import pyarrow as pa

    from invoice_extraction_ray.ops.interval import _sweep_shard

    rng = random.Random(20260817)
    for trial in range(25):
        n_keys = rng.randint(1, 6)
        rows = []
        rid = 0
        for side in (0, 1):
            for _ in range(rng.randint(0, 25)):
                k = rng.randint(0, n_keys - 1)
                s = round(rng.uniform(-50, 50), 2)
                e = s + round(rng.uniform(0.01, 40), 2)
                rows.append((k, rid, s, e, side))
                rid += 1
        rng.shuffle(rows)
        t = pa.table(
            {
                "key": pa.array([r[0] for r in rows], pa.int64()),
                "id": pa.array([r[1] for r in rows], pa.int64()),
                "start": pa.array([r[2] for r in rows], pa.float64()),
                "end": pa.array([r[3] for r in rows], pa.float64()),
                "side": pa.array([r[4] for r in rows], pa.int32()),
            }
        )
        got = {
            (r["key"], r["a_id"], r["b_id"], r["ov_start"], r["ov_end"])
            for r in _sweep_shard(t).to_pylist()
        }
        want = set()
        lefts = [r for r in rows if r[4] == 0]
        rights = [r for r in rows if r[4] == 1]
        for lk, li, ls, le, _ in lefts:
            for rk, ri, rs, re_, _ in rights:
                if lk == rk and ls < re_ and rs < le:
                    want.add((lk, li, ri, max(ls, rs), min(le, re_)))
        assert got == want, f"trial {trial}: {got ^ want}"


def test_interval_sweep_sub_ulp_sliver_pairs():
    """Regression (found at sf0.1): a sliver overlap where r.start < l.end by
    ~1e-14 must be emitted even on a high key rank — the old composite
    rank*span+offset position absorbed sub-ulp differences and dropped two
    true pairs out of 105,590."""
    import pyarrow as pa

    from invoice_extraction_ray.ops.interval import _sweep_shard

    le = 44.74 + 25.0  # 69.74000000000001
    rs = 69.74  # rs < le by ~1.4e-14
    rows = []
    for key in (0, 259, 1174):  # include high ranks with large key values
        rows.append((key, 1000 + key, 44.74, le, 0))  # left
        rows.append((key, 2000 + key, rs, rs + 25.0, 1))  # right
        # filler rights so segments have interior structure
        rows.append((key, 3000 + key, -10.0, -5.0, 1))
    t = pa.table(
        {
            "key": pa.array([r[0] for r in rows], pa.int64()),
            "id": pa.array([r[1] for r in rows], pa.int64()),
            "start": pa.array([r[2] for r in rows], pa.float64()),
            "end": pa.array([r[3] for r in rows], pa.float64()),
            "side": pa.array([r[4] for r in rows], pa.int32()),
        }
    )
    got = {(r["key"], r["a_id"], r["b_id"]) for r in _sweep_shard(t).to_pylist()}
    assert {(k, 1000 + k, 2000 + k) for k in (0, 259, 1174)} <= got


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 5),        # user
            st.integers(0, 10_000),   # start
            st.integers(1, 500),      # length
        ),
        min_size=1,
        max_size=60,
    )
)
def test_merge_user_spans_matches_bruteforce(rows):
    """The rank-offset interval-union kernel equals the per-user sorted
    sweep on arbitrary (possibly duplicated / nested / touching)
    intervals."""
    import numpy as np

    from invoice_extraction_ray.ops.interval import _merge_user_spans

    u = np.array([r[0] for r in rows], dtype=np.int64)
    s = np.array([r[1] for r in rows], dtype=np.int64)
    e = s + np.array([r[2] for r in rows], dtype=np.int64)
    mu, ms, me = _merge_user_spans(u, s, e)

    per: dict[int, list] = {}
    for uu, ss, ee in zip(u.tolist(), s.tolist(), e.tolist()):
        per.setdefault(uu, []).append((ss, ee))
    want = []
    for uu in sorted(per):
        iv = sorted(per[uu])
        cs, ce = iv[0]
        for ss, ee in iv[1:]:
            if ss > ce:
                want.append((uu, cs, ce))
                cs, ce = ss, ee
            else:
                ce = max(ce, ee)
        want.append((uu, cs, ce))
    got = list(zip(mu.tolist(), ms.tolist(), me.tolist()))
    assert got == want
    # structural invariants: spans are disjoint-with-gaps per user
    for (u1, s1, e1), (u2, s2, e2) in zip(want, want[1:]):
        if u1 == u2:
            assert s2 > e1


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(-10_000, 10_000), min_size=1, max_size=40),
    st.integers(1, 9),
)
def test_rolling_median_pairs_are_order_stats(vals, w):
    """The two-middle-order-statistics gather used by rolling_median_value
    equals sorted()[mid] + sorted()[mid2] of every trailing window."""
    import numpy as np

    c = np.array(vals, dtype=np.int64)
    n = len(c)
    seg_start = np.zeros(n, dtype=np.int64)
    pos = np.arange(n)
    width = np.minimum(pos - seg_start + 1, w)
    med2 = np.empty(n, dtype=np.int64)
    for L in range(1, w + 1):
        rows = np.flatnonzero(width == L)
        if not len(rows):
            continue
        win = c[rows[:, None] - (L - 1) + np.arange(L)[None, :]]
        win.sort(axis=1)
        med2[rows] = win[:, (L - 1) // 2] + win[:, L // 2]
    for i in range(n):
        win = sorted(vals[max(0, i - w + 1) : i + 1])
        L = len(win)
        assert med2[i] == win[(L - 1) // 2] + win[L // 2]
