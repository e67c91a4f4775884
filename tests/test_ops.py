"""Operator-library tests over the driver testdata (sf0.001) — recall and
determinism properties for the dedup / ANN / text-analysis families.  The
SQL-oracled operators are additionally verified against DuckDB by the driver
(tools/check_queries.py replays that locally)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _docs():
    return pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])


def _planted(docs: pa.Table, every: int = 10):
    """Plant a near-duplicate (one mid token dropped) of every Nth doc."""
    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    dup_ids, dup_texts, expected = [], [], set()
    for i, (d, s) in enumerate(zip(ids, texts)):
        if i % every == 0 and s:
            toks = s.split()
            del toks[len(toks) // 2]
            nd = d + 10_000_000
            dup_ids.append(nd)
            dup_texts.append(" ".join(toks))
            expected.add((d, nd))
    return (
        pa.table(
            {
                "doc_id": pa.array(ids + dup_ids, pa.int64()),
                "text": pa.array(texts + dup_texts, pa.string()),
            }
        ),
        expected,
    )


def test_minhash_neardup_finds_planted_pairs():
    from invoice_extraction_ray.ops.dedup import jaccard, minhash_neardup

    planted, expected = _planted(_docs())
    got = {
        (r["a_id"], r["b_id"])
        for r in minhash_neardup(planted, jaccard_threshold=0.8).take_all()
    }
    # every expected pair truly above threshold must be found (banding with
    # 16 bands x 4 rows has ~100% recall at j>=0.9; planted pairs are ~0.95)
    text_of = dict(
        zip(planted.column("doc_id").to_pylist(), planted.column("text").to_pylist())
    )
    truly_similar = {
        (a, b) for a, b in expected if jaccard(text_of[a], text_of[b]) >= 0.8
    }
    assert truly_similar, "fixture must contain true near-duplicates"
    assert truly_similar <= got
    # and everything returned must verify
    for a, b in got:
        assert jaccard(text_of[a], text_of[b]) >= 0.8


def test_simhash_neardup_finds_planted_pairs():
    from invoice_extraction_ray.ops.dedup import simhash64, simhash_neardup

    planted, expected = _planted(_docs())
    text_of = dict(
        zip(planted.column("doc_id").to_pylist(), planted.column("text").to_pylist())
    )
    got = {
        (r["a_id"], r["b_id"]): r["hamming"]
        for r in simhash_neardup(planted, max_hamming=3).take_all()
    }
    truly_close = {
        (a, b)
        for a, b in expected
        if int.bit_count(
            (simhash64(text_of[a]) ^ simhash64(text_of[b])) & ((1 << 64) - 1)
        )
        <= 3
    }
    assert truly_close, "fixture must contain Hamming-close pairs"
    # pigeonhole banding guarantees 100% recall at hamming <= bands-1
    assert truly_close <= set(got)
    for (a, b), h in got.items():
        d = int.bit_count(
            (simhash64(text_of[a]) ^ simhash64(text_of[b])) & ((1 << 64) - 1)
        )
        assert d == h <= 3


def _brute_force_topk(k: int = 10) -> list[int]:
    tbl = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(tbl.column("vec_id").to_pylist())
    mat = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    q = mat[list(ids).index(0)]
    sims = mat @ q
    order = np.lexsort((ids, -sims))
    return ids[order][:k].tolist()


def test_ann_topk_matches_brute_force():
    from invoice_extraction_ray.ops.ann import ann_topk

    got = [r["vec_id"] for r in ann_topk(SF, k=10).take_all()]
    assert got == _brute_force_topk(10)


@pytest.mark.parametrize("variant", ["lsh", "ivf"])
def test_approx_ann_recall(variant):
    from invoice_extraction_ray.ops.ann import ivf_topk, lsh_topk

    fn = lsh_topk if variant == "lsh" else ivf_topk
    got = {r["vec_id"] for r in fn(SF, k=10).take_all()}
    exact = set(_brute_force_topk(10))
    # approximate by design: require the query itself + >=50% overlap
    assert 0 in got
    assert len(got & exact) >= 5


def test_vocab_coverage_matches_pure_python_recompute():
    from collections import Counter

    from invoice_extraction_ray.ops.text import vocab_coverage

    got = {r["doc_id"]: r for r in vocab_coverage(SF, vocab_k=10).take_all()}

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    c: Counter = Counter()
    texts = dict(zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()))
    for s in texts.values():
        c.update((s or "").split())
    vocab = {w for w, _ in sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]}
    assert len(got) == len(texts)
    for did, s in texts.items():
        toks = (s or "").split()
        n_in = sum(1 for w in toks if w in vocab)
        r = got[did]
        assert (r["n_tokens"], r["n_in_vocab"]) == (len(toks), n_in)
        assert r["coverage_e6"] == int(
            np.floor(1000000.0 * n_in / max(len(toks), 1) + 0.5)
        )


def test_quality_percentiles_rank_properties():
    """pct_e6 must be the (count <= score)/n rank: monotone in score, equal
    for equal scores, top score at exactly 1e6, and match a local recompute."""
    from invoice_extraction_ray.ops.text import quality_percentiles

    rows = quality_percentiles(SF).take_all()
    scores = np.array([r["score_e5"] for r in rows])
    pcts = np.array([r["pct_e6"] for r in rows])
    n = len(rows)
    order = np.argsort(scores, kind="stable")
    assert (np.diff(pcts[order]) >= 0).all()
    assert pcts[scores == scores.max()].max() == 1_000_000
    n_le = np.array([(scores <= s).sum() for s in scores])
    want = np.floor(1000000.0 * n_le / n + 0.5).astype(np.int64)
    assert (pcts == want).all()


def test_corpus_stats_report_exact_fields_and_hll_bound():
    """The card's exact fields must match a local recompute; the HLL distinct
    estimate must be within the sketch's error of the true vocabulary."""
    from invoice_extraction_ray.ops.sketch import corpus_stats_report

    (row,) = corpus_stats_report(SF).take_all()

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    texts = tbl.column("text").to_pylist()
    ntok = [len((s or "").split()) for s in texts]
    vocab = {w for s in texts for w in (s or "").split()}
    assert row["n_docs"] == len(texts)
    assert row["n_with_text"] == sum(1 for s in texts if s is not None)
    assert row["total_tokens"] == sum(ntok)
    assert row["total_chars"] == sum(len(s or "") for s in texts)
    assert row["max_doc_tokens"] == max(ntok)
    assert row["mean_tokens_e4"] == int(
        np.floor(10000.0 * sum(ntok) / len(texts) + 0.5)
    )
    assert abs(row["approx_distinct_tokens"] - len(vocab)) <= max(
        3, 0.1 * len(vocab)
    )


def test_value_mad_outliers_matches_numpy_recompute():
    """Histogram-derived median/MAD/outlier counts must equal a direct
    per-group numpy recompute with the quantile_disc convention."""
    import math

    from invoice_extraction_ray.ops.sketch import value_mad_outliers

    got = {r["event_type"]: r for r in value_mad_outliers(SF).take_all()}

    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["c"] = np.floor(ev.value * 100.0 + 0.5).astype(np.int64)
    for et, g in ev.groupby("event_type"):
        c = np.sort(g.c.to_numpy())
        med = int(c[max(0, math.ceil(0.5 * len(c)) - 1)])
        d = np.sort(np.abs(g.c.to_numpy() - med))
        mad = int(d[max(0, math.ceil(0.5 * len(d)) - 1)])
        n_out = int((np.abs(g.c.to_numpy() - med) > 3 * mad).sum())
        r = got[et]
        assert (r["median_c"], r["mad_c"], r["n_outliers"]) == (med, mad, n_out)


def test_funnel_counts_matches_pandas_recompute():
    """Strict-order funnel completions must equal a per-user pandas scan."""
    from invoice_extraction_ray.ops.relational import funnel_counts

    got = {
        r["step"]: r["n_users"] for r in funnel_counts(SF).to_pylist()
    }

    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    n1 = n2 = n3 = 0
    for _, g in ev.groupby("user_id"):
        views = g[g.event_type == "view"].ts
        if views.empty:
            continue
        n1 += 1
        t1 = views.min()
        clicks = g[(g.event_type == "click") & (g.ts > t1)].ts
        if clicks.empty:
            continue
        n2 += 1
        t2 = clicks.min()
        if ((g.event_type == "purchase") & (g.ts > t2)).any():
            n3 += 1
    assert got == {"1_view": n1, "2_click": n2, "3_purchase": n3}
    assert n1 >= n2 >= n3 > 0


def test_retention_cohorts_matches_pandas_recompute():
    from invoice_extraction_ray.ops.relational import WEEK_US, retention_cohorts

    got = {
        (r["cohort_week"], r["week"]): r["n_users"]
        for r in retention_cohorts(SF).take_all()
    }

    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["week"] = (
        ev.ts.astype("datetime64[us]").astype("int64") // WEEK_US
    ).astype("int64")
    w = ev[["user_id", "week"]].drop_duplicates()
    first = w.groupby("user_id").week.min().rename("cohort_week")
    m = w.merge(first, on="user_id")
    want = m.groupby(["cohort_week", "week"]).size().to_dict()
    assert got == want
    # every cohort's week-0 cell counts the whole cohort
    for (cw, wk), n in want.items():
        assert got[(cw, wk)] == n


def test_top_revenue_orders_matches_pandas_recompute():
    """The Q3 composition (segment filter -> date filters -> join -> top-k)
    must equal a driver-side pandas recompute with the same exact-integer
    revenue quantization."""
    from invoice_extraction_ray.ops.relational import (
        Q3_CUTOFF,
        Q3_SEGMENT,
        top_revenue_orders,
    )

    got = [
        (r["o_orderkey"], r["o_orderpriority"], r["revenue_i"])
        for r in top_revenue_orders(SF, k=10).take_all()
    ]

    cust = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    keys = set(cust[cust.c_mktsegment == Q3_SEGMENT].c_custkey)
    o = orders[(orders.o_orderdate < Q3_CUTOFF) & orders.o_custkey.isin(keys)]
    l = li[li.l_shipdate > Q3_CUTOFF].copy()
    l["rev_i"] = np.floor(l.l_extendedprice * 100.0 + 0.5).astype(np.int64) * (
        10000 - np.floor(l.l_discount * 10000.0 + 0.5).astype(np.int64)
    )
    m = l.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    g = (
        m.groupby(["l_orderkey", "o_orderpriority"], as_index=False)
        .rev_i.sum()
        .sort_values(["rev_i", "l_orderkey"], ascending=[False, True])
        .head(10)
    )
    want = list(zip(g.l_orderkey, g.o_orderpriority, g.rev_i))
    assert got == want
    assert len(got) == 10


def test_embedding_quantize_roundtrip_error_bounded():
    """int8 codes must match a local recompute and dequantize back to within
    half a quantization step of the original values."""
    from invoice_extraction_ray.ops.ann import embedding_quantize

    rows = embedding_quantize(SF).take_all()
    tbl = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = tbl.column("vec_id").to_pylist()
    mat = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float64)
    want = {}
    for i, vid in enumerate(ids):
        scale = max(np.abs(mat[i]).max(), 1e-30)
        q = np.floor(mat[i] / scale * 127.0 + 0.5).astype(np.int64)
        want[vid] = (q, scale)
    assert len(rows) == mat.size
    for r in rows[:500]:
        q, scale = want[r["vec_id"]]
        assert r["q"] == q[r["dim_idx"]]
        assert r["scale_e6"] == int(np.floor(scale * 1e6 + 0.5))
        # dequantized value within half a step of the original
        x = mat[ids.index(r["vec_id"])][r["dim_idx"]]
        assert abs(r["q"] * scale / 127.0 - x) <= scale / 127.0 / 2 + 1e-12


def test_ann_recall_report_consistent_with_component_indexes():
    """The report's hits must equal the individually-computed overlaps and
    the fixed-point recall must be derived from them."""
    from invoice_extraction_ray.ops.ann import (
        ann_recall_report,
        ivf_topk,
        lsh_topk,
        pq_topk,
    )

    rpt = {r["index_name"]: r for r in ann_recall_report(SF, k=10).to_pylist()}
    assert sorted(rpt) == ["ivf", "lsh", "pq"]
    exact = set(_brute_force_topk(10))
    for name, fn in (("ivf", ivf_topk), ("lsh", lsh_topk), ("pq", pq_topk)):
        hits = len({r["vec_id"] for r in fn(SF, k=10).take_all()} & exact)
        assert rpt[name]["hits"] == hits
        assert rpt[name]["recall_e4"] == int(np.floor(10000.0 * hits / 10 + 0.5))


def test_bpe_merge_pairs_matches_pure_python_recompute():
    """Distributed pair counting must equal a per-character pure-Python
    Counter over the same corpus, including the (n desc, pair asc) order."""
    from collections import Counter

    from invoice_extraction_ray.ops.text import _PAIR_WS, bpe_merge_pairs

    got = [(r["pair"], r["n"]) for r in bpe_merge_pairs(SF, k=30).take_all()]

    ws = {chr(c) for c in _PAIR_WS}
    c: Counter = Counter()
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    for s in tbl.column("text").to_pylist():
        s = s or ""
        for a, b in zip(s, s[1:]):
            if a not in ws and b not in ws:
                c[a + b] += 1
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    assert got == want


def test_pq_ann_topk_matches_local_adc_recompute():
    """The distributed PQ pipeline must equal a driver-side numpy recompute
    of the full encode+ADC scoring (same codebooks, same e7-integer argmin,
    same e6 LUT sums) — and keep useful recall vs the exact baseline."""
    from invoice_extraction_ray.ops.ann import _pq_codebooks, pq_topk

    rows = pq_topk(SF, k=10).take_all()
    got = [(r["vec_id"], r["score_e6"]) for r in rows]

    books = _pq_codebooks(SF)
    sub = books[0].shape[1]
    tbl = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(tbl.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float64)
    nrm = np.maximum(np.linalg.norm(mat, axis=1), 1e-30)
    q = mat[list(ids).index(0)]
    qn = q / max(np.linalg.norm(q), 1e-30)
    score = np.zeros(len(ids), dtype=np.int64)
    for j, bk in enumerate(books):
        dots = mat[:, j * sub : (j + 1) * sub] @ bk.T
        cn = (bk * bk).sum(axis=1) / 2.0
        cost = np.floor((cn[None, :] - dots / nrm[:, None]) * 1e7 + 0.5).astype(np.int64)
        lut = np.floor((bk @ qn[j * sub : (j + 1) * sub]) * 1e6 + 0.5).astype(np.int64)
        score += lut[np.argmin(cost, axis=1)]
    order = np.lexsort((ids, -score))[:10]
    want = list(zip(ids[order].tolist(), score[order].tolist()))
    assert got == want
    # 8x4-bit codes are a coarse quantizer (random gaussian corpora are PQ's
    # worst case): require the query itself plus meaningful exact-top overlap
    top_ids = {v for v, _ in got}
    assert 0 in top_ids
    assert len(top_ids & set(_brute_force_topk(10))) >= 3


def test_delta_neardup_cross_side_only():
    """Near-dup pairs within the corpus side (or within the delta side) must
    NOT be emitted; cross-side dups are, oriented (delta, corpus)."""
    import pyarrow as pa

    from invoice_extraction_ray.ops.dedup import delta_neardup

    corpus = pa.table(
        {
            # % 10 == 0 -> delta side: docs 10, 20
            "doc_id": pa.array([10, 20, 1, 2, 3], pa.int64()),
            "text": [
                "alpha beta gamma delta epsilon",  # delta: dup of corpus doc 1
                "one two three four five",  # delta: unique
                "alpha beta gamma delta epsilon",  # corpus: dup of delta 10 AND corpus 3
                "six seven eight nine ten",  # corpus: unique
                "alpha beta gamma delta epsilon",  # corpus: dup of 1 (same side!)
            ],
        }
    )
    got = {
        (r["delta_id"], r["corpus_id"]) for r in delta_neardup(corpus, 0.5).take_all()
    }
    assert got == {(10, 1), (10, 3)}  # corpus-internal (1,3) and delta 20 absent


def test_media_ann_topk_matches_local_recompute():
    """The media feature->projection->cosine pipeline must equal a local
    numpy recompute over the same payload bytes."""
    import numpy as np
    import pyarrow.parquet as pq

    from invoice_extraction_ray.ops.multimodal import (
        N_HIST_BINS,
        _embed_feature_matrix,
    )
    from invoice_extraction_ray.ops.multimodal import media_ann_topk

    got = [(r["doc_id"], r["sim_e4"]) for r in media_ann_topk(SF, k=5).take_all()]

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ids = tbl.column("doc_id").to_pylist()
    feats = []
    for s in tbl.column("text").to_pylist():
        b = np.frombuffer((s or "").encode(), dtype=np.uint8)
        if b.size == 0:
            feats.append(np.zeros(N_HIST_BINS))
            continue
        h = np.bincount(b >> 4, minlength=N_HIST_BINS).astype(np.float64)
        feats.append((h / b.size).astype(np.float32).astype(np.float64))
    e = _embed_feature_matrix(np.asarray(feats))
    norms = np.linalg.norm(e, axis=1)
    q = e[ids.index(0)] / norms[ids.index(0)]
    keep = norms > 0
    sims = np.floor((e[keep] @ q) / norms[keep] * 10_000.0 + 0.5).astype(np.int64)
    kept_ids = np.asarray(ids)[keep]
    order = np.lexsort((kept_ids, -sims))
    want = [(int(kept_ids[i]), int(sims[i])) for i in order[:5]]
    assert got == want


def test_novelty_scores_planted():
    """Two identical docs share every gram (novelty 0); a fully unique doc
    scores 10000; a half-shared doc lands exactly between."""
    import pyarrow as pa

    from invoice_extraction_ray.ops.dedup import novelty_scores

    corpus = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": [
                "aa bb cc dd",  # grams: {aa bb cc, bb cc dd} — all shared with doc 2
                "aa bb cc dd",
                "xx yy zz ww",  # fully unique
                "aa bb cc qq",  # {aa bb cc (shared), bb cc qq (unique)}
            ],
        }
    )
    got = {r["doc_id"]: r for r in novelty_scores(corpus).take_all()}
    assert got[1]["novelty_e4"] == 0 and got[2]["novelty_e4"] == 0
    assert got[3]["novelty_e4"] == 10000 and got[3]["n_unique"] == 2
    assert got[4]["n_grams"] == 2 and got[4]["n_unique"] == 1
    assert got[4]["novelty_e4"] == 5000


def test_substring_dup_spans_planted():
    """Cross-doc run -> one merged span; within-doc repeats count as sites;
    positions exactly l apart (windows touching) merge, l+1 apart break."""
    import pyarrow as pa

    from invoice_extraction_ray.ops.dedup import substring_dup_spans

    corpus = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5, 6, 7, 8], pa.int64()),
            "text": [
                "p1 a b c d e f g h q1 r1 s1 t1",  # 8-token run shared with doc 2
                "p2 a b c d e f g h q2 r2 s2 t2",
                "m m m m m m",  # within-doc repeated gram (3 sites)
                "u0 u1 u2 u3 u4 u5 u6 u7",  # fully unique
                "s t u v x5 y5 z5 w5 q5 s t u w",  # dup pos {0, 9}: gap > l, 2 spans
                "s t u v n6 n7 n8 n9 n10 s t u w",
                "k1 k2 k3 k4 k5 k6 k7 k8",  # dup pos {0, 4}: touching, 1 span
                "k1 k2 k3 k4 Z k5 k6 k7 k8",  # dup pos {0, 5}: gap > l, 2 spans
            ],
        }
    )
    rows = substring_dup_spans(corpus, l=4).take_all()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["span_len"])
        )
    got = {d: sorted(v) for d, v in got.items()}
    assert got[1] == [(1, 9, 8)] and got[2] == [(1, 9, 8)]
    assert got[3] == [(0, 6, 6)]
    assert 4 not in got
    assert got[5] == [(0, 4, 4), (9, 13, 4)] and got[6] == got[5]
    assert got[7] == [(0, 8, 8)]
    assert got[8] == [(0, 4, 4), (5, 9, 4)]


def test_substring_scrub_removes_all_span_tokens():
    """clean_text drops exactly the span-covered tokens (all occurrences),
    keeps everything else in order, and emits untouched docs verbatim."""
    import pyarrow as pa

    from invoice_extraction_ray.ops.dedup import substring_scrub

    corpus = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 8], pa.int64()),
            "text": [
                "p1 a b c d e f g h q1 r1 s1 t1",
                "p2 a b c d e f g h q2 r2 s2 t2",
                "m m m m m m",
                "u0 u1 u2 u3 u4 u5 u6 u7",
                "k1 k2 k3 k4 Z k5 k6 k7 k8",
            ],
        }
    )
    # doc 8's halves duplicate doc 2's? no — they duplicate NOTHING here, so
    # plant a partner for them to keep the span structure from the spans test
    corpus = pa.concat_tables(
        [
            corpus,
            pa.table(
                {
                    "doc_id": pa.array([7], pa.int64()),
                    "text": ["k1 k2 k3 k4 k5 k6 k7 k8"],
                }
            ),
        ]
    )
    got = {r["doc_id"]: r for r in substring_scrub(corpus, l=4).take_all()}
    assert got[1]["clean_text"] == "p1 q1 r1 s1 t1" and got[1]["n_removed"] == 8
    assert got[2]["clean_text"] == "p2 q2 r2 s2 t2" and got[2]["n_removed"] == 8
    assert got[3]["clean_text"] == "" and got[3]["n_removed"] == 6
    assert got[4]["clean_text"] == "u0 u1 u2 u3 u4 u5 u6 u7"
    assert got[4]["n_removed"] == 0
    assert got[7]["clean_text"] == "" and got[7]["n_removed"] == 8
    assert got[8]["clean_text"] == "Z" and got[8]["n_removed"] == 8
    assert len(got) == 6


def test_unigram_surprisal_known_answer(tmp_path):
    """bitlen quantization by hand: counts a=3 b=2 c=1, N=6 (bitlen 3) ->
    surprisal(a)=surprisal(b)=1, surprisal(c)=2."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from invoice_extraction_ray.ops.text import unigram_surprisal

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": ["a a a b", "b c"],
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = {r["doc_id"]: r for r in unigram_surprisal(str(tmp_path)).take_all()}
    assert got[1]["n_tokens"] == 4 and got[1]["surprisal"] == 4
    assert got[1]["mean_surprisal_e4"] == 10000
    assert got[2]["n_tokens"] == 2 and got[2]["surprisal"] == 3
    assert got[2]["mean_surprisal_e4"] == 15000


def test_unigram_surprisal_join_path_equals_broadcast():
    """The open-vocab token-shard-join path (forced via vocab_cap=0) must
    produce byte-identical integer rows to the broadcast fast path on a
    synthetic high-vocabulary corpus (every doc contributes unique tokens,
    so the vocab outnumbers any realistic per-doc dedup)."""
    from invoice_extraction_ray.ops.text import unigram_surprisal

    fast = sorted(
        (r["doc_id"], r["n_tokens"], r["surprisal"], r["mean_surprisal_e4"])
        for r in unigram_surprisal(SF).take_all()
    )
    joined = sorted(
        (r["doc_id"], r["n_tokens"], r["surprisal"], r["mean_surprisal_e4"])
        for r in unigram_surprisal(SF, vocab_cap=0).take_all()
    )
    assert fast == joined and len(fast) > 0


def test_unigram_surprisal_join_path_high_vocab(tmp_path):
    """Synthetic corpus whose vocabulary exceeds the (tiny, test-set) cap —
    the auto-dispatch itself takes the join path, and the bitlen math stays
    exact: 600 distinct singleton tokens + 'x' repeated 424 times gives
    N=1024 (bitlen 11); singleton surprisal 10, x surprisal (bitlen 424=9)
    -> 2."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from invoice_extraction_ray.ops.text import unigram_surprisal

    texts = []
    for d in range(6):
        uniq = " ".join(f"tok{d}_{i}" for i in range(100))
        texts.append(uniq if d else uniq + " " + " ".join(["x"] * 424))
    pq.write_table(
        pa.table({"doc_id": pa.array(range(6), pa.int64()), "text": texts}),
        str(tmp_path / "documents.parquet"),
    )
    got = {
        r["doc_id"]: r
        for r in unigram_surprisal(str(tmp_path), vocab_cap=500).take_all()
    }
    assert len(got) == 6
    assert got[1]["n_tokens"] == 100 and got[1]["surprisal"] == 1000
    assert got[0]["n_tokens"] == 524 and got[0]["surprisal"] == 1000 + 424 * 2
    assert got[1]["mean_surprisal_e4"] == 100000


def test_user_cumulative_value_known_answer(tmp_path):
    """Running totals reset per user and follow (ts, event_id) order,
    including the equal-ts tie broken by event_id."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from invoice_extraction_ray.ops.window import user_cumulative_value

    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "ts": pa.array([100, 50, 50, 200, 10], pa.timestamp("us")),
                "user_id": pa.array([7, 7, 7, 9, 9], pa.int64()),
                "value": [1.005, 2.0, 3.0, 10.0, 0.994],
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = {r["event_id"]: r for r in user_cumulative_value(str(tmp_path)).take_all()}
    # user 7 order: (50,#2) -> (50,#3) -> (100,#1).  1.005*100 is the double
    # 100.4999... so floor(x+0.5) gives 100 — the point of doing the cents
    # conversion identically on both engine and oracle sides.
    assert (got[2]["cum_n"], got[2]["cum_value_c"]) == (1, 200)
    assert (got[3]["cum_n"], got[3]["cum_value_c"]) == (2, 500)
    assert (got[1]["cum_n"], got[1]["cum_value_c"]) == (3, 600)
    # user 9 order: (10,#5) -> (200,#4); 0.994 -> 99 cents
    assert (got[5]["cum_n"], got[5]["cum_value_c"]) == (1, 99)
    assert (got[4]["cum_n"], got[4]["cum_value_c"]) == (2, 1099)


def test_cms_heavy_hitters_no_false_negatives():
    """CMS estimates upper-bound true counts, so every token whose TRUE
    count clears N/denom must be reported, and every reported estimate
    must be >= the token's true count."""
    from collections import Counter

    import pyarrow.parquet as pq

    from invoice_extraction_ray.ops.sketch import cms_heavy_hitters

    got = {r["token"]: r["est_n"] for r in cms_heavy_hitters(SF, denom=64).take_all()}

    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"]).column("text")
    true = Counter()
    for s in texts.to_pylist():
        true.update((s or "").split())
    n = sum(true.values())
    for tok, c in true.items():
        if c * 64 >= n:
            assert tok in got, f"false negative: {tok}"
    for tok, est in got.items():
        assert est >= true[tok], f"CMS under-estimated {tok}"


def test_tfidf_top_terms_matches_local_recompute():
    """Engine top-3 equals a brute-force (tf desc, df asc, token asc)
    ranking recomputed locally with Counters."""
    from collections import Counter

    import pyarrow.parquet as pq

    from invoice_extraction_ray.ops.text import tfidf_top_terms

    got = {
        (r["doc_id"], r["rank"]): (r["token"], r["tf"], r["df"])
        for r in tfidf_top_terms(SF, k=3).take_all()
    }

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    tf_by_doc = {
        d: Counter((s or "").split())
        for d, s in zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())
    }
    df = Counter()
    for c in tf_by_doc.values():
        df.update(c.keys())
    want = {}
    for d, c in tf_by_doc.items():
        ranked = sorted(c.items(), key=lambda kv: (-kv[1], df[kv[0]], kv[0]))[:3]
        for i, (tok, tf) in enumerate(ranked, 1):
            want[(d, i)] = (tok, tf, df[tok])
    assert got == want


def test_media_exact_dedup_planted(tmp_path):
    """Identical payloads collapse to one row keyed by content hash with the
    min doc_id as keeper; distinct payloads stay separate."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from invoice_extraction_ray.ops.multimodal import media_exact_dedup

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([5, 1, 3, 2], pa.int64()),
                "text": ["same body", "same body", "other", "same body"],
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = {r["sha256"]: r for r in media_exact_dedup(str(tmp_path)).take_all()}
    dup = got[hashlib.sha256(b"same body").hexdigest()]
    assert dup["keep_id"] == 1 and dup["n_copies"] == 3
    other = got[hashlib.sha256(b"other").hexdigest()]
    assert other["keep_id"] == 3 and other["n_copies"] == 1
    assert len(got) == 2


def test_event_transitions_known_answer(tmp_path):
    """Pairs form within users only, in (ts, event_id) order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from invoice_extraction_ray.ops.window import event_transitions

    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "ts": pa.array([10, 20, 30, 10, 20], pa.timestamp("us")),
                "user_id": pa.array([7, 7, 7, 9, 9], pa.int64()),
                "event_type": ["A", "B", "A", "A", "A"],
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in event_transitions(str(tmp_path)).take_all()
    }
    assert got == {("A", "B"): 1, ("B", "A"): 1, ("A", "A"): 1}


def test_dsir_logweights_known_answer(tmp_path):
    """Hand-quantized DSIR: raw counts a=2 b=2 (N=4), target(en) a=2 (N=2);
    lambda(a) = (bitlen(3)-bitlen(3)) - (bitlen(3)-bitlen(5)) = +1,
    lambda(b) = (bitlen(1)-bitlen(3)) - (bitlen(3)-bitlen(5)) = 0."""
    import zlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from invoice_extraction_ray.ops.curate import DSIR_BUCKETS, dsir_logweights

    assert (
        zlib.crc32(b"a") % DSIR_BUCKETS != zlib.crc32(b"b") % DSIR_BUCKETS
    ), "test tokens must not collide"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": ["a a", "b b"],
                "lang": ["en", "de"],
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = {r["doc_id"]: r for r in dsir_logweights(str(tmp_path)).take_all()}
    assert got[1]["logw_q2"] == 2 and got[1]["n_tokens"] == 2
    assert got[2]["logw_q2"] == 0 and got[2]["n_tokens"] == 2


def test_bloom_contamination_no_false_negatives(tmp_path):
    """An eval doc whose text exactly matches a train doc MUST flag (bloom
    has no false negatives); a unique eval doc stays clean at this load
    (5 insertions into 4x8192 bits -> fpp ~ 1e-13)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from invoice_extraction_ray.ops.sketch import bloom_contamination

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 10, 1, 2, 3, 4, 5], pa.int64()),
                "text": [
                    "shared body text",  # eval, dup of train doc 3
                    "totally novel eval body",  # eval, unique
                    "train one",
                    "train two",
                    "shared body text",
                    "train four",
                    "train five",
                ],
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = {r["doc_id"]: r["flagged"] for r in bloom_contamination(str(tmp_path)).take_all()}
    assert got == {0: True, 10: False}


def test_quality_topquantile_threshold_semantics():
    """Kept set must be exactly {docs with score >= quantile_disc(q)} per the
    ceil(q*n)-1 order-statistic convention, recomputed locally."""
    import math

    import pyarrow.parquet as pq

    from invoice_extraction_ray.ops.text import quality_arrays, quality_topquantile

    got = {r["doc_id"]: r["score_e5"] for r in quality_topquantile(SF, q=0.5).take_all()}

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    scores = quality_arrays(tbl.column("text"))["score_e5"]
    ids = tbl.column("doc_id").to_pylist()
    srt = sorted(scores.tolist())
    thr = srt[max(0, math.ceil(0.5 * len(srt)) - 1)]
    want = {d: int(s) for d, s in zip(ids, scores.tolist()) if s >= thr}
    assert got == want


def test_token_frequencies_matches_counter():
    """Distributed vocab counts must equal a local Counter, with the
    (n desc, token asc) tie-break order preserved."""
    from collections import Counter

    import pyarrow.parquet as pq

    from invoice_extraction_ray.ops.text import token_frequencies

    rows = token_frequencies(SF, k=10).take_all()
    c = Counter()
    for s in pq.read_table(f"{SF}/documents.parquet", columns=["text"]).column(
        "text"
    ).to_pylist():
        c.update((s or "").split())
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["token"], r["n"]) for r in rows] == want


def test_pack_documents_stream_invariants():
    """Every doc packed exactly once; within a (shard) stream, offsets follow
    the exact concat-and-chunk recurrence over doc_id order."""
    from collections import defaultdict

    from invoice_extraction_ray.ops.text import pack_documents

    budget = 64
    rows = pack_documents(SF, budget=budget, n_shards=4).take_all()
    assert len({r["doc_id"] for r in rows}) == len(rows)
    streams = defaultdict(list)
    for r in rows:
        assert r["shard"] == r["doc_id"] % 4
        streams[r["shard"]].append(r)
    for stream in streams.values():
        stream.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in stream:
            assert r["pack_id"] == cum // budget
            assert r["pack_offset"] == cum % budget
            cum += r["n_tok"]


def test_kmeans_clusters_matches_local_recompute():
    """Distributed assignment must equal a driver-side numpy recompute with
    the identical deterministic training rules (sample → seeded k-means →
    raw-dot argmax), covering every vector."""
    import pyarrow.parquet as pq

    from invoice_extraction_ray.ops.ann import _train_centroids, kmeans_clusters

    rows = kmeans_clusters(SF, n_clusters=4).take_all()
    got = {r["vec_id"]: r["cluster"] for r in rows}

    cents = _train_centroids(SF, 4)
    tbl = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = tbl.column("vec_id").to_pylist()
    mat = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float64)
    want = dict(zip(ids, np.argmax(mat @ cents.T, axis=1).tolist()))
    assert got == want
    assert len(got) == len(ids)
    # sorted output contract
    assert [r["vec_id"] for r in rows] == sorted(ids)


def test_prepare_corpus_composition():
    """Composed prep pipeline on the sf0.001 documents table must equal the
    brute-force composition of its three stages computed in-process."""
    from collections import defaultdict

    from invoice_extraction_ray.ops.dedup import word_trigrams
    from invoice_extraction_ray.ops.text import quality_arrays
    from invoice_extraction_ray.pipelines.prep import PREP_MIN_SCORE_E5, prepare_corpus

    docs = _docs()
    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    scores = quality_arrays(docs.column("text"))["score_e5"]

    # exact-dup groups -> keep min doc_id
    groups = defaultdict(list)
    for d, s in zip(ids, texts):
        groups[s or ""].append(d)
    rep_of = {min(v): (len(v)) for v in groups.values()}

    # near-dup clusters (jaccard >= 0.5) -> min-label components
    gsets = {d: word_trigrams(s) for d, s in zip(ids, texts)}
    import itertools

    parent = {d: d for d in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in itertools.combinations(ids, 2):
        ga, gb = gsets[a], gsets[b]
        i = len(ga & gb)
        if i > 0 and i * 10000 >= 5000 * (len(ga) + len(gb) - i):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    in_pair = {d for d in ids if find(d) != d or any(
        find(o) == d for o in ids if o != d)}

    score_of = dict(zip(ids, scores))
    expected = {}
    for d, n_copies in rep_of.items():
        if score_of[d] < PREP_MIN_SCORE_E5:
            continue
        if d in in_pair and find(d) != d:
            continue  # non-representative member of a near-dup cluster
        expected[d] = (n_copies, int(score_of[d]))

    got = {
        r["doc_id"]: (r["n_copies"], r["score_e5"])
        for r in prepare_corpus(docs).take_all()
    }
    assert got == expected
    assert 0 < len(got) < len(ids)  # every stage must actually bind


def test_contamination_check_planted():
    """Known-answer corpus: an eval doc copied from a train doc is 100%
    contaminated, a unique eval doc is 0%, and a half-overlapping one lands
    at the exact integer fraction."""
    from invoice_extraction_ray.ops.dedup import contamination_check, word_trigrams

    train_text = "alpha beta gamma delta epsilon zeta eta theta"
    uniq_text = "one two three four five six"
    # shares exactly the first train trigram, plus two grams of its own
    half_text = "alpha beta gamma novel1 novel2"
    docs = pa.table(
        {
            # % 10 == 0 -> eval
            "doc_id": pa.array([1, 2, 10, 20, 30], pa.int64()),
            "text": pa.array(
                [train_text, "unrelated filler words here all distinct tokens",
                 train_text, uniq_text, half_text],
                pa.string(),
            ),
        }
    )
    rows = {r["doc_id"]: r for r in contamination_check(docs).take_all()}
    assert set(rows) == {10, 20, 30}
    n_train = len(word_trigrams(train_text))
    assert (rows[10]["n_grams"], rows[10]["n_contaminated"], rows[10]["frac_e4"]) == (
        n_train, n_train, 10_000,
    )
    assert (rows[20]["n_contaminated"], rows[20]["frac_e4"]) == (0, 0)
    n_half = len(word_trigrams(half_text))
    assert rows[30]["n_grams"] == n_half and rows[30]["n_contaminated"] == 1
    assert rows[30]["frac_e4"] == (20_000 * 1 + n_half) // (2 * n_half)


def test_bm25_topk_matches_bruteforce():
    """Engine top-k == single-process brute force with the identical pinned
    float64 evaluation order (the DuckDB value oracle is the cross-engine
    check; this guards the distributed partial-top-k + sort path)."""
    from invoice_extraction_ray.ops.text import BM25_B, BM25_K1, BM25_TERMS, bm25_topk

    docs = _docs()
    toks = [(s or "").split() for s in docs.column("text").to_pylist()]
    ids = docs.column("doc_id").to_pylist()
    n = len(toks)
    avgdl = sum(len(x) for x in toks) / n
    dfs = [sum(1 for x in toks if t in x) for t in BM25_TERMS]
    idfs = [(n - df + 0.5) / (df + 0.5) for df in dfs]
    k1p1 = BM25_K1 + 1.0
    expected = []
    for d, tk in zip(ids, toks):
        nrm = BM25_K1 * ((1.0 - BM25_B) + BM25_B * (len(tk) / avgdl))
        score, matched = 0.0, 0
        for term, idf in zip(BM25_TERMS, idfs):
            tf = float(tk.count(term))
            score = score + idf * ((tf * k1p1) / (tf + nrm))
            matched += tf > 0
        if matched:
            expected.append((int(np.floor(score * 1000000.0 + 0.5)), d))
    expected.sort(key=lambda p: (-p[0], p[1]))
    got = [(r["score_e6"], r["doc_id"]) for r in bm25_topk(SF).take_all()]
    assert got == expected[:10]
    # the fixed benchmark query must exercise idf spread on this corpus
    assert max(dfs) > 2 * min(dfs)


def test_fingerprints_deterministic_and_distinct():
    from invoice_extraction_ray.ops.text import fingerprint64

    texts = [t for t in _docs().column("text").to_pylist() if t][:50]
    fps = [fingerprint64(t) for t in texts]
    assert fps == [fingerprint64(t) for t in texts]
    assert len(set(fps)) == len(set(texts))
    assert fingerprint64("a b c") != fingerprint64("c b a")  # order-sensitive


def test_langid_english_corpus():
    from invoice_extraction_ray.ops.text import langid

    rows = langid(SF).take_all()
    langs = {r["lang_pred"] for r in rows}
    assert langs <= {"en", "es", "de", "fr", "zh", "und"}
    n_en = sum(1 for r in rows if r["lang_pred"] == "en")
    assert n_en >= 0.5 * len(rows)  # corpus is English-dominant


def test_media_metadata_schema_and_determinism():
    from invoice_extraction_ray.ops.multimodal import media_metadata

    a = sorted(media_metadata(SF).take_all(), key=lambda r: r["doc_id"])
    b = sorted(media_metadata(SF).take_all(), key=lambda r: r["doc_id"])
    assert a == b
    assert all(len(r["sha256"]) == 64 and r["width"] >= 64 for r in a)


def test_stub_decoder_real_mode_raises_without_codec():
    from invoice_extraction_ray.ops.multimodal import StubDecoder, _pil

    if _pil() is not None:
        pytest.skip("Pillow installed: real mode decodes (test_real_codec_decode_png)")
    with pytest.raises(NotImplementedError):
        StubDecoder(real=True)._decode(b"xx")


def test_bpe_token_count_matches_python_re():
    from invoice_extraction_ray.ops.text import bpe_pretokenize, bpe_token_count

    got = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_token_count(SF).take_all()}
    docs = _docs()
    for d, s in zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()):
        assert got[d] == len(bpe_pretokenize(s)), d
    assert bpe_pretokenize("I'll add 42 items, okay?") == [
        "I", "'ll", " add", " 42", " items", ",", " okay", "?"
    ]


def test_embedding_lsh_neardup_recall_vs_exact():
    from invoice_extraction_ray.ops.dedup import embedding_neardup, embedding_neardup_lsh

    exact = {
        (r["a_id"], r["b_id"])
        for r in embedding_neardup(SF, threshold=0.3).take_all()
    }
    approx = {
        (r["a_id"], r["b_id"])
        for r in embedding_neardup_lsh(SF, threshold=0.3).take_all()
    }
    assert approx <= exact  # within-bucket scoring is exact: no false positives
    if exact:
        assert len(approx) / len(exact) >= 0.4  # 4x3 banded recall floor (theory ~0.6)


def test_embedding_neardup_size_guard():
    """The exact O(N^2) variant must refuse corpora past its row cap (from
    parquet metadata, before any data is read) and point at the scale twins."""
    import pytest

    from invoice_extraction_ray.ops.dedup import embedding_neardup

    with pytest.raises(ValueError, match="embedding_neardup_lsh"):
        embedding_neardup(SF, threshold=0.3, max_rows=10)
    # under the cap the pipeline builds as before
    assert embedding_neardup(SF, threshold=0.3).count() >= 0


def test_media_resize_and_frames():
    from invoice_extraction_ray.ops.multimodal import (
        StubFrameSampler,
        StubResizer,
        media_frames,
        media_resized,
    )

    rows = media_resized(SF, max_dim=128).take_all()
    assert rows and all(max(r["width"], r["height"]) <= 128 for r in rows)

    frames = media_frames(SF, n_frames=3).take_all()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == list(range(len(v))) and len(v) <= 3 for v in by_doc.values())

    from invoice_extraction_ray.ops.multimodal import _pil

    if _pil() is None:  # no codec installed: real=True must raise, honestly
        with pytest.raises(NotImplementedError):
            StubResizer(real=True)(pa.table({"doc_id": [1], "payload": [b"x"]}))
        with pytest.raises(NotImplementedError):
            StubFrameSampler(real=True)(pa.table({"doc_id": [1], "payload": [b"x"]}))


def test_real_codec_decode_png():
    """When Pillow IS installed, the real=True path must actually decode:
    a PNG generated by Pillow round-trips through decode, resize, and
    frame sampling with true dimensions.  Skipped where codecs are absent
    (this sandbox) — the soft-import contract either works or raises."""
    import pytest

    pytest.importorskip("PIL.Image")
    import io

    from PIL import Image

    from invoice_extraction_ray.ops.multimodal import (
        StubDecoder,
        StubFrameSampler,
        StubResizer,
    )

    buf = io.BytesIO()
    Image.new("RGB", (300, 200), (255, 0, 0)).save(buf, format="PNG")
    png = buf.getvalue()

    w, h, fmt = StubDecoder(real=True)._decode(png)
    assert (w, h, fmt) == (300, 200, "png")

    resized = StubResizer(max_dim=128, real=True)(
        pa.table({"doc_id": [1], "payload": [png]})
    )
    assert resized.column("width")[0].as_py() == 128
    assert resized.column("height")[0].as_py() == 85  # 200 * 128/300, floor

    frames = StubFrameSampler(n_frames=3, real=True)(
        pa.table({"doc_id": [1], "payload": [png]})
    )
    assert frames.num_rows == 1  # single-frame image -> one frame
    with Image.open(io.BytesIO(frames.column("frame")[0].as_py())) as fr:
        assert fr.size == (300, 200)


def test_hll_distinct_error_bound():
    import duckdb

    from invoice_extraction_ray.ops.sketch import hll_distinct_users

    got = {
        r["event_type"]: r["approx_distinct"]
        for r in hll_distinct_users(SF).take_all()
    }
    exact = dict(
        duckdb.sql(
            f"select event_type, count(distinct user_id) "
            f"from read_parquet('{SF}/events.parquet') group by 1"
        ).fetchall()
    )
    assert set(got) == set(exact)
    for et, true_n in exact.items():
        # 1024 registers: ~3.25% stderr in HLL mode; linear counting regime
        # here (n << m) is tighter. 10% bound leaves slack for small n.
        assert abs(got[et] - true_n) <= max(2, 0.1 * true_n), (et, got[et], true_n)


def test_hll_registers_merge_associative():
    import numpy as np

    from invoice_extraction_ray.ops.sketch import _partial_registers, hll_estimate

    keys = np.arange(1, 2001, dtype=np.int64)
    whole = _partial_registers(keys)
    parts = np.maximum.reduce(
        [_partial_registers(keys[i::4]) for i in range(4)]
    )
    assert (whole == parts).all()
    est = hll_estimate(whole)
    assert abs(est - 2000) <= 0.1 * 2000


def test_media_features_match_bruteforce():
    from invoice_extraction_ray.ops.multimodal import N_HIST_BINS, media_features

    got = {r["doc_id"]: r["features"] for r in media_features(SF).take_all()}
    docs = _docs()
    for d, s in zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()):
        b = (s or "").encode()
        expected = [0.0] * N_HIST_BINS
        if b:
            for byte in b:
                expected[byte >> 4] += 1
            expected = [np.float32(x / len(b)).item() for x in expected]
        assert got[d] == pytest.approx(expected), d


def test_transient_failure_retries(tmp_path):
    """Fault tolerance: a batch fn that fails the first time each worker
    process sees it succeeds under retry_exceptions — output is complete
    and correct (Ray task retry, SURVEY.md §4)."""
    import pyarrow as pa
    import ray.data

    marker_dir = str(tmp_path)

    def flaky(t: pa.Table) -> pa.Table:
        import os

        marker = f"{marker_dir}/seen-{os.getpid()}"
        if not os.path.exists(marker):
            open(marker, "w").close()
            raise RuntimeError("transient failure (injected once per worker)")
        import pyarrow.compute as pc

        return t.append_column("doubled", pc.multiply(t.column("doc_id"), 2))

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    out = ds.map_batches(
        flaky,
        batch_format="pyarrow",
        retry_exceptions=True,
        max_retries=5,
    )
    rows = out.take_all()
    assert len(rows) == ds.count()
    assert all(r["doubled"] == 2 * r["doc_id"] for r in rows)


def test_ngram_jaccard_neardup_exact_vs_bruteforce():
    """The inverted-index plan must return EXACTLY the brute-force pair set
    (it is an exact operator, unlike the sketch-based families)."""
    from invoice_extraction_ray.ops.dedup import ngram_jaccard_neardup, word_trigrams

    planted, _ = _planted(_docs())
    got = {
        (r["a_id"], r["b_id"], r["n_inter"], r["n_union"])
        for r in ngram_jaccard_neardup(planted, threshold=0.5).take_all()
    }
    ids = planted.column("doc_id").to_pylist()
    texts = planted.column("text").to_pylist()
    grams = {d: word_trigrams(s) for d, s in zip(ids, texts)}
    want = set()
    ordered = sorted(ids)
    for i, a in enumerate(ordered):
        for b in ordered[i + 1 :]:
            inter = len(grams[a] & grams[b])
            union = len(grams[a] | grams[b])
            if inter > 0 and inter * 10_000 >= 5_000 * union:
                want.add((a, b, inter, union))
    assert want, "fixture must contain true near-duplicates"
    assert got == want


def test_ngram_jaccard_max_df_bounds_hot_gram_fanout():
    """A gram shared by K docs fans out K^2/2 candidate pairs; the max_df cap
    must drop such grams before pair emission while leaving pairs that share
    only low-df grams untouched."""
    import pyarrow as pa

    from invoice_extraction_ray.ops.dedup import ngram_jaccard_neardup

    n_hot = 24
    ids, texts = [], []
    for i in range(n_hot):
        ids.append(i)
        # every doc shares ONE hot trigram; the rest is unique
        texts.append(f"alpha beta gamma uniq{i}")
    # a planted true near-dup pair sharing only low-df grams
    ids += [1000, 1001]
    texts += ["delta epsilon zeta eta theta", "delta epsilon zeta eta iota"]
    corpus = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})

    # low threshold so hot-gram pairs (jaccard 1/3) qualify when uncapped
    uncapped = ngram_jaccard_neardup(corpus, threshold=0.3).take_all()
    hot_pairs = [r for r in uncapped if r["a_id"] < 1000 and r["b_id"] < 1000]
    assert len(hot_pairs) == n_hot * (n_hot - 1) // 2

    capped = ngram_jaccard_neardup(corpus, threshold=0.3, max_df=5).take_all()
    got = {(r["a_id"], r["b_id"]) for r in capped}
    # the K^2 hot-gram fanout is gone; the low-df planted pair survives
    assert all(a >= 1000 for a, _ in got)
    assert (1000, 1001) in got


def test_minhash_max_bucket_bounds_hot_bucket_fanout():
    """A dup cluster of K identical docs lands K docs in every LSH bucket and
    would emit K^2/2 candidates per band; max_bucket must drop those buckets
    while an untouched small-bucket pair still comes through."""
    import pyarrow as pa

    from invoice_extraction_ray.ops.dedup import minhash_neardup

    n_hot = 20
    hot = "all the same boilerplate text repeated across the whole corpus"
    ids = list(range(n_hot)) + [1000, 1001]
    texts = [hot] * n_hot + [
        "unique planted pair body one two three four five six",
        "unique planted pair body one two three four five seven",
    ]
    corpus = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})

    uncapped = minhash_neardup(corpus, jaccard_threshold=0.5).take_all()
    hot_pairs = [r for r in uncapped if r["a_id"] < 1000 and r["b_id"] < 1000]
    assert len(hot_pairs) == n_hot * (n_hot - 1) // 2

    capped = minhash_neardup(corpus, jaccard_threshold=0.5, max_bucket=5).take_all()
    got = {(r["a_id"], r["b_id"]) for r in capped}
    assert all(a >= 1000 for a, _ in got)
    assert (1000, 1001) in got


def test_neardup_clusters_chain_components():
    """Multi-hop components: A~B and B~C but A!~C must still share one
    cluster (min doc_id), exercising >1 label-propagation round."""
    import pyarrow as pa

    from invoice_extraction_ray.ops.dedup import neardup_clusters

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lamda mu nu xi omicron pi rho sigma tau upsilon").split()
    # chain: each neighbor overlaps heavily, ends overlap little
    docs = {
        10: " ".join(base),
        11: " ".join(base[2:] + ["extra", "words", "one", "two"]),
        12: " ".join(base[5:] + ["extra", "words", "one", "two", "three", "four", "five", "six", "seven", "eight"]),
        # a separate exact-duplicate pair
        20: "completely different duplicated text body here now",
        21: "completely different duplicated text body here now",
        # a singleton (must NOT appear in the output)
        30: "nothing like anything else in this corpus at all whatsoever",
    }
    t = pa.table(
        {
            "doc_id": pa.array(list(docs), pa.int64()),
            "text": pa.array(list(docs.values()), pa.string()),
        }
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in neardup_clusters(t, threshold=0.5).take_all()
    }
    assert got[20] == 20 and got[21] == 20
    assert 30 not in got
    # the chain: all three must map to 10 iff each adjacent pair clears 0.5
    from invoice_extraction_ray.ops.dedup import word_trigrams

    def j(a, b):
        ga, gb = word_trigrams(docs[a]), word_trigrams(docs[b])
        return len(ga & gb) / len(ga | gb)

    assert j(10, 11) >= 0.5 and j(11, 12) >= 0.5 and j(10, 12) < 0.5
    assert got[10] == got[11] == got[12] == 10


def test_quantile_sketch_error_bound_vs_exact():
    """The mergeable log-histogram quantiles must land within the sketch's
    relative value error of the exact per-group quantiles (and agree on n)."""
    from invoice_extraction_ray.ops.sketch import (
        QSK_BINS_PER_DECADE,
        value_quantiles,
        value_quantiles_sketch,
    )

    exact = {r["event_type"]: r for r in value_quantiles(SF).take_all()}
    approx = {r["event_type"]: r for r in value_quantiles_sketch(SF).take_all()}
    assert set(exact) == set(approx)
    # bin width is a factor of 10^(1/bins_per_decade); midpoint representative
    # keeps the multiplicative error within one full bin either way
    rel = 10.0 ** (1.0 / QSK_BINS_PER_DECADE)
    for et, e in exact.items():
        a = approx[et]
        assert a["n"] == e["n"]
        for col in ("p25_c", "p50_c", "p75_c", "p95_c"):
            lo, hi = e[col] / rel - 1, e[col] * rel + 1
            assert lo <= a[col] <= hi, (et, col, e[col], a[col])


def test_quantile_sketch_merge_is_partition_invariant():
    """Bin-count partials summed in any grouping give identical registers."""
    import numpy as np

    from invoice_extraction_ray.ops.sketch import QSK_N_BINS, _qsk_bin, quantile_sketch_estimate

    rng = np.random.RandomState(3)
    vals = rng.uniform(0.01, 500.0, size=5000)
    whole = np.bincount(_qsk_bin(vals), minlength=QSK_N_BINS)
    parts = np.zeros(QSK_N_BINS, dtype=np.int64)
    for chunk in np.array_split(vals, 13):
        parts += np.bincount(_qsk_bin(chunk), minlength=QSK_N_BINS)
    assert (whole == parts).all()
    for q in (0.25, 0.5, 0.9):
        assert quantile_sketch_estimate(whole, q) == quantile_sketch_estimate(parts, q)


def test_neardup_ops_handle_empty_and_singleton_corpora():
    """Join-based near-dup ops must return empty results (not crash) when no
    candidate pair exists — Ray's hash-join aggregators choke on an empty
    join side unless guarded."""
    import pyarrow as pa

    from invoice_extraction_ray.ops.dedup import (
        minhash_neardup,
        neardup_clusters,
        ngram_jaccard_neardup,
        simhash_neardup,
    )

    empty = pa.schema([("doc_id", pa.int64()), ("text", pa.string())]).empty_table()
    single = pa.table(
        {"doc_id": pa.array([1], pa.int64()), "text": pa.array(["hello world foo"], pa.string())}
    )
    for src in (empty, single):
        assert minhash_neardup(src).take_all() == []
        assert ngram_jaccard_neardup(src).take_all() == []
        assert neardup_clusters(src).take_all() == []
        assert simhash_neardup(src).take_all() == []


def test_split_assign_deterministic_and_complete():
    """Every doc gets exactly one split; assignment matches a local splitmix64
    recompute (partition-independent by construction — pure hash of doc_id)."""
    import pyarrow.parquet as pq

    from invoice_extraction_ray.ops.curate import split_assign
    from invoice_extraction_ray.ops.sketch import _hash64

    rows = split_assign(SF).take_all()
    ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    all_ids = ids.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    assert sorted(r["doc_id"] for r in rows) == sorted(all_ids.tolist())

    buckets = (_hash64(all_ids) % np.uint64(100)).astype(np.int64)
    expect = {
        int(d): ("test" if b < 5 else "val" if b < 10 else "train")
        for d, b in zip(all_ids, buckets)
    }
    for r in rows:
        assert r["split"] == expect[r["doc_id"]]
        assert 0 <= r["bucket"] < 100
    # all three splits are populated on a 60-doc corpus only probabilistically;
    # train must dominate by construction
    from collections import Counter

    c = Counter(r["split"] for r in rows)
    assert c["train"] > c["test"] + c["val"]


def test_mixture_sample_matches_local_thresholds():
    """Kept set == docs whose splitmix64 hash clears the per-language
    sqrt(n_min/n_lang) threshold — the exact temperature-0.5 keep rule."""
    import math

    import pyarrow.parquet as pq

    from invoice_extraction_ray.ops.curate import _MIX_DENOM, mixture_sample
    from invoice_extraction_ray.ops.sketch import _hash64

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
    ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    langs = t.column("lang").to_pylist()
    from collections import Counter

    n = Counter(langs)
    n_min = min(n.values())
    th = {l: math.floor(math.sqrt(n_min / c) * _MIX_DENOM + 0.5) for l, c in n.items()}
    h = (_hash64(ids) % np.uint64(_MIX_DENOM)).astype(np.int64)
    expect = {int(d) for d, lg, hv in zip(ids, langs, h) if hv < th[lg]}

    got = {r["doc_id"] for r in mixture_sample(SF).take_all()}
    assert got == expect
    # tempering direction: the smallest language keeps everything
    smallest = min(n, key=n.get)
    small_ids = {int(d) for d, lg in zip(ids, langs) if lg == smallest}
    assert small_ids <= got


def test_repetition_scores_match_bruteforce():
    from collections import Counter as C

    import math

    import pyarrow.parquet as pq

    from invoice_extraction_ray.ops.curate import repetition_scores

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))
    for r in repetition_scores(SF).take_all():
        toks = texts[r["doc_id"]].split(" ")
        nt = len(toks)
        c = C(toks)
        dup = sum(v for v in c.values() if v > 1)
        bg = C(zip(toks, toks[1:]))
        top = max(bg.values()) if bg else 0
        assert r["n_tokens"] == nt
        assert r["dup_token_frac_e6"] == math.floor(1_000_000.0 * dup / nt + 0.5)
        assert r["top_bigram_frac_e6"] == math.floor(
            1_000_000.0 * top / max(nt - 1, 1) + 0.5
        )


def test_semantic_neardup_exact_within_cluster_and_no_false_positives():
    """Every returned pair truly clears the cosine threshold (within-cluster
    scoring is exact), and pairs are a subset of the exact all-pairs op."""
    import math

    from invoice_extraction_ray.ops.dedup import embedding_neardup, semantic_neardup

    got = semantic_neardup(SF, n_clusters=4, threshold=0.3).take_all()
    assert got, "clustered corpus must contain in-cluster near pairs"
    exact = {
        (r["a_id"], r["b_id"]) for r in embedding_neardup(SF, threshold=0.3).take_all()
    }
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    vid = tbl.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    mat = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    idx = {int(v): i for i, v in enumerate(vid)}
    for r in got:
        assert (r["a_id"], r["b_id"]) in exact
        sim = float(mat[idx[r["a_id"]]] @ mat[idx[r["b_id"]]])
        assert sim > 0.3
        assert abs(r["sim_e4"] - math.floor(sim * 10_000 + 0.5)) <= 1  # f32 vs f64


def test_semantic_neardup_recovers_planted_near_duplicates(tmp_path):
    """True near-duplicates (cosine ~0.9999) co-cluster by construction, so
    the within-cluster exact scoring must recover essentially all of them —
    the SemDeDup guarantee the op exists for.  (The natural sf0.001 corpus has
    no pairs above cosine 0.5, so recall must be tested on planted dups.)"""
    import pyarrow.parquet as pq

    from invoice_extraction_ray.ops.dedup import semantic_neardup

    tbl = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    vid = tbl.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    mat = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float64)
    rng_free = np.linspace(-1.0, 1.0, mat.shape[1])  # deterministic jitter
    dup_ids, dup_vecs, expected = [], [], set()
    for i in range(0, len(vid), 10):
        nd = int(vid[i]) + 10_000_000
        dup_ids.append(nd)
        dup_vecs.append(mat[i] + 1e-4 * rng_free)
        expected.add((int(vid[i]), nd))
    planted = pa.table(
        {
            "vec_id": pa.array(vid.tolist() + dup_ids, pa.int64()),
            "embedding": pa.array(
                mat.tolist() + [v.tolist() for v in dup_vecs],
                pa.list_(pa.float64()),
            ),
        }
    )
    d = tmp_path / "planted_sf"
    d.mkdir()
    pq.write_table(planted, d / "embeddings.parquet")
    got = {
        (r["a_id"], r["b_id"])
        for r in semantic_neardup(str(d), n_clusters=4, threshold=0.95).take_all()
    }
    # allow at most one boundary-straddling miss
    assert len(expected & got) >= len(expected) - 1


def test_boilerplate_scrub_planted_hot_lines():
    """A line planted in >= min_df docs is stripped from every doc; rare and
    blank lines survive; n_dropped is exact."""
    from invoice_extraction_ray.ops.curate import boilerplate_scrub

    hot = "-- COMPANY CONFIDENTIAL --"
    rows = []
    for i in range(40):
        body = f"unique line {i}\n\n{hot}" if i < 35 else f"unique line {i}\nrare footer"
        rows.append((f"c{i:03d}", 0, body))
    src = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int64()),
            "text": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    got = {
        (r["conv_id"], r["turn_idx"]): r
        for r in boilerplate_scrub(src, min_df=30).take_all()
    }
    assert len(got) == 40
    for i in range(40):
        r = got[(f"c{i:03d}", 0)]
        if i < 35:
            # hot line dropped; the blank line survives
            assert r["clean_text"] == f"unique line {i}\n"
            assert r["n_dropped"] == 1
        else:
            assert r["clean_text"] == f"unique line {i}\nrare footer"
            assert r["n_dropped"] == 0


def test_redact_names_counts_and_replaces():
    from invoice_extraction_ray.ops.curate import redact_names

    src = pa.table(
        {
            "conv_id": pa.array(["a", "a", "b"], pa.string()),
            "turn_idx": pa.array([0, 1, 0], pa.int64()),
            "text": pa.array(
                [
                    "Regards, Dana Lee and Dana Lee again",
                    "no names here",
                    None,  # null text rows are excluded
                ],
                pa.string(),
            ),
        }
    )
    rows = redact_names(src, ["Dana Lee", "Sam Okafor"]).take_all()
    assert len(rows) == 2
    by = {(r["conv_id"], r["turn_idx"]): r for r in rows}
    assert by[("a", 0)]["clean_text"] == "Regards, [NAME] and [NAME] again"
    assert by[("a", 0)]["n_redactions"] == 2
    assert by[("a", 1)]["clean_text"] == "no names here"
    assert by[("a", 1)]["n_redactions"] == 0


def test_semantic_neardup_max_cluster_bounds_fanout():
    """With the cap, an oversized cluster pair-scores only its cap smallest
    vec_ids — bounded O(cap^2) fanout; without it, results are exact."""
    from invoice_extraction_ray.ops.dedup import semantic_neardup

    capped = semantic_neardup(SF, n_clusters=2, threshold=0.3, max_cluster=50).take_all()
    full = semantic_neardup(SF, n_clusters=2, threshold=0.3).take_all()
    full_pairs = {(r["a_id"], r["b_id"]) for r in full}
    capped_pairs = {(r["a_id"], r["b_id"]) for r in capped}
    assert capped_pairs <= full_pairs  # never invents pairs
    assert len(capped_pairs) < len(full_pairs)  # cap binds on 2 fat clusters
    # every surviving id is within the cap-smallest of SOME cluster: at most
    # 2 clusters x C(50,2) pairs can exist
    assert len(capped_pairs) <= 2 * (50 * 49) // 2


def test_chunk_documents_matches_bruteforce():
    """Distributed token-window chunking must equal the local str.split()
    recurrence (stride = chunk - overlap, last chunk keeps the tail, empty
    docs emit nothing)."""
    from invoice_extraction_ray.ops.text import chunk_documents

    chunk_tokens, overlap, stride = 16, 4, 12
    rows = chunk_documents(SF, chunk_tokens=chunk_tokens, overlap=overlap).take_all()
    want = []
    docs = _docs()
    for d, s in zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()):
        toks = (s or "").split()
        n = len(toks)
        if n == 0:
            continue
        n_chunks = max(1, -(-(n - overlap) // stride))
        for ci in range(n_chunks):
            lo, hi = ci * stride, min(ci * stride + chunk_tokens, n)
            want.append((d, ci, lo, hi - lo, " ".join(toks[lo:hi])))
    got = [
        (r["doc_id"], r["chunk_idx"], r["start_tok"], r["n_tok"], r["chunk_text"])
        for r in rows
    ]
    assert sorted(got) == sorted(want)


def test_word_bigram_counts_matches_counter():
    """Sharded bigram top-k must equal a local Counter with the
    (n desc, bigram asc) tie-break."""
    from collections import Counter

    from invoice_extraction_ray.ops.text import word_bigram_counts

    rows = word_bigram_counts(SF, k=15).take_all()
    c = Counter()
    for s in _docs().column("text").to_pylist():
        toks = (s or "").split()
        c.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    assert [(r["bigram"], r["n"]) for r in rows] == want


def test_weighted_sample_matches_local_recompute():
    """Per-block partial top-k + global sort must equal the driver-side
    priority recompute; priorities stay in int64 even at weight 1."""
    import pyarrow.parquet as pq

    from invoice_extraction_ray.ops.curate import weighted_sample
    from invoice_extraction_ray.ops.sketch import _hash64

    k = 25
    rows = weighted_sample(SF, k=k).take_all()
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "n_chars"])
    ids = np.asarray(t.column("doc_id").to_pylist(), dtype=np.int64)
    w = np.maximum(np.asarray(t.column("n_chars").to_pylist(), dtype=np.int64), 1)
    prio = ((_hash64(ids) >> np.uint64(1)) // w.astype(np.uint64)).astype(np.int64)
    assert (prio >= 0).all()  # h >> 1 keeps the division inside int64
    order = sorted(zip(prio.tolist(), ids.tolist()))[:k]
    assert [(r["priority"], r["doc_id"]) for r in rows] == order


def test_source_cap_matches_local_recompute():
    """Per-source cap must keep exactly the cap smallest (priority, doc_id)
    docs per source, regardless of block/shard layout."""
    from collections import defaultdict

    import pyarrow.parquet as pq

    from invoice_extraction_ray.ops.curate import source_cap
    from invoice_extraction_ray.ops.sketch import _hash64

    cap = 5
    rows = source_cap(SF, cap=cap, n_shards=8).take_all()
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "source"])
    ids = np.asarray(t.column("doc_id").to_pylist(), dtype=np.int64)
    prio = (_hash64(ids) >> np.uint64(1)).astype(np.int64)
    per_src = defaultdict(list)
    for d, s, p in zip(ids.tolist(), t.column("source").to_pylist(), prio.tolist()):
        per_src[s].append((p, d))
    want = []
    for s, lst in per_src.items():
        for p, d in sorted(lst)[:cap]:
            want.append((s, p, d))
    want.sort()
    assert [(r["source"], r["priority"], r["doc_id"]) for r in rows] == want


def test_byte_histogram_features_edge_layouts():
    """The zero-copy buffer kernel must equal the naive per-row histogram on
    sliced, chunked, null-bearing, and empty-payload Arrow layouts."""
    from invoice_extraction_ray.ops.multimodal import N_HIST_BINS, ByteHistogramFeatures

    def naive(payloads):
        out = []
        for p in payloads:
            b = np.frombuffer(p or b"", dtype=np.uint8)
            if b.size == 0:
                out.append([0.0] * N_HIST_BINS)
            else:
                h = np.bincount(b >> 4, minlength=N_HIST_BINS).astype(np.float64)
                out.append((h / b.size).astype(np.float32).tolist())
        return out

    payloads = [b"hello", b"", None, bytes(range(256)), b"\xff" * 7, b"x"]
    base = pa.array(payloads, pa.binary())
    cases = {
        "plain": pa.table({"doc_id": pa.array(range(6), pa.int64()), "payload": base}),
        "sliced": pa.table(
            {"doc_id": pa.array(range(2, 6), pa.int64()), "payload": base.slice(2)}
        ),
        "chunked": pa.table(
            {
                "doc_id": pa.array(range(6), pa.int64()),
                "payload": pa.chunked_array([base.slice(0, 3), base.slice(3)]),
            }
        ),
        "large": pa.table(
            {
                "doc_id": pa.array(range(6), pa.int64()),
                "payload": pa.array(payloads, pa.large_binary()),
            }
        ),
        "empty": pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "payload": pa.array([], pa.binary()),
            }
        ),
    }
    fe = ByteHistogramFeatures()
    for name, t in cases.items():
        got = fe(t).column("features").to_pylist()
        want = naive(t.column("payload").to_pylist())
        assert got == want, name


def test_langid_batch_matches_scalar_predictor():
    """The vectorized langid kernel must be instance-identical to the scalar
    _predict_lang on corpus docs plus CJK/empty/symbol edge cases."""
    from invoice_extraction_ray.ops.text import _predict_lang, langid_batch

    texts = _docs().column("text").to_pylist()[:300] + [
        "",
        None,
        "!!! ??? 123",
        "一鿿二三",  # pure CJK
        "the 一二三四五六 of",  # cjk-majority w/ words
        "THE AND OF",  # uppercase stopwords
        "l'avenir d'une societe",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = langid_batch(t).column("lang_pred").to_pylist()
    want = [_predict_lang(s or "") for s in texts]
    assert got == want


def test_parse_props_extraction(tmp_path):
    """JSON field extraction: matched rows yield the captured integer,
    unmatched / null props yield NULL (SQL TRY_CAST semantics)."""
    from invoice_extraction_ray.ops.relational import parse_props

    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                "event_type": pa.array(["view", "click", "view", "error"]),
                "props": pa.array(['{"k": 42}', '{"j": 1}', None, '{"k": 007}']),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = {r["event_id"]: r["k"] for r in parse_props(str(tmp_path)).take_all()}
    assert got == {1: 42, 2: None, 3: None, 4: 7}


def test_event_type_pivot_known_answer(tmp_path):
    """Wide per-user counts across the fixed type vocabulary + row total."""
    from invoice_extraction_ray.ops.relational import event_type_pivot

    types = ["view", "view", "click", "purchase", "view", "error", "signup"]
    users = [7, 7, 7, 7, 9, 9, 9]
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "event_type": pa.array(types),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    rows = {r["user_id"]: r for r in event_type_pivot(str(tmp_path), n_shards=4).take_all()}
    assert rows[7]["n_view"] == 2 and rows[7]["n_click"] == 1
    assert rows[7]["n_purchase"] == 1 and rows[7]["n_total"] == 4
    assert rows[9]["n_view"] == 1 and rows[9]["n_error"] == 1
    assert rows[9]["n_signup"] == 1 and rows[9]["n_total"] == 3


def test_lag_features_known_answer(tmp_path):
    """Per-user lag deltas follow (ts, event_id) order with sentinel firsts."""
    from invoice_extraction_ray.ops.window import lag_features

    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "ts": pa.array([100, 50, 50, 200, 10], pa.timestamp("us")),
                "user_id": pa.array([7, 7, 7, 9, 9], pa.int64()),
                "value": [1.0, 2.0, 3.5, 10.0, 0.25],
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = {r["event_id"]: r for r in lag_features(str(tmp_path)).take_all()}
    # user 7 order: (50,#2) -> (50,#3) -> (100,#1)
    assert (got[2]["gap_us"], got[2]["delta_value_c"]) == (-1, 0)
    assert (got[3]["gap_us"], got[3]["delta_value_c"]) == (0, 150)
    assert (got[1]["gap_us"], got[1]["delta_value_c"]) == (50, -250)
    # user 9 order: (10,#5) -> (200,#4)
    assert (got[5]["gap_us"], got[5]["delta_value_c"]) == (-1, 0)
    assert (got[4]["gap_us"], got[4]["delta_value_c"]) == (190, 975)


def test_dedup_keep_best_planted(tmp_path):
    """Case/whitespace variants fold into one group; the keeper is the copy
    with the best RAW-text quality score (ties broken by min doc_id)."""
    from invoice_extraction_ray.ops.dedup import dedup_keep_best
    from invoice_extraction_ray.ops.text import quality_arrays

    texts = [
        "the quick brown fox jumps over the lazy dog",   # clean copy
        "THE  QUICK  BROWN  FOX  JUMPS  OVER  THE  LAZY  DOG",  # shouty copy
        "The quick brown fox jumps over the lazy dog",   # one capital
        "a completely different document about tables",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([10, 11, 12, 13], pa.int64()),
                "text": pa.array(texts),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    rows = sorted(
        (r["doc_id"], r["score_e5"], r["n_copies"])
        for r in dedup_keep_best(str(tmp_path), n_shards=4).take_all()
    )
    scores = quality_arrays(pa.array(texts))["score_e5"]
    # docs 10/11/12 normalize identically; argmax over raw-text scores
    grp = [(int(scores[i]), [10, 11, 12][i]) for i in range(3)]
    best_score = max(s for s, _ in grp)
    best_id = min(d for s, d in grp if s == best_score)
    assert rows == sorted(
        [(best_id, best_score, 3), (13, int(scores[3]), 1)]
    )


def test_dataset_fingerprint_order_invariant(tmp_path):
    """Fingerprint is identical under row reorder and changes when any one
    text changes (content sensitivity)."""
    from invoice_extraction_ray.ops.sketch import dataset_fingerprint

    ids = list(range(20))
    texts = [f"doc number {i} body" for i in ids]

    def write(order, texts_):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([ids[j] for j in order], pa.int64()),
                    "text": pa.array([texts_[j] for j in order]),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )

    write(list(range(20)), texts)
    a = dataset_fingerprint(str(tmp_path)).to_pylist()[0]
    write(list(reversed(range(20))), texts)
    b = dataset_fingerprint(str(tmp_path)).to_pylist()[0]
    assert a == b
    mutated = list(texts)
    mutated[7] = mutated[7] + "!"
    write(list(range(20)), mutated)
    c = dataset_fingerprint(str(tmp_path)).to_pylist()[0]
    assert (c["fp_hi"], c["fp_lo"]) != (a["fp_hi"], a["fp_lo"])
    assert c["n_docs"] == a["n_docs"] == 20


def test_orders_rollup_levels():
    """Rollup = leaf + per-priority subtotals + grand total, internally
    consistent: subtotals sum their leaves, the grand total sums all."""
    from invoice_extraction_ray.ops.relational import orders_rollup

    rows = orders_rollup(SF).to_pylist()
    leaf = [r for r in rows if r["o_orderstatus"] is not None]
    subs = [
        r
        for r in rows
        if r["o_orderstatus"] is None and r["o_orderpriority"] is not None
    ]
    grand = [r for r in rows if r["o_orderpriority"] is None]
    assert len(grand) == 1
    assert grand[0]["n"] == sum(r["n"] for r in leaf)
    assert grand[0]["sum_price_c"] == sum(r["sum_price_c"] for r in leaf)
    for s in subs:
        mine = [r for r in leaf if r["o_orderpriority"] == s["o_orderpriority"]]
        assert s["n"] == sum(r["n"] for r in mine)
        assert s["sum_price_c"] == sum(r["sum_price_c"] for r in mine)


def test_rolling_event_stats_known_answer(tmp_path):
    """Trailing ROWS-3 window resets per user, clamps at segment starts,
    and sums exact cents in (ts, event_id) order."""
    from invoice_extraction_ray.ops.window import rolling_event_stats

    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
                "ts": pa.array([10, 20, 30, 40, 5, 6], pa.timestamp("us")),
                "user_id": pa.array([7, 7, 7, 7, 9, 9], pa.int64()),
                "value": [1.0, 2.0, 3.0, 4.0, 10.0, 0.5],
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = {r["event_id"]: r for r in rolling_event_stats(str(tmp_path)).take_all()}
    assert (got[1]["roll_n"], got[1]["roll_sum_c"]) == (1, 100)
    assert (got[2]["roll_n"], got[2]["roll_sum_c"]) == (2, 300)
    assert (got[3]["roll_n"], got[3]["roll_sum_c"]) == (3, 600)
    assert (got[4]["roll_n"], got[4]["roll_sum_c"]) == (3, 900)  # 2+3+4 dollars
    assert (got[5]["roll_n"], got[5]["roll_sum_c"]) == (1, 1000)
    assert (got[6]["roll_n"], got[6]["roll_sum_c"]) == (2, 1050)


def test_ann_range_search_matches_bruteforce():
    """Radius query must return EXACTLY the vectors whose e4-rounded cosine
    clears the threshold (no boundary drift, no missing rows)."""
    from invoice_extraction_ray.ops.ann import ann_range_search
    from invoice_extraction_ray.ops._util import embedding_matrix

    thr = 2000
    got = {
        r["vec_id"]: r["sim_e4"]
        for r in ann_range_search(SF, threshold_e4=thr).take_all()
    }
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    m = embedding_matrix(t.column("embedding"))
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    q = m[list(ids).index(0)]
    qn = q / max(np.linalg.norm(q), 1e-30)
    sims = (m @ qn) / np.maximum(np.linalg.norm(m, axis=1), 1e-30)
    e4 = np.floor(np.abs(sims) * 10_000.0 + 0.5).astype(np.int64) * np.sign(
        sims
    ).astype(np.int64)
    want = {int(i): int(v) for i, v in zip(ids, e4) if v >= thr}
    assert got == want


def test_brand_revenue_matches_local_recompute():
    """Broadcast-join aggregate equals the naive local join (inner-join
    semantics, exact cents)."""
    from collections import defaultdict

    from invoice_extraction_ray.ops.relational import brand_revenue

    part = pq.read_table(f"{SF}/part.parquet", columns=["p_partkey", "p_brand"])
    brand_of = dict(
        zip(part.column("p_partkey").to_pylist(), part.column("p_brand").to_pylist())
    )
    li = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_partkey", "l_extendedprice"])
    import math

    n = defaultdict(int)
    s = defaultdict(int)
    for k, p in zip(li.column("l_partkey").to_pylist(), li.column("l_extendedprice").to_pylist()):
        b = brand_of.get(k)
        if b is None:
            continue
        n[b] += 1
        s[b] += int(math.floor(p * 100.0 + 0.5))
    got = sorted(
        (r["p_brand"], r["n_items"], r["sum_price_c"])
        for r in brand_revenue(SF).take_all()
    )
    assert got == sorted((b, n[b], s[b]) for b in n)


def test_nation_revenue_matches_local_recompute():
    """Multi-way join aggregate (Q5 shape) equals the naive local join:
    window-filtered orders x lineitem revenue, customer->nation hops."""
    import math
    from collections import defaultdict
    from datetime import datetime

    from invoice_extraction_ray.ops.relational import nation_revenue

    cust = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nat_of = dict(
        zip(cust.column("c_custkey").to_pylist(), cust.column("c_nationkey").to_pylist())
    )
    nat = pq.read_table(f"{SF}/nation.parquet", columns=["n_nationkey", "n_name"])
    name_of = dict(
        zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist())
    )
    orders = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    lo, hi = datetime(1997, 1, 1), datetime(1998, 1, 1)
    cust_of = {}
    for ok, ck, od in zip(
        orders.column("o_orderkey").to_pylist(),
        orders.column("o_custkey").to_pylist(),
        orders.column("o_orderdate").to_pylist(),
    ):
        if lo <= od < hi:
            cust_of[ok] = ck
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    rev_of = defaultdict(int)
    for ok, ep, dc in zip(
        li.column("l_orderkey").to_pylist(),
        li.column("l_extendedprice").to_pylist(),
        li.column("l_discount").to_pylist(),
    ):
        if ok in cust_of:
            rev_of[ok] += int(math.floor(ep * 100.0 + 0.5)) * (
                10000 - int(math.floor(dc * 10000.0 + 0.5))
            )
    n = defaultdict(int)
    s = defaultdict(int)
    for ok, r in rev_of.items():
        nm = name_of[nat_of[cust_of[ok]]]
        n[nm] += 1
        s[nm] += r
    got = [
        (r["n_name"], r["n_orders"], r["revenue_i"])
        for r in nation_revenue(SF).take_all()
    ]
    want = sorted(
        ((nm, n[nm], s[nm]) for nm in n), key=lambda x: (-x[2], x[0])
    )
    assert got == want


def test_embedding_project_matches_local_recompute():
    """Projection equals the naive local recompute (same sequential sum)
    and emits PROJ_DIM components per vector."""
    from invoice_extraction_ray.ops._util import embedding_matrix
    from invoice_extraction_ray.ops.ann import PROJ_DIM, _proj_matrix, embedding_project

    rows = embedding_project(SF).take_all()
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    m = embedding_matrix(t.column("embedding"))
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    P = _proj_matrix(m.shape[1])
    want = {}
    for i, vid in enumerate(ids):
        for j in range(PROJ_DIM):
            y = (m[i] * P[j]).sum()
            want[(int(vid), j)] = int(np.floor(y * 1e6 + 0.5))
    got = {(r["vec_id"], r["dim_idx"]): r["y_e6"] for r in rows}
    assert got == want


@pytest.mark.parametrize("seed", [20260818, 20260820])
def test_window_family_random_differential(tmp_path, seed):
    """Seeded-random differential gate for the window family: random events
    with duplicate timestamps (tie-order stress), negative values, and
    single-event users — lag_features / rolling_event_stats /
    user_cumulative_value must match DuckDB's window functions exactly."""
    import duckdb

    from invoice_extraction_ray.ops.window import (
        lag_features,
        rolling_event_stats,
        user_cumulative_value,
    )

    rng = np.random.RandomState(seed)
    n = 2000
    ev = pa.table(
        {
            "event_id": pa.array(rng.permutation(n).astype(np.int64)),
            "ts": pa.array(
                rng.randint(0, 500, size=n).astype("datetime64[us]").astype("int64"),
                pa.timestamp("us"),
            ),
            "user_id": pa.array(rng.randint(0, 97, size=n).astype(np.int64)),
            "value": rng.randn(n) * 50.0,  # negatives included
        }
    )
    path = str(tmp_path / "events.parquet")
    pq.write_table(ev, path)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}')")

    def canon(rows, keys):
        return sorted(tuple(r[k] for k in keys) for r in rows)

    want = con.sql(
        "WITH e AS (SELECT event_id, user_id, ts, "
        "CAST(floor(value*100.0 + 0.5) AS BIGINT) AS vc FROM events) "
        "SELECT event_id, user_id, "
        "coalesce(epoch_us(ts) - lag(epoch_us(ts)) OVER w, -1) AS gap_us, "
        "coalesce(vc - lag(vc) OVER w, 0) AS delta_value_c "
        "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
    ).fetchall()
    got = canon(
        lag_features(str(tmp_path)).take_all(),
        ("event_id", "user_id", "gap_us", "delta_value_c"),
    )
    assert got == sorted(want)

    want = con.sql(
        "WITH e AS (SELECT event_id, user_id, ts, "
        "CAST(floor(value*100.0 + 0.5) AS BIGINT) AS vc FROM events) "
        "SELECT event_id, user_id, count(*) OVER w AS roll_n, "
        "CAST(sum(vc) OVER w AS BIGINT) AS roll_sum_c "
        "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"
    ).fetchall()
    got = canon(
        rolling_event_stats(str(tmp_path)).take_all(),
        ("event_id", "user_id", "roll_n", "roll_sum_c"),
    )
    assert got == sorted(want)

    want = con.sql(
        "WITH e AS (SELECT event_id, user_id, ts, "
        "CAST(floor(value*100.0 + 0.5) AS BIGINT) AS vc FROM events) "
        "SELECT event_id, user_id, "
        "count(*) OVER w AS cum_n, CAST(sum(vc) OVER w AS BIGINT) AS cum_value_c "
        "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS UNBOUNDED PRECEDING)"
    ).fetchall()
    got = canon(
        user_cumulative_value(str(tmp_path)).take_all(),
        ("event_id", "user_id", "cum_n", "cum_value_c"),
    )
    assert got == sorted(want)


def test_bigram_lift_matches_local_recompute():
    """Top-20 bigram lift equals the naive whole-corpus Counter recompute
    (exact integer rationals)."""
    from collections import Counter

    from invoice_extraction_ray.ops.text import bigram_lift

    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"]).column(
        "text"
    ).to_pylist()
    uni, bg = Counter(), Counter()
    n_tok = n_bg = 0
    for s in texts:
        toks = (s or "").split()
        uni.update(toks)
        n_tok += len(toks)
        pairs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        bg.update(pairs)
        n_bg += len(pairs)
    top = sorted(bg.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    want = []
    for bgram, c_ab in top:
        wa, wb = bgram.split(" ")
        lift_e6 = (c_ab * n_tok * n_tok * 10**6) // (n_bg * uni[wa] * uni[wb])
        want.append((bgram, c_ab, lift_e6))
    want.sort(key=lambda x: (-x[2], x[0]))

    got = bigram_lift(SF, 20)
    rows = list(
        zip(
            got.column("bigram").to_pylist(),
            got.column("c_ab").to_pylist(),
            got.column("lift_e6").to_pylist(),
        )
    )
    assert rows == want


def test_label_centroids_matches_local_recompute():
    """Per-label (n, sum_e6) vector partials equal the naive numpy
    recompute, exactly."""
    from invoice_extraction_ray.ops._util import embedding_matrix
    from invoice_extraction_ray.ops.ann import label_centroids

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["label", "embedding"])
    m = embedding_matrix(t.column("embedding"))
    e6 = np.floor(m * 1e6 + 0.5).astype(np.int64)
    labels = t.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
    want = {}
    for lab in np.unique(labels):
        mask = labels == lab
        s = e6[mask].sum(axis=0)
        for j in range(m.shape[1]):
            want[(int(lab), j)] = (int(mask.sum()), int(s[j]))
    got = {
        (r["label"], r["dim_idx"]): (r["n"], r["sum_e6"])
        for r in label_centroids(SF).take_all()
    }
    assert got == want


def test_value_winsorize_matches_local_recompute():
    """Per-type p05/p95 clamp equals the naive sorted-array recompute with
    the quantile_disc index convention."""
    import math

    from invoice_extraction_ray.ops.sketch import value_winsorize

    t = pq.read_table(
        f"{SF}/events.parquet", columns=["event_id", "event_type", "value"]
    )
    vc = np.floor(t.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5).astype(
        np.int64
    )
    types = t.column("event_type").to_pylist()
    bounds = {}
    for et in set(types):
        v = np.sort(vc[[i for i, x in enumerate(types) if x == et]])
        n = len(v)
        lo = v[max(0, math.ceil(0.05 * n) - 1)]
        hi = v[max(0, math.ceil(0.95 * n) - 1)]
        bounds[et] = (int(lo), int(hi))
    want = {
        int(eid): (et, int(c), int(min(max(c, bounds[et][0]), bounds[et][1])))
        for eid, et, c in zip(t.column("event_id").to_pylist(), types, vc)
    }
    got = {
        r["event_id"]: (r["event_type"], r["value_c"], r["clipped_c"])
        for r in value_winsorize(SF).take_all()
    }
    assert got == want


def test_gopher_rules_matches_local_recompute():
    """Composite gate bitmask equals the naive per-doc Python recompute."""
    from invoice_extraction_ray.ops.curate import gopher_rules
    from invoice_extraction_ray.ops.text import STOPWORDS_EN

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    want = {}
    for did, s in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        toks = (s or "").split()
        n_tok, n_chars = len(toks), sum(len(x) for x in toks)
        n_types = len(set(toks))
        stop_hits = sum(1 for x in toks if x in STOPWORDS_EN)
        reasons = (
            (0 if 30 <= n_tok <= 90 else 1)
            + (0 if 40 * n_tok <= 10 * n_chars <= 50 * n_tok else 2)
            + (0 if n_types * 100 >= 40 * n_tok else 4)
            + (0 if stop_hits >= 2 else 8)
        )
        want[did] = (n_tok, reasons, 1 if reasons == 0 else 0)
    got = {
        r["doc_id"]: (r["n_tokens"], r["reasons"], r["keep"])
        for r in gopher_rules(SF).take_all()
    }
    assert got == want
    # the gate must not be degenerate on the test corpus
    keeps = {v[2] for v in got.values()}
    assert keeps == {0, 1}


def test_brand_supplier_counts_matches_local_recompute():
    """Two-stage distinct COUNT(DISTINCT) equals the naive local sets."""
    from collections import defaultdict

    from invoice_extraction_ray.ops.relational import brand_supplier_counts

    part = pq.read_table(f"{SF}/part.parquet", columns=["p_partkey", "p_brand"])
    brand_of = dict(
        zip(part.column("p_partkey").to_pylist(), part.column("p_brand").to_pylist())
    )
    li = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_partkey", "l_suppkey"])
    sups = defaultdict(set)
    parts = defaultdict(set)
    for k, sk in zip(
        li.column("l_partkey").to_pylist(), li.column("l_suppkey").to_pylist()
    ):
        b = brand_of.get(k)
        if b is None:
            continue
        sups[b].add(sk)
        parts[b].add(k)
    got = [
        (r["p_brand"], r["n_suppliers"], r["n_parts"])
        for r in brand_supplier_counts(SF).take_all()
    ]
    want = sorted((b, len(sups[b]), len(parts[b])) for b in sups)
    assert got == want
    # non-degenerate: at least one brand has >1 distinct supplier
    assert any(v > 1 for _, v, _ in got)


def test_small_quantity_revenue_matches_local_recompute():
    """Aggregate-then-rejoin (Q17 shape) equals the naive local recompute
    with the same exact cross-multiplied predicate."""
    import math
    from collections import defaultdict

    from invoice_extraction_ray.ops.relational import small_quantity_revenue

    part = pq.read_table(f"{SF}/part.parquet", columns=["p_partkey", "p_brand"])
    brand_of = dict(
        zip(part.column("p_partkey").to_pylist(), part.column("p_brand").to_pylist())
    )
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )
    pk = li.column("l_partkey").to_pylist()
    qty = [int(math.floor(q + 0.5)) for q in li.column("l_quantity").to_pylist()]
    price = li.column("l_extendedprice").to_pylist()
    tot = defaultdict(lambda: [0, 0])
    for k, q in zip(pk, qty):
        tot[k][0] += q
        tot[k][1] += 1
    n = defaultdict(int)
    s = defaultdict(int)
    for k, q, p in zip(pk, qty, price):
        su, c = tot[k]
        if 5 * q * c < su:
            b = brand_of.get(k)
            if b is None:
                continue
            n[b] += 1
            s[b] += int(math.floor(p * 100.0 + 0.5))
    got = [
        (r["p_brand"], r["n_small"], r["small_rev_c"])
        for r in small_quantity_revenue(SF).take_all()
    ]
    assert got == sorted((b, n[b], s[b]) for b in n)
    assert len(got) > 0  # the predicate keeps rows on this corpus


def test_conversation_pack_matches_local_recompute(tmp_path):
    """Packed SFT docs equal the local per-conversation turn-order join of
    the pipeline's own flat output (any shard layout)."""
    from collections import defaultdict

    from invoice_extraction_ray.fixtures import write_transcripts_parquet
    from invoice_extraction_ray.pipelines.extract import build_pipeline
    from invoice_extraction_ray.pipelines.metrics import conversation_pack

    paths = write_transcripts_parquet(str(tmp_path / "in"), 80, convs_per_file=20, seed=7)
    flat = build_pipeline(paths, seal=False, flat_output=True)
    rows = flat.select_columns(["conv_id", "turn_idx", "extracted_text"]).take_all()
    per_conv = defaultdict(list)
    for r in rows:
        per_conv[r["conv_id"]].append((r["turn_idx"], r["extracted_text"]))
    want = {
        c: ("\n\n".join(t for _, t in sorted(v)), len(v)) for c, v in per_conv.items()
    }

    got = conversation_pack(
        build_pipeline(paths, seal=False, flat_output=True), num_shards=7
    ).take_all()
    assert len(got) == len(want)
    for r in got:
        doc, n = want[r["conv_id"]]
        assert r["doc"] == doc and r["n_turns"] == n

    # the zero-shuffle aligned path (fixture corpus is conversation-aligned)
    # must produce the identical document set
    aligned = conversation_pack(
        build_pipeline(paths, seal_strategy="aligned", flat_output=True),
        aligned=True,
    ).take_all()
    assert sorted((r["conv_id"], r["n_turns"], r["doc"]) for r in aligned) == sorted(
        (r["conv_id"], r["n_turns"], r["doc"]) for r in got
    )


def test_surprisal_buckets_matches_local_recompute():
    """Tertile bucketing equals the naive local recompute (bitlen surprisal,
    ceil(q*n)-1 order statistics)."""
    import math
    from collections import Counter

    from invoice_extraction_ray.ops.text import surprisal_buckets

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    toks = {
        d: (t or "").split()
        for d, t in zip(
            docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()
        )
    }
    cnt = Counter(tok for tk in toks.values() for tok in tk)
    n_total = sum(cnt.values())
    bn = n_total.bit_length()
    means = {}
    for d, tk in toks.items():
        if not tk:
            continue
        surp = sum(bn - cnt[t].bit_length() for t in tk)
        means[d] = (20000 * surp + len(tk)) // (2 * len(tk))
    vals = sorted(means.values())
    n = len(vals)
    t1 = vals[max(0, math.ceil(n / 3) - 1)]
    t2 = vals[max(0, math.ceil(2 * n / 3) - 1)]
    want = {
        d: ("head" if m <= t1 else "middle" if m <= t2 else "tail")
        for d, m in means.items()
    }
    got = {
        r["doc_id"]: (r["mean_surprisal_e4"], r["bucket"])
        for r in surprisal_buckets(SF).take_all()
    }
    assert len(got) == len(want)
    for d, (m, b) in got.items():
        assert m == means[d] and b == want[d]
    # non-degenerate: the gate splits the corpus (the word-soup corpus's
    # mean-surprisal distribution can leave 'middle' empty when t1 == t2 —
    # legitimate quantile behavior — but head and tail must both exist)
    assert {"head", "tail"} <= set(want.values())


def test_user_event_overlap_matches_local_recompute():
    """Set-op distinct counts equal naive local set algebra."""
    from invoice_extraction_ray.ops.relational import user_event_overlap

    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "event_type"])
    a, b = set(), set()
    for u, t in zip(ev.column("user_id").to_pylist(), ev.column("event_type").to_pylist()):
        if t == "click":
            a.add(u)
        elif t == "purchase":
            b.add(u)
    got = user_event_overlap(SF).to_pylist()[0]
    assert got == {
        "n_both": len(a & b),
        "n_a_only": len(a - b),
        "n_b_only": len(b - a),
    }
    assert got["n_both"] > 0  # non-degenerate on this corpus


def test_orders_without_lineitems_matches_local_recompute():
    """Shuffle anti-join equals the naive NOT EXISTS recompute."""
    from invoice_extraction_ray.ops.relational import orders_without_lineitems

    orders = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    have = set(
        pq.read_table(f"{SF}/lineitem.parquet", columns=["l_orderkey"])
        .column("l_orderkey")
        .to_pylist()
    )
    want = sorted(
        (k, c)
        for k, c in zip(
            orders.column("o_orderkey").to_pylist(),
            orders.column("o_custkey").to_pylist(),
        )
        if k not in have
    )
    got = sorted(
        (r["o_orderkey"], r["o_custkey"])
        for r in orders_without_lineitems(SF, num_shards=13).take_all()
    )
    assert got == want
    assert len(got) > 0  # non-degenerate on this corpus


def test_daily_active_users_matches_local_recompute():
    """Two-stage distinct DAU equals the naive per-day sets."""
    from collections import defaultdict

    from invoice_extraction_ray.ops.relational import daily_active_users

    ev = pq.read_table(f"{SF}/events.parquet", columns=["ts", "user_id"])
    per_day = defaultdict(set)
    for ts, u in zip(ev.column("ts").to_pylist(), ev.column("user_id").to_pylist()):
        per_day[ts.date()].add(u)
    got = [(r["day"].date(), r["n_users"]) for r in daily_active_users(SF).take_all()]
    assert got == sorted((d, len(s)) for d, s in per_day.items())


def test_knn_graph_matches_bruteforce():
    """e4-ranked exact neighbor graph equals the naive local recompute, and
    the size guard raises past the cap."""
    import math

    import numpy as np
    import pytest

    from invoice_extraction_ray.ops._util import embedding_matrix
    from invoice_extraction_ray.ops.ann import knn_graph

    tbl = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = tbl.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    mat = embedding_matrix(tbl.column("embedding"))
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    sims = mat @ mat.T
    want = {}
    for i, vid in enumerate(ids):
        cand = []
        for j, nb in enumerate(ids):
            if nb == vid:
                continue
            s = sims[i, j]
            e4 = int(math.floor(abs(s) * 10000.0 + 0.5)) * (-1 if s < 0 else 1)
            cand.append((-e4, nb))
        cand.sort()
        want[int(vid)] = [(r + 1, nb, -m) for r, (m, nb) in enumerate(cand[:5])]
    got = {}
    for r in knn_graph(SF).take_all():
        got.setdefault(r["vec_id"], []).append(
            (r["rank"], r["neighbor_id"], r["sim_e4"])
        )
    assert len(got) == len(want)
    for vid, rows in got.items():
        assert sorted(rows) == want[vid]

    with pytest.raises(ValueError, match="max_rows"):
        knn_graph(SF, max_rows=10)


def test_kmv_distinct_matches_local_recompute():
    """KMV sketch equals the local min-k recompute and lands near truth."""
    import numpy as np

    from invoice_extraction_ray.ops.sketch import _hash64, kmv_distinct

    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id"])
    users = np.unique(ev.column("user_id").to_numpy().astype(np.int64))
    h = np.unique(_hash64(users))
    k = min(64, len(h))
    kth = int(h[k - 1])
    est = (k - 1) * (1 << 64) // kth
    got = kmv_distinct(SF).to_pylist()[0]
    assert got == {
        "k": k,
        "kth_hi": kth >> 32,
        "kth_lo": kth & 0xFFFFFFFF,
        "approx_distinct": est,
    }
    # sketch sanity: within 3 standard errors (~1/sqrt(k)) of the truth
    n = len(users)
    assert abs(est - n) <= 3 * n / (64 ** 0.5)


def test_session_stats_matches_local_recompute():
    """Per-session rows equal the naive gap-rule recompute."""
    from collections import defaultdict

    from invoice_extraction_ray.ops.relational import SESSION_GAP_MIN, session_stats

    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "ts"])
    per_user = defaultdict(list)
    for u, ts in zip(ev.column("user_id").to_pylist(), ev.column("ts").to_pylist()):
        per_user[u].append(ts)
    gap = SESSION_GAP_MIN * 60
    want = []
    for u, tss in per_user.items():
        tss.sort()
        sessions = [[tss[0]]]
        for prev, cur in zip(tss, tss[1:]):
            if (cur - prev).total_seconds() > gap:
                sessions.append([cur])
            else:
                sessions[-1].append(cur)
        for i, s in enumerate(sessions):
            want.append((u, i, len(s), int((s[-1] - s[0]).total_seconds())))
    got = sorted(
        (r["user_id"], r["session_idx"], r["n_events"], r["duration_sec"])
        for r in session_stats(SF).take_all()
    )
    assert got == sorted(want)
    assert any(n > 1 for _, _, n, _ in got)  # multi-event sessions exist


def test_text_normalize_matches_local_recompute():
    """Arrow-kernel normalization equals the naive python transform."""
    import re

    from invoice_extraction_ray.ops.curate import text_normalize

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    want = {
        d: re.sub(r"\s+", " ", (t or "").lower()).strip()
        for d, t in zip(
            docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()
        )
    }
    got = {r["doc_id"]: (r["norm_text"], r["n_chars"]) for r in text_normalize(SF).take_all()}
    assert len(got) == len(want)
    for d, (nt, nc) in got.items():
        assert nt == want[d] and nc == len(want[d])


def test_tokenizer_fertility_matches_local_recompute():
    """Fertility ratio over the transcript corpus equals the naive
    regex/split recompute — and is non-degenerate there (the documents
    table is plain word soup where fertility is 1.0 everywhere)."""
    from invoice_extraction_ray.corpus import transcripts_for
    from invoice_extraction_ray.ops.text import _BPE_RE, tokenizer_fertility

    want = {}
    for p in transcripts_for(SF):
        t = pq.read_table(p, columns=["conv_id", "turn_idx", "text"])
        for c, i, x in zip(
            t.column("conv_id").to_pylist(),
            t.column("turn_idx").to_pylist(),
            t.column("text").to_pylist(),
        ):
            x = x or ""
            w = len(x.split())
            b = len(_BPE_RE.findall(x))
            want[(c, i)] = (w, b, (20000 * b + w) // (2 * w) if w else None)
    got = {
        (r["conv_id"], r["turn_idx"]): (
            r["n_ws_tokens"],
            r["n_bpe_tokens"],
            r["fertility_e4"],
        )
        for r in tokenizer_fertility(SF).take_all()
    }
    assert got == want
    assert any(v[2] and v[2] > 10000 for v in got.values())  # some frag > 1.0


@pytest.mark.parametrize("seed", [42, 20260820])
def test_new_relational_family_random_differential(tmp_path, seed):
    """Seeded-random differential gate for the round-4 relational/sketch
    additions: random star-schema + event tables (dangling order keys,
    skewed brands, duplicate timestamps, multi-day spans) driven through
    the REGISTERED oracle_sql() strings — the same SQL the driver gate
    runs — so any drift between engine and oracle semantics on
    non-fixture data is caught here.  Two seeds: independent draws of
    every degenerate shape."""
    import duckdb

    import __ray_entry__ as E

    rng = np.random.RandomState(seed)
    n_ord, n_li, n_part, n_ev = 3000, 9000, 120, 4000
    # every 7th order has no lineitems (anti-join rows)
    okeys = np.arange(n_ord, dtype=np.int64) * 3 + 1
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(okeys),
                "o_custkey": pa.array(rng.randint(0, 500, n_ord).astype(np.int64)),
                # 1997-01..03: inside the Q4 order window so the date-
                # pushed shapes stay non-degenerate on random data
                "o_orderdate": pa.array(
                    (
                        852_076_800 * 10**6
                        + rng.randint(0, 90, n_ord) * 86400 * 10**6
                    ).astype(np.int64),
                    pa.timestamp("us"),
                ),
                "o_orderpriority": pa.array(
                    [
                        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"][i]
                        for i in rng.randint(0, 5, n_ord)
                    ]
                ),
                "o_totalprice": np.round(rng.uniform(100, 400000, n_ord), 2),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(np.arange(500, dtype=np.int64)),
                "c_name": pa.array([f"Customer#{i:09d}" for i in range(500)]),
                "c_nationkey": pa.array(
                    rng.randint(0, 25, 500).astype(np.int32), pa.int32()
                ),
                "c_acctbal": np.round(rng.uniform(-999, 9999, 500), 2),
                "c_mktsegment": pa.array(
                    [
                        ["BUILDING", "AUTOMOBILE", "MACHINERY"][i]
                        for i in rng.randint(0, 3, 500)
                    ]
                ),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(40, dtype=np.int64)),
                "s_name": pa.array([f"Supplier#{i:09d}" for i in range(40)]),
                "s_nationkey": pa.array(
                    rng.randint(0, 25, 40).astype(np.int32), pa.int32()
                ),
            }
        ),
        str(tmp_path / "supplier.parquet"),
    )
    li_ok = okeys[rng.randint(0, n_ord, n_li)]
    li_ok = li_ok[li_ok % 7 != 1]  # drop lineitems of every 7th order
    li_ok[:: 500] += 1  # plant dangling FK rows (keys between real orders)
    m = len(li_ok)
    # ship dates span 1997-01..1998-05 so the Q6/Q4 config windows bite
    _EPOCH_1997_US = 852_076_800 * 10**6
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(li_ok),
                # zipf-ish skewed part keys, some dangling (not in part dim)
                "l_partkey": pa.array(
                    (rng.zipf(1.5, m) % (n_part + 30)).astype(np.int64)
                ),
                "l_suppkey": pa.array(rng.randint(0, 40, m).astype(np.int64)),
                "l_linenumber": pa.array(
                    (rng.randint(1, 8, m)).astype(np.int32), pa.int32()
                ),
                "l_quantity": rng.randint(1, 51, m).astype(np.float64),
                "l_extendedprice": np.round(rng.uniform(1, 9999, m), 2),
                # a few out-of-range discounts and dangling order keys so
                # data_quality_report's checks fire on random data
                "l_discount": np.where(
                    rng.rand(m) < 0.01,
                    rng.choice([-0.5, 1.5], m),
                    np.round(rng.uniform(0, 0.1, m), 2),
                ),
                "l_returnflag": pa.array(
                    [["R", "A", "N"][i] for i in rng.randint(0, 3, m)]
                ),
                "l_linestatus": pa.array(
                    [["O", "F"][i] for i in rng.randint(0, 2, m)]
                ),
                "l_shipdate": pa.array(
                    (
                        _EPOCH_1997_US
                        + rng.randint(0, 500, m).astype(np.int64) * 86400 * 10**6
                    ),
                    pa.timestamp("us"),
                ),
                "l_tax": np.round(rng.uniform(0, 0.08, m), 2),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
                "p_brand": pa.array(
                    [f"Brand#{i % 7}" for i in rng.randint(0, 25, n_part)]
                ),
                # names carry the Q9/Q20 config tokens for ~2/5 of parts
                "p_name": pa.array(
                    [
                        ["red widget", "blue bolt", "green rod", "dim cog",
                         "hot plate"][i]
                        for i in rng.randint(0, 5, n_part)
                    ]
                ),
                "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2),
            }
        ),
        str(tmp_path / "part.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(
                    np.arange(25, dtype=np.int32), pa.int32()
                ),
                "n_name": pa.array([f"NATION_{i:02d}" for i in range(25)]),
                "n_regionkey": pa.array(
                    (np.arange(25, dtype=np.int32) % 5), pa.int32()
                ),
            }
        ),
        str(tmp_path / "nation.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(rng.permutation(n_ev).astype(np.int64)),
                "ts": pa.array(
                    rng.randint(0, 5 * 86400 * 10**6, n_ev).astype(np.int64),
                    pa.timestamp("us"),
                ),
                "user_id": pa.array(rng.randint(0, 150, n_ev).astype(np.int64)),
                "event_type": pa.array(
                    [
                        ["click", "purchase", "view", "error", "signup"][i]
                        for i in rng.randint(0, 5, n_ev)
                    ]
                ),
                "value": np.round(rng.uniform(0, 500, n_ev), 2),
            }
        ),
        str(tmp_path / "events.parquet"),
    )

    # random documents: duplicate groups (case/spacing variants), mixed
    # langs, skewed word mix — exercises the text/dedup family oracles
    n_doc = 400
    words = ["alpha", "beta", "gamma", "delta", "dup", "vector", "merge", "the"]
    doc_texts = []
    for i in range(n_doc):
        k = rng.randint(3, 12)
        t = " ".join(words[j] for j in rng.randint(0, len(words), k))
        if i % 10 == 1:
            t = doc_texts[i - 1].upper() + "  "  # normalized-dup of neighbor
        doc_texts.append(t)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n_doc, dtype=np.int64)),
                "text": pa.array(doc_texts, pa.string()),
                "lang": pa.array(
                    [["en", "de", "es", "fr", "zh"][j] for j in rng.randint(0, 5, n_doc)]
                ),
                "n_chars": pa.array(
                    np.array([len(t) for t in doc_texts], dtype=np.int64)
                ),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )

    con = duckdb.connect()
    for tbl in (
        "orders", "lineitem", "part", "customer", "supplier", "nation",
        "events", "documents",
    ):
        con.sql(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{tmp_path}/{tbl}.parquet')"
        )
    oracles = E.oracle_sql()
    queries = E.queries()
    for name in (
        "brand_supplier_counts",
        "small_quantity_revenue",
        "orders_without_lineitems",
        "user_event_overlap",
        "daily_active_users",
        "session_stats",
        "kmv_distinct",
        "user_first_seen",
        "order_details",
        "order_details_bloom",
        "value_moments",
        "pagerank",
        "copurchase_pairs",
        "copurchase_triangles",
        "data_quality_report",
        "rolling_active_users",
        "time_weighted_value",
        "kmv_jaccard",
        "user_running_zscore",
        "order_lineitem_left",
        "order_lineitem_full",
        "user_favorite_event",
        "snm_candidate_pairs",
        "mg_heavy_hitters",
        "source_drift_chi2",
        "doc_skyline",
        "large_order_customers",
        "order_lineitem_semi",
        "lineitem_cube",
        "daily_ohlc",
        "user_value_trend",
        "customer_order_distribution",
        "cheapest_supplier",
        "user_gap_fill",
        "incremental_user_value",
        "events_zorder_scan",
        "bfs_hops",
        "assoc_rules",
        "value_band_pairs",
        "weighted_quality_median",
        "event_path_topk",
        "discounted_revenue",
        "late_shipment_orders",
        "nation_profit",
        "dominant_part_suppliers",
        "tax_band_priority",
        "apply_changelog",
        "user_active_spans",
        "scd2_user_bands",
        "top_tokens_per_lang",
        "rolling_median_value",
        "langid_confusion",
        "split_leakage_audit",
        "sketch_error_report",
        "hll_error_report",
        "user_bands_asof",
    ):
        def norm(v):
            # DuckDB's .df() floats nullable-int columns (NULL -> NaN);
            # the engine yields python ints / None — canonicalize both
            import pandas as pd

            if v is None or (isinstance(v, float) and pd.isna(v)):
                return None
            if isinstance(v, float) and v.is_integer():
                return int(v)
            return v

        def key(t):
            return tuple((x is None, 0 if x is None else x) for x in t)

        res = queries[name](str(tmp_path))
        rows = res.take_all() if hasattr(res, "take_all") else res.to_pylist()
        cols = sorted(rows[0].keys()) if rows else []
        got = sorted((tuple(norm(r[c]) for c in cols) for r in rows), key=key)
        df = con.sql(oracles[name]).df()
        want = sorted(
            (tuple(norm(row[c]) for c in cols) for _, row in df.iterrows()),
            key=key,
        )
        assert got == want, f"{name}: engine != oracle on random data"
        assert rows, f"{name}: degenerate (no rows) on random data"


def test_user_first_seen_matches_local_recompute():
    """New-users-per-day equals the per-user-min recompute; shard-count
    invariant."""
    from invoice_extraction_ray.ops.relational import user_first_seen

    ev = pq.read_table(f"{SF}/events.parquet", columns=["ts", "user_id"])
    first = {}
    for u, us in zip(
        ev.column("user_id").to_pylist(), ev.column("ts").cast(pa.int64()).to_pylist()
    ):
        if u not in first or us < first[u]:
            first[u] = us
    want = {}
    for us in first.values():
        d = us // 86_400_000_000
        want[d] = want.get(d, 0) + 1
    got = {
        int(r["day"].timestamp() * 1_000_000) // 86_400_000_000: r["n_new_users"]
        for r in user_first_seen(SF, n_shards=7).take_all()
    }
    assert got == want
    assert sum(got.values()) == len(first)  # every user exactly once


def test_order_details_matches_local_recompute():
    """Row-level hash-partition join equals the naive dict-probe join."""
    from invoice_extraction_ray.ops.relational import order_details

    orders = pq.read_table(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )
    build = {
        k: (c, d)
        for k, c, d, p in zip(
            orders.column("o_orderkey").to_pylist(),
            orders.column("o_custkey").to_pylist(),
            orders.column("o_orderdate").cast(pa.int64()).to_pylist(),
            orders.column("o_orderpriority").to_pylist(),
        )
        if p == "1-URGENT"
    }
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
    )
    want = sorted(
        (k, ln, build[k][0], build[k][1], int(np.floor(px * 100.0 + 0.5)))
        for k, ln, px in zip(
            li.column("l_orderkey").to_pylist(),
            li.column("l_linenumber").to_pylist(),
            li.column("l_extendedprice").to_pylist(),
        )
        if k in build
    )
    got = sorted(
        (
            r["o_orderkey"],
            r["l_linenumber"],
            r["o_custkey"],
            int(r["o_orderdate"].timestamp() * 1_000_000),
            r["l_price_c"],
        )
        for r in order_details(SF, num_shards=11).take_all()
    )
    assert got == want
    assert len(got) > 0


def test_value_moments_matches_local_recompute():
    """Limb-carried second moment and floored variance equal the exact
    python-int recompute."""
    from invoice_extraction_ray.ops.sketch import value_moments

    ev = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "value"])
    acc = {}
    for ty, v in zip(
        ev.column("event_type").to_pylist(), ev.column("value").to_pylist()
    ):
        c = int(np.floor(v * 100.0 + 0.5))
        n, s1, s2 = acc.get(ty, (0, 0, 0))
        acc[ty] = (n + 1, s1 + c, s2 + c * c)
    t = value_moments(SF)
    got = {
        r["event_type"]: (
            r["n"],
            r["sum_c"],
            (r["c2_hi"] << 32) + r["c2_lo"],
            r["var_floor_c2"],
        )
        for r in t.to_pylist()
    }
    want = {
        ty: (n, s1, s2, (n * s2 - s1 * s1) // (n * n))
        for ty, (n, s1, s2) in acc.items()
    }
    assert got == want
    assert all(v[3] >= 0 for v in got.values())  # variance nonneg


def test_pagerank_matches_local_recompute():
    """3-iteration integer PageRank equals the pure-python power iteration;
    shard-count invariant."""
    from invoice_extraction_ray.ops.graph import pagerank

    li = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_partkey", "l_suppkey"])
    pairs = sorted(
        set(
            zip(
                li.column("l_partkey").to_pylist(),
                li.column("l_suppkey").to_pylist(),
            )
        )
    )
    edges = [(p * 2, s * 2 + 1) for p, s in pairs] + [
        (s * 2 + 1, p * 2) for p, s in pairs
    ]
    deg = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    r = {u: 1_000_000 for u in deg}
    for _ in range(3):
        inc = {}
        for u, v in edges:
            inc[v] = inc.get(v, 0) + r[u] // deg[u]
        r = {v: 150_000 + 85 * m // 100 for v, m in inc.items()}
    want = sorted(
        ("part" if v % 2 == 0 else "supplier", v >> 1, rv) for v, rv in r.items()
    )
    got = sorted(
        (row["kind"], row["key"], row["rank_ppm"])
        for row in pagerank(SF, n_shards=5).take_all()
    )
    assert got == want
    assert len(got) == len(deg)  # every vertex ranked


def test_copurchase_pairs_matches_local_recompute():
    """Vectorized basket pair mining equals the itertools recompute."""
    from itertools import combinations

    from invoice_extraction_ray.ops.relational import copurchase_pairs

    li = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    baskets = {}
    for o, p in zip(
        li.column("l_orderkey").to_pylist(), li.column("l_partkey").to_pylist()
    ):
        baskets.setdefault(o, set()).add(p)
    counts = {}
    for parts in baskets.values():
        for a, b in combinations(sorted(parts), 2):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    want = sorted(
        ((a, b, n) for (a, b), n in counts.items()),
        key=lambda r: (-r[2], r[0], r[1]),
    )[:20]
    got = [
        (r["part_a"], r["part_b"], r["n_orders"])
        for r in copurchase_pairs(SF, n_shards=9, n_pair_shards=7).take_all()
    ]
    assert got == want


def test_assoc_rules_matches_local_recompute():
    """Support/confidence/lift equal the itertools + python-int recompute
    (same capped-basket universe as copurchase_pairs)."""
    from itertools import combinations

    from invoice_extraction_ray.ops.relational import assoc_rules

    li = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    baskets = {}
    for o, p in zip(
        li.column("l_orderkey").to_pylist(), li.column("l_partkey").to_pylist()
    ):
        baskets.setdefault(o, set()).add(p)
    capped = {o: ps for o, ps in baskets.items() if len(ps) <= 64}
    total = len(capped)
    item = {}
    pair = {}
    for parts in capped.values():
        for a in parts:
            item[a] = item.get(a, 0) + 1
        for a, b in combinations(sorted(parts), 2):
            pair[(a, b)] = pair.get((a, b), 0) + 1
    top = sorted(pair.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    want = [
        (
            a,
            b,
            nab,
            item[a],
            item[b],
            10**6 * nab // total,
            10**6 * nab // item[a],
            10**6 * nab // item[b],
            10**6 * total * nab // (item[a] * item[b]),
        )
        for (a, b), nab in top
    ]
    got = [
        tuple(
            r[c]
            for c in (
                "part_a",
                "part_b",
                "n_orders",
                "n_a",
                "n_b",
                "support_e6",
                "conf_ab_e6",
                "conf_ba_e6",
                "lift_e6",
            )
        )
        for r in assoc_rules(SF, n_shards=9, n_pair_shards=7).to_pylist()
    ]
    assert got == want


def test_copurchase_components_matches_union_find():
    """Support-filtered co-purchase connected components equal the
    union-find recompute (same capped-basket pair universe)."""
    from itertools import combinations

    from invoice_extraction_ray.ops.graph import copurchase_components

    li = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    baskets = {}
    for o, p in zip(
        li.column("l_orderkey").to_pylist(), li.column("l_partkey").to_pylist()
    ):
        baskets.setdefault(o, set()).add(p)
    cnt = {}
    for parts in baskets.values():
        if len(parts) > 64:
            continue
        for a, b in combinations(sorted(parts), 2):
            cnt[(a, b)] = cnt.get((a, b), 0) + 1
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (a, b), n in cnt.items():
        if n < 2:
            continue
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    got = {
        r["part_id"]: r["component_id"]
        for r in copurchase_components(SF, n_shards=9).take_all()
    }
    assert got == want and len(got) > 20


def test_copurchase_components_planted_graph(tmp_path):
    """Two planted cliques joined by a single-support (sub-threshold) tie
    stay SEPARATE components; in-clique pairs (support 2) merge."""
    from invoice_extraction_ray.ops.graph import copurchase_components

    rows = []
    # clique A: parts 1,2,3 bought together in orders 10 and 11 (support 2)
    # clique B: parts 7,8 together in orders 20 and 21
    # weak tie: parts 3 and 7 together ONCE (order 30) — below min_support
    for o, parts in [
        (10, [1, 2, 3]),
        (11, [1, 2, 3]),
        (20, [7, 8]),
        (21, [7, 8]),
        (30, [3, 7]),
    ]:
        for p in parts:
            rows.append((o, p))
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    got = {
        r["part_id"]: r["component_id"]
        for r in copurchase_components(str(tmp_path), n_shards=3).take_all()
    }
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}


def test_event_path_topk_matches_recompute():
    """First-3-event journey paths equal the per-user sort recompute,
    shard-count invariant."""
    from collections import Counter

    from invoice_extraction_ray.ops.relational import event_path_topk

    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
    )
    by_user: dict = {}
    for eid, ts, u, et in zip(
        ev.column("event_id").to_pylist(),
        ev.column("ts").cast(pa.int64()).to_pylist(),
        ev.column("user_id").to_pylist(),
        ev.column("event_type").to_pylist(),
    ):
        by_user.setdefault(u, []).append((ts, eid, et))
    paths = Counter()
    for rows in by_user.values():
        rows.sort()
        paths[">".join(et for _, _, et in rows[:3])] += 1
    want = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    for shards in (1, 7):
        got = [
            (r["path"], r["n_users"])
            for r in event_path_topk(SF, n_shards=shards).to_pylist()
        ]
        assert got == want
    assert len(want) > 5


def test_weighted_quality_median_matches_recompute():
    """Token-weighted median per lang equals the sort + cumsum recompute,
    including zero-weight docs and tied scores."""
    from invoice_extraction_ray.ops.text import quality_arrays, weighted_quality_median

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["text", "lang"])
    qa = quality_arrays(docs.column("text"))
    want = {}
    by_lang: dict = {}
    for lang, s, w in zip(
        docs.column("lang").to_pylist(), qa["score_e5"], qa["n_tokens"]
    ):
        by_lang.setdefault(lang, []).append((int(s), int(w)))
    for lang, rows in by_lang.items():
        rows.sort()
        tw = sum(w for _, w in rows)
        cw = 0
        med = rows[0][0]
        for s, w in rows:
            cw += w
            if 2 * cw >= tw:
                med = s
                break
        want[lang] = (med, tw)
    got = {
        r["lang"]: (r["wmedian_e5"], r["total_tokens"])
        for r in weighted_quality_median(SF, n_shards=8).take_all()
    }
    assert got == want and len(got) >= 3


def test_value_band_pairs_matches_recompute_and_caps_hot_user(tmp_path):
    """Band join equals the nested-loop recompute, and a user over the
    per-side cap is dropped BEFORE pair expansion (no quadratic shard)."""
    import numpy as np

    from invoice_extraction_ray.config import (
        BAND_EPS_C,
        BAND_MAX_PER_SIDE,
        BAND_TYPES,
    )
    from invoice_extraction_ray.ops.relational import value_band_pairs

    rng = np.random.RandomState(7)
    n = 2000
    users = rng.randint(0, 40, n).astype(np.int64)
    types = np.array([BAND_TYPES[i] for i in rng.randint(0, 2, n)], dtype=object)
    vals = np.round(rng.uniform(0, 50, n), 2)
    # plant a hot user: cap+1 clicks clustered at the same value
    hot_n = BAND_MAX_PER_SIDE + 1
    users = np.concatenate([users, np.full(hot_n, 99, dtype=np.int64)])
    types = np.concatenate([types, np.array([BAND_TYPES[0]] * hot_n, dtype=object)])
    vals = np.concatenate([vals, np.full(hot_n, 10.0)])
    ev = pa.table(
        {
            "event_id": pa.array(np.arange(len(users), dtype=np.int64)),
            "user_id": pa.array(users),
            "event_type": pa.array(list(types), pa.string()),
            "value": pa.array(vals),
        }
    )
    pq.write_table(ev, str(tmp_path / "events.parquet"))

    vc = np.floor(vals * 100.0 + 0.5).astype(np.int64)
    # eligible rows: per-(user, side) count <= cap
    want = set()
    from collections import Counter

    cnt = Counter(zip(users.tolist(), types.tolist()))
    for i in range(len(users)):
        if types[i] != BAND_TYPES[0] or cnt[(users[i], BAND_TYPES[0])] > BAND_MAX_PER_SIDE:
            continue
        for j in range(len(users)):
            if (
                types[j] == BAND_TYPES[1]
                and users[j] == users[i]
                and cnt[(users[j], BAND_TYPES[1])] <= BAND_MAX_PER_SIDE
                and abs(vc[i] - vc[j]) <= BAND_EPS_C
            ):
                want.add((int(users[i]), i, j, int(vc[i] - vc[j])))
    got = {
        (r["user_id"], r["click_id"], r["purchase_id"], r["diff_c"])
        for r in value_band_pairs(str(tmp_path), n_shards=5).take_all()
    }
    assert got == want
    assert not any(r[0] == 99 for r in got)  # hot user capped out
    assert len(got) > 50  # non-degenerate


def test_data_quality_report_planted(tmp_path):
    """Every check fires on a corpus with planted violations, with exact
    counts."""
    from invoice_extraction_ray.ops.relational import data_quality_report

    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([1, 1, 2, 2, 3, 99], pa.int64()),
                "l_linenumber": pa.array([1, 1, 1, 2, 1, 1], pa.int32()),
                "l_quantity": pa.array([1.0, None, 2.0, None, 3.0, 4.0]),
                "l_extendedprice": pa.array([10.0, -5.0, 0.0, 7.0, 8.0, 9.0]),
                "l_discount": pa.array([0.1, 1.5, -0.2, 0.0, 1.0, 0.3]),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    pq.write_table(
        pa.table({"o_orderkey": pa.array([1, 2, 3], pa.int64())}),
        str(tmp_path / "orders.parquet"),
    )
    got = {
        r["check_name"]: r["n_violations"]
        for r in data_quality_report(str(tmp_path), n_shards=3).to_pylist()
    }
    assert got == {
        "rows_total": 6,
        "null_quantity": 2,
        "nonpositive_price": 2,  # -5.0 and 0.0
        "discount_out_of_range": 2,  # 1.5 and -0.2
        "duplicate_pk": 1,  # (1, 1) twice
        "dangling_orderkey": 1,  # key 99
    }


def test_token_budget_mix_matches_local_recompute():
    """Per-source token-budget prefix equals the sorted-cumsum recompute;
    budget boundary is inclusive-cumsum <= budget."""
    from invoice_extraction_ray.ops.curate import token_budget_mix
    from invoice_extraction_ray.ops.sketch import _hash64

    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    rows = []
    for d, s, x in zip(
        docs.column("doc_id").to_pylist(),
        docs.column("source").to_pylist(),
        docs.column("text").to_pylist(),
    ):
        prio = int(_hash64(np.array([d], dtype=np.int64))[0] >> np.uint64(1))
        rows.append((s, prio, d, len((x or "").split())))
    want = []
    by_src = {}
    for s, prio, d, n in sorted(rows):
        # strict window-prefix rule (SQL SUM OVER ROWS UNBOUNDED PRECEDING):
        # every doc advances the running sum, kept or not
        cum = by_src.get(s, 0) + n
        by_src[s] = cum
        if cum <= 100:
            want.append((d, s, n, cum))
    want.sort(key=lambda r: (r[1], r[3], r[0]))
    got = [
        (r["doc_id"], r["source"], r["n_tokens"], r["cum_tokens"])
        for r in token_budget_mix(SF, budget=100, n_shards=5).take_all()
    ]
    assert got == want
    assert 0 < len(got) < len(rows)  # non-degenerate split


def test_token_budget_mix_block_split_invariant():
    """The boundary-sentinel prefilter keeps the result EXACT when a
    source's docs span many blocks (the case the batch prefilter alone
    would get wrong: a dropped doc's tokens must still gate later docs
    from other blocks)."""
    from invoice_extraction_ray.ops.curate import token_budget_mix

    base = [
        (r["doc_id"], r["source"], r["n_tokens"], r["cum_tokens"])
        for r in token_budget_mix(SF, budget=100, n_shards=5).take_all()
    ]
    for blocks in (7, 23):
        split = [
            (r["doc_id"], r["source"], r["n_tokens"], r["cum_tokens"])
            for r in token_budget_mix(
                SF, budget=100, n_shards=5, override_num_blocks=blocks
            ).take_all()
        ]
        assert split == base, f"result changed at override_num_blocks={blocks}"


def test_filtered_ann_topk_matches_brute_force():
    """Hybrid search equals the predicate-restricted brute-force top-k
    under the shared (sim_e4 desc, vec_id asc) total order."""
    from invoice_extraction_ray.ops.ann import filtered_ann_topk

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
    ok = {
        d
        for d, lg in zip(
            docs.column("doc_id").to_pylist(), docs.column("lang").to_pylist()
        )
        if lg == "en"
    }
    emb = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = {
        v: np.asarray(e, dtype=np.float64)
        for v, e in zip(
            emb.column("vec_id").to_pylist(), emb.column("embedding").to_pylist()
        )
    }
    q = vecs[0] / np.linalg.norm(vecs[0])
    scored = []
    for v, x in vecs.items():
        if v not in ok:
            continue
        s = float(x @ q / max(np.linalg.norm(x), 1e-30)) * 10_000.0
        e4 = int(np.floor(s + 0.5)) if s >= 0 else -int(np.floor(0.5 - s))
        scored.append((v, e4))
    want = sorted(scored, key=lambda r: (-r[1], r[0]))[:10]
    got = [
        (r["vec_id"], r["sim_e4"])
        for r in filtered_ann_topk(SF, n_shards=5).take_all()
    ]
    assert got == want
    assert all(v in ok for v, _ in got)  # predicate actually applied


def test_rolling_active_users_matches_local_recompute():
    """Trailing-7-day distinct actives equal the brute-force window sets;
    only observed days are emitted."""
    from invoice_extraction_ray.ops.relational import rolling_active_users

    ev = pq.read_table(f"{SF}/events.parquet", columns=["ts", "user_id"])
    by_day = {}
    for u, us in zip(
        ev.column("user_id").to_pylist(), ev.column("ts").cast(pa.int64()).to_pylist()
    ):
        by_day.setdefault(us // 86_400_000_000, set()).add(u)
    want = {
        d: len(set().union(*(by_day.get(x, set()) for x in range(d - 6, d + 1))))
        for d in by_day
    }
    got = {
        int(r["day"].timestamp() * 1_000_000) // 86_400_000_000: r["n_active"]
        for r in rolling_active_users(SF, n_shards=7).take_all()
    }
    assert got == want
    assert max(got.values()) >= max(len(s) for s in by_day.values())  # window >= day


def test_time_weighted_value_matches_local_recompute():
    """TWAP numerator/denominator equal the per-user gap recompute; ties
    ordered by (ts, event_id); single-event users emit nothing."""
    from invoice_extraction_ray.ops.window import time_weighted_value

    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )
    rows = sorted(
        zip(
            ev.column("user_id").to_pylist(),
            ev.column("ts").cast(pa.int64()).to_pylist(),
            ev.column("event_id").to_pylist(),
            ev.column("value").to_pylist(),
        )
    )
    want = {}
    for (u, us, _, v), (u2, us2, _, _) in zip(rows, rows[1:]):
        if u == u2:
            dt = us2 - us
            c = int(np.floor(v * 100.0 + 0.5))
            num, dur = want.get(u, (0, 0))
            want[u] = (num + c * dt, dur + dt)
    want = {
        u: (dur, num, num // dur) for u, (num, dur) in want.items() if dur > 0
    }
    got = {
        r["user_id"]: (r["dur_us"], r["num_cents_us"], r["twa_c"])
        for r in time_weighted_value(SF, n_shards=8).take_all()
    }
    assert got == want
    assert len(got) > 0


def test_kmv_jaccard_matches_sketch_recompute_and_bounds_error():
    """The theta-sketch Jaccard equals its deterministic local recompute,
    and the estimate lands within the k^-1/2 error band of the exact
    Jaccard."""
    from invoice_extraction_ray.ops.sketch import _hash64, kmv_jaccard

    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "event_type"])
    a, b = set(), set()
    for u, ty in zip(
        ev.column("user_id").to_pylist(), ev.column("event_type").to_pylist()
    ):
        if ty == "click":
            a.add(u)
        elif ty == "purchase":
            b.add(u)
    k = 64
    ha = np.sort(_hash64(np.array(sorted(a), dtype=np.int64)))[:k]
    hb = np.sort(_hash64(np.array(sorted(b), dtype=np.int64)))[:k]
    union = np.unique(np.concatenate([ha, hb]))[:k]
    inter = int(np.isin(union, ha).sum() + np.isin(union, hb).sum()) - len(union)
    want = (
        len(union),
        inter,
        (len(union) - 1) * (1 << 64) // int(union[-1]),
        1_000_000 * inter // len(union),
    )
    r = kmv_jaccard(SF).to_pylist()[0]
    got = (r["k_eff"], r["n_inter_sketch"], r["union_est"], r["jaccard_e6"])
    assert got == want
    exact = len(a & b) / len(a | b)
    assert abs(r["jaccard_e6"] / 1e6 - exact) < 3.0 / np.sqrt(r["k_eff"]) + 0.02


def test_copurchase_pairs_basket_cap(tmp_path):
    """A pathological giant basket is dropped before quadratic expansion;
    capped baskets still count."""
    from invoice_extraction_ray.ops.relational import copurchase_pairs

    rows_o, rows_p = [], []
    for p in range(200):  # one 200-part basket: 19,900 pairs if uncapped
        rows_o.append(1)
        rows_p.append(p)
    for o in (2, 3, 4):  # three small identical baskets
        for p in (7, 11):
            rows_o.append(o)
            rows_p.append(p)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(rows_o, pa.int64()),
                "l_partkey": pa.array(rows_p, pa.int64()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    got = [
        (r["part_a"], r["part_b"], r["n_orders"])
        for r in copurchase_pairs(
            str(tmp_path), k=5, n_shards=3, n_pair_shards=3, max_basket=64
        ).take_all()
    ]
    assert got == [(7, 11, 3)]  # giant basket contributed nothing


def test_user_running_zscore_matches_local_recompute():
    """Online z-score flags equal the per-user prior-history recompute
    (exact cross-multiplied integers); flags are non-degenerate."""
    from invoice_extraction_ray.ops.window import user_running_zscore

    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )
    rows = sorted(
        zip(
            ev.column("user_id").to_pylist(),
            ev.column("ts").cast(pa.int64()).to_pylist(),
            ev.column("event_id").to_pylist(),
            ev.column("value").to_pylist(),
        )
    )
    want = {}
    hist = {}
    for u, _, e, v in rows:
        c = int(np.floor(v * 100.0 + 0.5))
        n, s1, s2 = hist.get(u, (0, 0, 0))
        dev = n * c - s1
        var4 = 4 * (n * s2 - s1 * s1)
        want[e] = (u, n, dev if n else 0, var4 if n else 0,
                   1 if n >= 1 and dev * dev > var4 else 0)
        hist[u] = (n + 1, s1 + c, s2 + c * c)
    got = {
        r["event_id"]: (
            r["user_id"], r["n_prior"], r["dev_n"], r["var4_n2"], r["is_outlier"]
        )
        for r in user_running_zscore(SF, n_shards=8).take_all()
    }
    assert got == want
    flags = sum(v[4] for v in got.values())
    assert 0 < flags < len(got)  # fires on some but not all events


def test_order_lineitem_left_matches_local_recompute():
    """LEFT join equals the dict-probe recompute including null extension."""
    from invoice_extraction_ray.ops.relational import order_lineitem_left

    orders = pq.read_table(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderpriority"],
    )
    build = {
        k: c
        for k, c, p in zip(
            orders.column("o_orderkey").to_pylist(),
            orders.column("o_custkey").to_pylist(),
            orders.column("o_orderpriority").to_pylist(),
        )
        if p == "5-LOW"
    }
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
    )
    want, seen = [], set()
    for k, ln, px in zip(
        li.column("l_orderkey").to_pylist(),
        li.column("l_linenumber").to_pylist(),
        li.column("l_extendedprice").to_pylist(),
    ):
        if k in build:
            want.append((k, build[k], ln, int(np.floor(px * 100.0 + 0.5))))
            seen.add(k)
    for k, c in build.items():
        if k not in seen:
            want.append((k, c, None, None))
    want.sort(key=lambda r: (r[0], r[2] is None, r[2] or 0, r[3] or 0))
    got = sorted(
        (
            (r["o_orderkey"], r["o_custkey"], r["l_linenumber"], r["l_price_c"])
            for r in order_lineitem_left(SF, num_shards=9).take_all()
        ),
        key=lambda r: (r[0], r[2] is None, r[2] or 0, r[3] or 0),
    )
    assert got == want
    assert any(r[2] is None for r in got)  # null extension exercised


def test_hybrid_rrf_topk_matches_component_recompute():
    """RRF fusion equals the rank arithmetic recomputed from the two
    component rankers' own (independently brute-force-tested) outputs."""
    from invoice_extraction_ray.ops.ann import ann_topk, hybrid_rrf_topk
    from invoice_extraction_ray.ops.text import bm25_topk

    bm = bm25_topk(SF, k=10).take_all()
    an = ann_topk(SF, k=10).take_all()
    bm.sort(key=lambda r: (-r["score_e6"], r["doc_id"]))
    an.sort(key=lambda r: (-r["sim_e4"], r["vec_id"]))
    bm_rank = {r["doc_id"]: i + 1 for i, r in enumerate(bm)}
    an_rank = {r["vec_id"]: i + 1 for i, r in enumerate(an)}
    want = []
    for d in set(bm_rank) | set(an_rank):
        s = sum(
            10**6 // (60 + rk[d]) for rk in (bm_rank, an_rank) if d in rk
        )
        want.append((d, s, bm_rank.get(d), an_rank.get(d)))
    want.sort(key=lambda x: (-x[1], x[0]))
    want = want[:10]
    got = [
        (r["doc_id"], r["rrf_e6"], r["bm25_rank"], r["ann_rank"])
        for r in hybrid_rrf_topk(SF).to_pylist()
    ]
    assert got == want
    # both coalesce branches exercised: some doc is in only one list
    assert any(x[2] is None or x[3] is None for x in got)


def test_mg_heavy_hitters_matches_counter_recompute():
    """Candidate-superset + exact-verify heavy hitters equal the exact
    Counter recompute — no false positives, no false negatives."""
    from collections import Counter

    from invoice_extraction_ray.ops.sketch import mg_heavy_hitters

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    c: Counter = Counter()
    for tx in docs.column("text").to_pylist():
        c.update((tx or "").split())
    n = sum(c.values())
    want = sorted(
        ((t, k) for t, k in c.items() if k * 64 >= n),
        key=lambda x: (-x[1], x[0]),
    )
    got = [(r["token"], r["n"]) for r in mg_heavy_hitters(SF).to_pylist()]
    assert got == want
    assert got  # non-degenerate


def test_snm_candidate_pairs_matches_brute_force():
    """Sorted-neighborhood pairs equal the python sort + window recompute,
    including pairs that straddle sorted-block boundaries."""
    import hashlib
    import re

    from invoice_extraction_ray.ops.dedup import snm_candidate_pairs

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    rows = []
    for d, tx in zip(
        docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()
    ):
        norm = re.sub(r"\s+", " ", (tx or "").lower()).strip()
        rows.append((norm[:16], d, hashlib.sha256(norm.encode()).digest()))
    rows.sort(key=lambda r: (r[0].encode(), r[1]))
    want = set()
    for i in range(len(rows)):
        for j in range(i + 1, min(i + 5, len(rows))):
            want.add(
                (rows[i][1], rows[j][1], j - i, int(rows[i][2] == rows[j][2]))
            )
    got = {
        (r["doc_a"], r["doc_b"], r["rank_gap"], r["is_dup"])
        for r in snm_candidate_pairs(SF, window=4).take_all()
    }
    assert got == want
    assert len(got) == len(rows) * 4 - 10  # full windows minus the tail


def test_snm_candidate_pairs_planted_duplicates(tmp_path):
    """Planted near-identical docs (same normalized text, different case
    and spacing) sort adjacent and flag is_dup=1; a one-row-per-block
    layout exercises the boundary-straddling context assembly."""
    import ray as _ray

    from invoice_extraction_ray.ops.dedup import snm_candidate_pairs

    texts = [
        "Alpha  Report ",
        "alpha report",
        "ALPHA\tREPORT",
        "beta summary",
        "gamma notes",
        "delta memo",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = {
        (r["doc_a"], r["doc_b"]): (r["rank_gap"], r["is_dup"])
        for r in snm_candidate_pairs(str(tmp_path), window=2).take_all()
    }
    # normalized sort order: "alpha report" x3 (ids 0,1,2), beta(3),
    # delta(5), gamma(4)
    assert got[(0, 1)] == (1, 1)
    assert got[(1, 2)] == (1, 1)
    assert got[(0, 2)] == (2, 1)
    assert got[(2, 3)][1] == 0  # alpha vs beta: candidates, not dups
    assert got[(3, 5)] == (1, 0)  # beta then delta in sort order
    assert got[(5, 4)] == (1, 0)  # delta then gamma
    assert len(got) == 2 * len(texts) - 3


def test_order_details_bloom_equals_exact_join():
    """Bloom pruning only reduces shuffled volume — the output is
    byte-identical to the exact hash-partition join, and the filter has
    no false negatives (every true match survives the prefilter)."""
    from invoice_extraction_ray.ops.relational import (
        order_details,
        order_details_bloom,
    )

    def rows(ds):
        return sorted(
            (
                r["o_orderkey"],
                r["l_linenumber"],
                r["o_custkey"],
                r["o_orderdate"],
                r["l_price_c"],
            )
            for r in ds.take_all()
        )

    exact = rows(order_details(SF, num_shards=9))
    # tiny filter forces a measurable FP rate; output must still be exact
    pruned = rows(order_details_bloom(SF, num_shards=9, m_bits=1 << 12))
    assert pruned == exact
    assert len(exact) > 0


def test_source_drift_chi2_matches_counter_recompute():
    """Distributed chi-square drift equals the pure-python 2x2 recompute
    over the same top-k vocabulary."""
    from collections import Counter

    from invoice_extraction_ray.ops.text import source_drift_chi2

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["lang", "text"])
    ca_cnt, cb_cnt = Counter(), Counter()
    n_a = n_b = 0
    for lg, tx in zip(
        docs.column("lang").to_pylist(), docs.column("text").to_pylist()
    ):
        toks = (tx or "").split()
        if lg == "en":
            ca_cnt.update(toks)
            n_a += len(toks)
        else:
            cb_cnt.update(toks)
            n_b += len(toks)
    vocab = sorted(
        set(ca_cnt) | set(cb_cnt),
        key=lambda t: (-(ca_cnt[t] + cb_cnt[t]), t),
    )[:25]
    want = []
    for t in vocab:
        ca, cb = ca_cnt[t], cb_cnt[t]
        da, db = n_a - ca, n_b - cb
        den = (ca + cb) * (da + db) * n_a * n_b
        chi2 = (10**6 * (n_a + n_b) * (ca * db - cb * da) ** 2) // den if den else 0
        want.append((t, ca, cb, chi2))
    want.sort(key=lambda x: (-x[3], x[0]))
    got = [
        (r["token"], r["c_a"], r["c_b"], r["chi2_e6"])
        for r in source_drift_chi2(SF, k=25).to_pylist()
    ]
    assert got == want
    assert any(x[3] > 0 for x in got)  # drift actually detected


def test_copurchase_triangles_matches_brute_force():
    """Distributed degree-oriented triangle count equals the pure-python
    set-intersection recompute of the same support-filtered graph."""
    from collections import Counter

    from invoice_extraction_ray.ops.graph import copurchase_triangles

    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    baskets: dict[int, set[int]] = {}
    for o, p in zip(
        li.column("l_orderkey").to_pylist(), li.column("l_partkey").to_pylist()
    ):
        baskets.setdefault(o, set()).add(p)
    pair_n: Counter = Counter()
    for parts in baskets.values():
        if len(parts) > 64:
            continue
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_n[(ps[i], ps[j])] += 1
    edges = {p for p, n in pair_n.items() if n >= 2}
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    n_wedges = sum(len(s) * (len(s) - 1) // 2 for s in adj.values())
    n_tri = sum(
        1
        for (u, v) in edges
        for w in adj[u] & adj[v]
        if w > v  # u < v < w: count each triangle once
    )
    r = copurchase_triangles(SF, n_shards=7).to_pylist()[0]
    assert r["n_edges"] == len(edges)
    assert r["n_wedges"] == n_wedges
    assert r["n_triangles"] == n_tri
    assert n_tri > 0  # non-degenerate fixture
    assert r["clustering_e6"] == (3 * n_tri * 10**6) // n_wedges


def test_copurchase_triangles_skewed_star(tmp_path):
    """Planted graph with one hot vertex (star) plus a triangle fan: the
    degree orientation must count each triangle exactly once despite the
    hub, and pure-star graphs contribute wedges but zero triangles."""
    rows_o, rows_p = [], []
    ok = 0
    # hub 0 co-occurs pairwise with 1..40 (2 orders each -> support 2)
    for v in range(1, 41):
        for _ in range(2):
            rows_o += [ok, ok]
            rows_p += [0, v]
            ok += 1
    # triangle fan: (1,2), (2,3), (1,3), (3,4), (4,5), (3,5) at support 2
    for u, v in [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5)]:
        for _ in range(2):
            rows_o += [ok, ok]
            rows_p += [u, v]
            ok += 1
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(rows_o, pa.int64()),
                "l_partkey": pa.array(rows_p, pa.int64()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    from invoice_extraction_ray.ops.graph import copurchase_triangles

    r = copurchase_triangles(str(tmp_path), n_shards=5).to_pylist()[0]
    # edges: 40 star + 6 fan; triangles: (1,2,3) via star-hub? no — hub
    # edges are (0,v) only, so triangles are exactly (1,2,3) and (3,4,5)
    # plus (0,u,v) whenever (u,v) is a fan edge: 6 of those
    edges = {(0, v) for v in range(1, 41)} | {
        (1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5)
    }
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want_tri = sum(
        1 for u, v in edges for w in adj[u] & adj[v] if w > max(u, v)
    )
    assert r["n_edges"] == 46
    assert r["n_triangles"] == want_tri == 8
    assert r["n_wedges"] == sum(
        len(s) * (len(s) - 1) // 2 for s in adj.values()
    )


def test_order_lineitem_full_matches_local_recompute():
    """FULL OUTER join equals the dict-probe recompute including BOTH null
    extensions (unmatched orders and unmatched lineitems)."""
    from invoice_extraction_ray.ops.relational import order_lineitem_full

    orders = pq.read_table(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderpriority"],
    )
    build = {
        k: c
        for k, c, p in zip(
            orders.column("o_orderkey").to_pylist(),
            orders.column("o_custkey").to_pylist(),
            orders.column("o_orderpriority").to_pylist(),
        )
        if p == "5-LOW"
    }
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
    )
    want, seen = [], set()
    for k, ln, px in zip(
        li.column("l_orderkey").to_pylist(),
        li.column("l_linenumber").to_pylist(),
        li.column("l_extendedprice").to_pylist(),
    ):
        cents = int(np.floor(px * 100.0 + 0.5))
        if k in build:
            want.append((k, build[k], ln, cents))
            seen.add(k)
        else:
            want.append((k, None, ln, cents))
    for k, c in build.items():
        if k not in seen:
            want.append((k, c, None, None))

    def key(r):
        return tuple((x is None, 0 if x is None else x) for x in r)

    want.sort(key=key)
    got = sorted(
        (
            (r["orderkey"], r["o_custkey"], r["l_linenumber"], r["l_price_c"])
            for r in order_lineitem_full(SF, num_shards=9).take_all()
        ),
        key=key,
    )
    assert got == want
    assert any(r[2] is None for r in got)  # order-side null extension
    assert any(r[1] is None for r in got)  # lineitem-side null extension


def test_doc_skyline_matches_brute_force():
    """The distributed frontier equals the O(n^2) dominance recompute;
    block-split invariant via absorb (local frontier is a valid combiner)."""
    from invoice_extraction_ray.ops.relational import doc_skyline

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text", "n_chars"])
    import re

    pts = [
        (d, len(re.findall(r"\S+", x or "")), c)
        for d, x, c in zip(
            docs.column("doc_id").to_pylist(),
            docs.column("text").to_pylist(),
            docs.column("n_chars").to_pylist(),
        )
    ]
    want = sorted(
        (
            (d, t, c)
            for d, t, c in pts
            if not any(
                bt >= t and bc <= c and (bt > t or bc < c) for _, bt, bc in pts
            )
        ),
        key=lambda r: (-r[1], r[2], r[0]),
    )
    got = [
        (r["doc_id"], r["n_tokens"], r["n_chars"])
        for r in doc_skyline(SF).to_pylist()
    ]
    assert got == want
    assert len(got) > 1


def test_user_favorite_event_matches_local_recompute():
    """Grouped mode with (count desc, type asc) tie-break equals the
    Counter recompute; shard-count invariant."""
    from collections import Counter

    from invoice_extraction_ray.ops.relational import user_favorite_event

    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "event_type"])
    per_user = {}
    for u, ty in zip(
        ev.column("user_id").to_pylist(), ev.column("event_type").to_pylist()
    ):
        per_user.setdefault(u, Counter())[ty] += 1
    want = sorted(
        (u, min((t for t, n in c.items() if n == max(c.values()))), max(c.values()))
        for u, c in per_user.items()
    )
    got = [
        (r["user_id"], r["favorite"], r["n_events"])
        for r in user_favorite_event(SF, n_shards=7).take_all()
    ]
    assert got == want


def test_luminance_features_raise_pinned_without_pillow():
    """real=True encoder head: honest NotImplementedError when Pillow is
    absent (this sandbox) — never a silent stub substitution."""
    import pytest

    from invoice_extraction_ray.ops.multimodal import (
        LuminanceHistogramFeatures,
        _pil,
    )

    if _pil() is not None:
        pytest.skip("Pillow installed: covered by the real-decode test")
    with pytest.raises(NotImplementedError):
        LuminanceHistogramFeatures().features_of(b"xx")


def test_real_luminance_features_and_ann_head():
    """When Pillow IS installed the real=True head must actually decode:
    a solid mid-gray PNG concentrates its luminance histogram in one bin,
    and an undecodable payload degrades to the zero vector (excluded from
    cosine scoring like empty payloads).  Skipped where codecs are absent."""
    import pytest

    pytest.importorskip("PIL.Image")
    import io

    import numpy as np
    from PIL import Image

    from invoice_extraction_ray.ops.multimodal import (
        N_HIST_BINS,
        LuminanceHistogramFeatures,
    )

    buf = io.BytesIO()
    Image.new("L", (32, 32), 100).save(buf, format="PNG")  # 100 >> 4 == bin 6
    png = buf.getvalue()

    kern = LuminanceHistogramFeatures()
    out = kern(pa.table({"doc_id": [1, 2], "payload": [png, b"not-an-image"]}))
    feats = out.column("features").to_pylist()
    expected = [0.0] * N_HIST_BINS
    expected[100 >> 4] = 1.0
    assert np.allclose(feats[0], expected)
    assert np.allclose(feats[1], [0.0] * N_HIST_BINS)  # undecodable -> zero


def test_kanon_suppress_matches_local_recompute():
    """k-anonymity gate == a pandas group-size recompute at sf0.001."""
    import collections

    import pyarrow.parquet as pq

    from invoice_extraction_ray.config import KANON_MIN_GROUP
    from invoice_extraction_ray.ops.curate import kanon_suppress

    SFD = "/root/testdata/sf0.001"
    t = pq.read_table(SFD + "/documents.parquet", columns=["doc_id", "lang", "source"])
    sizes = collections.Counter(
        zip(t.column("lang").to_pylist(), t.column("source").to_pylist())
    )
    want = {
        int(d): (l, s, sizes[(l, s)])
        for d, l, s in zip(
            t.column("doc_id").to_pylist(),
            t.column("lang").to_pylist(),
            t.column("source").to_pylist(),
        )
        if sizes[(l, s)] >= KANON_MIN_GROUP
    }
    got = {
        r["doc_id"]: (r["lang"], r["source"], r["group_n"])
        for r in kanon_suppress(SFD).take_all()
    }
    assert got == want and 0 < len(got) < t.num_rows


def test_rank_bin_monotone_and_guarded():
    """_rank_bin is monotone non-decreasing (the sole correctness
    requirement of the distributed-rank bucketing) and raises past 2^53."""
    import pytest

    from invoice_extraction_ray.ops.window import _rank_bin

    v = np.unique(
        np.concatenate(
            [
                np.array([-5, -1, 0, 1, 2, 3, 15, 16, 17, 1 << 40], dtype=np.int64),
                np.random.default_rng(7).integers(0, 1 << 52, 5000),
            ]
        )
    )
    b = _rank_bin(v)
    assert (np.diff(b) >= 0).all()
    with pytest.raises(ValueError):
        _rank_bin(np.array([1 << 53], dtype=np.int64))


def test_ntile_of_rank_matches_sql_convention():
    """NTILE tile sizes: first n%t tiles get the extra row; n < t degrades
    to one row per tile."""
    import collections

    from invoice_extraction_ray.ops.window import _ntile_of_rank

    for n, t in [(10, 3), (9, 3), (1, 4), (3, 10), (100, 7), (7, 7)]:
        tiles = _ntile_of_rank(np.arange(n, dtype=np.int64), n, t)
        sizes = collections.Counter(tiles.tolist())
        q, rem = divmod(n, t)
        assert sorted(sizes) == list(range(1, min(n, t) + 1))
        for tile, size in sizes.items():
            want = (q + 1) if (rem and tile <= rem) else max(q, 1)
            assert size == want, (n, t, tile, size, want)
        assert (np.diff(tiles) >= 0).all()


def test_user_value_ntile_matches_local_recompute():
    """Distributed global rank/NTILE equals the single-process sort."""
    from invoice_extraction_ray.config import NTILE_N
    from invoice_extraction_ray.ops.window import user_value_ntile

    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "value"])
    totals = {}
    for u, v in zip(
        ev.column("user_id").to_pylist(), ev.column("value").to_pylist()
    ):
        totals[u] = totals.get(u, 0) + int(np.floor(v * 100.0 + 0.5))
    ordered = sorted(totals.items(), key=lambda kv: (-kv[1], kv[0]))
    n = len(ordered)
    q, rem = divmod(n, NTILE_N)
    want = {}
    for r0, (u, c) in enumerate(ordered):
        if q == 0:
            tile = r0 + 1
        elif r0 < rem * (q + 1):
            tile = r0 // (q + 1) + 1
        else:
            tile = rem + (r0 - rem * (q + 1)) // q + 1
        want[u] = (c, r0 + 1, tile)
    got = {
        r["user_id"]: (r["total_c"], r["rnk"], r["tile"])
        for r in user_value_ntile(SF).take_all()
    }
    assert got == want
    assert len({v[2] for v in got.values()}) == min(n, NTILE_N)


def test_large_order_customers_matches_local_recompute():
    """Q18 shape: HAVING threshold + two-hop join equals the dict joins."""
    from invoice_extraction_ray.config import LARGE_ORDER_MIN_QTY
    from invoice_extraction_ray.ops.relational import large_order_customers

    li = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_quantity"])
    qty: dict[int, int] = {}
    for k, q in zip(li.column("l_orderkey").to_pylist(), li.column("l_quantity").to_pylist()):
        qty[k] = qty.get(k, 0) + int(np.floor(q + 0.5))
    orders = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    omap = {
        k: (c, int(np.floor(p * 100.0 + 0.5)))
        for k, c, p in zip(
            orders.column("o_orderkey").to_pylist(),
            orders.column("o_custkey").to_pylist(),
            orders.column("o_totalprice").to_pylist(),
        )
    }
    cust = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey", "c_name"])
    cmap = dict(
        zip(cust.column("c_custkey").to_pylist(), cust.column("c_name").to_pylist())
    )
    want = {
        (cmap[omap[k][0]], omap[k][0], k, omap[k][1], s)
        for k, s in qty.items()
        if s >= LARGE_ORDER_MIN_QTY and k in omap
    }
    got = {
        (r["c_name"], r["c_custkey"], r["o_orderkey"], r["total_c"], r["sum_qty"])
        for r in large_order_customers(SF).take_all()
    }
    assert got == want and 0 < len(got) < len(omap)


def test_order_lineitem_semi_matches_local_recompute():
    """EXISTS semijoin: exactly the orders with >=1 matching lineitem,
    each emitted once; complement of the anti-join over the same filter."""
    from invoice_extraction_ray.config import SEMI_JOIN_RETURNFLAG
    from invoice_extraction_ray.ops.relational import order_lineitem_semi

    li = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"])
    have = {
        k
        for k, f in zip(
            li.column("l_orderkey").to_pylist(), li.column("l_returnflag").to_pylist()
        )
        if f == SEMI_JOIN_RETURNFLAG
    }
    orders = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderpriority"]
    )
    want = {
        (k, c, p)
        for k, c, p in zip(
            orders.column("o_orderkey").to_pylist(),
            orders.column("o_custkey").to_pylist(),
            orders.column("o_orderpriority").to_pylist(),
        )
        if k in have
    }
    rows = order_lineitem_semi(SF).take_all()
    got = [(r["o_orderkey"], r["o_custkey"], r["o_orderpriority"]) for r in rows]
    assert set(got) == want
    assert len(got) == len(want)  # once per order, never per matching lineitem
    assert 0 < len(got) < orders.num_rows


def test_lineitem_cube_matches_local_recompute():
    """CUBE: all four grouping sets derive exactly from the leaf counts."""
    from invoice_extraction_ray.ops.relational import lineitem_cube

    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )
    leaf: dict[tuple, list[int]] = {}
    for f, s, q, p, d in zip(
        li.column("l_returnflag").to_pylist(),
        li.column("l_linestatus").to_pylist(),
        li.column("l_quantity").to_pylist(),
        li.column("l_extendedprice").to_pylist(),
        li.column("l_discount").to_pylist(),
    ):
        a = leaf.setdefault((f, s), [0, 0, 0])
        a[0] += int(np.floor(q + 0.5))
        a[1] += int(np.floor(p * (1.0 - d) * 100.0 + 0.5))
        a[2] += 1
    want: dict[tuple, tuple] = {}
    for (f, s), (q, v, n) in leaf.items():
        want[(f, s)] = (q, v, n)
    for pick in (0, 1):
        sub: dict[tuple, list[int]] = {}
        for ks, (q, v, n) in leaf.items():
            key = (ks[0], None) if pick == 0 else (None, ks[1])
            a = sub.setdefault(key, [0, 0, 0])
            a[0] += q
            a[1] += v
            a[2] += n
        want.update({k: tuple(a) for k, a in sub.items()})
    want[(None, None)] = (
        sum(a[0] for a in leaf.values()),
        sum(a[1] for a in leaf.values()),
        sum(a[2] for a in leaf.values()),
    )
    t = lineitem_cube(SF)
    got = {
        (f, s): (q, v, n)
        for f, s, q, v, n in zip(
            t.column("l_returnflag").to_pylist(),
            t.column("l_linestatus").to_pylist(),
            t.column("sum_qty").to_pylist(),
            t.column("revenue_c").to_pylist(),
            t.column("n").to_pylist(),
        )
    }
    assert got == want and t.num_rows == len(want)


def _ohlc_recompute(ev):
    rows = sorted(
        zip(
            ev.column("ts").cast(pa.int64()).to_pylist(),
            ev.column("event_id").to_pylist(),
            ev.column("value").to_pylist(),
        )
    )
    days: dict[int, list] = {}
    for ts, eid, v in rows:
        vc = int(np.floor(v * 100.0 + 0.5))
        d = ts // 86_400_000_000
        a = days.setdefault(d, [vc, vc, vc, vc, 0])  # open high low close n
        a[1] = max(a[1], vc)
        a[2] = min(a[2], vc)
        a[3] = vc  # rows sorted by (ts, eid): last write wins
        a[4] += 1
    return {d: tuple(a) for d, a in days.items()}


def test_daily_ohlc_matches_local_recompute():
    """Distributed OHLC equals the single-process (ts, event_id) sweep."""
    from invoice_extraction_ray.ops.window import daily_ohlc

    ev = pq.read_table(f"{SF}/events.parquet", columns=["ts", "event_id", "value"])
    want = _ohlc_recompute(ev)
    got = {
        r["day_i"]: (r["open_c"], r["high_c"], r["low_c"], r["close_c"], r["n"])
        for r in daily_ohlc(SF).take_all()
    }
    assert got == want and len(got) > 1


def test_daily_ohlc_partition_invariant(tmp_path):
    """The open/close triple summary is mergeable: a pathological layout
    (many tiny row-groups, rows shuffled so each day straddles every block)
    yields identical output."""
    from invoice_extraction_ray.ops.window import daily_ohlc

    ev = pq.read_table(f"{SF}/events.parquet", columns=["ts", "event_id", "value"])
    idx = np.random.default_rng(3).permutation(ev.num_rows)
    shuffled = ev.take(pa.array(idx))
    d = tmp_path / "sf_shuf"
    d.mkdir()
    pq.write_table(shuffled, d / "events.parquet", row_group_size=97)
    want = _ohlc_recompute(ev)
    got = {
        r["day_i"]: (r["open_c"], r["high_c"], r["low_c"], r["close_c"], r["n"])
        for r in daily_ohlc(str(d)).take_all()
    }
    assert got == want


def test_user_value_trend_matches_local_recompute():
    """Distributed grouped OLS slope equals the python-int recompute."""
    from invoice_extraction_ray.ops.window import user_value_trend

    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "ts", "value"])
    per: dict[int, list] = {}
    for u, ts, v in zip(
        ev.column("user_id").to_pylist(),
        ev.column("ts").cast(pa.int64()).to_pylist(),
        ev.column("value").to_pylist(),
    ):
        per.setdefault(u, []).append((ts // 86_400_000_000, int(np.floor(v * 100.0 + 0.5))))
    want = {}
    for u, pts in per.items():
        d0 = min(d for d, _ in pts)
        xs = [d - d0 for d, _ in pts]
        ys = [y for _, y in pts]
        n = len(pts)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        den = n * sxx - sx * sx
        want[u] = (n, None if den == 0 else (1_000_000 * (n * sxy - sx * sy)) // den)
    got = {
        r["user_id"]: (r["n"], r["slope_e6"])
        for r in user_value_trend(SF).take_all()
    }
    assert got == want and len(got) > 1


def test_user_value_trend_null_negative_and_guard(tmp_path):
    """Synthetic corpus exercising what the testdata doesn't: a single-day
    user (NULL slope), an exactly-decreasing user (negative slope, floor
    semantics), and the loud numerator guard."""
    import pytest

    from invoice_extraction_ray.ops.window import user_value_trend

    day = 86_400_000_000
    rows = []
    # user 1: one day, two events -> den == 0 -> NULL
    rows += [(1, 5 * day + 10, 3.0), (1, 5 * day + 20, 9.0)]
    # user 2: y = 700 - 300x cents over days 0..2, exact slope -3e8 e6
    rows += [(2, 0 * day, 7.0), (2, 1 * day, 4.0), (2, 2 * day, 1.0)]
    # user 3: slope 1/3 cents/day -> floor((1e6*num)/den) truncates DOWN
    rows += [(3, 0 * day, 0.00), (3, 1 * day, 0.00), (3, 2 * day, 0.01)]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64()).cast(pa.timestamp("us")),
            "event_type": pa.array(["x"] * len(rows), pa.string()),
            "value": pa.array([r[2] for r in rows], pa.float64()),
            "props": pa.array([""] * len(rows), pa.string()),
        }
    )
    d = tmp_path / "sf_syn"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")
    got = {
        r["user_id"]: (r["n"], r["slope_e6"])
        for r in user_value_trend(str(d)).take_all()
    }
    # user 3: n=3, sx=3, sy=1, sxx=5, sxy=2 -> num=3, den=6 -> 3e6//6 = 5e5
    assert got == {1: (2, None), 2: (3, -300_000_000), 3: (3, 500_000)}

    huge = pa.table(
        {
            "event_id": pa.array([0, 1], pa.int64()),
            "user_id": pa.array([9, 9], pa.int64()),
            "ts": pa.array([0, 40_000 * day], pa.int64()).cast(pa.timestamp("us")),
            "event_type": pa.array(["x", "x"], pa.string()),
            "value": pa.array([0.0, 70_000_000_000_000.0], pa.float64()),
            "props": pa.array(["", ""], pa.string()),
        }
    )
    d2 = tmp_path / "sf_huge"
    d2.mkdir()
    pq.write_table(huge, d2 / "events.parquet")
    with pytest.raises(Exception, match="too large"):
        user_value_trend(str(d2)).take_all()


def test_snapshot_diff_matches_local_recompute():
    """Distributed snapshot diff equals the dict recompute of the derived
    v2, including the digest subtlety (an uppercased doc whose text was
    already caseless does NOT report as changed)."""
    from invoice_extraction_ray.config import (
        SNAPSHOT_ADDED_MOD,
        SNAPSHOT_ADDED_OFFSET,
        SNAPSHOT_CHANGED_MOD,
        SNAPSHOT_REMOVED_MOD,
    )
    from invoice_extraction_ray.ops.dedup import snapshot_diff

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    a = {
        d: (s or "")
        for d, s in zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist())
    }
    b = {}
    for d, s in a.items():
        if d % SNAPSHOT_REMOVED_MOD == 0:
            continue
        b[d] = s.upper() if d % SNAPSHOT_CHANGED_MOD == 0 else s
    for d, s in a.items():
        if d % SNAPSHOT_ADDED_MOD == 0:
            b[d + SNAPSHOT_ADDED_OFFSET] = "added:" + s
    want = {}
    for d in a:
        if d not in b:
            want[d] = "removed"
        elif a[d] != b[d]:
            want[d] = "changed"
    for d in b:
        if d not in a:
            want[d] = "added"
    got = {r["doc_id"]: r["status"] for r in snapshot_diff(SF).take_all()}
    assert got == want
    assert {"added", "removed", "changed"} <= set(got.values())


def test_dataset_diff_generic_two_snapshots():
    """The generic kernel on hand-built snapshots: every class exercised,
    identical-content pairs excluded, disjoint-id snapshots fully diff."""
    import ray.data

    from invoice_extraction_ray.ops.dedup import dataset_diff

    a = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(["same", "will change", "gone", None], pa.string()),
            }
        )
    )
    b = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 4, 9], pa.int64()),
                "text": pa.array(["same", "CHANGED", "", "brand new"], pa.string()),
            }
        )
    )
    got = {r["doc_id"]: r["status"] for r in dataset_diff(a, b, n_shards=4).take_all()}
    # id 4: None in A hashes as "" == B's "" -> unchanged, excluded
    assert got == {2: "changed", 3: "removed", 9: "added"}


def test_order_details_bucketed_equals_shuffle_join_and_reuses_layout():
    """The SMB zero-query-shuffle join is byte-identical to the shuffled
    order_details, and the bucketed layout materializes exactly once
    (completion-marker reuse)."""
    import os

    from invoice_extraction_ray.ops.relational import (
        bucketed_layout,
        order_details,
        order_details_bucketed,
    )

    def keyset(rows):
        return sorted(
            (
                r["o_orderkey"],
                r["l_linenumber"],
                r["o_custkey"],
                r["o_orderdate"],
                r["l_price_c"],
            )
            for r in rows
        )

    got = keyset(order_details_bucketed(SF, n_buckets=8).take_all())
    want = keyset(order_details(SF).take_all())
    assert got == want and len(got) > 100

    d = bucketed_layout(SF, "orders", "o_orderkey", 8,
                        ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"])
    marker = f"{d}/_COMPLETE"
    mtime = os.path.getmtime(marker)
    got2 = keyset(order_details_bucketed(SF, n_buckets=8).take_all())
    assert got2 == want
    assert os.path.getmtime(marker) == mtime  # layout written once, reused


def test_ivf_topk_indexed_equals_scan_and_reuses_layout():
    """The persisted-layout IVF query is identical to the per-query
    assignment path, and the index materializes exactly once."""
    import os

    from invoice_extraction_ray.ops.ann import ivf_layout, ivf_topk, ivf_topk_indexed

    want = [(r["vec_id"], r["sim_e4"]) for r in ivf_topk(SF).take_all()]
    got = [(r["vec_id"], r["sim_e4"]) for r in ivf_topk_indexed(SF).take_all()]
    assert got == want and len(got) == 10

    root = ivf_layout(SF)
    mtime = os.path.getmtime(f"{root}/_COMPLETE")
    got2 = [(r["vec_id"], r["sim_e4"]) for r in ivf_topk_indexed(SF).take_all()]
    assert got2 == want
    assert os.path.getmtime(f"{root}/_COMPLETE") == mtime  # built once, reused


def test_boolean_and_search_matches_recompute():
    """Postings-list intersection equals the per-doc token-set recompute
    and shares the bm25 postings layout."""
    from invoice_extraction_ray.ops.text import BM25_TERMS, boolean_and_search

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    want = sorted(
        d
        for d, t in zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist())
        if all(term in (t or "").split() for term in BM25_TERMS)
    )
    got = [r["doc_id"] for r in boolean_and_search(SF).take_all()]
    assert got == want and len(got) > 0


def test_bm25_topk_indexed_equals_scan_and_reuses_layout():
    """The inverted-index BM25 is byte-identical to the full-scan bm25_topk
    (tf=0 contributions are exact IEEE zeros) and the postings layout
    materializes exactly once (completion-marker reuse)."""
    import os

    from invoice_extraction_ray.ops.text import (
        bm25_topk,
        bm25_topk_indexed,
        postings_layout,
    )

    want = [(r["doc_id"], r["score_e6"]) for r in bm25_topk(SF).take_all()]
    got = [(r["doc_id"], r["score_e6"]) for r in bm25_topk_indexed(SF).take_all()]
    assert got == want and len(got) == 10

    root = postings_layout(SF)
    mtime = os.path.getmtime(f"{root}/_COMPLETE")
    got2 = [(r["doc_id"], r["score_e6"]) for r in bm25_topk_indexed(SF).take_all()]
    assert got2 == want
    assert os.path.getmtime(f"{root}/_COMPLETE") == mtime  # built once, reused


def test_postings_layout_staleness_missing_terms_and_empty(tmp_path, monkeypatch):
    """Regenerated source -> NEW postings layout; query terms absent from
    the corpus -> empty result (not an error); empty corpus -> empty."""
    import os
    import shutil

    from invoice_extraction_ray.ops.text import bm25_topk_indexed, postings_layout

    monkeypatch.setenv("IER_POSTINGS_CACHE", str(tmp_path / "cache"))
    sf = tmp_path / "sf"
    sf.mkdir()
    shutil.copy(f"{SF}/documents.parquet", sf / "documents.parquet")

    d1 = postings_layout(str(sf), n_shards=8)
    assert os.path.exists(f"{d1}/_COMPLETE")
    assert d1 == postings_layout(str(sf), n_shards=8)  # cache hit
    os.utime(sf / "documents.parquet", ns=(1, 1))
    assert postings_layout(str(sf), n_shards=8) != d1  # staleness: new dir

    # terms that appear nowhere: exact empty ranking
    assert (
        bm25_topk_indexed(str(sf), terms=("qqqzzzqq", "xxyyyzz"), n_shards=8).take_all()
        == []
    )

    # empty corpus: valid empty layout, empty result
    sf2 = tmp_path / "sf2"
    sf2.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}),
        str(sf2 / "documents.parquet"),
    )
    assert bm25_topk_indexed(str(sf2), n_shards=8).take_all() == []


def test_join_size_estimate_matches_sampled_recompute_and_bound():
    """The KMV join-cardinality estimator reproduces the single-process
    sampled computation exactly, and lands within the ~4/sqrt(K) error
    band of the true join size."""
    from invoice_extraction_ray.config import JOIN_EST_K
    from invoice_extraction_ray.ops.sketch import _hash64, join_size_estimate

    orders = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderkey"])
    li = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_orderkey"])
    ca: dict[int, int] = {}
    cb: dict[int, int] = {}
    for x in orders.column("o_orderkey").to_pylist():
        ca[x] = ca.get(x, 0) + 1
    for x in li.column("l_orderkey").to_pylist():
        cb[x] = cb.get(x, 0) + 1
    keys = np.array(sorted(set(ca) | set(cb)), dtype=np.int64)
    h = _hash64(keys)
    prod = np.array([ca.get(int(x), 0) * cb.get(int(x), 0) for x in keys], dtype=np.int64)
    order = np.argsort(h, kind="stable")
    h, prod = h[order], prod[order]
    if len(h) < JOIN_EST_K:
        want_est = int(prod.sum())
    else:
        kth = int(h[JOIN_EST_K - 1])
        want_est = int(prod[h < np.uint64(kth)].sum()) * (1 << 64) // kth
    t = join_size_estimate(SF)
    assert t.column("est_join_rows")[0].as_py() == want_est
    true = sum(ca.get(x, 0) * cb.get(x, 0) for x in set(ca) | set(cb))
    rel = abs(want_est - true) / true
    assert rel < 4.0 / np.sqrt(JOIN_EST_K), (want_est, true, rel)


def test_join_size_estimate_exact_below_k(tmp_path):
    """Fewer distinct keys than K: the sample is the population -> exact."""
    from invoice_extraction_ray.ops.sketch import join_size_estimate

    okeys = np.arange(10, dtype=np.int64)
    pq.write_table(
        pa.table({"o_orderkey": pa.array(np.repeat(okeys, 2))}),  # cA = 2
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table({"l_orderkey": pa.array(np.repeat(okeys[:7], 3))}),  # cB = 3
        tmp_path / "lineitem.parquet",
    )
    t = join_size_estimate(str(tmp_path))
    assert t.column("est_join_rows")[0].as_py() == 7 * 2 * 3  # exact 42
    assert t.column("k")[0].as_py() == 10


def test_user_decayed_value_matches_local_recompute():
    """Integer time-decay (cents >> age vs the corpus max day) equals the
    python-int recompute; a recent event outweighs an equal older one."""
    from invoice_extraction_ray.ops.window import user_decayed_value

    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "ts", "value"])
    day = 86_400_000_000
    rows = list(
        zip(
            ev.column("user_id").to_pylist(),
            ev.column("ts").cast(pa.int64()).to_pylist(),
            ev.column("value").to_pylist(),
        )
    )
    ref = max(ts for _, ts, _ in rows) // day
    want: dict[int, list[int]] = {}
    for u, ts, v in rows:
        vc = int(np.floor(v * 100.0 + 0.5))
        age = min(ref - ts // day, 63)
        a = want.setdefault(u, [0, 0])
        a[0] += vc >> age
        a[1] += 1
    got = {
        r["user_id"]: (r["decayed_c"], r["n"])
        for r in user_decayed_value(SF).take_all()
    }
    assert got == {u: tuple(a) for u, a in want.items()} and len(got) > 1
    # decay sanity: total decayed value is strictly below the undecayed sum
    plain = sum(int(np.floor(v * 100.0 + 0.5)) for _, _, v in rows)
    assert 0 < sum(a[0] for a in want.values()) < plain


def test_dataset_diff_raises_on_duplicate_ids():
    """A duplicated doc_id inside one snapshot must fail loudly, never
    silently mislabel the change."""
    import pytest
    import ray.data

    from invoice_extraction_ray.ops.dedup import dataset_diff

    a = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([5, 5, 6], pa.int64()),
                "text": pa.array(["x", "x", "z"], pa.string()),
            }
        )
    )
    b = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([5, 6], pa.int64()),
                "text": pa.array(["y", "z"], pa.string()),
            }
        )
    )
    with pytest.raises(Exception, match="duplicate doc_ids"):
        dataset_diff(a, b, n_shards=2).take_all()


def test_bucketed_layout_staleness_and_visibility(tmp_path, monkeypatch):
    """Regenerating the source parquet re-buckets (cache key covers
    size+mtime); a layout whose completion marker is missing makes the
    join RAISE instead of silently returning empty buckets."""
    import os
    import shutil

    import pytest

    from invoice_extraction_ray.ops.relational import (
        bucketed_layout,
        order_details_bucketed,
    )

    monkeypatch.setenv("IER_BUCKETED_CACHE", str(tmp_path / "cache"))
    sf = tmp_path / "sf"
    sf.mkdir()
    for t in ("orders", "lineitem"):
        shutil.copy(f"{SF}/{t}.parquet", sf / f"{t}.parquet")

    d1 = bucketed_layout(
        str(sf), "orders", "o_orderkey", 4,
        ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )
    assert os.path.exists(f"{d1}/_COMPLETE")
    # same source -> same layout dir (cache hit)
    assert d1 == bucketed_layout(
        str(sf), "orders", "o_orderkey", 4,
        ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )
    # regenerate the source: different mtime/size -> NEW layout dir
    os.utime(sf / "orders.parquet", ns=(1, 1))
    d2 = bucketed_layout(
        str(sf), "orders", "o_orderkey", 4,
        ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )
    assert d2 != d1

    # the layout query itself works against the env-pointed cache
    rows = order_details_bucketed(str(sf), n_buckets=4).take_all()
    assert len(rows) > 100

    # worker-side visibility guard: a node that cannot see the layout's
    # completion marker raises instead of contributing empty buckets (the
    # driver rebuilds marker-less layouts, so exercise the guard directly)
    from invoice_extraction_ray.ops.relational import _require_layout_visible

    _require_layout_visible(d2)  # visible layout passes
    with pytest.raises(RuntimeError, match="not visible"):
        _require_layout_visible(str(tmp_path / "nonexistent_layout"))


def test_customer_order_distribution_matches_local_recompute():
    """Q13 custdist: histogram of per-customer order counts including the
    zero bucket derived from the customer footer row count."""
    from invoice_extraction_ray.ops.relational import customer_order_distribution

    orders = pq.read_table(f"{SF}/orders.parquet", columns=["o_custkey"])
    per_cust: dict[int, int] = {}
    for c in orders.column("o_custkey").to_pylist():
        per_cust[c] = per_cust.get(c, 0) + 1
    n_cust = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey"]).num_rows
    hist: dict[int, int] = {}
    for n in per_cust.values():
        hist[n] = hist.get(n, 0) + 1
    zero = n_cust - len(per_cust)
    if zero > 0:
        hist[0] = zero
    t = customer_order_distribution(SF)
    got = dict(zip(t.column("c_count").to_pylist(), t.column("custdist").to_pylist()))
    assert got == hist
    assert sum(got.values()) == n_cust  # every customer lands in one bucket
    # output honors the TPC-H (custdist DESC, c_count DESC) report order
    pairs = list(zip(t.column("custdist").to_pylist(), t.column("c_count").to_pylist()))
    assert pairs == sorted(pairs, key=lambda p: (-p[0], -p[1]))


def test_cheapest_supplier_matches_local_recompute():
    """Q2 groupwise argmin: the (price asc, suppkey asc) witness per part,
    recovered to the supplier name — partials must not lose ties."""
    from invoice_extraction_ray.ops.relational import cheapest_supplier

    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"],
    )
    best: dict[int, tuple[int, int]] = {}
    for p, s, x in zip(
        li.column("l_partkey").to_pylist(),
        li.column("l_suppkey").to_pylist(),
        li.column("l_extendedprice").to_pylist(),
    ):
        cand = (int(np.floor(x * 100.0 + 0.5)), s)
        if p not in best or cand < best[p]:
            best[p] = cand
    sup = pq.read_table(f"{SF}/supplier.parquet", columns=["s_suppkey", "s_name"])
    smap = dict(
        zip(sup.column("s_suppkey").to_pylist(), sup.column("s_name").to_pylist())
    )
    want = {(p, s, smap[s], c) for p, (c, s) in best.items()}
    got = {
        (r["p_partkey"], r["s_suppkey"], r["s_name"], r["min_price_c"])
        for r in cheapest_supplier(SF).take_all()
    }
    assert got == want
    assert len(got) == len(best)  # exactly one witness per part


def test_user_gap_fill_matches_local_recompute():
    """Dense per-user daily grid: every day in the user's span appears
    exactly once, observed days carry their exact total, gap days carry
    the most recent observed total."""
    from invoice_extraction_ray.ops.window import user_gap_fill

    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "ts", "value"])
    daily: dict[tuple[int, int], int] = {}
    for u, ts, v in zip(
        ev.column("user_id").to_pylist(),
        ev.column("ts").cast(pa.int64()).to_pylist(),
        ev.column("value").to_pylist(),
    ):
        d = ts // (86400 * 10**6)
        daily[(u, d)] = daily.get((u, d), 0) + int(np.floor(v * 100.0 + 0.5))
    span: dict[int, list[int]] = {}
    for u, d in daily:
        lo_hi = span.setdefault(u, [d, d])
        lo_hi[0] = min(lo_hi[0], d)
        lo_hi[1] = max(lo_hi[1], d)
    want = {}
    for u, (lo, hi) in span.items():
        last = None
        for d in range(lo, hi + 1):
            if (u, d) in daily:
                last = daily[(u, d)]
                want[(u, d)] = (last, 1)
            else:
                want[(u, d)] = (last, 0)
    got = {
        (r["user_id"], r["day_i"]): (r["value_c"], r["observed"])
        for r in user_gap_fill(SF).take_all()
    }
    assert got == want
    assert any(obs == 0 for _, obs in got.values())  # gaps actually exist


def test_incremental_user_value_cache_reuse_and_exactness(tmp_path, monkeypatch):
    """Materialized-view refresh: first call builds the base-partial layout,
    the second SERVES it (marker untouched) and still merges to the exact
    full GROUP BY; a source rewrite invalidates the key and rebuilds."""
    import os
    import time

    from invoice_extraction_ray.ops.relational import incremental_user_value

    monkeypatch.setenv("IER_INCR_CACHE", str(tmp_path / "cache"))
    rng = np.random.RandomState(7)
    n = 5000
    day = 86_400_000_000
    user = rng.randint(0, 80, n).astype(np.int64)
    days = rng.randint(0, 30, n).astype(np.int64)  # 30-day span > 7-day delta
    value = np.round(rng.uniform(0, 300, n), 2)

    def write(dirname, u, dd, v):
        t = pa.table(
            {
                "user_id": pa.array(u),
                "ts": pa.array(dd * day + 17, pa.int64()).cast(pa.timestamp("us")),
                "value": pa.array(v, pa.float64()),
            }
        )
        d = tmp_path / dirname
        d.mkdir(exist_ok=True)
        pq.write_table(t, d / "events.parquet", row_group_size=511)
        return str(d)

    sf = write("v1", user, days, value)

    def want_of(u, v):
        cents = np.floor(np.asarray(v) * 100.0 + 0.5).astype(np.int64)
        w: dict = {}
        for uu, c in zip(np.asarray(u).tolist(), cents.tolist()):
            tc, cnt = w.get(uu, (0, 0))
            w[uu] = (tc + c, cnt + 1)
        return w

    got1 = {
        r["user_id"]: (r["total_c"], r["n"])
        for r in incremental_user_value(sf).take_all()
    }
    assert got1 == want_of(user, value)

    cache_root = tmp_path / "cache"
    markers = list(cache_root.glob("*/_COMPLETE"))
    assert len(markers) == 1
    stamp = markers[0].stat().st_mtime_ns
    time.sleep(0.01)

    got2 = {
        r["user_id"]: (r["total_c"], r["n"])
        for r in incremental_user_value(sf).take_all()
    }
    assert got2 == got1
    assert markers[0].stat().st_mtime_ns == stamp  # base served, not rebuilt
    assert not list(cache_root.glob("*.tmp.*"))  # no stray build dirs

    # delta-style arrival: append hot rows (max day + small) — the rewritten
    # source must invalidate the old key and the refreshed result stay exact
    u2 = np.concatenate([user, rng.randint(0, 80, 500).astype(np.int64)])
    d2 = np.concatenate([days, np.full(500, 31, dtype=np.int64)])
    v2 = np.concatenate([value, np.round(rng.uniform(0, 300, 500), 2)])
    sf2 = write("v1", u2, d2, v2)  # same path, new content
    got3 = {
        r["user_id"]: (r["total_c"], r["n"])
        for r in incremental_user_value(sf2).take_all()
    }
    assert got3 == want_of(u2, v2)
    assert len(list(cache_root.glob("*/_COMPLETE"))) == 2  # new key built


def test_morton2_interleaves_bits():
    from invoice_extraction_ray.ops.relational import _morton2

    x = np.array([0, 3, 1, (1 << 31) - 1], dtype=np.int64)
    y = np.array([0, 1, 0, (1 << 31) - 1], dtype=np.int64)
    got = _morton2(x, y)
    assert got[0] == 0
    assert got[1] == 7  # x=0b11 -> even bits 0b0101; y=0b01 -> odd bit 0b10
    assert got[2] == 1
    assert got[3] == (1 << 62) - 1 and got[3] > 0  # stays int64-positive


def test_zorder_layout_prunes_both_axes_and_reuses_cache(tmp_path, monkeypatch):
    """The z-ordered layout's row-group min/max stats must prune a 2-D
    rectangle on BOTH axes (most groups skipped), the scan must return
    exactly the matching rows, and a second call must serve the cached
    layout (marker untouched)."""
    from invoice_extraction_ray.config import (
        ZORDER_DAY_BACK_HI,
        ZORDER_DAY_BACK_LO,
        ZORDER_USER_HI,
        ZORDER_USER_LO,
    )
    from invoice_extraction_ray.ops.relational import events_zorder_scan, zorder_layout

    monkeypatch.setenv("IER_ZORDER_CACHE", str(tmp_path / "zcache"))
    rng = np.random.RandomState(31)
    n = 60_000
    day_us = 86_400_000_000
    user = rng.randint(0, 256, n).astype(np.int64)
    days = rng.randint(0, 64, n).astype(np.int64)
    value = np.round(rng.uniform(0, 100, n), 2)
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(days * day_us + 11, pa.int64()).cast(pa.timestamp("us")),
            "user_id": pa.array(user),
            "value": pa.array(value, pa.float64()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")

    layout = zorder_layout(str(d), row_group_rows=2048)
    mx = int(days.max())
    lo_d, hi_d = mx - ZORDER_DAY_BACK_LO, mx - ZORDER_DAY_BACK_HI

    # footer-stats pruning: most row groups must MISS the rectangle
    import glob as _glob

    total, hit = 0, 0
    for f in _glob.glob(f"{layout}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for g in range(md.num_row_groups):
            total += 1
            su = md.row_group(g).column(names["user_id"]).statistics
            sd = md.row_group(g).column(names["day_i"]).statistics
            if (
                su.min <= ZORDER_USER_HI
                and su.max >= ZORDER_USER_LO
                and sd.min <= hi_d
                and sd.max >= lo_d
            ):
                hit += 1
    assert total >= 16
    assert hit / total < 0.5, (hit, total)  # both-axis clustering pays

    cents = np.floor(value * 100.0 + 0.5).astype(np.int64)
    mask = (
        (user >= ZORDER_USER_LO)
        & (user <= ZORDER_USER_HI)
        & (days >= lo_d)
        & (days <= hi_d)
    )
    want = {
        (int(i), int(u), int(dd), int(c))
        for i, u, dd, c in zip(
            np.arange(n)[mask], user[mask], days[mask], cents[mask]
        )
    }
    got = {
        (r["event_id"], r["user_id"], r["day_i"], r["value_c"])
        for r in events_zorder_scan(str(d)).take_all()
    }
    assert got == want and len(got) > 0

    import pathlib

    # two keys exist: the 2048-row test layout + the scan's default layout
    markers = sorted(pathlib.Path(tmp_path / "zcache").glob("*/_COMPLETE"))
    assert len(markers) == 2
    stamps = [m.stat().st_mtime_ns for m in markers]
    got2 = events_zorder_scan(str(d)).count()
    assert got2 == len(want)
    assert [m.stat().st_mtime_ns for m in markers] == stamps  # served, not rebuilt
    assert not list(pathlib.Path(tmp_path / "zcache").glob("*.tmp.*"))


def test_bfs_hops_matches_local_recompute():
    """Level-synchronous BFS: exact min-hop distances over the bipartite
    part<->supplier graph, seed row included."""
    from collections import deque

    from invoice_extraction_ray.config import BFS_MAX_HOPS, BFS_SOURCE_PART
    from invoice_extraction_ray.ops.graph import bfs_hops

    li = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_partkey", "l_suppkey"])
    adj: dict[int, set[int]] = {}
    for p, s in zip(
        li.column("l_partkey").to_pylist(), li.column("l_suppkey").to_pylist()
    ):
        a, b = 2 * p, 2 * s + 1
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seed = 2 * BFS_SOURCE_PART
    dist = {seed: 0}
    q = deque([seed])
    while q:
        v = q.popleft()
        if dist[v] >= BFS_MAX_HOPS:
            continue
        for w in adj.get(v, ()):
            if w not in dist:
                dist[w] = dist[v] + 1
                q.append(w)
    want = {
        ("part" if v % 2 == 0 else "supplier", v // 2): h for v, h in dist.items()
    }
    got = {
        (r["kind"], r["key"]): r["hops"] for r in bfs_hops(SF).take_all()
    }
    assert got == want
    assert got[("part", BFS_SOURCE_PART)] == 0
    assert max(got.values()) <= BFS_MAX_HOPS and len(got) > 1


def test_bfs_hops_isolated_seed(tmp_path):
    """A seed with no edges yields exactly its own hops-0 row."""
    from invoice_extraction_ray.ops.graph import bfs_hops

    li = pa.table(
        {
            "l_partkey": pa.array([5, 6], pa.int64()),
            "l_suppkey": pa.array([2, 2], pa.int64()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(li, d / "lineitem.parquet")
    rows = bfs_hops(str(d), source_part=10).take_all()
    assert [(r["kind"], r["key"], r["hops"]) for r in rows] == [("part", 10, 0)]
    # and a connected seed reaches the other side of its component
    rows2 = {
        (r["kind"], r["key"]): r["hops"]
        for r in bfs_hops(str(d), source_part=5).take_all()
    }
    assert rows2 == {
        ("part", 5): 0,
        ("supplier", 2): 1,
        ("part", 6): 2,
    }


def test_sole_return_suppliers_matches_local_recompute():
    """Q21 exactly-one-witness: per order, >=2 distinct suppliers and
    exactly one with an R-flag lineitem credits that supplier; top-k by
    (count desc, suppkey asc)."""
    from collections import defaultdict

    from invoice_extraction_ray.config import (
        SEMI_JOIN_RETURNFLAG,
        SOLE_RETURN_TOPK,
    )
    from invoice_extraction_ray.ops.relational import sole_return_suppliers

    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_returnflag"],
    )
    per_order: dict[int, dict[int, bool]] = defaultdict(dict)
    for ok, sk, f in zip(
        li.column("l_orderkey").to_pylist(),
        li.column("l_suppkey").to_pylist(),
        li.column("l_returnflag").to_pylist(),
    ):
        per_order[ok][sk] = per_order[ok].get(sk, False) or (
            f == SEMI_JOIN_RETURNFLAG
        )
    credit: dict[int, int] = defaultdict(int)
    for supps in per_order.values():
        rs = [s for s, r in supps.items() if r]
        if len(supps) >= 2 and len(rs) == 1:
            credit[rs[0]] += 1
    want = sorted(credit.items(), key=lambda kv: (-kv[1], kv[0]))[:SOLE_RETURN_TOPK]
    got = [
        (r["s_suppkey"], r["n_orders"])
        for r in sole_return_suppliers(SF).take_all()
    ]
    assert got == want and len(got) > 0


def test_rich_idle_customers_matches_local_recompute():
    """Q22 shape: strictly-above-global-average positive balance AND no
    big order; exact integer cents*n > sum comparison, per-segment rollup."""
    from collections import defaultdict

    import numpy as np

    from invoice_extraction_ray.ops.relational import (
        BIG_ORDER_THRESHOLD,
        rich_idle_customers,
    )

    cust = pq.read_table(
        f"{SF}/customer.parquet",
        columns=["c_custkey", "c_acctbal", "c_mktsegment"],
    )
    cents = np.floor(
        cust.column("c_acctbal").to_numpy(zero_copy_only=False) * 100.0 + 0.5
    ).astype(np.int64)
    pos = cents[cents > 0]
    S, N = int(pos.sum()), len(pos)
    orders = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    big = {
        c
        for c, p in zip(
            orders.column("o_custkey").to_pylist(),
            orders.column("o_totalprice").to_pylist(),
        )
        if p > BIG_ORDER_THRESHOLD
    }
    want: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for k, seg, c in zip(
        cust.column("c_custkey").to_pylist(),
        cust.column("c_mktsegment").to_pylist(),
        cents.tolist(),
    ):
        if c * N > S and k not in big:
            want[seg][0] += 1
            want[seg][1] += c
    got = {
        r["c_mktsegment"]: [r["numcust"], r["totacctbal_c"]]
        for r in rich_idle_customers(SF).take_all()
    }
    assert got == dict(want) and len(got) > 0


def test_user_event_entropy_matches_local_recompute():
    """Grouped bitlen-exact entropy: sum c*(bitlen(n)-bitlen(c)) per user
    plus the half-up e4 mean, against a pure-python recompute."""
    from collections import Counter

    from invoice_extraction_ray.ops.relational import user_event_entropy

    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "event_type"])
    cnt = Counter(
        zip(ev.column("user_id").to_pylist(), ev.column("event_type").to_pylist())
    )
    totals: dict[int, int] = Counter()
    for (u, _), c in cnt.items():
        totals[u] += c
    want = {}
    for u, n in totals.items():
        ent = sum(
            c * (n.bit_length() - c.bit_length())
            for (uu, _), c in cnt.items()
            if uu == u
        )
        want[u] = (n, ent, (20000 * ent + n) // (2 * n))
    got = {
        r["user_id"]: (r["n_events"], r["entropy_fl2"], r["mean_entropy_e4"])
        for r in user_event_entropy(SF).take_all()
    }
    assert got == want and len(got) > 0


def test_user_event_entropy_partition_invariance():
    """The (user, type) partials merge associatively: a 7-row block split
    gives byte-identical output to the default read layout."""
    import ray as _ray

    from invoice_extraction_ray.ops.relational import user_event_entropy

    base = {
        r["user_id"]: (r["n_events"], r["entropy_fl2"])
        for r in user_event_entropy(SF).take_all()
    }
    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "event_type"])
    import invoice_extraction_ray.ops.relational as R

    ds = _ray.data.from_arrow(
        [ev.slice(i, 7) for i in range(0, ev.num_rows, 7)]
    )
    # run the same pipeline stages over the adversarial layout
    import numpy as np  # noqa: F401

    orig = _ray.data.read_parquet
    try:
        _ray.data.read_parquet = lambda *a, **k: ds
        split = {
            r["user_id"]: (r["n_events"], r["entropy_fl2"])
            for r in user_event_entropy(SF).take_all()
        }
    finally:
        _ray.data.read_parquet = orig
    assert split == base


def test_phrase_search_matches_local_recompute():
    """Positional-index phrase retrieval equals the per-doc token-scan
    recompute (every start position counted)."""
    from invoice_extraction_ray.config import PHRASE_TERMS
    from invoice_extraction_ray.ops.text import phrase_search

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    k = len(PHRASE_TERMS)
    want = {}
    for d, t in zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()):
        ws = (t or "").split()
        n = sum(
            1
            for i in range(len(ws) - k + 1)
            if tuple(ws[i : i + k]) == PHRASE_TERMS
        )
        if n:
            want[d] = n
    got = {r["doc_id"]: r["n_matches"] for r in phrase_search(SF).take_all()}
    assert got == want and len(got) > 0


def test_phrase_search_counts_overlapping_occurrences():
    """A self-overlapping phrase ('pad pad' in 'pad pad pad') counts every
    start position — the lookahead semantics a naive split-count misses."""
    import os
    import tempfile

    from invoice_extraction_ray.ops.text import phrase_search

    with tempfile.TemporaryDirectory() as td:
        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    ["pad pad pad", "x pad pad y pad pad", "pad nope pad"],
                    pa.string(),
                ),
                "lang": pa.array(["en"] * 3, pa.string()),
            }
        )
        pq.write_table(tbl, os.path.join(td, "documents.parquet"))
        got = {
            r["doc_id"]: r["n_matches"]
            for r in phrase_search(td, phrase=("pad", "pad")).take_all()
        }
    assert got == {1: 2, 2: 2}


def test_value_ks_drift_matches_local_recompute():
    """Integer-exact two-sample KS: max |cum1*n2 - cum2*n1| over distinct
    cent thresholds, against a pure-python recompute."""
    import numpy as np

    from invoice_extraction_ray.config import KS_EVENT_TYPES
    from invoice_extraction_ray.ops.sketch import value_ks_drift

    ev = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "value"])
    t1, t2 = KS_EVENT_TYPES
    s1, s2 = [], []
    for ty, v in zip(
        ev.column("event_type").to_pylist(), ev.column("value").to_pylist()
    ):
        c = int(np.floor(v * 100.0 + 0.5))
        if ty == t1:
            s1.append(c)
        elif ty == t2:
            s2.append(c)
    n1, n2 = len(s1), len(s2)
    thresholds = sorted(set(s1) | set(s2))
    d_num = max(
        abs(sum(1 for x in s1 if x <= t) * n2 - sum(1 for x in s2 if x <= t) * n1)
        for t in thresholds
    )
    out = value_ks_drift(SF).to_pylist()
    assert out == [
        {
            "d_num": d_num,
            "d_e6": (1_000_000 * d_num) // (n1 * n2),
            "n1": n1,
            "n2": n2,
        }
    ]


def test_value_ks_drift_identical_distributions_is_zero():
    """KS of a distribution against itself is exactly 0 (planted case via
    the same type on both sides through the types parameter)."""
    from invoice_extraction_ray.ops.sketch import value_ks_drift

    out = value_ks_drift(SF, types=("click", "click")).to_pylist()
    # same type on both sides: the filter keeps each row once and the
    # isa mask marks ALL kept rows as side 1 -> n2 == 0 -> empty result
    # (degenerate by contract, mirrored by the oracle's n2 > 0 guard)
    assert out == []


def test_tpch_q7_q14_q15_q19_match_duckdb_oracles():
    """The four round-5 TPC-H shapes (trade flows / promo share / top
    supplier / disjunctive predicate) replay their registered oracle SQL
    at sf0.001 inside pytest."""
    import duckdb

    import __ray_entry__ as entry

    con = duckdb.connect()
    for tbl in ("lineitem", "orders", "customer", "supplier", "part", "nation"):
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{SF}/{tbl}.parquet')"
        )
    sqls = entry.oracle_sql()
    qs = entry.queries()
    for name in (
        "nation_trade_flows",
        "top_supplier_revenue",
        "promo_revenue_share",
        "disjunctive_revenue",
    ):
        got = qs[name](SF)
        if hasattr(got, "take_all"):
            got = pa.Table.from_pylist(got.take_all())
        want = con.execute(sqls[name]).fetch_arrow_table()
        assert got.to_pylist() == want.to_pylist(), name


def test_nation_trade_flows_shard_invariance():
    """The three chained shard merges give identical flows at any shard
    count (catches shard-boundary/combine bugs the default can't)."""
    from invoice_extraction_ray.ops.relational import nation_trade_flows

    a = nation_trade_flows(SF, num_shards=3).to_pylist()
    b = nation_trade_flows(SF, num_shards=64).to_pylist()
    assert a == b and len(a) > 0


def test_disjunctive_revenue_clause_decomposition():
    """OR-of-ANDs equals the inclusion-free sum over rows matching ANY
    clause, recomputed row-at-a-time in python."""
    import numpy as np

    from invoice_extraction_ray.config import Q19_CLAUSES
    from invoice_extraction_ray.ops.relational import disjunctive_revenue

    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    ).to_pylist()
    part = {
        r["p_partkey"]: (r["p_brand"], r["p_size"])
        for r in pq.read_table(
            f"{SF}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
        ).to_pylist()
    }
    want = 0
    for r in li:
        brand, size = part[r["l_partkey"]]
        qty = int(np.floor(r["l_quantity"] + 0.5))
        if any(
            brand == cb and slo <= size <= shi and qlo <= qty <= qhi
            for (cb, slo, shi, qlo, qhi) in Q19_CLAUSES
        ):
            want += int(np.floor(r["l_extendedprice"] * 100.0 + 0.5)) * (
                10000 - int(np.floor(r["l_discount"] * 10000.0 + 0.5))
            )
    got = disjunctive_revenue(SF, num_shards=5).to_pylist()
    assert got == ([{"revenue_i": want}] if want else [])


def test_safe_isum_overflow_paths():
    """_safe_isum: exact past the numpy wrap bound, loud past int64."""
    import numpy as np
    import pytest as _pytest

    from invoice_extraction_ray.ops.relational import _safe_isum

    big = np.array([2**62, 2**61], dtype=np.int64)
    assert _safe_isum(big) == 2**62 + 2**61  # > max*n bound, still fits
    with _pytest.raises(ValueError, match="num_shards"):
        _safe_isum(np.array([2**62] * 3, dtype=np.int64))
    assert _safe_isum(np.array([], dtype=np.int64)) == 0


def test_tpch_q8_q10_match_duckdb_oracles():
    """market_share / returned_item_report replay their registered oracle
    SQL at sf0.001 inside pytest (plus shard invariance for the chain)."""
    import duckdb

    import __ray_entry__ as entry

    con = duckdb.connect()
    for tbl in (
        "lineitem", "orders", "customer", "supplier", "part", "nation", "region"
    ):
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{SF}/{tbl}.parquet')"
        )
    sqls = entry.oracle_sql()
    qs = entry.queries()
    for name in ("returned_item_report", "market_share"):
        got = qs[name](SF)
        want = con.execute(sqls[name]).fetch_arrow_table()
        assert got.to_pylist() == want.to_pylist(), name

    from invoice_extraction_ray.ops.relational import market_share

    assert (
        market_share(SF, num_shards=3).to_pylist()
        == market_share(SF, num_shards=64).to_pylist()
    )


# ---------------------------------------------------------------------------
# edit-distance verified near-dup (SNM + batched byte-Levenshtein)
# ---------------------------------------------------------------------------


def _ref_lev(a: bytes, b: bytes) -> int:
    la, lb = len(a), len(b)
    D = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, D[0] = D[0], i
        for j in range(1, lb + 1):
            cur = D[j]
            D[j] = min(D[j] + 1, D[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return D[lb]


def test_lev_batch_matches_reference():
    """The batched min-plus-scan DP equals the classic per-pair DP on an
    all-pairs sweep of random byte strings (incl. empty, equal, multi-byte
    UTF-8 and length-skewed cases)."""
    import random

    from invoice_extraction_ray.ops.dedup import _lev_batch

    random.seed(7)
    strs = [
        bytes(random.choices(b"abcde \xc3\xa9", k=random.randint(0, 20)))
        for _ in range(30)
    ]
    strs += [b"", b"a", b"abcabc", strs[0]]
    lens = np.array([len(s) for s in strs], np.int64)
    W = max(1, int(lens.max()))
    M = np.full((len(strs), W), 256, np.int16)
    for r, bs in enumerate(strs):
        if bs:
            M[r, : len(bs)] = np.frombuffer(bs, np.uint8)
    ia = np.repeat(np.arange(len(strs)), len(strs))
    ib = np.tile(np.arange(len(strs)), len(strs))
    got = _lev_batch(M, lens, ia, ib)
    exp = np.array([_ref_lev(strs[i], strs[j]) for i, j in zip(ia, ib)])
    assert (got == exp).all()


def test_editdist_neardup_matches_recompute():
    """Engine output equals the python sort + window + byte-DP recompute
    (UTF-8 byte distance over the normalized EDITDIST_PREFIX-char slice),
    and thresholds at config.EDITDIST_MAX."""
    import re

    from invoice_extraction_ray import config
    from invoice_extraction_ray.ops.dedup import editdist_neardup

    docs = _docs()
    rows = []
    for d, tx in zip(
        docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()
    ):
        norm = re.sub(r"\s+", " ", (tx or "").lower()).strip()
        rows.append((norm[:16], d, norm[: config.EDITDIST_PREFIX].encode()))
    rows.sort(key=lambda r: (r[0].encode(), r[1]))
    want = set()
    for i in range(len(rows)):
        for j in range(i + 1, min(i + 1 + config.SNM_WINDOW, len(rows))):
            dist = _ref_lev(rows[i][2], rows[j][2])
            if dist <= config.EDITDIST_MAX:
                want.add((rows[i][1], rows[j][1], j - i, dist))
    got = {
        (r["doc_a"], r["doc_b"], r["rank_gap"], r["dist"])
        for r in editdist_neardup(SF).take_all()
    }
    assert got == want
    assert any(d > 0 for *_, d in got)  # nonzero distances are exercised


def test_editdist_neardup_planted(tmp_path):
    """Planted small edits land within max_dist with the exact distance;
    unrelated texts in the same window are dropped."""
    texts = [
        "alpha report on quarterly numbers",
        "alpha report on quartrly numbers",  # 1 deletion
        "alpha report on the quarterly numbers",  # 4-byte insertion
        "zzz totally different content here",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    from invoice_extraction_ray.ops.dedup import editdist_neardup

    got = {
        (r["doc_a"], r["doc_b"]): r["dist"]
        for r in editdist_neardup(str(tmp_path), max_dist=10).take_all()
    }
    assert got[(0, 1)] == 1
    assert got[(0, 2)] == 4
    assert got[(1, 2)] == 5
    assert all(3 not in k for k in got)


# ---------------------------------------------------------------------------
# PPJoin prefix filtering (jaccard_prefix_pairs == ngram_jaccard_neardup)
# ---------------------------------------------------------------------------


def test_jaccard_prefix_pairs_equals_ngram():
    from invoice_extraction_ray.ops.dedup import (
        jaccard_prefix_pairs,
        ngram_jaccard_neardup,
    )

    docs = _docs()
    a = sorted(jaccard_prefix_pairs(docs, threshold=0.5).take_all(), key=str)
    b = sorted(ngram_jaccard_neardup(docs, threshold=0.5).take_all(), key=str)
    assert a == b
    assert len(a) > 0


def test_jaccard_prefix_pairs_random_differential():
    """Prefix filtering is lossless at ANY threshold: planted-dup random
    corpora agree with the full-inverted-index op at 0.3 / 0.5 / 0.7."""
    from invoice_extraction_ray.ops.dedup import (
        jaccard_prefix_pairs,
        ngram_jaccard_neardup,
    )

    docs, _ = _planted(_docs().slice(0, 120), every=5)
    for thr in (0.3, 0.5, 0.7):
        a = sorted(jaccard_prefix_pairs(docs, threshold=thr).take_all(), key=str)
        b = sorted(ngram_jaccard_neardup(docs, threshold=thr).take_all(), key=str)
        assert a == b, thr
    assert len(jaccard_prefix_pairs(docs, threshold=0.3).take_all()) > 0


# ---------------------------------------------------------------------------
# neardup_recall_report (LSH banding evaluation vs exact ground truth)
# ---------------------------------------------------------------------------


def test_neardup_recall_report_recompute():
    """Counters equal a local all-pairs recompute of shingle-set Jaccard
    under the verify's rounding rule; minhash output is a verified subset
    of exact, so precision is 1.0 and recall measures banding loss."""
    from invoice_extraction_ray.ops.dedup import (
        minhash_neardup,
        neardup_recall_report,
        shingle_hashes,
    )

    docs = _docs()
    sets = {
        d: set(shingle_hashes(s).tolist())
        for d, s in zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist())
    }
    ids = sorted(sets)
    exact = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            if inter > 0 and 2 * inter * 10_000 >= 15_999 * union:
                exact.add((a, b))
    approx = {
        (r["a_id"], r["b_id"])
        for r in minhash_neardup(
            pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        ).take_all()
    }
    row = neardup_recall_report(SF).take_all()[0]
    assert row["n_exact"] == len(exact)
    assert row["n_approx"] == len(approx)
    assert row["n_hit"] == len(exact & approx)
    assert row["precision_e6"] == 1_000_000  # verify stage is exact


def test_user_active_spans_matches_local_recompute():
    """Distributed interval-union coverage equals the per-user sorted merge."""
    from invoice_extraction_ray.config import SPAN_GAP_BY_TYPE, SPAN_GAP_DEFAULT
    from invoice_extraction_ray.ops.interval import user_active_spans

    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "ts", "event_type"])
    per: dict[int, list] = {}
    for u, us, et in zip(
        ev.column("user_id").to_pylist(),
        ev.column("ts").cast(pa.int64()).to_pylist(),
        ev.column("event_type").to_pylist(),
    ):
        s = us // 10**6
        per.setdefault(u, []).append(
            (s, s + SPAN_GAP_BY_TYPE.get(et, SPAN_GAP_DEFAULT))
        )
    want = {}
    for u, iv in per.items():
        iv.sort()
        spans = []
        cs, ce = iv[0]
        for s, e in iv[1:]:
            if s > ce:
                spans.append((cs, ce))
                cs, ce = s, e
            else:
                ce = max(ce, e)
        spans.append((cs, ce))
        want[u] = (
            len(spans),
            sum(e - s for s, e in spans),
            max(e - s for s, e in spans),
        )
    got = {
        r["user_id"]: (r["n_spans"], r["covered_sec"], r["max_span_sec"])
        for r in user_active_spans(SF, n_shards=5).take_all()
    }
    assert got == want and len(got) > 1
    # at least one user actually merged intervals (spans < events)
    assert any(want[u][0] < len(per[u]) for u in want)


def test_user_active_spans_offset_guard_raises():
    """The rank-offset pack fails loudly, never silently, when
    users_in_shard * time_width would leave int64 (repo guard convention)."""
    from invoice_extraction_ray.ops.interval import _merge_user_spans

    n = 8
    u = np.arange(n, dtype=np.int64)
    s = np.zeros(n, dtype=np.int64)
    e = np.full(n, (1 << 61), dtype=np.int64)
    with pytest.raises(ValueError, match="rank-offset"):
        _merge_user_spans(u, s, e)


def test_apply_changelog_lifecycle_classes():
    """CDC last-writer-wins: full-table recompute equality PLUS explicit
    assertions on each lifecycle class — delete-then-upsert resurrects,
    update-then-delete drops, inserts land at offset ids."""
    from invoice_extraction_ray.config import (
        CDC_DEL2_MOD,
        CDC_DEL_MOD,
        CDC_INS_MOD,
        CDC_INS_OFFSET,
        CDC_UPD_MOD,
    )
    from invoice_extraction_ray.ops.dedup import apply_changelog

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    base = {
        i: len(t or "")
        for i, t in zip(
            docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()
        )
    }
    want = {}
    for i, nc in base.items():
        final = (0, nc)
        if i % CDC_DEL_MOD == 0:
            final = (1, 0)
        if i % CDC_UPD_MOD == 0:
            final = (0, nc + 4)
        if i % CDC_DEL2_MOD == 0:
            final = (1, 0)
        if final[0] == 0:
            want[i] = final[1]
        if i % CDC_INS_MOD == 0:
            want[i + CDC_INS_OFFSET] = nc + 4
    got = {
        r["doc_id"]: r["n_chars"]
        for r in apply_changelog(SF, n_shards=7).take_all()
    }
    assert got == want
    resurrected = [i for i in base if i % 18 == 0 and i % 15 != 0]
    upd_then_del = [i for i in base if i % 30 == 0]
    inserted = [i for i in base if i % CDC_INS_MOD == 0]
    assert resurrected and upd_then_del and inserted  # classes non-empty
    assert all(got[i] == base[i] + 4 for i in resurrected)
    assert all(i not in got for i in upd_then_del)
    assert all(got[i + CDC_INS_OFFSET] == base[i] + 4 for i in inserted)


def test_scd2_user_bands_matches_local_recompute():
    """SCD2 version rows equal the per-user band-run recompute; versions
    tile each user's observed days and valid_to chains to the next
    valid_from."""
    from invoice_extraction_ray.config import SCD2_BAND_EDGES_C
    from invoice_extraction_ray.ops.window import scd2_user_bands

    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "ts", "value"])
    daily: dict[tuple, int] = {}
    for u, us, v in zip(
        ev.column("user_id").to_pylist(),
        ev.column("ts").cast(pa.int64()).to_pylist(),
        ev.column("value").to_pylist(),
    ):
        d = us // 86_400_000_000
        daily[(u, d)] = daily.get((u, d), 0) + int(np.floor(v * 100.0 + 0.5))
    per: dict[int, list] = {}
    for (u, d), vc in daily.items():
        per.setdefault(u, []).append((d, vc))
    e0, e1 = SCD2_BAND_EDGES_C
    want = set()
    for u, cells in per.items():
        cells.sort()
        runs: list[list] = []
        for d, vc in cells:
            b = 0 if vc < e0 else (1 if vc < e1 else 2)
            if runs and runs[-1][0] == b:
                runs[-1][2] += 1
            else:
                runs.append([b, d, 1])
        for i, (b, vf, nd) in enumerate(runs):
            vt = runs[i + 1][1] if i + 1 < len(runs) else None
            want.add((u, b, vf, vt, nd))
    rows = scd2_user_bands(SF, n_shards=5).take_all()
    got = set(
        (r["user_id"], r["band"], r["valid_from"], r["valid_to"], r["n_days"])
        for r in rows
    )
    assert got == want and len(got) > 1
    # structural invariants: per user, n_days sums to observed days and
    # exactly one open (valid_to NULL) version exists
    per_user_days: dict[int, int] = {}
    open_count: dict[int, int] = {}
    for u, _b, _vf, vt, nd in got:
        per_user_days[u] = per_user_days.get(u, 0) + nd
        if vt is None:
            open_count[u] = open_count.get(u, 0) + 1
    assert per_user_days == {u: len(c) for u, c in per.items()}
    assert all(v == 1 for v in open_count.values()) and set(open_count) == set(per)


def test_rolling_median_value_matches_local_recompute():
    """Distributed rolling exact median equals the per-user deque sweep,
    including the growing prefix frames at each user's start."""
    from invoice_extraction_ray.config import ROLLMED_WINDOW
    from invoice_extraction_ray.ops.window import rolling_median_value

    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )
    per: dict[int, list] = {}
    for e, us, u, v in zip(
        ev.column("event_id").to_pylist(),
        ev.column("ts").cast(pa.int64()).to_pylist(),
        ev.column("user_id").to_pylist(),
        ev.column("value").to_pylist(),
    ):
        per.setdefault(u, []).append((us, e, int(np.floor(v * 100.0 + 0.5))))
    want = {}
    for u, rows in per.items():
        rows.sort()
        vals: list[int] = []
        for _us, e, c in rows:
            vals.append(c)
            win = sorted(vals[-ROLLMED_WINDOW:])
            L = len(win)
            want[e] = (u, win[(L - 1) // 2] + win[L // 2])
    got = {
        r["event_id"]: (r["user_id"], r["med2_c"])
        for r in rolling_median_value(SF, n_shards=5).take_all()
    }
    assert got == want and len(got) == ev.num_rows


def test_top_tokens_per_lang_matches_local_recompute():
    """Grouped top-k token census equals the Counter recompute with the
    (n DESC, token ASC) tie-break."""
    from collections import Counter

    from invoice_extraction_ray.config import TOPTOK_K
    from invoice_extraction_ray.ops.text import top_tokens_per_lang

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["lang", "text"])
    per: dict[str, Counter] = {}
    for lang, t in zip(
        docs.column("lang").to_pylist(), docs.column("text").to_pylist()
    ):
        per.setdefault(lang, Counter()).update((t or "").split())
    want = set()
    for lang, cnt in per.items():
        ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:TOPTOK_K]
        for i, (tok, n) in enumerate(ranked, 1):
            want.add((lang, tok, n, i))
    got = set(
        (r["lang"], r["token"], r["n"], r["rnk"])
        for r in top_tokens_per_lang(SF).take_all()
    )
    assert got == want and len({lang for lang, *_ in got}) > 1


def test_registry_oracle_bijection_and_sql_parses():
    """Registry meta-gate: every queries() entry has an oracle_sql() entry
    and vice versa (the driver's correctness gate covers 100% of the
    registry by construction), every oracle is syntactically valid DuckDB
    against schema-only views of the ten tables, and names are unique."""
    import duckdb

    import __ray_entry__ as E

    qs = E.queries()
    sqls = E.oracle_sql()
    assert set(qs) == set(sqls), (
        sorted(set(qs) ^ set(sqls)) or "never"
    )
    assert len(qs) >= 197

    con = duckdb.connect()
    for tbl in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.sql(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('{SF}/{tbl}.parquet') LIMIT 0"
        )
    pinned = set(getattr(E, "SF001_PINNED", []))
    for name, sql in sqls.items():
        if name in pinned:
            continue  # embed sf0.01-derived asset paths; gated at sf0.01
        try:
            con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
        except Exception as ex:  # pragma: no cover - the assert is the point
            raise AssertionError(f"oracle SQL for {name} failed: {ex}") from ex


def test_langid_confusion_matches_local_recompute():
    """The confusion matrix equals the scalar-predictor recompute and its
    row sums tile the corpus."""
    from collections import Counter

    from invoice_extraction_ray.ops.text import _predict_lang, langid_confusion

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["lang", "text"])
    want: Counter = Counter()
    for lang, t in zip(
        docs.column("lang").to_pylist(), docs.column("text").to_pylist()
    ):
        want[(lang, _predict_lang(t or ""))] += 1
    got = {
        (r["lang_true"], r["lang_pred"]): r["n"]
        for r in langid_confusion(SF).take_all()
    }
    assert got == dict(want)
    assert sum(got.values()) == docs.num_rows


def test_split_leakage_audit_detects_forced_leaks(tmp_path):
    """A corpus with constructed cross-split duplicate groups reports the
    exact per-pair group counts (and a clean corpus reports zeros)."""
    from invoice_extraction_ray.ops.curate import split_leakage_audit
    from invoice_extraction_ray.ops.sketch import _hash64

    ids = np.arange(400, dtype=np.int64)
    bucket = (_hash64(ids) % np.uint64(100)).astype(np.int64)
    split = np.where(bucket < 5, "test", np.where(bucket < 10, "val", "train"))
    by_split = {s: ids[split == s].tolist() for s in ("train", "val", "test")}
    assert all(len(v) >= 2 for v in by_split.values())

    texts = [f"unique text {i}" for i in range(400)]
    # group A straddles train/test, group B train/val, group C val/test,
    # group D duplicates WITHIN train only (must not count anywhere)
    texts[by_split["train"][0]] = texts[by_split["test"][0]] = "dup A"
    texts[by_split["train"][1]] = texts[by_split["val"][0]] = "dup B"
    texts[by_split["val"][1]] = texts[by_split["test"][1]] = "dup C"
    texts[by_split["train"][2]] = texts[by_split["train"][3]] = "dup D"

    d = tmp_path / "leak"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)}),
        d / "documents.parquet",
        row_group_size=37,
    )
    got = {
        (r["split_a"], r["split_b"]): r["n_groups"]
        for r in split_leakage_audit(str(d), n_shards=7).take_all()
    }
    assert got == {
        ("train", "val"): 1,
        ("train", "test"): 1,
        ("val", "test"): 1,
    }

    # clean corpus: all-unique texts -> three zero rows, never missing rows
    d2 = tmp_path / "clean"
    d2.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids),
                "text": pa.array([f"only {i}" for i in range(400)]),
            }
        ),
        d2 / "documents.parquet",
    )
    got2 = {
        (r["split_a"], r["split_b"]): r["n_groups"]
        for r in split_leakage_audit(str(d2)).take_all()
    }
    assert got2 == {
        ("train", "val"): 0,
        ("train", "test"): 0,
        ("val", "test"): 0,
    }


def test_sketch_error_report_recompute_and_bound():
    """The error report equals the recompute from its two source queries
    and every sketched quantile is within the log-bin design bound
    (one 256-per-decade bin ~ 0.9% relative)."""
    import __ray_entry__ as E

    qs = E.queries()
    ex = {r["event_type"]: r for r in qs["value_quantiles"](SF).take_all()}
    sk = {r["event_type"]: r for r in qs["value_quantiles_sketch"](SF).take_all()}
    rep = qs["sketch_error_report"](SF).to_pylist()
    assert len(rep) == len(ex) > 1
    for row in rep:
        t = row["event_type"]
        for q in (25, 50, 75, 95):
            exact = ex[t][f"p{q}_c"]
            want = abs(sk[t][f"p{q}_c"] - exact) * 1_000_000 // max(exact, 1)
            assert row[f"err{q}_e6"] == want
            assert row[f"err{q}_e6"] <= 10_000  # <= 1% relative


def test_hll_error_report_recompute():
    """The cardinality eval equals the exact-set recompute and the HLL
    estimate stays within the 2^10-register design band (~5%)."""
    from invoice_extraction_ray.ops.sketch import hll_error_report

    ev = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "user_id"])
    exact: dict[str, set] = {}
    for t, u in zip(
        ev.column("event_type").to_pylist(), ev.column("user_id").to_pylist()
    ):
        exact.setdefault(t, set()).add(u)
    rep = hll_error_report(SF).to_pylist()
    assert {r["event_type"] for r in rep} == set(exact)
    for r in rep:
        n = len(exact[r["event_type"]])
        assert r["exact_n"] == n
        assert r["err_e6"] == abs(r["approx_n"] - n) * 1_000_000 // max(n, 1)
        assert r["err_e6"] <= 50_000  # <= 5% relative


def test_dup_group_histogram_constructed_groups():
    """The group-size histogram is exact on a corpus with known duplicate
    group sizes (3 singletons, two pairs, one triple, one 5-group) and
    NULL conflates with '' (the documented digest convention)."""
    import ray.data

    from invoice_extraction_ray.ops.dedup import dup_group_histogram

    texts = (
        ["u1", "u2", "u3"]
        + ["pair a"] * 2
        + ["pair b"] * 2
        + ["triple"] * 3
        + ["five"] * 5
        + [None, ""]  # conflate: one group of size 2
    )
    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
    got = {
        r["group_size"]: r["n_groups"]
        for r in dup_group_histogram(ds, n_shards=5).take_all()
    }
    assert got == {1: 3, 2: 3, 3: 1, 5: 1}


def test_user_bands_asof_point_in_time_semantics():
    """The as-of lookup returns EXACTLY one version per user whose
    observed history starts on-or-before the as-of day, and that version's
    validity interval covers the day."""
    from invoice_extraction_ray.config import SCD2_ASOF_DAY
    from invoice_extraction_ray.ops.window import scd2_user_bands, user_bands_asof

    dim = scd2_user_bands(SF, n_shards=5).take_all()
    rows = user_bands_asof(SF, n_shards=5).take_all()
    per_user = {}
    for r in rows:
        assert r["valid_from"] <= SCD2_ASOF_DAY
        assert r["valid_to"] is None or r["valid_to"] > SCD2_ASOF_DAY
        assert r["user_id"] not in per_user  # exactly one version per user
        per_user[r["user_id"]] = r
    eligible = {r["user_id"] for r in dim if r["valid_from"] <= SCD2_ASOF_DAY}
    assert set(per_user) == eligible and len(per_user) > 1
    # every selected row is a real dimension version
    dim_set = {
        (r["user_id"], r["band"], r["valid_from"], r["valid_to"], r["n_days"])
        for r in dim
    }
    for r in per_user.values():
        assert (
            r["user_id"], r["band"], r["valid_from"], r["valid_to"], r["n_days"]
        ) in dim_set
