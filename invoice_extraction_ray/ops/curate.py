"""Corpus-curation operators for training-data preparation.

The reference pipeline curates per-document extractions one record at a time
(reference ``main.py`` loop; ``error_analysis.py`` summary passes); these are
the corpus-LEVEL curation steps a 100 TB training-data pipeline needs around
that extraction core:

- ``split_assign``: deterministic train/val/test assignment by a splitmix64
  hash of the stable ``doc_id`` — reproducible across runs, cluster sizes and
  partitionings, with no RNG state to coordinate.
- ``mixture_sample``: temperature-based language rebalancing (the data-mixing
  step of multilingual corpus prep): big languages are down-sampled toward
  the smallest with per-lang keep rate ``sqrt(n_min/n_lang)`` (temperature
  alpha = 0.5), applied as a deterministic per-doc hash threshold.
- ``repetition_scores``: Gopher-style repetition quality signals per document
  (duplicate-token fraction, top-bigram fraction) used to drop degenerate /
  boilerplate text before training.

All three are single-shuffle-or-less: ``split_assign`` and
``repetition_scores`` are pure per-batch maps (the trailing sort exists only
for stable presentation and is dropped by callers that stream into a sink);
``mixture_sample`` runs one tiny pre-aggregated groupby (<= |langs| rows
reach the driver) and broadcasts the resulting threshold table into a
stateless filter map.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .sketch import _hash64


def _pq(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def split_assign(
    sf_dir: str, test_pct: int = 5, val_pct: int = 5
) -> ray.data.Dataset:
    """Deterministic train/val/test split: bucket = splitmix64(doc_id) % 100;
    ``test`` below ``test_pct``, ``val`` below ``test_pct + val_pct``, else
    ``train``.  A pure map — no shuffle, no RNG, identical assignment at any
    parallelism — so a 100 TB corpus splits at read speed."""
    cut_val = test_pct + val_pct

    def assign(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = (_hash64(ids) % np.uint64(100)).astype(np.int64)
        split = np.where(
            bucket < test_pct, "test", np.where(bucket < cut_val, "val", "train")
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "bucket": pa.array(bucket, pa.int64()),
                "split": pa.array(split.tolist(), pa.string()),
            }
        )

    ds = ray.data.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id"])
    return ds.map_batches(assign, batch_format="pyarrow").sort("doc_id")


def weighted_sample(sf_dir: str, k: int = 50) -> ray.data.Dataset:
    """Deterministic weighted sampling without replacement: priority =
    splitmix64(doc_id) // max(weight, 1) with weight = n_chars, keep the k
    SMALLEST priorities (ties by doc_id).  A doc with twice the weight
    halves its priority scale, so selection probability grows with weight —
    the integer-exact, RNG-free analogue of Efraimidis-Spirakis priority
    sampling (u^(1/w) keys), chosen because integer division is
    bit-identical between numpy uint64 and DuckDB HUGEINT while float pow
    is not.  The hash is shifted right one bit before the division so the
    priority is < 2^63 even at weight 1 — it always fits int64 (Arrow and
    DuckDB BIGINT alike) with no wrap-around.  Per-batch partial top-k,
    then a global sort over <= blocks*k survivor rows — the corpus is
    never globally sorted."""

    def prio(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        w = np.maximum(
            t.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64), 1
        )
        p = ((_hash64(ids) >> np.uint64(1)) // w.astype(np.uint64)).astype(np.int64)
        out = pa.table(
            {
                "doc_id": pa.array(ids),
                "n_chars": t.column("n_chars"),
                "priority": pa.array(p),
            }
        )
        # per-block partial top-k: the global winners are a subset
        return out.sort_by(
            [("priority", "ascending"), ("doc_id", "ascending")]
        ).slice(0, k)

    ds = ray.data.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "n_chars"])
    return (
        ds.map_batches(prio, batch_format="pyarrow")
        .sort(["priority", "doc_id"])
        .limit(k)
    )


def source_cap(sf_dir: str, cap: int = 20, n_shards: int = 64) -> ray.data.Dataset:
    """Per-source document cap — the domain-cap step of C4/RefinedWeb-style
    web curation: keep at most ``cap`` docs per source, selected by the
    deterministic priority splitmix64(doc_id) >> 1 (smallest first, ties by
    doc_id), so the survivors are a reproducible pseudo-random sample of
    each over-represented source at any parallelism.

    Scale shape: a per-batch partial combiner first reduces every block to
    <= cap rows per (block, source) — valid because the global per-source
    winners are a subset of each block's per-source winners — then sources
    are co-partitioned by a crc32 shard of the source string (coarse:
    ``n_shards`` groups total, never one group per source, per the
    ~1ms/group map_groups cost) and the same vectorized run-rank kernel
    finishes each shard.  Only <= cap rows per distinct source ever
    shuffle; the corpus is never globally sorted (the trailing sort is
    presentation-only over the capped survivor set)."""
    import zlib

    def keep_top(t: pa.Table) -> pa.Table:
        t = t.sort_by(
            [
                ("source", "ascending"),
                ("priority", "ascending"),
                ("doc_id", "ascending"),
            ]
        )
        src = t.column("source").combine_chunks()
        n = t.num_rows
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = ~pc.equal(src.slice(1), src.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
        starts = np.flatnonzero(new)
        run_id = np.cumsum(new) - 1
        rank = np.arange(n, dtype=np.int64) - starts[run_id]
        return t.filter(pa.array(rank < cap))

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        p = (_hash64(ids) >> np.uint64(1)).astype(np.int64)
        src = t.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        d = src.dictionary_encode()
        shard_of = np.fromiter(
            (zlib.crc32(v.encode()) % n_shards for v in d.dictionary.to_pylist()),
            dtype=np.int32,
            count=len(d.dictionary),
        )
        out = pa.table(
            {
                "doc_id": pa.array(ids),
                "source": src,
                "priority": pa.array(p),
                "sshard": pa.array(
                    shard_of[d.indices.to_numpy(zero_copy_only=False)], pa.int32()
                ),
            }
        )
        return keep_top(out)

    from ._util import absorb_empty_blocks

    ds = ray.data.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "source"])
    # partials are <= cap rows per (block, source): coalesce the skinny
    # blocks before the shuffle so the groupby pays per-row, not per-task
    capped = (
        absorb_empty_blocks(ds.map_batches(partial, batch_format="pyarrow"))
        .groupby("sshard")
        .map_groups(
            lambda t: keep_top(t).drop_columns(["sshard"]), batch_format="pyarrow"
        )
    )
    return capped.sort(["source", "priority", "doc_id"])


_MIX_DENOM = 1 << 30  # hash-threshold granularity for mixture sampling


def mixture_sample(sf_dir: str) -> ray.data.Dataset:
    """Temperature-based language rebalancing (alpha = 0.5): keep each doc of
    language L with probability ``sqrt(n_min / n_L)`` where ``n_min`` is the
    smallest language's count — the standard multilingual mixing step that
    tempers head languages without touching the tail.

    Shape: one pre-aggregated counting pass (per-batch partial counts; only
    |langs| rows reach the driver), then the tiny threshold table rides the
    task closure into a stateless vectorized filter map.  The keep decision
    is a deterministic splitmix64 threshold on doc_id — reproducible at any
    parallelism, no RNG.  sqrt and the one division are IEEE-exact, so the
    DuckDB oracle reproduces the thresholds bit-for-bit."""
    ds = ray.data.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "lang"])

    def partial_counts(t: pa.Table) -> pa.Table:
        return t.group_by("lang").aggregate([([], "count_all")])

    counts = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("lang")
        .sum("count_all")
        .take_all()
    )  # <= |langs| rows ever reach the driver
    n_by_lang = {r["lang"]: int(r["sum(count_all)"]) for r in counts}
    if not n_by_lang:  # empty corpus -> empty result
        return ds
    n_min = min(n_by_lang.values())
    thresh = {
        lang: math.floor(math.sqrt(n_min / n) * _MIX_DENOM + 0.5)
        for lang, n in n_by_lang.items()
    }

    def keep(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        langs = t.column("lang").to_pylist()
        h = (_hash64(ids) % np.uint64(_MIX_DENOM)).astype(np.int64)
        th = np.fromiter((thresh[l] for l in langs), dtype=np.int64, count=len(langs))
        return t.filter(pa.array(h < th))

    return ds.map_batches(keep, batch_format="pyarrow").sort("doc_id")


def repetition_scores(source) -> ray.data.Dataset:
    """Gopher-style per-document repetition signals over whitespace tokens:

    - ``dup_token_frac_e6``: fraction of tokens whose token TYPE occurs more
      than once in the doc (1e-6 fixed point — float round-trips differ
      between engines, integers don't).
    - ``top_bigram_frac_e6``: occurrences of the most frequent adjacent
      bigram over (n_tokens - 1).

    Pure per-batch map + presentation sort; token counting is per-doc local
    (a Counter over the doc's own tokens — no corpus state), so the stage
    scales linearly with bytes read."""
    from ._util import as_docs_dataset

    if isinstance(source, str):
        docs = ray.data.read_parquet(
            _pq(source, "documents"), columns=["doc_id", "text"]
        )
    else:
        docs = as_docs_dataset(source)

    def score(t: pa.Table) -> pa.Table:
        # null-text docs are SKIPPED, matching the SQL oracle (unnest of a
        # NULL string_split emits no rows, so such docs never reach the
        # output); empty strings still score (one empty token, like SQL)
        t = t.filter(pc.is_valid(t.column("text")))
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        n_toks, dup_e6, big_e6 = [], [], []
        for text in texts:
            toks = text.split(" ")
            n = len(toks)
            c = Counter(toks)
            dup = sum(v for v in c.values() if v > 1)
            bg = Counter(zip(toks, toks[1:]))
            top = max(bg.values()) if bg else 0
            n_toks.append(n)
            dup_e6.append(math.floor(1_000_000.0 * dup / n + 0.5))
            big_e6.append(math.floor(1_000_000.0 * top / max(n - 1, 1) + 0.5))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(n_toks, pa.int64()),
                "dup_token_frac_e6": pa.array(dup_e6, pa.int64()),
                "top_bigram_frac_e6": pa.array(big_e6, pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow").sort("doc_id")


def boilerplate_scrub(source, min_df: int = 30) -> ray.data.Dataset:
    """Corpus-level boilerplate line removal (the C4 / RefinedWeb
    "deduplicate lines across documents" step): a line occurring in at least
    ``min_df`` turns is boilerplate — greetings, sign-offs, table headers,
    code fences — and is stripped from EVERY turn.  Blank lines (trim of
    `` \\t\\r`` empty) neither count toward df nor get dropped, so document
    structure survives.

    Shape: two streaming passes over the corpus plus ONE tiny shuffle.
    Pass 1 pre-aggregates per-batch line→document-frequency partials (a line
    counts once per turn), a groupby over DISTINCT LINES (not corpus rows)
    sums them, and only the hot lines come back to the driver for a
    ``ray.put`` broadcast — the hot set is the high-df line vocabulary,
    inherently small (479 lines at sf0.01), not corpus-sized.  Pass 2 is a
    stateless task map that drops hot lines and reassembles the text.  Both
    passes are fully Arrow-vectorized: split_pattern → list_flatten /
    list_parent_indices, per-batch distinct + count via Arrow group_by,
    hot-set membership via one hashed ``is_in`` over the flattened lines,
    reassembly via offset surgery + ``binary_join`` — zero per-row Python.

    Returns (conv_id, turn_idx, clean_text, n_dropped); null-text turns are
    excluded (no content to scrub).  Reference analogue: the per-document
    boilerplate strip (reference ``ocr.py`` region filtering) generalized to
    corpus-level evidence."""
    import pyarrow.compute as pc

    from ..pipelines.extract import to_dataset

    ds = to_dataset(source, columns=["conv_id", "turn_idx", "text"])

    def _flat_lines(t: pa.Table):
        """(filtered table, list<string> lines, flat lines, parent indices)."""
        t = t.filter(pc.is_valid(t.column("text")))
        lines = pc.split_pattern(t.column("text"), "\n").combine_chunks()
        flat = pc.list_flatten(lines)
        parent = pc.list_parent_indices(lines)
        return t, lines, flat, parent

    def _line_shard(col: pa.Array, mask: int = 255) -> pa.Array:
        """Vectorized full-content shard for line strings: splitmix64 over
        (byte sum, byte square-sum, length) computed with two
        ``np.add.reduceat`` passes straight off the Arrow buffers — NO
        per-line Python (the crc32 loop this replaces was 60%+ of the
        census pass) and ~2x faster than that loop.  The triple is
        permutation-invariant (anagram lines collide), which only affects
        LOAD BALANCE, never correctness — any pure content function keeps
        every copy of a line in one shard, which is all the downstream
        per-shard exact sum needs; measured spread on the real corpus is
        indistinguishable from crc32 (max/median 1.12 vs 1.12 over 256
        shards), because natural-text anagram families are tiny.  A
        prefix/suffix-word hash was tried first and skewed 4x on templated
        boilerplate — hence full content."""
        n = len(col)
        if n == 0:
            return pa.array([], pa.int32())
        off_dt = np.int64 if pa.types.is_large_string(col.type) else np.int32
        off = np.frombuffer(
            col.buffers()[1],
            dtype=off_dt,
            count=n + 1,
            offset=col.offset * off_dt().itemsize,
        ).astype(np.int64)
        data = np.frombuffer(col.buffers()[2], dtype=np.uint8)[off[0] : off[-1]]
        off = off - off[0]
        lens = off[1:] - off[:-1]
        h0 = np.zeros(n, dtype=np.uint64)
        nz = lens > 0  # blank lines are pre-filtered, but stay safe
        if nz.any():
            du = data.astype(np.uint64)
            starts = off[:-1][nz]
            s1 = np.add.reduceat(du, starts)
            s2 = np.add.reduceat(du * du, starts)
            h0[nz] = s1 * np.uint64(0x100000001B3) ^ s2
        from .sketch import _hash64

        h = _hash64((h0 ^ (lens.astype(np.uint64) << np.uint64(40))).astype(np.int64))
        return pa.array((h & np.uint64(mask)).astype(np.int32))

    def partial_df(t: pa.Table) -> pa.Table:
        _, _, flat, parent = _flat_lines(t)
        keep = pc.not_equal(pc.utf8_trim(flat, " \t\r"), "")
        flat = flat.filter(keep)
        parent = parent.filter(keep)
        if len(flat) == 0:
            return pa.table(
                {
                    "shard": pa.array([], pa.int32()),
                    "line": pa.array([], pa.string()),
                    "partial": pa.array([], pa.int64()),
                }
            )
        # per-batch df census through the dictionary: distinct (row, line)
        # pairs via ONE np.unique on a packed int64 (batch rows < 2^31,
        # per-batch distinct lines < 2^32), then a bincount per line —
        # measured ~2x faster than the two Arrow group_bys it replaces
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        enc = flat.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        par = parent.to_numpy(zero_copy_only=False).astype(np.int64)
        upair = np.unique((par << 32) | idx)
        df = np.bincount(
            (upair & 0xFFFFFFFF).astype(np.int64), minlength=len(enc.dictionary)
        ).astype(np.int64)
        lines = enc.dictionary
        # coarse int shard key: Ray's sort-based groupby pays for sorting
        # the KEY column — 256 int32 shards sort far faster than 600k
        # distinct line strings; the exact per-line sum happens per shard
        return pa.table(
            {
                "shard": _line_shard(lines),
                "line": lines,
                "partial": pa.array(df, pa.int64()),
            }
        )

    def hot_in_shard(g: pa.Table) -> pa.Table:
        s = g.group_by("line").aggregate([("partial", "sum")])
        return s.filter(
            pc.greater_equal(s.column("partial_sum"), min_df)
        ).select(["line"])

    hot_rows = (
        ds.map_batches(partial_df, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(hot_in_shard, batch_format="pyarrow")
        .take_all()
    )
    hot_ref = ray.put(pa.array([r["line"] for r in hot_rows], pa.string()))

    def scrub(t: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)  # plasma zero-copy; one copy per node
        t, lines, flat, parent = _flat_lines(t)
        n = t.num_rows
        drop = pc.is_in(flat, value_set=hot).to_numpy(zero_copy_only=False)
        keep = ~drop
        par = parent.to_numpy(zero_copy_only=False)
        kept_per_row = np.bincount(par[keep], minlength=n).astype(np.int64)
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum(kept_per_row, out=offsets[1:])
        kept_flat = pc.cast(flat.filter(pa.array(keep)), pa.string())
        if isinstance(kept_flat, pa.ChunkedArray):
            kept_flat = kept_flat.combine_chunks()
        kept_lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), kept_flat
        )
        clean = pc.binary_join(kept_lists, pa.scalar("\n", pa.string()))
        total_per_row = pc.list_value_length(lines).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "turn_idx": t.column("turn_idx"),
                "clean_text": pc.cast(clean, pa.string()),
                "n_dropped": pa.array(total_per_row - kept_per_row, pa.int64()),
            }
        )

    from ._util import absorb_empty_blocks

    # coalesce before the presentation sort: its cost is per-TASK dispatch
    # (90-block input -> 224 sort tasks for ~1.2s of remote work); a few
    # right-sized blocks cut that to single digits
    return absorb_empty_blocks(
        ds.map_batches(scrub, batch_format="pyarrow"), batch_size=131072
    ).sort(["conv_id", "turn_idx"])


def redact_names(source, names: list[str], token: str = "[NAME]") -> ray.data.Dataset:
    """Broadcast-dictionary PII redaction: every occurrence of a known name
    is replaced with ``token``, with a per-turn redaction count.  The
    dictionary is master data riding the task closure (the S7 broadcast
    pattern applied to scrubbing); at a million-entry dictionary this becomes
    a ``ray.put``-broadcast Aho-Corasick automaton in the same stage shape —
    the per-name Arrow kernel pass below is the small-dictionary fast path.

    Fully vectorized: one ``count_substring`` + one literal
    ``replace_substring`` Arrow kernel pass per dictionary entry, zero
    per-row Python.  Counts are taken against the ORIGINAL text (entries
    never overlap each other, so sequential replacement cannot create or
    destroy later matches).  Null-text turns are excluded."""

    from ..pipelines.extract import to_dataset

    ds = to_dataset(source, columns=["conv_id", "turn_idx", "text"])

    def scrub(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.is_valid(t.column("text")))
        orig = t.column("text")
        txt = orig
        counts = np.zeros(t.num_rows, np.int64)
        for nm in names:
            counts += pc.count_substring(orig, nm).to_numpy(zero_copy_only=False)
            txt = pc.replace_substring(txt, nm, token)
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "turn_idx": t.column("turn_idx"),
                "clean_text": txt,
                "n_redactions": pa.array(counts, pa.int64()),
            }
        )

    from ._util import absorb_empty_blocks

    # same per-task-dispatch cut as boilerplate_scrub's presentation sort
    return absorb_empty_blocks(
        ds.map_batches(scrub, batch_format="pyarrow"), batch_size=131072
    ).sort(["conv_id", "turn_idx"])


DSIR_BUCKETS = 256  # hashed-feature space (Xie et al. 2023 use hashed n-grams)


def dsir_logweights(sf_dir: str, target_lang: str = "en") -> ray.data.Dataset:
    """DSIR importance weights (Data Selection via Importance Resampling,
    Xie et al. 2023), integer-quantized: per document, the log importance
    ratio of a hashed-unigram bag-of-words model between the TARGET
    distribution (docs with ``lang == target_lang``) and the RAW corpus.
    log2 p(f) is quantized to ``bitlen(count+1) - bitlen(N+1)`` (floor-log2
    with add-one smoothing so unseen target features stay finite), making
    every weight an exact integer the DuckDB oracle reproduces via
    length(bin(x)).  Emits (doc_id, n_tokens, logw_q2); resample by keeping
    the top-weight docs (or hash-thresholding on logw_q2).

    One pass builds BOTH feature-count vectors as per-batch dense partials
    (2 x 256 int64 — the CMS trick), merged by elementwise sum; the
    resulting 256-entry lambda table broadcasts into a stateless scoring
    map.  Feature hashing is crc32(token) % 256, identical in the oracle."""
    import zlib

    import pyarrow.compute as pc

    ds = ray.data.read_parquet(
        _pq(sf_dir, "documents"), columns=["doc_id", "text", "lang"]
    )

    def partial(t: pa.Table) -> pa.Table:
        raw = np.zeros(DSIR_BUCKETS, dtype=np.int64)
        tgt = np.zeros(DSIR_BUCKETS, dtype=np.int64)
        for s, lg in zip(
            t.column("text").to_pylist(), t.column("lang").to_pylist()
        ):
            for w in (s or "").split():
                f = zlib.crc32(w.encode()) % DSIR_BUCKETS
                raw[f] += 1
                if lg == target_lang:
                    tgt[f] += 1
        return pa.table(
            {
                "k": pa.array([0], pa.int32()),
                "raw": pa.array([raw.tolist()], pa.list_(pa.int64())),
                "tgt": pa.array([tgt.tolist()], pa.list_(pa.int64())),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "k": pa.array([], pa.int32()),
                    "raw": pa.array([], pa.list_(pa.int64())),
                    "tgt": pa.array([], pa.list_(pa.int64())),
                }
            )
        raw = np.asarray(t.column("raw").to_pylist(), dtype=np.int64).sum(axis=0)
        tgt = np.asarray(t.column("tgt").to_pylist(), dtype=np.int64).sum(axis=0)
        return pa.table(
            {
                "k": pa.array([0], pa.int32()),
                "raw": pa.array([raw.tolist()], pa.list_(pa.int64())),
                "tgt": pa.array([tgt.tolist()], pa.list_(pa.int64())),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .map_groups(merge, batch_format="pyarrow")
        .take_all()
    )
    if not rows:  # empty corpus -> empty weights
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "logw_q2": pa.array([], pa.int64()),
                }
            )
        )
    raw = np.asarray(rows[0]["raw"], dtype=np.int64)
    tgt = np.asarray(rows[0]["tgt"], dtype=np.int64)

    def _bitlen(x: np.ndarray) -> np.ndarray:
        return np.frexp(x.astype(np.float64))[1].astype(np.int64)

    n_raw, n_tgt = int(raw.sum()), int(tgt.sum())
    lam = (
        _bitlen(tgt + 1) - int(np.frexp(np.float64(n_tgt + 1))[1])
    ) - (_bitlen(raw + 1) - int(np.frexp(np.float64(n_raw + 1))[1]))
    lam_ref = ray.put(lam.astype(np.int64))

    _OUT = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()), ("logw_q2", pa.int64())]
    )

    def score(t: pa.Table) -> pa.Table:
        lam_b = ray.get(lam_ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        feats: list[int] = []
        lens = np.empty(t.num_rows, dtype=np.int64)
        for i, s in enumerate(t.column("text").to_pylist()):
            toks = (s or "").split()
            lens[i] = len(toks)
            feats.extend(zlib.crc32(w.encode()) % DSIR_BUCKETS for w in toks)
        keep = lens > 0
        if not keep.any():
            return _OUT.empty_table()
        vals = lam_b[np.asarray(feats, dtype=np.int64)]
        sums = np.add.reduceat(vals, np.r_[0, np.cumsum(lens[keep])[:-1]]).astype(
            np.int64
        )
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "n_tokens": pa.array(lens[keep]),
                "logw_q2": pa.array(sums),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


# gopher_rules thresholds (integer fixed-point; see docstring)
GOPHER_TOK_MIN, GOPHER_TOK_MAX = 30, 90
GOPHER_MWL10_MIN, GOPHER_MWL10_MAX = 40, 50  # mean word length x10
GOPHER_TTR100_MIN = 40  # type-token ratio x100
GOPHER_STOP_MIN = 2  # min stopword occurrences


def gopher_rules(sf_dir: str) -> ray.data.Dataset:
    """Gopher/RefinedWeb-style composite quality gate (Rae et al. 2021 §A1.1
    analogue, thresholds re-fit to this corpus's distributions): per-doc
    keep/drop with a REASON BITMASK so downstream audits can attribute every
    drop —

      0x1  token count outside [30, 90]
      0x2  mean word length outside [4.0, 5.0]  (10*n_chars vs n_tok bounds,
           cross-multiplied so no division ever happens)
      0x4  type-token ratio < 0.40              (n_types*100 < 40*n_tok)
      0x8  fewer than 2 stopword occurrences    (the repo's public en list)

    Pure per-batch map, no shuffle: token stats come from ``_ws_tokens``'
    flat+parent layout (per-doc counts via exact int bincounts; distinct
    types via one np.unique over parent*V+code keys), all comparisons in
    integers so the DuckDB mirror matches bit-for-bit."""
    from ._util import int_bincount
    from .text import _STOPWORDS_ARR, _ws_tokens

    ds = ray.data.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])

    def gate(t: pa.Table) -> pa.Table:
        n_docs = t.num_rows
        flat, parent = _ws_tokens(t.column("text"))
        n_tok = int_bincount(parent, np.ones(len(parent), np.int64), n_docs)
        n_chars = int_bincount(
            parent,
            pc.utf8_length(flat).to_numpy(zero_copy_only=False),
            n_docs,
        )
        d = flat.dictionary_encode()
        code = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = len(d.dictionary)
        uniq_keys = np.unique(parent * max(v, 1) + code) if len(code) else code
        n_types = int_bincount(
            uniq_keys // max(v, 1), np.ones(len(uniq_keys), np.int64), n_docs
        )
        stop_mask = pc.is_in(flat, value_set=_STOPWORDS_ARR).to_numpy(
            zero_copy_only=False
        )
        stop_hits = int_bincount(parent, stop_mask.astype(np.int64), n_docs)

        reasons = np.zeros(n_docs, dtype=np.int64)
        reasons += np.where((n_tok < GOPHER_TOK_MIN) | (n_tok > GOPHER_TOK_MAX), 1, 0)
        mwl_ok = (GOPHER_MWL10_MIN * n_tok <= 10 * n_chars) & (
            10 * n_chars <= GOPHER_MWL10_MAX * n_tok
        )
        reasons += np.where(mwl_ok, 0, 2)
        reasons += np.where(n_types * 100 >= GOPHER_TTR100_MIN * n_tok, 0, 4)
        reasons += np.where(stop_hits >= GOPHER_STOP_MIN, 0, 8)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "reasons": pa.array(reasons, pa.int64()),
                "keep": pa.array((reasons == 0).astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(gate, batch_format="pyarrow")


def text_normalize(sf_dir: str) -> ray.data.Dataset:
    """Canonical text normalization — lowercase + whitespace collapse +
    trim: the first stage of every dedup/tokenize pipeline, exposed as a
    standalone stateless map (dedup_keep_best applies the same transform
    inline).  Pure Arrow kernels per batch; embarrassingly parallel, no
    shuffle, no state."""
    ds = ray.data.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])

    def norm(t: pa.Table) -> pa.Table:
        x = pc.fill_null(t.column("text"), "")
        x = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(pc.utf8_lower(x), r"\s+", " ")
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "norm_text": x,
                "n_chars": pc.cast(pc.utf8_length(x), pa.int64()),
            }
        )

    return ds.map_batches(norm, batch_format="pyarrow")


def token_budget_mix(
    sf_dir: str,
    budget: int = 600,
    n_shards: int = 64,
    override_num_blocks: int | None = None,
) -> ray.data.Dataset:
    """Per-source TOKEN-budget enforcement — the pretraining-mix step that
    ``source_cap`` (doc-count caps) can't express: each source contributes
    documents in deterministic splitmix64(doc_id) priority order until its
    cumulative whitespace-token count reaches ``budget``; the kept set is
    the prefix whose INCLUSIVE running sum stays <= budget (SQL QUALIFY
    window mirror), reproducible at any parallelism, no RNG.

    Scale shape: a per-batch prefilter drops every doc whose within-batch
    per-source running sum already exceeds the budget — valid because the
    global prefix sum at a doc is >= any subset's — so each block ships
    roughly one budget's worth of rows per source it touches, never the
    corpus; the crc32 source-shard groupby (coarse, never per-source)
    finishes the exact global prefix with one lexsort + segment cumsum."""
    import zlib

    import pyarrow.compute as pc

    from ._util import absorb_empty_blocks

    def keep_prefix(t: pa.Table) -> pa.Table:
        t = t.sort_by(
            [
                ("source", "ascending"),
                ("priority", "ascending"),
                ("doc_id", "ascending"),
            ]
        )
        src = t.column("source").combine_chunks()
        n = t.num_rows
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = ~pc.equal(src.slice(1), src.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
        toks = t.column("n_tokens").to_numpy(zero_copy_only=False)
        cum = np.cumsum(toks)
        base = np.repeat(cum[np.flatnonzero(new)] - toks[np.flatnonzero(new)],
                         np.diff(np.append(np.flatnonzero(new), n)))
        cum = cum - base  # inclusive per-source running sum
        t = t.set_column(
            t.schema.get_field_index("cum_tokens"),
            "cum_tokens",
            pa.array(cum, pa.int64()),
        )
        return t.filter(pa.array(cum <= budget))

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        p = (_hash64(ids) >> np.uint64(1)).astype(np.int64)
        toks = pc.cast(
            pc.count_substring_regex(pc.fill_null(t.column("text"), ""), r"\S+"),
            pa.int64(),
        )
        src = t.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        d = src.dictionary_encode()
        shard_of = np.fromiter(
            (zlib.crc32(v.encode()) % n_shards for v in d.dictionary.to_pylist()),
            dtype=np.int32,
            count=len(d.dictionary),
        )
        out = pa.table(
            {
                "doc_id": pa.array(ids),
                "source": src,
                "priority": pa.array(p),
                "n_tokens": toks,
                "cum_tokens": pa.array(np.zeros(len(ids), np.int64)),
                "sshard": pa.array(
                    shard_of[d.indices.to_numpy(zero_copy_only=False)], pa.int32()
                ),
            }
        ).sort_by(
            [
                ("source", "ascending"),
                ("priority", "ascending"),
                ("doc_id", "ascending"),
            ]
        )
        # prefix-sum prefilter with a BOUNDARY SENTINEL: docs whose
        # within-batch per-source running sum exceeds the budget cannot be
        # in the global prefix (batch sum <= global sum), but their tokens
        # still gate later docs from OTHER batches — so the first
        # over-budget doc of each (batch, source) run is kept as a sentinel
        # carrying weight budget+1.  At the shard merge, every kept doc
        # provably precedes all sentinels of its source (else its cumsum
        # would exceed the budget), so kept docs see the EXACT global
        # prefix sum, and sentinels can never pass the filter themselves.
        n = out.num_rows
        srt = out.column("source").combine_chunks()
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = ~pc.equal(srt.slice(1), srt.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
        tk = out.column("n_tokens").to_numpy(zero_copy_only=False)
        cum = np.cumsum(tk)
        starts = np.flatnonzero(new)
        base = np.repeat(cum[starts] - tk[starts], np.diff(np.append(starts, n)))
        cum = cum - base
        keep = cum <= budget
        prev_ok = np.ones(n, dtype=bool)
        prev_ok[1:] = keep[:-1]
        sent_idx = np.flatnonzero(~keep & (new | prev_ok))
        kept = out.filter(pa.array(keep))
        if len(sent_idx):
            sent = out.take(pa.array(sent_idx))
            sent = sent.set_column(
                sent.schema.get_field_index("n_tokens"),
                "n_tokens",
                pa.array(np.full(len(sent_idx), budget + 1, np.int64)),
            )
            kept = pa.concat_tables([kept, sent])
        return kept

    ds = ray.data.read_parquet(
        _pq(sf_dir, "documents"),
        columns=["doc_id", "source", "text"],
        override_num_blocks=override_num_blocks,
    )
    kept = (
        absorb_empty_blocks(ds.map_batches(partial, batch_format="pyarrow"))
        .groupby("sshard")
        .map_groups(
            lambda t: keep_prefix(t).drop_columns(["sshard"]), batch_format="pyarrow"
        )
        .map_batches(
            lambda t: t.select(["doc_id", "source", "n_tokens", "cum_tokens"]),
            batch_format="pyarrow",
        )
    )
    return kept.sort(["source", "cum_tokens", "doc_id"])


from ..config import KANON_MIN_GROUP  # noqa: E402  (oracle-shared)


def kanon_suppress(sf_dir: str, k: int = KANON_MIN_GROUP) -> ray.data.Dataset:
    """Group-privacy (k-anonymity) suppression: keep only documents whose
    (lang, source) quasi-identifier group has at least ``k`` members
    corpus-wide — the release-safety gate a training-data pipeline runs
    before publishing per-group slices (a group smaller than k
    re-identifies its members).

    Scale shape: pass 1 pre-combines per-batch (lang, source) counts —
    the key space is ENUM-bounded (|langs| x |sources|), so the groupby
    sees a handful of rows per block and the surviving-group set is
    broadcast-safe at ANY corpus size (unlike the corpus-scaled dimension
    tables, which need the shard fallback); pass 2 stream-filters with one
    vectorized hashed ``is_in`` per batch.  Output: (doc_id, lang, source,
    group_n), kept rows only."""
    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        _pq(sf_dir, "documents"), columns=["doc_id", "lang", "source"]
    )

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["lang", "source"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "lang": g.column("lang"),
                "source": g.column("source"),
                "n": pc.cast(g.column("count_all"), pa.int64()),
            }
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("n", alias_name="n"))
        .take_all()  # enum-bounded: |langs| x |sources| rows
    )
    keep = {(r["lang"], r["source"]): int(r["n"]) for r in counts if r["n"] >= k}
    keys = pa.array([f"{l}\x1f{s}" for (l, s) in keep], pa.string())
    ns = np.array([keep[(l, s)] for (l, s) in keep], dtype=np.int64)
    ref = ray.put((keys, ns))

    def gate(t: pa.Table) -> pa.Table:
        gkeys, gn = ray.get(ref)  # plasma zero-copy per batch
        key = pc.binary_join_element_wise(
            pc.cast(t.column("lang"), pa.string()),
            pc.cast(t.column("source"), pa.string()),
            "\x1f",
        )
        idx = pc.index_in(key, value_set=gkeys)
        hit = pc.is_valid(idx)
        t = t.filter(hit)
        pos = idx.filter(hit).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "lang": t.column("lang"),
                "source": t.column("source"),
                "group_n": pa.array(gn[pos], pa.int64()),
            }
        )

    return ds.map_batches(gate, batch_format="pyarrow")


def split_leakage_audit(
    sf_dir: str, test_pct: int = 5, val_pct: int = 5, n_shards: int = 64
) -> ray.data.Dataset:
    """Train/val/test LEAKAGE audit: how many exact-content groups straddle
    a split boundary — the duplicate-driven eval-contamination check that
    motivates corpus dedup (a doc byte-identical to a training doc sitting
    in val/test silently inflates eval).  Composes :func:`split_assign`'s
    splitmix64 bucket with exact_dedup's sha256-16-byte content key; emits
    exactly three rows, one per unordered split pair, with the count of
    digest groups present on BOTH sides (0 when clean).

    Scale shape: one documents scan emits slim (digest-shard, h1, h2,
    split-bit) rows — texts never shuffle; equal digests co-locate in the
    single digest-shard groupby, each shard ORs its groups' split bitmasks
    vectorized and emits three partial counts; a tiny pair groupby
    finishes.  Nothing digest- or corpus-sized reaches the driver."""
    import hashlib

    from ._util import absorb_empty_blocks, int_segment_sum
    from ._util import drop_if_present as _dropg

    cut_val = test_pct + val_pct

    _SLIM = pa.schema(
        [
            ("dshard", pa.int32()),
            ("h1", pa.int64()),
            ("h2", pa.int64()),
            ("sbit", pa.int64()),
        ]
    )
    _PART = pa.schema([("pair", pa.int32()), ("n", pa.int64())])
    _OUT = pa.schema(
        [
            ("split_a", pa.string()),
            ("split_b", pa.string()),
            ("n_groups", pa.int64()),
        ]
    )
    _PAIRS = [("train", "val"), ("train", "test"), ("val", "test")]
    # split bits: train=1, val=2, test=4; pair masks in _PAIRS order
    _MASKS = [1 | 2, 1 | 4, 2 | 4]

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _SLIM.empty_table()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = (_hash64(ids) % np.uint64(100)).astype(np.int64)
        sbit = np.where(bucket < test_pct, 4, np.where(bucket < cut_val, 2, 1))
        digests = b"".join(
            hashlib.sha256((s or "").encode()).digest()[:16]
            for s in t.column("text").to_pylist()
        )
        h = np.frombuffer(digests, dtype="<i8").reshape(-1, 2)
        return pa.table(
            {
                "dshard": pa.array(
                    ((h[:, 0] & 0x7FFFFFFF) % n_shards).astype(np.int32)
                ),
                "h1": pa.array(h[:, 0], pa.int64()),
                "h2": pa.array(h[:, 1], pa.int64()),
                "sbit": pa.array(sbit.astype(np.int64), pa.int64()),
            },
            schema=_SLIM,
        )

    def shard_counts(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _PART.empty_table()
        h1 = g.column("h1").to_numpy(zero_copy_only=False)
        h2 = g.column("h2").to_numpy(zero_copy_only=False)
        sb = g.column("sbit").to_numpy(zero_copy_only=False)
        order = np.lexsort((h2, h1))
        h1, h2, sb = h1[order], h2[order], sb[order]
        new = np.ones(len(h1), dtype=bool)
        new[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        starts = np.flatnonzero(new)
        # OR of split bits per digest group == max of per-bit segment max;
        # bits are disjoint powers of two, so segment max of each masked
        # bit reconstructs the OR exactly
        masks = np.zeros(len(starts), dtype=np.int64)
        for bit in (1, 2, 4):
            present = int_segment_sum((sb == bit).astype(np.int64), starts) > 0
            masks |= np.where(present, bit, 0)
        ns = [
            int(((masks & m) == m).sum()) for m in _MASKS
        ]
        return pa.table(
            {
                "pair": pa.array(np.arange(3, dtype=np.int32)),
                "n": pa.array(np.array(ns, dtype=np.int64), pa.int64()),
            },
            schema=_PART,
        )

    def finish(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        pair = int(g.column("pair")[0].as_py())
        total = int(
            np.sum(g.column("n").to_numpy(zero_copy_only=False), dtype=np.int64)
        )
        a, b = _PAIRS[pair]
        return pa.table(
            {
                "split_a": pa.array([a], pa.string()),
                "split_b": pa.array([b], pa.string()),
                "n_groups": pa.array([total], pa.int64()),
            },
            schema=_OUT,
        )

    ds = ray.data.read_parquet(
        _pq(sf_dir, "documents"), columns=["doc_id", "text"]
    ).map_batches(slim, batch_format="pyarrow")
    parts = (
        absorb_empty_blocks(ds, batch_size=131072)
        .groupby("dshard")
        .map_groups(
            lambda g: shard_counts(_dropg(g, ["dshard"])), batch_format="pyarrow"
        )
    )
    return parts.groupby("pair").map_groups(finish, batch_format="pyarrow")
