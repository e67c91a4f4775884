"""Deduplication operators: exact, MinHash+LSH, SimHash, embedding-cosine.

Exact dedup lives in ops.relational (hash-partition + per-group first).  The
near-dup family here follows the ray_guide sketch pattern: per-batch sketching
(vectorized numpy), explode to (band, band_hash, doc_id) rows, shuffle ONLY
those tiny sketch rows (never the documents), group by band bucket, emit
candidate pairs, then verify with true Jaccard.

Scale notes: the shuffled payload is O(docs x bands x 8 bytes); verification
joins the tiny candidate-pair set back against the corpus on doc_id with
hash-partitioned ``Dataset.join`` (once per pair side) and computes exact
Jaccard per joined batch — nothing is materialized on the driver and no task
holds a corpus copy, so the same plan runs at 100 TB.
"""

from __future__ import annotations

from ._util import embedding_matrix, int_bincount, int_segment_sum

import zlib

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ._util import drop_if_present as _dropg

# deterministic universal-hash parameters for minhash permutations
_MH_PRIME = (1 << 61) - 1
N_PERM = 64
N_BANDS = 16  # 16 bands x 4 rows
ROWS_PER_BAND = N_PERM // N_BANDS
_rng = np.random.RandomState(1234567)  # fixed seed: parameters, not data
_MH_A = _rng.randint(1, _MH_PRIME, size=N_PERM, dtype=np.int64)
_MH_B = _rng.randint(0, _MH_PRIME, size=N_PERM, dtype=np.int64)

SHINGLE_W = 3  # word 3-grams


def _pq(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def shingle_hashes(text: str) -> np.ndarray:
    toks = (text or "").split()
    if len(toks) < SHINGLE_W:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i : i + SHINGLE_W]) for i in range(len(toks) - SHINGLE_W + 1)]
    if not grams:
        return np.empty(0, dtype=np.int64)
    return np.unique(
        np.array([zlib.crc32(g.encode()) for g in grams], dtype=np.int64)
    )


def minhash_signature(text: str) -> np.ndarray:
    h = shingle_hashes(text)
    if h.size == 0:
        return np.full(N_PERM, _MH_PRIME - 1, dtype=np.int64)
    # (a*x + b) mod p for all perms x all shingles, min per perm — vectorized
    vals = (np.multiply.outer(_MH_A, h) + _MH_B[:, None]) % _MH_PRIME
    return vals.min(axis=1)


def jaccard(a: str, b: str) -> float:
    ha, hb = set(shingle_hashes(a).tolist()), set(shingle_hashes(b).tolist())
    if not ha and not hb:
        return 1.0
    inter = len(ha & hb)
    union = len(ha | hb)
    return inter / union if union else 0.0


def minhash_sketch_batch(t: pa.Table) -> pa.Table:
    """Stateless task map: text -> exploded (band, band_hash, doc_id) sketch
    rows (permutation parameters are module-level constants — no per-worker
    state, so no actor pool)."""
    doc_ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    out_doc, out_band, out_hash = [], [], []
    for d, s in zip(doc_ids, texts):
        sig = minhash_signature(s)
        for b in range(N_BANDS):
            chunk = sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
            bh = zlib.crc32(chunk.tobytes())
            out_doc.append(d)
            out_band.append(b)
            out_hash.append(bh)
    return pa.table(
        {
            "doc_id": pa.array(out_doc, pa.int64()),
            "band": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_hash, pa.int64()),
        }
    )


N_BUCKET_SHARDS = 256
_SEMI_FILTER_CAP = 5_000_000  # max pair-involved ids worth broadcasting (~40 MB)
# max total bytes of pair-involved TEXTS worth broadcasting for the verify
# stage: under this, two Dataset.joins (~0.75s of aggregator startup EACH,
# measured at bench scale for 256 pairs) are replaced by one ray.put of the
# filtered texts + a stateless verify map over the pair rows
_PAIR_TEXT_BROADCAST_BYTES = 128 << 20


def _expand_runs(
    did: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    max_df: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """All-pairs expansion of posting-list runs, fully vectorized: for each
    run ``did[s:e]`` (already sorted and distinct) emit every (i, j) INDEX
    pair with i < j — callers gather ``did`` (and any per-posting payload,
    e.g. the doc's gram count) through the returned indices.  Runs longer
    than ``max_df`` are dropped before expansion (document-frequency cut).
    Runs are batched by length so the expansion is a handful of
    ``triu_indices`` gathers, never a Python pair loop."""
    lens = ends - starts
    ok = lens >= 2
    if max_df is not None:
        ok &= lens <= max_df
    starts, lens = starts[ok], lens[ok]
    a_parts, b_parts = [], []
    for length in np.unique(lens):
        rs = starts[lens == length]
        rows = rs[:, None] + np.arange(length)[None, :]
        iu, ju = np.triu_indices(int(length), k=1)
        a_parts.append(rows[:, iu].ravel())
        b_parts.append(rows[:, ju].ravel())
    if not a_parts:
        empty = np.empty(0, np.int64)
        return empty, empty
    return np.concatenate(a_parts), np.concatenate(b_parts)


def _pair_partials(
    a: np.ndarray, b: np.ndarray, extra: dict[str, np.ndarray] | None = None
) -> pa.Table:
    """Collapse raw (a, b) pair rows to distinct pairs + multiplicities within
    this block and attach a deterministic pair shard — the per-batch combiner
    for the distributed pair count (only one row per distinct pair per block
    shuffles, and the global combine is a coarse single-int-key groupby,
    NOT Ray's per-row multi-key Aggregate, which costs ~100 us/row).
    ``extra`` columns are per-pair CONSTANTS (functions of a/b, e.g. the two
    docs' gram-set sizes) carried through dedup by first occurrence."""
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    new = np.ones(len(a), dtype=bool)
    new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    starts = np.flatnonzero(new)
    n = np.diff(np.append(starts, len(a)))
    a, b = a[starts], b[starts]
    with np.errstate(over="ignore"):
        h = a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + b.astype(np.uint64)
        h ^= h >> np.uint64(33)
    shard = (h & np.uint64(N_BUCKET_SHARDS - 1)).astype(np.int32)
    cols = {
        "a_id": pa.array(a, pa.int64()),
        "b_id": pa.array(b, pa.int64()),
        "n": pa.array(n.astype(np.int64)),
        "pshard": pa.array(shard),
    }
    for name, vals in (extra or {}).items():
        cols[name] = pa.array(vals[order][starts].astype(np.int64), pa.int64())
    return pa.table(cols)


def _sum_pair_counts(
    pairs: ray.data.Dataset, out_name: str, extra_names: tuple[str, ...] = ()
) -> ray.data.Dataset:
    """Global combine of ``_pair_partials`` rows: shard-grouped vectorized
    segment sums.  Output (a_id, b_id, <out_name>, *extra) with one row per
    distinct pair.  Every pair's partials land in the same pshard group, so
    the sum is exact; inside a group it's one lexsort + bincount, not
    per-row Python.  ``extra_names`` are per-pair constants (carried by
    first occurrence, same convention as ``_pair_partials``)."""
    empty_schema = pa.schema(
        [("a_id", pa.int64()), ("b_id", pa.int64()), (out_name, pa.int64())]
        + [(nm, pa.int64()) for nm in extra_names]
    )

    def reduce_shard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty_schema.empty_table()
        a = t.column("a_id").to_numpy(zero_copy_only=False)
        b = t.column("b_id").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b, n = a[order], b[order], n[order]
        new = np.ones(len(a), dtype=bool)
        new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.flatnonzero(new)
        totals = int_segment_sum(n, starts)
        cols = {
            "a_id": pa.array(a[starts], pa.int64()),
            "b_id": pa.array(b[starts], pa.int64()),
            out_name: pa.array(totals),
        }
        for nm in extra_names:
            v = t.column(nm).to_numpy(zero_copy_only=False)
            cols[nm] = pa.array(v[order][starts], pa.int64())
        return pa.table(cols)

    return pairs.groupby("pshard").map_groups(reduce_shard, batch_format="pyarrow")


def minhash_candidate_pairs(
    docs: ray.data.Dataset, max_bucket: int | None = None
) -> ray.data.Dataset:
    """LSH bucketing: docs sharing any band bucket become candidate pairs.

    Buckets are grouped by a coarse SHARD key (hash of the bucket id), not per
    bucket: `groupby.map_groups` pays ~1ms of dispatch per group, so with one
    group per (band, band_hash) the dispatch would dominate.  Each shard
    group runs a vectorized run-detection over its sorted sketch rows and
    emits pairs only for true buckets (size >= 2) — the same co-location, two
    orders of magnitude fewer group dispatches.

    ``max_bucket`` is the hot-bucket bound (the LSH twin of the ngram op's
    ``max_df``): a bucket holding K mutual near-dups emits K^2/2 candidate
    rows, but a dup CLUSTER only needs K-1 edges to stay connected — buckets
    larger than the cap are dropped before expansion (each band's full
    bucket is co-located in one shard, so the run length IS the global
    bucket size).  Default None = exact (the SQL oracle requires it); at
    real-corpus scale set a cap and let the clustering op absorb the loss.
    """
    sketches = docs.map_batches(minhash_sketch_batch, batch_format="pyarrow")

    def add_shard(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        band = t.column("band").to_numpy(zero_copy_only=False).astype(np.int64)
        bh = t.column("band_hash").to_numpy(zero_copy_only=False)
        shard = ((band * 1_000_003 + bh) % N_BUCKET_SHARDS).astype(np.int32)
        return t.append_column("shard", pa.array(shard))

    def emit_pairs(t: pa.Table) -> pa.Table:
        band = t.column("band").to_numpy(zero_copy_only=False)
        bh = t.column("band_hash").to_numpy(zero_copy_only=False)
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((did, bh, band))
        band, bh, did = band[order], bh[order], did[order]
        # run boundaries = bucket boundaries within this shard
        new_run = np.ones(len(band), dtype=bool)
        new_run[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
        # drop duplicate doc rows within a bucket (defensive; one row per
        # band per doc by construction) so runs are sorted AND distinct
        dupe = np.zeros(len(band), dtype=bool)
        dupe[1:] = ~new_run[1:] & (did[1:] == did[:-1])
        band, bh, did = band[~dupe], bh[~dupe], did[~dupe]
        new_run = np.ones(len(band), dtype=bool)
        new_run[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
        starts = np.flatnonzero(new_run)
        ends = np.append(starts[1:], len(band))
        ia, ib = _expand_runs(did, starts, ends, max_bucket)
        return _pair_partials(did[ia], did[ib])

    pairs = (
        sketches.map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(emit_pairs, batch_format="pyarrow")
    )
    # distinct pairs (a doc pair can collide in many bands) via the coarse
    # pshard combine — Ray's multi-key Aggregate costs ~100 us/row in Python
    return _sum_pair_counts(pairs, "n_bands").select_columns(["a_id", "b_id"])


def _pair_text_verify(
    pairs: ray.data.Dataset,
    docs: ray.data.Dataset,
    kernel,
    out_schema: pa.Schema,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Shared verify stage for every candidate-pair near-dup family: attach
    both docs' texts to each (a_id, b_id) candidate row and apply ``kernel``.

    ``kernel(t, a_texts, b_texts) -> pa.Table`` receives the pair table plus
    the two text lists (aligned to rows) and returns the verified output
    (already filtered, schema == ``out_schema``).

    Scale shape (hoisted verbatim from the original minhash_neardup verify):
    candidate pairs are tiny — O(colliding docs); a semi-join pre-filter
    broadcasts the distinct pair-involved doc ids (8 bytes/side, capped at
    ``_SEMI_FILTER_CAP``) and stream-filters the corpus BEFORE any join, so
    only the texts the verify needs ever move.  If the filtered texts also
    fit ``_PAIR_TEXT_BROADCAST_BYTES``, BOTH hash joins are skipped (each
    pays ~0.75 s of aggregator-actor startup regardless of size) and one
    stateless map verifies against a ray.put text table (plasma zero-copy,
    one physical copy per node).  Otherwise the pairs hash-join against the
    (filtered) corpus once per side — the 100 TB path.  ``pairs`` must be
    materialized and non-empty (callers branch on emptiness first)."""
    from ._util import absorb_empty_blocks, strip_schema_metadata

    id_chunks = [np.empty(0, np.int64)]
    n_ids = 0
    for b in pairs.select_columns(["a_id", "b_id"]).iter_batches(
        batch_format="pyarrow", batch_size=65536
    ):
        u = np.unique(
            np.concatenate(
                [
                    b.column("a_id").to_numpy(zero_copy_only=False),
                    b.column("b_id").to_numpy(zero_copy_only=False),
                ]
            )
        )
        id_chunks.append(u)
        n_ids += len(u)
        if n_ids > _SEMI_FILTER_CAP:
            break

    texts = docs.select_columns(["doc_id", "text"])
    if n_ids <= _SEMI_FILTER_CAP:
        need_ref = ray.put(pa.array(np.unique(np.concatenate(id_chunks)), pa.int64()))

        def only_needed(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.is_in(t.column("doc_id"), value_set=ray.get(need_ref)))

        texts = texts.map_batches(only_needed, batch_format="pyarrow")

        # Broadcast-verify fast path (see docstring).  The byte check
        # streams the filtered texts once and falls back to the join path
        # if the budget is exceeded — never load-bearing.
        chunks: list[pa.Table] = []
        total_bytes = 0
        fits = True
        for b in texts.iter_batches(batch_format="pyarrow", batch_size=8192):
            total_bytes += b.nbytes
            if total_bytes > _PAIR_TEXT_BROADCAST_BYTES:
                fits = False
                break
            chunks.append(b)
        if fits:
            tbl = (
                pa.concat_tables(chunks)
                if chunks
                else pa.schema(
                    [("doc_id", pa.int64()), ("text", pa.string())]
                ).empty_table()
            )
            tbl = tbl.sort_by([("doc_id", "ascending")])
            text_ref = ray.put(
                (
                    tbl.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64),
                    tbl,
                )
            )

            def verify_direct(t: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                ids_s, txt_tbl = ray.get(text_ref)
                a = t.column("a_id").to_numpy(zero_copy_only=False).astype(np.int64)
                b_ = t.column("b_id").to_numpy(zero_copy_only=False).astype(np.int64)
                txt = txt_tbl.column("text")
                a_txt = pc.take(txt, pa.array(np.searchsorted(ids_s, a))).to_pylist()
                b_txt = pc.take(txt, pa.array(np.searchsorted(ids_s, b_))).to_pylist()
                return kernel(t, a_txt, b_txt)

            return pairs.map_batches(verify_direct, batch_format="pyarrow")
    texts = absorb_empty_blocks(strip_schema_metadata(texts))

    joined = absorb_empty_blocks(
        pairs.join(texts, "inner", num_partitions, on=("a_id",), right_on=("doc_id",))
        .rename_columns({"text": "a_text"})
    ).join(
        texts, "inner", num_partitions, on=("b_id",), right_on=("doc_id",)
    ).rename_columns({"text": "b_text"})

    def verify(t: pa.Table) -> pa.Table:
        return kernel(
            t, t.column("a_text").to_pylist(), t.column("b_text").to_pylist()
        )

    return joined.map_batches(verify, batch_format="pyarrow")


def minhash_neardup(
    source,
    jaccard_threshold: float = 0.8,
    num_partitions: int = 8,
    max_bucket: int | None = None,
) -> ray.data.Dataset:
    """Near-duplicate pairs with verified Jaccard >= threshold.

    ``source``: a Dataset or pa.Table with (doc_id, text).

    Scale shape: candidate pairs (tiny — O(colliding docs)) are hash-join
    partitioned against the corpus on doc_id, once per pair side, so each
    verify batch sees only the texts of its own pairs.  Nothing is ever
    materialized on the driver and no per-task copy of the corpus exists —
    the corpus streams through the join's hash partitions exactly once per
    side.  Exact Jaccard is then computed per batch.
    """
    from invoice_extraction_ray.ops._util import as_docs_dataset

    docs = as_docs_dataset(source)

    # pairs are small by construction; materialize to branch on emptiness —
    # Ray's hash-join aggregators crash on an empty join side
    pairs = minhash_candidate_pairs(docs, max_bucket).materialize()
    out_schema = pa.schema(
        [("a_id", pa.int64()), ("b_id", pa.int64()), ("jaccard", pa.float64())]
    )
    if pairs.count() == 0:
        return ray.data.from_arrow(out_schema.empty_table())
    thr = jaccard_threshold

    def mh_kernel(t: pa.Table, a_txt: list, b_txt: list) -> pa.Table:
        import pyarrow.compute as pc

        ja = [round(jaccard(x, y), 4) for x, y in zip(a_txt, b_txt)]
        out = pa.table(
            {
                "a_id": t.column("a_id").cast(pa.int64()),
                "b_id": t.column("b_id").cast(pa.int64()),
                "jaccard": pa.array(ja, pa.float64()),
            }
        )
        return out.filter(pc.greater_equal(out.column("jaccard"), thr))

    return _pair_text_verify(pairs, docs, mh_kernel, out_schema, num_partitions)


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard near-dup — inverted-index plan, pure integer math
# ---------------------------------------------------------------------------

NGRAM_W = 3


def word_trigrams(text: str) -> set[str]:
    """Distinct word 3-gram strings; empty below 3 tokens (mirrors the SQL
    oracle's list_transform(range(len-2)) construction exactly)."""
    toks = (text or "").split()
    return {" ".join(toks[i : i + NGRAM_W]) for i in range(len(toks) - NGRAM_W + 1)}


def ngram_jaccard_neardup(
    source,
    threshold: float = 0.5,
    num_partitions: int = 8,
    max_df: int | None = None,
) -> ray.data.Dataset:
    """EXACT pairs with word-trigram Jaccard >= threshold.

    Distributed plan (no approximation, no driver materialization):
    1. explode each doc to distinct (gram, doc_id) rows — the inverted index;
    2. co-partition grams by a 256-way shard of the gram, sort each shard,
       emit one (a_id, b_id) row per doc pair sharing that gram;
    3. the distributed pair count (per-block partials + coarse pair-shard
       segment sums) IS the intersection size (each shared gram contributes
       exactly one raw pair row);
    4. each posting row carries its doc's gram-set size, so both sizes ride
       along with every pair — NO join back onto a per-doc table — and the
       threshold test is pure integer arithmetic
       (n_inter * 10^4 >= thr_e4 * n_union) — bit-identical to the DuckDB
       oracle.

    Only gram rows and pair rows ever shuffle — never documents.  A gram
    shared by K docs fans out K^2/2 candidate rows, so ``max_df`` (document-
    frequency cap) drops grams whose posting list exceeds it BEFORE pair
    emission — the standard inverted-index bound (boilerplate stop-phrases
    have K in the millions on a real corpus).  Each gram's full posting list
    is co-located in its shard (shard = hash(gram)), so the run length seen
    by ``emit_pairs`` IS the gram's global df.  Default None = exact (the
    DuckDB all-pairs oracle requires it); near-dup pairs sharing ONLY
    ultra-common grams are missed when the cap binds — by design.
    """
    import pyarrow.compute as pc

    from invoice_extraction_ray.ops._util import as_docs_dataset

    docs = as_docs_dataset(source)
    thr_e4 = int(round(threshold * 10_000))

    def explode_grams(t: pa.Table) -> pa.Table:
        ids, grams, ngs = [], [], []
        for d, s in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
            gs = word_trigrams(s)
            for g in gs:
                ids.append(d)
                grams.append(g)
                ngs.append(len(gs))
        out = pa.table(
            {
                "gram": pa.array(grams, pa.string()),
                "doc_id": pa.array(ids, pa.int64()),
                # each posting carries its doc's gram-set size so the pair
                # stage needs NO join back onto a per-doc size table
                "ng": pa.array(ngs, pa.int64()),
            }
        )
        shard = np.array(
            [zlib.crc32(g.encode()) & (N_BUCKET_SHARDS - 1) for g in grams],
            dtype=np.int32,
        )
        return out.append_column("shard", pa.array(shard))

    def emit_pairs(t: pa.Table) -> pa.Table:
        t = t.sort_by([("gram", "ascending"), ("doc_id", "ascending")])
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        ng = t.column("ng").to_numpy(zero_copy_only=False)
        g = t.column("gram")
        same = pc.equal(g.slice(1), g.slice(0, len(g) - 1)).to_numpy(
            zero_copy_only=False
        )
        new_run = np.ones(len(did), dtype=bool)
        new_run[1:] = ~same
        starts = np.flatnonzero(new_run)
        ends = np.append(starts[1:], len(did))
        # vectorized all-pairs index expansion (df cut applied per run), then
        # the per-block pair-count combiner: only one row per distinct pair
        # per shard shuffles into the coarse pshard combine, with both docs'
        # gram counts riding along as per-pair constants
        ia, ib = _expand_runs(did, starts, ends, max_df)
        return _pair_partials(did[ia], did[ib], {"a_n": ng[ia], "b_n": ng[ib]})

    pairs = _sum_pair_counts(
        docs.map_batches(explode_grams, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(emit_pairs, batch_format="pyarrow"),
        "n_inter",
        ("a_n", "b_n"),
    ).materialize()  # small by construction; branch on emptiness so the
    # declared 4-column output schema survives an empty corpus (map UDFs are
    # never invoked on empty blocks)
    out_schema = pa.schema(
        [
            ("a_id", pa.int64()),
            ("b_id", pa.int64()),
            ("n_inter", pa.int64()),
            ("n_union", pa.int64()),
        ]
    )
    if pairs.count() == 0:
        return ray.data.from_arrow(out_schema.empty_table())

    def finish(t: pa.Table) -> pa.Table:
        inter = t.column("n_inter").to_numpy(zero_copy_only=False).astype(np.int64)
        union = (
            t.column("a_n").to_numpy(zero_copy_only=False).astype(np.int64)
            + t.column("b_n").to_numpy(zero_copy_only=False).astype(np.int64)
            - inter
        )
        keep = (inter > 0) & (inter * 10_000 >= thr_e4 * union)
        return pa.table(
            {
                "a_id": pa.array(
                    t.column("a_id").to_numpy(zero_copy_only=False)[keep], pa.int64()
                ),
                "b_id": pa.array(
                    t.column("b_id").to_numpy(zero_copy_only=False)[keep], pa.int64()
                ),
                "n_inter": pa.array(inter[keep], pa.int64()),
                "n_union": pa.array(union[keep], pa.int64()),
            }
        )

    return pairs.map_batches(finish, batch_format="pyarrow")


def jaccard_prefix_pairs(
    source, threshold: float = 0.5, num_partitions: int = 8
) -> ray.data.Dataset:
    """EXACT word-trigram Jaccard pairs >= threshold via PREFIX FILTERING —
    the AllPairs/PPJoin candidate-pruning strategy (Chaudhuri et al. SSJoin;
    Bayardo et al. WWW'07; Xiao et al. WWW'08): byte-identical output to
    ``ngram_jaccard_neardup`` (it shares that query's oracle string), but
    the quadratic pair-expansion step sees only each doc's PREFIX postings
    instead of its full posting list.

    Under a global token order, J(A,B) >= t implies |A∩B| >= α with
    α = max(⌈t|A|⌉, ⌈t|B|⌉), and any two sets with |A∩B| >= α must share a
    token within their (|x| - α + 1)-prefixes (if the prefixes were
    disjoint, order the two prefix-max tokens: every intersection element
    <= the larger one would lie in BOTH prefixes, so all of A∩B sits in one
    suffix of size α - 1 < α).  Indexing the per-set (|x| - ⌈t|x|⌉ + 1)-
    prefix — a superset of the needed prefix — is therefore lossless.
    The global order is (df ASC, gram ASC): rare-first, the standard choice
    that keeps prefix posting lists short, so the K²-per-gram expansion
    that dominates ``ngram_jaccard_neardup`` on boilerplate-heavy corpora
    shrinks to the rare-token prefix index.

    Distributed plan (three slim shuffles + the shared verify):
    1. explode distinct (gram, doc_id, ng) postings, co-partition by gram;
    2. each gram shard holds every posting of its grams, so the run length
       IS the global df — attach it and re-shard by doc_id;
    3. each doc shard sorts its docs' grams by (df, gram) and keeps each
       doc's prefix; prefix postings re-shard by gram and expand to
       candidate pairs (``_expand_runs`` + the pair-partial combiner);
    4. candidates (output-bounded) verify with exact trigram-set Jaccard
       via the shared ``_pair_text_verify`` broadcast-or-join stage —
       the same integer threshold test as the ngram op.
    Texts never ride a shuffle; only gram/posting/pair rows move."""
    import pyarrow.compute as pc

    from invoice_extraction_ray.ops._util import as_docs_dataset

    docs = as_docs_dataset(source)
    thr_e4 = int(round(threshold * 10_000))

    def explode(t: pa.Table) -> pa.Table:
        ids, grams, ngs = [], [], []
        for d, s in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
            gs = word_trigrams(s)
            for g in gs:
                ids.append(d)
                grams.append(g)
                ngs.append(len(gs))
        shard = np.array(
            [zlib.crc32(g.encode()) & (N_BUCKET_SHARDS - 1) for g in grams],
            dtype=np.int32,
        )
        return pa.table(
            {
                "gram": pa.array(grams, pa.string()),
                "doc_id": pa.array(ids, pa.int64()),
                "ng": pa.array(ngs, pa.int64()),
                "shard": pa.array(shard),
            }
        )

    _DF = pa.schema(
        [
            ("gram", pa.string()),
            ("doc_id", pa.int64()),
            ("df", pa.int64()),
            ("ng", pa.int64()),
            ("dshard", pa.int32()),
        ]
    )

    def attach_df(t: pa.Table) -> pa.Table:
        t = _dropg(t, ["shard"])
        if t.num_rows == 0:
            return _DF.empty_table()
        t = t.sort_by([("gram", "ascending"), ("doc_id", "ascending")])
        g = t.column("gram")
        new = np.ones(t.num_rows, dtype=bool)
        new[1:] = ~pc.equal(g.slice(1), g.slice(0, len(g) - 1)).to_numpy(
            zero_copy_only=False
        )
        starts = np.flatnonzero(new)
        run_len = np.diff(np.append(starts, t.num_rows))
        df = run_len[np.cumsum(new) - 1]
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "gram": g,
                "doc_id": t.column("doc_id"),
                "df": pa.array(df.astype(np.int64), pa.int64()),
                "ng": t.column("ng"),
                "dshard": pa.array((did & (N_BUCKET_SHARDS - 1)).astype(np.int32)),
            },
            schema=_DF,
        )

    _PFX = pa.schema(
        [
            ("gram", pa.string()),
            ("doc_id", pa.int64()),
            ("ng", pa.int64()),
            ("shard", pa.int32()),
        ]
    )

    def emit_prefix(t: pa.Table) -> pa.Table:
        t = _dropg(t, ["dshard"])
        if t.num_rows == 0:
            return _PFX.empty_table()
        t = t.sort_by(
            [("doc_id", "ascending"), ("df", "ascending"), ("gram", "ascending")]
        )
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        new = np.ones(len(did), dtype=bool)
        new[1:] = did[1:] != did[:-1]
        starts = np.flatnonzero(new)
        pos = np.arange(len(did)) - starts[np.cumsum(new) - 1]
        ng = t.column("ng").to_numpy(zero_copy_only=False)
        c = -(-(thr_e4 * ng) // 10_000)  # ceil(t * |x|)
        keep = pos < (ng - c + 1)
        sub = t.filter(pa.array(keep))
        grams = sub.column("gram").to_pylist()
        shard = np.array(
            [zlib.crc32(g.encode()) & (N_BUCKET_SHARDS - 1) for g in grams],
            dtype=np.int32,
        )
        return pa.table(
            {
                "gram": sub.column("gram"),
                "doc_id": sub.column("doc_id"),
                "ng": sub.column("ng"),
                "shard": pa.array(shard),
            },
            schema=_PFX,
        )

    def emit_candidates(t: pa.Table) -> pa.Table:
        t = _dropg(t, ["shard"])
        t = t.sort_by([("gram", "ascending"), ("doc_id", "ascending")])
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        ng = t.column("ng").to_numpy(zero_copy_only=False)
        g = t.column("gram")
        new = np.ones(len(did), dtype=bool)
        if len(did) > 1:
            new[1:] = ~pc.equal(g.slice(1), g.slice(0, len(g) - 1)).to_numpy(
                zero_copy_only=False
            )
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(did))
        ia, ib = _expand_runs(did, starts, ends, None)
        return _pair_partials(did[ia], did[ib], {"a_n": ng[ia], "b_n": ng[ib]})

    prefix_postings = (
        docs.map_batches(explode, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(attach_df, batch_format="pyarrow")
        .groupby("dshard")
        .map_groups(emit_prefix, batch_format="pyarrow")
    )
    cand = _sum_pair_counts(
        prefix_postings.groupby("shard").map_groups(
            emit_candidates, batch_format="pyarrow"
        ),
        "n_pfx",
        ("a_n", "b_n"),
    ).materialize()  # output-bounded by construction

    out_schema = pa.schema(
        [
            ("a_id", pa.int64()),
            ("b_id", pa.int64()),
            ("n_inter", pa.int64()),
            ("n_union", pa.int64()),
        ]
    )
    if cand.count() == 0:
        return ray.data.from_arrow(out_schema.empty_table())

    def pj_kernel(t: pa.Table, a_txt: list, b_txt: list) -> pa.Table:
        n = t.num_rows
        ii = np.empty(n, np.int64)
        uu = np.empty(n, np.int64)
        for r, (x, y) in enumerate(zip(a_txt, b_txt)):
            ga, gb = word_trigrams(x), word_trigrams(y)
            i_ = len(ga & gb)
            ii[r] = i_
            uu[r] = len(ga) + len(gb) - i_
        keep = (ii > 0) & (ii * 10_000 >= thr_e4 * uu)
        return pa.table(
            {
                "a_id": t.column("a_id").cast(pa.int64()).filter(pa.array(keep)),
                "b_id": t.column("b_id").cast(pa.int64()).filter(pa.array(keep)),
                "n_inter": pa.array(ii[keep], pa.int64()),
                "n_union": pa.array(uu[keep], pa.int64()),
            },
            schema=out_schema,
        )

    return _pair_text_verify(
        cand.select_columns(["a_id", "b_id"]), docs, pj_kernel, out_schema,
        num_partitions,
    )


def contamination_check(source, eval_mod: int = 10) -> ray.data.Dataset:
    """Train/eval n-gram containment — the benchmark-decontamination check a
    training-data pipeline runs before holding out an eval set.

    Split rule (deterministic, mirrored by the SQL oracle):
    ``doc_id % eval_mod == 0`` -> EVAL, else TRAIN.  For every eval doc with
    at least one distinct word trigram, report how many of its grams appear
    in ANY train doc and the contaminated fraction (round-half-up 1e-4
    fixed-point integer — exact arithmetic on both sides).

    Distributed plan (inverted-index shape, no approximation, no driver
    materialization; only gram rows and per-doc counters ever shuffle):

    1. explode docs to distinct (gram, doc_id) rows, train rows collapsed to
       a single sentinel doc_id=-1 per (batch, gram);
    2. co-partition by a 256-way gram shard; within a shard each gram's
       full posting list is one sorted run — the sentinel sorts first, so
       ``run starts with -1`` IS "gram present in train".  Emit PER-DOC
       PARTIAL counters (n_grams, n_contaminated) per shard — pre-aggregated
       so the doc-level groupby shuffles O(eval_docs x shards) counter rows;
    3. ``groupby(doc_id).sum`` the partials, then the integer fraction.
    """
    import pyarrow.compute as pc

    from invoice_extraction_ray.ops._util import as_docs_dataset

    docs = as_docs_dataset(source)

    def explode(t: pa.Table) -> pa.Table:
        ids, grams = [], []
        train_grams: set[str] = set()
        for d, s in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
            gs = word_trigrams(s)
            if d % eval_mod == 0:
                for g in gs:
                    ids.append(d)
                    grams.append(g)
            else:
                train_grams.update(gs)  # batch-level dedup of train postings
        for g in train_grams:
            ids.append(-1)
            grams.append(g)
        out = pa.table(
            {"gram": pa.array(grams, pa.string()), "doc_id": pa.array(ids, pa.int64())}
        )
        shard = np.array(
            [zlib.crc32(g.encode()) & (N_BUCKET_SHARDS - 1) for g in grams],
            dtype=np.int32,
        )
        return out.append_column("shard", pa.array(shard))

    def mark(t: pa.Table) -> pa.Table:
        t = t.sort_by([("gram", "ascending"), ("doc_id", "ascending")])
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        g = t.column("gram")
        same = pc.equal(g.slice(1), g.slice(0, len(g) - 1)).to_numpy(
            zero_copy_only=False
        )
        new_run = np.ones(len(did), dtype=bool)
        new_run[1:] = ~same
        run_id = np.cumsum(new_run) - 1
        starts = np.flatnonzero(new_run)
        train_in_run = did[starts] == -1  # sentinel sorts first in its run
        contaminated = train_in_run[run_id]
        ev = did >= 0
        if not ev.any():
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_p": pa.array([], pa.int64()),
                    "c_p": pa.array([], pa.int64()),
                }
            )
        uids, inv = np.unique(did[ev], return_inverse=True)
        n_p = np.bincount(inv)
        c_p = int_bincount(inv, contaminated[ev])
        return pa.table(
            {
                "doc_id": pa.array(uids, pa.int64()),
                "n_p": pa.array(n_p, pa.int64()),
                "c_p": pa.array(c_p, pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        docs.map_batches(explode, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(mark, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("n_p", alias_name="n_grams"), Sum("c_p", alias_name="n_contaminated"))
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n_grams").to_numpy(zero_copy_only=False).astype(np.int64)
        c = t.column("n_contaminated").to_numpy(zero_copy_only=False).astype(np.int64)
        frac_e4 = (20_000 * c + n) // (2 * n)  # round-half-up, pure integers
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_grams": pa.array(n, pa.int64()),
                "n_contaminated": pa.array(c, pa.int64()),
                "frac_e4": pa.array(frac_e4, pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def neardup_clusters(
    source,
    threshold: float = 0.5,
    max_iters: int = 25,
    max_df: int | None = None,
) -> ray.data.Dataset:
    """Connected components over the exact n-gram-Jaccard near-dup pair graph:
    every doc that appears in some pair is labeled with the MIN doc_id of its
    component (``cluster_id``) — the canonical-representative step a dedup
    pipeline runs after pair generation (keep one doc per cluster).

    Distributed iterative min-label propagation, JOIN-FREE: each round unions
    edge rows (gnode=src, peer=dst) with label rows (gnode=node, lbl), groups
    by a 64-way shard of gnode, and inside each shard delivers every node's
    current label to its peers with one vectorized pandas transform; a
    per-node Min aggregate yields the next labels.  Convergence is detected
    by the (monotonically decreasing) label sum.  Only the PAIR graph
    iterates — docs with no near-dup never enter the loop (they are
    implicitly singleton clusters), so per-round state is O(|pairs|), not
    O(corpus).  Rounds needed = component diameter (tiny for near-dup
    clusters).  The small label/edge sets are materialized between rounds;
    the corpus itself streams only through pair generation.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    pairs = (
        ngram_jaccard_neardup(source, threshold, max_df=max_df)
        .select_columns(["a_id", "b_id"])
        .materialize()  # small by construction; re-used every round
    )

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t.column("a_id").combine_chunks()
        b = t.column("b_id").combine_chunks()
        src = pa.chunked_array([a, b]).combine_chunks()
        dst = pa.chunked_array([b, a]).combine_chunks()
        shard = pc.cast(pc.bit_wise_and(src, 63), pa.int32())
        return pa.table({"gnode": src, "peer": dst, "shard": shard})

    edges = pairs.map_batches(both_dirs, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(
            pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())]).empty_table()
        )

    # initial labels: label[n] = min(n, min direct neighbor) — one aggregate
    def fold(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t.column("gnode"),
                "label": pc.min_element_wise(t.column("gnode"), t.column("nbr")),
            }
        )

    labels = (
        edges.groupby("gnode")
        .aggregate(Min("peer", alias_name="nbr"))
        .map_batches(fold, batch_format="pyarrow")
        .materialize()
    )

    def tag_labels(t: pa.Table) -> pa.Table:
        shard = pc.cast(pc.bit_wise_and(t.column("node"), 63), pa.int32())
        return pa.table(
            {
                "gnode": t.column("node"),
                "peer": pa.nulls(t.num_rows, pa.int64()),
                "shard": shard,
                "lbl": t.column("label"),
            }
        )

    def tag_edges(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "gnode": t.column("gnode"),
                "peer": t.column("peer"),
                "shard": t.column("shard"),
                "lbl": pa.nulls(t.num_rows, pa.int64()),
            }
        )

    _MSG = pa.schema([("node", pa.int64()), ("label", pa.int64())])

    def deliver(g: pa.Table) -> pa.Table:
        """One shard: each gnode has exactly one label row (lbl non-null);
        a run-detected gather spreads it to the gnode's edge rows, which
        forward it to their peers; label rows re-emit it for the node
        itself.  numpy on Arrow — no pandas copy of the shard."""
        if g.num_rows == 0:
            return _MSG.empty_table()
        g = g.sort_by([("gnode", "ascending")])
        gnode = g.column("gnode").to_numpy(zero_copy_only=False)
        peer_col = g.column("peer").combine_chunks()
        lbl_col = g.column("lbl").combine_chunks()
        is_edge = pc.is_valid(peer_col).to_numpy(zero_copy_only=False)
        lbl_valid = pc.is_valid(lbl_col).to_numpy(zero_copy_only=False)
        new = np.ones(len(gnode), dtype=bool)
        new[1:] = gnode[1:] != gnode[:-1]
        run_id = np.cumsum(new) - 1
        run_label = np.empty(run_id[-1] + 1, dtype=np.int64)
        lbl_np = lbl_col.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        run_label[run_id[lbl_valid]] = lbl_np[lbl_valid]
        m = run_label[run_id]
        peer_np = peer_col.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        node = np.concatenate([peer_np[is_edge], gnode[~is_edge]])
        label = np.concatenate([m[is_edge], m[~is_edge]])
        return pa.table(
            {"node": pa.array(node.astype(np.int64)), "label": pa.array(label)}
        )

    # the edge rows never change between rounds — tag and materialize ONCE
    tagged_edges = edges.map_batches(tag_edges, batch_format="pyarrow").materialize()

    prev_sum = None
    for _ in range(max_iters):
        tagged_labels = labels.map_batches(tag_labels, batch_format="pyarrow")
        msgs = (
            tagged_edges.union(tagged_labels)
            .groupby("shard")
            .map_groups(deliver, batch_format="pyarrow")
        )
        labels = (
            msgs.groupby("node").aggregate(Min("label", alias_name="label")).materialize()
        )
        # convergence check over the already-materialized label blocks —
        # no extra Ray job per round
        cur = 0
        for b in labels.iter_batches(batch_format="pyarrow", batch_size=65536):
            cur += int(
                np.sum(b.column("label").to_numpy(zero_copy_only=False), dtype=np.int64)
            )
        if cur == prev_sum:
            break
        prev_sum = cur

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("node").cast(pa.int64()),
                "cluster_id": t.column("label").cast(pa.int64()),
            }
        )

    return labels.map_batches(project, batch_format="pyarrow")


def delta_neardup(
    source,
    threshold: float = 0.5,
    delta_mod: int = 10,
    max_df: int | None = None,
) -> ray.data.Dataset:
    """Ingest-time dedup: EXACT trigram-Jaccard near-dup pairs between a
    DELTA batch of new documents and the existing corpus — the check an
    incremental ingestion pipeline runs before admitting new docs, without
    ever comparing corpus docs to each other.

    Split rule (deterministic, mirrored by the SQL oracle):
    ``doc_id % delta_mod == 0`` -> DELTA (new), else CORPUS.  Output rows
    are (delta_id, corpus_id, n_inter, n_union) with Jaccard >= threshold.

    Same inverted-index plan as ``ngram_jaccard_neardup`` — postings carry a
    side flag and each doc's gram count; pair expansion keeps only
    CROSS-side (delta x corpus) pairs, so a huge corpus with a small delta
    emits O(delta-collisions), never corpus-internal pairs."""
    import pyarrow.compute as pc

    from invoice_extraction_ray.ops._util import as_docs_dataset

    docs = as_docs_dataset(source)
    thr_e4 = int(round(threshold * 10_000))

    def explode(t: pa.Table) -> pa.Table:
        ids, grams, ngs = [], [], []
        for d, s in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
            gs = word_trigrams(s)
            for g in gs:
                ids.append(d)
                grams.append(g)
                ngs.append(len(gs))
        shard = np.array(
            [zlib.crc32(g.encode()) & (N_BUCKET_SHARDS - 1) for g in grams],
            dtype=np.int32,
        )
        return pa.table(
            {
                "gram": pa.array(grams, pa.string()),
                "doc_id": pa.array(ids, pa.int64()),
                "ng": pa.array(ngs, pa.int64()),
                "shard": pa.array(shard),
            }
        )

    def emit_pairs(t: pa.Table) -> pa.Table:
        t = t.sort_by([("gram", "ascending"), ("doc_id", "ascending")])
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        ng = t.column("ng").to_numpy(zero_copy_only=False)
        g = t.column("gram")
        same = pc.equal(g.slice(1), g.slice(0, len(g) - 1)).to_numpy(
            zero_copy_only=False
        )
        new_run = np.ones(len(did), dtype=bool)
        new_run[1:] = ~same
        starts = np.flatnonzero(new_run)
        ends = np.append(starts[1:], len(did))
        ia, ib = _expand_runs(did, starts, ends, max_df)
        # keep only cross-side pairs, oriented (delta, corpus)
        a_delta = did[ia] % delta_mod == 0
        b_delta = did[ib] % delta_mod == 0
        cross = a_delta != b_delta
        ia, ib, a_delta = ia[cross], ib[cross], a_delta[cross]
        d_idx = np.where(a_delta, ia, ib)
        c_idx = np.where(a_delta, ib, ia)
        return _pair_partials(
            did[d_idx], did[c_idx], {"a_n": ng[d_idx], "b_n": ng[c_idx]}
        )

    pairs = _sum_pair_counts(
        docs.map_batches(explode, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(emit_pairs, batch_format="pyarrow"),
        "n_inter",
        ("a_n", "b_n"),
    ).materialize()
    out_schema = pa.schema(
        [
            ("delta_id", pa.int64()),
            ("corpus_id", pa.int64()),
            ("n_inter", pa.int64()),
            ("n_union", pa.int64()),
        ]
    )
    if pairs.count() == 0:
        return ray.data.from_arrow(out_schema.empty_table())

    def finish(t: pa.Table) -> pa.Table:
        inter = t.column("n_inter").to_numpy(zero_copy_only=False).astype(np.int64)
        union = (
            t.column("a_n").to_numpy(zero_copy_only=False).astype(np.int64)
            + t.column("b_n").to_numpy(zero_copy_only=False).astype(np.int64)
            - inter
        )
        keep = (inter > 0) & (inter * 10_000 >= thr_e4 * union)
        return pa.table(
            {
                "delta_id": pa.array(
                    t.column("a_id").to_numpy(zero_copy_only=False)[keep], pa.int64()
                ),
                "corpus_id": pa.array(
                    t.column("b_id").to_numpy(zero_copy_only=False)[keep], pa.int64()
                ),
                "n_inter": pa.array(inter[keep], pa.int64()),
                "n_union": pa.array(union[keep], pa.int64()),
            }
        )

    return pairs.map_batches(finish, batch_format="pyarrow")


def novelty_scores(source) -> ray.data.Dataset:
    """Per-document trigram novelty — the repetition/boilerplate curation
    signal: for every doc with >=1 distinct word trigram, the count of its
    grams that appear in NO other document (corpus df == 1) and the novelty
    fraction (round-half-up 1e-4 fixed point, exact integers both sides).

    Distributed plan (inverted-index shape, nothing approximate, nothing on
    the driver): explode docs to distinct (gram, doc_id) rows; co-partition
    by a 256-way gram shard, where each gram's full posting list is one
    sorted run, so the RUN LENGTH is the gram's global df; emit per-doc
    PARTIAL (n_grams, n_unique) counters per shard; combine with a coarse
    doc-shard groupby + vectorized segment sums."""
    import pyarrow.compute as pc

    from invoice_extraction_ray.ops._util import as_docs_dataset

    docs = as_docs_dataset(source)

    def explode(t: pa.Table) -> pa.Table:
        ids, grams = [], []
        for d, s in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
            for g in word_trigrams(s):
                ids.append(d)
                grams.append(g)
        shard = np.array(
            [zlib.crc32(g.encode()) & (N_BUCKET_SHARDS - 1) for g in grams],
            dtype=np.int32,
        )
        return pa.table(
            {
                "gram": pa.array(grams, pa.string()),
                "doc_id": pa.array(ids, pa.int64()),
                "shard": pa.array(shard),
            }
        )

    _PARTIAL_SCHEMA = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_p", pa.int64()),
            ("u_p", pa.int64()),
            ("dshard", pa.int32()),
        ]
    )

    def mark(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PARTIAL_SCHEMA.empty_table()
        t = t.sort_by([("gram", "ascending"), ("doc_id", "ascending")])
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        g = t.column("gram")
        same = pc.equal(g.slice(1), g.slice(0, len(g) - 1)).to_numpy(
            zero_copy_only=False
        )
        new_run = np.ones(len(did), dtype=bool)
        new_run[1:] = ~same
        run_id = np.cumsum(new_run) - 1
        run_len = np.bincount(run_id)
        unique_gram = (run_len == 1)[run_id]
        uids, inv = np.unique(did, return_inverse=True)
        n_p = np.bincount(inv).astype(np.int64)
        u_p = int_bincount(inv, unique_gram)
        return pa.table(
            {
                "doc_id": pa.array(uids, pa.int64()),
                "n_p": pa.array(n_p),
                "u_p": pa.array(u_p),
                "dshard": pa.array((uids & 63).astype(np.int32)),
            }
        )

    def reduce_docs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_grams": pa.array([], pa.int64()),
                    "n_unique": pa.array([], pa.int64()),
                    "novelty_e4": pa.array([], pa.int64()),
                }
            )
        did = g.column("doc_id").to_numpy(zero_copy_only=False)
        n_p = g.column("n_p").to_numpy(zero_copy_only=False)
        u_p = g.column("u_p").to_numpy(zero_copy_only=False)
        uids, inv = np.unique(did, return_inverse=True)
        n = int_bincount(inv, n_p)
        u = int_bincount(inv, u_p)
        nov = (20_000 * u + n) // (2 * n)  # round-half-up, pure integers
        return pa.table(
            {
                "doc_id": pa.array(uids, pa.int64()),
                "n_grams": pa.array(n),
                "n_unique": pa.array(u),
                "novelty_e4": pa.array(nov, pa.int64()),
            }
        )

    return (
        docs.map_batches(explode, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(mark, batch_format="pyarrow")
        .groupby("dshard")
        .map_groups(reduce_docs, batch_format="pyarrow")
    )


def substring_dup_spans(source, l: int = 4, min_sites: int = 2) -> ray.data.Dataset:
    """Exact duplicated-substring spans — the suffix-array dedup of Lee et
    al. 2022 ("Deduplicating Training Data Makes Language Models Better"),
    re-expressed as an inverted L-gram index so it distributes: a token
    position is DUPLICATED when its L-token gram occurs at >= ``min_sites``
    sites corpus-wide (cross- or within-document), and overlapping/adjacent
    duplicated grams merge into maximal half-open spans
    ``[span_start, span_end)`` in 0-based token coordinates (merge rule:
    consecutive duplicated positions join while ``pos - prev_pos <= l``,
    i.e. their L-token windows overlap or touch).

    Distributed plan (nothing approximate, nothing on the driver):
    explode docs to (gram, doc_id, pos) posting rows; co-partition by a
    256-way crc gram shard so each gram's posting list is one sorted run
    whose RUN LENGTH is the gram's global site count — positions in
    qualifying runs survive, everything else dies in the shard (no pair
    emission, so a hot gram costs O(sites), never O(sites^2)); then one
    coarse doc-shard groupby merges each doc's sorted positions into spans
    with a vectorized break/cumsum scan.  Two posting-row shuffles total;
    at 100 TB the gram strings could be compacted to 16-byte digests
    (exact_dedup's trick) to shrink the first exchange.

    Reference analogue: the reference's only dedup is per-document box
    suppression (ocr.py:134-179); this is the corpus-level generalization
    a training-data pipeline needs.  Tokenization mirrors the SQL oracle's
    regexp_extract_all('\\S+') via str.split()."""
    import pyarrow.compute as pc

    from invoice_extraction_ray.ops._util import as_docs_dataset

    docs = as_docs_dataset(source)

    def explode(t: pa.Table) -> pa.Table:
        ids, poss, grams = [], [], []
        for d, s in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
            toks = (s or "").split()
            for i in range(len(toks) - l + 1):
                ids.append(d)
                poss.append(i)
                grams.append(" ".join(toks[i : i + l]))
        shard = np.array(
            [zlib.crc32(g.encode()) & (N_BUCKET_SHARDS - 1) for g in grams],
            dtype=np.int32,
        )
        return pa.table(
            {
                "gram": pa.array(grams, pa.string()),
                "doc_id": pa.array(ids, pa.int64()),
                "pos": pa.array(poss, pa.int64()),
                "shard": pa.array(shard),
            }
        )

    _SITE_SCHEMA = pa.schema(
        [("doc_id", pa.int64()), ("pos", pa.int64()), ("dshard", pa.int32())]
    )

    def mark(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _SITE_SCHEMA.empty_table()
        t = t.sort_by([("gram", "ascending")])
        g = t.column("gram").combine_chunks()
        same = pc.equal(g.slice(1), g.slice(0, len(g) - 1)).to_numpy(
            zero_copy_only=False
        )
        new_run = np.ones(t.num_rows, dtype=bool)
        new_run[1:] = ~same
        run_id = np.cumsum(new_run) - 1
        dup = (np.bincount(run_id) >= min_sites)[run_id]
        did = t.column("doc_id").to_numpy(zero_copy_only=False)[dup]
        pos = t.column("pos").to_numpy(zero_copy_only=False)[dup]
        return pa.table(
            {
                "doc_id": pa.array(did, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "dshard": pa.array((did & 63).astype(np.int32)),
            }
        )

    _SPAN_SCHEMA = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("span_start", pa.int64()),
            ("span_end", pa.int64()),
            ("span_len", pa.int64()),
        ]
    )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _SPAN_SCHEMA.empty_table()
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        pos = t.column("pos").to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, did))
        did, pos = did[order], pos[order]
        brk = np.ones(len(did), dtype=bool)
        brk[1:] = (did[1:] != did[:-1]) | (pos[1:] - pos[:-1] > l)
        last = np.empty(len(did), dtype=bool)
        last[:-1] = brk[1:]
        last[-1] = True
        starts = pos[brk]
        ends = pos[last] + l
        return pa.table(
            {
                "doc_id": pa.array(did[brk], pa.int64()),
                "span_start": pa.array(starts, pa.int64()),
                "span_end": pa.array(ends, pa.int64()),
                "span_len": pa.array(ends - starts, pa.int64()),
            }
        )

    return (
        docs.map_batches(explode, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(mark, batch_format="pyarrow")
        .groupby("dshard")
        .map_groups(merge, batch_format="pyarrow")
    )


def substring_scrub(source, l: int = 4, min_sites: int = 2) -> ray.data.Dataset:
    """Apply ``substring_dup_spans``: rebuild every document with the tokens
    of each duplicated span REMOVED — the conservative C4-style removal
    (ALL occurrences drop; electing one canonical copy to keep would need a
    cross-document ownership vote on each gram cluster, which the span
    table supports but this op deliberately avoids).  Emits
    (doc_id, clean_text, n_removed) for EVERY doc; clean_text is the
    space-joined survivor tokens, so whitespace is normalized identically
    on both engine and oracle sides.

    Join-free: doc rows and span rows are tagged and unioned onto the SAME
    64-way doc-shard key (the neardup_clusters message-passing trick — no
    ``Dataset.join``, no empty-partition hazard), ONE groupby co-locates
    each doc with its spans, and the rebuild masks tokens with numpy."""
    from invoice_extraction_ray.ops._util import as_docs_dataset

    docs = as_docs_dataset(source)
    spans = substring_dup_spans(source, l=l, min_sites=min_sites)

    def tag_docs(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n = t.num_rows
        return pa.table(
            {
                "doc_id": pa.array(did, pa.int64()),
                "kind": pa.array(np.zeros(n, np.int32)),
                "text": t.column("text").cast(pa.string()),
                "s": pa.array(np.full(n, -1, np.int64)),
                "e": pa.array(np.full(n, -1, np.int64)),
                "dshard": pa.array((did & 63).astype(np.int32)),
            }
        )

    def tag_spans(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n = t.num_rows
        return pa.table(
            {
                "doc_id": pa.array(did, pa.int64()),
                "kind": pa.array(np.ones(n, np.int32)),
                "text": pa.nulls(n, pa.string()),
                "s": t.column("span_start").cast(pa.int64()),
                "e": t.column("span_end").cast(pa.int64()),
                "dshard": pa.array((did & 63).astype(np.int32)),
            }
        )

    tagged = docs.map_batches(tag_docs, batch_format="pyarrow").union(
        spans.map_batches(tag_spans, batch_format="pyarrow")
    )

    _OUT = pa.schema(
        [("doc_id", pa.int64()), ("clean_text", pa.string()), ("n_removed", pa.int64())]
    )

    def rebuild(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        kind = g.column("kind").to_numpy(zero_copy_only=False)
        did = g.column("doc_id").to_numpy(zero_copy_only=False)
        s = g.column("s").to_numpy(zero_copy_only=False)
        e = g.column("e").to_numpy(zero_copy_only=False)
        span_map: dict[int, list[tuple[int, int]]] = {}
        for i in np.flatnonzero(kind == 1):
            span_map.setdefault(int(did[i]), []).append((int(s[i]), int(e[i])))
        doc_idx = np.flatnonzero(kind == 0)
        texts = g.column("text").take(pa.array(doc_idx)).to_pylist()
        out_ids, out_txt, out_rm = [], [], []
        for i, txt in zip(doc_idx, texts):
            toks = (txt or "").split()
            mask = np.ones(len(toks), dtype=bool)
            for a, b in span_map.get(int(did[i]), ()):
                mask[a:b] = False
            out_ids.append(int(did[i]))
            out_txt.append(" ".join(tok for tok, m in zip(toks, mask.tolist()) if m))
            out_rm.append(len(toks) - int(mask.sum()))
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "clean_text": pa.array(out_txt, pa.string()),
                "n_removed": pa.array(out_rm, pa.int64()),
            }
        )

    return tagged.groupby("dshard").map_groups(rebuild, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash (64-bit) — near-dup signature; Hamming-close signatures ~ similar docs
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    """Scalar reference simhash (used by tests); hot paths use simhash_batch."""
    return int(simhash_batch([text])[0])


def simhash_batch(texts) -> np.ndarray:
    """Vectorized 64-bit simhash over a batch of texts.

    All token hashes of the batch are collected once, the token x 64 ±1 bit
    matrix is built in a single vectorized pass, and per-document bit sums
    come from one ``np.add.reduceat`` over document boundaries — no per-token
    numpy calls.  Returns int64 (two's-complement wrapped) per text.
    """
    counts = np.empty(len(texts), dtype=np.int64)
    all_h: list[int] = []
    for i, s in enumerate(texts):
        toks = (s or "").split()
        counts[i] = len(toks)
        for tok in toks:
            all_h.append(zlib.crc32(tok.encode()) | (zlib.crc32(tok[::-1].encode()) << 32))
    out = np.zeros(len(texts), dtype=np.int64)
    if not all_h:
        return out
    hs = np.array(all_h, dtype="<u8")  # force little-endian: byte k holds bits 8k..8k+7
    bit_cols = np.unpackbits(hs.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    # per-doc count of set bits per position via cumsum difference along the
    # transposed-contiguous axis (axis-0 cumsum of an n x 64 uint8 is ~15x
    # slower); bit j of the simhash is set iff a strict majority of the doc's
    # tokens set it (equivalent to the ±1-accumulator being > 0)
    bt = np.ascontiguousarray(bit_cols.T)  # 64 x n_tokens
    cs = np.zeros((64, len(hs) + 1), dtype=np.int64)
    np.cumsum(bt, axis=1, dtype=np.int64, out=cs[:, 1:])
    starts = np.zeros(len(texts), dtype=np.int64)
    starts[1:] = np.cumsum(counts)[:-1]
    ones = (cs[:, starts + counts] - cs[:, starts]).T  # n_docs x 64
    bits = (ones * 2 > counts[:, None]).astype(np.uint64)
    vals = (bits << np.arange(64, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)
    return vals.astype(np.int64)  # two's-complement wrap; empty docs -> 0


def simhashes(sf_dir: str) -> ray.data.Dataset:
    ds = ray.data.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        hs = pa.array(simhash_batch(t.column("text").to_pylist()), pa.int64())
        return pa.table({"doc_id": t.column("doc_id"), "simhash": hs})

    return ds.map_batches(fn, batch_format="pyarrow")


SIMHASH_BANDS = 4  # 4 x 16-bit bands: any pair with Hamming <= 3 shares a band


def simhash_neardup(source, max_hamming: int = 3) -> ray.data.Dataset:
    """Near-duplicate pairs by SimHash: pigeonhole-banded candidate generation
    (a pair within Hamming distance ``max_hamming`` < SIMHASH_BANDS must agree
    exactly on at least one 16-bit band), then exact popcount verification.
    Shuffles only (band, band_val, doc_id, simhash) sketch rows — never text.

    ``source``: Dataset or pa.Table with (doc_id, text).
    """
    from invoice_extraction_ray.ops._util import as_docs_dataset

    docs = as_docs_dataset(source)

    def sketch(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        hs = simhash_batch(t.column("text").to_pylist()).tolist()
        out = {"doc_id": [], "band": [], "band_val": [], "simhash": []}
        for d, h in zip(ids, hs):
            u = h & ((1 << 64) - 1)
            for b in range(SIMHASH_BANDS):
                out["doc_id"].append(d)
                out["band"].append(b)
                out["band_val"].append((u >> (16 * b)) & 0xFFFF)
                out["simhash"].append(h)
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "band": pa.array(out["band"], pa.int32()),
                "band_val": pa.array(out["band_val"], pa.int32()),
                "simhash": pa.array(out["simhash"], pa.int64()),
            }
        )

    def add_shard(t: pa.Table) -> pa.Table:
        band = t.column("band").to_numpy(zero_copy_only=False).astype(np.int64)
        bv = t.column("band_val").to_numpy(zero_copy_only=False).astype(np.int64)
        shard = ((band * 1_000_003 + bv) % N_BUCKET_SHARDS).astype(np.int32)
        return t.append_column("shard", pa.array(shard))

    def emit_verified(t: pa.Table) -> pa.Table:
        """One shard of buckets: run-detect buckets in sorted order, pairwise
        popcount-verify within each true bucket (size >= 2)."""
        band = t.column("band").to_numpy(zero_copy_only=False)
        bv = t.column("band_val").to_numpy(zero_copy_only=False)
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        sh = t.column("simhash").to_pylist()
        order = np.lexsort((did, bv, band))
        band, bv, did = band[order], bv[order], did[order]
        sh = [sh[i] for i in order]
        new_run = np.ones(len(band), dtype=bool)
        new_run[1:] = (band[1:] != band[:-1]) | (bv[1:] != bv[:-1])
        starts = np.flatnonzero(new_run)
        ends = np.append(starts[1:], len(band))
        a_ids, b_ids, dists = [], [], []
        for s, e in zip(starts, ends):
            for i in range(s, e):
                for j in range(i + 1, e):
                    if did[i] == did[j]:
                        continue
                    d = int.bit_count((sh[i] ^ sh[j]) & ((1 << 64) - 1))
                    if d <= max_hamming:
                        a_ids.append(did[i])
                        b_ids.append(did[j])
                        dists.append(d)
        return pa.table(
            {
                "a_id": pa.array(a_ids, pa.int64()),
                "b_id": pa.array(b_ids, pa.int64()),
                "hamming": pa.array(dists, pa.int64()),
            }
        )

    from ray.data.aggregate import Min

    pairs = (
        docs.map_batches(sketch, batch_format="pyarrow")
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(emit_verified, batch_format="pyarrow")
    )
    # a pair can agree on several bands — keep each once
    return pairs.groupby(["a_id", "b_id"]).aggregate(Min("hamming", alias_name="hamming"))


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (blockwise matmul against broadcast matrix)
# ---------------------------------------------------------------------------


def embedding_neardup_lsh(
    sf_dir: str, threshold: float = 0.3, n_bands: int = 4, planes_per_band: int = 3
) -> ray.data.Dataset:
    """Scale-path embedding near-dup: BANDED random-hyperplane LSH — each
    vector lands in one bucket per band (1 row -> n_bands sketch rows), pairs
    are cosine-scored only within a (band, bucket) group, and duplicates
    across bands are folded by a final distinct.  For a pair at angle θ the
    per-band collision probability is (1-θ/π)^planes_per_band, so recall =
    1-(1-p)^n_bands (~0.6 at cos 0.3 with 4x3) — measured vs the exact op in
    tests.  Within-bucket scoring is exact: no false positives."""

    def bucketize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "vec_id": t.column("vec_id"),
                    "embedding": t.column("embedding"),
                    "band": pa.array([], pa.int32()),
                    "bucket": pa.array([], pa.int64()),
                }
            )
        mat = embedding_matrix(t.column("embedding"))
        planes = np.random.RandomState(424242).normal(
            size=(n_bands * planes_per_band, mat.shape[1])
        )  # deterministic model parameters
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        bits = (mat @ planes.T) > 0
        vid = t.column("vec_id")
        tables = []
        for band in range(n_bands):
            bb = bits[:, band * planes_per_band : (band + 1) * planes_per_band]
            bucket = (bb.astype(np.int64) << np.arange(planes_per_band, dtype=np.int64)).sum(axis=1)
            tables.append(
                pa.table(
                    {
                        "vec_id": vid,
                        "embedding": t.column("embedding"),
                        "band": pa.array(np.full(t.num_rows, band, np.int32)),
                        "bucket": pa.array(bucket, pa.int64()),
                    }
                )
            )
        return pa.concat_tables(tables)

    def pairs_in_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"a_id": pa.array([], pa.int64()), "b_id": pa.array([], pa.int64())})
        vid = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        mat = embedding_matrix(t.column("embedding"))
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        sims = mat @ mat.T
        bi, cj = np.nonzero(sims > threshold)
        a, b = vid[bi], vid[cj]
        keep = a < b
        return pa.table({"a_id": pa.array(a[keep]), "b_id": pa.array(b[keep])})

    from ray.data.aggregate import Count

    ds = ray.data.read_parquet(_pq(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    pairs = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby(["band", "bucket"])
        .map_groups(pairs_in_bucket, batch_format="pyarrow")
    )
    return (
        pairs.groupby(["a_id", "b_id"])
        .aggregate(Count(alias_name="n_bands"))
        .select_columns(["a_id", "b_id"])
    )


# embedding_neardup is the EXACT O(N^2) small-corpus tool: the whole matrix
# is broadcast and every batch matmuls against it.  Past this row cap the
# broadcast (rows x dim x 8 bytes) and the quadratic scoring stop being a
# "small side", so the guard fails fast and points at the scale twins
# instead of silently melting a cluster.  2^18 rows x 64 dims ~ 128 MiB
# broadcast and ~34B similarity cells across the job — the practical knee.
EMBEDDING_NEARDUP_MAX_ROWS = 1 << 18


def embedding_neardup(
    sf_dir: str, threshold: float = 0.95, max_rows: int = EMBEDDING_NEARDUP_MAX_ROWS
) -> ray.data.Dataset:
    """Pairs (a_id < b_id) with cosine similarity > threshold — EXACT variant.

    The full (small) embedding matrix is broadcast once; each batch computes
    its block of the similarity matrix with one matmul.  This is O(N^2) by
    construction and guarded by ``max_rows`` (checked against parquet
    metadata, no data read): beyond the cap it raises and directs callers to
    the scale paths, ``embedding_neardup_lsh`` (banded hyperplane buckets)
    or ``semantic_neardup`` (SemDeDup cluster blocking) — both value-checked
    against this exact op on the corpora where both run.
    """
    import pyarrow.parquet as pq

    path = _pq(sf_dir, "embeddings")
    n_rows = pq.ParquetFile(path).metadata.num_rows
    if n_rows > max_rows:
        raise ValueError(
            f"embedding_neardup is the exact O(N^2) small-corpus tool: "
            f"{path} has {n_rows} rows > max_rows={max_rows}. Use "
            f"embedding_neardup_lsh (banded hyperplane LSH) or "
            f"semantic_neardup (cluster-blocked SemDeDup) at this scale."
        )

    tbl = pq.read_table(path, columns=["vec_id", "embedding"])
    ids = tbl.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    mat = embedding_matrix(tbl.column("embedding"))
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    ref = ray.put((ids, mat))

    def block_score(t: pa.Table) -> pa.Table:
        c_ids, c_mat = ray.get(ref)  # plasma zero-copy; one copy per node
        bid = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        bm = embedding_matrix(t.column("embedding"), dim=c_mat.shape[1])
        bm /= np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-30)
        sims = bm @ c_mat.T  # |batch| x |corpus|
        bi, cj = np.nonzero(sims > threshold)
        a = bid[bi]
        b = c_ids[cj]
        keep = a < b  # each unordered pair once, no self-pairs
        return pa.table(
            {
                "a_id": pa.array(a[keep]),
                "b_id": pa.array(b[keep]),
            }
        )

    ds = ray.data.read_parquet(_pq(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    return ds.map_batches(block_score, batch_format="pyarrow", batch_size=1024)


def semantic_neardup(
    sf_dir: str,
    n_clusters: int = 8,
    threshold: float = 0.3,
    max_cluster: int | None = None,
) -> ray.data.Dataset:
    """SemDeDup-style semantic near-dup: k-means clusters partition the
    embedding corpus; pairs are cosine-scored only WITHIN a cluster (near-dups
    land in the same cluster by construction, so the cluster is the candidate
    block — the semantic analogue of an LSH bucket, but model-driven).

    Scale shape: the centroid model is trained once on a bounded
    deterministic sample (``ops.ann._train_centroids``, shared with IVF /
    kmeans_clusters) and broadcast; assignment is a stateless one-matmul task
    map; only then does the corpus shuffle — ONE groupby on the cluster id —
    and the O(c^2) scoring is confined to each cluster.  At 100 TB the knob
    is ``n_clusters`` ~ corpus/1000 so every cluster's pairwise block fits a
    worker (the standard SemDeDup operating point); ``max_cluster`` is the
    skewed-cluster bound (the semantic twin of the minhash path's
    ``max_bucket``): a cluster above the cap is pair-scored only over its
    ``max_cluster`` smallest vec_ids — deterministic, bounded O(cap^2) per
    group — instead of exploding quadratically.  Default None = exact (the
    SQL oracle requires it); at real-corpus scale set a cap and let the
    clustering op absorb the loss.  Within-cluster scoring is exact — no
    false positives; misses are only cross-cluster pairs (recall measured vs
    the exact op in tests).

    Returns (a_id < b_id, sim_e4) for in-cluster pairs with cosine >
    ``threshold``, sorted for stable presentation."""
    from .ann import _train_centroids

    cents = _train_centroids(sf_dir, n_clusters)
    dim = cents.shape[1]
    cents_ref = ray.put(cents)

    def assign(t: pa.Table) -> pa.Table:
        bc = ray.get(cents_ref)  # plasma zero-copy per batch
        m = embedding_matrix(t.column("embedding"), dim=dim)
        # argmax of the RAW dot product: normalization-invariant, matches the
        # SQL oracle's list_dot_product argmax (numpy first-max tie-break)
        a = np.argmax(m @ bc.T, axis=1).astype(np.int64)
        return t.append_column("cluster", pa.array(a, pa.int64()))

    def pairs_in_cluster(g: pa.Table) -> pa.Table:
        if max_cluster is not None and g.num_rows > max_cluster:
            # deterministic bound: keep the cap smallest vec_ids (order-
            # independent of block arrival, like the IVF training sample)
            g = g.sort_by([("vec_id", "ascending")]).slice(0, max_cluster)
        vid = g.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        m = embedding_matrix(g.column("embedding"), dim=dim)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        sims = mn @ mn.T
        bi, cj = np.nonzero(sims > threshold)
        keep = vid[bi] < vid[cj]  # each unordered pair once, no self-pairs
        e4 = np.floor(sims[bi[keep], cj[keep]] * 10_000.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "a_id": pa.array(vid[bi[keep]]),
                "b_id": pa.array(vid[cj[keep]]),
                "sim_e4": pa.array(e4),
            }
        )

    ds = ray.data.read_parquet(_pq(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(pairs_in_cluster, batch_format="pyarrow")
        .sort(["a_id", "b_id"])
    )


def dedup_keep_best(sf_dir: str, n_shards: int = 64) -> ray.data.Dataset:
    """Dedup keeping the BEST copy per duplicate group — real curation
    pipelines keep the highest-quality duplicate (cleanest rendering), not
    the arbitrary first.  Group key = case/whitespace-NORMALIZED text
    (lower + ``\\s+`` collapsed, one vectorized Arrow regex pass), so raw
    copies that differ only in casing or spacing fold together while their
    quality scores (computed on the RAW text) genuinely differ; the keeper
    is the doc with max ``score_e5`` (ties: min doc_id), emitted with the
    group's copy count.

    Scale shape mirrors ``relational.exact_dedup``: group key = first 16
    sha256 digest bytes as two int64 columns; each batch pre-combines to one
    (keeper, count) row per distinct digest BEFORE the shuffle (argmax+count
    are associative, so partials merge exactly); digests co-partition by a
    coarse 64-way shard (never one group per digest) and each shard merges
    with one lexsort + run-detected firsts / exact int64 segment sums.
    Texts themselves never shuffle — only digest+scalar rows move.

    Output: (doc_id, score_e5, n_copies)."""
    import hashlib

    from .text import quality_arrays

    ds = ray.data.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])

    _PART = pa.schema(
        [
            ("h1", pa.int64()),
            ("h2", pa.int64()),
            ("doc_id", pa.int64()),
            ("score_e5", pa.int64()),
            ("n", pa.int64()),
            ("dshard", pa.int32()),
        ]
    )
    _OUT = pa.schema(
        [("doc_id", pa.int64()), ("score_e5", pa.int64()), ("n_copies", pa.int64())]
    )

    def _combine(h1, h2, doc_id, score, n):
        """Merge rows sharing (h1,h2): keep (max score, min doc_id), sum n."""
        order = np.lexsort((doc_id, -score, h2, h1))
        h1, h2 = h1[order], h2[order]
        doc_id, score, n = doc_id[order], score[order], n[order]
        new = np.ones(len(h1), dtype=bool)
        if len(h1) > 1:
            new[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        starts = np.flatnonzero(new)
        return (
            h1[starts],
            h2[starts],
            doc_id[starts],
            score[starts],
            int_segment_sum(n, starts),
        )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PART.empty_table()
        import pyarrow.compute as pc

        norm = pc.replace_substring_regex(
            pc.utf8_lower(pc.fill_null(t.column("text"), "")), r"\s+", " "
        )
        digests = b"".join(
            hashlib.sha256(s.encode()).digest()[:16] for s in norm.to_pylist()
        )
        h = np.frombuffer(digests, dtype="<i8").reshape(-1, 2)
        score = quality_arrays(t.column("text"))["score_e5"]
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        h1, h2, keep, sc, n = _combine(
            h[:, 0].copy(), h[:, 1].copy(), ids, score, np.ones(len(ids), np.int64)
        )
        return pa.table(
            {
                "h1": pa.array(h1),
                "h2": pa.array(h2),
                "doc_id": pa.array(keep),
                "score_e5": pa.array(sc),
                "n": pa.array(n),
                "dshard": pa.array((h1 & (n_shards - 1)).astype(np.int32)),
            }
        )

    def merge_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        _, _, keep, sc, n = _combine(
            g.column("h1").to_numpy(zero_copy_only=False),
            g.column("h2").to_numpy(zero_copy_only=False),
            g.column("doc_id").to_numpy(zero_copy_only=False),
            g.column("score_e5").to_numpy(zero_copy_only=False),
            g.column("n").to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {
                "doc_id": pa.array(keep),
                "score_e5": pa.array(sc),
                "n_copies": pa.array(n),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("dshard")
        .map_groups(merge_shard, batch_format="pyarrow")
        .select_columns(["doc_id", "score_e5", "n_copies"])
    )


def snm_candidate_pairs(
    sf_dir: str, window: int | None = None, key_len: int | None = None
) -> ray.data.Dataset:
    """SORTED-NEIGHBORHOOD (SNM) candidate generation — the classic
    record-linkage blocking method (Hernandez & Stolfo): sort the corpus by
    a normalized blocking key and emit every pair within ``window`` ranks;
    near-duplicates with similar prefixes land adjacent, so candidate
    volume is O(N * window) instead of O(N^2).  Emits
    (doc_a, doc_b, rank_gap, is_dup) with ``is_dup`` = exact
    normalized-text equality (sha256 digests stand in for the texts —
    the repo's established digest-for-text-equality convention, e.g.
    dedup_keep_best / media_exact_dedup).

    Scale shape: the SORT is the algorithm here (contrast the hash-banding
    families above, which avoid it) but it moves only slim
    (16-char key, doc_id, 32-byte digest) rows — texts never shuffle.  The
    windows that STRADDLE sorted-block boundaries are the part Ray Data
    cannot express (map_batches has no neighbor-block visibility), so
    after the sort the blocks stay in the object store and one raw task
    per block receives its block plus the next ``window`` rows assembled
    from the following blocks' heads (lengths known driver-side; only
    <= window boundary rows are ever fetched twice) — the documented
    raw-task escape hatch, same as pagerank's supersteps.  Pairs are
    generated exactly once, by the task owning the lower-ranked row.
    Defaults come from config.SNM_WINDOW / SNM_KEY_LEN (shared with the
    oracle SQL)."""
    import pyarrow.compute as pc

    from invoice_extraction_ray import config

    window = config.SNM_WINDOW if window is None else window
    key_len = config.SNM_KEY_LEN if key_len is None else key_len

    ds = ray.data.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])

    def keyed(t: pa.Table) -> pa.Table:
        import hashlib

        x = pc.fill_null(t.column("text"), "")
        norm = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(pc.utf8_lower(x), r"\s+", " ")
        )
        if isinstance(norm, pa.ChunkedArray):
            norm = norm.combine_chunks()
        key = pc.utf8_slice_codeunits(norm, 0, key_len)
        # sha256 once per DISTINCT norm via the dictionary (batch-bounded);
        # the per-row gather is an Arrow take, not a Python loop
        import pyarrow.compute as pc_

        d = norm.dictionary_encode()
        digs = pa.array(
            [hashlib.sha256(v.encode()).digest() for v in d.dictionary.to_pylist()],
            pa.binary(32),
        )
        dig = pc_.take(digs, d.indices)
        return pa.table(
            {
                "key": key,
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "dig": dig,
            }
        )

    sorted_ds = ds.map_batches(keyed, batch_format="pyarrow").sort(
        ["key", "doc_id"]
    )

    _OUT = pa.schema(
        [
            ("doc_a", pa.int64()),
            ("doc_b", pa.int64()),
            ("rank_gap", pa.int64()),
            ("is_dup", pa.int64()),
        ]
    )

    def pair_fn(t: pa.Table, ia: np.ndarray, ib: np.ndarray, gap: np.ndarray):
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        dig = t.column("dig").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_a": pa.array(ids[ia], pa.int64()),
                "doc_b": pa.array(ids[ib], pa.int64()),
                "rank_gap": pa.array(gap, pa.int64()),
                "is_dup": pa.array((dig[ia] == dig[ib]).astype(np.int64), pa.int64()),
            },
            schema=_OUT,
        )

    return _snm_window_pairs(sorted_ds, window, _OUT, pair_fn)


def _snm_window_pairs(
    sorted_ds: ray.data.Dataset,
    window: int,
    out_schema: pa.Schema,
    pair_fn,
) -> ray.data.Dataset:
    """Shared tail of the sorted-neighborhood family: given a GLOBALLY
    sorted slim dataset, run one raw task per sorted block that sees its
    block plus the next ``window`` rows assembled from the following
    blocks' heads (the boundary-straddling windows Ray Data's map_batches
    cannot express — the documented raw-task escape hatch, same as
    pagerank's supersteps).  Each task builds the (lower-rank, higher-rank)
    index pairs for every gap 1..window and hands them to
    ``pair_fn(concat_table, ia, ib, gap) -> pa.Table`` (schema must equal
    ``out_schema``).  Pairs are generated exactly once, by the task owning
    the lower-ranked row; only <= window boundary rows are ever fetched
    twice."""
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def _len(t: pa.Table) -> int:
        return t.num_rows

    @ray.remote
    def _head(t: pa.Table, k: int) -> pa.Table:
        return t.slice(0, k)

    @ray.remote
    def _pairs(block: pa.Table, *ctx: pa.Table) -> pa.Table:
        if block.num_rows == 0:  # owner block empty (may be zero-column)
            return out_schema.empty_table()
        parts = [block] + [c for c in ctx if c.num_rows]
        t = pa.concat_tables(parts) if len(parts) > 1 else block
        n, m = block.num_rows, t.num_rows
        ia_parts, ib_parts, gap_parts = [], [], []
        for d in range(1, window + 1):
            k = min(n, m - d)
            if k <= 0:
                break
            a = np.arange(k)
            ia_parts.append(a)
            ib_parts.append(a + d)
            gap_parts.append(np.full(k, d, np.int64))
        if not ia_parts:
            return out_schema.empty_table()
        return pair_fn(
            t,
            np.concatenate(ia_parts),
            np.concatenate(ib_parts),
            np.concatenate(gap_parts),
        )

    lens = ray.get([_len.remote(r) for r in refs])
    live = [(r, ln) for r, ln in zip(refs, lens) if ln > 0]
    outs = []
    for i, (r, ln) in enumerate(live):
        # assemble the next `window` rows from the following blocks' heads
        ctx, need, j = [], window, i + 1
        while need > 0 and j < len(live):
            nr, nln = live[j]
            take = min(need, nln)
            ctx.append(_head.remote(nr, take))
            need -= take
            j += 1
        outs.append(_pairs.remote(r, *ctx))
    if not outs:
        return ray.data.from_arrow(out_schema.empty_table())
    return ray.data.from_arrow_refs(outs)


# ---------------------------------------------------------------------------
# edit-distance verified near-dup: SNM blocking + exact byte-Levenshtein —
# the record-linkage VERIFY stage the blocking families above feed (fuzzy
# matching where Jaccard is too coarse: transpositions, small in-place
# edits).  Reference analogue: validators.py's fuzzy master-data match
# (rapidfuzz ratio >= threshold) — reimplemented as exact distance.
# ---------------------------------------------------------------------------


def _lev_batch(M: np.ndarray, lens: np.ndarray, ia: np.ndarray, ib: np.ndarray) -> np.ndarray:
    """Batched exact Levenshtein over padded byte matrices, vectorized
    ACROSS pairs: ``M`` is (rows, W) int16 with UTF-8 byte values and an
    out-of-alphabet pad sentinel; ``lens`` the true byte lengths.  Each
    pair's true distance is the DP value at cell (len_a, len_b) — columns
    <= len_b never see B's padding and rows > len_a are never read, so the
    batch runs the full W rows and each pair's answer is harvested at its
    own row (sentinel values only ever occupy the ignored region).  The
    column-order dependency of the classic DP row is broken with the
    min-plus prefix-scan identity ``D[j] = min_{j'<=j} (T[j'] + (j - j'))``
    — a cummin of ``T - arange`` plus ``arange`` — so the whole batch
    advances one DP row per iteration with no per-pair Python.  Cost
    O(W^2) per pair, W = byte width of the compared prefix (bounded by
    config.EDITDIST_PREFIX * 4)."""
    A, B = M[ia], M[ib]
    n, W = A.shape
    la = lens[ia].astype(np.int64)
    lb = lens[ib].astype(np.int64)
    ar = np.arange(W + 1, dtype=np.int32)
    # equal-rows fast path (duplicate-heavy corpora): distance 0, skip DP
    neq = ~(A == B).all(axis=1)
    out = np.zeros(n, dtype=np.int64)
    if not neq.any():
        return out
    A, B, la_n, lb_n = A[neq], B[neq], la[neq], lb[neq]
    m = len(A)
    res = np.empty(m, dtype=np.int64)
    res[la_n == 0] = lb_n[la_n == 0]  # empty A: distance = len(B)
    rows = np.arange(m)
    D = np.broadcast_to(ar, (m, W + 1)).copy()
    T = np.empty((m, W + 1), np.int32)
    for i in range(1, W + 1):
        sub = (A[:, i - 1 : i] != B).astype(np.int32)
        T[:, 0] = i
        np.minimum(D[:, 1:] + 1, D[:, :-1] + sub, out=T[:, 1:])
        T -= ar
        np.minimum.accumulate(T, axis=1, out=T)
        np.add(T, ar, out=D)
        sel = la_n == i  # harvest pairs whose A ends at this DP row
        if sel.any():
            res[sel] = D[rows[sel], lb_n[sel]].astype(np.int64)
    out[neq] = res
    return out


def editdist_neardup(
    sf_dir: str,
    window: int | None = None,
    key_len: int | None = None,
    prefix: int | None = None,
    max_dist: int | None = None,
) -> ray.data.Dataset:
    """Edit-distance verified near-duplicates: sorted-neighborhood (SNM)
    blocking (same sort + boundary-window machinery as
    ``snm_candidate_pairs``) followed by exact byte-level Levenshtein over
    the first ``prefix`` NORMALIZED characters; pairs within ``max_dist``
    survive.  Output (doc_a, doc_b, rank_gap, dist).

    Conventions shared with the DuckDB oracle via config.py: normalization
    is lower + whitespace-collapse + trim (the snm/text_normalize rule);
    the distance is over UTF-8 BYTES of the char slice because DuckDB's
    ``levenshtein`` counts bytes ('héllo' -> 'hello' = 2); defaults come
    from config.SNM_WINDOW / SNM_KEY_LEN / EDITDIST_PREFIX / EDITDIST_MAX.

    Scale shape: the sort moves only slim (key, doc_id, bounded prefix)
    rows — full texts never shuffle; the verify is fully vectorized across
    pairs (``_lev_batch``) inside the same per-block task that generates
    the window pairs, so candidates are never materialized anywhere."""
    import pyarrow.compute as pc

    from invoice_extraction_ray import config

    window = config.SNM_WINDOW if window is None else window
    key_len = config.SNM_KEY_LEN if key_len is None else key_len
    prefix = config.EDITDIST_PREFIX if prefix is None else prefix
    max_dist = config.EDITDIST_MAX if max_dist is None else max_dist

    ds = ray.data.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])

    def keyed(t: pa.Table) -> pa.Table:
        x = pc.fill_null(t.column("text"), "")
        norm = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(pc.utf8_lower(x), r"\s+", " ")
        )
        if isinstance(norm, pa.ChunkedArray):
            norm = norm.combine_chunks()
        return pa.table(
            {
                "key": pc.utf8_slice_codeunits(norm, 0, key_len),
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "npfx": pc.utf8_slice_codeunits(norm, 0, prefix),
            }
        )

    sorted_ds = ds.map_batches(keyed, batch_format="pyarrow").sort(["key", "doc_id"])

    _OUT = pa.schema(
        [
            ("doc_a", pa.int64()),
            ("doc_b", pa.int64()),
            ("rank_gap", pa.int64()),
            ("dist", pa.int64()),
        ]
    )

    def pair_fn(t: pa.Table, ia: np.ndarray, ib: np.ndarray, gap: np.ndarray):
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        # encode each ROW once (a row joins <= 2*window pairs), gather per pair
        enc = [s.encode() for s in t.column("npfx").to_pylist()]
        lens = np.fromiter((len(b) for b in enc), np.int64, len(enc))
        W = int(lens.max()) if len(lens) else 0
        M = np.full((len(enc), max(W, 1)), 256, np.int16)
        for r, bs in enumerate(enc):
            if bs:
                M[r, : len(bs)] = np.frombuffer(bs, np.uint8)
        # pairs whose byte lengths differ by more than max_dist cannot pass
        okl = np.abs(lens[ia] - lens[ib]) <= max_dist
        ia, ib, gap = ia[okl], ib[okl], gap[okl]
        dist = _lev_batch(M, lens, ia, ib)
        keep = dist <= max_dist
        return pa.table(
            {
                "doc_a": pa.array(ids[ia[keep]], pa.int64()),
                "doc_b": pa.array(ids[ib[keep]], pa.int64()),
                "rank_gap": pa.array(gap[keep], pa.int64()),
                "dist": pa.array(dist[keep], pa.int64()),
            },
            schema=_OUT,
        )

    return _snm_window_pairs(sorted_ds, window, _OUT, pair_fn)


# ---------------------------------------------------------------------------
# approximate-dedup evaluation: precision/recall of the MinHash+LSH pipeline
# against the exact all-pairs ground truth — the audit a 100-TB curation run
# performs on a sample BEFORE committing to a banding configuration (the
# ann_recall_report twin for the dedup family)
# ---------------------------------------------------------------------------


def _exact_shingle_pairs(docs, threshold: float) -> ray.data.Dataset:
    """EXACT pairs with crc32-shingle-set Jaccard >= threshold under the
    minhash verify's rounding rule (round4(i/u) >= t, integer-mirrored as
    2*i*10^4 >= (2*t*10^4 - 1)*u) — the ground truth ``minhash_neardup``
    approximates.  Same inverted-index plan as ``ngram_jaccard_neardup``
    but over int64 shingle hashes (cheaper rows, numeric sort).  Docs with
    ZERO shingles (empty text) emit no postings and are excluded — the
    report's documented contract (data_quality_report audits empties)."""
    thr_e4 = int(round(threshold * 10_000))

    def explode(t: pa.Table) -> pa.Table:
        ids, hs, nhs = [], [], []
        for d, s in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
            h = shingle_hashes(s)
            if h.size == 0:
                continue
            ids.append(np.full(h.size, d, np.int64))
            hs.append(h)
            nhs.append(np.full(h.size, h.size, np.int64))
        if not ids:
            return pa.table(
                {
                    "h": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "nh": pa.array([], pa.int64()),
                    "shard": pa.array([], pa.int32()),
                }
            )
        hv = np.concatenate(hs)
        return pa.table(
            {
                "h": pa.array(hv, pa.int64()),
                "doc_id": pa.array(np.concatenate(ids), pa.int64()),
                "nh": pa.array(np.concatenate(nhs), pa.int64()),
                "shard": pa.array((hv & (N_BUCKET_SHARDS - 1)).astype(np.int32)),
            }
        )

    def emit_pairs(t: pa.Table) -> pa.Table:
        t = _dropg(t, ["shard"])
        hv = t.column("h").to_numpy(zero_copy_only=False)
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        nh = t.column("nh").to_numpy(zero_copy_only=False)
        order = np.lexsort((did, hv))
        hv, did, nh = hv[order], did[order], nh[order]
        new = np.ones(len(hv), dtype=bool)
        new[1:] = hv[1:] != hv[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(hv))
        ia, ib = _expand_runs(did, starts, ends, None)
        return _pair_partials(did[ia], did[ib], {"a_n": nh[ia], "b_n": nh[ib]})

    pairs = _sum_pair_counts(
        docs.map_batches(explode, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(emit_pairs, batch_format="pyarrow"),
        "n_inter",
        ("a_n", "b_n"),
    )

    _OUT = pa.schema([("a_id", pa.int64()), ("b_id", pa.int64())])

    def finish(t: pa.Table) -> pa.Table:
        i = t.column("n_inter").to_numpy(zero_copy_only=False).astype(np.int64)
        u = (
            t.column("a_n").to_numpy(zero_copy_only=False).astype(np.int64)
            + t.column("b_n").to_numpy(zero_copy_only=False).astype(np.int64)
            - i
        )
        keep = (i > 0) & (2 * i * 10_000 >= (2 * thr_e4 - 1) * u)
        return pa.table(
            {
                "a_id": pa.array(
                    t.column("a_id").to_numpy(zero_copy_only=False)[keep], pa.int64()
                ),
                "b_id": pa.array(
                    t.column("b_id").to_numpy(zero_copy_only=False)[keep], pa.int64()
                ),
            },
            schema=_OUT,
        )

    return pairs.map_batches(finish, batch_format="pyarrow")


def neardup_recall_report(
    sf_dir: str, jaccard_threshold: float = 0.8
) -> ray.data.Dataset:
    """Evaluation harness for the approximate dedup pipeline: run BOTH
    ``minhash_neardup`` (LSH banding + exact verify) and the exact
    all-pairs ground truth (``_exact_shingle_pairs``) at the same threshold
    and report one row (n_exact, n_approx, n_hit, precision_e6, recall_e6)
    — the dedup twin of ``ann_recall_report``, the number a 100-TB run
    measures on a sample before trusting a banding configuration (16 bands
    x 4 rows here).  Ratios are floor(x + 0.5) e6 fixed point computed in
    python ints; an empty denominator reports the vacuous 1.0.

    Scale shape: both pair sets are output-bounded; they union with a side
    bit onto the standard pair-shard and each shard reduces to THREE
    counters, so only ~n_shards counter rows reach the driver.  Banding
    recall is 1.0 on this corpus (the pinned minhash_neardup oracle claim),
    which the gate re-proves through this query's composed oracle."""
    import pyarrow.parquet as pq

    from invoice_extraction_ray.ops._util import as_docs_dataset

    # small single-file table read driver-side (the registry's documented
    # convention for this corpus — Ray over-splits tiny files); at real
    # scale feed ray.data.read_parquet output instead.
    docs_tbl = pq.read_table(_pq(sf_dir, "documents"), columns=["doc_id", "text"])
    docs = as_docs_dataset(docs_tbl)

    approx = minhash_neardup(docs_tbl, jaccard_threshold=jaccard_threshold)
    exact = _exact_shingle_pairs(docs, jaccard_threshold)

    def tag(side_bit: int):
        def f(t: pa.Table) -> pa.Table:
            a = t.column("a_id").to_numpy(zero_copy_only=False).astype(np.int64)
            b = t.column("b_id").to_numpy(zero_copy_only=False).astype(np.int64)
            with np.errstate(over="ignore"):
                h = a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + b.astype(
                    np.uint64
                )
                h ^= h >> np.uint64(33)
            return pa.table(
                {
                    "a_id": pa.array(a, pa.int64()),
                    "b_id": pa.array(b, pa.int64()),
                    "bit": pa.array(np.full(len(a), side_bit, np.int64), pa.int64()),
                    "pshard": pa.array(
                        (h & np.uint64(N_BUCKET_SHARDS - 1)).astype(np.int32)
                    ),
                }
            )

        return f

    _CNT = pa.schema([("n_e", pa.int64()), ("n_a", pa.int64()), ("n_h", pa.int64())])

    def count_shard(t: pa.Table) -> pa.Table:
        t = _dropg(t, ["pshard"])
        if t.num_rows == 0:
            return _CNT.empty_table()
        a = t.column("a_id").to_numpy(zero_copy_only=False)
        b = t.column("b_id").to_numpy(zero_copy_only=False)
        bit = t.column("bit").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b, bit = a[order], b[order], bit[order]
        new = np.ones(len(a), dtype=bool)
        new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.flatnonzero(new)
        bits = np.bitwise_or.reduceat(bit, starts)
        return pa.table(
            {
                "n_e": pa.array([int((bits & 1).astype(bool).sum())], pa.int64()),
                "n_a": pa.array([int((bits & 2).astype(bool).sum())], pa.int64()),
                "n_h": pa.array([int((bits == 3).sum())], pa.int64()),
            },
            schema=_CNT,
        )

    tagged = exact.map_batches(tag(1), batch_format="pyarrow").union(
        approx.map_batches(
            lambda t: tag(2)(t.select(["a_id", "b_id"])), batch_format="pyarrow"
        )
    )
    rows = tagged.groupby("pshard").map_groups(
        count_shard, batch_format="pyarrow"
    ).take_all()
    n_e = sum(r["n_e"] for r in rows)
    n_a = sum(r["n_a"] for r in rows)
    n_h = sum(r["n_h"] for r in rows)
    prec = (2 * n_h * 10**6 + n_a) // (2 * n_a) if n_a else 10**6
    rec = (2 * n_h * 10**6 + n_e) // (2 * n_e) if n_e else 10**6
    return ray.data.from_arrow(
        pa.table(
            {
                "n_exact": pa.array([n_e], pa.int64()),
                "n_approx": pa.array([n_a], pa.int64()),
                "n_hit": pa.array([n_h], pa.int64()),
                "precision_e6": pa.array([prec], pa.int64()),
                "recall_e6": pa.array([rec], pa.int64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# dataset versioning: content diff between two corpus snapshots — the
# "what changed since the last crawl/release" audit every versioned
# training-data store needs (added / removed / changed doc ids)
# ---------------------------------------------------------------------------


def dataset_diff(ds_a, ds_b, n_shards: int = 64) -> ray.data.Dataset:
    """Content diff between two document snapshots (``doc_id, text``
    datasets): rows whose id exists only in A (``removed``), only in B
    (``added``), or in both with different text (``changed``) — unchanged
    rows are NOT emitted, so the output is change-bounded, not
    corpus-bounded.

    Scale shape: neither snapshot is assumed small or row-aligned — each
    side maps to slim (doc_id, digest-pair, side) rows (sha256 first 16
    bytes as two int64s, the exact_dedup key trick; texts never shuffle),
    both union into ONE id-shard groupby, and each shard classifies its
    ids with a vectorized sorted sweep.  Equal ids always co-locate, so
    the verdict is exact (up to 2^-128 digest collisions)."""
    import hashlib

    _SLIM = pa.schema(
        [
            ("shard", pa.int32()),
            ("doc_id", pa.int64()),
            ("h1", pa.int64()),
            ("h2", pa.int64()),
            ("side", pa.int8()),
        ]
    )
    _OUT = pa.schema([("doc_id", pa.int64()), ("status", pa.string())])

    def _slim_rows(side_val: int):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return _SLIM.empty_table()
            ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
            digests = b"".join(
                hashlib.sha256((s or "").encode()).digest()[:16]
                for s in t.column("text").to_pylist()
            )
            h = np.frombuffer(digests, dtype="<i8").reshape(-1, 2)
            shard = (((ids * 2654435761) % (1 << 32)) % n_shards).astype(np.int32)
            return pa.table(
                {
                    "shard": pa.array(shard),
                    "doc_id": pa.array(ids, pa.int64()),
                    "h1": pa.array(h[:, 0], pa.int64()),
                    "h2": pa.array(h[:, 1], pa.int64()),
                    "side": pa.array(
                        np.full(len(ids), side_val, dtype=np.int8), pa.int8()
                    ),
                },
                schema=_SLIM,
            )

        return fn

    def classify(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        side = g.column("side").to_numpy(zero_copy_only=False)
        h1 = g.column("h1").to_numpy(zero_copy_only=False)
        h2 = g.column("h2").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, ids))
        ids, side, h1, h2 = ids[order], side[order], h1[order], h2[order]
        new = np.ones(len(ids), dtype=bool)
        new[1:] = ids[1:] != ids[:-1]
        starts = np.flatnonzero(new)
        counts = np.append(starts[1:], len(ids)) - starts
        # VALIDATE the unique-id-per-side precondition: a duplicated id
        # would otherwise silently mislabel or drop a real change
        from ._util import int_segment_sum as _iss

        n1 = _iss(side.astype(np.int64), starts)
        n0 = counts - n1
        if (n0 > 1).any() or (n1 > 1).any():
            bad = ids[starts][(n0 > 1) | (n1 > 1)][:5]
            raise ValueError(
                f"dataset_diff: duplicate doc_ids within one snapshot "
                f"(e.g. {bad.tolist()}) — dedup each snapshot first"
            )
        single = counts == 1
        s_idx = starts[single]
        removed = s_idx[side[s_idx] == 0]
        added = s_idx[side[s_idx] == 1]
        p_idx = starts[~single]  # pairs: sorted (side 0, side 1)
        changed = p_idx[(h1[p_idx] != h1[p_idx + 1]) | (h2[p_idx] != h2[p_idx + 1])]
        out_ids = np.concatenate([ids[removed], ids[added], ids[changed]])
        status = (
            ["removed"] * len(removed)
            + ["added"] * len(added)
            + ["changed"] * len(changed)
        )
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "status": pa.array(status, pa.string()),
            },
            schema=_OUT,
        )

    from ._util import absorb_empty_blocks

    a = ds_a.map_batches(_slim_rows(0), batch_format="pyarrow")
    b = ds_b.map_batches(_slim_rows(1), batch_format="pyarrow")
    return (
        absorb_empty_blocks(a.union(b), batch_size=131072)
        .groupby("shard")
        .map_groups(
            lambda g: classify(_dropg(g, ["shard"])), batch_format="pyarrow"
        )
    )


def snapshot_diff(sf_dir: str, n_shards: int = 64) -> ray.data.Dataset:
    """:func:`dataset_diff` wired to a deterministic 'v2' of the documents
    table (config-shared derivation, SQL-mirrored): every
    ``SNAPSHOT_REMOVED_MOD``-th doc dropped, every ``CHANGED_MOD``-th
    uppercased (docs whose uppercase equals the original — all-caps,
    digits-only — correctly do NOT report as changed: the diff compares
    content, not lineage), and an added doc (id + ``ADDED_OFFSET``,
    'added:'-prefixed text) for every ``ADDED_MOD``-th."""
    import pyarrow.compute as pc

    from ..config import (
        SNAPSHOT_ADDED_MOD,
        SNAPSHOT_ADDED_OFFSET,
        SNAPSHOT_CHANGED_MOD,
        SNAPSHOT_REMOVED_MOD,
    )

    def derive_v2(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        text = pc.fill_null(t.column("text"), "")
        keep = ids % SNAPSHOT_REMOVED_MOD != 0
        kept = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": text}).filter(
            pa.array(keep)
        )
        kids = kept.column("doc_id").to_numpy(zero_copy_only=False)
        ch = pa.array(kids % SNAPSHOT_CHANGED_MOD == 0)
        new_text = pc.if_else(ch, pc.utf8_upper(kept.column("text")), kept.column("text"))
        kept = kept.set_column(1, "text", new_text)
        add_mask = ids % SNAPSHOT_ADDED_MOD == 0
        added = pa.table(
            {
                "doc_id": pa.array(ids[add_mask] + SNAPSHOT_ADDED_OFFSET, pa.int64()),
                "text": pc.binary_join_element_wise(
                    pa.array(["added:"] * int(add_mask.sum()), pa.string()),
                    text.filter(pa.array(add_mask)),
                    "",
                ),
            }
        )
        return pa.concat_tables([kept, added])

    base = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    v2 = base.map_batches(derive_v2, batch_format="pyarrow")
    return dataset_diff(base, v2, n_shards=n_shards)


def apply_changelog(sf_dir: str, n_shards: int = 64) -> ray.data.Dataset:
    """CDC / LSM last-writer-wins merge: apply an ordered changelog of
    upserts and deletes to a base snapshot and emit the resulting snapshot
    (the MERGE INTO / compaction archetype — :func:`dataset_diff`'s inverse:
    diff produces a changelog, this consumes one).  The changelog is the
    deterministic config-derived one (``config.CDC_*``): seq 1 deletes,
    seq 2 upserts (resurrecting ids hit by both — last writer wins), seq 3
    deletes again (update-then-delete), seq 4 inserts brand-new ids.
    Output is the final snapshot as slim ``(doc_id, n_chars)`` rows.

    Scale shape: ONE scan of the base table emits every log record as a
    slim (shard, doc_id, seq, is_del, n_chars) row — texts never shuffle
    (n_chars is computed at the scan; a production changelog would carry a
    payload pointer the same way).  Equal ids co-locate in the single
    id-shard groupby, where a vectorized lexsort-by-(id, seq) + last-of-run
    gather resolves each id to its final version; deletes drop.  Per-shard
    work is O(rows log rows) numpy; nothing id- or corpus-sized on the
    driver."""
    import pyarrow.compute as pc

    from ..config import (
        CDC_DEL2_MOD,
        CDC_DEL_MOD,
        CDC_INS_MOD,
        CDC_INS_OFFSET,
        CDC_UPD_MOD,
    )
    from ._util import absorb_empty_blocks

    _SLIM = pa.schema(
        [
            ("shard", pa.int32()),
            ("doc_id", pa.int64()),
            ("seq", pa.int8()),
            ("is_del", pa.int8()),
            ("n_chars", pa.int64()),
        ]
    )
    _OUT = pa.schema([("doc_id", pa.int64()), ("n_chars", pa.int64())])

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _SLIM.empty_table()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        nc = (
            pc.utf8_length(pc.fill_null(t.column("text"), ""))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        del1 = ids % CDC_DEL_MOD == 0
        upd = ids % CDC_UPD_MOD == 0
        del2 = ids % CDC_DEL2_MOD == 0
        ins = ids % CDC_INS_MOD == 0
        out_ids = np.concatenate(
            [ids, ids[del1], ids[upd], ids[del2], ids[ins] + CDC_INS_OFFSET]
        )
        out_seq = np.concatenate(
            [
                np.zeros(len(ids), np.int8),
                np.full(int(del1.sum()), 1, np.int8),
                np.full(int(upd.sum()), 2, np.int8),
                np.full(int(del2.sum()), 3, np.int8),
                np.full(int(ins.sum()), 4, np.int8),
            ]
        )
        out_del = np.concatenate(
            [
                np.zeros(len(ids), np.int8),
                np.ones(int(del1.sum()), np.int8),
                np.zeros(int(upd.sum()), np.int8),
                np.ones(int(del2.sum()), np.int8),
                np.zeros(int(ins.sum()), np.int8),
            ]
        )
        out_nc = np.concatenate(
            [
                nc,
                np.zeros(int(del1.sum()), np.int64),
                nc[upd] + 4,  # 'upd:' prefix
                np.zeros(int(del2.sum()), np.int64),
                nc[ins] + 4,  # 'ins:' prefix
            ]
        )
        return pa.table(
            {
                "shard": pa.array(
                    (((out_ids * 2654435761) % (1 << 32)) % n_shards).astype(
                        np.int32
                    )
                ),
                "doc_id": pa.array(out_ids, pa.int64()),
                "seq": pa.array(out_seq, pa.int8()),
                "is_del": pa.array(out_del, pa.int8()),
                "n_chars": pa.array(out_nc, pa.int64()),
            },
            schema=_SLIM,
        )

    def resolve(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        seq = g.column("seq").to_numpy(zero_copy_only=False)
        isd = g.column("is_del").to_numpy(zero_copy_only=False)
        nc = g.column("n_chars").to_numpy(zero_copy_only=False)
        order = np.lexsort((seq, ids))
        ids, seq, isd, nc = ids[order], seq[order], isd[order], nc[order]
        new = np.ones(len(ids), dtype=bool)
        new[1:] = ids[1:] != ids[:-1]
        last = np.append(np.flatnonzero(new)[1:], len(ids)) - 1
        live = isd[last] == 0
        keep = last[live]
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "n_chars": pa.array(nc[keep], pa.int64()),
            },
            schema=_OUT,
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(slim, batch_format="pyarrow")
    return absorb_empty_blocks(ds, batch_size=131072).groupby("shard").map_groups(
        lambda g: resolve(_dropg(g, ["shard"])), batch_format="pyarrow"
    )


def dup_group_histogram(
    ds, text_col: str = "text", n_shards: int = 64
) -> ray.data.Dataset:
    """Exact-duplicate GROUP-SIZE histogram: how many distinct contents
    appear exactly k times — the corpus-duplication profile (the first
    number a 10^12-turn dedup plan needs: how much of the corpus is
    boilerplate repetition vs unique content).  ``(group_size, n_groups)``
    rows, ascending.

    Scale shape: contents reduce to sha256-16-byte digest pairs at the
    scan (texts never shuffle; NULL conflates with '' — the oracle
    mirrors via coalesce); equal digests co-locate in ONE digest-shard
    groupby; each shard run-counts its digests and collapses immediately
    to its own (k, count) histogram partials, so the final groupby sees
    only histogram rows — nothing content- or group-scaled moves twice."""
    import hashlib

    import pyarrow.compute as pc

    from ._util import absorb_empty_blocks, int_bincount

    _SLIM = pa.schema(
        [("dshard", pa.int32()), ("h1", pa.int64()), ("h2", pa.int64())]
    )
    _PART = pa.schema([("group_size", pa.int64()), ("n", pa.int64())])
    _OUT = pa.schema([("group_size", pa.int64()), ("n_groups", pa.int64())])

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _SLIM.empty_table()
        texts = pc.fill_null(t.column(text_col), "").to_pylist()
        digests = b"".join(
            hashlib.sha256(s.encode()).digest()[:16] for s in texts
        )
        h = np.frombuffer(digests, dtype="<i8").reshape(-1, 2)
        return pa.table(
            {
                "dshard": pa.array(
                    ((h[:, 0] & 0x7FFFFFFF) % n_shards).astype(np.int32)
                ),
                "h1": pa.array(h[:, 0], pa.int64()),
                "h2": pa.array(h[:, 1], pa.int64()),
            },
            schema=_SLIM,
        )

    def shard_hist(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _PART.empty_table()
        h1 = g.column("h1").to_numpy(zero_copy_only=False)
        h2 = g.column("h2").to_numpy(zero_copy_only=False)
        order = np.lexsort((h2, h1))
        h1, h2 = h1[order], h2[order]
        new = np.ones(len(h1), dtype=bool)
        new[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        starts = np.flatnonzero(new)
        k = np.append(starts[1:], len(h1)) - starts
        dense = int_bincount(k, np.ones(len(k), dtype=np.int64))
        sizes = np.flatnonzero(dense)
        return pa.table(
            {
                "group_size": pa.array(sizes.astype(np.int64), pa.int64()),
                "n": pa.array(dense[sizes], pa.int64()),
            },
            schema=_PART,
        )

    def finish(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        return pa.table(
            {
                "group_size": pa.array(
                    [int(g.column("group_size")[0].as_py())], pa.int64()
                ),
                "n_groups": pa.array(
                    [int(np.sum(g.column("n").to_numpy(zero_copy_only=False),
                                dtype=np.int64))],
                    pa.int64(),
                ),
            },
            schema=_OUT,
        )

    s = ds.map_batches(slim, batch_format="pyarrow")
    return (
        absorb_empty_blocks(s, batch_size=131072)
        .groupby("dshard")
        .map_groups(lambda g: shard_hist(_dropg(g, ["dshard"])), batch_format="pyarrow")
        .groupby("group_size")
        .map_groups(finish, batch_format="pyarrow")
    )
