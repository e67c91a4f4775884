"""Similarity search over an embedding column (list<float>).

- ``ann_topk``: brute-force cosine top-k — the exactness baseline.  The query
  matrix is broadcast once (ray.put) and every batch does one numpy matmul;
  global top-k via sort + limit (SQL-oracled with list_cosine_similarity).
- ``lsh_topk``: the scale path — random-hyperplane LSH bucketing; queries probe
  only matching buckets (multi-probe over Hamming-1 neighbors).  Approximate by
  design; tests measure recall vs the brute-force baseline.
"""

from __future__ import annotations

from ._util import embedding_matrix

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ._util import drop_if_present as _dropg


def _pq(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def _load_query_vec(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    """Query-vector point lookup with parquet predicate pushdown: only row
    groups whose statistics admit ``vec_id`` are decoded — the driver never
    reads the fact table (at 100 TB of embeddings an unfiltered read_table
    here would OOM the driver before the pipeline starts)."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        _pq(sf_dir, "embeddings"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "==", vec_id)],
    )
    ids = tbl.column("vec_id").to_pylist()
    if vec_id not in ids:
        raise ValueError(
            f"query vec_id {vec_id} not found in {_pq(sf_dir, 'embeddings')} "
            "— the corpus may be empty or the id wrong; similarity queries "
            "need an existing query vector"
        )
    return np.asarray(tbl.column("embedding")[ids.index(vec_id)].as_py(), dtype=np.float64)


def ann_topk(sf_dir: str, k: int = 10, query_vec_id: int = 0) -> ray.data.Dataset:
    """Exact cosine top-k of every vector vs the query (vec_id=0's embedding)."""
    q = _load_query_vec(sf_dir, query_vec_id)
    qn = q / max(np.linalg.norm(q), 1e-30)
    q_ref = ray.put(qn)

    def score(t: pa.Table) -> pa.Table:
        # stateless task map: the broadcast query is a per-batch plasma get
        # (zero-copy, one physical copy per node) — no actor pool needed
        qv = ray.get(q_ref)
        m = embedding_matrix(t.column("embedding"), dim=len(qv))
        norms = np.maximum(np.linalg.norm(m, axis=1), 1e-30)
        sims = (m @ qv) / norms
        return pa.table({"vec_id": t.column("vec_id"), "sim": pa.array(sims)})

    ds = ray.data.read_parquet(_pq(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    scored = ds.map_batches(score, batch_format="pyarrow")
    top = scored.sort(["sim", "vec_id"], descending=[True, False]).limit(k)

    def to_e4(t: pa.Table) -> pa.Table:
        # fixed-point 1e-4 units: float round-trips differ between engines
        e4 = pc.cast(
            pc.round(
                pc.multiply(t.column("sim"), 10_000.0),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table({"vec_id": t.column("vec_id"), "sim_e4": e4})

    return top.map_batches(to_e4, batch_format="pyarrow")


def ann_topk_multi(
    sf_dir: str, k: int = 5, n_queries: int = 8
) -> ray.data.Dataset:
    """Batched MULTI-query exact cosine top-k — the realistic serving shape:
    the whole query matrix is broadcast once (ray.put) and every corpus batch
    does ONE matmul for all queries; each batch keeps only its own per-query
    top-k (a valid combiner under the (sim_e4 desc, vec_id asc) total order),
    and a tiny per-query groupby finishes.  Shuffled rows = k x queries x
    blocks, never the corpus."""
    import pyarrow.parquet as pq

    # predicate-pushdown read of JUST the query rows (row-group pruned)
    qt = pq.read_table(
        _pq(sf_dir, "embeddings"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", n_queries)],
    )
    q_ids = qt.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    qm = embedding_matrix(qt.column("embedding"))
    qm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-30)
    state_ref = ray.put((q_ids, qm))

    def multi_score(t: pa.Table) -> pa.Table:
        b_q_ids, b_qm = ray.get(state_ref)  # plasma zero-copy per batch
        m = embedding_matrix(t.column("embedding"), dim=b_qm.shape[1])
        vid = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        sims = mn @ b_qm.T  # |batch| x n_queries
        e4 = np.floor(sims * 10_000.0 + 0.5).astype(np.int64)
        out_q, out_v, out_s = [], [], []
        kk = min(k, len(vid))
        for j, qid in enumerate(b_q_ids):
            col = e4[:, j]
            # partial top-k with the global tie-break (e4 desc, vec_id asc)
            order = np.lexsort((vid, -col))[:kk]
            out_q.extend([qid] * kk)
            out_v.extend(vid[order])
            out_s.extend(col[order])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim_e4": pa.array(out_s, pa.int64()),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        t = t.sort_by([("sim_e4", "descending"), ("vec_id", "ascending")])
        return t.slice(0, k)

    ds = ray.data.read_parquet(_pq(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    return (
        ds.map_batches(multi_score, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(finish, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# LSH-bucketed variant (scale path)
# ---------------------------------------------------------------------------

_N_PLANES = 6
_plane_rng = np.random.RandomState(987654321)  # fixed model parameters


def _planes(dim: int) -> np.ndarray:
    rng = np.random.RandomState(987654321)
    return rng.normal(size=(_N_PLANES, dim))


def _bucket_of(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (mat @ planes.T) > 0
    return (bits.astype(np.int64) * (1 << np.arange(_N_PLANES, dtype=np.int64))).sum(axis=1)


def _kmeans_lite(mat: np.ndarray, n_list: int, iters: int = 8) -> np.ndarray:
    """Deterministic mini k-means for IVF coarse centroids (seeded init from
    evenly-spaced sample rows; no RNG over data)."""
    idx = np.linspace(0, len(mat) - 1, n_list).astype(np.int64)
    cents = mat[idx].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ cents.T, axis=1)  # cosine on unit vectors
        for c in range(n_list):
            members = mat[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cents[c] = m / max(np.linalg.norm(m), 1e-30)
    return cents


_IVF_TRAIN_CAP = 4096  # max sample rows ever collected for centroid training
_IVF_SAMPLE_DENOM = 3  # deterministic hash-sample rate (1/denom)


_train_sample_cache: dict[str, np.ndarray] = {}


def _train_sample(sf_dir: str) -> np.ndarray:
    """Bounded deterministic training sample (normalized rows) — a Ray-side
    hash-filter + limit, so only <= _IVF_TRAIN_CAP sample rows ever reach the
    driver regardless of corpus size.  Shared by ``ivf_topk``,
    ``kmeans_clusters``, ``pq_topk`` and ``semantic_neardup``; the
    sf0.01-pinned oracles re-derive the identical sample from the same
    rules.  Memoized per sf_dir (a pure deterministic function of the
    corpus, so caching cannot change any result; four query families
    otherwise recollect the identical sample)."""
    cached = _train_sample_cache.get(sf_dir)
    if cached is not None:
        return cached
    ds_sample = ray.data.read_parquet(_pq(sf_dir, "embeddings"), columns=["vec_id", "embedding"])

    def hash_sample(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ((ids * 2654435761) % (1 << 32)) % _IVF_SAMPLE_DENOM == 0
        return t.filter(pa.array(keep))

    def keep_smallest(t: pa.Table) -> pa.Table:
        # per-batch partial top-k on vec_id asc: a valid combiner for "the
        # cap smallest vec_ids", so the training set is ORDER-DETERMINISTIC
        # even when the cap binds (block-arrival order can never change it)
        t = t.sort_by([("vec_id", "ascending")])
        return t.slice(0, _IVF_TRAIN_CAP)

    from ._util import absorb_empty_blocks

    rows = (
        # coalesce the per-batch top-k partials before the global sort: the
        # sort's input is <= blocks x cap SMALL rows and its cost at bench
        # scale is per-task dispatch, not data
        absorb_empty_blocks(
            ds_sample.map_batches(hash_sample, batch_format="pyarrow").map_batches(
                keep_smallest, batch_format="pyarrow"
            ),
            batch_size=131072,
        )
        .sort("vec_id")
        .limit(_IVF_TRAIN_CAP)
        .take_all()
    )
    # driver-side re-sort is a no-op safety net (<= cap rows)
    rows.sort(key=lambda r: r["vec_id"])
    sample = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-30)
    _train_sample_cache[sf_dir] = sample
    return sample


def _train_centroids(sf_dir: str, n_list: int) -> np.ndarray:
    """Coarse k-means centroid model over the bounded deterministic sample."""
    return _kmeans_lite(_train_sample(sf_dir), n_list)


def kmeans_clusters(sf_dir: str, n_clusters: int = 8) -> ray.data.Dataset:
    """Semantic clustering of the embedding corpus: assign EVERY vector to its
    nearest k-means centroid (cosine; centroids are unit vectors, so argmax of
    the raw dot product — normalization-invariant, matching the SQL oracle's
    list_dot_product argmax with numpy's first-max tie-break).

    The building block for semantic dedup / data-mixing curricula: train on a
    bounded sample, broadcast the tiny centroid model once (ray.put), stream
    the corpus through a stateless task map with one matmul per batch.
    Returns (vec_id, cluster) for every vector, sorted by vec_id."""
    cents = _train_centroids(sf_dir, n_clusters)
    dim = cents.shape[1]
    cents_ref = ray.put(cents)

    def assign(t: pa.Table) -> pa.Table:
        bc = ray.get(cents_ref)  # plasma zero-copy per batch
        m = embedding_matrix(t.column("embedding"), dim=dim)
        a = np.argmax(m @ bc.T, axis=1).astype(np.int64)
        return pa.table(
            {"vec_id": t.column("vec_id"), "cluster": pa.array(a, pa.int64())}
        )

    ds = ray.data.read_parquet(_pq(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    return ds.map_batches(assign, batch_format="pyarrow").sort("vec_id")


def ivf_topk(
    sf_dir: str,
    k: int = 10,
    query_vec_id: int = 0,
    n_list: int = 16,
    n_probe: int = 4,
) -> ray.data.Dataset:
    """IVF (inverted-file) ANN: coarse k-means centroids partition the corpus;
    queries score only vectors whose nearest centroid is among the query's
    ``n_probe`` closest centroids.  The centroid model is trained once from a
    bounded deterministic sample (``_train_centroids``) then broadcast; each
    batch does two matmuls (assign + score)."""
    cents = _train_centroids(sf_dir, n_list)

    q = _load_query_vec(sf_dir, query_vec_id)
    qn = q / max(np.linalg.norm(q), 1e-30)
    probe = set(np.argsort(-(cents @ qn))[:n_probe].tolist())
    state_ref = ray.put((qn, cents, probe))

    def ivf_score(t: pa.Table) -> pa.Table:
        bq, bcents, bprobe = ray.get(state_ref)  # plasma zero-copy per batch
        m = embedding_matrix(t.column("embedding"), dim=len(bq))
        vid = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        assign = np.argmax(mn @ bcents.T, axis=1)
        mask = np.isin(assign, list(bprobe))
        sims = mn[mask] @ bq
        return pa.table(
            {
                "vec_id": pa.array(vid[mask]),
                "sim_e4": pa.array(np.floor(sims * 10_000.0 + 0.5).astype(np.int64)),
            }
        )

    ds = ray.data.read_parquet(_pq(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    scored = ds.map_batches(ivf_score, batch_format="pyarrow")
    return scored.sort(["sim_e4", "vec_id"], descending=[True, False]).limit(k)


def lsh_topk(sf_dir: str, k: int = 10, query_vec_id: int = 0) -> ray.data.Dataset:
    """Approximate top-k: score only vectors whose LSH bucket is within
    Hamming distance 1 of the query's bucket (multi-probe)."""
    q = _load_query_vec(sf_dir, query_vec_id)
    qn = q / max(np.linalg.norm(q), 1e-30)
    planes = _planes(q.shape[0])
    q_bucket = int(_bucket_of(qn[None, :], planes)[0])
    # multi-probe out to Hamming radius 2 (~1/3 of buckets): random-vector
    # corpora have near-orthogonal neighbors, so radius-1 probing misses badly
    probe = {q_bucket}
    for i in range(_N_PLANES):
        probe.add(q_bucket ^ (1 << i))
        for j in range(i + 1, _N_PLANES):
            probe.add(q_bucket ^ (1 << i) ^ (1 << j))
    state_ref = ray.put((qn, planes, probe))

    def probe_score(t: pa.Table) -> pa.Table:
        bq, bplanes, bprobe = ray.get(state_ref)  # plasma zero-copy per batch
        m = embedding_matrix(t.column("embedding"), dim=len(bq))
        vid = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        norms = np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        mn = m / norms
        buckets = _bucket_of(mn, bplanes)
        mask = np.isin(buckets, list(bprobe))
        sims = mn[mask] @ bq
        return pa.table(
            {
                "vec_id": pa.array(vid[mask]),
                "sim_e4": pa.array(np.floor(sims * 10_000.0 + 0.5).astype(np.int64)),
            }
        )

    ds = ray.data.read_parquet(_pq(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    scored = ds.map_batches(probe_score, batch_format="pyarrow")
    return scored.sort(["sim_e4", "vec_id"], descending=[True, False]).limit(k)


# ---------------------------------------------------------------------------
# Product quantization (memory-compression scale path)
# ---------------------------------------------------------------------------

_PQ_M = 8  # subspaces
_PQ_KSUB = 16  # codewords per sub-quantizer (a 4-bit code per subspace)


def _kmeans_l2(mat: np.ndarray, k: int, iters: int = 8) -> np.ndarray:
    """Deterministic plain-L2 k-means for PQ sub-quantizer codebooks (seeded
    evenly-spaced init, first-min argmin ties).  Unlike ``_kmeans_lite`` the
    inputs are subspace SLICES, not unit vectors, so centroids are plain means
    and assignment is Euclidean."""
    idx = np.linspace(0, len(mat) - 1, k).astype(np.int64)
    cents = mat[idx].copy()
    for _ in range(iters):
        # argmin ||x-c||^2 == argmin(||c||^2 - 2 x.c); ||x||^2 is constant/row
        cost = (cents * cents).sum(axis=1)[None, :] - 2.0 * (mat @ cents.T)
        assign = np.argmin(cost, axis=1)
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def _pq_codebooks(sf_dir: str, m: int = _PQ_M, ksub: int = _PQ_KSUB) -> list[np.ndarray]:
    """Per-subspace codebooks trained on the bounded deterministic sample.
    The whole model is m*ksub*(dim/m) floats — a few KB, broadcast once."""
    sample = _train_sample(sf_dir)
    sub = sample.shape[1] // m
    return [_kmeans_l2(sample[:, j * sub : (j + 1) * sub], ksub) for j in range(m)]


def pq_topk(
    sf_dir: str, k: int = 10, query_vec_id: int = 0, m: int = _PQ_M, ksub: int = _PQ_KSUB
) -> ray.data.Dataset:
    """Product-quantization ANN with asymmetric-distance (ADC) scoring — the
    memory-compression scale path: at 100 TB the corpus is stored as tiny
    codes (here 8x4 bits per 64-dim float32 vector, a 64x compression), and a query
    scores a vector with m integer TABLE LOOKUPS instead of a d-dim matmul.

    Shape: train per-subspace codebooks on the bounded sample, broadcast the
    tiny model + the query's per-codeword lookup table once (ray.put); each
    corpus batch encodes (one small matmul per subspace, argmin over
    fixed-point e7 cost integers so assignment is engine/oracle-exact) and
    accumulates the e6-integer LUT scores.  Only (vec_id, score) rows ever
    shuffle; sort+limit finishes.  Approximate by design — tests measure
    recall vs the brute-force baseline; the SQL oracle mirrors codebook
    literals, e7 cost argmin (first-min ties) and integer LUT sums exactly.
    """
    books = _pq_codebooks(sf_dir, m, ksub)
    sub = books[0].shape[1]
    q = _load_query_vec(sf_dir, query_vec_id)
    qn = q / max(np.linalg.norm(q), 1e-30)
    # ||c||^2/2 enters the encoding cost; LUT = e6 fixed-point <q_sub, c>
    cn2h = [(b * b).sum(axis=1) / 2.0 for b in books]
    luts = [
        np.floor((b @ qn[j * sub : (j + 1) * sub]) * 1e6 + 0.5).astype(np.int64)
        for j, b in enumerate(books)
    ]
    state_ref = ray.put((books, cn2h, luts, sub))

    def encode_score(t: pa.Table) -> pa.Table:
        bbooks, bcn, bluts, bsub = ray.get(state_ref)  # plasma zero-copy
        x = embedding_matrix(t.column("embedding"), dim=bsub * len(bbooks))
        nrm = np.maximum(np.linalg.norm(x, axis=1), 1e-30)
        score = np.zeros(x.shape[0], dtype=np.int64)
        for j, bk in enumerate(bbooks):
            dots = x[:, j * bsub : (j + 1) * bsub] @ bk.T
            # encoding cost of codeword c for unit-normalized x_sub:
            # ||x_sub - c||^2/2 - const == ||c||^2/2 - <x_sub, c>; e7
            # fixed-point so the oracle's argmin sees the SAME integers
            cost = np.floor((bcn[j][None, :] - dots / nrm[:, None]) * 1e7 + 0.5).astype(
                np.int64
            )
            codes = np.argmin(cost, axis=1)  # first-min tie-break
            score += bluts[j][codes]
        return pa.table(
            {"vec_id": t.column("vec_id"), "score_e6": pa.array(score, pa.int64())}
        )

    ds = ray.data.read_parquet(_pq(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    scored = ds.map_batches(encode_score, batch_format="pyarrow")
    return scored.sort(["score_e6", "vec_id"], descending=[True, False]).limit(k)


def embedding_quantize(sf_dir: str) -> ray.data.Dataset:
    """Symmetric per-vector int8 quantization of the embedding corpus — the
    storage-compression step before an index build (4x smaller than float32,
    16x smaller than float64).  Pure stateless map: scale = max|x| per vector,
    q_i = floor(x_i / scale * 127 + 0.5) (half-up toward +inf on BOTH sides of
    zero — the same floor(v + 0.5) convention the SQL oracle reproduces), plus
    the e6 fixed-point scale needed to dequantize.  Output is flattened to
    (vec_id, dim_idx, q) rows so the value gate compares scalars, not lists;
    at 100 TB the same map would emit fixed-size-list columns instead."""
    ds = ray.data.read_parquet(_pq(sf_dir, "embeddings"), columns=["vec_id", "embedding"])

    def quantize(t: pa.Table) -> pa.Table:
        m = embedding_matrix(t.column("embedding"))
        vid = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if m.size == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "dim_idx": pa.array([], pa.int64()),
                    "q": pa.array([], pa.int64()),
                    "scale_e6": pa.array([], pa.int64()),
                }
            )
        scale = np.maximum(np.abs(m).max(axis=1), 1e-30)
        q = np.floor(m / scale[:, None] * 127.0 + 0.5).astype(np.int64)
        n, d = q.shape
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(vid, d), pa.int64()),
                "dim_idx": pa.array(np.tile(np.arange(d, dtype=np.int64), n), pa.int64()),
                "q": pa.array(q.reshape(-1), pa.int64()),
                "scale_e6": pa.array(
                    np.repeat(np.floor(scale * 1e6 + 0.5).astype(np.int64), d), pa.int64()
                ),
            }
        )

    return ds.map_batches(quantize, batch_format="pyarrow")


def ann_recall_report(sf_dir: str, k: int = 10) -> pa.Table:
    """Index-quality evaluation harness: recall@k of each approximate index
    (IVF, LSH, PQ) against the exact brute-force top-k for the standard
    query.  The per-index pipelines stream the corpus exactly as their
    standalone queries do; only the k-row result sets reach the driver, so
    the report is bounded regardless of corpus size (at 100 TB this is how
    an index build is accepted before serving).  The SQL oracle nests the
    four already-value-verified per-index oracles and intersects them."""
    exact = {r["vec_id"] for r in ann_topk(sf_dir, k).take_all()}
    rows = []
    for name, fn in (("ivf", ivf_topk), ("lsh", lsh_topk), ("pq", pq_topk)):
        got = {r["vec_id"] for r in fn(sf_dir, k).take_all()}
        hits = len(got & exact)
        rows.append((name, hits, int(np.floor(10000.0 * hits / k + 0.5))))
    rows.sort()
    return pa.table(
        {
            "index_name": pa.array([r[0] for r in rows], pa.string()),
            "hits": pa.array([r[1] for r in rows], pa.int64()),
            "recall_e4": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def ann_range_search(
    sf_dir: str, threshold_e4: int = 2000, query_vec_id: int = 0
) -> ray.data.Dataset:
    """Range (threshold) similarity search: every vector whose cosine vs the
    query clears ``threshold_e4`` fixed-point units — the radius-query twin
    of ``ann_topk`` for dedup-style "find ALL matches" workloads.  Unlike
    top-k there is no global sort and no per-block partial state: one
    broadcast of the normalized query, one matmul per batch, and an
    output-bounded in-batch filter — the corpus streams through untouched.
    The threshold compares INTEGER e4 units on both engines, so no float
    boundary row can split the result sets."""
    q = _load_query_vec(sf_dir, query_vec_id)
    qn = q / max(np.linalg.norm(q), 1e-30)
    q_ref = ray.put(qn)

    def score_filter(t: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)  # plasma zero-copy per batch
        m = embedding_matrix(t.column("embedding"), dim=len(qv))
        norms = np.maximum(np.linalg.norm(m, axis=1), 1e-30)
        sims = (m @ qv) / norms
        e4 = pc.cast(
            pc.round(
                pc.multiply(pa.array(sims), 10_000.0),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        keep = pc.greater_equal(e4, threshold_e4)
        return pa.table(
            {"vec_id": t.column("vec_id"), "sim_e4": e4}
        ).filter(keep)

    ds = ray.data.read_parquet(_pq(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    return ds.map_batches(score_filter, batch_format="pyarrow")


PROJ_DIM = 8
_PROJ_SEED = 246813579


def _proj_matrix(dim: int) -> np.ndarray:
    """Fixed seeded Gaussian projection matrix (model parameters, not RNG
    over data — identical on every worker and inlined as literals in the
    SQL oracle)."""
    return np.random.RandomState(_PROJ_SEED).normal(size=(PROJ_DIM, dim))


def embedding_project(sf_dir: str) -> ray.data.Dataset:
    """Random-projection dimensionality reduction (Johnson-Lindenstrauss):
    64-dim embeddings -> PROJ_DIM float features, the standard shrink step
    before an index build or clustering pass.  Stateless task map: the
    seeded projection matrix is a closure constant (model parameters, same
    bytes everywhere), each batch does PROJ_DIM vectorized row-sums.

    EXACTNESS: each output component is computed as an elementwise product
    followed by ``.sum(axis=1)`` — numpy sums <=128 elements sequentially
    (pairwise blocking starts above that), which is the same left-to-right
    fold DuckDB's ``list_dot_product`` uses, so the e6 fixed-point outputs
    are bit-identical.  Output flattened to (vec_id, dim_idx, y_e6) scalar
    rows for the value gate; at 100 TB the map would emit
    fixed-size-list columns instead."""
    ds = ray.data.read_parquet(_pq(sf_dir, "embeddings"), columns=["vec_id", "embedding"])

    def project(t: pa.Table) -> pa.Table:
        m = embedding_matrix(t.column("embedding"))
        vid = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if m.size == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "dim_idx": pa.array([], pa.int64()),
                    "y_e6": pa.array([], pa.int64()),
                }
            )
        P = _proj_matrix(m.shape[1])
        n = len(vid)
        y = np.empty((n, PROJ_DIM), dtype=np.float64)
        for j in range(PROJ_DIM):  # sequential-sum per component (see above)
            y[:, j] = (m * P[j][None, :]).sum(axis=1)
        e6 = np.floor(y * 1e6 + 0.5).astype(np.int64)
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(vid, PROJ_DIM), pa.int64()),
                "dim_idx": pa.array(
                    np.tile(np.arange(PROJ_DIM, dtype=np.int64), n), pa.int64()
                ),
                "y_e6": pa.array(e6.reshape(-1), pa.int64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


def label_centroids(sf_dir: str) -> ray.data.Dataset:
    """Per-label embedding centroid as EXACT integer partial sums — the
    cluster-statistics primitive behind balanced sampling, domain-drift
    detection and SemDeDup-style cluster pruning.

    Each batch rounds components to e6 fixed point (``floor(x*1e6 + 0.5)``
    after a float32->float64 cast, which is exact, so numpy and DuckDB round
    identically) and emits one (label, dim_idx, n, sum_e6) partial row per
    PRESENT label x dimension — |labels| * dim rows per block, never the
    vectors.  A 64-way shard groupby merges partials with exact int64
    segment sums.  The mean is ``sum_e6 / n``, left undivided: integer
    floor-vs-truncate division differs between engines on negative sums,
    and the (sum, n) pair is the mergeable form a 100 TB run would
    checkpoint anyway."""
    ds = ray.data.read_parquet(_pq(sf_dir, "embeddings"), columns=["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        m = embedding_matrix(t.column("embedding"))
        empty = pa.table(
            {
                "label": pa.array([], pa.int64()),
                "dim_idx": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "sum_e6": pa.array([], pa.int64()),
                "cshard": pa.array([], pa.int32()),
            }
        )
        if m.size == 0:
            return empty
        d = m.shape[1]
        e6 = np.floor(m * 1e6 + 0.5).astype(np.int64)
        labels = t.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), d), dtype=np.int64)
        np.add.at(sums, inv, e6)
        counts = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(counts, inv, 1)
        lab = np.repeat(uniq, d)
        dim = np.tile(np.arange(d, dtype=np.int64), len(uniq))
        return pa.table(
            {
                "label": pa.array(lab, pa.int64()),
                "dim_idx": pa.array(dim, pa.int64()),
                "n": pa.array(np.repeat(counts, d), pa.int64()),
                "sum_e6": pa.array(sums.reshape(-1), pa.int64()),
                "cshard": pa.array(((lab * d + dim) & 63).astype(np.int32), pa.int32()),
            }
        )

    def reduce_shard(g: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [
                ("label", pa.int64()),
                ("dim_idx", pa.int64()),
                ("n", pa.int64()),
                ("sum_e6", pa.int64()),
            ]
        )
        if g.num_rows == 0:
            return out_schema.empty_table()
        g = g.sort_by([("label", "ascending"), ("dim_idx", "ascending")])
        lab = g.column("label").to_numpy(zero_copy_only=False)
        dim = g.column("dim_idx").to_numpy(zero_copy_only=False)
        new = np.ones(g.num_rows, dtype=bool)
        new[1:] = (lab[1:] != lab[:-1]) | (dim[1:] != dim[:-1])
        starts = np.flatnonzero(new)
        from ._util import int_segment_sum

        return pa.table(
            {
                "label": pa.array(lab[starts], pa.int64()),
                "dim_idx": pa.array(dim[starts], pa.int64()),
                "n": pa.array(
                    int_segment_sum(g.column("n").to_numpy(zero_copy_only=False), starts),
                    pa.int64(),
                ),
                "sum_e6": pa.array(
                    int_segment_sum(
                        g.column("sum_e6").to_numpy(zero_copy_only=False), starts
                    ),
                    pa.int64(),
                ),
            }
        )

    from ._util import absorb_empty_blocks

    # single-file parquet reads over-split into skinny blocks and the
    # partial map multiplies rows x (labels*dim) — coalesce the skinny
    # partial blocks so the shard groupby pays per-task dispatch once
    # (the source_cap fix, CLAUDE.md)
    partials = absorb_empty_blocks(
        ds.map_batches(partial, batch_format="pyarrow"), batch_size=131072
    )
    return partials.groupby("cshard").map_groups(
        reduce_shard, batch_format="pyarrow"
    )


KNN_GRAPH_MAX_ROWS = 1 << 18


def knn_graph(
    sf_dir: str, k: int = 5, max_rows: int = KNN_GRAPH_MAX_ROWS
) -> ray.data.Dataset:
    """Exact k-NN GRAPH over the embedding corpus — every vector's top-k
    cosine neighbors (self excluded): the building block of SemDeDup-style
    curation, curriculum ordering, and graph-based label propagation.

    Ranking is by FIXED-POINT e4 similarity with neighbor-id tie-break — a
    total order both engines compute identically (float-rank near-ties on
    planted exact-duplicate vectors would otherwise split the engines on
    1-ulp noise).

    Scale: O(N^2) by construction, guarded by ``max_rows`` (parquet
    metadata, no data read) exactly like ops.dedup.embedding_neardup; past
    the cap use ivf_topk / lsh_topk probes or cluster-blocked candidate
    generation (semantic_neardup's shape) for an approximate graph.  Below
    it: matrix broadcast once (one copy per node), one matmul + one
    stable argsort per batch, output k rows per vector."""
    import pyarrow.parquet as pq

    path = _pq(sf_dir, "embeddings")
    n_rows = pq.ParquetFile(path).metadata.num_rows
    if n_rows > max_rows:
        raise ValueError(
            f"knn_graph is the exact O(N^2) small-corpus tool: {path} has "
            f"{n_rows} rows > max_rows={max_rows}. Build an approximate "
            f"graph via ivf_topk/lsh_topk probes or cluster-blocked "
            f"candidates (see semantic_neardup) at this scale."
        )

    tbl = pq.read_table(path, columns=["vec_id", "embedding"])
    ids = tbl.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ids, kind="stable")  # columns in neighbor-id order
    mat = embedding_matrix(tbl.column("embedding"))[order]
    ids = ids[order]
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    ref = ray.put((ids, mat))

    def block_knn(t: pa.Table) -> pa.Table:
        c_ids, c_mat = ray.get(ref)
        bid = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        bm = embedding_matrix(t.column("embedding"), dim=c_mat.shape[1])
        bm = bm / np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-30)
        sims = bm @ c_mat.T
        e4 = np.floor(np.abs(sims) * 10000.0 + 0.5).astype(np.int64) * np.where(
            sims < 0, -1, 1
        )
        # exclude self: c_ids is sorted, so each row's own column is found
        # by searchsorted (vec_ids are unique by schema)
        self_col = np.searchsorted(c_ids, bid)
        hit = (self_col < len(c_ids)) & (
            c_ids[np.clip(self_col, 0, len(c_ids) - 1)] == bid
        )
        rows_w_self = np.flatnonzero(hit)
        # sentinel well below any valid e4 but safely negatable (int64.min
        # would overflow under the -e4 sort key and rank FIRST)
        e4[rows_w_self, self_col[rows_w_self]] = -(1 << 40)
        # stable argsort of -e4: ties keep column order == neighbor-id order
        top = np.argsort(-e4, axis=1, kind="stable")[:, :k]
        n = len(bid)
        ranks = np.tile(np.arange(1, k + 1, dtype=np.int64), n)
        rows = np.repeat(np.arange(n), k)
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(bid, k), pa.int64()),
                "rank": pa.array(ranks, pa.int64()),
                "neighbor_id": pa.array(c_ids[top.ravel()], pa.int64()),
                "sim_e4": pa.array(e4[rows, top.ravel()], pa.int64()),
            }
        )

    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    return ds.map_batches(block_knn, batch_format="pyarrow", batch_size=1024)


def filtered_ann_topk(
    sf_dir: str,
    k: int = 10,
    lang: str = "en",
    query_vec_id: int = 0,
    n_shards: int = 32,
) -> ray.data.Dataset:
    """Filtered (hybrid) vector search — the vector-DB staple: exact cosine
    top-k restricted to vectors whose DOCUMENT satisfies a metadata
    predicate (lang = 'en'), with attributes and vectors living in
    SEPARATE corpus-sized tables.  Neither side broadcasts: eligible doc
    ids and vectors co-partition by an id-hash shard (the predicate is
    pushed into the documents READ, so only matching ids ever leave it);
    each shard membership-filters its vectors, scores them against the
    broadcast query in one matmul, and keeps a partial top-k under the
    (sim_e4 desc, vec_id asc) total order — a valid combiner, so only
    shards*k rows reach the final sort.

    Scale note: the one unavoidable cost of this layout is that VECTORS
    cross the wire once to meet their metadata; a production layout
    co-locates filter columns with the vectors (as ann_topk's table does
    with ``label``), turning this into a pure filtered map."""
    import pyarrow.compute as pc

    from ._util import absorb_empty_blocks

    q = _load_query_vec(sf_dir, query_vec_id)
    qn = q / max(np.linalg.norm(q), 1e-30)
    q_ref = ray.put(qn)

    _MERGED = pa.schema(
        [
            ("kshard", pa.int32()),
            ("id", pa.int64()),
            ("side", pa.int8()),
            ("embedding", pa.list_(pa.float32())),
        ]
    )

    def _shard_of(v: "np.ndarray") -> "np.ndarray":
        return (((v * 2654435761) % (1 << 32)) % n_shards).astype(np.int32)

    def doc_rows(t: pa.Table) -> pa.Table:
        ids = np.unique(
            t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return pa.table(
            {
                "kshard": pa.array(_shard_of(ids)),
                "id": pa.array(ids, pa.int64()),
                "side": pa.array(np.ones(len(ids), np.int8), pa.int8()),
                "embedding": pa.array([None] * len(ids), pa.list_(pa.float32())),
            },
            schema=_MERGED,
        )

    def emb_rows(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        emb = t.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        return pa.table(
            {
                "kshard": pa.array(_shard_of(ids)),
                "id": pa.array(ids, pa.int64()),
                "side": pa.array(np.zeros(len(ids), np.int8), pa.int8()),
                "embedding": emb,
            },
            schema=_MERGED,
        )

    _OUT = pa.schema([("vec_id", pa.int64()), ("sim_e4", pa.int64())])

    def score_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        side = g.column("side").to_numpy(zero_copy_only=False)
        ids = g.column("id").to_numpy(zero_copy_only=False)
        elig = np.unique(ids[side == 1])
        if len(elig) == 0:
            # A shard can hold vectors but zero eligible docs (e.g. a
            # selective `lang` leaves this hash shard empty on the doc
            # side); the fancy-indexed probe below would IndexError.
            return _OUT.empty_table()
        vmask = side == 0
        vid = ids[vmask]
        pos = np.searchsorted(elig, vid)
        hit = (pos < len(elig)) & (
            elig[np.minimum(pos, max(len(elig) - 1, 0))] == vid
        )
        if not hit.any():
            return _OUT.empty_table()
        keep = np.zeros(len(ids), dtype=bool)
        keep[np.flatnonzero(vmask)[hit]] = True
        emb = g.column("embedding").filter(pa.array(keep))
        qv = ray.get(q_ref)
        m = embedding_matrix(emb, dim=len(qv))
        sims = (m @ qv) / np.maximum(np.linalg.norm(m, axis=1), 1e-30)
        # half-away-from-zero, matching DuckDB round() (np.round is half-even)
        s4 = sims * 10_000.0
        e4 = np.where(s4 >= 0, np.floor(s4 + 0.5), -np.floor(0.5 - s4)).astype(
            np.int64
        )
        kept_ids = vid[hit]
        top = np.lexsort((kept_ids, -e4))[:k]
        return pa.table(
            {
                "vec_id": pa.array(kept_ids[top], pa.int64()),
                "sim_e4": pa.array(e4[top], pa.int64()),
            },
            schema=_OUT,
        )

    docs = ray.data.read_parquet(
        _pq(sf_dir, "documents"),
        columns=["doc_id"],
        filter=(pc.field("lang") == lang),
    ).map_batches(doc_rows, batch_format="pyarrow")
    embs = ray.data.read_parquet(
        _pq(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
    ).map_batches(emb_rows, batch_format="pyarrow")

    survivors = (
        absorb_empty_blocks(docs.union(embs), batch_size=131072)
        .groupby("kshard")
        .map_groups(
            lambda g: score_shard(_dropg(g, ["kshard"])),
            batch_format="pyarrow",
        )
    )
    return survivors.sort(["sim_e4", "vec_id"], descending=[True, False]).limit(k)


def hybrid_rrf_topk(
    sf_dir: str, k: int = 10, m: int = 10, rrf_c: int = 60
) -> pa.Table:
    """HYBRID retrieval fusion — reciprocal-rank fusion (Cormack et al.)
    of the lexical (BM25) and dense (exact cosine) rankers over the same
    id space:

        rrf(doc) = sum over lists of 1e6 // (rrf_c + rank_in_list)

    — the standard RAG / retrieval-eval combiner, all-integer so both
    engines agree exactly.  Ranks are row_number over each list's
    FIXED-POINT score with id tie-break ((score_e6 desc, doc_id) /
    (sim_e4 desc, vec_id)) — the gate-verified values — so the fusion
    never depends on float ordering.

    Scale shape: both input rankers are the proven retrieval pipelines
    (bm25_topk: two streaming passes, block-bounded stats; ann_topk:
    broadcast query + per-batch partial top-k); the fusion itself touches
    only the 2m survivor rows on the driver — rank-bounded, never
    corpus-bounded."""
    from .text import bm25_topk

    bm = bm25_topk(sf_dir, k=m).take_all()  # <= m rows
    an = ann_topk(sf_dir, k=m).take_all()  # <= m rows
    bm.sort(key=lambda r: (-r["score_e6"], r["doc_id"]))
    an.sort(key=lambda r: (-r["sim_e4"], r["vec_id"]))
    bm_rank = {r["doc_id"]: i + 1 for i, r in enumerate(bm)}
    an_rank = {r["vec_id"]: i + 1 for i, r in enumerate(an)}
    fused = []
    for d in sorted(set(bm_rank) | set(an_rank)):
        s = 0
        if d in bm_rank:
            s += 10**6 // (rrf_c + bm_rank[d])
        if d in an_rank:
            s += 10**6 // (rrf_c + an_rank[d])
        fused.append((d, s, bm_rank.get(d), an_rank.get(d)))
    fused.sort(key=lambda x: (-x[1], x[0]))
    fused = fused[:k]
    return pa.table(
        {
            "doc_id": pa.array([x[0] for x in fused], pa.int64()),
            "rrf_e6": pa.array([x[1] for x in fused], pa.int64()),
            "bm25_rank": pa.array([x[2] for x in fused], pa.int64()),
            "ann_rank": pa.array([x[3] for x in fused], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# IVF index LAYOUT: persist the corpus hive-partitioned by nearest-centroid
# list (plus the centroid model itself), so an ANN query reads ONLY its
# n_probe lists' files — the vector-side member of the storage-layout family
# (SMB buckets, compaction, z-order, postings).  Contrast ivf_topk, which
# re-assigns the whole corpus per query.
# ---------------------------------------------------------------------------

_IVF_CACHE_ROOT = "/tmp/ier_ivf"
_IVF_LAYOUT_VERSION = 1


def ivf_layout(sf_dir: str, n_list: int = 16) -> str:
    """Materialize (once) the IVF index layout: vectors land in ``list=L/``
    hive directories with L = argmax over the trained coarse centroids of
    the NORMALIZED dot product (exactly ``ivf_topk``'s assignment, so the
    indexed query's candidate set is identical by construction); the
    centroid matrix persists as ``_centroids.parquet`` in the layout root
    so queries never retrain.  Same cache discipline as the other layouts:
    key covers source (size, mtime) + params, tmp-rename + ``_COMPLETE``;
    point ``IER_IVF_CACHE`` at shared storage on a real cluster.

    At 100 TB this is the index build every vector store amortizes: one
    assignment pass + one partitioned write, after which every query
    touches n_probe/n_list of the corpus bytes."""
    import hashlib
    import json
    import os
    import shutil

    import pyarrow.parquet as pq_

    from .relational import _publish_layout_dir

    src = _pq(sf_dir, "embeddings")
    st = os.stat(src)
    spec = json.dumps(
        [
            os.path.abspath(sf_dir),
            "ivf",
            n_list,
            st.st_size,
            int(st.st_mtime_ns),
            _IVF_LAYOUT_VERSION,
        ],
        sort_keys=True,
    )
    digest = hashlib.sha256(spec.encode()).hexdigest()[:16]
    root = os.environ.get("IER_IVF_CACHE", _IVF_CACHE_ROOT)
    dest = f"{root}/{digest}/embeddings"
    marker = f"{dest}/_COMPLETE"
    if os.path.exists(marker):
        return dest
    tmp = f"{dest}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)

    cents = _train_centroids(sf_dir, n_list)
    dim = cents.shape[1]
    cents_ref = ray.put(cents)

    def assign(t: pa.Table) -> pa.Table:
        bc = ray.get(cents_ref)  # plasma zero-copy per batch
        m = embedding_matrix(t.column("embedding"), dim=dim)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        a = np.argmax(mn @ bc.T, axis=1).astype(np.int64)  # == ivf_topk
        return t.append_column("list", pa.array(a, pa.int64()))

    (
        ray.data.read_parquet(src, columns=["vec_id", "embedding"])
        .map_batches(assign, batch_format="pyarrow")
        .write_parquet(tmp, partition_cols=["list"])
    )
    os.makedirs(tmp, exist_ok=True)  # empty corpus: commit a valid empty layout
    pq_.write_table(
        pa.table(
            {
                "list_id": pa.array(np.arange(len(cents), dtype=np.int64)),
                "centroid": pa.array(
                    [c.astype(np.float32) for c in cents], pa.list_(pa.float32())
                ),
            }
        ),
        f"{tmp}/_centroids.parquet",
    )
    _publish_layout_dir(tmp, dest, spec)
    return dest


def ivf_topk_indexed(
    sf_dir: str,
    k: int = 10,
    query_vec_id: int = 0,
    n_list: int = 16,
    n_probe: int = 4,
) -> ray.data.Dataset:
    """``ivf_topk`` served from the persisted ``ivf_layout``: identical
    output by construction (the layout stores every vector under exactly
    the list ``ivf_topk`` would assign it to, and the persisted centroids
    reproduce the same probe set), but the query READS only the n_probe
    list directories — no corpus-wide assignment pass, no retraining.
    Same oracle string as ivf_ann_topk."""
    import glob as _glob
    import os

    import pyarrow.parquet as pq_

    from .relational import _require_layout_visible

    root = ivf_layout(sf_dir, n_list)
    _require_layout_visible(root)
    _EMPTY = pa.table(
        {"vec_id": pa.array([], pa.int64()), "sim_e4": pa.array([], pa.int64())}
    )
    ct = pq_.read_table(f"{root}/_centroids.parquet")
    order = np.argsort(ct.column("list_id").to_numpy(zero_copy_only=False))
    cents = np.stack(
        [np.asarray(v, dtype=np.float64) for v in ct.column("centroid").to_pylist()]
    )[order]

    q = _load_query_vec(sf_dir, query_vec_id)
    qn = q / max(np.linalg.norm(q), 1e-30)
    probe = np.argsort(-(cents @ qn))[:n_probe].tolist()
    files = [
        f
        for L in sorted(probe)
        for f in sorted(_glob.glob(f"{root}/list={L}/*.parquet"))
    ]
    if not files:
        return ray.data.from_arrow(_EMPTY)
    qref = ray.put(qn)

    def score(t: pa.Table) -> pa.Table:
        bq = ray.get(qref)
        m = embedding_matrix(t.column("embedding"), dim=len(bq))
        vid = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        sims = mn @ bq
        return pa.table(
            {
                "vec_id": pa.array(vid),
                "sim_e4": pa.array(np.floor(sims * 10_000.0 + 0.5).astype(np.int64)),
            }
        )

    scored = ray.data.read_parquet(files, columns=["vec_id", "embedding"]).map_batches(
        score, batch_format="pyarrow"
    )
    return scored.sort(["sim_e4", "vec_id"], descending=[True, False]).limit(k)
