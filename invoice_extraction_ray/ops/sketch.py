"""Sketch / order-statistic aggregates.

- ``value_quantiles``: EXACT per-group quantiles via per-group sort —
  appropriate while each group's values fit one worker (few event types);
  index convention mirrors DuckDB ``quantile_disc`` (ceil(q*n)-1 in float64)
  so the SQL oracle matches bit-for-bit on fixed-point outputs.
- ``hll_distinct_users``: HyperLogLog distinct-count — the canonical
  mergeable sketch (Flajolet et al. 2007): per-batch partial register
  arrays (numpy max), one tiny groupby merging registers, linear-counting
  small-range correction.  Approximate by design; tests bound the error
  vs the exact distinct count.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray.data
from ._util import drop_if_present as _dropg

QUANTILES = (0.25, 0.5, 0.75, 0.95)


def _pq(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def value_quantiles(sf_dir: str) -> ray.data.Dataset:
    """Exact quantiles of events.value per event_type (cents fixed-point)."""
    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "value"])

    schema = pa.schema(
        [("event_type", pa.string())]
        + [(f"p{int(q * 100)}_c", pa.int64()) for q in QUANTILES]
        + [("n", pa.int64())]
    )

    def per_group(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        v = np.sort(t.column("value").to_numpy(zero_copy_only=False))
        n = len(v)
        row = {"event_type": [t.column("event_type")[0].as_py()]}
        for q in QUANTILES:
            idx = max(0, math.ceil(q * n) - 1)  # DuckDB quantile_disc convention
            row[f"p{int(q * 100)}_c"] = [int(np.floor(v[idx] * 100.0 + 0.5))]
        row["n"] = [n]
        return pa.Table.from_pydict(row, schema=schema)

    return ds.groupby("event_type").map_groups(per_group, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Mergeable quantile sketch (log-spaced histogram)
# ---------------------------------------------------------------------------

QSK_BINS_PER_DECADE = 256  # relative error <= 10^(1/256)-1 ~ 0.9%
QSK_MIN = 1e-6  # values below collapse into bin 0
QSK_N_BINS = 256 * 12  # covers [1e-6, 1e6)


def _qsk_bin(values: np.ndarray) -> np.ndarray:
    """Log-spaced bin index per value (vectorized, deterministic)."""
    v = np.maximum(values.astype(np.float64), QSK_MIN)
    idx = np.floor(np.log10(v / QSK_MIN) * QSK_BINS_PER_DECADE).astype(np.int64)
    return np.clip(idx, 0, QSK_N_BINS - 1)


def _qsk_value(bins: np.ndarray) -> np.ndarray:
    """Representative value (geometric bin midpoint) per bin index."""
    return QSK_MIN * np.power(10.0, (bins + 0.5) / QSK_BINS_PER_DECADE)


def quantile_sketch_estimate(counts: np.ndarray, q: float) -> float:
    """q-quantile from merged bin counts (quantile_disc-style index)."""
    n = int(counts.sum())
    if n == 0:
        return float("nan")
    target = max(0, math.ceil(q * n) - 1)
    cum = np.cumsum(counts)
    b = int(np.searchsorted(cum, target + 1))
    return float(_qsk_value(np.array([b]))[0])


def value_quantiles_sketch(sf_dir: str) -> ray.data.Dataset:
    """MERGEABLE approximate quantiles of events.value per event_type — the
    100 TB path for `value_quantiles` (whose exact per-group sort requires a
    group's values on one worker).  Per-batch partial = a log-spaced bin-count
    vector; merge = elementwise SUM (associative/commutative, so any
    partitioning gives the same registers); quantiles read off the merged
    histogram with <= ~0.9% relative value error (bounds tested vs the exact
    operator)."""
    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        etypes, counts_col = [], []
        tbl = t.group_by("event_type").aggregate([("value", "list")])
        for row in tbl.to_pylist():
            vals = np.asarray(row["value_list"], dtype=np.float64)
            binned = _qsk_bin(vals)
            etypes.append(row["event_type"])
            counts_col.append(np.bincount(binned, minlength=QSK_N_BINS).tolist())
        return pa.table(
            {
                "event_type": pa.array(etypes, pa.string()),
                "counts": pa.array(counts_col, pa.list_(pa.int64())),
            }
        )

    merge_schema = pa.schema(
        [("event_type", pa.string())]
        + [(f"p{int(q * 100)}_c", pa.int64()) for q in QUANTILES]
        + [("n", pa.int64())]
    )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return merge_schema.empty_table()
        counts = np.asarray(t.column("counts").to_pylist(), dtype=np.int64).sum(axis=0)
        row = {"event_type": [t.column("event_type")[0].as_py()]}
        for q in QUANTILES:
            row[f"p{int(q * 100)}_c"] = [
                int(np.floor(quantile_sketch_estimate(counts, q) * 100.0 + 0.5))
            ]
        row["n"] = [int(counts.sum())]
        return pa.Table.from_pydict(row, schema=merge_schema)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(merge, batch_format="pyarrow")
    )


def value_mad_outliers(sf_dir: str) -> ray.data.Dataset:
    """EXACT robust statistics per event_type: median, MAD (median absolute
    deviation) and the 3-MAD outlier count — the standard
    mean/std-resistant anomaly gate.

    Scale shape: values quantize to cents (bounded integer range), so each
    batch emits a per-(group, cent) COUNT histogram partial and one tiny
    groupby merges them; median, the MAD (itself an exact order statistic of
    the |x - median| histogram, re-binned without touching rows), and the
    outlier count all read off the merged histogram.  The corpus is never
    sorted and no row leaves its block — only distinct-cent histogram rows
    shuffle (bounded by the VALUE RANGE, not the corpus).  Order-statistic
    convention = DuckDB ``quantile_disc`` (ceil(q*n)-1 ascending), matching
    ``value_quantiles``."""
    import numpy as np

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "value"])

    def hist_partial(t: pa.Table) -> pa.Table:
        etypes, cents, cnts = [], [], []
        g = t.group_by("event_type").aggregate([("value", "list")])
        for row in g.to_pylist():
            vals = np.asarray(row["value_list"], dtype=np.float64)
            c = np.floor(vals * 100.0 + 0.5).astype(np.int64)
            uc, n = np.unique(c, return_counts=True)
            etypes.extend([row["event_type"]] * len(uc))
            cents.extend(uc.tolist())
            cnts.extend(n.astype(np.int64).tolist())
        return pa.table(
            {
                "event_type": pa.array(etypes, pa.string()),
                "cent": pa.array(cents, pa.int64()),
                "n": pa.array(cnts, pa.int64()),
            }
        )

    _OUT = pa.schema(
        [
            ("event_type", pa.string()),
            ("median_c", pa.int64()),
            ("mad_c", pa.int64()),
            ("n_outliers", pa.int64()),
        ]
    )

    def _disc(vals: "np.ndarray", counts: "np.ndarray", q: float) -> int:
        """quantile_disc order statistic off a sorted histogram."""
        n = int(counts.sum())
        idx = max(0, math.ceil(q * n) - 1)
        cum = np.cumsum(counts)
        return int(vals[int(np.searchsorted(cum, idx + 1))])

    def finish(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        c = g.column("cent").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(c, kind="stable")
        c, n = c[order], n[order]
        # merge duplicate cents across block partials
        new = np.ones(len(c), dtype=bool)
        new[1:] = c[1:] != c[:-1]
        seg = np.cumsum(new) - 1
        tot = np.zeros(int(seg[-1]) + 1, dtype=np.int64)
        np.add.at(tot, seg, n)
        c = c[np.flatnonzero(new)]
        med = _disc(c, tot, 0.5)
        # |x - med| histogram by re-binning the cents histogram
        d = np.abs(c - med)
        dorder = np.argsort(d, kind="stable")
        d, dn = d[dorder], tot[dorder]
        dnew = np.ones(len(d), dtype=bool)
        dnew[1:] = d[1:] != d[:-1]
        dseg = np.cumsum(dnew) - 1
        dtot = np.zeros(int(dseg[-1]) + 1, dtype=np.int64)
        np.add.at(dtot, dseg, dn)
        dd = d[np.flatnonzero(dnew)]
        mad = _disc(dd, dtot, 0.5)
        n_out = int(dtot[dd > 3 * mad].sum())
        return pa.table(
            {
                "event_type": pa.array([g.column("event_type")[0].as_py()]),
                "median_c": pa.array([med], pa.int64()),
                "mad_c": pa.array([mad], pa.int64()),
                "n_outliers": pa.array([n_out], pa.int64()),
            },
            schema=_OUT,
        )

    return (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(finish, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

HLL_P = 10
HLL_M = 1 << HLL_P  # 1024 registers


def _hash64(x: np.ndarray) -> np.ndarray:
    """Deterministic splitmix64 over int64 keys (vectorized, no RNG)."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _partial_registers(keys: np.ndarray) -> np.ndarray:
    h = _hash64(keys)
    reg_idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    bits = h << np.uint64(HLL_P)  # remaining 64-p bits, left-aligned
    # rank = position of the leftmost 1-bit (1-based), capped at 64-p+1.
    # Bounded loop over possible ranks (vectorized over rows; 54 iterations)
    ranks = np.zeros(len(h), dtype=np.int64)
    mask = np.uint64(1) << np.uint64(63)
    remaining = np.ones(len(h), dtype=bool)
    for r in range(1, 64 - HLL_P + 1):
        hit = remaining & ((bits & mask) != 0)
        ranks[hit] = r
        remaining &= ~hit
        bits = bits << np.uint64(1)
    ranks[remaining] = 64 - HLL_P + 1
    regs = np.zeros(HLL_M, dtype=np.int64)
    np.maximum.at(regs, reg_idx, ranks)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    m = HLL_M
    alpha = 0.7213 / (1 + 1.079 / m)
    # EXACT integer register sum: sum(2^-r) == num / 2^55 with num an exact
    # (Python bigint) integer — unlike a float sum it is order-independent,
    # so partition order can never perturb the estimate and the DuckDB
    # oracle reproduces it bit-for-bit (ranks are capped at 55 = 64-p+1)
    num = 0
    for r in regs.tolist():
        num += 1 << (55 - r)
    est = alpha * m * m * float(1 << 55) / float(num)
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)  # linear counting small-range correction
    return est


def hll_distinct_users(sf_dir: str) -> ray.data.Dataset:
    """Approximate distinct user_id per event_type via mergeable HLL
    registers: per-batch partials, register-max merge in one tiny groupby."""
    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        etypes, regs_col = [], []
        tbl = t.group_by("event_type").aggregate([("user_id", "list")])
        for row in tbl.to_pylist():
            keys = np.asarray(row["user_id_list"], dtype=np.int64)
            etypes.append(row["event_type"])
            regs_col.append(_partial_registers(keys).tolist())
        return pa.table(
            {
                "event_type": pa.array(etypes, pa.string()),
                "regs": pa.array(regs_col, pa.list_(pa.int64())),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        regs = np.asarray(t.column("regs").to_pylist(), dtype=np.int64).max(axis=0)
        # floor(x + 0.5): half-up rounding an engine-independent SQL mirror
        # can reproduce (Python round() is half-even)
        est = int(math.floor(hll_estimate(regs) + 0.5))
        return pa.table(
            {
                "event_type": pa.array([t.column("event_type")[0].as_py()]),
                "approx_distinct": pa.array([est], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(merge, batch_format="pyarrow")
    )


def corpus_stats_report(sf_dir: str) -> ray.data.Dataset:
    """Dataset card in ONE streaming pass: exact doc/token/char counts, the
    max document length, the e4 mean tokens/doc, and an HLL estimate of the
    distinct-token vocabulary — the summary every corpus release ships with.

    Scale shape: each batch emits one partial row carrying exact integer
    sums/max plus an HLL register vector over the batch's DISTINCT tokens
    (crc32 -> splitmix64, the same mergeable registers as
    ``hll_distinct_users``); a single tiny groupby merges (sums, max,
    register-max) and reads out.  Nothing but 1-row partials ever shuffles,
    and every merge op is associative+commutative, so the card is
    partitioning-invariant."""
    import zlib

    import pyarrow.compute as pc

    ds = ray.data.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t.column("text"), "")
        n = t.num_rows
        n_text = n - t.column("text").null_count
        ntok = pc.cast(
            pc.count_substring_regex(text, r"\S+"), pa.int64()
        ).to_numpy(zero_copy_only=False)
        nchr = pc.cast(pc.utf8_length(text), pa.int64()).to_numpy(zero_copy_only=False)
        toks: set[str] = set()
        for s in t.column("text").to_pylist():
            toks.update((s or "").split())
        keys = np.array([zlib.crc32(w.encode()) for w in sorted(toks)], dtype=np.int64)
        regs = _partial_registers(keys) if len(keys) else np.zeros(HLL_M, dtype=np.int64)
        return pa.table(
            {
                "k": pa.array([0], pa.int32()),
                "n_docs": pa.array([n], pa.int64()),
                "n_with_text": pa.array([n_text], pa.int64()),
                "total_tokens": pa.array([int(ntok.sum())], pa.int64()),
                "total_chars": pa.array([int(nchr.sum())], pa.int64()),
                "max_doc_tokens": pa.array(
                    [int(ntok.max()) if n else 0], pa.int64()
                ),
                "regs": pa.array([regs.tolist()], pa.list_(pa.int64())),
            }
        )

    _OUT = pa.schema(
        [
            ("n_docs", pa.int64()),
            ("n_with_text", pa.int64()),
            ("total_tokens", pa.int64()),
            ("total_chars", pa.int64()),
            ("max_doc_tokens", pa.int64()),
            ("mean_tokens_e4", pa.int64()),
            ("approx_distinct_tokens", pa.int64()),
        ]
    )

    def finish(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        n_docs = int(pa.compute.sum(g.column("n_docs")).as_py())
        regs = np.asarray(g.column("regs").to_pylist(), dtype=np.int64).max(axis=0)
        total_tokens = int(pa.compute.sum(g.column("total_tokens")).as_py())
        return pa.table(
            {
                "n_docs": pa.array([n_docs], pa.int64()),
                "n_with_text": pa.array(
                    [int(pa.compute.sum(g.column("n_with_text")).as_py())], pa.int64()
                ),
                "total_tokens": pa.array([total_tokens], pa.int64()),
                "total_chars": pa.array(
                    [int(pa.compute.sum(g.column("total_chars")).as_py())], pa.int64()
                ),
                "max_doc_tokens": pa.array(
                    [int(pa.compute.max(g.column("max_doc_tokens")).as_py())],
                    pa.int64(),
                ),
                "mean_tokens_e4": pa.array(
                    [int(math.floor(10000.0 * total_tokens / max(n_docs, 1) + 0.5))],
                    pa.int64(),
                ),
                "approx_distinct_tokens": pa.array(
                    [int(math.floor(hll_estimate(regs) + 0.5))], pa.int64()
                ),
            },
            schema=_OUT,
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .map_groups(finish, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Count-min sketch — mergeable heavy-hitter counts (Cormode & Muthukrishnan)
# ---------------------------------------------------------------------------

CMS_D = 4  # hash rows
CMS_W = 64  # counters per row (small on purpose: collisions are the point)


def _cms_hash(tokens: list[str], d: int) -> np.ndarray:
    import zlib

    return np.array(
        [zlib.crc32((str(d) + t).encode()) & (CMS_W - 1) for t in tokens],
        dtype=np.int64,
    )


def cms_heavy_hitters(sf_dir: str, denom: int = 64) -> ray.data.Dataset:
    """Count-min-sketch heavy hitters over the corpus token stream (Cormode
    & Muthukrishnan 2005): per-batch partial sketches (a D x W integer
    counter matrix filled from a Counter combiner), merged by ONE
    elementwise sum — associative and commutative, so the sketch is
    partitioning-invariant and cross-node mergeable, and the merged state
    is O(D*W) = 2 KB regardless of corpus size (the 100 TB path where an
    exact vocabulary count would not fit).  A second stateless pass probes
    every distinct token against the broadcast sketch and keeps those with
    ``est * denom >= N`` where ``est = min_d sketch[d][h_d(tok)]`` — an
    upper bound on the true count, so the readout has NO false negatives
    and only deterministic false positives, which the DuckDB oracle
    reproduces bit-exactly via the same CRC32 bucket hash."""
    import zlib

    import ray

    ds = ray.data.read_parquet(_pq(sf_dir, "documents"), columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: "Counter[str]" = Counter()
        for s in t.column("text").to_pylist():
            c.update((s or "").split())
        m = np.zeros((CMS_D, CMS_W), dtype=np.int64)
        toks = list(c.keys())
        cnts = np.array([c[w] for w in toks], dtype=np.int64)
        for d in range(CMS_D):
            np.add.at(m[d], _cms_hash(toks, d), cnts)
        return pa.table(
            {
                "k": pa.array([0], pa.int32()),
                "counts": pa.array([m.reshape(-1).tolist()], pa.list_(pa.int64())),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"k": pa.array([], pa.int32()), "counts": pa.array([], pa.list_(pa.int64()))}
            )
        m = np.asarray(t.column("counts").to_pylist(), dtype=np.int64).sum(axis=0)
        return pa.table(
            {"k": pa.array([0], pa.int32()), "counts": pa.array([m.tolist()], pa.list_(pa.int64()))}
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .map_groups(merge, batch_format="pyarrow")
        .take_all()
    )
    if not rows:  # empty corpus -> empty heavy-hitter set
        return ray.data.from_arrow(
            pa.table(
                {"token": pa.array([], pa.string()), "est_n": pa.array([], pa.int64())}
            )
        )
    sketch = np.asarray(rows[0]["counts"], dtype=np.int64).reshape(CMS_D, CMS_W)
    n_total = int(sketch[0].sum())  # every row sums to the full stream length
    sk_ref = ray.put(sketch)

    def distinct_partial(t: pa.Table) -> pa.Table:
        toks: set[str] = set()
        for s in t.column("text").to_pylist():
            toks.update((s or "").split())
        out = sorted(toks)
        shard = np.array([zlib.crc32(w.encode()) & 255 for w in out], dtype=np.int32)
        return pa.table(
            {"token": pa.array(out, pa.string()), "tshard": pa.array(shard)}
        )

    _OUT = pa.schema([("token", pa.string()), ("est_n", pa.int64())])

    def probe(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        sk = ray.get(sk_ref)
        toks = sorted(set(g.column("token").to_pylist()))
        est = np.full(len(toks), np.iinfo(np.int64).max, dtype=np.int64)
        for d in range(CMS_D):
            est = np.minimum(est, sk[d][_cms_hash(toks, d)])
        keep = est * denom >= n_total
        return pa.table(
            {
                "token": pa.array([w for w, k in zip(toks, keep) if k], pa.string()),
                "est_n": pa.array(est[keep]),
            }
        )

    return (
        ds.map_batches(distinct_partial, batch_format="pyarrow")
        .groupby("tshard")
        .map_groups(probe, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Bloom filter — OR-mergeable set membership (Bloom 1970)
# ---------------------------------------------------------------------------

BLOOM_M = 1 << 13  # bits
BLOOM_K = 4  # hash functions
_BLOOM_WORDS = BLOOM_M // 64


def _bloom_bits(texts: list[str], j: int) -> np.ndarray:
    import zlib

    return np.array(
        [zlib.crc32((str(j) + (t or "")).encode()) % BLOOM_M for t in texts],
        dtype=np.int64,
    )


def bloom_contamination(sf_dir: str, eval_mod: int = 10) -> ray.data.Dataset:
    """Bloom-filter exact-membership contamination check: build an
    OR-MERGEABLE bloom over the TRAIN split's document texts, probe every
    EVAL doc (same ``doc_id % eval_mod == 0 -> eval`` convention as
    ``ops/dedup.py::contamination_check``, which tests n-gram OVERLAP where
    this tests exact-duplicate membership).  Emits (doc_id, flagged) for
    eval docs; flagged iff all K bloom bits are set — NO false negatives
    (an exact train duplicate always flags) and only deterministic false
    positives, reproduced bit-exactly by the SQL oracle via the same CRC32
    bucket hashes.

    PARTITIONED bloom (one M-bit array PER hash row — the standard variant
    whose per-row membership sets the SQL oracle mirrors directly; a
    shared array would let hash row j's insertions satisfy row i's probes
    and saturate at scale).  The K x M bits are carried as 64-bit words:
    per-batch partials OR-merge (associative, commutative, idempotent —
    any partitioning and any retry gives the same filter), and the merged
    state is K*M/8 bytes regardless of corpus size; the probe is a
    stateless task map against the ray.put filter."""
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        train = np.asarray(ids % eval_mod != 0)
        texts = [s for s, k in zip(t.column("text").to_pylist(), train) if k]
        bits = np.zeros((BLOOM_K, BLOOM_M), dtype=bool)
        for j in range(BLOOM_K):
            bits[j, _bloom_bits(texts, j)] = True
        words = (
            np.packbits(bits.reshape(-1), bitorder="little")
            .view("<u8")
            .astype(np.int64)
        )
        return pa.table(
            {
                "k": pa.array([0], pa.int32()),
                "words": pa.array([words.tolist()], pa.list_(pa.int64())),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"k": pa.array([], pa.int32()), "words": pa.array([], pa.list_(pa.int64()))}
            )
        w = np.asarray(t.column("words").to_pylist(), dtype=np.int64)
        out = np.bitwise_or.reduce(w, axis=0)
        return pa.table(
            {"k": pa.array([0], pa.int32()), "words": pa.array([out.tolist()], pa.list_(pa.int64()))}
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .map_groups(merge, batch_format="pyarrow")
        .take_all()
    )
    if not rows:  # empty corpus -> nothing to probe, nothing flagged
        return ray.data.from_arrow(
            pa.table(
                {"doc_id": pa.array([], pa.int64()), "flagged": pa.array([], pa.bool_())}
            )
        )
    bits = (
        np.unpackbits(
            np.asarray(rows[0]["words"], dtype=np.int64).astype("<u8").view(np.uint8),
            bitorder="little",
        )
        .astype(bool)
        .reshape(BLOOM_K, BLOOM_M)
    )
    bloom_ref = ray.put(bits)

    _OUT = pa.schema([("doc_id", pa.int64()), ("flagged", pa.bool_())])

    def probe(t: pa.Table) -> pa.Table:
        bl = ray.get(bloom_ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        is_eval = np.asarray(ids % eval_mod == 0)
        if not is_eval.any():
            return _OUT.empty_table()
        texts = [s for s, k in zip(t.column("text").to_pylist(), is_eval) if k]
        flagged = np.ones(len(texts), dtype=bool)
        for j in range(BLOOM_K):
            flagged &= bl[j, _bloom_bits(texts, j)]
        return pa.table(
            {
                "doc_id": pa.array(ids[is_eval], pa.int64()),
                "flagged": pa.array(flagged),
            }
        )

    return ds.map_batches(probe, batch_format="pyarrow")


def dataset_fingerprint(sf_dir: str) -> pa.Table:
    """Order-invariant corpus checksum — the snapshot-equality primitive for
    validating migrations / re-partitions / resumed runs at scale: two runs
    over the same logical rows produce the same fingerprint regardless of
    block layout, task order, or parallelism.

    Per-row term = splitmix64(doc_id) + crc32(text) * 2654435761 (mod 2^64);
    the fingerprint is the commutative mod-2^64 SUM of all terms, carried
    alongside exact row and char counts.  Every per-batch partial is one
    40-byte row, so only O(blocks) rows ever reach the driver at any corpus
    size, and partials merge by plain addition (retry/partition-safe).
    Emitted as (fp_hi, fp_lo) int32-range halves so the DuckDB HUGEINT
    oracle mirrors every bit in BIGINT columns.

    Output: one row (n_docs, n_chars, fp_hi, fp_lo)."""
    import zlib

    import pyarrow.compute as pc
    import ray.data as rd

    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])
    MUL = np.uint64(2654435761)

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        h = _hash64(ids)
        crc = np.fromiter(
            (zlib.crc32((s or "").encode()) for s in t.column("text").to_pylist()),
            dtype=np.uint64,
            count=len(ids),
        )
        term_sum = int(np.sum(h + crc * MUL, dtype=np.uint64))  # wraps mod 2^64
        n_chars = pc.sum(
            pc.utf8_length(pc.fill_null(t.column("text"), ""))
        ).as_py() or 0
        return pa.table(
            {
                "n_docs": pa.array([t.num_rows], pa.int64()),
                "n_chars": pa.array([int(n_chars)], pa.int64()),
                "fp_hi": pa.array([term_sum >> 32], pa.int64()),
                "fp_lo": pa.array([term_sum & 0xFFFFFFFF], pa.int64()),
            }
        )

    # one row per block reaches the driver; merge with exact Python ints
    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    n_docs = sum(r["n_docs"] for r in rows)
    n_chars = sum(r["n_chars"] for r in rows)
    fp = sum((r["fp_hi"] << 32) | r["fp_lo"] for r in rows) % (1 << 64)
    return pa.table(
        {
            "n_docs": pa.array([n_docs], pa.int64()),
            "n_chars": pa.array([n_chars], pa.int64()),
            "fp_hi": pa.array([fp >> 32], pa.int64()),
            "fp_lo": pa.array([fp & 0xFFFFFFFF], pa.int64()),
        }
    )


def value_winsorize(sf_dir: str, lo: float = 0.05, hi: float = 0.95) -> ray.data.Dataset:
    """Percentile clipping (winsorization) of ``events.value`` per
    event_type — the feature-normalization step before model training, where
    outliers are clamped to per-group [p05, p95] boundaries.

    Two streaming passes, neither sorting the corpus (contrast
    ``value_quantiles``' per-group sort, which needs a whole group's values
    on one worker):

    1. Per-batch EXACT (event_type, cents) count partials via one Arrow
       group_by, merged by a 64-way cents-shard groupby (quality_percentiles'
       streamed-bounded-histogram shape) so what reaches the driver is
       DOMAIN-bounded (distinct (type, cents) pairs), not block-bounded —
       at 100 TB the raw partials would be blocks x histogram and collecting
       them would scale with the corpus.  The boundary is the quantile_disc
       index (ceil(q*n)-1, exactly value_quantiles' pinned convention) read
       off each type's cumsum with searchsorted.
    2. A stateless clip map with the tiny {type: (lo_c, hi_c)} dict as a
       closure constant (a few entries — smaller than the ray.put ref
       machinery it would otherwise ride).
    """
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "event_type", "value"]
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        cents = pa.array(
            np.floor(
                t.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64),
            pa.int64(),
        )
        g = (
            pa.table({"event_type": t.column("event_type"), "vc": cents})
            .group_by(["event_type", "vc"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "vc": g.column("vc"),
                "n": pc.cast(g.column("count_all"), pa.int64()),
                "hshard": pa.array(
                    (g.column("vc").to_numpy(zero_copy_only=False) & 63).astype(
                        np.int32
                    ),
                    pa.int32(),
                ),
            }
        )

    def hist_reduce(g: pa.Table) -> pa.Table:
        from ._util import int_segment_sum

        g = g.sort_by([("event_type", "ascending"), ("vc", "ascending")])
        et = g.column("event_type").combine_chunks()
        vc = g.column("vc").to_numpy(zero_copy_only=False)
        new = np.ones(g.num_rows, dtype=bool)
        if g.num_rows > 1:
            same_et = pc.equal(et.slice(1), et.slice(0, g.num_rows - 1)).to_numpy(
                zero_copy_only=False
            )
            new[1:] = ~(same_et & (vc[1:] == vc[:-1]))
        starts = np.flatnonzero(new)
        return pa.table(
            {
                "event_type": pc.take(et, pa.array(starts)),
                "vc": pa.array(vc[starts], pa.int64()),
                "n": pa.array(
                    int_segment_sum(g.column("n").to_numpy(zero_copy_only=False), starts),
                    pa.int64(),
                ),
            }
        )

    parts = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("hshard")
        .map_groups(hist_reduce, batch_format="pyarrow")
        .take_all()
    )  # DOMAIN-bounded: one row per distinct (event_type, cents)
    bytype: dict[str, dict[int, int]] = {}
    for r in parts:
        bytype.setdefault(r["event_type"], {}).setdefault(r["vc"], 0)
        bytype[r["event_type"]][r["vc"]] += r["n"]
    bounds: dict[str, tuple[int, int]] = {}
    for et, hist in bytype.items():
        vals = np.array(sorted(hist), dtype=np.int64)
        cum = np.cumsum([hist[int(v)] for v in vals])
        n = int(cum[-1])
        out = []
        for q in (lo, hi):
            target = max(0, math.ceil(q * n) - 1)  # quantile_disc index
            out.append(int(vals[int(np.searchsorted(cum, target + 1))]))
        bounds[et] = (out[0], out[1])

    def clip(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        d = et.dictionary_encode()
        names = d.dictionary.to_pylist()
        lo_by = np.array([bounds[x][0] for x in names], dtype=np.int64)
        hi_by = np.array([bounds[x][1] for x in names], dtype=np.int64)
        idx = d.indices.to_numpy(zero_copy_only=False)
        vc = np.floor(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        clipped = np.minimum(np.maximum(vc, lo_by[idx]), hi_by[idx])
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "event_type": et,
                "value_c": pa.array(vc, pa.int64()),
                "clipped_c": pa.array(clipped, pa.int64()),
            }
        )

    return ds.map_batches(clip, batch_format="pyarrow")


# Re-exported from config so the engine default and the oracle SQL can
# never desync (CLAUDE.md shared-semantics rule).
from ..config import KMV_JACCARD_TYPES, KMV_K  # noqa: E402


def kmv_distinct(sf_dir: str, k: int = KMV_K) -> pa.Table:
    """K-minimum-values distinct sketch over event users — the third
    mergeable distinct counter next to HLL (registers) and exact two-stage
    distinct: keep the k SMALLEST splitmix64 hashes of the key; the k-th
    smallest estimates distinct count as ``(k-1) * 2^64 // kth`` (all
    integer arithmetic — HUGEINT on the SQL side, python ints here — so
    the estimate is bit-exact across engines, unlike a float KMV).

    Scale shape: each batch emits its k smallest distinct-key hashes (a
    valid combiner: min-k of min-k unions = global min-k); one bounded
    merge finds the global k smallest.  State is k uint64s per block, ever."""
    import numpy as np

    from ._util import absorb_empty_blocks

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        u = np.unique(t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64))
        h = np.unique(_hash64(u))  # sorted ascending, distinct
        return pa.table({"h": pa.array(h[:k], pa.uint64())})

    rows = (
        absorb_empty_blocks(
            ds.map_batches(partial, batch_format="pyarrow"), batch_size=131072
        )
        .take_all()  # <= k per block
    )
    all_h = np.unique(np.array([r["h"] for r in rows], dtype=np.uint64))
    if len(all_h) == 0:  # empty corpus -> zero-distinct sketch row
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "kth_hi": pa.array([0], pa.int64()),
                "kth_lo": pa.array([0], pa.int64()),
                "approx_distinct": pa.array([0], pa.int64()),
            }
        )
    kth = int(all_h[min(k, len(all_h)) - 1])
    est = (min(k, len(all_h)) - 1) * (1 << 64) // kth if kth else 0
    return pa.table(
        {
            "k": pa.array([min(k, len(all_h))], pa.int64()),
            "kth_hi": pa.array([kth >> 32], pa.int64()),
            "kth_lo": pa.array([kth & 0xFFFFFFFF], pa.int64()),
            "approx_distinct": pa.array([est], pa.int64()),
        }
    )


def value_moments(sf_dir: str) -> pa.Table:
    """Exact mergeable MOMENTS per event_type — the parallel mean/variance
    primitive (Chan et al. pairwise update, kept in integers): n, sum of
    cents, and sum of squared cents carried as TWO int64 limbs (hi/lo by
    2^32) so the second moment never overflows at any corpus size.  Bound:
    the per-batch s2 accumulates in PLAIN int64 before the limb split, so
    with <=2^17-row blocks it needs |cents| < 2^23 (~$83k values; guarded
    loudly below).  After the split each batch's limbs are < 2^32 (lo) /
    < 2^31 (hi), so the cross-batch limb Sums stay below 2^63 past 10^13
    rows.
    The final (tiny, |event types| rows) table normalizes the limbs with
    python ints and derives the exact floored variance
    ``(n*S2 - S1^2) // n^2`` in cents^2 — bit-equal to the HUGEINT SQL
    mirror, unlike any float aggregation order.

    Scale shape: one stateless per-batch combiner emits |types| partial
    rows per block; one groupby sums the four int64 columns; everything
    after is O(|types|)."""
    import ray.data
    from ray.data.aggregate import Sum

    from ._util import absorb_empty_blocks, int_bincount

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "value"])

    _PART = pa.schema(
        [
            ("event_type", pa.string()),
            ("n", pa.int64()),
            ("s1", pa.int64()),
            ("s2_hi", pa.int64()),
            ("s2_lo", pa.int64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        c = np.floor(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        if len(c) and int(np.abs(c).max()) >= (1 << 23):
            # Per-batch s2 sums in plain int64 before the limb split;
            # |cents| >= 2^23 could wrap silently on a 2^17-row block.
            raise ValueError(
                "value_moments: |cents| must be < 2^23 for the int64 "
                "per-batch square sum; got %d" % int(np.abs(c).max())
            )
        enc = t.column("event_type").combine_chunks().dictionary_encode()
        types = enc.dictionary
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(types)
        n = int_bincount(idx, np.ones(len(c), np.int64), minlength=k)
        s1 = int_bincount(idx, c, minlength=k)
        s2 = int_bincount(idx, c * c, minlength=k)  # < 2^49 per row, batch-safe
        return pa.table(
            {
                "event_type": types,
                "n": pa.array(n, pa.int64()),
                "s1": pa.array(s1, pa.int64()),
                "s2_hi": pa.array(s2 >> 32, pa.int64()),
                "s2_lo": pa.array(s2 & 0xFFFFFFFF, pa.int64()),
            },
            schema=_PART,
        )

    agg = (
        absorb_empty_blocks(
            ds.map_batches(partial, batch_format="pyarrow"), batch_size=131072
        )
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s1", alias_name="s1"),
            Sum("s2_hi", alias_name="s2_hi"),
            Sum("s2_lo", alias_name="s2_lo"),
        )
    )
    rows = sorted(agg.take_all(), key=lambda r: r["event_type"])  # |types| rows
    out = {
        "event_type": [],
        "n": [],
        "sum_c": [],
        "c2_hi": [],
        "c2_lo": [],
        "var_floor_c2": [],
    }
    for r in rows:
        n, s1 = int(r["n"]), int(r["s1"])
        s2 = (int(r["s2_hi"]) << 32) + int(r["s2_lo"])  # exact int128 in python
        out["event_type"].append(r["event_type"])
        out["n"].append(n)
        out["sum_c"].append(s1)
        out["c2_hi"].append(s2 >> 32)
        out["c2_lo"].append(s2 & 0xFFFFFFFF)
        out["var_floor_c2"].append((n * s2 - s1 * s1) // (n * n))
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "sum_c": pa.array(out["sum_c"], pa.int64()),
            "c2_hi": pa.array(out["c2_hi"], pa.int64()),
            "c2_lo": pa.array(out["c2_lo"], pa.int64()),
            "var_floor_c2": pa.array(out["var_floor_c2"], pa.int64()),
        }
    )


def kmv_jaccard(
    sf_dir: str,
    type_a: str = KMV_JACCARD_TYPES[0],
    type_b: str = KMV_JACCARD_TYPES[1],
    k: int = KMV_K,
) -> pa.Table:
    """Sketch SET ALGEBRA — bounded-memory Jaccard similarity between two
    corpus-sized key sets (users who ``type_a`` vs users who ``type_b``),
    the theta-sketch estimator: the k smallest hashes of A UNION B are a
    uniform sample of the union, so ``|{x in K(AUB): x in A and x in B}|
    / k`` estimates |A inter B| / |A U B|.  The sketch twin of the exact
    ``user_event_overlap`` (INTERSECT/EXCEPT) — O(k) state at any corpus
    size, and every quantity here is a deterministic integer given
    splitmix64, so engine and HUGEINT SQL mirror agree bit-for-bit.

    Scale shape: one streaming pass; each batch emits its per-SIDE min-k
    distinct-key hashes (valid combiner); the driver merge handles
    <= 2k uint64s per block."""
    import numpy as np

    import pyarrow.compute as pc

    from ._util import absorb_empty_blocks

    ds = ray.data.read_parquet(
        _pq(sf_dir, "events"),
        columns=["user_id", "event_type"],
        filter=(pc.field("event_type").isin([type_a, type_b])),
    )

    def partial(t: pa.Table) -> pa.Table:
        ty = t.column("event_type").to_numpy(zero_copy_only=False)
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        hs, sides = [], []
        for side, name in ((0, type_a), (1, type_b)):
            h = np.unique(_hash64(np.unique(u[ty == name])))[:k]
            hs.append(h)
            sides.append(np.full(len(h), side, np.int8))
        return pa.table(
            {
                "h": pa.array(np.concatenate(hs), pa.uint64()),
                "side": pa.array(np.concatenate(sides), pa.int8()),
            }
        )

    rows = (
        absorb_empty_blocks(
            ds.map_batches(partial, batch_format="pyarrow"), batch_size=131072
        ).take_all()  # <= 2k per block
    )
    ha = np.unique(np.array([r["h"] for r in rows if r["side"] == 0], dtype=np.uint64))[:k]
    hb = np.unique(np.array([r["h"] for r in rows if r["side"] == 1], dtype=np.uint64))[:k]
    union = np.unique(np.concatenate([ha, hb]))[:k]
    k_eff = len(union)
    in_both = int(np.isin(union, ha).sum() + np.isin(union, hb).sum()) - k_eff
    kth = int(union[-1]) if k_eff else 0
    union_est = (k_eff - 1) * (1 << 64) // kth if kth else 0
    jac_e6 = 1_000_000 * in_both // k_eff if k_eff else 0
    return pa.table(
        {
            "k_eff": pa.array([k_eff], pa.int64()),
            "n_inter_sketch": pa.array([in_both], pa.int64()),
            "union_est": pa.array([union_est], pa.int64()),
            "jaccard_e6": pa.array([jac_e6], pa.int64()),
        }
    )


def mg_heavy_hitters(sf_dir: str, denom: int = 64) -> pa.Table:
    """Misra-Gries-style heavy hitters with an EXACT verify pass — the
    deterministic counter-summary twin of ``cms_heavy_hitters``: where the
    CMS readout is an upper bound (no false negatives, deterministic false
    positives), this emits the exact heavy-hitter set (tokens with
    ``n * denom >= N``) with exact counts and NO false positives.

    Guarantee (pigeonhole form of the MG bound): a per-block candidate
    pass keeps tokens with ``count_b * (denom + 1) > N_b`` — at most
    ``denom`` per block — and any token with global count >= N/denom must
    clear that bar in at least one block, so the union of per-block
    candidate sets is a SUPERSET of the true heavy hitters at any
    partitioning.  Pass 2 probes only the broadcast candidate set for
    exact counts (bigram_lift's is_in shape) and applies the exact
    threshold.

    Scale shape: pass 1 ships <= denom candidate rows + one total-count
    sentinel per block (driver state is candidate-bounded, never
    vocab-bounded); pass 2 shuffles only |candidates| rows per block
    through a 16-way token-shard segment-sum merge."""
    import ray
    import pyarrow.compute as pc

    from invoice_extraction_ray.ops.text import _ws_tokens, _crc32_shard

    ds = ray.data.read_parquet(_pq(sf_dir, "documents"), columns=["text"])

    _TOT = "\x00n_total"  # NUL can't appear in a \S+ token

    def candidates(t: pa.Table) -> pa.Table:
        flat, _ = _ws_tokens(t.column("text"))
        n_b = len(flat)
        g = pa.table({"token": flat}).group_by("token").aggregate([([], "count_all")])
        cnt = g.column("count_all").to_numpy(zero_copy_only=False)
        keep = cnt * (denom + 1) > n_b
        kept = g.column("token").filter(pa.array(keep))
        if isinstance(kept, pa.ChunkedArray):
            kept = kept.combine_chunks()
        return pa.table(
            {
                "token": pa.concat_arrays([kept, pa.array([_TOT], pa.string())]),
                "n_b": pa.array([0] * len(kept) + [n_b], pa.int64()),
            }
        )

    # pass 1: candidate union + stream length via one sentinel row per
    # block — driver state is <= blocks * (denom + 1) rows
    cand_rows = ds.map_batches(candidates, batch_format="pyarrow").take_all()
    n_total = sum(r["n_b"] for r in cand_rows if r["token"] == _TOT)
    cands = sorted({r["token"] for r in cand_rows if r["token"] != _TOT})
    if not cands or not n_total:
        return pa.table(
            {"token": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    cand_arr = pa.array(cands, pa.string())
    cand_ref = ray.put(cand_arr)

    def probe(t: pa.Table) -> pa.Table:
        cset = ray.get(cand_ref)  # plasma zero-copy per batch
        flat, _ = _ws_tokens(t.column("text"))
        hits = flat.filter(pc.is_in(flat, value_set=cset))
        g = pa.table({"token": hits}).group_by("token").aggregate([([], "count_all")])
        out = pa.table(
            {
                "token": g.column("token"),
                "n": pc.cast(g.column("count_all"), pa.int64()),
            }
        )
        return out.append_column("tshard", _crc32_shard(out.column("token"), 15))

    def reduce_shard(g: pa.Table) -> pa.Table:
        from ._util import int_segment_sum

        if g.num_rows == 0:
            return pa.table(
                {"token": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        g = g.sort_by([("token", "ascending")])
        tok = g.column("token").combine_chunks()
        n = g.column("n").to_numpy(zero_copy_only=False)
        new = np.ones(g.num_rows, dtype=bool)
        if g.num_rows > 1:
            new[1:] = ~pc.equal(tok.slice(1), tok.slice(0, g.num_rows - 1)).to_numpy(
                zero_copy_only=False
            )
        starts = np.flatnonzero(new)
        return pa.table(
            {
                "token": pc.take(tok, pa.array(starts)),
                "n": pa.array(int_segment_sum(n, starts), pa.int64()),
            }
        )

    rows = (
        ds.map_batches(probe, batch_format="pyarrow")
        .groupby("tshard")
        .map_groups(
            lambda g: reduce_shard(_dropg(g, ["tshard"])),
            batch_format="pyarrow",
        )
        .take_all()
    )  # <= |candidates| rows
    out = [
        (r["token"], int(r["n"]))
        for r in rows
        if int(r["n"]) * denom >= n_total  # exact threshold — no FPs
    ]
    out.sort(key=lambda x: (-x[1], x[0]))
    return pa.table(
        {
            "token": pa.array([x[0] for x in out], pa.string()),
            "n": pa.array([x[1] for x in out], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# join-cardinality estimation: the query-planning sketch — how big would
# orders JOIN lineitem be, WITHOUT running the join?  A KMV (min-k) sample
# of the union key space carries both sides' per-key counts; the sampled
# count products scale by the inclusion probability
# ---------------------------------------------------------------------------


def join_size_estimate(sf_dir: str, n_shards: int = 64) -> pa.Table:
    """Estimate |orders ⋈ lineitem on orderkey| from a ``config.JOIN_EST_K``
    min-hash sample: for the keys whose splitmix64 hash falls below the
    k-th smallest, sum cA(key)·cB(key) and scale by the sampled fraction —
    ``est = S · 2^64 // h_k`` (all-integer, HUGEINT-mirrored, bit-exact
    across engines like kmv_distinct).  Fewer distinct keys than K degrades
    to the exact join size (the sample IS the population).

    Scale shape: per-batch (key, side, count) distinct partials → one
    key-shard groupby makes per-key counts exact (every partial of a key
    lands in one shard) → each shard emits its min-k (hash, product) rows
    (a valid combiner) → the driver merges ≤ shards·k rows.  Neither fact
    table's rows ever shuffle; state is k pairs per shard.

    Output: (k, kth_hi, kth_lo, est_join_rows)."""
    from ._util import absorb_empty_blocks, combine_by_key
    from ..config import JOIN_EST_K

    k = JOIN_EST_K

    _PART = pa.schema(
        [
            ("kshard", pa.int32()),
            ("key", pa.int64()),
            ("side", pa.int8()),
            ("c", pa.int64()),
        ]
    )

    def side_partial(col: str, side_val: int):
        def fn(t: pa.Table) -> pa.Table:
            keys = t.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
            ks, counts = np.unique(keys, return_counts=True)
            return pa.table(
                {
                    "kshard": pa.array(
                        (((ks * 2654435761) % (1 << 32)) % n_shards).astype(np.int32)
                    ),
                    "key": pa.array(ks, pa.int64()),
                    "side": pa.array(
                        np.full(len(ks), side_val, dtype=np.int8), pa.int8()
                    ),
                    "c": pa.array(counts.astype(np.int64), pa.int64()),
                },
                schema=_PART,
            )

        return fn

    def shard_mink(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {"h": pa.array([], pa.uint64()), "prod": pa.array([], pa.int64())}
            )
        keys = g.column("key").to_numpy(zero_copy_only=False)
        side = g.column("side").to_numpy(zero_copy_only=False).astype(np.int64)
        c = g.column("c").to_numpy(zero_copy_only=False)
        uk, ca, cb = combine_by_key(keys, c * (side == 0), c * (side == 1))
        prod = ca * cb  # 0 when a key exists on only one side — correct
        h = _hash64(uk)
        top = np.argsort(h, kind="stable")[:k]
        return pa.table(
            {
                "h": pa.array(h[top], pa.uint64()),
                "prod": pa.array(prod[top], pa.int64()),
            }
        )

    a = ray.data.read_parquet(_pq(sf_dir, "orders"), columns=["o_orderkey"]).map_batches(
        side_partial("o_orderkey", 0), batch_format="pyarrow"
    )
    b = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"), columns=["l_orderkey"]
    ).map_batches(side_partial("l_orderkey", 1), batch_format="pyarrow")

    rows = (
        absorb_empty_blocks(a.union(b), batch_size=131072)
        .groupby("kshard")
        .map_groups(
            lambda g: shard_mink(_dropg(g, ["kshard"])), batch_format="pyarrow"
        )
        .take_all()  # <= n_shards * k rows
    )
    if not rows:
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "kth_hi": pa.array([0], pa.int64()),
                "kth_lo": pa.array([0], pa.int64()),
                "est_join_rows": pa.array([0], pa.int64()),
            }
        )
    h = np.array([r["h"] for r in rows], dtype=np.uint64)
    prod = np.array([r["prod"] for r in rows], dtype=np.int64)
    order = np.argsort(h, kind="stable")
    h, prod = h[order], prod[order]
    n = len(h)
    if n < k:  # sample is the whole population: exact join size
        est = int(prod.sum())
        kth = 0
    else:
        kth = int(h[k - 1])
        s = int(prod[h < np.uint64(kth)].sum())
        est = s * (1 << 64) // kth if kth else 0
    return pa.table(
        {
            "k": pa.array([min(n, k)], pa.int64()),
            "kth_hi": pa.array([kth >> 32], pa.int64()),
            "kth_lo": pa.array([kth & 0xFFFFFFFF], pa.int64()),
            "est_join_rows": pa.array([est], pa.int64()),
        }
    )


def value_ks_drift(
    sf_dir: str,
    types: tuple[str, str] | None = None,
    num_shards: int = 64,
) -> pa.Table:
    """Exact two-sample Kolmogorov-Smirnov distance between the cent-value
    distributions of two event types (the distribution-drift audit between
    crawl batches / mixture snapshots) — INTEGER-exact: the KS sup is taken
    over cross-multiplied cumulative counts, ``max |cum1*n2 - cum2*n1|``,
    so no float CDF division ever happens; the e6-scaled distance divides
    once in arbitrary-precision python ints.

    Scale shape (user_value_ntile's ordered-prefix trick): per-batch census
    partials collapse rows to distinct (cents, a, b) counts; a ~1k-bin
    monotone (frexp) histogram gives every bin its exact GLOBAL prefix
    base; bins ride ONE coarse-shard groupby where each shard cumsums
    WITHIN its bins (order across bins is carried entirely by the broadcast
    bases) and emits one per-shard max — only O(shards + bins) rows reach
    the driver, never the value census."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from ..config import KS_EVENT_TYPES
    from ..ops.window import _rank_bin
    from ._util import absorb_empty_blocks, int_segment_sum

    if types is None:
        types = KS_EVENT_TYPES
    t1, t2 = types

    _CENSUS = pa.schema(
        [
            ("kshard", pa.int32()),
            ("bin", pa.int64()),
            ("cents", pa.int64()),
            ("a", pa.int64()),
            ("b", pa.int64()),
        ]
    )

    def census(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _CENSUS.empty_table()
        ty = t.column("event_type")
        keep = pc.or_(pc.equal(ty, t1), pc.equal(ty, t2))
        t = t.filter(keep)
        if t.num_rows == 0:
            return _CENSUS.empty_table()
        v = t.column("value").to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
        isa = pc.equal(t.column("event_type"), t1).to_numpy(zero_copy_only=False)
        order = np.argsort(cents, kind="stable")
        cents = cents[order]
        isa = isa[order]
        new = np.ones(len(cents), dtype=bool)
        new[1:] = cents[1:] != cents[:-1]
        starts = np.flatnonzero(new)
        a = int_segment_sum(isa.astype(np.int64), starts)
        b = int_segment_sum((~isa).astype(np.int64), starts)
        uc = cents[starts]
        bins = _rank_bin(uc)
        return pa.table(
            {
                "kshard": pa.array((bins % num_shards).astype(np.int32)),
                "bin": pa.array(bins, pa.int64()),
                "cents": pa.array(uc, pa.int64()),
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
            },
            schema=_CENSUS,
        )

    ds = ray.data.read_parquet(
        _pq(sf_dir, "events"), columns=["event_type", "value"]
    )
    cens = absorb_empty_blocks(
        ds.map_batches(census, batch_format="pyarrow"), batch_size=131072
    ).materialize()  # distinct-cents-bounded slim census, consumed twice

    # pass 1: exact per-bin totals -> global prefix bases (tiny: ~1k bins)
    def bin_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("bin").aggregate([("a", "sum"), ("b", "sum")])
        return pa.table(
            {
                "bin": g.column("bin"),
                "a": pc.cast(g.column("a_sum"), pa.int64()),
                "b": pc.cast(g.column("b_sum"), pa.int64()),
            }
        )

    rows = (
        cens.map_batches(bin_partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("a", alias_name="a"), Sum("b", alias_name="b"))
        .take_all()
    )
    rows.sort(key=lambda r: r["bin"])
    _EMPTY = pa.schema(
        [("d_num", pa.int64()), ("d_e6", pa.int64()), ("n1", pa.int64()), ("n2", pa.int64())]
    ).empty_table()
    if not rows:
        return _EMPTY
    base_a: dict[int, int] = {}
    base_b: dict[int, int] = {}
    ca = cb = 0
    for r in rows:
        base_a[r["bin"]], base_b[r["bin"]] = ca, cb
        ca += int(r["a"])
        cb += int(r["b"])
    n1, n2 = ca, cb
    if n1 == 0 or n2 == 0:
        return _EMPTY
    if max(n1, n2) ** 2 >= (1 << 62):
        raise ValueError("value_ks_drift: cum*count product would overflow int64")

    _PART = pa.schema([("d_num", pa.int64())])

    def shard_max(g: pa.Table) -> pa.Table:
        g = _dropg(g, ["kshard"])
        if g.num_rows == 0:
            return _PART.empty_table()
        bi = g.column("bin").to_numpy(zero_copy_only=False)
        ce = g.column("cents").to_numpy(zero_copy_only=False)
        a = g.column("a").to_numpy(zero_copy_only=False)
        b = g.column("b").to_numpy(zero_copy_only=False)
        order = np.lexsort((ce, bi))
        bi, ce, a, b = bi[order], ce[order], a[order], b[order]
        # merge duplicate cents (same value censused in several blocks)
        new = np.ones(len(ce), dtype=bool)
        new[1:] = (bi[1:] != bi[:-1]) | (ce[1:] != ce[:-1])
        starts = np.flatnonzero(new)
        a = int_segment_sum(a, starts)
        b = int_segment_sum(b, starts)
        bi, ce = bi[starts], ce[starts]
        newb = np.ones(len(bi), dtype=bool)
        newb[1:] = bi[1:] != bi[:-1]
        bstarts = np.flatnonzero(newb)
        seg = np.cumsum(newb) - 1
        ca_loc = np.cumsum(a)
        cb_loc = np.cumsum(b)
        # reset cumsum at each bin start, add the broadcast global base
        off_a = ca_loc[bstarts] - a[bstarts]
        off_b = cb_loc[bstarts] - b[bstarts]
        ga = ca_loc - off_a[seg] + np.array([base_a[x] for x in bi[bstarts]])[seg]
        gb = cb_loc - off_b[seg] + np.array([base_b[x] for x in bi[bstarts]])[seg]
        d = np.abs(ga * n2 - gb * n1)
        return pa.table({"d_num": pa.array([int(d.max())], pa.int64())}, schema=_PART)

    parts = (
        cens.groupby("kshard")
        .map_groups(shard_max, batch_format="pyarrow")
        .take_all()
    )
    if not parts:
        return _EMPTY
    d_num = max(int(r["d_num"]) for r in parts)
    d_e6 = (1_000_000 * d_num) // (n1 * n2)
    return pa.table(
        {
            "d_num": pa.array([d_num], pa.int64()),
            "d_e6": pa.array([d_e6], pa.int64()),
            "n1": pa.array([n1], pa.int64()),
            "n2": pa.array([n2], pa.int64()),
        }
    )


def sketch_error_report(sf_dir: str) -> pa.Table:
    """Accuracy evaluation of the log-bin quantile sketch against the exact
    per-type quantiles — the sketch-family member of the engine's eval-trio
    (ANN has ann_recall_report, dedup has neardup_recall_report): per
    event type, the relative error of each sketched quantile in e6 fixed
    point (``abs(sk - exact) * 1e6 // max(exact, 1)``, exact integers on
    both engines).

    Scale shape: both inputs are the already-registered distributed
    pipelines (exact quantiles from bounded per-type cent histograms, the
    sketch from 3072 mergeable log bins); their outputs are enum-bounded
    (one row per event type), so the comparison join is a driver-side zip
    of two tiny tables — the 100-TB cost lives in the two streaming scans,
    not here."""
    ex = {r["event_type"]: r for r in value_quantiles(sf_dir).take_all()}
    sk = {r["event_type"]: r for r in value_quantiles_sketch(sf_dir).take_all()}
    etypes = sorted(set(ex) & set(sk))
    cols: dict[str, list] = {"event_type": list(etypes)}
    for q in (25, 50, 75, 95):
        errs = []
        for t in etypes:
            exact = int(ex[t][f"p{q}_c"])
            approx = int(sk[t][f"p{q}_c"])
            errs.append(abs(approx - exact) * 1_000_000 // max(exact, 1))
        cols[f"err{q}_e6"] = errs
    return pa.table(
        {
            "event_type": pa.array(cols["event_type"], pa.string()),
            **{
                f"err{q}_e6": pa.array(cols[f"err{q}_e6"], pa.int64())
                for q in (25, 50, 75, 95)
            },
        }
    )


def hll_error_report(sf_dir: str, n_shards: int = 64) -> pa.Table:
    """Accuracy evaluation of the HLL distinct-count sketch against the
    exact per-type distinct-user counts — the cardinality member of the
    sketch eval family (:func:`sketch_error_report` covers quantiles):
    per event type, exact count, HLL estimate, and relative error in e6
    fixed point.

    Scale shape: the exact side is the two-stage distinct idiom — each
    batch emits its DISTINCT (user-shard, user, type) triples, each user
    shard re-distincts and emits per-type count partials, a tiny
    enum-bounded type groupby sums; the sketch side is the registered
    mergeable-register pipeline.  Both outputs are one row per event
    type, so the comparison is a driver-side zip of two tiny tables."""
    import pyarrow.compute as pc

    from ._util import drop_if_present as _dropg
    from ._util import int_segment_sum

    ds = ray.data.read_parquet(
        _pq(sf_dir, "events"), columns=["event_type", "user_id"]
    )

    _PART = pa.schema([("event_type", pa.string()), ("n", pa.int64())])

    def slim(t: pa.Table) -> pa.Table:
        g = (
            t.select(["event_type", "user_id"])
            .group_by(["event_type", "user_id"])
            .aggregate([])
        )
        shard = pc.cast(
            pc.bit_wise_and(g.column("user_id"), n_shards - 1), pa.int32()
        )
        return g.append_column("ushard", shard)

    def shard_counts(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _PART.empty_table()
        g = (
            g.select(["event_type", "user_id"])
            .group_by(["event_type", "user_id"])
            .aggregate([])
            .sort_by([("event_type", "ascending")])
        )
        et = g.column("event_type").combine_chunks()
        m = g.num_rows
        new = np.ones(m, dtype=bool)
        if m > 1:
            new[1:] = ~pc.equal(et.slice(1), et.slice(0, m - 1)).to_numpy(
                zero_copy_only=False
            )
        starts = np.flatnonzero(new)
        return pa.table(
            {
                "event_type": pc.take(et, pa.array(starts)),
                "n": pa.array(
                    int_segment_sum(np.ones(m, dtype=np.int64), starts),
                    pa.int64(),
                ),
            },
            schema=_PART,
        )

    def finish(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _PART.empty_table()
        return pa.table(
            {
                "event_type": pa.array(
                    [g.column("event_type")[0].as_py()], pa.string()
                ),
                "n": pa.array(
                    [int(np.sum(g.column("n").to_numpy(zero_copy_only=False),
                                dtype=np.int64))],
                    pa.int64(),
                ),
            },
            schema=_PART,
        )

    exact_rows = (
        ds.map_batches(slim, batch_format="pyarrow")
        .groupby("ushard")
        .map_groups(
            lambda g: shard_counts(_dropg(g, ["ushard"])), batch_format="pyarrow"
        )
        .groupby("event_type")
        .map_groups(finish, batch_format="pyarrow")
        .take_all()
    )
    exact = {r["event_type"]: int(r["n"]) for r in exact_rows}
    approx = {
        r["event_type"]: int(r["approx_distinct"])
        for r in hll_distinct_users(sf_dir).take_all()
    }
    etypes = sorted(set(exact) & set(approx))
    return pa.table(
        {
            "event_type": pa.array(etypes, pa.string()),
            "exact_n": pa.array([exact[t] for t in etypes], pa.int64()),
            "approx_n": pa.array([approx[t] for t in etypes], pa.int64()),
            "err_e6": pa.array(
                [
                    abs(approx[t] - exact[t]) * 1_000_000 // max(exact[t], 1)
                    for t in etypes
                ],
                pa.int64(),
            ),
        }
    )
