"""Iterative graph algorithms as per-superstep groupby message passing.

``pagerank``: the canonical iterative distributed algorithm (power
iteration with damping) over the part<->supplier bipartite graph induced
by lineitem, kept ENTIRELY in integers so engine and SQL oracle agree
bit-for-bit: ranks start at 1,000,000 ppm and update as
``r' = 150000 + 85 * sum(r_src // deg_src) // 100`` (floor division at
both steps — deterministic, no float accumulation order).

Scale shape (the part Ray Data doesn't give you for free):
- the EDGE table is built in ONE all-to-all: per-batch distinct pairs are
  emitted both directions keyed by SOURCE vertex, so every copy of an
  edge lands in one shard, whose np.unique is a global dedup; the shard
  computes out-degrees locally and seeds the initial rank rows.
- vertex state never lives on the driver.  Each Pregel-style SUPERSTEP is
  exactly ONE all-to-all: a vertex's owner shard holds its out-edges AND
  receives its incoming messages (both keyed by the same hash), so one
  kernel folds messages into new ranks and immediately emits the next
  round's messages — partial-summed per destination before the shuffle,
  so the wire carries <= |distinct dsts per shard| rows, never |edges|.
  Edge rows ride the same shuffle unchanged (they re-sort each round;
  co-partitioned zip would avoid even that, but Ray Data cannot express
  it without a custom operator — documented trade-off).
- connected-component label propagation (the same message-passing shape)
  lives in ops/dedup.py::neardup_clusters.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _pq(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


_RANK0_PPM = 1_000_000
_JUMP_PPM = 150_000  # (1 - 0.85) * 1e6
_DAMP_NUM, _DAMP_DEN = 85, 100

# union-aligned row schema:
#   edges    side=0: shard=hash(src), a=src, b=dst, c=out_deg
#   ranks    side=1: shard=hash(v),   a=v,   b=rank_ppm
#   messages side=2: shard=hash(dst), a=dst, b=partial contribution sum
_MERGED = pa.schema(
    [
        ("shard", pa.int32()),
        ("a", pa.int64()),
        ("b", pa.int64()),
        ("c", pa.int64()),
        ("side", pa.int8()),
    ]
)


def pagerank(
    sf_dir: str, iterations: int = 3, n_shards: int = 8
) -> ray.data.Dataset:
    """Integer PageRank over the bipartite part<->supplier graph (vertices:
    part p -> id 2p, supplier s -> id 2s+1; one edge each way per distinct
    (part, supplier) lineitem pair, so every vertex has in-edges and the
    rank recurrence covers the whole vertex set)."""
    from ._util import absorb_empty_blocks, int_segment_sum

    def _shard_of(v: "np.ndarray") -> "np.ndarray":
        return (((v * 2654435761) % (1 << 32)) % n_shards).astype(np.int32)

    # ---- stage 1: distinct edges, degrees and r0 in ONE all-to-all ------
    def pair_partial(t: pa.Table) -> pa.Table:
        p = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        s = t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(p) == 0:
            return _MERGED.empty_table()
        # Both pack sites ((p<<20)|s here, (src<<21)|dst in stamp_degrees
        # with vertex = 2*key(+1)) require keys < 2^20.  Fail LOUDLY on
        # wider keys instead of silently corrupting edges.
        if p.max() >= (1 << 20) or s.max() >= (1 << 20) or p.min() < 0 or s.min() < 0:
            raise ValueError(
                "pagerank: part/supp keys must be in [0, 2^20) for the "
                "int64 edge pack; got partkey max %d, suppkey max %d — "
                "widen the pack or switch to a two-column key"
                % (int(p.max()), int(s.max()))
            )
        packed = np.unique((p << 20) | s)
        p, s = packed >> 20, packed & ((1 << 20) - 1)
        src = np.concatenate([p * 2, s * 2 + 1])
        dst = np.concatenate([s * 2 + 1, p * 2])
        return pa.table(
            {
                "shard": pa.array(_shard_of(src)),
                "a": pa.array(src, pa.int64()),
                "b": pa.array(dst, pa.int64()),
                "c": pa.array(np.zeros(len(src), np.int64), pa.int64()),
                "side": pa.array(np.zeros(len(src), np.int8), pa.int8()),
            },
            schema=_MERGED,
        )

    def stamp_degrees(g: pa.Table) -> pa.Table:
        """All out-edges of a vertex land in its shard: global-dedup the
        (src, dst) pairs, count runs for out-degree, stamp it on every edge
        row; also emit the shard's initial rank rows (one per distinct
        src).  Vertex ids fit 21 bits here (testdata shape) so the pair
        packs into one int64 for the unique."""
        if g.num_rows == 0:
            return _MERGED.empty_table()
        src = g.column("a").to_numpy(zero_copy_only=False)
        dst = g.column("b").to_numpy(zero_copy_only=False)
        pair = np.unique((src << 21) | dst)
        src, dst = pair >> 21, pair & ((1 << 21) - 1)
        new = np.ones(len(src), dtype=bool)
        new[1:] = src[1:] != src[:-1]
        starts = np.flatnonzero(new)
        deg = int_segment_sum(np.ones(len(src), np.int64), starts)
        deg_per_edge = np.repeat(deg, np.diff(np.append(starts, len(src))))
        verts = src[starts]
        n_e, n_v = len(src), len(verts)
        return pa.table(
            {
                "shard": pa.array(
                    np.concatenate([_shard_of(src), _shard_of(verts)])
                ),
                "a": pa.array(np.concatenate([src, verts]), pa.int64()),
                "b": pa.array(
                    np.concatenate([dst, np.full(n_v, _RANK0_PPM, np.int64)]),
                    pa.int64(),
                ),
                "c": pa.array(
                    np.concatenate([deg_per_edge, np.zeros(n_v, np.int64)]),
                    pa.int64(),
                ),
                "side": pa.array(
                    np.concatenate([np.zeros(n_e, np.int8), np.ones(n_v, np.int8)]),
                    pa.int8(),
                ),
            },
            schema=_MERGED,
        )

    li = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"), columns=["l_partkey", "l_suppkey"]
    )
    state = absorb_empty_blocks(
        li.map_batches(pair_partial, batch_format="pyarrow"), batch_size=131072
    ).groupby("shard").map_groups(stamp_degrees, batch_format="pyarrow")

    # ---- stage 2: one all-to-all per superstep ---------------------------
    def _fold_ranks(a, b, c, side):
        """Current ranks of this shard's vertices: r0 rows on the first
        superstep, else damped fold of the incoming per-dst messages."""
        if (side == 1).any():
            vmask = side == 1
            return a[vmask], b[vmask]
        mmask = side == 2
        dst, m = a[mmask], b[mmask]
        order = np.argsort(dst, kind="stable")
        dst, m = dst[order], m[order]
        new = np.ones(len(dst), dtype=bool)
        new[1:] = dst[1:] != dst[:-1]
        starts = np.flatnonzero(new)
        v = dst[starts]
        r = _JUMP_PPM + _DAMP_NUM * int_segment_sum(m, starts) // _DAMP_DEN
        return v, r

    def superstep(g: pa.Table) -> pa.Table:
        """Receive-then-send: fold incoming into ranks, emit next-round
        messages (partial-summed per dst), pass edge rows through."""
        if g.num_rows == 0:
            return _MERGED.empty_table()
        side = g.column("side").to_numpy(zero_copy_only=False)
        a = g.column("a").to_numpy(zero_copy_only=False)
        b = g.column("b").to_numpy(zero_copy_only=False)
        c = g.column("c").to_numpy(zero_copy_only=False)
        v, r = _fold_ranks(a, b, c, side)
        order = np.argsort(v)
        v, r = v[order], r[order]
        emask = side == 0
        src, dst, deg = a[emask], b[emask], c[emask]
        pos = np.searchsorted(v, src)  # every src has a rank here
        contrib = r[pos] // deg
        dorder = np.argsort(dst, kind="stable")
        sdst, contrib = dst[dorder], contrib[dorder]
        new = np.ones(len(sdst), dtype=bool)
        new[1:] = sdst[1:] != sdst[:-1]
        starts = np.flatnonzero(new)
        dsts = sdst[starts]
        msum = int_segment_sum(contrib, starts)
        n_e, n_m = len(src), len(dsts)
        return pa.table(
            {
                "shard": pa.array(
                    np.concatenate([_shard_of(src), _shard_of(dsts)])
                ),
                "a": pa.array(np.concatenate([src, dsts]), pa.int64()),
                "b": pa.array(np.concatenate([dst, msum]), pa.int64()),
                "c": pa.array(
                    np.concatenate([deg, np.zeros(n_m, np.int64)]), pa.int64()
                ),
                "side": pa.array(
                    np.concatenate(
                        [np.zeros(n_e, np.int8), np.full(n_m, 2, np.int8)]
                    ),
                    pa.int8(),
                ),
            },
            schema=_MERGED,
        )

    _OUT = pa.schema(
        [("kind", pa.string()), ("key", pa.int64()), ("rank_ppm", pa.int64())]
    )

    def finalize(g: pa.Table) -> pa.Table:
        """Receive-only last round: fold messages, label vertices."""
        if g.num_rows == 0:
            return _OUT.empty_table()
        side = g.column("side").to_numpy(zero_copy_only=False)
        a = g.column("a").to_numpy(zero_copy_only=False)
        b = g.column("b").to_numpy(zero_copy_only=False)
        c = g.column("c").to_numpy(zero_copy_only=False)
        v, r = _fold_ranks(a, b, c, side)
        kind = np.where(v % 2 == 0, "part", "supplier")
        return pa.table(
            {
                "kind": pa.array(kind, pa.string()),
                "key": pa.array(v >> 1, pa.int64()),
                "rank_ppm": pa.array(r, pa.int64()),
            },
            schema=_OUT,
        )

    for _ in range(iterations):
        state = (
            absorb_empty_blocks(state, batch_size=131072)
            .groupby("shard")
            .map_groups(superstep, batch_format="pyarrow")
        )

    return (
        absorb_empty_blocks(state, batch_size=131072)
        .groupby("shard")
        .map_groups(finalize, batch_format="pyarrow")
        .sort(["kind", "key"])
    )
