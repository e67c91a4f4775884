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
- vertex state never lives on the driver.  Supersteps run over
  CO-PARTITIONED per-shard edge tables held in the object store (split
  once from the stage-1 groupby output, edges pre-sorted by destination):
  Ray Data cannot express "iterate while keeping one side of a groupby in
  place", so the iteration is the documented raw-task escape hatch — one
  send task and one fold task per shard per superstep, wired by the SAME
  hash both ways.  Per round the wire carries ONLY messages
  (partial-summed per destination inside the sender, <= |distinct dsts
  per shard x shard| rows); edge rows never move again after stage 1.
  Partitioning assumption: vertex ownership is hash(v) % n_shards on both
  the edge and message sides.
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

    # ---- stage 2: co-partitioned raw-task supersteps ---------------------
    # Ray Data cannot keep the edge side of a groupby IN PLACE across an
    # iteration, so this is the documented raw-task escape hatch: per-shard
    # edge tables are split ONCE from the stage-1 groupby output and pinned
    # in the object store; each superstep is one send task + one fold task
    # per shard, and only per-destination partial-summed messages travel.
    _EDGES = pa.schema(
        [("src", pa.int64()), ("dst", pa.int64()), ("deg", pa.int64())]
    )
    _RANKS = pa.schema([("v", pa.int64()), ("r", pa.int64())])
    _MSG = pa.schema([("dst", pa.int64()), ("m", pa.int64())])
    _OUT = pa.schema(
        [("kind", pa.string()), ("key", pa.int64()), ("rank_ppm", pa.int64())]
    )

    def _split_block(tbl: pa.Table):
        """One stage-1 output block -> its per-shard sub-tables."""
        sh = tbl.column("shard").to_numpy(zero_copy_only=False)
        return tuple(tbl.filter(pa.array(sh == s)) for s in range(n_shards))

    def _assemble(*parts: pa.Table):
        """This shard's stage-1 rows -> (edges sorted by dst, initial
        ranks).  Runs once per shard; edges never move again."""
        parts = [p for p in parts if p.num_rows]
        if not parts:
            return _EDGES.empty_table(), _RANKS.empty_table()
        t = pa.concat_tables(parts)
        side = t.column("side").to_numpy(zero_copy_only=False)
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        emask = side == 0
        src, dst, deg = a[emask], b[emask], c[emask]
        order = np.argsort(dst, kind="stable")  # pre-sort for segment sums
        edges = pa.table(
            {
                "src": pa.array(src[order], pa.int64()),
                "dst": pa.array(dst[order], pa.int64()),
                "deg": pa.array(deg[order], pa.int64()),
            },
            schema=_EDGES,
        )
        vmask = side == 1
        v, r = a[vmask], b[vmask]
        vorder = np.argsort(v, kind="stable")
        ranks = pa.table(
            {
                "v": pa.array(v[vorder], pa.int64()),
                "r": pa.array(r[vorder], pa.int64()),
            },
            schema=_RANKS,
        )
        return edges, ranks

    def _fold_msgs(msgs) -> pa.Table:
        """Damped integer fold of this shard's incoming messages -> new
        sorted rank table (int sums are order-independent, so the merge is
        deterministic regardless of task completion order)."""
        msgs = [m for m in msgs if m.num_rows]
        if not msgs:
            return _RANKS.empty_table()
        t = pa.concat_tables(msgs)
        dst = t.column("dst").to_numpy(zero_copy_only=False)
        m = t.column("m").to_numpy(zero_copy_only=False)
        order = np.argsort(dst, kind="stable")
        dst, m = dst[order], m[order]
        new = np.ones(len(dst), dtype=bool)
        new[1:] = dst[1:] != dst[:-1]
        starts = np.flatnonzero(new)
        r = _JUMP_PPM + _DAMP_NUM * int_segment_sum(m, starts) // _DAMP_DEN
        return pa.table(
            {
                "v": pa.array(dst[starts], pa.int64()),
                "r": pa.array(r, pa.int64()),
            },
            schema=_RANKS,
        )

    def _step(edges: pa.Table, ranks0, *msgs):
        """ONE task per shard per superstep — receive-then-send: fold the
        incoming messages into this shard's ranks (or take the seeded r0
        table on the first round), then emit next-round contributions
        r[src] // deg partial-summed per dst (edges are dst-sorted), split
        by the destination's owner shard.  Fusing fold+send halves the
        per-round task count and removes one scheduling hop per round —
        the rounds are latency-bound, not compute-bound."""
        ranks = ranks0 if ranks0 is not None else _fold_msgs(msgs)
        if edges.num_rows == 0:
            return tuple(_MSG.empty_table() for _ in range(n_shards))
        src = edges.column("src").to_numpy(zero_copy_only=False)
        dst = edges.column("dst").to_numpy(zero_copy_only=False)
        deg = edges.column("deg").to_numpy(zero_copy_only=False)
        v = ranks.column("v").to_numpy(zero_copy_only=False)
        r = ranks.column("r").to_numpy(zero_copy_only=False)
        contrib = r[np.searchsorted(v, src)] // deg  # every src has a rank
        new = np.ones(len(dst), dtype=bool)
        new[1:] = dst[1:] != dst[:-1]
        starts = np.flatnonzero(new)
        dsts = dst[starts]
        msum = int_segment_sum(contrib, starts)
        dsh = _shard_of(dsts)
        return tuple(
            pa.table(
                {
                    "dst": pa.array(dsts[dsh == s], pa.int64()),
                    "m": pa.array(msum[dsh == s], pa.int64()),
                },
                schema=_MSG,
            )
            for s in range(n_shards)
        )

    def _finalize(*msgs: pa.Table) -> pa.Table:
        """Receive-only last round: fold, label vertices."""
        ranks = _fold_msgs(msgs)
        v = ranks.column("v").to_numpy(zero_copy_only=False)
        r = ranks.column("r").to_numpy(zero_copy_only=False)
        kind = np.where(v % 2 == 0, "part", "supplier")
        return pa.table(
            {
                "kind": pa.array(kind, pa.string()),
                "key": pa.array(v >> 1, pa.int64()),
                "rank_ppm": pa.array(r, pa.int64()),
            },
            schema=_OUT,
        )

    split_t = ray.remote(num_returns=n_shards)(_split_block)
    assemble_t = ray.remote(num_returns=2)(_assemble)
    step_t = ray.remote(num_returns=n_shards)(_step)
    final_t = ray.remote(_finalize)

    blocks = state.to_arrow_refs()  # materialize in the object store only
    parts = [split_t.remote(b) for b in blocks]
    shard_state = [
        assemble_t.remote(*[parts[b][s] for b in range(len(parts))])
        for s in range(n_shards)
    ]
    edges_ref = [st[0] for st in shard_state]
    ranks0_ref = [st[1] for st in shard_state]
    # superstep 1 sends from the seeded r0; each later superstep folds the
    # previous round's messages and sends — `iterations` folds in total
    # (the last one inside _finalize), exactly the oracle's r1..rN chain.
    grid = [step_t.remote(edges_ref[s], ranks0_ref[s]) for s in range(n_shards)]
    for _ in range(iterations - 1):
        grid = [
            step_t.remote(
                edges_ref[s], None, *[grid[sp][s] for sp in range(n_shards)]
            )
            for s in range(n_shards)
        ]
    return ray.data.from_arrow_refs(
        [
            final_t.remote(*[grid[sp][s] for sp in range(n_shards)])
            for s in range(n_shards)
        ]
    ).sort(["kind", "key"])
