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
from ._util import drop_if_present as _dropg

_PKEY_BITS = 21  # partkey < 2^21, asserted at the read like copurchase_pairs
_PKEY_MASK = (1 << _PKEY_BITS) - 1


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
        """One stage-1 output block -> its per-shard sub-tables.  The
        groupby can emit ZERO-COLUMN empty blocks (the schema-less
        empty-block hazard); _assemble drops zero-row parts regardless of
        schema, so hand those straight through."""
        if tbl.num_rows == 0 or "shard" not in tbl.column_names:
            return (tbl,) * n_shards
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

    state = state.materialize()  # edge/rank state, bounded by distinct pairs
    if state.count() == 0:  # empty graph -> empty ranks, full schema
        return ray.data.from_arrow(_OUT.empty_table())
    blocks = state.to_arrow_refs()  # already materialized: no recompute
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


def copurchase_triangles(
    sf_dir: str,
    min_support: int = 2,
    n_shards: int = 32,
    max_basket: int = 64,
) -> pa.Table:
    """Distributed TRIANGLE COUNT + global clustering coefficient over the
    co-purchase part graph (undirected edge = two parts co-occurring in
    >= ``min_support`` orders, baskets capped at ``max_basket`` like
    copurchase_pairs) — the graph-statistics pass (community density /
    spam-ring detection) a web-scale corpus runs after building an item or
    link graph.

    Scale shape (the standard degree-ordered orientation algorithm):
    - edges come from copurchase_pairs' basket co-partition + pair-shard
      segment-sum shape with the support filter applied IN the pair shard,
      then are materialized ONCE (the support-filtered edge set is the
      bounded intermediate a 100-TB run checkpoints; everything after
      touches edges, never lineitem).
    - each edge fans out to BOTH endpoints' vertex shards, so a vertex's
      degree is its shard-local run length — no driver state — and the
      undirected wedge total sum(C(deg,2)) rides the rest of the pipeline
      as sentinel counter rows.
    - edges re-merge in a pair shard to learn both endpoint degrees and
      ORIENT low-(deg,id) -> high-(deg,id): out-degrees become O(sqrt(m)),
      so the wedge (out-neighbor pair) volume is bounded regardless of
      skew — the published trick that keeps one hot vertex from emitting a
      quadratic shard.
    - wedges (normalized by part id) co-partition with the id-normalized
      edge set in ONE final groupby whose sorted-membership probe counts
      closed wedges; each triangle is counted exactly once, at its
      min-rank vertex.  Only per-shard scalar counter rows reach the
      driver.  All-to-alls: basket, pair, vertex, orient, closure — each
      moving edge/wedge-scale rows, never lineitem-scale.
    """
    from ._util import absorb_empty_blocks, int_segment_sum

    def _shard_of(x: "np.ndarray") -> "np.ndarray":
        return (((x * 2654435761) % (1 << 32)) % n_shards).astype(np.int32)

    # ---- stage 1: support-filtered distinct edge set (copurchase shape) --
    ds = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"), columns=["l_orderkey", "l_partkey"]
    )

    def key_rows(t: pa.Table) -> pa.Table:
        o = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        p = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(p) and (p.max() >= (1 << _PKEY_BITS) or p.min() < 0):
            raise ValueError(
                "copurchase_triangles: partkey must be in [0, 2^21) for the "
                "int64 pair pack; got max %d" % int(p.max())
            )
        if len(o) and (o.max() >= (1 << 42) or o.min() < 0):
            raise ValueError(
                "copurchase_triangles: orderkey must be in [0, 2^42) for "
                "the int64 (orderkey<<21)|partkey pack; got max %d"
                % int(o.max())
            )
        packed = np.unique((o << _PKEY_BITS) | p)
        o = packed >> _PKEY_BITS
        return pa.table(
            {
                "oshard": pa.array(_shard_of(o)),
                "packed": pa.array(packed, pa.int64()),
            }
        )

    _PAIRS = pa.schema(
        [("pshard", pa.int32()), ("pair", pa.int64()), ("n", pa.int64())]
    )

    def expand_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _PAIRS.empty_table()
        packed = np.unique(g.column("packed").to_numpy(zero_copy_only=False))
        o = packed >> _PKEY_BITS
        new = np.ones(len(o), dtype=bool)
        new[1:] = o[1:] != o[:-1]
        lens = np.diff(np.append(np.flatnonzero(new), len(o)))
        elem_keep = np.repeat(lens <= max_basket, lens)
        packed = packed[elem_keep]
        o, p = packed >> _PKEY_BITS, packed & _PKEY_MASK
        if len(o) == 0:
            return _PAIRS.empty_table()
        new = np.ones(len(o), dtype=bool)
        new[1:] = o[1:] != o[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(o))
        run_end = np.repeat(ends, np.diff(np.append(starts, len(o))))
        counts = run_end - np.arange(len(o)) - 1
        a_idx = np.repeat(np.arange(len(o)), counts)
        blk = np.cumsum(counts) - counts
        b_idx = a_idx + 1 + (np.arange(counts.sum()) - np.repeat(blk, counts))
        pair = (p[a_idx] << _PKEY_BITS) | p[b_idx]  # u < v by part id
        upair, cnt = np.unique(pair, return_counts=True)
        return pa.table(
            {
                "pshard": pa.array(_shard_of(upair)),
                "pair": pa.array(upair, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            },
            schema=_PAIRS,
        )

    _EDGE = pa.schema([("pair", pa.int64())])

    def support_filter(g: pa.Table) -> pa.Table:
        """Pairs partition by pshard so per-shard totals are global."""
        if g.num_rows == 0:
            return _EDGE.empty_table()
        pair = g.column("pair").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(pair, kind="stable")
        pair, n = pair[order], n[order]
        new = np.ones(len(pair), dtype=bool)
        new[1:] = pair[1:] != pair[:-1]
        starts = np.flatnonzero(new)
        tot = int_segment_sum(n, starts)
        keep = tot >= min_support
        return pa.table({"pair": pa.array(pair[starts][keep], pa.int64())},
                        schema=_EDGE)

    edges = (
        absorb_empty_blocks(
            absorb_empty_blocks(
                ds.map_batches(key_rows, batch_format="pyarrow"),
                batch_size=131072,
            )
            .groupby("oshard")
            .map_groups(
                lambda g: expand_pairs(_dropg(g, ["oshard"])),
                batch_format="pyarrow",
            ),
            batch_size=131072,
        )
        .groupby("pshard")
        .map_groups(
            lambda g: support_filter(_dropg(g, ["pshard"])),
            batch_format="pyarrow",
        )
        .materialize()  # bounded by the support filter; consumed twice below
    )
    n_edges = edges.count()

    # union-aligned rows for the remaining stages:
    #   side=0 endpoint half:  a=pair, b=endpoint, c=deg(endpoint)
    #   side=1 wedge sentinel: a=sum C(deg,2) for one vertex shard
    #   side=2 closure edge:   a=id-normalized pair
    #   side=3 wedge count:    a=id-normalized wedge pair, b=count
    _ROWS = pa.schema(
        [
            ("shard", pa.int32()),
            ("side", pa.int8()),
            ("a", pa.int64()),
            ("b", pa.int64()),
            ("c", pa.int64()),
        ]
    )

    def endpoint_fanout(t: pa.Table) -> pa.Table:
        pair = t.column("pair").to_numpy(zero_copy_only=False)
        u, v = pair >> _PKEY_BITS, pair & _PKEY_MASK
        x = np.concatenate([u, v])
        pp = np.concatenate([pair, pair])
        return pa.table(
            {
                "shard": pa.array(_shard_of(x)),
                "side": pa.array(np.zeros(len(x), np.int8), pa.int8()),
                "a": pa.array(pp, pa.int64()),
                "b": pa.array(x, pa.int64()),
                "c": pa.array(np.zeros(len(x), np.int64), pa.int64()),
            },
            schema=_ROWS,
        )

    def degree_stamp(g: pa.Table) -> pa.Table:
        """All edges incident to a vertex land here: deg = run length.
        Emits degree-stamped halves keyed by pair shard + ONE wedge-total
        sentinel row for this shard."""
        if g.num_rows == 0:
            return _ROWS.empty_table()
        pair = g.column("a").to_numpy(zero_copy_only=False)
        x = g.column("b").to_numpy(zero_copy_only=False)
        order = np.argsort(x, kind="stable")
        pair, x = pair[order], x[order]
        new = np.ones(len(x), dtype=bool)
        new[1:] = x[1:] != x[:-1]
        starts = np.flatnonzero(new)
        deg = int_segment_sum(np.ones(len(x), np.int64), starts)
        deg_per_row = np.repeat(deg, np.diff(np.append(starts, len(x))))
        wedges = int((deg * (deg - 1) // 2).sum())
        sent = pa.table(
            {
                "shard": pa.array([0], pa.int32()),
                "side": pa.array([1], pa.int8()),
                "a": pa.array([wedges], pa.int64()),
                "b": pa.array([0], pa.int64()),
                "c": pa.array([0], pa.int64()),
            },
            schema=_ROWS,
        )
        halves = pa.table(
            {
                "shard": pa.array(_shard_of(pair)),
                "side": pa.array(np.zeros(len(x), np.int8), pa.int8()),
                "a": pa.array(pair, pa.int64()),
                "b": pa.array(x, pa.int64()),
                "c": pa.array(deg_per_row, pa.int64()),
            },
            schema=_ROWS,
        )
        return pa.concat_tables([halves, sent])

    def orient(g: pa.Table) -> pa.Table:
        """Both halves of a pair meet here: orient low-(deg,id)->high and
        key by the SOURCE's shard for wedge generation; also emit the
        id-normalized closure-edge row keyed by the pair's wedge shard.
        Sentinels pass through."""
        if g.num_rows == 0:
            return _ROWS.empty_table()
        side = g.column("side").to_numpy(zero_copy_only=False)
        keep = g.filter(pa.array(side != 0))  # sentinels ride along
        h = g.filter(pa.array(side == 0))
        if h.num_rows == 0:
            return keep
        pair = h.column("a").to_numpy(zero_copy_only=False)
        x = h.column("b").to_numpy(zero_copy_only=False)
        deg = h.column("c").to_numpy(zero_copy_only=False)
        order = np.argsort(pair, kind="stable")
        pair, x, deg = pair[order], x[order], deg[order]
        # two rows per pair: (u, deg_u) then (v, deg_v) — u < v by id and
        # the stable sort keeps... id order within a pair is NOT guaranteed
        # by the sort (same key), so split by comparing x to the unpack.
        u_id = pair >> _PKEY_BITS
        is_u = x == u_id
        pu, du = pair[is_u], deg[is_u]
        pv, dv = pair[~is_u], deg[~is_u]
        ou = np.argsort(pu, kind="stable")
        ov = np.argsort(pv, kind="stable")
        pu, du = pu[ou], du[ou]
        dv = dv[ov]
        # pu is the sorted distinct pair list; du/dv aligned to it
        u, v = pu >> _PKEY_BITS, pu & _PKEY_MASK
        rank_u = (du << _PKEY_BITS) | u
        rank_v = (dv << _PKEY_BITS) | v
        src = np.where(rank_u < rank_v, u, v)
        dst = np.where(rank_u < rank_v, v, u)
        oriented = pa.table(
            {
                "shard": pa.array(_shard_of(src)),
                "side": pa.array(np.zeros(len(src), np.int8), pa.int8()),
                "a": pa.array(src, pa.int64()),
                "b": pa.array(dst, pa.int64()),
                "c": pa.array(np.zeros(len(src), np.int64), pa.int64()),
            },
            schema=_ROWS,
        )
        closure = pa.table(
            {
                "shard": pa.array(_shard_of(pu)),
                "side": pa.array(np.full(len(pu), 2, np.int8), pa.int8()),
                "a": pa.array(pu, pa.int64()),
                "b": pa.array(np.zeros(len(pu), np.int64), pa.int64()),
                "c": pa.array(np.zeros(len(pu), np.int64), pa.int64()),
            },
            schema=_ROWS,
        )
        return pa.concat_tables([oriented, closure, keep])

    def wedges_of(g: pa.Table) -> pa.Table:
        """All out-edges of a source vertex land here: triangular pair
        expansion over its out-neighbors (sorted by id, so wedge pairs are
        id-normalized for the closure probe).  Closure edges and sentinels
        pass through keyed by their own shard."""
        if g.num_rows == 0:
            return _ROWS.empty_table()
        side = g.column("side").to_numpy(zero_copy_only=False)
        keep = g.filter(pa.array(side != 0))
        h = g.filter(pa.array(side == 0))
        if h.num_rows == 0:
            return keep
        src = h.column("a").to_numpy(zero_copy_only=False)
        dst = h.column("b").to_numpy(zero_copy_only=False)
        packed = np.unique((src << _PKEY_BITS) | dst)  # sort by (src, dst id)
        s, d = packed >> _PKEY_BITS, packed & _PKEY_MASK
        new = np.ones(len(s), dtype=bool)
        new[1:] = s[1:] != s[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(s))
        run_end = np.repeat(ends, np.diff(np.append(starts, len(s))))
        counts = run_end - np.arange(len(s)) - 1
        if counts.sum() == 0:
            return keep
        a_idx = np.repeat(np.arange(len(s)), counts)
        blk = np.cumsum(counts) - counts
        b_idx = a_idx + 1 + (np.arange(counts.sum()) - np.repeat(blk, counts))
        wpair = (d[a_idx] << _PKEY_BITS) | d[b_idx]  # id-normalized (asc)
        upair, cnt = np.unique(wpair, return_counts=True)
        wrows = pa.table(
            {
                "shard": pa.array(_shard_of(upair)),
                "side": pa.array(np.full(len(upair), 3, np.int8), pa.int8()),
                "a": pa.array(upair, pa.int64()),
                "b": pa.array(cnt.astype(np.int64), pa.int64()),
                "c": pa.array(np.zeros(len(upair), np.int64), pa.int64()),
            },
            schema=_ROWS,
        )
        return pa.concat_tables([wrows, keep])

    _CNT = pa.schema([("n_tri", pa.int64()), ("n_wedges", pa.int64())])

    def close_wedges(g: pa.Table) -> pa.Table:
        """Wedge counts meet the id-normalized edge set: sorted-membership
        probe counts closed wedges (= triangles, once each)."""
        if g.num_rows == 0:
            return _CNT.empty_table()
        side = g.column("side").to_numpy(zero_copy_only=False)
        a = g.column("a").to_numpy(zero_copy_only=False)
        b = g.column("b").to_numpy(zero_copy_only=False)
        n_wedges = int(a[side == 1].sum())
        epair = np.sort(a[side == 2])
        wpair, wn = a[side == 3], b[side == 3]
        n_tri = 0
        if len(epair) and len(wpair):
            pos = np.searchsorted(epair, wpair)
            hit = (pos < len(epair)) & (epair[np.minimum(pos, len(epair) - 1)] == wpair)
            n_tri = int(wn[hit].sum())
        return pa.table(
            {
                "n_tri": pa.array([n_tri], pa.int64()),
                "n_wedges": pa.array([n_wedges], pa.int64()),
            },
            schema=_CNT,
        )

    counters = (
        absorb_empty_blocks(
            absorb_empty_blocks(
                absorb_empty_blocks(
                    edges.map_batches(endpoint_fanout, batch_format="pyarrow"),
                    batch_size=131072,
                )
                .groupby("shard")
                .map_groups(
                    lambda g: degree_stamp(_dropg(g, ["shard"])),
                    batch_format="pyarrow",
                ),
                batch_size=131072,
            )
            .groupby("shard")
            .map_groups(orient, batch_format="pyarrow"),
            batch_size=131072,
        )
        .groupby("shard")
        .map_groups(wedges_of, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(close_wedges, batch_format="pyarrow")
        .take_all()
    )  # <= n_shards counter rows
    n_tri = sum(r["n_tri"] for r in counters)
    n_wedges = sum(r["n_wedges"] for r in counters)
    clustering_e6 = (3 * n_tri * 10**6) // n_wedges if n_wedges else 0
    return pa.table(
        {
            "n_edges": pa.array([n_edges], pa.int64()),
            "n_wedges": pa.array([n_wedges], pa.int64()),
            "n_triangles": pa.array([n_tri], pa.int64()),
            "clustering_e6": pa.array([clustering_e6], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# breadth-first traversal (min-hop distances) — the WITH RECURSIVE shape:
# level-synchronous BFS over the same bipartite part<->supplier graph,
# using pagerank's pinned per-shard edge tables; per round only NEWLY
# discovered frontier vertex ids travel (shrinking wire, unlike pagerank's
# constant message volume).  Reference validators.py walks master-data
# reference chains the same way (field -> code -> range group).
# ---------------------------------------------------------------------------


def bfs_hops(
    sf_dir: str,
    source_part: int | None = None,
    max_hops: int | None = None,
    n_shards: int = 8,
) -> ray.data.Dataset:
    """Minimum hop count from part ``source_part`` to every vertex reachable
    within ``max_hops`` over the bipartite part<->supplier graph (vertex ids
    2p / 2s+1, one edge per distinct lineitem (part, supplier) pair, both
    directions).  The seed row (hops 0) is always emitted, matching the
    recursive-CTE oracle.

    Scale shape: stage 1 is pagerank's ONE all-to-all (distinct edges land
    in their source vertex's shard); per-shard edge tables are then pinned
    in the object store and each round is ONE fused receive-expand task per
    shard — fold incoming candidate ids against the shard's visited table
    (vertex ownership is hash(v) % n_shards on both sides), stamp hop h on
    the survivors, expand their out-neighbors via two searchsorteds over
    the src-sorted edges, and ship np.unique'd candidates to their owner
    shards.  Visited state lives in shard tasks' outputs, never on the
    driver; the wire carries only newly-discovered vertex ids, so rounds
    get CHEAPER as the frontier saturates (level-synchronous BFS's
    signature).  Rounds are latency-bound: max_hops is a small constant."""
    from ..config import BFS_MAX_HOPS, BFS_SOURCE_PART
    from ._util import absorb_empty_blocks

    if source_part is None:
        source_part = BFS_SOURCE_PART
    if max_hops is None:
        max_hops = BFS_MAX_HOPS
    seed = 2 * int(source_part)

    def _shard_of(v: "np.ndarray") -> "np.ndarray":
        return (((v * 2654435761) % (1 << 32)) % n_shards).astype(np.int32)

    _EROWS = pa.schema(
        [("shard", pa.int32()), ("src", pa.int64()), ("dst", pa.int64())]
    )

    def pair_rows(t: pa.Table) -> pa.Table:
        p = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        s = t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(p) == 0:
            return _EROWS.empty_table()
        if p.max() >= (1 << 20) or s.max() >= (1 << 20) or p.min() < 0 or s.min() < 0:
            raise ValueError(
                "bfs_hops: part/supp keys must be in [0, 2^20) for the "
                "int64 edge pack; got partkey max %d, suppkey max %d"
                % (int(p.max()), int(s.max()))
            )
        packed = np.unique((p << 20) | s)
        p, s = packed >> 20, packed & ((1 << 20) - 1)
        src = np.concatenate([p * 2, s * 2 + 1])
        dst = np.concatenate([s * 2 + 1, p * 2])
        return pa.table(
            {
                "shard": pa.array(_shard_of(src)),
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            },
            schema=_EROWS,
        )

    _EDGES = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    _STATE = pa.schema([("v", pa.int64()), ("h", pa.int64())])
    _MSG = pa.schema([("v", pa.int64())])
    _OUT = pa.schema(
        [("kind", pa.string()), ("key", pa.int64()), ("hops", pa.int64())]
    )

    def _split_block(tbl: pa.Table):
        if tbl.num_rows == 0 or "shard" not in tbl.column_names:
            return (tbl,) * n_shards
        sh = tbl.column("shard").to_numpy(zero_copy_only=False)
        return tuple(tbl.filter(pa.array(sh == s)) for s in range(n_shards))

    def _assemble(own_seed: bool, *parts: pa.Table):
        """This shard's edge rows -> (src-sorted dedup'd edges, seed state).
        The seed is stamped even when it has no edges (oracle emits it)."""
        parts = [p for p in parts if p.num_rows]
        state = (
            pa.table(
                {"v": pa.array([seed], pa.int64()), "h": pa.array([0], pa.int64())},
                schema=_STATE,
            )
            if own_seed
            else _STATE.empty_table()
        )
        if not parts:
            return _EDGES.empty_table(), state
        t = pa.concat_tables(parts)
        src = t.column("src").to_numpy(zero_copy_only=False)
        dst = t.column("dst").to_numpy(zero_copy_only=False)
        pair = np.unique((src << 21) | dst)  # vertex ids < 2^21 by the guard
        src, dst = pair >> 21, pair & ((1 << 21) - 1)
        edges = pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())},
            schema=_EDGES,
        )
        return edges, state

    def _expand(edges: pa.Table, frontier: "np.ndarray"):
        """Out-neighbors of the (sorted) frontier via two searchsorteds over
        src-sorted edges — vectorized across the whole frontier."""
        if edges.num_rows == 0 or len(frontier) == 0:
            return np.empty(0, dtype=np.int64)
        src = edges.column("src").to_numpy(zero_copy_only=False)
        dst = edges.column("dst").to_numpy(zero_copy_only=False)
        lo = np.searchsorted(src, frontier, side="left")
        hi = np.searchsorted(src, frontier, side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            return np.empty(0, dtype=np.int64)
        out_starts = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        idx = (
            np.arange(total, dtype=np.int64)
            - np.repeat(out_starts, cnt)
            + np.repeat(lo, cnt)
        )
        return np.unique(dst[idx])

    def _step(edges: pa.Table, state: pa.Table, h: int, *msgs: pa.Table):
        """ONE task per shard per round: fold candidate ids into the visited
        table (drop already-seen), stamp hop h, expand the NEW frontier's
        neighbors, ship per-owner-shard candidate ids.  Returns the updated
        state followed by n_shards message tables."""
        if h == 0:
            frontier = state.column("v").to_numpy(zero_copy_only=False)
        else:
            cands = [m.column("v").to_numpy(zero_copy_only=False) for m in msgs
                     if m.num_rows]
            cand = (
                np.unique(np.concatenate(cands))
                if cands
                else np.empty(0, dtype=np.int64)
            )
            seen = state.column("v").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(seen, cand)
            new_mask = (
                (pos >= len(seen)) | (seen[np.minimum(pos, max(len(seen) - 1, 0))]
                                      != cand)
                if len(seen)
                else np.ones(len(cand), dtype=bool)
            )
            frontier = cand[new_mask]
            if len(frontier):
                add = pa.table(
                    {
                        "v": pa.array(frontier, pa.int64()),
                        "h": pa.array(np.full(len(frontier), h, np.int64)),
                    },
                    schema=_STATE,
                )
                state = (
                    pa.concat_tables([state, add]).sort_by("v")
                    if state.num_rows
                    else add
                )
        nbrs = _expand(edges, np.sort(frontier)) if len(frontier) else np.empty(
            0, dtype=np.int64
        )
        nsh = _shard_of(nbrs)
        return tuple(
            [state]
            + [
                pa.table({"v": pa.array(nbrs[nsh == s], pa.int64())}, schema=_MSG)
                for s in range(n_shards)
            ]
        )

    def _finalize(state: pa.Table) -> pa.Table:
        v = state.column("v").to_numpy(zero_copy_only=False)
        h = state.column("h").to_numpy(zero_copy_only=False)
        kind = np.where(v % 2 == 0, "part", "supplier")
        return pa.table(
            {
                "kind": pa.array(kind, pa.string()),
                "key": pa.array(v >> 1, pa.int64()),
                "hops": pa.array(h, pa.int64()),
            },
            schema=_OUT,
        )

    rows = absorb_empty_blocks(
        ray.data.read_parquet(
            _pq(sf_dir, "lineitem"), columns=["l_partkey", "l_suppkey"]
        ).map_batches(pair_rows, batch_format="pyarrow"),
        batch_size=131072,
    ).materialize()

    split_t = ray.remote(num_returns=n_shards)(_split_block)
    assemble_t = ray.remote(num_returns=2)(_assemble)
    step_t = ray.remote(num_returns=n_shards + 1)(_step)
    final_t = ray.remote(_finalize)

    blocks = rows.to_arrow_refs()
    seed_shard = int((((seed * 2654435761) % (1 << 32))) % n_shards)
    if blocks:
        parts = [split_t.remote(b) for b in blocks]
        shard_state = [
            assemble_t.remote(s == seed_shard, *[parts[b][s] for b in range(len(parts))])
            for s in range(n_shards)
        ]
        edges_ref = [st[0] for st in shard_state]
        state_ref = [st[1] for st in shard_state]
    else:  # empty graph: the seed row alone still comes back
        edges_ref = [ray.put(_EDGES.empty_table()) for _ in range(n_shards)]
        state_ref = [
            ray.put(
                pa.table(
                    {"v": pa.array([seed], pa.int64()),
                     "h": pa.array([0], pa.int64())},
                    schema=_STATE,
                )
                if s == seed_shard
                else _STATE.empty_table()
            )
            for s in range(n_shards)
        ]
    grid = [
        step_t.remote(edges_ref[s], state_ref[s], 0) for s in range(n_shards)
    ]
    for h in range(1, max_hops + 1):
        grid = [
            step_t.remote(
                edges_ref[s],
                grid[s][0],
                h,
                *[grid[sp][s + 1] for sp in range(n_shards)],
            )
            for s in range(n_shards)
        ]
    return ray.data.from_arrow_refs(
        [final_t.remote(grid[s][0]) for s in range(n_shards)]
    ).sort(["kind", "key"])


def copurchase_components(
    sf_dir: str,
    min_support: int = 2,
    n_shards: int = 64,
    max_basket: int = 64,
    max_iters: int = 50,
) -> ray.data.Dataset:
    """CONNECTED COMPONENTS of the support-filtered co-purchase graph —
    the graph-family fourth member (pagerank = centrality, bfs_hops =
    traversal, copurchase_triangles = local clustering, components =
    global partitioning): every part that co-occurs with another in at
    least ``min_support`` orders is labeled with the MIN part id of its
    component.  The market-basket analogue of dedup's cluster step
    (ops/dedup.py::neardup_clusters — same join-free min-label
    propagation, different pair generator).

    Scale shape: pair counts ride the capped-basket expansion of
    ``copurchase_pairs`` (order-shard triangular expansion, pair-shard
    exact totals, support filter BEFORE any edge materializes); the
    iteration unions edge rows with label rows, delivers labels with one
    run-detected gather per shard per round, and converges on the
    monotone label sum.  Per-round state is O(|edges|), never
    corpus-sized; rounds = component diameter."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    from ._util import absorb_empty_blocks
    from .relational import _pq as _rpq

    ds = ray.data.read_parquet(
        _rpq(sf_dir, "lineitem"), columns=["l_orderkey", "l_partkey"]
    )

    def key_rows(t: pa.Table) -> pa.Table:
        o = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        p = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(p) and (p.max() >= (1 << 21) or p.min() < 0):
            raise ValueError(
                "copurchase_components: partkey must be in [0, 2^21) for the "
                "int64 (orderkey<<21)|partkey pack; got max %d" % int(p.max())
            )
        if len(o) and (o.max() >= (1 << 42) or o.min() < 0):
            raise ValueError(
                "copurchase_components: orderkey must be in [0, 2^42) for "
                "the int64 (orderkey<<21)|partkey pack; got max %d" % int(o.max())
            )
        packed = np.unique((o << 21) | p)
        oo = packed >> 21
        return pa.table(
            {
                "oshard": pa.array(
                    (((oo * 2654435761) % (1 << 32)) % n_shards).astype(np.int32)
                ),
                "packed": pa.array(packed, pa.int64()),
            }
        )

    _PAIRS = pa.schema([("pshard", pa.int32()), ("pair", pa.int64()), ("n", pa.int64())])

    def expand_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _PAIRS.empty_table()
        packed = np.unique(g.column("packed").to_numpy(zero_copy_only=False))
        o = packed >> 21
        new = np.ones(len(o), dtype=bool)
        new[1:] = o[1:] != o[:-1]
        lens = np.diff(np.append(np.flatnonzero(new), len(o)))
        elem_keep = np.repeat(lens <= max_basket, lens)
        packed = packed[elem_keep]
        if len(packed) == 0:
            return _PAIRS.empty_table()
        o, p = packed >> 21, packed & ((1 << 21) - 1)
        new = np.ones(len(o), dtype=bool)
        new[1:] = o[1:] != o[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(o))
        run_end = np.repeat(ends, np.diff(np.append(starts, len(o))))
        counts = run_end - np.arange(len(o)) - 1
        a_idx = np.repeat(np.arange(len(o)), counts)
        blk = np.cumsum(counts) - counts
        b_idx = a_idx + 1 + (np.arange(counts.sum()) - np.repeat(blk, counts))
        pair = (p[a_idx] << 21) | p[b_idx]
        upair, cnt = np.unique(pair, return_counts=True)
        return pa.table(
            {
                "pshard": pa.array(
                    (((upair * 2654435761) % (1 << 32)) % n_shards).astype(np.int32)
                ),
                "pair": pa.array(upair, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            },
            schema=_PAIRS,
        )

    _EDGE = pa.schema([("a_id", pa.int64()), ("b_id", pa.int64())])

    def support_filter(g: pa.Table) -> pa.Table:
        """Pairs co-locate by pshard, so per-shard totals are global and
        the support filter is exact."""
        if g.num_rows == 0:
            return _EDGE.empty_table()
        from ._util import combine_by_key

        pair = g.column("pair").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        upair, tot = combine_by_key(pair, n)
        keep = tot >= min_support
        upair = upair[keep]
        return pa.table(
            {
                "a_id": pa.array(upair >> 21, pa.int64()),
                "b_id": pa.array(upair & ((1 << 21) - 1), pa.int64()),
            },
            schema=_EDGE,
        )

    pairs = (
        absorb_empty_blocks(
            absorb_empty_blocks(
                ds.map_batches(key_rows, batch_format="pyarrow"), batch_size=131072
            )
            .groupby("oshard")
            .map_groups(
                lambda g: expand_pairs(_dropg(g, ["oshard"])), batch_format="pyarrow"
            ),
            batch_size=131072,
        )
        .groupby("pshard")
        .map_groups(
            lambda g: support_filter(_dropg(g, ["pshard"])), batch_format="pyarrow"
        )
        .materialize()  # support-bounded edge set; reused every round
    )

    _OUTCC = pa.schema([("part_id", pa.int64()), ("component_id", pa.int64())])

    # --- min-label propagation over PINNED per-shard edge tables ---------
    # bfs_hops' raw-task escape hatch, adapted to labels: the support-
    # bounded edge set splits ONCE into its src-owner shards (both
    # directions) and pins in the object store; each round is one fused
    # fold-expand task per shard and the wire carries only (node, label)
    # messages for nodes whose label DECREASED — volume shrinks every
    # round, edges never ride a shuffle again, and no per-round Dataset
    # op graph (the old union+Aggregate(Min) path cost ~0.5 s/round in
    # operator dispatch alone).  Convergence: stop when no shard changed
    # a label (per-shard scalar counts, driver-fetched per round).

    _EDGES2 = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    _STATE2 = pa.schema([("v", pa.int64()), ("lbl", pa.int64())])
    _MSG2 = pa.schema([("v", pa.int64()), ("lbl", pa.int64())])
    _LMASK = (1 << 21) - 1

    def _vshard(v: "np.ndarray") -> "np.ndarray":
        return (((v * 2654435761) % (1 << 32)) % n_shards).astype(np.int32)

    def _split_block(tbl: pa.Table):
        if tbl.num_rows == 0:
            return tuple(_EDGES2.empty_table() for _ in range(n_shards))
        a = tbl.column("a_id").to_numpy(zero_copy_only=False)
        b = tbl.column("b_id").to_numpy(zero_copy_only=False)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        sh = _vshard(src)
        return tuple(
            pa.table(
                {
                    "src": pa.array(src[sh == s], pa.int64()),
                    "dst": pa.array(dst[sh == s], pa.int64()),
                },
                schema=_EDGES2,
            )
            for s in range(n_shards)
        )

    def _assemble(*parts: pa.Table):
        """This shard's edge rows -> (src-sorted dedup'd edges, initial
        state).  label_0(v) = min(v, min out-neighbor) — one propagation
        step folded into assembly."""
        parts = [p for p in parts if p.num_rows]
        if not parts:
            return _EDGES2.empty_table(), _STATE2.empty_table()
        t = pa.concat_tables(parts)
        src = t.column("src").to_numpy(zero_copy_only=False)
        dst = t.column("dst").to_numpy(zero_copy_only=False)
        pair = np.unique((src << 21) | dst)  # part ids < 2^21 by the guard
        src, dst = pair >> 21, pair & _LMASK
        new = np.ones(len(src), dtype=bool)
        new[1:] = src[1:] != src[:-1]
        starts = np.flatnonzero(new)
        v = src[starts]
        lbl = np.minimum(v, np.minimum.reduceat(dst, starts))
        return (
            pa.table(
                {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())},
                schema=_EDGES2,
            ),
            pa.table(
                {"v": pa.array(v, pa.int64()), "lbl": pa.array(lbl, pa.int64())},
                schema=_STATE2,
            ),
        )

    def _minimize(vv: "np.ndarray", ll: "np.ndarray"):
        """Min label per node via one packed unique (first of each run)."""
        packed = np.unique((vv << 21) | ll)
        pv = packed >> 21
        first = np.ones(len(pv), dtype=bool)
        first[1:] = pv[1:] != pv[:-1]
        return pv[first], (packed & _LMASK)[first]

    def _step(edges: pa.Table, state: pa.Table, first: bool, *msgs: pa.Table):
        """ONE task per shard per round: fold incoming candidate labels
        into the state (keep decreases), expand the CHANGED nodes'
        neighbors with the new labels (pre-minimized per destination),
        ship per-owner-shard messages.  Returns (state, n_changed,
        msg_0..msg_{n_shards-1})."""
        empty = tuple(_MSG2.empty_table() for _ in range(n_shards))
        v = state.column("v").to_numpy(zero_copy_only=False)
        lbl = state.column("lbl").to_numpy(zero_copy_only=False)
        if first:
            ch_v, ch_l = v, lbl
            n_changed = len(v)
        else:
            mv = [m.column("v").to_numpy(zero_copy_only=False) for m in msgs if m.num_rows]
            if not mv:
                return (state, 0) + empty
            cv = np.concatenate(mv)
            cl = np.concatenate(
                [m.column("lbl").to_numpy(zero_copy_only=False) for m in msgs if m.num_rows]
            )
            pv, pl = _minimize(cv, cl)
            # every message dst owns its reverse edge here, so pv is a
            # subset of v and the searchsorted positions are exact
            pos = np.searchsorted(v, pv)
            better = pl < lbl[pos]
            if not better.any():
                return (state, 0) + empty
            lbl = lbl.copy()
            lbl[pos[better]] = pl[better]
            ch_v, ch_l = pv[better], pl[better]
            n_changed = int(better.sum())
            state = pa.table(
                {"v": pa.array(v, pa.int64()), "lbl": pa.array(lbl, pa.int64())},
                schema=_STATE2,
            )
        if edges.num_rows == 0 or len(ch_v) == 0:
            return (state, n_changed) + empty
        src = edges.column("src").to_numpy(zero_copy_only=False)
        dst = edges.column("dst").to_numpy(zero_copy_only=False)
        lo = np.searchsorted(src, ch_v, side="left")
        hi = np.searchsorted(src, ch_v, side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            return (state, n_changed) + empty
        out_starts = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        idx = (
            np.arange(total, dtype=np.int64)
            - np.repeat(out_starts, cnt)
            + np.repeat(lo, cnt)
        )
        d, l = _minimize(dst[idx], np.repeat(ch_l, cnt))
        dsh = _vshard(d)
        return (state, n_changed) + tuple(
            pa.table(
                {
                    "v": pa.array(d[dsh == s], pa.int64()),
                    "lbl": pa.array(l[dsh == s], pa.int64()),
                },
                schema=_MSG2,
            )
            for s in range(n_shards)
        )

    def _project(state: pa.Table) -> pa.Table:
        return pa.table(
            {
                "part_id": state.column("v").cast(pa.int64()),
                "component_id": state.column("lbl").cast(pa.int64()),
            },
            schema=_OUTCC,
        )

    split_t = ray.remote(num_returns=n_shards)(_split_block)
    assemble_t = ray.remote(num_returns=2)(_assemble)
    step_t = ray.remote(num_returns=n_shards + 2)(_step)
    project_t = ray.remote(_project)

    blocks = pairs.to_arrow_refs()
    if not blocks:
        return ray.data.from_arrow(_OUTCC.empty_table())
    parts = [split_t.remote(b) for b in blocks]
    shard_state = [
        assemble_t.remote(*[parts[b][s] for b in range(len(parts))])
        for s in range(n_shards)
    ]
    edges_ref = [st[0] for st in shard_state]
    grid = [
        step_t.remote(edges_ref[s], shard_state[s][1], True)
        for s in range(n_shards)
    ]
    for _ in range(max_iters):
        grid = [
            step_t.remote(
                edges_ref[s],
                grid[s][0],
                False,
                *[grid[sp][s + 2] for sp in range(n_shards)],
            )
            for s in range(n_shards)
        ]
        if sum(ray.get([grid[s][1] for s in range(n_shards)])) == 0:
            break
    return ray.data.from_arrow_refs(
        [project_t.remote(grid[s][0]) for s in range(n_shards)]
    )
