"""Extreme-skew stress: a conversation holding HALF the corpus through the
salted groupby seal, and a giant (whole-corpus) near-dup component through
the min-label cluster propagation — the two skew shapes a web corpus throws
at the wide stages (VERDICT r3 item 6)."""

import zlib

import pyarrow as pa

from invoice_extraction_ray import fixtures as F
from invoice_extraction_ray.pipelines.extract import build_pipeline, to_dataset
from invoice_extraction_ray.stages.seal import SEAL_SHARDS, compute_hot_convs

from .conftest import assert_tables_equal, dataset_to_sorted_table

GIANT = "conv-zz-giant"


def _skewed_corpus(n_base: int = 80, seed: int = 7) -> pa.Table:
    """Base corpus plus ONE conversation holding as many turns as the whole
    rest: gen_conversation output rewritten onto a single conv_id with a
    fresh contiguous turn_idx (text/roles stay realistic)."""
    rows = []
    for i in range(n_base):
        rows.extend(F.gen_conversation(seed, i))
    n_target = len(rows)
    giant, idx, ci = [], 0, 10_000
    while idx < n_target:
        for r in F.gen_conversation(seed, ci):
            if idx >= n_target:
                break
            r = dict(r)
            r["conv_id"] = GIANT
            r["turn_idx"] = idx
            idx += 1
            giant.append(r)
        ci += 1
    rows.extend(giant)
    import numpy as np

    order = np.random.default_rng(seed).permutation(len(rows))
    return F.rows_to_table([rows[i] for i in order])


def test_seal_groupby_with_half_corpus_conversation():
    corpus = _skewed_corpus()
    n_total = corpus.num_rows
    n_giant = corpus.filter(
        pa.compute.equal(corpus.column("conv_id"), GIANT)
    ).num_rows
    assert n_giant * 2 >= n_total  # the skew premise: one conv >= 50%

    salt_block = 64
    by_sort = dataset_to_sorted_table(build_pipeline(corpus, seal_strategy="sort"))
    by_groupby = dataset_to_sorted_table(
        build_pipeline(
            corpus, seal_strategy="groupby", hot_threshold=200, salt_block=salt_block
        )
    )
    assert_tables_equal(by_sort, by_groupby)

    # bounded per-task state: recompute the seal keys by the documented
    # salting contract (conv#(turn_idx//salt_block) for hot convs, shard =
    # crc32(key) & (SEAL_SHARDS-1)) and assert no shard group — the unit a
    # single map_groups task sorts in memory — holds more than a small
    # multiple of salt_block, instead of the unsalted 50% of the corpus
    hot = compute_hot_convs(to_dataset(corpus), 200)
    assert GIANT in hot
    shard_rows: dict[int, int] = {}
    convs = corpus.column("conv_id").to_pylist()
    turns = corpus.column("turn_idx").to_pylist()
    for c, t in zip(convs, turns):
        key = f"{c}#{t // salt_block}" if c in hot else c
        s = zlib.crc32(key.encode()) & (SEAL_SHARDS - 1)
        shard_rows[s] = shard_rows.get(s, 0) + 1
    worst = max(shard_rows.values())
    assert worst <= 4 * salt_block, (
        f"seal shard holds {worst} rows (> {4 * salt_block}) — salting failed"
    )
    assert worst < 0.1 * n_total  # vs 0.5 * n_total without salting


def test_neardup_clusters_giant_component():
    """One component covering the ENTIRE corpus (every doc shares a long
    common template): pair state stays O(pairs), propagation converges to
    min-doc_id labels for all members in O(diameter)=O(1) rounds."""
    from invoice_extraction_ray.ops.dedup import neardup_clusters, ngram_jaccard_neardup

    n = 150
    common = " ".join(f"w{j}" for j in range(30))
    docs = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": [f"{common} unique{i}" for i in range(n)],
        }
    )
    # clique premise: adjacent trigram sets differ by ~2 grams of ~30
    pairs = ngram_jaccard_neardup(docs, threshold=0.5).take_all()
    assert len(pairs) == n * (n - 1) // 2

    got = {r["doc_id"]: r["cluster_id"] for r in neardup_clusters(docs, 0.5).take_all()}
    assert len(got) == n
    assert all(lbl == 0 for lbl in got.values()), "giant component must fold to min id"


def test_r5_window_ops_under_hot_key_skew(tmp_path):
    """One user holds half the events and one day holds most of them:
    the user-shard (trend, ntile) and day-shard (ohlc) ops stay exact
    when a single group dominates its shard."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from invoice_extraction_ray.config import NTILE_N
    from invoice_extraction_ray.ops.window import (
        daily_ohlc,
        user_value_ntile,
        user_value_trend,
    )

    rng = np.random.RandomState(11)
    n = 20_000
    day = 86_400_000_000
    user = np.where(rng.rand(n) < 0.5, 7, rng.randint(0, 200, n)).astype(np.int64)
    days = np.where(rng.rand(n) < 0.8, 3, rng.randint(0, 10, n)).astype(np.int64)
    ts = days * day + rng.randint(0, day, n)
    value = np.round(rng.uniform(0, 500, n), 2)
    t = pa.table(
        {
            "event_id": pa.array(rng.permutation(n).astype(np.int64)),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "user_id": pa.array(user),
            "event_type": pa.array(["x"] * n),
            "value": pa.array(value, pa.float64()),
            "props": pa.array([""] * n),
        }
    )
    d = tmp_path / "skew"
    d.mkdir()
    pq.write_table(t, d / "events.parquet", row_group_size=701)

    cents = np.floor(value * 100.0 + 0.5).astype(np.int64)

    # trend: recompute per user with python ints
    per: dict = {}
    for u, dd, c in zip(user.tolist(), days.tolist(), cents.tolist()):
        per.setdefault(u, []).append((dd, c))
    for u, pts in per.items():
        d0 = min(x for x, _ in pts)
        xs = [x - d0 for x, _ in pts]
        ys = [y for _, y in pts]
        m = len(pts)
        sx, sy = sum(xs), sum(ys)
        den = m * sum(x * x for x in xs) - sx * sx
        num = m * sum(x * y for x, y in zip(xs, ys)) - sx * sy
        per[u] = (m, None if den == 0 else (1_000_000 * num) // den)
    got_t = {
        r["user_id"]: (r["n"], r["slope_e6"])
        for r in user_value_trend(str(d)).take_all()
    }
    assert got_t == per

    # ohlc: recompute via sorted sweep (reuses the test_ops helper shape)
    eid = t.column("event_id").to_pylist()
    rows = sorted(zip(ts.tolist(), eid, cents.tolist()))
    want_o: dict = {}
    for tts, _, c in rows:
        dd = tts // day
        a = want_o.setdefault(dd, [c, c, c, c, 0])
        a[1] = max(a[1], c)
        a[2] = min(a[2], c)
        a[3] = c
        a[4] += 1
    got_o = {
        r["day_i"]: (r["open_c"], r["high_c"], r["low_c"], r["close_c"], r["n"])
        for r in daily_ohlc(str(d)).take_all()
    }
    assert got_o == {k: tuple(v) for k, v in want_o.items()}

    # ntile: hot user's huge total must rank first; full order matches
    totals: dict = {}
    for u, c in zip(user.tolist(), cents.tolist()):
        totals[u] = totals.get(u, 0) + c
    ordered = sorted(totals.items(), key=lambda kv: (-kv[1], kv[0]))
    got_n = {
        r["user_id"]: (r["total_c"], r["rnk"])
        for r in user_value_ntile(str(d)).take_all()
    }
    assert got_n == {u: (c, i + 1) for i, (u, c) in enumerate(ordered)}
    assert got_n[7][1] == 1  # the hot user dominates lifetime value
    assert len({r for _, r in got_n.values()}) == len(totals)
    assert NTILE_N >= 1


def test_user_gap_fill_under_hot_key_skew(tmp_path):
    """One user = half the events, one day = most of them: the gap-fill
    expansion stays exact (grid cells, ffill values, observed flags) when
    a single user dominates its shard."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from invoice_extraction_ray.ops.window import user_gap_fill

    rng = np.random.RandomState(23)
    n = 10_000
    day = 86_400_000_000
    user = np.where(rng.rand(n) < 0.5, 7, rng.randint(0, 100, n)).astype(np.int64)
    days = np.where(rng.rand(n) < 0.7, 4, rng.randint(0, 30, n)).astype(np.int64)
    ts = days * day + rng.randint(0, day, n)
    value = np.round(rng.uniform(0, 500, n), 2)
    t = pa.table(
        {
            "user_id": pa.array(user),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(value, pa.float64()),
        }
    )
    d = tmp_path / "skewg"
    d.mkdir()
    pq.write_table(t, d / "events.parquet", row_group_size=397)

    cents = np.floor(value * 100.0 + 0.5).astype(np.int64)
    daily: dict = {}
    for u, dd, c in zip(user.tolist(), days.tolist(), cents.tolist()):
        daily[(u, dd)] = daily.get((u, dd), 0) + c
    span: dict = {}
    for u, dd in daily:
        lo_hi = span.setdefault(u, [dd, dd])
        lo_hi[0] = min(lo_hi[0], dd)
        lo_hi[1] = max(lo_hi[1], dd)
    want = {}
    for u, (lo, hi) in span.items():
        last = None
        for dd in range(lo, hi + 1):
            if (u, dd) in daily:
                last = daily[(u, dd)]
                want[(u, dd)] = (last, 1)
            else:
                want[(u, dd)] = (last, 0)
    got = {
        (r["user_id"], r["day_i"]): (r["value_c"], r["observed"])
        for r in user_gap_fill(str(d)).take_all()
    }
    assert got == want


def test_r5_tpch_ops_under_hot_key_skew(tmp_path):
    """One ORDER holds half of all lineitems and one PART holds most of
    them: the orderkey-shard (late_shipment, tax_band) and partkey-shard
    (nation_profit, dominance) kernels stay exact when a single key's
    partials arrive split across many blocks of one shard."""
    import datetime as dt

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from invoice_extraction_ray.config import (
        Q4_LATE_DAYS,
        Q4_ORDER_HI,
        Q4_ORDER_LO,
        Q9_PART_TOKEN,
        Q12_HIGH_PRIORITIES,
        Q20_PART_TOKEN,
        Q20_SHARE_PCT,
    )
    from invoice_extraction_ray.ops.relational import (
        dominant_part_suppliers,
        late_shipment_orders,
        nation_profit,
        tax_band_priority,
    )

    rng = np.random.RandomState(13)
    n = 20_000
    n_ord, n_part, n_supp = 600, 60, 30
    day_us = 86_400_000_000
    us_1997 = int(dt.datetime(1997, 1, 1).timestamp()) * 10**6

    okey = np.where(
        rng.rand(n) < 0.5, 99, rng.randint(0, n_ord, n)
    ).astype(np.int64)
    pkey = np.where(
        rng.rand(n) < 0.6, 5, rng.randint(0, n_part, n)
    ).astype(np.int64)
    skey = rng.randint(0, n_supp, n).astype(np.int64)
    qty = rng.randint(1, 51, n).astype(np.float64)
    ep = np.round(rng.uniform(1, 9999, n), 2)
    disc = np.round(rng.uniform(0, 0.1, n), 2)
    tax = np.round(rng.uniform(0, 0.08, n), 2)
    ship = us_1997 + rng.randint(0, 500, n).astype(np.int64) * day_us
    d = tmp_path / "skew"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(okey),
                "l_partkey": pa.array(pkey),
                "l_suppkey": pa.array(skey),
                "l_quantity": pa.array(qty),
                "l_extendedprice": pa.array(ep),
                "l_discount": pa.array(disc),
                "l_tax": pa.array(tax),
                "l_shipdate": pa.array(ship, pa.int64()).cast(pa.timestamp("us")),
            }
        ),
        d / "lineitem.parquet",
        row_group_size=701,
    )
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    oprio = [prios[i] for i in rng.randint(0, 5, n_ord)]
    odate = us_1997 + rng.randint(0, 150, n_ord).astype(np.int64) * day_us
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
                "o_orderdate": pa.array(odate, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(oprio),
            }
        ),
        d / "orders.parquet",
        row_group_size=97,
    )
    pnames = [
        [f"red {Q9_PART_TOKEN}", f"blue {Q20_PART_TOKEN}", "green rod"][i]
        for i in rng.randint(0, 3, n_part)
    ]
    retail = np.round(rng.uniform(900, 1000, n_part), 2)
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
                "p_name": pa.array(pnames),
                "p_retailprice": pa.array(retail),
            }
        ),
        d / "part.parquet",
    )
    snat = rng.randint(0, 25, n_supp).astype(np.int64)
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
                "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
                "s_nationkey": pa.array(snat),
            }
        ),
        d / "supplier.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(np.arange(25, dtype=np.int64)),
                "n_name": pa.array([f"NATION_{i:02d}" for i in range(25)]),
            }
        ),
        d / "nation.parquet",
    )

    cents = np.floor(ep * 100.0 + 0.5).astype(int)
    disc_e4 = np.floor(disc * 10000.0 + 0.5).astype(int)
    rev = cents * (10000 - disc_e4)
    qty_i = np.floor(qty + 0.5).astype(int)
    tax_e4 = np.floor(tax * 10000.0 + 0.5).astype(int)

    # late_shipment_orders: per-priority count of window orders whose max
    # lineitem ship exceeds odate + delay
    lo = int(dt.datetime.fromisoformat(Q4_ORDER_LO).timestamp()) * 10**6
    hi = int(dt.datetime.fromisoformat(Q4_ORDER_HI).timestamp()) * 10**6
    max_ship: dict = {}
    for o, s in zip(okey.tolist(), ship.tolist()):
        max_ship[o] = max(max_ship.get(o, 0), s)
    want_late: dict = {}
    for o in range(n_ord):
        od = int(odate[o])
        if not (lo <= od < hi):
            continue
        if max_ship.get(o, 0) > od + Q4_LATE_DAYS * day_us:
            want_late[oprio[o]] = want_late.get(oprio[o], 0) + 1
    got = late_shipment_orders(str(d))
    assert {
        p: c
        for p, c in zip(
            got.column("o_orderpriority").to_pylist(),
            got.column("n_late").to_pylist(),
        )
    } == want_late

    # tax_band_priority: (band -> high/low counts) over the orderkey join
    high = set(Q12_HIGH_PRIORITIES)
    want_band: dict = {}
    for o, b in zip(okey.tolist(), tax_e4.tolist()):
        e = want_band.setdefault(b, [0, 0])
        e[0 if oprio[o] in high else 1] += 1
    got = tax_band_priority(str(d))
    assert {
        b: (h, l)
        for b, h, l in zip(
            got.column("tax_e4").to_pylist(),
            got.column("high_n").to_pylist(),
            got.column("low_n").to_pylist(),
        )
    } == {b: tuple(v) for b, v in want_band.items()}

    # nation_profit: sum over token parts of rev - qty*retail_c*1e4
    retail_c = np.floor(retail * 100.0 + 0.5).astype(int)
    want_np: dict = {}
    for i in range(n):
        p = int(pkey[i])
        if Q9_PART_TOKEN not in pnames[p]:
            continue
        year = dt.datetime.utcfromtimestamp(int(ship[i]) // 10**6).year
        nk = int(snat[skey[i]])
        k = (f"NATION_{nk:02d}", year)
        want_np[k] = want_np.get(k, 0) + int(rev[i]) - int(qty_i[i]) * int(
            retail_c[p]
        ) * 10000
    got = nation_profit(str(d))
    assert {
        (nm, y): v
        for nm, y, v in zip(
            got.column("n_name").to_pylist(),
            got.column("l_year").to_pylist(),
            got.column("profit_i").to_pylist(),
        )
    } == want_np

    # dominant_part_suppliers: 100*q > pct*total per token part
    pair_q: dict = {}
    part_q: dict = {}
    for i in range(n):
        p = int(pkey[i])
        if Q20_PART_TOKEN not in pnames[p]:
            continue
        s = int(skey[i])
        pair_q[(p, s)] = pair_q.get((p, s), 0) + int(qty_i[i])
        part_q[p] = part_q.get(p, 0) + int(qty_i[i])
    want_dom = sorted(
        {s for (p, s), q in pair_q.items() if 100 * q > Q20_SHARE_PCT * part_q[p]}
    )
    got = dominant_part_suppliers(str(d))
    assert got.column("s_suppkey").to_pylist() == want_dom
    assert got.column("s_name").to_pylist() == [
        f"Supplier#{s:09d}" for s in want_dom
    ]


def test_active_spans_and_scd2_under_hot_key_skew(tmp_path):
    """One user = half the events and one day = most of them: the
    interval-union rank-offset kernel and the SCD2 run detection stay
    exact when a single user dominates its shard."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from invoice_extraction_ray.config import (
        SCD2_BAND_EDGES_C,
        SPAN_GAP_BY_TYPE,
        SPAN_GAP_DEFAULT,
    )
    from invoice_extraction_ray.ops.interval import user_active_spans
    from invoice_extraction_ray.ops.window import scd2_user_bands

    rng = np.random.RandomState(31)
    n = 10_000
    day = 86_400_000_000
    user = np.where(rng.rand(n) < 0.5, 7, rng.randint(0, 100, n)).astype(np.int64)
    days = np.where(rng.rand(n) < 0.7, 4, rng.randint(0, 30, n)).astype(np.int64)
    ts = days * day + rng.randint(0, day, n)
    types = np.array(["view", "click", "purchase", "error", "signup"])[
        rng.randint(0, 5, n)
    ]
    value = np.round(rng.uniform(0, 500, n), 2)
    t = pa.table(
        {
            "user_id": pa.array(user),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "event_type": pa.array(types.tolist(), pa.string()),
            "value": pa.array(value, pa.float64()),
        }
    )
    d = tmp_path / "skewspan"
    d.mkdir()
    pq.write_table(t, d / "events.parquet", row_group_size=397)

    # interval-union recompute
    per: dict = {}
    for u, us, et in zip(user.tolist(), ts.tolist(), types.tolist()):
        s = us // 10**6
        per.setdefault(u, []).append(
            (s, s + SPAN_GAP_BY_TYPE.get(et, SPAN_GAP_DEFAULT))
        )
    want_spans = {}
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
        want_spans[u] = (
            len(spans),
            sum(e - s for s, e in spans),
            max(e - s for s, e in spans),
        )
    got_spans = {
        r["user_id"]: (r["n_spans"], r["covered_sec"], r["max_span_sec"])
        for r in user_active_spans(str(d)).take_all()
    }
    assert got_spans == want_spans
    # the hot user really is skewed AND really merged
    assert want_spans[7][0] < sum(1 for u in user if u == 7)

    # SCD2 recompute
    cents = np.floor(value * 100.0 + 0.5).astype(np.int64)
    daily: dict = {}
    for u, dd, c in zip(user.tolist(), days.tolist(), cents.tolist()):
        daily[(u, dd)] = daily.get((u, dd), 0) + c
    pu: dict = {}
    for (u, dd), vc in daily.items():
        pu.setdefault(u, []).append((dd, vc))
    e0, e1 = SCD2_BAND_EDGES_C
    want_scd = set()
    for u, cells in pu.items():
        cells.sort()
        runs: list = []
        for dd, vc in cells:
            b = 0 if vc < e0 else (1 if vc < e1 else 2)
            if runs and runs[-1][0] == b:
                runs[-1][2] += 1
            else:
                runs.append([b, dd, 1])
        for i, (b, vf, nd) in enumerate(runs):
            vt = runs[i + 1][1] if i + 1 < len(runs) else None
            want_scd.add((u, b, vf, vt, nd))
    got_scd = set(
        (r["user_id"], r["band"], r["valid_from"], r["valid_to"], r["n_days"])
        for r in scd2_user_bands(str(d)).take_all()
    )
    assert got_scd == want_scd
