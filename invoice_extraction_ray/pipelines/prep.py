"""Training-corpus preparation — the composed end-to-end cleanup a data team
runs before training: quality filter -> exact dedup (keep first) -> near-dup
cluster removal (keep representative).

The reference ships these concerns as separate per-document passes
(confidence scoring `confidence.py`, duplicate-region suppression
`ocr.py:134-179`); here they compose into ONE lazy Dataset so the corpus
streams through each stage exactly once and only small derived tables
(digest groups, near-dup clusters) shuffle.

Scale shape:
- the quality score and content digest are computed in the SAME map pass
  (one read of the corpus), pre-combined per batch before the digest
  groupby (at most one row per distinct digest per block shuffles);
- exact-dedup representatives are the groupby output itself — no join back
  to the corpus is needed because every surviving column (doc_id, score,
  copy count) is mergeable through the groupby;
- near-dup clusters come from the exact n-gram pipeline (only gram/pair
  rows shuffle, never documents) and attach via ONE hash join
  (left outer + null-filter = anti-join of cluster losers).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Min, Sum

from ..ops._util import absorb_empty_blocks, strip_schema_metadata
from ..ops.dedup import neardup_clusters
from ..ops.text import quality_arrays

# drops the ~20-25% lowest-quality docs on the synthetic documents tables at
# every scale (p25 of score_e5 is ~26-27k) — a threshold that actually binds
PREP_MIN_SCORE_E5 = 25_000

# document-frequency cap for the near-dup pair stage: a gram shared by K
# docs fans out K^2/2 candidate rows, so the prep pipeline ALWAYS caps
# (uncapped exact pairing took 205 s at sf0.1 on this small-vocab corpus —
# at 100 TB a stop-phrase trigram is a bomb).  Pairs sharing only hot grams
# are treated as non-duplicates by design; the SQL oracle applies the
# identical cap, so the gate still checks exact equality.
PREP_NGRAM_MAX_DF = 64


def prepare_corpus(
    source,
    min_score_e5: int = PREP_MIN_SCORE_E5,
    jaccard_threshold: float = 0.5,
    num_partitions: int = 8,
    ngram_max_df: int | None = PREP_NGRAM_MAX_DF,
) -> ray.data.Dataset:
    """Surviving documents after quality + exact-dup + near-dup filtering.

    ``source``: Dataset or pa.Table with (doc_id, text).
    Returns (doc_id, n_copies, score_e5): the kept representative of each
    exact-duplicate group that clears the quality bar and is not a non-
    representative member of a near-dup cluster.
    """
    from invoice_extraction_ray.ops._util import as_docs_dataset

    docs = as_docs_dataset(source)

    def score_hash_combine(t: pa.Table) -> pa.Table:
        import hashlib

        import numpy as np

        score = quality_arrays(t.column("text"))["score_e5"]
        # content digest: same two-int64 group key as ops.relational.exact_dedup
        digests = b"".join(
            hashlib.sha256((s or "").encode()).digest()[:16]
            for s in t.column("text").to_pylist()
        )
        h = np.frombuffer(digests, dtype="<i8").reshape(-1, 2)
        tt = pa.table(
            {
                "doc_id": t.column("doc_id"),
                "h1": pa.array(h[:, 0]),
                "h2": pa.array(h[:, 1]),
                "score_e5": pa.array(score, pa.int64()),
            }
        )
        # per-batch combiner: identical text => identical score, so min is
        # exact; the shuffle carries one row per distinct digest per block
        g = tt.group_by(["h1", "h2"]).aggregate(
            [("doc_id", "min"), ("score_e5", "min"), ([], "count_all")]
        )
        return pa.table(
            {
                "h1": g.column("h1"),
                "h2": g.column("h2"),
                "doc_id": g.column("doc_id_min"),
                "score_e5": g.column("score_e5_min"),
                "n": pc.cast(g.column("count_all"), pa.int64()),
            }
        )

    reps = (
        docs.map_batches(score_hash_combine, batch_format="pyarrow")
        .groupby(["h1", "h2"])
        .aggregate(
            Min("doc_id", alias_name="doc_id"),
            Min("score_e5", alias_name="score_e5"),
            Sum("n", alias_name="n_copies"),
        )
        .select_columns(["doc_id", "n_copies", "score_e5"])
    )

    def quality_gate(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("score_e5"), min_score_e5))

    kept = reps.map_batches(quality_gate, batch_format="pyarrow")

    # near-dup clusters over the FULL corpus (a low-quality duplicate must
    # still knock out its higher-id twins); only docs appearing in a pair
    # get a row, so the join's right side is small
    clusters = neardup_clusters(
        docs, threshold=jaccard_threshold, max_df=ngram_max_df
    ).materialize()  # cluster-membership-bounded: only docs in a pair
    if clusters.count() == 0:
        # Dataset.join breaks on a schema-less empty right side (the known
        # zero-column-partition hazard); no clusters means nothing to drop.
        return kept
    joined = absorb_empty_blocks(
        strip_schema_metadata(kept).join(
            # absorb BOTH join inputs: either side can carry schema-less
            # empty blocks (clusters' own union/aggregate lineage emits
            # them on small chunked inputs) and the hash aggregator fails
            # with "No match ... for key field reference" on such a block
            absorb_empty_blocks(strip_schema_metadata(clusters)),
            "left_outer",
            num_partitions,
            on=("doc_id",),
        )
    )

    def drop_cluster_losers(t: pa.Table) -> pa.Table:
        cl = t.column("cluster_id")
        keep = pc.or_kleene(pc.is_null(cl), pc.equal(cl, t.column("doc_id")))
        return t.filter(pc.fill_null(keep, False)).select(
            ["doc_id", "n_copies", "score_e5"]
        )

    return joined.map_batches(drop_cluster_losers, batch_format="pyarrow")
