"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are usually NOT available in this
environment, so the default decode kernel is a clearly-marked deterministic
STUB — but the Ray-side plumbing is real and tested: binary columns through
zero-copy Arrow batches, an actor-pool decode stage with per-actor setup,
small batch sizes for large payloads, and a typed metadata output schema.

``real=True`` soft-imports Pillow: on a cluster with codecs installed the
decode / resize / frame-sample stages run for real (PIL.Image.open,
thumbnail, multi-frame seek) with the SAME schemas; when Pillow is absent
they raise the honest NotImplementedError instead of pretending.
"""

from __future__ import annotations

from ._util import pool_size

import hashlib

import pyarrow as pa
import ray.data


def _pil():
    """Soft import: PIL.Image when Pillow is installed, else None.  Imported
    inside the actor/task, so the real path works on codec-equipped worker
    nodes even if the driver lacks Pillow."""
    try:
        from PIL import Image  # type: ignore

        return Image
    except ImportError:
        return None

MEDIA_META_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_bytes", pa.int64()),
        ("sha256", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("format", pa.string()),
    ]
)


class StubDecoder:
    """Actor-pool decode stage.  ``real=True`` decodes with Pillow when it
    is installed and raises NotImplementedError otherwise — the honest
    marker that no codec exists here; ``real=False`` derives deterministic
    fake dimensions from the payload hash so downstream layout, batching,
    and schema handling are fully exercised either way."""

    def __init__(self, real: bool = False):
        self.real = real
        self._image_mod = _pil() if real else None  # once per actor

    def _decode(self, payload: bytes) -> tuple[int, int, str]:
        if self.real:
            if self._image_mod is None:
                raise NotImplementedError(
                    "image/audio decode libraries are not available in this "
                    "environment; run with real=False (deterministic stub) or "
                    "install Pillow on the cluster"
                )
            import io

            with self._image_mod.open(io.BytesIO(payload)) as im:
                return im.width, im.height, (im.format or "unknown").lower()
        digest = hashlib.sha256(payload).digest()
        width = 64 + digest[0] % 192  # deterministic pseudo-dimensions
        height = 64 + digest[1] % 192
        fmt = ("png", "jpeg", "webp")[digest[2] % 3]
        return width, height, fmt

    def __call__(self, t: pa.Table) -> pa.Table:
        doc_ids = t.column("doc_id").to_pylist()
        payloads = t.column("payload").to_pylist()
        rows = {
            "doc_id": [], "n_bytes": [], "sha256": [],
            "width": [], "height": [], "format": [],
        }
        for d, p in zip(doc_ids, payloads):
            p = p or b""
            w, h, fmt = self._decode(p)
            rows["doc_id"].append(d)
            rows["n_bytes"].append(len(p))
            rows["sha256"].append(hashlib.sha256(p).hexdigest())
            rows["width"].append(w)
            rows["height"].append(h)
            rows["format"].append(fmt)
        return pa.Table.from_pydict(rows, schema=MEDIA_META_SCHEMA)


def text_as_binary(sf_dir: str) -> ray.data.Dataset:
    """Re-type the documents text column as an opaque binary payload column —
    the stand-in multimodal corpus for this environment."""
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_bin(t: pa.Table) -> pa.Table:
        payload = pc.cast(pc.fill_null(t.column("text"), ""), pa.binary())
        return pa.table({"doc_id": t.column("doc_id"), "payload": payload})

    return ds.map_batches(to_bin, batch_format="pyarrow")


class StubResizer:
    """Actor-pool resize stage (reference preprocess resize analogue).
    real=True raises NotImplementedError (no image libs here); the stub
    truncates the payload deterministically in proportion to the target
    area so output sizing/batching behavior is realistic."""

    def __init__(self, max_dim: int = 256, real: bool = False):
        self.max_dim = max_dim
        self.real = real
        self._image_mod = _pil() if real else None  # once per actor

    def _resize_real(self, payload: bytes) -> tuple[bytes, int, int]:
        import io

        with self._image_mod.open(io.BytesIO(payload)) as im:
            im.thumbnail((self.max_dim, self.max_dim))
            buf = io.BytesIO()
            im.save(buf, format="PNG")
            return buf.getvalue(), im.width, im.height

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.real and self._image_mod is None:
            raise NotImplementedError("install Pillow to resize for real")
        metas = StubDecoder(real=False)
        out_doc, out_payload, out_w, out_h = [], [], [], []
        for d, p in zip(t.column("doc_id").to_pylist(), t.column("payload").to_pylist()):
            p = p or b""
            if self.real:
                np_, nw, nh = self._resize_real(p)
                out_doc.append(d)
                out_payload.append(np_)
                out_w.append(nw)
                out_h.append(nh)
                continue
            w, h, _ = metas._decode(p)
            scale = min(1.0, self.max_dim / max(w, h))
            nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
            keep = max(1, int(len(p) * (nw * nh) / max(1, w * h)))
            out_doc.append(d)
            out_payload.append(p[:keep])
            out_w.append(nw)
            out_h.append(nh)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "payload": pa.array(out_payload, pa.binary()),
                "width": pa.array(out_w, pa.int32()),
                "height": pa.array(out_h, pa.int32()),
            }
        )


class StubFrameSampler:
    """Actor-pool video frame-sampling stage: 1 input row -> k frame rows
    (the flat_map fan-out shape).  Stub frames are deterministic payload
    slices; a real build decodes with pyav/cv2 and keeps the same schema."""

    def __init__(self, n_frames: int = 4, real: bool = False):
        self.n_frames = n_frames
        self.real = real
        self._image_mod = _pil() if real else None  # once per actor

    def _frames_real(self, payload: bytes) -> list[bytes]:
        """Evenly sample up to n_frames from a multi-frame image (GIF/TIFF
        via Pillow seek); single-frame images yield one frame.  Each frame
        re-encodes as PNG bytes — same schema as the stub."""
        import io

        with self._image_mod.open(io.BytesIO(payload)) as im:
            total = getattr(im, "n_frames", 1)
            k = min(self.n_frames, total)
            picks = [round(i * (total - 1) / max(k - 1, 1)) for i in range(k)]
            out = []
            for fi in picks:
                im.seek(fi)
                buf = io.BytesIO()
                im.convert("RGB").save(buf, format="PNG")
                out.append(buf.getvalue())
            return out

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.real and self._image_mod is None:
            raise NotImplementedError("install Pillow to sample frames for real")
        out_doc, out_idx, out_frame = [], [], []
        for d, p in zip(t.column("doc_id").to_pylist(), t.column("payload").to_pylist()):
            p = p or b""
            if self.real:
                for i, fr in enumerate(self._frames_real(p)):
                    out_doc.append(d)
                    out_idx.append(i)
                    out_frame.append(fr)
                continue
            k = min(self.n_frames, max(1, len(p)))
            step = max(1, len(p) // k)
            for i in range(k):
                out_doc.append(d)
                out_idx.append(i)
                out_frame.append(p[i * step : i * step + step])
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "frame_idx": pa.array(out_idx, pa.int32()),
                "frame": pa.array(out_frame, pa.binary()),
            }
        )


def media_resized(sf_dir: str, max_dim: int = 256) -> ray.data.Dataset:
    """binary payloads -> actor-pool resize -> resized payloads + dims."""
    from ._util import pool_size

    return text_as_binary(sf_dir).map_batches(
        StubResizer,
        fn_constructor_kwargs={"max_dim": max_dim, "real": False},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=pool_size(),
    )


def media_frames(sf_dir: str, n_frames: int = 4) -> ray.data.Dataset:
    """binary payloads -> actor-pool frame sampling (1 row -> k frame rows)."""
    from ._util import pool_size

    return text_as_binary(sf_dir).map_batches(
        StubFrameSampler,
        fn_constructor_kwargs={"n_frames": n_frames, "real": False},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=pool_size(),
    )


N_HIST_BINS = 16


class ByteHistogramFeatures:
    """Feature-extract stage over opaque binary payloads — fully REAL (no
    codec needed): a normalized 16-bin byte histogram per payload, the
    standard cheap content signature.  Output column is list<float32>,
    the same shape a real image/audio embedding stage would emit."""

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        col = t.column("payload")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if col.null_count:
            col = pc.fill_null(col, b"")
        n = len(col)
        # zero-copy views of the Arrow binary layout: offsets index the
        # shared values buffer; one flat >>4 + bincount over (row, nibble)
        # keys replaces the per-row Python loop (float32 rounding identical:
        # int counts -> float64 divide -> float32 cast, as before)
        off_dt = np.int64 if pa.types.is_large_binary(col.type) else np.int32
        off = np.frombuffer(
            col.buffers()[1], dtype=off_dt, count=n + 1, offset=col.offset * off_dt().itemsize
        ).astype(np.int64)
        data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        starts, ends = off[:-1], off[1:]
        lens = ends - starts
        if n > 1 and not (starts[1:] == ends[:-1]).all():  # sliced/gapped layout
            flat = np.concatenate(
                [data[s:e] for s, e in zip(starts, ends)] or [np.empty(0, np.uint8)]
            )
        else:
            flat = data[starts[0] : ends[-1]] if n else np.empty(0, np.uint8)
        row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        hist = np.bincount(
            row_of * N_HIST_BINS + (flat >> 4).astype(np.int64),
            minlength=n * N_HIST_BINS,
        ).reshape(n, N_HIST_BINS)
        vals = (hist.astype(np.float64) / np.maximum(lens, 1)[:, None]).astype(
            np.float32
        )
        feats = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * N_HIST_BINS, N_HIST_BINS, dtype=np.int32)),
            pa.array(vals.ravel()),
        )
        return pa.table({"doc_id": t.column("doc_id"), "features": feats})


_feat_kernel = ByteHistogramFeatures()  # stateless — shared per worker


def _features_batch(t: pa.Table) -> pa.Table:
    return _feat_kernel(t)


class LuminanceHistogramFeatures:
    """REAL encoder head (``real=True`` twin of ByteHistogramFeatures):
    Pillow-decoded grayscale pixels -> normalized 16-bin LUMINANCE histogram
    per payload, float32, the same ``list<float32>[16]`` schema — so
    ``media_ann_topk`` and every downstream consumer is unchanged when the
    cluster has codecs.  Actor-pool stage: the soft-imported codec is
    per-actor state.  Raises the honest NotImplementedError when Pillow is
    absent (this sandbox); an UNDECODABLE payload degrades to the zero
    vector (norm 0 — excluded from cosine scoring exactly like empty
    payloads), never fails the stage."""

    def __init__(self):
        self._image_mod = _pil()  # once per actor

    def features_of(self, payload: bytes) -> "list[float]":
        import io

        import numpy as np

        if self._image_mod is None:
            raise NotImplementedError(
                "image decode libraries are not available in this environment; "
                "run media_features(real=False) (byte-histogram stub) or "
                "install Pillow on the cluster"
            )
        try:
            with self._image_mod.open(io.BytesIO(payload)) as im:
                pix = np.asarray(im.convert("L"), dtype=np.uint8).ravel()
        except Exception:
            return [0.0] * N_HIST_BINS  # undecodable -> zero vector
        if pix.size == 0:
            return [0.0] * N_HIST_BINS
        hist = np.bincount(pix >> 4, minlength=N_HIST_BINS).astype(np.float64)
        return (hist / pix.size).astype(np.float32).tolist()

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t.column("payload").to_pylist()
        feats = [self.features_of(p or b"") for p in payloads]
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "features": pa.array(feats, pa.list_(pa.float32())),
            }
        )


def media_features(sf_dir: str, real: bool = False) -> ray.data.Dataset:
    """binary payloads -> feature extraction -> list<float32>.

    ``real=False`` (default here — no codecs in this sandbox): TASK map,
    not an actor pool: ByteHistogramFeatures holds no state (no model, no
    codec), so a pool buys nothing and pays startup + wave quantization —
    measured 1.15 s pool vs 0.60 s task at sf0.1/32 cpus.

    ``real=True``: the Pillow luminance-histogram encoder head as an ACTOR
    POOL (it holds the soft-imported codec, per the repo's task-vs-actor
    rule); same output schema, raises honestly when Pillow is absent."""
    if real:
        return text_as_binary(sf_dir).map_batches(
            LuminanceHistogramFeatures,
            batch_format="pyarrow",
            batch_size=64,
            concurrency=pool_size(),
        )
    return text_as_binary(sf_dir).map_batches(
        _features_batch,
        batch_format="pyarrow",
        batch_size=64,
    )


def media_metadata(sf_dir: str) -> ray.data.Dataset:
    """The multimodal pipeline: binary payloads -> actor-pool decode ->
    typed metadata.  Small batch_size: payload batches must fit actor heaps
    (ray_guide: large binary rows need small batches)."""
    ds = text_as_binary(sf_dir)
    return ds.map_batches(
        StubDecoder,
        fn_constructor_kwargs={"real": False},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=pool_size(),
    )


# ---------------------------------------------------------------------------
# Media embeddings + similarity search: the cross-modal retrieval composition
# (feature-extract -> fixed projection -> cosine top-k).  The projection is a
# data-independent seeded matrix standing in for a learned image/audio
# encoder head; swap it for a real model forward in ByteHistogramFeatures'
# place and nothing downstream changes.
# ---------------------------------------------------------------------------

import numpy as _np

_MEDIA_PROJ = _np.random.RandomState(13579).normal(size=(16, 16))


def _embed_feature_matrix(feats64: "_np.ndarray") -> "_np.ndarray":
    """float64 feature rows -> projected embedding rows (no normalization —
    cosine scoring normalizes; zero-norm rows are filtered by callers)."""
    return feats64 @ _MEDIA_PROJ.T


def media_ann_topk(
    sf_dir: str, k: int = 10, query_doc_id: int = 0, real: bool = False
) -> ray.data.Dataset:
    """Cosine top-k over media embeddings: payload -> histogram features
    -> fixed-projection embedding + broadcast-query scoring (task map, one
    matmul per batch) -> global sort/limit.  The query doc's payload comes
    from a predicate-pushdown parquet point read — the driver never reads
    the fact table.  Zero-norm embeddings (empty/undecodable payloads) are
    excluded on both the engine and oracle sides.

    ``real=True`` swaps the byte-histogram stub for the Pillow LUMINANCE
    encoder head (:class:`LuminanceHistogramFeatures`) on BOTH the query
    and corpus sides — everything downstream (projection, scoring, sort)
    is identical; raises honestly when Pillow is absent."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    from ._util import embedding_matrix

    # query features, by the identical kernel, driver-side
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filters=[("doc_id", "==", query_doc_id)],
    )
    if tbl.num_rows == 0:
        raise ValueError(
            f"media_ann_topk: query doc_id {query_doc_id} not found in "
            f"{sf_dir}/documents.parquet — the corpus may be empty or the "
            "id wrong; similarity queries need an existing query asset"
        )
    payload = (tbl.column("text")[0].as_py() or "").encode()
    if real:
        qf = _np.asarray(
            LuminanceHistogramFeatures().features_of(payload), dtype=_np.float64
        )
        if float(_np.linalg.norm(qf)) == 0.0:
            raise ValueError("query doc payload is empty or undecodable")
    else:
        b = _np.frombuffer(payload, dtype=_np.uint8)
        if b.size == 0:
            raise ValueError("query doc has an empty payload")
        hist = _np.bincount(b >> 4, minlength=N_HIST_BINS).astype(_np.float64)
        qf = (hist / b.size).astype(_np.float32).astype(_np.float64)
    qe = _embed_feature_matrix(qf[None, :])[0]
    qn = qe / max(float(_np.linalg.norm(qe)), 1e-30)
    q_ref = ray.put(qn)

    def score(t: pa.Table) -> pa.Table:
        bq = ray.get(q_ref)  # plasma zero-copy per batch
        m = embedding_matrix(t.column("features"), dtype="float64", dim=N_HIST_BINS)
        e = _embed_feature_matrix(m)
        norms = _np.linalg.norm(e, axis=1)
        keep = norms > 0
        sims = (e[keep] @ bq) / norms[keep]
        vid = t.column("doc_id").to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {
                "doc_id": pa.array(vid, pa.int64()),
                "sim_e4": pa.array(
                    _np.floor(sims * 10_000.0 + 0.5).astype(_np.int64)
                ),
            }
        )

    scored = media_features(sf_dir, real=real).map_batches(
        score, batch_format="pyarrow"
    )
    return scored.sort(["sim_e4", "doc_id"], descending=[True, False]).limit(k)


def media_exact_dedup(sf_dir: str) -> ray.data.Dataset:
    """Content-hash dedup of media assets: one row per DISTINCT payload
    digest with the canonical keeper (min doc_id) and copy count — the
    asset-level twin of ``ops/relational.py::exact_dedup`` (which keys on
    text), keyed on the full sha256 of the binary payload so identical
    uploads dedup regardless of their metadata.

    Scale shape: digests are computed per batch (C-speed sha over the
    zero-copy payload buffers; only digest+id rows ever shuffle — the
    payloads themselves never move), co-partitioned by the digest's first
    byte, and each shard group-reduces (min, count) vectorized."""
    import numpy as np
    import pyarrow.compute as pc

    ds = text_as_binary(sf_dir)

    def digest(t: pa.Table) -> pa.Table:
        payloads = t.column("payload").to_pylist()
        shas = [hashlib.sha256(p or b"").hexdigest() for p in payloads]
        shard = np.array([int(s[:2], 16) for s in shas], dtype=np.int32)
        return pa.table(
            {
                "sha256": pa.array(shas, pa.string()),
                "doc_id": t.column("doc_id"),
                "shard": pa.array(shard),
            }
        )

    _OUT = pa.schema(
        [("sha256", pa.string()), ("keep_id", pa.int64()), ("n_copies", pa.int64())]
    )

    def reduce_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        agg = g.group_by("sha256").aggregate([("doc_id", "min"), ([], "count_all")])
        return pa.table(
            {
                "sha256": agg.column("sha256"),
                "keep_id": agg.column("doc_id_min"),
                "n_copies": pc.cast(agg.column("count_all"), pa.int64()),
            }
        )

    return (
        ds.map_batches(digest, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(reduce_shard, batch_format="pyarrow")
    )
