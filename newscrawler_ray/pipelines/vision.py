"""Image-text pair curation operators (LAION-style training-data path).

The reference crawler stores article top-image URLs and captions but has
no pair-curation machinery (SURVEY.md D5 notes it has no near-dedup at
all); a 100 TB image-text pipeline needs exactly these stages, so they
are built here as first-class Ray Data operators:

  pair_embeddings      — two-tower encoder over (bytes, caption) rows
  clip_score_filter    — keep pairs whose image/text cosine >= tau
  image_quality_filter — tag rows against size / aspect / flatness gates
  image_near_dup_emb   — embedding-cosine image near-dup via IVF cells

MODEL STUB, REAL PLUMBING: the sandbox has no torch/CLIP, so the two
encoder towers are deterministic stand-ins — seeded random-projection
matrices built once per actor in ``__init__`` (the model-load slot; a
real deployment loads CLIP vision/text towers there). Everything around
the stub is production-shaped: actor-pool ``map_batches`` with small
batches for payload-heavy rows, unit-norm ``list<float>`` embedding
columns that feed the shared IVF pair-mining and kNN machinery
(``dedup.ivf_pair_mine``, ``simsearch.ivf_build``), error-as-record
decode failures, and shuffles that ship only (cell, id, embedding).

Determinism contract (tested): embeddings are pure functions of
(bytes, fmt, caption, seed) — identical rows embed identically on any
actor, so planted pixel-identical near-dups score cosine 1.0.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..stages import _pool_width
from .multimodal import block_mean_resize, decode_any

_TXT_BUCKETS = 1024


def _image_id_to_int(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """``img-%08d`` -> int64 (fixture id format, FIXTURES.md §1). A
    syntactic inverse exists (``_int_to_image_id``) so nothing needs a
    join to recover the string id downstream."""
    return pc.cast(pc.utf8_slice_codeunits(col, 4, 99), pa.int64())


def _int_to_image_id(ids: np.ndarray) -> list[str]:
    return [f"img-{i:08d}" for i in ids.tolist()]


class PairEncoder:
    """Actor-pool two-tower encoder: image bytes -> d-dim unit vector,
    caption text -> d-dim unit vector, plus their cosine (clip_score).

    ``__init__`` builds the "model" once per actor: a seeded random
    projection for each tower (image: flattened 8x8x3 block-mean
    thumbnail; text: hashed char-3-gram counts). Stand-in for CLIP's
    vision/text towers — swap the two matmuls for model forward passes
    and every downstream operator keeps working unchanged.
    """

    def __init__(self, dim: int = 64, thumb: int = 8, seed: int = 7):
        self.dim, self.thumb = dim, thumb
        rng = np.random.default_rng(seed)
        self.w_img = rng.standard_normal((thumb * thumb * 3, dim)) / np.sqrt(dim)
        self.w_txt = rng.standard_normal((_TXT_BUCKETS, dim)) / np.sqrt(dim)

    def _embed_image(self, data: bytes, fmt: str) -> np.ndarray:
        img = decode_any(data, fmt)
        x = block_mean_resize(img, self.thumb, self.thumb).ravel() / 255.0 - 0.5
        v = x @ self.w_img
        return v / max(float(np.linalg.norm(v)), 1e-12)

    def _embed_text(self, caption: str) -> np.ndarray:
        b = np.frombuffer(caption.encode("utf-8"), dtype=np.uint8)
        if len(b) < 3:
            counts = np.zeros(_TXT_BUCKETS)
            counts[len(b)] = 1.0  # degenerate-caption bucket, still unit-norm
        else:
            grams = (
                b[:-2].astype(np.int64) * 131 * 131
                + b[1:-1].astype(np.int64) * 131
                + b[2:].astype(np.int64)
            )
            counts = np.bincount(grams % _TXT_BUCKETS, minlength=_TXT_BUCKETS)
        v = counts @ self.w_txt
        return v / max(float(np.linalg.norm(v)), 1e-12)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages import pin_worker_threads

        pin_worker_threads()
        n = batch.num_rows
        img_emb = np.zeros((n, self.dim))
        txt_emb = np.zeros((n, self.dim))
        errs: list = [None] * n
        raw = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        caps = batch.column("caption").to_pylist()
        for i in range(n):
            try:
                img_emb[i] = self._embed_image(raw[i], fmts[i])
                txt_emb[i] = self._embed_text(caps[i])
            except Exception as e:  # noqa: BLE001 — error-as-record
                errs[i] = str(e)
        score = np.einsum("ij,ij->i", img_emb, txt_emb)
        return pa.table(
            {
                "image_id": batch.column("image_id"),
                "img_emb": pa.array(list(img_emb), pa.list_(pa.float64())),
                "txt_emb": pa.array(list(txt_emb), pa.list_(pa.float64())),
                "clip_score": pa.array(np.round(score, 6)),
                "encode_error": pa.array(errs, pa.string()),
            }
        )


def _images_source(src: "str | Path | rd.Dataset", columns: list[str]) -> rd.Dataset:
    """Pruned view of an image table: parquet path (column-pruned read)
    or an already-built Dataset (e.g. the crawl's stored wave output)."""
    if isinstance(src, rd.Dataset):
        return src.select_columns(columns)
    return rd.read_parquet(str(src), columns=columns)


def pair_embeddings(
    images_path: "str | Path | rd.Dataset", *, concurrency: "int | tuple | None" = None, batch_size: int = 64
) -> rd.Dataset:
    """Two-tower embeddings + alignment score per (image, caption) row.
    Payload-heavy input -> small batches; towers load once per actor."""
    ds = _images_source(images_path, ["image_id", "bytes", "fmt", "caption"])
    return ds.map_batches(
        PairEncoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=_pool_width(concurrency),
    )


def clip_score_filter(images_path: str | Path, *, tau: float = 0.0) -> rd.Dataset:
    """LAION-style pair curation: keep rows whose image/text cosine
    clears ``tau`` (LAION-400M used CLIP cosine 0.3; the stand-in towers
    make the absolute scale arbitrary, the operator shape identical).
    Output ships only (image_id, clip_score) — embeddings and payload
    bytes are dropped before any exchange."""
    emb = pair_embeddings(images_path)

    def keep(batch: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.is_null(batch.column("encode_error")),
            pc.greater_equal(batch.column("clip_score"), pa.scalar(tau)),
        )
        return batch.filter(ok).select(["image_id", "clip_score"])

    return emb.map_batches(keep, batch_format="pyarrow")


def image_quality_filter(
    images_path: "str | Path | rd.Dataset",
    *,
    min_w: int = 32,
    min_h: int = 32,
    max_aspect: float = 3.0,
    min_std: float = 1.0,
) -> rd.Dataset:
    """Size / aspect-ratio / flatness gates over decoded image stats —
    the standard pre-training image curation pass. TAGGING stage: every
    row is kept and labeled (keep: bool, reject_reason: first failing
    gate) so downstream consumers choose filter vs audit; vectorized
    numpy over the feature columns, no per-row Python."""
    from .multimodal import image_features

    feats = image_features(images_path)

    def tag(batch: pa.Table) -> pa.Table:
        w = batch.column("w").to_numpy().astype(np.float64)
        h = batch.column("h").to_numpy().astype(np.float64)
        std = batch.column("pixel_std").to_numpy()
        err = batch.column("feature_error").to_numpy(zero_copy_only=False)
        aspect = np.maximum(w, h) / np.maximum(np.minimum(w, h), 1.0)
        reason = np.full(batch.num_rows, None, dtype=object)
        # later assignments win -> order reasons from weakest to strongest
        reason[std < min_std] = "flat_image"
        reason[aspect > max_aspect] = "extreme_aspect"
        reason[(w < min_w) | (h < min_h)] = "too_small"
        reason[err != None] = "decode_error"  # noqa: E711 — numpy elementwise
        return pa.table(
            {
                "image_id": batch.column("image_id"),
                "w": batch.column("w"),
                "h": batch.column("h"),
                "pixel_std": batch.column("pixel_std"),
                "keep": pa.array(reason == None),  # noqa: E711
                "reject_reason": pa.array(reason, pa.string()),
            }
        )

    return feats.map_batches(tag, batch_format="pyarrow")


# SDXL-style resolution-bucket ladder (Podell et al., "SDXL", 2023
# appendix: multi-aspect training buckets around a fixed pixel budget).
# Scaled to a 256^2 budget; every (w, h) is a multiple of 64.
DEFAULT_ASPECT_BUCKETS: tuple[tuple[int, int], ...] = (
    (256, 256), (320, 192), (192, 320), (320, 256), (256, 320),
    (384, 192), (192, 384), (448, 128), (128, 448), (512, 128),
    (128, 512),
)


def aspect_bucket_images(
    images_path: "str | Path | rd.Dataset",
    *,
    buckets: "tuple[tuple[int, int], ...]" = DEFAULT_ASPECT_BUCKETS,
) -> rd.Dataset:
    """Aspect-ratio bucketing for multi-resolution image training
    (the SDXL recipe): assign every image to the bucket whose aspect
    ratio is nearest in LOG space (the symmetric metric — 2:1 and 1:2
    are equally far from square), ties to the lowest bucket_id. Output:
    (image_id, w, h, bucket_id, bucket_w, bucket_h). A training loader
    then batches within buckets so no batch mixes shapes and crop waste
    is minimized.

    Also emits the SDXL preprocessing plan per image: cover-resize
    dimensions (scale = max(bucket_w/w, bucket_h/h), ceil — the resized
    image always covers the bucket) and the centered crop origin
    (SDXL conditions on the crop coordinates, so the loader needs them
    as data, not as a transform side effect).

    Scale shape: reads ONLY (image_id, w, h) — payload bytes never
    leave storage — and the whole op is one shuffle-free map_batches
    with a (n_images x n_buckets) broadcast-free argmin per batch (the
    ladder is a constant). Deterministic pure function of (w, h);
    brute-force optimality + crop-geometry oracles in tests."""
    ds = _images_source(images_path, ["image_id", "w", "h"])
    blog = np.log(
        np.array([bw / bh for bw, bh in buckets], np.float64)
    )
    bw_arr = np.array([b[0] for b in buckets], np.int32)
    bh_arr = np.array([b[1] for b in buckets], np.int32)

    def assign(batch: pa.Table) -> pa.Table:
        w = batch.column("w").to_numpy().astype(np.float64)
        h = batch.column("h").to_numpy().astype(np.float64)
        la = np.log(np.maximum(w, 1.0) / np.maximum(h, 1.0))
        # argmin returns the FIRST minimum -> lowest bucket_id on ties
        bid = np.argmin(np.abs(la[:, None] - blog[None, :]), axis=1)
        tw, th = bw_arr[bid].astype(np.float64), bh_arr[bid].astype(np.float64)
        scale = np.maximum(tw / np.maximum(w, 1.0), th / np.maximum(h, 1.0))
        rw = np.maximum(np.ceil(w * scale - 1e-9), tw).astype(np.int32)
        rh = np.maximum(np.ceil(h * scale - 1e-9), th).astype(np.int32)
        return pa.table(
            {
                "image_id": batch.column("image_id"),
                "w": batch.column("w"),
                "h": batch.column("h"),
                "bucket_id": pa.array(bid.astype(np.int64), pa.int64()),
                "bucket_w": pa.array(bw_arr[bid]),
                "bucket_h": pa.array(bh_arr[bid]),
                "resize_w": pa.array(rw),
                "resize_h": pa.array(rh),
                "crop_x": pa.array((rw - bw_arr[bid]) // 2),
                "crop_y": pa.array((rh - bh_arr[bid]) // 2),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def bucketed_training_batches(
    images_path: "str | Path | rd.Dataset",
    *,
    batch_size: int = 8,
    seed: int = 17,
    buckets: "tuple[tuple[int, int], ...]" = DEFAULT_ASPECT_BUCKETS,
    n_buckets: int | None = None,
) -> rd.Dataset:
    """Deterministic multi-resolution training batch schedule: every
    image gets (bucket_id, step, slot) such that each (bucket_id, step)
    holds EXACTLY ``batch_size`` images of one resolution bucket, in
    seeded pseudo-random order within the bucket; per-bucket leftovers
    that can't fill a batch are dropped (the SDXL loader contract — a
    batch never mixes shapes, so it can be collated without padding).

    Pure composition of existing primitives: ``aspect_bucket_images``
    -> composite-key ``global_rank`` (bucket_id·2^32 + shuffle key, so
    ranks are dense and bucket-contiguous) -> one tiny per-bucket
    (count, first-rank) aggregate broadcast back -> a shuffle-free map
    computes step = within-bucket index // batch_size. Deterministic on
    any cluster size, after any retry — the property a resumable
    training run needs from its data order. Only (image_id, ids, keys)
    enter the ranking shuffle."""
    import ray

    from .ordering import _B32, global_rank, shuffle_key

    assigned = aspect_bucket_images(images_path, buckets=buckets)

    def keyed(batch: pa.Table) -> pa.Table:
        ints = _image_id_to_int(batch.column("image_id")).to_numpy()
        bid = batch.column("bucket_id").to_numpy()
        sk = shuffle_key(ints, seed)
        return pa.table(
            {
                "image_id": batch.column("image_id"),
                "bucket_id": batch.column("bucket_id"),
                "_iid": pa.array(ints, pa.int64()),
                "_bkey": pa.array(bid * _B32 + sk, pa.int64()),
            }
        )

    thin = assigned.map_batches(keyed, batch_format="pyarrow")
    ranked = global_rank(
        thin, "_bkey", "_iid", key_max=len(buckets) * _B32,
        n_buckets=n_buckets,
    ).materialize()

    # per-bucket (first rank, full-batch row cap): B rows total (tiny)
    from ray.data.aggregate import Count, Min

    per_bucket = ranked.groupby("bucket_id").aggregate(
        Count(alias_name="n"), Min("pos", alias_name="off")
    ).take_all()
    off = np.zeros(len(buckets), np.int64)
    cap = np.zeros(len(buckets), np.int64)
    for r in per_bucket:
        off[r["bucket_id"]] = r["off"]
        cap[r["bucket_id"]] = (r["n"] // batch_size) * batch_size
    bundle = ray.put((off, cap))

    def schedule(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {"image_id": pa.array([], pa.string()),
                 "bucket_id": pa.array([], pa.int64()),
                 "step": pa.array([], pa.int64()),
                 "slot": pa.array([], pa.int64())}
            )
        o, c = ray.get(bundle)
        bid = batch.column("bucket_id").to_numpy()
        within = batch.column("pos").to_numpy() - o[bid]
        keep = within < c[bid]
        return pa.table(
            {
                "image_id": batch.column("image_id").filter(pa.array(keep)),
                "bucket_id": pa.array(bid[keep], pa.int64()),
                "step": pa.array(within[keep] // batch_size, pa.int64()),
                "slot": pa.array(within[keep] % batch_size, pa.int64()),
            }
        )

    return ranked.map_batches(schedule, batch_format="pyarrow")


def caption_dedup_images(
    images_path: "str | Path | rd.Dataset",
) -> rd.Dataset:
    """Exact duplicate-caption removal over the image-pair table
    (LAION-curation step: boilerplate captions — 'image', 'IMG_1234',
    SEO spam — repeat across unrelated images and poison contrastive
    training): first-wins by caption content, winner = min image id.
    Output: surviving image_id rows.

    Shape: reads only (image_id, caption); one vector hash stage ships
    thin (caption_hash, int id) rows into ONE hash aggregate — caption
    text and payload bytes never shuffle."""
    from ray.data.aggregate import Min

    from .dedup import content_hash64

    ds = _images_source(images_path, ["image_id", "caption"])

    def rows(batch: pa.Table) -> pa.Table:
        h = [content_hash64(c) for c in batch.column("caption").to_pylist()]
        return pa.table(
            {
                "caption_hash": pa.array(h, pa.int64()),
                "iid": _image_id_to_int(batch.column("image_id")),
            }
        )

    agg = ds.map_batches(rows, batch_format="pyarrow").groupby(
        "caption_hash"
    ).aggregate(Min("iid", alias_name="iid"))

    def finish(batch: pa.Table) -> pa.Table:
        ids = batch.column("iid").to_numpy()
        return pa.table({"image_id": pa.array(_int_to_image_id(ids), pa.string())})

    return agg.map_batches(finish, batch_format="pyarrow")


def sample_pixel_budget(
    images_path: "str | Path | rd.Dataset",
    *,
    budget: int = 250_000,
    seed: int = 17,
    n_buckets: int | None = None,
) -> rd.Dataset:
    """Deterministic random image subset holding AT MOST ``budget``
    pixels total — the image twin of ``ordering.sample_token_budget``
    (a fixed decode/augment compute budget maps to pixels, not rows):
    walk the seeded pseudo-random order and keep images while the
    running w·h sum stays within budget. Output: (image_id, n_pixels,
    cum). Same ``global_prefix_cutoff`` scale shape — blocks prune
    everything past the budget region before the shuffle; payload bytes
    are never read."""
    from .ordering import global_prefix_cutoff, shuffle_key

    ds = _images_source(images_path, ["image_id", "w", "h"])

    def keyed(batch: pa.Table) -> pa.Table:
        ints = _image_id_to_int(batch.column("image_id")).to_numpy()
        w = batch.column("w").to_numpy().astype(np.int64)
        h = batch.column("h").to_numpy().astype(np.int64)
        return pa.table(
            {
                "image_id": batch.column("image_id"),
                "_iid": pa.array(ints, pa.int64()),
                "skey": pa.array(shuffle_key(ints, seed), pa.int64()),
                "n_pixels": pa.array(w * h, pa.int64()),
            }
        )

    thin = ds.map_batches(keyed, batch_format="pyarrow")
    out = global_prefix_cutoff(
        thin, "skey", "_iid", "n_pixels", budget, n_buckets=n_buckets
    )

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {"image_id": pa.array([], pa.string()),
                 "n_pixels": pa.array([], pa.int64()),
                 "cum": pa.array([], pa.int64())}
            )
        return pa.table(
            {"image_id": batch.column("image_id"),
             "n_pixels": batch.column("n_pixels"),
             "cum": batch.column("cum")}
        )

    return out.map_batches(finish, batch_format="pyarrow")


def image_embeddings(images_path: str | Path) -> rd.Dataset:
    """(int64 id, embedding) view of the image tower — the adapter that
    lets image vectors flow through the shared vector machinery
    (``simsearch.ivf_build``, ``dedup.ivf_pair_mine``, kNN)."""
    emb = pair_embeddings(images_path)

    def project(batch: pa.Table) -> pa.Table:
        ok = batch.filter(pc.is_null(batch.column("encode_error")))
        return pa.table(
            {
                "vec_id": _image_id_to_int(ok.column("image_id")),
                "embedding": ok.column("img_emb"),
            }
        )

    return emb.map_batches(project, batch_format="pyarrow")


def image_near_dup_emb(
    images_path: str | Path,
    *,
    tau: float = 0.999,
    n_cells: int = 8,
    n_probe: int = 2,
) -> rd.Dataset:
    """Embedding-cosine image near-dup via IVF-bucketed pair mining —
    same sub-quadratic shape as ``dedup.embedding_near_dup_ivf``, over
    the image tower. Catches the fixture's planted pixel-identical dups
    (cosine exactly 1.0) without any whole-corpus broadcast."""
    from .dedup import ivf_pair_mine
    from .simsearch import ivf_build

    vecs = image_embeddings(images_path).materialize()
    cents = ivf_build("", ds=vecs, n_cells=n_cells)
    pairs = ivf_pair_mine(vecs, cents, tau=tau, n_probe=n_probe)

    def fmt(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "image_a": pa.array(_int_to_image_id(batch.column("id_a").to_numpy())),
                "image_b": pa.array(_int_to_image_id(batch.column("id_b").to_numpy())),
            }
        )

    return pairs.map_batches(fmt, batch_format="pyarrow")


def image_knn(
    images_path: str | Path, *, query_image_id: str = "img-00000000", k: int = 10
) -> pa.Table:
    """Visual similarity search: exact cosine top-k over the image tower
    vs one query image (the brute-force baseline of the multimodal
    search story; the IVF scale path reuses ``simsearch`` unchanged via
    ``image_embeddings``). The query row comes from a FILTERED parquet
    read (one row, row-group pushdown) and encodes on the driver; the
    corpus streams through the encoder pool and each batch prunes to a
    local top-k before the tiny global merge — only k rows per batch
    reach the sort."""
    import pyarrow.parquet as pq
    import ray

    from .simsearch import emb_matrix

    t = pq.read_table(
        str(images_path),
        columns=["image_id", "bytes", "fmt"],
        filters=[("image_id", "==", query_image_id)],
    )
    if t.num_rows != 1:
        raise KeyError(f"query image {query_image_id!r} not found")
    q = PairEncoder()._embed_image(
        t.column("bytes")[0].as_py(), t.column("fmt")[0].as_py()
    )
    q_ref = ray.put(q)
    qid = int(query_image_id[4:])

    def batch_topk(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        ids = batch.column("vec_id").to_numpy()
        E = emb_matrix(batch.column("embedding"))  # towers emit unit-norm
        sims = E @ qv
        mask = ids != qid
        ids, sims = ids[mask], sims[mask]
        # tie-break by id ASC within equal sims so ties never prune a
        # true top-k row (same rule as simsearch.knn_topk)
        top = np.lexsort((ids, -sims))[:k]
        return pa.table(
            {"vec_id": pa.array(ids[top], pa.int64()), "sim": pa.array(sims[top])}
        )

    parts = image_embeddings(images_path).map_batches(
        batch_topk, batch_format="pyarrow"
    )
    rows = parts.sort(["sim", "vec_id"], descending=[True, False]).limit(k).take_all()
    return pa.table(
        {
            "image_id": pa.array(
                _int_to_image_id(np.array([r["vec_id"] for r in rows], np.int64))
            ),
            "sim": pa.array([round(r["sim"], 6) for r in rows]),
        }
    )


def curate_image_corpus(
    images_path: "str | Path | rd.Dataset",
    *,
    min_w: int = 32,
    min_h: int = 32,
    tau_clip: float = 0.05,
    tau_dup: float = 0.999,
    n_cells: int = 8,
    n_probe: int = 2,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Flagship image-corpus curation composition — the full LAION-style
    pre-training pass in one pipeline:

      quality gates AND clip filter  ->  the "good" id set
      IVF pair mining (whole corpus) ->  near-dup pairs among good rows
      connected components           ->  keep each cluster's min id

    Dedup applies AFTER filtering (pairs are semi-joined to the good set
    first), so a cluster whose cheapest-id member failed a gate still
    keeps its best surviving member — the semantics a real curation run
    wants. Every exchange ships only int64 ids or (cell, id, embedding);
    payload bytes never leave the decode stage. Shuffle-fed pair sets
    are repartitioned before each join and the empty case short-circuits
    (Ray Data emits zero-column empty blocks from hash shuffles that
    acero joins reject).

    Scheduling note: the two decode stages (encoder towers, pixel
    stats) each hold an actor pool, so they materialize SEQUENTIALLY —
    two concurrent pools can occupy every CPU of a small cluster and
    starve the downstream join tasks. Sequencing also reuses one
    encoder pass for both the clip filter and the dedup embeddings."""
    import ray

    from .dedup import ivf_pair_mine
    from .graph import connected_components
    from .simsearch import ivf_build

    nparts = num_partitions or max(
        2, int(ray.cluster_resources().get("CPU", 4)) // 2
    )

    # one encoder pass: scores + image embeddings (txt tower dropped —
    # only the alignment score survives the decode stage)
    enc = (
        pair_embeddings(images_path)
        .drop_columns(["txt_emb"])
        .materialize()
    )

    def clip_ids(batch: pa.Table) -> pa.Table:
        ok = batch.filter(
            pc.and_(
                pc.is_null(batch.column("encode_error")),
                pc.greater_equal(batch.column("clip_score"), pa.scalar(tau_clip)),
            )
        )
        return pa.table({"vec_id": _image_id_to_int(ok.column("image_id"))})

    def qual_ids(batch: pa.Table) -> pa.Table:
        kept = batch.filter(batch.column("keep"))
        return pa.table({"vec_id": _image_id_to_int(kept.column("image_id"))})

    empty = pa.table({"image_id": pa.array([], pa.string())})
    clip = enc.map_batches(clip_ids, batch_format="pyarrow").repartition(
        nparts
    ).materialize()
    qual = image_quality_filter(images_path, min_w=min_w, min_h=min_h).map_batches(
        qual_ids, batch_format="pyarrow"
    ).repartition(nparts).materialize()
    # extreme thresholds: an ALL-empty side stays zero-column even after
    # repartition and acero rejects the join — short-circuit first
    if clip.count() == 0 or qual.count() == 0:
        return rd.from_arrow(empty)
    good = (
        qual.join(clip, join_type="left_semi",
                  num_partitions=nparts, on=("vec_id",))
        .repartition(nparts)  # good is reused as a join side below —
        .materialize()        # coalesce its own empty 0-column blocks
    )
    if good.count() == 0:
        return rd.from_arrow(empty)

    def to_vecs(batch: pa.Table) -> pa.Table:
        ok = batch.filter(pc.is_null(batch.column("encode_error")))
        return pa.table(
            {
                "vec_id": _image_id_to_int(ok.column("image_id")),
                "embedding": ok.column("img_emb"),
            }
        )

    vecs = enc.map_batches(to_vecs, batch_format="pyarrow").materialize()
    cents = ivf_build("", ds=vecs, n_cells=n_cells)
    pairs = ivf_pair_mine(vecs, cents, tau=tau_dup, n_probe=n_probe)
    pairs = pairs.repartition(nparts).materialize()

    out = good
    if pairs.count():
        for side in ("id_a", "id_b"):  # dedup only among surviving rows
            pairs = pairs.join(
                good.rename_columns([side]),
                join_type="left_semi", num_partitions=nparts, on=(side,),
            )
            # the semi join emits 0-COLUMN blocks for empty partitions,
            # which the NEXT join rejects ("no match for FieldRef id_b");
            # coalesce them away before rejoining (join-quirk rule —
            # surfaced only at high partition counts, 32-CPU sweep)
            pairs = pairs.repartition(nparts)
        # select (not rename): join output column order is not guaranteed
        pairs = pairs.select_columns(["id_a", "id_b"]).repartition(nparts).materialize()
        if pairs.count():
            assign = connected_components(pairs)

            def non_roots(batch: pa.Table) -> pa.Table:
                drop = batch.filter(
                    pc.not_equal(batch.column("node"), batch.column("component"))
                )
                return pa.table({"vec_id": drop.column("node")})

            drops = assign.map_batches(non_roots, batch_format="pyarrow")
            drops = drops.repartition(nparts).materialize()
            if drops.count():
                out = good.join(
                    drops, join_type="left_anti",
                    num_partitions=nparts, on=("vec_id",),
                )

    def fmt(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy()
        return pa.table({"image_id": pa.array(_int_to_image_id(ids))})

    return out.map_batches(fmt, batch_format="pyarrow")


def dedup_crawl_images(crawl_out_dir: str | Path) -> rd.Dataset:
    """First-wins image dedup over the crawl's stored wave parquet
    (distinct URLs can map to the same payload image). Never shuffles
    payload bytes: winners are chosen by a groupby over the thin
    (image_id, url_hash) columns, and the payload read is semi-joined
    to the winner keys (bytes ride as a non-key column on the probe
    side only). Shared front half of every crawl→image tier."""
    import ray
    from ray.data.aggregate import Min

    waves = str(Path(crawl_out_dir) / "waves")
    nparts = max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)

    def stored_only(batch: pa.Table) -> pa.Table:
        return batch.filter(batch.column("stored")).drop_columns(["stored"])

    keys = rd.read_parquet(
        waves, columns=["image_id", "url_hash", "stored"]
    ).map_batches(stored_only, batch_format="pyarrow")
    winners = keys.groupby("image_id").aggregate(
        Min("url_hash", alias_name="url_hash")
    )

    payload = rd.read_parquet(
        waves,
        columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash",
                 "url_hash", "stored"],
    ).map_batches(stored_only, batch_format="pyarrow")
    return payload.repartition(nparts).join(
        winners.repartition(nparts),
        join_type="left_semi",
        num_partitions=nparts,
        on=("image_id", "url_hash"),
    ).drop_columns(["url_hash"])


def curate_crawl_output(
    crawl_out_dir: str | Path, **curate_kwargs
) -> rd.Dataset:
    """End-to-end tier composition: CRAWL output -> image curation.
    ``dedup_crawl_images`` picks one payload row per image, then the
    full ``curate_image_corpus`` pass runs over the survivors."""
    return curate_image_corpus(dedup_crawl_images(crawl_out_dir), **curate_kwargs)


def crawl_channel_stats(crawl_out_dir: str | Path) -> pa.Table:
    """Tier composition: CRAWL output -> corpus normalization constants
    (the ``Normalize(mean, std)`` numbers a trainer bakes into its
    loaders, computed over the deduped crawled corpus rather than a
    pre-curated table — duplicate fetches of one image must not bias
    the statistics, which is why the first-wins dedup runs first)."""
    from .multimodal import image_channel_stats

    uniq = dedup_crawl_images(crawl_out_dir).select_columns(["bytes", "fmt"])
    return image_channel_stats(uniq)


def image_kmeans(
    images_path: str | Path,
    *,
    n_cells: int = 8,
    full_iters: int = 3,
) -> rd.Dataset:
    """SemDeDup-style image-corpus clustering: distributed spherical
    k-means over the image tower (cluster once, then curate/dedup within
    clusters). Reuses ``simsearch.kmeans_assign`` unchanged through the
    ``image_embeddings`` adapter — streaming Lloyd passes, centroid-sized
    driver folds, payload bytes never shuffle.

    Output: (image_id, cluster, sim) per decodable image.
    """
    from .simsearch import kmeans_assign

    vecs = image_embeddings(images_path).materialize()
    out = kmeans_assign(
        "", ds=vecs, n_cells=n_cells, full_iters=full_iters
    )

    def fmt(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "image_id": pa.array(
                    _int_to_image_id(batch.column("vec_id").to_numpy())
                ),
                "cluster": batch.column("cluster"),
                "sim": batch.column("sim"),
            }
        )

    return out.map_batches(fmt, batch_format="pyarrow")


def image_knn_pq(
    images_path: str | Path,
    *,
    query_image_id: str = "img-00000000",
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
) -> pa.Table:
    """Visual similarity search on PQ codes: the image-tower adapter for
    ``simsearch.knn_pq`` (codebooks trained on the tower's hash-sample,
    ADC lookup-table scan + in-batch exact refine). The scale path for
    10^10 images — m bytes per image stay hot, raw vectors are touched
    only to rescore. Recall vs the exact ``image_knn`` is tested."""
    import pyarrow.parquet as pq

    from .simsearch import knn_pq

    t = pq.read_table(
        str(images_path),
        columns=["image_id", "bytes", "fmt"],
        filters=[("image_id", "==", query_image_id)],
    )
    if t.num_rows != 1:
        raise KeyError(f"query image {query_image_id!r} not found")
    q = PairEncoder()._embed_image(
        t.column("bytes")[0].as_py(), t.column("fmt")[0].as_py()
    )
    vecs = image_embeddings(images_path).materialize()
    qid = int(query_image_id[4:])

    def drop_query(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy()
        return batch.filter(pa.array(ids != qid))

    out = knn_pq(
        "", ds=vecs.map_batches(drop_query, batch_format="pyarrow"),
        query=np.asarray(q, np.float64), k=k, m=m, n_codes=n_codes,
    )
    return pa.table(
        {
            "image_id": pa.array(
                _int_to_image_id(out.column("vec_id").to_numpy())
            ),
        }
    )


# ------------------------------------------------------- curated export


# survivor-id memo: curation is deterministic, so every exporter in a
# process can reuse one curation pass (the classifier featurize-once
# lesson applied to the export family). Keyed on (path, mtime, size,
# kwargs) so an in-session rewrite of the corpus invalidates it.
_CURATED_IDS_MEMO: "dict[tuple, pa.Array]" = {}


def _curated_kept_rows(
    images_path: "str | Path", columns: list[str], **curate_kwargs
) -> rd.Dataset:
    """Shared exporter prologue: run curation, collect the survivor-id
    set once (memoized per corpus+kwargs), and semi-join the pruned
    payload read to it (broadcast ``pc.is_in`` — no shuffle; ids are
    corpus-survivor-sized, the same driver class as the IVF training
    sample)."""
    import ray

    from ..functions.joins import make_broadcast_semijoin_fn

    # The memo is only sound for a plain parquet FILE, where (mtime, size)
    # pins the content. A Dataset input has no stable identity, and a
    # directory's mtime/size do not change when a member parquet is
    # rewritten in place — both would serve stale survivor ids — so those
    # inputs bypass the memo and run a fresh curation pass (ADVICE r4).
    key = None
    if not isinstance(images_path, rd.Dataset):
        p = Path(images_path)
        if p.is_file():
            st = p.stat()
            key = (
                str(images_path), st.st_mtime_ns, st.st_size,
                tuple(sorted(curate_kwargs.items())),
            )
    ids = _CURATED_IDS_MEMO.get(key) if key is not None else None
    if ids is None:
        keep = curate_image_corpus(images_path, **curate_kwargs)
        ids = pa.concat_tables(
            [b for b in keep.iter_batches(batch_format="pyarrow") if b.num_rows]
            or [pa.table({"image_id": pa.array([], pa.string())})]
        ).column("image_id").combine_chunks()
        if key is not None:
            if len(_CURATED_IDS_MEMO) > 8:
                _CURATED_IDS_MEMO.clear()
            _CURATED_IDS_MEMO[key] = ids
    keep_ref = ray.put(ids)
    src = _images_source(images_path, columns)
    return src.map_batches(
        make_broadcast_semijoin_fn("image_id", keep_ref), batch_format="pyarrow"
    )


def export_image_shards(
    images_path: "str | Path",
    out_dir: "str | Path",
    *,
    n_shards: "int | None" = None,
    **curate_kwargs,
) -> pa.Table:
    """Resumable sharded export of the CURATED image-text corpus — the
    image-tower twin of ``corpusstats.export_training_shards`` and the
    artifact a contrastive pre-training run reads: one parquet dir per
    image_id-hash shard carrying the full pair rows (image_id, bytes,
    w, h, fmt, caption, phash), atomic ``_DONE`` markers, crashed
    partials rewritten byte-identically (shard assignment and row order
    are pure functions of image_id).

    Payload discipline: curation's survivor ids broadcast once (string
    semi-join via ``pc.is_in`` — no shuffle); payload bytes move only
    through the per-shard sort, which is bounded to one shard's rows
    (1/n_shards of the corpus) — never a corpus-wide exchange.
    """
    import ray

    from ..functions.hashing import hash_string_array
    from .corpusstats import _resumable_shard_write

    if n_shards is None:
        # shard count follows cluster width (verdict r3 #4); explicit
        # n_shards pins the layout for cross-session resume
        n_shards = max(8, int(ray.cluster_resources().get("CPU", 8)))

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    kept = _curated_kept_rows(
        images_path,
        ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"],
        **curate_kwargs,
    )

    def add_shard(batch: pa.Table) -> pa.Table:
        h = hash_string_array(batch.column("image_id"))
        return batch.append_column(
            "shard",
            pa.array((h % np.uint64(n_shards)).astype(np.int64), pa.int64()),
        )

    kept = kept.map_batches(add_shard, batch_format="pyarrow").materialize()
    return _resumable_shard_write(kept, out_dir, n_shards, key="image_id")


# --------------------------------------------------- hard-negative mining


def _ray_remote_neg_task():
    """Lazy ``@ray.remote`` wrapper (vision.py imports ray.data only)."""
    import ray

    @ray.remote
    def neg_block_task(qa: pa.Table, tb: pa.Table, k: int) -> pa.Table:
        """LOCAL top-k hard negatives between one image-embedding block
        (queries) and one text-embedding block (candidates): GEMM, self
        pairs masked, per-query partial top-k. Sims round to 9 decimals
        BEFORE selection so ties (planted identical captions) break by
        candidate id identically under any BLAS blocking."""
        from .simsearch import emb_matrix

        if qa.num_rows == 0 or tb.num_rows == 0:
            return pa.table(
                {"qid": pa.array([], pa.int64()),
                 "cand": pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())}
            )
        qi = qa.column("vec_id").to_numpy()
        ci = tb.column("vec_id").to_numpy()
        A = emb_matrix(qa.column("img_emb"))
        B = emb_matrix(tb.column("txt_emb"))
        sims = np.round(A @ B.T, 9)
        sims[qi[:, None] == ci[None, :]] = -np.inf  # a row's OWN caption
        kk = min(k, sims.shape[1])
        # per query: top-kk by (sim desc, cand id asc)
        order = np.lexsort((np.broadcast_to(ci, sims.shape), -sims), axis=1)[:, :kk]
        rows = np.repeat(np.arange(len(qi)), kk)
        cols = order.ravel()
        keep = np.isfinite(sims[rows, cols])
        return pa.table(
            {
                "qid": pa.array(qi[rows[keep]], pa.int64()),
                "cand": pa.array(ci[cols[keep]], pa.int64()),
                "sim": pa.array(sims[rows[keep], cols[keep]], pa.float64()),
            }
        )

    return neg_block_task


def mine_hard_negatives(
    images_path: "str | Path | rd.Dataset",
    *,
    k: int = 5,
    n_blocks: int | None = None,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Hard-negative mining for contrastive (CLIP-style) training: for
    every image, the ``k`` captions of OTHER rows whose text-tower
    embedding is most cosine-similar to the image's image-tower
    embedding — the negatives an InfoNCE trainer wants in-batch.
    Output: (image_id, neg_image_id, rank, sim), rank 0 = hardest.

    Shape — distributed all-pairs top-k, the ``embedding_near_dup``
    block-pair pattern with a per-query k-prune instead of a threshold:
    one encoder pass materializes both towers; one Ray task per
    (image-block, text-block) pair emits LOCAL per-query top-k rows
    (each task holds 2/B of the corpus, k rows per query per block —
    thin); a coarse groupby(query) segment-sort keeps the global top-k.
    Nothing broadcasts, payload bytes never leave the encoder.
    """
    import ray

    from ..functions.hashing import splitmix64

    if n_blocks is None:
        n_blocks = max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)
    if num_partitions is None:
        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)
    enc = pair_embeddings(images_path)

    def ok_rows(batch: pa.Table) -> pa.Table:
        good = batch.filter(pc.is_null(batch.column("encode_error")))
        return pa.table(
            {
                "vec_id": _image_id_to_int(good.column("image_id")),
                "img_emb": good.column("img_emb"),
                "txt_emb": good.column("txt_emb"),
            }
        )

    vecs = (
        enc.map_batches(ok_rows, batch_format="pyarrow")
        .repartition(n_blocks)
        .materialize()
    )
    refs = vecs.to_arrow_refs()
    task = _ray_remote_neg_task()
    parts = [
        task.remote(refs[i], refs[j], k)
        for i in range(len(refs))
        for j in range(len(refs))
    ]
    local = rd.from_arrow_refs(parts)

    coarse = num_partitions * 4

    def add_part(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {"part": pa.array([], pa.int32()),
                 "qid": pa.array([], pa.int64()),
                 "cand": pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())}
            )
        q = batch.column("qid").to_numpy()
        part = (splitmix64(q.view(np.uint64)) % np.uint64(coarse)).astype(np.int32)
        return pa.table(
            {"part": pa.array(part), "qid": batch.column("qid"),
             "cand": batch.column("cand"), "sim": batch.column("sim")}
        )

    def topk(group: pa.Table) -> pa.Table:
        # vectorized per coarse part: sort (qid, sim desc, cand asc),
        # keep each qid segment's first k
        q = group.column("qid").to_numpy()
        c = group.column("cand").to_numpy()
        s = group.column("sim").to_numpy()
        order = np.lexsort((c, -s, q))
        qs, cs, ss = q[order], c[order], s[order]
        first = np.r_[True, qs[1:] != qs[:-1]]
        seg = np.cumsum(first) - 1
        starts = np.nonzero(first)[0]
        rank = np.arange(len(qs)) - starts[seg]
        keep = rank < k
        return pa.table(
            {
                "image_id": pa.array(_int_to_image_id(qs[keep])),
                "neg_image_id": pa.array(_int_to_image_id(cs[keep])),
                "rank": pa.array(rank[keep], pa.int64()),
                "sim": pa.array(ss[keep], pa.float64()),
            }
        )

    return (
        local.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(topk, batch_format="pyarrow")
    )


class ImageAugmenter:
    """Actor-pool augmentation stage: decode -> deterministic
    flip / random-crop / nearest-neighbor resize -> lossless re-encode.
    The standard vision-training preprocessing pass (random resized
    crop + horizontal flip), built REAL on the sandbox codecs — no
    stub: every transform is numpy indexing over the decoded pixels.

    Determinism contract (tested): the transform chain for a row is a
    pure function of (image_id, seed) — ``splitmix64(id ^ seed)`` draws
    the flip bit and the crop offsets — so re-running the stage on any
    actor, at any partitioning, produces byte-identical output; a
    killed-and-resumed job augments identically (the crawl checkpoint
    invariant, applied to preprocessing).

    ``__init__`` is the setup slot (once per actor); ``__call__`` does
    per-batch work. Output ships (image_id, bytes, fmt, w, h, flipped,
    crop_x, crop_y, aug_error) — error-as-record like every decode
    stage here."""

    def __init__(
        self,
        *,
        seed: int = 0,
        out_w: int = 64,
        out_h: int = 64,
        crop_frac: float = 0.875,
    ):
        self.seed = np.uint64((seed * 0x9E3779B97F4A7C15 + 1) % (1 << 64))
        self.out_w = out_w
        self.out_h = out_h
        self.crop_frac = crop_frac
        # output-grid index maps depend only on (crop_h, crop_w); memoize
        self._grid: dict = {}

    def _resize_idx(self, ch: int, cw: int):
        key = (ch, cw)
        g = self._grid.get(key)
        if g is None:
            iy = (np.arange(self.out_h, dtype=np.int64) * ch) // self.out_h
            ix = (np.arange(self.out_w, dtype=np.int64) * cw) // self.out_w
            g = self._grid[key] = (iy, ix)
        return g

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.hashing import splitmix64
        from ..stages import pin_worker_threads
        from .. import codecs

        pin_worker_threads()
        n = batch.num_rows
        ids = _image_id_to_int(batch.column("image_id")).to_numpy()
        draws = splitmix64(ids.astype(np.uint64) ^ self.seed)
        raw = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        out_bytes: list = [None] * n
        flipped = ((draws >> np.uint64(0)) & np.uint64(1)).astype(bool)
        crop_x = np.zeros(n, np.int64)
        crop_y = np.zeros(n, np.int64)
        errs: list = [None] * n
        for i in range(n):
            try:
                img = decode_any(raw[i], fmts[i])
                h, w = img.shape[0], img.shape[1]
                ch = max(1, int(h * self.crop_frac))
                cw = max(1, int(w * self.crop_frac))
                # independent offset draws from disjoint hash bits
                cy = int((int(draws[i]) >> 1) % (h - ch + 1))
                cx = int((int(draws[i]) >> 32) % (w - cw + 1))
                crop_y[i], crop_x[i] = cy, cx
                win = img[cy : cy + ch, cx : cx + cw]
                if flipped[i]:
                    win = win[:, ::-1]
                iy, ix = self._resize_idx(ch, cw)
                out = win[iy][:, ix]
                out_bytes[i] = codecs.encode_ppm(np.ascontiguousarray(out))
            except Exception as e:  # noqa: BLE001 — error-as-record
                errs[i] = str(e)
        return pa.table(
            {
                "image_id": batch.column("image_id"),
                "bytes": pa.array(out_bytes, pa.binary()),
                "fmt": pa.array(["ppm"] * n, pa.string()),
                "w": pa.array(np.full(n, self.out_w, np.int64), pa.int32()),
                "h": pa.array(np.full(n, self.out_h, np.int64), pa.int32()),
                "flipped": pa.array(flipped),
                "crop_x": pa.array(crop_x, pa.int64()),
                "crop_y": pa.array(crop_y, pa.int64()),
                "aug_error": pa.array(errs, pa.string()),
            }
        )


def augment_images(
    images_path: "str | Path | rd.Dataset",
    *,
    seed: int = 0,
    out_w: int = 64,
    out_h: int = 64,
    crop_frac: float = 0.875,
    concurrency: "int | tuple | None" = None,
    batch_size: int = 64,
) -> rd.Dataset:
    """Deterministic random-resized-crop + flip over an image table —
    the preprocessing stage between curation and training shards. The
    payload never shuffles: augmentation is a pure per-batch map, so
    the output streams straight into ``export_image_shards`` or a
    ``write_parquet`` without any exchange."""
    ds = _images_source(images_path, ["image_id", "bytes", "fmt"])
    return ds.map_batches(
        ImageAugmenter,
        fn_constructor_kwargs={
            "seed": seed, "out_w": out_w, "out_h": out_h,
            "crop_frac": crop_frac,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=_pool_width(concurrency),
    )


def export_webdataset_shards(
    images_path: "str | Path",
    out_dir: "str | Path",
    *,
    n_shards: "int | None" = None,
    **curate_kwargs,
) -> pa.Table:
    """Resumable WebDataset-style tar export of the curated image-text
    corpus — the loader format image pre-training actually consumes
    (one ``shard-NNNNN.tar`` per id-hash shard; members
    ``{image_id}.{fmt}`` = payload bytes and ``{image_id}.txt`` =
    caption, in sorted id order). Complements ``export_image_shards``'
    parquet dirs: parquet for engines, tars for dataloaders.

    Determinism + resume: tar member metadata is pinned (mtime 0,
    uid/gid 0, mode 0644, USTAR), member order is the sorted id order,
    so a rewritten shard is byte-identical; each shard streams to
    ``.tmp`` and ``os.replace``s into place — the final tar's existence
    IS the done marker, a crash leaves only a ``.tmp`` the rerun
    overwrites. Payload bytes move only through the per-shard group
    (1/n_shards of the corpus), never a corpus-wide exchange.

    Returns the (shard, n_rows, n_bytes, skipped) manifest; skipped
    shards report ``n_rows`` NULL (the export does not reopen finished
    tars to recount members)."""
    import ray

    from ..functions.hashing import hash_string_array

    if n_shards is None:
        # default shard count follows cluster width so the per-shard tar
        # writes saturate the CPUs (verdict r3 #4); callers needing a
        # stable layout (resume across differently-sized sessions, the
        # byte-identity tests) pass it explicitly
        n_shards = max(8, int(ray.cluster_resources().get("CPU", 8)))

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    # Layout marker (ADVICE r4): resume on a differently-sized cluster
    # would otherwise silently mix two `hash(id) % n_shards` layouts —
    # finished tars skipped under the new assignment, rows dup/missing.
    import json as _json

    layout_path = out_dir / "_SHARD_LAYOUT.json"
    if layout_path.exists():
        recorded = _json.loads(layout_path.read_text()).get("n_shards")
        if recorded != n_shards:
            raise ValueError(
                f"resume layout mismatch: {out_dir} was written with "
                f"n_shards={recorded} but this run uses n_shards={n_shards}; "
                "pass n_shards explicitly (or delete the output dir)"
            )
    else:
        layout_path.write_text(_json.dumps({"n_shards": n_shards}))

    # resume scan FIRST: a fully-finished export must cost n_shards
    # stat calls, not a curation pass (review r3c)
    pending = []
    manifest: dict[int, tuple[int | None, int, bool]] = {}
    for s in range(n_shards):
        tar_path = out_dir / f"shard-{s:05d}.tar"
        if tar_path.exists():
            manifest[s] = (None, int(tar_path.stat().st_size), True)
        else:
            pending.append(s)

    if pending:
        kept = _curated_kept_rows(
            images_path, ["image_id", "bytes", "fmt", "caption"],
            **curate_kwargs,
        )
        pend_set = pa.array(pending, pa.int64())

        def add_shard(batch: pa.Table) -> pa.Table:
            h = hash_string_array(batch.column("image_id"))
            sh = pa.array((h % np.uint64(n_shards)).astype(np.int64), pa.int64())
            out = batch.append_column("shard", sh)
            return out.filter(pc.is_in(out.column("shard"), value_set=pend_set))

        out_str = str(out_dir)

        def write_tar(group: pa.Table) -> pa.Table:
            import io
            import os
            import tarfile

            s = int(group.column("shard")[0].as_py())
            order = pc.sort_indices(group.column("image_id"))
            g = group.take(order)
            buf = io.BytesIO()
            with tarfile.open(
                fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
            ) as tf:
                for iid, raw, fmt, cap in zip(
                    g.column("image_id").to_pylist(),
                    g.column("bytes").to_pylist(),
                    g.column("fmt").to_pylist(),
                    g.column("caption").to_pylist(),
                ):
                    for name, payload in (
                        (f"{iid}.{fmt}", raw),
                        (f"{iid}.txt", (cap or "").encode()),
                    ):
                        info = tarfile.TarInfo(name)
                        info.size = len(payload)
                        info.mtime = 0
                        info.uid = info.gid = 0
                        info.mode = 0o644
                        tf.addfile(info, io.BytesIO(payload))
            data = buf.getvalue()
            tmp = os.path.join(out_str, f"shard-{s:05d}.tar.tmp")
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, os.path.join(out_str, f"shard-{s:05d}.tar"))
            return pa.table(
                {"shard": pa.array([s], pa.int64()),
                 "n_rows": pa.array([group.num_rows], pa.int64()),
                 "n_bytes": pa.array([len(data)], pa.int64())}
            )

        written = (
            kept.map_batches(add_shard, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(write_tar, batch_format="pyarrow")
        )
        for b in written.iter_batches(batch_format="pyarrow"):
            if b.num_columns and b.num_rows:
                for r in b.to_pylist():
                    manifest[r["shard"]] = (r["n_rows"], r["n_bytes"], False)
        # pending shards that received zero rows still need an (empty,
        # deterministic) tar so resume state is complete — written via
        # the same tmp + os.replace atomicity as streamed shards
        import io as _io
        import os as _os
        import tarfile as _tarfile

        for s in pending:
            if s not in manifest:
                buf = _io.BytesIO()
                _tarfile.open(fileobj=buf, mode="w", format=_tarfile.USTAR_FORMAT).close()
                tmp = out_dir / f"shard-{s:05d}.tar.tmp"
                tmp.write_bytes(buf.getvalue())
                _os.replace(tmp, out_dir / f"shard-{s:05d}.tar")
                manifest[s] = (0, len(buf.getvalue()), False)

    shards = sorted(manifest)
    return pa.table(
        {
            "shard": pa.array(shards, pa.int64()),
            "n_rows": pa.array([manifest[s][0] for s in shards], pa.int64()),
            "n_bytes": pa.array([manifest[s][1] for s in shards], pa.int64()),
            "skipped": pa.array([manifest[s][2] for s in shards], pa.bool_()),
        }
    )


def mixup_images(
    images_path: "str | Path | rd.Dataset",
    *,
    seed: int = 0,
    out_w: int = 64,
    out_h: int = 64,
    lam_lo: float = 0.3,
    lam_hi: float = 0.7,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Deterministic MixUp (Zhang et al. 2018) over the augmented
    corpus: each sample blends with a partner image, pixels
    ``lam * x_i + (1 - lam) * x_partner`` — the regularization pass a
    vision-training loader applies after augmentation.

    MixUp is the one preprocessing stage that genuinely needs PAYLOAD
    CO-LOCATION (two images must meet in one task), so unlike the pure
    per-row augment map it pays exactly one payload exchange: rows
    hash into ~4-per-CPU Knuth buckets, and inside each bucket the
    sorted-id RING picks partners (i mixes with i+1, last wraps to
    first) — partner choice and the per-row lambda
    (``splitmix64(id ^ seed)`` scaled into [lam_lo, lam_hi]) are pure
    functions of (ids-in-bucket, seed), so any partitioning and any
    rerun produce byte-identical output. Buckets bound the exchange:
    each task holds ~1/B of the payload, never the corpus.

    Input rows must share one (w, h) — feed it ``augment_images``
    output (fixed out_w x out_h, lossless ppm). Output: (image_id,
    partner_id, lam round-6, bytes ppm, fmt, w, h, mix_error)."""
    import ray

    from ..functions.hashing import splitmix64
    from .. import codecs

    B = (
        max(8, int(ray.cluster_resources().get("CPU", 4)) * 4)
        if num_buckets is None
        else num_buckets
    )
    aug = augment_images(images_path, seed=seed, out_w=out_w, out_h=out_h)

    def tag(batch: pa.Table) -> pa.Table:
        ok = pc.is_null(batch.column("aug_error"))
        batch = batch.filter(ok).select(["image_id", "bytes"])
        ids = _image_id_to_int(batch.column("image_id")).to_numpy()
        h = splitmix64(ids.astype(np.uint64) ^ np.uint64(seed * 2 + 1))
        return batch.append_column(
            "part", pa.array((h % np.uint64(B)).astype(np.int64), pa.int64())
        )

    def mix(group: pa.Table) -> pa.Table:
        from ..stages import pin_worker_threads

        pin_worker_threads()
        ids_str = group.column("image_id")
        ids = _image_id_to_int(ids_str).to_numpy()
        order = np.argsort(ids)
        g = group.take(pa.array(order))
        ids = ids[order]
        n = len(ids)
        raw = g.column("bytes").to_pylist()
        imgs = [codecs.decode_ppm(b).astype(np.float64) for b in raw]
        draws = splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))
        # divide by a FLOAT 2^64: a huge Python-int divisor flips numpy
        # into object dtype. Round to the EMITTED precision before
        # blending — the lam column must reproduce its own bytes
        # (review r3c: blending with unrounded lam left ~0.4% of rows
        # unreproducible from the emitted columns)
        lam = np.round(
            lam_lo + (draws.astype(np.float64) / 2.0**64) * (lam_hi - lam_lo), 6
        )
        out_bytes: list = [None] * n
        errs: list = [None] * n
        for i in range(n):
            j = (i + 1) % n
            try:
                mixed = lam[i] * imgs[i] + (1.0 - lam[i]) * imgs[j]
                out_bytes[i] = codecs.encode_ppm(
                    np.clip(np.round(mixed), 0, 255).astype(np.uint8)
                )
            except Exception as e:  # noqa: BLE001 — error-as-record
                errs[i] = str(e)
        partner = np.roll(ids, -1)
        return pa.table(
            {
                "image_id": ids_str.take(pa.array(order)),
                "partner_id": pa.array(_int_to_image_id(partner), pa.string()),
                "lam": pa.array(lam, pa.float64()),
                "bytes": pa.array(out_bytes, pa.binary()),
                "fmt": pa.array(["ppm"] * n, pa.string()),
                "w": pa.array(np.full(n, out_w, np.int64), pa.int32()),
                "h": pa.array(np.full(n, out_h, np.int64), pa.int32()),
                "mix_error": pa.array(errs, pa.string()),
            }
        )

    return (
        aug.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(mix, batch_format="pyarrow")
    )


def read_webdataset_shards(shards_dir: "str | Path") -> rd.Dataset:
    """Read a WebDataset-style shard directory back into (image_id,
    bytes, fmt, caption) rows — the loader half of
    ``export_webdataset_shards`` (write for trainers, read for
    everything that audits what trainers will see).

    One flat_map task per tar: shards parallelize across the cluster,
    members stream inside their shard (tar has no random access — the
    shard IS the parallelism unit, which is why the export bounds shard
    size). Pairing is by member stem: ``{id}.{fmt}`` carries payload,
    ``{id}.txt`` the caption; a payload member with no caption (or vice
    versa) raises — a torn shard must fail loudly, not feed a trainer
    half-pairs."""
    from pathlib import Path as _P

    paths = sorted(str(p) for p in _P(shards_dir).glob("shard-*.tar"))
    src = rd.from_items([{"path": p} for p in paths])

    def read_tar(row: dict) -> list[dict]:
        import tarfile

        pay: dict[str, tuple[bytes, str]] = {}
        cap: dict[str, str] = {}
        # stream members in ONE sequential pass (iterating the open
        # tarfile yields members as the read head reaches them);
        # getmembers() would scan the whole archive first and then
        # seek back per member — twice the I/O (verdict r3 #4)
        with tarfile.open(row["path"], mode="r|") as tf:
            for mem in tf:
                stem, ext = mem.name.rsplit(".", 1)
                data = tf.extractfile(mem).read()
                if ext == "txt":
                    cap[stem] = data.decode()
                else:
                    pay[stem] = (data, ext)
        if set(pay) != set(cap):
            raise ValueError(
                f"torn webdataset shard {row['path']}: "
                f"{len(pay)} payloads vs {len(cap)} captions"
            )
        return [
            {"image_id": k, "bytes": pay[k][0], "fmt": pay[k][1],
             "caption": cap[k]}
            for k in sorted(pay)
        ]

    return src.flat_map(read_tar)
