"""Multimodal column operators: image decode / features / resize stages.

Treats image payloads as opaque ``binary`` columns with typed metadata
(``w, h, fmt`` — exactly BASELINE.json input_hint). The Ray-side plumbing
(schema, actor signature, batch sizing, output layout) is real and tested;
codecs for formats this sandbox cannot decode (jpeg/webp/video) are
STUBBED behind clearly-marked ``NotImplementedError`` gates, while
ppm/png/qnt decode, block-mean resize, color stats and phash are real
numpy work.

Actor-pool shape: feature extraction is a callable CLASS so a real model
(CLIP, OCR, ...) would load once per actor in ``__init__``; batch size is
small because rows are payload-heavy (see stages/fetch.py scale note).
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from .. import codecs
from ..stages import _pool_width

SANDBOX_FMTS = frozenset({"ppm", "png", "qnt"})


def decode_any(data: bytes, fmt: str) -> np.ndarray:
    if fmt in SANDBOX_FMTS:
        return codecs.decode(data, fmt)
    # STUB: external codecs (PIL/ffmpeg) are not installable in this
    # sandbox; a deployment wires them here.
    raise NotImplementedError(
        f"decode for fmt={fmt!r} requires an external codec (stubbed in sandbox)"
    )


def sample_video_frames(data: bytes, every_n: int = 30) -> list[np.ndarray]:
    """Every-nth-frame sampling: real for the sandbox ``rvid`` container
    (seek-decode, cost proportional to frames kept — see
    ``codecs.decode_rvid_frames``); mp4/webm need ffmpeg and stay behind
    the documented external-codec stub."""
    if data[:4] == codecs._RVID_MAGIC:
        n, _, _, _ = codecs.rvid_info(data)
        return list(codecs.decode_rvid_frames(data, np.arange(0, n, every_n)))
    # STUB: compressed-video sampling needs ffmpeg; a deployment wires
    # it here (the stage contract is identical either way).
    raise NotImplementedError("video frame sampling requires ffmpeg (stubbed in sandbox)")


def block_mean_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic block-mean downsample (any size -> out_h x out_w).

    Downsampled axes: pixel i maps to block (i*out)/in — contiguous runs,
    so the mean is a vectorized ``reduceat`` (no scatter atomics).
    Upsampled axes: nearest-neighbor gather."""

    def axis_reduce(arr: np.ndarray, n_in: int, n_out: int, axis: int):
        if n_in >= n_out:
            starts = (np.arange(n_out) * n_in + n_out - 1) // n_out
            return (
                np.add.reduceat(arr, starts, axis=axis),
                np.diff(np.append(starts, n_in)),
            )
        idx = (np.arange(n_out) * n_in) // n_out
        return np.take(arr, idx, axis=axis), np.ones(n_out, np.int64)

    h, w, _ = img.shape
    rows, ny = axis_reduce(img.astype(np.float64), h, out_h, 0)
    acc, nx = axis_reduce(rows, w, out_w, 1)
    cnt = np.outer(ny, nx)
    return (acc / cnt[:, :, None]).round().astype(np.uint8)


class ImageFeatures:
    """Actor-pool stage: decode -> color stats + phash + 16x16 thumbnail.

    ``__init__`` is the model-load slot (once per actor); ``__call__``
    does per-batch numpy work. Output keeps the input's identity columns
    and appends fixed-width features plus a small lossless thumbnail.
    """

    def __init__(self, thumb: int = 16):
        self.thumb = thumb

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages import pin_worker_threads

        pin_worker_threads()  # runs in the worker (init may run on driver)
        n = batch.num_rows
        means = np.zeros((n, 3), dtype=np.float64)
        stds = np.zeros(n, dtype=np.float64)
        phashes = np.zeros(n, dtype=np.int64)
        thumbs: list = [None] * n
        errs: list = [None] * n
        raw = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        for i in range(n):
            try:
                img = decode_any(raw[i], fmts[i])
                means[i] = img.reshape(-1, 3).mean(axis=0)
                stds[i] = float(img.std())
                phashes[i] = codecs.phash64(img)
                thumbs[i] = codecs.encode_ppm(
                    block_mean_resize(img, self.thumb, self.thumb)
                )
            except Exception as e:  # noqa: BLE001 — error-as-record
                errs[i] = str(e)
        out = batch.select(["image_id", "w", "h", "fmt", "phash"])
        out = out.append_column("mean_r", pa.array(np.round(means[:, 0], 3)))
        out = out.append_column("mean_g", pa.array(np.round(means[:, 1], 3)))
        out = out.append_column("mean_b", pa.array(np.round(means[:, 2], 3)))
        out = out.append_column("pixel_std", pa.array(np.round(stds, 3)))
        out = out.append_column("phash_decoded", pa.array(phashes, pa.int64()))
        out = out.append_column("thumbnail", pa.array(thumbs, pa.binary()))
        out = out.append_column("feature_error", pa.array(errs, pa.string()))
        return out


def image_features(
    images_path: "str | Path | rd.Dataset", *, concurrency: "int | tuple | None" = None, batch_size: int = 64
) -> rd.Dataset:
    """Feature-extraction pipeline over an image table (parquet/lance dir
    or file, or an already-built Dataset of the same schema — e.g. the
    crawl's stored wave output). Small batch_size: payload-heavy rows
    (see module docstring)."""
    ds = images_path if isinstance(images_path, rd.Dataset) else rd.read_parquet(str(images_path))
    return ds.map_batches(
        ImageFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=_pool_width(concurrency),
    )


def phash_near_dup_groups(images_path: str | Path) -> rd.Dataset:
    """Near-dup image groups by exact phash match (SURVEY D5 graft analog):
    shuffle ships only (phash, image_id); groups with >1 member are dups."""
    from ray.data.aggregate import Count

    ds = rd.read_parquet(str(images_path), columns=["image_id", "phash"])
    out = ds.groupby("phash").aggregate(Count(alias_name="n_images"))

    def only_dups(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.compute.greater(batch.column("n_images"), 1))

    return out.map_batches(only_dups, batch_format="pyarrow")


def synth_phash_table(path: str | Path, n: int = 2000, seed: int = 5) -> Path:
    """Deterministic (image_id, phash) table for the hamming-radius
    demos: uniform splitmix phashes (a real pHash over natural images is
    near-uniform; the crawl fixture's gradient images are NOT — their
    124 distinct low-entropy hashes make every radius degenerate) with
    planted near-dups: row i+n/2 copies row i's hash with (i/50 mod 4)
    bits flipped for i % 50 == 0 — pairs at hamming 0..3 plus two
    planted all-zero rows (the star bucket). Pure function of (n, seed);
    cached by existence."""
    from ..functions.hashing import splitmix64

    path = Path(path)
    if path.exists():
        return path
    path.parent.mkdir(parents=True, exist_ok=True)
    half = n // 2
    base = splitmix64(
        (np.arange(n, dtype=np.uint64) + np.uint64(seed)) * np.uint64(0x9E3779B97F4A7C15)
    )
    for i in range(0, half, 50):
        flips = (i // 50) % 4
        h = base[i]
        for b in range(flips):
            h ^= np.uint64(1) << np.uint64((i * 7 + b * 13) % 64)
        base[half + i] = h
    base[3] = np.uint64(0)
    base[7] = np.uint64(0)
    pq_mod = __import__("pyarrow.parquet", fromlist=["write_table"])
    pq_mod.write_table(
        pa.table(
            {
                "image_id": pa.array([f"img-{i:08d}" for i in range(n)]),
                "phash": pa.array(base.view(np.int64), pa.int64()),
            }
        ),
        str(path),
    )
    return path


def _iid_phash_batch(batch: pa.Table) -> pa.Table:
    """(image_id, phash) -> (iid, phash): the shared int-id projection
    every pHash-family operator feeds into pair mining — one definition
    so the operators cannot disagree on id encoding."""
    from ..pipelines.vision import _image_id_to_int

    return pa.table(
        {
            "iid": _image_id_to_int(batch.column("image_id")),
            "phash": batch.column("phash"),
        }
    )


def phash_radius_near_dup(
    images_path: str | Path, *, max_hamming: int = 3
) -> rd.Dataset:
    """Hamming-radius perceptual-hash image near-dup pairs — the classic
    pHash detector (re-encoded/resized copies land within a few bits of
    the original, not at the exact hash ``phash_near_dup_groups``
    requires): the shared 4-band pigeonhole kernel
    (``dedup.hamming_near_dup_pairs``) over the phash column. Reads only
    (image_id, phash); payload bytes never move. Output:
    (image_id_a, image_id_b, hamming)."""
    from ..pipelines.vision import _image_id_to_int, _int_to_image_id
    from .dedup import hamming_near_dup_pairs

    ds = rd.read_parquet(str(images_path), columns=["image_id", "phash"])

    pairs = hamming_near_dup_pairs(
        ds.map_batches(_iid_phash_batch, batch_format="pyarrow"),
        max_hamming=max_hamming, id_col="iid", hash_col="phash",
    )

    def back(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {"image_id_a": pa.array([], pa.string()),
                 "image_id_b": pa.array([], pa.string()),
                 "hamming": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "image_id_a": pa.array(
                    _int_to_image_id(batch.column("id_a").to_numpy()), pa.string()
                ),
                "image_id_b": pa.array(
                    _int_to_image_id(batch.column("id_b").to_numpy()), pa.string()
                ),
                "hamming": batch.column("hamming"),
            }
        )

    return pairs.map_batches(back, batch_format="pyarrow")


def phash_dedup_images(
    images_path: str | Path, *, max_hamming: int = 3
) -> rd.Dataset:
    """Corpus-level image dedup under the pHash hamming-radius relation
    with transitive closure: every cluster of images connected by
    hamming(phash) <= max_hamming keeps only its min image_id — the
    full survivor-set op on top of ``phash_radius_near_dup`` (pairs ->
    distributed connected components -> hash anti-join), mirroring
    ``dedup.jaccard_dedup_docs`` for the image tower. Reads only
    (image_id, phash); payload bytes never move."""
    from ..pipelines.vision import _image_id_to_int, _int_to_image_id
    from .dedup import hamming_near_dup_pairs
    from .graph import connected_components

    ds = rd.read_parquet(str(images_path), columns=["image_id", "phash"])

    ints = ds.map_batches(_iid_phash_batch, batch_format="pyarrow")
    pairs = hamming_near_dup_pairs(
        ints, max_hamming=max_hamming, id_col="iid", hash_col="phash"
    )
    assign = connected_components(pairs)

    def non_roots(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table({"iid": pa.array([], pa.int64())})
        keep = pa.compute.not_equal(
            batch.column("node"), batch.column("component")
        )
        return pa.table({"iid": batch.filter(keep).column("node")})

    import ray

    nparts = max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)
    drop = assign.map_batches(non_roots, batch_format="pyarrow")
    drop = drop.repartition(nparts).materialize()
    ids = ints.map_batches(
        lambda b: pa.table({"iid": b.column("iid")}), batch_format="pyarrow"
    )
    if drop.count() > 0:
        ids = ids.repartition(nparts).join(
            drop, join_type="left_anti", num_partitions=nparts, on=("iid",)
        )

    def back(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table({"image_id": pa.array([], pa.string())})
        return pa.table(
            {"image_id": pa.array(
                _int_to_image_id(batch.column("iid").to_numpy()), pa.string()
            )}
        )

    return ids.map_batches(back, batch_format="pyarrow")


def bloom_dedup_images(
    images_path: str | Path, *, bits_per_key: int = 10
) -> rd.Dataset:
    """Incremental image-snapshot dedup (the image-tower analog of
    ``dedup.bloom_dedup_docs``): the already-ingested image corpus
    (hash(image_id) % 7 < 5) is compressed once into a Bloom filter over
    its perceptual hashes; the new snapshot (the rest) is filtered
    by broadcast membership — zero shuffle against the old corpus, and
    payload bytes never move (only (image_id, phash) columns are read).
    Survivors are first-wins per phash within the snapshot. No false
    negatives (every image whose phash exists in the old corpus is
    dropped); ~1% of fresh images drop as false positives at 10
    bits/key."""
    from ray.data.aggregate import Min

    from ..functions.hashing import hash_string_array
    from .dedup import _bloom_size, bloom_contains, build_bloom

    ds = rd.read_parquet(str(images_path), columns=["image_id", "phash"])

    def side(new: bool):
        def f(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            h = hash_string_array(batch.column("image_id").combine_chunks())
            keep = ((h % np.uint64(7)) >= 5) == new
            return batch.filter(pa.array(keep))

        return f

    old = ds.map_batches(side(False), batch_format="pyarrow")
    new = ds.map_batches(side(True), batch_format="pyarrow")
    m = _bloom_size(old.count(), bits_per_key)
    bits_ref = ray.put(build_bloom(old, m=m, key_col="phash"))

    def fresh(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {"phash": pa.array([], pa.int64()),
                 "image_id": pa.array([], pa.string())}
            )
        h = batch.column("phash").to_numpy().astype(np.int64)
        keep = ~bloom_contains(ray.get(bits_ref), h, m)
        return batch.filter(pa.array(keep)).select(["phash", "image_id"])

    survivors = new.map_batches(fresh, batch_format="pyarrow")
    out = survivors.groupby("phash").aggregate(Min("image_id", alias_name="image_id"))
    return out.select_columns(["image_id"])


def synth_phash_wh_table(
    path: str | Path, n: int = 2000, seed: int = 5
) -> Path:
    """``synth_phash_table`` plus deterministic (w, h) dims — the demo
    input for the keep-best policy (winner needs resolution metadata).
    Dims are splitmix-derived in [64, 1088) x [64, 576); pure function
    of (n, seed), cached by existence (new filename, not a schema
    change to the cached dims-less table)."""
    from ..functions.hashing import splitmix64

    path = Path(path)
    if path.exists():
        return path
    base_tab = __import__("pyarrow.parquet", fromlist=["read_table"]).read_table(
        str(synth_phash_table(path.with_name(f"phash_radius_{n}.parquet"), n, seed))
    )
    r = splitmix64(np.arange(n, dtype=np.uint64) + np.uint64(seed * 7919))
    w = (64 + (r % np.uint64(1024))).astype(np.int32)
    h = (64 + ((r >> np.uint64(32)) % np.uint64(512))).astype(np.int32)
    out = base_tab.append_column("w", pa.array(w, pa.int32())).append_column(
        "h", pa.array(h, pa.int32())
    )
    __import__("pyarrow.parquet", fromlist=["write_table"]).write_table(
        out, str(path)
    )
    return path


def phash_dedup_keep_best(
    images: str | Path | rd.Dataset, *, max_hamming: int = 3
) -> rd.Dataset:
    """pHash-cluster dedup with the KEEP-BEST policy: every cluster of
    images connected by hamming(phash) <= max_hamming keeps its
    highest-resolution member (max w*h, ties -> min image_id) instead
    of ``phash_dedup_images``'s arbitrary min-id — the policy real
    image-curation pipelines want, since near-dup crawl copies are
    usually the same picture at different resolutions and the training
    set should keep the best copy (LAION-style dedup keeps one
    representative per cluster; resolution is the standard pick).

    Same distributed skeleton as ``phash_dedup_images`` (4-band
    pigeonhole pairs -> connected components -> survivor selection);
    winner selection is two grouped aggregates + a hash join on thin
    (iid, component, pixels) rows — grouped Max(pixels) per cluster,
    semi-match on the max, grouped Min(iid) as the tie-break. Payload
    bytes never move; only ids/hashes/two int32s shuffle."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min

    from ..pipelines.vision import _image_id_to_int, _int_to_image_id
    from .dedup import hamming_near_dup_pairs
    from .graph import connected_components

    if isinstance(images, (str, Path)):
        ds = rd.read_parquet(str(images), columns=["image_id", "phash", "w", "h"])
    else:
        ds = images

    def to_int(batch: pa.Table) -> pa.Table:
        px = (
            batch.column("w").to_numpy().astype(np.int64)
            * batch.column("h").to_numpy().astype(np.int64)
        )
        return pa.table(
            {
                "iid": _image_id_to_int(batch.column("image_id")),
                "phash": batch.column("phash"),
                "pixels": pa.array(px, pa.int64()),
            }
        )

    ints = ds.map_batches(to_int, batch_format="pyarrow").materialize()
    nparts = max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)

    hashed = ints.map_batches(
        lambda b: pa.table({"iid": b.column("iid"), "phash": b.column("phash")}),
        batch_format="pyarrow",
    )
    pairs = hamming_near_dup_pairs(
        hashed, max_hamming=max_hamming, id_col="iid", hash_col="phash"
    )
    assign = connected_components(pairs).repartition(nparts).materialize()

    # meta/ids/nodes are plain maps of healthy (materialized) blocks —
    # never 0-column — so they need no join-quirk repartition
    meta = ints.map_batches(
        lambda b: pa.table({"iid": b.column("iid"), "pixels": b.column("pixels")}),
        batch_format="pyarrow",
    )

    ids = ints.map_batches(
        lambda b: pa.table({"iid": b.column("iid")}), batch_format="pyarrow"
    )

    def back(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table({"image_id": pa.array([], pa.string())})
        return pa.table(
            {"image_id": pa.array(
                _int_to_image_id(batch.column("iid").to_numpy()), pa.string()
            )}
        )

    if assign.count() == 0:  # no near-dup pairs at all: everything stays
        return ids.map_batches(back, batch_format="pyarrow")

    nodes = assign.map_batches(
        lambda b: pa.table({"iid": b.column("node")}) if b.num_columns else
        pa.table({"iid": pa.array([], pa.int64())}),
        batch_format="pyarrow",
    )
    members = assign.rename_columns({"node": "iid"}).join(
        meta, join_type="inner", num_partitions=nparts, on=("iid",)
    ).repartition(nparts)
    maxp = (
        members.groupby("component")
        .aggregate(Max("pixels", alias_name="max_px"))
        .repartition(nparts)
    )
    cand = members.join(
        maxp, join_type="inner", num_partitions=nparts, on=("component",)
    )

    def at_max(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {"component": pa.array([], pa.int64()), "iid": pa.array([], pa.int64())}
            )
        keep = pc.equal(batch.column("pixels"), batch.column("max_px"))
        batch = batch.filter(keep)
        return pa.table(
            {"component": batch.column("component"), "iid": batch.column("iid")}
        )

    winners = (
        cand.map_batches(at_max, batch_format="pyarrow")
        .groupby("component")
        .aggregate(Min("iid", alias_name="iid"))
        .select_columns(["iid"])
    )
    singletons = ids.join(
        nodes, join_type="left_anti", num_partitions=nparts, on=("iid",)
    )
    return singletons.union(winners.repartition(nparts)).map_batches(
        back, batch_format="pyarrow"
    )


def leakage_safe_split_images(
    images_path: str | Path,
    *,
    max_hamming: int = 3,
    frac_val: float = 0.1,
    frac_test: float = 0.1,
    nparts: int | None = None,
) -> rd.Dataset:
    """Leakage-safe train/val/test split: assign every pHash near-dup
    CLUSTER (transitive closure at ``max_hamming``) to one split, so a
    near-duplicate of a training image can never leak into val/test —
    the contamination a row-wise hash split silently allows and a core
    training-data-hygiene op (the doc-side ``train_val_test_split``
    splits rows; this splits equivalence classes).

    Shape: hamming pairs -> connected components -> LEFT OUTER join of
    all ids against the (node, component) assignment (images in no pair
    are their own singleton cluster), then one Knuth-hash map of the
    cluster id onto [0, 1) picks the split — cluster-deterministic, no
    RNG, retry-stable. Only (image_id, phash) columns ever move."""
    from ..pipelines.vision import _image_id_to_int, _int_to_image_id
    from .dedup import hamming_near_dup_pairs
    from .graph import connected_components

    ds = rd.read_parquet(str(images_path), columns=["image_id", "phash"])

    ints = ds.map_batches(_iid_phash_batch, batch_format="pyarrow")
    pairs = hamming_near_dup_pairs(
        ints, max_hamming=max_hamming, id_col="iid", hash_col="phash"
    )
    assign = connected_components(pairs)

    import ray

    if nparts is None:
        nparts = max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)

    def clean(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {"iid": pa.array([], pa.int64()),
                 "component": pa.array([], pa.int64())}
            )
        return pa.table(
            {"iid": batch.column("node"), "component": batch.column("component")}
        )

    assign = assign.map_batches(clean, batch_format="pyarrow").materialize()
    ids = ints.map_batches(
        lambda b: pa.table({"iid": b.column("iid")}), batch_format="pyarrow"
    ).repartition(nparts)
    if assign.count() > 0:
        joined = ids.join(
            assign.repartition(nparts),
            join_type="left_outer",
            num_partitions=nparts,
            on=("iid",),
        )
    else:
        # no near-dup pairs anywhere: every image is a singleton cluster
        # (the join's empty right side would lack the key column — the
        # phash_dedup_images guard, same reason)
        joined = ids.map_batches(
            lambda b: b.append_column(
                "component", pa.nulls(b.num_rows, pa.int64())
            ),
            batch_format="pyarrow",
        )

    lo_val = 1.0 - frac_val - frac_test
    lo_test = 1.0 - frac_test

    def pick(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {"image_id": pa.array([], pa.string()),
                 "split": pa.array([], pa.string())}
            )
        iid = batch.column("iid").to_numpy()
        # singleton clusters: no pair row -> null component -> own id
        comp = pc.coalesce(
            pc.cast(batch.column("component"), pa.int64()),
            batch.column("iid"),
        ).to_numpy()
        u = (
            (comp.astype(np.uint64) * np.uint64(2654435761))
            % np.uint64(4294967296)
        ).astype(np.float64) / 4294967296.0
        split = np.where(u < lo_val, "train", np.where(u < lo_test, "val", "test"))
        return pa.table(
            {
                "image_id": pa.array(
                    _int_to_image_id(iid), pa.string()
                ),
                "split": pa.array(split, pa.string()),
            }
        )

    return joined.map_batches(pick, batch_format="pyarrow")


def image_channel_stats(
    images_path: "str | Path | rd.Dataset", *, batch_size: int = 64
) -> pa.Table:
    """Corpus-wide per-channel pixel mean/std — the normalization
    constants (torchvision ``Normalize(mean, std)``) a training run
    computes ONCE over the curated corpus and bakes into every loader.

    Per-batch decode folds each image straight into nine doubles
    (per-channel sum, sum-of-squares, pixel count), so one (channel,
    s, s2, n) row per channel per block reaches the driver — payload
    bytes never leave the read stage and the driver holds a constant
    regardless of corpus size. Undecodable rows (stubbed external
    codecs) are skipped and counted. Population std over all pixels:
    sqrt(E[x^2] - E[x]^2).

    Returns a 3-row Arrow table (channel r/g/b, n_pixels, mean, std,
    n_failed) with round-6 floats; float-sum reordering across blocks
    keeps reruns equal to ~1e-12 relative, far under the rounding."""
    ds = (
        images_path
        if isinstance(images_path, rd.Dataset)
        else rd.read_parquet(str(images_path), columns=["bytes", "fmt"])
    )

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages import pin_worker_threads

        pin_worker_threads()
        s = np.zeros(3, np.float64)
        s2 = np.zeros(3, np.float64)
        n = 0
        failed = 0
        raw = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        for i in range(batch.num_rows):
            try:
                img = decode_any(raw[i], fmts[i]).reshape(-1, 3).astype(np.float64)
            except Exception:  # noqa: BLE001 — stubbed codec formats
                failed += 1
                continue
            s += img.sum(axis=0)
            s2 += (img * img).sum(axis=0)
            n += img.shape[0]
        return pa.table(
            {
                "c": pa.array([0, 1, 2], pa.int64()),
                "s": pa.array(s, pa.float64()),
                "s2": pa.array(s2, pa.float64()),
                "n": pa.array([n] * 3, pa.int64()),
                "failed": pa.array([failed] * 3, pa.int64()),
            }
        )

    s = np.zeros(3, np.float64)
    s2 = np.zeros(3, np.float64)
    n = 0
    failed = 0
    folded = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size
    )
    for b in folded.iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        c = b.column("c").to_numpy()
        np.add.at(s, c, b.column("s").to_numpy())
        np.add.at(s2, c, b.column("s2").to_numpy())
        n += int(b.column("n").to_numpy()[c == 0].sum())
        failed += int(b.column("failed").to_numpy()[c == 0].sum())
    if n == 0:
        mean = np.zeros(3)
        std = np.zeros(3)
    else:
        mean = s / n
        std = np.sqrt(np.maximum(s2 / n - mean * mean, 0.0))
    return pa.table(
        {
            "channel": pa.array(["r", "g", "b"], pa.string()),
            "n_pixels": pa.array([n] * 3, pa.int64()),
            "mean": pa.array(np.round(mean, 6), pa.float64()),
            "std": pa.array(np.round(std, 6), pa.float64()),
            "n_failed": pa.array([failed] * 3, pa.int64()),
        }
    )


class PayloadValidator:
    """Actor-pool stage: per-row payload fidelity vs ground truth — the
    acceptance invariant of this rebuild (decoded pixels allclose for
    lossless formats / PSNR >= 40 dB for lossy, caption byte-equality)
    run as a PIPELINE over the crawl output instead of a spot-check.

    Ground truth regenerates inside each actor as a pure function of
    (n_urls, seed) (``synth.SynthWorld`` — built once per actor in
    ``__init__``), so validation needs NO payload-payload join: the
    only exchange is the per-batch (fmt, partials) fold. A deployment
    swaps the world for its reference fetcher the same way."""

    def __init__(self, n_urls: int, seed: int):
        from ..stages import pin_worker_threads
        from ..synth import SynthWorld

        pin_worker_threads()
        self.world = SynthWorld(n_urls, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        raw = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        caps = batch.column("caption").to_pylist()
        stats: dict[str, list] = {}
        for k in range(batch.num_rows):
            i = int(ids[k].split("-")[1])
            expected = self.world.pixels(i)
            decoded = decode_any(raw[k], fmts[k])
            d = expected.astype(np.float64) - decoded.astype(np.float64)
            mse = float(np.mean(d * d))
            s = stats.setdefault(fmts[k], [0, 0, np.inf, 0])
            s[0] += 1
            if mse == 0.0:
                s[1] += 1  # bit-exact pixels
            else:
                s[2] = min(s[2], 10.0 * np.log10(255.0 * 255.0 / mse))
            if caps[k] != self.world.caption(i):
                s[3] += 1
        fmt_l = sorted(stats)
        return pa.table(
            {
                "fmt": pa.array(fmt_l, pa.string()),
                "n": pa.array([stats[f][0] for f in fmt_l], pa.int64()),
                "n_exact": pa.array([stats[f][1] for f in fmt_l], pa.int64()),
                "min_psnr": pa.array(
                    [stats[f][2] for f in fmt_l], pa.float64()
                ),
                "n_caption_bad": pa.array(
                    [stats[f][3] for f in fmt_l], pa.int64()
                ),
            }
        )


def validate_payload_fidelity(
    crawl_out_dir, n_urls: int, seed: int = 42,
    *, batch_size: int = 64, concurrency: "int | tuple | None" = None,
) -> pa.Table:
    """Corpus-wide fidelity report over the crawl's stored payload rows:
    one row per format — (fmt, n_rows, n_exact_pixel, min_psnr,
    n_caption_mismatch, pass_40db). ``min_psnr`` is the minimum over
    non-bit-exact rows (NULL when every row is exact); ``pass_40db``
    asserts the north-rule invariant (exact or >= 40 dB, captions
    equal) for the whole format class."""
    from pathlib import Path

    waves = str(Path(crawl_out_dir) / "waves")
    ds = rd.read_parquet(
        waves, columns=["image_id", "bytes", "fmt", "caption", "stored"]
    )

    def stored_only(batch: pa.Table) -> pa.Table:
        return batch.filter(batch.column("stored")).drop_columns(["stored"])

    folded = ds.map_batches(stored_only, batch_format="pyarrow").map_batches(
        PayloadValidator,
        fn_constructor_args=(n_urls, seed),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=_pool_width(concurrency),
    )
    acc: dict[str, list] = {}
    for b in folded.iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            s = acc.setdefault(r["fmt"], [0, 0, np.inf, 0])
            s[0] += r["n"]
            s[1] += r["n_exact"]
            s[2] = min(s[2], r["min_psnr"])
            s[3] += r["n_caption_bad"]
    fmt_l = sorted(acc)
    min_psnr = [None if np.isinf(acc[f][2]) else round(acc[f][2], 3) for f in fmt_l]
    return pa.table(
        {
            "fmt": pa.array(fmt_l, pa.string()),
            "n_rows": pa.array([acc[f][0] for f in fmt_l], pa.int64()),
            "n_exact_pixel": pa.array([acc[f][1] for f in fmt_l], pa.int64()),
            "min_psnr": pa.array(min_psnr, pa.float64()),
            "n_caption_mismatch": pa.array([acc[f][3] for f in fmt_l], pa.int64()),
            "pass_40db": pa.array(
                [
                    acc[f][3] == 0
                    and (np.isinf(acc[f][2]) or acc[f][2] >= 40.0)
                    for f in fmt_l
                ],
                pa.bool_(),
            ),
        }
    )


# ------------------------------------------------- image metadata scrub

# PNG chunk types a scrub must keep: everything else (tEXt/zTXt/iTXt/
# eXIf/tIME/...) is ancillary metadata a training-data release strips
# (LAION/Dolma scrub EXIF+GPS from released images).
_PNG_CRITICAL = frozenset({b"IHDR", b"PLTE", b"IDAT", b"IEND"})
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_meta_note(image_id: str) -> bytes:
    """Deterministic metadata payload — a pure function of image_id (the
    ``mask_pii_docs`` planting precedent on the image tower): camera tag
    + fake GPS, the fields a real EXIF scrub exists to remove."""
    n = sum(image_id.encode())
    return b"Comment\x00cam %s gps 10.%d.0.%d" % (
        image_id.encode(), n % 256, (n * 7) % 256
    )


def _plant_png(data: bytes, image_id: str) -> bytes:
    # IHDR is always 13 bytes -> first chunk ends at 8 + 4+4+13+4 = 33
    from ..codecs import _chunk

    return data[:33] + _chunk(b"tEXt", _png_meta_note(image_id)) + data[33:]


def _strip_png(data: bytes) -> tuple[bytes, int]:
    """Walk PNG chunks, keeping critical ones. Raises ValueError on a
    truncated/malformed chunk stream (caller flags the row instead of
    failing the whole map task — real crawled bytes are hostile)."""
    out = [data[:8]]
    idx, n_meta = 8, 0
    while idx < len(data):
        if idx + 12 > len(data):
            raise ValueError(f"truncated PNG chunk header at byte {idx}")
        (length,) = struct.unpack_from(">I", data, idx)
        tag = data[idx + 4 : idx + 8]
        end = idx + 12 + length
        if length > (1 << 31) or end > len(data):
            raise ValueError(
                f"PNG chunk {tag!r} at byte {idx} overruns payload "
                f"(len={length}, data={len(data)})"
            )
        if tag in _PNG_CRITICAL:
            out.append(data[idx:end])
        else:
            n_meta += 1
        idx = end
        if tag == b"IEND":
            break
    return b"".join(out), n_meta


def _plant_ppm(data: bytes, image_id: str) -> bytes:
    # encode_ppm emits "P6\n{w} {h}\n255\n"; a comment line directly
    # after the magic is legal PPM and decode_ppm already tolerates it
    n = sum(image_id.encode())
    note = b"# cam %s gps 10.%d.0.%d\n" % (
        image_id.encode(), n % 256, (n * 7) % 256
    )
    return data[:3] + note + data[3:]


def _strip_ppm(data: bytes) -> tuple[bytes, int]:
    # walk the 3 header tokens exactly like codecs.decode_ppm, recording
    # comment-line spans; removing those spans restores the canonical
    # comment-free header byte-for-byte
    spans: list[tuple[int, int]] = []
    idx, tokens = 2, 0
    while tokens < 3 and idx < len(data):
        while idx < len(data) and data[idx : idx + 1].isspace():
            idx += 1
        if data[idx : idx + 1] == b"#":
            end = data.index(b"\n", idx) + 1
            spans.append((idx, end))
            idx = end
            continue
        while idx < len(data) and not data[idx : idx + 1].isspace():
            idx += 1
        tokens += 1
    if not spans:
        return data, 0
    out, prev = [], 0
    for s, e in spans:
        out.append(data[prev:s])
        prev = e
    out.append(data[prev:])
    return b"".join(out), len(spans)


def plant_image_metadata(ds: rd.Dataset) -> rd.Dataset:
    """Attach deterministic camera/GPS metadata to every payload that has
    a metadata container (PNG ancillary chunk, PPM header comment; QNT
    has none by design). Pure function of image_id — reruns and retried
    partitions plant identically. The fixture corpus is metadata-free by
    construction, so this stage gives ``strip_image_metadata`` a real
    surface; a deployment deletes it and scrubs crawled bytes directly."""

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        out = []
        for i, f, b in zip(ids, fmts, blobs):
            if f == "png":
                out.append(_plant_png(b, i))
            elif f == "ppm":
                out.append(_plant_ppm(b, i))
            else:
                out.append(b)
        return batch.set_column(
            batch.schema.get_field_index("bytes"), "bytes",
            pa.array(out, pa.binary()),
        )

    return ds.map_batches(plant, batch_format="pyarrow", batch_size=64)


def strip_image_metadata(
    images_path: "str | Path | rd.Dataset", *, plant: bool = False
) -> rd.Dataset:
    """Strip ancillary metadata from image payloads in place — the image
    tower's twin of ``textstats.mask_pii_docs`` (a corpus release scrubs
    EXIF/GPS/camera tags; LAION ships images metadata-free). PNG: drop
    every non-critical chunk (tEXt/eXIf/tIME/...). PPM: drop header
    comment lines. QNT: no metadata container — identity.

    Pixels are untouched by construction (only non-pixel byte ranges are
    removed), and on the synthetic corpus the planted-then-stripped
    payload is BYTE-IDENTICAL to the original — the strongest oracle, no
    decode needed (tested). Shuffle-free single map; payload bytes never
    leave the stage. Output adds (n_meta, bytes_removed) per row.

    ``plant=True`` runs :func:`plant_image_metadata` first (the sandbox
    benchmark path; the fixture corpus is metadata-free by construction).
    """
    ds = (
        images_path
        if isinstance(images_path, rd.Dataset)
        else rd.read_parquet(str(images_path))
    )
    if plant:
        ds = plant_image_metadata(ds)

    def strip(batch: pa.Table) -> pa.Table:
        fmts = batch.column("fmt").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        clean, n_meta, removed, errs = [], [], [], []
        for f, b in zip(fmts, blobs):
            # malformed payloads (real crawled bytes) flag the row and
            # pass it through untouched — the audio feature_error pattern
            try:
                if f == "png" and b.startswith(_PNG_SIG):
                    c, n = _strip_png(b)
                elif f == "ppm" and b.startswith(b"P6"):
                    c, n = _strip_ppm(b)
                else:
                    c, n = b, 0
                errs.append(None)
            except (ValueError, struct.error, IndexError) as e:
                c, n = b, 0
                errs.append(f"{type(e).__name__}: {e}")
            clean.append(c)
            n_meta.append(n)
            removed.append(len(b) - len(c))
        i = batch.schema.get_field_index("bytes")
        batch = batch.set_column(i, "bytes", pa.array(clean, pa.binary()))
        return (
            batch.append_column("n_meta", pa.array(n_meta, pa.int64()))
            .append_column("bytes_removed", pa.array(removed, pa.int64()))
            .append_column("strip_error", pa.array(errs, pa.string()))
        )

    return ds.map_batches(strip, batch_format="pyarrow", batch_size=64)
