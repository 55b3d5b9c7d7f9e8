"""Multimodal payload operators: images as opaque binary + typed metadata.

The Spark-side plumbing — schemas, Arrow batch shapes, UDF signatures,
partitioning — is real and tested; the codec underneath is the
deterministic container from `scrapely_spark.spark.codec` because no image
library exists in this environment.  Swapping in PIL/ffmpeg changes only
``codec.decode_image`` / the marked stubs below, not the operators.

Operators (all ``mapInPandas``, one Python invocation per Arrow batch):

* :func:`decode_stats`   — decode + per-image stats (dims, mean luma, psnr
  against the regenerable ground truth when available);
* :func:`resize`         — decode → area-average downsample → re-encode;
* :func:`phash_column`   — recompute perceptual hashes from the bytes;
* :func:`frame_sample`   — every-N-th-frame sampling over the
  MJPEG-shaped video container (seeks via the frame length index; only
  sampled frames are ever decompressed).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from scrapely_spark.spark import codec

_STATS_SCHEMA = ("image_id string, w int, h int, fmt string, "
                 "mean_luma double, phash_match boolean")


def decode_stats(images: DataFrame) -> DataFrame:
    """Decode every image; emit dimensions, mean luma, phash consistency."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for image_id, blob, phash in zip(batch["image_id"],
                                             batch["bytes"],
                                             batch["phash"]):
                pixels, w, h, fmt = codec.decode_image(bytes(blob))
                luma = float((pixels.astype(np.float64)
                              @ np.array([0.299, 0.587, 0.114])).mean())
                # phash crosses the Arrow boundary as a STRING (below):
                # an int64 column with any null in the batch coerces to
                # float64 in pandas — NaN crash on the null row, silent
                # bit rounding above 2^53 on every other row
                rows.append({
                    "image_id": image_id, "w": w, "h": h, "fmt": fmt,
                    "mean_luma": round(luma, 4),
                    "phash_match":
                        codec.average_hash(pixels) == int(phash)
                        if fmt == "png" and phash is not None else None,
                })
            yield pd.DataFrame(rows, columns=[
                "image_id", "w", "h", "fmt", "mean_luma", "phash_match"])

    return images.select(
        "image_id", "bytes",
        F.col("phash").cast("string").alias("phash")) \
        .mapInPandas(kernel, _STATS_SCHEMA)


_RESIZE_SCHEMA = "image_id string, bytes binary, w int, h int, fmt string"


def _area_downsample(pixels: np.ndarray, out_w: int, out_h: int
                     ) -> np.ndarray:
    """Deterministic area-average resize (pure numpy)."""
    h, w, _ = pixels.shape
    ys = np.linspace(0, h, out_h + 1).astype(int)
    xs = np.linspace(0, w, out_w + 1).astype(int)
    out = np.empty((out_h, out_w, 3), dtype=np.uint8)
    acc = pixels.astype(np.float64)
    for i in range(out_h):
        for j in range(out_w):
            cell = acc[ys[i]:max(ys[i + 1], ys[i] + 1),
                       xs[j]:max(xs[j + 1], xs[j] + 1)]
            out[i, j] = cell.mean(axis=(0, 1)).round()
    return out


def resize(images: DataFrame, out_w: int = 16, out_h: int = 16) -> DataFrame:
    """Decode → downsample → re-encode (thumbnailing at pipeline scale)."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for image_id, blob in zip(batch["image_id"], batch["bytes"]):
                pixels, _w, _h, fmt = codec.decode_image(bytes(blob))
                small = _area_downsample(pixels, out_w, out_h)
                rows.append({
                    "image_id": image_id,
                    "bytes": codec.encode_image(small, fmt),
                    "w": out_w, "h": out_h, "fmt": fmt,
                })
            yield pd.DataFrame(rows, columns=[
                "image_id", "bytes", "w", "h", "fmt"])

    return images.select("image_id", "bytes").mapInPandas(
        kernel, _RESIZE_SCHEMA)


_PHASH_SCHEMA = "image_id string, phash long"


def phash_column(images: DataFrame) -> DataFrame:
    """Recompute the 64-bit average-hash from the binary payload."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for image_id, blob in zip(batch["image_id"], batch["bytes"]):
                pixels, _w, _h, _fmt = codec.decode_image(bytes(blob))
                rows.append({"image_id": image_id,
                             "phash": codec.average_hash(pixels)})
            yield pd.DataFrame(rows, columns=["image_id", "phash"])

    return images.select("image_id", "bytes").mapInPandas(
        kernel, _PHASH_SCHEMA)


def _check_banding(max_hamming: int, n_chunks: int) -> None:
    if max_hamming > n_chunks - 1:
        raise ValueError(
            "banding with %d chunks guarantees recall only for "
            "hamming <= %d; got max_hamming=%d"
            % (n_chunks, n_chunks - 1, max_hamming))
    if 64 % n_chunks:
        raise ValueError("n_chunks must divide 64")


def _chunk_structs(hash_col: str, n_chunks: int):
    """The pigeonhole banding expression: the 64-bit hash split into
    ``n_chunks`` equal (chunk_idx, chunk_val) bit-chunks — the ONE
    spelling shared by the batch near-dup join, the materialized chunk
    index, and the incremental delta probe."""
    width = 64 // n_chunks
    mask = (1 << width) - 1
    return F.array(*[
        F.struct(
            F.lit(i).alias("chunk_idx"),
            F.shiftrightunsigned(F.col(hash_col), i * width)
            .bitwiseAND(F.lit(mask)).alias("chunk_val"))
        for i in range(n_chunks)])


def phash_chunks(images: DataFrame, n_chunks: int = 4,
                 id_col: str = "image_id", hash_col: str = "phash"
                 ) -> DataFrame:
    """The materialized phash chunk index: ``(image_id, phash,
    chunk_idx, chunk_val)`` — the per-increment state table
    :func:`phash_delta_dups` probes (append each crawl increment's
    output, e.g. to an Iceberg table partitioned by chunk_idx)."""
    if 64 % n_chunks:
        raise ValueError("n_chunks must divide 64")
    return (images.select(F.col(id_col).alias("image_id"),
                          F.col(hash_col).alias("phash"),
                          F.explode(_chunk_structs(hash_col, n_chunks))
                          .alias("c"))
            .select("image_id", "phash", "c.chunk_idx", "c.chunk_val"))


def phash_delta_dups(new_images: DataFrame, index_chunks: DataFrame,
                     max_hamming: int = 3, n_chunks: int = 4,
                     max_bucket: int = 4096,
                     id_col: str = "image_id", hash_col: str = "phash",
                     new_chunks: DataFrame | None = None) -> DataFrame:
    """Incremental image dedup: a new crawl increment against the
    accumulated phash chunk index — the image twin of
    ``dedup.minhash_candidates_delta``, with the same append-only
    contract: every emitted pair involves at least one new image, the
    historical index never re-pairs against itself, and emission is
    O(batch) probes of the materialized index.

    Emits ``(id_a, id_b, hamming, vs_index)`` — exactly one row per
    pair, hamming already verified exact (``bit_count(a XOR b)``, so
    no separate verify stage is needed, unlike minhash); ``vs_index``
    is true only when the pair is NOT discoverable within the batch
    alone.  The hot-bucket cap counts BOTH sides of the union (one
    logo mirrored across the crawl is hot regardless of arrival
    time), preserving ``dups(old ∪ new) == dups(old) ∪ delta(new,
    chunks(old))`` whenever no bucket crosses the cap between
    increments.

    ``new_chunks``: a caller that has ALREADY materialized the batch's
    chunk table (the streaming loop, which also writes it to the
    index) passes it here so the chunking is not computed twice per
    micro-batch; the caller owns its persistence.
    """
    _check_banding(max_hamming, n_chunks)
    from scrapely_spark.spark.dedup import _cap_buckets, _unpersist_on_gc

    if new_chunks is None:
        nc = (phash_chunks(new_images, n_chunks, id_col, hash_col)
              .withColumn("is_new", F.lit(True)).cache())
        owned = [nc]
    else:
        nc = (new_chunks
              .select("image_id", "phash", "chunk_idx", "chunk_val")
              .withColumn("is_new", F.lit(True)))
        owned = []
    idx = (index_chunks
           .select("image_id", "phash", "chunk_idx", "chunk_val")
           .withColumn("is_new", F.lit(False)))
    allb = _cap_buckets(nc.unionByName(idx),
                        ["chunk_idx", "chunk_val"], max_bucket)
    a = allb.where("is_new").alias("a")
    b = allb.alias("b")
    # same two-arm collapse as the minhash delta: != guards
    # re-ingestion, the (NOT b.is_new OR a < b) arm keeps new-vs-new
    # pairs single-sided, min() prefers vs_index=false when a pair is
    # reachable through both arms
    pairs = (a.join(b, ["chunk_idx", "chunk_val"])
             .where((F.col("a.image_id") != F.col("b.image_id"))
                    & ((~F.col("b.is_new"))
                       | (F.col("a.image_id") < F.col("b.image_id"))))
             .groupBy(F.least("a.image_id", "b.image_id").alias("id_a"),
                      F.greatest("a.image_id", "b.image_id")
                      .alias("id_b"))
             .agg(F.min(~F.col("b.is_new")).alias("vs_index"),
                  F.min(F.bit_count(F.col("a.phash")
                                    .bitwiseXOR(F.col("b.phash")))
                        .cast("int")).alias("hamming"))
             .where(F.col("hamming") <= max_hamming)
             .select("id_a", "id_b", "hamming", "vs_index"))
    return _unpersist_on_gc(pairs, owned) if owned else pairs


def phash_near_dups(images: DataFrame, max_hamming: int = 3,
                    n_chunks: int = 4, max_bucket: int = 4096,
                    id_col: str = "image_id", hash_col: str = "phash"
                    ) -> DataFrame:
    """Near-duplicate images by perceptual-hash hamming distance.

    Banding by pigeonhole: split the 64-bit phash into ``n_chunks``
    equal bit-chunks; two hashes within hamming distance ``n_chunks - 1``
    must agree on at least one whole chunk, so the candidate set is
    exactly the pairs sharing any ``(chunk_idx, chunk_value)`` bucket —
    never an all-pairs product.  Each candidate is then verified with
    the exact distance ``bit_count(a XOR b)``.

    Entirely JVM-side (shifts, masks, ``bit_count`` — whole-stage
    codegen, no Python), which is why this operator also carries a SQL
    oracle in the correctness driver, unlike the token-voting simhash.
    Hot buckets (a constant-phash column — e.g. one logo mirrored across
    the crawl) are dropped above ``max_bucket`` before the self-join,
    the same guard the text-LSH paths use.

    Full recall is guaranteed only when ``max_hamming <= n_chunks - 1``
    (the pigeonhole bound); a looser threshold raises rather than
    silently under-recalling.
    """
    _check_banding(max_hamming, n_chunks)
    bands = (images.select(F.col(id_col).alias("_id"),
                           F.col(hash_col).alias("_ph"),
                           F.explode(_chunk_structs(hash_col, n_chunks))
                           .alias("c"))
             .select("_id", "_ph", "c.chunk_idx", "c.chunk_val"))
    from scrapely_spark.spark.dedup import _cap_buckets
    bands = _cap_buckets(bands, ["chunk_idx", "chunk_val"], max_bucket)

    a, b = bands.alias("a"), bands.alias("b")
    pairs = (a.join(b, ["chunk_idx", "chunk_val"])
             .where(F.col("a._id") < F.col("b._id"))
             .select(F.col("a._id").alias("id_a"),
                     F.col("b._id").alias("id_b"),
                     F.col("a._ph").alias("ph_a"),
                     F.col("b._ph").alias("ph_b"))
             .distinct())
    return (pairs.withColumn(
                "hamming",
                F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
                .cast("int"))
            .where(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


def _caption_norm(col: str = "caption"):
    """The ONE caption normalization (whitespace-collapsed, trimmed,
    case-folded) shared by :func:`caption_spam` and the
    :func:`image_corpus_build` anti-join — both sides of that join
    must normalize identically or the join silently matches nothing."""
    # collapse BEFORE trimming: Spark trim strips only spaces, so a
    # leading tab/newline survives trim-first and splits one logical
    # caption into two normalized spellings
    return F.trim(F.regexp_replace(F.lower(F.col(col)), r"\s+", " "))


def caption_spam(images: DataFrame, min_distinct_images: int = 3
                 ) -> DataFrame:
    """Stock-photo / spam caption detection — the LAION-curation
    counterpart of text boilerplate removal: one caption string
    attached to MANY visually distinct images is template noise
    ("click to enlarge", watermark boilerplate, SEO spam), and
    image-caption training pairs under it teach the model nothing.

    Captions compare whitespace-normalized and case-folded; visual
    distinctness counts DISTINCT phash (byte-identical re-uploads of
    one image do not make a caption spam).  Emits ``(caption_norm,
    n_images, n_distinct_phash)`` for captions at or above the
    threshold — feed the result as a broadcast anti-join to the
    curation gate.

    Scale shape: one scan, one groupBy(caption_norm) whose COUNT and
    COUNT DISTINCT both combine map-side (Spark plans the distinct as
    a two-level partial aggregate, so even a planet-hot caption key
    arrives pre-collapsed); output is bounded by distinct spam
    captions, which is what makes the anti-join broadcastable.
    """
    norm = _caption_norm()
    return (images.select(norm.alias("caption_norm"), "phash")
            .groupBy("caption_norm")
            .agg(F.count("*").alias("n_images"),
                 F.countDistinct("phash").alias("n_distinct_phash"))
            .where(F.col("n_distinct_phash") >= min_distinct_images))


def caption_alignment(pairs: DataFrame, min_score: float = 0.15,
                      image_col: str = "image_emb",
                      caption_col: str = "caption_emb") -> DataFrame:
    """CLIP-style image-caption alignment gate — the score LAION filters
    on (clip-score >= threshold) to drop mis-paired alt-text before an
    image-caption pair enters the training set.

    Input: one row per candidate pair carrying BOTH embeddings (the
    image tower's vector and the text tower's vector, same dimension,
    ``array<float|double>``); the encoders themselves are upstream
    models, out of scope here — this operator is the filter that
    consumes their output.  Emits rows whose cosine alignment clears
    ``min_score``, with the score rounded to 6 decimals so the value is
    engine-portable (the same contract as the ANN family's scores).

    Scale shape: a shuffle-free projection — the dot product and both
    norms fold JVM-side over the array columns (``zip_with`` +
    ``aggregate``, whole-stage codegen; no Python, no explode —
    exploding a 768-dim vector would multiply the scan 768x).  Zero- or
    NULL-norm vectors score NULL and are dropped by the gate rather
    than dividing by zero.
    """
    a = F.col(image_col).cast("array<double>")
    b = F.col(caption_col).cast("array<double>")

    def _fold(arr):
        return F.aggregate(arr, F.lit(0.0),
                           lambda acc, x: acc + x)

    dot = _fold(F.zip_with(a, b, lambda x, y: x * y))
    na = F.sqrt(_fold(F.transform(a, lambda x: x * x)))
    nb = F.sqrt(_fold(F.transform(b, lambda x: x * x)))
    score = F.when((na > 0) & (nb > 0), dot / (na * nb))
    keep = [c for c in pairs.columns if c not in (image_col, caption_col)]
    return (pairs.select(*keep, F.round(score, 6).alias("align_score"))
            .where(F.col("align_score") >= min_score))


_FRAME_SCHEMA = ("video_id string, frame_index int, frame_bytes binary")


def frame_sample(videos: DataFrame, every_n: int = 30) -> DataFrame:
    """Explode each video into every ``every_n``-th frame as binary rows.

    The MJPEG-shaped container (codec.encode_video) keys every frame
    behind a length index, so sampling seeks straight to the wanted
    frames — non-sampled frames are never decompressed, which is what
    makes per-frame sampling affordable on a 100 TB video column.  The
    emitted ``frame_bytes`` are standalone image payloads (no
    transcode), directly consumable by decode_stats/resize/phash.
    Real-codec integration point: ``codec.iter_video_frames`` (swap for
    ffmpeg/pyav keyframe extraction; the operator shape is unchanged).
    """
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for video_id, blob in zip(batch["video_id"], batch["bytes"]):
                blob = bytes(blob)
                _w, _h, n, _fmt = codec.video_meta(blob)
                for i, frame_blob in codec.iter_video_frames(
                        blob, range(0, n, every_n)):
                    rows.append({"video_id": video_id, "frame_index": i,
                                 "frame_bytes": frame_blob})
            yield pd.DataFrame(rows, columns=[
                "video_id", "frame_index", "frame_bytes"])

    return videos.select("video_id", "bytes").mapInPandas(
        kernel, _FRAME_SCHEMA)


def frame_phashes(frames: DataFrame) -> DataFrame:
    """Per-frame perceptual hashes keyed for :func:`video_near_dups`.

    The composition bridge between :func:`frame_sample`'s output
    ``(video_id, frame_index, frame_bytes)`` and the
    ``(video_id, frame_idx, phash)`` rows :func:`video_near_dups`
    consumes — :func:`phash_column` can't serve here because it keys
    by ``image_id`` and drops frame identity.  Same decode +
    average-hash kernel, one shuffle-free Arrow pass.
    """
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for video_id, idx, blob in zip(batch["video_id"],
                                           batch["frame_index"],
                                           batch["frame_bytes"]):
                pixels, _w, _h, _fmt = codec.decode_image(bytes(blob))
                rows.append({"video_id": video_id,
                             "frame_idx": int(idx),
                             "phash": codec.average_hash(pixels)})
            yield pd.DataFrame(rows, columns=[
                "video_id", "frame_idx", "phash"])

    return frames.select("video_id", "frame_index", "frame_bytes") \
        .mapInPandas(kernel, "video_id string, frame_idx int, "
                             "phash long")


def curate_image_captions(images: DataFrame, min_dim: int = 64,
                          min_aspect: float = 0.5,
                          max_aspect: float = 2.0,
                          min_caption_tokens: int = 3,
                          max_caption_tokens: int = 77) -> DataFrame:
    """LAION-style curation filter over (image, caption) pairs.

    The standard pre-training gate for an image+caption corpus
    (Schuhmann et al. 2021): both dimensions above a floor, aspect
    ratio within bounds, caption length inside the text encoder's
    window (77 CLIP tokens, approximated by the corpus-wide whitespace
    token convention).  One shuffle-free projection+filter over the
    metadata columns — bytes are never touched, so at 100 TB the scan
    reads only the pruned (image_id, w, h, caption) columns and the
    binary column stays on disk.
    """
    # strip ALL edge whitespace (trim handles spaces only) so a
    # leading tab/newline can't mint a phantom first token
    n_tokens = F.size(F.split(
        F.regexp_replace(F.lower(F.col("caption")),
                         r"^\s+|\s+$", ""), r"\s+"))
    ar = F.round(F.col("w") / F.col("h"), 6)
    return (images.select(
        "image_id", "w", "h", ar.alias("aspect"),
        n_tokens.alias("n_caption_tokens"))
        .where((F.col("w") >= min_dim) & (F.col("h") >= min_dim)
               & (F.col("aspect") >= min_aspect)
               & (F.col("aspect") <= max_aspect)
               & (F.col("n_caption_tokens") >= min_caption_tokens)
               & (F.col("n_caption_tokens") <= max_caption_tokens)))


# the SDXL-style training ladder: (name, bucket_w, bucket_h) — a fixed
# set of aspect ratios a variable-aspect image trainer batches by so
# that every batch shares one latent shape (Podell et al. 2023, app. I)
ASPECT_LADDER = [
    ("1:1", 1024, 1024), ("4:3", 1152, 896), ("3:4", 896, 1152),
    ("3:2", 1216, 832), ("2:3", 832, 1216), ("16:9", 1344, 768),
    ("9:16", 768, 1344), ("2:1", 1472, 704), ("1:2", 704, 1472),
]


def aspect_buckets(images: DataFrame,
                   ladder: list = None) -> DataFrame:
    """Aspect-ratio bucket assignment for variable-aspect image training.

    Every (w, h) image is assigned the ladder bucket whose aspect ratio
    is nearest to its own (ties to the earlier ladder entry), plus the
    target dims a resize stage would emit — the batching key an SDXL-
    style trainer groups by so one batch shares one tensor shape.

    Engine-portable determinism: the nearest-bucket argmin uses only
    IEEE correctly-rounded ops (two divisions, a subtraction, abs and
    comparisons — no log), so Spark and any ANSI engine pick identical
    buckets for identical ints.  One shuffle-free projection; the
    binary column is never read (metadata-only scan at 100 TB, same
    pruning contract as curate_image_captions).
    """
    ladder = ladder or ASPECT_LADDER
    ar = F.col("w").cast("double") / F.col("h").cast("double")
    diffs = [F.abs(ar - F.lit(float(bw) / float(bh)))
             for _, bw, bh in ladder]
    best = F.least(*diffs)
    bucket = F.coalesce(*[F.when(diffs[i] == best, F.lit(name))
                          for i, (name, _, _) in enumerate(ladder)])
    tgt_w = F.coalesce(*[F.when(diffs[i] == best, F.lit(bw))
                         for i, (_, bw, _) in enumerate(ladder)])
    tgt_h = F.coalesce(*[F.when(diffs[i] == best, F.lit(bh))
                         for i, (_, _, bh) in enumerate(ladder)])
    return images.select(
        "image_id", "w", "h",
        F.round(ar, 6).alias("aspect"),
        bucket.alias("bucket"),
        tgt_w.alias("target_w"), tgt_h.alias("target_h"))


def image_corpus_build(images: DataFrame, min_dim: int = 64,
                       max_hamming: int = 3,
                       spam_min_distinct: int = 3) -> DataFrame:
    """The end-to-end image-caption corpus build — the image-payload
    sibling of ``corpus.llm_corpus_build``, operators composed:

    curation gate (dims/aspect/caption window) → spam-caption anti-join
    → phash near-dup pairs → connected-component clusters → canonical
    survivor election → SDXL aspect-bucket assignment.

    Every stage is the SAME operator verified piecewise elsewhere
    (:func:`curate_image_captions`, :func:`caption_spam`,
    :func:`phash_near_dups`, ``dedup.dup_clusters``,
    :func:`aspect_buckets`); this function is the integration point
    proving they compose in one lineage.  One row per surviving
    canonical image: ``(image_id, w, h, aspect, bucket, target_w,
    target_h, cluster_size, caption)`` — the training-ready record a
    variable-aspect trainer shards by bucket.

    Scan discipline: every stage reads METADATA columns only (dims,
    caption, phash) — the binary column is never touched, so each
    re-read of the clean set is a pruned columnar scan, and the only
    shuffles are the ones the piecewise operators already pay (spam
    groupBy, band groupBy, cluster election).  At 10^10 images the
    expensive legs are the banded phash self-join and clustering,
    both capped/bounded by construction.
    """
    from scrapely_spark.spark import dedup

    cur = images.join(
        curate_image_captions(images, min_dim=min_dim)
        .select("image_id"), "image_id")
    spam = (caption_spam(cur, spam_min_distinct)
            .select(F.col("caption_norm").alias("_cn")))
    # clean feeds FIVE consumers (the banding lineage, the clusters
    # doc side via the driver probe, aspect buckets, and the final
    # caption join) — materialize it eagerly so the curation + spam
    # anti-join chain runs once instead of once per consumer; the
    # checkpointed table is image metadata + caption, never pixel data
    clean = (cur.withColumn("_cn", _caption_norm())
             .join(spam, "_cn", "left_anti").drop("_cn")
             .localCheckpoint(eager=True))
    pairs = (phash_near_dups(clean, max_hamming=max_hamming)
             .select(F.col("id_a").alias("doc_a"),
                     F.col("id_b").alias("doc_b")))
    clusters = dedup.dup_clusters(
        clean.select(F.col("image_id").alias("doc_id")), pairs)
    keepers = (clusters
               .where(F.col("doc_id") == F.col("canonical_doc_id"))
               .select(F.col("doc_id").alias("image_id"),
                       "cluster_size"))
    return (aspect_buckets(clean)
            .join(keepers, "image_id")
            .join(clean.select("image_id", "caption"), "image_id")
            .select("image_id", "w", "h", "aspect", "bucket",
                    "target_w", "target_h", "cluster_size", "caption"))


def exif_extract(images: DataFrame, bytes_col: str = "exif") -> DataFrame:
    """EXIF metadata off a binary column via an Arrow batch kernel —
    ``(… , orientation, taken_at, make, exif_valid)``.  The parser
    (codec.exif_meta) walks a real TIFF 6.0 IFD0; junk payloads come
    back flagged invalid, never as an executor exception.  The binary
    column is the ONLY extra column the kernel reads — at 100 TB the
    scan prunes everything else and the kernel is embarrassingly
    parallel (no shuffle; output schema adds four narrow columns).
    """
    from scrapely_spark.spark.codec import exif_meta

    return _binary_meta_op(images, bytes_col, exif_meta, [
        ("orientation", "int", "Int32"),
        ("taken_at", "string", None),
        ("make", "string", None),
        ("exif_valid", "boolean", None)])


# magic-byte prefixes (hex, uppercase) → canonical format name.  The
# table IS the spec: ISO/IEC 10918 (JPEG SOI), RFC 2083 §3.1 (PNG
# signature), GIF87a/89a, TIFF 6.0 §2 (II*\0 / MM\0*), RIFF/WEBP
# (RFC 2361 framing + WebP FourCC at offset 8), BMP 'BM'.
_MAGIC = (
    ("FFD8FF", "jpeg"),
    ("89504E470D0A1A0A", "png"),
    ("474946383761", "gif"),
    ("474946383961", "gif"),
    ("49492A00", "tiff"),
    ("4D4D002A", "tiff"),
    ("424D", "bmp"),
)


def _sniffed_fmt(bytes_col: str):
    """The magic-byte CASE ladder as a column expression (shared by
    :func:`sniff_format` and :func:`ingest_gates`)."""
    hx = F.upper(F.hex(F.col(bytes_col)))
    ladder = F.when(
        (F.substring(hx, 1, 8) == "52494646")
        & (F.substring(hx, 17, 8) == "57454250"), F.lit("webp"))
    for prefix, name in _MAGIC:
        ladder = ladder.when(
            F.substring(hx, 1, len(prefix)) == prefix, F.lit(name))
    # ISOBMFF ('ftyp' at bytes 4-8, checked after the leading magics
    # per WHATWG sniffing order): the container AVIF/HEIC ship in —
    # without this arm every modern-CDN payload sniffs 'unknown' and
    # the composed ingest gate rejects the whole format family.
    # Brand (bytes 8-12) splits AV1 vs HEVC families; an unrecognized
    # brand still reports the container rather than 'unknown'.
    brand = F.substring(hx, 17, 8)
    ladder = ladder.when(
        F.substring(hx, 9, 8) == "66747970",  # 'ftyp'
        F.when(brand.isin("61766966", "61766973"),        # avif/avis
               F.lit("avif"))
        .when(brand.isin("68656963", "68656978",          # heic/heix
                         "6D696631", "6D736631"),         # mif1/msf1
              F.lit("heic"))
        .otherwise(F.lit("isobmff")))
    return ladder.otherwise(F.lit("unknown"))


def sniff_format(images: DataFrame, bytes_col: str = "bytes",
                 fmt_col: str = "fmt") -> DataFrame:
    """Magic-byte format sniffing + declared-format validation.

    Web-crawled image corpora carry a *declared* format (Content-Type
    header, URL extension, upstream metadata) that routinely disagrees
    with the payload — CDNs transcode, servers lie, truncated bodies
    sniff as nothing.  Decoders are dispatched by the declared format,
    so a mislabel is a hard failure at decode time; sniffing the real
    container off the first bytes is the standard curation gate that
    catches it early (browsers do the same per WHATWG MIME-sniffing).

    Detection is a CASE ladder over the uppercase hex prefix of the
    binary column — JPEG / PNG / GIF / TIFF (both byte orders) / BMP by
    leading magic, WebP by RIFF framing plus the ``WEBP`` FourCC at
    byte offset 8.  Everything runs JVM-side (``hex`` + ``substring`` +
    ``CASE``): a map-only pass with no shuffle and no Python, so at
    100 TB it rides the ingest scan for free.  ``hex`` materializes
    2× the blob size per row transiently; for multi-MB payloads
    substitute ``substring(bytes, 1, 16)`` before ``hex`` — semantics
    identical (only the first 16 bytes are ever inspected), kept
    whole-column here so the expression stays shared with engines
    whose blob slicing differs (the DuckDB oracle hexes the blob).

    Returns ``(image_id, declared_fmt, sniffed_fmt, n_bytes, fmt_ok)``
    with ``fmt_ok = (declared == sniffed)`` — downstream either drops
    mismatches or re-routes them to the sniffed decoder.
    """
    sniffed = _sniffed_fmt(bytes_col)
    return images.select(
        "image_id",
        F.col(fmt_col).alias("declared_fmt"),
        sniffed.alias("sniffed_fmt"),
        F.length(F.col(bytes_col)).cast("long").alias("n_bytes"),
        (F.col(fmt_col) == sniffed).alias("fmt_ok"))


# max plausible compression ratio (raw RGB bytes / file bytes) per
# container — an image whose file is smaller than raw/ratio cannot be
# a complete encoding of the declared dimensions.  The table is the
# spec: JPEG quality floors around 100:1, PNG's DEFLATE rarely beats
# 50:1 on photographic content, BMP is uncompressed (+header slack).
SIZE_GATE_MAX_RATIO = {"jpeg": 100, "png": 50, "gif": 60,
                       "webp": 150, "tiff": 20, "bmp": 2}
SIZE_GATE_MAX_PIXELS = 25_000_000     # 25 MP decode ceiling
SIZE_GATE_MIN_BYTES = 100             # below any valid header+payload


def _size_flags(images: DataFrame, fmt_col: str, n_bytes_col: str,
                bytes_col: str):
    """Shared size-plausibility expressions for :func:`size_gate` and
    :func:`ingest_gates` — ONE spelling of the ratio ladder and the
    three flag inequalities so the fused gate can never drift from the
    piecewise one tests verify.  Returns (n_bytes, too_small, bomb,
    truncated) column expressions."""
    nb = (F.col(n_bytes_col) if n_bytes_col in images.columns
          else F.length(F.col(bytes_col))).cast("long")
    ratio = F.lit(150)
    for f, r in SIZE_GATE_MAX_RATIO.items():
        ratio = F.when(F.col(fmt_col) == f, F.lit(r)).otherwise(ratio)
    raw = F.col("w").cast("long") * F.col("h").cast("long") * 3
    px = F.col("w").cast("long") * F.col("h").cast("long")
    return (nb, nb < SIZE_GATE_MIN_BYTES, px > SIZE_GATE_MAX_PIXELS,
            (nb * ratio) < raw)


def size_gate(images: DataFrame, n_bytes_col: str = "n_bytes",
              bytes_col: str = "bytes") -> DataFrame:
    """Byte-size plausibility gate over (w, h, fmt, size) metadata.

    Two of the highest-yield drops in an image-curation pipeline need
    no decode at all: *truncated downloads* (the file is too small to
    be a complete encoding of the declared dimensions — the decoder
    would fail or emit a half-gray frame) and *decompression bombs*
    (declared pixel count large enough that decoding DoSes the
    executor: the classic 40000×40000 PNG that is 4 KB on disk).  Both
    fall out of integer arithmetic on columns the ingest already has,
    so the gate runs BEFORE bytes are ever shipped to a decode stage —
    at 100 TB this ordering is the difference between pruning the
    blob column at the scan and paying full I/O for garbage.

    Flags (all integer-exact, no floats):
    * ``too_small``  — n_bytes < 100 (below any valid header),
    * ``bomb``       — w·h > 25 MP (decode ceiling),
    * ``truncated``  — n_bytes · max_ratio(fmt) < w·h·3, with the
      per-format plausible-compression table above; unknown formats
      use the most permissive ratio (150) so the gate never
      false-positives on a container it doesn't know.

    If ``n_bytes_col`` is absent, falls back to ``length(bytes)``.
    Returns (image_id, fmt, w, h, n_bytes, too_small, bomb,
    truncated, keep).
    """
    nb, too_small, bomb, truncated = _size_flags(
        images, "fmt", n_bytes_col, bytes_col)
    return images.select(
        "image_id", "fmt",
        F.col("w").cast("int").alias("w"),
        F.col("h").cast("int").alias("h"),
        nb.alias("n_bytes"),
        too_small.alias("too_small"),
        bomb.alias("bomb"),
        truncated.alias("truncated"),
        (~too_small & ~bomb & ~truncated).alias("keep"))


def ingest_gates(images: DataFrame, bytes_col: str = "bytes",
                 fmt_col: str = "fmt",
                 n_bytes_col: str = "n_bytes") -> DataFrame:
    """The composed image ingest gate: format sniff + size gate as ONE
    declarative Project.

    :func:`sniff_format` and :func:`size_gate` verified piecewise; an
    ingest pipeline runs them together, and because both are pure
    column expressions the composition is a SINGLE shuffle-free
    Project — Catalyst evaluates the hex ladder and the integer
    inequalities in the same whole-stage-codegen pass over the scan,
    so adding a gate costs zero extra I/O (contrast with materializing
    each gate's verdict table and joining: a shuffle per gate).

    ``keep`` requires the declared format to match the sniffed
    container AND the size-plausibility flags to all clear — the
    row a decode stage may safely receive.

    Returns (image_id, declared_fmt, sniffed_fmt, fmt_ok, n_bytes,
    too_small, bomb, truncated, keep).
    """
    sniffed = _sniffed_fmt(bytes_col)
    fmt_ok = F.col(fmt_col) == sniffed
    nb, too_small, bomb, truncated = _size_flags(
        images, fmt_col, n_bytes_col, bytes_col)
    return images.select(
        "image_id",
        F.col(fmt_col).alias("declared_fmt"),
        sniffed.alias("sniffed_fmt"),
        fmt_ok.alias("fmt_ok"),
        nb.alias("n_bytes"),
        too_small.alias("too_small"),
        bomb.alias("bomb"),
        truncated.alias("truncated"),
        (fmt_ok & ~too_small & ~bomb & ~truncated).alias("keep"))


def caption_lang_gate(pairs: DataFrame, caption_col: str = "caption",
                      lang_col: str = "declared_lang") -> DataFrame:
    """Caption-language agreement gate for (image, caption) curation.

    Multilingual image-caption corpora carry a declared language
    (page ``lang`` attribute, upstream metadata) that the caption
    often contradicts — wrong-language captions poison contrastive
    text towers, so LAION-style pipelines re-detect the caption's
    language and keep only agreeing rows (or re-route the row to the
    detected language's bucket).  Detection reuses the corpus's
    marker-word language ID (:func:`textstats.language_id` — same
    model as the ``text_langid`` row, so a caption and a document
    with the same text always land in the same language).

    Returns (image_id, declared_lang, detected_lang, marker_hits,
    lang_ok) — same shuffle-free single-Project shape as the other
    ingest gates; downstream filters on ``lang_ok`` or regroups by
    ``detected_lang``.
    """
    from scrapely_spark.spark import textstats

    renamed = pairs.select(
        F.col("image_id").alias("doc_id"),
        F.col(lang_col).alias("lang"),
        F.col(caption_col).alias("text"))
    out = textstats.language_id(renamed)
    return out.select(
        F.col("doc_id").alias("image_id"),
        F.col("lang").alias("declared_lang"),
        F.col("predicted_lang").alias("detected_lang"),
        F.col("score").cast("long").alias("marker_hits"),
        (F.col("lang") == F.col("predicted_lang")).alias("lang_ok"))


def exact_image_dedup(images: DataFrame,
                      bytes_col: str = "bytes") -> DataFrame:
    """Exact image dedup by content hash — the FIRST dedup any image
    pipeline runs, before any perceptual hashing: byte-identical
    payloads (hotlinked logos, re-hosted thumbnails, CDN mirrors)
    collapse to one canonical row regardless of URL or metadata.

    The key is sha256 over the payload (via its hex encoding, which
    both engines spell identically); the canonical member of each
    content group is the minimum image_id, making the election
    deterministic.  Same shape as ``dedup.exact_duplicates``: one
    shuffle keyed by the hash — uniform by construction, so no skew is
    possible even when one logo appears 10^7 times, because identical
    payloads are exactly what the key collapses — and a window-min
    rather than a self-join.

    NULL and EMPTY payloads (failed/zero-byte downloads) carry no
    content to match on: each such row stays its own singleton
    canonical (grouping them — by the NULL hash or by sha2('') —
    would elect one arbitrary winner and silently drop N−1 unrelated
    images downstream).

    Returns one row per input image: (image_id, content_sha, canonical_id,
    is_canonical, group_size).
    """
    from pyspark.sql import Window

    sha = F.when(F.length(F.col(bytes_col)) > 0,
                 F.sha2(F.hex(F.col(bytes_col)), 256))
    staged = images.select("image_id", sha.alias("content_sha"))
    nulls = staged.where(F.col("content_sha").isNull()).select(
        "image_id", "content_sha",
        F.col("image_id").alias("canonical_id"),
        F.lit(True).alias("is_canonical"),
        F.lit(1).cast("long").alias("group_size"))
    w = Window.partitionBy("content_sha")
    return (staged.where(F.col("content_sha").isNotNull())
            .withColumn("canonical_id", F.min("image_id").over(w))
            .withColumn("group_size",
                        F.count("*").over(w).cast("long"))
            .select("image_id", "content_sha", "canonical_id",
                    (F.col("image_id") == F.col("canonical_id"))
                    .alias("is_canonical"), "group_size")
            .unionByName(nulls))


def _hex_be(hx, pos: int, nbytes: int):
    """Big-endian unsigned int read from a hex string column: the
    ``nbytes`` bytes starting at 0-based byte offset ``pos``."""
    return F.conv(F.substring(hx, 2 * pos + 1, 2 * nbytes), 16, 10
                  ).cast("long")


def _hex_le(hx, pos: int, nbytes: int):
    """Little-endian unsigned int read: same window, byte pairs
    concatenated in reverse order before the base-16 parse."""
    pairs = [F.substring(hx, 2 * (pos + i) + 1, 2)
             for i in reversed(range(nbytes))]
    return F.conv(F.concat(*pairs), 16, 10).cast("long")


def header_dims(images: DataFrame, bytes_col: str = "bytes",
                w_col: str = "w", h_col: str = "h") -> DataFrame:
    """Actual pixel dimensions parsed from the container header,
    validated against the declared ``(w, h)`` metadata columns.

    Crawled image metadata (the ``w``/``h`` the upstream index or the
    page's ``<img width=…>`` attributes declared) routinely disagrees
    with the payload: pages lie, CDNs resize, partial downloads truncate.
    Training-data pipelines that bucket by aspect ratio or filter by
    minimum dimension off declared metadata silently mis-route those
    rows; the fix is to read the dimensions the container itself states
    — a fixed-offset field in every major format — and gate on
    agreement, long before any decoder runs.

    Parsing is JVM-side arithmetic over the hex encoding of the first
    bytes (no Python, no UDF — a map-only Project that rides the ingest
    scan at any scale, exactly like :func:`sniff_format`):

    * PNG  — IHDR is required to be the first chunk (PNG spec §5.6), so
      width/height are big-endian uint32 at byte offsets 16 and 20;
    * GIF  — logical-screen width/height, little-endian uint16 at
      offsets 6 and 8 (GIF89a spec §18);
    * BMP  — BITMAPINFOHEADER biWidth/biHeight, little-endian int32 at
      offsets 18 and 22; a negative biHeight means a top-down DIB and
      the pixel height is its magnitude (two's complement handled
      exactly in integer arithmetic);
    * JPEG/TIFF/WebP — dimensions live behind a variable-offset marker
      scan (SOF / IFD / chunk walk); those belong to the decoder family
      (see ``exif_extract`` for the TIFF IFD walk) and report
      ``unsupported`` here, dims NULL.

    ``status`` ladder: ``truncated`` (payload shorter than the header
    field it sniffs as), ``unsupported`` (no fixed-offset container
    detected), ``mismatch`` (parsed dims disagree with declared), else
    ``ok``.  ``dims_ok`` is NULL where no comparison was possible —
    downstream gates drop ``mismatch`` and route ``truncated`` to the
    refetch queue.
    """
    hx = F.upper(F.hex(F.col(bytes_col)))
    sniffed = _sniffed_fmt(bytes_col)
    n = F.length(F.col(bytes_col)).cast("long")

    png_w, png_h = _hex_be(hx, 16, 4), _hex_be(hx, 20, 4)
    gif_w, gif_h = _hex_le(hx, 6, 2), _hex_le(hx, 8, 2)
    bmp_w_raw, bmp_h_raw = _hex_le(hx, 18, 4), _hex_le(hx, 22, 4)
    two32 = F.lit(1 << 32).cast("long")
    two31 = F.lit(1 << 31).cast("long")
    bmp_w = F.when(bmp_w_raw >= two31, bmp_w_raw - two32).otherwise(
        bmp_w_raw)
    bmp_h_signed = F.when(bmp_h_raw >= two31, bmp_h_raw - two32
                          ).otherwise(bmp_h_raw)
    bmp_h = F.abs(bmp_h_signed)
    # only the BITMAPINFOHEADER family puts i32 dims at 18/22; a
    # BITMAPCOREHEADER (DIB size 12, u16 dims at 18/20) read through
    # the i32 path packs width+height into one garbage number — same
    # guard image_dims_router applies.  Payloads too short to carry
    # the DIB size field stay on the bmp arm and report truncated.
    bmp_dib = _hex_le(hx, 14, 4)
    bmp_info = (n < F.lit(18)) | bmp_dib.isin(40, 52, 56, 64, 108, 124)

    # minimum payload length to read the dimension fields of each
    # sniffed container (PNG: through IHDR height = 24; GIF: logical
    # screen descriptor = 10; BMP: through biHeight = 26)
    need = (F.when(sniffed == "png", F.lit(24))
            .when(sniffed == "gif", F.lit(10))
            .when((sniffed == "bmp") & bmp_info, F.lit(26))
            .otherwise(F.lit(None)).cast("long"))

    actual_w = (F.when(sniffed == "png", png_w)
                .when(sniffed == "gif", gif_w)
                .when(sniffed == "bmp", bmp_w))
    actual_h = (F.when(sniffed == "png", png_h)
                .when(sniffed == "gif", gif_h)
                .when(sniffed == "bmp", bmp_h))

    parsed = images.select(
        "image_id", sniffed.alias("sniffed_fmt"),
        F.col(w_col).cast("long").alias("declared_w"),
        F.col(h_col).cast("long").alias("declared_h"),
        F.when(n >= need, actual_w).alias("actual_w"),
        F.when(n >= need, actual_h).alias("actual_h"),
        n.alias("n_bytes"), need.alias("_need"))
    status = (F.when(F.col("_need").isNull(), F.lit("unsupported"))
              .when(F.col("n_bytes") < F.col("_need"),
                    F.lit("truncated"))
              .when((F.col("actual_w") == F.col("declared_w"))
                    & (F.col("actual_h") == F.col("declared_h")),
                    F.lit("ok"))
              .otherwise(F.lit("mismatch")))
    return parsed.select(
        "image_id", "sniffed_fmt", "declared_w", "declared_h",
        "actual_w", "actual_h",
        F.when(F.col("actual_w").isNotNull(),
               status == "ok").alias("dims_ok"),
        status.alias("status"))


def jpeg_dims(images: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """JPEG frame dimensions + progressive flag off the binary column —
    the decoder-family sibling of :func:`header_dims` (which covers the
    fixed-offset containers and reports JPEG as ``unsupported``).

    The SOF segment sits behind a variable-offset marker walk
    (``codec.jpeg_sof``), so unlike PNG/GIF/BMP this cannot be JVM
    substring arithmetic; it runs as an Arrow batch kernel over
    ``mapInPandas`` — the binary column is the only extra column the
    kernel reads, the scan prunes everything else, and the pass is
    embarrassingly parallel (no shuffle, four narrow output columns).
    The ``progressive`` flag matters downstream: progressive JPEGs
    cost ~3× to decode and some training loaders reject them, so
    curation routes on it.
    """
    from scrapely_spark.spark.codec import jpeg_sof

    return _binary_meta_op(images, bytes_col, jpeg_sof, [
        ("jpeg_w", "int", "Int32"), ("jpeg_h", "int", "Int32"),
        ("progressive", "boolean", None),
        ("n_components", "int", "Int32"),
        ("jpeg_valid", "boolean", None)])


def gps_scrub(images: DataFrame, bytes_col: str = "exif") -> DataFrame:
    """Location-PII scrub for EXIF payloads: parse GPS coordinates,
    then rewrite the blob WITHOUT the GPS sub-IFD.

    Camera JPEGs embed the capture location; shipping that into a
    training corpus is a privacy incident (the LAION takedown class of
    problem), so the curation pipeline must strip it at ingest — while
    keeping the benign metadata (orientation drives decode, DateTime
    drives freshness) intact.  Per row this emits the pre-scrub
    coordinates (signed micro-degrees — the audit trail governance
    needs), whether GPS was present, and the scrubbed blob; malformed
    blobs come back ``exif=NULL, exif_valid=false`` rather than
    passing unscrubbed bytes through a PII gate.

    One Arrow batch kernel over the binary column (codec.exif_gps +
    codec.exif_gps_scrub — a real TIFF 6.0 IFD walk and generic
    re-serialization, not a stub); no shuffle, embarrassingly
    parallel, and the scan reads only the id and binary columns.
    """
    from typing import Iterator

    import pandas as pd

    from scrapely_spark.spark.codec import exif_gps, exif_gps_scrub

    id_cols = [c for c in images.columns if c != bytes_col]
    in_schema = images.select(*id_cols, bytes_col)
    out_fields = (", ".join("%s %s" % (f.name, f.dataType.simpleString())
                            for f in in_schema.schema.fields
                            if f.name != bytes_col)
                  + ", lat_e6 bigint, lon_e6 bigint, had_gps boolean,"
                    " %s binary, exif_valid boolean" % bytes_col)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            lats, lons, had, blobs, valid = [], [], [], [], []
            for b in batch[bytes_col]:
                lat, lon, has_gps, ok = exif_gps(b)
                scrubbed = exif_gps_scrub(b) if ok else None
                lats.append(lat)
                lons.append(lon)
                had.append(has_gps)
                blobs.append(scrubbed)
                valid.append(ok and scrubbed is not None)
            out = batch[id_cols].copy()
            out["lat_e6"] = pd.array(lats, dtype="Int64")
            out["lon_e6"] = pd.array(lons, dtype="Int64")
            out["had_gps"] = had
            out[bytes_col] = blobs
            out["exif_valid"] = valid
            yield out

    return in_schema.mapInPandas(kernel, out_fields)


def _binary_meta_op(images: DataFrame, bytes_col: str, parser,
                    cols: list) -> DataFrame:
    """Shared mapInPandas wrapper for the container walks: one Arrow
    batch kernel over (id columns, bytes column), appending the
    parser's tuple fields as the named/typed columns in ``cols`` —
    ``(name, sql_type, pandas_dtype_or_None)``.  Centralizes the
    id-column passthrough, output-schema assembly and nullable-int
    handling so a wrapper-level fix lands once, not once per format.
    Scan discipline is inherited by every caller: the binary column
    is the only extra column read, no shuffle.
    """
    from typing import Iterator

    import pandas as pd

    id_cols = [c for c in images.columns if c != bytes_col]
    in_schema = images.select(*id_cols, bytes_col)
    out_fields = (", ".join("%s %s" % (f.name, f.dataType.simpleString())
                            for f in in_schema.schema.fields
                            if f.name != bytes_col)
                  + ", " + ", ".join("%s %s" % (n, t)
                                     for n, t, _ in cols))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            metas = [parser(b) for b in batch[bytes_col]]
            out = batch[id_cols].copy()
            for i, (name, _, pdt) in enumerate(cols):
                vals = [m[i] for m in metas]
                out[name] = pd.array(vals, dtype=pdt) if pdt else vals
            yield out

    return in_schema.mapInPandas(kernel, out_fields)


_WEBP_DIMS_COLS = (", webp_w int, webp_h int, webp_kind string,"
                   " webp_alpha boolean, webp_valid boolean")


def webp_dims(images: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """WebP dimensions/kind/alpha off the binary column — the second
    decoder-family sibling of :func:`header_dims` (which covers the
    fixed-offset containers; JPEG has :func:`jpeg_dims`).

    WebP dimensions live in three different encodings behind RIFF
    framing (14-bit u16s after the VP8 start code, a packed 28-bit
    VP8L field, 24-bit VP8X canvas fields — ``codec.webp_features``),
    so this runs as an Arrow batch kernel over ``mapInPandas``: the
    binary column is the only extra column the kernel reads, the scan
    prunes everything else, no shuffle.  ``webp_kind`` matters
    downstream — lossless VP8L payloads are disproportionately
    screenshots/diagrams and several training loaders route or
    reject on it; ``webp_alpha`` gates compositing-sensitive uses.
    """
    from scrapely_spark.spark.codec import webp_features

    return _binary_meta_op(images, bytes_col, webp_features, [
        ("webp_w", "int", "Int32"), ("webp_h", "int", "Int32"),
        ("webp_kind", "string", None),
        ("webp_alpha", "boolean", None),
        ("webp_valid", "boolean", None)])


_GIF_FRAMES_COLS = (", gif_w int, gif_h int, n_frames int,"
                    " loop_count int, gif_valid boolean")


def gif_frame_meta(images: DataFrame,
                   bytes_col: str = "bytes") -> DataFrame:
    """GIF frame count + loop semantics off the binary column — the
    third decoder-family sibling (JPEG: :func:`jpeg_dims`, WebP:
    :func:`webp_dims`).

    The frame count lives nowhere in the header: it is the number of
    image descriptors found by walking the block stream to the
    trailer (``codec.gif_frames``), so this is an Arrow batch kernel
    over ``mapInPandas`` — binary column only, scan prunes the rest,
    no shuffle.  ``n_frames > 1`` is the signal that routes animated
    GIFs to the video/frame-sampling pipeline instead of the still
    curation path; ``loop_count`` (NETSCAPE2.0, 0 = forever, NULL =
    play once) distinguishes cinemagraph-style loops from one-shot
    animations.
    """
    from scrapely_spark.spark.codec import gif_frames

    return _binary_meta_op(images, bytes_col, gif_frames, [
        ("gif_w", "int", "Int32"), ("gif_h", "int", "Int32"),
        ("n_frames", "int", "Int32"),
        ("loop_count", "int", "Int32"),
        ("gif_valid", "boolean", None)])


_PNG_META_COLS = (", png_w int, png_h int, bit_depth int,"
                  " color_type int, interlaced boolean,"
                  " n_frames int, png_valid boolean")


def png_chunk_meta(images: DataFrame,
                   bytes_col: str = "bytes") -> DataFrame:
    """PNG chunk-walk metadata off the binary column — the fourth
    decoder-family sibling (JPEG/WebP/GIF walks above).

    :func:`header_dims` reads the fixed-offset IHDR and stops; this
    walk validates every chunk's CRC-32 (corruption surfaces as an
    invalid row, not as garbage dimensions silently entering the
    corpus), reads bit depth / color type / interlace (decode-cost
    and loader-compatibility routing), and finds the APNG ``acTL``
    frame count — animated PNGs route to the frame-sampling path
    exactly like multi-frame GIFs.  Arrow batch kernel, binary column
    only, no shuffle.
    """
    from scrapely_spark.spark.codec import png_meta

    return _binary_meta_op(images, bytes_col, png_meta, [
        ("png_w", "int", "Int32"), ("png_h", "int", "Int32"),
        ("bit_depth", "int", "Int32"),
        ("color_type", "int", "Int32"),
        ("interlaced", "boolean", None),
        ("n_frames", "int", "Int32"),
        ("png_valid", "boolean", None)])


_AVIF_DIMS_COLS = (", avif_w int, avif_h int, brand string,"
                   " avif_valid boolean")


def avif_header_dims(images: DataFrame,
                     bytes_col: str = "bytes") -> DataFrame:
    """AVIF/HEIC dimensions off the binary column — the fifth
    decoder-family sibling, covering the ISOBMFF formats modern CDNs
    serve by default.

    Dimensions live four boxes deep (``meta``/``iprp``/``ipco``/
    ``ispe``), each length-prefixed and two of them fullboxes, so the
    parse is a real recursive box walk (``codec.avif_dims``) with
    sizes validated against the enclosing extent — a hostile length
    can neither overrun nor loop.  Arrow batch kernel, binary column
    only, no shuffle.  ``brand`` (avif vs heic) routes decoder
    selection downstream.
    """
    from scrapely_spark.spark.codec import avif_dims

    return _binary_meta_op(images, bytes_col, avif_dims, [
        ("avif_w", "int", "Int32"), ("avif_h", "int", "Int32"),
        ("brand", "string", None),
        ("avif_valid", "boolean", None)])


_ROUTER_COLS = (", fmt string, w int, h int, n_frames int,"
                " dims_valid boolean")


def image_dims_router(images: DataFrame,
                      bytes_col: str = "bytes") -> DataFrame:
    """One-pass format sniff + dimension parse for every container
    the walks above support — the single operator an ingest pipeline
    actually calls per crawled image.

    Per row: magic-byte dispatch (JPEG SOI / PNG signature / GIF /
    RIFF+WEBP / ISOBMFF ftyp / BMP), then the matching walk —
    ``jpeg_sof``, ``png_meta`` (APNG frames), ``gif_frames``,
    ``webp_features``, ``avif_dims``, or the fixed-offset BMP header.
    Fusing sniff+parse into ONE kernel means one Arrow pass over the
    bytes instead of six format-specific scans, which at 10^10 images
    is the difference between reading the corpus once and reading it
    six times.  ``n_frames > 1`` (GIF/APNG) routes to frame sampling.

    Returns id columns + (fmt, w, h, n_frames, dims_valid); unknown
    magics and failed walks come back fmt NULL / dims_valid false.
    """
    import struct
    from typing import Iterator

    import pandas as pd

    from scrapely_spark.spark.codec import (avif_dims, gif_frames,
                                            jpeg_sof, png_meta,
                                            webp_features)

    def route(b) -> tuple:
        data = bytes(b) if b is not None else b""
        if data[:3] == b"\xff\xd8\xff":
            w, h, _, _, ok = jpeg_sof(data)
            return ("jpeg", w, h, 1 if ok else None, ok)
        if data[:8] == b"\x89PNG\r\n\x1a\n":
            w, h, _, _, _, n, ok = png_meta(data)
            return ("png", w, h, n, ok)
        if data[:6] in (b"GIF87a", b"GIF89a"):
            w, h, n, _, ok = gif_frames(data)
            return ("gif", w, h, n, ok)
        if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
            w, h, _, _, ok = webp_features(data)
            return ("webp", w, h, 1 if ok else None, ok)
        if len(data) >= 12 and data[4:8] == b"ftyp":
            w, h, brand, ok = avif_dims(data)
            return (brand if ok else "avif", w, h,
                    1 if ok else None, ok)
        if data[:2] == b"BM":
            # dims live in the DIB header, whose layout depends on the
            # u32 size field at offset 14: only the INFO family (40 /
            # 52 / 56 / 64 / 108 / 124) carries i32 width/height at
            # 18/22.  A BITMAPCOREHEADER (size 12, u16 fields) or an
            # unknown size would yield garbage through the i32 read,
            # and a non-positive biWidth is malformed — all of those
            # sniff as bmp but report dims_valid=false rather than
            # silently-wrong dimensions.
            if len(data) >= 26:
                dib = struct.unpack_from("<I", data, 14)[0]
                w, h = struct.unpack_from("<ii", data, 18)
                if (dib in (40, 52, 56, 64, 108, 124)
                        and w > 0 and h != 0):
                    return ("bmp", w, abs(h), 1, True)
            return ("bmp", None, None, None, False)
        return (None, None, None, None, False)

    id_cols = [c for c in images.columns if c != bytes_col]
    in_schema = images.select(*id_cols, bytes_col)
    out_fields = (", ".join("%s %s" % (f.name, f.dataType.simpleString())
                            for f in in_schema.schema.fields
                            if f.name != bytes_col) + _ROUTER_COLS)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            metas = [route(b) for b in batch[bytes_col]]
            out = batch[id_cols].copy()
            out["fmt"] = [m[0] for m in metas]
            out["w"] = pd.array([m[1] for m in metas], dtype="Int32")
            out["h"] = pd.array([m[2] for m in metas], dtype="Int32")
            out["n_frames"] = pd.array([m[3] for m in metas],
                                       dtype="Int32")
            out["dims_valid"] = [m[4] for m in metas]
            yield out

    return in_schema.mapInPandas(kernel, out_fields)


def video_near_dups(frames: DataFrame, max_hamming: int = 3,
                    n_chunks: int = 4, min_match_frames: int = 2,
                    max_bucket: int = 2048) -> DataFrame:
    """Video near-duplicate pairs from sampled-frame perceptual
    hashes — the video extension of :func:`phash_near_dups`.

    Input: one row per sampled frame ``(video_id, frame_idx, phash)``
    (what :func:`frame_sample` + :func:`frame_phashes` produce).  Two
    videos are near-duplicates when at least ``min_match_frames`` of
    their ALIGNED frames (same sample index — re-encodes and quality
    ladders preserve timing) hash within ``max_hamming``; requiring
    multiple agreeing frames is what keeps a shared title card or
    black frame from pairing every video in the corpus.

    Scale shape: the same pigeonhole banding guarantee as the image
    path (``max_hamming <= n_chunks-1`` ⇒ recall 1.0), with
    ``frame_idx`` folded into the band key — candidates only ever form
    between frames at the same position, so the blowup of a popular
    hash is bounded per position and capped by ``max_bucket``; the
    exact ``bit_count(xor)`` verify runs on the capped candidate set;
    the final per-pair aggregate is one slim (va, vb) shuffle.  Never
    video×video.

    Returns (va, vb, n_matching_frames, best_hamming).
    """
    _check_banding(max_hamming, n_chunks)
    banded = frames.select(
        "video_id", "frame_idx", "phash",
        F.explode(_chunk_structs("phash", n_chunks)).alias("c")) \
        .select("video_id", "frame_idx", "phash",
                F.col("c.chunk_idx").alias("chunk_idx"),
                F.col("c.chunk_val").alias("chunk_val"))
    from scrapely_spark.spark.dedup import _cap_buckets

    key = ["frame_idx", "chunk_idx", "chunk_val"]
    # the shared window-based cap: its hash partitioning is the same
    # one the self-join below needs, so AQE reuses the exchange
    capped = _cap_buckets(banded, key, max_bucket)
    a = capped.select(*key, F.col("video_id").alias("va"),
                      F.col("phash").alias("ha"))
    b = capped.select(*key, F.col("video_id").alias("vb"),
                      F.col("phash").alias("hb"))
    pairs = (a.join(b, key)
             .where(F.col("va") < F.col("vb"))
             .select("frame_idx", "va", "vb", "ha", "hb")
             .distinct()
             .where(F.expr("bit_count(ha ^ hb)") <= max_hamming))
    return (pairs.groupBy("va", "vb")
            .agg(F.count(F.lit(1)).alias("n_matching_frames"),
                 F.min(F.expr("bit_count(ha ^ hb)"))
                 .alias("best_hamming"))
            .where(F.col("n_matching_frames") >= min_match_frames)
            .select("va", "vb",
                    F.col("n_matching_frames").cast("long")
                    .alias("n_matching_frames"),
                    F.col("best_hamming").cast("int")
                    .alias("best_hamming")))


# safety blocklist: category → marker terms.  Deliberately mild
# placeholder vocabulary (the real deployment swaps in a curated
# list); the TABLE is the spec, shared verbatim with the DuckDB
# oracle, and the matching semantics — lowercased, word-boundary,
# category-counted — are what the operator actually tests.
SAFETY_BLOCKLIST = {
    "violence": ("gore", "beheading", "massacre"),
    "adult": ("explicit", "nsfw", "xxx"),
    "hate": ("slur", "supremacist"),
    "drugs": ("narcotics", "overdose"),
}
#: categories whose ANY hit drops the pair outright; the rest flag
#: for human review
SAFETY_DROP_CATEGORIES = ("adult", "hate")


def caption_safety_gate(pairs: DataFrame,
                        caption_col: str = "caption") -> DataFrame:
    """Caption safety screening — the blocklist stage every public
    image-caption curation pipeline runs (the LAION-class releases
    gate on exactly this before any model-based scorer, because a
    word-boundary scan is free at scan time while a classifier pass
    over 10^10 captions is a fleet-week).

    Per caption: lowercased word-boundary matches counted per
    category (``\\b`` anchored — "classification" must never hit a
    4-letter term inside it), then routed: any hit in a
    :data:`SAFETY_DROP_CATEGORIES` category → ``drop``; hits only in
    the remaining categories → ``review``; clean → ``keep``.  The
    per-category counts are kept — governance wants the audit
    distribution, not just the verdict.

    Plan: shuffle-free single Project, pure JVM regexp inside the
    scan's codegen stage; composes in front of
    :func:`curate_image_captions` / :func:`image_corpus_build`.

    Returns input columns + one ``n_<category>`` count per category +
    (safety_action ∈ keep|review|drop).
    """
    import re as _re

    low = F.lower(F.col(caption_col))
    counts = {}
    for cat, terms in SAFETY_BLOCKLIST.items():
        # escape: a curated swap-in list may carry regex metachars;
        # matching must stay literal (the oracle spells terms
        # literally too)
        pat = r"\b(?:%s)\b" % "|".join(_re.escape(t) for t in terms)
        counts[cat] = F.size(
            F.regexp_extract_all(low, F.lit(pat), F.lit(0)))
    drop = F.lit(False)
    for cat in SAFETY_DROP_CATEGORIES:
        drop = drop | (counts[cat] > 0)
    review = F.lit(False)
    for cat in SAFETY_BLOCKLIST:
        if cat not in SAFETY_DROP_CATEGORIES:
            review = review | (counts[cat] > 0)
    action = (F.when(drop, F.lit("drop"))
              .when(review, F.lit("review"))
              .otherwise(F.lit("keep")))
    return pairs.select(
        *pairs.columns,
        *[counts[c].cast("int").alias("n_%s" % c)
          for c in SAFETY_BLOCKLIST],
        action.alias("safety_action"))
