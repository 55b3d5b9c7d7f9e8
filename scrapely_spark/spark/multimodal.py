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
* :func:`frame_sample`   — video stand-in: STUB (raises NotImplementedError
  at the decode step; the operator shape is the deliverable).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

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
                rows.append({
                    "image_id": image_id, "w": w, "h": h, "fmt": fmt,
                    "mean_luma": round(luma, 4),
                    "phash_match":
                        codec.average_hash(pixels) == int(phash)
                        if fmt == "png" else None,
                })
            yield pd.DataFrame(rows, columns=[
                "image_id", "w", "h", "fmt", "mean_luma", "phash_match"])

    return images.select("image_id", "bytes", "phash") \
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


_FRAME_SCHEMA = ("video_id string, frame_index int, frame_bytes binary")


def frame_sample(videos: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling operator (STUB at the decode boundary).

    The operator contract — explode each video into sampled frames as
    binary rows — is real; decoding requires ffmpeg/pyav, absent here.
    """
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if len(batch):
                raise NotImplementedError(
                    "video decode requires ffmpeg/pyav, not available in "
                    "this environment; plug the decoder in here")
            yield pd.DataFrame(
                columns=["video_id", "frame_index", "frame_bytes"])

    return videos.mapInPandas(kernel, _FRAME_SCHEMA)
