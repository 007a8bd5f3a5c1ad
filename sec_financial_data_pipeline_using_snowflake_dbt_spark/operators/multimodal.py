"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched Pandas UDFs.

This is the 100 TB-scale plumbing for multimodal training data:

- assets are rows of (id, modality, payload binary, meta struct) —
  storable in Parquet, splittable, column-pruned (a metadata-only query
  never reads the payload bytes);
- decode / feature-extract / resize / frame-sample run as
  ``mapInPandas`` stages: per-partition Arrow batches, no per-row
  Python overhead, memory bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch``;
- real codecs (PIL/librosa/av) are not in this container, so decoding
  is STUBBED: header-sniffing + a deterministic fake decoder behind
  ``use_real_codecs`` (raises NotImplementedError when requested). The
  Spark-side contract — schemas, batch iteration, partitioning — is
  real and tested.

``spark.read.format("binaryFile")`` is the ingestion path for loose
files (reference's S2 ZIP-extract analogue for media); ``pack_assets``
builds the asset table from it.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source_path", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("content_hash", T.StringType()),
                ]
            ),
        ),
    ]
)

# magic-byte sniffing — real, not stubbed (pure byte inspection)
_MAGICS: list[tuple[bytes, str, str]] = [
    (b"\x89PNG\r\n\x1a\n", "image", "png"),
    (b"\xff\xd8\xff", "image", "jpeg"),
    (b"GIF8", "image", "gif"),
    (b"RIFF", "audio", "wav"),  # RIFF....WAVE checked below
    (b"ID3", "audio", "mp3"),
    (b"\x00\x00\x00", "video", "mp4"),  # ftyp at offset 4 checked below
]


def sniff_format(payload: bytes | None) -> tuple[str, str]:
    if not payload:
        return ("unknown", "empty")
    for magic, modality, fmt in _MAGICS:
        if payload.startswith(magic):
            if fmt == "wav" and payload[8:12] != b"WAVE":
                continue
            if fmt == "mp4" and payload[4:8] != b"ftyp":
                continue
            return (modality, fmt)
    return ("unknown", "unknown")


def pack_assets(binary_files: DataFrame) -> DataFrame:
    """binaryFile-source rows → the asset table. Column expressions only."""
    return binary_files.select(
        F.md5(F.col("path")).alias("asset_id"),
        F.lit("unknown").alias("modality"),
        F.col("content").alias("payload"),
        F.struct(
            F.col("path").alias("source_path"),
            F.length(F.col("content")).cast("long").alias("n_bytes"),
            F.md5(F.col("content")).alias("content_hash"),
        ).alias("meta"),
    )


def _fake_decode_image(payload: bytes) -> dict[str, Any]:
    """Deterministic fake decoder: derives stable pseudo-dimensions and a
    luma statistic from the payload hash. Replaced by PIL in a real
    deployment; the schema and batch shape are the contract."""
    h = hashlib.sha256(payload).digest()
    w = 64 + struct.unpack(">H", h[0:2])[0] % 1984  # 64..2047
    ht = 64 + struct.unpack(">H", h[2:4])[0] % 1984
    mean_luma = h[4] / 255.0
    return {"width": w, "height": ht, "mean_luma": mean_luma}


IMAGE_FEATURE_SCHEMA = (
    "asset_id string, format string, width int, height int, "
    "mean_luma double, n_bytes long"
)


def decode_image_features(
    assets: DataFrame, use_real_codecs: bool = False
) -> DataFrame:
    """Image decode + feature extraction as a ``mapInPandas`` stage.

    Arrow ships (asset_id, payload) batches to Python; each batch is
    processed vectorized-per-row inside pandas (the codec call is
    per-image regardless of engine). Only image-modality or
    unknown-but-image-magic payloads are decoded.
    """
    if use_real_codecs:
        try:
            import PIL  # noqa: F401
        except ImportError:
            raise NotImplementedError(
                "real image decoding needs Pillow, which is not in this "
                "environment; run with use_real_codecs=False for the "
                "deterministic stub"
            ) from None

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    continue
                payload = bytes(payload)
                modality, fmt = sniff_format(payload)
                if modality != "image":
                    continue
                feats = _fake_decode_image(payload)
                rows.append(
                    {
                        "asset_id": asset_id,
                        "format": fmt,
                        "width": feats["width"],
                        "height": feats["height"],
                        "mean_luma": feats["mean_luma"],
                        "n_bytes": len(payload),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "format", "width", "height", "mean_luma", "n_bytes",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        batches, IMAGE_FEATURE_SCHEMA
    )


FRAME_SCHEMA = "asset_id string, frame_index long, frame_hash string"


def sample_video_frames(
    assets: DataFrame, every_n_bytes: int = 4096, max_frames: int = 8
) -> DataFrame:
    """Frame sampling stub: emits one row per sampled "frame" (a byte
    window stands in for a decoded frame). The real implementation swaps
    the window slice for an ``av``-decoded frame; the explode shape —
    one asset row fanning out to k frame rows inside mapInPandas — is
    the part that matters for the pipeline."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    continue
                payload = bytes(payload)
                if sniff_format(payload)[0] != "video":
                    continue
                for i in range(min(max_frames, max(1, len(payload) // every_n_bytes))):
                    window = payload[i * every_n_bytes : (i + 1) * every_n_bytes]
                    rows.append(
                        {
                            "asset_id": asset_id,
                            "frame_index": i,
                            "frame_hash": hashlib.md5(window).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_index", "frame_hash"]
            )

    return assets.select("asset_id", "payload").mapInPandas(batches, FRAME_SCHEMA)


def classify_modality(assets: DataFrame) -> DataFrame:
    """Fill the modality column by magic-byte sniffing (mapInPandas —
    byte slicing is awkward in Column expressions; the batch-wise UDF
    reads only the first bytes of each payload)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mods, fmts = [], []
            for payload in pdf["payload"]:
                m, f_ = sniff_format(bytes(payload) if payload is not None else None)
                mods.append(m)
                fmts.append(f_)
            out = pdf[["asset_id"]].copy()
            out["modality"] = mods
            out["format"] = fmts
            yield out

    return assets.select("asset_id", "payload").mapInPandas(
        batches, "asset_id string, modality string, format string"
    )
