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
- format sniffing, image dimensions AND wav audio metadata are REAL
  byte parsing (PNG IHDR, GIF logical screen descriptor, JPEG SOFn
  scan, RIFF fmt/data chunk walk — no codec library needed); only
  pixel-level statistics (mean_luma), compressed-audio frames (mp3) and
  video frame decode remain stubbed behind a deterministic fake, since
  the actual codecs (PIL/librosa/av) are not in this container
  (``use_real_codecs=True`` raises NotImplementedError). The Spark-side
  contract — schemas, batch iteration, partitioning — is real and
  tested.

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
    # raw MPEG audio without an ID3 tag: 11-bit frame sync
    if len(payload) >= 2 and payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0:
        return ("audio", "mp3")
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


def _jpeg_dimensions(b: bytes) -> tuple[int, int] | None:
    """Walk JPEG segments to the first SOFn frame header (C0-CF except
    the non-frame C4/C8/CC): height/width are big-endian u16 at offsets
    +5/+7 from the marker (after the 2-byte length and 1-byte sample
    precision)."""
    i, n = 2, len(b)
    while i + 9 <= n:
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # standalone
            i += 2
            continue
        if i + 4 > n:
            return None
        seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 > n:
                return None
            height = struct.unpack(">H", b[i + 5 : i + 7])[0]
            width = struct.unpack(">H", b[i + 7 : i + 9])[0]
            return (width, height)
        i += 2 + seg_len
    return None


def parse_image_dimensions(payload: bytes) -> tuple[int, int] | None:
    """(width, height) by REAL header parsing — PNG IHDR, GIF logical
    screen descriptor, JPEG SOFn — pure stdlib byte inspection, no codec
    library. None when the payload isn't a recognized image or is
    truncated before its header."""
    if (
        payload.startswith(b"\x89PNG\r\n\x1a\n")
        and len(payload) >= 24
        and payload[12:16] == b"IHDR"
    ):
        w, h = struct.unpack(">II", payload[16:24])
        return (w, h)
    if payload.startswith(b"GIF8") and len(payload) >= 10:
        w, h = struct.unpack("<HH", payload[6:10])
        return (w, h)
    if payload.startswith(b"\xff\xd8\xff"):
        return _jpeg_dimensions(payload)
    return None


def _fake_decode_image(payload: bytes) -> dict[str, Any]:
    """Image features: REAL header-derived width/height where the bytes
    carry them (parse_image_dimensions); only mean_luma — which needs
    actual pixel decode — is a deterministic hash-derived fake, replaced
    by PIL in a real deployment."""
    h = hashlib.sha256(payload).digest()
    dims = parse_image_dimensions(payload)
    if dims is None:  # unrecognized/truncated header: stable pseudo-dims
        dims = (
            64 + struct.unpack(">H", h[0:2])[0] % 1984,  # 64..2047
            64 + struct.unpack(">H", h[2:4])[0] % 1984,
        )
    mean_luma = h[4] / 255.0
    return {"width": dims[0], "height": dims[1], "mean_luma": mean_luma}


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


def parse_mp4_mvhd(payload: bytes) -> dict[str, int | float] | None:
    """ISO BMFF box walk to moov/mvhd — REAL byte parsing, no codec:
    (timescale, duration_units, duration_seconds). Top-level boxes are
    (uint32 size, 4cc type); the movie header lives at moov/mvhd with
    version 0 (32-bit times, offset 12/16 past the version byte) or
    version 1 (64-bit). None when no mvhd is present (e.g. a bare ftyp
    fragment or a truncated stream)."""

    def walk(buf: bytes, want: bytes) -> bytes | None:
        i, n = 0, len(buf)
        while i + 8 <= n:
            (size,) = struct.unpack(">I", buf[i : i + 4])
            box = buf[i + 4 : i + 8]
            if size < 8:
                return None
            if box == want:
                return buf[i + 8 : i + size]
            i += size
        return None

    moov = walk(payload, b"moov")
    if moov is None:
        return None
    mvhd = walk(moov, b"mvhd")
    if mvhd is None or len(mvhd) < 4:
        return None
    version = mvhd[0]
    if version == 0 and len(mvhd) >= 20:
        timescale, duration = struct.unpack(">II", mvhd[12:20])
    elif version == 1 and len(mvhd) >= 32:
        (timescale,) = struct.unpack(">I", mvhd[20:24])
        (duration,) = struct.unpack(">Q", mvhd[24:32])
    else:
        return None
    return {
        "timescale": timescale,
        "duration_units": duration,
        "duration_seconds": round(duration / timescale, 6) if timescale else None,
    }


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


VIDEO_FEATURE_SCHEMA = (
    "asset_id string, format string, timescale int, "
    "duration_seconds double, n_bytes long"
)


def decode_video_features(assets: DataFrame) -> DataFrame:
    """Video container metadata as a ``mapInPandas`` stage: the mvhd
    timescale/duration box walk is REAL (``parse_mp4_mvhd``); streams
    without a moov box (fragments, truncations) report nulls. Actual
    frame DECODING stays behind the codec boundary — see
    ``sample_video_frames`` for the explode-shaped stub."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    continue
                payload = bytes(payload)
                modality, fmt = sniff_format(payload)
                if modality != "video":
                    continue
                hdr = parse_mp4_mvhd(payload)
                rows.append(
                    {
                        "asset_id": asset_id,
                        "format": fmt,
                        "timescale": hdr["timescale"] if hdr else None,
                        "duration_seconds": (
                            hdr["duration_seconds"] if hdr else None
                        ),
                        "n_bytes": len(payload),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "format", "timescale",
                    "duration_seconds", "n_bytes",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        batches, VIDEO_FEATURE_SCHEMA
    )


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


def parse_wav_header(payload: bytes) -> dict[str, int] | None:
    """Canonical-WAV fmt/data chunk walk — REAL byte parsing, no codec:
    (n_channels, sample_rate, bits_per_sample, n_data_bytes). None when
    the payload isn't RIFF/WAVE or the fmt chunk is truncated."""
    if len(payload) < 12 or payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i, n = 12, len(payload)
    fmt = None
    data_bytes = None
    while i + 8 <= n:
        cid = payload[i : i + 4]
        (clen,) = struct.unpack("<I", payload[i + 4 : i + 8])
        body = payload[i + 8 : i + 8 + clen]
        if cid == b"fmt " and len(body) >= 16:
            channels, rate = struct.unpack("<HI", body[2:8])
            (bits,) = struct.unpack("<H", body[14:16])
            fmt = (channels, rate, bits)
        elif cid == b"data":
            data_bytes = clen
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None:
        return None
    channels, rate, bits = fmt
    return {
        "n_channels": channels,
        "sample_rate": rate,
        "bits_per_sample": bits,
        "n_data_bytes": data_bytes if data_bytes is not None else 0,
    }


# MPEG audio frame tables (ISO/IEC 11172-3 / 13818-3, public): Layer III
# bitrates in kbps by (version-group, index) and sample rates by
# (version, index). Index 0 is "free format", 15 invalid.
_MP3_BITRATES_V1 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_MP3_BITRATES_V2 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}


def parse_mp3_frames(payload: bytes) -> dict[str, int | float] | None:
    """Layer III frame walk — REAL byte parsing, no codec: skip any ID3v2
    tag (syncsafe length), then step frame-by-frame through the headers
    (sync, version, bitrate/samplerate indices, padding), summing
    per-frame sample counts into a duration. None when no valid Layer
    III frame is found. VBR streams are handled naturally (each frame
    carries its own bitrate; ``bitrate_kbps`` reports the first frame's)."""
    i, n = 0, len(payload)
    if payload[:3] == b"ID3" and n >= 10:
        size = (
            (payload[6] & 0x7F) << 21 | (payload[7] & 0x7F) << 14
            | (payload[8] & 0x7F) << 7 | (payload[9] & 0x7F)
        )
        i = 10 + size
    n_frames = 0
    duration = 0.0
    first = None
    while i + 4 <= n:
        if payload[i] != 0xFF or (payload[i + 1] & 0xE0) != 0xE0:
            break
        version = (payload[i + 1] >> 3) & 0x3   # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        layer = (payload[i + 1] >> 1) & 0x3     # 1 = Layer III
        br_idx = (payload[i + 2] >> 4) & 0xF
        sr_idx = (payload[i + 2] >> 2) & 0x3
        padding = (payload[i + 2] >> 1) & 0x1
        mode = (payload[i + 3] >> 6) & 0x3      # 3 = mono
        if version == 1 or layer != 1 or br_idx in (0, 15) or sr_idx == 3:
            break
        bitrate = (
            _MP3_BITRATES_V1 if version == 3 else _MP3_BITRATES_V2
        )[br_idx] * 1000
        rate = _MP3_RATES[version][sr_idx]
        samples = 1152 if version == 3 else 576
        frame_len = samples // 8 * bitrate // rate + padding
        if frame_len <= 4:
            break
        if first is None:
            first = (1 if mode == 3 else 2, rate, bitrate // 1000)
        n_frames += 1
        duration += samples / rate
        i += frame_len
    if first is None:
        return None
    channels, rate, kbps = first
    return {
        "n_channels": channels,
        "sample_rate": rate,
        "bitrate_kbps": kbps,
        "n_frames": n_frames,
        "duration_seconds": round(duration, 6),
    }


AUDIO_FEATURE_SCHEMA = (
    "asset_id string, format string, n_channels int, sample_rate int, "
    "bits_per_sample int, duration_seconds double, n_bytes long"
)


def decode_audio_features(assets: DataFrame) -> DataFrame:
    """Audio metadata as a ``mapInPandas`` stage. WAV headers AND mp3
    Layer III frame walks are parsed for REAL (WAV: duration = data
    bytes / byte rate; mp3: per-frame sample counts summed across the
    frame sequence — VBR-correct). Only actual sample DECODING remains
    outside scope (needs a codec library this environment lacks)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    continue
                payload = bytes(payload)
                modality, fmt = sniff_format(payload)
                if modality != "audio":
                    continue
                row = {
                    "asset_id": asset_id,
                    "format": fmt,
                    "n_channels": None,
                    "sample_rate": None,
                    "bits_per_sample": None,
                    "duration_seconds": None,
                    "n_bytes": len(payload),
                }
                if fmt == "mp3" and (mp3 := parse_mp3_frames(payload)):
                    row.update(
                        n_channels=mp3["n_channels"],
                        sample_rate=mp3["sample_rate"],
                        bits_per_sample=None,  # compressed: no PCM width
                        duration_seconds=mp3["duration_seconds"],
                    )
                elif fmt == "wav" and (hdr := parse_wav_header(payload)):
                    byte_rate = (
                        hdr["sample_rate"]
                        * hdr["n_channels"]
                        * max(hdr["bits_per_sample"], 1)
                        // 8
                    )
                    row.update(
                        n_channels=hdr["n_channels"],
                        sample_rate=hdr["sample_rate"],
                        bits_per_sample=hdr["bits_per_sample"],
                        duration_seconds=(
                            round(hdr["n_data_bytes"] / byte_rate, 6)
                            if byte_rate
                            else None
                        ),
                    )
                rows.append(row)
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "format", "n_channels", "sample_rate",
                    "bits_per_sample", "duration_seconds", "n_bytes",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        batches, AUDIO_FEATURE_SCHEMA
    )
