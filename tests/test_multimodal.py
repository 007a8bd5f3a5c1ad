"""Multimodal plumbing: binaryFile ingestion, magic sniffing, Pandas-UDF
decode/frame-sample stages over binary columns."""

from __future__ import annotations

import struct

import pytest

from sec_financial_data_pipeline_using_snowflake_dbt_spark.operators import (
    multimodal as MM,
)


def _png(n: int = 100) -> bytes:
    return b"\x89PNG\r\n\x1a\n" + bytes([n % 256]) * n


def _jpeg(n: int = 80) -> bytes:
    return b"\xff\xd8\xff\xe0" + bytes([n % 251]) * n


def _wav(n: int = 64) -> bytes:
    return b"RIFF" + struct.pack("<I", n) + b"WAVE" + b"\x00" * n


def _mp4(n: int = 16384) -> bytes:
    return b"\x00\x00\x00\x18ftypmp42" + bytes([(i * 7) % 256 for i in range(n)])


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    (d / "a.png").write_bytes(_png())
    (d / "b.jpg").write_bytes(_jpeg())
    (d / "c.wav").write_bytes(_wav())
    (d / "d.mp4").write_bytes(_mp4())
    (d / "e.txt").write_bytes(b"not media")
    return str(d)


@pytest.fixture(scope="module")
def assets(spark, media_dir):
    files = spark.read.format("binaryFile").load(media_dir)
    return MM.pack_assets(files).cache()


def test_pack_assets_schema(assets):
    assert dict(assets.dtypes)["payload"] == "binary"
    assert assets.count() == 5
    meta = assets.select("meta.n_bytes", "meta.content_hash").first()
    assert meta.n_bytes > 0 and len(meta.content_hash) == 32


def test_classify_modality(assets):
    mods = {
        r.format: r.modality for r in MM.classify_modality(assets).collect()
    }
    assert mods["png"] == "image"
    assert mods["jpeg"] == "image"
    assert mods["wav"] == "audio"
    assert mods["mp4"] == "video"
    assert mods["unknown"] == "unknown"


def test_decode_image_features(assets):
    feats = MM.decode_image_features(assets)
    rows = feats.collect()
    assert {r.format for r in rows} == {"png", "jpeg"}  # only images decoded
    for r in rows:
        assert 64 <= r.width <= 2047 and 64 <= r.height <= 2047
        assert 0.0 <= r.mean_luma <= 1.0
    # determinism: same payloads → same features
    again = {r.asset_id: (r.width, r.height) for r in MM.decode_image_features(assets).collect()}
    assert again == {r.asset_id: (r.width, r.height) for r in rows}


def test_real_codecs_stubbed(assets):
    with pytest.raises(NotImplementedError, match="Pillow"):
        MM.decode_image_features(assets, use_real_codecs=True)


def test_sample_video_frames(assets):
    frames = MM.sample_video_frames(assets).collect()
    assert len(frames) == 4  # 16 KiB payload / 4 KiB windows, capped at 8
    assert {f.frame_index for f in frames} == {0, 1, 2, 3}
    assert all(len(f.frame_hash) == 32 for f in frames)


def test_metadata_query_prunes_payload(assets, spark, media_dir):
    """Column pruning: a metadata-only query over the asset parquet must
    not read payload bytes (ReadSchema excludes it)."""
    out = media_dir + "_parquet"
    assets.write.mode("overwrite").parquet(out)
    q = spark.read.parquet(out).select("asset_id", "meta.n_bytes")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan
