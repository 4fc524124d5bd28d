"""Unit tests: declarative metric specs (A1/A2 parity) and the multimodal
mapInPandas plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from numalogic_prometheus_spark.operators import multimodal as MM
from numalogic_prometheus_spark.operators.specs import (
    MetricSpec,
    build_metric_query,
    parse_spec,
    register_metric,
)


@pytest.fixture()
def samples(spark):
    return spark.createDataFrame(
        [("error", "13", 1.5, 1), ("error", "13", 2.5, 2), ("ok", "7", 9.0, 3)],
        "event_type string, user_id string, value double, ts long",
    )


def test_spec_dispatch_counter(samples):
    spec = parse_spec(
        {"type": "counter", "name": "events_total", "label_keys": ["event_type"]}
    )
    out = {r["event_type"]: r for r in build_metric_query(spec, samples).collect()}
    assert out["error"]["total"] == 4.0 and out["error"]["n_samples"] == 2


def test_spec_unknown_type_raises():
    # parity with reference utility.py:55
    with pytest.raises(ValueError, match="Unknown metric type"):
        MetricSpec(metric_type="exotic", name="x")


def test_spec_registration_in_catalog(spark, samples):
    spec = parse_spec(
        {"type": "gauge", "name": "g1", "label_keys": ["user_id"]}
    )
    register_metric(spec, samples)
    got = spark.table("metric_g1").collect()
    assert {r["user_id"]: r["gauge_value"] for r in got} == {"13": 2.5, "7": 9.0}


def test_multimodal_decode_roundtrip(spark):
    df = spark.createDataFrame(
        [(0, "hello world"), (1, "aaaa"), (2, "x" * 300)], "doc_id long, text string"
    )
    assets = MM.synthesize_assets(df, "doc_id", "text")
    feats = {r["asset_id"]: r for r in MM.decode_features(assets).collect()}
    assert feats[0]["n_bytes"] == 11
    assert feats[1]["n_bytes"] == 4
    # media_type cycles image/audio/video by id
    assert feats[0]["media_type"] == "image"
    assert feats[1]["media_type"] == "audio"
    assert feats[2]["media_type"] == "video"
    assert feats[2]["frame_count"] == 300 // 64
    # deterministic byte stats survive the Arrow round-trip
    assert feats[1]["byte_mean"] == pytest.approx(97.0)
    assert feats[1]["byte_entropy_proxy"] == round(1 / 256, 6)  # codec rounds to 6dp


def test_multimodal_resize_stub(spark):
    df = spark.createDataFrame([(0, "z" * 100)], "doc_id long, text string")
    assets = MM.synthesize_assets(df, "doc_id", "text")
    resized = MM.resize_stub(assets, 32, 24).collect()[0]
    assert resized["width"] == 32 and resized["height"] == 24
    assert len(resized["payload"]) == 50


def test_multimodal_frame_sample(spark):
    # ids 2 and 5 are video (id % 3 == 2); payloads of 200 and 40 bytes
    df = spark.createDataFrame(
        [(2, "v" * 200), (5, "w" * 40), (0, "image-not-sampled" * 10)],
        "doc_id long, text string",
    )
    assets = MM.synthesize_assets(df, "doc_id", "text")
    frames = MM.frame_sample(assets, frame_size=32, every=2).collect()
    by_asset = {}
    for r in frames:
        by_asset.setdefault(r["asset_id"], []).append(r)
    # only videos are demuxed
    assert set(by_asset) == {2, 5}
    # 200 bytes / 32 = 6 frames, every 2nd → idx 0,2,4
    assert [r["frame_idx"] for r in sorted(by_asset[2], key=lambda r: r["frame_idx"])] == [0, 2, 4]
    assert all(r["frame_offset"] == r["frame_idx"] * 32 for r in by_asset[2])
    # full frames are 32 bytes; the tail frame of asset 2 (idx 4: bytes
    # 128..160) is still complete at 200 bytes payload
    assert all(r["frame_bytes"] == 32 for r in by_asset[2])
    # 40 bytes → 1 frame, idx 0, 32 bytes captured
    assert len(by_asset[5]) == 1 and by_asset[5][0]["frame_bytes"] == 32
    # checksum of 'v'*32 = 118*32 mod 65536
    assert by_asset[2][0]["frame_checksum"] == (118 * 32) % 65536
