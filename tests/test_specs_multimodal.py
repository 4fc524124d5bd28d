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


def test_unified_decode_dispatches_to_real_codecs(spark):
    """Round 14: the unified seam runs the REAL codec of each modality
    and the features are exact integers recomputable from the closed
    forms — checked here end-to-end through the Arrow path against an
    independent numpy recomputation."""
    import numpy as np

    doc_ids = [0, 1, 2, 3, 4, 5, 100]
    df = spark.createDataFrame([(d,) for d in doc_ids], "doc_id long")
    feats = {
        r["doc_id"]: r for r in MM.unified_decode_features(df).collect()
    }
    assert set(feats) == set(doc_ids)
    for d in doc_ids:
        mt_expect = MM.UNIFIED_MEDIA[d % 3]
        assert feats[d]["media_type"] == mt_expect
        # independent recomputation of the decoded stream
        if d % 3 == 0:
            n = 160 + (d % 97) * 16
            i = np.arange(n, dtype=np.int64)
            v = (d * 7919 + i * 104729) % 65536 - 32768
        elif d % 3 == 1:
            w, h = 8 + (d % 13) * 2, 8 + (d % 7) * 2
            y = np.arange(h)[:, None, None]
            x = np.arange(w)[None, :, None]
            c = np.arange(3)[None, None, :]
            v = ((d * 4099 + y * 131 + x * 17 + c * 59) % 256).reshape(-1)
        else:
            w, h = 8 + (d % 11) * 2, 8 + (d % 6) * 2
            ncol = 1 << (2 + d % 5)
            y = np.arange(h)[:, None]
            x = np.arange(w)[None, :]
            j = ((d * 31 + y * 7 + x * 3) % ncol)[:, :, None]
            chan = np.stack(
                [
                    (d * 5 + j[..., 0] * 41) % 256,
                    (d * 11 + j[..., 0] * 23) % 256,
                    (d * 17 + j[..., 0] * 59) % 256,
                ],
                axis=2,
            )
            v = chan.reshape(-1)
        pos = np.arange(1, len(v) + 1, dtype=np.int64)
        row = feats[d]
        assert row["n_values"] == len(v)
        assert row["sum_vals"] == int(v.sum())
        assert row["sum_sq"] == int((v * v).sum())
        assert row["peak"] == int(np.abs(v).max())
        assert row["pos_checksum"] == int((pos * v).sum())


def test_video_frame_sample_cadence_and_parity(spark):
    """Round 14: sampled demux over real containers — even docs APNG,
    odd docs AVI/MJPEG; only frames t % every == 0 appear, and each
    sampled row equals the corresponding full-decode frame."""
    import numpy as np

    doc_ids = [0, 1, 2, 3, 6, 7]
    df = spark.createDataFrame([(d,) for d in doc_ids], "doc_id long")
    rows = MM.video_frame_sample(df, every=2).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(doc_ids)
    for d in doc_ids:
        got = sorted(by_doc[d], key=lambda r: r["frame_idx"])
        if d % 2 == 0:
            nf = 2 + d % 4
            assert all(r["media_type"] == "video/apng" for r in got)
            _w, _h, full = MM.decode_apng(MM.synthesize_apng(d))
            frames = {t: pix.reshape(-1) for t, (_dn, pix) in enumerate(full)}
        else:
            nf = 2 + d % 3
            assert all(r["media_type"] == "video/avi-mjpeg" for r in got)
            _w, _h, full = MM.decode_avi_mjpeg(MM.synthesize_avi(d))
            frames = {
                t: np.concatenate([b[k] for k in sorted(b)])
                for t, b in enumerate(full)
            }
        assert [r["frame_idx"] for r in got] == list(range(0, nf, 2))
        for r in got:
            v = frames[r["frame_idx"]]
            pos = np.arange(1, len(v) + 1, dtype=np.int64)
            assert r["n_values"] == len(v)
            assert r["sum_vals"] == int(v.sum())
            assert r["sum_sq"] == int((v * v).sum())
            assert r["peak"] == int(np.abs(v).max())
            assert r["pos_checksum"] == int((pos * v).sum())
