"""Multimodal column operators ([north-star]: image/audio/video as opaque
binary columns with typed metadata, decode/feature-extract as Arrow-batched
mapInPandas).

The container has no image/audio codecs, so the decode kernel is a
deterministic fake (documented below) behind the SAME plumbing a real
codec would use: binary in → fixed-schema feature struct out, batch-wise
over Arrow record batches. Swapping `_fake_decode_features` for a
PIL/torchaudio kernel changes zero Spark-side code — schema, partitioning,
UDF signature and batch shape are the real contract being tested.

Scale posture: decode is the classic CPU-heavy map-only stage — no
shuffle, embarrassingly parallel, Arrow-batched to amortize Python
transfer. `spark.sql.execution.arrow.maxRecordsPerBatch` is the knob that
sizes decode batches against executor memory when payloads are MBs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata the binary payload carries (media_type discriminates the
# decode path, like a content-type header).
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = (
    "asset_id long, media_type string, n_bytes long, "
    "byte_mean double, byte_entropy_proxy double, frame_count int"
)


def synthesize_assets(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Derive a deterministic binary-asset relation from a text fixture:
    payload = utf-8 bytes of the text, media_type cycles image/audio/video.
    Stands in for `spark.read.format('binaryFile')` over an object store."""
    media = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return df.select(
        F.col(id_col).alias("asset_id"),
        media.alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.when(F.col(id_col) % 3 == 0, F.lit(64)).cast("int").alias("width"),
        F.when(F.col(id_col) % 3 == 0, F.lit(48)).cast("int").alias("height"),
        F.when(F.col(id_col) % 3 == 1, F.lit(16000)).cast("int").alias("sample_rate"),
    )


def _fake_decode_features(payload: bytes, media_type: str) -> dict:
    """Deterministic stand-in for a real decoder.

    A real implementation would be, e.g.::

        img = PIL.Image.open(io.BytesIO(payload))   # NotImplementedError:
        ...                                         # codecs absent in env

    The fake derives stable per-payload statistics so tests can assert
    exact values end-to-end through the Arrow path.
    """
    if payload is None:
        return {"n_bytes": 0, "byte_mean": 0.0, "byte_entropy_proxy": 0.0,
                "frame_count": 0}
    n = len(payload)
    mean = sum(payload) / n if n else 0.0
    distinct = len(set(payload))
    frames = {"image": 1, "audio": n // 256, "video": n // 64}.get(media_type, 0)
    return {
        "n_bytes": n,
        "byte_mean": round(mean, 6),
        "byte_entropy_proxy": round(distinct / 256.0, 6),
        "frame_count": frames,
    }


def decode_features(assets: DataFrame) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow batch iterator in,
    typed batches out) — the real multimodal seam."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode_features(p, m)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "asset_id", pdf["asset_id"].values)
            out.insert(1, "media_type", pdf["media_type"].values)
            yield out

    return assets.mapInPandas(_decode, schema=FEATURE_SCHEMA)


def resize_stub(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Image-resize plumbing: the transform is a mapInPandas pass that
    would call the codec; here it rewrites metadata deterministically and
    truncates the payload proportionally (stub semantics, real contract)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mask = pdf["media_type"] == "image"
            pdf = pdf.copy()
            pdf.loc[mask, "width"] = width
            pdf.loc[mask, "height"] = height
            pdf.loc[mask, "payload"] = pdf.loc[mask, "payload"].map(
                lambda b: b[: max(1, len(b) // 2)] if b is not None else None
            )
            yield pdf

    return assets.mapInPandas(_resize, schema=ASSET_SCHEMA)


FRAME_SCHEMA = (
    "asset_id long, frame_idx int, frame_offset long, "
    "frame_bytes long, frame_checksum long"
)


def frame_sample(assets: DataFrame, frame_size: int = 32, every: int = 4) -> DataFrame:
    """Video frame sampling plumbing: treat the payload as a sequence of
    fixed-size frames and emit every `every`-th one as its own row
    (frame index, byte offset, size, checksum) — the 1→N row expansion a
    real demuxer produces. Deterministic fake frames, real contract:
    mapInPandas so one input batch may yield many output rows without a
    per-row UDF, no shuffle, and the downstream sees a plain relation it
    can filter/join like any other.

    At 100 TB the expansion factor (payload_bytes / frame_size / every)
    multiplies rows map-side; keep `maxRecordsPerBatch` small enough
    that a batch of expanded frames fits the Arrow buffer."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "asset_id": [], "frame_idx": [], "frame_offset": [],
                "frame_bytes": [], "frame_checksum": [],
            }
            vids = pdf[pdf["media_type"] == "video"]
            for aid, payload in zip(vids["asset_id"], vids["payload"]):
                if payload is None:
                    continue
                n_frames = max(1, len(payload) // frame_size)
                for idx in range(0, n_frames, every):
                    off = idx * frame_size
                    chunk = payload[off : off + frame_size]
                    rows["asset_id"].append(aid)
                    rows["frame_idx"].append(idx)
                    rows["frame_offset"].append(off)
                    rows["frame_bytes"].append(len(chunk))
                    rows["frame_checksum"].append(sum(chunk) % 65536)
            yield pd.DataFrame(rows)

    return assets.mapInPandas(_sample, schema=FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# ROUND 11 — REAL audio decode. The image/video decode paths above are
# deterministic stand-ins because their codecs (PIL/ffmpeg) are absent
# from the environment — but WAV/PCM needs only the stdlib `wave`
# module, so the audio path is a real container round-trip: synthesize
# an actual RIFF/WAVE file per asset, then DECODE it back (the read
# path of the codec, not the writer's buffers) and feature-extract
# from the decoded PCM.
# ---------------------------------------------------------------------------

WAV_SAMPLE_RATE = 16000
WAV_FEATURE_SCHEMA = (
    "doc_id long, n_samples long, n_bytes long, duration_us long,"
    " sum_abs long, sum_sq long, peak long, zero_crossings long"
)


def _wav_n_samples(doc_id: int) -> int:
    return 160 + (doc_id % 97) * 16


def _wav_samples(doc_id: int, n: int):
    """Deterministic PCM16 signal: closed-form per-sample values, so a
    differential oracle can recompute them WITHOUT trusting the codec
    (encode ∘ decode must be the identity for the features to match)."""
    import numpy as np

    k = np.arange(n, dtype=np.int64)
    return (doc_id * 7919 + k * 104729) % 65536 - 32768


def synthesize_wav(doc_id: int) -> bytes:
    """A real RIFF/WAVE container: PCM16 mono @ 16 kHz."""
    import io
    import wave

    import numpy as np

    samples = _wav_samples(doc_id, _wav_n_samples(doc_id))
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(WAV_SAMPLE_RATE)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def _decode_pcm(doc_id: int) -> tuple[bytes, "object"]:
    """Synthesize the asset and decode it through the stdlib codec's
    READ path — the single-sourced codec round-trip both feature
    operators use (two copies could silently drift apart, r11
    second-review finding). Returns (container bytes, int64 samples)."""
    import io
    import wave

    import numpy as np

    payload = synthesize_wav(int(doc_id))
    with wave.open(io.BytesIO(payload)) as w:
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getframerate() == WAV_SAMPLE_RATE
        raw = w.readframes(w.getnframes())
    return payload, np.frombuffer(raw, dtype="<i2").astype(np.int64)


def wav_features(docs: DataFrame) -> DataFrame:
    """mapInPandas: per doc_id, synthesize the WAV asset, decode it back
    through the stdlib codec's READ path, and feature-extract exact
    integers from the decoded PCM (time-domain audio statistics: mean
    absolute amplitude / energy partials, peak, zero-crossing count —
    the classic VAD/loudness feature set)."""
    from collections.abc import Iterator

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                payload, s = _decode_pcm(int(doc_id))
                n = len(s)
                out.append(
                    {
                        "doc_id": int(doc_id),
                        "n_samples": n,
                        "n_bytes": len(payload),
                        "duration_us": n * 1_000_000 // WAV_SAMPLE_RATE,
                        "sum_abs": int(np.abs(s).sum()),
                        "sum_sq": int((s * s).sum()),
                        "peak": int(np.abs(s).max()) if n else 0,
                        "zero_crossings": int(
                            ((s[1:] * s[:-1]) < 0).sum()
                        ),
                    }
                )
            yield pd.DataFrame(out)

    return docs.select("doc_id").mapInPandas(
        _extract, schema=WAV_FEATURE_SCHEMA
    )


WAV_FRAME = 160  # 10 ms at 16 kHz — the standard VAD frame
WAV_FRAME_SCHEMA = (
    "doc_id long, frame_idx long, n long, sum_sq long, peak long,"
    " active long"
)
# Integer energy gate for the "active" flag, placed INSIDE the
# fixture's frame-energy distribution (min 5.643e10, median 5.731e10,
# max 5.815e10 over the sf0.1 corpus) so both classes are populated
# (~51% active) — a gate outside the distribution would be constant
# and the differential check could not catch a flipped comparison or a
# wrong constant (r11 second-review finding). Exact BIGINT compare on
# both engines; no parity risk.
WAV_ACTIVE_SUM_SQ = 57_300_000_000


def wav_frame_energy(docs: DataFrame) -> DataFrame:
    """Frame-grain audio features through the real codec: decode the
    WAV container, split the PCM into 10 ms frames (full frames only)
    and emit per-frame energy/peak plus the integer VAD gate — the 1→N
    decode expansion of the multimodal seam, real this time."""
    from collections.abc import Iterator

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            # fully vectorized (no per-frame Python loop in the hot
            # path, r11 second-review finding): one column-array block
            # per document, concatenated per Arrow batch
            cols = {k: [] for k in
                    ("doc_id", "frame_idx", "sum_sq", "peak")}
            for doc_id in pdf["doc_id"]:
                _, s = _decode_pcm(int(doc_id))
                n_frames = len(s) // WAV_FRAME
                fr = s[: n_frames * WAV_FRAME].reshape(n_frames, WAV_FRAME)
                cols["doc_id"].append(
                    np.full(n_frames, int(doc_id), dtype=np.int64)
                )
                cols["frame_idx"].append(np.arange(n_frames, dtype=np.int64))
                cols["sum_sq"].append((fr * fr).sum(axis=1))
                cols["peak"].append(np.abs(fr).max(axis=1))
            sum_sq = np.concatenate(cols["sum_sq"])
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(cols["doc_id"]),
                    "frame_idx": np.concatenate(cols["frame_idx"]),
                    "n": np.int64(WAV_FRAME),
                    "sum_sq": sum_sq,
                    "peak": np.concatenate(cols["peak"]),
                    "active": (sum_sq >= WAV_ACTIVE_SUM_SQ).astype(
                        np.int64
                    ),
                }
            )

    return docs.select("doc_id").mapInPandas(_frames, schema=WAV_FRAME_SCHEMA)
