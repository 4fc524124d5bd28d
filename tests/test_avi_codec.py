"""Late-round-13 AVI/MJPEG video demux — the RIFF container whose
frames are genuine JFIF streams decoded by the round's baseline JPEG
entropy decoder. Three layers like every codec suite in this repo:

  1. encode ∘ decode returns the closed-form dequantized per-frame
     coefficients bit-for-bit, including assets whose frame payloads
     have ODD sizes (RIFF's even-padding rule really exercised);
  2. demux-bug classes are DETECTABLE (frame order, index drift);
  3. structurally corrupt containers raise ValueError — list-size
     inconsistency, index/layout disagreement, frame-count lies,
     foreign chunks, truncations, trailing bytes.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from numalogic_prometheus_spark.operators.multimodal import (
    _avi_blocks,
    _avi_n_frames,
    _avi_qcoef,
    _jpeg_quant,
    decode_avi_mjpeg,
    synthesize_avi,
)

DOC_IDS = list(range(40)) + [1234, 99991, 10**9 + 7]


def _expected(d: int, t: int, by: int, bx: int) -> np.ndarray:
    return np.array(
        [_avi_qcoef(d, t, by, bx, k) * _jpeg_quant(k) for k in range(64)],
        dtype=np.int64,
    )


def test_avi_roundtrip_exact():
    for d in DOC_IDS:
        w, h, frames = decode_avi_mjpeg(synthesize_avi(d))
        bw, bh = _avi_blocks(d)
        assert (w, h) == (8 * bw, 8 * bh)
        assert len(frames) == _avi_n_frames(d)
        for t, blocks in enumerate(frames):
            assert set(blocks) == {
                (by, bx) for by in range(bh) for bx in range(bw)
            }
            for (by, bx), zz in blocks.items():
                assert (zz == _expected(d, t, by, bx)).all()


def _movi_frame_sizes(p: bytes) -> list[int]:
    """Walk ONLY the movi list's chunk headers (the way the decoder
    does) — a raw byte scan for '00dc' also matches idx1 entries and
    could match entropy-data collisions (r13 second-review finding)."""
    movi_at = p.index(b"movi")
    list_size = struct.unpack("<I", p[movi_at - 4 : movi_at])[0]
    end = movi_at + list_size
    pos = movi_at + 4
    sizes = []
    while pos < end:
        fourcc = p[pos : pos + 4]
        size = struct.unpack("<I", p[pos + 4 : pos + 8])[0]
        assert fourcc == b"00dc"
        sizes.append(size)
        pos += 8 + size + (size % 2)
    return sizes


def test_padding_rule_really_exercised():
    """Odd-size frame payloads must occur across the corpus — without
    them the even-padding walk would be vacuous."""
    n_odd = sum(
        sz % 2
        for d in range(40)
        for sz in _movi_frame_sizes(synthesize_avi(d))
    )
    assert n_odd >= 10


def test_frame_order_is_feature_visible():
    """Every frame of an asset carries a distinct signal, so a demux
    that swapped frames produces different per-frame features."""
    d = 5  # 4 frames
    _, _, frames = decode_avi_mjpeg(synthesize_avi(d))
    checksums = []
    for blocks in frames:
        ck = 0
        for (by, bx), zz in blocks.items():
            kw = np.arange(64, dtype=np.int64) + 1
            ck += int((kw * zz).sum())
        checksums.append(ck)
    assert len(set(checksums)) == len(checksums)


def test_avi_corrupt_payloads_rejected():
    payload = synthesize_avi(42)

    with pytest.raises(ValueError, match="signature"):
        decode_avi_mjpeg(b"FFIR" + payload[4:])

    # RIFF size lies about the payload length
    bad = bytearray(payload)
    bad[4:8] = struct.pack("<I", struct.unpack("<I", payload[4:8])[0] + 2)
    with pytest.raises(ValueError, match="RIFF size"):
        decode_avi_mjpeg(bytes(bad))

    # truncations at several depths
    for cut in (10, 40, len(payload) // 2, len(payload) - 3):
        with pytest.raises(ValueError):
            decode_avi_mjpeg(payload[:cut])

    # trailing bytes beyond the declared RIFF extent
    with pytest.raises(ValueError, match="RIFF size"):
        decode_avi_mjpeg(payload + b"xx")

    # a foreign top-level chunk (rename idx1)
    alien = bytearray(payload)
    i = payload.index(b"idx1")
    alien[i : i + 4] = b"JUNK"
    with pytest.raises(ValueError, match="unexpected top-level chunk"):
        decode_avi_mjpeg(bytes(alien))

    # idx1 removed entirely → missing index
    no_idx = bytearray(payload[:i])
    no_idx[4:8] = struct.pack("<I", len(no_idx) - 8)
    with pytest.raises(ValueError, match="idx1"):
        decode_avi_mjpeg(bytes(no_idx))


def test_avi_index_layout_consistency_enforced():
    """idx1 lies must be refused: a drifted offset and a wrong size
    are both detected against the actual movi layout."""
    payload = synthesize_avi(7)
    i = payload.index(b"idx1")

    drift = bytearray(payload)
    off_at = i + 8 + 8  # first entry's dwChunkOffset
    drift[off_at : off_at + 4] = struct.pack(
        "<I", struct.unpack("<I", payload[off_at : off_at + 4])[0] + 2
    )
    with pytest.raises(ValueError, match="idx1 offset/size"):
        decode_avi_mjpeg(bytes(drift))

    size_at = i + 8 + 12  # first entry's dwChunkLength
    lies = bytearray(payload)
    lies[size_at : size_at + 4] = struct.pack(
        "<I", struct.unpack("<I", payload[size_at : size_at + 4])[0] - 1
    )
    with pytest.raises(ValueError, match="idx1 offset/size"):
        decode_avi_mjpeg(bytes(lies))


def test_avi_header_lies_rejected():
    """r13 second-review findings: an avih that lies about the canvas,
    a duplicated stream list, and a strf declaring a non-MJPG codec
    must all be refused."""
    payload = synthesize_avi(4)

    # avih dims disagree with strf
    avih_at = payload.index(b"avih")
    lie = bytearray(payload)
    lie[avih_at + 8 + 32 : avih_at + 8 + 36] = struct.pack("<I", 56)
    with pytest.raises(ValueError, match="avih dims"):
        decode_avi_mjpeg(bytes(lie))

    # strf biCompression != MJPG
    strf_at = payload.index(b"strf")
    raw = bytearray(payload)
    raw[strf_at + 8 + 16 : strf_at + 8 + 20] = b"RAW "
    with pytest.raises(ValueError, match="biCompression"):
        decode_avi_mjpeg(bytes(raw))

    # duplicated strl LIST inside hdrl
    strl_at = payload.index(b"strl") - 8  # LIST header start
    strl_size = struct.unpack("<I", payload[strl_at + 4 : strl_at + 8])[0]
    strl_chunk = payload[strl_at : strl_at + 8 + strl_size + (strl_size % 2)]
    hdrl_at = payload.index(b"hdrl") - 8
    hdrl_size = struct.unpack("<I", payload[hdrl_at + 4 : hdrl_at + 8])[0]
    hdrl_end = hdrl_at + 8 + hdrl_size
    dup = bytearray(payload[:hdrl_end] + strl_chunk + payload[hdrl_end:])
    dup[hdrl_at + 4 : hdrl_at + 8] = struct.pack(
        "<I", hdrl_size + len(strl_chunk)
    )
    dup[4:8] = struct.pack(
        "<I", struct.unpack("<I", payload[4:8])[0] + len(strl_chunk)
    )
    with pytest.raises(ValueError, match="exactly one"):
        decode_avi_mjpeg(bytes(dup))


def test_avi_frame_count_lie_rejected():
    """avih declaring one frame more than movi carries must fail."""
    payload = synthesize_avi(9)
    avih_at = payload.index(b"avih")
    n_at = avih_at + 8 + 16  # dwTotalFrames
    lie = bytearray(payload)
    lie[n_at : n_at + 4] = struct.pack(
        "<I", struct.unpack("<I", payload[n_at : n_at + 4])[0] + 1
    )
    with pytest.raises(ValueError, match="frames"):
        decode_avi_mjpeg(bytes(lie))


def test_avi_frame_dims_must_match_container():
    """A frame whose decoded JFIF dims differ from the container dims
    must be refused (build a container whose strf claims a wider
    canvas)."""
    payload = synthesize_avi(4)
    strf_at = payload.index(b"strf")
    w_at = strf_at + 8 + 4  # biWidth
    wide = bytearray(payload)
    wide[w_at : w_at + 4] = struct.pack("<i", 8 * 7)
    # avih width too (keep headers self-consistent; the frame check
    # is the one under test)
    avih_at = payload.index(b"avih")
    aw_at = avih_at + 8 + 32
    wide[aw_at : aw_at + 4] = struct.pack("<I", 8 * 7)
    with pytest.raises(ValueError, match="frame dims"):
        decode_avi_mjpeg(bytes(wide))
