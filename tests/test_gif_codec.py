"""Round-13 GIF codec (VERDICT r12 #5 — the third real stdlib
container after PNG/APNG). Three layers, mirroring test_png_codec.py:

  1. encode ∘ decode round-trip equals the closed-form signal exactly
     (palette, index plane, dims, interlace flag) across assets that
     between them exercise every palette size, both interlace modes,
     in-stream LZW Clear resets and deep code-width growth;
  2. decode-bug classes are DETECTABLE: a decoder that ignored the
     interlace flag, mis-packed bits, skipped Clear handling or misread
     the palette produces different features than the formula;
  3. structurally corrupt containers (bad signature, truncations,
     framing slips, index overflow, trailing bytes) raise ValueError —
     never a silent partial decode.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from numalogic_prometheus_spark.operators.multimodal import (
    _gif_dims,
    _gif_indexes,
    _gif_interlace_order,
    _gif_lzw_decode,
    _gif_lzw_encode,
    _gif_palette,
    _gif_palette_bits,
    _lzw_reset_after,
    decode_gif,
    synthesize_gif,
)

# 0..69 covers all 5 palette sizes × both interlace modes × all 7 LZW
# reset cadences × all 11×6 dim classes' residues at least once
DOC_IDS = list(range(70)) + [1234, 99991, 10**9 + 7]


def test_gif_roundtrip_exact():
    for d in DOC_IDS:
        w, h, ncol, inter, pal, idx = decode_gif(synthesize_gif(d))
        ew, eh = _gif_dims(d)
        assert (w, h) == (ew, eh)
        assert ncol == 1 << _gif_palette_bits(d)
        assert inter == (d % 2 == 1)
        assert (pal == _gif_palette(d, ncol)).all()
        assert (idx == _gif_indexes(d, w, h, ncol)).all()


def test_corpus_exercises_all_codec_paths():
    """The asset family must actually hit the LZW paths the decoder
    claims to handle: in-stream Clear codes (small reset cadence) and
    code-width growth past the initial width (large cadence)."""
    saw_reset = saw_growth = saw_interlace = False
    for d in range(70):
        bits = _gif_palette_bits(d)
        w, h = _gif_dims(d)
        stream = _gif_indexes(d, w, h, 1 << bits).reshape(-1)
        if len(stream) - 1 > _lzw_reset_after(d):
            saw_reset = True  # more adds available than the cadence
        if d % 2 == 1:
            saw_interlace = True
        # growth: table adds since last reset exceed the initial width's
        # remaining range
        if _lzw_reset_after(d) > (1 << (bits + 1)) - (1 << bits) - 2:
            saw_growth = True
    assert saw_reset and saw_growth and saw_interlace


def _walk_lzw_codes(data: bytes, min_code_size: int):
    """Test-side reference walker: yield the raw code sequence using
    the canonical width rules (mirrors the decoder's width evolution
    without building strings) — lets tests assert on the CODE stream
    itself, e.g. that inline Clear codes are really present."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    acc = n = pos = 0
    width = min_code_size + 1
    table_len = eoi + 1
    first_after_clear = True
    while True:
        while n < width:
            acc |= data[pos] << n
            pos += 1
            n += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        n -= width
        yield code
        if code == eoi:
            return
        if code == clear:
            width = min_code_size + 1
            table_len = eoi + 1
            first_after_clear = True
            continue
        if first_after_clear:
            first_after_clear = False
        else:
            table_len += 1
            if table_len == (1 << width) and width < 12:
                width += 1


def test_lzw_stream_contains_inline_clear_codes():
    """For a small reset cadence the encoder must emit Clear codes
    MID-STREAM (not just the leading one), and the decoder must
    round-trip through them — r13 self-review finding: the original
    pin used an asset whose cadence (208) exceeded its pixel count, so
    the forced-Clear branch never fired and the test was a plain
    round-trip."""
    d = 7  # doc_id % 7 == 0 → reset_after = 16; 22×10 canvas = 220 px
    assert _lzw_reset_after(d) == 16
    bits = _gif_palette_bits(d)
    w, h = _gif_dims(d)
    stream = [int(v) for v in _gif_indexes(d, w, h, 1 << bits).reshape(-1)]
    assert len(stream) - 1 > 16  # enough adds to force inline Clears
    mcs = max(2, bits)
    data = _gif_lzw_encode(stream, mcs, _lzw_reset_after(d))
    codes = list(_walk_lzw_codes(data, mcs))
    n_clears = sum(1 for c in codes if c == (1 << mcs))
    assert n_clears >= 2, "no INLINE Clear code in the stream"
    assert _gif_lzw_decode(data, mcs, len(stream)) == stream


def test_lzw_table_full_forces_clear():
    """With no cadence resets, a long high-entropy stream must hit the
    4096-entry cap and the encoder must force a Clear there instead of
    emitting undecodable >12-bit codes (r13 self-review finding)."""
    import random

    rng = random.Random(99)
    stream = [rng.randrange(256) for _ in range(20_000)]
    data = _gif_lzw_encode(stream, 8, 10**9)
    assert _gif_lzw_decode(data, 8, len(stream)) == stream
    codes = list(_walk_lzw_codes(data, 8))
    assert sum(1 for c in codes if c == 256) >= 2  # table-full Clears
    assert max(codes) < 4096


def test_lzw_kwkwk_case():
    """The code==next_code (KwKwK) case must round-trip: 'aaaa...' is
    its canonical trigger."""
    stream = [3] * 50
    data = _gif_lzw_encode(stream, 2, 10_000)
    assert _gif_lzw_decode(data, 2, 50) == stream


def test_interlace_is_honored():
    """An interlaced asset's stored row order differs from natural
    order, and the decoder must undo it: compare a hand-deinterlace of
    the stored stream against the decoded plane."""
    d = 7  # odd → interlaced; h = 8+(7%6)*2 = 10 rows
    w, h = _gif_dims(d)
    ncol = 1 << _gif_palette_bits(d)
    idx = _gif_indexes(d, w, h, ncol)
    order = _gif_interlace_order(h)
    assert order != list(range(h))  # really reordered on disk
    _, _, _, inter, _, decoded = decode_gif(synthesize_gif(d))
    assert inter
    assert (decoded == idx).all()
    # a decoder that skipped de-interlacing would return idx[order],
    # which differs — the bug class is feature-visible
    assert not (idx[order] == idx).all()


def test_gif_decode_bug_classes_caught():
    """Feature-visibility of classic GIF decode bugs: each doctored
    variant must differ from the true signal somewhere the features
    look (the oracle recomputes from the formula, so 'differs' means
    'hash mismatch' in the registered entry)."""
    d = 11  # interlaced, ncol = 2^(2+1) = 8
    w, h = _gif_dims(d)
    ncol = 1 << _gif_palette_bits(d)
    idx = _gif_indexes(d, w, h, ncol)
    pal = _gif_palette(d, ncol)
    rgb = pal[idx]

    # MSB-first bit unpacking (wrong for GIF) garbles the code stream
    # structurally — covered by the corruption tests; here pin the two
    # silent-wrong classes: transposed plane and palette slip, both via
    # the entry's positional checksum (which flattening erases shape
    # differences cannot hide from).
    posw = np.arange(w * h, dtype=np.int64) + 1
    true_ck = int((posw * pal[idx].sum(axis=2).reshape(-1)).sum())
    transposed_ck = int((posw * pal[idx.T].sum(axis=2).reshape(-1)).sum())
    assert transposed_ck != true_ck
    shifted = pal[(idx + 1) % ncol]
    assert (shifted != rgb).any()


def test_gif_corrupt_payloads_rejected():
    payload = synthesize_gif(42)

    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"JIF89a" + payload[6:])

    # truncated screen descriptor
    with pytest.raises(ValueError):
        decode_gif(payload[:10])

    # global color table flag cleared
    broken = bytearray(payload)
    broken[10] &= 0x7F
    with pytest.raises(ValueError, match="color table"):
        decode_gif(bytes(broken))

    # truncation inside the color table / LZW data / anywhere
    for cut in (20, len(payload) // 2, len(payload) - 2):
        with pytest.raises(ValueError):
            decode_gif(payload[:cut])

    # trailing garbage after the trailer
    with pytest.raises(ValueError, match="trailing"):
        decode_gif(payload + b"\x00junk")

    # frame geometry != canvas (left offset 1)
    img_off = 13 + 3 * (1 << _gif_palette_bits(42))
    assert payload[img_off] == 0x2C
    geo = bytearray(payload)
    geo[img_off + 1 : img_off + 3] = struct.pack("<H", 1)
    with pytest.raises(ValueError, match="geometry"):
        decode_gif(bytes(geo))

    # sub-block length pointing past the end
    sub0 = img_off + 11  # first sub-block length byte
    fr = bytearray(payload)
    fr[sub0] = 0xFF
    with pytest.raises(ValueError):
        decode_gif(bytes(fr))

    # bad LZW minimum code size
    mc = bytearray(payload)
    mc[img_off + 10] = 1
    with pytest.raises(ValueError, match="minimum code size"):
        decode_gif(bytes(mc))


def test_gif_index_overflow_rejected():
    """Shrink the declared color table (header says 4 colors, stream
    encodes larger indexes): the decoder must refuse, not wrap."""
    d = 14  # ncol = 2^(2+4) = 64, non-interlaced
    w, h = _gif_dims(d)
    bits = _gif_palette_bits(d)
    ncol = 1 << bits
    idx = _gif_indexes(d, w, h, ncol)
    assert int(idx.max()) >= 4
    pal = _gif_palette(d, ncol)
    stream = [int(v) for v in idx.reshape(-1)]
    lzw = _gif_lzw_encode(stream, max(2, bits), 10_000)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x70 | 1, 0, 0)  # 4 colors
    out += pal[:4].astype("uint8").tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    out.append(max(2, bits))
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out.append(0)
    out.append(0x3B)
    # the 6-bit codes land outside the 4-color table: either the LZW
    # layer sees codes past the (smaller) clear code and the table, or
    # the range check trips — both are ValueError by contract
    with pytest.raises(ValueError):
        decode_gif(bytes(out))


def test_lzw_pixel_count_contract():
    """Too many / too few pixels for the canvas must raise."""
    stream = [1, 2, 3] * 20
    data = _gif_lzw_encode(stream, 2, 10_000)
    with pytest.raises(ValueError, match="more pixels"):
        _gif_lzw_decode(data, 2, 59)
    with pytest.raises(ValueError, match="canvas needs"):
        _gif_lzw_decode(data, 2, 61)


# ---------------------------------------------------------------------------
# Property layer (the CDC-fuzz pattern): the LZW pair must round-trip
# ARBITRARY symbol streams across the whole parameter space — palette
# widths 2..8 bits, any reset cadence including none and table-full.
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    mcs=st.integers(min_value=2, max_value=8),
    cadence=st.one_of(
        st.integers(min_value=1, max_value=64),
        st.just(10**9),  # never reset by cadence → table-full path
    ),
    data=st.data(),
)
def test_lzw_roundtrip_property(mcs, cadence, data):
    stream = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=(1 << mcs) - 1),
            min_size=1,
            max_size=800,
        )
    )
    enc = _gif_lzw_encode(stream, mcs, cadence)
    assert _gif_lzw_decode(enc, mcs, len(stream)) == stream


# ---------------------------------------------------------------------------
# Round 14 hardening (VERDICT r13 nit + ADVICE)
# ---------------------------------------------------------------------------


def test_lzw_trailing_garbage_after_eoi_rejected():
    """ADVICE r13: a garbage sub-block appended AFTER the EOI code must
    be corruption, never a silent partial read — the decoder's own
    documented posture. Probed at the packed-stream level (the
    sub-block walk would happily concatenate the extra block)."""
    d = 11
    bits = _gif_palette_bits(d)
    w, h = _gif_dims(d)
    stream = [int(v) for v in _gif_indexes(d, w, h, 1 << bits).reshape(-1)]
    mcs = max(2, bits)
    data = _gif_lzw_encode(stream, mcs, _lzw_reset_after(d))
    # the clean stream still decodes
    assert _gif_lzw_decode(data, mcs, len(stream)) == stream
    # whole garbage bytes after EOI are rejected
    for tail in (b"\x00", b"\xff", b"\xab\xcd"):
        with pytest.raises(ValueError, match="trailing LZW data"):
            _gif_lzw_decode(data + tail, mcs, len(stream))


def test_lzw_decoder_table_capped_on_never_clear_stream():
    """VERDICT r13 hardening nit: a hostile stream that NEVER sends
    Clear past table-full must decode under the deferred-clear
    convention with the decoder's table frozen at 4096 entries —
    decoder state must not grow with stream length. The crafted
    encoder below mirrors the real one but freezes instead of forcing
    a Clear, which is exactly the well-formed-but-never-clearing
    stream a non-cooperating encoder may emit."""
    import random

    def encode_never_clear(indexes, min_code_size):
        clear = 1 << min_code_size
        eoi = clear + 1
        table = {(i,): i for i in range(clear)}
        next_code, width = eoi + 1, min_code_size + 1
        out_bits = [(clear, width)]
        seq = ()
        for v in indexes:
            cand = seq + (int(v),)
            if cand in table:
                seq = cand
                continue
            out_bits.append((table[seq], width))
            if next_code < 4096:  # freeze, never Clear
                table[cand] = next_code
                next_code += 1
                if next_code == (1 << width) + 1 and width < 12:
                    width += 1
            seq = (int(v),)
        if seq:
            out_bits.append((table[seq], width))
            if next_code == (1 << width) and width < 12:
                width += 1
        out_bits.append((eoi, width))
        acc = n_acc = 0
        data = bytearray()
        for code, w_bits in out_bits:
            acc |= code << n_acc
            n_acc += w_bits
            while n_acc >= 8:
                data.append(acc & 0xFF)
                acc >>= 8
                n_acc -= 8
        if n_acc:
            data.append(acc & 0xFF)
        return bytes(data)

    rng = random.Random(1234)
    stream = [rng.randrange(256) for _ in range(30_000)]
    data = encode_never_clear(stream, 8)
    stats: dict = {}
    assert _gif_lzw_decode(data, 8, len(stream), stats=stats) == stream
    assert stats["max_table"] == 4096, (
        f"decoder table grew to {stats['max_table']} on a never-Clear "
        "stream — the 4096 cap is not honored"
    )
