"""Round 12 — ORACLE-BACKED image entries: a real PNG codec
(VERDICT r11 #3, the image sibling of the r11 WAV entries).

Both entries run the full container round-trip inside an Arrow-batched
mapInPandas: synthesize a real PNG (CRC-protected chunks, DEFLATE
scanlines, per-row filter type cycling through all five PNG filters),
decode it back through the codec's READ path (signature check,
per-chunk CRC verify, big-endian IHDR parse, inflate, per-filter
scanline reconstruction — operators/multimodal.py:decode_png), and
feature-extract exact integers from the RECONSTRUCTED pixels only. The
DuckDB twins recompute every feature from the closed-form pixel signal
without touching the codec, so any decode bug — a wrong Paeth
predictor, a skipped CRC, a byte-order slip in the header, a
mis-framed scanline — breaks the hash match (codec-adversarial by
construction; the bug classes are exercised directly in
tests/test_png_codec.py).

Reference anchor: the multimodal north-star (image/audio/video as
opaque binary + typed metadata); the reference itself has no media
path (/root/reference/numaprom is a 288-line metrics wrapper), so this
is extension surface, built to the same oracle discipline as §2C.

Scale (100 TB design): decode is the canonical CPU-heavy map-only
stage — a narrow (doc_id) scan feeding mapInPandas, zero exchanges
until a downstream aggregation (pinned:
tests/test_plan_shape.py::test_image_decode_is_shuffle_free_map); in
production the synthesize step is spark.read.format('binaryFile')
over the object store and the same kernel decodes. Arrow batch size
(spark.sql.execution.arrow.maxRecordsPerBatch) bounds per-task decoded
bytes when payloads are MBs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from numalogic_prometheus_spark.operators.multimodal import (
    RESIZE_H,
    RESIZE_W,
    apng_frame_features,
    avi_frame_features,
    gif_features,
    jpeg_coefficient_features,
    png_features,
    png_resize_features,
    png_row_stats,
)
from numalogic_prometheus_spark.plans import register
from numalogic_prometheus_spark.sources.tables import load_table

# Shared closed-form signal CTEs: dimensions are (8 + (doc_id%13)*2) ×
# (8 + (doc_id%7)*2) RGB, pixel p(y,x,c) = (doc_id*4099 + y*131 + x*17
# + c*59) % 256 — mirrors operators/multimodal.py:_png_pixels. All
# features are exact integers (p < 2^8, ≤ 1920 values/asset, weighted
# sums < 2^40), so the compare is BIGINT-exact on both engines.
_PNG_PARAMS_CTE = """
    params AS (
        SELECT doc_id,
               8 + (doc_id % 13) * 2 AS w,
               8 + (doc_id % 7) * 2 AS h
        FROM documents
    )
"""
_PNG_PIXEL_CTE = f"""
    {_PNG_PARAMS_CTE},
    pix AS (
        SELECT doc_id, w, h, y, x, c,
               (doc_id * 4099 + y * 131 + x * 17 + c * 59) % 256 AS p
        FROM params,
             unnest(range(0, h)) AS u(y),
             unnest(range(0, w)) AS v(x),
             unnest(range(0, 3)) AS t(c)
    )
"""


@register(
    "multimodal_image_png_features",
    oracle=f"""
    WITH {_PNG_PIXEL_CTE}
    SELECT doc_id,
           w::BIGINT AS width,
           h::BIGINT AS height,
           (w * h * 3)::BIGINT AS n_values,
           sum(CASE WHEN c = 0 THEN p ELSE 0 END)::BIGINT AS sum_r,
           sum(CASE WHEN c = 1 THEN p ELSE 0 END)::BIGINT AS sum_g,
           sum(CASE WHEN c = 2 THEN p ELSE 0 END)::BIGINT AS sum_b,
           sum(p * p)::BIGINT AS sum_sq,
           max(p)::BIGINT AS peak,
           sum((y * w + x + 1) * p)::BIGINT AS pos_checksum
    FROM pix GROUP BY doc_id, w, h
    """,
)
def multimodal_image_png_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Image decode + feature extraction over real PNG containers: per
    document-keyed asset, the IHDR dimensions, per-channel sums, energy,
    peak, and a position-weighted checksum sum((y*w + x + 1) * p) that a
    transposed/mis-framed decode cannot reproduce. The Spark side trusts
    ONLY the pixels that survived encode ∘ decode; the oracle recomputes
    them from the closed-form signal — the WAV codec-adversarial posture
    (plans/extras2.py:multimodal_audio_wav_features), image grain."""
    docs = load_table(spark, sf_dir, "documents")
    return png_features(docs)


@register(
    "multimodal_image_row_stats",
    oracle=f"""
    WITH {_PNG_PIXEL_CTE}
    SELECT doc_id, y::BIGINT AS y,
           ((doc_id + y) % 5)::BIGINT AS png_filter,
           sum(CASE WHEN c = 0 THEN p ELSE 0 END)::BIGINT AS sum_r,
           sum(CASE WHEN c = 1 THEN p ELSE 0 END)::BIGINT AS sum_g,
           sum(CASE WHEN c = 2 THEN p ELSE 0 END)::BIGINT AS sum_b,
           max(p)::BIGINT AS row_peak,
           sum((x + 1) * p)::BIGINT AS x_checksum
    FROM pix GROUP BY doc_id, y
    """,
)
def multimodal_image_row_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Scanline-grain image features: the 1→H decode expansion
    (multimodal_audio_frame_energy's image sibling). Each decoded row
    emits its filter byte AS READ from the inflated stream — the oracle
    recomputes it as (doc_id + y) % 5, so a filter-assignment or
    scanline-framing bug is caught before it even reaches pixel values —
    plus per-channel sums, row peak, and an x-weighted checksum that
    pins within-row byte order. Map-only 1→N inside mapInPandas; the
    per-row relation is the input to ordinary windowed aggregations
    downstream."""
    docs = load_table(spark, sf_dir, "documents")
    return png_row_stats(docs)


@register(
    "multimodal_video_apng_frames",
    oracle="""
    WITH params AS (
        SELECT doc_id,
               8 + (doc_id % 5) * 2 AS w,
               8 + (doc_id % 3) * 2 AS h,
               2 + (doc_id % 4) AS n_frames
        FROM documents
    ),
    pix AS (
        SELECT doc_id, w, h, t, y, x, c,
               (doc_id * 4099 + t * 769 + y * 131 + x * 17 + c * 59)
                   % 256 AS p
        FROM params,
             unnest(range(0, n_frames)) AS s(t),
             unnest(range(0, h)) AS u(y),
             unnest(range(0, w)) AS v(x),
             unnest(range(0, 3)) AS q(c)
    )
    SELECT doc_id, t::BIGINT AS frame_idx,
           w::BIGINT AS width, h::BIGINT AS height,
           (t + 1)::BIGINT AS delay_num,
           sum(p)::BIGINT AS sum_rgb,
           sum(p * p)::BIGINT AS sum_sq,
           max(p)::BIGINT AS peak,
           sum((y * w + x + 1) * p)::BIGINT AS pos_checksum
    FROM pix GROUP BY doc_id, t, w, h
    """,
)
def multimodal_video_apng_frames(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Video frame demux through a REAL animated container: per
    document-keyed asset, a genuine APNG (acTL frame count, sequenced
    fcTL/fdAT chunks, per-frame DEFLATE + filter cycling, CRC32 on
    every chunk) is synthesized, demuxed and decoded through the READ
    path (operators/multimodal.py:decode_apng — sequence numbers
    validated strictly, frame geometry checked against the canvas),
    emitting one row per frame with exact-integer features from the
    reconstructed pixels plus the decoded fcTL delay. The oracle
    recomputes everything from the closed-form per-frame signal, so
    frame-misorder, sequence off-by-one, delay-misparse and
    de-filter bugs all break the hash — the video sibling of the WAV
    (r11) and PNG (above) codec-adversarial entries, retiring the
    last fake-media caveat. Map-only 1→N inside mapInPandas; the
    per-frame relation feeds ordinary windowed aggregations."""
    docs = load_table(spark, sf_dir, "documents")
    return apng_frame_features(docs)


@register(
    "multimodal_image_gif_features",
    # Closed-form palette-image signal (round 13, VERDICT r12 #5): the
    # canvas is (8 + (doc_id%11)*2) × (8 + (doc_id%6)*2) with a
    # 2^(2 + doc_id%5)-color global table; index(y,x) = (doc_id*31 +
    # y*7 + x*3) mod ncol; palette[j] = ((doc_id*5 + j*41) % 256,
    # (doc_id*11 + j*23) % 256, (doc_id*17 + j*59) % 256) — mirrors
    # operators/multimodal.py:_gif_indexes/_gif_palette. All features
    # are exact integers, so the compare is BIGINT-exact.
    oracle="""
    WITH params AS (
        SELECT doc_id,
               8 + (doc_id % 11) * 2 AS w,
               8 + (doc_id % 6) * 2 AS h,
               (1 << (2 + (doc_id % 5))::INT) AS ncol
        FROM documents
    ),
    pix AS (
        SELECT doc_id, w, h, ncol, y, x,
               (doc_id * 31 + y * 7 + x * 3) % ncol AS j
        FROM params,
             unnest(range(0, h)) AS u(y),
             unnest(range(0, w)) AS v(x)
    ),
    rgb AS (
        SELECT doc_id, w, h, ncol, y, x,
               (doc_id * 5 + j * 41) % 256 AS r,
               (doc_id * 11 + j * 23) % 256 AS g,
               (doc_id * 17 + j * 59) % 256 AS b
        FROM pix
    ),
    pal AS (
        SELECT doc_id,
               sum((j + 1) * ((doc_id * 5 + j * 41) % 256
                              + (doc_id * 11 + j * 23) % 256
                              + (doc_id * 17 + j * 59) % 256))
                   AS palette_checksum
        FROM params, unnest(range(0, ncol)) AS t(j)
        GROUP BY doc_id
    )
    SELECT r.doc_id,
           r.w::BIGINT AS width,
           r.h::BIGINT AS height,
           r.ncol::BIGINT AS n_colors,
           (r.doc_id % 2)::BIGINT AS interlaced,
           sum(r.r)::BIGINT AS sum_r,
           sum(r.g)::BIGINT AS sum_g,
           sum(r.b)::BIGINT AS sum_b,
           sum(r.r * r.r + r.g * r.g + r.b * r.b)::BIGINT AS sum_sq,
           max(greatest(r.r, r.g, r.b))::BIGINT AS peak,
           sum((r.y * r.w + r.x + 1) * (r.r + r.g + r.b))::BIGINT
               AS pos_checksum,
           any_value(p.palette_checksum)::BIGINT AS palette_checksum
    FROM rgb r JOIN pal p USING (doc_id)
    GROUP BY r.doc_id, r.w, r.h, r.ncol
    """,
)
def multimodal_image_gif_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Palette-image decode through a REAL GIF89a container (round 13):
    per document-keyed asset a genuine GIF is synthesized — global
    color table (4..64 entries), variable-width LZW with in-stream
    Clear resets at an asset-dependent cadence, forced ≤47-byte
    sub-block framing, 4-pass interlacing on odd doc_ids — then decoded
    through the strict READ path (operators/multimodal.py:decode_gif)
    and feature-extracted from palette[index] lookups on the decoded
    stream ONLY. The oracle recomputes every feature from the
    closed-form signal without touching the codec, so the GIF-specific
    bug classes — wrong LSB bit order, mis-grown code width, ignored
    Clear, KwKwK slip, scrambled interlace pass, palette misread —
    all break the hash (tests/test_gif_codec.py exercises them
    directly). This retires the 'stdlib-expressible image container'
    residue of the fake-decode seam: fake remains only for
    JPEG/ffmpeg-class codecs genuinely absent from the environment.
    Scale: map-only 1→1 decode inside mapInPandas, zero exchanges
    before the (nonexistent) downstream aggregation — plan-pinned with
    the other decode entries in test_plan_shape.py."""
    docs = load_table(spark, sf_dir, "documents")
    return gif_features(docs)


@register(
    "multimodal_image_jpeg_coefficients",
    # Closed-form quantized-coefficient signal (round 13, the codec
    # family VERDICT r12 still listed as fake): per 8×8 block (by, bx)
    # of a (1 + doc_id%3) × (1 + doc_id%2) grid, zigzag index k holds
    # quantized value (doc_id*37 + by*17 + bx*11 + k*7) % 21 − 10 for
    # k < 1 + (doc_id+by+bx)%8, a planted (doc_id+by+bx)%9 + 1 at k=40
    # on every third block (forces ≥16-zero runs → ZRL), else 0 (EOB);
    # dequantized = value × (1 + k%4) — mirrors operators/
    # multimodal.py:_jpeg_qcoef/_jpeg_quant. Quantization is lossless
    # BY CONSTRUCTION (the closed form defines the quantized integers),
    # which is what makes a JPEG entry oracle-checkable at all: the
    # entropy layer is exact even though the pixel path is lossy.
    oracle="""
    WITH params AS (
        SELECT doc_id,
               1 + doc_id % 3 AS bw,
               1 + doc_id % 2 AS bh
        FROM documents
    ),
    cells AS (
        SELECT doc_id, bw, bh, by, bx, k,
               1 + (doc_id + by + bx) % 8 AS nz
        FROM params,
             unnest(range(0, bh)) AS u(by),
             unnest(range(0, bw)) AS v(bx),
             unnest(range(0, 64)) AS t(k)
    ),
    deq AS (
        SELECT doc_id, bw, bh, by, bx, k,
               (CASE
                    WHEN k < nz
                        THEN (doc_id * 37 + by * 17 + bx * 11 + k * 7)
                                 % 21 - 10
                    WHEN k = 40 AND (doc_id + by + bx) % 3 = 0
                        THEN (doc_id + by + bx) % 9 + 1
                    ELSE 0
                END) * (1 + k % 4) AS d
        FROM cells
    )
    SELECT doc_id,
           (8 * bw)::BIGINT AS width,
           (8 * bh)::BIGINT AS height,
           (bw * bh)::BIGINT AS n_blocks,
           sum(CASE WHEN k = 0 THEN d ELSE 0 END)::BIGINT AS sum_dc,
           sum(CASE WHEN k > 0 THEN abs(d) ELSE 0 END)::BIGINT
               AS sum_abs_ac,
           sum(d * d)::BIGINT AS sum_sq,
           sum(CASE WHEN d <> 0 THEN 1 ELSE 0 END)::BIGINT AS n_nonzero,
           sum(((by * bw + bx) * 64 + k + 1) * d)::BIGINT AS zz_checksum
    FROM deq GROUP BY doc_id, bw, bh
    """,
)
def multimodal_image_jpeg_coefficients(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Baseline-JPEG entropy decode through a genuine JFIF stream
    (round 13): SOI/APP0/DQT/SOF0/Annex-K DHTs/DRI/SOS/EOI with DC
    prediction reset at cycling RST markers, in-region zero runs, ZRL
    escapes, EOB and 0xFF00 byte stuffing — decoded strictly
    (operators/multimodal.py:decode_jpeg_coefficients) and featured in
    the EXACT coefficient domain (JPEG's pixel path is lossy, its
    entropy layer is not — the oracle recomputes the dequantized
    integers from the closed form, so Huffman, run-length, prediction,
    restart, stuffing and dequantize bugs all break the hash;
    tests/test_jpeg_codec.py exercises them directly). With this the
    fake decode seam shrinks to ffmpeg-class video plus JPEG's lossy
    pixel path (IDCT) alone. Scale:
    map-only decode inside mapInPandas, zero exchanges — plan-pinned
    with the other decode entries."""
    docs = load_table(spark, sf_dir, "documents")
    return jpeg_coefficient_features(docs)


@register(
    "multimodal_video_avi_mjpeg_frames",
    # Closed-form per-frame coefficient signal (late round 13): the
    # JPEG still entry's family with the frame index mixed in —
    # mirrors operators/multimodal.py:_avi_qcoef/_avi_blocks/
    # _avi_n_frames; quantization lossless by construction exactly as
    # in the still entry.
    oracle="""
    WITH params AS (
        SELECT doc_id,
               1 + doc_id % 2 AS bw,
               1 AS bh,
               2 + doc_id % 3 AS nf
        FROM documents
    ),
    cells AS (
        SELECT doc_id, bw, bh, t, by, bx, k,
               1 + (doc_id + t + by + bx) % 8 AS nz
        FROM params,
             unnest(range(0, nf)) AS s(t),
             unnest(range(0, bh)) AS u(by),
             unnest(range(0, bw)) AS v(bx),
             unnest(range(0, 64)) AS q(k)
    ),
    deq AS (
        SELECT doc_id, bw, bh, t, by, bx, k,
               (CASE
                    WHEN k < nz
                        THEN (doc_id * 37 + t * 29 + by * 17
                              + bx * 11 + k * 7) % 21 - 10
                    WHEN k = 40 AND (doc_id + t + by + bx) % 3 = 0
                        THEN (doc_id + t + by + bx) % 9 + 1
                    ELSE 0
                END) * (1 + k % 4) AS d
        FROM cells
    )
    SELECT doc_id,
           t::BIGINT AS frame_idx,
           (8 * bw)::BIGINT AS width,
           (8 * bh)::BIGINT AS height,
           (bw * bh)::BIGINT AS n_blocks,
           sum(CASE WHEN k = 0 THEN d ELSE 0 END)::BIGINT AS sum_dc,
           sum(CASE WHEN k > 0 THEN abs(d) ELSE 0 END)::BIGINT
               AS sum_abs_ac,
           sum(d * d)::BIGINT AS sum_sq,
           sum(((by * bw + bx) * 64 + k + 1) * d)::BIGINT AS zz_checksum
    FROM deq GROUP BY doc_id, t, bw, bh
    """,
)
def multimodal_video_avi_mjpeg_frames(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Video demux through a REAL RIFF AVI container with MJPEG frames
    (late round 13): per document-keyed asset, a genuine
    'RIFF…AVI ' layout — LIST hdrl (avih frame count/dims + 'vids'/
    'MJPG' strh + BITMAPINFOHEADER strf), LIST movi of '00dc' chunks
    each holding a full JFIF stream (odd sizes occur naturally, so
    RIFF's even-padding rule is really exercised), and an idx1 whose
    per-frame offsets AND sizes must agree with the actual movi
    layout — demuxed strictly and entropy-decoded per frame by the
    round's baseline JPEG decoder
    (operators/multimodal.py:decode_avi_mjpeg). Features live in the
    exact coefficient domain like the still entry, one row per frame;
    the oracle recomputes them from the closed-form per-frame signal,
    so list-nesting, padding, index-consistency, frame-order and
    every JPEG entropy bug class break the hash
    (tests/test_avi_codec.py exercises them directly). With this,
    every container/demux/entropy layer across image, audio and video
    is REAL; the only faked stage anywhere is JPEG's lossy pixel path
    (IDCT). Scale: map-only 1→N demux inside mapInPandas, zero
    exchanges — plan-pinned with the other decode entries."""
    docs = load_table(spark, sf_dir, "documents")
    return avi_frame_features(docs)


@register(
    "multimodal_image_resize_features",
    # Round 14 (late registration, r9 queue protocol — first driver row
    # in r15): the north-star's `resize` op made REAL. Nearest-neighbor
    # is the resize kernel that is exact in integers — src index =
    # (dst * src) // dst — so the oracle can recompute the resample map
    # itself: it regenerates the SOURCE pixel signal (the PNG closed
    # form), applies the same floor map to a 16×12 target, and
    # recomputes every feature from the resampled values. A flipped
    # axis, ceil-vs-floor slip or off-by-one in the map breaks the
    # hash. Widths 8..32 / heights 8..20 mean the corpus exercises both
    # up- and down-sampling on both axes.
    # shares _PNG_PARAMS_CTE with the other PNG oracles; the pixel
    # value formula below mirrors the pix CTE's (it cannot reuse pix
    # itself: resize enumerates DESTINATION pixels and looks the
    # source signal up through the floor map)
    oracle=f"""
    WITH {_PNG_PARAMS_CTE},
    dst AS (
        SELECT doc_id, w, h, y2, x2, c,
               (y2 * h) // {RESIZE_H} AS sy,
               (x2 * w) // {RESIZE_W} AS sx
        FROM params,
             unnest(range(0, {RESIZE_H})) AS u(y2),
             unnest(range(0, {RESIZE_W})) AS q(x2),
             unnest(range(0, 3)) AS t(c)
    ),
    vals AS (
        SELECT doc_id, w, h, (y2 * {RESIZE_W} + x2) * 3 + c AS i,
               (doc_id * 4099 + sy * 131 + sx * 17 + c * 59) % 256 AS v
        FROM dst
    )
    SELECT doc_id,
           w::BIGINT AS src_width,
           h::BIGINT AS src_height,
           {RESIZE_W}::BIGINT AS width,
           {RESIZE_H}::BIGINT AS height,
           count(*)::BIGINT AS n_values,
           sum(v)::BIGINT AS sum_vals,
           sum(v * v)::BIGINT AS sum_sq,
           max(v)::BIGINT AS peak,
           sum((i + 1) * v)::BIGINT AS pos_checksum
    FROM vals GROUP BY doc_id, w, h
    """,
)
def multimodal_image_resize_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Image resize through the real codec: decode the PNG container,
    nearest-neighbor-resample the DECODED pixels to the fixed 16×12
    thumbnail grid, and feature-extract exact integers from the
    resized plane only (operators/multimodal.py:png_resize_features).
    Replaces the deleted payload-truncating resize stub with a real
    kernel under the same mapInPandas contract. Scale: map-only
    decode+resize, zero exchanges, plan-pinned with the other decode
    entries."""
    docs = load_table(spark, sf_dir, "documents")
    return png_resize_features(docs)
