"""Content-defined chunking (CDC) — Rabin-Karp rolling-hash chunk
boundaries, the storage-dedup family (LBFS/rsync lineage) that catches
*partial* duplication (shared passages, prepended boilerplate) which
whole-document MinHash/SimHash blur out.

The defining property — and the reason it beats fixed-size chunking for
dedup — is boundary stability: a local edit only perturbs the chunks it
touches, because boundaries depend on a rolling window of content, not
on byte offsets. `tests/test_properties.py` pins exactly that: after a
head insertion, the tail chunk hashes are unchanged.

Spark posture: chunking is per-document pure Python (docs are KB-scale;
the rolling loop is bytes-local) behind an Arrow-batched mapInPandas —
a map-only 1→N expansion. Everything after (shared-chunk pairing,
containment scoring) is plain DataFrame joins/aggregates.
"""

from __future__ import annotations

import hashlib

_B = 257          # rolling base
_M = 1 << 31      # hash modulus
_DIV = 64         # boundary divisor → expected chunk ≈ 64 bytes
_WIN = 16         # rolling window width
_MAX = 160        # maximum chunk length (bounds worst case)


def chunk_bytes(data: bytes) -> list[tuple[int, int, str]]:
    """Split `data` at content-defined boundaries; returns
    [(offset, length, chunk_hash_hex16)]. A boundary lands after byte i
    when the rolling hash of the trailing _WIN bytes ≡ _DIV−1 (mod _DIV);
    chunks are force-cut at _MAX bytes.

    The rolling hash runs CONTINUOUSLY over the stream (never reset at a
    cut) and has no minimum-length gate, so the content-boundary set is
    an absolute function of the bytes: after any edit, the first content
    boundary ≥ _WIN bytes past it realigns both chunkings, and every
    later chunk is identical. A reset-at-cut or min-length variant loses
    exactly that resynchronization guarantee."""
    chunks: list[tuple[int, int, str]] = []
    if not data:
        return chunks
    pw_full = pow(_B, _WIN, _M)
    start = 0
    h = 0
    for i, c in enumerate(data):
        h = (h * _B + c) % _M
        if i >= _WIN:
            h = (h - data[i - _WIN] * pw_full) % _M
        clen = i - start + 1
        if (i >= _WIN - 1 and h % _DIV == _DIV - 1) or clen >= _MAX:
            chunk = data[start : i + 1]
            chunks.append(
                (start, clen, hashlib.md5(chunk).hexdigest()[:16])
            )
            start = i + 1
    if start < len(data):
        tail = data[start:]
        chunks.append(
            (start, len(tail), hashlib.md5(tail).hexdigest()[:16])
        )
    return chunks


def chunk_text(text: str) -> list[tuple[int, int, str]]:
    return chunk_bytes(text.encode("utf-8"))
