"""Content-defined chunking (CDC) for storage-level payload dedup.

The LBFS / Rabin-chunking idea (Muthitacharoen et al. 2001, SOSP; the
FastCDC refinement is Xia et al. 2016, ATC): cut a byte stream wherever a
hash of the trailing ``window`` bytes satisfies a divisor test.  Because
the cut points depend only on LOCAL content, an insertion or deletion
re-aligns after the first shared boundary — unlike fixed-size blocks,
where one shifted byte breaks every subsequent block hash.  Identical
regions across payloads (mirror bodies, template boilerplate, WARC
revisits with edited heads) therefore collapse to identical chunk hashes,
which is the storage-dedup primitive behind archive stores.

Two deliberate choices keep the scheme independently re-derivable (the
DuckDB oracle recomputes every window hash, boundary, and chunk digest
from scratch):

- The window hash is a plain base-``k`` polynomial of the trailing
  ``window`` bytes mod ``mod`` (same family as the winnowing kernel's
  token hashes) — positionally computable, so the oracle needs no
  sequential rolling state.  The kernel still evaluates it in O(n) for
  all positions at once via an int64 sliding dot product (no overflow:
  255 * 31^7 * 8 < 2^63).
- ``min_size``/``max_size`` default to the PURE content-defined rule
  (every divisor hit cuts; no floors/ceilings), which is stateless per
  position.  Production floors/ceilings are supported but make boundary
  acceptance sequential; they are exercised by unit tests, not the
  oracle query.

Chunk identity is md5 over the chunk's raw bytes — portable to the
oracle because DuckDB's ``md5()`` hashes the UTF-8 encoding, which for
ASCII-range bytes (< 0x80) is the identity.
"""

from __future__ import annotations

import hashlib

import numpy as np

MOD = 1_000_000_007
K = 31


def window_hashes(
    data: bytes, *, window: int = 8, k: int = K, mod: int = MOD
) -> np.ndarray:
    """Hash of every ``window``-byte trailing window: out[i] is the hash
    of data[i-window+1 .. i] for i in [window-1, len).  Vectorized sliding
    dot product; coefficients k^(window-1) .. k^0 stay below the int64
    overflow line for window <= 8, k = 31."""
    if len(data) < window:
        return np.empty(0, dtype=np.int64)
    b = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    coef = np.array([pow(k, window - 1 - j) for j in range(window)], dtype=np.int64)
    windows = np.lib.stride_tricks.sliding_window_view(b, window)
    return (windows @ coef) % mod


def cdc_boundaries(
    data: bytes,
    *,
    window: int = 8,
    divisor: int = 64,
    min_size: int = 1,
    max_size: int | None = None,
) -> list[int]:
    """END positions (inclusive, 0-based) of content-defined cuts.  A cut
    lands at position i when the trailing-window hash is ≡ 0 mod
    ``divisor``; with floors/ceilings, hits closer than ``min_size``
    bytes to the previous accepted cut are skipped and a forced cut is
    inserted at ``max_size`` bytes.  The final byte never needs a hit —
    the tail is always a chunk."""
    h = window_hashes(data, window=window)
    hits = (np.nonzero(h % divisor == 0)[0] + window - 1).tolist()
    if min_size <= 1 and max_size is None:
        return hits
    out: list[int] = []
    start = 0
    hit_set = set(hits)
    for i in range(len(data)):
        size = i - start + 1
        if (i in hit_set and size >= min_size) or (
            max_size is not None and size >= max_size
        ):
            out.append(i)
            start = i + 1
    return out


def cdc_chunks(
    data: bytes,
    *,
    window: int = 8,
    divisor: int = 64,
    min_size: int = 1,
    max_size: int | None = None,
) -> list[tuple[int, int, str]]:
    """Split ``data`` into content-defined chunks: a list of
    (offset, length, md5-hex).  Empty input yields no chunks."""
    if not data:
        return []
    ends = cdc_boundaries(
        data, window=window, divisor=divisor, min_size=min_size, max_size=max_size
    )
    if not ends or ends[-1] != len(data) - 1:
        ends = list(ends) + [len(data) - 1]
    out = []
    start = 0
    for e in ends:
        chunk = data[start : e + 1]
        out.append((start, len(chunk), hashlib.md5(chunk).hexdigest()))
        start = e + 1
    return out
