"""Mojibake detection + repair: UTF-8 bytes that were misdecoded as
windows-1252 somewhere upstream ("Ã©" where "é" was meant) — endemic in
web crawls whenever an origin server lies about its charset or a proxy
re-encodes a page. The ftfy core move (Speer, `ftfy`): if the text's code
points, mapped back through the WHATWG windows-1252 byte table, form
valid UTF-8, the page was double-decoded — undo it; repeat for
double-mojibake (a page corrupted twice along the way).

Relationship to `kernels/encoding.py`: that module picks the right codec
for raw BYTES at ingest; this one repairs TEXT that arrives already
damaged (the bytes are long gone — e.g. a third-party corpus dump).

Repair policy (deterministic, conservative):
- the WHATWG table is the cp1252 codec with the five undefined bytes
  (81 8D 8F 90 9D) passed through as the C1 controls of the same value,
  exactly as browsers decode them — so every byte is reversible;
- a repair round applies only when (a) the signature score is non-zero,
  (b) EVERY code point maps back to a windows-1252 byte, (c) the bytes
  are strictly valid UTF-8, and (d) the candidate strictly reduces the
  signature score. Any failure stops the loop — a clean page that merely
  MENTIONS "Ã©" in prose is still repaired only if the whole string
  round-trips (the same behavior ftfy exhibits; segment-level repair is
  out of scope).

Everything is pure string/byte arithmetic — no locale, no platform
codecs beyond the fixed table — so results are bit-identical anywhere.
"""

from __future__ import annotations

import re


def _tables():
    dec = {}
    for b in range(256):
        try:
            dec[b] = bytes([b]).decode("cp1252")
        except UnicodeDecodeError:
            dec[b] = chr(b)  # WHATWG: 81 8D 8F 90 9D -> C1 controls
    enc = {c: b for b, c in dec.items()}
    return dec, enc


_W1252_DEC, _W1252_ENC = _tables()

# A mojibake signature is a UTF-8 lead-byte character (U+00C2..U+00F4 via
# the table) followed by a trail-byte character (the images of 80..BF:
# the cp1252 punctuation block, the five C1 controls, or U+00A0..U+00BF).
# The trail class is the discriminator: clean accented text ("señor",
# "ação") never puts those after a lead-class letter.
_TRAIL = (
    "€‚ƒ„…†‡ˆ‰Š‹"
    "ŒŽ‘’“”•–—˜™"
    "š›œžŸ\x81\x8d\x8f\x90\x9d"
)
_SIG_RE = re.compile("[Â-ô][" + re.escape(_TRAIL) + " -¿]")


def w1252_decode(blob: bytes) -> str:
    """Decode bytes with the WHATWG windows-1252 table (total: never fails)."""
    return "".join(_W1252_DEC[b] for b in blob)


def w1252_encode(text: str) -> bytes | None:
    """Inverse table; None when any code point is outside windows-1252."""
    try:
        return bytes(_W1252_ENC[c] for c in text)
    except KeyError:
        return None


def mojibake_score(text: str) -> int:
    """Count of (non-overlapping) mojibake signature bigrams."""
    return len(_SIG_RE.findall(text))


def corrupt_utf8_as_w1252(text: str) -> str:
    """The FORWARD corruption (what a misconfigured decoder does): UTF-8
    bytes read through windows-1252. Used by tests and the contract
    query's deterministic dirty-corpus construction — the repair path
    below is its inverse, derived independently from the byte tables."""
    return w1252_decode(text.encode("utf-8"))


def fix_mojibake(text: str, *, max_rounds: int = 3) -> tuple[str, int]:
    """Repair up to ``max_rounds`` layers of UTF-8-as-windows-1252
    damage. Returns (repaired_text, rounds_applied)."""
    rounds = 0
    for _ in range(max_rounds):
        score = mojibake_score(text)
        if score == 0:
            break
        raw = w1252_encode(text)
        if raw is None:
            break
        try:
            cand = raw.decode("utf-8")
        except UnicodeDecodeError:
            break
        if mojibake_score(cand) >= score:
            break
        text = cand
        rounds += 1
    return text, rounds
