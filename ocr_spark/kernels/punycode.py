"""Punycode (RFC 3492) — the ASCII-compatible encoding IDN hostnames
arrive in on the wire (``xn--`` labels). Clean-room implementation of the
RFC's pseudocode: generalized variable-length integers with bias
adaptation over base 36.

Why here: crawl URLs carry IDN hosts punycode-encoded; homograph
detection (operators/urls.host_skeleton) must compare the DECODED
labels, or ``xn--80ak6aa92e.com`` (the famous all-Cyrillic "apple.com")
sails past the confusable fold. Python's built-in ``'punycode'`` codec
exists, but the kernel keeps the arithmetic explicit, byte-deterministic
and dependency-free — and the tests pin it against the RFC 3492 §7.1
sample vectors AND the stdlib codec.
"""

from __future__ import annotations

__all__ = ["punycode_decode", "punycode_encode", "idn_to_unicode"]

BASE = 36
TMIN, TMAX = 1, 26
SKEW, DAMP = 38, 700
INITIAL_BIAS = 72
INITIAL_N = 128


def _adapt(delta: int, numpoints: int, firsttime: bool) -> int:
    delta = delta // DAMP if firsttime else delta // 2
    delta += delta // numpoints
    k = 0
    while delta > ((BASE - TMIN) * TMAX) // 2:
        delta //= BASE - TMIN
        k += BASE
    return k + (((BASE - TMIN + 1) * delta) // (delta + SKEW))


def _digit_value(c: str) -> int:
    if "a" <= c <= "z":
        return ord(c) - ord("a")
    if "A" <= c <= "Z":
        return ord(c) - ord("A")
    if "0" <= c <= "9":
        return ord(c) - ord("0") + 26
    raise ValueError(f"invalid punycode digit {c!r}")


def punycode_decode(text: str) -> str:
    """RFC 3492 §6.2 decoding of one label body (no ``xn--`` prefix)."""
    n, i, bias = INITIAL_N, 0, INITIAL_BIAS
    pos = text.rfind("-")
    if pos > 0:
        output = [ord(c) for c in text[:pos]]
        if any(cp >= 128 for cp in output):
            raise ValueError("non-basic code point in literal portion")
        rest = text[pos + 1 :]
    else:
        output = []
        rest = text[1:] if pos == 0 else text
    j = 0
    while j < len(rest):
        oldi, w, k = i, 1, BASE
        while True:
            if j >= len(rest):
                raise ValueError("truncated punycode input")
            digit = _digit_value(rest[j])
            j += 1
            i += digit * w
            t = TMIN if k <= bias else (TMAX if k >= bias + TMAX else k - bias)
            if digit < t:
                break
            w *= BASE - t
            k += BASE
        bias = _adapt(i - oldi, len(output) + 1, oldi == 0)
        n += i // (len(output) + 1)
        if n > 0x10FFFF:
            raise ValueError("code point overflow")
        i %= len(output) + 1
        output.insert(i, n)
        i += 1
    return "".join(chr(cp) for cp in output)


def punycode_encode(text: str) -> str:
    """RFC 3492 §6.3 encoding of one label to its punycode body."""
    cps = [ord(c) for c in text]
    basic = [c for c in text if ord(c) < 128]
    out = basic[:]
    h = b = len(basic)
    if b:
        out.append("-")
    n, delta, bias = INITIAL_N, 0, INITIAL_BIAS
    while h < len(cps):
        m = min(cp for cp in cps if cp >= n)
        delta += (m - n) * (h + 1)
        if delta > 2**31:
            raise ValueError("delta overflow")
        n = m
        for cp in cps:
            if cp < n:
                delta += 1
            elif cp == n:
                q, k = delta, BASE
                while True:
                    t = TMIN if k <= bias else (
                        TMAX if k >= bias + TMAX else k - bias
                    )
                    if q < t:
                        break
                    out.append(
                        "abcdefghijklmnopqrstuvwxyz0123456789"[t + (q - t) % (BASE - t)]
                    )
                    q = (q - t) // (BASE - t)
                    k += BASE
                out.append("abcdefghijklmnopqrstuvwxyz0123456789"[q])
                bias = _adapt(delta, h + 1, h == b)
                delta = 0
                h += 1
        delta += 1
        n += 1
    return "".join(out)


def idn_to_unicode(host: str) -> str:
    """Decode every ``xn--`` label of a hostname; labels that fail to
    decode (corrupt crawl data) pass through verbatim — the tolerant
    behavior an extraction pipeline needs."""
    labels = host.split(".")
    out = []
    for lab in labels:
        low = lab.lower()
        if low.startswith("xn--"):
            try:
                out.append(punycode_decode(low[4:]))
                continue
            except (ValueError, OverflowError):
                pass
        out.append(lab)
    return ".".join(out)
