"""Punycode: RFC 3492 §7.1 sample vectors, stdlib-codec differential
fuzz, round-trips, and IDN-aware homograph skeletons."""

import random

import pytest

from ocr_spark.kernels.punycode import (
    idn_to_unicode,
    punycode_decode,
    punycode_encode,
)

# RFC 3492 §7.1 sample strings (A: Arabic, C: Chinese simplified, L: the
# "why can't they just speak in <language>" Japanese sample, plus pure
# ASCII and mixed cases)
RFC_VECTORS = [
    (
        "".join(map(chr, [0x0644, 0x064A, 0x0647, 0x0645, 0x0627, 0x0628,
                          0x062A, 0x0643, 0x0644, 0x0645, 0x0648, 0x0634,
                          0x0639, 0x0631, 0x0628, 0x064A, 0x061F])),
        "egbpdaj6bu4bxfgehfvwxn",
    ),
    (
        "".join(map(chr, [0x4ED6, 0x4EEC, 0x4E3A, 0x4EC0, 0x4E48, 0x4E0D,
                          0x8BF4, 0x4E2D, 0x6587])),
        "ihqwcrb4cv8a8dqg056pqjye",
    ),
    (
        "".join(map(chr, [0x0050, 0x0072, 0x006F, 0x010D, 0x0070, 0x0072,
                          0x006F, 0x0073, 0x0074, 0x011B, 0x006E, 0x0065,
                          0x006D, 0x006C, 0x0075, 0x0076, 0x00ED, 0x010D,
                          0x0065, 0x0073, 0x006B, 0x0079])),
        "Proprostnemluvesky-uyb24dma41a",
    ),
    ("-> $1.00 <-", "-> $1.00 <--"),
]


def test_rfc_sample_vectors():
    for plain, encoded in RFC_VECTORS:
        assert punycode_encode(plain).lower() == encoded.lower()
        assert punycode_decode(encoded) == plain


def test_differential_vs_stdlib_codec_fuzz():
    rng = random.Random(5)
    pool = "abcz09-" + "é漢Ωд中ü"
    for _ in range(300):
        s = "".join(rng.choice(pool) for _ in range(rng.randint(1, 12)))
        if all(ord(c) < 128 for c in s):
            continue  # stdlib codec and RFC agree only on non-pure-ASCII
        enc = punycode_encode(s)
        assert enc == s.encode("punycode").decode("ascii")
        assert punycode_decode(enc) == s


def test_decode_rejects_garbage():
    # non-basic digit, invalid digit after the delimiter, overflow
    for bad in ("é", "abc-é", "9" * 40):
        with pytest.raises((ValueError, OverflowError)):
            punycode_decode(bad)


def test_idn_to_unicode_tolerant():
    # the famous all-Cyrillic apple.com lookalike
    assert idn_to_unicode("xn--80ak6aa92e.com") == "".join(
        map(chr, [0x430, 0x440, 0x440, 0x4CF, 0x435])
    ) + ".com"
    # corrupt label passes through verbatim
    assert idn_to_unicode("xn--!!!.com") == "xn--!!!.com"
    assert idn_to_unicode("plain.example") == "plain.example"


def test_homograph_skeleton_is_idn_aware():
    from ocr_spark.operators.urls import host_skeleton

    # punycode-encoded Cyrillic 'о' in 'hоst3' folds to the ascii skeleton
    enc = "xn--" + "h\u043est3".encode("punycode").decode("ascii")
    assert host_skeleton(f"{enc}.example") == "host3.example"
