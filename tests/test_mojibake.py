"""Mojibake detection/repair kernel (kernels/mojibake.py): WHATWG
windows-1252 byte tables, signature scoring, and the conservative
round-trip repair loop behind the `mojibake` contract query."""

from ocr_spark.kernels.mojibake import (
    corrupt_utf8_as_w1252,
    fix_mojibake,
    mojibake_score,
    w1252_decode,
    w1252_encode,
)


def test_roundtrip_single_and_double():
    clean = "menu: déjà vu — café™ … „quote” €5"
    c1 = corrupt_utf8_as_w1252(clean)
    c2 = corrupt_utf8_as_w1252(c1)
    assert c1 != clean and c2 != c1
    assert fix_mojibake(c1) == (clean, 1)
    assert fix_mojibake(c2) == (clean, 2)


def test_whatwg_c1_bytes_reversible():
    # bytes 81 8D 8F 90 9D are undefined in python's cp1252 codec but
    # WHATWG maps them to C1 controls of the same value — must round-trip
    for b in (0x81, 0x8D, 0x8F, 0x90, 0x9D):
        assert w1252_encode(w1252_decode(bytes([b]))) == bytes([b])
    # U+0090 is the trail of the utf-8 encoding of many CJK/emoji planes;
    # a char whose utf-8 uses one of those bytes must still repair
    clean = "xђy"  # dje: utf-8 d1 92 -> trail char from 0x92
    assert fix_mojibake(corrupt_utf8_as_w1252(clean)) == (clean, 1)


def test_ascii_and_clean_accents_untouched():
    assert fix_mojibake("plain ascii text") == ("plain ascii text", 0)
    # clean accented prose: lead-class letters never followed by trail class
    for t in ("señor café au lait", "ação", "über Äpfel"):
        assert mojibake_score(t) == 0
        assert fix_mojibake(t) == (t, 0)


def test_refuses_invalid_roundtrips():
    # genuine signature bigram but the full byte string is invalid utf-8
    # (C3 BF C3: the final C3 is a dangling lead byte) -> repair refuses
    t = "Ã¿Ã"
    assert mojibake_score(t) > 0
    assert fix_mojibake(t) == (t, 0)
    # a char outside windows-1252 entirely -> encode refuses, text passes
    t2 = "mixed Ã© with 漢字"
    assert mojibake_score(t2) > 0
    assert fix_mojibake(t2) == (t2, 0)


def test_whole_string_repair_of_literal_mention():
    # documented ftfy-parity behavior: a clean page QUOTING the char pair
    # 'LATIN CAPITAL A TILDE + (c)' in prose still round-trips as a whole
    # string, so it is repaired
    fixed, rounds = fix_mojibake("the sequence 'Ã©' means e-acute")
    assert rounds == 1 and "'é'" in fixed
