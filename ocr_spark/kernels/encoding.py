"""Charset sniffing + decoding for crawl page bytes.

Real Common-Crawl HTML is ~10-20% non-UTF-8: windows-1252 and friends
declared via ``<meta charset=...>`` / ``<meta http-equiv="Content-Type"
content="text/html; charset=...">``, plus BOM-marked UTF-16/32 documents.
The reference repo reads local files and leaves decoding to Python's
defaults; an extraction engine pointed at a crawl cannot — a cp1252 page
decoded as UTF-8/replace turns every accented character into U+FFFD and
the "byte-identical extracted text" contract dies on arrival.

Detection order (the WHATWG "get an encoding" shape, simplified to the
deterministic subset this engine needs):

1. **BOM** wins unconditionally: UTF-8-sig, UTF-32 LE/BE (checked before
   UTF-16 — a UTF-32-LE BOM starts with the UTF-16-LE one), UTF-16 LE/BE.
2. **In-document declaration** in the first 4 KiB: ``<meta charset=X>``
   or the http-equiv form. Labels normalize per the WHATWG encoding
   registry's aliasing: ``iso-8859-1`` / ``latin1`` / ``us-ascii`` are
   windows-1252 on the web, ``shift_jis`` is windows-31j (cp932),
   ``gb2312`` is GBK, ``euc-kr`` is windows-949 (cp949). A declared
   ``utf-16`` without a BOM is treated as utf-8 (WHATWG meta rule — the
   declaration itself was readable, so the document isn't UTF-16).
3. **Strict UTF-8 probe**: a page whose bytes are valid UTF-8 is UTF-8.
4. **Fallback**: windows-1252 (the web's legacy default), errors=replace.

Decoding always uses ``errors="replace"`` — a crawl page may declare one
charset and contain bytes from another; extraction must degrade, never
raise (the same at-scale stance as extract_batch's per-document guard).
"""

from __future__ import annotations

import re

# ordered: longer BOMs first (UTF-32-LE's BOM begins with UTF-16-LE's)
_BOMS: tuple[tuple[bytes, str], ...] = (
    (b"\xef\xbb\xbf", "utf-8"),
    (b"\xff\xfe\x00\x00", "utf-32-le"),
    (b"\x00\x00\xfe\xff", "utf-32-be"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
)

# <meta charset="X"> and <meta ... content="text/html; charset=X">; the
# attr-order-free form (charset= anywhere inside a <meta ...> tag) covers
# both. Bounded lookbehind window keeps the scan linear.
_META_CHARSET_RE = re.compile(
    rb"<meta[^>]{0,512}?charset\s*=\s*[\"']?\s*([a-zA-Z0-9_.:\-]+)", re.I
)

# WHATWG-registry label -> Python codec (the subset that covers the
# overwhelming share of crawl declarations; unknown labels fall through
# to the UTF-8 probe). Keys are lowercase, '-'/'_' both accepted.
_LABEL_TO_CODEC: dict[str, str] = {
    # unicode
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    # the web's latin-1 is windows-1252 (WHATWG maps all these labels)
    "iso-8859-1": "cp1252", "iso8859-1": "cp1252", "latin1": "cp1252",
    "latin-1": "cp1252", "us-ascii": "cp1252", "ascii": "cp1252",
    "windows-1252": "cp1252", "cp1252": "cp1252", "x-cp1252": "cp1252",
    # other single-byte windows/iso families
    "windows-1250": "cp1250", "windows-1251": "cp1251",
    "windows-1253": "cp1253", "windows-1254": "cp1254",
    "windows-1255": "cp1255", "windows-1256": "cp1256",
    "windows-1257": "cp1257", "windows-1258": "cp1258",
    "cp1251": "cp1251", "iso-8859-2": "iso8859-2", "iso8859-2": "iso8859-2",
    "iso-8859-5": "iso8859-5", "iso-8859-7": "iso8859-7",
    "iso-8859-9": "cp1254", "iso-8859-15": "iso8859-15",
    "koi8-r": "koi8-r", "koi8-u": "koi8-u",
    "tis-620": "cp874", "iso-8859-11": "cp874", "windows-874": "cp874",
    # CJK (WHATWG: shift_jis->windows-31j, gb2312->GBK, euc-kr->windows-949)
    "shift_jis": "cp932", "shift-jis": "cp932", "sjis": "cp932",
    "ms_kanji": "cp932", "windows-31j": "cp932", "x-sjis": "cp932",
    "euc-jp": "euc_jp", "iso-2022-jp": "iso2022_jp",
    "gbk": "gbk", "gb2312": "gbk", "gb_2312-80": "gbk", "x-gbk": "gbk",
    "gb18030": "gb18030", "big5": "big5", "big5-hkscs": "big5hkscs",
    "euc-kr": "cp949", "korean": "cp949", "windows-949": "cp949",
}


def detect_bom(blob: bytes):
    """Return (codec, bom_length) for a BOM-marked stream, else None."""
    for bom, codec in _BOMS:
        if blob.startswith(bom):
            return codec, len(bom)
    return None


def normalize_label(label: str) -> str | None:
    """Charset label (as declared in a page) -> Python codec name, or None
    for labels outside the supported registry subset."""
    return _LABEL_TO_CODEC.get(label.strip().lower().replace("_", "-").replace("cp-", "cp"))


def sniff_charset(blob: bytes) -> tuple[str, str]:
    """Return (python_codec, source) where source is one of
    'bom' | 'meta' | 'utf8' | 'fallback'."""
    bom = detect_bom(blob)
    if bom is not None:
        return bom[0], "bom"
    m = _META_CHARSET_RE.search(blob[:4096])
    if m:
        codec = normalize_label(m.group(1).decode("latin-1"))
        if codec is not None:
            return codec, "meta"
        if m.group(1).lower().startswith(b"utf-16"):
            # WHATWG meta rule: a readable utf-16 declaration means the
            # document is NOT utf-16 — treat as utf-8
            return "utf-8", "meta"
    try:
        blob.decode("utf-8")
        return "utf-8", "utf8"
    except (UnicodeDecodeError, ValueError):
        return "cp1252", "fallback"


def decode_bytes(blob: bytes) -> tuple[str, str, str]:
    """Page bytes -> (text, codec, source). Never raises: unknown codecs
    and stray bytes degrade through errors='replace'."""
    bom = detect_bom(blob)
    if bom is not None:
        codec, n = bom
        return blob[n:].decode(codec, errors="replace"), codec, "bom"
    codec, source = sniff_charset(blob)
    try:
        return blob.decode(codec, errors="replace"), codec, source
    except LookupError:  # defensive: registry maps only to stdlib codecs
        return blob.decode("utf-8", errors="replace"), "utf-8", "fallback"
