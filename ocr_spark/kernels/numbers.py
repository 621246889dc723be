"""Number verbalization (SURVEY.md §2.9 F5 analog).

The reference normalizes numbers/ordinals/money/time spans to words inside
its text cleaners (reference behavior: utils/text/numbers.py, driven by
cleaners `expand_numbers`; tested in tests/test_utils_text.py:33-118).  It
delegates digit->word conversion to the external `num2words` package; this
rebuild ships its own small English verbalizer (no external deps) with the
same *shapes* — cardinal, ordinal, decimal, money, clock time — and
documents its exact outputs in tests/test_kernels_numbers.py.

Pure python, vectorized through a pandas UDF at the operator layer.
"""

from __future__ import annotations

import re

_UNITS = [
    "zero", "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
    "sixteen", "seventeen", "eighteen", "nineteen",
]
_TENS = [
    "", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
    "eighty", "ninety",
]
_SCALES = [(10 ** 9, "billion"), (10 ** 6, "million"), (10 ** 3, "thousand")]

_ORDINAL_IRREGULAR = {
    "one": "first", "two": "second", "three": "third", "five": "fifth",
    "eight": "eighth", "nine": "ninth", "twelve": "twelfth",
}


def int_to_words(n: int) -> str:
    """42 -> 'forty-two'; 105 -> 'one hundred five'; negative -> 'minus …'."""
    if n < 0:
        return "minus " + int_to_words(-n)
    if n < 20:
        return _UNITS[n]
    if n < 100:
        tens, rem = divmod(n, 10)
        return _TENS[tens] + ("-" + _UNITS[rem] if rem else "")
    if n < 1000:
        hundreds, rem = divmod(n, 100)
        out = _UNITS[hundreds] + " hundred"
        return out + (" " + int_to_words(rem) if rem else "")
    for scale, name in _SCALES:
        if n >= scale:
            major, rem = divmod(n, scale)
            out = int_to_words(major) + " " + name
            return out + (" " + int_to_words(rem) if rem else "")
    raise ValueError(f"out of range: {n}")


def ordinal_to_words(n: int) -> str:
    """3 -> 'third'; 21 -> 'twenty-first'; 100 -> 'one hundredth'."""
    words = int_to_words(n)
    head, sep, last = words.rpartition("-") if "-" in words else words.rpartition(" ")
    if last in _ORDINAL_IRREGULAR:
        last = _ORDINAL_IRREGULAR[last]
    elif last.endswith("y"):
        last = last[:-1] + "ieth"
    else:
        last = last + "th"
    return head + sep + last


def decimal_to_words(text: str) -> str:
    """'3.14' -> 'three point one four'."""
    whole, _, frac = text.partition(".")
    out = int_to_words(int(whole))
    if frac:
        out += " point " + " ".join(_UNITS[int(d)] for d in frac)
    return out


def money_to_words(amount: str, currency: str = "$") -> str:
    """'$5' -> 'five dollars'; '$2.50' -> 'two dollars fifty cents'."""
    unit, cent = {"$": ("dollar", "cent"), "€": ("euro", "cent"),
                  "£": ("pound", "penny")}.get(currency, ("dollar", "cent"))
    whole, _, frac = amount.partition(".")
    n = int(whole)
    out = int_to_words(n) + " " + unit + ("s" if n != 1 else "")
    if frac:
        c = int(frac.ljust(2, "0")[:2])
        if c:
            cent_word = cent + ("s" if c != 1 and cent != "penny" else "")
            if cent == "penny" and c != 1:
                cent_word = "pence"
            out += " " + int_to_words(c) + " " + cent_word
    return out


def time_to_words(hh: int, mm: int) -> str:
    """3:30 -> 'three thirty'; 9:05 -> 'nine oh five'; 12:00 -> 'twelve o'clock'."""
    hour = int_to_words(hh if 1 <= hh <= 12 else hh % 12 or 12)
    if mm == 0:
        return hour + " o'clock"
    if mm < 10:
        return hour + " oh " + _UNITS[mm]
    return hour + " " + int_to_words(mm)


_MONEY_RE = re.compile(r"([$€£])(\d+(?:\.\d+)?)")
_TIME_RE = re.compile(r"\b(\d{1,2}):([0-5]\d)\b")
_ORDINAL_RE = re.compile(r"\b(\d+)(st|nd|rd|th)\b")
_DECIMAL_RE = re.compile(r"\b(\d+\.\d+)\b")
_INT_RE = re.compile(r"\b(\d+)\b")


def normalize_numbers(text: str) -> str:
    """Expand money, clock times, ordinals, decimals, then bare integers —
    in that order (longest-pattern-first so '$2.50' is not eaten by the
    decimal rule)."""
    text = _MONEY_RE.sub(lambda m: money_to_words(m.group(2), m.group(1)), text)
    text = _TIME_RE.sub(lambda m: time_to_words(int(m.group(1)), int(m.group(2))), text)
    text = _ORDINAL_RE.sub(lambda m: ordinal_to_words(int(m.group(1))), text)
    text = _DECIMAL_RE.sub(lambda m: decimal_to_words(m.group(1)), text)
    text = _INT_RE.sub(lambda m: int_to_words(int(m.group(1))), text)
    return text
