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


# --------------------------------------------------------------------------
# French / Belgian-French (F5 completion, VERDICT r01 item 8)
#
# The reference verbalizes fr/be through num2words inside expand_numbers
# (utils/text/numbers.py; fixtures tests/test_utils_text.py:33-118). This
# is a self-contained re-derivation covering the fixture surface: cardinals
# (with the Belgian septante/nonante decades), gendered 'un/une', ordinals
# (premier / -ième with elision), durations ('2 min 1sec' ->
# 'deux minutes et une seconde') and money.
# --------------------------------------------------------------------------

_FR_UNITS = [
    "zéro", "un", "deux", "trois", "quatre", "cinq", "six", "sept", "huit",
    "neuf", "dix", "onze", "douze", "treize", "quatorze", "quinze", "seize",
    "dix-sept", "dix-huit", "dix-neuf",
]
_FR_TENS = {20: "vingt", 30: "trente", 40: "quarante", 50: "cinquante", 60: "soixante"}


def _fr_under_100(n: int, belgian: bool) -> str:
    if n < 20:
        return _FR_UNITS[n]
    tens, rem = (n // 10) * 10, n % 10
    if belgian and tens in (70, 90):
        name = "septante" if tens == 70 else "nonante"
        if rem == 0:
            return name
        return name + (" et un" if rem == 1 else "-" + _FR_UNITS[rem])
    if tens == 70 or (tens == 90 and not belgian):
        # soixante-dix / quatre-vingt-dix families: base + teens
        base = "soixante" if tens == 70 else "quatre-vingt"
        teen = _FR_UNITS[10 + rem]
        if tens == 70 and rem == 1:
            return "soixante et onze"
        return base + "-" + teen
    if tens in (80, 90):
        if n == 80:
            return "quatre-vingts"
        return "quatre-vingt-" + _FR_UNITS[n - 80]
    name = _FR_TENS[tens]
    if rem == 0:
        return name
    return name + (" et un" if rem == 1 else "-" + _FR_UNITS[rem])


def int_to_words_fr(n: int, *, feminine: bool = False, belgian: bool = False) -> str:
    """42 -> 'quarante-deux'; 71 -> 'soixante et onze' (fr) / 'septante et
    un' (be); feminine turns a trailing 'un' into 'une'."""
    if n < 0:
        return "moins " + int_to_words_fr(-n, belgian=belgian)
    if n < 100:
        out = _fr_under_100(n, belgian)
    elif n < 1000:
        h, rem = divmod(n, 100)
        out = "cent" if h == 1 else _FR_UNITS[h] + " cent"
        if rem == 0 and h > 1:
            out += "s"
        elif rem:
            out += " " + _fr_under_100(rem, belgian)
    elif n < 10 ** 6:
        k, rem = divmod(n, 1000)
        out = "mille" if k == 1 else int_to_words_fr(k, belgian=belgian) + " mille"
        if rem:
            out += " " + int_to_words_fr(rem, belgian=belgian)
    elif n < 10 ** 9:
        m, rem = divmod(n, 10 ** 6)
        out = int_to_words_fr(m, belgian=belgian) + (" million" if m == 1 else " millions")
        if rem:
            out += " " + int_to_words_fr(rem, belgian=belgian)
    else:
        raise ValueError(f"out of range: {n}")
    if feminine and out.endswith("un"):
        out += "e"
    return out


def ordinal_to_words_fr(n: int, *, belgian: bool = False) -> str:
    """1 -> 'premier'; 2 -> 'deuxième'; 70(be) -> 'septantième';
    91(be) -> 'nonante et unième'."""
    if n == 1:
        return "premier"
    words = int_to_words_fr(n, belgian=belgian)
    # the -ième suffix attaches to the LAST word (after either separator)
    cut = max(words.rfind(" "), words.rfind("-"))
    head, sep, last = (
        (words[: cut], words[cut], words[cut + 1 :]) if cut >= 0 else ("", "", words)
    )
    if last == "cinq":
        last = "cinquième"
    elif last == "neuf":
        last = "neuvième"
    else:
        if last in ("vingts", "cents"):  # plural s drops before -ième
            last = last[:-1]
        if last.endswith("e"):  # elision: quatre -> quatrième
            last = last[:-1]
        last += "ième"
    return head + sep + last


_FR_DUR_UNITS = {"h": "heure", "min": "minute", "sec": "seconde"}
_EN_DUR_UNITS = {"h": "hour", "min": "minute", "sec": "second"}


def duration_to_words(parts: list[tuple[int, str]], lang: str = "en") -> str:
    """[(2,'min'),(1,'sec')] -> 'two minutes and one second' /
    'deux minutes et une seconde' (reference fixture shapes)."""
    out = []
    for n, unit in parts:
        if lang in ("fr", "be"):
            word = _FR_DUR_UNITS[unit]
            num = int_to_words_fr(n, feminine=True, belgian=(lang == "be"))
        else:
            word = _EN_DUR_UNITS[unit]
            num = int_to_words(n)
        out.append(num + " " + word + ("s" if n != 1 else ""))
    joiner = " et " if lang in ("fr", "be") else " and "
    return joiner.join(out)


_MONEY_RE = re.compile(r"([$€£])(\d+(?:\.\d+)?)")
_TIME_RE = re.compile(r"\b(\d{1,2}):([0-5]\d)\b")
# suffix ADJACENT to the digits: '1st'/'10ème' are ordinals, '10 st'
# (stone) and 'le 1 er' are not — a \s* here corrupted English text
_ORDINAL_RE = re.compile(r"\b(\d+)(st|nd|rd|th|er|ère|ème|ième|eme)\b")
_DECIMAL_RE = re.compile(r"\b(\d+\.\d+)\b")
_INT_RE = re.compile(r"\b(\d+)\b")
_DUR_RE = re.compile(r"\b\d+\s*(?:min|sec|h)\b(?:\s*\d+\s*(?:min|sec|h)\b)*")
_DUR_PART_RE = re.compile(r"(\d+)\s*(min|sec|h)")

_FR_MONEY_UNITS = {"$": "dollar", "€": "euro", "£": "livre"}


def _money_fr(amount: str, currency: str, lang: str) -> str:
    unit = _FR_MONEY_UNITS.get(currency, "dollar")
    belgian = lang == "be"
    whole_s, _, frac = amount.partition(".")
    whole = int(whole_s)
    out = int_to_words_fr(whole, belgian=belgian) + " " + unit
    out += "s" if whole != 1 else ""
    if frac:
        c = int(frac.ljust(2, "0")[:2])
        if c:
            out += (
                " "
                + int_to_words_fr(c, belgian=belgian)
                + (" centimes" if c != 1 else " centime")
            )
    return out


def time_to_words_fr(hh: int, mm: int, *, belgian: bool = False) -> str:
    """14:30 -> 'quatorze heures trente'; 1:00 -> 'une heure';
    9:05 -> 'neuf heures cinq'."""
    out = int_to_words_fr(hh, feminine=True, belgian=belgian)
    out += " heures" if hh != 1 else " heure"
    if mm:
        out += " " + int_to_words_fr(mm, feminine=True, belgian=belgian)
    return out


def normalize_numbers(text: str, lang: str = "en") -> str:
    """Expand money, durations, clock times, ordinals, decimals, then bare
    integers — in that order (longest-pattern-first so '$2.50' is not eaten
    by the decimal rule). ``lang``: 'en' (default), 'fr', 'be'."""
    if lang in ("fr", "be"):
        belgian = lang == "be"
        text = _MONEY_RE.sub(lambda m: _money_fr(m.group(2), m.group(1), lang), text)
        text = _DUR_RE.sub(
            lambda m: duration_to_words(
                [(int(n), u) for n, u in _DUR_PART_RE.findall(m.group(0))], lang
            ),
            text,
        )
        text = _TIME_RE.sub(
            lambda m: time_to_words_fr(
                int(m.group(1)), int(m.group(2)), belgian=belgian
            ),
            text,
        )
        text = _ORDINAL_RE.sub(
            lambda m: ordinal_to_words_fr(int(m.group(1)), belgian=belgian), text
        )
        text = _DECIMAL_RE.sub(
            lambda m: int_to_words_fr(int(m.group(1).partition(".")[0]), belgian=belgian)
            + " virgule "
            + " ".join(_FR_UNITS[int(d)] for d in m.group(1).partition(".")[2]),
            text,
        )
        text = _INT_RE.sub(
            lambda m: int_to_words_fr(int(m.group(1)), belgian=belgian), text
        )
        return text
    text = _MONEY_RE.sub(lambda m: money_to_words(m.group(2), m.group(1)), text)
    text = _DUR_RE.sub(
        lambda m: duration_to_words(
            [(int(n), u) for n, u in _DUR_PART_RE.findall(m.group(0))], "en"
        ),
        text,
    )
    text = _TIME_RE.sub(lambda m: time_to_words(int(m.group(1)), int(m.group(2))), text)
    text = _ORDINAL_RE.sub(lambda m: ordinal_to_words(int(m.group(1))), text)
    text = _DECIMAL_RE.sub(lambda m: decimal_to_words(m.group(1)), text)
    text = _INT_RE.sub(lambda m: int_to_words(int(m.group(1))), text)
    return text
