"""fr/be number verbalization — the reference's own fixtures
(/root/reference/tests/test_utils_text.py:33-118), ported for the surface
this kernel covers (F5 completion, VERDICT r01 item 8)."""

import pytest

from ocr_spark.kernels.numbers import (
    int_to_words_fr,
    normalize_numbers,
    ordinal_to_words_fr,
)


@pytest.mark.parametrize(
    "lang,text,target",
    [
        # reference test_time fixtures (en + fr)
        ("en", "1 sec", "one second"),
        ("en", "10sec", "ten seconds"),
        ("en", "1min", "one minute"),
        ("en", "2 min 1sec", "two minutes and one second"),
        ("en", "1h", "one hour"),
        ("en", "2 h 2min", "two hours and two minutes"),
        ("en", "10 h 10 sec", "ten hours and ten seconds"),
        ("en", "23h 59min 59sec",
         "twenty-three hours and fifty-nine minutes and fifty-nine seconds"),
        ("fr", "1 sec", "une seconde"),
        ("fr", "10sec", "dix secondes"),
        ("fr", "1min", "une minute"),
        ("fr", "2 min 1sec", "deux minutes et une seconde"),
        ("fr", "1h", "une heure"),
        ("fr", "2 h 2min", "deux heures et deux minutes"),
        ("fr", "10 h 10 sec", "dix heures et dix secondes"),
        ("fr", "23h 59min 59sec",
         "vingt-trois heures et cinquante-neuf minutes et cinquante-neuf secondes"),
    ],
)
def test_time_fixtures(lang, text, target):
    assert normalize_numbers(text, lang=lang) == target


@pytest.mark.parametrize(
    "lang,text,target",
    [
        # reference test_ordinal fixtures
        ("en", "3rd", "third"),
        ("en", "2nd", "second"),
        ("en", "10ème", "tenth"),
        ("fr", "2nd", "deuxième"),
        ("fr", "3rd", "troisième"),
        ("fr", "10ième", "dixième"),
        ("be", "1er", "premier"),
        ("be", "3rd", "troisième"),
        ("be", "70ème", "septantième"),
        ("be", "91ème", "nonante et unième"),
    ],
)
def test_ordinal_fixtures(lang, text, target):
    assert normalize_numbers(text, lang=lang) == target


def test_money_fixtures():
    # reference test_money
    assert normalize_numbers("$10") == "ten dollars"
    assert normalize_numbers("$1", lang="fr") == "un dollar"


@pytest.mark.parametrize(
    "n,belgian,target",
    [
        (0, False, "zéro"),
        (17, False, "dix-sept"),
        (21, False, "vingt et un"),
        (71, False, "soixante et onze"),
        (71, True, "septante et un"),
        (77, False, "soixante-dix-sept"),
        (77, True, "septante-sept"),
        (80, False, "quatre-vingts"),
        (81, False, "quatre-vingt-un"),
        (91, False, "quatre-vingt-onze"),
        (91, True, "nonante et un"),
        (100, False, "cent"),
        (200, False, "deux cents"),
        (101, False, "cent un"),
        (1000, False, "mille"),
        (1959, False, "mille neuf cent cinquante-neuf"),
        (2000000, False, "deux millions"),
    ],
)
def test_fr_cardinals(n, belgian, target):
    assert int_to_words_fr(n, belgian=belgian) == target


def test_fr_ordinal_elision():
    assert ordinal_to_words_fr(4) == "quatrième"
    assert ordinal_to_words_fr(5) == "cinquième"
    assert ordinal_to_words_fr(9) == "neuvième"
    assert ordinal_to_words_fr(80) == "quatre-vingtième"


def test_fr_sentence():
    assert (
        normalize_numbers("les 3 petits cochons et 1.5 litre", lang="fr")
        == "les trois petits cochons et un virgule cinq litre"
    )


def test_fr_money_cents_and_time():
    assert normalize_numbers("$2.50", lang="fr") == "deux dollars cinquante centimes"
    assert normalize_numbers("14:30", lang="fr") == "quatorze heures trente"
    assert normalize_numbers("1:00", lang="fr") == "une heure"
    assert normalize_numbers("9:05", lang="fr") == "neuf heures cinq"


def test_en_ordinal_requires_adjacent_suffix():
    # '10 st' (stones) and 'le 1 er' must NOT become ordinals
    assert normalize_numbers("weighs 10 st today") == "weighs ten st today"
    assert normalize_numbers("le 1 er prix", lang="fr") == "le un er prix"
    assert normalize_numbers("the 3rd time") == "the third time"
