"""Aho-Corasick blocklist: automaton vs brute-force rescan fuzz, the
suffix-pattern output links, overlap counting, and the operator columns."""

import random

from ocr_spark.kernels.aho import AhoCorasick
from ocr_spark.operators.corpus_filters import BLOCKLIST_PATTERNS, blocklist_flags


def _brute(text, patterns):
    return sorted(
        (i, idx)
        for i in range(len(text))
        for idx, p in enumerate(patterns)
        if text[i : i + len(p)] == p
    )


def test_fuzz_vs_bruteforce():
    pats = ["ab", "abc", "bca", "c", "cab", "aa", "aab"]
    ac = AhoCorasick(pats)
    rng = random.Random(3)
    for _ in range(300):
        t = "".join(rng.choice("abc") for _ in range(rng.randint(0, 50)))
        assert sorted(ac.find_all(t)) == _brute(t, pats)


def test_suffix_pattern_fires_via_output_link():
    # 'he' is a suffix of 'she': both must fire at the same end position
    ac = AhoCorasick(["she", "he", "hers"])
    assert sorted(ac.find_all("ushers")) == [(1, 0), (2, 1), (2, 2)]


def test_overlapping_occurrences_counted():
    ac = AhoCorasick(["xxx"])
    assert ac.find_all("xxxx") == [(0, 0), (1, 0)]


def test_operator_columns(spark):
    rows = [
        (1, "plain harmless text"),
        (2, "win the LOTTERY jackpot xxxx"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in blocklist_flags(df).collect()}
    assert not got[1].blocked and got[1].n_hits == 0 and got[1].first_hit_pos is None
    # lottery@9, jackpot@17, xxx@25 and xxx@26 (lowercased)
    assert got[2].n_hits == 4 and got[2].n_patterns_hit == 3
    assert got[2].first_hit_pos == 9 and got[2].blocked
    assert not got[3].blocked
    assert "lottery" in BLOCKLIST_PATTERNS
