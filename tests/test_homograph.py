"""IDN homograph detection: skeleton semantics (NFC + confusable fold)
and the bucketed pair join."""

from ocr_spark.operators.urls import CONFUSABLES, homograph_pairs, host_skeleton


def test_skeleton_folds_confusables():
    # Cyrillic о/е/ѕ etc. fold onto their Latin lookalikes
    assert host_skeleton("hоst3.example") == "host3.example"
    assert host_skeleton("hoѕt3.example") == "host3.example"
    assert host_skeleton("host3.еxample") == "host3.example"
    for bad, good in CONFUSABLES:
        assert host_skeleton(f"a{bad}b") == f"a{good}b"


def test_skeleton_nfc_and_case():
    # decomposed e + combining acute == precomposed é after NFC
    assert host_skeleton("café.example") == host_skeleton("café.example")
    assert host_skeleton("HOST3.Example") == "host3.example"
    # clean ascii is a fixpoint
    assert host_skeleton("plain.example") == "plain.example"


def test_pair_join(spark):
    hosts = [
        "host3.example",
        "hоst3.example",  # Cyrillic о
        "hoѕt3.example",  # Cyrillic ѕ
        "other.example",
        "café.example",
        "café.example",
        "café.example",  # duplicate row folds via distinct
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = homograph_pairs(df).collect()
    by_skel = {}
    for r in got:
        by_skel.setdefault(r.skeleton, []).append((r.host_a, r.host_b))
    # host3 family: 3 distinct hosts -> 3 pairs; cafe family: 2 -> 1 pair
    assert len(by_skel["host3.example"]) == 3
    assert len(by_skel["caf\u00e9.example"]) == 1
    assert "other.example" not in by_skel
    assert all(a < b for pairs in by_skel.values() for a, b in pairs)
