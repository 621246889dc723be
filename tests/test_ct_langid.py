"""Cavnar-Trenkle language ID: classification accuracy on marker-planted
text, rank-profile shape, deterministic tie-breaks, and the broadcast
plan shape (profiles are bounded model tables)."""

from pyspark.sql import functions as F

from ocr_spark.operators.text_analysis import ct_classify, ct_profiles

SAMPLES = [
    ("en", "the cat and the dog of the house and the mouse"),
    ("en", "of the people and for the people and by the people"),
    ("fr", "le chat et la maison et le chien et la souris"),
    ("fr", "le monde et la vie et le temps et la nuit"),
    ("de", "der hund und die katze und der mann und die frau"),
    ("de", "der tag und die nacht und der weg und die zeit"),
]


def _docs(spark):
    rows = [(i, lang, text) for i, (lang, text) in enumerate(SAMPLES)]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_profiles_are_ranked_and_bounded(spark):
    prof = ct_profiles(_docs(spark), top_k=10).collect()
    by_lang = {}
    for r in prof:
        by_lang.setdefault(r.lang, []).append(r.lang_rank)
    for lang, ranks in by_lang.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 10
    assert set(by_lang) == {"en", "fr", "de"}


def test_classifies_marker_planted_text(spark):
    out = ct_classify(_docs(spark), top_k=15, top_m=15).collect()
    assert len(out) == len(SAMPLES)
    correct = sum(1 for r in out if r.pred_lang == r.true_lang)
    assert correct == len(SAMPLES)  # distinctive function words per lang


def test_empty_text_drops_out(spark):
    docs = spark.createDataFrame(
        [(1, "en", "the and of the"), (2, "fr", "")],
        "doc_id long, lang string, text string",
    )
    out = ct_classify(docs).collect()
    assert {r.doc_id for r in out} == {1}


def test_profiles_broadcast_in_plan(spark):
    df = ct_classify(_docs(spark))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


def test_deterministic_across_partitionings(spark):
    d = _docs(spark)
    a = sorted(map(tuple, ct_classify(d.repartition(1)).collect()))
    b = sorted(map(tuple, ct_classify(d.repartition(7)).collect()))
    assert a == b


def test_multikb_docs_within_time_budget(spark):
    # Regression guard for the quadratic-eval hang: an earlier form inlined
    # lower(text) and the sorted gram array into HOF lambda bodies, which
    # interpreted eval re-evaluates PER ELEMENT — O(L^2)+ per doc, minutes
    # for a single 5 KB document. Staged projections keep it O(L log L);
    # 60 docs x 5 KB must classify in seconds.
    import time

    words = ["the", "and", "of", "le", "la", "et", "der", "und", "die", "zqx"]
    langs = ["en", "fr", "de"]
    rows = [
        (i, langs[i % 3], " ".join(words[(i + j) % len(words)] for j in range(1000)))
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    t0 = time.time()
    out = ct_classify(docs).collect()
    wall = time.time() - t0
    assert len(out) == 60
    assert wall < 60, f"ct_classify took {wall:.1f}s on 5KB docs — quadratic eval regression"
