"""TextTiling topical segmentation (operators/text_analysis.text_tiles)."""

import numpy as np

from ocr_spark.operators.text_analysis import text_tiles


def _run(spark, texts, **kw):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    return text_tiles(df, **kw).collect()


def test_topic_shift_yields_boundary(spark):
    # three tiles of disjoint vocabulary, 20 tokens each (block=10 -> 6
    # blocks): similarity is high inside a topic, zero across topics --
    # the valley at each topic seam is a local minimum with depth
    a = ("apple banana cherry date elderberry fig " * 4).split()[:20]
    b = ("metal copper iron nickel zinc chrome " * 4).split()[:20]
    c = ("river lake ocean stream pond delta " * 4).split()[:20]
    rows = _run(spark, [" ".join(a + b + c)], block=10, depth_milli=150)
    offsets = sorted(r["token_offset"] for r in rows)
    # the seams sit at tokens 20 and 40 = boundary blocks 1 and 3
    assert 20 in offsets and 40 in offsets
    for r in rows:
        assert r["sim_milli"] == 0 and r["depth_milli"] >= 150


def test_uniform_text_has_no_boundary(spark):
    rows = _run(spark, ["word " * 60], block=10, depth_milli=150)
    assert rows == []  # every similarity is the constant 1e6


def test_short_doc_single_block_empty(spark):
    rows = _run(spark, ["only nine tokens here so just one block total"], block=10)
    assert rows == []


def test_equal_pair_dot_matches_vector_dot(spark):
    # pair-count formulation == classic bag-of-words dot/cosine on a doc
    # engineered to land one boundary: [A*10][mix][A*10-ish]
    text = "x x x y y z z z q q " + "x y q r r s s t t u " + "m m n n o o p p k k"
    rows = _run(spark, [text], block=10, depth_milli=0)
    byb = {r["boundary_block"]: r for r in rows}
    from collections import Counter

    toks = text.split()
    blocks = [toks[i : i + 10] for i in range(0, len(toks), 10)]

    def sim(a, b):
        ca, cb = Counter(a), Counter(b)
        dot = sum(ca[w] * cb[w] for w in ca)
        n2a = sum(v * v for v in ca.values())
        n2b = sum(v * v for v in cb.values())
        return (1_000_000 * dot * dot) // (n2a * n2b) if n2a and n2b else 0

    v = [sim(blocks[i], blocks[i + 1]) for i in range(len(blocks) - 1)]
    # v = [v0, v1]; whichever boundary the operator reports must carry the
    # reference sim value
    for b, r in byb.items():
        assert r["sim_milli"] == v[b]


def test_plan_single_exchange(spark):
    df = spark.createDataFrame([(0, "a " * 50)], "doc_id long, text string")
    plan = text_tiles(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Exchange") == 0  # logical plan: window adds it physically
    phys = text_tiles(df)._jdf.queryExecution().executedPlan().toString()
    assert phys.count("Exchange") <= 1
