"""Gale-Church alignment (kernels/align.py + operators/bitext_align.py)."""

from ocr_spark.kernels.align import gale_church_align
from ocr_spark.operators.bitext_align import align_bitext


def test_equal_lengths_all_one_one():
    lens = [40, 55, 30, 70]
    beads = gale_church_align(lens, lens)
    assert [(a0, a1, b0, b1) for a0, a1, b0, b1, _ in beads] == [
        (0, 1, 0, 1), (1, 2, 1, 2), (2, 3, 2, 3), (3, 4, 3, 4)
    ]
    # perfect matches cost only their (zero) 1-1 prior
    assert all(c == 0 for *_, c in beads)


def test_two_one_merge_bead():
    # source sentences 0+1 translate as ONE target sentence of combined
    # length; sentence 2 maps 1-1
    beads = gale_church_align([30, 25, 60], [55, 60])
    assert [(a0, a1, b0, b1) for a0, a1, b0, b1, _ in beads] == [
        (0, 2, 0, 1), (2, 3, 1, 2)
    ]


def test_trailing_extra_sentence_merges_not_deletes():
    # known Gale-Church behavior: the 450 insertion/deletion prior makes
    # true 0-1 beads rare — a trailing unmatched sentence folds into a
    # 1-2 merge instead
    beads = gale_church_align([50, 50], [50, 50, 47])
    assert [(a0, a1, b0, b1) for a0, a1, b0, b1, _ in beads] == [
        (0, 1, 0, 1), (1, 2, 1, 3)
    ]
    # the merge bead pays its 230 prior plus the length mismatch
    assert beads[1][4] > 230 * 100 // 100


def test_empty_sides():
    assert gale_church_align([], []) == []
    beads = gale_church_align([], [40, 40])
    assert [(a0, a1, b0, b1) for a0, a1, b0, b1, _ in beads] == [
        (0, 0, 0, 1), (0, 0, 1, 2)
    ]


def test_align_bitext_spark_rows_and_plan(spark):
    pairs = spark.createDataFrame(
        [
            (
                0,
                "The weather is nice today. I like programming in Spark.",
                "Le temps est tres beau aujourd'hui. J'aime programmer dans Spark.",
            ),
            (1, "", "Une phrase sans source."),
        ],
        "pair_id long, text_a string, text_b string",
    )
    out = align_bitext(pairs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1 and "Exchange" not in plan
    rows = out.collect()
    by_pair = {}
    for r in rows:
        by_pair.setdefault(r.pair_id, []).append(r)
    p0 = sorted(by_pair[0], key=lambda r: r.bead)
    assert [(r.a_start, r.a_end, r.b_start, r.b_end) for r in p0] == [
        (0, 1, 0, 1), (1, 2, 1, 2)
    ]
    assert p0[0].a_text.startswith("The weather")
    assert p0[0].b_text.startswith("Le temps")
    p1 = by_pair[1]
    assert [(r.a_start, r.a_end, r.b_start, r.b_end) for r in p1] == [(0, 0, 0, 1)]
    assert p1[0].a_text == ""


def test_alignment_partition_invariance(spark):
    rows = [
        (i, " ".join(f"Sentence number {j} of doc {i}." for j in range(6)),
         " ".join(f"Phrase numero {j} du doc {i}." for j in range(6)))
        for i in range(30)
    ]
    pairs = spark.createDataFrame(rows, "pair_id long, text_a string, text_b string")
    a = sorted(map(tuple, align_bitext(pairs).collect()))
    b = sorted(map(tuple, align_bitext(pairs.repartition(11)).collect()))
    assert a == b
